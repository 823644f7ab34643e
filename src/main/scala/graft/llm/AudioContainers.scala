package graft.llm

import java.nio.charset.StandardCharsets

/** Pure-JVM compressed-audio CONTAINER support: minimal-but-valid MP3
  * (MPEG-1 Layer III frame sequence) and OGG (Vorbis identification
  * header) writers plus general, defensive readers for the metadata a
  * training-data pipeline needs before any codec runs — container kind,
  * sample rate, channel count, duration, bitrate.
  *
  * Why this exists: the environment ships no audio codecs beyond WAV, so
  * SAMPLE decode of mp3/ogg stays stubbed ([[Multimodal]] scaladoc) — but
  * frame-header / page-header metadata is plain bit arithmetic, no codec
  * involved, and it is the first thing a 100 TB audio-curation pass
  * touches (drop non-audio payloads, bucket by rate/duration, price the
  * decode fleet). The readers are real parsers over the byte layout
  * (MPEG sync + bitrate/rate tables + frame-length walk; OGG page walk
  * with the REAL OGG CRC-32 checked per page and the Vorbis id packet
  * decoded), not fixture-shaped matching: a flipped bit anywhere in the
  * write → parse roundtrip — including the CRC — breaks the differential
  * check in `llm_mm_audio_meta`.
  *
  * Reference analog: the binary-payload landing zone
  * (`01_bronze_layer_ingestion.py:24-29`) ingests opaque media; this is
  * the typed-metadata step above it, beside [[VideoContainers]].
  */
object AudioContainers {

  final case class AudioMeta(
      container: String, // "mp3" | "ogg" | "unknown"
      sampleRate: Int,
      channels: Int,
      durationMs: Long,
      bitrateKbps: Int)

  // ------------------------------------------------------------------
  // MP3 (MPEG-1 Layer III)
  // ------------------------------------------------------------------

  /** MPEG-1 Layer III bitrate table (kbps), index 1–14. */
  private val Mp3Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  /** MPEG-1 sample-rate table, index 0–2. */
  private val Mp3Rates = Array(44100, 48000, 32000)
  private val Mp3SamplesPerFrame = 1152

  private def mp3FrameLen(bitrateKbps: Int, sampleRate: Int): Int =
    144 * bitrateKbps * 1000 / sampleRate // no padding bit used

  /** A minimal valid MP3: `nFrames` back-to-back MPEG-1 Layer III frames,
    * constant bitrate, no CRC, no ID3. Frame bodies carry deterministic
    * filler (stands in for the coded granules a codec would read). */
  def mp3Payload(id: Long, bitrateKbps: Int, sampleRate: Int,
      channels: Int, nFrames: Int): Array[Byte] = {
    val bi = Mp3Bitrates.indexOf(bitrateKbps)
    val ri = Mp3Rates.indexOf(sampleRate)
    require(bi > 0 && ri >= 0 && (channels == 1 || channels == 2),
      s"unsupported mp3 params ($bitrateKbps kbps, $sampleRate Hz, $channels ch)")
    val frameLen = mp3FrameLen(bitrateKbps, sampleRate)
    val frame = new Array[Byte](frameLen)
    frame(0) = 0xff.toByte
    frame(1) = 0xfb.toByte // sync + MPEG-1 + Layer III + no CRC
    frame(2) = ((bi << 4) | (ri << 2)).toByte // no padding, not private
    frame(3) = (if (channels == 1) 0xc0 else 0x00).toByte // mono | stereo
    var i = 4
    while (i < frameLen) { frame(i) = ((id + i * 31) & 0xff).toByte; i += 1 }
    val out = new Array[Byte](frameLen * nFrames)
    var f = 0
    while (f < nFrames) {
      System.arraycopy(frame, 0, out, f * frameLen, frameLen); f += 1
    }
    out
  }

  /** Parse an MPEG-1 Layer III stream: decode the first frame header via
    * the real bitrate/rate tables, then walk frame-by-frame counting.
    * Junk, truncation, a reserved table index, or a parameter change
    * mid-stream (rate/bitrate/channel mode — this reader's duration
    * arithmetic is CBR-only, so a VBR or mixed-rate stream must be
    * rejected rather than priced off the first frame) return None. */
  def parseMp3(bytes: Array[Byte]): Option[AudioMeta] = {
    if (bytes.length < 4) return None
    def headerAt(p: Int): Option[(Int, Int, Int, Int)] = {
      if (p + 4 > bytes.length) return None
      val b0 = bytes(p) & 0xff; val b1 = bytes(p + 1) & 0xff
      val b2 = bytes(p + 2) & 0xff; val b3 = bytes(p + 3) & 0xff
      if (b0 != 0xff || (b1 & 0xfe) != 0xfa) return None // MPEG-1 L3 only
      val bi = (b2 >> 4) & 0xf
      val ri = (b2 >> 2) & 0x3
      if (bi == 0 || bi == 15 || ri == 3) return None // free/bad/reserved
      val channels = if (((b3 >> 6) & 0x3) == 3) 1 else 2
      Some((Mp3Bitrates(bi), Mp3Rates(ri), channels, (b2 >> 1) & 0x1))
    }
    headerAt(0).flatMap { case (kbps, rate, channels, _) =>
      var p = 0
      var frames = 0L
      var ok = true
      while (ok && p < bytes.length) {
        headerAt(p) match {
          case Some((k, r, c, pad)) =>
            val len = mp3FrameLen(k, r) + pad
            if (k != kbps || r != rate || c != channels) ok = false // VBR/mixed
            else if (p + len > bytes.length) ok = false // truncated frame
            else { frames += 1; p += len }
          case None => ok = false
        }
      }
      // A stream that stopped mid-bytes is damaged; metadata is only
      // trusted when every byte is accounted for by whole frames.
      if (!ok || p != bytes.length || frames == 0) None
      else Some(AudioMeta("mp3", rate, channels,
        frames * Mp3SamplesPerFrame * 1000L / rate, kbps))
    }
  }

  // ------------------------------------------------------------------
  // OGG / Vorbis
  // ------------------------------------------------------------------

  /** The real OGG CRC-32: polynomial 0x04c11db7, init 0, MSB-first, no
    * reflection, no final xor (RFC 3533 §6). */
  private val OggCrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var j = 0
      while (j < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        j += 1
      }
      t(i) = r; i += 1
    }
    t
  }

  private def oggCrc(bytes: Array[Byte]): Int = {
    var crc = 0
    var i = 0
    while (i < bytes.length) {
      crc = (crc << 8) ^ OggCrcTable(((crc >>> 24) ^ (bytes(i) & 0xff)) & 0xff)
      i += 1
    }
    crc
  }

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le64(v: Long): Array[Byte] = le32(v & 0xffffffffL) ++ le32(v >>> 32)

  /** One OGG page: header (granule, serial, seq, flags) + single-packet
    * payload, CRC computed over the page with the crc field zeroed. */
  private def oggPage(headerType: Int, granule: Long, serial: Long,
      seq: Long, payload: Array[Byte]): Array[Byte] = {
    require(payload.length < 255 * 255, "single-page payload only")
    val nSegs = payload.length / 255 + 1
    val segs = Array.tabulate(nSegs)(i =>
      (if (i == nSegs - 1) payload.length % 255 else 255).toByte)
    val page = "OggS".getBytes(StandardCharsets.US_ASCII) ++
      Array(0.toByte, headerType.toByte) ++
      le64(granule) ++ le32(serial) ++ le32(seq) ++ le32(0) ++
      Array(nSegs.toByte) ++ segs ++ payload
    val crc = oggCrc(page)
    System.arraycopy(le32(crc & 0xffffffffL), 0, page, 22, 4)
    page
  }

  /** The 30-byte Vorbis identification packet. `bitrateNominal` rides the
    * middle bitrate field, the one tools report. */
  private def vorbisIdPacket(channels: Int, sampleRate: Int,
      bitrateNominal: Int): Array[Byte] =
    Array(1.toByte) ++ "vorbis".getBytes(StandardCharsets.US_ASCII) ++
      le32(0) ++ Array(channels.toByte) ++ le32(sampleRate) ++
      le32(0) ++ le32(bitrateNominal) ++ le32(0) ++
      Array(0xb8.toByte, 1.toByte) // blocksizes 2^8/2^11, framing bit

  /** A minimal valid OGG/Vorbis stream: a BOS page carrying the real
    * identification header, then an EOS page whose granule position is
    * the total sample count (how every tool derives OGG duration). */
  def oggPayload(id: Long, sampleRate: Int, channels: Int,
      bitrateKbps: Int, totalSamples: Long): Array[Byte] = {
    val serial = 0x47524654L + (id & 0xffff) // deterministic per asset
    val filler = Array.tabulate(64)(i => ((id + i * 17) & 0xff).toByte)
    oggPage(0x02, 0L, serial, 0L, vorbisIdPacket(channels, sampleRate, bitrateKbps * 1000)) ++
      oggPage(0x04, totalSamples, serial, 1L, filler)
  }

  /** Parse an OGG stream: walk pages (capture pattern, real CRC check per
    * page), decode the Vorbis id packet from the BOS page, duration from
    * the highest granule position. Junk, truncation, a CRC mismatch, or a
    * non-Vorbis first packet return None. */
  def parseOgg(bytes: Array[Byte]): Option[AudioMeta] = {
    var p = 0
    var sampleRate = 0
    var channels = 0
    var bitrateNominal = 0
    var granule = -1L
    var sawBos = false
    while (p < bytes.length) {
      if (p + 27 > bytes.length) return None
      if (!(bytes(p) == 'O' && bytes(p + 1) == 'g' &&
            bytes(p + 2) == 'g' && bytes(p + 3) == 'S')) return None
      val nSegs = bytes(p + 26) & 0xff
      if (p + 27 + nSegs > bytes.length) return None
      var payloadLen = 0
      var s = 0
      while (s < nSegs) { payloadLen += bytes(p + 27 + s) & 0xff; s += 1 }
      val pageLen = 27 + nSegs + payloadLen
      if (p + pageLen > bytes.length) return None
      // Real CRC check: recompute with the crc field zeroed.
      val page = java.util.Arrays.copyOfRange(bytes, p, p + pageLen)
      val stored = (page(22) & 0xff) | ((page(23) & 0xff) << 8) |
        ((page(24) & 0xff) << 16) | ((page(25) & 0xff) << 24)
      java.util.Arrays.fill(page, 22, 26, 0.toByte)
      if (oggCrc(page) != stored) return None
      var g = 0L
      var i = 13
      while (i >= 6) { g = (g << 8) | (page(i) & 0xff); i -= 1 }
      granule = math.max(granule, g)
      if ((page(5) & 0x02) != 0) { // BOS: expect the Vorbis id packet
        val o = 27 + nSegs
        if (payloadLen < 30 || page(o) != 1 ||
            new String(page, o + 1, 6, StandardCharsets.US_ASCII) != "vorbis")
          return None
        channels = page(o + 11) & 0xff
        sampleRate = (page(o + 12) & 0xff) | ((page(o + 13) & 0xff) << 8) |
          ((page(o + 14) & 0xff) << 16) | ((page(o + 15) & 0xff) << 24)
        bitrateNominal = (page(o + 20) & 0xff) | ((page(o + 21) & 0xff) << 8) |
          ((page(o + 22) & 0xff) << 16) | ((page(o + 23) & 0xff) << 24)
        sawBos = true
      }
      p += pageLen
    }
    // Range checks on attacker-controllable fields: a CRC-valid page can
    // still carry a granule that overflows the *1000 duration arithmetic,
    // or a negative nominal bitrate — garbage metadata must be None, not
    // a negative duration.
    if (!sawBos || sampleRate <= 0 || channels <= 0 || granule < 0 ||
        granule > Long.MaxValue / 1000L || bitrateNominal < 0) None
    else Some(AudioMeta("ogg", sampleRate, channels,
      granule * 1000L / sampleRate, bitrateNominal / 1000))
  }

  /** Sniff + parse either container. */
  def parse(bytes: Array[Byte]): Option[AudioMeta] =
    if (bytes.length >= 4 && bytes(0) == 'O' && bytes(1) == 'g' &&
        bytes(2) == 'g' && bytes(3) == 'S') parseOgg(bytes)
    else parseMp3(bytes)
}
