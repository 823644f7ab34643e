package graft.llm

import java.nio.charset.StandardCharsets

/** Pure-JVM video CONTAINER support: minimal-but-valid MP4 (ISO BMFF box
  * tree) and WebM (Matroska EBML) writers plus general, defensive readers
  * for the metadata a training-data pipeline needs before any codec runs —
  * container brand, duration, track count, video resolution.
  *
  * Why this exists: the environment ships no video codecs, so FRAME decode
  * stays stubbed ([[Multimodal]] scaladoc) — but container metadata is
  * plain box/EBML arithmetic, no codec involved, and it is the first thing
  * a 100 TB video-curation pass touches (drop non-video payloads, bucket
  * by resolution/duration, price the decode fleet). The readers are real
  * parsers over the byte layout (box walk with 32/64-bit sizes; EBML VINT
  * descent), not fixture-shaped string matching: a flipped bit anywhere in
  * the write → parse roundtrip breaks the differential check in
  * `llm_mm_video_meta`.
  *
  * Reference analog: the binary-payload landing zone
  * (`01_bronze_layer_ingestion.py:24-29`) ingests opaque media; this is
  * the typed-metadata step above it.
  */
object VideoContainers {

  final case class VideoMeta(
      container: String, // "mp4" | "webm" | "unknown"
      durationMs: Long,
      nTracks: Int,
      width: Int,
      height: Int)

  // ------------------------------------------------------------------
  // MP4 (ISO base media file format)
  // ------------------------------------------------------------------

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def fourcc(s: String): Array[Byte] = s.getBytes(StandardCharsets.US_ASCII)

  private def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(8L + body.length) ++ fourcc(tpe) ++ body
  }

  /** Identity transformation matrix (9 × 32-bit fixed point). */
  private val unityMatrix: Array[Byte] =
    Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
      .flatMap(be32).toArray

  /** A minimal valid MP4: ftyp + moov(mvhd, trak*) + mdat. Timescale is
    * 1000, so mvhd duration == milliseconds. Track 1 is the video track
    * carrying the 16.16 fixed-point presentation size in its tkhd; extra
    * tracks are audio-handler tracks. `mdat` carries deterministic filler
    * (stands in for the coded samples a codec would read). */
  def mp4Payload(id: Long, width: Int, height: Int, durationMs: Long,
      nTracks: Int): Array[Byte] = {
    val ftyp = box("ftyp",
      fourcc("isom"), be32(0x200), fourcc("isom"), fourcc("iso2"), fourcc("mp41"))
    val mvhd = box("mvhd",
      be32(0), // version 0 + flags
      be32(0), be32(0), // creation, modification
      be32(1000), be32(durationMs), // timescale, duration
      be32(0x00010000), // rate 1.0
      Array(0x01.toByte, 0x00.toByte, 0, 0), // volume 1.0 + reserved
      be32(0), be32(0), // reserved
      unityMatrix,
      Array.fill(6 * 4)(0.toByte), // pre_defined
      be32(nTracks + 1L)) // next_track_ID
    val traks = (1 to nTracks).map { t =>
      val video = t == 1
      val tkhd = box("tkhd",
        be32(7), // version 0, flags: enabled | in movie | in preview
        be32(0), be32(0), // creation, modification
        be32(t.toLong), be32(0), // track_ID, reserved
        be32(durationMs),
        be32(0), be32(0), // reserved
        Array(0, 0, 0, 0), // layer + alternate_group
        Array(0, 0, 0, 0), // volume + reserved
        unityMatrix,
        be32(if (video) width.toLong << 16 else 0L),
        be32(if (video) height.toLong << 16 else 0L))
      val mdhd = box("mdhd",
        be32(0), be32(0), be32(0),
        be32(1000), be32(durationMs),
        Array(0x55.toByte, 0xc4.toByte, 0, 0)) // language "und" + pre_defined
      val hdlr = box("hdlr",
        be32(0), be32(0),
        fourcc(if (video) "vide" else "soun"),
        Array.fill(12)(0.toByte),
        (if (video) "VideoHandler" else "SoundHandler").getBytes(StandardCharsets.US_ASCII)
          :+ 0.toByte)
      box("trak", tkhd, box("mdia", mdhd, hdlr))
    }
    val mdat = box("mdat",
      Array.tabulate(64)(i => ((i * 31 + id * 7) & 0xff).toByte))
    ftyp ++ box("moov", (mvhd +: traks): _*) ++ mdat
  }

  /** Walk the box tree. Returns None unless a well-formed ftyp + moov/mvhd
    * are found. Handles 64-bit largesize boxes and a final size-0 box;
    * truncated or lying sizes terminate the walk instead of throwing. */
  def parseMp4(bytes: Array[Byte]): Option[VideoMeta] = {
    def rd32(off: Int): Long =
      if (off + 4 > bytes.length) -1L
      else ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
    def rd64(off: Int): Long =
      if (off + 8 > bytes.length) -1L
      else (rd32(off) << 32) | rd32(off + 4)
    def tpe(off: Int): String =
      if (off + 8 > bytes.length) ""
      else new String(bytes, off + 4, 4, StandardCharsets.US_ASCII)
    // (start, headerLen, totalLen) walk of sibling boxes in [from, until).
    def boxes(from: Int, until: Int): Seq[(Int, Int, Long)] = {
      val out = Seq.newBuilder[(Int, Int, Long)]
      var off = from
      var ok = true
      while (ok && off + 8 <= until) {
        val sz0 = rd32(off)
        val (hdr, sz) =
          if (sz0 == 1L) (16, rd64(off + 8))
          else if (sz0 == 0L) (8, (until - off).toLong)
          else (8, sz0)
        if (sz < hdr || off + sz > until) ok = false
        else { out += ((off, hdr, sz)); off += sz.toInt }
      }
      out.result()
    }
    var brand = ""
    var duration = -1L
    var timescale = 1000L
    var tracks = 0
    var w = 0
    var h = 0
    boxes(0, bytes.length).foreach { case (off, hdr, _) =>
      tpe(off) match {
        case "ftyp" =>
          if (off + hdr + 4 <= bytes.length)
            brand = new String(bytes, off + hdr, 4, StandardCharsets.US_ASCII)
        case "moov" =>
          val sz0 = rd32(off)
          val end = off + (if (sz0 == 0) bytes.length - off else sz0.toInt)
          boxes(off + hdr, end).foreach { case (o2, h2, s2) =>
            tpe(o2) match {
              case "mvhd" =>
                val v = (rd32(o2 + h2) >> 24).toInt
                if (v == 1) { // 64-bit times
                  timescale = rd32(o2 + h2 + 4 + 16)
                  duration = rd64(o2 + h2 + 4 + 20)
                } else {
                  timescale = rd32(o2 + h2 + 4 + 8)
                  duration = rd32(o2 + h2 + 4 + 12)
                }
              case "trak" =>
                tracks += 1
                boxes(o2 + h2, o2 + s2.toInt).foreach { case (o3, h3, _) =>
                  if (tpe(o3) == "tkhd" && w == 0) {
                    val v = (rd32(o3 + h3) >> 24).toInt
                    // After version/flags: times+id+duration (20 bytes in
                    // v0, 32 in v1), reserved(8), layer/group/volume/
                    // reserved(8), matrix(36) — then 16.16 width/height.
                    val base = o3 + h3 + 4 + (if (v == 1) 32 else 20) + 16 + 36
                    val tw = (rd32(base) >> 16).toInt
                    val th = (rd32(base + 4) >> 16).toInt
                    if (tw > 0 && th > 0) { w = tw; h = th }
                  }
                }
              case _ =>
            }
          }
        case _ =>
      }
    }
    if (brand.isEmpty || duration < 0 || timescale <= 0) None
    else Some(VideoMeta("mp4", duration * 1000L / timescale, tracks, w, h))
  }

  // ------------------------------------------------------------------
  // WebM (Matroska / EBML)
  // ------------------------------------------------------------------

  /** EBML variable-length size encoding (1–8 bytes, length-marker bit). */
  private def vintSize(v: Long): Array[Byte] = {
    var len = 1
    while (len < 8 && v >= (1L << (7 * len)) - 1) len += 1
    val out = new Array[Byte](len)
    var rest = v | (1L << (7 * len))
    var i = len - 1
    while (i >= 0) { out(i) = (rest & 0xff).toByte; rest >>= 8; i -= 1 }
    out
  }

  private def ebmlId(id: Long): Array[Byte] = {
    // Element ids are written verbatim (class encoded in the id itself).
    var len = 1
    while ((id >> (8 * len)) != 0) len += 1
    Array.tabulate(len)(i => ((id >> (8 * (len - 1 - i))) & 0xff).toByte)
  }

  private def el(id: Long, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    ebmlId(id) ++ vintSize(body.length.toLong) ++ body
  }

  private def uintBody(v: Long): Array[Byte] = {
    var len = 1
    while (len < 8 && (v >> (8 * len)) != 0) len += 1
    Array.tabulate(len)(i => ((v >> (8 * (len - 1 - i))) & 0xff).toByte)
  }

  /** A minimal valid WebM: EBML header (DocType webm) + Segment(Info with
    * TimestampScale 1 ms + float Duration, Tracks with one video
    * TrackEntry carrying PixelWidth/PixelHeight and optional audio
    * entries). No Clusters — metadata-only, like a streamed header. */
  def webmPayload(id: Long, width: Int, height: Int, durationMs: Long,
      nTracks: Int): Array[Byte] = {
    val header = el(0x1A45DFA3L,
      el(0x4286L, uintBody(1)), // EBMLVersion
      el(0x42F7L, uintBody(1)), // EBMLReadVersion
      el(0x42F2L, uintBody(4)), // EBMLMaxIDLength
      el(0x42F3L, uintBody(8)), // EBMLMaxSizeLength
      el(0x4282L, "webm".getBytes(StandardCharsets.US_ASCII)), // DocType
      el(0x4287L, uintBody(2)), // DocTypeVersion
      el(0x4285L, uintBody(2))) // DocTypeReadVersion
    val durBits = java.lang.Double.doubleToLongBits(durationMs.toDouble)
    val info = el(0x1549A966L,
      el(0x2AD7B1L, uintBody(1000000L)), // TimestampScale: 1 ms in ns
      el(0x4489L, Array.tabulate(8)(i => ((durBits >> (8 * (7 - i))) & 0xff).toByte)))
    val entries = (1 to nTracks).map { t =>
      val video = t == 1
      el(0xAEL,
        el(0xD7L, uintBody(t.toLong)), // TrackNumber
        el(0x73C5L, uintBody(0x1000L + t + id)), // TrackUID
        el(0x83L, uintBody(if (video) 1L else 2L)), // TrackType
        el(0x86L, (if (video) "V_VP9" else "A_OPUS")
          .getBytes(StandardCharsets.US_ASCII)), // CodecID
        if (video)
          el(0xE0L, el(0xB0L, uintBody(width.toLong)),
            el(0xBAL, uintBody(height.toLong)))
        else
          el(0xE1L, el(0xB5L, Array.tabulate(8) { i => // SamplingFrequency
            val bits = java.lang.Double.doubleToLongBits(48000.0)
            ((bits >> (8 * (7 - i))) & 0xff).toByte
          }))
      )
    }
    val tracksEl = el(0x1654AE6BL, entries: _*)
    header ++ el(0x18538067L, info, tracksEl)
  }

  /** EBML descent for the same facts. Returns None unless the DocType is a
    * Matroska family document with a parseable Segment. */
  def parseWebm(bytes: Array[Byte]): Option[VideoMeta] = {
    // Read an element id at off: length from the leading-bit class, value
    // kept verbatim. Returns (id, idLen) or null on malformed input.
    def readId(off: Int): (Long, Int) = {
      if (off >= bytes.length) return (-1L, 0)
      val b0 = bytes(off) & 0xff
      val len = Integer.numberOfLeadingZeros(b0) - 24 + 1
      if (len < 1 || len > 4 || off + len > bytes.length) return (-1L, 0)
      var v = b0.toLong
      var i = 1
      while (i < len) { v = (v << 8) | (bytes(off + i) & 0xff); i += 1 }
      (v, len)
    }
    def readSize(off: Int): (Long, Int) = {
      if (off >= bytes.length) return (-1L, 0)
      val b0 = bytes(off) & 0xff
      val len = Integer.numberOfLeadingZeros(b0) - 24 + 1
      if (len < 1 || len > 8 || off + len > bytes.length) return (-1L, 0)
      var v = (b0 & ((1 << (8 - len)) - 1)).toLong
      var i = 1
      while (i < len) { v = (v << 8) | (bytes(off + i) & 0xff); i += 1 }
      (v, len)
    }
    def readUint(off: Int, n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | (bytes(off + i) & 0xff); i += 1 }
      v
    }
    def readFloat(off: Int, n: Int): Double =
      if (n == 4) java.lang.Float.intBitsToFloat(readUint(off, 4).toInt).toDouble
      else if (n == 8) java.lang.Double.longBitsToDouble(readUint(off, 8))
      else -1.0
    // Generic child walk of [from, until).
    def walk(from: Int, until: Int)(f: (Long, Int, Int) => Unit): Unit = {
      var off = from
      var ok = true
      while (ok && off < until) {
        val (id, il) = readId(off)
        if (il == 0) ok = false
        else {
          val (sz, sl) = readSize(off + il)
          val body = off + il + sl
          if (sl == 0 || sz < 0 || body + sz > until) ok = false
          else { f(id, body, sz.toInt); off = body + sz.toInt }
        }
      }
    }
    var docType = ""
    var tsScale = 1000000L
    var durScaled = -1.0
    var tracks = 0
    var w = 0
    var h = 0
    walk(0, bytes.length) { (id, body, sz) =>
      if (id == 0x1A45DFA3L)
        walk(body, body + sz) { (cid, b2, s2) =>
          if (cid == 0x4282L) docType = new String(bytes, b2, s2, StandardCharsets.US_ASCII)
        }
      else if (id == 0x18538067L)
        walk(body, body + sz) { (cid, b2, s2) =>
          if (cid == 0x1549A966L)
            walk(b2, b2 + s2) { (iid, b3, s3) =>
              if (iid == 0x2AD7B1L) tsScale = readUint(b3, s3)
              else if (iid == 0x4489L) durScaled = readFloat(b3, s3)
            }
          else if (cid == 0x1654AE6BL)
            walk(b2, b2 + s2) { (tid, b3, s3) =>
              if (tid == 0xAEL) {
                tracks += 1
                walk(b3, b3 + s3) { (eid, b4, s4) =>
                  if (eid == 0xE0L && w == 0)
                    walk(b4, b4 + s4) { (vid, b5, s5) =>
                      if (vid == 0xB0L) w = readUint(b5, s5).toInt
                      else if (vid == 0xBAL) h = readUint(b5, s5).toInt
                    }
                }
              }
            }
        }
    }
    if (!Set("webm", "matroska").contains(docType) || durScaled < 0) None
    else Some(VideoMeta("webm",
      math.round(durScaled * (tsScale / 1e6)), tracks, w, h))
  }

  /** Container sniff + parse: MP4 by the size+'ftyp' signature, EBML by its
    * magic; anything else is unknown. */
  def parse(bytes: Array[Byte]): Option[VideoMeta] =
    if (bytes.length >= 8 &&
        new String(bytes, 4, 4, StandardCharsets.US_ASCII) == "ftyp") parseMp4(bytes)
    else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0x1A &&
        (bytes(1) & 0xff) == 0x45 && (bytes(2) & 0xff) == 0xDF &&
        (bytes(3) & 0xff) == 0xA3) parseWebm(bytes)
    else None
}
