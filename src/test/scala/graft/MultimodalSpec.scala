package graft

import graft.llm.Multimodal

/** Multimodal plumbing: typed binary Dataset → partition-batched decode →
  * features/frames, deterministic and shape-correct. */
class MultimodalSpec extends SparkSpec {

  test("decode pipeline preserves rows, partitioning, and determinism") {
    val in = Multimodal.assets(spark, sfDir).repartition(5)
    val out = Multimodal.decode(in, nFrames = 4).cache()

    assert(out.count() === in.count())
    assert(out.rdd.getNumPartitions === 5) // mapPartitions keeps batching

    val rows = out.collect()
    rows.foreach { d =>
      assert(d.features.length === 16)
      val sum = d.features.sum
      assert(math.abs(sum - 1f) < 1e-3, s"histogram not normalized: $sum")
      assert(d.frames.length === 4)
      assert(d.frames.map(_.length).sum === d.media.length, "frames must tile the payload")
      if (d.meta.kind == "audio") {
        // REAL decode: the WAV parser must report the generator's format.
        assert(d.meta.sampleRate === 16000)
        assert(d.meta.width === 0 && d.meta.height === 0)
        val magic = d.media.take(4).map(_.toChar).mkString
        assert(magic === "RIFF", "audio payload is not a WAV")
      } else {
        assert(d.meta.width >= 16 && d.meta.height >= 16)
        assert(d.meta.sampleRate === 0)
      }
      if (d.meta.kind == "image") {
        // The REAL javax.imageio decode must report the generated image's
        // true pixel dimensions — through whichever codec the mixed
        // corpus assigned this id.
        val (w, h) = Multimodal.pngDims(d.asset_id)
        assert(d.meta.width === w, s"decoded width for ${d.asset_id}")
        assert(d.meta.height === h, s"decoded height for ${d.asset_id}")
        val magic = d.media.take(2).map(_ & 0xff)
        Multimodal.imageCodec(d.asset_id) match {
          case "png" =>
            assert(magic.sameElements(Array(0x89, 'P'.toInt)),
              s"payload for ${d.asset_id} is not a PNG")
          case "bmp" =>
            assert(magic.sameElements(Array('B'.toInt, 'M'.toInt)),
              s"payload for ${d.asset_id} is not a BMP")
        }
      }
    }

    // Determinism: a second run produces identical features.
    val again = Multimodal.decode(Multimodal.assets(spark, sfDir).repartition(3), 4)
      .collect().map(d => d.asset_id -> d.features.toSeq).toMap
    rows.foreach(d => assert(again(d.asset_id) === d.features.toSeq))
  }

  test("audio decode runs the real WAV codec and reproduces the generator's samples") {
    val feats = Multimodal.decodeAudio(Multimodal.assets(spark, sfDir).repartition(4))
      .collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      // Decoder-reported format facts.
      assert(f.sample_rate === 16000)
      assert(f.channels === 1)
      assert(f.bits === 16)
      assert(f.n_frames === Multimodal.wavFrames(f.asset_id).toLong)
      // The decoded samples must be the generator's integers EXACTLY —
      // recompute both features from the closed form and compare.
      val n = Multimodal.wavFrames(f.asset_id)
      var sumSq = 0L; var zc = 0L; var prevNeg = false
      (0 until n).foreach { i =>
        val s = Multimodal.wavSample(f.asset_id, i)
        sumSq += s.toLong * s
        val neg = s < 0
        if (i > 0 && neg != prevNeg) zc += 1
        prevNeg = neg
      }
      assert(f.sum_sq === sumSq, s"energy mismatch for asset ${f.asset_id}")
      assert(f.zero_cross === zc, s"zero-cross mismatch for asset ${f.asset_id}")
    }
    // Every audio-kind asset decodes (none dropped by the codec).
    val audioIn = Multimodal.assets(spark, sfDir).filter(_.meta.kind == "audio").count()
    assert(feats.length.toLong === audioIn)
  }

  test("video containers: MP4/WebM write → sniff → parse roundtrip; defensive on junk") {
    import graft.llm.VideoContainers
    (0L until 40L).foreach { i =>
      val id = i * 3 + 2 // the video-kind id lattice
      val (w, h, dur, tracks) = Multimodal.videoParams(id)
      val bytes = Multimodal.videoPayload(id)
      val vm = VideoContainers.parse(bytes).getOrElse(
        fail(s"container for id $id did not parse"))
      assert(vm.container === (if (id % 2 == 0) "mp4" else "webm"))
      assert(vm.durationMs === dur, s"duration for id $id")
      assert(vm.nTracks === tracks, s"tracks for id $id")
      assert(vm.width === w && vm.height === h, s"dims for id $id")
    }
    // Defensive: junk, truncation, and lying sizes must return None, not
    // throw — a 100 TB landing zone contains all three.
    assert(VideoContainers.parse(Array.emptyByteArray).isEmpty)
    assert(VideoContainers.parse("not a container at all".getBytes).isEmpty)
    val good = Multimodal.videoPayload(2L)
    (1 until good.length by 7).foreach { cut =>
      VideoContainers.parse(good.take(cut)) // must not throw
    }
    val lying = good.clone()
    lying(0) = 0x7f.toByte // corrupt the first box size
    VideoContainers.parse(lying) // must not throw
    val goodWebm = Multimodal.videoPayload(5L)
    (1 until goodWebm.length by 7).foreach { cut =>
      VideoContainers.parse(goodWebm.take(cut)) // must not throw
    }
  }

  test("audio containers: MP3/OGG write → sniff → parse roundtrip; CRC real; defensive") {
    import graft.llm.AudioContainers
    (0L until 40L).foreach { i =>
      val id = i * 3 + 1 // the audio-kind id lattice
      val (rate, channels, kbps, mp3Frames, oggSamples) = Multimodal.audioParams(id)
      val am = AudioContainers.parse(Multimodal.audioContainerPayload(id))
        .getOrElse(fail(s"audio container for id $id did not parse"))
      assert(am.container === (if (id % 2 == 0) "mp3" else "ogg"))
      assert(am.sampleRate === rate && am.channels === channels, s"id $id")
      assert(am.bitrateKbps === kbps, s"bitrate for id $id")
      val wantMs =
        if (id % 2 == 0) mp3Frames.toLong * 1152 * 1000 / rate
        else oggSamples * 1000 / rate
      assert(am.durationMs === wantMs, s"duration for id $id")
    }
    // Defensive: junk and truncation return None, never throw.
    assert(AudioContainers.parse(Array.emptyByteArray).isEmpty)
    assert(AudioContainers.parse("definitely not audio".getBytes).isEmpty)
    val mp3 = Multimodal.audioContainerPayload(4L)
    val frameLen4 = mp3.length / Multimodal.audioParams(4L)._4
    (1 until mp3.length by 97).foreach { cut =>
      // A cut at an exact frame boundary IS a valid shorter stream; any
      // other prefix is damaged and must be rejected.
      if (cut % frameLen4 != 0)
        assert(AudioContainers.parse(mp3.take(cut)).isEmpty,
          s"truncated mp3 at $cut must not parse")
    }
    val ogg = Multimodal.audioContainerPayload(7L)
    val bosLen = 27 + 1 + 30 // a cut exactly after the BOS page is valid
    (1 until ogg.length by 13).foreach { cut =>
      if (cut != bosLen)
        assert(AudioContainers.parse(ogg.take(cut)).isEmpty,
          s"truncated ogg at $cut must not parse")
    }
    // The OGG CRC is genuinely checked: flip one payload bit -> None.
    val corrupt = ogg.clone()
    corrupt(ogg.length - 1) = (corrupt(ogg.length - 1) ^ 0x01).toByte
    assert(AudioContainers.parse(corrupt).isEmpty, "flipped bit must fail CRC")
    // An mp3 with a corrupted mid-stream sync is damaged -> None.
    val badSync = mp3.clone()
    badSync(frameLen4) = 0x00
    assert(AudioContainers.parse(badSync).isEmpty)
    // A VBR/mixed stream (valid frames, different rate mid-stream) must be
    // rejected, not priced off the first frame's parameters: id 4 is
    // 96 kbps @ 48000 Hz stereo; append a structurally-valid 44100 Hz frame.
    val (_, ch4, kbps4, _, _) = Multimodal.audioParams(4L)
    val mixed = mp3 ++ AudioContainers.mp3Payload(4L, kbps4, 44100, ch4, 1)
    assert(AudioContainers.parse(mixed).isEmpty, "mixed-rate mp3 must not parse")
    // A CRC-valid OGG page whose granule would overflow the duration
    // arithmetic (or a negative nominal bitrate) must be None, not a
    // negative duration: build real streams with the hostile fields.
    val (rate7, ch7, kbps7, _, _) = Multimodal.audioParams(7L)
    val hugeGranule = AudioContainers.oggPayload(7L, rate7, ch7, kbps7,
      totalSamples = Long.MaxValue / 500L)
    assert(AudioContainers.parse(hugeGranule).isEmpty, "overflowing granule")
    val negBitrate = AudioContainers.oggPayload(7L, rate7, ch7,
      bitrateKbps = -128, totalSamples = rate7.toLong)
    assert(AudioContainers.parse(negBitrate).isEmpty, "negative nominal bitrate")
  }

  test("resize re-encodes images at target dimensions, passes others through") {
    val in = Multimodal.assets(spark, sfDir)
    val out = Multimodal.resize(in, 32, 24).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      if (r.meta.kind == "image") {
        assert(r.resized, s"image ${r.asset_id} not resized")
        assert(r.meta.width === 32 && r.meta.height === 24)
        // The payload is a REAL re-encoded PNG at the target size.
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.media))
        assert(img.getWidth === 32 && img.getHeight === 24)
      } else {
        assert(!r.resized, s"non-image ${r.asset_id} must pass through")
      }
    }
    // Determinism (nearest-neighbor + stable PNG encoder): identical bytes.
    val again = Multimodal.resize(Multimodal.assets(spark, sfDir).repartition(3), 32, 24)
      .collect().map(r => r.asset_id -> r.media.toSeq).toMap
    out.foreach(r => assert(again(r.asset_id) === r.media.toSeq))
  }

  test("llm_mm_dedup: sound (hamming <= 6) and pigeonhole-complete for hamming <= 3") {
    import org.apache.spark.sql.functions.col
    val hashes = SparkEntry.specs("llm_mm_phash").fn(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1) << 32) | (r.getLong(2) & 0xffffffffL))).toMap
    val pairs = SparkEntry.specs("llm_mm_dedup").fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // Soundness: every reported pair's hamming is recomputed <= 6.
    pairs.foreach { case ((a, b), h) =>
      val d = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
      assert(d === h && d <= 6, s"pair ($a,$b) claims hamming $h, actual $d")
    }
    // Completeness: brute force over all image pairs — any pair at
    // hamming <= 3 MUST appear (four 16-bit chunks, pigeonhole; the
    // bucket cap cannot hide them at this corpus size).
    val ids = hashes.keys.toSeq.sorted
    for (i <- ids.indices; j <- i + 1 until ids.size) {
      val (a, b) = (ids(i), ids(j))
      val d = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
      if (d <= 3)
        assert(pairs.contains((a, b)),
          s"hamming-$d pair ($a,$b) missing — pigeonhole completeness broken")
    }
  }
  test("llm_mm_gate: funnel partitions the image corpus; drops only gate survivors") {
    import org.apache.spark.sql.functions._
    val out = graft.llm.MultimodalQueries.queries("llm_mm_gate").fn(spark, sfDir).cache()
    // The funnel legs partition n_images exactly, per source and in total.
    assert(out.filter(col("n_res_fail") + col("n_aspect_fail")
      + col("n_dup_dropped") + col("n_kept") =!= col("n_images")).count() === 0)
    val totals = out.agg(sum("n_images"), sum("n_kept")).collect()(0)
    val nImages = graft.sources.Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % 3 === 0).count()
    assert(totals.getLong(0) === nImages)
    // Gates recompute from the generator's closed form: a doc whose closed-
    // form dims fail a gate can never be counted as kept or dup-dropped.
    val byForm = (0L until nImages * 3 by 3L).map { id =>
      val (w, h) = Multimodal.pngDims(id)
      (math.min(w, h) >= 24, math.max(w, h) <= 2 * math.min(w, h))
    }
    val expRes = byForm.count(!_._1)
    val expAspect = byForm.count(x => x._1 && !x._2)
    val got = out.agg(sum("n_res_fail"), sum("n_aspect_fail")).collect()(0)
    assert(got.getLong(0) === expRes && got.getLong(1) === expAspect)
    // pct_kept is the single division it claims to be.
    out.collect().foreach { r =>
      assert(r.getAs[Double]("pct_kept")
        === r.getAs[Long]("n_kept").toDouble / r.getAs[Long]("n_images"))
    }
    out.unpersist()
  }

  test("all four JDK codecs decode through the real registry; lossless ones pixel-exact") {
    // PNG and BMP (the default-corpus pair) plus GIF (gray palette) and
    // JPEG — every payload a real ImageIO encode, every decode a real
    // registry sniff. Lossless codecs must reproduce the closed-form
    // gradient EXACTLY; JPEG gets dims + decode-determinism (its DCT
    // pixels are legitimately not closed-form).
    for (id <- Seq(0L, 3L, 6L, 9L, 12L, 45L); fmt <- Seq("png", "bmp", "gif", "jpg")) {
      val gray = fmt == "gif"
      val bytes = Multimodal.imageBytes(id, fmt, gray)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val (w, h) = Multimodal.pngDims(id)
      assert(img.getWidth === w && img.getHeight === h, s"$fmt dims for id $id")
      if (fmt != "jpg") {
        var bad = 0
        for (y <- 0 until h; x <- 0 until w) {
          val exp =
            if (gray) { val v = ((x * 31 + y * 17 + id) & 0xff).toInt; v * 0x010101 }
            else ((x * 31 + y * 17 + id) & 0xffffff).toInt
          if ((img.getRGB(x, y) & 0xffffff) != exp) bad += 1
        }
        assert(bad === 0, s"$fmt decode for id $id: $bad pixels diverge")
      } else {
        val again = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        for (y <- 0 until h; x <- 0 until w)
          assert(img.getRGB(x, y) === again.getRGB(x, y), "jpeg decode unstable")
      }
    }
    // The default corpus really is mixed: both codecs appear.
    val codecs = (0L until 60L by 3L).map(Multimodal.imageCodec).toSet
    assert(codecs === Set("png", "bmp"))
  }
}
