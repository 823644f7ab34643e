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
      assert(d.meta.width >= 16 && d.meta.height >= 16)
      assert((d.meta.kind == "audio") == (d.meta.sampleRate == 16000))
      if (d.meta.kind == "image") {
        // The REAL javax.imageio decode must report the generated PNG's
        // true pixel dimensions.
        val (w, h) = Multimodal.pngDims(d.asset_id)
        assert(d.meta.width === w, s"decoded width for ${d.asset_id}")
        assert(d.meta.height === h, s"decoded height for ${d.asset_id}")
        val magic = d.media.take(4).map(_ & 0xff)
        assert(magic.sameElements(Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt)),
          "image payload is not a PNG")
      }
    }

    // Determinism: a second run produces identical features.
    val again = Multimodal.decode(Multimodal.assets(spark, sfDir).repartition(3), 4)
      .collect().map(d => d.asset_id -> d.features.toSeq).toMap
    rows.foreach(d => assert(again(d.asset_id) === d.features.toSeq))
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
}
