package graft

import graft.llm.{Dedup, MmFeatures, Multimodal, MultimodalQueries}

/** The decode-once contract: the whole image family shares ONE codec pass
  * per corpus, and the incremental appender's work is proportional to the
  * increment, never the table. */
class MmFeaturesSpec extends SparkSpec {

  private def nImages: Long =
    Multimodal.assets(spark, sfDir).filter(_.meta.kind == "image").count()

  test("phash + dedup + gate together decode each image exactly once") {
    val imgs = nImages
    val before = MmFeatures.decodeCount.get()
    val qs = MultimodalQueries.queries
    Seq("llm_mm_features", "llm_mm_phash", "llm_mm_dedup", "llm_mm_gate")
      .foreach { q => qs(q).fn(spark, sfDir).collect() }
    val decoded = MmFeatures.decodeCount.get() - before
    // First family query for this corpus in this JVM builds the feature
    // table (one decode per image); the other three read parquet. If the
    // table was already built by an earlier suite, zero decodes is also
    // correct — never MORE than one pass.
    assert(decoded == 0L || decoded == imgs,
      s"expected one decode pass ($imgs) or cache hit (0), saw $decoded")
    // And re-running the whole family is decode-free.
    val again = MmFeatures.decodeCount.get()
    Seq("llm_mm_phash", "llm_mm_dedup", "llm_mm_gate")
      .foreach { q => qs(q).fn(spark, sfDir).collect() }
    assert(MmFeatures.decodeCount.get() === again,
      "re-running the family must not re-decode")
  }

  test("appendBatch decodes only the increment and never rewrites old batches") {
    val dir = tempDir("mmfeat")
    val assets = Multimodal.assets(spark, sfDir)
    val b0 = assets.filter(a => (a.asset_id / 3) % 3 == 0)
    val b1 = assets.filter(a => (a.asset_id / 3) % 3 == 1)

    val c0 = MmFeatures.decodeCount.get()
    MmFeatures.appendBatch(dir, 0L, b0)
    val d0 = MmFeatures.decodeCount.get() - c0
    assert(d0 === b0.filter(_.meta.kind == "image").count(),
      "batch 0 decode work != batch 0 image count")
    val files0 = java.nio.file.Files.list(java.nio.file.Paths.get(dir, "batch=0"))
      .toArray.map(_.toString).filter(_.endsWith(".parquet")).sorted.toSeq
    val m0 = files0.map(f => java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(f)).toMillis)

    val c1 = MmFeatures.decodeCount.get()
    MmFeatures.appendBatch(dir, 1L, b1)
    val d1 = MmFeatures.decodeCount.get() - c1
    assert(d1 === b1.filter(_.meta.kind == "image").count(),
      "batch 1 decode work != batch 1 image count — increment touched the corpus")

    // Batch 0's files are byte-for-byte untouched by the second append.
    val files0b = java.nio.file.Files.list(java.nio.file.Paths.get(dir, "batch=0"))
      .toArray.map(_.toString).filter(_.endsWith(".parquet")).sorted.toSeq
    val m0b = files0b.map(f => java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(f)).toMillis)
    assert(files0b === files0 && m0b === m0, "append rewrote an earlier batch")

    // Read-back = union of increments, schema-narrow, and id-complete.
    val rows = MmFeatures.read(spark, dir)
    assert(rows.columns.toSeq ===
      Seq("asset_id", "w", "h", "phash_hi", "phash_lo"))
    val expected = (b0.filter(_.meta.kind == "image").count()
      + b1.filter(_.meta.kind == "image").count())
    assert(rows.count() === expected)

    // Re-appending the same batch id is idempotent (overwrite-own-partition
    // exactly-once), not duplicating.
    MmFeatures.appendBatch(dir, 1L, b1)
    assert(MmFeatures.read(spark, dir).count() === expected)
  }

  test("cross-modal pairs: both gates hold, no surviving near-dup images") {
    val qs = MultimodalQueries.queries
    val pairs = qs("llm_mm_pairs_export").fn(spark, sfDir).collect()
    assert(pairs.nonEmpty, "export must be non-vacuous at fixture scale")
    pairs.foreach { r =>
      val (w, h, tok, lang) =
        (r.getInt(3), r.getInt(4), r.getLong(2), r.getString(1))
      assert(math.min(w, h) >= 24 && math.max(w, h) <= 2 * math.min(w, h),
        "image gate leg violated")
      assert(tok >= 8 && Set("en", "fr", "es")(lang), "caption gate violated")
    }
    // Survivors carry no hamming<=6 near-dup pair among themselves: the
    // dedup leg really ran on the PAIRED population.
    val ids = pairs.map(_.getLong(0)).toSet
    val feats = graft.llm.MmFeatures.features(spark, sfDir).collect()
      .filter(r => ids(r.getLong(0)))
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    for (a <- feats; b <- feats if a._1 < b._1) {
      val ham = java.lang.Long.bitCount(a._2 ^ b._2) +
        java.lang.Long.bitCount(a._3 ^ b._3)
      assert(ham > 6, s"near-dup pair survived export: ${a._1}, ${b._1}")
    }
  }

  test("audio dedup: non-vacuous classes, one keeper each, decode-derived") {
    val rows = MultimodalQueries.queries("llm_mm_audio_dedup")
      .fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    assert(rows.exists(_._2 > 1), "no duplicate class — dedup is vacuous")
    // Exactly one keeper per duplicate class, and it is the smallest id.
    val byClass = rows.groupBy(r => (r._1 % 16, r._1 % 5))
    byClass.values.foreach { members =>
      assert(members.count(_._3) === 1, "exactly one keeper per class")
      assert(members.filter(_._3).head._1 === members.map(_._1).min)
      val size = members.head._2
      assert(members.forall(_._2 == size) && size === members.length,
        "group_size must equal the decoded class population")
    }
  }

  test("feature table matches a fresh standalone decode bit-for-bit") {
    val fresh = MmFeatures.decodeFeatures(Multimodal.assets(spark, sfDir))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))).toMap
    val table = MmFeatures.features(spark, sfDir)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(table === fresh)
    assert(fresh.size.toLong === nImages)
  }
}
