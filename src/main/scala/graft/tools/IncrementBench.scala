package graft.tools

import graft.GraftSession
import graft.llm.Dedup
import org.apache.spark.sql.functions._

/** Measures the cost of a FIXED-SIZE dedup increment against a growing
  * persisted band index — the claim under test: with
  * `broadcastIncrement = true` the per-batch plan broadcasts the
  * increment and SCANS the index (no index shuffle/sort), so batch cost
  * grows only with the index scan, while the default sort-merge path
  * re-sorts the whole index every batch.
  *
  * The index is materialized to parquet and read back (as in production —
  * a lazy lineage would re-run bandsOf over the corpus inside the join and
  * measure index construction instead of the probe).
  *
  * Usage: `runMain graft.tools.IncrementBench <sfDir> [<sfDir> ...]`
  * Prints one JSON line; write it to INCREMENT_BENCH.json to commit.
  */
object IncrementBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder("graft-increment-bench", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = args.toSeq.map { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), lower(col("text")).as("text"))
      val nDocs = docs.count()
      val scratch = graft.api.Scratch.dir("incbench")
      Dedup.bandsOf(docs).write.parquet(s"$scratch/bands")
      Dedup.setsOf(docs).write.parquet(s"$scratch/sets")
      // SortedRunIndex layout for the indexed mode: one delta fold + full
      // compaction (the steady state CurateStream.maintain converges to).
      import graft.sources.SortedRunIndex
      import graft.streaming.CurateStream
      val idxRoot = s"$scratch/sri"
      val tBuild0 = System.nanoTime()
      SortedRunIndex.append(Dedup.bandsOf(docs), s"$idxRoot/bands", 0)
      SortedRunIndex.append(Dedup.setsOf(docs), s"$idxRoot/sets", 0)
      CurateStream.maintain(spark, idxRoot, keepLast = 0)
      val buildSec = (System.nanoTime() - tBuild0) / 1e9
      // Fixed 100-doc increment: first-word-dropped variants of the first
      // 100 docs — every increment doc near-matches its source, so the
      // verify leg always has real work. The 1e8 offset keeps increment
      // ids disjoint from any index id at every measured scale (an
      // overlapping id would be treated as a partial-failure replay of
      // that doc and its pairs suppressed — the designed semantics).
      val batch = docs.filter(col("doc_id") < 100)
        .select((col("doc_id") + 100000000L).as("doc_id"),
          regexp_replace(col("text"), "^\\S+\\s+", "").as("text"))
      def timeMode(bcast: Boolean): (Double, Long) = {
        def once(): (Double, Long) = {
          val idxBands = spark.read.parquet(s"$scratch/bands")
          val idxSets = spark.read.parquet(s"$scratch/sets")
          val t0 = System.nanoTime()
          val n = Dedup.incrementPairs(batch, idxBands, idxSets, bcast).count()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val a = once(); val b = once()
        (math.min(a._1, b._1), b._2)
      }
      def timeIndexed(): (Double, Long) = {
        def once(): (Double, Long) = {
          val t0 = System.nanoTime()
          val n = Dedup.incrementPairsIndexed(batch, idxRoot).count()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val a = once(); val b = once()
        (math.min(a._1, b._1), b._2)
      }
      val (ti, ni) = timeIndexed()
      val (tb, nb) = timeMode(bcast = true)
      val (tm, nm) = timeMode(bcast = false)
      require(nb == nm && nb == ni,
        s"mode outputs differ: bcast=$nb merge=$nm indexed=$ni")
      (dir, nDocs, ti, tb, tm, buildSec, nb)
    }

    val json = results.map { case (dir, n, ti, tb, tm, bu, np) =>
      s""""$dir":{"docs":$n,"indexed_sec":${f"$ti%.2f"},"bcast_sec":${f"$tb%.2f"},"merge_sec":${f"$tm%.2f"},"index_build_sec":${f"$bu%.2f"},"pairs":$np}"""
    }.mkString("{", ",", "}")
    println(json)
    spark.stop()
  }
}
