package graft.sources

import graft.api.{Exact, QueryModule, QuerySpec}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format coverage beyond parquet and CSV: JSON-lines and ORC
  * round trips. Each entry writes a deterministic projection of `events` in
  * the format under test, reads it back with an explicit schema (inference
  * is never trusted), aggregates, and must match the oracle computed from
  * the original table — so a lossy or misread round trip cannot hash-match.
  */
object SourceFormats extends QueryModule {

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def scratch(name: String): String = graft.api.Scratch.dir(name)

  private def roundtrip(s: SparkSession, dir: String, format: String): DataFrame = {
    val tmp = scratch(s"fmt_$format")
    Tables.load(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"), col("props"))
      .write.format(format).mode("overwrite").save(tmp)
    s.read.schema(schema).format(format).load(tmp)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        Exact.dsum(col("value")).as("total"),
        countDistinct(col("event_id")).as("n_ids"))
  }

  private val oracle = s"""
    SELECT event_type, COUNT(*) AS n, ${Exact.sqlSum("value")} AS total,
           COUNT(DISTINCT event_id) AS n_ids
    FROM events GROUP BY event_type"""

  def queries: Map[String, QuerySpec] = Map(
    "src_jsonl_roundtrip" -> QuerySpec(
      fn = (s, dir) => roundtrip(s, dir, "json"),
      oracle = Some(oracle)),
    "src_orc_roundtrip" -> QuerySpec(
      fn = (s, dir) => roundtrip(s, dir, "orc"),
      oracle = Some(oracle)),

    // Compressed text-format round trip (gzip CSV). Whole-file codecs are
    // NOT splittable — one gzip stream = one read task — so at scale
    // parallelism must come from file COUNT, which the per-task write
    // already provides; the read is as parallel as the write was. Quoted
    // props (JSON carrying commas/quotes) exercise the quoting path both
    // directions; the schema is declared, never inferred.
    "src_csv_gzip_roundtrip" -> QuerySpec(
      fn = (s, dir) => {
        val tmp = scratch("fmt_csv_gz")
        Tables.load(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("value"), col("props"))
          .write.option("compression", "gzip").mode("overwrite").csv(tmp)
        s.read.schema(schema).csv(tmp)
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            Exact.dsum(col("value")).as("total"),
            countDistinct(col("event_id")).as("n_ids"))
      },
      oracle = Some(oracle)),

    // Hive-style partitioned parquet layout: write `events` partitioned by
    // event_type, read back with a partition predicate. The filter prunes
    // at the DIRECTORY level (PartitionFilters in the scan, zero IO for
    // excluded partitions) — the layout decision that turns a 100 TB full
    // scan into reading only the partitions a query names. The oracle is
    // the same aggregate over the unpartitioned original, so a partition
    // mis-write (lost rows, misassigned directory) hash-fails; PlanAssert
    // pins the pruning itself.
    "src_parquet_partitioned" -> QuerySpec(
      fn = (s, dir) => {
        val tmp = scratch("fmt_parquet_part")
        Tables.load(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("value"))
          .write.partitionBy("event_type").mode("overwrite").parquet(tmp)
        s.read.parquet(tmp)
          .filter(col("event_type").isin("click", "purchase"))
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            Exact.dsum(col("value")).as("total"),
            countDistinct(col("event_id")).as("n_ids"))
      },
      oracle = Some(s"""
        SELECT event_type, COUNT(*) AS n, ${Exact.sqlSum("value")} AS total,
               COUNT(DISTINCT event_id) AS n_ids
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY event_type""")),

    // File-level data skipping: the table is laid out by key range
    // (16 files via repartitionByRange — the layout decision), a one-scan
    // membership index records each file's distinct 16-bit key
    // fingerprints, and the point lookup reads ONLY files whose summary
    // may contain the key (no false negatives ⇒ exact results; false
    // positives cost one extra file). The Delta-stats/Iceberg-metadata
    // shape for plain parquet: at 100 TB a point lookup touches the tiny
    // index + ~1 candidate file instead of the whole table. The oracle is
    // the full-scan filter, so a pruning bug that drops a file loses rows
    // and hash-fails; SkippingIndexSpec asserts the pruning itself.
    "src_skipping_lookup" -> QuerySpec(
      fn = (s, dir) => {
        val tmp = scratch("fmt_skipidx")
        Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
          .repartitionByRange(16, col("user_id"))
          .write.mode("overwrite").parquet(tmp)
        val idx = SkippingIndex.build(s, tmp, "user_id")
        SkippingIndex.lookup(s, tmp, idx, "user_id", lit(42L))
          .select("event_id", "user_id", "event_type", "value")
      },
      oracle = Some("""
        SELECT event_id, user_id, event_type, value
        FROM events WHERE user_id = 42""")),

    // The PLANNER-AUTOMATIC form of the same skipping index
    // ([[graft.plans.ConsultSkippingIndex]], injected via
    // GraftExtensions): the table is registered once with
    // `enableAutoPrune` and the query site is a PLAIN filter — the
    // optimizer rule swaps the scan's FileIndex for the candidate files
    // itself (SkippingIndexSpec pins the plan: 1-4 files of 16, zero for
    // provably-absent keys). Same oracle as the manual lookup: a pruning
    // bug that drops a file loses rows and hash-fails.
    "src_skipping_auto" -> QuerySpec(
      fn = (s, dir) => {
        val tmp = scratch("fmt_skipauto")
        Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
          .repartitionByRange(16, col("user_id"))
          .write.mode("overwrite").parquet(tmp)
        SkippingIndex.enableAutoPrune(s, tmp, "user_id")
        s.read.parquet(tmp).filter(col("user_id") === 42L)
          .select("event_id", "user_id", "event_type", "value")
      },
      oracle = Some("""
        SELECT event_id, user_id, event_type, value
        FROM events WHERE user_id = 42""")),

    // Catalog-backed registration: tables live in `spark.catalog` as
    // EXTERNAL parquet entries (plus the encoding-adaptive `events` VIEW)
    // instead of per-session temp views — the metastore discipline that
    // lets every session address tables by name. This entry reads ONLY
    // through catalog names (`graft.events` is the view over
    // `graft.events_raw`), so a broken registration, a stale location, or
    // a wrong view branch hash-fails; CatalogSpec additionally asserts the
    // catalog read keeps parquet pushdown and survives session forks.
    // Durable-across-JVMs variant: SPARK_GRAFT_CATALOG=hive (Derby
    // metastore; see GraftSession).
    "src_catalog_tables" -> QuerySpec(
      fn = (s, dir) => {
        Tables.registerAllPersistent(s, dir)
        s.sql("""
          SELECT event_type, COUNT(*) AS n,
                 COUNT(DISTINCT user_id) AS n_users,
                 CAST(MIN(ts) AS TIMESTAMP_NTZ) AS first_ts,
                 CAST(MAX(ts) AS TIMESTAMP_NTZ) AS last_ts
          FROM graft.events GROUP BY event_type""")
      },
      oracle = Some("""
        SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
               MIN(ts) AS first_ts, MAX(ts) AS last_ts
        FROM events GROUP BY event_type""")),

    // The `binaryFile` source — how raw multimodal assets ENTER the engine
    // from an object store (one file per image/audio clip/video): stage the
    // deterministic Multimodal asset payloads as real files, ingest them
    // back through `spark.read.format("binaryFile")`, and prove the
    // ingested BYTES are the originals. Audio (RIFF/WAVE, closed-form
    // integer sawtooth) rows emit their FULL content as hex, which the
    // oracle re-derives byte-for-byte in SQL — the WAV header and every
    // little-endian PCM sample are reconstructed by integer arithmetic on
    // both engines; images (JDK PNG encoder output, not
    // SQL-reconstructable) are instead decoded through the real
    // `javax.imageio` codec and checked by their closed-form pixel
    // dimensions — a corrupted payload cannot decode to the right size;
    // video (real MP4/WebM containers) likewise parses through the real
    // [[graft.llm.VideoContainers]] box/EBML reader and is checked by its
    // closed-form presentation size. Per-file work is map-only (the binaryFile scan lists and
    // streams files; content is pruned when unselected); at 100 TB the
    // same read takes `pathGlobFilter`/partitioned prefixes and each file
    // stays a single task's unit of work.
    "src_binary_files" -> QuerySpec(
      fn = (s, dir) => {
        import s.implicits._
        val stage = scratch("fmt_binary")
        graft.llm.Multimodal.assets(s, dir).foreachPartition {
          (it: Iterator[graft.llm.Multimodal.MediaAsset]) =>
            it.foreach { a =>
              val ext = a.meta.kind match {
                case "image" => graft.llm.Multimodal.imageCodec(a.asset_id)
                case "audio" => "wav"
                case _ => if (a.asset_id % 2 == 0) "mp4" else "webm"
              }
              java.nio.file.Files.write(
                java.nio.file.Paths.get(stage, s"asset_${a.asset_id}.$ext"),
                a.media)
            }
        }
        s.read.format("binaryFile").load(stage)
          .select(col("path"), col("content")).as[(String, Array[Byte])]
          .map { case (path, content) =>
            val name = path.substring(path.lastIndexOf('/') + 1)
            val id = name.stripPrefix("asset_").takeWhile(_.isDigit).toLong
            val kind = name.substring(name.lastIndexOf('.') + 1) match {
              case "png" | "bmp" => "image"
              case "wav" => "audio"; case _ => "video"
            }
            if (kind == "image") {
              // Real codec decode (mixed PNG/BMP corpus): dimensions come
              // from the payload itself.
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(content))
              (id, kind, None: Option[Long], Some(img.getWidth),
                Some(img.getHeight), None: Option[String])
            } else if (kind == "video") {
              // Real container parse: dimensions come from the ingested
              // MP4 tkhd / Matroska Video element.
              val vm = graft.llm.VideoContainers.parse(content)
                .getOrElse(graft.llm.VideoContainers.VideoMeta("unknown", -1L, 0, 0, 0))
              (id, kind, None: Option[Long], Some(vm.width),
                Some(vm.height), None: Option[String])
            } else
              (id, kind, Some(content.length.toLong), None: Option[Int],
                None: Option[Int],
                Some(content.map("%02x".format(_)).mkString))
          }
          .toDF("asset_id", "kind", "n_bytes", "px_w", "px_h", "content_hex")
      },
      oracle = Some("""
        WITH base AS (
          SELECT doc_id AS asset_id, text,
                 CASE WHEN doc_id % 3 = 0 THEN 'image'
                      WHEN doc_id % 3 = 1 THEN 'audio'
                      ELSE 'video' END AS kind
          FROM documents),
        aud AS (
          SELECT asset_id, 256 + (asset_id % 16) * 64 AS n,
                 3 + (asset_id % 5) AS step
          FROM base WHERE kind = 'audio'),
        samp AS (
          SELECT a.asset_id,
                 string_agg(printf('%02x%02x', u & 255, u >> 8), ''
                            ORDER BY g.i) AS shex
          FROM aud a
          JOIN (SELECT i FROM generate_series(0, 2000) t(i)) g ON g.i < a.n
          CROSS JOIN LATERAL (
            SELECT ((g.i * a.step * 257) % 65536 + 32768) % 65536 AS u) c
          GROUP BY a.asset_id),
        wav AS (
          SELECT a.asset_id, CAST(44 + 2 * a.n AS BIGINT) AS n_bytes,
                 lower('52494646'
                   || printf('%02x%02x%02x%02x', (36 + 2*a.n) & 255,
                        ((36 + 2*a.n) >> 8) & 255, ((36 + 2*a.n) >> 16) & 255,
                        ((36 + 2*a.n) >> 24) & 255)
                   || '57415645666d7420' || '10000000' || '0100' || '0100'
                   || '803e0000' || '007d0000' || '0200' || '1000'
                   || '64617461'
                   || printf('%02x%02x%02x%02x', (2*a.n) & 255,
                        ((2*a.n) >> 8) & 255, ((2*a.n) >> 16) & 255,
                        ((2*a.n) >> 24) & 255))
                 || s.shex AS content_hex
          FROM aud a JOIN samp s USING (asset_id))
        SELECT b.asset_id, b.kind,
               CASE b.kind WHEN 'audio' THEN w.n_bytes END AS n_bytes,
               CASE b.kind
                    WHEN 'image' THEN CAST(16 + b.asset_id % 48 AS INT)
                    WHEN 'video' THEN CAST(160 + (b.asset_id % 8) * 16 AS INT)
                    END AS px_w,
               CASE b.kind
                    WHEN 'image' THEN CAST(16 + b.asset_id % 31 AS INT)
                    WHEN 'video' THEN CAST(96 + (b.asset_id % 5) * 24 AS INT)
                    END AS px_h,
               CASE b.kind WHEN 'audio' THEN w.content_hex END AS content_hex
        FROM base b LEFT JOIN wav w USING (asset_id)""")))
}
