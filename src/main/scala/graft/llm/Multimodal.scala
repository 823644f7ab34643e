package graft.llm

import graft.api.{QueryModule, QuerySpec}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads ride through the engine as
  * opaque `binary` columns with a typed metadata struct; decode / feature
  * extraction / frame sampling run as partition-batched transforms over a
  * typed `Dataset`.
  *
  * The Spark-side plumbing here is real and tested — schema, encoders,
  * partition-preserving `mapPartitions` batching (the JVM analog of
  * `mapInPandas` batch shape), deterministic outputs. The codec itself is a
  * STUB (this environment has no image/audio libraries): `decodeStub`
  * derives fake-but-deterministic dimensions from the payload header bytes
  * where a real implementation would call the decoder. Each stub point is
  * marked below.
  *
  * Scale notes: per-asset work is shuffle-free map work; payloads never
  * pass through a shuffle unless the caller aggregates them; feature
  * vectors (small arrays) are what downstream joins/ANN consume.
  */
object Multimodal {

  /** Typed metadata carried next to the opaque payload. */
  final case class MediaMeta(kind: String, width: Int, height: Int, sampleRate: Int)

  final case class MediaAsset(asset_id: Long, media: Array[Byte], meta: MediaMeta)

  final case class DecodedAsset(
      asset_id: Long,
      media: Array[Byte],
      meta: MediaMeta,
      features: Array[Float],
      frames: Array[Array[Byte]])

  /** Synthesize a deterministic asset table from `documents` (UTF-8 payload
    * stands in for real image/audio bytes; ids and metadata are derived). */
  def assets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        MediaAsset(id, bytes,
          MediaMeta(
            kind = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video",
            width = 0, height = 0, sampleRate = 0))
      }
  }

  /** STUB decode: a real implementation would hand `media` to an image/audio
    * codec here. The fake derives dimensions deterministically from the
    * first payload bytes so tests can pin behavior. Runs per partition so a
    * real codec could amortize native init across the batch, exactly like a
    * `mapInPandas` batch. */
  def decode(in: Dataset[MediaAsset], nFrames: Int = 4): Dataset[DecodedAsset] = {
    import in.sparkSession.implicits._
    in.mapPartitions { batch =>
      // (real codec init would happen once per batch here)
      batch.map { a =>
        val b0 = if (a.media.nonEmpty) a.media(0) & 0xff else 0
        val b1 = if (a.media.length > 1) a.media(1) & 0xff else 0
        val meta = a.meta.copy(
          width = 16 + (b0 % 64) * 16,          // STUB: decoder-reported width
          height = 16 + (b1 % 64) * 16,         // STUB: decoder-reported height
          sampleRate = if (a.meta.kind == "audio") 16000 else 0)
        DecodedAsset(a.asset_id, a.media, meta,
          features = byteHistogram(a.media),
          frames = sampleFrames(a.media, nFrames))
      }
    }
  }

  /** Normalized 16-bin byte histogram — a real, deterministic feature
    * extractor over the payload (stands in for an embedding model). */
  def byteHistogram(bytes: Array[Byte]): Array[Float] = {
    val h = new Array[Float](16)
    if (bytes.isEmpty) return h
    var i = 0
    while (i < bytes.length) { h((bytes(i) & 0xff) / 16) += 1f; i += 1 }
    var j = 0
    while (j < 16) { h(j) /= bytes.length; j += 1 }
    h
  }

  /** Even payload slices — the frame-sampling shape for video (a real
    * implementation would seek keyframes; STUB slices bytes). */
  def sampleFrames(bytes: Array[Byte], n: Int): Array[Array[Byte]] =
    if (bytes.isEmpty) Array.fill(n)(Array.emptyByteArray)
    else {
      val step = math.max(1, bytes.length / n)
      (0 until n).map { k =>
        val from = math.min(k * step, bytes.length)
        val until = if (k == n - 1) bytes.length else math.min((k + 1) * step, bytes.length)
        bytes.slice(from, until)
      }.toArray
    }
}

/** Oracle-checked binary plumbing: the payload column behaves like a first-
  * class value (length, digest, magic bytes) on both engines. */
object MultimodalQueries extends QueryModule {
  def queries: Map[String, QuerySpec] = Map(
    "llm_mm_meta" -> QuerySpec(
      fn = (s, dir) => Tables.load(s, dir, "documents").select(
        col("doc_id").as("asset_id"),
        length(encode(col("text"), "UTF-8")).as("n_bytes"),
        md5(encode(col("text"), "UTF-8")).as("digest"),
        hex(encode(substring(col("text"), 1, 4), "UTF-8")).as("magic")),
      oracle = Some("""
        SELECT doc_id AS asset_id,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes,
               md5(text) AS digest,
               hex(encode(substring(text, 1, 4))) AS magic
        FROM documents""")))
}
