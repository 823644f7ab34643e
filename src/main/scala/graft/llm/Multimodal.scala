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
  * `mapInPandas` batch shape), deterministic outputs. The IMAGE path is a
  * real codec: payloads are genuine PNGs and `decode` reads them with the
  * JDK's `javax.imageio` (no extra dependencies). Audio/video decode
  * remains a STUB — this environment ships no audio/video codecs — with
  * deterministic fake dimensions derived from header bytes, each stub
  * point marked below.
  *
  * Scale notes: per-asset work is shuffle-free map work; payloads never
  * pass through a shuffle unless the caller aggregates them; feature
  * vectors (small arrays) are what downstream joins/ANN consume.
  */
object Multimodal {

  // Image codec work must not touch a display even on dev machines.
  System.setProperty("java.awt.headless", "true")

  /** Typed metadata carried next to the opaque payload. */
  final case class MediaMeta(kind: String, width: Int, height: Int, sampleRate: Int)

  final case class MediaAsset(asset_id: Long, media: Array[Byte], meta: MediaMeta)

  final case class DecodedAsset(
      asset_id: Long,
      media: Array[Byte],
      meta: MediaMeta,
      features: Array[Float],
      frames: Array[Array[Byte]])

  /** Synthesize a deterministic asset table from `documents`: image assets
    * carry a REAL PNG payload ([[pngPayload]]); audio/video carry the UTF-8
    * text bytes as an opaque stand-in. */
  def assets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val kind = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
        val media = if (kind == "image") pngPayload(id) else bytes
        MediaAsset(id, media, MediaMeta(kind, width = 0, height = 0, sampleRate = 0))
      }
  }

  /** Expected dimensions of [[pngPayload]] (shared with tests). */
  def pngDims(id: Long): (Int, Int) = (16 + (id % 48).toInt, 16 + (id % 31).toInt)

  /** A genuine PNG, deterministic in the id: dimensions from [[pngDims]],
    * pixels a fixed id-seeded gradient. The JDK's PNG encoder writes no
    * timestamps, so the byte stream is stable across runs. */
  def pngPayload(id: Long): Array[Byte] = {
    val (w, h) = pngDims(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((x * 31 + y * 17 + id) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode: images go through the REAL `javax.imageio` codec (PNG/BMP/GIF/
    * JPEG — whatever the JDK registry handles) and report true pixel
    * dimensions; audio/video dimensions are a STUB (no codecs in this
    * environment) derived deterministically from the first payload bytes.
    * Runs per partition so codec init/reuse amortizes across the batch,
    * exactly like a `mapInPandas` batch. */
  /** Shared image-decode attempt: None for non-image kinds, undecodable
    * bytes, or codec failures. javax.imageio readers throw unchecked
    * exceptions on malformed payloads (not just IOException), so anything
    * non-fatal falls back rather than killing the task. */
  private def tryDecodeImage(a: MediaAsset): Option[java.awt.image.BufferedImage] =
    if (a.meta.kind != "image") None
    else
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.media)))
      catch { case scala.util.control.NonFatal(_) => None }

  def decode(in: Dataset[MediaAsset], nFrames: Int = 4): Dataset[DecodedAsset] = {
    import in.sparkSession.implicits._
    in.mapPartitions { batch =>
      batch.map { a =>
        val img = tryDecodeImage(a)
        val meta = img match {
          case Some(i) => // real decoder-reported dimensions
            a.meta.copy(width = i.getWidth, height = i.getHeight, sampleRate = 0)
          case None =>
            val b0 = if (a.media.nonEmpty) a.media(0) & 0xff else 0
            val b1 = if (a.media.length > 1) a.media(1) & 0xff else 0
            a.meta.copy(
              width = 16 + (b0 % 64) * 16,     // STUB: decoder-reported width
              height = 16 + (b1 % 64) * 16,    // STUB: decoder-reported height
              sampleRate = if (a.meta.kind == "audio") 16000 else 0)
        }
        DecodedAsset(a.asset_id, a.media, meta,
          features = byteHistogram(a.media),
          frames = sampleFrames(a.media, nFrames))
      }
    }
  }

  /** REAL image resize: decode (javax.imageio), scale to `targetW`×`targetH`
    * with nearest-neighbor interpolation (bit-deterministic across JVMs,
    * unlike area-averaging), re-encode as PNG. Non-image payloads and
    * undecodable bytes pass through unchanged with a `resized=false` mark.
    * Runs per partition like [[decode]] — same `mapInPandas`-style batch
    * shape, codec init amortized across the batch. */
  final case class ResizedAsset(
      asset_id: Long, media: Array[Byte], meta: MediaMeta, resized: Boolean)

  def resize(in: Dataset[MediaAsset], targetW: Int, targetH: Int): Dataset[ResizedAsset] = {
    import in.sparkSession.implicits._
    in.mapPartitions { batch =>
      batch.map { a =>
        tryDecodeImage(a) match {
          case Some(src) =>
            val dst = new java.awt.image.BufferedImage(
              targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
            g.drawImage(src, 0, 0, targetW, targetH, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", bos)
            ResizedAsset(a.asset_id, bos.toByteArray,
              a.meta.copy(width = targetW, height = targetH), resized = true)
          case None =>
            ResizedAsset(a.asset_id, a.media, a.meta, resized = false)
        }
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
        FROM documents""")),

    // ------------------------------------------------------------------
    // Frame sampling over opaque video payloads: every OTHER 32-byte frame
    // (stride 64) is sliced out of the binary column and fingerprinted —
    // the byte-slicing shape of real video keyframe extraction, run on the
    // deterministic stand-in payloads (UTF-8 text bytes, [[Multimodal
    // .assets]] video kind = doc_id % 3 == 2). Pure codegen byte work:
    // sequence → explode → substr(binary) → md5, no shuffle at all until
    // a consumer aggregates. The oracle slices the identical BLOBs, so
    // offsets, frame counts, AND frame bytes are differentially checked.
    "llm_mm_frames" -> QuerySpec(
      fn = (s, dir) => Tables.load(s, dir, "documents")
        .filter(col("doc_id") % 3 === 2)
        .select(col("doc_id").as("asset_id"),
          encode(col("text"), "UTF-8").as("media"))
        .filter(length(col("media")) >= 32)
        .select(col("asset_id"), col("media"),
          explode(expr(
            "sequence(0, CAST((length(media) - 32) div 64 AS INT))")).as("frame_idx"))
        .select(col("asset_id"), col("frame_idx").cast("int").as("frame_idx"),
          md5(expr("substr(media, frame_idx * 64 + 1, 32)")).as("frame_digest")),
      oracle = Some("""
        -- Payload text is ASCII, so VARCHAR slicing == byte slicing (DuckDB
        -- has no BLOB substring); md5(varchar) hashes its UTF-8 bytes, the
        -- same bytes Spark's substr(binary) feeds its md5.
        SELECT asset_id, CAST(frame_idx AS INT) AS frame_idx,
               md5(substring(media, frame_idx * 64 + 1, 32)) AS frame_digest
        FROM (
          SELECT doc_id AS asset_id, text AS media,
                 unnest(generate_series(
                   0, (octet_length(encode(text)) - 32) // 64))
                   AS frame_idx
          FROM documents
          WHERE doc_id % 3 = 2 AND octet_length(encode(text)) >= 32)""")))
}
