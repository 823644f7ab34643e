package graft.tools

import graft.sources.SkippingIndex.{AutoIndex, FileFps}

/** Measures the driver residency of a ~100k-file skipping-index
  * registration in both summary regimes — the capacity evidence for the
  * ≤ 8 KB/file bound ([[graft.sources.SkippingIndex.FileFps]]):
  *
  *   - WORST case: every file fingerprint-saturated (all 65,536 16-bit
  *     fingerprints present → dense bitmap, exactly 8 KB each). This is
  *     the regime where the former uncapped `Array[Int]` layout held
  *     256 KB/file (measured below for 1k files and extrapolated — the
  *     uncapped form at 100k saturated files would need ~26 GB, which is
  *     precisely why it was replaced).
  *   - TYPICAL case: ~200 distinct fingerprints/file (a range/bucket
  *     layout where each file holds a narrow key slice → sparse arrays).
  *
  * Pure driver-side construction (no Spark session): the object under
  * measurement IS driver state; building it through a 100k-file parquet
  * table would measure the filesystem, not the index. Prints one JSON
  * line and appends it to SKIP_INDEX_RESIDENCY.json (or
  * SPARK_GRAFT_SKIPRES_OUT).
  *
  * Usage: runMain graft.tools.SkipIndexResidency [nFiles]
  */
object SkipIndexResidency {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(100000)

    def pathOf(i: Int): String =
      f"/warehouse/events/part-$i%05d-0000.snappy.parquet"

    // Worst case: saturated fingerprint space per file.
    val allFps = Array.range(0, 65536)
    val dense = AutoIndex("event_id",
      (0 until nFiles).map(i => pathOf(i) -> FileFps.of(allFps)).toMap)

    // Typical: ~200 fingerprints per file (deterministically spread).
    val typical = AutoIndex("event_id",
      (0 until nFiles).map { i =>
        val fps = Array.tabulate(200)(j => ((i * 31 + j * 327) % 65536))
          .distinct.sorted
        pathOf(i) -> FileFps.of(fps)
      }.toMap)

    // The former uncapped layout, measured at 1k files and extrapolated:
    // a saturated Array[Int] is 4 B × 65,536 = 256 KB/file.
    val uncappedPerFile = 16L + 4L * 65536

    // Prune behavior survives the representation: a point probe against
    // the typical index must keep only the files whose summary holds the
    // literal's fingerprint (here: a fingerprint present in file 0).
    val probeKeep = typical.fileFps.count(_._2.contains((0 * 31 + 5 * 327) % 65536))
    require(probeKeep < nFiles,
      "typical-index probe failed to prune — summaries are not selective")

    val json =
      s"""{"metric":"skip_index_residency","n_files":$nFiles,""" +
        s""""dense_bytes":${dense.residentBytes},""" +
        s""""dense_bytes_per_file":${dense.residentBytes / nFiles},""" +
        s""""typical_bytes":${typical.residentBytes},""" +
        s""""typical_bytes_per_file":${typical.residentBytes / nFiles},""" +
        s""""uncapped_bytes_per_file_saturated":$uncappedPerFile,""" +
        s""""probe_keep_files_typical":$probeKeep}"""
    // scalastyle:off println
    println(json)
    // scalastyle:on println
    val out = sys.env.getOrElse("SPARK_GRAFT_SKIPRES_OUT", "SKIP_INDEX_RESIDENCY.json")
    val p = java.nio.file.Paths.get(out)
    java.nio.file.Files.writeString(p,
      (if (java.nio.file.Files.exists(p)) java.nio.file.Files.readString(p) else "") +
        json + "\n")
    ()
  }
}
