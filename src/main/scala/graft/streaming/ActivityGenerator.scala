package graft.streaming

import java.io.{File, PrintWriter}
import scala.util.Random

/** Seeded re-implementation of the reference's mock CSV generator (S8,
  * `data_generator/data_generator.py`): same columns, pools and
  * distributions — 5,000-user pool, 765-IP pool across three subnets,
  * watch time U(1,119), ~10% duplicate `log_id`s injected per file
  * (`data_generator.py:21-24, 31-41`) — but fully deterministic (explicit
  * seed, fixed base instant instead of `datetime.now()`), plus injected
  * invalid-row variants (FIXTURES.md §A) so quarantine behavior is testable:
  * null log_id / user_id, unparseable timestamp, null watch time, negative
  * watch time.
  */
object ActivityGenerator {

  /** What was generated, for test assertions. */
  final case class Summary(
      files: Int,
      totalRows: Int,
      invalidRows: Int,
      distinctValidLogIds: Int)

  private val basePool: IndexedSeq[String] =
    (0 until 255).map(i => s"192.168.1.$i") ++
      (0 until 255).map(i => s"10.0.0.$i") ++
      (0 until 255).map(i => s"172.16.0.$i")

  private val userPool: IndexedSeq[String] =
    (0 until 5000).map(i => f"user_$i%05d")

  /** Base instant (UTC seconds) replacing the reference's `datetime.now()`
    * so runs are reproducible: 2024-03-01T00:00:00Z. */
  private val baseEpoch: Long = 1709251200L

  /** Generate `numFiles` CSVs under `dir`. `invalidRate` rows are replaced
    * by a rotating invalid variant. Returns exact counts. */
  /** With `chronological = true`, file f's timestamps are drawn from the
    * f-th slice of the 100,000-minute window (oldest file first) instead of
    * every file spanning the whole window. That is how real log streams
    * arrive — roughly in time order — and it is what lets a watermarked
    * multi-batch drain behave: the watermark advances monotonically with
    * the batches, no batch's rows land wholesale behind a watermark set by
    * a later-timestamped earlier batch, and dedup state expires as the
    * drain progresses instead of accumulating. The default (false) keeps
    * the reference generator's all-files-span-everything shape, which is
    * the right fixture for single-batch tests and for exercising the
    * late-row path. */
  def generate(
      dir: String,
      numFiles: Int = 4,
      rowsPerFile: Int = 2000,
      invalidRate: Double = 0.05,
      seed: Long = 42L,
      chronological: Boolean = false): Summary = {
    new File(dir).mkdirs()
    val rnd = new Random(seed)
    var total = 0
    var invalid = 0
    val validLogIds = scala.collection.mutable.HashSet.empty[String]

    for (f <- 1 to numFiles) {
      val rows = rowsPerFile / 2 + rnd.nextInt(rowsPerFile / 2 + 1)
      val logIds = Array.fill(rows)("log_" + (100000000 + rnd.nextInt(900000000)))
      // ~10% duplicate log_ids within the file (data_generator.py:37-41).
      if (rows > 100) {
        val dupCount = math.min(rows / 10, 500)
        for (_ <- 0 until dupCount)
          logIds(rnd.nextInt(rows)) = logIds(rnd.nextInt(rows))
      }
      val out = new PrintWriter(new File(dir, f"user_activity_$f%03d.csv"))
      out.println("log_id,user_id,timestamp,ip_address,watch_time(min)")
      for (r <- 0 until rows) {
        var logId = logIds(r)
        var userId = userPool(rnd.nextInt(userPool.size))
        // ISO-8601, minutes 1..100000 before base (data_generator.py:33);
        // chronological mode confines file f to its own slice of that
        // window, oldest file first.
        val minutesBack =
          if (!chronological) 1 + rnd.nextInt(100000)
          else {
            val slice = math.max(1, 100000 / numFiles)
            val hi = (numFiles - f + 1) * slice // older end of file f's slice
            math.max(1, hi - rnd.nextInt(slice))
          }
        var ts = java.time.Instant
          .ofEpochSecond(baseEpoch - minutesBack * 60L)
          .toString.dropRight(1).replace("T", " ") // "yyyy-MM-dd HH:mm:ss"
        val ip = basePool(rnd.nextInt(basePool.size))
        var watch: String = (1 + rnd.nextInt(119)).toString
        val isInvalid = rnd.nextDouble() < invalidRate
        if (isInvalid) {
          invalid += 1
          rnd.nextInt(5) match {
            case 0 => logId = ""                    // null log_id
            case 1 => userId = ""                   // null user_id
            case 2 => ts = "not-a-timestamp"        // unparseable timestamp
            case 3 => watch = ""                    // null watch time
            case 4 => watch = "-7"                  // negative watch time
          }
        } else {
          validLogIds += logId
        }
        out.println(s"$logId,$userId,$ts,$ip,$watch")
        total += 1
      }
      out.close()
    }
    Summary(numFiles, total, invalid, validLogIds.size)
  }
}
