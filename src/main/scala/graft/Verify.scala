package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // Optional extra args: restrict to the named queries (local iteration).
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark: SparkSession =
      GraftSession.builder("graft-verify", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Queries are independent and the session is thread-safe; running a few
    // concurrently overlaps their planning/IO gaps and roughly halves the
    // wall clock of the full 60+-query dump.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(4, cpus / 2)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val failed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val declared = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.isEmpty || only(name) }
    val futures = declared.map { case (name, fn) =>
      scala.concurrent.Future {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          failed.add(name)
          // A failed query must still appear in the correctness report
          // (as an obvious mismatch), never silently shrink it: write a
          // one-row sentinel whose schema can't match any oracle.
          try {
            import spark.implicits._
            Seq(Option(e.getMessage).getOrElse(e.getClass.getName))
              .toDF("__error").coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
          } catch { case e2: Throwable =>
            System.err.println(s"[verify] $name sentinel write failed: ${e2.getMessage}")
          }
        }
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration.Inf)
    pool.shutdown()
    // Registry-vs-output contract: one result dir per declared query, no
    // silent drops. (Sentinels above make this unconditionally true unless
    // even the sentinel write failed — then scream.)
    val missing = declared.map(_._1).filterNot(n =>
      new java.io.File(s"$outDir/$n").isDirectory)
    if (missing.nonEmpty)
      System.err.println(
        s"[verify] REGISTRY VIOLATION: ${missing.size} declared queries " +
        s"produced no output: ${missing.sorted.mkString(", ")}")
    if (!failed.isEmpty)
      System.err.println(
        s"[verify] ${failed.size}/${declared.size} queries FAILED: " +
        failed.toArray.toSeq.map(_.toString).sorted.mkString(", "))
    else
      System.err.println(
        s"[verify] all ${declared.size} declared queries produced output")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
