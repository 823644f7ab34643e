package graft.tools

import org.apache.spark.sql.SparkSession

import scala.sys.process._

/** App-scoped executor-pid discovery, shared by the fault-injection tools.
  *
  * A bare `pgrep -f CoarseGrainedExecutorBackend` matches EVERY standalone
  * executor on the host, so on a shared machine a `kill -9` could land on an
  * executor belonging to an unrelated Spark job. Standalone workers launch
  * executors with `--app-id <applicationId>` on the command line, so
  * filtering the pgrep pattern by this run's applicationId scopes the kill
  * set to executors that belong to THIS application and nothing else.
  */
object ExecutorKill {

  /** Pids of executor JVMs whose command line carries the given app id. */
  def executorPids(appId: String): Set[Int] =
    scala.util.Try(
      Seq("pgrep", "-f", s"CoarseGrainedExecutorBackend.*$appId").!!.trim
        .split("\\s+").filter(_.nonEmpty).map(_.toInt).toSet
    ).getOrElse(Set.empty)

  /** Pids for the current JVM's SparkSession (default session covers calls
    * from killer threads, where the thread-local active session is unset).
    */
  def executorPidsForThisApp(): Set[Int] =
    SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .map(s => executorPids(s.sparkContext.applicationId))
      .getOrElse(Set.empty)
}
