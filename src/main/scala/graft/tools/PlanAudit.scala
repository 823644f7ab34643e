package graft.tools

/** Plan-audit utility: prints each named query's distinct parquet
  * `ReadSchema`s (column-pruning evidence) and flags driver-side
  * anti-patterns visible in the executed plan string. Usage:
  *
  *   sbt "runMain graft.tools.PlanAudit <sfDir> <query...>"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanAudit <sfDir> <query...>")
    val dir = args.head
    val spark = graft.GraftSession("graft-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { q =>
      val plan = graft.SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      val scans = plan.split("\n").filter(_.contains("ReadSchema"))
        .map(_.replaceAll(".*ReadSchema: ", "").take(160)).distinct
      println(s"=== $q")
      scans.foreach(s => println(s"  scan $s"))
      if (plan.contains("BatchEvalPython") || plan.contains("ScalaUDF"))
        println("  WARN: UDF in plan")
      if (plan.contains("CartesianProduct"))
        println("  WARN: CartesianProduct in plan")
    }
    spark.stop()
  }
}
