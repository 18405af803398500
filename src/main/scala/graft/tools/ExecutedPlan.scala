package graft.tools

import org.apache.spark.sql.SparkSession

/** Run one declared query to completion and print the AQE-FINAL executed
  * plan — [[PlanDump]] captures the static plan, which hides runtime
  * decisions (stage reuse, AQE join demotions, coalesced partitions).
  * Usage: sbt "runMain graft.tools.ExecutedPlan <query> [sfDir]" */
object ExecutedPlan {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.count()
    // println, not log: the output IS the deliverable
    println(s"== executed plan: $name ==")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
