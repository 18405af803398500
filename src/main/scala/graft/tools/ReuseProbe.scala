package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal AQE exchange-reuse probe: a two-branch DAG (count side + join
  * side) hanging off one repartition(col) exchange, built from BUILT-IN
  * expressions only. Prints whether the runtime plan contains a reused
  * stage — ground truth for whether branch-sharing rewrites can rely on
  * AQE stage reuse in this Spark build, independent of custom-expression
  * canonicalization. */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = spark.range(100000)
      .select((col("id") % 1000).as("w"), (col("id") % 97).as("d"),
        col("id").as("pos"))
    val winsW = base.repartition(col("w"))
    val keys = winsW.select(col("w"),
        when(col("pos") >= 0, col("d")).as("d")).distinct()
      .groupBy("w").agg(count(lit(1)).as("df")).where(col("df") >= 2)
      .select("w")
    val hits = winsW.join(keys, "w").select("d", "pos")
    hits.write.format("noop").mode("overwrite").save()
    val ep = hits.queryExecution.executedPlan.toString
    val reused = "Reused".r.findAllIn(ep).length
    val exchanges = "Exchange hashpartitioning".r.findAllIn(ep).length
    println(s"REUSEPROBE reusedNodes=$reused hashExchanges=$exchanges")
    println(ep)
    spark.stop()
  }
}
