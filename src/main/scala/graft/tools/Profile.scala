package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Repeated-run profiler for individual SparkEntry queries.
  * Usage: sbt "runMain graft.tools.Profile q05_groupby_day [sfDir] [reps]"
  * With no args: 3 reps of every query. Pass `explain` as query name to
  * print formatted plans instead.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names =
      if (args.isEmpty || args(0) == "all") SparkEntry.queries.keys.toSeq.sorted
      else Seq(args(0))

    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      if (args.length > 3 && args(3) == "explain") {
        println(s"=== $n ===")
        fn(spark, sfDir).explain("formatted")
      } else {
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"PROFILE $n%-24s min=${times.min}%.3f times=${times.map(t => f"$t%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
