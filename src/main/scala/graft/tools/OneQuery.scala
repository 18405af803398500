package graft.tools

import org.apache.spark.sql.SparkSession

/** Run a single SparkEntry query N times against a SF dir and print each
  * pass's wall seconds — isolates one query from the bench's shared-JVM
  * environment (accumulated checkpoint blocks, GC debt) to tell a real
  * per-query regression from cross-query pollution. */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled",
        sys.env.getOrElse("SPARK_GRAFT_UI", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to passes).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      System.err.println(
        f"[onequery] $name pass$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
