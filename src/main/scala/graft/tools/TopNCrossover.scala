package graft.tools

import org.apache.spark.sql.SparkSession

/** Exact vs approximate topN at a high-cardinality dimension: measures
  * where Druid's per-segment approximation (context `approxTopN`, the
  * opt-in two-phase plan in `QueryPlanner.planTopN`) actually PAYS against
  * the exact hash-aggregate + TakeOrderedAndProject plan, and what it
  * costs in rank fidelity at that point. The exact plan already avoids
  * shuffling rows (partial aggregation shuffles one row per distinct dim
  * value), so the approximation can only win once the DISTINCT VALUE count
  * per partition is large enough that pre-truncating partials beats
  * shuffling them — the crossover this tool locates.
  *
  * Usage: `sbt "runMain graft.tools.TopNCrossover <sfDir> [passes]"` —
  * run against scaled dirs (ScaleUp multiplies the user_id keyspace per
  * replica) and record the table in PERFORMANCE.md.
  */
object TopNCrossover {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val engine = new graft.engine.Engine(spark,
      new graft.sources.ParquetDirCatalog(sfDir))
    def q(approx: Boolean): String =
      s"""{"queryType":"topN","dataSource":"events",
         |"intervals":["2024-01-01T00:00:00Z/2034-01-01T00:00:00Z"],
         |"granularity":"all",
         |"dimension":"user_id","threshold":100,
         |"metric":"sv",
         |${if (approx) "\"context\":{\"approxTopN\":\"true\"}," else ""}
         |"aggregations":[{"type":"doubleSum","name":"sv","fieldName":"value"},
         |  {"type":"count","name":"cnt"}]}""".stripMargin

    def run(approx: Boolean): (Double, Seq[(String, Double)]) = {
      val df = engine.plan(q(approx))
      val t0 = System.nanoTime()
      val rows = df.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, rows.map(r => (String.valueOf(r.getAs[Any]("user_id")),
        r.getAs[Double]("sv"))).toSeq)
    }

    val card = engine.plan(
      s"""{"queryType":"groupBy","dataSource":"events",
         |"intervals":["2024-01-01T00:00:00Z/2034-01-01T00:00:00Z"],
         |"granularity":"all","dimensions":["user_id"],
         |"aggregations":[{"type":"count","name":"c"}]}""".stripMargin).count()

    run(approx = false); run(approx = true) // JIT/listing warmup
    val exact = (1 to passes).map(_ => run(approx = false))
    val appr = (1 to passes).map(_ => run(approx = true))
    val exactSec = exact.map(_._1).min
    val apprSec = appr.map(_._1).min
    val eTop = exact.head._2
    val aTop = appr.head._2
    val overlap = eTop.map(_._1).toSet.intersect(aTop.map(_._1).toSet).size
    // worst per-value under-count among shared values (approx can only lose
    // contributions, never invent them)
    val eMap = eTop.toMap
    val maxErr = aTop.collect { case (k, v) if eMap.contains(k) =>
      math.abs(eMap(k) - v) / math.max(1e-9, math.abs(eMap(k))) }
      .foldLeft(0.0)(math.max)
    println(f"[topn-crossover] sf=$sfDir cardinality=$card " +
      f"exact=${exactSec}%.3fs approx=${apprSec}%.3fs " +
      f"speedup=${exactSec / apprSec}%.2fx top100_overlap=$overlap/100 " +
      f"maxSharedRelErr=$maxErr%.2e")
    spark.stop()
  }
}
