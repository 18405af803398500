package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for declared queries to files.
  * Usage: sbt "runMain graft.tools.PlanDump <outDir> [sfDir] [q1,q2,...]"
  * With no query list: every query in SparkEntry.queries. Output files are
  * `<outDir>/<query>.txt`. Plan capture only — no action is executed, so
  * AQE-final shapes are not included (see the bench for runtime numbers).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <outDir> [sfDir] [q1,q2,...]")
    val outDir = new java.io.File(args(0))
    outDir.mkdirs()
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names =
      if (args.length > 2)
        args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
          .flatMap(w => SparkEntry.queries.keys.toSeq.sorted.filter(_.contains(w)))
          .distinct
      else SparkEntry.queries.keys.toSeq.sorted

    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          new java.io.File(outDir, s"$n.txt").toPath,
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        System.err.println(s"[plandump] wrote $n")
      } catch {
        case t: Throwable =>
          System.err.println(s"[plandump] FAILED $n: ${t.getMessage}")
      }
    }
    spark.stop()
  }
}
