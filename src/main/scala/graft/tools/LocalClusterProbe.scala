package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal multi-JVM feasibility probe: bring up `local-cluster[2,4,2048]`
  * (two separate executor JVMs under this driver), confirm both executors
  * register and run tasks, and force an executor-side load of a graft
  * native expression (closure + classpath check). Not a rehearsal — just
  * the canary that the container can launch worker JVMs at all. */
object LocalClusterProbe {
  def main(args: Array[String]): Unit = {
    // executors are launched by the SPARK_HOME worker scripts and do NOT
    // inherit sbt's classpath — hand them ours explicitly
    val cp = System.getProperty("java.class.path")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[2,4,2048]"))
      .config("spark.executor.extraClassPath", cp)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val execs = spark.sparkContext.parallelize(1 to 64, 16)
      .map(_ => org.apache.spark.SparkEnv.get.executorId).distinct().collect().sorted
    println(s"PROBE executors=${execs.mkString(",")}")

    // graft native expression evaluated ON executors (classpath + codegen)
    val n = spark.range(0, 1000).toDF("id")
      .withColumn("text", concat(lit("doc word alpha beta "), $"id".cast("string")))
      .select(graft.functions.TextHashFunctions.simhash64(
        graft.ext.Dedup.tokens($"text")).as("sig"))
      .where($"sig" =!= 0L).count()
    println(s"PROBE native_expr_rows=$n")

    // broadcast transport across JVMs
    val small = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val joined = spark.range(0, 100).toDF("k")
      .join(broadcast(small), "k").count()
    println(s"PROBE broadcast_rows=$joined")
    println(if (execs.length >= 2 && n == 1000 && joined == 2) "PROBE PASS" else "PROBE FAIL")
    spark.stop()
  }
}
