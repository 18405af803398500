package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level A/B for the q83 decade-ratio residual (VERDICT r16 #1):
  * q83 = dsirModel build (two exact-mode bigram-count shuffles + a
  * vocabulary-sized full-outer join over the 90% raw slice) + the
  * Gumbel top-k resample (ratio join + per-doc fold + top-k). The probe
  * times each stage separately on q83's exact corpus split, so the
  * residual behind q83's sf1→sf10 ratio gets a name backed by numbers:
  *
  *   model    dsirModel(target, raw, numBuckets = 0) — eager (the totals
  *            aggregate forces the count shuffles and the join)
  *   resample dsirResample on the PRE-BUILT model (what q95 pays per
  *            batch after its one-time artifact load)
  *   q83/q95  the full SparkEntry entries for cross-checking
  *            (q83 ≈ model + resample; q95 ≈ load + resample)
  *
  * Usage: sbt "runMain graft.tools.DsirProbe [sfDir] [reps]"
  * Emits one JSON line of per-stage clean mins to SPARK_GRAFT_BENCH_OUT
  * (default BENCH_dsir_probe.json).
  */
object DsirProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("target/testdata-sf10")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
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

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val target = docs.where(col("doc_id") % 5 === 0)
    val raw = docs.where(col("doc_id") % 5 =!= 0)

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // JIT/codegen warm at the smallest SF so the measured reps reflect
    // the stages, not first-run compilation
    graft.SparkEntry.queries("q83_dsir_resample")(
      spark, "/root/testdata/sf0.001").count()
    graft.SparkEntry.queries("q95_dsir_resample_amortized")(
      spark, "/root/testdata/sf0.001").count()

    // plan mode: print the resample plan against the in-memory model vs
    // the persisted one — the shapes behind the stage timings
    if (args.lift(2).contains("explain")) {
      val m1 = graft.ext.Vocabulary.dsirModel(target, raw, "text",
        numBuckets = 0)
      println("=== resample over IN-MEMORY model ===")
      graft.ext.Vocabulary.dsirResample(m1, raw, "doc_id", "text", n = 100)
        .explain("formatted")
      val tmp = java.nio.file.Files.createTempDirectory("dsir_probe").toString
      graft.ext.Vocabulary.saveDsirModel(m1, tmp)
      val m2 = graft.ext.Vocabulary.loadDsirModel(spark, tmp)
      println("=== resample over PERSISTED model ===")
      graft.ext.Vocabulary.dsirResample(m2, raw, "doc_id", "text", n = 100)
        .explain("formatted")
      spark.stop(); return
    }

    val stages = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def stage(name: String)(body: => Unit): Unit = {
      val ts = (1 to reps).map(_ => time(body))
      stages(name) = ts.min
      System.err.println(f"[dsir-probe] $name%-10s min=${ts.min}%.2f s " +
        s"(${ts.map(t => f"$t%.2f").mkString(",")})")
    }

    stage("model") {
      graft.ext.Vocabulary.dsirModel(target, raw, "text", numBuckets = 0): Unit
    }
    val model = graft.ext.Vocabulary.dsirModel(target, raw, "text",
      numBuckets = 0)
    stage("resample") {
      graft.ext.Vocabulary.dsirResample(model, raw, "doc_id", "text",
        n = 100).count(): Unit
    }
    stage("q83") {
      graft.SparkEntry.queries("q83_dsir_resample")(spark, dir).count(): Unit
    }
    stage("q95") {
      graft.SparkEntry.queries("q95_dsir_resample_amortized")(spark, dir)
        .count(): Unit
    }

    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", d)
    val line = "{\"metric\":\"dsir_probe\",\"unit\":\"sec\",\"sf\":\"" + dir +
      "\",\"reps\":" + reps + ",\"stages\":" +
      stages.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}") + "}"
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_dsir_probe.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(line)
    spark.stop()
  }
}
