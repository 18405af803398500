package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Calibrates the per-ACTION driver tax at bench SF: a trivial plan's
  * action cost (job submit + schedule floor) vs a pipeline-sized plan's
  * (adds Catalyst analysis/optimization/physical planning + codegen
  * lookup). The difference is what plan-size reduction can recover;
  * the floor is what only action-count reduction can recover. */
object ActionTax {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timeIt(label: String, reps: Int)(f: => Unit): Unit = {
      f // warm
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      System.err.println(f"[actiontax] $label%-40s " +
        f"min=${times.min}%8.1f ms med=${times.sorted.apply(reps / 2)}%8.1f ms")
    }

    // floor: trivial plan, no shuffle
    timeIt("range(100).count", 7) { spark.range(100).count() }
    timeIt("range(100,1part).count", 7) { spark.range(0, 100, 1, 1).count() }
    timeIt("sc.range(100,1part).count", 7) {
      spark.sparkContext.range(0, 100, 1, 1).count() }
    timeIt("sc.range(100,32part).count", 7) {
      spark.sparkContext.range(0, 100, 1, 32).count() }
    timeIt("sc emptyJob", 7) {
      spark.sparkContext.parallelize(Seq(1), 1).count() }
    // one shuffle, tiny data
    val tiny = spark.range(1000).select((col("id") % 10).as("k"))
    timeIt("tiny groupBy.count", 7) { tiny.groupBy("k").count().count() }
    // pipeline-sized plan: documents scan + tokenize + explode + agg
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val biggish = docs
      .select(col("doc_id"),
        explode(graft.functions.TextHashFunctions.word_ngrams(
          split(lower(trim(col("text"))), "\\s+"), 2)).as("g"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    timeIt("docs bigram explode agg.count", 5) { biggish.count() }
    // the same data work, but re-planned each rep with a fresh column name
    var i = 0
    timeIt("same, fresh plan each rep", 5) {
      i += 1
      docs.select(col("doc_id"),
          explode(graft.functions.TextHashFunctions.word_ngrams(
            split(lower(trim(col("text"))), "\\s+"), 2)).as(s"g$i"))
        .groupBy("doc_id").agg(count(lit(1)).as(s"n$i")).count()
    }
    // localCheckpoint tax on a small frame
    val small = spark.range(10000).select(col("id"), (col("id") % 7).as("k"))
    timeIt("small localCheckpoint+count", 5) {
      small.localCheckpoint(false).count()
    }
    spark.stop()
  }
}
