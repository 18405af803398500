package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bisects the q23 signature-frame materialization at a given SF dir:
  * times each column combination's localCheckpoint separately, repeated,
  * to localize which computation (minhash / simhash / shingles / the
  * checkpoint write itself) degrades across passes in one JVM. */
object CheckpointProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(
        f"[ckprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)

    (1 to reps).foreach { r =>
      timed(s"rep$r count-only") {
        docs.select(col("doc_id")).count()
      }
      timed(s"rep$r minhash") {
        docs.select(col("doc_id"),
          graft.ext.Dedup.minhashSignature(col("text"), 64, 3).as("msig"))
          .localCheckpoint(true).count()
      }
      timed(s"rep$r simhash") {
        docs.select(col("doc_id"),
          graft.ext.Dedup.simhash(col("text")).as("ssig"))
          .localCheckpoint(true).count()
      }
      timed(s"rep$r shingles") {
        docs.select(col("doc_id"),
          graft.ext.Dedup.shingles(col("text"), 3).as("sh"))
          .localCheckpoint(true).count()
      }
      timed(s"rep$r full-frame") {
        docs.select(col("doc_id"),
          graft.ext.Dedup.minhashSignature(col("text"), 64, 3).as("msig"),
          graft.ext.Dedup.simhash(col("text")).as("ssig"),
          graft.ext.Dedup.shingles(col("text"), 3).as("sh"))
          .localCheckpoint(true).count()
      }
    }
    spark.stop()
  }
}
