package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic for minhash band-collision structure at scale: for a
  * given SF dir, prints per-geometry post-cap candidate estimates and the
  * composition of colliding buckets (how much mass is signature-identical
  * groups vs marginal agreement), so geometry decisions are measured, not
  * guessed. Usage: runMain graft.tools.BandProbe <sfDir> [bands,rows ...]
  */
object BandProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("target/testdata-sf10")
    val geoms = (if (args.length > 1) args.drop(1).toSeq else Seq("16,4", "12,5", "10,6", "8,8"))
      .map { s => val p = s.split(","); (p(0).toInt, p(1).toInt) }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    val frame = graft.ext.Dedup.materialize(
      docs.select(col("doc_id").as("id"),
        graft.ext.Dedup.minhashSignature(col("text"), 64, 3).as("sig")))

    // signature-identical groups: docs whose FULL 64-hash signature matches
    val sigGroups = frame.groupBy(hash(col("sig"))).agg(count(lit(1)).as("m"))
      .where(col("m") > 1)
      .agg(count(lit(1)), sum(col("m")),
        sum(col("m") * (col("m") - 1) / 2), max(col("m"))).head()
    println(s"[band-probe] sig-identical groups=${sigGroups.getLong(0)} " +
      s"docs=${sigGroups.get(1)} pairs=${sigGroups.get(2)} maxGroup=${sigGroups.get(3)}")

    for ((b, r) <- geoms) {
      val used = b * r
      val s = if (used == 64) col("sig") else slice(col("sig"), 1, used)
      val banded = frame.select(col("id"),
        posexplode(graft.functions.TextHashFunctions.band_keys(s, b))
          .as(Seq("band", "bucket")))
      val per = banded.groupBy("band", "bucket").agg(count(lit(1)).as("m"))
      val cap = 256
      val st = per.agg(
        count(lit(1)),
        coalesce(sum(when(col("m") > cap, 1L).otherwise(0L)), lit(0L)),
        coalesce(max(col("m")), lit(0L)),
        coalesce(sum(when(col("m") > cap, col("m") - 1)
          .otherwise(col("m") * (col("m") - 1) / 2)), lit(0L)),
        // mass from small-but-multi buckets only (2..cap)
        coalesce(sum(when(col("m") <= cap, col("m") * (col("m") - 1) / 2)
          .otherwise(0L)), lit(0L))).head()
      println(s"[band-probe] ${b}x$r: buckets=${st.getLong(0)} " +
        s"overflow=${st.get(1)} maxBucket=${st.get(2)} estPairs=${st.get(3)} " +
        s"smallBucketPairs=${st.get(4)}")
    }
    spark.stop()
  }
}
