package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic for the q23 multi-family dedup pipeline: prints the
  * banded bucket-size distribution and candidate counts at a given SF dir,
  * so a superlinear scaling suspect can be localized (banding? prefilter?
  * verify join?) instead of guessed at. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    val frame = docs.select(col("doc_id").as("id"),
      graft.ext.Dedup.minhashSignature(col("text"), numHashes = 64, shingleN = 3)
        .as("msig"),
      graft.ext.Dedup.simhash(col("text")).as("ssig"))
      .localCheckpoint(true)
    System.err.println(s"[probe] docs=${frame.count()}")

    val mask = (1L << 16) - 1
    val banded = frame.select(col("id"),
      posexplode(concat(
        graft.functions.TextHashFunctions.band_keys(col("msig"), 16),
        array((0 until 4).map(b =>
          shiftright(col("ssig"), b * 16).bitwiseAND(mask)): _*)))
        .as(Seq("band", "bucket")))

    timed("bucket histogram") {
      val hist = banded.groupBy("band", "bucket").count()
        .select(col("count").as("n"))
        .groupBy("n").count().orderBy(col("n").desc)
      System.err.println("[probe] top bucket sizes (n, buckets):")
      hist.limit(12).collect().foreach(r =>
        System.err.println(s"[probe]   n=${r.getLong(0)} buckets=${r.getLong(1)}"))
      val stats = banded.groupBy("band", "bucket").count()
        .agg(sum(col("count") * (col("count") - 1) / 2).as("allPairs"),
          sum(when(col("count") <= 256, col("count") * (col("count") - 1) / 2)
            .otherwise(col("count"))).as("cappedPairs")).collect()(0)
      System.err.println(s"[probe] sum-pairs uncapped=${stats.get(0)} capped=${stats.get(1)}")
    }

    val cand = timed("multiFamily candidates") {
      graft.ext.Dedup.multiFamilyDupCandidates(frame, "id", "msig", "ssig",
        mBands = 16, estThreshold = 0.75, maxHamming = 3, sBands = 4).count()
    }
    System.err.println(s"[probe] candidates=$cand")
    spark.stop()
  }
}
