package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for q23_simhash_dups at a given SF dir: where do the
  * ~1.5 s go at sf0.1 — signature materialization, banding, or the
  * attach+verify tail? Each stage is timed over `reps` warm passes (min
  * reported) so JIT/codegen warmth matches the bench's steady state.
  * Usage: sbt "runMain graft.tools.Q23Probe [sfDir] [reps]"
  */
object Q23Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(label: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[q23probe] $label%-34s min=${ts.min}%.3f " +
        s"all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    System.err.println(s"[q23probe] docs=${docs.count()}")

    // stage A: the signature frame build + localCheckpoint (as q23 does)
    def buildFrame() = graft.ext.Dedup.materialize(
      docs.select(col("doc_id").as("id"),
        graft.ext.Dedup.minhashSignature(col("text"), numHashes = 64, shingleN = 3)
          .as("msig"),
        graft.ext.Dedup.simhash128(col("text")).as("ssig")))
    timed("A frame materialize (sig ckpt)") { buildFrame().count(): Unit }

    val frame = buildFrame()
    // stage B: banding + candidate prefilter only
    timed("B multiFamily candidates") {
      graft.ext.Dedup.multiFamilyDupCandidates(frame, "id", "msig", "ssig",
        mBands = 16, estThreshold = 0.75, maxHamming = 3, sBands = 4)
        .count(): Unit
    }

    // stage C: lazy shingle frame scan+shingle alone (one full pass)
    val shf = docs.select(col("doc_id").as("id"),
      graft.ext.Dedup.shingles(col("text"), 3).as("sh"))
    timed("C shingle pass (count-only)") {
      shf.write.format("noop").mode("overwrite").save()
    }

    // stage D: full q23 as declared
    timed("D full q23") {
      graft.SparkEntry.queries("q23_simhash_dups")(spark, dir).count(): Unit
    }

    // stage E: candidates + attach + verify with a PRE-BUILT frame (D minus A)
    val cand = graft.ext.Dedup.multiFamilyDupCandidates(frame, "id", "msig",
      "ssig", mBands = 16, estThreshold = 0.75, maxHamming = 3, sBands = 4)
    timed("E attach+verify (frame warm)") {
      graft.ext.Dedup.attachPairPayloadsAuto(cand, frame, shf, "id", "sh",
          "id_a", "id_b")
        .select(col("id_a"), col("id_b"),
          graft.functions.TextHashFunctions.set_jaccard(col("sh_a"), col("sh_b"))
            .as("__j"))
        .where(col("__j") >= 0.9)
        .count(): Unit
    }
    spark.stop()
  }
}
