package graft.tools

import graft.store.SegmentStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest-path scale rehearsal — the blind spot the query-path rehearsal
  * (ScaleUp/ScaleInvariants) never covered: `SegmentStore.write` /
  * `appendBatch` timed against CHUNK COUNT, plus the reader-visibility
  * snapshot claim under a concurrent appender.
  *
  * The single-pass staging design (one `partitionBy("dt")` job + per-chunk
  * renames) makes these the invariants:
  *
  *  - WRITE TIME IS FLAT IN CHUNK COUNT: ingesting the same rows split
  *    into 4, 16, or 64 day-chunks must cost ~the same wall-clock and the
  *    same number of Spark jobs. The pre-round-7 per-chunk filter loop was
  *    O(chunks × corpus): 64 chunks cost ~16× the 4-chunk run.
  *  - BYTES WRITTEN / SOURCE BYTES ≈ 1 (no-rollup ingest, same codec):
  *    the staging write materializes each source row exactly once; a
  *    re-scan design reads N× but also a naive chunk-splitting design can
  *    write small-file overhead — the ratio is reported per chunk count.
  *  - READER NEVER SEES A PARTIAL BATCH: concurrent `appendBatch` + reader
  *    loop (the IngestSpec race at 100+ iterations and real data sizes) —
  *    every observed count is a whole number of batches and monotone.
  *
  * Usage: `sbt "runMain graft.tools.IngestRehearsal <srcDir> [mult]"`
  * (srcDir = a TESTDATA-shaped dir, e.g. /root/testdata/sf0.1 or a ScaleUp
  * output; events.ts drives the synthetic chunk assignment; `mult`
  * replicates the source rows executor-side — ScaleUp's explode trick,
  * user_id shifted per replica so the chunk spread is preserved — to
  * rehearse one or two decades above the fixture without generating a
  * corpus on disk).
  */
object IngestRehearsal {
  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(1)
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

    var failures = 0
    def check(label: String)(ok: => Boolean, detail: => String): Unit = {
      val pass = try ok catch { case e: Throwable =>
        System.err.println(s"[ingest-rehearsal] ERROR $label: $e"); false }
      if (!pass) failures += 1
      println(s"[ingest-rehearsal] ${if (pass) "PASS" else "FAIL"} $label: $detail")
    }

    val ev = graft.sources.TableLoader.load(spark, srcDir, "events")
      .select(col("ts"), col("event_type"), col("user_id"), col("value"))
    val replicated =
      if (mult <= 1) ev
      else ev.withColumn("__r", explode(sequence(lit(0), lit(mult - 1))))
        .withColumn("user_id", col("user_id") + col("__r") * lit(1000000000L))
        .drop("__r")
    val src = replicated
      .localCheckpoint(true) // time the WRITE path, not the fixture read
    val rows = src.count()
    println(s"[ingest-rehearsal] source rows=$rows from $srcDir (mult=$mult)")

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def stableJobs(): Int = {
      var last = -1; var cur = jobs.get(); var spins = 0
      while (cur != last && spins < 100) {
        last = cur; Thread.sleep(100); cur = jobs.get(); spins += 1
      }
      cur
    }
    def dirBytes(p: java.nio.file.Path): Long = {
      val s = java.nio.file.Files.walk(p)
      try s.filter(f => f.toString.endsWith(".parquet"))
        .mapToLong(java.nio.file.Files.size).sum()
      finally s.close()
    }

    // --- write time vs chunk count (same rows, same codec) ---------------
    val chunkCounts = Seq(4, 16, 64)
    val results = chunkCounts.map { k =>
      val root = java.nio.file.Files.createTempDirectory(s"graft-ing-$k")
      val store = new SegmentStore(root.toString)
      // spread the SAME rows over exactly k day-chunks
      val framed = src.withColumn("__time",
        to_timestamp(date_add(lit("2024-01-01").cast("date"),
          pmod(col("user_id"), lit(k)).cast("int"))))
        .drop("ts")
      jobs.set(0)
      val t0 = System.nanoTime()
      store.write(framed, "bench")
      val sec = (System.nanoTime() - t0) / 1e9
      val nJobs = stableJobs()
      val m = store.readManifest("bench")
      val written = dirBytes(java.nio.file.Paths.get(root.toString, "bench"))
      check(s"write_${k}chunks_rowcount")(
        m.segments.map(_.rowCount).sum == rows && m.segments.size == k,
        f"chunks=${m.segments.size} rows=${m.segments.map(_.rowCount).sum} " +
          f"sec=$sec%.2f jobs=$nJobs bytes=${written / 1e6}%.1fMB")
      (k, sec, nJobs, written)
    }
    val (_, secs, jobCounts, bytes) = (results.map(_._1), results.map(_._2),
      results.map(_._3), results.map(_._4))
    check("write_jobs_flat_in_chunks")(jobCounts.max <= jobCounts.min + 1,
      s"jobs per ingest across ${chunkCounts.mkString("/")} chunks: " +
        jobCounts.mkString("/"))
    check("write_time_flat_in_chunks")(secs.max <= secs.min * 2.0 + 1.0,
      f"sec across ${chunkCounts.mkString("/")} chunks: " +
        secs.map(s => f"$s%.2f").mkString("/") +
        f" (per-chunk re-scan would be ~${chunkCounts.max / chunkCounts.min}x)")
    // no-GROWTH, not flat: splitting finer may legitimately compress BETTER
    // (the synthetic chunk key user_id%k clusters residues per partition, so
    // user_id delta-encodes tighter at k=64 — measured 21.5→5.4 MB at 10M
    // rows); what a broken design would show is bytes RISING with chunk
    // count (small-file/page overhead per chunk).
    check("write_bytes_no_growth_in_chunks")(
      bytes.max.toDouble / bytes.head <= 1.5,
      f"bytes across chunk counts: ${bytes.map(_ / 1e6).map(b => f"$b%.1f")
        .mkString("/")} MB (vs ${chunkCounts.head}-chunk baseline)")

    // --- appendBatch: same flatness on the append path -------------------
    val appendRoot = java.nio.file.Files.createTempDirectory("graft-ing-app")
    val appendStore = new SegmentStore(appendRoot.toString)
    val framed64 = src.withColumn("__time",
      to_timestamp(date_add(lit("2024-01-01").cast("date"),
        pmod(col("user_id"), lit(64)).cast("int"))))
      .drop("ts")
    jobs.set(0)
    val ta = System.nanoTime()
    appendStore.appendBatch(framed64, "bench", Some(1L))
    val appendSec = (System.nanoTime() - ta) / 1e9
    val appendJobs = stableJobs()
    check("append_64chunks_single_pass")(appendJobs <= 4,
      f"sec=$appendSec%.2f jobs=$appendJobs (pre-fix: 65+ jobs)")

    // --- reader visibility under concurrent append (snapshot claim) ------
    val raceRoot = java.nio.file.Files.createTempDirectory("graft-ing-race")
    val raceStore = new SegmentStore(raceRoot.toString)
    val batchRows = 5000
    def batch(b: Int): DataFrame = spark.range(batchRows).toDF("i")
      .select(to_timestamp(lit("2024-01-01 00:00:00")).as("__time"),
        concat(lit(s"b$b-"), col("i")).as("tag"))
    raceStore.write(batch(0), "race")
    val writerDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val writerFail = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val writer = new Thread(() => {
      try (1 to 30).foreach(b =>
        raceStore.appendBatch(batch(b), "race", Some(b.toLong)))
      catch { case t: Throwable => writerFail.set(t) }
      finally writerDone.set(true)
    })
    writer.start()
    var iters = 0
    var partial = 0L
    var monotone = true
    var last = 0L
    while ((!writerDone.get || iters < 100) && iters < 500) {
      val c = raceStore.read(spark, "race").count()
      if (c % batchRows != 0) partial = c
      if (c < last) monotone = false
      last = c
      iters += 1
    }
    writer.join()
    check("reader_snapshot_under_append")(
      writerFail.get == null && partial == 0L && monotone &&
        raceStore.read(spark, "race").count() == 31L * batchRows,
      s"iters=$iters partial=$partial monotone=$monotone " +
        s"writerFail=${Option(writerFail.get).map(_.toString).getOrElse("none")}")

    println(s"[ingest-rehearsal] ${if (failures == 0) "ALL PASS"
      else s"$failures FAILURES"}")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
