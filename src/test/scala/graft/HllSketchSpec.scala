package graft

import graft.engine.Engine
import graft.functions.{Hll, HllFunctions}
import graft.model.{Aggregator, Granularity}
import graft.store.{SegmentCatalog, SegmentStore}
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

/** Mergeable HLL sketch aggregate (SURVEY §7.2): accuracy, merge
  * associativity, and the full rollup round-trip (build at ingest → store
  * as binary → merge+finalize at query time). */
class HllSketchSpec extends SparkTestBase {

  import spark.implicits._

  test("sketch estimate within 5% of exact distinct") {
    val n = 50000
    val reg = Hll.emptySketch
    (1 to n).foreach(i => Hll.add(reg, i.toLong))
    val est = Hll.estimate(reg)
    assert(math.abs(est - n).toDouble / n < 0.05, s"est=$est for n=$n")
  }

  test("sketch estimate holds the 5% band ACROSS regimes, incl. n ≈ register count") {
    // the regime that broke at sf0.1: Spark's approx_count_distinct (rsd
    // 0.05) missed the documented ±5% band at n=1500 vs m=2048 registers.
    // Our estimator must hold the band through the linear-counting regime,
    // the transition at 2.5m, and the raw-HLL regime.
    for (n <- Seq(100, 500, 1500, 2048, 3000, 5120, 8000, 20000)) {
      val reg = Hll.emptySketch
      (1 to n).foreach(i => Hll.add(reg, i.toLong * 2654435761L)) // spread keys
      val est = Hll.estimate(reg)
      assert(math.abs(est - n).toDouble / n < 0.05, s"est=$est for n=$n")
    }
  }

  test("raw-column hyperUnique/cardinality estimates hold ±5% at n≈m (built-in HLL++ path)") {
    // engine-path regression for the sf0.1 q30 failure: a raw (non-sketch)
    // column at 1500 uniques per bucket must estimate within the band.
    // Raw columns route to approx_count_distinct(rsd 0.023) since round
    // 10; HllSketchAgg remains the sketch-typed/rollup-storage path.
    val n = 1500
    val df = (0 until 3).flatMap(b => (1 to n).map(u =>
      (Timestamp.from(java.time.Instant.parse(s"2024-01-0${b + 1}T00:00:00Z")),
        b * 1000000L + u)))
      .toDF("__time", "uid")
    val out = new Engine(spark,
      new graft.sources.MapCatalog(Map("hll_raw_band" -> df))).plan(
      """{"queryType":"timeseries","dataSource":"hll_raw_band",
        |"intervals":["2024-01-01T00:00:00Z/2024-01-04T00:00:00Z"],
        |"granularity":"day",
        |"aggregations":[
        |  {"type":"hyperUnique","name":"uu","fieldName":"uid"},
        |  {"type":"cardinality","name":"cc","fields":["uid"]}]}""".stripMargin)
      .collect()
    assert(out.length == 3)
    out.foreach { r =>
      val uu = r.getAs[Number]("uu").longValue()
      val cc = r.getAs[Number]("cc").longValue()
      assert(math.abs(uu - n).toDouble / n < 0.05, s"hyperUnique est=$uu for n=$n")
      assert(math.abs(cc - n).toDouble / n < 0.05, s"cardinality est=$cc for n=$n")
    }
  }

  test("merge of disjoint sketches ≈ union cardinality") {
    val a = Hll.emptySketch; val b = Hll.emptySketch
    (1 to 10000).foreach(i => Hll.add(a, i.toLong))
    (10001 to 20000).foreach(i => Hll.add(b, i.toLong))
    Hll.merge(a, b)
    val est = Hll.estimate(a)
    assert(math.abs(est - 20000).toDouble / 20000 < 0.05, s"est=$est")
  }

  test("merge of identical sketches is idempotent") {
    val a = Hll.emptySketch; val b = Hll.emptySketch
    (1 to 5000).foreach { i => Hll.add(a, i.toLong); Hll.add(b, i.toLong) }
    val before = Hll.estimate(a)
    Hll.merge(a, b)
    assert(Hll.estimate(a) == before)
  }

  test("DataFrame aggregate: build + estimate matches exact within 5%") {
    val df = (1 to 20000).map(i => (i % 7, s"user_${i % 3000}")).toDF("g", "u")
    // build per-group sketches, merge them in a second aggregation, finalize
    val merged = df.groupBy($"g")
      .agg(HllFunctions.hll_sketch_build($"u").as("sk"))
      .agg(HllFunctions.hll_sketch_merge($"sk").as("m"))
      .select(HllFunctions.hll_sketch_estimate($"m").as("est"))
      .collect().head.getAs[Long]("est")
    assert(math.abs(merged - 3000).toDouble / 3000 < 0.05, s"est=$merged")
  }

  test("HLL++ words finalize to the approx_count_distinct estimate " +
      "bit-exactly, split-merged or whole (r14 sketch partials)") {
    import graft.functions.HllppFunctions._
    val df = (1 to 20000).map(i => (i.toLong, s"u${i % 7331}"))
      .toDF("id", "u")
    val want = df.agg(approx_count_distinct(col("u"), 0.023)).head().getLong(0)
    // whole-corpus words → estimate
    val whole = df.agg(hllpp_sketch_words(col("u")).as("w"))
      .select(hllpp_estimate(col("w"))).head().getLong(0)
    assert(whole == want, s"whole=$whole want=$want")
    // per-half words merged driver-side (the partial-merge path's exact
    // mechanics) → the SAME estimate: register union is order-free
    val halves = Seq(df.where(col("id") % 2 === 0), df.where(col("id") % 2 === 1))
      .map(_.agg(hllpp_sketch_words(col("u"))).head().getAs[Array[Byte]](0))
    val acc = graft.functions.Hllpp.newBuffer()
    halves.foreach(graft.functions.Hllpp.mergeInto(acc, _))
    assert(graft.functions.Hllpp.estimate(acc) == want)
  }

  test("streaming windowed rollup can build HLL sketches; query merges them") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.nio.file.Files
    def ts(s: String): Timestamp = Timestamp.from(java.time.Instant.parse(s))
    implicit val sqlC: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long)]
    val stream = mem.toDF().toDF("__time", "event_type", "user_id")
    val store = new SegmentStore(Files.createTempDirectory("graft-hll-stream").toString)
    val ckpt = Files.createTempDirectory("graft-hll-ckpt").toString

    val q = graft.streaming.RealtimeIngest.windowedRollup(stream, store, "live_hll",
      granularity = "1 hour", watermark = "10 minutes", dims = Seq("event_type"),
      aggExprs = Seq(
        graft.functions.HllFunctions.hll_sketch_build(
          org.apache.spark.sql.functions.col("user_id")).as("uu_sketch"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt")),
      checkpointDir = ckpt)
    // window closes when watermark passes: emit 10:00 window via later event
    mem.addData((0 until 300).map(i =>
      (ts(f"2024-08-01T10:${i % 60}%02d:00Z"), "click", (i % 120).toLong)): _*)
    q.processAllAvailable()
    mem.addData((ts("2024-08-01T12:00:00Z"), "click", 1L))
    q.processAllAvailable()
    q.stop()

    val stored = store.read(spark, "live_hll")
    assert(stored.schema("uu_sketch").dataType == org.apache.spark.sql.types.BinaryType)
    val est = stored.select(HllFunctions.hll_sketch_estimate(
      HllFunctions.hll_sketch_merge(stored("uu_sketch"))).as("est"))
      .collect().head.getAs[Long]("est")
    assert(math.abs(est - 120).toDouble / 120 < 0.06, s"est=$est")
  }

  test("rollup segment with hyperUnique sketch: query merges stored sketches") {
    def ts(s: String): Timestamp = Timestamp.from(java.time.Instant.parse(s))
    val raw = (0 until 2000).map { i =>
      (ts(f"2024-07-01T${i % 24}%02d:00:00Z"), s"type_${i % 3}", (i % 400).toLong)
    }.toDF("__time", "event_type", "user_id")

    val store = new SegmentStore(Files.createTempDirectory("graft-hll").toString)
    store.write(raw, "ev_hll", rollup = Some((Granularity.Simple("hour"),
      Seq("event_type"), Seq(Aggregator.HyperUnique("uu", "user_id")))))

    // stored column is a binary sketch
    val stored = store.read(spark, "ev_hll")
    assert(stored.schema("uu").dataType == org.apache.spark.sql.types.BinaryType)

    // hyperUnique over the rolled-up table merges sketches, finalizes
    val engine = new Engine(spark, new SegmentCatalog(store))
    val est = engine.plan(
      """{"queryType":"timeseries","dataSource":"ev_hll",
        |"intervals":["2024-07-01T00:00:00Z/2024-07-02T00:00:00Z"],
        |"granularity":"all",
        |"aggregations":[{"type":"hyperUnique","name":"uu","fieldName":"uu"}]}""".stripMargin)
      .collect().head.getAs[Long]("uu")
    assert(math.abs(est - 400).toDouble / 400 < 0.05, s"est=$est")
  }
}
