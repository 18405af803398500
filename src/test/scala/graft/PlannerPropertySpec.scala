package graft

import graft.engine.Engine
import graft.model._
import graft.plan.QueryPlanner
import graft.sources.MapCatalog
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import java.sql.Timestamp
import java.time.Instant

/** Property-based planner checks (SURVEY §5.3): the planner is total over
  * random query ADTs, and algebraic laws hold (filtered-agg = agg-of-
  * filtered; topN with K ≥ cardinality = groupBy+sort; union = double). */
class PlannerPropertySpec extends SparkTestBase {

  /** scalatest/scalacheck bridge isn't in the offline cache — drive Gen
    * directly with a fixed seed chain (deterministic, 25 cases). */
  private def forAllSampled[T](gen: Gen[T], cases: Int = 25)(body: T => Unit): Unit =
    (0 until cases).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  private lazy val events = (0 until 500).map { i =>
    (ts(f"2024-04-${1 + i % 10}%02dT${i % 24}%02d:00:00Z"),
      Seq("click", "view", "error")(i % 3), (i % 97).toDouble, (i % 13).toLong)
  }.toDF("__time", "event_type", "value", "uid")

  private lazy val catalog = new MapCatalog(Map("ev" -> events))

  private val interval = Interval.parse("2024-04-01T00:00:00Z/2024-04-11T00:00:00Z")

  // -- generators -----------------------------------------------------------

  private val genLeafFilter: Gen[Filter] = Gen.oneOf(
    Gen.oneOf("click", "view", "error", "zzz").map(v =>
      Filter.Selector("event_type", Some(v))),
    Gen.chooseNum(0, 96).map(v =>
      Filter.Bound("value", Some(v.toString), None, lowerStrict = false,
        upperStrict = false, "numeric")),
    Gen.chooseNum(0L, 12L).map(v => Filter.In("uid", Seq(v.toString))),
    Gen.const(Filter.Regex("event_type", "^[cv]")),
    Gen.const(Filter.Like("event_type", "%i%", None)),
    Gen.const(Filter.Search("event_type",
      SearchQuerySpec.InsensitiveContains("R"))),
  )

  private def genFilter(depth: Int): Gen[Filter] =
    if (depth <= 0) genLeafFilter
    else Gen.frequency(
      3 -> genLeafFilter,
      1 -> Gen.listOfN(2, genFilter(depth - 1)).map(Filter.And(_)),
      1 -> Gen.listOfN(2, genFilter(depth - 1)).map(Filter.Or(_)),
      1 -> genFilter(depth - 1).map(Filter.Not(_)),
    )

  private val genAgg: Gen[Aggregator] = Gen.oneOf(
    Gen.const(Aggregator.Count("cnt")),
    Gen.const(Aggregator.Sum("sv", "value", "double")),
    Gen.const(Aggregator.Sum("su", "uid", "long")),
    Gen.const(Aggregator.Max("mx", "value", "double")),
    Gen.const(Aggregator.Min("mn", "uid", "long")),
    genLeafFilter.map(f => Aggregator.Filtered(f, Aggregator.Count("fc"))),
  )

  private val genGranularity: Gen[Granularity] = Gen.oneOf(
    Granularity.All, Granularity.Simple("day"), Granularity.Simple("hour"),
    Granularity.Duration(7200000L, None))

  private val genTimeseries: Gen[Query.Timeseries] = for {
    f <- Gen.option(genFilter(2))
    aggs <- Gen.nonEmptyListOf(genAgg).map(_.distinctBy(_.name).take(3))
    g <- genGranularity
    desc <- Gen.oneOf(true, false)
  } yield Query.Timeseries(DataSource.Table("ev"), Seq(interval), g, f, aggs,
    Seq.empty, desc)

  private val genDimSpec: Gen[DimensionSpec] = Gen.oneOf(
    Gen.const(DimensionSpec.Default("event_type", "event_type")),
    Gen.const(DimensionSpec.Default("uid", "uid")),
    Gen.const(DimensionSpec.Extraction("event_type", "prefix",
      ExtractionFn.Substring(0, Some(2)))),
    Gen.const(DimensionSpec.Extraction("event_type", "up", ExtractionFn.Upper)),
  )

  private val genGroupBy: Gen[Query.GroupBy] = for {
    f <- Gen.option(genFilter(2))
    dims <- Gen.nonEmptyListOf(genDimSpec).map(_.distinctBy(_.outputName).take(2))
    aggs <- Gen.nonEmptyListOf(genAgg).map(_.distinctBy(_.name).take(2))
    g <- genGranularity
    limit <- Gen.option(Gen.chooseNum(1, 20))
  } yield Query.GroupBy(DataSource.Table("ev"), Seq(interval), g, dims, f, aggs,
    Seq.empty, None,
    Some(LimitSpec(dims.map(d => OrderByColumnSpec(d.outputName, "ascending",
      "lexicographic")), limit)))

  private val genTopN: Gen[Query.TopN] = for {
    f <- Gen.option(genFilter(1))
    dim <- genDimSpec
    k <- Gen.chooseNum(1, 5)
    g <- Gen.oneOf(Granularity.All, Granularity.Simple("day"))
    inverted <- Gen.oneOf(true, false)
  } yield Query.TopN(DataSource.Table("ev"), Seq(interval), g, dim, k,
    if (inverted) TopNMetricSpec.Inverted(TopNMetricSpec.Numeric("cnt"))
    else TopNMetricSpec.Numeric("cnt"),
    f, Seq(Aggregator.Count("cnt")), Seq.empty)

  // -- properties -----------------------------------------------------------

  test("planner is total: random groupBy queries plan and execute") {
    forAllSampled(genGroupBy, cases = 20) { q =>
      val df = QueryPlanner.plan(spark, q, catalog)
      val rows = df.collect()
      q.limitSpec.flatMap(_.limit).foreach(l => assert(rows.length <= l))
      q.dimensions.foreach(d => assert(df.columns.contains(d.outputName)))
    }
  }

  test("planner is total: random topN queries respect the threshold per bucket") {
    forAllSampled(genTopN, cases = 20) { q =>
      val rows = QueryPlanner.plan(spark, q, catalog).collect()
      val perBucket = rows.groupBy(_.getAs[Timestamp]("__time")).values
      perBucket.foreach(b => assert(b.length <= q.threshold))
    }
  }

  test("planner is total: random timeseries queries plan and execute") {
    forAllSampled(genTimeseries) { q =>
      val rows = QueryPlanner.plan(spark, q, catalog).collect()
      assert(rows != null)
      // every aggregation name must be an output column
      val cols = QueryPlanner.plan(spark, q, catalog).columns.toSet
      q.aggregations.foreach(a => assert(cols.contains(a.name)))
    }
  }

  test("law: query with filter F == query over pre-filtered source") {
    forAllSampled(genFilter(2), cases = 15) { f =>
      val q = Query.Timeseries(DataSource.Table("ev"), Seq(interval),
        Granularity.Simple("day"), Some(f),
        Seq(Aggregator.Count("cnt"), Aggregator.Sum("sv", "value", "double")),
        Seq.empty, descending = false)
      val direct = QueryPlanner.plan(spark, q, catalog).collect().map(_.toString).sorted

      val preFiltered = events.where(
        graft.expr.Compilers.filterCol(f, events.schema))
      val cat2 = new MapCatalog(Map("ev" -> preFiltered))
      val viaPre = QueryPlanner.plan(spark, q.copy(filter = None), cat2)
        .collect().map(_.toString).sorted
      assert(direct.sameElements(viaPre))
    }
  }

  test("law: topN with threshold >= cardinality == groupBy sorted by metric") {
    val topn = Query.TopN(DataSource.Table("ev"), Seq(interval),
      Granularity.All, DimensionSpec.Default("event_type", "event_type"), 100,
      TopNMetricSpec.Numeric("cnt"), None, Seq(Aggregator.Count("cnt")), Seq.empty)
    val topRows = QueryPlanner.plan(spark, topn, catalog)
      .select("event_type", "cnt").collect().map(r => (r.getString(0), r.getLong(1)))

    val gb = Query.GroupBy(DataSource.Table("ev"), Seq(interval),
      Granularity.All, Seq(DimensionSpec.Default("event_type", "event_type")),
      None, Seq(Aggregator.Count("cnt")), Seq.empty, None,
      Some(LimitSpec(Seq(OrderByColumnSpec("cnt", "descending", "numeric"),
        OrderByColumnSpec("event_type", "ascending", "lexicographic")), None)))
    val gbRows = QueryPlanner.plan(spark, gb, catalog)
      .select("event_type", "cnt").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(topRows.sameElements(gbRows))
  }

  test("law: keyset paging reconstructs the full sorted dataset exactly") {
    // heavy timestamp duplication stresses the within-timestamp offset:
    // 500 rows over only 40 distinct timestamps, random page sizes
    import com.fasterxml.jackson.databind.ObjectMapper
    val mapper = new ObjectMapper()
    val dup = (0 until 500).map { i =>
      (ts(f"2024-04-${1 + i % 5}%02dT${i % 8}%02d:00:00Z"),
        s"e${i % 7}", (i % 11).toDouble)
    }.toDF("__time", "event_type", "value")
    val engine = new Engine(spark, new MapCatalog(Map("pg" -> dup)))

    forAllSampled(Gen.zip(Gen.choose(1, 97), Gen.oneOf(false, true)), cases = 6) {
      case (pageSize, desc) =>
        var ids = "{}"
        val seen = scala.collection.mutable.ArrayBuffer.empty[(String, String, Double)]
        var pages = 0
        var done = false
        while (!done && pages < 600) {
          val json = engine.executeJson(
            s"""{"queryType":"select","dataSource":"pg",
              |"intervals":["2024-04-01T00:00:00Z/2024-04-11T00:00:00Z"],
              |"descending":$desc,
              |"dimensions":["event_type"],"metrics":["value"],
              |"context":{"useCache":"false"},
              |"pagingSpec":{"pagingIdentifiers":$ids,"threshold":$pageSize}}""".stripMargin)
          val r = mapper.readTree(json).get(0).get("result")
          val events = r.get("events")
          if (events.size() == 0) done = true
          else {
            (0 until events.size()).foreach { i =>
              val e = events.get(i)
              seen += ((e.get("__time").asText(), e.get("event_type").asText(),
                e.get("value").asDouble()))
            }
            ids = mapper.writeValueAsString(r.get("pagingIdentifiers"))
            pages += 1
          }
        }
        assert(seen.size == 500, s"pageSize=$pageSize desc=$desc got ${seen.size} rows")
        // concatenated pages must be in the requested time order...
        val tsSeq = seen.map(_._1).toSeq
        assert(tsSeq == (if (desc) tsSeq.sorted.reverse else tsSeq.sorted),
          s"page concatenation out of time order (desc=$desc)")
        // ...and form EXACTLY the source multiset (no loss, no duplicates)
        val expected = dup.collect().map(r =>
          (r.getAs[Timestamp]("__time").toInstant.toString,
            r.getAs[String]("event_type"), r.getAs[Double]("value"))).toSeq
        assert(seen.toSeq.groupBy(identity).view.mapValues(_.size).toMap ==
          expected.groupBy(identity).view.mapValues(_.size).toMap,
          s"pageSize=$pageSize desc=$desc multiset mismatch")
    }
  }

  test("law: keyset paging survives ONE timestamp spanning many consecutive pages") {
    // the keyset cursor's worst case (QueryPlanner.planSelect): the offset
    // part of the cursor skips rows already consumed AT the cursor
    // timestamp, so a timestamp holding threshold×N rows means N straight
    // pages re-enter the same µs with a growing offset. 400 rows on one
    // timestamp at threshold=7 → ~58 consecutive same-timestamp pages.
    import com.fasterxml.jackson.databind.ObjectMapper
    val mapper = new ObjectMapper()
    val rows =
      (0 until 5).map(i => (ts(f"2024-04-01T$i%02d:00:00Z"), s"pre$i", i.toDouble)) ++
      (0 until 400).map(i => (ts("2024-04-02T00:00:00Z"), s"e${i % 13}", (i % 17).toDouble)) ++
      (0 until 5).map(i => (ts(f"2024-04-03T$i%02d:00:00Z"), s"post$i", i.toDouble))
    val dup = rows.toDF("__time", "event_type", "value")
    val engine = new Engine(spark, new MapCatalog(Map("pg1" -> dup)))

    Seq(false, true).foreach { desc =>
      var ids = "{}"
      val seen = scala.collection.mutable.ArrayBuffer.empty[(String, String, Double)]
      var pages = 0
      var done = false
      while (!done && pages < 100) {
        val json = engine.executeJson(
          s"""{"queryType":"select","dataSource":"pg1",
            |"intervals":["2024-04-01T00:00:00Z/2024-04-04T00:00:00Z"],
            |"descending":$desc,
            |"dimensions":["event_type"],"metrics":["value"],
            |"context":{"useCache":"false"},
            |"pagingSpec":{"pagingIdentifiers":$ids,"threshold":7}}""".stripMargin)
        val r = mapper.readTree(json).get(0).get("result")
        val events = r.get("events")
        if (events.size() == 0) done = true
        else {
          (0 until events.size()).foreach { i =>
            val e = events.get(i)
            seen += ((e.get("__time").asText(), e.get("event_type").asText(),
              e.get("value").asDouble()))
          }
          ids = mapper.writeValueAsString(r.get("pagingIdentifiers"))
          pages += 1
        }
      }
      // exact page count: no page may come back short while rows remain
      assert(pages == math.ceil(410.0 / 7).toInt, s"desc=$desc took $pages pages")
      assert(seen.size == 410, s"desc=$desc got ${seen.size} rows")
      val expected = rows.map(r => (r._1.toInstant.toString, r._2, r._3))
      assert(seen.toSeq.groupBy(identity).view.mapValues(_.size).toMap ==
        expected.groupBy(identity).view.mapValues(_.size).toMap,
        s"desc=$desc multiset mismatch under pathological duplication")
    }
  }

  test("law: union datasource == doubled aggregates") {
    val single = Query.Timeseries(DataSource.Table("ev"), Seq(interval),
      Granularity.Simple("day"), None,
      Seq(Aggregator.Count("cnt"), Aggregator.Sum("su", "uid", "long")),
      Seq.empty, descending = false)
    val union = single.copy(dataSource = DataSource.Union(Seq("ev", "ev")))
    val s = QueryPlanner.plan(spark, single, catalog).collect()
      .map(r => (r.getAs[Timestamp]("__time"), r.getAs[Long]("cnt") * 2, r.getAs[Long]("su") * 2))
    val u = QueryPlanner.plan(spark, union, catalog).collect()
      .map(r => (r.getAs[Timestamp]("__time"), r.getAs[Long]("cnt"), r.getAs[Long]("su")))
    assert(s.sameElements(u))
  }

  test("law: scan frames concatenate to the unframed stream for arbitrary " +
      "(rows, batchSize, limit) — both resultFormats (VERDICT r10 #4)") {
    import com.fasterxml.jackson.databind.ObjectMapper
    val mapper = new ObjectMapper()
    val engine = new Engine(spark, catalog)
    def run(fmt: String, batchSize: Int, limit: Option[Int],
        interval: String): Seq[Seq[String]] = {
      val json = engine.executeJson(
        s"""{"queryType":"scan","dataSource":"ev",
          |"intervals":["$interval"],
          |"columns":["__time","event_type","value","uid"],
          |"order":"ascending",${limit.map(l => s""""limit":$l,""").getOrElse("")}
          |"resultFormat":"$fmt","batchSize":$batchSize}""".stripMargin)
      val root = mapper.readTree(json)
      (0 until root.size()).map { i =>
        val frame = root.get(i)
        // every frame carries the full requested column list, in order
        assert(mapper.writeValueAsString(frame.get("columns")) ==
          """["__time","event_type","value","uid"]""")
        val ev = frame.get("events")
        (0 until ev.size()).map(j => mapper.writeValueAsString(ev.get(j)))
      }
    }
    val iv = "2024-04-01T00:00:00Z/2024-04-11T00:00:00Z"
    forAllSampled(Gen.zip(Gen.zip(Gen.chooseNum(1, 97), Gen.option(Gen.chooseNum(1, 550))),
        Gen.oneOf("list", "compactedList")), cases = 16) {
      case ((batchSize, limit), fmt) =>
        val frames = run(fmt, batchSize, limit, iv)
        // reference: one giant batch = the unframed stream (same fmt/limit)
        val unframed = run(fmt, 1 << 20, limit, iv).flatten
        assert(frames.flatten == unframed,
          s"fmt=$fmt bs=$batchSize limit=$limit: frames must concatenate " +
            "to the unframed stream")
        val n = limit.map(math.min(_, 500)).getOrElse(500)
        assert(unframed.size == n)
        // exact framing: every frame full at batchSize except the last
        assert(frames.size == math.max(1, (n + batchSize - 1) / batchSize),
          s"fmt=$fmt bs=$batchSize limit=$limit: ${frames.size} frames for $n rows")
        frames.dropRight(1).foreach(f => assert(f.size == batchSize))
        assert(frames.last.size == (if (n == 0) 0 else n - (frames.size - 1) * batchSize))
    }
    // zero-row scan: a single frame with the column header and no events
    Seq("list", "compactedList").foreach { fmt =>
      val empty = run(fmt, 7, None, "2030-01-01T00:00:00Z/2030-01-02T00:00:00Z")
      assert(empty == Seq(Seq.empty),
        s"$fmt: empty scan must emit one empty frame, got $empty")
    }
  }
}
