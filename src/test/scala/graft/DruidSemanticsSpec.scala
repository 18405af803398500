package graft

import graft.engine.Engine
import graft.model._
import graft.sources.MapCatalog
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Goldens for the Druid-specific semantics a naive SQL translation would
  * silently get wrong (SURVEY §5.4, §7.3-7.6). */
class DruidSemanticsSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.from(java.time.Instant.parse(s))

  private lazy val events = Seq(
    // day 1: two click rows; day 2: EMPTY; day 3: one view row
    (ts("2024-03-01T01:00:00Z"), "click", 10.0, 1L, Seq("a", "b")),
    (ts("2024-03-01T02:00:00Z"), "click", 20.0, 2L, Seq("b")),
    (ts("2024-03-03T05:00:00Z"), "view", 40.0, 3L, Seq("c")),
  ).toDF("__time", "event_type", "value", "uid", "tags")

  private lazy val engine = new Engine(spark, new MapCatalog(Map("ev" -> events)))

  // --- zero-fill contract (reference query/query-timeseries.md:74-95) ------

  test("timeseries zero-fills empty buckets inside the interval") {
    val rows = engine.plan(
      """{"queryType":"timeseries","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-04T00:00:00Z"],
        |"granularity":"day",
        |"aggregations":[{"type":"count","name":"cnt"},
        |  {"type":"doubleSum","name":"sv","fieldName":"value"}]}""".stripMargin)
      .collect()
    assert(rows.length == 3) // 3 day buckets, middle one zero-filled
    val day2 = rows(1)
    assert(day2.getAs[Timestamp]("__time") == ts("2024-03-02T00:00:00Z"))
    assert(day2.getAs[Long]("cnt") == 0L)
    assert(day2.getAs[Double]("sv") == 0.0)
  }

  test("zero-fill does NOT extend outside the queried interval") {
    val rows = engine.plan(
      """{"queryType":"timeseries","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-02T00:00:00Z"],
        |"granularity":"day",
        |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
      .collect()
    assert(rows.length == 1) // only the one bucket the interval covers
  }

  test("zero-fill holds past 200k buckets: spine is generated on executors") {
    // 3 days at second granularity = 259,200 buckets — over the old driver
    // cap that silently returned the unfilled aggregate. The spine is now
    // spark.range-generated, so the contract holds at any size.
    val df = engine.plan(
      """{"queryType":"timeseries","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-04T00:00:00Z"],
        |"granularity":"second",
        |"aggregations":[{"type":"count","name":"cnt"},
        |  {"type":"doubleSum","name":"sv","fieldName":"value"}]}""".stripMargin)
    assert(df.count() == 259200L)
    val nonZero = df.where(col("cnt") =!= 0L).collect()
    assert(nonZero.map(_.getAs[Timestamp]("__time")).toSeq == Seq(
      ts("2024-03-01T01:00:00Z"), ts("2024-03-01T02:00:00Z"),
      ts("2024-03-03T05:00:00Z")))
    // filled buckets are zero, not null
    val filled = df.where(col("cnt") === 0L).agg(
      count(lit(1)), sum(when(col("sv").isNull, 1).otherwise(0))).head()
    assert(filled.getLong(0) == 259197L && filled.getLong(1) == 0L)
  }

  test("multi-interval fixed-step spine dedups overlapping buckets") {
    val rows = engine.plan(
      """{"queryType":"timeseries","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-01T02:00:00Z",
        |             "2024-03-01T01:00:00Z/2024-03-01T03:00:00Z"],
        |"granularity":"hour",
        |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
      .collect()
    // hours 00,01,02 exactly once each (01-02 covered by both intervals)
    assert(rows.map(_.getAs[Timestamp]("__time")).toSeq == Seq(
      ts("2024-03-01T00:00:00Z"), ts("2024-03-01T01:00:00Z"),
      ts("2024-03-01T02:00:00Z")))
    assert(rows.map(_.getAs[Long]("cnt")).toSeq == Seq(0L, 1L, 1L))
  }

  test("skipEmptyBuckets context disables zero-fill (query-timeseries.md:95)") {
    val rows = engine.plan(
      """{"queryType":"timeseries","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-04T00:00:00Z"],
        |"granularity":"day","context":{"skipEmptyBuckets":"true"},
        |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
      .collect()
    assert(rows.length == 2)
  }

  test("descending timeseries orders buckets desc (query-timeseries.md:50)") {
    val rows = engine.plan(
      """{"queryType":"timeseries","dataSource":"ev","descending":true,
        |"intervals":["2024-03-01T00:00:00Z/2024-03-04T00:00:00Z"],
        |"granularity":"day",
        |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
      .collect()
    assert(rows.map(_.getAs[Timestamp]("__time").toInstant.toString).toSeq ==
      Seq("2024-03-03T00:00:00Z", "2024-03-02T00:00:00Z", "2024-03-01T00:00:00Z"))
  }

  // --- post-agg arithmetic (reference query/query-timeseries.md:30-39) -----

  test("arithmetic '/' yields 0 on divide-by-zero; 'quotient' does not") {
    val rows = engine.plan(
      """{"queryType":"timeseries","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-03T00:00:00Z"],
        |"granularity":"day",
        |"aggregations":[{"type":"count","name":"cnt"},
        |  {"type":"doubleSum","name":"sv","fieldName":"value"}],
        |"postAggregations":[
        |  {"type":"arithmetic","name":"safe","fn":"/","fields":[
        |    {"type":"fieldAccess","fieldName":"sv"},{"type":"fieldAccess","fieldName":"cnt"}]},
        |  {"type":"arithmetic","name":"raw","fn":"quotient","fields":[
        |    {"type":"fieldAccess","fieldName":"sv"},{"type":"fieldAccess","fieldName":"cnt"}]}]}""".stripMargin)
      .collect()
    val empty = rows(1) // zero-filled bucket: cnt=0
    assert(empty.getAs[Double]("safe") == 0.0)        // Druid / semantics
    assert(empty.getAs[Double]("raw").isNaN)          // plain double division 0/0
  }

  // --- multi-value dimensions (SURVEY §7.4) --------------------------------

  test("selector filter matches ANY value of a multi-value dim") {
    val rows = engine.plan(
      """{"queryType":"timeseries","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-04T00:00:00Z"],
        |"granularity":"all",
        |"filter":{"type":"selector","dimension":"tags","value":"b"},
        |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
      .collect()
    assert(rows.head.getAs[Long]("cnt") == 2L) // both rows containing "b"
  }

  test("groupBy on a multi-value dim counts a row once PER value") {
    val rows = engine.plan(
      """{"queryType":"groupBy","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-04T00:00:00Z"],
        |"granularity":"all","dimensions":["tags"],
        |"aggregations":[{"type":"count","name":"cnt"}],
        |"limitSpec":{"type":"default","columns":[{"dimension":"tags","direction":"ascending"}]}}""".stripMargin)
      .collect()
    // values: a(1), b(2), c(1) — row 1 contributes to both a and b
    assert(rows.map(r => (r.getAs[String]("tags"), r.getAs[Long]("cnt"))).toSeq ==
      Seq(("a", 1L), ("b", 2L), ("c", 1L)))
  }

  test("two differently-filtered specs over the same multi-value dim explode independently") {
    val rows = engine.plan(
      """{"queryType":"groupBy","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-04T00:00:00Z"],
        |"granularity":"all",
        |"dimensions":[
        |  {"type":"listFiltered","delegate":{"type":"default","dimension":"tags","outputName":"ab_tag"},
        |   "values":["a","b"],"isWhitelist":true},
        |  {"type":"listFiltered","delegate":{"type":"default","dimension":"tags","outputName":"c_tag"},
        |   "values":["c"],"isWhitelist":true}],
        |"aggregations":[{"type":"count","name":"cnt"}],
        |"limitSpec":{"type":"default","columns":[
        |  {"dimension":"ab_tag","direction":"ascending"},
        |  {"dimension":"c_tag","direction":"ascending"}]}}""".stripMargin)
      .collect()
    // row1 tags=[a,b] → ab_tag ∈ {a,b}, c_tag null; row3 tags=[c] → ab null, c_tag=c
    val got = rows.map(r => (r.getAs[String]("ab_tag"), r.getAs[String]("c_tag"),
      r.getAs[Long]("cnt"))).toSet
    assert(got.contains(("a", null, 1L)) && got.contains(("b", null, 2L)))
    assert(got.contains((null, "c", 1L)))
    assert(!got.exists(t => t._1 != null && t._2 != null)) // never cross-joined values
  }

  test("filter extraction over a multi-value dim applies per value (any-match)") {
    // upper('b') == 'B' only matches rows whose tags contain 'b'
    val rows = engine.plan(
      """{"queryType":"timeseries","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-04T00:00:00Z"],
        |"granularity":"all",
        |"filter":{"type":"selector","dimension":"tags","value":"B",
        |  "extractionFn":{"type":"upper"}},
        |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
      .collect()
    assert(rows.head.getAs[Long]("cnt") == 2L)
  }

  test("aggregator null semantics over zero matching rows (COVERAGE.md deviations)") {
    // documented contract: longSum → 0; doubleSum/min/max → null (modern
    // Druid SQL-compatible mode), NOT the v0.12 0.0 / ±Infinity sentinels
    val rows = engine.plan(
      """{"queryType":"timeseries","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-02T00:00:00Z"],
        |"granularity":"all",
        |"filter":{"type":"selector","dimension":"event_type","value":"no-such-value"},
        |"aggregations":[
        |  {"type":"longSum","name":"ls","fieldName":"value"},
        |  {"type":"doubleSum","name":"ds","fieldName":"value"},
        |  {"type":"doubleMin","name":"dmin","fieldName":"value"},
        |  {"type":"doubleMax","name":"dmax","fieldName":"value"}]}""".stripMargin)
      .collect()
    val r = rows.head
    assert(r.getAs[Long]("ls") == 0L)
    assert(r.isNullAt(r.fieldIndex("ds")))
    assert(r.isNullAt(r.fieldIndex("dmin")))
    assert(r.isNullAt(r.fieldIndex("dmax")))
  }

  test("in filter extraction over a multi-value dim applies per value (any-match)") {
    // upper ∈ {B, Z}: only rows whose tags contain 'b' — extraction of the
    // stringified array ("[a, b]" → "[A, B]") would match nothing
    val rows = engine.plan(
      """{"queryType":"timeseries","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-04T00:00:00Z"],
        |"granularity":"all",
        |"filter":{"type":"in","dimension":"tags","values":["B","Z"],
        |  "extractionFn":{"type":"upper"}},
        |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
      .collect()
    assert(rows.head.getAs[Long]("cnt") == 2L)
  }

  test("bound filter over a multi-value dim applies per value (any-match)") {
    // lexicographic tags >= "c": only the [c] row; the stringified array
    // "[a, b]" would compare as one string and corrupt the result
    val rows = engine.plan(
      """{"queryType":"timeseries","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-04T00:00:00Z"],
        |"granularity":"all",
        |"filter":{"type":"bound","dimension":"tags","lower":"c",
        |  "ordering":"lexicographic"},
        |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
      .collect()
    assert(rows.head.getAs[Long]("cnt") == 1L)

    // strlen bound with an extraction: substring(0,1) → every value length 1
    // → bound lower "xx" (length 2) matches nothing per-value, while the
    // stringified array ("[a, b]", length 6) would match everything
    val rows2 = engine.plan(
      """{"queryType":"timeseries","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-04T00:00:00Z"],
        |"granularity":"all","context":{"skipEmptyBuckets":"true"},
        |"filter":{"type":"bound","dimension":"tags","lower":"xx",
        |  "ordering":"strlen",
        |  "extractionFn":{"type":"substring","index":0,"length":1}},
        |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
      .collect()
    assert(rows2.isEmpty || rows2.head.getAs[Long]("cnt") == 0L)
  }

  test("regexFiltered dimension spec keeps only matching multi-values") {
    val rows = engine.plan(
      """{"queryType":"groupBy","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-04T00:00:00Z"],
        |"granularity":"all",
        |"dimensions":[{"type":"regexFiltered",
        |  "delegate":{"type":"default","dimension":"tags","outputName":"ab"},
        |  "pattern":"^[ab]$"}],
        |"aggregations":[{"type":"count","name":"cnt"}],
        |"limitSpec":{"type":"default","columns":[{"dimension":"ab","direction":"ascending"}]}}""".stripMargin)
      .collect().map(r => (r.getAs[String]("ab"), r.getAs[Long]("cnt"))).toSeq
    // c-only row survives as null group; a and b keep their counts
    assert(rows == Seq((null, 1L), ("a", 1L), ("b", 2L)))
  }

  test("empty IN filter matches nothing") {
    val rows = engine.plan(
      """{"queryType":"timeseries","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-04T00:00:00Z"],
        |"granularity":"all",
        |"filter":{"type":"in","dimension":"event_type","values":[]},
        |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
      .collect()
    assert(rows.head.getAs[Long]("cnt") == 0L)
  }

  // --- NOT-filter null semantics -------------------------------------------

  test("not filter keeps rows where inner filter is null-valued") {
    val withNull = Seq(
      (ts("2024-03-01T01:00:00Z"), null.asInstanceOf[String], 1.0),
      (ts("2024-03-01T02:00:00Z"), "x", 2.0),
    ).toDF("__time", "d", "v")
    val e2 = new Engine(spark, new MapCatalog(Map("t" -> withNull)))
    val rows = e2.plan(
      """{"queryType":"timeseries","dataSource":"t",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-02T00:00:00Z"],
        |"granularity":"all",
        |"filter":{"type":"not","field":{"type":"selector","dimension":"d","value":"x"}},
        |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
      .collect()
    assert(rows.head.getAs[Long]("cnt") == 1L) // the null-d row survives NOT
  }

  // --- rollup-aware count rewrite (SURVEY §7.3.1) --------------------------

  test("count over a rolled-up source becomes sum(stored count)") {
    import graft.expr.Compilers
    val rolled = Seq(("a", 3L), ("b", 2L)).toDF("d", "stored_cnt")
    val c = Compilers.aggCol(Aggregator.Count("cnt"), rolled.schema,
      rollupCount = Some("stored_cnt"))
    val out = rolled.agg(c).collect().head
    assert(out.getAs[Long]("cnt") == 5L)
  }

  // --- period granularity with timezone (SURVEY §7.3.5) --------------------

  test("P1D in America/New_York buckets by local midnight across DST") {
    // 2024-03-10 is the US spring-forward date. 03:30Z on Mar 9 = 22:30 EST
    // Mar 8; 03:30Z on Mar 11 = 23:30 EDT Mar 10.
    val df = Seq(
      (ts("2024-03-09T03:30:00Z"), 1.0),
      (ts("2024-03-11T03:30:00Z"), 2.0),
    ).toDF("__time", "v")
    val e2 = new Engine(spark, new MapCatalog(Map("t" -> df)))
    val rows = e2.plan(
      """{"queryType":"timeseries","dataSource":"t",
        |"intervals":["2024-03-08T00:00:00Z/2024-03-12T00:00:00Z"],
        |"granularity":{"type":"period","period":"P1D","timeZone":"America/New_York"},
        |"context":{"skipEmptyBuckets":"true"},
        |"aggregations":[{"type":"doubleSum","name":"sv","fieldName":"v"}]}""".stripMargin)
      .collect()
    val buckets = rows.map(_.getAs[Timestamp]("__time").toInstant.toString).toSeq
    // local midnights: Mar 8 EST = 05:00Z; Mar 10 EDT-transition day = 05:00Z
    assert(buckets == Seq("2024-03-08T05:00:00Z", "2024-03-10T05:00:00Z"))
  }

  test("P2D in America/New_York steps calendar days across DST (47h bucket)") {
    // Spring-forward 2024-03-10: the [Mar 9 00:00, Mar 11 00:00) local
    // bucket is 47 wall-clock hours. Druid's PeriodGranularity steps day
    // units in the tz chronology, so the next boundary is Mar 11 00:00 EDT
    // = 04:00Z — NOT origin+48h = 05:00Z. An event at 04:30Z must open the
    // second bucket, and zero-fill must land on the same wall-clock spine.
    val df = Seq(
      (ts("2024-03-09T12:00:00Z"), 1.0),  // Mar 9 local → bucket 1
      (ts("2024-03-11T04:30:00Z"), 2.0),  // 00:30 EDT Mar 11 → bucket 2
      (ts("2024-03-13T12:00:00Z"), 4.0),  // Mar 13 local → bucket 3
    ).toDF("__time", "v")
    val e2 = new Engine(spark, new MapCatalog(Map("t" -> df)))
    val rows = e2.plan(
      """{"queryType":"timeseries","dataSource":"t",
        |"intervals":["2024-03-09T05:00:00Z/2024-03-17T04:00:00Z"],
        |"granularity":{"type":"period","period":"P2D",
        |  "timeZone":"America/New_York","origin":"2024-03-09T05:00:00Z"},
        |"aggregations":[{"type":"doubleSum","name":"sv","fieldName":"v"}]}""".stripMargin)
      .collect()
    val got = rows.map(r => (r.getAs[Timestamp]("__time").toInstant.toString,
      r.getAs[Double]("sv"))).toSeq
    assert(got == Seq(
      ("2024-03-09T05:00:00Z", 1.0),  // 47h DST-shortened bucket
      ("2024-03-11T04:00:00Z", 2.0),  // 04:30Z opens the SECOND bucket
      ("2024-03-13T04:00:00Z", 4.0),
      ("2024-03-15T04:00:00Z", 0.0))) // zero-fill on the wall-clock spine
  }

  test("P2M period granularity buckets by 2-month calendar multiples") {
    val df = Seq(
      (ts("2024-01-15T00:00:00Z"), 1.0), (ts("2024-02-20T00:00:00Z"), 2.0),
      (ts("2024-03-05T00:00:00Z"), 3.0), (ts("2024-06-30T00:00:00Z"), 4.0),
    ).toDF("__time", "v")
    val e2 = new Engine(spark, new MapCatalog(Map("t" -> df)))
    val rows = e2.plan(
      """{"queryType":"timeseries","dataSource":"t",
        |"intervals":["2024-01-01T00:00:00Z/2024-08-01T00:00:00Z"],
        |"granularity":{"type":"period","period":"P2M"},
        |"aggregations":[{"type":"doubleSum","name":"sv","fieldName":"v"}]}""".stripMargin)
      .collect()
    // epoch-origin 2-month buckets: Jan, Mar, May, Jul boundaries
    val got = rows.map(r => (r.getAs[Timestamp]("__time").toInstant.toString,
      r.getAs[Double]("sv"))).toSeq
    assert(got == Seq(
      ("2024-01-01T00:00:00Z", 3.0),   // Jan+Feb rows
      ("2024-03-01T00:00:00Z", 3.0),   // Mar row
      ("2024-05-01T00:00:00Z", 4.0),   // Jun row
      ("2024-07-01T00:00:00Z", 0.0)))  // zero-filled
  }

  test("P1M from a mid-month origin: bucket starts clamp at month ends") {
    // Druid PeriodGranularity month stepping from origin 2024-01-31T06:00Z:
    // bucket starts are origin + k months with END-OF-MONTH DAY CLAMPING —
    // Jan 31 06:00, Feb 29 06:00 (leap clamp), Mar 31 06:00, Apr 30 06:00.
    // The spine must re-derive each boundary FROM THE ORIGIN (iterating
    // +1M from the clamped Feb 29 would drift to Mar 29).
    val df = Seq(
      (ts("2024-02-15T00:00:00Z"), 1.0), // [Jan31 06:00, Feb29 06:00)
      (ts("2024-03-30T12:00:00Z"), 2.0), // [Feb29 06:00, Mar31 06:00)
      (ts("2024-03-31T07:00:00Z"), 4.0), // [Mar31 06:00, Apr30 06:00)
    ).toDF("__time", "v")
    val e2 = new Engine(spark, new MapCatalog(Map("t" -> df)))
    val rows = e2.plan(
      """{"queryType":"timeseries","dataSource":"t",
        |"intervals":["2024-01-31T06:00:00Z/2024-05-01T00:00:00Z"],
        |"granularity":{"type":"period","period":"P1M",
        |  "origin":"2024-01-31T06:00:00Z"},
        |"aggregations":[{"type":"doubleSum","name":"sv","fieldName":"v"}]}""".stripMargin)
      .collect()
    val got = rows.map(r => (r.getAs[Timestamp]("__time").toInstant.toString,
      r.getAs[Double]("sv"))).toSeq
    assert(got == Seq(
      ("2024-01-31T06:00:00Z", 1.0),
      ("2024-02-29T06:00:00Z", 2.0),
      ("2024-03-31T06:00:00Z", 4.0),
      ("2024-04-30T06:00:00Z", 0.0))) // zero-fill ON the clamped spine
  }

  test("P2M from a mid-month origin buckets at origin+2k months") {
    val df = Seq(
      (ts("2024-02-01T00:00:00Z"), 1.0), // [Jan15, Mar15)
      (ts("2024-03-14T23:00:00Z"), 2.0), // still [Jan15, Mar15)
      (ts("2024-03-15T06:30:00Z"), 4.0), // [Mar15, May15) — 06:30 ≥ 06:00
      (ts("2024-03-15T05:30:00Z"), 8.0), // 05:30 < origin time → [Jan15, Mar15)
    ).toDF("__time", "v")
    val e2 = new Engine(spark, new MapCatalog(Map("t" -> df)))
    val rows = e2.plan(
      """{"queryType":"timeseries","dataSource":"t",
        |"intervals":["2024-01-15T06:00:00Z/2024-06-01T00:00:00Z"],
        |"granularity":{"type":"period","period":"P2M",
        |  "origin":"2024-01-15T06:00:00Z"},
        |"context":{"skipEmptyBuckets":"true"},
        |"aggregations":[{"type":"doubleSum","name":"sv","fieldName":"v"}]}""".stripMargin)
      .collect()
    val got = rows.map(r => (r.getAs[Timestamp]("__time").toInstant.toString,
      r.getAs[Double]("sv"))).toSeq
    assert(got == Seq(
      ("2024-01-15T06:00:00Z", 11.0),
      ("2024-03-15T06:00:00Z", 4.0)))
  }

  test("P1D with an origin honors the origin's time-of-day (fixed-length anchor)") {
    // previously the simple-unit fast path ignored origin entirely: P1D
    // from origin 06:00 must bucket at 06:00 boundaries, not midnight
    val df = Seq(
      (ts("2024-03-01T05:00:00Z"), 1.0), // [Feb29 06:00, Mar1 06:00)
      (ts("2024-03-01T07:00:00Z"), 2.0), // [Mar1 06:00, Mar2 06:00)
    ).toDF("__time", "v")
    val e2 = new Engine(spark, new MapCatalog(Map("t" -> df)))
    val rows = e2.plan(
      """{"queryType":"timeseries","dataSource":"t",
        |"intervals":["2024-02-29T00:00:00Z/2024-03-02T00:00:00Z"],
        |"granularity":{"type":"period","period":"P1D",
        |  "origin":"2024-03-01T06:00:00Z"},
        |"context":{"skipEmptyBuckets":"true"},
        |"aggregations":[{"type":"doubleSum","name":"sv","fieldName":"v"}]}""".stripMargin)
      .collect()
    val got = rows.map(r => (r.getAs[Timestamp]("__time").toInstant.toString,
      r.getAs[Double]("sv"))).toSeq
    assert(got == Seq(
      ("2024-02-29T06:00:00Z", 1.0),
      ("2024-03-01T06:00:00Z", 2.0)))
  }

  test("duration granularity buckets by fixed millis with origin") {
    val df = Seq((ts("2024-03-01T00:10:00Z"), 1.0), (ts("2024-03-01T02:50:00Z"), 2.0))
      .toDF("__time", "v")
    val e2 = new Engine(spark, new MapCatalog(Map("t" -> df)))
    val rows = e2.plan(
      """{"queryType":"timeseries","dataSource":"t",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-01T06:00:00Z"],
        |"granularity":{"type":"duration","duration":7200000},
        |"context":{"skipEmptyBuckets":"true"},
        |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
      .collect()
    assert(rows.map(_.getAs[Timestamp]("__time").toInstant.toString).toSeq ==
      Seq("2024-03-01T00:00:00Z", "2024-03-01T02:00:00Z"))
  }

  // --- topN metric specs ---------------------------------------------------

  test("topN inverted metric ranks ascending (bottom-K)") {
    val rows = engine.plan(
      """{"queryType":"topN","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-04T00:00:00Z"],
        |"granularity":"all","dimension":"event_type","threshold":1,
        |"metric":{"type":"inverted","metric":{"type":"numeric","metric":"sv"}},
        |"aggregations":[{"type":"doubleSum","name":"sv","fieldName":"value"}]}""".stripMargin)
      .collect()
    assert(rows.head.getAs[String]("event_type") == "click") // 30 < 40
  }

  test("topN can rank by a post-aggregator metric") {
    val rows = engine.plan(
      """{"queryType":"topN","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-04T00:00:00Z"],
        |"granularity":"all","dimension":"event_type","threshold":1,
        |"metric":"avg_val",
        |"aggregations":[{"type":"count","name":"cnt"},
        |  {"type":"doubleSum","name":"sv","fieldName":"value"}],
        |"postAggregations":[{"type":"arithmetic","name":"avg_val","fn":"/","fields":[
        |  {"type":"fieldAccess","fieldName":"sv"},
        |  {"type":"fieldAccess","fieldName":"cnt"}]}]}""".stripMargin)
      .collect()
    // avg: view=40.0, click=15.0 → view wins
    assert(rows.head.getAs[String]("event_type") == "view")
    assert(rows.head.getAs[Double]("avg_val") == 40.0)
  }

  test("topN lexicographic metric ranks by dimension value") {
    val rows = engine.plan(
      """{"queryType":"topN","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-04T00:00:00Z"],
        |"granularity":"all","dimension":"event_type","threshold":1,
        |"metric":{"type":"lexicographic"},
        |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
      .collect()
    assert(rows.head.getAs[String]("event_type") == "click")
  }

  test("alphanumeric ordering compares embedded numbers numerically") {
    val df = Seq(
      (ts("2024-03-01T01:00:00Z"), "file10"), (ts("2024-03-01T01:00:00Z"), "file2"),
      (ts("2024-03-01T01:00:00Z"), "file1"), (ts("2024-03-01T01:00:00Z"), "x9y"),
      (ts("2024-03-01T01:00:00Z"), "x10y"), (ts("2024-03-01T01:00:00Z"), "abc"),
      // chars between '#' and '0' (0x24-0x2F) must sort BEFORE digit runs —
      // the sort-key marker must not invert them
      (ts("2024-03-01T01:00:00Z"), "file-"), (ts("2024-03-01T01:00:00Z"), "file."),
    ).toDF("__time", "d")
    val e2 = new Engine(spark, new MapCatalog(Map("t" -> df)))
    val rows = e2.plan(
      """{"queryType":"groupBy","dataSource":"t",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-02T00:00:00Z"],
        |"granularity":"all","dimensions":["d"],
        |"aggregations":[{"type":"count","name":"cnt"}],
        |"limitSpec":{"type":"default","columns":[
        |  {"dimension":"d","direction":"ascending","dimensionOrder":"alphanumeric"}]}}""".stripMargin)
      .collect().map(_.getAs[String]("d")).toSeq
    assert(rows == Seq("abc", "file-", "file.", "file1", "file2", "file10", "x9y", "x10y"))
  }

  test("multiple intervals: OR-ed predicate + spine covers both, gaps not filled") {
    val rows = engine.plan(
      """{"queryType":"timeseries","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-02T00:00:00Z",
        |             "2024-03-03T00:00:00Z/2024-03-04T00:00:00Z"],
        |"granularity":"day",
        |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
      .collect()
    // day 2 lies BETWEEN the intervals → not zero-filled, not returned
    assert(rows.map(_.getAs[Timestamp]("__time").toInstant.toString).toSeq ==
      Seq("2024-03-01T00:00:00Z", "2024-03-03T00:00:00Z"))
    assert(rows.map(_.getAs[Long]("cnt")).toSeq == Seq(2L, 1L))
  }

  // --- error contract (reference query/query-module-overview.md:60-87) -----

  test("unknown queryType surfaces the documented error JSON shape") {
    val e = intercept[Engine.QueryError](engine.executeJson(
      """{"queryType":"wat","dataSource":"ev","intervals":["2024-01-01/2024-01-02"]}"""))
    assert(e.error == "Unknown exception")
    assert(e.toJson.contains("\"errorMessage\""))
    assert(e.toJson.contains("\"host\""))
  }

  // --- filtered aggregator -------------------------------------------------

  test("approx topN golden: per-segment ranking diverges exactly like Druid's") {
    // Druid's native topN ranks per segment and merges only local survivors
    // (query-module-overview.md:52-53); this engine is EXACT by default and
    // reproduces the approximation under context approxTopN=true. Fixture:
    // 'b' is the true global top (10+10=20) but ranks #2 in BOTH pseudo-
    // segments behind a local-only dim (12) — with minTopNThreshold forced
    // to 1, each segment's local top-1 survives, 'b' loses every partial,
    // and the approximate winner is 'a1' (12). The divergence IS the
    // documented Druid behavior, not a bug; at the default
    // minTopNThreshold=1000 the two modes agree on any realistic threshold.
    val t0 = ts("2024-03-01T01:00:00Z")
    val rows =
      (Seq.fill(12)(("a1", 0)) ++ Seq.fill(10)(("b", 0))) ++   // partition 0
        (Seq.fill(12)(("a2", 1)) ++ Seq.fill(10)(("b", 1)))    // partition 1
    val rdd = spark.sparkContext.parallelize(rows, 2)
      .mapPartitionsWithIndex { (pid, it) => it.filter(_._2 == pid).map(_._1) }
      .map(d => Row(t0, d))
    val df = spark.createDataFrame(rdd, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__time",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("dim",
        org.apache.spark.sql.types.StringType))))
    val eng = new Engine(spark, new MapCatalog(Map("seg2" -> df)))
    def topn(ctx: String): Seq[(String, Long)] = eng.plan(
      s"""{"queryType":"topN","dataSource":"seg2",
         |"intervals":["2024-03-01T00:00:00Z/2024-03-02T00:00:00Z"],
         |"granularity":"all","dimension":"dim","threshold":1,"metric":"cnt",
         |$ctx
         |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
      .collect().map(r => (r.getAs[String]("dim"), r.getAs[Long]("cnt"))).toSeq

    // exact default: the globally correct answer
    assert(topn("""""") == Seq(("b", 20L)))
    // approximate mode at a forced tiny per-segment limit: Druid's answer
    assert(topn(""""context":{"approxTopN":"true","minTopNThreshold":"1"},""")
      == Seq(("a1", 12L)))
    // approximate mode at the DEFAULT per-segment limit: agrees with exact
    assert(topn(""""context":{"approxTopN":"true"},""") == Seq(("b", 20L)))
  }

  test("extraction fns over multi-value dims apply PER VALUE, then explode") {
    // upper() over tags must group A/B/C (per value), not crash on the
    // array or stringify it ("[a, b]")
    val rows = engine.plan(
      """{"queryType":"groupBy","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-04T00:00:00Z"],
        |"granularity":"all",
        |"dimensions":[{"type":"extraction","dimension":"tags","outputName":"tag",
        |  "extractionFn":{"type":"upper"}}],
        |"aggregations":[{"type":"count","name":"cnt"}],
        |"limitSpec":{"type":"default","columns":[{"dimension":"tag","direction":"ascending"}]}}""".stripMargin)
      .collect().map(r => (r.getAs[String]("tag"), r.getAs[Long]("cnt"))).toSeq
    assert(rows == Seq(("A", 1L), ("B", 2L), ("C", 1L)))
  }

  test("regex extraction without replaceMissingValue returns the value AS IS on no match") {
    // upstream RegexDimExtractionFn: no match → dimension value unchanged;
    // null would silently move those rows into the null group
    val rows = engine.plan(
      """{"queryType":"groupBy","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-04T00:00:00Z"],
        |"granularity":"all",
        |"dimensions":[{"type":"extraction","dimension":"event_type","outputName":"e",
        |  "extractionFn":{"type":"regex","expr":"^(cl)","index":1}}],
        |"aggregations":[{"type":"count","name":"cnt"}],
        |"limitSpec":{"type":"default","columns":[{"dimension":"e","direction":"ascending"}]}}""".stripMargin)
      .collect().map(r => (r.getAs[String]("e"), r.getAs[Long]("cnt"))).toSeq
    // 'click','click' → 'cl'; 'view' has no match → stays 'view'
    assert(rows == Seq(("cl", 2L), ("view", 1L)))
  }

  test("registeredLookup extraction works inside FILTERS (inline-map resolution)") {
    val cat = new MapCatalog(Map("ev" -> events)) {
      override def lookupTable(s: org.apache.spark.sql.SparkSession, name: String) =
        if (name == "evname")
          Some(Seq(("click", "Click!"), ("view", "View!")).toDF("key", "value"))
        else None
      override def lookupNames: Seq[String] = Seq("evname")
    }
    val eng = new Engine(spark, cat)
    val rows = eng.plan(
      """{"queryType":"timeseries","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-04T00:00:00Z"],
        |"granularity":"all",
        |"filter":{"type":"selector","dimension":"event_type","value":"Click!",
        |  "extractionFn":{"type":"registeredLookup","lookup":"evname"}},
        |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
      .collect()
    assert(rows.head.getAs[Long]("cnt") == 2L)
  }

  test("like filter: doubled custom escape char means the literal escape char") {
    val d2 = Seq(
      (ts("2024-03-01T01:00:00Z"), "100#x"),
      (ts("2024-03-01T02:00:00Z"), "100yx"),
    ).toDF("__time", "event_type")
    val eng = new Engine(spark, new MapCatalog(Map("e2" -> d2)))
    val rows = eng.plan(
      """{"queryType":"scan","dataSource":"e2",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-02T00:00:00Z"],
        |"filter":{"type":"like","dimension":"event_type",
        |  "pattern":"100##%","escape":"#"},
        |"columns":["event_type"],"order":"none"}""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("100#x")) // literal '#', then wildcard
  }

  test("degenerate query shapes fail cleanly or behave, never MatchError") {
    // scan limit = Long.MaxValue sentinel → no limit, not toInt truncation
    val all = engine.plan(
      """{"queryType":"scan","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-04T00:00:00Z"],
        |"limit":9223372036854775807,"order":"none"}""".stripMargin).collect()
    assert(all.length == 3)
    // columnComparison with one dimension: nothing to compare → all rows
    val one = engine.plan(
      """{"queryType":"scan","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-04T00:00:00Z"],
        |"filter":{"type":"columnComparison","dimensions":["event_type"]},
        |"order":"none"}""".stripMargin).collect()
    assert(one.length == 3)
    // groupBy with no dimensions AND no aggregations: descriptive error
    val e = intercept[IllegalArgumentException](engine.plan(
      """{"queryType":"groupBy","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-04T00:00:00Z"],
        |"granularity":"all","dimensions":[],"aggregations":[]}""".stripMargin))
    assert(e.getMessage.contains("at least one dimension or aggregation"))
  }

  test("TIME_CEIL/TIME_SHIFT use calendar days across DST transitions") {
    graft.functions.GraftFunctionRegistry.registerAll(spark)
    // US spring-forward 2025-03-09 in America/Los_Angeles: local midnight
    // Mar 9 = 08:00Z, NEXT local midnight Mar 10 = 07:00Z — a 23-hour day.
    // Fixed-24h arithmetic would land both results at 08:00Z Mar 10, an
    // hour past the bucket boundary.
    val r = spark.sql(
      """SELECT
        |  time_ceil(TIMESTAMP '2025-03-09 10:00:00+00:00', 'P1D', NULL,
        |            'America/Los_Angeles') AS c,
        |  time_shift(TIMESTAMP '2025-03-09 08:00:00+00:00', 'P1D', 1,
        |             'America/Los_Angeles') AS s""".stripMargin)
      .collect().head
    assert(r.getTimestamp(0) == ts("2025-03-10T07:00:00Z"))
    assert(r.getTimestamp(1) == ts("2025-03-10T07:00:00Z"))
    // UTC day shifts stay fixed 24h
    val u = spark.sql(
      """SELECT time_shift(TIMESTAMP '2025-03-09 08:00:00+00:00', 'P1D', 1) AS s""")
      .collect().head
    assert(u.getTimestamp(0) == ts("2025-03-10T08:00:00Z"))
  }

  test("filtered aggregator filters only its own input") {
    val rows = engine.plan(
      """{"queryType":"timeseries","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-04T00:00:00Z"],
        |"granularity":"all",
        |"aggregations":[
        |  {"type":"count","name":"all_cnt"},
        |  {"type":"filtered","filter":{"type":"selector","dimension":"event_type","value":"view"},
        |   "aggregator":{"type":"doubleSum","name":"view_sv","fieldName":"value"}}]}""".stripMargin)
      .collect()
    assert(rows.head.getAs[Long]("all_cnt") == 3L)
    assert(rows.head.getAs[Double]("view_sv") == 40.0)
  }

  test("bound filter ordering=alphanumeric is exact (digit runs numeric), not lexicographic") {
    // values where the two orderings disagree: lexicographically
    // "10" < "100" < "2" < "30" < "9"; alphanumerically 2 < 9 < 10 < 30 < 100
    val df = Seq("2", "9", "10", "30", "100")
      .map(v => (ts("2024-03-01T01:00:00Z"), v)).toDF("__time", "v")
    val eng = new Engine(spark, new MapCatalog(Map("av" -> df)))
    def cnt(ordering: String): Long = eng.plan(
      s"""{"queryType":"timeseries","dataSource":"av",
         |"intervals":["2024-03-01T00:00:00Z/2024-03-02T00:00:00Z"],
         |"granularity":"all",
         |"filter":{"type":"bound","dimension":"v","lower":"2","upper":"30",
         |  "ordering":"$ordering"},
         |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
      .collect().head.getAs[Long]("cnt")
    // [2, 30] alphanumeric keeps {2, 9, 10, 30}; lexicographic keeps only
    // {"2", "30"} ("10"/"100" sort below "2", "9" sorts above "30")
    assert(cnt("alphanumeric") == 4L)
    assert(cnt("lexicographic") == 2L)
  }
}
