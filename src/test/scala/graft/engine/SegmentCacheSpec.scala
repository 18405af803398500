package graft.engine

import graft.model._
import org.apache.spark.sql.functions._

/** Unit-level laws of the per-(segment, query) cache decomposition —
  * the properties EngineSpec's end-to-end equivalence tests rely on. */
class SegmentCacheSpec extends graft.SparkTestBase {

  import spark.implicits._

  /** Minimal manifest-bearing catalog: chunk → (version, rows). */
  private def stubCatalog(chunks: (String, Int, Long)*): graft.sources.Catalog =
    new graft.sources.Catalog {
      def table(spark: org.apache.spark.sql.SparkSession, name: String)
          : org.apache.spark.sql.DataFrame =
        spark.range(1).toDF("x")
      override def segmentInfos(name: String): Seq[(String, Int, Long)] =
        chunks.toSeq
    }

  private def tsJson(intervals: String, extraContext: String = ""): String =
    s"""{"queryType":"timeseries","dataSource":"ev",
       |"intervals":[$intervals],
       |"granularity":"hour"$extraContext,
       |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin

  private def parse(j: String): Query = QueryJson.parseQuery(j)

  test("fragment keys are interval-blind and volatile-context-blind") {
    val cat = stubCatalog(("2024-05-01", 1, 10L), ("2024-05-02", 1, 10L),
      ("2024-05-03", 1, 10L))
    def keysOf(json: String): Map[String, String] =
      SegmentResultCache.decompose(json, parse(json), cat).get
        .map(s => s.chunk -> s.key).toMap
    // the moving-window property: interior chunks share keys across
    // different OVERALL intervals
    val a = keysOf(tsJson(""""2024-05-01T00:00:00Z/2024-05-03T00:00:00Z""""))
    val b = keysOf(tsJson(""""2024-05-02T00:00:00Z/2024-05-04T00:00:00Z""""))
    assert(a("2024-05-02") == b("2024-05-02"),
      "full-day interior chunk must share its key across window positions")
    assert(a.keySet == Set("2024-05-01", "2024-05-02"),
      s"chunks intersecting [01,03): ${a.keySet}")
    // volatile context (queryId/timeout/useCache/...) must not shift keys
    val c = keysOf(tsJson(""""2024-05-01T00:00:00Z/2024-05-03T00:00:00Z"""",
      ""","context":{"queryId":"dash-7","timeout":"30000","useCache":"true"}"""))
    assert(c == a, "volatile context keys must not change fragment keys")
    // result-AFFECTING context MUST shift keys
    val d = keysOf(tsJson(""""2024-05-01T00:00:00Z/2024-05-03T00:00:00Z"""",
      ""","context":{"skipEmptyBuckets":"true"}"""))
    assert(d("2024-05-02") != a("2024-05-02"),
      "skipEmptyBuckets changes the result — its fragments must not collide")
    // a partial-day edge intersection keys differently than the full day
    val e = keysOf(tsJson(""""2024-05-01T06:00:00Z/2024-05-03T00:00:00Z""""))
    assert(e("2024-05-01") != a("2024-05-01") && e("2024-05-02") == a("2024-05-02"))
    // manifest state is part of the key (version bump or append)
    val cat2 = stubCatalog(("2024-05-01", 1, 10L), ("2024-05-02", 1, 99L),
      ("2024-05-03", 1, 10L))
    val f = SegmentResultCache.decompose(
      tsJson(""""2024-05-01T00:00:00Z/2024-05-03T00:00:00Z""""),
      parse(tsJson(""""2024-05-01T00:00:00Z/2024-05-03T00:00:00Z"""")), cat2)
      .get.map(s => s.chunk -> s.key).toMap
    assert(f("2024-05-01") == a("2024-05-01") && f("2024-05-02") != a("2024-05-02"),
      "a chunk's row-count change must invalidate ONLY that chunk's key")
  }

  test("slice sub-intervals tile the query ∩ chunk intersection exactly") {
    val cat = stubCatalog(("2024-05-01", 1, 1L), ("2024-05-03", 2, 1L))
    // two query intervals, a manifest GAP on 05-02, partial edges
    val json = tsJson(
      """"2024-05-01T06:00:00Z/2024-05-03T12:00:00Z","2024-05-03T18:00:00Z/2024-05-05T00:00:00Z"""")
    val slices = SegmentResultCache.decompose(json, parse(json), cat).get
    assert(slices.map(_.chunk) == Seq("2024-05-01", "2024-05-03"))
    def ivs(c: String) = slices.find(_.chunk == c).get.subQuery
      .asInstanceOf[Query.Timeseries].intervals
      .map(iv => s"${iv.start}/${iv.end}")
    assert(ivs("2024-05-01") ==
      Seq("2024-05-01T06:00:00Z/2024-05-02T00:00:00Z"))
    assert(ivs("2024-05-03") == Seq(
      "2024-05-03T00:00:00Z/2024-05-03T12:00:00Z",
      "2024-05-03T18:00:00Z/2024-05-04T00:00:00Z"))
  }

  test("nestsInDayChunk: eligible granularities bucket within the input's UTC day") {
    import graft.expr.Compilers
    val eligible = Seq[Granularity](
      Granularity.Simple("second"), Granularity.Simple("minute"),
      Granularity.Simple("fifteen_minute"), Granularity.Simple("thirty_minute"),
      Granularity.Simple("hour"), Granularity.Simple("day"),
      Granularity.Duration(3 * 3600 * 1000L, None),
      Granularity.Period("PT1H", Some("UTC"), None),
      Granularity.Period("P1D", None, None))
    eligible.foreach(g => assert(SegmentResultCache.nestsInDayChunk(g), g.toString))
    // the property the eligibility set encodes: bucket(ts) lands in ts's day
    val rnd = new scala.util.Random(3)
    val stamps = Seq.tabulate(500)(_ =>
      new java.sql.Timestamp(1690000000000L + (rnd.nextLong() % 400L).abs * 86400000L
        + (rnd.nextLong() % 86400000L).abs))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(stamps.map(org.apache.spark.sql.Row(_))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__time",
          org.apache.spark.sql.types.TimestampType))))
    eligible.foreach { g =>
      val bucket = Compilers.granularityCol(g, col("__time")).get
      val bad = df
        .where(date_trunc("day", bucket) =!= date_trunc("day", col("__time")))
        .count()
      assert(bad == 0L, s"$g produced a bucket outside the input's day")
    }
    // non-nesting shapes must be rejected
    Seq[Granularity](Granularity.All, Granularity.NoneG,
      Granularity.Simple("week"), Granularity.Simple("month"),
      Granularity.Simple("year"),
      Granularity.Duration(7 * 3600 * 1000L, None), // 7h does not divide a day
      Granularity.Duration(3600 * 1000L, Some(java.time.Instant.parse("2024-01-01T00:30:00Z"))),
      Granularity.Period("P1W", None, None),
      Granularity.Period("PT1H", Some("America/New_York"), None),
      Granularity.Period("P1D", None, Some(java.time.Instant.parse("2024-01-01T06:00:00Z"))))
      .foreach(g =>
        assert(!SegmentResultCache.nestsInDayChunk(g), s"$g must not decompose"))
  }

  test("decomposed per-chunk sub-plans keep scan pruning (plan quality)") {
    val store = new graft.store.SegmentStore(
      java.nio.file.Files.createTempDirectory("graft-segplan").toString)
    val rows = Seq(
      (java.sql.Timestamp.from(java.time.Instant.parse("2024-05-01T01:00:00Z")), "click", 1.0),
      (java.sql.Timestamp.from(java.time.Instant.parse("2024-05-02T01:00:00Z")), "view", 2.0),
      (java.sql.Timestamp.from(java.time.Instant.parse("2024-05-03T01:00:00Z")), "click", 3.0))
    store.write(rows.toDF("__time", "event_type", "value"), "ev")
    val cat = new graft.store.SegmentCatalog(store)
    val json = tsJson(""""2024-05-01T00:00:00Z/2024-05-04T00:00:00Z"""")
      .replace(""""granularity"""",
        """"filter":{"type":"selector","dimension":"event_type","value":"click"},"granularity"""")
    val slices = SegmentResultCache.decompose(json, parse(json), cat).get
    assert(slices.size == 3)
    val sub = graft.plan.QueryPlanner.plan(spark, slices.head.subQuery, cat)
    val plan = sub.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the selector filter still reaches the (single-chunk) scan, and the
    // scan reads only the referenced columns
    assert(plan.contains("PushedFilters:") &&
      (plan.contains("EqualTo(event_type,click)") || plan.contains("eq(event_type")),
      s"selector not pushed in the per-chunk plan:\n${plan.take(1500)}")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("value"),
      s"per-chunk scan reads unreferenced columns: $readSchema")
  }

  test("encodeFragments ∘ concat == encode for every bucketed shape") {
    // the single-plan cold path's soundness law: splitting encoded rows by
    // chunk and concatenating the fragments reproduces the whole encode
    val ts = (d: Int, h: Int) => java.sql.Timestamp.from(
      java.time.Instant.parse(f"2024-05-0$d%dT$h%02d:00:00Z"))
    val rows = Seq(
      (ts(1, 2), "a", 1.0), (ts(1, 5), "b", 2.0),
      (ts(2, 0), "a", 3.0), (ts(2, 9), "c", 4.0),
      (ts(3, 3), "b", 5.0))
    val df = rows.toDF("__time", "dim", "m")
    def chunkOf(row: org.apache.spark.sql.Row): String =
      row.getAs[java.sql.Timestamp]("__time").toInstant
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
    val chunksAsc = Seq("2024-05-01", "2024-05-02", "2024-05-03")
    def merged(q: Query, d: org.apache.spark.sql.DataFrame,
        order: Seq[String]): String = {
      val frags = ResultEncoder.encodeFragments(q, d, chunkOf)
      order.flatMap(frags.get).filter(_.nonEmpty).mkString("[", ",", "]")
    }
    val dsrc = DataSource.Table("x")
    val iv = Seq(Interval.parse("2024-05-01T00:00:00Z/2024-05-04T00:00:00Z"))
    val tsQ = Query.Timeseries(dsrc, iv, Granularity.Simple("hour"),
      None, Seq(Aggregator.Count("m")), Seq.empty, descending = false)
    assert(merged(tsQ, df.orderBy("__time"), chunksAsc) ==
      ResultEncoder.encode(tsQ, df.orderBy("__time")))
    val tsDesc = tsQ.copy(descending = true)
    assert(merged(tsDesc, df.orderBy(col("__time").desc), chunksAsc.reverse) ==
      ResultEncoder.encode(tsDesc, df.orderBy(col("__time").desc)))
    val topnQ = Query.TopN(dsrc, iv, Granularity.Simple("day"),
      DimensionSpec.Default("dim", "dim", None), 2,
      TopNMetricSpec.Numeric("m"), None,
      Seq(Aggregator.Sum("m", "m", "double")), Seq.empty)
    assert(merged(topnQ, df.orderBy("__time", "dim"), chunksAsc) ==
      ResultEncoder.encode(topnQ, df.orderBy("__time", "dim")))
    // groupBy output order is unspecified — the law is SET equality of
    // event objects, and per-chunk relative order is preserved
    val gbQ = Query.GroupBy(dsrc, iv, Granularity.Simple("day"),
      Seq(DimensionSpec.Default("dim", "dim", None)), None,
      Seq(Aggregator.Sum("m", "m", "double")), Seq.empty, None, None)
    val shuffled = rows.sortBy(_._2).toDF("__time", "dim", "m") // NOT time-sorted
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    def objSet(s: String) = {
      val a = m.readTree(s)
      (0 until a.size()).map(a.get(_).toString).toSet
    }
    assert(objSet(merged(gbQ, shuffled, chunksAsc)) ==
      objSet(ResultEncoder.encode(gbQ, shuffled)))
  }

  test("decomposePartial: day-partial slices, key sharing, and fallbacks " +
      "(VERDICT r12 #1)") {
    val cat = stubCatalog(("2024-05-01", 1, 10L), ("2024-05-02", 1, 10L))
    def q(gran: String, aggs: String =
        """{"type":"doubleSum","name":"sv","fieldName":"value"}""",
        extra: String = ""): String =
      s"""{"queryType":"timeseries","dataSource":"ev",
         |"intervals":["2024-04-20T00:00:00Z/2024-06-10T00:00:00Z"],
         |"granularity":$gran$extra,
         |"aggregations":[$aggs]}""".stripMargin
    def keysOf(json: String): Map[String, String] =
      SegmentResultCache.decomposePartial(json, parse(json), cat).get
        .map(s => s.chunk -> s.key).toMap
    val month = keysOf(q("\"month\""))
    assert(month.keySet == Set("2024-05-01", "2024-05-02"))
    // the sub-query is normalized to the day-partial template
    val sub = SegmentResultCache.decomposePartial(q("\"month\""),
      parse(q("\"month\"")), cat).get.head.subQuery
      .asInstanceOf[Query.Timeseries]
    assert(sub.granularity == Granularity.Simple("day"))
    assert(sub.postAggregations.isEmpty && !sub.descending)
    assert(sub.context.get("skipEmptyBuckets").contains("true"))
    // granularity / descending / skipEmptyBuckets / post-aggs are NOT in
    // the key: a dashboard switching views reuses the same day partials
    assert(keysOf(q("\"quarter\"")) == month)
    assert(keysOf(q("\"year\"")) == month)
    assert(keysOf(q("\"week\"")) == month)
    assert(keysOf(q("\"all\"")) == month)
    assert(keysOf(q("\"month\"", extra = ",\"descending\":true")) == month)
    assert(keysOf(q("\"month\"",
      extra = ",\"context\":{\"skipEmptyBuckets\":\"true\"}")) == month)
    assert(keysOf(q("\"month\"", extra =
      ""","postAggregations":[{"type":"arithmetic","name":"x","fn":"*",
        |"fields":[{"type":"fieldAccess","fieldName":"sv"},
        |{"type":"constant","name":"k","value":2}]}]""".stripMargin)) == month)
    // ...but aggregations and filters ARE
    assert(keysOf(q("\"month\"",
      aggs = """{"type":"count","name":"sv"}""")) != month)
    // the partial keys never collide with the nesting path's day keys
    val dayJson = q("\"day\"")
    val nesting = SegmentResultCache.decompose(dayJson, parse(dayJson), cat)
      .get.map(_.key).toSet
    assert(month.values.toSet.intersect(nesting).isEmpty,
      "partial fragments must be domain-separated from whole-slice fragments")
    // fallbacks: non-evaluable post-aggs, origin-anchored periods,
    // unknown field accesses, pathological spans
    def none(json: String): Unit =
      assert(SegmentResultCache.decomposePartial(json, parse(json), cat).isEmpty,
        s"must fall back: $json")
    // first/last merge positionally since r13 (one day value per fragment,
    // chunk-ascending) — they decompose
    assert(SegmentResultCache.decomposePartial(
      q("\"month\"", aggs = """{"type":"doubleLast","name":"lv","fieldName":"value"}"""),
      parse(q("\"month\"", aggs = """{"type":"doubleLast","name":"lv","fieldName":"value"}""")),
      cat).isDefined)
    // r14: hyperUnique/cardinality decompose as SKETCH partials — the
    // template carries the sketchPartials flag so day fragments hold
    // mergeable register bytes, and hyperUniqueCardinality post-aggs
    // evaluate at serve time over the finalized merge
    locally {
      val hq = q("\"month\"",
        aggs = """{"type":"hyperUnique","name":"uq","fieldName":"value"}""",
        extra = ""","postAggregations":[{"type":"hyperUniqueCardinality","name":"h",
          |"fieldName":"uq"}]""".stripMargin)
      val slices = SegmentResultCache.decomposePartial(hq, parse(hq), cat)
      assert(slices.isDefined)
      val hsub = slices.get.head.subQuery.asInstanceOf[Query.Timeseries]
      assert(hsub.context.get("graft.sketchPartials").contains("true"))
      assert(hsub.postAggregations.isEmpty)
    }
    // r15: origin-anchored periods and whole-hour timezones are ON the
    // surface (boundary chunks decompose at hour granularity) — only
    // off-hour-grid boundaries (a mid-hour origin, a :30/:45-offset zone)
    // still fall back
    locally {
      val oq = q("""{"type":"period","period":"P1M","origin":"2024-01-01T06:00:00Z"}""")
      val os = SegmentResultCache.decomposePartial(oq, parse(oq), cat)
      assert(os.isDefined, "hour-aligned origin must decompose")
      val nyq = q("""{"type":"period","period":"P1M","timeZone":"America/New_York"}""")
      assert(SegmentResultCache.decomposePartial(nyq, parse(nyq), cat).isDefined)
    }
    none(q("""{"type":"period","period":"P1M","origin":"2024-01-01T06:30:00Z"}"""))
    none(q("""{"type":"period","period":"P1D","timeZone":"Asia/Kathmandu"}"""))
    none(q("\"month\"", extra =
      ""","postAggregations":[{"type":"arithmetic","name":"x","fn":"+",
        |"fields":[{"type":"fieldAccess","fieldName":"no_such_agg"}]}]""".stripMargin))
    // day granularity sits on BOTH surfaces since r14 (the engine tries
    // the nesting decompose first; the partial surface serves day-gran
    // groupBy having/limitSpec shapes the nesting path refuses)
    assert(SegmentResultCache.decomposePartial(q("\"day\""),
      parse(q("\"day\"")), cat).isDefined)
    // whole-plan-error / zero-row edges stay on the whole-plan path:
    // threshold <= 0 yields zero rows there (no per-bucket arrays), and a
    // negative limit raises the planner's own error
    none("""{"queryType":"topN","dataSource":"ev","dimension":"event_type",
      |"threshold":0,"metric":"sv",
      |"intervals":["2024-04-20T00:00:00Z/2024-06-10T00:00:00Z"],
      |"granularity":"month",
      |"aggregations":[{"type":"doubleSum","name":"sv","fieldName":"value"}]}""".stripMargin)
    none("""{"queryType":"groupBy","dataSource":"ev","dimensions":["event_type"],
      |"intervals":["2024-04-20T00:00:00Z/2024-06-10T00:00:00Z"],
      |"granularity":"month",
      |"limitSpec":{"type":"default","limit":-3,"columns":[]},
      |"aggregations":[{"type":"doubleSum","name":"sv","fieldName":"value"}]}""".stripMargin)
    // ...while a positive topN threshold decomposes (to a groupBy-shaped
    // day-partial template carrying the sketchPartials flag)
    locally {
      val tj =
        """{"queryType":"topN","dataSource":"ev","dimension":"event_type",
          |"threshold":2,"metric":"sv",
          |"intervals":["2024-04-20T00:00:00Z/2024-06-10T00:00:00Z"],
          |"granularity":"month",
          |"aggregations":[{"type":"doubleSum","name":"sv","fieldName":"value"}]}""".stripMargin
      val slices = SegmentResultCache.decomposePartial(tj, parse(tj), cat)
      assert(slices.isDefined)
      assert(slices.get.head.subQuery.isInstanceOf[Query.GroupBy])
    }
    // a 2-day duration merges from day partials; a 7-hour one from HOUR
    // partials (r15 — hour-multiple, boundaries on the hour grid); a
    // 90-minute one has :30 boundaries and falls back
    assert(SegmentResultCache.decomposePartial(
      q("""{"type":"duration","duration":172800000}"""),
      parse(q("""{"type":"duration","duration":172800000}""")), cat).isDefined)
    assert(SegmentResultCache.decomposePartial(
      q("""{"type":"duration","duration":25200000}"""),
      parse(q("""{"type":"duration","duration":25200000}""")), cat).isDefined)
    none(q("""{"type":"duration","duration":5400000}"""))
    // degenerate shapes must fall back cleanly, not crash the classify
    // walk (zero-length periods divide by zero; PT parse errors throw
    // DateTimeParseException, not IllegalArgumentException — r15 review)
    none(q("""{"type":"period","period":"P0M"}"""))
    none(q("""{"type":"period","period":"P0D"}"""))
    none(q("""{"type":"period","period":"PT1X"}"""))
    none(q("""{"type":"duration","duration":0}"""))
    // span guard: a century of 2-day buckets is fine, 10,000 years is not
    val wide = q("""{"type":"duration","duration":172800000}""")
      .replace("2024-04-20T00:00:00Z/2024-06-10T00:00:00Z",
        "0100-01-01T00:00:00Z/9999-01-01T00:00:00Z")
    none(wide)
  }

  test("stripArray inverts the encoder's outer array exactly") {
    assert(SegmentResultCache.stripArray("[]") == "")
    assert(SegmentResultCache.stripArray("""[{"a":1},{"b":[2,3]}]""") ==
      """{"a":1},{"b":[2,3]}""")
    assert(SegmentResultCache.stripArray("  [1,2]  ") == "1,2")
    intercept[IllegalArgumentException](SegmentResultCache.stripArray("{}"))
  }
}
