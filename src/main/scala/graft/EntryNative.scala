package graft

import graft.engine.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import SparkEntry.{engine, roundCols, Q, rollupStore, clusteredStore, registerTpch, q30ExactMaps, q28PlantedUnion}

/** Native Druid-shaped query surface (timeseries / topN / groupBy /
  * timeBoundary / metadata / search / select / scan) — JSON in,
  * QueryPlanner out. Split from SparkEntry (VERDICT r10 #6); zero
  * behavior change.
  */
private[graft] object EntryNative {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_timeseries_day" -> ((s, dir) =>
      roundCols(engine(s, dir).plan(Q.timeseriesDay), Seq("sum_val", "avg_val"))),
    "q02_timeseries_hour" -> ((s, dir) =>
      roundCols(engine(s, dir).plan(Q.timeseriesHour), Seq("max_val", "min_val"))),
    "q03_topn_all" -> ((s, dir) =>
      roundCols(engine(s, dir).plan(Q.topnAll), Seq("sum_val"))),
    "q04_topn_week" -> ((s, dir) => engine(s, dir).plan(Q.topnWeek)),
    "q05_groupby_day" -> ((s, dir) =>
      roundCols(engine(s, dir).plan(Q.groupbyDay), Seq("sum_val"))),
    "q06_groupby_extraction" -> ((s, dir) => engine(s, dir).plan(Q.groupbyExtraction)),
    "q07_groupby_filters" -> ((s, dir) => engine(s, dir).plan(Q.groupbyFilters)),
    "q08_groupby_firstlast" -> ((s, dir) => engine(s, dir).plan(Q.groupbyFirstLast)),
    "q09_timeseries_month_li" -> ((s, dir) =>
      roundCols(engine(s, dir).plan(Q.timeseriesMonthLineitem),
        Seq("sum_qty", "sum_price", "biggest", "qty_per_row"))),
    "q10_nested_groupby" -> ((s, dir) =>
      roundCols(engine(s, dir).plan(Q.nestedGroupby), Seq("best_day"))),
    "q11_timeboundary" -> ((s, dir) => engine(s, dir).plan(Q.timeBoundary)),
    "q12_dsmetadata" -> ((s, dir) => engine(s, dir).plan(Q.dsMetadata)),
    "q13_segment_metadata" -> ((s, dir) =>
      engine(s, dir).plan(Q.segmentMetadata).orderBy("column")),
    "q14_search" -> ((s, dir) => engine(s, dir).plan(Q.search)),
    "q15_select_page" -> ((s, dir) => engine(s, dir).plan(Q.select)),
    "q16_scan" -> ((s, dir) => engine(s, dir).plan(Q.scan)),
    "q16b_scan_compacted" -> ((s, dir) => {
      import s.implicits._
      // compactedList + batchSize JSON framing round-trip: the encoded
      // scan surface (batched columnar row arrays) is decoded back into
      // rows and compared against the SAME SQL oracle as q16 — proving the
      // encoder emits every value, once, in order, across batch boundaries.
      // Driver-side decode is bounded by the query's own limit (500) — this
      // proves the HTTP framing, it is not a data path.
      val json = engine(s, dir).executeJson(
        """{"queryType":"scan","dataSource":"events",
          |"intervals":["2024-01-02T00:00:00Z/2024-01-03T00:00:00Z"],
          |"columns":["__time","event_type","value","event_id"],
          |"filter":{"type":"bound","dimension":"value","lower":"50","ordering":"numeric"},
          |"order":"ascending","limit":500,
          |"resultFormat":"compactedList","batchSize":64}""".stripMargin)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.readTree(json)
      val buf = Seq.newBuilder[(java.sql.Timestamp, String, Double, Long)]
      var i = 0
      while (i < root.size()) {
        val ev = root.get(i).get("events")
        var j = 0
        while (j < ev.size()) {
          val e = ev.get(j)
          buf += ((java.sql.Timestamp.from(
              java.time.Instant.parse(e.get(0).asText())),
            e.get(1).asText(), e.get(2).asDouble(), e.get(3).asLong()))
          j += 1
        }
        i += 1
      }
      buf.result().toDF("__time", "event_type", "value", "event_id")
    }),
    "q17_union_timeseries" -> ((s, dir) => engine(s, dir).plan(Q.unionTimeseries)),
    "q29_rollup_query" -> ((s, dir) => {
      // ingest-time rollup end-to-end: raw events → hour-rollup segments →
      // day-granularity query with the count→sum(stored count) rewrite;
      // the oracle aggregates the RAW table, proving rollup preserves
      // query semantics (SURVEY §7.3)
      val store = rollupStore(s, dir)
      val eng = new Engine(s, new graft.store.SegmentCatalog(store))
      roundCols(eng.plan(
        """{"queryType":"timeseries","dataSource":"events_rollup",
          |"intervals":["2024-01-01T00:00:00Z/2024-01-31T00:00:00Z"],
          |"granularity":"day",
          |"aggregations":[{"type":"count","name":"cnt"},
          |  {"type":"doubleSum","name":"sum_val","fieldName":"sv"}]}""".stripMargin),
        Seq("sum_val"))
    }),
    "q30_hll_cardinality" -> ((s, dir) => {
      // hyperUnique + cardinality, BANDED against exact distinct counts: the
      // query outputs the exact counts plus booleans asserting the sketch
      // estimates land within ±5% — the DuckDB oracle recomputes the exact
      // counts and expects the bands to hold (estimates are deterministic).
      // The exact side is ORACLE SCAFFOLDING, not the engine under test —
      // it is computed once per fixture version and cached (q30ExactSide),
      // so the bench measures the sketch path, not two extra exact
      // countDistincts every pass (VERDICT r10 #1).
      val est = engine(s, dir).plan(
        """{"queryType":"timeseries","dataSource":"events",
          |"intervals":["2024-01-01T00:00:00Z/2024-02-01T00:00:00Z"],
          |"granularity":"week",
          |"aggregations":[
          |  {"type":"hyperUnique","name":"uniq_users","fieldName":"user_id"},
          |  {"type":"cardinality","name":"combo_card",
          |   "fields":["event_type","user_id"],"byRow":true}]}""".stripMargin)
      val (uniqMap, comboMap) = q30ExactMaps(s, dir)
      est
        .select(col("__time"),
          element_at(uniqMap, col("__time")).as("exact_uniq"),
          col("uniq_users"), element_at(comboMap, col("__time")).as("exact_combo"),
          col("combo_card"))
        .select(col("__time"), col("exact_uniq"),
          (abs(col("uniq_users") - col("exact_uniq")) <=
            greatest(col("exact_uniq") * 0.05, lit(2.0))).as("uniq_ok"),
          col("exact_combo"),
          (abs(col("combo_card") - col("exact_combo")) <=
            greatest(col("exact_combo") * 0.05, lit(2.0))).as("combo_ok"))
        .orderBy("__time")
    }),
    "q31_period_tz" -> ((s, dir) =>
      // P1D buckets on Asia/Shanghai local midnights (UTC+8, no DST)
      engine(s, dir).plan(
        """{"queryType":"timeseries","dataSource":"events",
          |"intervals":["2024-01-10T00:00:00Z/2024-01-15T00:00:00Z"],
          |"granularity":{"type":"period","period":"P1D","timeZone":"Asia/Shanghai"},
          |"context":{"skipEmptyBuckets":"true"},
          |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)),
    "q32_duration_gran" -> ((s, dir) =>
      // fixed 6-hour duration buckets
      engine(s, dir).plan(
        """{"queryType":"timeseries","dataSource":"events",
          |"intervals":["2024-01-03T00:00:00Z/2024-01-06T00:00:00Z"],
          |"granularity":{"type":"duration","duration":21600000},
          |"aggregations":[{"type":"count","name":"cnt"},
          |  {"type":"longMin","name":"min_ev","fieldName":"event_id"}]}""".stripMargin)),
    "q76_period_origin" -> ((s, dir) =>
      // month-period buckets anchored at a MID-MONTH origin instant
      // (2024-01-05T03:00Z): bucket starts are origin + k months, NOT
      // month-start truncations — the Druid PeriodGranularity origin
      // semantics the engine now reproduces exactly
      engine(s, dir).plan(
        """{"queryType":"timeseries","dataSource":"events",
          |"intervals":["2024-01-01T00:00:00Z/2024-02-01T00:00:00Z"],
          |"granularity":{"type":"period","period":"P1M",
          |  "origin":"2024-01-05T03:00:00Z"},
          |"context":{"skipEmptyBuckets":"true"},
          |"aggregations":[{"type":"count","name":"cnt"},
          |  {"type":"longMin","name":"min_ev","fieldName":"event_id"}]}""".stripMargin)),
    "q34_multivalue_groupby" -> ((s, dir) =>
      // groupBy on a multi-value dim: each row counts once per value
      engine(s, dir).plan(
        """{"queryType":"groupBy","dataSource":"events_mv",
          |"intervals":["2024-01-01T00:00:00Z/2024-01-10T00:00:00Z"],
          |"granularity":"all","dimensions":["tags"],
          |"aggregations":[{"type":"count","name":"cnt"}],
          |"limitSpec":{"type":"default","columns":[{"dimension":"tags","direction":"ascending"}]}}""".stripMargin)),
    "q35_multivalue_filter" -> ((s, dir) =>
      // selector filter on a multi-value dim matches ANY value
      engine(s, dir).plan(
        """{"queryType":"groupBy","dataSource":"events_mv",
          |"intervals":["2024-01-01T00:00:00Z/2024-02-01T00:00:00Z"],
          |"granularity":"all","dimensions":["event_type"],
          |"filter":{"type":"selector","dimension":"tags","value":"u3"},
          |"aggregations":[{"type":"count","name":"cnt"},
          |  {"type":"doubleSum","name":"sum_val","fieldName":"value"}],
          |"limitSpec":{"type":"default","columns":[{"dimension":"event_type","direction":"ascending"}]}}""".stripMargin)
        .withColumn("sum_val", round(col("sum_val"), 3))),
    "q36_scan_desc" -> ((s, dir) =>
      engine(s, dir).plan(
        """{"queryType":"scan","dataSource":"events",
          |"intervals":["2024-01-28T00:00:00Z/2024-01-31T00:00:00Z"],
          |"columns":["__time","event_id","user_id"],
          |"order":"descending","limit":200}""".stripMargin)),
    "q37_search_fragment" -> ((s, dir) =>
      // fragment search spec (all fragments must match) + count sort
      engine(s, dir).plan(
        """{"queryType":"search","dataSource":"events",
          |"intervals":["2024-01-01T00:00:00Z/2024-02-01T00:00:00Z"],
          |"searchDimensions":["event_type"],
          |"query":{"type":"fragment","values":["c","k"],"caseSensitive":true},
          |"sort":"count","limit":10}""".stripMargin)),
    "q38_timeformat_dim" -> ((s, dir) =>
      // timeFormat extraction fn as a grouping dimension
      engine(s, dir).plan(
        """{"queryType":"groupBy","dataSource":"events",
          |"intervals":["2024-01-01T00:00:00Z/2024-02-01T00:00:00Z"],
          |"granularity":"all",
          |"dimensions":[
          |  {"type":"extraction","dimension":"__time","outputName":"ym",
          |   "extractionFn":{"type":"timeFormat","format":"yyyy-MM-dd"}},
          |  "event_type"],
          |"filter":{"type":"bound","dimension":"event_type","lower":"p","upper":"t",
          |  "ordering":"lexicographic"},
          |"aggregations":[{"type":"count","name":"cnt"}],
          |"limitSpec":{"type":"default","limit":30,"columns":[
          |  {"dimension":"ym","direction":"ascending"},
          |  {"dimension":"event_type","direction":"ascending"}]}}""".stripMargin)),
    "q39_listfiltered_mv" -> ((s, dir) =>
      // listFiltered dimension spec over the multi-value tags dim
      engine(s, dir).plan(
        """{"queryType":"groupBy","dataSource":"events_mv",
          |"intervals":["2024-01-01T00:00:00Z/2024-01-15T00:00:00Z"],
          |"granularity":"all",
          |"dimensions":[{"type":"listFiltered",
          |  "delegate":{"type":"default","dimension":"tags","outputName":"tag"},
          |  "values":["click","view","u1","u2"],"isWhitelist":true}],
          |"aggregations":[{"type":"count","name":"cnt"}],
          |"limitSpec":{"type":"default","columns":[{"dimension":"tag","direction":"ascending"}]}}""".stripMargin)),
    "q40_select_desc" -> ((s, dir) =>
      engine(s, dir).plan(
        """{"queryType":"select","dataSource":"events",
          |"intervals":["2024-01-01T00:00:00Z/2024-02-01T00:00:00Z"],
          |"descending":true,
          |"dimensions":["event_type"],"metrics":["event_id"],
          |"pagingSpec":{"pagingIdentifiers":{},"threshold":25}}""".stripMargin)),
    "q41_colcmp_filter" -> ((s, dir) =>
      // columnComparison filter: dimA == dimB (string compare)
      engine(s, dir).plan(
        """{"queryType":"groupBy","dataSource":"lineitem",
          |"intervals":["1995-01-01T00:00:00Z/2002-01-01T00:00:00Z"],
          |"granularity":"all","dimensions":["l_returnflag"],
          |"filter":{"type":"columnComparison","dimensions":["l_suppkey","l_linenumber"]},
          |"aggregations":[{"type":"count","name":"cnt"}],
          |"limitSpec":{"type":"default","columns":[{"dimension":"l_returnflag","direction":"ascending"}]}}""".stripMargin)),
    "q42_extractions2" -> ((s, dir) =>
      // bucket / stringFormat / strlen extraction fns as dimensions
      engine(s, dir).plan(
        """{"queryType":"groupBy","dataSource":"events",
          |"intervals":["2024-01-01T00:00:00Z/2024-01-08T00:00:00Z"],
          |"granularity":"all",
          |"dimensions":[
          |  {"type":"extraction","dimension":"value","outputName":"val_bucket",
          |   "extractionFn":{"type":"bucket","size":25,"offset":0}},
          |  {"type":"extraction","dimension":"event_type","outputName":"fmt",
          |   "extractionFn":{"type":"stringFormat","format":"t[%s]"}},
          |  {"type":"extraction","dimension":"event_type","outputName":"tlen",
          |   "extractionFn":{"type":"strlen"}}],
          |"aggregations":[{"type":"count","name":"cnt"}],
          |"limitSpec":{"type":"default","columns":[
          |  {"dimension":"val_bucket","direction":"ascending","dimensionOrder":"numeric"},
          |  {"dimension":"fmt","direction":"ascending"}]}}""".stripMargin)),
    "q43_gran_none" -> ((s, dir) =>
      // granularity 'none': millisecond-identity buckets
      engine(s, dir).plan(
        """{"queryType":"timeseries","dataSource":"events",
          |"intervals":["2024-01-01T00:00:00Z/2024-01-01T02:00:00Z"],
          |"granularity":"none",
          |"aggregations":[{"type":"count","name":"cnt"},
          |  {"type":"longSum","name":"se","fieldName":"event_id"}]}""".stripMargin)),
    "q44_having_combo" -> ((s, dir) =>
      // having: and / not / dimSelector / equalTo / lessThan composition
      engine(s, dir).plan(
        """{"queryType":"groupBy","dataSource":"events",
          |"intervals":["2024-01-01T00:00:00Z/2024-01-15T00:00:00Z"],
          |"granularity":"day","dimensions":["event_type"],
          |"aggregations":[{"type":"count","name":"cnt"}],
          |"having":{"type":"and","havingSpecs":[
          |  {"type":"greaterThan","aggregation":"cnt","value":30},
          |  {"type":"lessThan","aggregation":"cnt","value":80},
          |  {"type":"not","havingSpec":{"type":"dimSelector","dimension":"event_type","value":"error"}}]},
          |"limitSpec":{"type":"default","columns":[
          |  {"dimension":"event_type","direction":"ascending"}]}}""".stripMargin)),
    "q45_postagg_constant" -> ((s, dir) =>
      // constant post-agg + arithmetic chain over it
      roundCols(engine(s, dir).plan(
        """{"queryType":"timeseries","dataSource":"events",
          |"intervals":["2024-01-01T00:00:00Z/2024-01-05T00:00:00Z"],
          |"granularity":"day",
          |"aggregations":[{"type":"doubleSum","name":"sv","fieldName":"value"}],
          |"postAggregations":[
          |  {"type":"arithmetic","name":"scaled","fn":"*","fields":[
          |    {"type":"fieldAccess","fieldName":"sv"},
          |    {"type":"constant","name":"k","value":0.001}]},
          |  {"type":"arithmetic","name":"shifted","fn":"-","fields":[
          |    {"type":"fieldAccess","fieldName":"sv"},
          |    {"type":"constant","name":"c","value":100}]}]}""".stripMargin),
        Seq("sv", "scaled", "shifted"))),
    "q48_registered_lookup" -> ((s, dir) =>
      // registeredLookup dimension → broadcast join against the catalog's
      // nation_name lookup table
      engine(s, dir).plan(
        """{"queryType":"groupBy","dataSource":"customer",
          |"intervals":["1990-01-01T00:00:00Z/2030-01-01T00:00:00Z"],
          |"granularity":"all",
          |"dimensions":[
          |  {"type":"extraction","dimension":"c_nationkey","outputName":"nation",
          |   "extractionFn":{"type":"registeredLookup","lookup":"nation_name",
          |    "replaceMissingValueWith":"UNKNOWN"}},
          |  "c_mktsegment"],
          |"aggregations":[{"type":"count","name":"cnt"},
          |  {"type":"doubleSum","name":"acct","fieldName":"c_acctbal"}],
          |"limitSpec":{"type":"default","columns":[
          |  {"dimension":"nation","direction":"ascending"},
          |  {"dimension":"c_mktsegment","direction":"ascending"}]}}""".stripMargin)
        .withColumn("acct", round(col("acct"), 2))),
    "q51_topn_multivalue" -> ((s, dir) =>
      // topN over a multi-value dim: rows count once per value, then rank
      engine(s, dir).plan(
        """{"queryType":"topN","dataSource":"events_mv",
          |"intervals":["2024-01-01T00:00:00Z/2024-01-20T00:00:00Z"],
          |"granularity":"all","dimension":"tags","threshold":4,
          |"metric":"cnt",
          |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)),
    "q55_mv_filter_extraction" -> ((s, dir) =>
      // In + Bound filters with an extractionFn over a MULTI-VALUE dim:
      // extraction applies per value with match-any semantics (the
      // stringified-array pitfall the oracle would catch)
      engine(s, dir).plan(
        """{"queryType":"timeseries","dataSource":"events_mv",
          |"intervals":["2024-01-01T00:00:00Z/2024-01-15T00:00:00Z"],
          |"granularity":"day","context":{"skipEmptyBuckets":"true"},
          |"filter":{"type":"or","fields":[
          |  {"type":"in","dimension":"tags","values":["CLICK","U3"],
          |   "extractionFn":{"type":"upper"}},
          |  {"type":"bound","dimension":"tags","lower":"view",
          |   "ordering":"lexicographic"}]},
          |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)),
    "q58_timeseries_second_spine" -> ((s, dir) =>
      engine(s, dir).plan(Q.timeseriesSecondSpine)),
    "q52_scan_throughput" -> ((s, dir) =>
      // headline raw-scan throughput: full-table aggregate, no filters
      roundCols(engine(s, dir).plan(
        """{"queryType":"timeseries","dataSource":"lineitem",
          |"intervals":["1990-01-01T00:00:00Z/2005-01-01T00:00:00Z"],
          |"granularity":"all",
          |"aggregations":[
          |  {"type":"count","name":"cnt"},
          |  {"type":"doubleSum","name":"sum_price","fieldName":"l_extendedprice"},
          |  {"type":"doubleSum","name":"sum_qty","fieldName":"l_quantity"},
          |  {"type":"doubleMax","name":"max_price","fieldName":"l_extendedprice"},
          |  {"type":"longMin","name":"min_ok","fieldName":"l_orderkey"}]}""".stripMargin),
        Seq("sum_price", "sum_qty", "max_price"), scale = 1)),
    "q67_bound_alphanumeric" -> ((s, dir) =>
      // bound filter with ordering=alphanumeric over an extracted "v<uid>"
      // tag: ("v3", "v12"] keeps uids 4..12 under the exact digit-run
      // comparator, while lexicographic keeps NOTHING ("v4".."v9" exceed
      // "v12"; "v10".."v12" fall below "v3") — the oracle pins the exact arm
      engine(s, dir).plan(
        """{"queryType":"groupBy","dataSource":"events",
          |"intervals":["2024-01-01T00:00:00Z/2024-02-01T00:00:00Z"],
          |"granularity":"all",
          |"dimensions":[{"type":"extraction","dimension":"user_id",
          |  "outputName":"tag",
          |  "extractionFn":{"type":"stringFormat","format":"v%s"}}],
          |"filter":{"type":"bound","dimension":"user_id",
          |  "lower":"v3","upper":"v12","lowerStrict":true,
          |  "ordering":"alphanumeric",
          |  "extractionFn":{"type":"stringFormat","format":"v%s"}},
          |"aggregations":[{"type":"count","name":"cnt"}],
          |"limitSpec":{"type":"default","columns":[{"dimension":"tag",
          |  "direction":"ascending","dimensionOrder":"alphanumeric"}]}}""".stripMargin)),
  )

  val oracleSql: Map[String, String] = Map(
    "q01_timeseries_day" ->
      """WITH f AS (
        |  SELECT * FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-15'
        |    AND (event_type = 'click' OR event_type = 'purchase') AND value >= 1),
        |agg AS (
        |  SELECT date_trunc('day', ts) AS __time, count(*) AS c,
        |         CAST(sum(event_id) AS BIGINT) AS se, sum(value) AS sv
        |  FROM f GROUP BY 1),
        |spine AS (
        |  SELECT unnest(generate_series(TIMESTAMP '2024-01-05',
        |    TIMESTAMP '2024-01-14', INTERVAL 1 DAY)) AS __time)
        |SELECT spine.__time AS __time, coalesce(c, 0) AS cnt,
        |  coalesce(se, 0) AS sum_ev, round(coalesce(sv, 0), 3) AS sum_val,
        |  round(CASE WHEN coalesce(c, 0) = 0 THEN 0 ELSE sv / c END, 3) AS avg_val
        |FROM spine LEFT JOIN agg USING (__time) ORDER BY 1""".stripMargin,
    "q02_timeseries_hour" ->
      """SELECT date_trunc('hour', ts) AS __time, count(*) AS cnt,
        |  CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS err_cnt,
        |  round(max(value), 3) AS max_val, round(min(value), 3) AS min_val
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-12'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q03_topn_all" ->
      """SELECT TIMESTAMP '2024-01-01' AS __time, event_type,
        |  round(sum(value), 3) AS sum_val, count(*) AS cnt
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
        |GROUP BY event_type ORDER BY sum(value) DESC, event_type LIMIT 3""".stripMargin,
    "q04_topn_week" ->
      """SELECT date_trunc('week', ts) AS __time, event_type, count(*) AS cnt
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-29'
        |GROUP BY 1, 2
        |QUALIFY row_number() OVER (PARTITION BY date_trunc('week', ts)
        |  ORDER BY count(*) DESC, event_type ASC) <= 2
        |ORDER BY 1, cnt DESC, event_type""".stripMargin,
    "q05_groupby_day" ->
      """SELECT date_trunc('day', ts) AS __time, event_type, count(*) AS cnt,
        |  round(sum(value), 3) AS sum_val
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |GROUP BY 1, 2 HAVING count(*) > 40
        |ORDER BY sum(value) DESC, event_type ASC LIMIT 50""".stripMargin,
    "q06_groupby_extraction" ->
      """SELECT upper(substr(event_type, 1, 3)) AS prefix,
        |  CASE event_type WHEN 'click' THEN 'engagement'
        |    WHEN 'view' THEN 'engagement' WHEN 'purchase' THEN 'revenue'
        |    ELSE 'other' END AS category,
        |  count(*) AS cnt
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
        |GROUP BY 1, 2 ORDER BY prefix, category""".stripMargin,
    "q07_groupby_filters" ->
      """SELECT event_type, count(*) AS cnt,
        |  CAST(max(user_id) AS BIGINT) AS max_uid,
        |  CAST(min(user_id) AS BIGINT) AS min_uid
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-03' AND ts < TIMESTAMP '2024-01-25'
        |  AND event_type IN ('click','view','signup','error')
        |  AND event_type LIKE '%i%'
        |  AND regexp_matches(event_type, '^[a-z]+$')
        |  AND event_type <> 'error'
        |  AND contains(lower(event_type), 'i')
        |  AND user_id >= 10 AND user_id <= 140
        |GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q08_groupby_firstlast" ->
      """SELECT date_trunc('day', ts) AS __time, event_type,
        |  CAST(arg_min(event_id, ts) AS BIGINT) AS first_ev,
        |  CAST(arg_max(event_id, ts) AS BIGINT) AS last_ev
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-04'
        |GROUP BY 1, 2 ORDER BY event_type""".stripMargin,
    "q09_timeseries_month_li" ->
      """WITH agg AS (
        |  SELECT date_trunc('month', l_shipdate) AS __time,
        |    sum(l_quantity) AS sq, sum(l_extendedprice) AS sp, count(*) AS c
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |    AND l_returnflag = 'N'
        |  GROUP BY 1),
        |spine AS (
        |  SELECT unnest(generate_series(TIMESTAMP '1996-01-01',
        |    TIMESTAMP '1996-12-01', INTERVAL 1 MONTH)) AS __time)
        |SELECT spine.__time AS __time, round(coalesce(sq, 0), 3) AS sum_qty,
        |  round(coalesce(sp, 0), 3) AS sum_price, coalesce(c, 0) AS cnt,
        |  round(greatest(coalesce(sq, 0), coalesce(c, 0)), 3) AS biggest,
        |  round(CASE WHEN coalesce(c, 0) = 0 THEN 0 ELSE sq / c END, 3) AS qty_per_row
        |FROM spine LEFT JOIN agg USING (__time) ORDER BY 1""".stripMargin,
    "q10_nested_groupby" ->
      """WITH inner_q AS (
        |  SELECT date_trunc('day', ts) AS __time, event_type,
        |    sum(value) AS day_val
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
        |  GROUP BY 1, 2)
        |SELECT event_type, round(max(day_val), 3) AS best_day
        |FROM inner_q GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q11_timeboundary" ->
      """SELECT min(ts) AS minTime, max(ts) AS maxTime FROM events""".stripMargin,
    "q12_dsmetadata" ->
      """SELECT max(ts) AS maxIngestedEventTime FROM events""".stripMargin,
    "q13_segment_metadata" ->
      """WITH stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT event_id) AS BIGINT) AS c_event_id,
        |  CAST(count(DISTINCT ts) AS BIGINT) AS c_ts,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS c_user_id,
        |  CAST(count(DISTINCT event_type) AS BIGINT) AS c_event_type,
        |  CAST(count(DISTINCT value) AS BIGINT) AS c_value,
        |  CAST(count(DISTINCT props) AS BIGINT) AS c_props
        |  FROM events)
        |SELECT * FROM (
        |  SELECT 'event_id' AS "column", 'bigint' AS "type", c_event_id AS cardinality, n AS "rows" FROM stats
        |  UNION ALL SELECT 'event_type', 'string', c_event_type, n FROM stats
        |  UNION ALL SELECT 'props', 'string', c_props, n FROM stats
        |  UNION ALL SELECT 'ts', 'timestamp', c_ts, n FROM stats
        |  UNION ALL SELECT 'user_id', 'bigint', c_user_id, n FROM stats
        |  UNION ALL SELECT 'value', 'double', c_value, n FROM stats)
        |ORDER BY "column"""".stripMargin,
    "q14_search" ->
      """SELECT 'event_type' AS dimension, event_type AS value, count(*) AS "count"
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-20'
        |  AND contains(lower(event_type), 'c')
        |GROUP BY event_type ORDER BY dimension, value LIMIT 10""".stripMargin,
    "q15_select_page" ->
      """SELECT ts AS __time, event_type, value, event_id
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
        |  AND event_type = 'purchase'
        |ORDER BY ts, event_type, value, event_id
        |OFFSET 100 LIMIT 50""".stripMargin,
    "q16_scan" ->
      """SELECT ts AS __time, event_type, value, event_id
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-02' AND ts < TIMESTAMP '2024-01-03'
        |  AND value >= 50
        |ORDER BY ts LIMIT 500""".stripMargin,
    // q16b: identical oracle as q16 — the compactedList JSON framing must
    // round-trip the exact same rows
    "q16b_scan_compacted" ->
      """SELECT ts AS __time, event_type, value, event_id
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-02' AND ts < TIMESTAMP '2024-01-03'
        |  AND value >= 50
        |ORDER BY ts LIMIT 500""".stripMargin,
    "q17_union_timeseries" ->
      """WITH u AS (SELECT * FROM events UNION ALL SELECT * FROM events)
        |SELECT date_trunc('day', ts) AS __time, count(*) AS cnt,
        |  CAST(sum(user_id) AS BIGINT) AS sum_uid
        |FROM u
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-05'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q29_rollup_query" ->
      """SELECT date_trunc('day', ts) AS __time, count(*) AS cnt,
        |  round(sum(value), 3) AS sum_val
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-31'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q30: exact distinct counts; the banded booleans must come out true
    "q30_hll_cardinality" ->
      """SELECT date_trunc('week', ts) AS __time,
        |  count(DISTINCT user_id) AS exact_uniq, true AS uniq_ok,
        |  count(DISTINCT (event_type, user_id)) AS exact_combo, true AS combo_ok
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q31_period_tz" ->
      """SELECT TIMESTAMP '1970-01-01 00:00:00' +
        |  (((CAST(epoch(ts) AS BIGINT) + 28800) // 86400) * 86400 - 28800) * INTERVAL 1 SECOND AS __time,
        |  count(*) AS cnt
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-15'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q32_duration_gran" ->
      """SELECT TIMESTAMP '1970-01-01 00:00:00' +
        |  ((CAST(epoch(ts) AS BIGINT) // 21600) * 21600) * INTERVAL 1 SECOND AS __time,
        |  count(*) AS cnt, CAST(min(event_id) AS BIGINT) AS min_ev
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-03' AND ts < TIMESTAMP '2024-01-06'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q36_scan_desc" ->
      """SELECT ts AS __time, event_id, user_id
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-28' AND ts < TIMESTAMP '2024-01-31'
        |ORDER BY ts DESC LIMIT 200""".stripMargin,
    "q37_search_fragment" ->
      """SELECT 'event_type' AS dimension, event_type AS value, count(*) AS "count"
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
        |  AND contains(event_type, 'c') AND contains(event_type, 'k')
        |GROUP BY event_type
        |ORDER BY "count" DESC, dimension, value LIMIT 10""".stripMargin,
    "q38_timeformat_dim" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS ym, event_type, count(*) AS cnt
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
        |  AND event_type >= 'p' AND event_type <= 't'
        |GROUP BY 1, 2 ORDER BY ym, event_type LIMIT 30""".stripMargin,
    "q39_listfiltered_mv" ->
      """WITH f AS (
        |  SELECT list_intersect([event_type, 'u' || CAST(user_id % 10 AS VARCHAR)],
        |    ['click','view','u1','u2']) AS li
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-15')
        |SELECT u.t AS tag, count(*) AS cnt
        |FROM f, unnest(CASE WHEN len(li) = 0 THEN [NULL] ELSE li END) AS u(t)
        |GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,
    "q40_select_desc" ->
      """SELECT ts AS __time, event_type, event_id
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
        |ORDER BY ts DESC, event_type, event_id
        |LIMIT 25""".stripMargin,
    "q41_colcmp_filter" ->
      """SELECT l_returnflag, count(*) AS cnt
        |FROM lineitem
        |WHERE CAST(l_suppkey AS VARCHAR) = CAST(l_linenumber AS VARCHAR)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q42_extractions2" ->
      """SELECT CAST(floor(value / 25) * 25 AS VARCHAR) AS val_bucket,
        |  't[' || event_type || ']' AS fmt,
        |  CAST(length(event_type) AS VARCHAR) AS tlen,
        |  count(*) AS cnt
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |GROUP BY 1, 2, 3
        |ORDER BY CAST(val_bucket AS DOUBLE), fmt""".stripMargin,
    "q43_gran_none" ->
      """SELECT ts AS __time, count(*) AS cnt,
        |  CAST(sum(event_id) AS BIGINT) AS se
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-01 02:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q44_having_combo" ->
      """SELECT date_trunc('day', ts) AS __time, event_type, count(*) AS cnt
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-15'
        |GROUP BY 1, 2
        |HAVING count(*) > 30 AND count(*) < 80 AND event_type <> 'error'
        |ORDER BY event_type""".stripMargin,
    "q45_postagg_constant" ->
      """SELECT date_trunc('day', ts) AS __time, round(sum(value), 3) AS sv,
        |  round(sum(value) * 0.001, 3) AS scaled,
        |  round(sum(value) - 100, 3) AS shifted
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-05'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q48_registered_lookup" ->
      """SELECT coalesce(n_name, 'UNKNOWN') AS nation, c_mktsegment,
        |  count(*) AS cnt, round(sum(c_acctbal), 2) AS acct
        |FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY nation, c_mktsegment""".stripMargin,
    "q55_mv_filter_extraction" ->
      """SELECT date_trunc('day', ts) AS __time, count(*) AS cnt
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-15'
        |  AND (upper(event_type) IN ('CLICK', 'U3')
        |    OR upper('u' || CAST(user_id % 10 AS VARCHAR)) IN ('CLICK', 'U3')
        |    OR event_type >= 'view'
        |    OR ('u' || CAST(user_id % 10 AS VARCHAR)) >= 'view')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q58_timeseries_second_spine" ->
      """WITH agg AS (
        |  SELECT date_trunc('second', ts) AS __time, count(*) AS c,
        |    CAST(sum(user_id) AS BIGINT) AS su
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-08'
        |    AND event_type = 'purchase'
        |  GROUP BY 1),
        |spine AS (
        |  SELECT unnest(generate_series(TIMESTAMP '2024-01-05',
        |    TIMESTAMP '2024-01-07 23:59:59', INTERVAL 1 SECOND)) AS __time)
        |SELECT spine.__time AS __time, coalesce(c, 0) AS cnt,
        |  coalesce(su, 0) AS sum_uid
        |FROM spine LEFT JOIN agg USING (__time) ORDER BY 1""".stripMargin,
    "q52_scan_throughput" ->
      """SELECT TIMESTAMP '1990-01-01' AS __time, count(*) AS cnt,
        |  round(sum(l_extendedprice), 1) AS sum_price,
        |  round(sum(l_quantity), 1) AS sum_qty,
        |  round(max(l_extendedprice), 1) AS max_price,
        |  CAST(min(l_orderkey) AS BIGINT) AS min_ok
        |FROM lineitem""".stripMargin,
    "q51_topn_multivalue" ->
      """SELECT TIMESTAMP '2024-01-01' AS __time, u.t AS tags, count(*) AS cnt
        |FROM events, unnest([event_type, 'u' || CAST(user_id % 10 AS VARCHAR)]) AS u(t)
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-20'
        |GROUP BY 2 ORDER BY cnt DESC, tags LIMIT 4""".stripMargin,
    "q34_multivalue_groupby" ->
      """SELECT u.t AS tags, count(*) AS cnt
        |FROM events, unnest([event_type, 'u' || CAST(user_id % 10 AS VARCHAR)]) AS u(t)
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-10'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q35_multivalue_filter" ->
      """SELECT event_type, count(*) AS cnt, round(sum(value), 3) AS sum_val
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
        |  AND list_contains([event_type, 'u' || CAST(user_id % 10 AS VARCHAR)], 'u3')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q67: the alphanumeric bound ("v3","v12"] on tag "v"||uid is exactly
    // uid in (3, 12] — DuckDB expresses the digit-run comparison numerically
    "q67_bound_alphanumeric" ->
      """SELECT 'v' || CAST(user_id AS VARCHAR) AS tag, count(*) AS cnt
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
        |  AND user_id > 3 AND user_id <= 12
        |GROUP BY 1 ORDER BY length(tag), tag""".stripMargin,
    // q76: within the queried window the only two origin-anchored month
    // buckets are origin-1M and origin — the CASE enumerates exactly the
    // boundaries origin + k months for this data range
    "q76_period_origin" ->
      """SELECT CASE WHEN ts >= TIMESTAMP '2024-01-05 03:00:00'
        |  THEN TIMESTAMP '2024-01-05 03:00:00'
        |  ELSE TIMESTAMP '2023-12-05 03:00:00' END AS __time,
        |  CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(min(event_id) AS BIGINT) AS min_ev
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
