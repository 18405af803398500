package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.engine.Engine
import graft.sources.MapCatalog

import java.sql.Timestamp

/** Druid-shaped JSON result contracts — the documented output formats
  * (timeseries: reference `query/query-timeseries.md:60-72`; others per the
  * v0.12.1 API surface the overview links). */
class ResultEncoderSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.from(java.time.Instant.parse(s))
  private val mapper = new ObjectMapper()

  private lazy val events = Seq(
    (ts("2024-03-01T01:00:00Z"), "click", 10.0),
    (ts("2024-03-01T02:00:00Z"), "view", 20.0),
    (ts("2024-03-02T03:00:00Z"), "view", 40.0),
  ).toDF("__time", "event_type", "value")

  private lazy val engine = new Engine(spark, new MapCatalog(Map("ev" -> events)))

  test("timeseries result: [{timestamp, result:{...}}] ordered by time") {
    val json = engine.executeJson(
      """{"queryType":"timeseries","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-03T00:00:00Z"],
        |"granularity":"day",
        |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
    val root = mapper.readTree(json)
    assert(root.isArray && root.size() == 2)
    assert(root.get(0).get("timestamp").asText() == "2024-03-01T00:00:00Z")
    assert(root.get(0).get("result").get("cnt").asLong() == 2L)
    assert(root.get(1).get("result").get("cnt").asLong() == 1L)
  }

  test("groupBy result: [{version, timestamp, event:{...}}]") {
    val json = engine.executeJson(
      """{"queryType":"groupBy","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-03T00:00:00Z"],
        |"granularity":"day","dimensions":["event_type"],
        |"aggregations":[{"type":"count","name":"cnt"}],
        |"limitSpec":{"type":"default","columns":[{"dimension":"event_type","direction":"ascending"}]}}""".stripMargin)
    val root = mapper.readTree(json)
    assert(root.get(0).get("version").asText() == "v1")
    assert(root.get(0).get("event").has("event_type"))
    assert(root.get(0).get("event").has("cnt"))
  }

  test("topN result: [{timestamp, result:[{dim, aggs}...]}] grouped per bucket") {
    val json = engine.executeJson(
      """{"queryType":"topN","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-03T00:00:00Z"],
        |"granularity":"day","dimension":"event_type","threshold":2,"metric":"cnt",
        |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
    val root = mapper.readTree(json)
    assert(root.size() == 2) // one entry per day bucket
    assert(root.get(0).get("result").isArray)
    assert(root.get(0).get("result").get(0).get("event_type").asText() == "click")
  }

  test("scan result: columns + row arrays") {
    val json = engine.executeJson(
      """{"queryType":"scan","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-03T00:00:00Z"],
        |"columns":["__time","event_type"],"order":"ascending"}""".stripMargin)
    val root = mapper.readTree(json)
    val o = root.get(0)
    assert(o.get("columns").size() == 2)
    assert(o.get("events").size() == 3)
    // default resultFormat is Druid's `list`: each event is an OBJECT
    assert(o.get("events").get(0).isObject)
    assert(o.get("events").get(0).get("event_type").isTextual)
  }

  test("scan resultFormat compactedList: positional row arrays; batchSize frames result objects") {
    val compact = engine.executeJson(
      """{"queryType":"scan","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-03T00:00:00Z"],
        |"columns":["__time","event_type"],"order":"ascending",
        |"resultFormat":"compactedList"}""".stripMargin)
    val root = mapper.readTree(compact)
    assert(root.size() == 1)
    val o = root.get(0)
    assert(o.get("events").size() == 3)
    // each event is a positional ARRAY matching `columns`
    assert(o.get("events").get(0).isArray)
    assert(o.get("events").get(0).size() == 2)
    assert(o.get("events").get(0).get(1).isTextual) // event_type slot

    // batchSize=2 over 3 rows → two {columns, events} result objects (2+1)
    val batched = mapper.readTree(engine.executeJson(
      """{"queryType":"scan","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-03T00:00:00Z"],
        |"columns":["__time","event_type"],"order":"ascending",
        |"resultFormat":"compactedList","batchSize":2}""".stripMargin))
    assert(batched.size() == 2)
    assert(batched.get(0).get("events").size() == 2)
    assert(batched.get(1).get("events").size() == 1)
    assert(batched.get(1).get("columns").size() == 2)
    // batching preserves order and content vs the unbatched run
    val flat = (0 until batched.size()).flatMap { i =>
      val ev = batched.get(i).get("events")
      (0 until ev.size()).map(j => ev.get(j).toString)
    }
    val flatRef = (0 until o.get("events").size()).map(j => o.get("events").get(j).toString)
    assert(flat == flatRef)

    // unknown formats fail loudly (the HTTP layer maps QueryError into the
    // 5-code error JSON contract), never silently fall back to a shape
    val err = intercept[graft.engine.Engine.QueryError] {
      engine.executeJson(
        """{"queryType":"scan","dataSource":"ev",
          |"intervals":["2024-03-01T00:00:00Z/2024-03-03T00:00:00Z"],
          |"resultFormat":"valueVector"}""".stripMargin)
    }
    assert(err.getMessage.contains("resultFormat"))
  }

  test("select result: events + keyset paging cursor") {
    val json = engine.executeJson(
      """{"queryType":"select","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-03T00:00:00Z"],
        |"dimensions":["event_type"],"metrics":["value"],
        |"pagingSpec":{"pagingIdentifiers":{},"threshold":2}}""".stripMargin)
    val root = mapper.readTree(json)
    val r = root.get(0).get("result")
    assert(r.get("events").size() == 2)
    // cursor = last row's __time (2024-03-01T02:00Z as epoch-µs) → 1 row consumed there
    val us2 = java.time.Instant.parse("2024-03-01T02:00:00Z").getEpochSecond * 1000000L
    assert(r.get("pagingIdentifiers").get(s"t:$us2").asInt() == 1)

    // page 2: cursor passed back verbatim → only the 3rd row remains
    val json2 = engine.executeJson(
      s"""{"queryType":"select","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-03T00:00:00Z"],
        |"dimensions":["event_type"],"metrics":["value"],
        |"pagingSpec":{"pagingIdentifiers":{"t:$us2":1},"threshold":2}}""".stripMargin)
    val r2 = mapper.readTree(json2).get(0).get("result")
    assert(r2.get("events").size() == 1)
    assert(r2.get("events").get(0).get("value").asDouble() == 40.0)
    val us3 = java.time.Instant.parse("2024-03-02T03:00:00Z").getEpochSecond * 1000000L
    assert(r2.get("pagingIdentifiers").get(s"t:$us3").asInt() == 1)

    // page 3: exhausted → empty events, cursor echoed unchanged
    val json3 = engine.executeJson(
      s"""{"queryType":"select","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-03T00:00:00Z"],
        |"dimensions":["event_type"],"metrics":["value"],
        |"pagingSpec":{"pagingIdentifiers":{"t:$us3":1},"threshold":2}}""".stripMargin)
    val r3 = mapper.readTree(json3).get(0).get("result")
    assert(r3.get("events").size() == 0)
    assert(r3.get("pagingIdentifiers").get(s"t:$us3").asInt() == 1)
  }

  test("select: legacy {offset:n} identifiers keep cumulative-offset semantics") {
    val json = engine.executeJson(
      """{"queryType":"select","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-03T00:00:00Z"],
        |"dimensions":["event_type"],"metrics":["value"],
        |"pagingSpec":{"pagingIdentifiers":{"offset":2},"threshold":2}}""".stripMargin)
    val r = mapper.readTree(json).get(0).get("result")
    assert(r.get("events").size() == 1)
    assert(r.get("pagingIdentifiers").get("offset").asInt() == 3)
  }

  test("select: Druid-compat {segmentId: offset} paging round-trips on a segment store") {
    // compat shim (query-module-overview.md:36): SegmentStore-backed selects
    // accept/emit Druid-shaped per-segment identifiers; keyset stays the
    // default for everything else (prior tests)
    val store = new graft.store.SegmentStore(
      java.nio.file.Files.createTempDirectory("graft-segpage").toString)
    store.write(events, "evseg")
    val eng = new Engine(spark, new graft.store.SegmentCatalog(store))
    val seg1 = "evseg_2024-03-01T00:00:00.000Z_2024-03-02T00:00:00.000Z_v1"
    val seg2 = "evseg_2024-03-02T00:00:00.000Z_2024-03-03T00:00:00.000Z_v1"

    // page 1: opt in via context → identifiers come back segment-shaped
    val p1 = mapper.readTree(eng.executeJson(
      """{"queryType":"select","dataSource":"evseg",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-03T00:00:00Z"],
        |"dimensions":["event_type"],"metrics":["value"],
        |"context":{"pagingFormat":"segment","useCache":"false"},
        |"pagingSpec":{"pagingIdentifiers":{},"threshold":2}}""".stripMargin))
      .get(0).get("result")
    assert(p1.get("events").size() == 2)
    assert(p1.get("pagingIdentifiers").get(seg1).asInt() == 2)

    // page 2: echo the identifiers verbatim (a Druid client's behavior —
    // no context flag needed, the key shape itself selects the shim)
    val p2 = mapper.readTree(eng.executeJson(
      s"""{"queryType":"select","dataSource":"evseg",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-03T00:00:00Z"],
        |"dimensions":["event_type"],"metrics":["value"],
        |"context":{"useCache":"false"},
        |"pagingSpec":{"pagingIdentifiers":{"$seg1":2},"threshold":2}}""".stripMargin))
      .get(0).get("result")
    assert(p2.get("events").size() == 1)
    assert(p2.get("events").get(0).get("value").asDouble() == 40.0)
    assert(p2.get("pagingIdentifiers").get(seg2).asInt() == 1)

    // page 3: exhausted → empty events, identifiers echoed unchanged
    val p3 = mapper.readTree(eng.executeJson(
      s"""{"queryType":"select","dataSource":"evseg",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-03T00:00:00Z"],
        |"dimensions":["event_type"],"metrics":["value"],
        |"context":{"useCache":"false"},
        |"pagingSpec":{"pagingIdentifiers":{"$seg2":1},"threshold":2}}""".stripMargin))
      .get(0).get("result")
    assert(p3.get("events").size() == 0)
    assert(p3.get("pagingIdentifiers").get(seg2).asInt() == 1)
  }

  test("select: descending keyset cursor pages toward older rows") {
    val json = engine.executeJson(
      """{"queryType":"select","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-03T00:00:00Z"],
        |"descending":true,
        |"dimensions":["event_type"],"metrics":["value"],
        |"pagingSpec":{"pagingIdentifiers":{},"threshold":2}}""".stripMargin)
    val r = mapper.readTree(json).get(0).get("result")
    assert(r.get("events").size() == 2)
    assert(r.get("events").get(0).get("value").asDouble() == 40.0)
    // last row of the desc page is the 02:00Z one
    val us2 = java.time.Instant.parse("2024-03-01T02:00:00Z").getEpochSecond * 1000000L
    val json2 = engine.executeJson(
      s"""{"queryType":"select","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-03T00:00:00Z"],
        |"descending":true,
        |"dimensions":["event_type"],"metrics":["value"],
        |"pagingSpec":{"pagingIdentifiers":{"t:$us2":1},"threshold":2}}""".stripMargin)
    val r2 = mapper.readTree(json2).get(0).get("result")
    assert(r2.get("events").size() == 1)
    assert(r2.get("events").get(0).get("value").asDouble() == 10.0)
  }

  test("select: druidNegativePagingIdentifiers emits Druid's negative descending offsets") {
    def page(ids: String) = mapper.readTree(engine.executeJson(
      s"""{"queryType":"select","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-03T00:00:00Z"],
        |"descending":true,
        |"context":{"druidNegativePagingIdentifiers":"true"},
        |"dimensions":["event_type"],"metrics":["value"],
        |"pagingSpec":{"pagingIdentifiers":{$ids},"threshold":2}}""".stripMargin))
      .get(0).get("result")
    val r = page("")
    assert(r.get("events").size() == 2)
    // Druid 0.12 shape: descending offsets are NEGATIVE; magnitude = rows
    // consumed at the cursor key (same as the native positive shape)
    val us2 = java.time.Instant.parse("2024-03-01T02:00:00Z").getEpochSecond * 1000000L
    assert(r.get("pagingIdentifiers").get(s"t:$us2").asInt() == -1)
    // echoing the negative cursor back resumes identically to positive
    val r2 = page(s""""t:$us2":-1""")
    assert(r2.get("events").size() == 1)
    assert(r2.get("events").get(0).get("value").asDouble() == 10.0)
    // a LEGACY global-offset identifier echoed in the negative shape must
    // resume by magnitude — the fallback `values.max` on a negative skip
    // would otherwise reach Dataset.offset() and throw
    val neg = page(""""offset":-1""")
    val pos = page(""""offset":1""")
    assert(neg.toString == pos.toString,
      s"legacy negative offset must resume like its magnitude: $neg vs $pos")
    // ascending (or flag-less) queries keep positive identifiers
    val asc = mapper.readTree(engine.executeJson(
      """{"queryType":"select","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-03T00:00:00Z"],
        |"context":{"druidNegativePagingIdentifiers":"true"},
        |"dimensions":["event_type"],"metrics":["value"],
        |"pagingSpec":{"pagingIdentifiers":{},"threshold":2}}""".stripMargin))
      .get(0).get("result").get("pagingIdentifiers")
    assert(asc.elements().next().asInt() > 0)
  }

  test("encodeStream is lazy: first chunks arrive before later partitions compute") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("__time", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val t0 = ts("2024-03-01T01:00:00Z")
    // partitions 2..3 explode if ever computed — a streaming encoder reading
    // partition-at-a-time never touches them for the first chunks
    val rdd = spark.sparkContext.parallelize(0 until 40000, 4).mapPartitionsWithIndex {
      (i, it) =>
        if (i >= 2) throw new RuntimeException("late partition computed eagerly")
        it.map(n => org.apache.spark.sql.Row(t0, s"e$n", n.toDouble))
    }
    val df = spark.createDataFrame(rdd, schema)
    val e2 = new Engine(spark, new MapCatalog(Map("big" -> df)))
    val qJson =
      """{"queryType":"scan","dataSource":"big",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-02T00:00:00Z"],
        |"order":"none"}""".stripMargin
    val q = graft.model.QueryJson.parseQuery(qJson)
    val it = graft.engine.ResultEncoder.encodeStream(
      q, e2.plan(q), None, chunkChars = 2048)
    val first = it.next()
    assert(first.nonEmpty && first.startsWith("""[{"columns":"""))
    assert(it.hasNext) // more chunks pending, stream not drained
  }

  test("encodeRowsStream (SQL rows) is lazy: first chunks precede later partitions") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    // partitions 2..3 explode if ever computed — the SQL-result encoder must
    // read partition-at-a-time like the native path (the buffered encodeRows
    // of rounds 1-4 drained ALL partitions before emitting a byte)
    val rdd = spark.sparkContext.parallelize(0 until 40000, 4).mapPartitionsWithIndex {
      (i, it) =>
        if (i >= 2) throw new RuntimeException("late partition computed eagerly")
        it.map(n => org.apache.spark.sql.Row(n.toLong, s"row$n"))
    }
    val df = spark.createDataFrame(rdd, schema)
    val it = graft.engine.ResultEncoder.encodeRowsStream(df, chunkChars = 2048)
    val first = it.next()
    assert(first.nonEmpty && first.startsWith("""[{"id":0,"name":"row0"}"""))
    assert(it.hasNext) // more chunks pending, stream not drained
  }

  test("encode (drained stream) matches the documented shapes byte-for-byte") {
    // same query through executeJson (drained stream) parses to the v0.12
    // timeseries shape with compact separators — guards the generator path
    val json = engine.executeJson(
      """{"queryType":"timeseries","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-03T00:00:00Z"],
        |"granularity":"day",
        |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
    assert(json.startsWith("""[{"timestamp":"2024-03-01T00:00:00Z","result":{"cnt":2}}"""))
    assert(!json.contains(" ")) // compact, no pretty-printing drift
  }

  test("timeBoundary result: {result:{minTime, maxTime}}") {
    val json = engine.executeJson(
      """{"queryType":"timeBoundary","dataSource":"ev"}""")
    val r = mapper.readTree(json).get(0).get("result")
    assert(r.get("minTime").asText() == "2024-03-01T01:00:00Z")
    assert(r.get("maxTime").asText() == "2024-03-02T03:00:00Z")
  }

  test("cancellation: cancel(queryId) aborts a running query") {
    val e2 = new Engine(spark, new MapCatalog(
      Map("big" -> SparkTestBase.interruptiblySlowDF(spark, ts("2024-03-01T00:00:00Z")))))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val fut = Future(
      try Left(e2.executeJson(
        """{"queryType":"timeseries","dataSource":"big",
          |"intervals":["2024-03-01T00:00:00Z/2024-03-02T00:00:00Z"],
          |"granularity":"all","context":{"queryId":"kill-me"},
          |"aggregations":[{"type":"longSum","name":"s","fieldName":"id"}]}""".stripMargin))
      catch { case e: Exception => Right(e) })
    Thread.sleep(1500)
    e2.cancel("kill-me")
    Await.result(fut, 120.seconds) match {
      case Right(err: Engine.QueryError) =>
        assert(err.error == "Query cancelled" || err.error == "Unknown exception")
      case Right(other) => fail(s"unexpected: $other")
      case Left(_) => fail("query completed despite cancellation")
    }
    // the cancel must actually TERMINATE the running tasks (job-tag
    // cancellation reaches AQE stage jobs): the slow source would need
    // ~30s/task to drain naturally, so an empty scheduler within 10s
    // proves the interrupt landed
    val deadline = System.currentTimeMillis() + 10000
    def active = spark.sparkContext.statusTracker.getActiveJobIds()
    while (System.currentTimeMillis() < deadline && active.nonEmpty)
      Thread.sleep(200)
    assert(active.isEmpty, "cancelled query's tasks must terminate, not linger")
  }
}
