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
  }

  test("select result: events + cumulative paging cursor") {
    val json = engine.executeJson(
      """{"queryType":"select","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-03T00:00:00Z"],
        |"dimensions":["event_type"],"metrics":["value"],
        |"pagingSpec":{"pagingIdentifiers":{},"threshold":2}}""".stripMargin)
    val root = mapper.readTree(json)
    val r = root.get(0).get("result")
    assert(r.get("events").size() == 2)
    assert(r.get("pagingIdentifiers").get("offset").asInt() == 2)

    // page 2: cursor continues from the returned offset
    val json2 = engine.executeJson(
      """{"queryType":"select","dataSource":"ev",
        |"intervals":["2024-03-01T00:00:00Z/2024-03-03T00:00:00Z"],
        |"dimensions":["event_type"],"metrics":["value"],
        |"pagingSpec":{"pagingIdentifiers":{"offset":2},"threshold":2}}""".stripMargin)
    val r2 = mapper.readTree(json2).get(0).get("result")
    assert(r2.get("events").size() == 1) // only the 3rd row remains
    assert(r2.get("pagingIdentifiers").get("offset").asInt() == 3)
  }

  test("timeBoundary result: {result:{minTime, maxTime}}") {
    val json = engine.executeJson(
      """{"queryType":"timeBoundary","dataSource":"ev"}""")
    val r = mapper.readTree(json).get(0).get("result")
    assert(r.get("minTime").asText() == "2024-03-01T01:00:00Z")
    assert(r.get("maxTime").asText() == "2024-03-02T03:00:00Z")
  }

  test("cancellation: cancel(queryId) aborts a running query") {
    val big = spark.range(3000000).toDF("id")
      .withColumn("__time", org.apache.spark.sql.functions.lit(ts("2024-03-01T00:00:00Z")))
    val e2 = new Engine(spark, new MapCatalog(
      Map("big" -> big.crossJoin(big.select(org.apache.spark.sql.functions.col("id").as("id2"))))))
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
  }
}
