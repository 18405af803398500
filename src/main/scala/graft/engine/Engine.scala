package graft.engine

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.model._
import graft.plan.QueryPlanner
import graft.sources.Catalog
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import java.time.Instant
import java.time.format.DateTimeFormatter
import java.util.UUID
import java.util.concurrent.{Executors, TimeUnit, TimeoutException}
import scala.util.control.NonFatal

/** Engine façade — the Spark-native equivalent of Druid's single query
  * endpoint `POST /druid/v2` (reference `query/query-module-overview.md:3-6`,
  * `query/query-internal-procedure.md:13-29`):
  *
  *   json → Query ADT → QueryPlanner → DataFrame → Catalyst → result rows
  *        → Druid-shaped JSON (`[{timestamp, result}]` per query type).
  *
  * Cancellation mirrors `DELETE /druid/v2/{id}` by running every query in a
  * Spark job group keyed by queryId (`query/query-module-overview.md:55-59`);
  * the error model mirrors `query/query-module-overview.md:60-87`.
  */
class Engine(spark: SparkSession, catalog: Catalog) {

  import Engine._

  // Druid comparisons/casts are lenient (no-match, not error) — ANSI off.
  spark.conf.set("spark.sql.ansi.enabled", "false")

  /** Parse + plan without executing — the logical surface. */
  def plan(json: String): DataFrame =
    QueryPlanner.plan(spark, QueryJson.parseQuery(json), catalog)

  def plan(q: Query): DataFrame = QueryPlanner.plan(spark, q, catalog)

  /** (query json, datasource versions) → cached result JSON. LRU, keyed so
    * any segment change invalidates (reference
    * `query/query-internal-procedure.md:43-47`, context `useCache`/
    * `populateCache` `TOC.md:39`). */
  private val resultCache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, String](128, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[String, String]): Boolean =
          size() > 128
      })

  private def datasourceNames(ds: DataSource): Seq[String] = ds match {
    case DataSource.Table(n)   => Seq(n)
    case DataSource.Union(ns)  => ns
    case DataSource.QueryD(q0) => datasourceNames(q0.dataSource)
  }

  /** Cache key / HTTP etag for a query against current segment versions. */
  def etag(json: String, query: Query): String = {
    val versions = datasourceNames(query.dataSource)
      .map(n => s"$n=${catalog.versionToken(n)}").mkString(";")
    Integer.toHexString(json.hashCode) + "-" + Integer.toHexString(versions.hashCode)
  }

  /** Execute a JSON query; returns the result as a single JSON string in the
    * query type's Druid result shape. Honors context `timeout` (millis),
    * `queryId` (cancellation key) and `useCache`/`populateCache`. */
  def executeJson(json: String): String = {
    val query =
      try QueryJson.parseQuery(json)
      catch {
        case NonFatal(e) => throw QueryError.unknown(e)
      }
    val queryId = query.context.getOrElse("queryId", UUID.randomUUID().toString)
    val timeoutMs = query.context.get("timeout").flatMap(t => t.toLongOption)

    val useCache = query.context.get("useCache").forall(_.toBoolean)
    val populateCache = query.context.get("populateCache").forall(_.toBoolean)
    val cacheKey = etag(json, query)
    if (useCache) {
      val hit = resultCache.get(cacheKey)
      if (hit != null) {
        record(QueryMetric(queryId, query.getClass.getSimpleName, 0L,
          success = true, cached = true, bytes = hit.length.toLong))
        return hit
      }
    }
    val t0 = System.nanoTime()
    def elapsedMs: Long = (System.nanoTime() - t0) / 1000000L

    spark.sparkContext.setJobGroup(queryId, s"graft query $queryId",
      interruptOnCancel = true)
    // context `priority` → scheduler pool (Druid query prioritization,
    // reference `query/query-module-overview.md:55`); takes effect when the
    // session runs the FAIR scheduler, harmless otherwise
    query.context.get("priority").foreach { p =>
      val pool = if (p.toIntOption.exists(_ > 0)) "graft_high" else "graft_low"
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
    }
    try {
      val run = () => {
        val df = QueryPlanner.plan(spark, query, catalog)
        // groupBy resource cap → the documented "Resource limit exceeded"
        // error (reference `query/query-module-overview.md:86`)
        query.context.get("maxResults").flatMap(_.toIntOption).foreach { mx =>
          if (query.isInstanceOf[Query.GroupBy] && df.limit(mx + 1).count() > mx)
            throw QueryError("Resource limit exceeded",
              s"groupBy produced more than maxResults=$mx rows",
              "ResourceLimitExceededException")
        }
        ResultEncoder.encode(query, df)
      }
      val result = timeoutMs match {
        case None => run()
        case Some(ms) =>
          val ex = Executors.newSingleThreadExecutor()
          val fut = ex.submit(new java.util.concurrent.Callable[String] {
            def call(): String = run()
          })
          try fut.get(ms, TimeUnit.MILLISECONDS)
          catch {
            case _: TimeoutException =>
              spark.sparkContext.cancelJobGroup(queryId)
              throw QueryError("Query timeout", s"query $queryId timed out after ${ms}ms",
                "QueryTimeoutException")
          } finally ex.shutdownNow()
      }
      if (populateCache) resultCache.put(cacheKey, result)
      record(QueryMetric(queryId, query.getClass.getSimpleName, elapsedMs,
        success = true, cached = false, bytes = result.length.toLong))
      result
    } catch {
      case qe: QueryError =>
        record(QueryMetric(queryId, query.getClass.getSimpleName, elapsedMs,
          success = false, cached = false, bytes = 0L))
        throw qe
      case e: InterruptedException =>
        record(QueryMetric(queryId, query.getClass.getSimpleName, elapsedMs,
          success = false, cached = false, bytes = 0L))
        throw QueryError("Query interrupted", String.valueOf(e.getMessage),
          e.getClass.getName)
      case NonFatal(e) =>
        record(QueryMetric(queryId, query.getClass.getSimpleName, elapsedMs,
          success = false, cached = false, bytes = 0L))
        if (isCancellation(e))
          throw QueryError("Query cancelled", s"query $queryId cancelled", e.getClass.getName)
        else throw QueryError.unknown(e)
    } finally {
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
      spark.sparkContext.clearJobGroup()
    }
  }

  /** Per-query metrics ring (Druid's query/time + bytes emission,
    * reference `query/query-internal-procedure.md:152-189`). */
  final case class QueryMetric(queryId: String, queryType: String, millis: Long,
      success: Boolean, cached: Boolean, bytes: Long)

  private val metricsRing = new java.util.concurrent.ConcurrentLinkedDeque[QueryMetric]()

  private def record(m: QueryMetric): Unit = {
    metricsRing.addLast(m)
    while (metricsRing.size() > 256) metricsRing.pollFirst()
  }

  /** Most recent query metrics, newest last. */
  def metrics: Seq[QueryMetric] = {
    import scala.jdk.CollectionConverters._
    metricsRing.iterator().asScala.toSeq
  }

  /** `DELETE /druid/v2/{id}` equivalent. */
  def cancel(queryId: String): Unit = spark.sparkContext.cancelJobGroup(queryId)

  /** SQL surface (SURVEY §2.1 Q10 — Druid SQL ≈ Catalyst): registers the
    * named datasources as temp views plus the engine's native functions,
    * then runs the statement. */
  def executeSql(sql: String, datasources: Seq[String]): DataFrame = {
    datasources.foreach(n => catalog.table(spark, n).createOrReplaceTempView(n))
    graft.functions.GraftFunctionRegistry.registerAll(spark)
    spark.sql(sql)
  }

  private def isCancellation(e: Throwable): Boolean = {
    var c: Throwable = e
    while (c != null) {
      if (c.getMessage != null && c.getMessage.contains("cancelled")) return true
      c = c.getCause
    }
    false
  }
}

object Engine {

  /** Error contract (reference `query/query-module-overview.md:60-87`):
    * `{error, errorMessage, errorClass, host}` with the five documented codes. */
  final case class QueryError(error: String, errorMessage: String, errorClass: String,
      host: String = java.net.InetAddress.getLoopbackAddress.getHostName)
      extends RuntimeException(s"$error: $errorMessage") {
    def toJson: String = {
      val m = new ObjectMapper()
      val o = m.createObjectNode()
      o.put("error", error); o.put("errorMessage", errorMessage)
      o.put("errorClass", errorClass); o.put("host", host)
      m.writeValueAsString(o)
    }
  }

  object QueryError {
    def unknown(e: Throwable): QueryError =
      QueryError("Unknown exception", String.valueOf(e.getMessage), e.getClass.getName)
  }
}

/** Per-query-type Druid JSON result shapes (reference
  * `query/query-timeseries.md:60-72` for timeseries; others per the Druid
  * v0.12.1 API the reference's overview links to). */
object ResultEncoder {

  private val mapper = new ObjectMapper()
  private val isoFmt = DateTimeFormatter.ISO_INSTANT

  private def tsString(v: Any): String = v match {
    case t: java.sql.Timestamp => isoFmt.format(t.toInstant)
    case i: Instant => isoFmt.format(i)
    case other => String.valueOf(other)
  }

  private def putValue(o: ObjectNode, k: String, v: Any): Unit = v match {
    case null                  => o.putNull(k)
    case b: Boolean            => o.put(k, b)
    case i: Int                => o.put(k, i)
    case l: Long               => o.put(k, l)
    case f: Float              => o.put(k, f)
    case d: Double             => o.put(k, d)
    case d: java.math.BigDecimal => o.put(k, d)
    case t: java.sql.Timestamp => o.put(k, tsString(t))
    case s: Seq[_]             =>
      val a = o.putArray(k); s.foreach(e => addValue(a, e))
    case other                 => o.put(k, String.valueOf(other))
  }

  private def addValue(a: ArrayNode, v: Any): Unit = v match {
    case null                  => a.addNull()
    case b: Boolean            => a.add(b)
    case i: Int                => a.add(i)
    case l: Long               => a.add(l)
    case f: Float              => a.add(f)
    case d: Double             => a.add(d)
    case t: java.sql.Timestamp => a.add(tsString(t))
    case s: Seq[_]             => val sub = a.addArray(); s.foreach(e => addValue(sub, e))
    case other                 => a.add(String.valueOf(other))
  }

  def encode(q: Query, df: DataFrame): String = {
    val root = mapper.createArrayNode()
    q match {
      case _: Query.Timeseries =>
        df.toLocalIterator().forEachRemaining { row =>
          val o = root.addObject()
          o.put("timestamp", tsString(row.getAs[Any]("__time")))
          val r = o.putObject("result")
          row.schema.fieldNames.filterNot(_ == "__time")
            .foreach(f => putValue(r, f, row.getAs[Any](f)))
        }
      case _: Query.GroupBy =>
        df.toLocalIterator().forEachRemaining { row =>
          val o = root.addObject()
          o.put("version", "v1")
          if (row.schema.fieldNames.contains("__time"))
            o.put("timestamp", tsString(row.getAs[Any]("__time")))
          val ev = o.putObject("event")
          row.schema.fieldNames.filterNot(_ == "__time")
            .foreach(f => putValue(ev, f, row.getAs[Any](f)))
        }
      case _: Query.TopN =>
        // rows arrive ordered by (__time, rank) — group into per-bucket arrays
        var curTs: String = null
        var curArr: ArrayNode = null
        df.toLocalIterator().forEachRemaining { row =>
          val ts = tsString(row.getAs[Any]("__time"))
          if (ts != curTs) {
            val o = root.addObject()
            o.put("timestamp", ts)
            curArr = o.putArray("result")
            curTs = ts
          }
          val e = curArr.addObject()
          row.schema.fieldNames.filterNot(_ == "__time")
            .foreach(f => putValue(e, f, row.getAs[Any](f)))
        }
      case _: Query.SearchQ =>
        val o = root.addObject()
        val arr = o.putArray("result")
        df.toLocalIterator().forEachRemaining { row =>
          val e = arr.addObject()
          row.schema.fieldNames.foreach(f => putValue(e, f, row.getAs[Any](f)))
        }
      case _: Query.TimeBoundary | _: Query.DataSourceMetadata =>
        df.toLocalIterator().forEachRemaining { row =>
          val o = root.addObject()
          val r = o.putObject("result")
          row.schema.fieldNames.foreach(f => putValue(r, f, row.getAs[Any](f)))
        }
      case _: Query.Scan =>
        val cols = df.schema.fieldNames
        val o = root.addObject()
        val colArr = o.putArray("columns")
        cols.foreach(colArr.add)
        val events = o.putArray("events")
        df.toLocalIterator().forEachRemaining { row =>
          val e = events.addArray()
          cols.indices.foreach(i => addValue(e, row.get(i)))
        }
      case sel: Query.Select =>
        val o = root.addObject()
        val r = o.putObject("result")
        val events = r.putArray("events")
        var n = 0
        df.toLocalIterator().forEachRemaining { row =>
          val e = events.addObject()
          row.schema.fieldNames.foreach(f => putValue(e, f, row.getAs[Any](f)))
          n += 1
        }
        // cursor semantics: next offset = offset this page started at + rows
        val startOffset =
          if (sel.pagingSpec.pagingIdentifiers.isEmpty) 0
          else sel.pagingSpec.pagingIdentifiers.values.max
        r.putObject("pagingIdentifiers").put("offset", startOffset + n)
      case _: Query.SegmentMetadata =>
        df.toLocalIterator().forEachRemaining { row =>
          val o = root.addObject()
          row.schema.fieldNames.foreach(f => putValue(o, f, row.getAs[Any](f)))
        }
    }
    mapper.writeValueAsString(root)
  }
}
