package graft

import graft.engine.Engine
import graft.sources.ParquetDirCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is an operator from SURVEY.md §2 (or a driver-
  * mandated pipeline extension), and runs through the real engine path:
  * native Druid-shaped JSON → Query ADT → QueryPlanner → DataFrame.
  * `oracleSql` holds the DuckDB-equivalent SQL for the hash-compare gate.
  *
  * Result post-processing done here (rounding of double aggregates, explicit
  * orderBy) exists only to make the hash compare robust: float summation
  * order differs between engines, and queries without a total order would be
  * hash-unstable.
  */
object SparkEntry {

  // --- plumbing ------------------------------------------------------------

  private[graft] val engines = scala.collection.concurrent.TrieMap.empty[String, Engine]

  private[graft] def engine(spark: SparkSession, dir: String): Engine =
    engines.getOrElseUpdate(dir, new Engine(spark, new ParquetDirCatalog(dir)))

  /** round the named double columns to `scale` decimals (hash robustness) */
  private[graft] def roundCols(df: DataFrame, cols: Seq[String], scale: Int = 3): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, round(col(c), scale)))

  private[graft] val registeredViews = scala.collection.concurrent.TrieMap.empty[String, Boolean]

  private[graft] val rollupStores = scala.collection.concurrent.TrieMap.empty[String, graft.store.SegmentStore]

  /** Build (once per JVM per sf dir) an hour-rollup segment store from the
    * raw events table — the ingest-time rollup fixture (SURVEY §7.3). */
  private[graft] def rollupStore(spark: SparkSession, dir: String): graft.store.SegmentStore =
    rollupStores.getOrElseUpdate(dir, {
      val root = java.nio.file.Files.createTempDirectory("graft_rollup").toString
      val store = new graft.store.SegmentStore(root)
      val events = graft.sources.TableLoader.load(spark, dir, "events")
        .withColumn("__time", col("ts")).drop("ts")
      store.write(events, "events_rollup",
        rollup = Some((graft.model.Granularity.Simple("hour"),
          Seq("event_type"),
          Seq(graft.model.Aggregator.Sum("sv", "value", "double")))))
      store
    })

  /** q30's exact-distinct banding side, computed ONCE PER FIXTURE VERSION
    * and cached as parquet under `target/fixture-cache` (keyed on the
    * events fixture's length+mtime, so a driver-regenerated fixture
    * recomputes). The exact counts are oracle scaffolding — the ±5% bands
    * the query asserts — not the engine path under test; recomputing two
    * exact `countDistinct`s (one over a struct → Expand) every bench pass
    * made q30 measure the scaffolding, not the sketch (VERDICT r10 #1).
    * Values are identical either way, so correctness is unaffected.
    * Concurrent builders (multi-JVM rehearsal) race benignly: each writes
    * a pid-suffixed temp dir and the loser of the atomic rename discards
    * its copy. The loaded side (a handful of week rows) folds into the
    * query as two LITERAL timestamp→count maps (cached per JVM), so the
    * banding check is a pure projection on the sketch plan — no join, no
    * second scan. */
  private[graft] val q30ExactCache =
    scala.collection.concurrent.TrieMap.empty[String,
      Map[java.sql.Timestamp, (Long, Long)]]

  private[graft] def q30ExactMaps(s: SparkSession, dir: String): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val m = q30ExactCache.getOrElseUpdate(dir,
      q30ExactSideOnDisk(s, dir).collect().map(r =>
        r.getTimestamp(0) -> (r.getLong(1), r.getLong(2))).toMap)
    val uniq = map(m.toSeq.sortBy(_._1.getTime).flatMap { case (t, (u, _)) =>
      Seq(lit(t), lit(u)) }: _*)
    val combo = map(m.toSeq.sortBy(_._1.getTime).flatMap { case (t, (_, c)) =>
      Seq(lit(t), lit(c)) }: _*)
    (uniq, combo)
  }

  private[graft] def q30ExactSideOnDisk(s: SparkSession, dir: String): DataFrame = {
    val src = new java.io.File(s"$dir/events.parquet")
    val key = java.lang.Integer.toHexString(scala.util.hashing.MurmurHash3
      .stringHash(s"${src.getAbsolutePath}:${src.length}:${src.lastModified}"))
    val cacheRoot = new java.io.File("target/fixture-cache")
    val out = new java.io.File(cacheRoot, s"q30_exact_$key")
    if (!out.isDirectory) {
      val ev = graft.sources.TableLoader.load(s, dir, "events")
        .where(col("ts") >= lit(java.sql.Timestamp.from(
            java.time.Instant.parse("2024-01-01T00:00:00Z"))) &&
          col("ts") < lit(java.sql.Timestamp.from(
            java.time.Instant.parse("2024-02-01T00:00:00Z"))))
      val exact = ev.groupBy(date_trunc("week", col("ts")).as("__time"))
        .agg(countDistinct(col("user_id")).as("exact_uniq"),
          countDistinct(col("event_type"), col("user_id")).as("exact_combo"))
      val tmp = new java.io.File(cacheRoot,
        s".q30_exact_$key.tmp.${ProcessHandle.current.pid}")
      exact.coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      if (!tmp.renameTo(out)) { // lost the race — another JVM built it
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(tmp)
      }
    }
    s.read.parquet(out.getAbsolutePath)
  }

  private[graft] val clusteredStores = scala.collection.concurrent.TrieMap.empty[String, graft.store.SegmentStore]

  /** Build (once per JVM per sf dir) clustered snapshots of the two largest
    * fact tables, bucketed on the orderkey join key — the layout a 100-TB
    * deployment would keep for its repeated fact-fact joins (q60). */
  private[graft] def clusteredStore(spark: SparkSession, dir: String): graft.store.SegmentStore =
    clusteredStores.getOrElseUpdate(dir, {
      val root = java.nio.file.Files.createTempDirectory("graft_clustered").toString
      // per-JVM scratch (13 GB at the 1000x SF): delete on exit — killed
      // bench JVMs leaked three of these and ran the box out of disk (r17)
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(new java.io.File(root))
      }, "graft-clustered-cleanup"))
      val store = new graft.store.SegmentStore(root)
      val lineitem = graft.sources.TableLoader.load(spark, dir, "lineitem")
      // bucket count SCALES with the fact table (~4M rows/bucket, floor
      // 16): a fixed 16 leaves 37M-row buckets at the 1000× SF, and the
      // zero-Exchange join then runs 16-wide on a 32-core box with
      // per-task spill (measured r16: q60 sf100 72 s → 26.6 s once sized).
      // Both sides MUST share the count — that is the co-location
      // contract. Small SFs keep the historical 16 (plan pins + oracles
      // untouched). One count job, once per (dir, JVM).
      val nBuckets = math.max(16L, lineitem.count() / 4000000L).toInt
      store.writeClustered(lineitem, "lineitem_c", "l_orderkey", nBuckets)
      store.writeClustered(graft.sources.TableLoader.load(spark, dir, "orders"),
        "orders_c", "o_orderkey", nBuckets)
      store
    })

  private[graft] def registerTpch(spark: SparkSession, dir: String): Unit =
    registeredViews.getOrElseUpdate(dir, {
      Seq("lineitem", "orders", "customer", "supplier", "part", "nation", "region",
        "events", "documents", "embeddings").foreach { t =>
        graft.sources.TableLoader.load(spark, dir, t).createOrReplaceTempView(t)
      }
      graft.functions.GraftFunctionRegistry.registerAll(spark)
      true
    })

  // --- flagship ------------------------------------------------------------

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * This is SURVEY §7.7's minimum slice: the reference's own documented
    * timeseries query shape (`query/query-timeseries.md:8-41`) end-to-end. */
  def entry(spark: SparkSession): DataFrame =
    engine(spark, "/root/testdata/sf0.001").plan(Q.timeseriesDay)

  // --- native query JSON specs --------------------------------------------

  private[graft] object Q {
    /** reference `query/query-timeseries.md:8-41` shape: and/or/selector +
      * bound filter, longSum/doubleSum, arithmetic post-agg, day buckets,
      * zero-fill. */
    val timeseriesDay: String =
      """{"queryType":"timeseries","dataSource":"events",
         |"intervals":["2024-01-05T00:00:00Z/2024-01-15T00:00:00Z"],
         |"granularity":"day",
         |"filter":{"type":"and","fields":[
         |  {"type":"or","fields":[
         |    {"type":"selector","dimension":"event_type","value":"click"},
         |    {"type":"selector","dimension":"event_type","value":"purchase"}]},
         |  {"type":"bound","dimension":"value","lower":"1","ordering":"numeric"}]},
         |"aggregations":[
         |  {"type":"count","name":"cnt"},
         |  {"type":"longSum","name":"sum_ev","fieldName":"event_id"},
         |  {"type":"doubleSum","name":"sum_val","fieldName":"value"}],
         |"postAggregations":[
         |  {"type":"arithmetic","name":"avg_val","fn":"/","fields":[
         |    {"type":"fieldAccess","fieldName":"sum_val"},
         |    {"type":"fieldAccess","fieldName":"cnt"}]}]}""".stripMargin

    /** hour granularity + filtered aggregator + skipEmptyBuckets */
    val timeseriesHour: String =
      """{"queryType":"timeseries","dataSource":"events",
         |"intervals":["2024-01-10T00:00:00Z/2024-01-12T00:00:00Z"],
         |"granularity":"hour",
         |"context":{"skipEmptyBuckets":"true"},
         |"aggregations":[
         |  {"type":"count","name":"cnt"},
         |  {"type":"filtered","filter":{"type":"selector","dimension":"event_type","value":"error"},
         |   "aggregator":{"type":"count","name":"err_cnt"}},
         |  {"type":"doubleMax","name":"max_val","fieldName":"value"},
         |  {"type":"doubleMin","name":"min_val","fieldName":"value"}]}""".stripMargin

    /** second granularity over 3 days = 259,200 zero-filled buckets: the
      * spine is generated on executors (`spark.range` per interval), so the
      * old 200k driver-side cap is gone and the zero-fill contract
      * (reference `query/query-timeseries.md:74-95`) holds at any spine
      * size — this is the monitoring-dashboard query shape at 100× scale. */
    val timeseriesSecondSpine: String =
      """{"queryType":"timeseries","dataSource":"events",
         |"intervals":["2024-01-05T00:00:00Z/2024-01-08T00:00:00Z"],
         |"granularity":"second",
         |"filter":{"type":"selector","dimension":"event_type","value":"purchase"},
         |"aggregations":[
         |  {"type":"count","name":"cnt"},
         |  {"type":"longSum","name":"sum_uid","fieldName":"user_id"}]}""".stripMargin

    /** topN over one dimension, granularity all (global top-K) */
    val topnAll: String =
      """{"queryType":"topN","dataSource":"events",
         |"intervals":["2024-01-01T00:00:00Z/2024-02-01T00:00:00Z"],
         |"granularity":"all","dimension":"event_type","threshold":3,
         |"metric":"sum_val",
         |"aggregations":[
         |  {"type":"doubleSum","name":"sum_val","fieldName":"value"},
         |  {"type":"count","name":"cnt"}]}""".stripMargin

    /** topN per week bucket */
    val topnWeek: String =
      """{"queryType":"topN","dataSource":"events",
         |"intervals":["2024-01-01T00:00:00Z/2024-01-29T00:00:00Z"],
         |"granularity":"week","dimension":"event_type","threshold":2,
         |"metric":"cnt",
         |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin

    /** groupBy: bucket + dim, having, limitSpec with numeric ordering */
    val groupbyDay: String =
      """{"queryType":"groupBy","dataSource":"events",
         |"intervals":["2024-01-01T00:00:00Z/2024-01-08T00:00:00Z"],
         |"granularity":"day",
         |"dimensions":["event_type"],
         |"aggregations":[
         |  {"type":"count","name":"cnt"},
         |  {"type":"doubleSum","name":"sum_val","fieldName":"value"}],
         |"having":{"type":"greaterThan","aggregation":"cnt","value":40},
         |"limitSpec":{"type":"default","limit":50,"columns":[
         |  {"dimension":"sum_val","direction":"descending","dimensionOrder":"numeric"},
         |  {"dimension":"event_type","direction":"ascending"}]}}""".stripMargin

    /** groupBy with extraction dimension specs: substring+upper cascade and a
      * lookup dimension (SURVEY §2.4) */
    val groupbyExtraction: String =
      """{"queryType":"groupBy","dataSource":"events",
         |"intervals":["2024-01-01T00:00:00Z/2024-02-01T00:00:00Z"],
         |"granularity":"all",
         |"dimensions":[
         |  {"type":"extraction","dimension":"event_type","outputName":"prefix",
         |   "extractionFn":{"type":"cascade","extractionFns":[
         |     {"type":"substring","index":0,"length":3},
         |     {"type":"upper"}]}},
         |  {"type":"extraction","dimension":"event_type","outputName":"category",
         |   "extractionFn":{"type":"lookup","lookup":{"type":"map","map":{
         |     "click":"engagement","view":"engagement","purchase":"revenue"}},
         |     "replaceMissingValueWith":"other"}}],
         |"aggregations":[{"type":"count","name":"cnt"}],
         |"limitSpec":{"type":"default","columns":[
         |  {"dimension":"prefix","direction":"ascending"},
         |  {"dimension":"category","direction":"ascending"}]}}""".stripMargin

    /** every remaining filter type in one groupBy: in/like/regex/not/search/
      * interval/columnComparison (SURVEY §2.2) */
    val groupbyFilters: String =
      """{"queryType":"groupBy","dataSource":"events",
         |"intervals":["2024-01-01T00:00:00Z/2024-02-01T00:00:00Z"],
         |"granularity":"all",
         |"dimensions":["event_type"],
         |"filter":{"type":"and","fields":[
         |  {"type":"in","dimension":"event_type","values":["click","view","signup","error"]},
         |  {"type":"like","dimension":"event_type","pattern":"%i%"},
         |  {"type":"regex","dimension":"event_type","pattern":"^[a-z]+$"},
         |  {"type":"not","field":{"type":"selector","dimension":"event_type","value":"error"}},
         |  {"type":"search","dimension":"event_type","query":{"type":"insensitive_contains","value":"i"}},
         |  {"type":"interval","dimension":"__time","intervals":["2024-01-03T00:00:00Z/2024-01-25T00:00:00Z"]},
         |  {"type":"bound","dimension":"user_id","lower":"10","upper":"140","ordering":"numeric"}]},
         |"aggregations":[{"type":"count","name":"cnt"},
         |  {"type":"longMax","name":"max_uid","fieldName":"user_id"},
         |  {"type":"longMin","name":"min_uid","fieldName":"user_id"}],
         |"limitSpec":{"type":"default","columns":[{"dimension":"event_type","direction":"ascending"}]}}""".stripMargin

    /** first/last aggregators by day (min_by/max_by over __time) */
    val groupbyFirstLast: String =
      """{"queryType":"groupBy","dataSource":"events",
         |"intervals":["2024-01-01T00:00:00Z/2024-01-04T00:00:00Z"],
         |"granularity":"day",
         |"dimensions":["event_type"],
         |"aggregations":[
         |  {"type":"longFirst","name":"first_ev","fieldName":"event_id"},
         |  {"type":"longLast","name":"last_ev","fieldName":"event_id"}],
         |"limitSpec":{"type":"default","columns":[
         |  {"dimension":"event_type","direction":"ascending"}]}}""".stripMargin

    /** timeseries over lineitem (l_shipdate as __time) at month granularity,
      * post-agg arithmetic chain (greatest/least) */
    val timeseriesMonthLineitem: String =
      """{"queryType":"timeseries","dataSource":"lineitem",
         |"intervals":["1996-01-01T00:00:00Z/1997-01-01T00:00:00Z"],
         |"granularity":"month",
         |"filter":{"type":"selector","dimension":"l_returnflag","value":"N"},
         |"aggregations":[
         |  {"type":"doubleSum","name":"sum_qty","fieldName":"l_quantity"},
         |  {"type":"doubleSum","name":"sum_price","fieldName":"l_extendedprice"},
         |  {"type":"count","name":"cnt"}],
         |"postAggregations":[
         |  {"type":"doubleGreatest","name":"biggest","fields":[
         |    {"type":"fieldAccess","fieldName":"sum_qty"},
         |    {"type":"fieldAccess","fieldName":"cnt"}]},
         |  {"type":"arithmetic","name":"qty_per_row","fn":"/","fields":[
         |    {"type":"fieldAccess","fieldName":"sum_qty"},
         |    {"type":"fieldAccess","fieldName":"cnt"}]}]}""".stripMargin

    /** nested query datasource: re-aggregate an inner groupBy (SURVEY §2.8) */
    val nestedGroupby: String =
      """{"queryType":"groupBy",
         |"dataSource":{"type":"query","query":
         |  {"queryType":"groupBy","dataSource":"events",
         |   "intervals":["2024-01-01T00:00:00Z/2024-02-01T00:00:00Z"],
         |   "granularity":"day",
         |   "dimensions":["event_type"],
         |   "aggregations":[{"type":"doubleSum","name":"day_val","fieldName":"value"}]}},
         |"intervals":["2024-01-01T00:00:00Z/2024-02-01T00:00:00Z"],
         |"granularity":"all",
         |"dimensions":["event_type"],
         |"aggregations":[{"type":"doubleMax","name":"best_day","fieldName":"day_val"}],
         |"limitSpec":{"type":"default","columns":[{"dimension":"event_type","direction":"ascending"}]}}""".stripMargin

    val timeBoundary: String =
      """{"queryType":"timeBoundary","dataSource":"events","bound":"both"}""".stripMargin

    val dsMetadata: String =
      """{"queryType":"dataSourceMetadata","dataSource":"events"}""".stripMargin

    val segmentMetadata: String =
      """{"queryType":"segmentMetadata","dataSource":"events",
         |"analysisTypes":["cardinality"]}""".stripMargin

    val search: String =
      """{"queryType":"search","dataSource":"events",
         |"intervals":["2024-01-01T00:00:00Z/2024-01-20T00:00:00Z"],
         |"searchDimensions":["event_type"],
         |"query":{"type":"insensitive_contains","value":"c"},
         |"sort":"lexicographic","limit":10}""".stripMargin

    val select: String =
      """{"queryType":"select","dataSource":"events",
         |"intervals":["2024-01-01T00:00:00Z/2024-02-01T00:00:00Z"],
         |"dimensions":["event_type"],"metrics":["value","event_id"],
         |"filter":{"type":"selector","dimension":"event_type","value":"purchase"},
         |"pagingSpec":{"pagingIdentifiers":{"offset":100},"threshold":50}}""".stripMargin

    val scan: String =
      """{"queryType":"scan","dataSource":"events",
         |"intervals":["2024-01-02T00:00:00Z/2024-01-03T00:00:00Z"],
         |"columns":["__time","event_type","value","event_id"],
         |"filter":{"type":"bound","dimension":"value","lower":"50","ordering":"numeric"},
         |"order":"ascending","limit":500}""".stripMargin

    /** union datasource: events ∪ events (same-schema union semantics) */
    val unionTimeseries: String =
      """{"queryType":"timeseries",
         |"dataSource":{"type":"union","dataSources":["events","events"]},
         |"intervals":["2024-01-01T00:00:00Z/2024-01-05T00:00:00Z"],
         |"granularity":"day",
         |"aggregations":[{"type":"count","name":"cnt"},
         |  {"type":"longSum","name":"sum_uid","fieldName":"user_id"}]}""".stripMargin
  }

  // --- queries (driver-verified against DuckDB) ----------------------------

  /** The 92-query registry, split by family (VERDICT r10 #6): native
    * Druid-shaped queries ([[EntryNative]]), SQL ([[EntrySql]]), and the
    * LLM-data-pipeline operators ([[EntryPipeline]]). Concatenation is
    * pure aggregation — names are disjoint (asserted) and each family
    * file carries its queries AND their DuckDB oracles side by side. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val m = EntryNative.queries ++ EntrySql.queries ++ EntryPipeline.queries
    assert(m.size == EntryNative.queries.size + EntrySql.queries.size +
      EntryPipeline.queries.size, "query families must not share names")
    m
  }

  /** q28's corpus: embeddings ∪ deterministically perturbed copies of every
    * 4th vector (`v'[j] = float(v[j] + ((vec_id*31 + j) % 7 - 3) * 0.01)`,
    * planted ids offset by 1e6). Shared with ExtSpec's skew-cap gate so the
    * gate asserts the exact corpus + banding the benched entry runs. */
  def q28PlantedUnion(s: SparkSession, dir: String): DataFrame = {
    val emb = graft.sources.TableLoader.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    // two-step select: Spark 4's lateral column alias resolution would
    // otherwise bind `vec_id` INSIDE the lambda to the +1000000 alias
    // (shifting every delta); DuckDB's oracle subquery guards the same way
    val planted = emb.where(col("vec_id") % 4 === 0)
      .select(col("vec_id"),
        transform(col("embedding"), (x, j) =>
          (x.cast("double") +
            (((col("vec_id") * 31 + j) % 7) - 3) * 0.01).cast("float"))
          .as("emb2"))
      .select((col("vec_id") + 1000000L).as("vec_id"),
        col("emb2").as("embedding"))
    emb.unionByName(planted)
  }

  // --- DuckDB oracle SQL ----------------------------------------------------

  def oracleSql: Map[String, String] =
    EntryNative.oracleSql ++ EntrySql.oracleSql ++ EntryPipeline.oracleSql
}
