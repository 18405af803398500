package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Resolves datasource names to DataFrames with a normalized `__time`
  * column — the engine's "table in an RDBMS" abstraction (reference
  * `query/query-timeseries.md:49`). The `__time` normalization mirrors
  * Druid's mandatory timestamp column (SURVEY §1.2).
  */
trait Catalog {
  def table(spark: SparkSession, name: String): DataFrame

  /** Interval-routed resolution: implementations backed by a segment
    * timeline (manifest) return only the segments overlapping `intervals` —
    * the Druid broker's interval→segment routing
    * (reference `query/query-internal-procedure.md:7`). Default: no routing.
    */
  def table(spark: SparkSession, name: String,
      intervals: Seq[graft.model.Interval]): DataFrame = table(spark, name)

  /** If the named datasource is stored rolled-up, the name of its stored
    * count metric — query-time `count` must become `sum` of it
    * (SURVEY §7.3). */
  def rollupCountColumn(name: String): Option[String] = None

  /** Per-segment metadata (chunk id, version, row count) when the
    * datasource is backed by a segment timeline — powers segmentMetadata
    * with merge=false. Default: unknown. */
  def segmentInfos(name: String): Seq[(String, Int, Long)] = Seq.empty

  /** Time ranges covered by at least one segment, when the datasource is
    * backed by a segment timeline. Timeseries zero-fill applies ONLY inside
    * covered ranges — intervals with no segments yield no buckets at all
    * (reference `query/query-timeseries.md:93`: missing segments are
    * skipped, not zero-filled). Default: unknown → full zero-fill. */
  def chunkCoverage(name: String): Option[Seq[graft.model.Interval]] = None

  /** Registered lookup table: (key, value)-schema DataFrame, broadcast-
    * joined by the planner for registeredLookup dimension specs. */
  def lookupTable(spark: SparkSession, name: String): Option[DataFrame] = None

  /** Names of the registered lookups (for the SQL LOOKUP function). */
  def lookupNames: Seq[String] = Seq.empty

  /** Version token of a datasource's current state — result-cache entries
    * are keyed on it so any segment change invalidates them (the etag
    * basis, reference `query/query-internal-procedure.md:43-47`). */
  def versionToken(name: String): String = "static"

  /** Known datasource names, when the catalog can enumerate them — powers
    * the segment metric family at `GET /druid/v2/metrics`. Default: not
    * enumerable. */
  def datasourceNames: Seq[String] = Seq.empty
}

/** Catalog over a flat directory of `<name>.parquet` files (the driver's
  * TESTDATA layout), mapping each table's event-time column to `__time`.
  * The original column is kept so queries can reference it as a dimension.
  */
class ParquetDirCatalog(dir: String,
    timeColumns: Map[String, String] = ParquetDirCatalog.defaultTimeColumns)
    extends Catalog {

  // keyed by (session, name): a DataFrame is bound to the session that
  // built it — serving session A's cached frame to session B fails with
  // "Cannot call methods on a stopped SparkContext" once A closes
  private val cache = scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]

  def table(spark: SparkSession, name: String): DataFrame =
    cache.getOrElseUpdate((System.identityHashCode(spark), name), name match {
      // derived datasource with a multi-value (array) dimension `tags` —
      // the Druid multi-value-string fixture (SURVEY §7.4, FIXTURES.md)
      case "events_mv" =>
        table(spark, "events").withColumn("tags",
          array(col("event_type"),
            concat(lit("u"), (col("user_id") % 10).cast("string"))))
      case _ =>
        val df = TableLoader.load(spark, dir, name)
        timeColumns.get(name) match {
          case Some(tc) if df.columns.contains(tc) =>
            df.withColumn("__time", col(tc))
          case _ if df.columns.contains("__time") => df
          case _ => df
        }
    })

  /** Interval-routed read for the nanos-timestamp tables: the predicate is
    * applied to the RAW int64 nanos column before conversion, so it pushes
    * into the Parquet scan (row-group min/max pruning) — the converted
    * `__time` expression above it never can. */
  override def table(spark: SparkSession, name: String,
      intervals: Seq[graft.model.Interval]): DataFrame = {
    def nanos(i: java.time.Instant): Long =
      i.getEpochSecond * 1000000000L + i.getNano
    val base = table(spark, name)
    val tc = timeColumns.get(if (name == "events_mv") "events" else name)
    if (intervals.isEmpty || tc.isEmpty) base
    else {
      val raw = TableLoader.loadRaw(spark, dir,
        if (name == "events_mv") "events" else name)
      raw.schema.fields.find(_.name == tc.get).map(_.dataType) match {
        case Some(org.apache.spark.sql.types.LongType) =>
          // nanos-as-long source: pushable predicate on the raw column
          val pred = intervals.map(iv =>
            col(tc.get) >= nanos(iv.start) && col(tc.get) < nanos(iv.end))
            .reduce(_ || _)
          val routed = TableLoader.convertNanos(raw.where(pred))
            .withColumn("__time", col(tc.get))
          if (name == "events_mv")
            routed.withColumn("tags", array(col("event_type"),
              concat(lit("u"), (col("user_id") % 10).cast("string"))))
          else routed
        case _ => base // native timestamps already push down
      }
    }
  }

  override def lookupNames: Seq[String] = Seq("nation_name", "region_name")

  /** Enumerable: the `<name>.parquet` entries under the directory (plus
    * the derived `events_mv` fixture when its base table exists) — powers
    * the metrics endpoint's datasource family and the server liveness
    * line. Listed per call: the dir is a live deployment surface. */
  override def datasourceNames: Seq[String] = {
    val d = new java.io.File(dir)
    val base = Option(d.list()).getOrElse(Array.empty[String])
      .filter(_.endsWith(".parquet")).map(_.stripSuffix(".parquet")).toSeq
    (if (base.contains("events")) base :+ "events_mv" else base).sorted
  }

  /** Built-in fixture lookups: nation/region key→name (FIXTURES.md). */
  override def lookupTable(spark: SparkSession, name: String): Option[DataFrame] =
    name match {
      case "nation_name" => Some(TableLoader.load(spark, dir, "nation")
        .select(col("n_nationkey").cast("string").as("key"), col("n_name").as("value")))
      case "region_name" => Some(TableLoader.load(spark, dir, "region")
        .select(col("r_regionkey").cast("string").as("key"), col("r_name").as("value")))
      case _ => None
    }
}

/** In-memory catalog (tests, embedded use). DataFrames must already carry a
  * `__time` column if time semantics are needed. */
class MapCatalog(tables: Map[String, DataFrame]) extends Catalog {
  def table(spark: SparkSession, name: String): DataFrame =
    tables.getOrElse(name,
      throw new IllegalArgumentException(s"unknown datasource '$name'"))

  override def datasourceNames: Seq[String] = tables.keys.toSeq.sorted
}

object ParquetDirCatalog {
  /** Event-time column per TESTDATA table (FIXTURES.md). */
  val defaultTimeColumns: Map[String, String] = Map(
    "events"   -> "ts",
    "lineitem" -> "l_shipdate",
    "orders"   -> "o_orderdate")
}
