package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Single place all fixture tables are loaded from.
  *
  * Spark 4's vectorized Parquet reader rejects TIMESTAMP(NANOS) columns
  * (PARQUET_TYPE_ILLEGAL) — the driver's `events.ts` is nanos. We read nanos
  * as long (`spark.sql.legacy.parquet.nanosAsLong`) and floor-divide to
  * microsecond timestamps, matching DuckDB's ns→µs cast of the same file
  * (both are truncations of positive epochs, so values agree exactly).
  */
object TableLoader {

  /** Columns that may arrive as nano-long and must become TimestampType. */
  private val nanoTimeColumns: Set[String] = Set("ts")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    convertNtz(convertNanos(loadRaw(spark, dir, name)))

  /** Raw read: nanos time columns stay int64 (for pushable predicates).
    *
    * DOCUMENTED side effect: the two session confs below are required to
    * read the driver's fixtures at all (nanos parquet) and to match Druid's
    * lenient cast semantics, and they are session-wide. Set idempotently
    * (no conf churn while concurrent queries analyze); an embedding
    * application that needs ANSI on should use a separate session for
    * engine work — the engine's semantics are non-ANSI by contract. */
  def loadRaw(spark: SparkSession, dir: String, name: String): DataFrame = {
    def ensure(k: String, v: String): Unit =
      if (!spark.conf.getOption(k).contains(v)) spark.conf.set(k, v)
    ensure("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The driver's fixtures carry naive timestamp[us] columns (no
    // isAdjustedToUTC flag). Spark 4 infers those as TIMESTAMP_NTZ, which
    // every time function here rejects (unix_millis, TIME_* — they require
    // the instant type). Read them as session-tz instants instead (session
    // tz is pinned UTC everywhere), matching DuckDB's naive-as-UTC reading
    // of the same file — and keeping time predicates pushable (a cast-based
    // NTZ→LTZ repair would sit above the scan and block pushdown).
    ensure("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // Druid is lenient where ANSI SQL throws (bad casts, overflow); match it.
    ensure("spark.sql.ansi.enabled", "false")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Convert any TIMESTAMP_NTZ column to a session-tz instant (session tz is
    * pinned UTC everywhere, so the naive values ARE the instants — the same
    * reading DuckDB gives the file). The inference conf in `loadRaw` already
    * keeps metadata-free fixture files out of NTZ; this catches files that
    * carry an embedded Spark schema (which overrides that conf), at the cost
    * of pushdown on those columns — acceptable for a repair path that
    * fixture files never hit. */
  def convertNtz(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == org.apache.spark.sql.types.TimestampNTZType)
        d.withColumn(f.name,
          col(f.name).cast(org.apache.spark.sql.types.TimestampType))
      else d
    }

  /** Convert any known nanos-long time column to a µs timestamp. */
  def convertNanos(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (nanoTimeColumns.contains(f.name) && f.dataType == LongType)
        d.withColumn(f.name, timestamp_micros(expr(s"`${f.name}` div 1000")))
      else d
    }
}
