package graft.model

import java.time.Instant

/** Query/filter/aggregator ADTs mirroring the capability surface of the
  * reference (Apache Druid v0.12.1 as documented by coolplaydata/coolplaydruid;
  * taxonomy: reference `query/query-module-overview.md:18-45`, `TOC.md:24-40`,
  * timeseries spec: `query/query-timeseries.md:44-56`).
  *
  * These are pure data — compiled to Spark `Column`s / `DataFrame` plans by
  * `graft.expr.*` and `graft.plan.QueryPlanner`.
  */

/** ISO-8601 interval `start/end` (end exclusive), e.g. the `intervals` field
  * of every query (reference `query/query-timeseries.md:51`). */
final case class Interval(start: Instant, end: Instant) {
  require(!end.isBefore(start), s"interval end < start: $start/$end")
}

object Interval {
  /** Parse `"2024-01-01T00:00:00Z/2024-02-01T00:00:00Z"` (also accepts bare
    * dates / datetimes without zone, interpreted as UTC). */
  def parse(s: String): Interval = {
    val Array(a, b) = s.split("/", 2)
    Interval(parseInstant(a), parseInstant(b))
  }

  def parseInstant(s: String): Instant = {
    val t = s.trim
    try Instant.parse(t)
    catch {
      case _: java.time.format.DateTimeParseException =>
        // tolerate "2024-01-01" and "2024-01-01T00:00:00[.SSS]" (no zone)
        val padded =
          if (t.length == 10) t + "T00:00:00Z"
          else if (t.endsWith("Z")) t
          else t + "Z"
        Instant.parse(padded)
    }
  }
}

// ---------------------------------------------------------------------------
// Granularity (reference `query/query-module-overview.md:44`, `TOC.md:37`,
// usage `query/query-timeseries.md:12,52`)
// ---------------------------------------------------------------------------

sealed trait Granularity
object Granularity {
  /** one bucket for the whole interval */
  case object All extends Granularity
  /** millisecond identity — no bucketing */
  case object NoneG extends Granularity
  /** second/minute/fifteen_minute/thirty_minute/hour/day/week/month/quarter/year */
  final case class Simple(unit: String) extends Granularity
  /** fixed duration in millis with optional origin */
  final case class Duration(millis: Long, origin: Option[Instant]) extends Granularity
  /** ISO-8601 period (P1D, PT1H, ...) with optional timezone + origin */
  final case class Period(period: String, timeZone: Option[String], origin: Option[Instant])
      extends Granularity

  val simpleUnits: Set[String] = Set(
    "second", "minute", "fifteen_minute", "thirty_minute", "hour",
    "day", "week", "month", "quarter", "year")
}

// ---------------------------------------------------------------------------
// Filters (reference `query/query-module-overview.md:41`, `TOC.md:34`;
// and/or/selector documented in `query/query-timeseries.md:14-25`)
// ---------------------------------------------------------------------------

sealed trait Filter
object Filter {
  final case class Selector(dimension: String, value: Option[String],
      extractionFn: Option[ExtractionFn] = None) extends Filter
  final case class In(dimension: String, values: Seq[String],
      extractionFn: Option[ExtractionFn] = None) extends Filter
  /** ordering: lexicographic | alphanumeric | numeric | strlen (Druid default
    * in v0.12.1 is lexicographic unless alphaNumeric=true) */
  final case class Bound(dimension: String, lower: Option[String], upper: Option[String],
      lowerStrict: Boolean, upperStrict: Boolean, ordering: String,
      extractionFn: Option[ExtractionFn] = None) extends Filter
  final case class Like(dimension: String, pattern: String, escape: Option[String],
      extractionFn: Option[ExtractionFn] = None) extends Filter
  final case class Regex(dimension: String, pattern: String,
      extractionFn: Option[ExtractionFn] = None) extends Filter
  /** search on dim values (reference `query/query-module-overview.md:32`) */
  final case class Search(dimension: String, query: SearchQuerySpec,
      extractionFn: Option[ExtractionFn] = None) extends Filter
  /** `__time` (or any millis column) within intervals */
  final case class IntervalF(dimension: String, intervals: Seq[Interval],
      extractionFn: Option[ExtractionFn] = None) extends Filter
  /** dimA == dimB */
  final case class ColumnComparison(dimensions: Seq[String]) extends Filter
  final case class And(fields: Seq[Filter]) extends Filter
  final case class Or(fields: Seq[Filter]) extends Filter
  final case class Not(field: Filter) extends Filter
  /** always-true / always-false (Druid `true`/`false` filters) */
  case object True extends Filter
}

/** SearchQuerySpec (reference `query/query-module-overview.md:32-33`) */
sealed trait SearchQuerySpec
object SearchQuerySpec {
  final case class InsensitiveContains(value: String) extends SearchQuerySpec
  final case class Contains(value: String, caseSensitive: Boolean) extends SearchQuerySpec
  final case class Fragment(values: Seq[String], caseSensitive: Boolean) extends SearchQuerySpec
  final case class RegexS(pattern: String) extends SearchQuerySpec
}

// ---------------------------------------------------------------------------
// Aggregators (reference `query/query-module-overview.md:42`, `TOC.md:35`;
// longSum/doubleSum documented `query/query-timeseries.md:27-28`)
// ---------------------------------------------------------------------------

sealed trait Aggregator { def name: String }
object Aggregator {
  final case class Count(name: String) extends Aggregator
  /** typ: long | double | float */
  final case class Sum(name: String, fieldName: String, typ: String) extends Aggregator
  final case class Min(name: String, fieldName: String, typ: String) extends Aggregator
  final case class Max(name: String, fieldName: String, typ: String) extends Aggregator
  /** value at earliest `__time` in group */
  final case class First(name: String, fieldName: String, typ: String) extends Aggregator
  /** value at latest `__time` in group */
  final case class Last(name: String, fieldName: String, typ: String) extends Aggregator
  /** approx distinct over an ingested sketch / dimension */
  final case class HyperUnique(name: String, fieldName: String) extends Aggregator
  /** approx distinct of dimension combos; byRow=false counts per-dim-value */
  final case class Cardinality(name: String, fields: Seq[String], byRow: Boolean)
      extends Aggregator
  final case class Filtered(filter: Filter, aggregator: Aggregator) extends Aggregator {
    def name: String = aggregator.name
  }
}

// ---------------------------------------------------------------------------
// Post-aggregators (reference `query/query-module-overview.md:43`, `TOC.md:36`;
// arithmetic/fieldAccess documented `query/query-timeseries.md:30-39`)
// ---------------------------------------------------------------------------

sealed trait PostAggregator { def name: String }
object PostAggregator {
  /** fn: + - * / quotient ; `/` yields 0 on divide-by-zero (Druid semantics) */
  final case class Arithmetic(name: String, fn: String, fields: Seq[PostAggregator])
      extends PostAggregator
  final case class FieldAccess(name: String, fieldName: String) extends PostAggregator
  final case class FinalizingFieldAccess(name: String, fieldName: String) extends PostAggregator
  final case class Constant(name: String, value: Double) extends PostAggregator
  /** typ: double | long ; fn: greatest | least */
  final case class GreatestLeast(name: String, fn: String, typ: String,
      fields: Seq[PostAggregator]) extends PostAggregator
  final case class HyperUniqueCardinality(name: String, fieldName: String) extends PostAggregator
}

// ---------------------------------------------------------------------------
// DimensionSpecs & extraction functions (reference
// `query/query-module-overview.md:45`, `TOC.md:38`)
// ---------------------------------------------------------------------------

sealed trait ExtractionFn
object ExtractionFn {
  final case class RegexE(expr: String, index: Int, replaceMissingValue: Boolean,
      replaceMissingValueWith: Option[String]) extends ExtractionFn
  /** 0-based index, optional length (Druid substring extractionFn) */
  final case class Substring(index: Int, length: Option[Int]) extends ExtractionFn
  case object Strlen extends ExtractionFn
  case object Upper extends ExtractionFn
  case object Lower extends ExtractionFn
  /** format `__time` (or a parsed time dim) with a pattern + tz + granularity */
  final case class TimeFormat(format: Option[String], timeZone: Option[String],
      granularity: Option[Granularity]) extends ExtractionFn
  /** reparse time strings between formats */
  final case class TimeParse(timeFormat: String, resultFormat: String) extends ExtractionFn
  final case class Bucket(size: Double, offset: Double) extends ExtractionFn
  /** sprintf of the value */
  final case class StringFormat(format: String) extends ExtractionFn
  final case class Cascade(extractionFns: Seq[ExtractionFn]) extends ExtractionFn
  /** null-unless-regex-match */
  final case class Partial(expr: String) extends ExtractionFn
  /** null-unless-search-match */
  final case class SearchQueryE(query: SearchQuerySpec) extends ExtractionFn
  /** key→value mapping with missing-value policy (Druid lookup extractionFn) */
  final case class Lookup(map: Map[String, String], retainMissingValue: Boolean,
      replaceMissingValueWith: Option[String]) extends ExtractionFn
  /** named lookup resolved from the catalog — big lookups become broadcast
    * joins at plan time (Druid registeredLookup; SURVEY §2.4) */
  final case class RegisteredLookup(name: String, retainMissingValue: Boolean,
      replaceMissingValueWith: Option[String]) extends ExtractionFn
}

sealed trait DimensionSpec { def outputName: String }
object DimensionSpec {
  final case class Default(dimension: String, outputName: String,
      outputType: Option[String] = None) extends DimensionSpec
  final case class Extraction(dimension: String, outputName: String,
      extractionFn: ExtractionFn, outputType: Option[String] = None) extends DimensionSpec
  /** keep whitelist/blacklist subset of a multi-value dim's values */
  final case class ListFiltered(delegate: DimensionSpec, values: Seq[String],
      isWhitelist: Boolean) extends DimensionSpec {
    def outputName: String = delegate.outputName
  }
  final case class RegexFiltered(delegate: DimensionSpec, pattern: String)
      extends DimensionSpec {
    def outputName: String = delegate.outputName
  }
}

// ---------------------------------------------------------------------------
// Having & limit specs (groupBy-only; reference `TOC.md:26`, SURVEY §2.7)
// ---------------------------------------------------------------------------

sealed trait HavingSpec
object HavingSpec {
  final case class EqualTo(aggregation: String, value: Double) extends HavingSpec
  final case class GreaterThan(aggregation: String, value: Double) extends HavingSpec
  final case class LessThan(aggregation: String, value: Double) extends HavingSpec
  final case class DimSelector(dimension: String, value: String) extends HavingSpec
  final case class AndH(specs: Seq[HavingSpec]) extends HavingSpec
  final case class OrH(specs: Seq[HavingSpec]) extends HavingSpec
  final case class NotH(spec: HavingSpec) extends HavingSpec
  final case class FilterH(filter: Filter) extends HavingSpec
}

/** direction: ascending | descending; dimensionOrder: lexicographic |
  * alphanumeric | numeric | strlen */
final case class OrderByColumnSpec(dimension: String, direction: String,
    dimensionOrder: String)

final case class LimitSpec(columns: Seq[OrderByColumnSpec], limit: Option[Int])

// ---------------------------------------------------------------------------
// TopN metric specs (reference `query/query-module-overview.md:24`)
// ---------------------------------------------------------------------------

sealed trait TopNMetricSpec
object TopNMetricSpec {
  final case class Numeric(metric: String) extends TopNMetricSpec
  final case class Lexicographic(previousStop: Option[String]) extends TopNMetricSpec
  final case class Alphanumeric(previousStop: Option[String]) extends TopNMetricSpec
  final case class Inverted(delegate: TopNMetricSpec) extends TopNMetricSpec
}

// ---------------------------------------------------------------------------
// DataSources (reference `query/query-module-overview.md:40`, `TOC.md:33`)
// ---------------------------------------------------------------------------

sealed trait DataSource
object DataSource {
  final case class Table(name: String) extends DataSource
  final case class Union(names: Seq[String]) extends DataSource
  /** nested inner-query datasource (groupBy over groupBy) */
  final case class QueryD(query: Query) extends DataSource
}

// ---------------------------------------------------------------------------
// Paging (select query; reference `query/query-module-overview.md:36`)
// ---------------------------------------------------------------------------

final case class PagingSpec(pagingIdentifiers: Map[String, Int], threshold: Int)

// ---------------------------------------------------------------------------
// Queries (reference `query/query-module-overview.md:18-37`, `TOC.md:24-31`)
// ---------------------------------------------------------------------------

sealed trait Query {
  def dataSource: DataSource
  def context: Map[String, String]
}

object Query {
  /** reference `query/query-timeseries.md` (fully documented) */
  final case class Timeseries(
      dataSource: DataSource,
      intervals: Seq[Interval],
      granularity: Granularity,
      filter: Option[Filter],
      aggregations: Seq[Aggregator],
      postAggregations: Seq[PostAggregator],
      descending: Boolean,
      context: Map[String, String] = Map.empty) extends Query

  final case class TopN(
      dataSource: DataSource,
      intervals: Seq[Interval],
      granularity: Granularity,
      dimension: DimensionSpec,
      threshold: Int,
      metric: TopNMetricSpec,
      filter: Option[Filter],
      aggregations: Seq[Aggregator],
      postAggregations: Seq[PostAggregator],
      context: Map[String, String] = Map.empty) extends Query

  final case class GroupBy(
      dataSource: DataSource,
      intervals: Seq[Interval],
      granularity: Granularity,
      dimensions: Seq[DimensionSpec],
      filter: Option[Filter],
      aggregations: Seq[Aggregator],
      postAggregations: Seq[PostAggregator],
      having: Option[HavingSpec],
      limitSpec: Option[LimitSpec],
      context: Map[String, String] = Map.empty) extends Query

  /** bound: minTime | maxTime | both */
  final case class TimeBoundary(
      dataSource: DataSource,
      bound: String,
      filter: Option[Filter],
      context: Map[String, String] = Map.empty) extends Query

  final case class SegmentMetadata(
      dataSource: DataSource,
      intervals: Seq[Interval],
      analysisTypes: Seq[String],
      merge: Boolean,
      context: Map[String, String] = Map.empty) extends Query

  final case class DataSourceMetadata(
      dataSource: DataSource,
      context: Map[String, String] = Map.empty) extends Query

  /** sort: lexicographic | alphanumeric | strlen | count (value sort) */
  final case class SearchQ(
      dataSource: DataSource,
      intervals: Seq[Interval],
      granularity: Granularity,
      searchDimensions: Seq[String],
      query: SearchQuerySpec,
      sort: String,
      limit: Int,
      filter: Option[Filter],
      context: Map[String, String] = Map.empty) extends Query

  final case class Select(
      dataSource: DataSource,
      intervals: Seq[Interval],
      descending: Boolean,
      dimensions: Seq[String],
      metrics: Seq[String],
      pagingSpec: PagingSpec,
      filter: Option[Filter],
      context: Map[String, String] = Map.empty) extends Query

  /** order: none | ascending | descending.
    * resultFormat: list (events as objects, the Druid default) |
    * compactedList (events as positional row arrays matching `columns`).
    * batchSize: max events per result object — the encoder opens a fresh
    * {columns, events} object each time a batch fills, Druid's framing
    * for streaming consumers. */
  final case class Scan(
      dataSource: DataSource,
      intervals: Seq[Interval],
      columns: Seq[String],
      limit: Option[Long],
      order: String,
      filter: Option[Filter],
      resultFormat: String = "list",
      batchSize: Int = 20480,
      context: Map[String, String] = Map.empty) extends Query
}
