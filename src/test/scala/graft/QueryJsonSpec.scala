package graft

import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** Parse tests: every query/filter/agg type deserializes to the right ADT
  * case — mirrors Druid's polymorphic Jackson binding contract
  * (reference `query/query-internal-procedure.md:30-51`). */
class QueryJsonSpec extends AnyFunSuite {

  test("reference timeseries example parses (query/query-timeseries.md:8-41)") {
    // the reference's own documented query, verbatim structure
    val json =
      """{
        |  "queryType": "timeseries",
        |  "dataSource": "sample_datasource",
        |  "granularity": "day",
        |  "descending": "true",
        |  "filter": {
        |    "type": "and",
        |    "fields": [
        |      { "type": "selector", "dimension": "sample_dimension1", "value": "sample_value1" },
        |      { "type": "or",
        |        "fields": [
        |          { "type": "selector", "dimension": "sample_dimension2", "value": "sample_value2" },
        |          { "type": "selector", "dimension": "sample_dimension3", "value": "sample_value3" }
        |        ]
        |      }
        |    ]
        |  },
        |  "aggregations": [
        |    { "type": "longSum", "name": "sample_name1", "fieldName": "sample_fieldName1" },
        |    { "type": "doubleSum", "name": "sample_name2", "fieldName": "sample_fieldName2" }
        |  ],
        |  "postAggregations": [
        |    { "type": "arithmetic",
        |      "name": "sample_divide",
        |      "fn": "/",
        |      "fields": [
        |        { "type": "fieldAccess", "name": "postAgg__sample_name1", "fieldName": "sample_name1" },
        |        { "type": "fieldAccess", "name": "postAgg__sample_name2", "fieldName": "sample_name2" }
        |      ]
        |    }
        |  ],
        |  "intervals": [ "2012-01-01T00:00:00.000/2012-01-03T00:00:00.000" ]
        |}""".stripMargin
    val q = QueryJson.parseQuery(json).asInstanceOf[Query.Timeseries]
    assert(q.dataSource == DataSource.Table("sample_datasource"))
    assert(q.granularity == Granularity.Simple("day"))
    assert(q.descending)
    assert(q.aggregations == Seq(
      Aggregator.Sum("sample_name1", "sample_fieldName1", "long"),
      Aggregator.Sum("sample_name2", "sample_fieldName2", "double")))
    val pa = q.postAggregations.head.asInstanceOf[PostAggregator.Arithmetic]
    assert(pa.fn == "/")
    assert(pa.fields.map(_.asInstanceOf[PostAggregator.FieldAccess].fieldName) ==
      Seq("sample_name1", "sample_name2"))
    val and = q.filter.get.asInstanceOf[Filter.And]
    assert(and.fields.size == 2)
    assert(and.fields(1).asInstanceOf[Filter.Or].fields.size == 2)
    assert(q.intervals.head.start.toString == "2012-01-01T00:00:00Z")
  }

  test("every filter type parses") {
    def f(j: String): Filter = QueryJson.parseFilter(
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(j))
    assert(f("""{"type":"selector","dimension":"d","value":"v"}""")
      == Filter.Selector("d", Some("v"), None))
    assert(f("""{"type":"in","dimension":"d","values":["a","b"]}""")
      == Filter.In("d", Seq("a", "b"), None))
    assert(f("""{"type":"bound","dimension":"d","lower":"1","upper":"9","ordering":"numeric"}""")
      .isInstanceOf[Filter.Bound])
    assert(f("""{"type":"like","dimension":"d","pattern":"a%"}""").isInstanceOf[Filter.Like])
    assert(f("""{"type":"regex","dimension":"d","pattern":"^a"}""").isInstanceOf[Filter.Regex])
    assert(f("""{"type":"search","dimension":"d","query":{"type":"insensitive_contains","value":"x"}}""")
      .isInstanceOf[Filter.Search])
    assert(f("""{"type":"interval","dimension":"__time","intervals":["2020-01-01/2020-02-01"]}""")
      .isInstanceOf[Filter.IntervalF])
    assert(f("""{"type":"columnComparison","dimensions":["a","b"]}""")
      == Filter.ColumnComparison(Seq("a", "b")))
    assert(f("""{"type":"not","field":{"type":"selector","dimension":"d","value":null}}""")
      == Filter.Not(Filter.Selector("d", None, None)))
  }

  test("every aggregator type parses") {
    def a(j: String): Aggregator = QueryJson.parseAggregator(
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(j))
    assert(a("""{"type":"count","name":"c"}""") == Aggregator.Count("c"))
    assert(a("""{"type":"longSum","name":"s","fieldName":"f"}""") == Aggregator.Sum("s", "f", "long"))
    assert(a("""{"type":"floatMin","name":"m","fieldName":"f"}""") == Aggregator.Min("m", "f", "float"))
    assert(a("""{"type":"doubleMax","name":"m","fieldName":"f"}""") == Aggregator.Max("m", "f", "double"))
    assert(a("""{"type":"longFirst","name":"x","fieldName":"f"}""") == Aggregator.First("x", "f", "long"))
    assert(a("""{"type":"doubleLast","name":"x","fieldName":"f"}""") == Aggregator.Last("x", "f", "double"))
    assert(a("""{"type":"hyperUnique","name":"h","fieldName":"f"}""") == Aggregator.HyperUnique("h", "f"))
    assert(a("""{"type":"cardinality","name":"c","fields":["a","b"],"byRow":true}""")
      == Aggregator.Cardinality("c", Seq("a", "b"), byRow = true))
    val filtered = a(
      """{"type":"filtered","filter":{"type":"selector","dimension":"d","value":"v"},
        |"aggregator":{"type":"count","name":"fc"}}""".stripMargin)
    assert(filtered.asInstanceOf[Aggregator.Filtered].name == "fc")
  }

  test("granularities parse: simple, duration, period") {
    def g(j: Option[String]): Granularity = QueryJson.parseGranularity(
      j.map(new com.fasterxml.jackson.databind.ObjectMapper().readTree))
    assert(g(None) == Granularity.All)
    assert(g(Some("\"hour\"")) == Granularity.Simple("hour"))
    assert(g(Some("\"none\"")) == Granularity.NoneG)
    assert(g(Some("""{"type":"duration","duration":7200000}"""))
      == Granularity.Duration(7200000L, None))
    assert(g(Some("""{"type":"period","period":"P1D","timeZone":"America/New_York"}"""))
      == Granularity.Period("P1D", Some("America/New_York"), None))
  }

  test("nested query datasource parses recursively") {
    val q = QueryJson.parseQuery(
      """{"queryType":"groupBy",
        |"dataSource":{"type":"query","query":{
        |  "queryType":"groupBy","dataSource":"t",
        |  "intervals":["2020-01-01/2020-02-01"],"granularity":"all",
        |  "dimensions":["d"],"aggregations":[{"type":"count","name":"c"}]}},
        |"intervals":["2020-01-01/2020-02-01"],"granularity":"all",
        |"dimensions":["d"],"aggregations":[{"type":"longSum","name":"s","fieldName":"c"}]}""".stripMargin)
      .asInstanceOf[Query.GroupBy]
    val inner = q.dataSource.asInstanceOf[DataSource.QueryD].query.asInstanceOf[Query.GroupBy]
    assert(inner.dataSource == DataSource.Table("t"))
  }

  test("unknown types fail with a clear message") {
    val e = intercept[QueryJson.QueryParseException](
      QueryJson.parseQuery("""{"queryType":"bogus","dataSource":"t","intervals":["2020-01-01/2020-02-01"]}"""))
    assert(e.getMessage.contains("bogus"))
  }

  test("extraction fns parse") {
    def x(j: String) = QueryJson.parseExtractionFn(
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(j))
    assert(x("""{"type":"substring","index":1,"length":3}""") == ExtractionFn.Substring(1, Some(3)))
    assert(x("""{"type":"regex","expr":"(\\w+)","index":1}""").isInstanceOf[ExtractionFn.RegexE])
    assert(x("""{"type":"timeFormat","format":"yyyy-MM","timeZone":"UTC"}""")
      .isInstanceOf[ExtractionFn.TimeFormat])
    assert(x("""{"type":"lookup","lookup":{"type":"map","map":{"a":"1"}},"retainMissingValue":true}""")
      == ExtractionFn.Lookup(Map("a" -> "1"), retainMissingValue = true, None))
    assert(x("""{"type":"cascade","extractionFns":[{"type":"lower"},{"type":"strlen"}]}""")
      == ExtractionFn.Cascade(Seq(ExtractionFn.Lower, ExtractionFn.Strlen)))
  }
}
