package graft

import graft.engine.Engine
import graft.sources.ParquetDirCatalog
import org.apache.spark.sql.DataFrame


/** Plan-quality gates: the properties that keep queries viable at 100 TB
  * must be visible in the physical plan, not just assumed — filter/column
  * pushdown to the scan, partial top-K before the topN shuffle, broadcast
  * joins for small dimension sides. A regression here is a scale bug even
  * when results stay correct. */
class PlanQualitySpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private lazy val engine = new Engine(spark, new ParquetDirCatalog(dir))

  private def physicalPlan(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("interval + selector filters push down to the parquet scan (lineitem)") {
    val df = engine.plan(
      """{"queryType":"timeseries","dataSource":"lineitem",
        |"intervals":["1996-01-01T00:00:00Z/1997-01-01T00:00:00Z"],
        |"granularity":"month",
        |"filter":{"type":"selector","dimension":"l_returnflag","value":"N"},
        |"aggregations":[{"type":"doubleSum","name":"sq","fieldName":"l_quantity"}]}""".stripMargin)
    val plan = physicalPlan(df)
    assert(plan.contains("PushedFilters:"), "no pushed filters section")
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") || plan.contains("gte(l_shipdate"),
      s"interval lower bound not pushed:\n${plan.take(2000)}")
    assert(plan.contains("EqualTo(l_returnflag,N)") || plan.contains("eq(l_returnflag"),
      "selector filter not pushed")
  }

  test("nanos-timestamp source: interval predicate pushes on the raw column") {
    val df = engine.plan(
      """{"queryType":"timeseries","dataSource":"events",
        |"intervals":["2024-01-05T00:00:00Z/2024-01-10T00:00:00Z"],
        |"granularity":"day",
        |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
    val plan = physicalPlan(df)
    assert(plan.contains("GreaterThanOrEqual(ts") || plan.contains("gte(ts"),
      s"raw nanos lower bound not pushed:\n${plan.take(1500)}")
  }

  test("column pruning: scan reads only referenced columns") {
    val df = engine.plan(
      """{"queryType":"timeseries","dataSource":"lineitem",
        |"intervals":["1996-01-01T00:00:00Z/1997-01-01T00:00:00Z"],
        |"granularity":"all",
        |"aggregations":[{"type":"doubleSum","name":"sq","fieldName":"l_quantity"}]}""".stripMargin)
    val plan = physicalPlan(df)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_quantity") && readSchema.contains("l_shipdate"))
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_comment"),
      s"scan reads unreferenced columns: $readSchema")
  }

  test("topN compiles to partial top-K before the shuffle (WindowGroupLimit)") {
    val df = engine.plan(
      """{"queryType":"topN","dataSource":"events",
        |"intervals":["2024-01-01T00:00:00Z/2024-02-01T00:00:00Z"],
        |"granularity":"day","dimension":"event_type","threshold":3,"metric":"cnt",
        |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
    assert(physicalPlan(df).contains("WindowGroupLimit"),
      "topN should pre-limit per partition before shuffling")
  }

  test("capPerGroup's bare window gets a partial top-K (WindowGroupLimit)") {
    // the hot-group straggler guard is CATALYST's: row_number + rk<=k
    // rewrites to a per-partition partial limit before the shuffle, so the
    // single-task sort sees at most partitions*k rows per group — measured
    // at a 100M-row single group: bare window 2.8s vs salted prune 11.5s
    // (the salt pays an extra shuffle+window for nothing on Spark >= 3.5)
    import org.apache.spark.sql.functions._
    val rows = spark.range(10000L).toDF("id")
      .withColumn("grp", (col("id") % 3).cast("string"))
      .withColumn("score", (col("id") * 131 % 997).cast("double"))
    val plain = graft.ext.Curation.capPerGroup(rows, Seq("grp"),
      Seq(col("score").desc, col("id").asc), k = 5)
    assert(physicalPlan(plain).contains("WindowGroupLimit"),
      "capPerGroup's row_number filter should pre-limit per partition")
  }

  test("aggregations are partial->final (map-side combine)") {
    val df = engine.plan(
      """{"queryType":"groupBy","dataSource":"events",
        |"intervals":["2024-01-01T00:00:00Z/2024-02-01T00:00:00Z"],
        |"granularity":"all","dimensions":["event_type"],
        |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
    val plan = physicalPlan(df)
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      "no partial aggregation before shuffle")
  }

  test("registeredLookup dim becomes a broadcast join") {
    val df = engine.plan(
      """{"queryType":"groupBy","dataSource":"customer",
        |"intervals":["1990-01-01T00:00:00Z/2030-01-01T00:00:00Z"],
        |"granularity":"all",
        |"dimensions":[{"type":"extraction","dimension":"c_nationkey","outputName":"nation",
        |  "extractionFn":{"type":"registeredLookup","lookup":"nation_name"}}],
        |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
    assert(physicalPlan(df).contains("BroadcastHashJoin"),
      "lookup should broadcast, not shuffle")
  }

  test("segmentMetadata default cardinality is EXACT (Druid semantics), no Expand") {
    val df = engine.plan(
      """{"queryType":"segmentMetadata","dataSource":"events",
        |"analysisTypes":["cardinality"]}""".stripMargin)
    val plan = physicalPlan(df)
    assert(!plan.contains("Expand"),
      "exact cardinality must stack (column,value) pairs, not Expand")
    assert(!plan.contains("approx_count_distinct"),
      "default cardinality must be exact, not an HLL++ estimate")
  }

  test("segmentMetadata approxCardinality opts into HLL++ (one pass, no Expand)") {
    val df = engine.plan(
      """{"queryType":"segmentMetadata","dataSource":"events",
        |"analysisTypes":["approxCardinality"]}""".stripMargin)
    val plan = physicalPlan(df)
    assert(!plan.contains("Expand"), "approx path must not Expand")
    assert(plan.contains("approx_count_distinct"), "expected HLL++ cardinality")
  }

  test("search over 3 dimensions scans the source once") {
    val df = engine.plan(
      """{"queryType":"search","dataSource":"events",
        |"intervals":["2024-01-01T00:00:00Z/2024-01-20T00:00:00Z"],
        |"searchDimensions":["event_type","props","event_id"],
        |"query":{"type":"insensitive_contains","value":"c"},
        |"sort":"lexicographic","limit":10}""".stripMargin)
    // one "Location:" detail line per distinct scan node in formatted explain
    val scans = physicalPlan(df).linesIterator.count(_.contains("Location:"))
    assert(scans == 1, s"search should read the source once, saw $scans scans")
  }

  test("select page-2 keyset cursor: time bound pushed to scan, no global sort") {
    val us = java.time.Instant.parse("2024-01-05T00:00:00Z").getEpochSecond * 1000000L
    val df = engine.plan(
      s"""{"queryType":"select","dataSource":"events",
        |"intervals":["2024-01-01T00:00:00Z/2024-02-01T00:00:00Z"],
        |"dimensions":["event_type"],"metrics":["event_id"],
        |"pagingSpec":{"pagingIdentifiers":{"t:$us":3},"threshold":25}}""".stripMargin)
    val plan = physicalPlan(df)
    // cursor lower bound must reach the parquet scan on the raw nanos column
    // (row-group min/max pruning — pages get CHEAPER as the cursor advances)
    assert(plan.contains("GreaterThanOrEqual(ts"),
      s"cursor time bound not pushed to scan:\n${plan.take(2000)}")
    // page = per-partition top-(k+threshold) merged on the driver, not a
    // global Sort exchange + Offset over the whole filtered source
    assert(plan.contains("TakeOrderedAndProject"),
      "select page should be TakeOrderedAndProject, not global sort+offset")
    assert(!plan.contains("Exchange rangepartitioning"),
      "select paging must not range-shuffle the datasource")
  }

  test("near-dup pipelines join on (band,bucket) — never a cartesian product") {
    Seq("q22_minhash_dups", "q23_simhash_dups", "q28_cosine_neardup",
        "q78b_containment_banded").foreach { q =>
      val plan = physicalPlan(SparkEntry.queries(q)(spark, dir))
      assert(!plan.contains("CartesianProduct"),
        s"$q must pair via LSH buckets, not an all-pairs cartesian")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$q must not fall back to a nested-loop join")
    }
  }

  test("span operators key on window hashes — never a cartesian product") {
    // q79/q80/q84: the window-frequency (and benchmark-membership) joins
    // are equi-joins on the 64-bit window key; q84's benchmark key set
    // must BROADCAST (corpus side map-only). A cartesian/nested-loop here
    // would be the m² shape these operators exist to avoid.
    Seq("q79_dup_spans", "q80_strip_dup_spans", "q84_contaminated_spans")
      .foreach { q =>
        val plan = physicalPlan(SparkEntry.queries(q)(spark, dir))
        assert(!plan.contains("CartesianProduct"),
          s"$q must join on window keys, not cross")
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$q must not fall back to a nested-loop join")
      }
    val q84 = physicalPlan(
      SparkEntry.queries("q84_contaminated_spans")(spark, dir))
    assert(q84.contains("BroadcastExchange"),
      "q84 benchmark window keys must broadcast")
  }

  test("knnJoin meets on cluster keys with a partial top-k — no cartesian") {
    val plan = physicalPlan(SparkEntry.queries("q85_knn_join")(spark, dir))
    assert(!plan.contains("CartesianProduct"),
      "exhaustive knnJoin must distribute over cluster blocks, not cross")
    assert(plan.contains("WindowGroupLimit"),
      "per-query top-k must pre-truncate map-side")
  }

  test("near-dup pipelines materialize signatures: banding reads cached " +
      "blocks, shingles stay lazy") {
    // the pair operators localCheckpoint their SIGNATURE frame, so the
    // banding self-join + skew-cap window passes run over cached blocks
    // (ExistingRDD) and never re-hash the corpus. The verify SHINGLES are
    // deliberately NOT checkpointed (r17): they are ~20x the signature
    // bytes and only candidate-touched docs need them, so the attach
    // re-scans the corpus TEXT (at most one scan per attach side) and
    // shingles only the broadcast-reduced rows — the trade that removed
    // ~25 GB of checkpoint blocks at the 1000x SF.
    Seq("q22_minhash_dups", "q23_simhash_dups", "q28_cosine_neardup").foreach { q =>
      val plan = physicalPlan(SparkEntry.queries(q)(spark, dir))
      val fileScans = plan.linesIterator.count(_.contains("Location:"))
      assert(fileScans <= 2,
        s"$q final plan re-scans the corpus ($fileScans file scans) — " +
          "signatures must come from cached blocks, text at most once per " +
          "attach side")
      assert(plan.contains("ExistingRDD"),
        s"$q should read checkpointed signature frames")
      assert(!plan.contains("minhash_signature") &&
        !plan.contains("lsh_signature"),
        s"$q final plan recomputes signatures instead of reading the " +
          "checkpointed frame")
    }
  }

  test("brute-force ANN broadcasts the query side (one corpus scan, no shuffle)") {
    val plan = physicalPlan(SparkEntry.queries("q25_ann_cosine")(spark, dir))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "queries must broadcast against the corpus scan")
    assert(!plan.contains("Exchange hashpartitioning(neighbor_id"),
      "corpus must not shuffle for the scoring pass")
  }

  test("whole-stage codegen covers the filter+agg pipeline") {
    val df = engine.plan(
      """{"queryType":"timeseries","dataSource":"lineitem",
        |"intervals":["1996-01-01T00:00:00Z/1997-01-01T00:00:00Z"],
        |"granularity":"month",
        |"aggregations":[{"type":"doubleSum","name":"sq","fieldName":"l_quantity"}]}""".stripMargin)
    df.collect() // AQE assigns codegen stages only once executed
    // '*(n)' prefixes mark WholeStageCodegen stages in the compact plan
    assert(df.queryExecution.executedPlan.toString.contains("*("),
      "hot path fell out of whole-stage codegen")
  }
}
