package graft

import graft.engine.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import SparkEntry.{engine, roundCols, Q, rollupStore, clusteredStore, registerTpch, q30ExactMaps, q28PlantedUnion}

/** SQL query surface — TPC-H-shaped statements through the temp-view /
  * engine SQL path. Split from SparkEntry (VERDICT r10 #6); zero
  * behavior change.
  */
private[graft] object EntrySql {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_sql_tpch1" -> ((s, dir) => {
      registerTpch(s, dir)
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |  round(sum(l_quantity), 1) AS sum_qty,
          |  round(sum(l_extendedprice), 1) AS sum_base_price,
          |  round(sum(l_extendedprice * (1 - l_discount)), 1) AS sum_disc_price,
          |  round(avg(l_quantity), 4) AS avg_qty,
          |  count(*) AS count_order
          |FROM lineitem
          |WHERE l_shipdate <= timestamp'1998-09-02 00:00:00'
          |GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    }),
    "q19_sql_join" -> ((s, dir) => {
      registerTpch(s, dir)
      s.sql(
        """SELECT n_name,
          |  round(sum(l_extendedprice * (1 - l_discount)), 1) AS revenue,
          |  count(*) AS n_items
          |FROM lineitem
          |JOIN orders   ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation   ON c_nationkey = n_nationkey
          |WHERE o_orderdate >= timestamp'1996-01-01 00:00:00'
          |  AND o_orderdate < timestamp'1997-01-01 00:00:00'
          |GROUP BY n_name
          |ORDER BY revenue DESC, n_name""".stripMargin)
    }),
    "q33_sql_window" -> ((s, dir) => {
      // SQL-surface bonus: analytic window functions over detail rows
      registerTpch(s, dir)
      s.sql(
        """SELECT * FROM (
          |  SELECT l_orderkey, l_linenumber,
          |    round(l_extendedprice, 2) AS price,
          |    row_number() OVER (PARTITION BY l_orderkey
          |      ORDER BY l_extendedprice DESC, l_linenumber) AS rn,
          |    round(sum(l_extendedprice) OVER (PARTITION BY l_orderkey), 2) AS order_total
          |  FROM lineitem WHERE l_orderkey < 200) t
          |WHERE rn <= 2
          |ORDER BY l_orderkey, rn""".stripMargin)
    }),
    "q46_sql_custom_fn" -> ((s, dir) => {
      // custom native expressions through the SQL surface
      registerTpch(s, dir)
      s.sql(
        """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          |  round(cosine_similarity(a.embedding, b.embedding), 3) AS cosine
          |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          |WHERE a.vec_id < 40 AND b.vec_id < 40
          |  AND cosine_similarity(a.embedding, b.embedding) > 0.15
          |ORDER BY id_a, id_b""".stripMargin)
    }),
    "q53_sql_tpch3" -> ((s, dir) => {
      // TPC-H Q3 shape: shipping priority (3-way join, top revenue)
      registerTpch(s, dir)
      s.sql(
        """SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 1) AS revenue,
          |  o_orderdate
          |FROM customer JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON l_orderkey = o_orderkey
          |WHERE c_mktsegment = 'BUILDING'
          |  AND o_orderdate < timestamp'1997-03-15 00:00:00'
          |  AND l_shipdate > timestamp'1997-03-15 00:00:00'
          |GROUP BY l_orderkey, o_orderdate
          |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)
    }),
    "q54_sql_tpch5" -> ((s, dir) => {
      // TPC-H Q5 shape: local-supplier volume (6-way join incl. region)
      registerTpch(s, dir)
      s.sql(
        """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 1) AS revenue
          |FROM customer
          |JOIN orders   ON c_custkey = o_custkey
          |JOIN lineitem ON l_orderkey = o_orderkey
          |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          |JOIN nation   ON s_nationkey = n_nationkey
          |JOIN region   ON n_regionkey = r_regionkey
          |WHERE r_name = 'ASIA'
          |  AND o_orderdate >= timestamp'1996-01-01 00:00:00'
          |  AND o_orderdate < timestamp'1998-01-01 00:00:00'
          |GROUP BY n_name
          |ORDER BY revenue DESC, n_name""".stripMargin)
    }),
    "q56_sql_time_fns" -> ((s, dir) => {
      // the reference system's SQL time functions (TIME_FLOOR/SHIFT/
      // EXTRACT/FORMAT/PARSE/CEIL, MILLIS_TO_TIMESTAMP/TIMESTAMP_TO_MILLIS)
      // registered by GraftFunctionRegistry — reference SQL runs unchanged
      registerTpch(s, dir)
      s.sql(
        """SELECT time_floor(ts, 'PT6H') AS bucket,
          |  count(*) AS cnt,
          |  min(time_extract(ts, 'HOUR')) AS min_hr,
          |  min(time_extract(ts, 'DOW')) AS min_dow,
          |  min(time_format(time_shift(ts, 'P1M', 1), 'yyyy-MM')) AS next_month,
          |  min(time_format(time_ceil(ts, 'P1D'), 'yyyy-MM-dd')) AS next_day,
          |  min(timestamp_to_millis(ts)) AS min_ms
          |FROM events
          |WHERE ts >= time_parse('2024-01-01T00:00:00')
          |  AND ts < millis_to_timestamp(1705276800000)
          |GROUP BY 1 ORDER BY 1""".stripMargin)
    }),
    "q57_sql_lookup" -> ((s, dir) =>
      // reference SQL LOOKUP(expr, 'name') over the catalog's registered
      // lookup tables (same tables the registeredLookup dim spec joins)
      engine(s, dir).executeSql(
        """SELECT lookup(CAST(c_nationkey AS STRING), 'nation_name') AS nation,
          |  count(*) AS cnt
          |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin, Seq("customer"))),
    "q60_sql_tpch5_clustered" -> ((s, dir) => {
      // q54's TPC-H Q5 join over CLUSTERED SNAPSHOTS of the two fact tables
      // (SegmentStore.writeClustered: bucketed by orderkey, 16 buckets,
      // manifest-recorded) — the lineitem⋈orders sort-merge join runs with
      // no Exchange and no Sort on either side (IngestSpec pins the plan
      // with broadcast off). Same result as q54, so the same DuckDB oracle.
      registerTpch(s, dir)
      val store = clusteredStore(s, dir)
      store.readClustered(s, "lineitem_c").createOrReplaceTempView("lineitem_cl")
      store.readClustered(s, "orders_c").createOrReplaceTempView("orders_cl")
      s.sql(
        """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 1) AS revenue
          |FROM customer
          |JOIN orders_cl ON c_custkey = o_custkey
          |JOIN lineitem_cl ON l_orderkey = o_orderkey
          |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          |JOIN nation   ON s_nationkey = n_nationkey
          |JOIN region   ON n_regionkey = r_regionkey
          |WHERE r_name = 'ASIA'
          |  AND o_orderdate >= timestamp'1996-01-01 00:00:00'
          |  AND o_orderdate < timestamp'1998-01-01 00:00:00'
          |GROUP BY n_name
          |ORDER BY revenue DESC, n_name""".stripMargin)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q18_sql_tpch1" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 1) AS sum_qty,
        |  round(sum(l_extendedprice), 1) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 1) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q19_sql_join" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 1) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q33_sql_window" ->
      """SELECT * FROM (
        |  SELECT l_orderkey, l_linenumber,
        |    round(l_extendedprice, 2) AS price,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_extendedprice DESC, l_linenumber) AS rn,
        |    round(sum(l_extendedprice) OVER (PARTITION BY l_orderkey), 2) AS order_total
        |  FROM lineitem WHERE l_orderkey < 200) t
        |WHERE rn <= 2
        |ORDER BY l_orderkey, rn""".stripMargin,
    "q53_sql_tpch3" ->
      """SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 1) AS revenue,
        |  o_orderdate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-03-15'
        |  AND l_shipdate > TIMESTAMP '1997-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q54_sql_tpch5" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 1) AS revenue
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q56_sql_time_fns" ->
      """SELECT time_bucket(INTERVAL 6 HOUR, ts) AS bucket, count(*) AS cnt,
        |  CAST(min(hour(ts)) AS BIGINT) AS min_hr,
        |  CAST(min(isodow(ts)) AS BIGINT) AS min_dow,
        |  min(strftime(ts + INTERVAL 1 MONTH, '%Y-%m')) AS next_month,
        |  min(strftime(CASE WHEN date_trunc('day', ts) = ts THEN ts
        |    ELSE date_trunc('day', ts) + INTERVAL 1 DAY END, '%Y-%m-%d')) AS next_day,
        |  CAST(min(epoch_ms(ts)) AS BIGINT) AS min_ms
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-15'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q57_sql_lookup" ->
      """SELECT n_name AS nation, count(*) AS cnt
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q46_sql_custom_fn" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 3) AS cosine
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 40 AND b.vec_id < 40
        |  AND list_cosine_similarity(a.embedding, b.embedding) > 0.15
        |ORDER BY id_a, id_b""".stripMargin,
    // q60: same data, same query as q54 — the Spark side reads clustered
    // (bucketed) snapshots, which cannot change the result, only the plan
    "q60_sql_tpch5_clustered" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 1) AS revenue
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
  )
}
