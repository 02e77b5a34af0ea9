package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ops.{DataTests, KeyDiff, VennDiff}

/** Driver contract — the query inventory (one entry per operator from
  * SURVEY.md §2 + the LLM-pipeline extensions) with DuckDB oracle SQL.
  *
  * Conventions shared by every query/oracle pair:
  *   - deterministic total ORDER BY on both sides (driver hash-compares);
  *   - identical column aliases on both sides (driver sorts cols by name);
  *   - floating aggregates rounded after aggregation so IEEE summation
  *     order can't flip the last ulp between Spark and DuckDB;
  *   - counts cast to BIGINT on the DuckDB side (DuckDB sums to HUGEINT).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // --- derived old/new snapshots for the diff operators -------------------
  // Two overlapping subsets of `orders`, with a price perturbation on one
  // side, so keyDiff produces all four statuses and venn all three regions.

  private def ordersOld(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").filter(col("o_orderkey") % 7 =!= 0)

  private def ordersNew(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").filter(col("o_orderkey") % 5 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 3 === 0, col("o_totalprice") + 10)
          .otherwise(col("o_totalprice")))

  private val ordersNewSql =
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      |       CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 10
      |            ELSE o_totalprice END AS o_totalprice,
      |       o_orderdate, o_orderpriority
      |FROM orders WHERE o_orderkey % 5 <> 0""".stripMargin

  private def vennOld(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").filter(col("o_orderkey") % 2 === 0)
      .select("o_orderstatus", "o_orderpriority")

  private def vennNew(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").filter(col("o_orderkey") % 3 === 0)
      .select("o_orderstatus", "o_orderpriority")

  private def revenue: Column =
    col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's own flagship is `keyDiff(old, new, [id])`
    * (`/root/reference/bin/key_diff.js:7-15`).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    KeyDiff.diff(ordersOld(spark, dir), ordersNew(spark, dir), Seq("o_orderkey"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- reference parity: keyed diff (O7/O10/O11/O12) --------------------
    "keydiff_status" -> ((s, dir) => {
      val d = KeyDiff.diff(ordersOld(s, dir), ordersNew(s, dir), Seq("o_orderkey"))
      d.select(
        col("o_orderkey"),
        col(KeyDiff.StatusCol),
        coalesce(size(col(KeyDiff.ChangedFieldsCol)), lit(0)).as("n_changed"))
        .orderBy("o_orderkey")
    }),
    "keydiff_summary" -> ((s, dir) => {
      KeyDiff.summary(
        KeyDiff.diff(ordersOld(s, dir), ordersNew(s, dir), Seq("o_orderkey")))
    }),
    // --- reference parity: venn multiset ops (O13) ------------------------
    "venn_removed" -> ((s, dir) =>
      VennDiff.removed(vennOld(s, dir), vennNew(s, dir))
        .orderBy("o_orderstatus", "o_orderpriority")),
    "venn_intersect" -> ((s, dir) =>
      VennDiff.intersection(vennOld(s, dir), vennNew(s, dir))
        .orderBy("o_orderstatus", "o_orderpriority")),
    "venn_counted" -> ((s, dir) =>
      VennDiff.counted(vennOld(s, dir), vennNew(s, dir))
        .orderBy("o_orderstatus", "o_orderpriority")),
    // --- reference parity: key-uniqueness data test (O14) -----------------
    "key_dups" -> ((s, dir) =>
      DataTests.keyDuplicates(t(s, dir, "lineitem"), Seq("l_orderkey"))
        .orderBy("l_orderkey")),
    // --- analytics: aggregation / join / window / top-k -------------------
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(revenue), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    "q3_topk" -> ((s, dir) => {
      broadcast(t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING"))
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(round(sum(revenue), 2).as("rev"))
        .select("l_orderkey", "rev", "o_orderdate")
        .orderBy(col("rev").desc, col("l_orderkey"))
        .limit(10)
    }),
    "q5_region" -> ((s, dir) => {
      broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA"))
        .join(broadcast(t(s, dir, "nation")), col("r_regionkey") === col("n_regionkey"))
        .join(t(s, dir, "customer"), col("n_nationkey") === col("c_nationkey"))
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("n_name")
        .agg(round(sum(revenue), 2).as("rev"))
        .orderBy(col("rev").desc, col("n_name"))
    }),
    "window_rank" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    }),
    "events_hourly" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
        .orderBy("hour", "event_type")
    }),
    "distinct_users" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")
    }),
    // --- LLM-pipeline: dedup / text / embeddings (first slice) ------------
    "dedup_group" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy("lang", "source")
        .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("group_size"))
        .orderBy("lang", "source")
    }),
    "text_tokens" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_calc"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .orderBy("doc_id")
    }),
    "embed_norm" -> ((s, dir) => {
      t(s, dir, "embeddings").select(
        col("vec_id"),
        round(sqrt(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double"))), 4).as("l2_norm"))
        .orderBy("vec_id")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "keydiff_status" ->
      s"""WITH o AS (SELECT * FROM orders WHERE o_orderkey % 7 <> 0),
         |n AS ($ordersNewSql)
         |SELECT coalesce(CAST(o.o_orderkey AS VARCHAR), CAST(n.o_orderkey AS VARCHAR)) AS o_orderkey,
         |  CASE WHEN o.o_orderkey IS NULL THEN 'added'
         |       WHEN n.o_orderkey IS NULL THEN 'removed'
         |       WHEN o.o_custkey IS NOT DISTINCT FROM n.o_custkey
         |        AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
         |        AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
         |        AND o.o_orderdate IS NOT DISTINCT FROM n.o_orderdate
         |        AND o.o_orderpriority IS NOT DISTINCT FROM n.o_orderpriority
         |       THEN 'unchanged' ELSE 'changed' END AS status,
         |  CASE WHEN o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL THEN
         |    (CASE WHEN o.o_custkey IS DISTINCT FROM n.o_custkey THEN 1 ELSE 0 END
         |   + CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus THEN 1 ELSE 0 END
         |   + CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 1 ELSE 0 END
         |   + CASE WHEN o.o_orderdate IS DISTINCT FROM n.o_orderdate THEN 1 ELSE 0 END
         |   + CASE WHEN o.o_orderpriority IS DISTINCT FROM n.o_orderpriority THEN 1 ELSE 0 END)
         |  ELSE 0 END AS n_changed
         |FROM o FULL OUTER JOIN n ON CAST(o.o_orderkey AS VARCHAR) = CAST(n.o_orderkey AS VARCHAR)
         |ORDER BY o_orderkey""".stripMargin,
    "keydiff_summary" ->
      s"""WITH o AS (SELECT * FROM orders WHERE o_orderkey % 7 <> 0),
         |n AS ($ordersNewSql),
         |d AS (SELECT CASE WHEN o.o_orderkey IS NULL THEN 'added'
         |       WHEN n.o_orderkey IS NULL THEN 'removed'
         |       WHEN o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice THEN 'unchanged'
         |       ELSE 'changed' END AS status
         |      FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
         |SELECT status, CAST(count(*) AS BIGINT) AS "count" FROM d
         |GROUP BY status ORDER BY status""".stripMargin,
    "venn_removed" ->
      """WITH o AS (SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey % 2 = 0),
        |n AS (SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT * FROM (SELECT * FROM o EXCEPT ALL SELECT * FROM n)
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "venn_intersect" ->
      """WITH o AS (SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey % 2 = 0),
        |n AS (SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT * FROM (SELECT * FROM o INTERSECT ALL SELECT * FROM n)
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "venn_counted" ->
      """WITH o AS (SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey % 2 = 0),
        |n AS (SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey % 3 = 0),
        |tagged AS (SELECT o_orderstatus, o_orderpriority, 1 AS t_o, 0 AS t_n FROM o
        |           UNION ALL
        |           SELECT o_orderstatus, o_orderpriority, 0 AS t_o, 1 AS t_n FROM n)
        |SELECT o_orderstatus, o_orderpriority,
        |  CAST(sum(t_o) AS BIGINT) AS old_count, CAST(sum(t_n) AS BIGINT) AS new_count,
        |  greatest(CAST(sum(t_o) AS BIGINT) - CAST(sum(t_n) AS BIGINT), 0) AS removed,
        |  greatest(CAST(sum(t_n) AS BIGINT) - CAST(sum(t_o) AS BIGINT), 0) AS added,
        |  least(CAST(sum(t_o) AS BIGINT), CAST(sum(t_n) AS BIGINT)) AS common
        |FROM tagged GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "key_dups" ->
      """SELECT CAST(l_orderkey AS VARCHAR) AS l_orderkey,
        |       CAST(count(*) AS BIGINT) AS dup_count
        |FROM lineitem GROUP BY 1 HAVING count(*) > 1
        |ORDER BY l_orderkey""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk" ->
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev,
        |  o_orderdate
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY rev DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_region" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
        |FROM region
        |JOIN nation ON r_regionkey = n_regionkey
        |JOIN customer ON n_nationkey = c_nationkey
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY rev DESC, n_name""".stripMargin,
    "window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "distinct_users" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "dedup_group" ->
      """SELECT lang, source, min(doc_id) AS keep_doc_id,
        |  CAST(count(*) AS BIGINT) AS group_size
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_calc,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "embed_norm" ->
      """SELECT vec_id,
        |  round(sqrt(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm
        |FROM embeddings ORDER BY vec_id""".stripMargin
  )
}
