package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Relational operator surface, oracle-gated against DuckDB.
  *
  * Design rules (all enforced across every query here and its SQL twin in
  * [[graft.SparkEntry.oracleSql]]):
  *   - every derived column is aliased identically on both sides;
  *   - double aggregates are `round(...)`-ed so FP summation order
  *     (Spark partial aggs vs DuckDB) can't flip the hash;
  *   - every query ends in a deterministic total ORDER BY (unique key);
  *   - types are aligned (DuckDB `year()`/`length()`/`row_number()`
  *     return BIGINT — the SQL side casts to match Spark's INT, etc.);
  *   - timestamps leave the plan as formatted strings, never raw.
  *
  * Scale notes: all joins below either broadcast a dimension (region,
  * nation, customer, one-row aggregates) or shuffle on the natural join
  * key where both sides are large (lineitem join orders) — the layout a
  * 1000-executor cluster wants. AQE (on in [[graft.core.GraftSession]])
  * handles skew splitting and partition coalescing at runtime.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: full-scan groupBy aggregate with
    * map-side partial aggregation; no shuffle beyond the 4-group exchange. */
  def q01AggPricing(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Filter + projection; both the predicate and the 4-column ReadSchema
    * push into the parquet scan (verified via explain in the spec). */
  def q02FilterProject(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") >= 48.0 && col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Star join: orders->customer->nation->region with the two small dims
    * broadcast; only the orders-customer equi-join shuffles. */
  def q03RegionRevenue(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"))
  }

  /** Fact-fact join (lineitem x orders): shuffle hash / sort-merge on the
    * orderkey — the key both tables would be bucketed on at 100 TB. */
  def q04PriorityRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))
  }

  /** Left-semi join (EXISTS). */
  def q05SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val big = Tables.lineitem(s, dir).filter(col("l_quantity") >= 49.0)
    o.join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** Left-anti join (NOT EXISTS): customers with no large order. */
  def q06AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_totalprice") > 250000.0)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Ranking window: top-3 orders by price within each priority class. */
  def q07WindowTopN(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  /** Analytic window: running per-customer spend + lag. */
  def q08WindowRunning(s: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val frame = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .filter(col("o_custkey") <= 200)
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(frame), 2).as("running_spend"),
        lag(col("o_totalprice"), 1).over(order).as("prev_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Top-k: planned as TakeOrderedAndProject — no global sort at scale. */
  def q09TopK(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)
  }

  /** Multi-column distinct counts (expands to partial aggregates). */
  def q10DistinctCounts(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"),
      countDistinct(col("l_orderkey")).as("n_orders"))
  }

  /** ROLLUP grouping sets. */
  def q11Rollup(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** CUBE grouping sets. */
  def q12Cube(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
  }

  /** Explicit GROUPING SETS (the general form ROLLUP/CUBE specialize):
    * an arbitrary set list plus `grouping()` markers, which distinguish
    * "aggregated-away" from "genuinely NULL" — the distinction report
    * consumers actually need when group columns are nullable. */
  def q29GroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"),
        count(lit(1)).as("n"),
        round(sum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy(col("g_rf"), col("g_ls"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** Set operations: INTERSECT + EXCEPT over nation keys. */
  def q13SetOps(s: SparkSession, dir: String): DataFrame = {
    val custN = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey")).distinct()
    val suppN = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")).distinct()
    val both = custN.intersect(suppN).select(lit("both").as("tag"), col("nationkey"))
    val custOnly = custN.except(suppN).select(lit("cust_only").as("tag"), col("nationkey"))
    both.unionByName(custOnly).orderBy(col("tag"), col("nationkey"))
  }

  /** String function surface: upper/substring/length/concat_ws/regexp. */
  def q14Strings(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        substring(col("c_name"), 1, 10).as("prefix"),
        length(col("c_name")).as("name_len"),
        concat_ws("-", col("c_mktsegment"), col("c_name")).as("tagged"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked"))
      .orderBy(col("c_custkey"))
  }

  /** Date function surface: year/month buckets over order dates. */
  def q15Dates(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir)
      .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(col("yr"), col("mo"))
  }

  /** Math function surface. */
  def q16Math(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .filter(col("l_linenumber") === 1 && col("l_orderkey") <= 2000)
      .select(
        col("l_orderkey"),
        round(abs(col("l_extendedprice") - col("l_tax") * lit(1000.0)), 2).as("a"),
        ceil(col("l_quantity") / 7.0).as("c"),
        floor(col("l_quantity") / 7.0).as("f"),
        round(sqrt(col("l_extendedprice")), 4).as("sq"),
        round(log(col("l_extendedprice") + 1.0), 6).as("lg"),
        (col("l_orderkey") % 7).as("m"))
      .orderBy(col("l_orderkey"))
  }

  /** Conditional aggregation (CASE WHEN inside agg). Counts use
    * count-of-non-null so both engines return int64 (DuckDB sum(INT) is
    * HUGEINT — deliberately avoided). */
  def q17ConditionalAgg(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(when(col("o_totalprice") > 150000.0, lit(1))).as("n_big"),
        round(sum(when(col("o_orderpriority") === "1-URGENT", col("o_totalprice")).otherwise(lit(0.0))), 2).as("urgent_rev"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))
  }

  /** GROUP BY ... HAVING. */
  def q18Having(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
      .filter(col("n") >= 5)
      .orderBy(col("l_partkey"))
  }

  /** Scalar subquery: parts priced 25% above the mean. The one-row
    * aggregate is broadcast — no shuffle of the fact side. */
  def q19ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
    val avgP = p.agg(avg(col("p_retailprice")).as("ap"))
    p.crossJoin(broadcast(avgP))
      .filter(col("p_retailprice") > col("ap") * 1.04)
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
      .orderBy(col("p_partkey"))
  }

  /** TPC-H Q3-style: 3-way join + group + top-20 by revenue. */
  def q20TopRevenueOrders(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(20)
  }

  /** Grouped string aggregation: per-nation sorted name list. */
  def q21ListAgg(s: SparkSession, dir: String): DataFrame = {
    Tables.supplier(s, dir)
      .groupBy(col("s_nationkey"))
      .agg(
        count(lit(1)).as("n"),
        array_join(array_sort(collect_list(col("s_name"))), ",").as("names"))
      .orderBy(col("s_nationkey"))
  }

  /** Join + window combined: each order's price vs its customer median-ish
    * rank (percent_rank over customer's orders). */
  def q22JoinWindow(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).filter(col("o_custkey") <= 300)
    val c = Tables.customer(s, dir)
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"), col("o_orderkey"))
    o.join(c, col("o_custkey") === col("c_custkey"))
      .select(
        col("o_custkey"), col("o_orderkey"), col("c_name"),
        rank().over(w).as("price_rank"),
        round(percent_rank().over(w), 6).as("pct_rank"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Exact interpolated percentiles (Spark `percentile` == DuckDB
    * `quantile_cont`). */
  def q23Percentiles(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 4).as("q25_qty"),
        round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 4).as("p90_qty"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("median_price"))
      .orderBy(col("l_returnflag"))
  }

  /** Pivot: returnflag rows x explicit linestatus columns (values fixed
    * so the output schema is deterministic). */
  def q24Pivot(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(round(sum(col("l_quantity")), 2))
      .orderBy(col("l_returnflag"))
  }

  /** UNPIVOT (the inverse of [[q24Pivot]]): wide per-flag aggregates
    * stacked to (key, measure, value) rows via the `stack` generator —
    * the melt shape reporting layers expect. */
  def q31Unpivot(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .selectExpr("l_returnflag",
        "stack(2, 'sum_qty', sum_qty, 'sum_price', sum_price) AS (measure, value)")
      .orderBy(col("l_returnflag"), col("measure"))
  }

  /** Distribution window functions over a unique ordering: ntile
    * quartiles, percent_rank, cume_dist — the remaining SQL-window
    * surface beyond rank/row_number/frames (q07/q08/q22). */
  def q32WindowDist(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(s, dir).select(col("o_orderpriority"), col("o_orderkey"),
        col("o_totalprice"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  /** The window top-k idiom WITHOUT the rank column in the output — the
    * exact shape [[graft.plans.TopKRewrite]] rewrites to the native
    * TopKPerKey operator under GraftSession. Oracle-gated, so the
    * rewritten plan's semantics are hash-checked against SQL every
    * round (q07 keeps `rn` and stays on the window path by design). */
  def q25TopkRewrite(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .drop("rn")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc, col("o_orderkey"))
  }

  /** Decimal-revenue top-k through the same window idiom: decimal order
    * keys reach the native operator since TopKPerKeyExec compares
    * natively (the old double packing merged decimal ranks beyond 2^53
    * and TopKRewrite had to reject the type). */
  def q26TopkDecimal(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .withColumn("price_dec", col("o_totalprice").cast("decimal(12,2)"))
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("price_dec").desc, col("o_orderkey"))
    o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .drop("rn")
      .select(col("o_orderpriority"), col("o_orderkey"), col("price_dec"))
      .orderBy(col("o_orderpriority"), col("price_dec").desc, col("o_orderkey"))
  }

  /** Full-outer join with unmatched rows on BOTH sides: per-part shipped
    * quantity in 1995 vs 1996 (26 parts ship only in '96, 21 only in
    * '95 at sf0.01). Shape note: both inputs are post-aggregation
    * (one row per part), so the join is a shuffle join on the already-
    * reduced sets — aggregate-then-join, never join-then-aggregate. */
  def q28OuterJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    def yearQty(y: Int, out: String) = li
      .filter(year(col("l_shipdate")) === y)
      .groupBy(col("l_partkey"))
      .agg(round(sum(col("l_quantity")), 2).as(out))
    yearQty(1995, "qty95").join(yearQty(1996, "qty96"), Seq("l_partkey"), "full_outer")
      .select(col("l_partkey"),
        coalesce(col("qty95"), lit(0.0)).as("qty95"),
        coalesce(col("qty96"), lit(0.0)).as("qty96"))
      .orderBy(col("l_partkey"))
  }

  /** Salted skew join, oracle-proved equivalent to the plain join: the
    * salt spreads each hot orderkey over 8 reducers but must not change
    * the result SET (salt is join-key-extending, then dropped). */
  def q27SkewJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o_orderkey"), col("l_linenumber"), col("l_quantity"))
    val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority"))
    graft.operators.SkewJoin.saltedInnerJoin(li, o, Seq("o_orderkey"), saltFactor = 8)
      .orderBy(col("o_orderkey"), col("l_linenumber"))
  }

  /** Bloom runtime-filter join, oracle-proved equivalent to the plain
    * join: urgent high-value orders (selective build side) prune the
    * lineitem scan before any shuffle. At 100 TB the probe side is the
    * petabyte table and this is the difference between shuffling 600 M
    * rows and shuffling the ~1% that can match. */
  def q30RuntimeFilter(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 200000.0)
      .select(col("o_orderkey"), col("o_totalprice"))
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    graft.operators.RuntimeFilterJoin
      .bloomFilteredJoin(li, o, "l_orderkey", "o_orderkey", expectedKeys = 100000L)
      .select(col("o_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("o_totalprice"))
      .orderBy(col("o_orderkey"), col("l_linenumber"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_skew_join" -> q27SkewJoin,
    "q30_runtime_filter" -> q30RuntimeFilter,
    "q28_outer_join" -> q28OuterJoin,
    "q23_percentiles" -> q23Percentiles,
    "q24_pivot" -> q24Pivot,
    "q31_unpivot" -> q31Unpivot,
    "q32_window_dist" -> q32WindowDist,
    "q25_topk_rewrite" -> q25TopkRewrite,
    "q26_topk_decimal" -> q26TopkDecimal,
    "q01_agg_pricing" -> q01AggPricing,
    "q02_filter_project" -> q02FilterProject,
    "q03_region_revenue" -> q03RegionRevenue,
    "q04_priority_revenue" -> q04PriorityRevenue,
    "q05_semi_join" -> q05SemiJoin,
    "q06_anti_join" -> q06AntiJoin,
    "q07_window_topn" -> q07WindowTopN,
    "q08_window_running" -> q08WindowRunning,
    "q09_topk" -> q09TopK,
    "q10_distinct_counts" -> q10DistinctCounts,
    "q11_rollup" -> q11Rollup,
    "q29_grouping_sets" -> q29GroupingSets,
    "q12_cube" -> q12Cube,
    "q13_setops" -> q13SetOps,
    "q14_strings" -> q14Strings,
    "q15_dates" -> q15Dates,
    "q16_math" -> q16Math,
    "q17_conditional_agg" -> q17ConditionalAgg,
    "q18_having" -> q18Having,
    "q19_scalar_subquery" -> q19ScalarSubquery,
    "q20_top_revenue_orders" -> q20TopRevenueOrders,
    "q21_list_agg" -> q21ListAgg,
    "q22_join_window" -> q22JoinWindow)

  private val extraOracles: Map[String, String] = Map(
    "q23_percentiles" ->
      """SELECT l_returnflag,
        |round(quantile_cont(l_quantity, 0.25), 4) AS q25_qty,
        |round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
        |round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
        |round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q24_pivot" ->
      """SELECT l_returnflag,
        |round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F,
        |round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q31_unpivot" ->
      """WITH a AS (SELECT l_returnflag, round(sum(l_quantity),2) AS sum_qty,
        |  round(sum(l_extendedprice),2) AS sum_price FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM a
        |UNION ALL SELECT l_returnflag, 'sum_price' AS measure, sum_price AS value FROM a
        |ORDER BY l_returnflag, measure""".stripMargin,
    "q32_window_dist" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q25_topk_rewrite" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_orderpriority
        |                           ORDER BY o_totalprice DESC, o_orderkey) <= 5
        |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin,
    "q26_topk_decimal" ->
      """SELECT o_orderpriority, o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS price_dec
        |FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_orderpriority
        |                           ORDER BY CAST(o_totalprice AS DECIMAL(12,2)) DESC, o_orderkey) <= 5
        |ORDER BY o_orderpriority, price_dec DESC, o_orderkey""".stripMargin,
    "q30_runtime_filter" ->
      """SELECT o_orderkey, l_linenumber, l_extendedprice, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 200000.0
        |ORDER BY o_orderkey, l_linenumber""".stripMargin,
    "q27_skew_join" ->
      """SELECT l_orderkey AS o_orderkey, l_linenumber, l_quantity, o_orderpriority
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY o_orderkey, l_linenumber""".stripMargin,
    "q28_outer_join" ->
      """WITH a AS (SELECT l_partkey, round(sum(l_quantity), 2) AS qty95 FROM lineitem
        |           WHERE year(l_shipdate) = 1995 GROUP BY 1),
        |b AS (SELECT l_partkey, round(sum(l_quantity), 2) AS qty96 FROM lineitem
        |      WHERE year(l_shipdate) = 1996 GROUP BY 1)
        |SELECT coalesce(a.l_partkey, b.l_partkey) AS l_partkey,
        |  CAST(coalesce(qty95, 0.0) AS DOUBLE) AS qty95,
        |  CAST(coalesce(qty96, 0.0) AS DOUBLE) AS qty96
        |FROM a FULL OUTER JOIN b ON a.l_partkey = b.l_partkey
        |ORDER BY l_partkey""".stripMargin)

  /** DuckDB oracle twins. Casts align DuckDB's wider return types
    * (BIGINT year/length/row_number, DOUBLE ceil/floor) with Spark's. */
  val oracles: Map[String, String] = extraOracles ++ Map(
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
        |round(sum(l_extendedprice),2) AS sum_base_price,
        |round(sum(l_extendedprice*(1.0-l_discount)),2) AS sum_disc_price,
        |round(avg(l_quantity),2) AS avg_qty, round(avg(l_discount),4) AS avg_disc,
        |count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity >= 48.0 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_region_revenue" ->
      """SELECT r_name, round(sum(o_totalprice),2) AS revenue, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q04_priority_revenue" ->
      """SELECT o_orderpriority, round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue,
        |count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q05_semi_join" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 49.0)
        |ORDER BY o_orderkey""".stripMargin,
    "q06_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 250000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q07_window_topn" ->
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,
    "q08_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_spend,
        |lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
        |FROM orders WHERE o_custkey <= 200
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q09_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "q10_distinct_counts" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts, count(DISTINCT l_suppkey) AS n_supps,
        |count(DISTINCT l_orderkey) AS n_orders FROM lineitem""".stripMargin,
    "q11_rollup" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q12_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n, round(sum(o_totalprice),2) AS revenue
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q29_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
        |  CAST(grouping(l_linestatus) AS INTEGER) AS g_ls,
        |  count(*) AS n, round(sum(l_extendedprice),2) AS revenue
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q13_setops" ->
      """SELECT 'both' AS tag, nationkey FROM (
        |  SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |  INTERSECT SELECT DISTINCT s_nationkey FROM supplier) t1
        |UNION ALL
        |SELECT 'cust_only' AS tag, nationkey FROM (
        |  SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |  EXCEPT SELECT DISTINCT s_nationkey FROM supplier) t2
        |ORDER BY tag, nationkey""".stripMargin,
    "q14_strings" ->
      """SELECT c_custkey, upper(c_name) AS uname, substring(c_name, 1, 10) AS prefix,
        |CAST(length(c_name) AS INTEGER) AS name_len,
        |concat_ws('-', c_mktsegment, c_name) AS tagged,
        |regexp_replace(c_name, '[0-9]', '#', 'g') AS masked
        |FROM customer WHERE c_mktsegment IN ('BUILDING','MACHINERY')
        |ORDER BY c_custkey""".stripMargin,
    "q15_dates" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, CAST(month(o_orderdate) AS INTEGER) AS mo,
        |count(*) AS n_orders, round(sum(o_totalprice),2) AS revenue
        |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin,
    "q16_math" ->
      """SELECT l_orderkey, round(abs(l_extendedprice - l_tax * 1000.0),2) AS a,
        |CAST(ceil(l_quantity / 7.0) AS BIGINT) AS c,
        |CAST(floor(l_quantity / 7.0) AS BIGINT) AS f,
        |round(sqrt(l_extendedprice),4) AS sq,
        |round(ln(l_extendedprice + 1.0),6) AS lg,
        |l_orderkey % 7 AS m
        |FROM lineitem WHERE l_linenumber = 1 AND l_orderkey <= 2000
        |ORDER BY l_orderkey""".stripMargin,
    "q17_conditional_agg" ->
      """SELECT o_orderstatus,
        |count(CASE WHEN o_totalprice > 150000.0 THEN 1 END) AS n_big,
        |round(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0.0 END),2) AS urgent_rev,
        |count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q18_having" ->
      """SELECT l_partkey, count(*) AS n, round(sum(l_quantity),2) AS qty
        |FROM lineitem GROUP BY l_partkey HAVING count(*) >= 5
        |ORDER BY l_partkey""".stripMargin,
    "q19_scalar_subquery" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part) * 1.04
        |ORDER BY p_partkey""".stripMargin,
    "q20_top_revenue_orders" ->
      """SELECT o_orderkey, round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 20""".stripMargin,
    "q21_list_agg" ->
      """SELECT s_nationkey, count(*) AS n,
        |array_to_string(list_sort(list(s_name)), ',') AS names
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q22_join_window" ->
      """SELECT o_custkey, o_orderkey, c_name,
        |CAST(rank() OVER w AS INTEGER) AS price_rank,
        |round(percent_rank() OVER w, 6) AS pct_rank
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_custkey <= 300
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)
}
