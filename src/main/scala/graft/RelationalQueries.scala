package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operator coverage (SURVEY.md §2.2-§2.5: projections, filters,
  * joins J1-J4, aggregations A1-A10, sorts/top-k T1-T4) exercised over the
  * driver's TPC-H-ish testdata.
  *
  * Cross-engine double discipline: every SUM/MEAN over a money/quantity
  * column goes through DECIMAL(18,2) (or integer cents) BEFORE aggregation —
  * decimal addition is exact and commutative, so Spark's partial/final
  * aggregation order can't change the result — then back to DOUBLE at the
  * end (correctly-rounded in both engines → bit-identical). Order-based
  * aggregates (percentiles, q19) operate on the raw doubles: both engines
  * interpolate the same sorted sequence, and 6dp rounding absorbs ulp drift.
  */
object RelationalQueries {

  private val D = DecimalType(18, 2)
  // Largest double BELOW Decimal(18,2)'s 1e16 integer-part bound (ulp at
  // this magnitude is 2, so the next representable double is exactly 1e16,
  // which overflows the cast). Values beyond contribute NULL -- excluded --
  // instead of killing the job under ANSI cast semantics (r12
  // hostile-content finding). No clean-data oracle divergence remains: any
  // double the guard drops would overflow DuckDB's DECIMAL(18,2) cast too
  // (r12-advice: the previous 9.9e15 bound silently dropped legitimate
  // values in [9.9e15, 1e16) that the type can hold).
  private[graft] val DMax = 9.999999999999998e15
  /** ONE owner for the domain guard (r13 review: the bound was embedded
    * as a second literal in AdvancedQueries, and this exact value was
    * already wrong once across both copies). */
  private[graft] def dguard(c: Column): Column = when(c.between(-DMax, DMax), c)
  /** sum through exact decimal, emit double */
  private def dsum(c: Column): Column = sum(dguard(c).cast(D)).cast("double")
  /** mean through exact decimal sum / count, emit double. BOTH legs read
    * the guarded value (r13 review): numerator-only guarding produced a
    * silently diluted mean on hostile data — sum(valid)/count(all) is
    * neither include nor exclude semantics. Now avg = mean over VALID
    * values (the dsum 'excluded' contract); on clean data the guarded
    * count equals the row count (the money/quantity columns are
    * non-null in-domain) and the oracle pairs it with count(col). */
  private def davg(c: Column): Column =
    sum(dguard(c).cast(D)).cast("double") / count(dguard(c))

  /** Exact integer cents of a 2-dp double column. Products of money
    * columns CANNOT go through a double→DECIMAL cast (Spark and DuckDB
    * round the product's last ulp differently); integer-cents arithmetic
    * is exact and engine-independent. round() yields an exactly-integral
    * double, so the long cast is lossless in both engines.
    */
  private def cents(c: Column): Column = round(c * 100, 0).cast("long")
  private def centsSql(e: String): String = s"CAST(round($e * 100, 0) AS BIGINT)"

  /** Revenue: sum of price_cents * (100 - disc_cents), rescaled. */
  private def revenueCol: Column =
    (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
      .cast("double") / 10000.0)
  private val revenueSql: String =
    s"CAST(sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) AS DOUBLE) / 10000.0"

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def events(s: SparkSession, dir: String): DataFrame = Events.load(s, dir)

  val defs: Seq[QueryDef] = Seq(

    // ── q01: TPC-H Q1-style pricing summary (A1-A5: hash agg, partial+final) ──
    QueryDef("q01_pricing_summary",
      (s, dir) => {
        // Par: a single-file scan otherwise runs the 8-aggregate decimal
        // partial aggregation in ONE task; the repartition ships raw rows
        // (cheap) and buys full parallelism for the heavy map-side combine
        val li = Par(t(s, dir, "lineitem"))
        li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            revenueCol.as("sum_disc_price"),
            (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
              * (lit(100L) + cents(col("l_tax")))).cast("double") / 1000000.0).as("sum_charge"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_extendedprice")).as("avg_price"),
            davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some(s"""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               $revenueSql AS sum_disc_price,
               CAST(sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})
                        * (100 + ${centsSql("l_tax")})) AS DOUBLE) / 1000000.0 AS sum_charge,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
               CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(l_discount) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ── q16: rollup (multi-level aggregate in one pass — subtotal rows
    //   coalesce to 'ALL' so both engines sort identically) ──
    QueryDef("q16_rollup",
      (s, dir) =>
        // Par AFTER the 3-column projection: the repartition then ships only
        // the grouping keys + measure (not all 16 lineitem columns), and the
        // Expand(×3) + decimal partial agg runs on all cores instead of the
        // single task a one-file scan yields (same rationale as q01).
        Par(t(s, dir, "lineitem")
            .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity")))
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
                  coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
                  col("n"), col("sum_qty"))
          .orderBy(col("rf"), col("ls")),
      Some("""
        SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
               count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY rf, ls""")),

    // ── q17: set operations (EXCEPT / INTERSECT distinct semantics —
    //   §2.9 only requires union, these complete the family) ──
    QueryDef("q17_set_ops",
      (s, dir) => {
        val e = events(s, dir)
        def users(t: String) = e.filter(col("event_type") === t)
          .select(col("user_id")).distinct()
        val clickOnly = users("click").except(users("view"))
          .withColumn("op", lit("click_only"))
        val both = users("click").intersect(users("view"))
          .withColumn("op", lit("both"))
        clickOnly.unionByName(both)
          .select(col("op"), col("user_id"))
          .orderBy(col("op"), col("user_id"))
      },
      Some("""
        WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
             v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view')
        SELECT 'click_only' AS op, user_id FROM (SELECT user_id FROM c EXCEPT SELECT user_id FROM v)
        UNION ALL
        SELECT 'both' AS op, user_id FROM (SELECT user_id FROM c INTERSECT SELECT user_id FROM v)
        ORDER BY op, user_id""")),

    // ── q18: frame-based window aggregation (moving stats per user over
    //   event time; ORDER BY (ts, event_id) makes the frame a total order
    //   so both engines sum identical row sequences) ──
    QueryDef("q18_moving_avg",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(-3, Window.currentRow)
        events(s, dir)
          .filter(col("user_id") < 20)
          .withColumn("moving_avg", round(avg(col("value")).over(w), 6))
          .withColumn("moving_n", count(lit(1)).over(w))
          .select(col("user_id"), col("event_id"), col("moving_n"), col("moving_avg"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""
        SELECT user_id, event_id,
               count(*) OVER w AS moving_n,
               round(avg(value) OVER w, 6) AS moving_avg
        FROM events WHERE user_id < 20
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, event_id""")),

    // ── q19: exact percentiles, sort-based. Spark's `percentile` aggregate
    //   materializes a boxed value→count OpenHashMap per group (3.6s steady
    //   state at sf0.1); a window rank over the group-partitioned sort plus
    //   linear interpolation (lower + (upper-lower)*frac, the same formula
    //   both engines use) gets the identical result from one distributed
    //   sort. 6dp rounding absorbs last-ulp drift. ──
    QueryDef("q19_percentiles",
      (s, dir) => {
        import ExactPercentiles._
        ranked(t(s, dir, "lineitem"), "l_returnflag", "l_extendedprice")
          .groupBy(col("l_returnflag"))
          .agg(max(col("n")).as("n"),
               lo(0.5).as("lo_50"), hi(0.5).as("hi_50"),
               lo(0.9).as("lo_90"), hi(0.9).as("hi_90"),
               lo(0.99).as("lo_99"), hi(0.99).as("hi_99"))
          .select(col("l_returnflag"),
                  interp(0.5, "lo_50", "hi_50").as("p50"),
                  interp(0.9, "lo_90", "hi_90").as("p90"),
                  interp(0.99, "lo_99", "hi_99").as("p99"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
               round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
               round(quantile_cont(l_extendedprice, 0.99), 6) AS p99
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ── q02: filter + projection pushdown (P1-P3; scan should show PushedFilters) ──
    QueryDef("q02_filter_project",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_quantity") > 45 && col("l_discount") >= 0.09)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        FROM lineitem WHERE l_quantity > 45 AND l_discount >= 0.09
        ORDER BY l_orderkey, l_linenumber""")),

    // ── q03: join + group agg (J1 shape: fact ⋈ dims; broadcast-able dims) ──
    QueryDef("q03_segment_revenue",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(revenueCol.as("revenue"),
               count(lit(1)).as("n_items"))
          .orderBy(col("c_mktsegment"))
      },
      Some(s"""
        SELECT c_mktsegment,
               $revenueSql AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                      JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ── q04: top-k (T1 shape: ORDER BY ... LIMIT k → TakeOrderedAndProject) ──
    QueryDef("q04_topk_orders",
      (s, dir) =>
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10),
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""")),

    // ── q05: ranking window (W8 shape: row_number per partition) ──
    QueryDef("q05_window_rank",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        t(s, dir, "lineitem")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("l_suppkey"), col("rk").cast("long").as("rk"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
          .orderBy(col("l_suppkey"), col("rk"))
      },
      Some("""
        SELECT l_suppkey, rk, l_orderkey, l_linenumber, l_extendedprice FROM (
          SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
                 row_number() OVER (PARTITION BY l_suppkey
                   ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS rk
          FROM lineitem) WHERE rk <= 3
        ORDER BY l_suppkey, rk""")),

    // ── q06: anti join — orders with no lineitems, per order priority ──
    QueryDef("q06_anti_join",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val li = t(s, dir, "lineitem")
        o.join(li, col("o_orderkey") === col("l_orderkey"), "left_anti")
          .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n_empty_orders"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n_empty_orders
        FROM orders WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ── q07: distinct aggregation (A9 + countDistinct) ──
    QueryDef("q07_distinct_agg",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("n_parts"),
               countDistinct(col("l_suppkey")).as("n_supps"),
               count(lit(1)).as("n_rows"))
          .orderBy(col("l_returnflag")),
      Some("""
        SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ── q08: time-bucketed event aggregation (events table; date_trunc) ──
    QueryDef("q08_events_hourly",
      (s, dir) =>
        events(s, dir)
          .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
                   col("event_type"))
          .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
          .orderBy(col("hour"), col("event_type")),
      Some("""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY hour, event_type""")),

    // ── q09: semi-structured extraction (F11: JSON path into typed column) ──
    QueryDef("q09_json_extract",
      (s, dir) =>
        events(s, dir)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
          .groupBy(col("event_type"))
          .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"))
          .orderBy(col("event_type")),
      Some("""
        SELECT event_type, CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ── q10: star-schema multi-join rollup (region → nation → customer → orders → lineitem) ──
    QueryDef("q10_region_rollup",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        // two-level aggregate instead of countDistinct-beside-sum: the
        // mixed form plans an Expand that doubles every joined row; the
        // per-order partial keeps one pass and the distinct for free
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("o_orderkey"))
          .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
            .as("rev_cents"))
          .groupBy(col("r_name"))
          .agg((sum(col("rev_cents")).cast("double") / 10000.0).as("revenue"),
               count(lit(1)).as("n_orders"))
          .orderBy(col("r_name"))
      },
      Some(s"""
        SELECT r_name,
               $revenueSql AS revenue,
               count(DISTINCT o_orderkey) AS n_orders
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                      JOIN customer ON o_custkey = c_custkey
                      JOIN nation ON c_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name"""))
  )
}
