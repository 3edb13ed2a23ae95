package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Second-wave relational operators: temporal joins (as-of, range),
  * batch sessionization, multi-dimensional aggregation (cube, pivot),
  * sketch-vs-exact property checks, semi-join EXISTS, and a custom typed
  * Aggregator — the operator families a training-data pipeline leans on
  * beyond the reference's own surface.
  *
  * Cross-engine discipline matches RelationalQueries: exact integer /
  * decimal arithmetic wherever an aggregate crosses the oracle boundary,
  * total orders (ts, event_id) under every window, timestamps emitted as
  * formatted strings.
  */
object AdvancedQueries {

  private val D = DecimalType(18, 2)
  // domain-guarded exact sum: a value outside Decimal(18,2)'s range
  // (corrupt +-1e18 / NaN metrics) contributes NULL -- excluded -- instead
  // of killing the job under ANSI cast semantics (r12 hostile-content
  // finding). The guard is RelationalQueries.dguard — ONE owner for the
  // bound (r13 review: the embedded literal here already drifted once).
  private def dsum(c: Column): Column =
    sum(RelationalQueries.dguard(c).cast(D)).cast("double")

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def events(s: SparkSession, dir: String): DataFrame = Events.load(s, dir)

  val defs: Seq[QueryDef] = Seq(

    // ── q32: as-of join — each click matched to the most recent prior (or
    //   same-instant) view by the same user. Spark lacks a native as-of
    //   join; the scalable formulation is a single fill-down window over
    //   the union (one shuffle by user, no per-row range probe): order by
    //   (ts, is_click, event_id) so a view at the identical timestamp is
    //   visible to the click, and carry the last view id forward. ──
    QueryDef("q32_asof_join",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_type") === "click", col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, dir)
          .filter(col("event_type").isin("click", "view"))
          .withColumn("view_id",
            last(when(col("event_type") === "view", col("event_id")), ignoreNulls = true).over(w))
          .filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"),
                  coalesce(col("view_id"), lit(-1L)).as("view_id"))
          .orderBy(col("user_id"), col("click_id"))
      },
      Some("""
        SELECT user_id, event_id AS click_id, coalesce(view_id, -1) AS view_id FROM (
          SELECT user_id, event_id, event_type,
                 last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
                   OVER (PARTITION BY user_id
                         ORDER BY ts, event_type = 'click', event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_id
          FROM events WHERE event_type IN ('click', 'view'))
        WHERE event_type = 'click' ORDER BY user_id, click_id""")),

    // ── q33: range join — pairs of same-user events within a 10-minute
    //   window. The naive form is an inequality join (nested-loop at any
    //   scale); the scalable form bins each left row into the two
    //   10-minute buckets its window can span and equi-joins on
    //   (user, bucket) before the exact range filter — shuffle-friendly
    //   and skew-bounded. ──
    QueryDef("q33_range_join",
      (s, dir) => {
        val winUs = 600L * 1000000L
        val e = events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"),
                  unix_micros(col("ts")).as("us"))
        val a = e.select(col("user_id"), col("event_id").as("a_id"),
            col("ts").as("a_ts"),
            explode(array((col("us") / winUs).cast("long"),
                          (col("us") / winUs).cast("long") + 1)).as("bucket"))
        val b = e.select(col("user_id"), col("event_id").as("b_id"),
            col("ts").as("b_ts"), (col("us") / winUs).cast("long").as("bucket"))
        a.join(b, Seq("user_id", "bucket"))
          .filter(col("b_ts") >= col("a_ts") &&
                  col("b_ts") <= col("a_ts") + expr("INTERVAL 10 MINUTES") &&
                  col("a_id") < col("b_id"))
          .select(col("user_id"), col("a_id"), col("b_id"))
          .orderBy(col("user_id"), col("a_id"), col("b_id"))
      },
      Some("""
        SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
         AND a.event_id < b.event_id
        ORDER BY a.user_id, a_id, b_id""")),

    // ── q34: batch sessionization (gaps-and-islands): a session breaks
    //   after a 24h silence. lag → break flag → running sum = session id;
    //   one shuffle by user, everything else inside the sorted partition.
    //   (The streaming twin is q51's stateful mapGroupsWithState.) ──
    QueryDef("q34_sessions_batch",
      (s, dir) => {
        val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val gapUs = 24L * 3600L * 1000000L
        events(s, dir)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(ord))
          .withColumn("is_new",
            (col("prev_us").isNull ||
             (unix_micros(col("ts")) - col("prev_us")) > gapUs).cast("int"))
          .withColumn("sess_id", sum(col("is_new")).over(run).cast("long"))
          .groupBy(col("user_id"), col("sess_id"))
          .agg(count(lit(1)).as("n_events"),
               date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("sess_start"),
               date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("sess_end"))
          .orderBy(col("user_id"), col("sess_id"))
      },
      Some("""
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                        OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 86400000000
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sessions AS (
          SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
          FROM flagged)
        SELECT user_id, sess_id, count(*) AS n_events,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS sess_end
        FROM sessions GROUP BY user_id, sess_id ORDER BY user_id, sess_id""")),

    // ── q35: cube — full 2-dim subtotal lattice (event_type × hour),
    //   single pass; subtotal NULLs coalesce to sentinels so both engines
    //   sort identically (same trick as q16's rollup). ──
    QueryDef("q35_cube",
      (s, dir) =>
        events(s, dir)
          .withColumn("h", hour(col("ts")))
          .cube(col("event_type"), col("h"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .select(coalesce(col("event_type"), lit("ALL")).as("et"),
                  coalesce(col("h"), lit(-1)).as("h"),
                  col("n"), col("sum_value"))
          .orderBy(col("et"), col("h")),
      Some("""
        SELECT coalesce(event_type, 'ALL') AS et, coalesce(h, -1) AS h,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM (SELECT event_type, CAST(extract(hour FROM ts) AS INT) AS h, value FROM events)
        GROUP BY CUBE (event_type, h) ORDER BY et, h""")),

    // ── q36: pivot — event_type rotated into columns (explicit value list
    //   so the plan is a single pass with no distinct-discovery job). ──
    QueryDef("q36_pivot",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val pivoted = events(s, dir)
          .groupBy(col("user_id"))
          .pivot("event_type", types)
          .agg(count(lit(1)))
        types.foldLeft(pivoted) { (df, tname) =>
          df.withColumn(s"n_$tname", coalesce(col(tname), lit(0L))).drop(tname)
        }.orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id,
               count(*) FILTER (WHERE event_type = 'click')    AS n_click,
               count(*) FILTER (WHERE event_type = 'error')    AS n_error,
               count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
               count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
               count(*) FILTER (WHERE event_type = 'view')     AS n_view
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // ── q37: sketch-vs-exact property check — HyperLogLog++ distinct
    //   estimate must land within 2% of the exact count. The boolean is
    //   what crosses the oracle boundary (DuckDB can't replay Spark's
    //   HLL bit-for-bit; it CAN verify the accuracy contract), the
    //   pattern for asserting any approximate operator cross-engine. ──
    QueryDef("q37_approx_distinct",
      (s, dir) =>
        // pre-distinct instead of countDistinct-next-to-approx: the mixed
        // aggregate plans an Expand (2x the input rows); HLL over the
        // distinct set is the same sketch (order-independent max-merge),
        // so one distinct shuffle feeds both sides
        events(s, dir)
          .select(col("event_type"), col("user_id")).distinct()
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_exact"),
               approx_count_distinct(col("user_id"), 0.01).as("n_approx"))
          .select(col("event_type"), col("n_exact"),
                  (abs(col("n_approx") - col("n_exact")) <=
                    col("n_exact") * 0.02).as("approx_within_2pct"))
          .orderBy(col("event_type")),
      Some("""
        SELECT event_type, count(DISTINCT user_id) AS n_exact,
               TRUE AS approx_within_2pct
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ── q48: approx-quantile sketch vs exact (same contract pattern as
    //   q37): Spark's Greenwald-Khanna approx_percentile must land within
    //   its accuracy bound of the exact sorted-rank percentile; the
    //   boolean contract crosses the oracle, not the sketch internals. ──
    QueryDef("q48_approx_quantile",
      (s, dir) => {
        import ExactPercentiles._
        import s.implicits._
        // the sketch rides the ranked() PROBE job (r13, AbQ48): the probe's
        // per-key GK cut list contains 0.5 at the same accuracy, so the
        // former dedicated percentile_approx branch — a full extra corpus
        // pass, ~1.0 s of sf1 wall clock — folds away; its 3 collected
        // values come back as a broadcast-joined local table instead.
        // (Earlier shape history: the branch itself was split out from the
        // window's output in r10 — 4.9 s vs 1.2 s — because it inherited
        // the 3-partition shuffle; this removes it entirely.)
        val li = Par(t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_extendedprice")))
        val (rk, approxRows) =
          rankedWithApprox(li, "l_returnflag", "l_extendedprice", 1000)
        val approx = approxRows
          .map { case (k, a) => (k.asInstanceOf[String], a) }
          .toDF("l_returnflag", "approx")
        rk
          .groupBy(col("l_returnflag"))
          .agg(max(col("n")).as("n"),
               lo(0.5).as("lo"), hi(0.5).as("hi"))
          .join(broadcast(approx), Seq("l_returnflag"))
          .select(col("l_returnflag"),
                  interp(0.5, "lo", "hi").as("p50_exact"),
                  (abs(col("approx") - col("lo")) <= (col("hi") - col("lo")) +
                    col("lo") * 0.01).as("approx_within_1pct"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.5), 6) AS p50_exact,
               TRUE AS approx_within_1pct
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ── q64: full outer join — the one join type the reference's shapes
    //   never need (q06 anti, q38 semi, q03/q10/q44 inner, q32/q57 left):
    //   per-user click and view activity merged with both-sides-null
    //   semantics. ──
    QueryDef("q64_full_outer",
      (s, dir) => {
        val e = events(s, dir)
        def per(tpe: String, out: String) =
          e.filter(col("event_type") === tpe)
            .groupBy(col("user_id")).agg(count(lit(1)).as(out))
        val c = per("click", "n_clicks")
        val v = per("view", "n_views")
        c.join(v, Seq("user_id"), "full_outer")
          .select(col("user_id"),
            coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
            coalesce(col("n_views"), lit(0L)).as("n_views"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH c AS (SELECT user_id, count(*) AS n_clicks FROM events
                   WHERE event_type = 'click' GROUP BY user_id),
             v AS (SELECT user_id, count(*) AS n_views FROM events
                   WHERE event_type = 'view' GROUP BY user_id)
        SELECT coalesce(c.user_id, v.user_id) AS user_id,
               coalesce(n_clicks, 0) AS n_clicks,
               coalesce(n_views, 0) AS n_views
        FROM c FULL OUTER JOIN v ON c.user_id = v.user_id
        ORDER BY user_id""")),

    // ── q38: EXISTS via left-semi join (q06 covers the anti side):
    //   order priorities of orders carrying any near-capacity lineitem. ──
    QueryDef("q38_exists_semi",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val li = t(s, dir, "lineitem").filter(col("l_quantity") >= 50)
        o.join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity >= 50)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ── q44: two-armed star join (TPC-H Q9 shape) — lineitem reaches
    //   part and supplier→nation through different keys; every dimension
    //   broadcasts so the fact table is never shuffled for the joins,
    //   only for the final (n_name, p_type) aggregation. Also the only
    //   consumers of the part/supplier tables, closing source coverage. ──
    QueryDef("q44_supplier_part",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val p = t(s, dir, "part").filter(col("p_size") >= 20)
        val su = t(s, dir, "supplier")
        val n = t(s, dir, "nation")
        val cents = (c: Column) => round(c * 100, 0).cast("long")
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), col("p_type"))
          .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
                 .cast("double") / 10000.0).as("revenue"),
               count(lit(1)).as("n_items"))
          .orderBy(col("n_name"), col("p_type"))
      },
      Some("""
        SELECT n_name, p_type,
               CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS DOUBLE)
                 / 10000.0 AS revenue,
               count(*) AS n_items
        FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
        WHERE p_size >= 20
        GROUP BY n_name, p_type ORDER BY n_name, p_type""")),

    // ── q65: distribution window functions (ntile / percent_rank /
    //   cume_dist) — partitioned by priority so the sort shards; the
    //   (totalprice, orderkey) order is tie-free, so the rank-derived
    //   ratios are exact small-integer quotients in both engines. ──
    QueryDef("q65_window_distribution",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        t(s, dir, "orders")
          .filter(col("o_custkey") < 50)
          .withColumn("quartile", ntile(4).over(w).cast("long"))
          .withColumn("pct_rank", round(percent_rank().over(w), 6))
          .withColumn("cume", round(cume_dist().over(w), 6))
          .select(col("o_orderpriority"), col("o_orderkey"),
                  col("quartile"), col("pct_rank"), col("cume"))
          .orderBy(col("o_orderpriority"), col("o_orderkey"))
      },
      Some("""
        SELECT o_orderpriority, o_orderkey,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume
        FROM orders WHERE o_custkey < 50
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey)
        ORDER BY o_orderpriority, o_orderkey""")),

    // ── q66: temporal scalar family — calendar extracts plus a clamped
    //   month shift (both engines clamp Jan 31 + 1 month to Feb 28/29),
    //   grouped to a fiscal-calendar rollup. ──
    QueryDef("q66_temporal",
      (s, dir) =>
        t(s, dir, "orders")
          .withColumn("yr", year(col("o_orderdate")).cast("long"))
          .withColumn("qtr", quarter(col("o_orderdate")).cast("long"))
          .withColumn("fiscal_month", month(add_months(col("o_orderdate"), 6)).cast("long"))
          .groupBy(col("yr"), col("qtr"), col("fiscal_month"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("yr"), col("qtr"), col("fiscal_month")),
      Some("""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
               CAST(month(o_orderdate + INTERVAL 6 MONTH) AS BIGINT) AS fiscal_month,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY 1, 2, 3 ORDER BY yr, qtr, fiscal_month""")),

    // ── q62: Pearson correlation / covariance per group — built from the
    //   five EXACT power sums (decimal(38,0), no overflow, no fp order
    //   dependence) instead of corr()/covar_samp(), whose single-pass
    //   Welford updates differ numerically between engines. The final
    //   formula is a handful of double ops on identical inputs → bitwise
    //   equal across engines. ──
    QueryDef("q62_correlation",
      (s, dir) => {
        val D0 = DecimalType(38, 0)
        val x = round(col("l_extendedprice") * 100, 0).cast("long") // cents
        val y = col("l_quantity").cast("long")
        val agg = t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).cast("double").as("n"),
               sum(x.cast(D0)).cast("double").as("sx"),
               sum(y.cast(D0)).cast("double").as("sy"),
               sum((x * y).cast(D0)).cast("double").as("sxy"),
               sum((x * x).cast(D0)).cast("double").as("sxx"),
               sum((y * y).cast(D0)).cast("double").as("syy"))
        agg.select(col("l_returnflag"),
            round((col("n") * col("sxy") - col("sx") * col("sy")) /
              (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
               sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6).as("corr_price_qty"),
            round((col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * (col("n") - 1) * 100.0), 6).as("covar_samp_dollars"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        WITH sums AS (
          SELECT l_returnflag,
                 CAST(count(*) AS DOUBLE) AS n,
                 CAST(sum(CAST(CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) AS sx,
                 CAST(sum(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) AS sy,
                 CAST(sum(CAST(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
                 CAST(sum(CAST(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                               * CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
                 CAST(sum(CAST(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) AS syy
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag,
               round((n * sxy - sx * sy) /
                     (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_price_qty,
               round((n * sxy - sx * sy) / (n * (n - 1) * 100.0), 6) AS covar_samp_dollars
        FROM sums ORDER BY l_returnflag""")),

    // ── q63: heavy-hitter sketch contract — freqItems (Karp-Papadimitriou
    //   -Shenker single-pass counters) must return a SUPERSET of every
    //   value with frequency above the support threshold; the oracle pins
    //   that no true heavy hitter is missed. ──
    QueryDef("q63_freq_items",
      (s, dir) => {
        val e = events(s, dir)
        val support = 0.15
        val sketch = e.stat.freqItems(Array("event_type"), support)
          .head().getSeq[String](0).toSet
        val total = e.count()
        e.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
          .filter(col("n") > total * support)
          .withColumn("found_by_sketch",
            col("event_type").isin(sketch.toSeq: _*))
          .orderBy(col("event_type"))
      },
      Some("""
        SELECT event_type, count(*) AS n, TRUE AS found_by_sketch
        FROM events GROUP BY event_type
        HAVING count(*) > 0.15 * (SELECT count(*) FROM events)
        ORDER BY event_type""")),

    // ── q61: Bloom-filter semi-join pruning — at 100 TB you don't shuffle
    //   a fact table to semi-join a key set; you broadcast a Bloom sketch
    //   and pre-filter at the scan (what Spark's runtime row-group
    //   filtering does internally). The sketch is built by the distributed
    //   `bloom_filter_agg` Catalyst aggregate (map-side partial merge, no
    //   driver loop) and probed by `BloomFilterMightContain` over a binary
    //   Literal — fully inside codegen, no closure capture — exactly the
    //   expression pair InjectRuntimeFilter plants. Sized from the ACTUAL
    //   member count, not a constant, so the FP bound holds at any SF.
    //   Contract oracle: zero false negatives (every member passes) and a
    //   bounded false-positive rate on non-members. ──
    QueryDef("q61_bloom_filter",
      (s, dir) => {
        import org.apache.spark.sql.graftbridge.ColumnBridge
        import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
        import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
        import org.apache.spark.sql.types.BinaryType
        // membership = every third user: a ~1/3 member set leaves a REAL
        // non-member population, so the false-positive clause is
        // exercised, not vacuously true (every user purchases at least
        // once in this data, so "purchasers" would leave no non-members)
        val users = events(s, dir).select(col("user_id")).distinct()
          .withColumn("is_member", (col("user_id") % 3 === 0).cast("int"))
        val members = users.filter(col("is_member") === 1)
          .select(col("user_id").cast("long").as("uid"))
        val nMembers = math.max(members.count(), 1L)
        // fpp 0.03 → m = ceil(-n·ln p / ln²2) bits (standard Bloom sizing)
        val numBits = math.max(64L,
          math.ceil(-nMembers * math.log(0.03) / (math.log(2) * math.log(2))).toLong)
        // bloom_filter_agg isn't parser-registered in this build, so the
        // aggregate is constructed directly (same expression the SQL
        // function would resolve to)
        val bfAgg = ColumnBridge.column(
          new BloomFilterAggregate(
            ColumnBridge.expression(col("uid")),
            Literal(nMembers), Literal(numBits)).toAggregateExpression())
        val sketch = members.agg(bfAgg.as("bf")).head.getAs[Array[Byte]](0)
        val might = ColumnBridge.column(BloomFilterMightContain(
          Literal(sketch, BinaryType),
          ColumnBridge.expression(col("user_id").cast("long"))))
        users.withColumn("hit", might)
          .agg(
            sum(col("is_member")).cast("long").as("n_members"),
            // no false negatives, ever — the Bloom contract
            (sum(when(col("is_member") === 1 && !col("hit"), 1).otherwise(0)) === 0)
              .as("no_false_negatives"),
            // observed FP rate on non-members well under 5x the target fpp
            (sum(when(col("is_member") === 0 && col("hit"), 1).otherwise(0)) <=
              greatest(sum(when(col("is_member") === 0, 1).otherwise(0)) * 0.15, lit(5.0)))
              .as("fp_rate_bounded"))
      },
      Some("""
        SELECT count(DISTINCT user_id) AS n_members,
               TRUE AS no_false_negatives, TRUE AS fp_rate_bounded
        FROM events WHERE user_id % 3 = 0""")),

    // ── q58: stratified sampling — training pipelines downsample per
    //   stratum (language, source, quality band). sampleBy is seeded and
    //   deterministic WITHIN Spark but not across engines, so the oracle
    //   checks the sampling CONTRACT (the q37 sketch pattern): per-stratum
    //   rates within tolerance, never exceeding the population. ──
    QueryDef("q58_stratified_sample",
      (s, dir) => {
        val fractions = Map("click" -> 0.5, "view" -> 0.2, "purchase" -> 1.0,
                            "error" -> 0.1, "signup" -> 0.1)
        val e = events(s, dir)
        val sampled = e.stat.sampleBy("event_type", fractions, seed = 42L)
          .groupBy(col("event_type")).agg(count(lit(1)).as("n_sampled"))
        val totals = e.groupBy(col("event_type")).agg(count(lit(1)).as("n_total"))
        val frac = typedLit(fractions)
        totals.join(sampled, Seq("event_type"), "left")
          .withColumn("n_sampled", coalesce(col("n_sampled"), lit(0L)))
          .withColumn("expected", element_at(frac, col("event_type")) * col("n_total"))
          .select(col("event_type"), col("n_total"),
            (col("n_sampled") <= col("n_total") &&
             abs(col("n_sampled") - col("expected")) <= col("expected") * 0.25 + 20)
              .as("rate_ok"))
          .orderBy(col("event_type"))
      },
      Some("""
        SELECT event_type, count(*) AS n_total, TRUE AS rate_ok
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ── q56: unpivot/melt — the pivot inverse (long-form measures from
    //   wide columns, one pass, no join). Values go through integer cents
    //   before the sum like every money aggregate. ──
    QueryDef("q56_unpivot",
      (s, dir) =>
        t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
          .unpivot(Array(col("l_returnflag")),
                   Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
                   "measure", "v")
          .groupBy(col("l_returnflag"), col("measure"))
          .agg(count(lit(1)).as("n"), dsum(col("v")).as("total"))
          .orderBy(col("l_returnflag"), col("measure")),
      Some("""
        SELECT l_returnflag, measure, count(*) AS n,
               CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM (
          SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS v FROM lineitem
          UNION ALL
          SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
          UNION ALL
          SELECT l_returnflag, 'l_discount', l_discount FROM lineitem)
        GROUP BY l_returnflag, measure ORDER BY l_returnflag, measure""")),

    // ── q57: time-series gap fill — the date-spine pattern: generate the
    //   full hour × event_type grid with sequence/explode, left-join the
    //   observed counts, fill 0. At scale the spine is tiny (hours ×
    //   types) and broadcasts; the fact side shuffles once for its
    //   aggregation. ──
    QueryDef("q57_gap_fill",
      (s, dir) => {
        val e = events(s, dir)
        val observed = e
          .groupBy(date_trunc("hour", col("ts")).as("hr"), col("event_type"))
          .agg(count(lit(1)).as("n_events"))
        val bounds = e.agg(
          date_trunc("hour", min(col("ts"))).as("lo"),
          date_trunc("hour", max(col("ts"))).as("hi"))
        val spine = bounds
          .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("hr"))
          .crossJoin(e.select(col("event_type")).distinct())
        spine.join(observed, Seq("hr", "event_type"), "left")
          .select(date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("hour"),
                  col("event_type"),
                  coalesce(col("n_events"), lit(0L)).as("n_events"))
          .orderBy(col("hour"), col("event_type"))
      },
      Some("""
        WITH bounds AS (
          SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
          FROM events),
        spine AS (
          SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr, et.event_type
          FROM bounds, (SELECT DISTINCT event_type FROM events) et),
        observed AS (
          SELECT date_trunc('hour', ts) AS hr, event_type, count(*) AS n_events
          FROM events GROUP BY 1, 2)
        SELECT strftime(s.hr, '%Y-%m-%d %H:%M:%S') AS hour, s.event_type,
               CAST(coalesce(o.n_events, 0) AS BIGINT) AS n_events
        FROM spine s LEFT JOIN observed o
          ON s.hr = o.hr AND s.event_type = o.event_type
        ORDER BY hour, s.event_type""")),

    // ── q55: correlated scalar subqueries through the SQL surface —
    //   parts priced above their brand's mean. Catalyst decorrelates the
    //   two per-brand scalars into aggregate-join plans (no per-row
    //   probes). The comparison is p > sum/n rewritten as p·100·n >
    //   sum(cents): pure integer math, so the boundary can't drift
    //   between engines the way a floating mean could. ──
    QueryDef("q55_correlated",
      (s, dir) => {
        t(s, dir, "part").createOrReplaceTempView("part_v")
        s.sql("""
          SELECT p_brand, count(*) AS n_above
          FROM part_v p
          WHERE CAST(round(p_retailprice * 100, 0) AS BIGINT) *
                (SELECT count(*) FROM part_v p2 WHERE p2.p_brand = p.p_brand)
                > (SELECT sum(CAST(round(p2.p_retailprice * 100, 0) AS BIGINT))
                   FROM part_v p2 WHERE p2.p_brand = p.p_brand)
          GROUP BY p_brand ORDER BY p_brand""")
      },
      Some("""
        SELECT p_brand, count(*) AS n_above
        FROM part p
        WHERE CAST(round(p_retailprice * 100, 0) AS BIGINT) *
              (SELECT count(*) FROM part p2 WHERE p2.p_brand = p.p_brand)
              > (SELECT sum(CAST(round(p2.p_retailprice * 100, 0) AS BIGINT))
                 FROM part p2 WHERE p2.p_brand = p.p_brand)
        GROUP BY p_brand ORDER BY p_brand""")),

    // ── q39: custom typed Aggregator (operators.WeightedAvg) — exact
    //   long-pair buffer, so partial aggregation is order-independent and
    //   the only fp op is the final division (both operands < 2^53 →
    //   bit-identical across engines, no rounding needed). ──
    QueryDef("q39_weighted_avg",
      (s, dir) => {
        val wavg = udaf(graft.operators.WeightedAvg.centsAggregator)
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(wavg(round(col("l_extendedprice") * 100, 0).cast("long"),
                    col("l_quantity").cast("long")).as("wavg_price"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        SELECT l_returnflag,
               CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS DOUBLE)
                 / CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / 100.0
                 AS wavg_price
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ── q68: salted skew join through the gate — the SkewJoin operator
    //   (spec-only until now) joined into an oracle-checked aggregate.
    //   The big side takes a random salt, the dim side explodes ×8, the
    //   join key becomes (user_id, __salt) so a hot user spreads over 8
    //   tasks; the merge hint pins SMJ (broadcast would hide the shape
    //   the operator exists for). Salt is aggregation-invariant, so the
    //   oracle is the PLAIN join — salting must be invisible to results. ──
    QueryDef("q68_skew_join",
      (s, dir) => {
        val e = events(s, dir)
        val dim = e.select(col("user_id")).distinct()
          .withColumn("tier", col("user_id") % 5)
        graft.operators.SkewJoin.saltedJoin(
            e.select(col("user_id"), col("value")).hint("merge"),
            dim, "user_id", saltBuckets = 8)
          .groupBy(col("tier"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .orderBy(col("tier"))
      },
      Some("""
        WITH dim AS (SELECT DISTINCT user_id, user_id % 5 AS tier FROM events)
        SELECT dim.tier AS tier, count(*) AS n,
               CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events e JOIN dim ON e.user_id = dim.user_id
        GROUP BY dim.tier ORDER BY tier""")),

    // ── q69: bucketed co-located join through the gate — both sides are
    //   written bucketed+sorted on the join key (the one-off layout cost,
    //   like q15's centroid build), then the SMJ consumes the bucketed
    //   scans with NO exchange on either side (plan-asserted in
    //   SkewJoinSpec). At 100 TB this deletes the dominant shuffle of
    //   every fact-fact join on the bucket key. ──
    QueryDef("q69_bucketed_join",
      (s, dir) => {
        // per-sf table names: concurrent gates on different dirs can't
        // collide, and overwrite-mode self-heals interrupted runs
        val sfx = math.abs(dir.hashCode).toString
        val (li, od) = (s"li_bkt_$sfx", s"o_bkt_$sfx")
        // a fresh (in-memory) catalog doesn't know tables whose warehouse
        // dirs a previous JVM left behind — CREATE would fail on the
        // orphan location, so drop both the entry AND the directory
        Seq(li, od).foreach { tbl =>
          s.sql(s"DROP TABLE IF EXISTS $tbl")
          val wh = s.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
          val root = if (wh.startsWith("file:")) new java.io.File(new java.net.URI(wh))
                     else new java.io.File(wh)
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
            f.delete(); ()
          }
          rm(new java.io.File(root, tbl))
        }
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
          .write.mode("overwrite").bucketBy(16, "l_orderkey").sortBy("l_orderkey")
          .saveAsTable(li)
        t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))
          .write.mode("overwrite").bucketBy(16, "o_orderkey").sortBy("o_orderkey")
          .saveAsTable(od)
        s.table(li).hint("merge")
          .join(s.table(od), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ── q76: per-user EWMA of purchase values — the temporal feature
    //   primitive (recency-weighted spend) feature stores compute.
    //   A recursive smoother isn't a plain window aggregate, so both
    //   engines run the IDENTICAL sequential fold over the
    //   (ts, event_id)-ordered value list: acc = acc/2 + x/2, seeded
    //   with the first value. α = 0.5 on purpose — halving doubles is
    //   EXACT, and a left fold's op order is pinned in both engines, so
    //   the result is bit-identical before the 6dp round. One
    //   aggregation shuffle; the fold is O(events-per-user) in memory —
    //   bounded state, same shape at any scale. ──
    QueryDef("q76_ewma",
      (s, dir) => {
        val v = events(s, dir).filter(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(sort_array(collect_list(
            struct(col("ts"), col("event_id"), col("value")))).as("svs"))
          .withColumn("vs", transform(col("svs"), x => x.getField("value")))
        v.select(col("user_id"),
            round(aggregate(
              slice(col("vs"), lit(2), greatest(size(col("vs")) - 1, lit(0))),
              element_at(col("vs"), 1),
              (acc, x) => acc * 0.5 + x * 0.5), 6).as("ewma"),
            size(col("vs")).cast("long").as("n"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH v AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vs
                   FROM events WHERE event_type = 'purchase' GROUP BY user_id)
        SELECT user_id,
               round(list_reduce(vs, (acc, x) -> acc * 0.5 + x * 0.5), 6) AS ewma,
               CAST(len(vs) AS BIGINT) AS n
        FROM v ORDER BY user_id""")),

    // ── q77: conversion funnel — sequential pattern matching (view →
    //   click within 48 h → purchase within 48 h of the click), the
    //   product-analytics staple. Each stage is a per-user aggregate
    //   joined to the next stage's events — keyed equi-joins against
    //   small per-user stage tables (auto-broadcast), never a per-event
    //   cross product, so the shape holds when events are 100 TB and
    //   users are millions. Timestamps compare exactly — nothing to
    //   round. ──
    QueryDef("q77_funnel",
      (s, dir) => {
        val e = events(s, dir)
        val v = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
        val c = e.filter(col("event_type") === "click").join(v, Seq("user_id"))
          .filter(col("ts") >= col("v_ts") &&
            col("ts") <= col("v_ts") + expr("INTERVAL 48 HOURS"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts"))
        val p = e.filter(col("event_type") === "purchase").join(c, Seq("user_id"))
          .filter(col("ts") >= col("c_ts") &&
            col("ts") <= col("c_ts") + expr("INTERVAL 48 HOURS"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
        v.agg(count(lit(1)).as("n_view"))
          .crossJoin(c.agg(count(lit(1)).as("n_click")))
          .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
      },
      Some("""
        WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
                   WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, min(e.ts) AS c_ts FROM events e
              JOIN v ON e.user_id = v.user_id
              WHERE e.event_type = 'click' AND e.ts >= v.v_ts
                AND e.ts <= v.v_ts + INTERVAL 48 HOUR
              GROUP BY e.user_id),
        p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e
              JOIN c ON e.user_id = c.user_id
              WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
                AND e.ts <= c.c_ts + INTERVAL 48 HOUR
              GROUP BY e.user_id)
        SELECT (SELECT count(*) FROM v) AS n_view,
               (SELECT count(*) FROM c) AS n_click,
               (SELECT count(*) FROM p) AS n_purchase""")),

    // ── q78: cohort retention — users grouped by first-activity week,
    //   counted per week-offset of later activity (the retention matrix
    //   product analytics lives on). Two aggregations + one keyed join of
    //   per-user tables; week arithmetic is exact (UTC Monday truncation
    //   in both engines, epoch deltas divide 604800 cleanly). ──
    QueryDef("q78_retention",
      (s, dir) => {
        val e = events(s, dir)
        val firstWeek = e.groupBy(col("user_id"))
          .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
        val active = e
          .select(col("user_id"), date_trunc("week", col("ts")).as("week")).distinct()
        firstWeek.join(active, Seq("user_id"))
          .withColumn("week_offset",
            ((unix_timestamp(col("week")) - unix_timestamp(col("cohort_week"))) / 604800)
              .cast("long"))
          .groupBy(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort"),
            col("week_offset"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("cohort"), col("week_offset"))
      },
      Some("""
        WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
                   FROM events GROUP BY user_id),
        a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events)
        SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort,
               CAST((epoch(a.week) - epoch(f.cohort_week)) / 604800 AS BIGINT) AS week_offset,
               count(DISTINCT a.user_id) AS n_users
        FROM f JOIN a USING (user_id)
        GROUP BY 1, 2 ORDER BY cohort, week_offset"""))
  )
}
