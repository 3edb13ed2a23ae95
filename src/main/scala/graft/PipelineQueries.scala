package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextOps, XHash}

/** Round-6 training-data-pipeline operators: model-based quality scoring
  * (n-gram LM perplexity), rule-based quality filtering (Gopher rules),
  * frequency sketching (count-min), and importance resampling (DSIR).
  * These are the corpus-curation stages a 100 TB pretraining pipeline
  * runs AFTER dedup (q20/q24-q27/q82/q85) and BEFORE tokenization (q74):
  * drop junk, rebalance, and weight toward a target domain.
  *
  * Cross-engine determinism follows the house rules: token streams from
  * the shared TextOps.tokens/tokensSql pair, hashes from XHash (md5
  * prefix, identical in both engines), every per-item log-score rounded
  * to 6dp and lifted to an exact integer before any order-dependent SUM.
  */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Par(s.read.parquet(s"$dir/documents.parquet"))

  private def orders(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/orders.parquet")

  private def events(s: SparkSession, dir: String): DataFrame = Events.load(s, dir)

  /** q97 PageRank iterations — declared before `defs` (eager Seq). */
  private val PrIters = 3

  /** q98: max node degree admitted to triangle enumeration. Hubs above
    * this are template/boilerplate families whose "triangles" are noise
    * and whose Σdeg² join volume is what melted the uncapped sf1 run
    * (see the q98 QueryDef comment for the measured growth). */
  private val TriDegCap = 64L

  /** q97 oracle: q31's shared pair CTEs + nodes/edges/degrees + PrIters
    * unrolled PageRank rounds in exact ×1e6 integer space. Every
    * order-dependent reduction sums exact integers; scalar arithmetic
    * (0.85 damping, dangling share) is the identical IEEE op sequence in
    * both engines. */
  private def pagerankSql: String = {
    val iters = (1 to PrIters).map { t =>
      val p = s"p${t - 1}"
      s"""
      dang$t AS (SELECT coalesce(sum(pr), 0) AS dang
                 FROM $p LEFT JOIN deg ON $p.doc_id = deg.src
                 WHERE deg.src IS NULL),
      agg$t AS (SELECT e.dst AS dst,
                       CAST(sum(CAST(floor(p.pr * 1.0 / g.deg) AS BIGINT)) AS BIGINT) AS agg_in
                FROM edges e JOIN $p p ON e.src = p.doc_id
                             JOIN deg g ON g.src = e.src
                GROUP BY e.dst),
      p$t AS (SELECT nodes.doc_id AS doc_id,
                     CAST(floor(150000.0 / nn.nd + 0.85 *
                       (coalesce(agg_in, 0) +
                        CAST(floor(CAST(dang AS DOUBLE) / nn.nd) AS BIGINT)) + 0.5)
                       AS BIGINT) AS pr
              FROM nodes LEFT JOIN agg$t ON nodes.doc_id = agg$t.dst
              CROSS JOIN nn CROSS JOIN dang$t)"""
    }.mkString(",")
    s"""
      WITH ${TextQueries.simhashPairCtes},
      pairs AS (SELECT id_a, id_b FROM npairs),
      nodes AS (SELECT doc_id FROM documents),
      nn AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM nodes),
      edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
      deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
      p0 AS (SELECT doc_id, CAST(floor(1000000.0 / nd) AS BIGINT) AS pr
             FROM nodes CROSS JOIN nn),
      $iters
      SELECT doc_id, round(pr / 1000000.0, 6) AS pagerank
      FROM p$PrIters ORDER BY doc_id"""
  }

  /** The Gopher stopword list (Rae et al. 2021, appendix A1.1). */
  private val Stops = Seq("the", "be", "to", "of", "and", "that", "have", "with", "a")
  private def stopsSqlList: String = Stops.map(s => s"'$s'").mkString("[", ", ", "]")

  /** q95's Gopher rule metrics over a frame carrying a `toks` column —
    * appends n_words/mean_wlen/alpha_frac/stop_hits/keep. ONE owner,
    * shared with the q157 funnel's quality stage so the composed DAG can
    * never drift from the standalone filter (the same discipline as the
    * shared BM25 kernel, r14 verdict #1). Semantics unchanged from the
    * original q95 body: zero-token docs carry NULL ratios and keep=0. */
  private[graft] def gopherMetrics(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val stopsArr = array(Stops.map(lit): _*)
    df
      .withColumn("n_words", size(col("toks")).cast("long"))
      // zero-token docs: NULL ratios on both engines (ANSI Spark
      // throws on /0 where DuckDB's NULL-on-zero-divide propagates a
      // NULL list_sum — the guard is the shared semantics; r12)
      .withColumn("mean_wlen", when(col("n_words") > 0, round(
        expr("aggregate(toks, 0L, (acc, t) -> acc + length(t))").cast("double") /
          col("n_words"), 6)))
      .withColumn("alpha_frac", when(col("n_words") > 0, round(
        size(filter(col("toks"), t => t.rlike("[a-z]"))).cast("double") /
          col("n_words"), 6)))
      .withColumn("stop_hits",
        size(filter(col("toks"), t => array_contains(stopsArr, t))).cast("long"))
      .withColumn("keep", coalesce( // NULL rule inputs never keep (= the oracle's CASE ELSE 0)
        (col("n_words").between(30, 100000) &&
          col("mean_wlen").between(3.8, 10.0) &&
          col("alpha_frac") >= 0.8 && col("stop_hits") >= 2).cast("long"), lit(0L)))
  }

  /** DuckDB twin of [[gopherMetrics]]'s metric columns (composes in a
    * SELECT over a rel with `toks`). */
  private[graft] def gopherMetricsSqlSelect: String = s"""
                     CAST(len(toks) AS BIGINT) AS n_words,
                     round(CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
                       / len(toks), 6) AS mean_wlen,
                     round(CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
                       AS DOUBLE) / len(toks), 6) AS alpha_frac,
                     CAST(len(list_filter(toks, x -> list_contains($stopsSqlList, x)))
                       AS BIGINT) AS stop_hits"""

  /** DuckDB twin of the keep rule (over the metric columns above). */
  private[graft] val gopherKeepCaseSql: String =
    """CAST(CASE WHEN n_words BETWEEN 30 AND 100000
                          AND mean_wlen BETWEEN 3.8 AND 10.0
                          AND alpha_frac >= 0.8 AND stop_hits >= 2
                    THEN 1 ELSE 0 END AS BIGINT)"""

  val defs: Seq[QueryDef] = Seq(

    // ── q90: n-gram LM perplexity scoring — the CCNet/KenLM quality
    //   signal (Wenzek et al., LREC 2020): train an add-one-smoothed
    //   bigram LM on the corpus itself, score every document by
    //   cross-entropy under that model; outlier-high documents are the
    //   gibberish tail a pretraining pipeline drops. p(w2|w1) =
    //   (C(w1,w2)+1) / (Cctx(w1)+V), V = |vocab|, Cctx = bigram-context
    //   occurrences. Each bigram's ln p is rounded to 6dp and lifted to
    //   an exact integer so the per-document mean is order-independent.
    //   100 TB shape: the model is two hash-aggregated count tables keyed
    //   by term — map-side combinable, vocabulary-sized (≪ corpus) — and
    //   scoring is an equi-join of the exploded corpus against the
    //   broadcast-able model; nothing ever shuffles full documents. ──
    QueryDef("q90_lm_perplexity",
      (s, dir) => {
        val toks = docs(s, dir)
          .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
          .persist() // vocab action + bigram derivation share one pass
        val big = toks.filter(size(col("toks")) >= 2)
          .withColumn("i", explode(expr("sequence(1, size(toks) - 1)")))
          .select(col("doc_id"),
            expr("element_at(toks, i)").as("w1"),
            expr("element_at(toks, i + 1)").as("w2"))
          .persist() // feeds ctx counts, bigram counts, and scoring
        val vocab = toks.select(explode(col("toks")).as("t"))
          .agg(countDistinct(col("t"))).head().getLong(0)
        val ctx = big.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
        val bigm = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
        val model = bigm.join(ctx, Seq("w1"))
          .withColumn("lnp", floor(round(
            log((col("c12") + lit(1)).cast("double") /
              (col("c1") + lit(vocab)).cast("double")), 6) * lit(1e6) + lit(0.5))
            .cast("long"))
        big.join(model.select("w1", "w2", "lnp"), Seq("w1", "w2"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"), sum(col("lnp")).as("s"))
          // the mean divides the LIFTED sum by n, so it can land exactly
          // on a 6dp half-boundary (e.g. -s/n = 3388329.5): round() there
          // is engine-dependent — keep the arithmetic in integer-lifted
          // space and half-up explicitly (floor(x + 0.5)), then the /1e6
          // is exact
          .withColumn("xent",
            floor(-col("s").cast("double") / col("n_bigrams") + lit(0.5)) / lit(1e6))
          .select(col("doc_id"), col("n_bigrams"), col("xent"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH tk AS (SELECT doc_id, ${TextOps.tokensSql("text")} AS toks FROM documents),
        big AS (SELECT doc_id, toks[t.i] AS w1, toks[t.i + 1] AS w2
                FROM tk, unnest(range(1, len(toks))) AS t(i)
                WHERE len(toks) >= 2),
        vocab AS (SELECT count(DISTINCT t) AS v
                  FROM (SELECT unnest(toks) AS t FROM tk)),
        ctx AS (SELECT w1, count(*) AS c1 FROM big GROUP BY w1),
        model AS (
          SELECT b.w1, b.w2,
                 CAST(floor(round(ln(CAST(c12 + 1 AS DOUBLE) /
                   CAST(c1 + v AS DOUBLE)), 6) * 1000000.0 + 0.5) AS BIGINT) AS lnp
          FROM (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2) b
          JOIN ctx USING (w1) CROSS JOIN vocab)
        SELECT doc_id, count(*) AS n_bigrams,
               floor(-CAST(sum(lnp) AS DOUBLE) / count(*) + 0.5) / 1000000.0 AS xent
        FROM big JOIN model USING (w1, w2)
        GROUP BY doc_id ORDER BY doc_id""")),

    // ── q95: Gopher quality rules (Rae et al. 2021 §A1.1) — the
    //   rule-based document filter every open pretraining corpus applies
    //   (Gopher, RefinedWeb, Dolma): word-count bounds, mean-word-length
    //   band, alphabetic-word fraction, and a stopword floor. Pure
    //   per-row arithmetic over one tokens pass — zero shuffle at any
    //   scale; the thresholds are the paper's except the word-count
    //   floor, scaled to this corpus's 10-99-word documents so the
    //   filter is non-vacuous (the paper's 50 applies to web pages). ──
    QueryDef("q95_gopher_rules",
      (s, dir) =>
        // rule arithmetic lives in the ONE shared gopherMetrics helper
        // (q157's quality stage composes the same columns — r20)
        docs(s, dir)
          .withColumn("toks", TextOps.tokens(col("text")))
          .transform(gopherMetrics)
          .select(col("doc_id"), col("n_words"), col("mean_wlen"),
            col("alpha_frac"), col("stop_hits"), col("keep"))
          .orderBy(col("doc_id")),
      Some(s"""
        WITH t AS (SELECT doc_id, ${TextOps.tokensSql("text")} AS toks FROM documents),
        m AS (SELECT doc_id,$gopherMetricsSqlSelect
              FROM t)
        SELECT doc_id, n_words, mean_wlen, alpha_frac, stop_hits,
               $gopherKeepCaseSql AS keep
        FROM m ORDER BY doc_id""")),

    // ── q92: count-min sketch heavy hitters (Cormode & Muthukrishnan,
    //   J. Algorithms 2005) — the streaming-frequency sketch behind
    //   heavy-hitter token stats when an exact groupBy is too wide.
    //   Depth 4 × width 256; row hashes are the shared md5 primitive
    //   salted by the row index. The sketch aggregation is keyed on
    //   (row, bucket) — 1024 cells regardless of corpus size, map-side
    //   combinable, then broadcast to score candidates; est ≥ true is
    //   the CMS one-sided guarantee and the spec's invariant. ──
    QueryDef("q92_cms_topk",
      (s, dir) => {
        val terms = docs(s, dir)
          .select(explode(TextOps.tokens(col("text"))).as("term"))
        val rows4 = Seq(0, 1, 2, 3)
        val salted = terms
          .withColumn("j", explode(array(rows4.map(lit): _*)))
          .withColumn("bucket",
            pmod(XHash.hash60(concat_ws(":", col("j"), col("term"))), lit(256L)))
        val sketch = salted.groupBy(col("j"), col("bucket"))
          .agg(count(lit(1)).as("cell"))
        val top = terms.groupBy(col("term")).agg(count(lit(1)).as("true_cnt"))
          .orderBy(col("true_cnt").desc, col("term").asc).limit(20)
        top.withColumn("j", explode(array(rows4.map(lit): _*)))
          .withColumn("bucket",
            pmod(XHash.hash60(concat_ws(":", col("j"), col("term"))), lit(256L)))
          .join(sketch, Seq("j", "bucket"))
          .groupBy(col("term"), col("true_cnt"))
          .agg(min(col("cell")).as("cms_est"))
          .withColumn("overcount", (col("cms_est") - col("true_cnt")).cast("long"))
          .select(col("term"), col("true_cnt"), col("cms_est"), col("overcount"))
          .orderBy(col("true_cnt").desc, col("term").asc)
      },
      Some(s"""
        WITH terms AS (
          SELECT unnest(${TextOps.tokensSql("text")}) AS term FROM documents),
        salted AS (
          SELECT term, t.j,
                 ${XHash.hash60Sql("(t.j || ':' || term)")} % 256 AS bucket
          FROM terms, unnest([0, 1, 2, 3]) AS t(j)),
        sketch AS (SELECT j, bucket, count(*) AS cell
                   FROM salted GROUP BY j, bucket),
        top AS (SELECT term, count(*) AS true_cnt FROM terms GROUP BY term
                ORDER BY true_cnt DESC, term ASC LIMIT 20),
        est AS (
          SELECT top.term, top.true_cnt, min(cell) AS cms_est
          FROM top, unnest([0, 1, 2, 3]) AS t(j)
          JOIN sketch ON sketch.j = t.j
            AND sketch.bucket = ${XHash.hash60Sql("(t.j || ':' || top.term)")} % 256
          GROUP BY top.term, top.true_cnt)
        SELECT term, true_cnt, cms_est,
               CAST(cms_est - true_cnt AS BIGINT) AS overcount
        FROM est ORDER BY true_cnt DESC, term ASC""")),

    // ── q91: DSIR importance resampling (Xie et al., NeurIPS 2023) —
    //   select raw-corpus documents whose hashed n-gram distribution
    //   looks like a TARGET domain: weight(doc) = Σ_tokens ln(p_target
    //   (bucket)/p_raw(bucket)) over B=256 hashed unigram buckets with
    //   add-one smoothing; keep the top-weighted documents. Target here
    //   = the English slice, raw = the whole corpus. Each bucket's
    //   log-ratio is 6dp-rounded and integer-lifted ONCE (256-row
    //   table), then each document's weight is an exact integer dot of
    //   its bucket counts with that broadcast table — order-independent
    //   and bit-identical. 100 TB shape: two 256-cell aggregations + one
    //   broadcast join; documents never shuffle. ──
    QueryDef("q91_dsir",
      (s, dir) => {
        val d = docs(s, dir)
        val tb = d.select(col("doc_id"), col("lang"),
            explode(TextOps.tokens(col("text"))).as("term"))
          .withColumn("b", pmod(XHash.hash60(col("term")), lit(256L)))
        // raw + target bucket counts in ONE corpus pass (conditional sum),
        // and the corpus totals from the 256-row table — the naive shape
        // (separate count()/filter().count()/two groupBys) scans the
        // exploded corpus four times for numbers this table already holds
        val bstats = tb.groupBy(col("b")).agg(count(lit(1)).as("cr"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
          .persist()
        val tots = bstats.agg(sum(col("cr")), sum(col("ct"))).head()
        val (rawTot, tgtTot) = (tots.getLong(0), tots.getLong(1))
        val lr = bstats
          .withColumn("lr", floor(round(
            log(((col("ct") + lit(1)) * lit(rawTot + 256L)).cast("double") /
              ((col("cr") + lit(1)) * lit(tgtTot + 256L)).cast("double")), 6) *
            lit(1e6) + lit(0.5)).cast("long"))
          .select(col("b"), col("lr"))
        // top-50 cut FIRST via TakeOrdered (per-partition heaps, no global
        // shuffle), then ranks assigned on the 50-row survivor frame — a
        // global row_number window before the cut would single-partition
        // every document weight
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("w_int").desc, col("doc_id").asc)
        tb.groupBy(col("doc_id"), col("lang"), col("b"))
          .agg(count(lit(1)).as("n"))
          .join(broadcast(lr), Seq("b"))
          .groupBy(col("doc_id"), col("lang"))
          .agg(sum(col("n") * col("lr")).as("w_int"))
          .orderBy(col("w_int").desc, col("doc_id").asc).limit(50)
          .withColumn("rnk", row_number().over(w).cast("long"))
          .withColumn("weight", round(col("w_int") / lit(1e6), 6))
          .select(col("rnk"), col("doc_id"), col("lang"), col("weight"))
          .orderBy(col("rnk"))
      },
      Some(s"""
        WITH tb AS (
          SELECT doc_id, lang,
                 ${XHash.hash60Sql("t.term")} % 256 AS b
          FROM (SELECT doc_id, lang, ${TextOps.tokensSql("text")} AS toks
                FROM documents) d, unnest(toks) AS t(term)),
        tot AS (SELECT count(*) AS raw_tot,
                       sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tgt_tot
                FROM tb),
        rawb AS (SELECT b, count(*) AS cr FROM tb GROUP BY b),
        tgtb AS (SELECT b, count(*) AS ct FROM tb WHERE lang = 'en' GROUP BY b),
        lr AS (
          SELECT rawb.b,
                 CAST(floor(round(ln(
                   CAST((coalesce(ct, 0) + 1) * (raw_tot + 256) AS DOUBLE) /
                   CAST((cr + 1) * (tgt_tot + 256) AS DOUBLE)), 6)
                   * 1000000.0 + 0.5) AS BIGINT) AS lr
          FROM rawb LEFT JOIN tgtb ON rawb.b = tgtb.b CROSS JOIN tot),
        dw AS (
          SELECT doc_id, lang, CAST(sum(n * lr) AS BIGINT) AS w_int
          FROM (SELECT doc_id, lang, b, count(*) AS n
                FROM tb GROUP BY doc_id, lang, b) db
          JOIN lr USING (b) GROUP BY doc_id, lang),
        ranked AS (
          SELECT doc_id, lang, w_int,
                 row_number() OVER (ORDER BY w_int DESC, doc_id ASC) AS rnk
          FROM dw)
        SELECT CAST(rnk AS BIGINT) AS rnk, doc_id, lang,
               round(w_int / 1000000.0, 6) AS weight
        FROM ranked WHERE rnk <= 50 ORDER BY rnk""")),

    // ── q96: Z-order (Morton) clustering key — the multi-column layout
    //   primitive behind `Collection.zorderBy` / Delta-Iceberg OPTIMIZE
    //   ZORDER, verified at the arithmetic level: bucket two order
    //   columns into 256 cells (exact integer min/max splits here so
    //   both engines agree bit-for-bit; the engine API buckets by
    //   approxQuantile sketch instead — robust to skew), interleave the
    //   bucket bits round-robin, and emit the per-z-block histogram +
    //   checksum. Rows whose z-values share a high byte are the rows a
    //   z-laid-out file would co-locate — the histogram IS the layout
    //   map. 100 TB shape: one cheap min/max agg broadcast as literals,
    //   then pure per-row bit arithmetic and a 256-group rollup. ──
    QueryDef("q96_zorder",
      (s, dir) => {
        val o = orders(s, dir).select(col("o_orderkey"),
          col("o_custkey").as("ck"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
        val st = o.agg(min(col("ck")), max(col("ck")),
          min(col("cents")), max(col("cents"))).head()
        val (ckMn, ckMx) = (st.getLong(0), st.getLong(1))
        val (ceMn, ceMx) = (st.getLong(2), st.getLong(3))
        o.withColumn("ba",
            expr(s"((ck - $ckMn) * 256) div (${ckMx} - $ckMn + 1)"))
          .withColumn("bb",
            expr(s"((cents - $ceMn) * 256) div (${ceMx} - $ceMn + 1)"))
          // bit interleave unrolled to a flat shift/mask sum: the HOF form
          // (aggregate over sequence(0,7) with power(2,·) weights) built a
          // per-row array and evaluated 16 double pow()s per row — measured
          // most of q96's sf1 cost. Identical integer arithmetic.
          .withColumn("zv", expr(
            (0 to 7).map(i =>
              s"(shiftright(ba, $i) & 1) * CAST(${1L << (2 * i)} AS BIGINT)" +
                s" + (shiftright(bb, $i) & 1) * CAST(${1L << (2 * i + 1)} AS BIGINT)")
              .mkString(" + ")))
          .groupBy(expr("zv div 256").as("z_block"))
          .agg(count(lit(1)).as("n"), sum(col("zv")).as("z_sum"))
          .orderBy(col("z_block"))
      },
      Some("""
        WITH o AS (SELECT o_orderkey, o_custkey AS ck,
                          CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                   FROM orders),
        st AS (SELECT min(ck) AS mn_ck, max(ck) AS mx_ck,
                      min(cents) AS mn_ce, max(cents) AS mx_ce FROM o),
        b AS (SELECT o_orderkey,
                     ((ck - mn_ck) * 256) // (mx_ck - mn_ck + 1) AS ba,
                     ((cents - mn_ce) * 256) // (mx_ce - mn_ce + 1) AS bb
              FROM o CROSS JOIN st),
        z AS (SELECT o_orderkey,
                     CAST(list_sum(list_transform(range(0, 8), i ->
                       ((ba >> i) & 1) * CAST(power(2, 2 * i) AS BIGINT) +
                       ((bb >> i) & 1) * CAST(power(2, 2 * i + 1) AS BIGINT)))
                       AS BIGINT) AS zv
              FROM b)
        SELECT zv // 256 AS z_block, count(*) AS n, CAST(sum(zv) AS BIGINT) AS z_sum
        FROM z GROUP BY z_block ORDER BY z_block""")),

    // ── q97: PageRank over the near-duplicate graph — graph centrality
    //   as a corpus-curation signal (a doc with many near-dup neighbors
    //   is template/boilerplate; Common Crawl pipelines use exactly this
    //   to find SEO farms). Nodes = all documents, edges = q31's
    //   banded-simhash pairs (hamming ≤ 3), PrIters damped rounds with
    //   dangling-mass redistribution. Exactness: pr lives in ×1e6
    //   integer space; per-edge contributions floor-divide; each round's
    //   new pr is one deterministic scalar expression over exact
    //   integers. 100 TB shape: candidate edges come from the banded
    //   equi-join (never all-pairs); each round is one equi-join of the
    //   pr table against pre-shrunk edges + a keyed aggregate — the
    //   Pregel step as two hash shuffles; dangling mass is a 1-row
    //   broadcast. ──
    QueryDef("q97_pagerank",
      (s, dir) => {
        // Superstep loop ≡ the BPE trainer's regime: many SMALL jobs over
        // cached frames, where AQE's per-stage re-planning round-trips
        // and 32-wide micro-shuffles dominate (measured 1.7 s/round vs
        // 0.5 s with classic planning + 8 partitions on the 5k-node
        // sf0.1 graph). Train classic, restore after.
        val prevAqe = s.conf.get("spark.sql.adaptive.enabled", "true")
        val prevParts = s.conf.get("spark.sql.shuffle.partitions", "32")
        s.conf.set("spark.sql.adaptive.enabled", "false")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        try {
        // the bounded pair table is a materialized artifact shared with
        // q31/q98 (TextQueries.boundedPairs) — this scans it, never
        // re-derives the simhash→band→TopK pipeline per execution
        val pairs = TextQueries.boundedPairs(s, dir)
          .select(col("id_a"), col("id_b")).persist()
        // cache-fill barrier: round 1's job reads pairs from several
        // subtrees (the dang broadcast subquery AND the contribution
        // join); left lazy, each scans the artifact before the cache
        // is filled
        pairs.count()
        val nodes = docs(s, dir).select(col("doc_id")).persist()
        val n = nodes.count().toDouble
        val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
          .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        var pr = nodes.withColumn("pr", lit(math.floor(1e6 / n).toLong))
        for (_ <- 1 to PrIters) {
          val prev = pr
          val dang = pr.join(deg, pr("doc_id") === deg("src"), "left_anti")
            .agg(coalesce(sum(col("pr")), lit(0L)).as("dang"))
          val aggIn = edges.join(deg, Seq("src"))
            .join(pr.withColumnRenamed("doc_id", "src"), Seq("src"))
            .withColumn("c", floor(col("pr") * lit(1.0) / col("deg")).cast("long"))
            .groupBy(col("dst")).agg(sum(col("c")).as("agg_in"))
          // cache each superstep (Pregel-style): pr feeds three consumers
          // (dangling sum, contributions, next round) — uncached, every
          // round re-derives the whole prior chain and the plan grows
          // geometrically. Force THIS round's blocks (count) before
          // releasing round t−1's: the new frame's lineage reads prev, so
          // dropping prev first would re-derive the whole chain. At most
          // two pr frames are ever cached — the invariant that survives
          // iteration counts chosen at 100× (a 50-round run caches 2
          // frames, not 50).
          pr = nodes.join(aggIn, nodes("doc_id") === aggIn("dst"), "left")
            .crossJoin(broadcast(dang))
            .withColumn("pr", floor(lit(150000.0) / lit(n) + lit(0.85) *
              (coalesce(col("agg_in"), lit(0L)) +
                floor(col("dang").cast("double") / lit(n))) + lit(0.5)).cast("long"))
            .select(col("doc_id"), col("pr"))
            .persist()
          pr.count()
          prev.unpersist()
        }
        // the final frame is materialized, so the inputs can go too
        pairs.unpersist(); nodes.unpersist()
        pr.withColumn("pagerank", round(col("pr") / lit(1e6), 6))
          .select(col("doc_id"), col("pagerank"))
          .orderBy(col("doc_id"))
        } finally {
          s.conf.set("spark.sql.adaptive.enabled", prevAqe)
          s.conf.set("spark.sql.shuffle.partitions", prevParts)
        }
      },
      Some(pagerankSql)),

    // ── q98: triangle counting on the near-duplicate graph — the
    //   clustering-coefficient density signal (a doc whose neighborhood
    //   is triangle-rich sits inside a mutually-similar CLUSTER —
    //   template families — vs. a hub with incidental pairwise matches).
    //   Standard two-join enumeration over the id-ordered edge list
    //   (a<b<c guarantees each triangle counted once). 100 TB shape:
    //   edges come from banding (never all-pairs), both joins are hash
    //   equi-joins on single node keys, and the per-node rollup is
    //   map-side combinable — but none of that bounds the join VOLUME
    //   when the similarity graph densifies: measured sf0.01 → sf0.1 →
    //   sf1, pairs grow 1,327 → 129k → ~13M (quadratic in docs: on a
    //   near-dup-saturated corpus a fixed FRACTION of all docs sits
    //   within Hamming 3 of each node, so degree grows linearly with
    //   corpus and Σdeg² triangle work grows cubically — the uncapped
    //   sf1 run spilled to disk-full after hours). The guard is the
    //   standard hub cap: nodes with degree > 64 are template/boiler-
    //   plate families, and the clustering-coefficient signal q98
    //   computes is about SMALL mutually-similar clusters, so hubs drop
    //   before enumeration (mirrored in the oracle; at the sf0.01 gate
    //   max degree is 47, so the cap is semantics, not a result
    //   change). Post-cap work is ≤ n·D² regardless of corpus density. ──
    QueryDef("q98_triangles",
      (s, dir) => {
        // shared materialized pair artifact (TextQueries.boundedPairs) —
        // same table q31 emits and q97 ranks over, derived once per corpus
        val rawPairs = TextQueries.boundedPairs(s, dir)
          .select(col("id_a"), col("id_b")).localCheckpoint()
        val deg = rawPairs.select(col("id_a").as("doc_id"))
          .union(rawPairs.select(col("id_b").as("doc_id")))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("deg"))
        val hubs = deg.filter(col("deg") > TriDegCap).select(col("doc_id"))
          .localCheckpoint()
        val pairs = rawPairs
          .join(hubs.withColumnRenamed("doc_id", "id_a"), Seq("id_a"), "left_anti")
          .join(hubs.withColumnRenamed("doc_id", "id_b"), Seq("id_b"), "left_anti")
        val e1 = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
        val tri = e1
          .join(e1.select(col("a").as("b"), col("b").as("c")), Seq("b"))
          .join(e1.select(col("a"), col("b").as("c")).withColumn("closed", lit(1L)),
            Seq("a", "c"))
          .select(col("a"), col("b"), col("c"))
        val perNode = tri
          .select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_triangles"))
        perNode.orderBy(col("doc_id"))
      },
      Some(s"""
        WITH ${TextQueries.simhashPairCtes},
        rawe AS (SELECT id_a, id_b FROM npairs),
        deg AS (SELECT doc_id, count(*) AS deg FROM (
                  SELECT id_a AS doc_id FROM rawe
                  UNION ALL SELECT id_b FROM rawe)
                GROUP BY doc_id),
        hubs AS (SELECT doc_id FROM deg WHERE deg > $TriDegCap),
        e AS (SELECT id_a AS a, id_b AS b FROM rawe
              WHERE id_a NOT IN (SELECT doc_id FROM hubs)
                AND id_b NOT IN (SELECT doc_id FROM hubs)),
        tri AS (
          SELECT e1.a AS a, e1.b AS b, e2.b AS c
          FROM e e1 JOIN e e2 ON e1.b = e2.a
                    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        pern AS (
          SELECT t.v AS doc_id, count(*) AS n_triangles
          FROM tri, unnest([a, b, c]) AS t(v)
          GROUP BY t.v)
        SELECT doc_id, n_triangles FROM pern ORDER BY doc_id""")),

    // ── q100: per-group top-k WITHOUT a window sort — the bounded-heap
    //   native aggregate (`operators.TopKAgg`). The window formulation
    //   (q05's shape) sorts every group's full row set inside the
    //   exchange; the aggregator streams a k-element sorted buffer with
    //   MAP-SIDE partial aggregation, so the shuffle carries ≤ k rows
    //   per group per map task and nothing ever sorts the full data —
    //   at 100 TB with heavy groups, a heap streamed vs a sort spilled.
    //   (The typed-Aggregator version of this paid a per-row encoder
    //   boundary — VERDICT r7 #1; the native expression reads the
    //   InternalRow directly inside ObjectHashAggregate.)
    //   Results are identical to the window formulation (the oracle IS
    //   the window formulation); `PipelineQueriesSpec` asserts the plan
    //   is window-free with a partial ObjectHashAggregate. ──
    QueryDef("q100_topk_agg",
      (s, dir) => {
        orders(s, dir)
          .select(col("o_orderpriority"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
            col("o_orderkey"))
          .select(col("o_orderpriority"),
            col("cents").cast("double").as("centsd"), col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(graft.operators.TopKAgg.topK(col("centsd"), col("o_orderkey"), 3)
            .as("top"))
          .select(col("o_orderpriority"), posexplode(col("top")))
          .select(col("o_orderpriority"), (col("pos") + 1).cast("long").as("rnk"),
            col("col.id").as("o_orderkey"), (col("col.v") / 100.0).as("price"))
          .orderBy(col("o_orderpriority"), col("rnk"))
      },
      Some("""
        WITH c AS (SELECT o_orderpriority, o_orderkey,
                          CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                   FROM orders),
        ranked AS (
          SELECT o_orderpriority, o_orderkey, cents,
                 row_number() OVER (PARTITION BY o_orderpriority
                   ORDER BY cents DESC, o_orderkey ASC) AS rnk
          FROM c)
        SELECT o_orderpriority, CAST(rnk AS BIGINT) AS rnk, o_orderkey,
               cents / 100.0 AS price
        FROM ranked WHERE rnk <= 3 ORDER BY o_orderpriority, rnk""")),

    // ── q101: Jensen-Shannon divergence of each language slice's token
    //   distribution vs the corpus — the drift/contamination metric data
    //   pipelines watch across snapshots (a slice whose JSD jumps got
    //   polluted or re-crawled). JSD(P‖Q) = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m),
    //   m = (p+q)/2, over the union support. Exactness: every per-token
    //   term is 6dp-rounded and integer-lifted before the per-slice sum;
    //   the final halving uses the explicit half-up (the q90 lesson —
    //   an engine round() at a computed half-boundary is not portable).
    //   100 TB shape: two vocabulary-sized count tables (map-side
    //   combined) joined on token — documents never shuffle. ──
    QueryDef("q101_jsd",
      (s, dir) => {
        val tok = docs(s, dir).select(col("lang"),
          explode(TextOps.tokens(col("text"))).as("t"))
        // byLang is the ONE aggregation that touches the exploded token
        // frame; everything else (corpus totals, per-lang totals, the
        // missing-term anti-join) derives from this vocabulary-sized
        // frame. Before, `corpus` re-aggregated `tok` directly — its
        // exchange keys on (t) vs byLang's (lang, t), so ReuseExchange
        // could never fire and the scan+tokenize+explode ran twice.
        val byLang = tok.groupBy(col("lang"), col("t")).agg(count(lit(1)).as("cl"))
          .persist()
        try {
        val nl = byLang.groupBy(col("lang")).agg(sum(col("cl")).as("nl"))
        val corpus = byLang.groupBy(col("t")).agg(sum(col("cl")).as("c"))
        // total token count as a 1-row broadcast frame (the oracle's `nn`
        // CTE), derived from the corpus agg — NOT tok.count(), which was an
        // extra driver-blocking full-scan job before the main plan ran
        val nn = corpus.agg(sum(col("c")).cast("double").as("n"))
        val terms = byLang.join(nl, Seq("lang")).join(corpus, Seq("t"))
          .crossJoin(broadcast(nn))
          .withColumn("p", col("cl").cast("double") / col("nl"))
          .withColumn("q", col("c").cast("double") / col("n"))
          .withColumn("m", (col("p") + col("q")) / lit(2.0))
          .withColumn("s1", floor(round(col("p") * log(col("p") / col("m")), 6) *
            lit(1e6) + lit(0.5)).cast("long"))
          .withColumn("s2", floor(round(col("q") * log(col("q") / col("m")), 6) *
            lit(1e6) + lit(0.5)).cast("long"))
        // tokens absent from a slice contribute only on the corpus side:
        // q·ln(q/(q/2)) = q·ln 2
        // lang list is vocabulary-of-languages-sized: broadcast explicitly so
        // the planner can never pick the corpus side as the build side
        val missing = corpus.crossJoin(broadcast(nl.select(col("lang"))))
          .join(byLang.select(col("lang"), col("t")), Seq("lang", "t"), "left_anti")
          .crossJoin(broadcast(nn))
          .withColumn("q", col("c").cast("double") / col("n"))
          .withColumn("s2", floor(round(col("q") * log(lit(2.0)), 6) *
            lit(1e6) + lit(0.5)).cast("long"))
          .withColumn("s1", lit(0L))
        terms.select(col("lang"), col("s1"), col("s2"))
          .unionByName(missing.select(col("lang"), col("s1"), col("s2")))
          .groupBy(col("lang"))
          .agg(sum(col("s1") + col("s2")).as("j_int"), count(lit(1)).as("n_support"))
          .withColumn("jsd",
            floor(col("j_int").cast("double") * lit(0.5) + lit(0.5)) / lit(1e6))
          .select(col("lang"), col("n_support"), col("jsd"))
          .orderBy(col("lang"))
          // eager: the per-lang result is ~|languages| rows; materializing
          // it here lets the finally release byLang's cached blocks before
          // the frame is returned — the repo's persist discipline (ADVICE
          // r10: a non-bench caller otherwise leaks the cache until
          // clearCache). The caller gets a lineage-free tiny frame.
          .localCheckpoint()
        } finally byLang.unpersist()
      },
      Some(s"""
        WITH tok AS (SELECT lang, unnest(${TextOps.tokensSql("text")}) AS t
                     FROM documents),
        byl AS (SELECT lang, t, count(*) AS cl FROM tok GROUP BY lang, t),
        nl AS (SELECT lang, CAST(sum(cl) AS BIGINT) AS nl FROM byl GROUP BY lang),
        corpus AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tok),
        terms AS (
          SELECT b.lang,
                 CAST(floor(round(p * ln(p / m), 6) * 1000000.0 + 0.5) AS BIGINT) AS s1,
                 CAST(floor(round(q * ln(q / m), 6) * 1000000.0 + 0.5) AS BIGINT) AS s2
          FROM (SELECT b.lang, b.t,
                       CAST(b.cl AS DOUBLE) / nl.nl AS p,
                       CAST(c.c AS DOUBLE) / nn.n AS q,
                       (CAST(b.cl AS DOUBLE) / nl.nl + CAST(c.c AS DOUBLE) / nn.n) / 2.0 AS m
                FROM byl b JOIN nl ON b.lang = nl.lang
                           JOIN corpus c ON b.t = c.t CROSS JOIN nn) b),
        missing AS (
          SELECT l.lang, CAST(0 AS BIGINT) AS s1,
                 CAST(floor(round((CAST(c.c AS DOUBLE) / nn.n) * ln(2.0), 6)
                   * 1000000.0 + 0.5) AS BIGINT) AS s2
          FROM corpus c CROSS JOIN (SELECT lang FROM nl) l CROSS JOIN nn
          WHERE NOT EXISTS (SELECT 1 FROM byl b
                            WHERE b.lang = l.lang AND b.t = c.t)),
        uni AS (SELECT lang, s1, s2 FROM terms
                UNION ALL SELECT lang, s1, s2 FROM missing)
        SELECT lang, count(*) AS n_support,
               floor(CAST(sum(s1 + s2) AS DOUBLE) * 0.5 + 0.5) / 1000000.0 AS jsd
        FROM uni GROUP BY lang ORDER BY lang""")),

    // ── q102: weighted sampling without replacement (Efraimidis &
    //   Spirakis, IPL 2006 "A-ES"): key_i = ln(u_i)/w_i with u_i a
    //   deterministic hash-uniform in (0,1], take the top-n keys — the
    //   quality-weighted corpus subsampling primitive (sample documents
    //   proportionally to a quality weight, here n_chars, in ONE pass
    //   with no global state). Key output uses the explicit half-up
    //   formula, never an engine round(); ranking compares the identical
    //   full-precision doubles in both engines with id tiebreak.
    //   100 TB shape: pure per-row arithmetic + one TakeOrdered top-n —
    //   zero shuffles before the cut. ──
    QueryDef("q102_weighted_sample",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.orderBy(col("key").desc, col("doc_id").asc)
        docs(s, dir)
          // zero/NULL-length docs have zero sampling weight — excluded on
          // BOTH engines (A-ES key = ln(u)/w is undefined at w=0, and the
          // engines disagree on NULL-key DESC placement; r12 hostile)
          .filter(col("n_chars") > 0)
          .withColumn("u",
            (XHash.hash31(concat(lit("ws:"), col("doc_id"))) + lit(1L))
              .cast("double") / lit(2147483648.0))
          .withColumn("key", log(col("u")) / col("n_chars"))
          .orderBy(col("key").desc, col("doc_id").asc).limit(50)
          .withColumn("rnk", row_number().over(w).cast("long"))
          .withColumn("key6",
            floor(col("key") * lit(1e6) + lit(0.5)) / lit(1e6))
          .select(col("rnk"), col("doc_id"), col("n_chars"), col("key6"))
          .orderBy(col("rnk"))
      },
      Some(s"""
        WITH keyed AS (
          SELECT doc_id, n_chars,
                 ln((${XHash.hash31Sql("('ws:' || doc_id)")} + 1)::DOUBLE
                    / 2147483648.0) / n_chars AS key
          FROM documents WHERE n_chars > 0),
        ranked AS (
          SELECT doc_id, n_chars, key,
                 row_number() OVER (ORDER BY key DESC, doc_id ASC) AS rnk
          FROM keyed)
        SELECT CAST(rnk AS BIGINT) AS rnk, doc_id, n_chars,
               floor(key * 1000000.0 + 0.5) / 1000000.0 AS key6
        FROM ranked WHERE rnk <= 50 ORDER BY rnk""")),

    // ── q103: per-user maximum drawdown over the purchase-value series —
    //   the risk-analytics window composition (running max, then max gap
    //   below it). Exact integer cents; two windows over ONE hash
    //   exchange on user_id (same partitioning, no second shuffle).
    //   Distinct from q76's fold: this is windowed state, not a
    //   sequential recurrence, so it stays fully declarative. ──
    QueryDef("q103_drawdown",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val wRun = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val v = events(s, dir).filter(col("event_type") === "purchase")
          .withColumn("cents", // NaN / |v|>=9e15 can't lift to cents: NULL, not a job-killing ANSI cast overflow (r12); NULL value stays NULL on both engines
            expr("CASE WHEN NOT isnan(value) AND abs(value) < 9e15 THEN CAST(round(value * 100) AS BIGINT) END"))
          .withColumn("run_max", max(col("cents")).over(wRun))
        v.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            max(col("run_max") - col("cents")).as("dd_cents"))
          .withColumn("max_drawdown", col("dd_cents").cast("double") / lit(100.0))
          .select(col("user_id"), col("n"), col("max_drawdown"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH v AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN NOT isnan(value) AND abs(value) < 9e15 THEN CAST(round(value * 100) AS BIGINT) END AS cents
          FROM events WHERE event_type = 'purchase'),
        r AS (
          SELECT user_id, cents,
                 max(cents) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max
          FROM v)
        SELECT user_id, count(*) AS n,
               CAST(max(run_max - cents) AS DOUBLE) / 100.0 AS max_drawdown
        FROM r GROUP BY user_id ORDER BY user_id""")),

    // ── q104: robust outlier detection by median absolute deviation —
    //   the curation-pipeline anomaly filter that survives the outliers
    //   it hunts (mean/stddev z-scores get dragged by the very tail they
    //   flag; median/MAD do not — Iglewicz & Hoaglin's modified z-score
    //   with the 1.4826 normal-consistency constant, |x−med| > 3σ̂).
    //   Exactness: integer cents; medians via the exact sort-based
    //   interpolation (ExactPercentiles ≡ quantile_cont) land on .0/.5
    //   exactly, so all stats stay in cents and no engine round() sits
    //   on a computed boundary. Two ranked windows + keyed aggregates,
    //   all partitioned by event_type — one exchange key throughout. ──
    QueryDef("q104_mad_outliers",
      (s, dir) => {
        import ExactPercentiles._
        // v feeds the median pass AND the deviation join; dev feeds the
        // MAD pass AND the outlier pass — persist both so the scan+rank
        // subtrees derive once each (q114 lesson)
        val v = events(s, dir)
          .withColumn("cents", // NaN / |v|>=9e15 can't lift to cents: NULL, not a job-killing ANSI cast overflow (r12); NULL value stays NULL on both engines
            expr("CASE WHEN NOT isnan(value) AND abs(value) < 9e15 THEN CAST(round(value * 100) AS BIGINT) END"))
          .select(col("event_type"), col("cents"))
          .persist()
        val med = ranked(v, "event_type", "cents")
          .groupBy(col("event_type"))
          .agg(max(col("n")).as("n"), lo(0.5).as("lo"), hi(0.5).as("hi"))
          .select(col("event_type"), interp(0.5, "lo", "hi").as("med_cents"))
        val dev = v.join(med, Seq("event_type"))
          .withColumn("adev", abs(col("cents").cast("double") - col("med_cents")))
          .persist()
        val mad = ranked(dev, "event_type", "adev")
          .groupBy(col("event_type"))
          .agg(max(col("n")).as("n"), lo(0.5).as("lo"), hi(0.5).as("hi"))
          .select(col("event_type"), interp(0.5, "lo", "hi").as("mad_cents"))
        dev.join(mad, Seq("event_type"))
          .withColumn("is_out",
            (col("adev") > col("mad_cents") * lit(1.4826) * lit(3.0)).cast("long"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), max(col("med_cents")).as("med_cents"),
            max(col("mad_cents")).as("mad_cents"), sum(col("is_out")).as("n_outliers"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH v AS (SELECT event_type,
                          CASE WHEN NOT isnan(value) AND abs(value) < 9e15 THEN CAST(round(value * 100) AS BIGINT) END AS cents
                   FROM events),
        med AS (SELECT event_type, round(quantile_cont(cents, 0.5), 6) AS med_cents
                FROM v GROUP BY event_type),
        dev AS (SELECT v.event_type, cents,
                       abs(CAST(cents AS DOUBLE) - med.med_cents) AS adev,
                       med.med_cents
                FROM v JOIN med USING (event_type)),
        mad AS (SELECT event_type, round(quantile_cont(adev, 0.5), 6) AS mad_cents
                FROM dev GROUP BY event_type)
        SELECT d.event_type, count(*) AS n,
               max(d.med_cents) AS med_cents, max(m.mad_cents) AS mad_cents,
               CAST(sum(CASE WHEN d.adev > m.mad_cents * 1.4826 * 3.0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM dev d JOIN mad m USING (event_type)
        GROUP BY d.event_type ORDER BY d.event_type""")),

    // ── q105: multinomial Naive Bayes language classifier — supervised
    //   TRAINING as pure distributed aggregation (the count-based model
    //   family where Spark shines: the "fit" is two groupBys). Train on
    //   even doc_ids, classify odd ones, emit the confusion matrix.
    //   Laplace-smoothed: P(t|l) = (c_lt+1)/(n_l+V), prior = docs_l/docs,
    //   unseen tokens take the per-lang default 1/(n_l+V). Every log
    //   term is 6dp-rounded and integer-lifted ONCE in the model tables;
    //   per-document scores are exact integer dots, argmax breaks ties
    //   on lang. 100 TB shape: the model is vocabulary×5 rows broadcast
    //   to the scoring join; test documents never shuffle full text. ──
    QueryDef("q105_naive_bayes",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // d serves train/test splits and, through trainTok, four model
        // tables plus two scalar jobs (vocab size, doc count) — persist
        // both or the tokenize+explode subtree derives ~6× (q114 lesson)
        val d = docs(s, dir)
          .select(col("doc_id"), col("lang"), TextOps.tokens(col("text")).as("toks"))
          .persist()
        val train = d.filter(col("doc_id") % 2 === 0)
        val test = d.filter(col("doc_id") % 2 === 1)
        val trainTok = train.select(col("lang"), explode(col("toks")).as("t")).persist()
        val vocabV = trainTok.select(col("t")).distinct().count()
        val nTrainDocs = train.count()
        // the per-lang model scalars (nl, dl — 5 rows each) collect to the
        // driver and come back as LOCAL frames: the q111 lesson — an
        // in-plan aggregate subtree behind a broadcast costs a full
        // (cached) pass per consumer, and stats fed THREE (lik's join,
        // defaults, priors). The arithmetic below is unchanged — the same
        // longs now arrive as literals instead of aggregate outputs.
        import s.implicits._
        // label cardinality is bounded by the TASK (a language classifier
        // trains over a known class set), but `lang` is a data column — a
        // hostile corpus with per-doc unique labels would make these
        // collects corpus-sized. Cap sized to the DOWNSTREAM consumer,
        // not the collect (r14 advice): scoring crossJoins every test doc
        // against all L classes, so cost is linear in L per test row — at
        // the old 65536 cap a 35k-class corpus PASSED the guard and then
        // stalled in that ×L join (BoundedCollectSpec's first draft hit
        // exactly this). 1024 is generous for any real classifier target
        // (langid ~200, domains ~dozens) and keeps the ×L join trivially
        // broadcastable.
        val MaxLangs = 1024
        def langRollup(df: DataFrame, cnt: String): Seq[(String, Long)] =
          Bounded.collectBounded(df, MaxLangs, s"q105: lang",
            "the per-class model tables are driver-collected and scoring " +
              "enumerates ×L candidates per test doc; a label column at " +
              s"this cardinality is not a classification target ($cnt rollup)")
            .map(r => (r.getString(0), r.getLong(1))).toSeq
        val statsLocal = langRollup(trainTok.groupBy(col("lang"))
          .agg(count(lit(1)).as("nl")), "nl")
        val dlLocal = langRollup(train.groupBy(col("lang"))
          .agg(count(lit(1)).as("dl")), "dl")
        val priors = dlLocal.toDF("lang", "dl")
          .withColumn("prior", floor(round(
            log(col("dl").cast("double") / lit(nTrainDocs.toDouble)), 6) *
            lit(1e6) + lit(0.5)).cast("long"))
          .select(col("lang"), col("prior"))
        val lik = trainTok.groupBy(col("lang"), col("t")).agg(count(lit(1)).as("clt"))
          .join(broadcast(statsLocal.toDF("lang", "nl")), Seq("lang"))
          .withColumn("ll", floor(round(
            log((col("clt") + lit(1)).cast("double") /
              (col("nl") + lit(vocabV)).cast("double")), 6) * lit(1e6) + lit(0.5))
            .cast("long"))
          .select(col("lang"), col("t"), col("ll"))
        val defaults = statsLocal.toDF("cand", "nl")
          .withColumn("ll0", floor(round(
            log(lit(1.0) / (col("nl") + lit(vocabV)).cast("double")), 6) *
            lit(1e6) + lit(0.5)).cast("long"))
          .select(col("cand"), col("ll0"))
        val testTok = test.select(col("doc_id"), col("lang").as("true_lang"),
            explode(col("toks")).as("t"))
          .groupBy(col("doc_id"), col("true_lang"), col("t"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("cand").asc)
        testTok
          .crossJoin(broadcast(defaults))
          .join(broadcast(lik.withColumnRenamed("lang", "cand")), Seq("cand", "t"), "left")
          .withColumn("term", col("cnt") * coalesce(col("ll"), col("ll0")))
          .groupBy(col("doc_id"), col("true_lang"), col("cand"))
          .agg(sum(col("term")).as("tscore"))
          .join(broadcast(priors.withColumnRenamed("lang", "cand")), Seq("cand"))
          .withColumn("score", col("tscore") + col("prior"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .groupBy(col("true_lang"), col("cand").as("pred_lang"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("true_lang"), col("pred_lang"))
      },
      Some(s"""
        WITH d AS (SELECT doc_id, lang, ${TextOps.tokensSql("text")} AS toks
                   FROM documents),
        traintok AS (SELECT lang, unnest(toks) AS t FROM d WHERE doc_id % 2 = 0),
        stats AS (SELECT lang, count(*) AS nl FROM traintok GROUP BY lang),
        vv AS (SELECT count(DISTINCT t) AS v FROM traintok),
        nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM d WHERE doc_id % 2 = 0),
        priors AS (
          SELECT lang,
                 CAST(floor(round(ln(CAST(count(*) AS DOUBLE) / nd.n), 6)
                   * 1000000.0 + 0.5) AS BIGINT) AS prior
          FROM d CROSS JOIN nd WHERE doc_id % 2 = 0 GROUP BY lang, nd.n),
        lik AS (
          SELECT tt.lang, tt.t,
                 CAST(floor(round(ln(CAST(count(*) + 1 AS DOUBLE) /
                   CAST(stats.nl + vv.v AS DOUBLE)), 6) * 1000000.0 + 0.5)
                   AS BIGINT) AS ll
          FROM traintok tt JOIN stats ON tt.lang = stats.lang CROSS JOIN vv
          GROUP BY tt.lang, tt.t, stats.nl, vv.v),
        defaults AS (
          SELECT lang AS cand,
                 CAST(floor(round(ln(1.0 / CAST(stats.nl + vv.v AS DOUBLE)), 6)
                   * 1000000.0 + 0.5) AS BIGINT) AS ll0
          FROM stats CROSS JOIN vv),
        testtok AS (
          SELECT doc_id, lang AS true_lang, t.t AS t, count(*) AS cnt
          FROM d, unnest(toks) AS t(t)
          WHERE doc_id % 2 = 1 GROUP BY doc_id, lang, t.t),
        scored AS (
          SELECT tk.doc_id, tk.true_lang, df.cand,
                 CAST(sum(tk.cnt * coalesce(lik.ll, df.ll0)) AS BIGINT) +
                   max(p.prior) AS score
          FROM testtok tk CROSS JOIN defaults df
          LEFT JOIN lik ON lik.lang = df.cand AND lik.t = tk.t
          JOIN priors p ON p.lang = df.cand
          GROUP BY tk.doc_id, tk.true_lang, df.cand),
        pred AS (
          SELECT doc_id, true_lang, cand,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY score DESC, cand ASC) AS rn
          FROM scored)
        SELECT true_lang, cand AS pred_lang, count(*) AS n_docs
        FROM pred WHERE rn = 1
        GROUP BY true_lang, cand ORDER BY true_lang, pred_lang""")),

    // ── q106: 2-D skyline (Pareto frontier) — orders no other order
    //   dominates on (price, recency), the multi-objective "best
    //   candidates" operator (Börzsönyi et al., ICDE'01). The naive
    //   definition is the O(n²) dominance anti-join (the ORACLE states
    //   exactly that); the engine runs the O(n log n) two-phase sweep:
    //   dedupe to distinct points, LOCAL sweep within price buckets
    //   (a point dominated inside its bucket is dominated globally —
    //   dominance is transitive — so each partition prunes
    //   independently), then the global running-max-date sweep over the
    //   few survivors. At 100 TB phase 1 is embarrassingly parallel and
    //   phase 2 sees survivors only — never a quadratic join, never a
    //   global sort of the full data. ──
    QueryDef("q106_skyline",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val pts = orders(s, dir)
          .withColumn("cents", expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .groupBy(col("cents"), col("o_orderdate"))
          .agg(count(lit(1)).as("n_orders"))
        val wLocal = Window.partitionBy(col("bkt"))
          .orderBy(col("cents").desc, col("o_orderdate").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val local = pts.withColumn("bkt", expr("cents div 1000000"))
          .withColumn("maxd", max(col("o_orderdate")).over(wLocal))
          .filter(col("maxd").isNull || col("maxd") < col("o_orderdate"))
          .drop("bkt", "maxd")
        val wGlobal = Window
          .orderBy(col("cents").desc, col("o_orderdate").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        local.withColumn("maxd", max(col("o_orderdate")).over(wGlobal))
          .filter(col("maxd").isNull || col("maxd") < col("o_orderdate"))
          .select((col("cents").cast("double") / lit(100.0)).as("price"),
            date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("odate"),
            col("n_orders"))
          .orderBy(col("price").desc)
      },
      Some("""
        WITH pts AS (
          SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                 o_orderdate, count(*) AS n_orders
          FROM orders GROUP BY cents, o_orderdate),
        sky AS (
          SELECT * FROM pts p
          WHERE NOT EXISTS (
            SELECT 1 FROM pts q
            WHERE q.cents >= p.cents AND q.o_orderdate >= p.o_orderdate
              AND (q.cents > p.cents OR q.o_orderdate > p.o_orderdate)))
        SELECT CAST(cents AS DOUBLE) / 100.0 AS price,
               strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS odate, n_orders
        FROM sky ORDER BY price DESC""")),

    // ── q107: fuzzy (edit-distance ≤ 1) entity self-join via SymSpell
    //   deletion-neighborhood blocking (Garbe's algorithm): two strings
    //   within edit distance 1 ALWAYS share a member of their 1-deletion
    //   neighborhoods (delete the differing position from each side), so
    //   generating |s|+1 variants per key turns the fuzzy join into an
    //   equi-join on variant + an exact levenshtein verify — the entity-
    //   resolution step that clusters near-identical source/host
    //   identifiers (src1 ↔ src10 ↔ src11 …) before per-source stats.
    //   The ORACLE states the O(V²) cross-join definition; the engine
    //   never builds it: candidates come from the hash equi-join and
    //   only candidates pay the verify. Key-universe-sized frames
    //   throughout — documents never shuffle. ──
    QueryDef("q107_fuzzy_join",
      (s, dir) => {
        val srcs = docs(s, dir)
          .groupBy(col("source").as("src")).agg(count(lit(1)).as("cnt"))
        val variants = srcs.select(col("src"),
            explode(expr(
              """array_union(array(src), transform(sequence(1, length(src)),
                 i -> concat(substring(src, 1, i - 1), substring(src, i + 1, length(src)))))"""))
              .as("v"))
        val a = variants.select(col("src").as("src_a"), col("v"))
        val b = variants.select(col("src").as("src_b"), col("v"))
        a.join(b, Seq("v"))
          .filter(col("src_a") < col("src_b"))
          .select(col("src_a"), col("src_b")).distinct()
          .filter(levenshtein(col("src_a"), col("src_b")) <= 1)
          .join(srcs.select(col("src").as("src_a"), col("cnt").as("cnt_a")), Seq("src_a"))
          .join(srcs.select(col("src").as("src_b"), col("cnt").as("cnt_b")), Seq("src_b"))
          .select(col("src_a"), col("src_b"), col("cnt_a"), col("cnt_b"))
          .orderBy(col("src_a"), col("src_b"))
      },
      Some("""
        WITH srcs AS (
          SELECT source AS src, count(*) AS cnt
          FROM documents GROUP BY source)
        SELECT a.src AS src_a, b.src AS src_b,
               a.cnt AS cnt_a, b.cnt AS cnt_b
        FROM srcs a JOIN srcs b
          ON a.src < b.src AND levenshtein(a.src, b.src) <= 1
        ORDER BY src_a, src_b""")),

    // ── q109: interval union (merged coverage) — overlapping per-user
    //   activity intervals [ts, ts+5min) merged by the plane-sweep
    //   (order by start; a row STARTS a new merged interval iff its
    //   start exceeds the running max end of everything before it;
    //   cumulative break-sum labels the islands) — the "gaps and
    //   islands" pattern behind session coverage, SLA uptime, and
    //   watched-time analytics, O(n log n) with no self-join. Exact
    //   integer microseconds end to end. One exchange on user_id; both
    //   windows and both rollups share it. ──
    QueryDef("q109_interval_union",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val iv = events(s, dir)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("st"))
          .withColumn("en", col("st") + lit(300000000L))
        val wPrev = Window.partitionBy(col("user_id"))
          .orderBy(col("st"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wRun = Window.partitionBy(col("user_id"))
          .orderBy(col("st"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        iv.withColumn("prev_end", max(col("en")).over(wPrev))
          .withColumn("brk",
            when(col("prev_end").isNull || col("st") > col("prev_end"), 1L)
              .otherwise(0L))
          .withColumn("grp", sum(col("brk")).over(wRun))
          .groupBy(col("user_id"), col("grp"))
          .agg(min(col("st")).as("g_start"), max(col("en")).as("g_end"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_intervals"),
            sum(col("g_end") - col("g_start")).as("covered_us"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH iv AS (
          SELECT user_id, event_id, epoch_us(ts) AS st,
                 epoch_us(ts) + 300000000 AS en
          FROM events),
        marked AS (
          SELECT user_id, event_id, st, en,
                 max(en) OVER (PARTITION BY user_id ORDER BY st, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
          FROM iv),
        grouped AS (
          SELECT user_id, st, en,
                 CAST(sum(CASE WHEN prev_end IS NULL OR st > prev_end
                               THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY st, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS grp
          FROM marked),
        islands AS (
          SELECT user_id, grp, min(st) AS g_start, max(en) AS g_end
          FROM grouped GROUP BY user_id, grp)
        SELECT user_id, count(*) AS n_intervals,
               CAST(sum(g_end - g_start) AS BIGINT) AS covered_us
        FROM islands GROUP BY user_id ORDER BY user_id""")),

    // ── q110: HyperLogLog built from scratch (Flajolet et al. 2007) —
    //   q37 calls Spark's built-in approx_count_distinct; this one
    //   constructs the sketch itself so BOTH engines compute identical
    //   registers from the shared md5 hash: bucket = top 6 of 60 hash
    //   bits, rank = leading-zero count of the low 54 (via bin-string
    //   length — exact integer arithmetic, no float log2 at a power-of-
    //   two boundary), register = max rank per bucket, then the m=64
    //   harmonic-mean estimator with the small-range linear-counting
    //   correction. Run over event_id (HLL regime) AND user_id (linear-
    //   counting regime) so both branches are exercised and checked.
    //   100 TB shape: the register table is 64 rows, max() is map-side
    //   combinable — the whole sketch shuffles 64·tasks rows, the
    //   definition of mergeable-sketch scale. ──
    QueryDef("q110_hll_scratch",
      (s, dir) => {
        val ev = events(s, dir)
        def sketch(valueCol: Column, label: String): DataFrame = {
          val regs = ev.select(XHash.hash60(valueCol.cast("string")).as("h"))
            .withColumn("bucket", expr("h div 18014398509481984")) // 2^54: top 6 bits
            .withColumn("w", pmod(col("h"), lit(18014398509481984L)))
            .withColumn("rank",
              when(col("w") === 0L, lit(55L))
                .otherwise(lit(54L) - length(expr("bin(w)")) + lit(1L)))
            .groupBy(col("bucket")).agg(max(col("rank")).as("r"))
          val trueD = ev.select(valueCol).distinct().count().toDouble
          // harmonic mean over ALL m registers (absent buckets are rank 0)
          val st = regs.agg(
            sum(pow(lit(2.0), -col("r").cast("double"))).as("z_present"),
            count(lit(1)).as("m_present"),
            sum(when(col("r") === 0L, 1L).otherwise(0L)).as("zeros_present")).head()
          val m = 64.0
          val z = st.getDouble(0) + (m - st.getLong(1)) // absent => 2^-0 = 1
          val zeros = st.getLong(2) + (m - st.getLong(1))
          val alpha = 0.7213 / (1.0 + 1.079 / m)
          val raw = alpha * m * m / z
          val est =
            // shared JVM-literal table (see CurationQueries.HllSmallRange):
            // both engines use bit-identical constants for the small-range
            // correction instead of racing libm-vs-JVM ln ulps (r11)
            if (raw <= 2.5 * m && zeros > 0)
              graft.CurationQueries.HllSmallRange(zeros.toInt - 1)
            else raw
          import s.implicits._
          Seq((label, trueD.toLong,
            math.floor(est * 1e6 + 0.5) / 1e6,
            math.floor(math.abs(est - trueD) / trueD * 1e6 + 0.5) / 1e6))
            .toDF("col_name", "true_distinct", "hll_estimate", "rel_err")
        }
        sketch(col("event_id"), "event_id")
          .unionByName(sketch(col("user_id"), "user_id"))
          .orderBy(col("col_name"))
      },
      Some(s"""
        WITH vals AS (
          SELECT 'event_id' AS col_name,
                 ${XHash.hash60Sql("CAST(event_id AS VARCHAR)")} AS h,
                 event_id AS v FROM events
          UNION ALL
          SELECT 'user_id' AS col_name,
                 ${XHash.hash60Sql("CAST(user_id AS VARCHAR)")} AS h,
                 user_id AS v FROM events),
        regs AS (
          SELECT col_name, h // 18014398509481984 AS bucket,
                 max(CASE WHEN h % 18014398509481984 = 0 THEN 55
                          ELSE 54 - length(bin(h % 18014398509481984)) + 1
                     END) AS r
          FROM vals GROUP BY col_name, bucket),
        agg AS (
          SELECT col_name,
                 sum(power(2.0, -CAST(r AS DOUBLE))) AS z_present,
                 count(*) AS m_present,
                 sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS zeros_present
          FROM regs GROUP BY col_name),
        t AS (SELECT col_name, CAST(count(DISTINCT v) AS BIGINT) AS true_distinct
              FROM vals GROUP BY col_name),
        est AS (
          SELECT a.col_name, t.true_distinct,
                 CASE WHEN (0.7213 / (1.0 + 1.079 / 64.0)) * 64.0 * 64.0 /
                             (z_present + (64.0 - m_present)) <= 2.5 * 64.0
                           AND (zeros_present + (64 - m_present)) > 0
                      THEN (${graft.CurationQueries.HllSmallRangeSql})[CAST(zeros_present + (64 - m_present) AS INT)]
                      ELSE (0.7213 / (1.0 + 1.079 / 64.0)) * 64.0 * 64.0 /
                             (z_present + (64.0 - m_present)) END AS e
          FROM agg a JOIN t ON a.col_name = t.col_name)
        SELECT col_name, true_distinct,
               floor(e * 1000000.0 + 0.5) / 1000000.0 AS hll_estimate,
               floor(abs(e - true_distinct) / true_distinct * 1000000.0 + 0.5)
                 / 1000000.0 AS rel_err
        FROM est ORDER BY col_name""")),

    // ── q111: association rules / pointwise mutual information over
    //   within-document token co-occurrence — the market-basket family
    //   (Agrawal '93 support/lift, turned log-scale as PMI): which terms
    //   co-occur far beyond chance. Presence-based: c_a = docs containing
    //   a, c_ab = docs containing both; lift = c_ab·N/(c_a·c_b), PMI =
    //   ln lift, 6dp-integer-lifted for the rank. 100 TB shape: Apriori
    //   two-pass — pass 1 rolls up doc frequencies and keeps only tokens
    //   above the support floor (≤ 20·avgDistinctTokensPerDoc on ANY
    //   corpus, so driver-sized); pass 2's pair generation is a
    //   PER-DOCUMENT self-join over frequent tokens only (bounded by
    //   frequent-per-doc², never corpus²), pair counts map-side combine,
    //   and the frequent-singles table re-enters as local frames. ──
    QueryDef("q111_assoc_pmi",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val pres = docs(s, dir)
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("t"))
          .distinct()
          .persist() // feeds singles, both self-join sides, and the N frame
        val singles = pres.groupBy(col("t")).agg(count(lit(1)).as("c"))
        // Apriori prune (Agrawal '93 downward closure): c_ab <= min(c_a,
        // c_b), so a token below the 5% support floor cannot appear in ANY
        // surviving pair — drop it BEFORE the per-document self-join, not
        // after the count. Exact: only pairs the floor filter would discard
        // are pruned, so c_ab for every surviving pair is unchanged. This
        // is the classic two-pass shape: pass 1 is a doc-frequency rollup
        // COLLECTED to the driver and pushed back as an InSet filter
        // inside the self-join sides — not a broadcast-join subtree, which
        // would re-derive singles+nn as extra aggregate passes (measured
        // +1.0 s here). The two pre-jobs pay for themselves: the collected
        // table replaces BOTH in-plan singles broadcasts with local frames
        // and the nn crossJoin with a literal, so pass 2 is just self-join
        // → pair count → local-table lookups. The synthetic ~100-token
        // vocabulary mostly passes the floor (no local pruning), but a
        // natural Zipfian vocabulary is overwhelmingly BELOW a 5%
        // doc-frequency floor — at 100 TB this is the difference between
        // pairing the full per-doc token set (len² explosion) and pairing
        // the few hundred frequent types.
        //
        // The floor is applied IN-ENGINE, which bounds the collect at
        // 20·avgDistinctTokensPerDoc on any corpus (Σ doc-freq = |pres| ≤
        // n·avgDistinct, so at most avgDistinct/0.05 tokens clear a
        // 0.05·n doc-frequency floor) — including the pathological
        // all-unique-token corpus where raw vocabulary is corpus-sized.
        // avgDistinct is still DATA, though (a few-docs/huge-docs corpus
        // inflates it, r14 review), so the materialization also carries
        // the loud limit+require cap — the rankedWithApprox idiom, same
        // 65536 as q105's class guard.
        val MaxFreqToks = 65536
        val hd = pres.agg(countDistinct(col("doc_id")).as("nd"),
          countDistinct(col("t")).as("v")).head()
        val (nD, vocabN) = (hd.getLong(0).toDouble, hd.getLong(1))
        val pass1 = Bounded.collectBounded(
          singles.filter(col("c") >= lit(0.05) * lit(nD)),
          MaxFreqToks, "q111: support-floor-clearing token",
          "the frequent-singles table is driver-collected; at this " +
            "cardinality the pair space is not a top-20 PMI question")
        val freqToks = pass1.map(_.getString(0)).toSeq
        // skip the membership filter when NOTHING fell below the floor
        // (the local corpus): an always-true InSet still hashes every
        // token twice through the self-join sides — measured +0.2 s of
        // pure overhead at sf0.1
        val presF =
          if (freqToks.length == vocabN) pres
          else pres.filter(col("t").isin(freqToks: _*))
        val pairs = presF.as("x").join(presF.as("y"), Seq("doc_id"))
          .filter(col("x.t") < col("y.t"))
          .groupBy(col("x.t").as("a"), col("y.t").as("b"))
          .agg(count(lit(1)).as("c_ab"))
        import s.implicits._
        val singlesLocal = pass1.map(r => (r.getString(0), r.getLong(1))).toSeq
        val w = Window.orderBy(col("pmi_int").desc, col("a").asc, col("b").asc)
        pairs
          .join(broadcast(singlesLocal.toDF("a", "c_a")), Seq("a"))
          .join(broadcast(singlesLocal.toDF("b", "c_b")), Seq("b"))
          .filter(col("c_ab") >= lit(0.05) * lit(nD)) // 5% support floor
          .withColumn("pmi_int", floor(round(
            log((col("c_ab") * lit(nD)).cast("double") /
              (col("c_a") * col("c_b")).cast("double")), 6) * lit(1e6) + lit(0.5))
            .cast("long"))
          .orderBy(col("pmi_int").desc, col("a").asc, col("b").asc).limit(20)
          .withColumn("rnk", row_number().over(w).cast("long"))
          .withColumn("pmi", col("pmi_int").cast("double") / lit(1e6))
          .withColumn("confidence",
            floor(col("c_ab").cast("double") / col("c_a") * lit(1e6) + lit(0.5)) / lit(1e6))
          .select(col("rnk"), col("a"), col("b"), col("c_ab"),
            col("confidence"), col("pmi"))
          .orderBy(col("rnk"))
      },
      Some(s"""
        WITH pres AS (
          SELECT DISTINCT doc_id, t.t AS t
          FROM (SELECT doc_id, ${TextOps.tokensSql("text")} AS toks FROM documents),
               unnest(toks) AS t(t)),
        nn AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM pres),
        singles AS (SELECT t, count(*) AS c FROM pres GROUP BY t),
        pairs AS (
          SELECT x.t AS a, y.t AS b, count(*) AS c_ab
          FROM pres x JOIN pres y ON x.doc_id = y.doc_id AND x.t < y.t
          GROUP BY x.t, y.t),
        scored AS (
          SELECT p.a, p.b, p.c_ab,
                 CAST(floor(round(ln(CAST(p.c_ab AS DOUBLE) * nn.n /
                   CAST(sa.c * sb.c AS DOUBLE)), 6) * 1000000.0 + 0.5) AS BIGINT)
                   AS pmi_int,
                 floor(CAST(p.c_ab AS DOUBLE) / sa.c * 1000000.0 + 0.5)
                   / 1000000.0 AS confidence
          FROM pairs p JOIN singles sa ON p.a = sa.t
                       JOIN singles sb ON p.b = sb.t CROSS JOIN nn
          WHERE p.c_ab >= 0.05 * nn.n),
        ranked AS (
          SELECT a, b, c_ab, pmi_int, confidence,
                 row_number() OVER (ORDER BY pmi_int DESC, a ASC, b ASC) AS rnk
          FROM scored)
        SELECT CAST(rnk AS BIGINT) AS rnk, a, b, c_ab, confidence,
               CAST(pmi_int AS DOUBLE) / 1000000.0 AS pmi
        FROM ranked WHERE rnk <= 20 ORDER BY rnk""")),

    // ── q112: Benford's-law first-digit audit — the forensic data-
    //   quality check (synthetic, truncated, or fabricated numeric
    //   columns break the log-uniform leading-digit distribution).
    //   Observed counts per digit vs n·log10(1+1/d), per-digit χ²
    //   contribution integer-lifted. Pure per-row digit extraction +
    //   one 9-group rollup — zero heavy shuffles at any scale. Note the
    //   testdata's totalprice is uniform-ish, NOT Benford — flagging
    //   that (big χ²) is exactly the operator doing its job; the gate
    //   pins the arithmetic either way. ──
    QueryDef("q112_benford",
      (s, dir) => {
        val o = orders(s, dir)
          .withColumn("cents", expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .filter(col("cents") > 0)
          .withColumn("d", substring(col("cents").cast("string"), 1, 1).cast("long"))
        // total row count recovered from the 9-row digit rollup itself (an
        // unpartitioned window over 9 rows, not a driver count() job — the
        // windowed frame is digit-cardinality-sized at any data scale)
        val wAll = org.apache.spark.sql.expressions.Window
          .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
        o.groupBy(col("d")).agg(count(lit(1)).as("n_obs"))
          .withColumn("n", sum(col("n_obs")).over(wAll).cast("double"))
          .withColumn("expected",
            floor(col("n") * log(lit(1.0) + lit(1.0) / col("d")) / log(lit(10.0)) *
              lit(1e6) + lit(0.5)) / lit(1e6))
          .withColumn("chi2_term",
            floor((col("n_obs") - col("expected")) * (col("n_obs") - col("expected")) /
              col("expected") * lit(1e6) + lit(0.5)) / lit(1e6))
          .select(col("d"), col("n_obs"), col("expected"), col("chi2_term"))
          .orderBy(col("d"))
      },
      Some("""
        WITH o AS (
          SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM o),
        digits AS (
          SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS d,
                 count(*) AS n_obs
          FROM o GROUP BY d),
        e AS (
          SELECT d, n_obs,
                 floor(nn.n * ln(1.0 + 1.0 / d) / ln(10.0) * 1000000.0 + 0.5)
                   / 1000000.0 AS expected
          FROM digits CROSS JOIN nn)
        SELECT d, n_obs,
               expected,
               floor((n_obs - expected) * (n_obs - expected) / expected
                 * 1000000.0 + 0.5) / 1000000.0 AS chi2_term
        FROM e ORDER BY d""")),

    // ── q114: containment join — ASYMMETRIC near-dup detection
    //   (Broder's containment C(A,B) = |S_A ∩ S_B| / |S_A|): a short
    //   document quoted inside a long one has low Jaccard (the union is
    //   dominated by the long side) but high containment — the quote/
    //   subset direction q24-q27's symmetric measures structurally miss
    //   (Lee et al. ACL'22 dedups exactly these). Shingle space: word-
    //   8-gram 60-bit hashes (q82's span currency) with stop-shingle
    //   removal (df > 50 shingles carry no containment signal and are
    //   the candidate-explosion risk — standard stop-word treatment at
    //   the shingle level; sizes and intersections both live in the
    //   filtered space, so the semantics stay self-consistent). 100 TB
    //   shape: candidates come from the inverted-index equi-join on
    //   shingle hash — never all-pairs — and every aggregate is keyed
    //   and map-side combinable. ──
    QueryDef("q114_containment",
      (s, dir) => {
        val spans = docs(s, dir)
          .withColumn("words", split(col("text"), " "))
          .filter(size(col("words")) >= 8)
          .withColumn("pos", explode(expr("sequence(1, size(words) - 7)")))
          .select(col("doc_id"),
            XHash.hash60(expr("concat_ws(' ', slice(words, pos, 8))")).as("sh"))
          .distinct()
          .persist() // feeds keep AND the keep-join; explode+hash runs once
        val keep = spans.groupBy(col("sh")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= 50).select(col("sh"))
        // persisted: kept feeds sizes and BOTH sides of the self-join, and
        // each consumer prunes differently so ReuseExchange never fires —
        // uncached the plan held 10 parquet scans / 5 shingle re-derivations
        // (PLANS.md q114, r6 audit: 4.3 s; persisted ≈ 2× faster)
        val kept = spans.join(keep, Seq("sh")).persist()
        val sizes = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
        val inter = kept.as("x").join(kept.as("y"), Seq("sh"))
          .filter(col("x.doc_id") < col("y.doc_id"))
          .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
          .agg(count(lit(1)).as("inter"))
        // both directions from ONE pass over the joined candidates — a
        // union of two selects would duplicate the whole inverted-index
        // join subtree (each branch prunes differently, ReuseExchange
        // can't fire; measured 3.46 → 2.6 s at sf0.1)
        val directed = inter
          .join(sizes.select(col("doc_id").as("a"), col("n_sh").as("na")), Seq("a"))
          .join(sizes.select(col("doc_id").as("b"), col("n_sh").as("nb")), Seq("b"))
          .select(explode(array(
            struct(col("a").as("contained"), col("b").as("container"),
              col("inter"), col("na").as("n_contained")),
            struct(col("b").as("contained"), col("a").as("container"),
              col("inter"), col("nb").as("n_contained")))).as("r"))
          .select(col("r.contained").as("contained"),
            col("r.container").as("container"),
            col("r.inter").as("inter"),
            col("r.n_contained").as("n_contained"))
        directed
          .withColumn("containment",
            floor(col("inter").cast("double") / col("n_contained") * lit(1e6) +
              lit(0.5)) / lit(1e6))
          .filter(col("containment") >= 0.5)
          .select(col("contained"), col("container"), col("inter"),
            col("n_contained"), col("containment"))
          .orderBy(col("contained"), col("container"))
      },
      Some(s"""
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS words FROM documents
          WHERE len(string_split(text, ' ')) >= 8),
        spans AS (
          SELECT DISTINCT doc_id,
                 ${XHash.hash60Sql("array_to_string(words[t.pos:t.pos+7], ' ')")} AS sh
          FROM w, unnest(range(1, len(words) - 7 + 1)) AS t(pos)),
        keep AS (SELECT sh FROM spans GROUP BY sh HAVING count(*) <= 50),
        kept AS (SELECT s.doc_id, s.sh FROM spans s JOIN keep USING (sh)),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY doc_id),
        inter AS (
          SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
          FROM kept x JOIN kept y ON x.sh = y.sh AND x.doc_id < y.doc_id
          GROUP BY x.doc_id, y.doc_id),
        directed AS (
          SELECT i.a AS contained, i.b AS container, i.inter,
                 sa.n_sh AS n_contained
          FROM inter i JOIN sizes sa ON i.a = sa.doc_id
          UNION ALL
          SELECT i.b AS contained, i.a AS container, i.inter,
                 sb.n_sh AS n_contained
          FROM inter i JOIN sizes sb ON i.b = sb.doc_id)
        SELECT contained, container, inter, n_contained,
               floor(CAST(inter AS DOUBLE) / n_contained * 1000000.0 + 0.5)
                 / 1000000.0 AS containment
        FROM directed
        WHERE floor(CAST(inter AS DOUBLE) / n_contained * 1000000.0 + 0.5)
                / 1000000.0 >= 0.5
        ORDER BY contained, container"""))
  )
}
