package graft

import org.apache.spark.sql.functions._

/** Physical-plan assertions: the optimizations the engine claims must be
  * visible in `.explain` output — filter/projection pushdown into the
  * parquet scan, broadcast joins for small dims, TakeOrderedAndProject
  * for top-k, whole-stage codegen around the custom kernels.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    // the persist-discipline queries return localCheckpoint'ed frames
    // (opaque Scan ExistingRDD); PlanProbe hands back the inner plan they
    // actually executed so the pins keep binding on the real shape
    PlanProbe.setEnabled(true)
    try {
      val outer = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      PlanProbe.get(name).map(inner => inner + "\n" + outer).getOrElse(outer)
    } finally PlanProbe.setEnabled(false)
  }

  test("q02: predicate and projection pushed to the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)") || p.contains("GreaterThan(l_quantity"), p.take(2000))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_discount:double>"),
      "scan must read only the 4 projected columns:\n" + p.take(2000))
  }

  test("q03: dimension joins broadcast (no shuffle of the fact side for dims)") {
    val p = plan("q03_segment_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q04: top-k plans as TakeOrderedAndProject, not global sort") {
    val p = plan("q04_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q11: query side broadcast against a single scan of the collection") {
    val p = plan("q11_ann_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("q33: binned range join plans as a hash join, never nested-loop") {
    val p = plan("q33_range_join")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
           p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "binning exists precisely to avoid the nested-loop plan:\n" + p.take(3000))
  }

  test("q44: both dimension arms broadcast; fact side never shuffles for joins") {
    val p = plan("q44_supplier_part")
    assert(p.sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin") >= 3,
      "part, supplier and nation must all broadcast:\n" + p.take(3000))
  }

  test("q19: percentiles plan as window sort, not a percentile hash aggregate") {
    val p = plan("q19_percentiles")
    assert(p.contains("Window"), p.take(2000))
    assert(!p.contains("percentile"),
      "the value-map percentile aggregate should be gone:\n" + p.take(2000))
  }

  test("q32: as-of join is one window pass — no join operator at all") {
    val p = plan("q32_asof_join")
    assert(p.contains("Window"), p.take(2000))
    assert(!p.contains("Join"), "fill-down formulation must not join:\n" + p.take(2000))
  }

  test("q24: intersection counting — no array payload survives into the join/verify stages") {
    val p = plan("q24_ngram_jaccard")
    assert(!p.contains("array_intersect") && !p.contains("sort_array"),
      "the round-8 array verify must stay retired (its array SMJ payload was GC-bimodal at sf1):\n" + p.take(3000))
    assert(p.contains("Window"),
      "the df-cap is a count window over (blk, shingle):\n" + p.take(3000))
    assert(p.contains("InMemoryTableScan"),
      "the capped inverted index is persisted — three consumers must read the cache, not re-shingle:\n" + p.take(3000))
  }

  test("q46: RP-LSH banded self-join is a hash join on (band, value)") {
    val p = plan("q46_rplsh_neardup")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
           p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q100: bounded-heap top-k never plans a Window — ObjectHashAggregate with map-side partial") {
    val p = plan("q100_topk_agg")
    assert(!p.contains("Window"),
      "the TopK aggregator exists precisely to avoid the window sort:\n" + p.take(2000))
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
    assert(p.contains("partial_top_k_pairs"),
      "partial aggregation must run map-side before the exchange:\n" + p.take(2000))
  }

  test("q106: skyline is a two-phase window sweep — no join operator, no quadratic plan") {
    val p = plan("q106_skyline")
    assert(p.contains("Window"), p.take(2000))
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      "the O(n²) dominance anti-join lives in the oracle only:\n" + p.take(3000))
    // phase 1 prunes inside price buckets (hash exchange), phase 2 sweeps
    // survivors on a single partition — both windows must be present
    assert(p.sliding("Window [".length).count(_ == "Window [") >= 2,
      "expected the local-bucket AND global sweep windows:\n" + p.take(3000))
  }

  test("q107: fuzzy join rides a hash equi-join on the deletion variant, never nested-loop") {
    val p = plan("q107_fuzzy_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
           p.contains("ShuffledHashJoin"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "SymSpell blocking exists precisely to avoid the V² plan:\n" + p.take(3000))
    assert(p.contains("levenshtein"),
      "the exact verify must ride the candidate equi-join, not a separate pass:\n" + p.take(3000))
  }

  test("q114: shingle subtree derives once — a single distinct parquet scan behind the cache") {
    val p = plan("q114_containment")
    // the executed-plan string reprints the cached subtree at every
    // InMemoryTableScan, so count DISTINCT scan shapes, not occurrences:
    // pre-fix the plan held two independently-derived scan subtrees
    // (10 scan occurrences); cached there is exactly one
    val scans = p.linesIterator.filter(_.contains("FileScan parquet"))
      .map(l => l.substring(l.indexOf("FileScan")).replaceAll("#\\d+", "")).toSet
    assert(scans.size === 1,
      s"expected one distinct parquet scan shape, got ${scans.size}:\n${scans.mkString("\n")}")
    assert(p.contains("InMemoryTableScan"),
      "spans/kept must be served from cache:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q113: both retrieval legs derive from one cached tokenized scan") {
    val p = plan("q113_hybrid_rrf")
    val scans = p.linesIterator.filter(_.contains("FileScan parquet"))
      .map(l => l.substring(l.indexOf("FileScan")).replaceAll("#\\d+", "")).toSet
    assert(scans.size <= 1,
      s"cosine + BM25 legs must share the persisted tokenized frame, got " +
        s"${scans.size} distinct scan shapes:\n${scans.mkString("\n")}")
    assert(p.contains("InMemoryTableScan"),
      "the tokenized corpus must be served from cache:\n" + p.take(2000))
  }

  test("q123/q125: perceptual dedup Hamming runs on distinct hashes — popcount, no substring loop") {
    Seq("q123_phash_dedup", "q125_audio_fingerprint").foreach { q =>
      val p = plan(q)
      assert(p.contains("bit_count"),
        s"$q: Hamming must be xor+popcount, not per-char compares:\n" + p.take(2000))
      assert(!p.contains("CartesianProduct"), s"$q:\n" + p.take(3000))
      assert(p.contains("InMemoryTableScan"),
        s"$q: hash frames must be served from cache:\n" + p.take(2000))
    }
  }

  test("q126: packing is one corpus pass — single scan shape, range rollup broadcast back") {
    val p = plan("q126_seq_pack")
    // the corpus packs in ONE lazy mapPartitions pass over the parquet
    // scan; the window + join ran EAGERLY over the RANGE-cardinality
    // rollup (corpus/1024 rows, localCheckpointed — it shows as the tiny
    // ExistingRDD side) and the join-back must be the broadcast of that
    // tiny frame, never a corpus-shaped shuffle join
    val scans = p.linesIterator.filter(_.contains("FileScan parquet"))
      .map(l => l.substring(l.indexOf("FileScan")).replaceAll("#\\d+", "")).toSet
    assert(scans.size === 1, s"one distinct scan shape expected:\n${scans.mkString("\n")}")
    assert(p.contains("ExistingRDD"),
      "the range-base rollup must be the eager (checkpointed) side:\n" + p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "the re-base join must broadcast the range bases:\n" + p.take(3000))
  }

  test("q131: phrase matching is broadcast hash joins only — no nested-loop, no per-phrase scan") {
    val p = plan("q131_phrase_search")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "phrase table must equi-join postings:\n" + p.take(3000))
    val scans = p.linesIterator.filter(_.contains("FileScan parquet"))
      .map(l => l.substring(l.indexOf("FileScan")).replaceAll("#\\d+", "")).toSet
    assert(scans.size === 1,
      s"postings derive from one scan of documents:\n${scans.mkString("\n")}")
  }

  test("q01: partial aggregation before the exchange (map-side combine)") {
    val p = plan("q01_pricing_summary")
    val firstHashAgg = p.indexOf("HashAggregate")
    val exchange = p.indexOf("Exchange")
    assert(firstHashAgg >= 0 && exchange >= 0)
    // plan prints top-down: final agg, exchange, partial agg — a partial
    // HashAggregate must appear BELOW (after) the Exchange in the tree
    assert(p.indexOf("HashAggregate", exchange) > exchange,
      "expected partial HashAggregate under the Exchange:\n" + p.take(2000))
  }

  test("q96: the z-value interleave carries no HOF and no pow() — a flat shift/mask sum") {
    val p = plan("q96_zorder")
    assert(!p.contains("aggregate(sequence") && !p.toLowerCase.contains("power("),
      "the unrolled interleave must not reintroduce the per-row HOF/pow form:\n" + p.take(3000))
    assert(p.contains("shiftright"), p.take(3000))
  }

  test("q123/q124/q125/q133: no decode UDF is duplicated into a Filter condition") {
    // InferFiltersFromGenerate / pushed isNotNull filters used to clone
    // the whole encode+decode UDF chain into Filter conditions (3x the
    // codec work per row on q124 — sf1 5.4 -> 1.1 s when fenced). The
    // asNondeterministic planner fence must keep every Filter free of
    // scala UDF calls: the inferred/pushed conditions may reference the
    // PROJECTED column, never re-evaluate the chain.
    for (q <- Seq("q123_phash_dedup", "q124_frame_sample", "q125_audio_fingerprint",
         "q133_mjpeg_frames")) {
      val p = plan(q)
      val offending = p.linesIterator
        .filter(l => l.contains("Condition") || l.trim.startsWith("+- Filter") ||
          l.trim.startsWith(":- Filter"))
        .filter(_.contains("UDF"))
        .toSeq
      assert(offending.isEmpty,
        s"$q: decode UDF leaked into a Filter condition:\n${offending.mkString("\n").take(2000)}")
    }
  }

  test("q99: the dot product is scored vocabulary-first and broadcast back to the incidence list") {
    val p = plan("q99_maxsim")
    assert(p.contains("BroadcastHashJoin"),
      "scored vocab table must broadcast-equi-join the (doc, token) incidence list:\n" + p.take(3000))
    // dot_f32 must sit on the vocab×qtok side, i.e. appear exactly once in
    // the whole plan (the old shape evaluated it per incidence×qtok row
    // downstream of the join)
    assert("dot_f32".r.findAllIn(p).size === 1,
      "dot_f32 must appear EXACTLY once (vocab×qtok side); more than one " +
        "occurrence means the per-incidence shape is back:\n" + p.take(3000))
    val joinIdx = p.indexOf("BroadcastHashJoin")
    assert(p.lastIndexOf("dot_f32") > joinIdx,
      "dot_f32 must be computed below the broadcast join (vocab side), " +
        "not above it (per incidence row):\n" + p.take(3000))
  }

  test("kmeans assignment plans through cell_argmin, never the HOF argmin tree") {
    val p = plan("q67_ivf_kmeans")
    assert(p.contains("cell_argmin"), p.take(3000))
    assert(!p.contains("array_position"),
      "the HOF argmin (transform + array_min + array_position) must be gone:\n" + p.take(3000))
  }

  test("Par is adaptive: a multi-split scan skips the round-robin exchange, a narrow scan keeps it") {
    // verdict-r12 #1: at 100 TB the scan arrives in thousands of splits and
    // the unconditional repartition(defaultParallelism) was a full corpus
    // read-shuffle-write every query. The probe must skip the exchange when
    // the source already supplies >= defaultParallelism partitions, and keep
    // it (bit-identical to the old behavior) for the single-file scans the
    // driver's testdata ships.
    val n = spark.sparkContext.defaultParallelism
    val dir = java.nio.file.Files.createTempDirectory("graft-par").toFile
    try {
      spark.range(4000).toDF("id").repartition(n + 4)
        .write.mode("overwrite").parquet(s"$dir/wide.parquet")
      val wideScan = spark.read.parquet(s"$dir/wide.parquet")
      assume(wideScan.rdd.getNumPartitions >= n,
        "file-packing collapsed the splits; widen the fixture")
      val wide = Par(wideScan)
      val wp = wide.queryExecution.executedPlan.toString
      assert(!wp.contains("RoundRobinPartitioning"),
        "already-parallel scan must NOT pay a repartition exchange:\n" + wp.take(2000))

      spark.range(4000).toDF("id").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/narrow.parquet")
      val narrow = Par(spark.read.parquet(s"$dir/narrow.parquet"))
      val np = narrow.queryExecution.executedPlan.toString
      assert(np.contains("RoundRobinPartitioning"),
        "single-file scan must keep the spread (old behavior):\n" + np.take(2000))
      assert(narrow.rdd.getNumPartitions == n)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dir)
    }
  }

  test("Par never runs a job at call time — aggregate/sort frames skip the probe") {
    // r13-advice #1: the probe used to gate on queryExecution.sparkPlan,
    // which is pre-EnsureRequirements — an orderBy + global aggregate (the
    // q43 chunks shape) carries no Exchange node THERE, so the probe
    // called df.rdd and AQE materialized every upstream stage, executing
    // the query once at Par() time and again when the result ran. The
    // logical-plan gate must classify such frames as non-narrow (no probe,
    // keep the spread) and still probe pure narrow chains joblessly.
    // The listener bus is async, so "no job ran" cannot be asserted off a
    // fixed sleep (a late-delivered event would pass the test silently —
    // r14 review). Instead record each job's GROUP and use FIFO sentinels:
    // a flush sentinel drains any in-flight events from earlier tests,
    // and a closing sentinel proves every probe-era event has been
    // delivered — bus order guarantees a probe job's event would arrive
    // BEFORE the closing sentinel's.
    val groups = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        groups.add(Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
          .getOrElse("<none>")); ()
      }
    }
    def runSentinel(name: String): Unit = {
      spark.sparkContext.setJobGroup(name, name)
      try spark.range(1).count()
      finally spark.sparkContext.clearJobGroup()
      val deadline = System.currentTimeMillis + 60000
      while (!groups.contains(name) && System.currentTimeMillis < deadline)
        Thread.sleep(10)
      assert(groups.contains(name), s"sentinel $name never observed")
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      runSentinel("par-probe-flush")
      groups.clear()
      val agg = spark.range(1000).toDF("id")
        .orderBy(col("id").desc)
        .agg(sum(col("id")).as("s"))
        .select(explode(array(col("s"), col("s"))).as("v"))
      assert(Par.plannedPartitions(agg).isEmpty,
        "aggregate/sort-bearing plan must not be probed")
      val spread = Par(agg)
      assert(spread.queryExecution.executedPlan.toString
        .contains("RoundRobinPartitioning"))

      // narrow chain over an explicit repartition: width reads statically
      // off the plan — Some(n) with zero execution (r13-advice #2)
      val repar = spark.range(1000).toDF("id").repartition(7)
        .filter(col("id") > 10).select((col("id") * 2).as("x"))
      assert(Par.plannedPartitions(repar) === Some(7))
      val reparBy = spark.range(1000).toDF("id").withColumn("k", col("id") % 3)
        .repartition(6, col("k")).filter(col("id") > 10)
      assert(Par.plannedPartitions(reparBy) === Some(6))
      val reparByNoN = spark.range(1000).toDF("id").withColumn("k", col("id") % 3)
        .repartition(col("k")) // width comes from a conf, not the plan → None
      assert(Par.plannedPartitions(reparByNoN).isEmpty)

      // battery over every shuffle-bearing shape the whitelist must
      // reject — a future whitelist edit that lets one through would
      // re-open the AQE double-execution (each would show up as jobs > 0
      // below, and most immediately as a non-None here)
      val base = spark.range(100).toDF("id")
        .withColumn("k", col("id") % 7).withColumn("v", col("id") * 3)
      val shuffleShapes: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
        "groupBy" -> base.groupBy(col("k")).agg(sum(col("v")).as("s")),
        "join" -> base.join(base.withColumnRenamed("v", "v2"), Seq("k")),
        "window" -> base.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("k"))
            .orderBy(col("v")))),
        "sort" -> base.orderBy(col("v")),
        "distinct" -> base.select(col("k")).distinct(),
        "globalLimit-over-sort" -> base.orderBy(col("v")).limit(5),
        "subquery-filter" -> {
          base.createOrReplaceTempView("par_probe_base")
          spark.sql(
            "SELECT id FROM par_probe_base WHERE v > (SELECT avg(v) FROM par_probe_base)")
        }
      )
      shuffleShapes.foreach { case (label, frame) =>
        assert(Par.plannedPartitions(frame).isEmpty,
          s"$label must not be probed (shuffle-bearing)")
      }

      // a persisted-but-unmaterialized cached aggregate is a LeafNode
      // (InMemoryRelation) — probing it would run the cached subtree's
      // stages, so the whitelist must refuse it (r14 review)
      val cached = base.groupBy(col("k")).agg(sum(col("v")).as("s")).persist()
      try assert(Par.plannedPartitions(cached).isEmpty,
        "unmaterialized cached aggregate must not be probed")
      finally { cached.unpersist(); () }

      runSentinel("par-probe-done")
      val stray = scala.jdk.CollectionConverters.IteratorHasAsScala(
        groups.iterator).asScala.toSeq.filterNot(_ == "par-probe-done")
      assert(stray.isEmpty,
        s"plan probing must be driver-side only, but these job(s) ran: $stray")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("q134: shuffle keys are (epoch, shard) — no global-order window, no round-robin of the manifest") {
    val p = plan("q134_epoch_shuffle")
    // the rank window must partition by BOTH epoch and shard — an
    // anchor-only (or empty) partition spec would serialize the corpus
    // through one window partition, the exact naive-shuffled-index shape
    // the query exists to avoid
    assert(p.contains("row_number") &&
      "windowspecdefinition\\(epoch#\\d+L, shard#\\d+L".r.findFirstIn(p).isDefined,
      "rank window must partition by (epoch, shard):\n" + p.take(3000))
  }

  test("q135: both negative legs prune map-side (partial WindowGroupLimit) and anchors broadcast") {
    val p = plan("q135_hard_negatives")
    // two legs × (partial + final) WindowGroupLimit = 4 — the partial
    // ones are what keep the shuffle at O(anchors·k·partitions) instead
    // of anchors×corpus
    val wgl = p.sliding("WindowGroupLimit".length).count(_ == "WindowGroupLimit")
    assert(wgl >= 4, s"expected >=4 WindowGroupLimit nodes (2 legs x partial+final), got $wgl:\n" + p.take(3000))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "anchors must broadcast (label-inequality join):\n" + p.take(3000))
    assert(!p.contains("CartesianProduct"),
      "the different-label join must never plan as CartesianProduct:\n" + p.take(3000))
    // the exclusion must be a broadcast anti-join: un-hinted, the 48-row
    // hard side had no stats and the planner shuffled the full
    // anchors×corpus cand frame through a SortMergeJoin (r16 review).
    // toString spells it "BroadcastHashJoin [keys], [keys], LeftAnti, ..."
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      "hard-pick exclusion must broadcast:\n" + p.take(3000))
    assert(!p.contains("SortMergeJoin"),
      "no leg may shuffle the anchors×corpus cand frame:\n" + p.take(3000))
  }

  test("q136: the per-cluster draw prunes map-side (partial WindowGroupLimit)") {
    val p = plan("q136_cluster_sample")
    val wgl = p.sliding("WindowGroupLimit".length).count(_ == "WindowGroupLimit")
    assert(wgl >= 2, s"expected partial+final WindowGroupLimit, got $wgl:\n" + p.take(3000))
  }

  test("q140: rollup combines map-side; the label attach is a keyed join, never a cross") {
    val p = plan("q140_cluster_split")
    assert(p.contains("partial_count"),
      "the (split, source) rollup must partial-aggregate map-side:\n" + p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the label attach must stay an equi-join on doc_id:\n" + p.take(3000))
  }

  test("q141: majority window keys by doc_id and its rank filter prunes map-side") {
    val p = plan("q141_code_switch")
    assert("windowspecdefinition\\(doc_id#\\d+L".r.findFirstIn(p).isDefined,
      "the majority window must partition by doc_id (never corpus-wide):\n" + p.take(3000))
    val wgl = p.sliding("WindowGroupLimit".length).count(_ == "WindowGroupLimit")
    assert(wgl >= 2, s"rk=1 must prune via partial+final WindowGroupLimit, got $wgl:\n" + p.take(3000))
  }

  test("q142: the resume rows broadcast into the preview filter") {
    val p = plan("q142_resume_manifest")
    assert(p.contains("BroadcastHashJoin"),
      "the <=nShards resume frame must broadcast:\n" + p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q143: per-source moments broadcast back; the quota rank prunes map-side") {
    val p = plan("q143_quality_zquota")
    assert(p.contains("BroadcastHashJoin"),
      "the sources-sized moment table must broadcast:\n" + p.take(3000))
    val wgl = p.sliding("WindowGroupLimit".length).count(_ == "WindowGroupLimit")
    assert(wgl >= 2, s"rnk<=3 must prune via partial+final WindowGroupLimit, got $wgl:\n" + p.take(3000))
  }

  test("q145: the holdout band side broadcasts; the verify joins stay equi-joins") {
    val p = plan("q145_fuzzy_decontam")
    assert(p.contains("BroadcastHashJoin"),
      "the benchmark-side bands must broadcast:\n" + p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
  }

  test("q146: rescore keeps q87's shape — pre-explode InSet filter, broadcast query frame") {
    // construction runs pass 1 + the bounded expansion collect; the
    // executedPlan is the PASS-2 rescore, which must keep the q87 plan
    // discipline: the membership filter sits BELOW the explode so only
    // query-term occurrences ever reach the (doc, term) aggregation
    val p = plan("q146_prf_expand")
    assert(p.contains("explode(filter(toks#"),
      "pre-explode membership filter must gate the token explode:\n" + p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"),
      "stats attach must be a broadcast, never a cartesian:\n" + p.take(3000))
  }

  test("q149: both segment-hash edges stay keyed — no cartesian, map-side partials") {
    val p = plan("q149_boilerplate")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the frequency flag must join on the segment hash:\n" + p.take(3000))
    assert(p.contains("partial_count"),
      "the distinct-doc frequency rollup must partial-aggregate map-side:\n" + p.take(3000))
  }

  test("q150: histogram-first AUC — map-side partials feed the bounded-domain window") {
    val p = plan("q150_classifier_auc")
    assert(p.contains("partial_sum"),
      "the s_micro histogram must partial-aggregate map-side:\n" + p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "nothing in the AUC plan may shuffle pairwise:\n" + p.take(3000))
  }

  test("q151: centroids and moments broadcast; the outlier rank prunes map-side") {
    val p = plan("q151_embed_outliers")
    assert(p.contains("BroadcastHashJoin"),
      "the labels-sized centroid/moment tables must broadcast:\n" + p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      p.take(3000))
    val wgl = p.sliding("WindowGroupLimit".length).count(_ == "WindowGroupLimit")
    assert(wgl >= 2, s"rnk<=3 must prune via partial+final WindowGroupLimit, got $wgl:\n" + p.take(3000))
  }

  test("q152: first-owner MIN combines map-side and NO join is keyed on the gram hash (r19 skew rewrite)") {
    // executions are released when the probe window closes (r20 advice:
    // retained QueryExecutions pin AQE plans + metrics for the JVM's
    // lifetime) — take the reference INSIDE the window; plan strings
    // survive the disable, so `plan()`-style asserts need no window
    PlanProbe.setEnabled(true)
    val (p, qe) = try {
      val outer = SparkEntry.queries("q152_ngram_novelty")(spark, sf)
        .queryExecution.executedPlan.toString
      (PlanProbe.get("q152_ngram_novelty").map(_ + "\n" + outer).getOrElse(outer),
        PlanProbe.getExecution("q152_ngram_novelty")
          .getOrElse(fail("q152 must be probed (localCheckpoint hides the inner plan)")))
    } finally PlanProbe.setEnabled(false)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
    assert(p.contains("partial_min"),
      "first-owner must be a map-side-combinable MIN:\n" + p.take(3000))
    // the r19 rewrite's load-bearing property, pinned on plan OBJECTS
    // (r19 advice: the old `!p.contains("Join [h#")` string pin went
    // vacuously green under any attribute rename): the gram hash is an
    // aggregation key only — every surviving equi-join must key on
    // doc_id attributes, so a rename or a returning gram-keyed join
    // fails LOUDLY here
    val joins = PlanWalk.all(qe.executedPlan).collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.nonEmpty, "the doc-keyed nGrams ⋈ nNovel join must exist")
    joins.foreach { j =>
      val keyNames = (j.leftKeys ++ j.rightKeys).flatMap(_.references.toSeq.map(_.name))
      assert(keyNames.nonEmpty && keyNames.forall(_ == "doc_id"),
        s"every q152 join key must resolve to doc_id, got ${keyNames.mkString(",")} in:\n$j")
    }
  }

  test("q153: prefix grouping stays keyed on the prefix hash — no pair joins, map-side partials") {
    val p = plan("q153_prefix_cache")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the group flag must join on the prefix hash:\n" + p.take(3000))
    assert(p.contains("partial_count") && p.contains("partial_min"),
      "the group rollup (count + min) must partial-aggregate map-side:\n" + p.take(3000))
  }

  test("q155: holdout gram set broadcasts; the corpus collapses via map-side partials before any exchange") {
    val p = plan("q155_ngram_decontam")
    assert(p.contains("BroadcastHashJoin"),
      "the benchmark-sized holdout gram set must broadcast (left join is map-only):\n" + p.take(3000))
    assert(p.contains("partial_count"),
      "the (doc_id, source) rollup must partial-aggregate map-side so the " +
        "exchange carries |docs| rows, never grams:\n" + p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "nothing in the decontam plan may shuffle the gram table into a join:\n" + p.take(3000))
  }

  test("q157: funnel stages broadcast their small sides — holdout grams, source counts, cap; no cartesian") {
    val p = plan("q157_curation_dag")
    assert(p.contains("BroadcastHashJoin"),
      "the sources-sized quota frame must broadcast into the rollup:\n" + p.take(3000))
    assert(!p.contains("CartesianProduct"),
      "the only cross join is the broadcast 1-row cap scalar:\n" + p.take(3000))
    // the flag-frame execution (probed under #flags) carries the stage
    // joins: the holdout gram broadcast and the ONE persisted corpus pass
    val pf = PlanProbe.get("q157_curation_dag#flags")
      .getOrElse(fail("q157 must probe its flag-frame execution"))
    assert(pf.contains("BroadcastHashJoin"),
      "the benchmark-sized holdout gram set must broadcast:\n" + pf.take(3000))
    assert(pf.contains("InMemoryTableScan"),
      "every stage must read the ONE persisted corpus pass:\n" + pf.take(3000))
    assert(!pf.contains("CartesianProduct"), pf.take(3000))
  }

  test("q147: output stays top-k-bounded (the checkpoint hides the inner plan)") {
    // the query localCheckpoints its 20-row result to release the
    // byHalf cache (the q101 discipline), so the returned frame's plan
    // is the checkpoint scan and the inner TakeOrderedAndProject is not
    // observable here — pin what IS: the materialized frame is top-k
    // sized, not vocabulary-sized
    val pre = SparkEntry.queries("q147_vocab_drift")(spark, sf)
    assert(pre.rdd.getNumPartitions <= 4, "20-row frame")
    assert(pre.count() <= 20L)
  }
}
