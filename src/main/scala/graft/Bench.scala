package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Contention canary: a fixed-size in-memory aggregation — no IO, no
    * data dependence, constant work — timed before and after the suite.
    * The two numbers measure the BOX, not the engine: on an idle machine
    * they agree within noise, so canary_after/canary_before ≳ 1.3 means
    * an external load grew underneath the run and the suite's timings
    * carry contention drift (the r3/r4 phantom-regression signature,
    * SCALE.md:75-115). Min-of-2 so a single scheduler hiccup doesn't
    * false-flag; one untimed warmup so codegen/JIT isn't billed to it. */
  private def canary(spark: SparkSession): Double = {
    def run(): Double = {
      val t0 = System.nanoTime()
      // bit_xor, not sum: a 20M-term long sum overflows under ANSI
      spark.range(0L, 20000000L, 1L, 32)
        .selectExpr("bit_xor(id * 2654435761) AS s").collect()
      (System.nanoTime() - t0) / 1e9
    }
    math.min(run(), run())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to every core: an unset env must not quietly run local[4]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // same TZ pin as Verify: timestamp-literal filters and window
      // buckets must select the SAME rows the correctness gate verified,
      // regardless of the host's default zone (r11 review)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions) // KernelRewrite active in the bench
    val spark = GraftSession.applyExtraConf(builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SchemaGuard.check(spark, sfDir) // fail at the seam, not mid-query
    // warm the JVM/codegen/scan paths so the first measured query doesn't
    // absorb session startup (observed ~6s on whichever query ran first)
    try spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).count()
    catch { case _: Throwable => () }
    // SPARK_GRAFT_ONLY=q19,q31 narrows to matching queries;
    // SPARK_GRAFT_SWEEPS runs the whole selected suite that many times
    // and reports each query's minimum ACROSS sweeps;
    // SPARK_GRAFT_REPS additionally repeats each query back-to-back
    // within a sweep (minimum over all sweep×rep executions).
    // Default sweeps=2 AND reps=2 — the discipline the committed
    // artifacts use, and both knobs are load-bearing:
    //  * reps=2 (back-to-back): the second rep runs codegen-warm — the
    //    first execution of a plan carries its whole-stage codegen
    //    compile + JIT warmup (3-10 s swings on sub-second queries), and
    //    with ~131 queries the codegen cache is long evicted by the time
    //    the NEXT sweep returns, so only a back-to-back rep ever
    //    measures warm steady state (r11 measured: sweeps=2×reps=1 read
    //    a uniform 1.4× over the committed artifact — min-of-two-cold
    //    executions, 163.9 s vs 103.5 s on identical data).
    //  * sweeps=2 (cross-suite): back-to-back reps share whatever
    //    transient contention covers that suite position — r10's driver
    //    artifact read q97 5.09 s where isolated REPS=3 read 1.32 s on
    //    the same data, BOTH in-suite reps inflated. The cross-sweep min
    //    decorrelates the samples.
    // Steady state is the regime that matters at 100 TB, where per-stage
    // compile amortizes over thousands of tasks. Both counts are
    // emitted in the JSON.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val sweeps = sys.env.getOrElse("SPARK_GRAFT_SWEEPS", "2").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val selected = SparkEntry.benchQueries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    canary(spark); canary(spark) // untimed warmups (codegen + JIT settle)
    // Drift instrumentation (r14 verdict #2: a driver re-run read +25%
    // vs same-tree builder runs, with only the before/after canary pair
    // as the tell): a canary BETWEEN sweeps plus per-sweep totals make a
    // box-drift multiplier visible INSIDE the artifact — a real
    // regression moves specific queries in both sweeps; drift moves one
    // sweep's total and its flanking canaries together while the
    // per-query min (which `queries` already reports) shrugs it off.
    val canaries = scala.collection.mutable.ArrayBuffer(canary(spark))
    val sweepTotals = scala.collection.mutable.ArrayBuffer.empty[Double]
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to sweeps) {
      var sweepSum = 0.0
      selected.foreach { case (name, fn) =>
        val times = (1 to reps).flatMap { _ =>
          val t0 = System.nanoTime()
          // noop sink forces every output column to be computed; a count()
          // would let column pruning skip the projections being measured
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            Some((System.nanoTime() - t0) / 1e9)
          } catch { case e: Throwable =>
            // a failed rep must NOT contribute its (fast) elapsed time —
            // a query that breaks would otherwise look like a speedup
            System.err.println(s"[bench] $name: ${e.getMessage}")
            None
          }
        }
        // queries that persist() intermediates (PageRank supersteps, model
        // tables) would otherwise accrete cached blocks ACROSS queries —
        // ~90 queries in, storage pressure taxes whichever query runs next
        // (measured: q91 1.2s isolated, 7.8s late in a polluted suite).
        // Clearing between queries keeps every measurement self-contained;
        // within-query reps still re-persist their own frames.
        spark.catalog.clearCache()
        times.minOption.foreach { t =>
          sweepSum += t
          if (!best.get(name).exists(_ <= t)) best(name) = t
        }
      }
      sweepTotals += sweepSum
      canaries += canary(spark)
    }
    // all-executions-failed → an unmissable sentinel in the profile
    val results = selected.map { case (name, _) =>
      name -> best.getOrElse(name, 9999.0) }
    val canaryBefore = canaries.head
    val canaryAfter = canaries.last
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // Fingerprint of the input directory (name:size per parquet) so a
    // scale artifact (BENCH_sf1.json) records WHICH generated data it
    // measured — sf1 is locally generated, not driver-shipped, and a
    // regenerated directory must not be diffable against stale numbers.
    val fingerprint = try {
      val sb = new StringBuilder
      val sorted = new java.util.ArrayList[java.nio.file.Path]()
      // Files.list holds a directory fd until the STREAM is closed —
      // drain it inside Using so the handle never outlives the listing
      scala.util.Using.resource(java.nio.file.Files.list(java.nio.file.Paths.get(sfDir))) {
        files => files.iterator().forEachRemaining(p => sorted.add(p))
      }
      sorted.sort((a, b) => a.getFileName.toString.compareTo(b.getFileName.toString))
      sorted.forEach(p =>
        sb.append(p.getFileName).append(':').append(java.nio.file.Files.size(p)).append(';'))
      java.security.MessageDigest.getInstance("MD5").digest(sb.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
    } catch { case _: Throwable => "unknown" }
    val canariesJson = canaries.mkString("[", ",", "]")
    val sweepTotalsJson = sweepTotals.mkString("[", ",", "]")
    // gate queries this artifact deliberately does NOT time, with the
    // declared reason — 132-of-133 was previously explained only in
    // prose (r15 verdict #5). A SPARK_GRAFT_ONLY-narrowed run leaves
    // ~all gate queries untimed for a DIFFERENT reason, so it gets a
    // marker entry instead of a false "only q43" self-description
    // (r16 self-review; narrowed runs never write the artifact file,
    // this keeps their stdout line honest too)
    val excludedJson = (only.map(o =>
        "\"<narrowed run: SPARK_GRAFT_ONLY=" + o.mkString(",")
          // env content is caller-controlled — escape it like the
          // benchExclude reasons below or a quote/backslash in the
          // selector breaks the whole stdout JSON line (r16 advice)
          .replace("\\", "\\\\").replace("\"", "\\\"") +
          "; unselected gate queries are untimed>\"").toSeq ++
      QueryRegistry.all
        .collect { case d if d.benchExclude.isDefined =>
          "\"" + d.name + ": " + d.benchExclude.get.replace("\\", "\\\\")
            .replace("\"", "\\\"") + "\"" })
      .mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","sweeps":$sweeps,"reps":$reps,"canary_before":$canaryBefore,"canary_after":$canaryAfter,"canaries":$canariesJson,"sweep_totals":$sweepTotalsJson,"excluded":$excludedJson,"data_fingerprint":"$fingerprint","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // The driver keeps only the stdout TAIL of this process, and with ~115
    // queries the sorted timing dict truncates mid-line (BENCH_r06.json lost
    // q100-q114, "parsed: null"). Persist the full line as a repo artifact so
    // the record of every benched query survives regardless of truncation.
    // Default output is anchored to the repo root (the directory holding
    // build.sbt, found by walking up from this class's code location) —
    // NOT the process CWD, which spark-submit from another dir would make
    // land outside the repo and defeat the truncation-recovery purpose.
    // Path discovery must not be able to crash a completed bench:
    // getCodeSource can legitimately return null (bootstrap/shaded/jar
    // classloaders), so the whole computation lives inside the same
    // try as the write and degrades to CWD on any failure.
    // sf1 runs are locally generated scale sweeps, not driver rounds —
    // they land in their own artifact so round-over-round scale
    // regressions diff mechanically instead of from prose
    val artifact =
      if (sfDir.replace("/", "").endsWith("sf1")) "BENCH_sf1.json" else "BENCH_full.json"
    // narrowed profiling runs (SPARK_GRAFT_ONLY) must not truncate the
    // committed full-suite artifact — the file exists to be the durable
    // record of EVERY benched query (r11 review; this also retires the
    // git-checkout-after-profiling ritual)
    try if (only.isEmpty) {
      val benchOut = sys.env.get("SPARK_GRAFT_BENCH_OUT")
        .map(java.nio.file.Paths.get(_))
        .getOrElse {
          Option(classOf[QueryDef].getProtectionDomain.getCodeSource)
            .map(cs => java.nio.file.Paths.get(cs.getLocation.toURI))
            .flatMap(here => Iterator.iterate(here)(_.getParent).takeWhile(_ != null)
              .find(p => java.nio.file.Files.exists(p.resolve("build.sbt")))
              .map(_.resolve(artifact)))
            .getOrElse(java.nio.file.Paths.get(artifact).toAbsolutePath)
        }
      java.nio.file.Files.write(benchOut, (line + "\n").getBytes("UTF-8"))
      ()
    } catch { case e: Throwable => System.err.println(s"[bench] $artifact write failed: ${e.getMessage}") }
    spark.stop()
  }
}
