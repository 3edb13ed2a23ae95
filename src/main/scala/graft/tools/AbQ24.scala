package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B harness for q24's sf1 plan stability.
  *
  * Round-10 finding: identical data (fingerprint 471b75b3), identical
  * code, q24 at sf1 measured 21.7 s in the full suite, 43.2 s isolated
  * REPS=2, 67.7 s isolated min-of-3 in a shared-JVM probe — a 3×
  * swing. The suspected mechanism is ReuseExchange fragility: q24's
  * plan leans on byte-identical exchange subtrees so the tokenize+
  * shingle work runs once; when AQE's runtime re-planning diverges the
  * subtrees, each consumer recomputes the corpus shingling. Mode
  * `persist` pins `base` in the block cache instead, which makes the
  * reuse structural rather than plan-canonicalization-dependent.
  *
  * `sbt 'runMain graft.tools.AbQ24 /root/repo/testdata-sf1 persist'`
  */
object AbQ24 {
  private val JacDfCap = 16L // mirrors TextQueries.JacDfCap

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val mode = args.drop(1).headOption.getOrElse("registered")
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .appName("ab-q24").master(s"local[${Runtime.getRuntime.availableProcessors}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tick(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[q24] $name: $dt%.2f s")
      dt
    }

    if (mode == "registered") {
      val fn = graft.TextQueries.defs.find(_.name == "q24_ngram_jaccard").get.fn
      for (rep <- 1 to reps) {
        tick(s"registered rep$rep")(
          fn(spark, dir).write.format("noop").mode("overwrite").save())
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }

    // count variant: with the df-cap enforced, |A∩B| is computable
    // directly — explode shingles, drop df>cap ones, self-join on
    // (blk, shingle) (per-shingle output ≤ cap² = 256 rows), count per
    // (id_a, id_b). No arrays in any shuffle, no prefix index, no
    // array_intersect verify; volume ≤ cap·Σdf, linear by the same
    // bound the gated plan already enforces.
    def countVariant(s: SparkSession): DataFrame = {
      val ex = s.read.parquet(s"$dir/documents.parquet")
        .withColumn("blk", (col("n_chars") / 100).cast("long"))
        .withColumn("toks", graft.functions.TextOps.tokens(col("text")))
        .withColumn("sh0", graft.functions.ShingleHash60(col("toks"), 3))
        .select(col("blk"), col("doc_id"), explode(col("sh0")).as("shingle"))
        .repartition(col("blk"), col("shingle"))
        .persist()
      val kept = ex
        .withColumn("df", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("blk"), col("shingle"))))
        .filter(col("df") <= JacDfCap)
        .select(col("blk"), col("doc_id"), col("shingle"))
        .persist()
      val nsh = kept.groupBy(col("blk"), col("doc_id"))
        .agg(count(lit(1)).as("n_sh"))
      val inter = kept.select(col("blk"), col("shingle"), col("doc_id").as("id_a"))
        .join(kept.select(col("blk"), col("shingle"), col("doc_id").as("id_b")),
          Seq("blk", "shingle"))
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("blk"), col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(nsh.select(col("blk"), col("doc_id").as("id_a"), col("n_sh").as("na")),
          Seq("blk", "id_a"))
        .join(nsh.select(col("blk"), col("doc_id").as("id_b"), col("n_sh").as("nb")),
          Seq("blk", "id_b"))
        .withColumn("jac", round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")), 6))
        .filter(col("jac") >= 0.5)
        .select(col("id_a"), col("id_b"), col("jac"))
        .orderBy(col("id_a"), col("id_b"))
    }
    // legs mode (r12): attribute the registered count-plan's time between
    // (a) the corpus pass that builds+persists `kept` (tokenize, shingle,
    // explode, df-window, filter), (b) the n_sh rollup, (c) the
    // inverted-index self-join + jaccard + sort.
    if (mode == "legs") {
      for (rep <- 1 to reps) {
        val kept = spark.read.parquet(s"$dir/documents.parquet")
          .withColumn("blk", (col("n_chars") / 100).cast("long"))
          .withColumn("toks", graft.functions.TextOps.tokens(col("text")))
          .select(col("blk"), col("doc_id"),
            explode(graft.functions.ShingleHash60(col("toks"), 3)).as("shingle"))
          .repartition(col("blk"), col("shingle"))
          .withColumn("df", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("blk"), col("shingle"))))
          .filter(col("df") <= JacDfCap)
          .select(col("blk"), col("doc_id"), col("shingle"))
          .persist()
        tick(s"legs rep$rep a:kept-build")(kept.count())
        val nsh = kept.groupBy(col("blk"), col("doc_id"))
          .agg(count(lit(1)).as("n_sh")).persist()
        tick(s"legs rep$rep b:nsh")(nsh.count())
        val inter = kept.select(col("blk"), col("shingle"), col("doc_id").as("id_a"))
          .join(kept.select(col("blk"), col("shingle"), col("doc_id").as("id_b")),
            Seq("blk", "shingle"))
          .filter(col("id_a") < col("id_b"))
          .groupBy(col("blk"), col("id_a"), col("id_b"))
          .agg(count(lit(1)).as("inter"))
        tick(s"legs rep$rep c:inter+join") {
          inter
            .join(nsh.select(col("blk"), col("doc_id").as("id_a"), col("n_sh").as("na")),
              Seq("blk", "id_a"))
            .join(nsh.select(col("blk"), col("doc_id").as("id_b"), col("n_sh").as("nb")),
              Seq("blk", "id_b"))
            .withColumn("jac", round(col("inter").cast("double") /
              (col("na") + col("nb") - col("inter")), 6))
            .filter(col("jac") >= 0.5)
            .select(col("id_a"), col("id_b"), col("jac"))
            .orderBy(col("id_a"), col("id_b"))
            .write.format("noop").mode("overwrite").save()
        }
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }

    // noban mode (r12): replace the df-WINDOW (whose WindowExec sorts the
    // full 50M-row exploded frame on (blk, shingle)) with a groupBy over
    // the SAME cached, co-partitioned frame (no sort, no extra exchange)
    // + a broadcast anti-join of the rare banned shingles.
    if (mode == "noban") {
      for (rep <- 1 to reps) {
        val ex = spark.read.parquet(s"$dir/documents.parquet")
          .withColumn("blk", (col("n_chars") / 100).cast("long"))
          .withColumn("toks", graft.functions.TextOps.tokens(col("text")))
          .select(col("blk"), col("doc_id"),
            explode(graft.functions.ShingleHash60(col("toks"), 3)).as("shingle"))
          .repartition(col("blk"), col("shingle"))
          .persist()
        tick(s"noban rep$rep a:ex-build")(ex.count())
        val banned = ex.groupBy(col("blk"), col("shingle"))
          .agg(count(lit(1)).as("df")).filter(col("df") > JacDfCap)
          .select(col("blk"), col("shingle"))
        val kept = ex.join(broadcast(banned), Seq("blk", "shingle"), "left_anti")
        val nsh = kept.groupBy(col("blk"), col("doc_id"))
          .agg(count(lit(1)).as("n_sh")).persist()
        tick(s"noban rep$rep b:nsh")(nsh.count())
        val inter = kept.select(col("blk"), col("shingle"), col("doc_id").as("id_a"))
          .join(kept.select(col("blk"), col("shingle"), col("doc_id").as("id_b")),
            Seq("blk", "shingle"))
          .filter(col("id_a") < col("id_b"))
          .groupBy(col("blk"), col("id_a"), col("id_b"))
          .agg(count(lit(1)).as("inter"))
        tick(s"noban rep$rep c:inter+join") {
          inter
            .join(nsh.select(col("blk"), col("doc_id").as("id_a"), col("n_sh").as("na")),
              Seq("blk", "id_a"))
            .join(nsh.select(col("blk"), col("doc_id").as("id_b"), col("n_sh").as("nb")),
              Seq("blk", "id_b"))
            .withColumn("jac", round(col("inter").cast("double") /
              (col("na") + col("nb") - col("inter")), 6))
            .filter(col("jac") >= 0.5)
            .select(col("id_a"), col("id_b"), col("jac"))
            .orderBy(col("id_a"), col("id_b"))
            .write.format("noop").mode("overwrite").save()
        }
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }

    // df2 mode (r15, verdict #6): identical to the registered plan except
    // the SELF-JOIN sides drop df==1 shingles. A shingle seen in one doc
    // can only produce self-pairs, which id_a<id_b discards — so the
    // filter can't change output — but the join still ships, sorts, and
    // probes those rows. nsh must keep them (they count toward the
    // union size), so the filter applies ONLY to the join inputs. On a
    // natural corpus unique shingles are the overwhelming majority
    // (Zipf); the 97-token synthetic vocabulary is the worst case for
    // this variant (almost every shingle repeats).
    if (mode == "df2") {
      for (rep <- 1 to reps) {
        tick(s"df2 rep$rep") {
          // graft.Par, like the registered plan: at sf1 documents.parquet
          // is a single small file, so without the adaptive spread the
          // heavy tokenize+shingle+explode projection runs on 1-2 scan
          // splits and the variant eats a fake penalty (r15 self-review)
          val kept = graft.Par(spark.read.parquet(s"$dir/documents.parquet"))
            .withColumn("blk", (col("n_chars") / 100).cast("long"))
            .withColumn("toks", graft.functions.TextOps.tokens(col("text")))
            .select(col("blk"), col("doc_id"),
              explode(graft.functions.ShingleHash60(col("toks"), 3)).as("shingle"))
            .repartition(col("blk"), col("shingle"))
            .withColumn("df", count(lit(1)).over(
              org.apache.spark.sql.expressions.Window
                .partitionBy(col("blk"), col("shingle"))))
            .filter(col("df") <= JacDfCap)
            .select(col("blk"), col("doc_id"), col("shingle"), col("df"))
            .persist()
          val nsh = kept.groupBy(col("blk"), col("doc_id"))
            .agg(count(lit(1)).as("n_sh"))
          val joinable = kept.filter(col("df") >= 2)
            .select(col("blk"), col("doc_id"), col("shingle"))
          val inter = joinable.select(col("blk"), col("shingle"), col("doc_id").as("id_a"))
            .join(joinable.select(col("blk"), col("shingle"), col("doc_id").as("id_b")),
              Seq("blk", "shingle"))
            .filter(col("id_a") < col("id_b"))
            .groupBy(col("blk"), col("id_a"), col("id_b"))
            .agg(count(lit(1)).as("inter"))
          inter
            .join(nsh.select(col("blk"), col("doc_id").as("id_a"), col("n_sh").as("na")),
              Seq("blk", "id_a"))
            .join(nsh.select(col("blk"), col("doc_id").as("id_b"), col("n_sh").as("nb")),
              Seq("blk", "id_b"))
            .withColumn("jac", round(col("inter").cast("double") /
              (col("na") + col("nb") - col("inter")), 6))
            .filter(col("jac") >= 0.5)
            .select(col("id_a"), col("id_b"), col("jac"))
            .orderBy(col("id_a"), col("id_b"))
            .write.format("noop").mode("overwrite").save()
        }
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }

    // pairs mode (r15, verdict #6): replace the (blk, shingle) self-join
    // with the banded-Hamming pair idiom — group each shingle's doc list
    // once (the frame is already partitioned on (blk, shingle), so the
    // groupBy is exchange-free), drop singleton lists, and emit the
    // C(n,2) ordered pairs directly from the sorted list. Same pair
    // multiset as the join (ids are unique per (blk, shingle)), but no
    // second sort-merge machinery and HALF the pre-agg rows (i<j emitted,
    // not filtered).
    if (mode == "pairs") {
      for (rep <- 1 to reps) {
        tick(s"pairs rep$rep") {
          // graft.Par — same scan spread as the registered plan (see df2)
          val kept = graft.Par(spark.read.parquet(s"$dir/documents.parquet"))
            .withColumn("blk", (col("n_chars") / 100).cast("long"))
            .withColumn("toks", graft.functions.TextOps.tokens(col("text")))
            .select(col("blk"), col("doc_id"),
              explode(graft.functions.ShingleHash60(col("toks"), 3)).as("shingle"))
            .repartition(col("blk"), col("shingle"))
            .withColumn("df", count(lit(1)).over(
              org.apache.spark.sql.expressions.Window
                .partitionBy(col("blk"), col("shingle"))))
            .filter(col("df") <= JacDfCap)
            .select(col("blk"), col("doc_id"), col("shingle"))
            .persist()
          val nsh = kept.groupBy(col("blk"), col("doc_id"))
            .agg(count(lit(1)).as("n_sh"))
          val byShingle = kept.groupBy(col("blk"), col("shingle"))
            .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
            .filter(size(col("ids")) >= 2)
          val inter = byShingle
            .select(col("blk"),
              explode(flatten(transform(col("ids"), (x, i) =>
                transform(slice(col("ids"), i + lit(2),
                  size(col("ids"))), y =>
                  struct(x.as("id_a"), y.as("id_b")))))).as("p"))
            .select(col("blk"), col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
            .groupBy(col("blk"), col("id_a"), col("id_b"))
            .agg(count(lit(1)).as("inter"))
          inter
            .join(nsh.select(col("blk"), col("doc_id").as("id_a"), col("n_sh").as("na")),
              Seq("blk", "id_a"))
            .join(nsh.select(col("blk"), col("doc_id").as("id_b"), col("n_sh").as("nb")),
              Seq("blk", "id_b"))
            .withColumn("jac", round(col("inter").cast("double") /
              (col("na") + col("nb") - col("inter")), 6))
            .filter(col("jac") >= 0.5)
            .select(col("id_a"), col("id_b"), col("jac"))
            .orderBy(col("id_a"), col("id_b"))
            .write.format("noop").mode("overwrite").save()
        }
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }

    if (mode == "count") {
      for (rep <- 1 to reps) {
        tick(s"count rep$rep") {
          countVariant(spark).write.format("noop").mode("overwrite").save()
        }
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }

    // persist-base variant: same semantics, base cached instead of
    // exchange-reused
    def persistVariant(s: SparkSession): DataFrame = {
      val t = 0.5
      val base = s.read.parquet(s"$dir/documents.parquet")
        .withColumn("blk", (col("n_chars") / 100).cast("long"))
        .withColumn("toks", graft.functions.TextOps.tokens(col("text")))
        .withColumn("sh0", graft.functions.ShingleHash60(col("toks"), 3))
        .filter(size(col("sh0")) > 0)
        .select(col("blk"), col("doc_id"), col("sh0"))
        .repartition(col("blk"), col("doc_id"))
        .persist()
      val banned = base
        .select(col("blk"), explode(col("sh0")).as("shingle"))
        .groupBy(col("blk"), col("shingle")).agg(count(lit(1)).as("df"))
        .filter(col("df") > JacDfCap)
        .groupBy(col("blk")).agg(collect_set(col("shingle")).as("banned"))
        .localCheckpoint()
      val d = base
        .join(broadcast(banned), Seq("blk"), "left")
        .withColumn("shc", when(col("banned").isNull, col("sh0"))
          .otherwise(array_except(col("sh0"), col("banned"))))
        .filter(size(col("shc")) > 0)
        .select(col("blk"), col("doc_id"),
          sort_array(col("shc")).as("sh"), size(col("shc")).as("n_sh"))
      val prefix = d.select(col("blk"), col("doc_id"),
        explode(slice(col("sh"), lit(1),
          (col("n_sh") - ceil(col("n_sh") * t) + 1).cast("int"))).as("shingle"))
      val cand = prefix.select(col("blk"), col("shingle"), col("doc_id").as("id_a"))
        .join(prefix.select(col("blk"), col("shingle"), col("doc_id").as("id_b")),
          Seq("blk", "shingle"))
        .filter(col("id_a") < col("id_b"))
        .select(col("blk"), col("id_a"), col("id_b")).distinct()
      cand
        .join(d.select(col("blk"), col("doc_id").as("id_a"),
          col("sh").as("sh_a"), col("n_sh").as("na")).hint("shuffle_merge"),
          Seq("blk", "id_a"))
        .join(d.select(col("blk"), col("doc_id").as("id_b"),
          col("sh").as("sh_b"), col("n_sh").as("nb")).hint("shuffle_merge"),
          Seq("blk", "id_b"))
        .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
        .withColumn("jac", round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")), 6))
        .filter(col("jac") >= 0.5)
        .select(col("id_a"), col("id_b"), col("jac"))
        .orderBy(col("id_a"), col("id_b"))
    }
    for (rep <- 1 to reps) {
      tick(s"persist rep$rep")(
        persistVariant(spark).write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
