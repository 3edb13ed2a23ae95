package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}

/** r18 verdict #3: hot-key skew stress for the hash-keyed audit queries.
  *
  * q149/q152/q153 aggregate per segment/gram/prefix hash. At 100 TB a
  * corpus-scale boilerplate segment (a cookie banner in 10⁹ docs) or a
  * shared prompt prefix is ONE key carrying a large slice of the corpus —
  * the q68_skew_join discipline applied to the audit family.
  *
  * The r19 DIAGNOSIS this spec forced (SCALE.md#round-19-skew-audit):
  * the r18 shapes joined the full instance table back to the hash-keyed
  * rollup, and AQE's OptimizeSkewedJoin CANNOT split that join — the
  * rule only matches a join whose children are bare Sort+ShuffleStage,
  * while the co-partitioned rollup side reads its shuffle through the
  * final HashAggregate (a minimal two-table skew join under identical
  * confs DOES get `skew=true`; the audit joins never did, with the hot
  * partition measured at 7.4× the median). So the queries were rewritten
  * aggregation-BEFORE-join: the instance table collapses map-side to
  * (hash, source)/(owner) granularity before any join exchange, making
  * the plans skew-immune BY CONSTRUCTION instead of relying on a
  * runtime rescue that provably never fires for this shape.
  *
  * This spec constructs the hot corpus — half the docs share one
  * 32-token prefix / three 12-token segments / 32 5-gram shingles — and
  * pins two things under broadcast-disabled (at real scale the rollup
  * outgrows the broadcast ceiling) AQE execution:
  *   1. CORRECTNESS under skew: every rollup figure matches the
  *      by-construction arithmetic (no row loss, no double count);
  *   2. the MECHANISM: no materialized shuffle stage carries a hot
  *      partition (max ≤ 4× median above a 16 KB noise floor) — the
  *      hot key never crosses an exchange un-collapsed.
  */
class SkewAuditSpec extends SparkSpec {
  import spark.implicits._

  private val HotDocs = 2000
  private val ColdDocs = 2000

  /** 50% of docs share the first 36 tokens (= one 32-token prefix for
    * q153, three complete 12-token segments for q149, 32 interior
    * 5-gram shingles for q152); every doc then carries a 12-token
    * unique tail, so every doc has 48 tokens and cold docs share
    * nothing. Sources split by parity to exercise per-source
    * attribution under the shared key. */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-skew-").toFile
    d.deleteOnExit()
    val hot = (0 until 36).map(i => s"hot$i").mkString(" ")
    val rows = (0L until (HotDocs + ColdDocs).toLong).map { id =>
      val text =
        if (id < HotDocs) s"$hot " + (0 until 12).map(i => s"d${id}t$i").mkString(" ")
        else (0 until 48).map(i => s"d${id}t$i").mkString(" ")
      (id, text, "en", s"s${id % 2}", text.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  private def withConfs(confs: (String, String)*)(body: => Unit): Unit = {
    val prev = confs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption.flatMap(Option(_)) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Broadcast off (the 100 TB rollup side outgrows the ceiling — the
    * join exchanges must actually exist for the balance check to mean
    * anything) and enough reduce partitions that a hot key would stand
    * out against the median. */
  private def underSkewConfs(body: => Unit): Unit = withConfs(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.shuffle.partitions" -> "16")(body)

  private def shuffleStages(p: SparkPlan): Seq[ShuffleQueryStageExec] = p match {
    case s: ShuffleQueryStageExec => Seq(s) ++ shuffleStages(s.plan)
    case q: QueryStageExec        => shuffleStages(q.plan)
    case o                        => o.children.flatMap(shuffleStages)
  }

  /** The execution whose stages carry the query's real shuffles: the
    * persist-discipline queries (q149/q152) return localCheckpoint'ed
    * frames whose own plan is an opaque RDD scan — their inner execution
    * is recorded via PlanProbe at the materialization site. Lazy queries
    * (q153) fall back to the returned frame's execution, forced by the
    * caller's collect(). */
  private def innerExecution(name: String, df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.execution.QueryExecution =
    PlanProbe.getExecution(name).getOrElse(df.queryExecution)

  private def probed[A](body: => A): A = {
    PlanProbe.setEnabled(true)
    try body finally PlanProbe.setEnabled(false)
  }

  /** No materialized shuffle stage may hold a partition both > 16 KB
    * (noise floor: balanced stages at this scale sit well under it per
    * partition spread) and > 4× its stage's median — the r18 q153 shape
    * measured 18440 B against a 2496 B median (7.4×) on exactly this
    * corpus, so the bound discriminates the fixed shape from the old. */
  private def assertBalancedShuffles(qe: org.apache.spark.sql.execution.QueryExecution,
                                     q: String): Unit = {
    val adaptive = qe.executedPlan.asInstanceOf[AdaptiveSparkPlanExec]
    val stats = shuffleStages(adaptive.executedPlan).flatMap(s => s.mapStats.map(s.id -> _))
    assert(stats.nonEmpty, s"$q: no materialized shuffle stages found")
    stats.foreach { case (id, ms) =>
      val sizes = ms.bytesByPartitionId
      val median = sizes.sorted.apply(sizes.length / 2)
      val hot = sizes.max
      assert(hot <= math.max(4L * median, 16384L),
        s"$q stage $id: hot partition $hot B vs median $median B — " +
          s"a hot key crossed an exchange un-collapsed (sizes: ${sizes.sorted.reverse.take(5).mkString(",")})")
    }
  }

  test("q153_prefix_cache: hot prefix (50% of docs on one key) — exact rollup + balanced exchanges") {
    underSkewConfs { probed {
      val df = SparkEntry.queries("q153_prefix_cache")(spark, dir)
      val bySrc = df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      // per source: 1000 hot (ONE shared group of 2000) + 1000 cold
      // eligible; group min is doc 0 (source s0) → s0 saves 999·32,
      // s1 saves 1000·32
      assert(bySrc("s0") === ((2000L, 1000L, 999L * 32)))
      assert(bySrc("s1") === ((2000L, 1000L, 1000L * 32)))
      assertBalancedShuffles(innerExecution("q153_prefix_cache", df), "q153")
    } }
  }

  test("q149_boilerplate: hot segment (3 shared 12-token windows × 2000 docs) — exact rollup + balanced exchanges") {
    underSkewConfs { probed {
      val df = SparkEntry.queries("q149_boilerplate")(spark, dir)
      val bySrc = df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      // 48 tokens → 4 segments/doc; hot docs: first 3 windows shared by
      // 2000 docs (nd=2000 ≥ 3 → boilerplate), 4th window unique; cold
      // docs: all unique → per source 2000 docs · 4 = 8000 segments,
      // 1000 hot docs · 3 = 3000 boilerplate
      assert(bySrc("s0") === ((8000L, 3000L, 0.375)))
      assert(bySrc("s1") === ((8000L, 3000L, 0.375)))
      assertBalancedShuffles(innerExecution("q149_boilerplate", df), "q149")
    } }
  }

  test("q152_ngram_novelty: hot grams (32 shared 5-grams × 2000 docs) — exact rollup + balanced exchanges") {
    underSkewConfs { probed {
      val df = SparkEntry.queries("q152_ngram_novelty")(spark, dir)
      val rows = df.collect()
      assert(rows.length === HotDocs + ColdDocs)
      val byDoc = rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // every doc: 48 distinct tokens → 44 distinct 5-grams; grams fully
      // inside the hot region (start ≤ 31) are owned by doc 0 — doc 0 is
      // all-novel, hot docs 1..1999 keep only the 12 tail-crossing grams,
      // cold docs are all-novel
      assert(byDoc(0L) === ((44L, 44L)))
      (1L until HotDocs.toLong).foreach(id => assert(byDoc(id) === ((44L, 12L)),
        s"doc $id: expected 12/44 novel grams"))
      (HotDocs.toLong until (HotDocs + ColdDocs).toLong)
        .foreach(id => assert(byDoc(id) === ((44L, 44L))))
      assertBalancedShuffles(innerExecution("q152_ngram_novelty", df), "q152")
    } }
  }

  test("q155_ngram_decontam: hot benchmark 13-gram (24 grams shared by 2000 docs) — exact rollup + balanced exchanges") {
    underSkewConfs { probed {
      val df = SparkEntry.queries("q155_ngram_decontam")(spark, dir)
      val bySrc = df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
      // 48 tokens → 36 13-grams/doc; hot docs share the 24 grams fully
      // inside the 36-token hot region. Holdout = doc_id % 10 = 7 (all
      // odd → source s1): its hot members put those 24 grams in the
      // benchmark set, so EVERY checked hot doc collides on all 24.
      // s0 (even ids, none held out): 1000 hot + 1000 cold checked;
      // s1 (odd ids minus the 200-held-out per half): 800 + 800.
      assert(bySrc("s0") === ((2000L, 2000L * 36, 1000L, 1000L * 24, 0.5)))
      assert(bySrc("s1") === ((1600L, 1600L * 36, 800L, 800L * 24, 0.5)))
      assertBalancedShuffles(innerExecution("q155_ngram_decontam", df), "q155")
    } }
  }

  // ── q157 composite (r20 verdict #3): the full funnel under a
  // constructed hot corpus — a 900-member exact-dup family (>80% of the
  // in-funnel docs sharing ONE fingerprint and identical LSH signatures),
  // plus an engineered near-dup twin pair and two contaminated docs so
  // the later stages still drop someone. 1200 docs, holdout = %10==7;
  // family ids 0..999 (≢7), text identical and quality-passing; doc 7
  // seeds the benchmark 13-gram carried by docs 1002/1012. ──
  private lazy val dagDir: String = {
    val d = Files.createTempDirectory("graft-skew-dag-").toFile
    d.deleteOnExit()
    val suffix = "the of and a"
    def uniq(tag: String, n: Int) = (0 until n).map(i => s"${tag}w$i").mkString(" ")
    val runR = (0 until 13).map(i => s"hr$i").mkString(" ")
    val dupText = uniq("dup", 36) + " " + suffix
    val twinBase = uniq("tw", 36) + " " + suffix
    def text(id: Long): String =
      if (id % 10 == 7) {
        if (id == 7L) runR + " " + uniq("h7", 23) + " " + suffix
        else uniq(s"h$id", 36) + " " + suffix
      } else if (id < 1000) dupText
      else id match {
        case 1001L => twinBase
        case 1011L => twinBase.replaceFirst(" ", ", ") // same tokens, new fp
        case 1002L | 1012L => runR + " " + uniq(s"c$id", 23) + " " + suffix
        case _ => uniq(s"d$id", 36) + " " + suffix
      }
    val rows = (0L until 1200L).map { id =>
      val t = text(id); (id, t, "en", s"s${id % 2}", t.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  /** Driver-side twin of XHash.hash60 (the shared md5-prefix primitive). */
  private def hash60(s: String): Long = graft.functions.XHash.md5Prefix60(
    graft.functions.XHash.Md5.get.digest(s.getBytes("UTF-8")))

  test("q157_curation_dag composite: 900-member exact-dup family — exact funnel, fingerprint-scaled LSH candidates, balanced exchanges") {
    underSkewConfs { probed {
      val df = SparkEntry.queries("q157_curation_dag")(spark, dagDir)
      val out = df.collect()
        .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
      // every in-funnel doc is 40 tokens; 1200 − 120 holdout = 1080
      assert(out("ingest") === ((1080L, 1080L * 40)))
      assert(out("quality") === ((1080L, 1080L * 40)))
      // the family collapses to ONE canonical (doc 0)
      assert(out("exact_dedup") === ((181L, 181L * 40)))
      // the only surviving near-dup edge is the engineered twin pair
      assert(out("near_dedup") === ((180L, 180L * 40)))
      // exactly the two runR carriers collide with holdout doc 7
      assert(out("decontam") === ((178L, 178L * 40)))
      // quota/split recomputed driver-side from the survivor set
      val s5 = (Set(0L) ++ (1000L until 1200L).filter(_ % 10 != 7).toSet
        -- Set(1011L, 1002L, 1012L))
      assert(s5.size === 178)
      val ns = s5.groupBy(_ % 2).view.mapValues(_.size.toLong).toMap
      val cap = 89L // ceil(178 / 2 sources)
      val s6 = s5.filter(id =>
        (hash60(s"mix:$id") % 1000000L) * ns(id % 2) < cap * 1000000L)
      assert(out("quota")._1 === s6.size.toLong)
      val s7 = s6.filter(id => hash60(s"split:$id") % 20 != 0)
      assert(out("split_train")._1 === s7.size.toLong)
      assert(out("split_val")._1 === (s6.size - s7.size).toLong)

      // r20 verdict #2 mechanism: LSH candidate volume scales with
      // DISTINCT fingerprints, not docs. Banded over the 181 canonical
      // survivors, every join in the edge derivation emits a handful of
      // rows; banded over all docs (the pre-r21 shape), the dropped
      // family alone yields ~4 × C(900,2) ≈ 1.6M band-join rows.
      val edgesQe = PlanProbe.getExecution("q157_curation_dag#edges")
        .getOrElse(fail("q157 must probe its edge materialization"))
      val joinRows = PlanWalk.all(edgesQe.executedPlan).collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
          j.metrics("numOutputRows").value
      }
      assert(joinRows.nonEmpty, "the band/verify joins must exist")
      assert(joinRows.forall(_ <= 1000L),
        s"a join in the LSH edge derivation emitted family-quadratic rows " +
          s"(${joinRows.mkString(",")}) — banding must see canonical survivors only")

      // balance: every materialized exchange of every probed execution
      // (funnel rollup, flag frame, edge derivation) — the (fp, doc_id)
      // pair-keyed canon join keeps the 900-row family off any single
      // partition (fp alone was ONE hot key)
      val tree = PlanProbe.getExecutionTree("q157_curation_dag")
      assert(tree.size >= 3, s"expected main+#flags+#edges probes, got ${tree.size}")
      tree.foreach(assertBalancedShuffles(_, "q157"))
    } }
  }

  test("q156_source_overlap: hot gram shared by ALL sources and 2000 docs — exact matrix + balanced exchanges") {
    underSkewConfs { probed {
      val df = SparkEntry.queries("q156_source_overlap")(spark, dir)
      val rows = df.collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      // 48 tokens → 44 distinct 5-grams/doc; the 32 grams fully inside
      // the hot region appear in BOTH sources (hot docs split by
      // parity) — the maximal per-key fan-out for the h-keyed self-join
      // (|sources| rows). Tail/boundary grams are per-doc unique:
      // per source 1000·12 hot-unique + 1000·44 cold-unique + 32 shared.
      val na = 32L + 1000L * 12 + 1000L * 44
      val frac = BigDecimal(32.0 / na)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rows.toSeq === Seq(("s0", "s1", 32L, frac)))
      assertBalancedShuffles(innerExecution("q156_source_overlap", df), "q156")
    } }
  }
}
