package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Direct pin on the shared BM25 kernel (r15: q42/q87/q113 all route
  * through `Bm25.scoreTopK` now — the oracle gates cover the two query
  * surfaces, this spec covers the kernel itself against an INDEPENDENT
  * scalar implementation of the same formula, so a refactor of either
  * call site can't silently bend the arithmetic).
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def mkToks(docs: Seq[(String, String)]) =
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))

  /** Scalar BM25 with the kernel's exact discipline: per-term 6dp
    * half-up round, integer lift, THEN the per-doc sum. */
  private def expected(corpus: Seq[(String, String)],
                       qterms: Seq[(Long, String)], k: Int,
                       k1: Double = 1.2, b: Double = 0.75)
      : Set[(Long, String, Long, Long)] = {
    val toks = corpus.map { case (id, t) => id -> TextKernels.tokensLocal(t) }
    val byId = toks.toMap
    val n = toks.size.toDouble
    val avgdl = toks.map(_._2.size).sum / n
    // df counted over docs that contain the term AT LEAST once — and
    // only among query terms, matching the kernel's filtered tf frame
    def df(term: String) = toks.count(_._2.contains(term)).toDouble
    val perQ = qterms.distinct.groupBy(_._1)
    perQ.flatMap { case (qid, qts) =>
      // a (qid, doc) pair is scored iff the doc CONTAINS one of that
      // qid's terms — matching the kernel's tf-frame membership, NOT a
      // nonzero-score test: a matching doc whose per-term scores all
      // round to integer 0 still occupies a rank slot in the kernel and
      // in the q87 oracle (r15 self-review)
      val scored = corpus.map(_._1)
        .filter(id => qts.map(_._2).exists(byId(id).contains))
        .map { id =>
        val sInt = qts.map(_._2).distinct.map { term =>
          val tf = byId(id).count(_ == term).toDouble
          if (tf == 0) 0L
          else {
            val dl = byId(id).size.toDouble
            val idf = math.log((n - df(term) + 0.5) / (df(term) + 0.5) + 1.0)
            val s = idf * (tf * (k1 + 1.0) /
              (tf + k1 * (1.0 - b + b * dl / avgdl)))
            val r = BigDecimal(s)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            math.floor(r * 1e6 + 0.5).toLong
          }
        }.sum
        (id, sInt)
      }
      scored.sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex.map {
        case ((id, s), i) => (qid, id, s, (i + 1).toLong)
      }
    }.toSet
  }

  private val corpus = Seq(
    "d1" -> "apple banana apple",
    "d2" -> "banana cherry",
    "d3" -> "durian apple cherry cherry durian melon",
    "d4" -> "apple apple apple banana cherry melon fig")

  test("scoreTopK matches an independent scalar BM25 (values, ranks, defaults)") {
    val qterms = Seq((0L, "apple"), (0L, "cherry"), (1L, "banana"), (1L, "melon"))
    val got = Bm25.scoreTopK(mkToks(corpus), "doc_id", qterms, 10)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected(corpus, qterms, 10), s"got $got")
  }

  test("scoreTopK honors k and breaks exact ties by doc_id asc") {
    // t1/t2 are byte-identical docs: same tf/dl for every term, so their
    // integer scores tie exactly and rank must fall back to doc_id order
    val tieCorpus = Seq(
      "t1" -> "kiwi lime", "t2" -> "kiwi lime", "t3" -> "kiwi kiwi kiwi lime")
    val qterms = Seq((7L, "kiwi"))
    val got = Bm25.scoreTopK(mkToks(tieCorpus), "doc_id", qterms, 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected(tieCorpus, qterms, 2), s"got $got")
    assert(got.size == 2)
  }

  test("scoreTopK with custom k1/b matches the scalar twin") {
    val qterms = Seq((0L, "apple"), (0L, "banana"))
    val got = Bm25.scoreTopK(mkToks(corpus), "doc_id", qterms, 10,
        k1 = 2.0, b = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected(corpus, qterms, 10, k1 = 2.0, b = 0.5), s"got $got")
  }

  test("scoreTopK on an empty query set returns an empty frame") {
    assert(Bm25.scoreTopK(mkToks(corpus), "doc_id", Seq.empty, 5).count() == 0L)
  }

  test("scoreTopK == scalar twin on seeded random corpora (ties, absent terms, empty docs)") {
    // the oracle gate pins only q87's fixed query set; this sweeps the
    // kernel over corpora the oracle never sees — duplicate docs (exact
    // integer ties), query terms in no document, documents with no
    // query terms, empty documents (dl=0 still counts toward avgdl),
    // duplicated (qid, term) pairs
    val rnd = new scala.util.Random(20260815L)
    val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox", "gnu",
      "hen", "ibis", "jay", "koi", "lark")
    for (case_ <- 1 to 8) {
      val nDocs = 4 + rnd.nextInt(12)
      val base = (0 until nDocs).map { i =>
        val len = rnd.nextInt(18) // 0 => empty doc
        f"r$i%02d" -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      // force at least one nonempty doc (all-empty => avgdl 0/0 = NaN,
      // not a meaningful corpus) and one exact-tie duplicate pair
      val corpus = base ++ Seq(
        "ranchor" -> "ant bee cat",
        "rdup" -> "ant bee cat")
      val qterms = (0 until 1 + rnd.nextInt(3)).flatMap { qid =>
        val terms = Seq.fill(1 + rnd.nextInt(4))(
          if (rnd.nextInt(5) == 0) "zebra" // absent from every doc
          else vocab(rnd.nextInt(vocab.size)))
        (terms ++ terms.take(1)).map(t => (qid.toLong, t)) // dup pair
      }
      val k = 1 + rnd.nextInt(6)
      val got = Bm25.scoreTopK(mkToks(corpus), "doc_id", qterms, k)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == expected(corpus, qterms, k),
        s"case $case_ diverged (docs=$nDocs k=$k qterms=$qterms)")
    }
  }
}
