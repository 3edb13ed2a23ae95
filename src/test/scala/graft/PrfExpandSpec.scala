package graft

/** q146_prf_expand: PRF-expanded BM25. The oracle gate re-derives the
  * whole two-pass pipeline (including the query-term exclusion and the
  * rank-2 expansion pick) in independent SQL at two scales; this spec
  * pins the RELATIONSHIP to the unexpanded q87 ranking that the hash
  * alone can't express: expansion only ADDS non-negative term scores
  * (BM25's idf log argument is always > 1), so every doc's expanded
  * score dominates its base score, and at least one query's ranking
  * actually moves (the expansion is load-bearing, not a no-op).
  */
class PrfExpandSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private def q(name: String) = QueryRegistry.all.find(_.name == name).get

  private lazy val base = q("q87_bm25").fn(spark, sf).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
  private lazy val expanded = q("q146_prf_expand").fn(spark, sf).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("shape: top-5 per query, contiguous ranks") {
    val byQ = expanded.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.values.foreach(rows => assert(rows.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L)))
  }

  test("expanded scores dominate base scores on shared (query, doc) pairs") {
    val baseMap = base.map(r => (r._1, r._3) -> r._4).toMap
    val shared = expanded.flatMap(r => baseMap.get((r._1, r._3)).map(b => (r._4, b)))
    assert(shared.nonEmpty)
    shared.foreach { case (exp, b) =>
      assert(exp >= b, "BM25 term scores are positive: expansion can only add")
    }
  }

  test("the expansion is load-bearing: some ranking or score moves") {
    assert(expanded.map(r => (r._1, r._2, r._3, r._4)).toSet !=
      base.map(r => (r._1, r._2, r._3, r._4)).toSet)
  }
}
