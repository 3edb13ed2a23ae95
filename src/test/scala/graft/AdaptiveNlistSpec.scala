package graft

/** Pins the adaptive kmeans nlist boundaries (the Q46AdaptiveSpec
  * discipline applied to the trained-kmeans family): the gate scales
  * MUST resolve to the KmK=8 floor — that is what makes the sf0.01 and
  * sf0.1 outputs byte-identical to the fixed-k semantics — and the
  * formula must grow one cell per 250 vectors past the floor so the
  * mean cluster size (and with it q85's intra-cluster pair volume and
  * q12's probed candidate volume) stays bounded as the corpus grows.
  */
class AdaptiveNlistSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("gate scales resolve to the floor: 200 and 2000 vectors -> 8 cells") {
    assert(VectorQueries.kmNlist(200L) === 8)
    assert(VectorQueries.kmNlist(2000L) === 8)
  }

  test("the floor holds exactly to 2249, then grows one cell per 250 vectors") {
    assert(VectorQueries.kmNlist(2249L) === 8)
    assert(VectorQueries.kmNlist(2250L) === 9)
    assert(VectorQueries.kmNlist(20000L) === 80)
    assert(VectorQueries.kmNlist(1000000L) === 4000)
  }

  test("mean cluster size is bounded by 250 + floor slack at every probed n") {
    Seq(500L, 2000L, 5000L, 20000L, 100000L, 10000000L).foreach { n =>
      val k = VectorQueries.kmNlist(n)
      assert(n.toDouble / k <= 281.25, // worst case: n=2249 at the k=8 floor
        s"mean cluster ${n.toDouble / k} too large at n=$n (k=$k)")
    }
  }
}
