package graft

import org.apache.spark.sql.functions._

/** Smoke: every registered query runs on sf0.001 and the driver contract
  * invariants hold (oracle keys ⊆ query keys; flagship returns rows). */
class EntrySmokeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("oracleSql keys are a subset of queries keys") {
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    assert(ok.subsetOf(qk), s"orphan oracle entries: ${ok -- qk}")
  }

  test("entry (flagship RAG retrieval) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query executes on sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("dedup family returns non-trivial outputs on synthetic dups") {
    import spark.implicits._
    // plant exact + near duplicates and check the operators catch them
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 40L),
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 40L), // exact dup
      (2L, "alpha beta gamma delta epsilon zeta eta iota", "en", "s", 40L), // near dup
      (3L, "one two three four five six seven eight", "en", "s", 40L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("dedup").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val exact = SparkEntry.queries("q20_dedup_exact")(spark, dir)
    assert(exact.count() === 1) // one dup group (0,1)
    val jac = SparkEntry.queries("q24_ngram_jaccard")(spark, dir).collect()
    // (0,1) identical → jac 1.0; (0,2)/(1,2) share 5 of 7 distinct shingles
    assert(jac.exists(r => r.getAs[Long]("id_a") === 0L && r.getAs[Long]("id_b") === 1L
      && r.getAs[Double]("jac") === 1.0))
    val mh = SparkEntry.queries("q25_minhash")(spark, dir).collect()
    val sig0 = mh.find(_.getAs[Long]("doc_id") == 0L).get
    val sig1 = mh.find(_.getAs[Long]("doc_id") == 1L).get
    (0 until 16).foreach { i =>
      assert(sig0.getAs[Long](s"mh_$i") === sig1.getAs[Long](s"mh_$i")) // identical docs → identical signature
    }
  }
}
