package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Round-9 enforcement proofs for the pair-enumeration bounds: the
  * quadratic paths that melted the uncapped sf1 sweep (q24 prefix-filter
  * candidate volume, q31 band-bucket join volume and pair output) must
  * be UNREACHABLE, not just documented. Each test crafts the saturated
  * input shape that used to go quadratic and asserts the cap semantics
  * (which the DuckDB oracles mirror — TextQueries.JacDfCap /
  * SimBandCap / SimNeighborCap) drop it on the floor while a benign
  * control group in the same corpus still dedups normally.
  */
class BoundedPairsSpec extends SparkSpec {

  private def q(name: String) = TextQueries.defs.find(_.name == name).get

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("bounded-pairs").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("crafted"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q31: a saturated band bucket (> SimBandCap docs) is excluded — identical-doc flood emits zero pairs") {
    // 1,100 byte-identical docs: one simhash, four buckets of 1,100 >
    // SimBandCap = 1024. Uncapped, this corpus emits C(1100,2) ≈ 604k
    // pairs through a quadratic self-join; the cap must yield ZERO rows
    // because every shared band is degenerate.
    val flood = (0L until 1100L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
    val dir = writeDocs(flood)
    assert(q("q31_simhash_pairs").fn(spark, dir).count() === 0L,
      "saturated band buckets must not reach candidate generation")
  }

  test("q31: per-doc emission is capped at SimNeighborCap, smallest (hamming, id_b) first") {
    // 200 identical docs: buckets of 200 ≤ SimBandCap, so candidates
    // flow — but doc 0 has 199 hamming-0 neighbors and must emit only
    // its SimNeighborCap nearest (ties broken by smallest id_b).
    val m = TextQueries.SimNeighborCap
    val docs = (0L until 200L).map(i => (i, "one two three four five six seven"))
    val dir = writeDocs(docs)
    val rows = q("q31_simhash_pairs").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val per = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(per(0L) === (1L to m.toLong), s"doc 0 must emit exactly its $m smallest-id neighbors")
    val expectedTotal = (0 until 200).map(i => math.min(199 - i, m)).sum
    assert(rows.length === expectedTotal, "every doc's emission must be capped independently")
    assert(rows.forall(_._3 == 0L), "identical docs are hamming-0 pairs")
  }

  test("q24: shingles above JacDfCap df are stopword-shingles — boilerplate overlap emits zero pairs, true dups still pair") {
    // Group A: 20 docs sharing the 3-grams of "quick brown fox jumps"
    // (df = 20 > JacDfCap = 16) with one unique trailing shingle each.
    // Uncapped, every A-pair scores |∩|=2 / |∪|=4 = 0.5 ≥ t and 190
    // boilerplate pairs flood out; capped, the shared shingles leave
    // the vocabulary and the remaining sets are disjoint → 0 A-pairs.
    // Group B (control, same length block): 5 byte-identical docs whose
    // shingles have df = 5 ≤ cap → all C(5,2) = 10 pairs at jac = 1.
    val groupA = (0L until 20L).map(i => (i, s"quick brown fox jumps uniq$i"))
    val groupB = (100L until 105L).map(i => (i, "lorem ipsum dolor sit amet"))
    val dir = writeDocs(groupA ++ groupB)
    val rows = q("q24_ngram_jaccard").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.forall { case (a, b, _) => a >= 100L && b >= 100L },
      s"boilerplate-only overlap must not pair; got ${rows.toSeq.take(5)}")
    assert(rows.length === 10, "true duplicates below the df cap must still pair")
    assert(rows.forall(_._3 == 1.0), "control group docs are exact dups")
  }
}
