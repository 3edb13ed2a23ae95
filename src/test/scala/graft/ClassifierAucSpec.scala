package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** q150_classifier_auc: histogram-first Mann-Whitney AUC over the q117
  * classifier's quantized scores. The oracle gate pins the exact value
  * cross-engine; this spec pins the FORMULATION: the bounded-domain
  * histogram computation must equal a brute-force all-pairs AUC
  * (pos>neg counts 1, tie counts ½) re-derived from the same trained
  * scores on the real gate corpus — every tie, every duplicate score
  * value included.
  */
class ClassifierAucSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("histogram AUC equals brute-force pairwise AUC on the trained scores") {
    val out = SparkEntry.queries("q150_classifier_auc")(spark, sf).collect()
    assert(out.length === 1)
    val (nPos, nNeg, auc) = (out(0).getLong(0), out(0).getLong(1), out(0).getDouble(2))

    // independent re-derivation: same trainer, same lift, O(n²) pairs
    val f = CurationQueries.logregFeatures(spark, sf, "auc-spec").persist()
    try {
      val n = f.count()
      val w = CurationQueries.logregTrain(f, n)
      val scored = f
        .withColumn("z", CurationQueries.zCol(w))
        .withColumn("sg", CurationQueries.sigCol)
        .withColumn("s_micro", floor(col("sg") * lit(1e6) + lit(0.5)).cast("long"))
        .select(col("s_micro"), col("y")).collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      val pos = scored.filter(_._2 == 1.0).map(_._1)
      val neg = scored.filter(_._2 == 0.0).map(_._1)
      assert(pos.length.toLong === nPos && neg.length.toLong === nNeg)
      val u2 = (for (p <- pos; q <- neg) yield {
        if (p > q) 2L else if (p == q) 1L else 0L
      }).sum
      val brute = math.floor(
        u2.toDouble / (2.0 * pos.length * neg.length) * 1e6 + 0.5) / 1e6
      assert(auc === brute,
        s"histogram AUC $auc != brute-force $brute (u2=$u2, ${pos.length}x${neg.length})")
      // the classifier must actually RANK (q117 trains to 0.83 accuracy;
      // a broken scorer degenerates to ~0.5)
      assert(auc > 0.8, s"AUC $auc: classifier no longer separates the classes")
    } finally f.unpersist()
  }
}
