package graft

import org.apache.spark.sql.functions._

/** r14's driver-collected model tables must stay DRIVER-SIZED on hostile
  * label cardinality, failing loudly before the materialization — the
  * rankedWithApprox MaxProbeKeys discipline. q111's pass-1 collect is
  * bounded by arithmetic (the support floor caps it at 20× the mean
  * per-doc distinct-token count, spec'd in AssocPmiSpec); q105's per-lang
  * rollups are bounded only by the TASK ("a classifier trains over a
  * known class set"), so a corpus that violates that assumption — unique
  * `lang` per doc — must be refused, not collected.
  */
class BoundedCollectSpec extends SparkSpec {
  import spark.implicits._

  test("q105 refuses corpus-cardinality lang labels before collecting the model tables") {
    // q105 trains on EVEN doc_ids only, so the train split must carry
    // > 65536 distinct langs on its own — 140k docs → 70k train langs
    // (first attempt used 70k docs: 35k train langs passed the guard and
    // the test ran the real 35k-class crossJoin explosion to timeout)
    val n = 140000
    val dir = java.nio.file.Files.createTempDirectory("graft-q105-langs").toFile
    try {
      spark.range(n.toLong)
        .select(col("id").as("doc_id"),
          concat(lit("alpha beta doc "), col("id")).as("text"),
          concat(lit("lang_"), col("id")).as("lang"),
          lit("web").as("source"),
          lit(20L).as("n_chars"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val e = intercept[IllegalArgumentException] {
        SparkEntry.queries("q105_naive_bayes")(spark, dir.toString).collect()
      }
      assert(e.getMessage.contains("lang cardinality"), e.getMessage)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dir)
    }
  }
}
