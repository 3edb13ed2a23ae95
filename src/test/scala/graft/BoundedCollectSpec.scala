package graft

import org.apache.spark.sql.functions._

/** Driver-collected model tables must stay DRIVER-SIZED on hostile
  * label cardinality, failing loudly before the materialization.
  * Since r15 the contract has ONE owner — `Bounded.collectBounded`
  * (r14 verdict: the limit+require idiom was hand-rolled in three
  * places) — covered directly here, plus the q105 end-to-end loud path.
  * q111's pass-1 collect is additionally bounded by arithmetic (the
  * support floor caps it at 20× the mean per-doc distinct-token count,
  * spec'd in AssocPmiSpec).
  */
class BoundedCollectSpec extends SparkSpec {
  import spark.implicits._

  test("collectBounded returns under-cap frames whole and in O(cap) work") {
    val rows = Bounded.collectBounded(
      spark.range(10L).toDF("id"), 10, "spec: tiny frame")
    assert(rows.length == 10)
  }

  test("collectBounded refuses an over-cap frame with the what+hint message") {
    val e = intercept[IllegalArgumentException] {
      Bounded.collectBounded(spark.range(1001L).toDF("id"), 1000,
        "spec: hostile frame", "use a distributed shape")
    }
    assert(e.getMessage.contains("spec: hostile frame cardinality exceeds 1000"),
      e.getMessage)
    assert(e.getMessage.contains("use a distributed shape"), e.getMessage)
  }

  test("q105 refuses corpus-cardinality lang labels before collecting the model tables") {
    // q105 trains on EVEN doc_ids only, so the train split must carry
    // > 1024 distinct langs on its own — 2200 docs → 1100 train langs.
    // (The cap was 65536 through r14; a 35k-class corpus PASSED that
    // guard and then hung in the ×L test-scoring crossJoin — r14 advice.
    // The cap is now sized to that downstream join, so the hostile
    // fixture shrinks from 140k docs to 2.2k.)
    val n = 2200
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
