package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.functions.XHash

/** q140_cluster_split: near-dup-cluster-coherent splitting. The oracle
  * gate pins the exact rollup rows at sf0.01; this spec proves the CLAIM
  * the query exists for — a near-dup component can never straddle
  * train/val/test — on an adversarial corpus of constructed near-dup
  * clusters that q139's exact-hash leak guard provably does NOT catch
  * (the members differ by one token, so no text hash repeats).
  */
class ClusterSplitSpec extends SparkSpec {
  import spark.implicits._

  /** 8 clusters × 3 one-token-variant members (word-3-gram Jaccard
    * ≈ 0.85 ≫ the 0.5 verify threshold) + 16 distinct singletons,
    * spread over two sources; cluster 7 deliberately spans sources. */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-csplit-").toFile
    d.deleteOnExit()
    val base = (0 until 40).map(i => s"w${i}base").mkString(" ")
    val rows = (0 until 8).flatMap { c =>
      (0 until 3).map { m =>
        val words = (0 until 40).map(i => s"w${i}c$c").updated(20, s"var$m").mkString(" ")
        val src = if (c == 7 && m == 2) "srcB"
                  else if (c % 2 == 0) "srcA" else "srcB"
        (c * 3L + m, words, "en", src, words.length.toLong)
      }
    } ++ (0 until 16).map { i =>
      // singleton texts share NO 3-gram with anything else
      val words = (0 until 40).map(j => s"solo${i}tok$j").mkString(" ")
      (100L + i, words, "en", if (i % 2 == 0) "srcA" else "srcB", words.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  private def q(name: String) = QueryRegistry.all.find(_.name == name).get

  private lazy val clusters = q("q49_dedup_clusters").fn(spark, dir).cache()
  private lazy val out = q("q140_cluster_split").fn(spark, dir).cache()

  test("the construction induced the intended near-dup components") {
    // every constructed triple is one component labeled by its min doc_id
    val labels = clusters.select("doc_id", "cluster_id").as[(Long, Long)]
      .collect().toMap
    (0 until 8).foreach { c =>
      val ids = (0 until 3).map(m => c * 3L + m)
      assert(ids.forall(labels.contains), s"cluster $c fully detected")
      assert(ids.map(labels).distinct == Seq(c * 3L), s"cluster $c label = min id")
    }
    assert(labels.size == 24, "no singleton was pulled into a component")
  }

  test("q139's exact-hash guard does not see this contamination") {
    val q139 = q("q139_split_leakguard").fn(spark, dir)
    assert(q139.agg(sum(col("leaked"))).as[Long].head() == 0L,
      "one-token variants defeat the exact-text guard")
    // ...yet under per-DOC hash splitting, at least one component straddles
    val docSplit = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("bucket", pmod(XHash.hash60(
        concat(lit("split:"), col("doc_id").cast("string"))), lit(100L)))
      .withColumn("split", when(col("bucket") < 80L, "train")
        .when(col("bucket") < 90L, "val").otherwise("test"))
    val straddled = clusters.join(docSplit, Seq("doc_id"))
      .groupBy("cluster_id").agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(straddled > 0L, "per-doc hashing would leak near-dups across splits")
  }

  test("rollup equals an independent rep-keyed recomputation") {
    val expected = spark.read.parquet(s"$dir/documents.parquet")
      .join(clusters.select(col("doc_id"), col("cluster_id").as("lbl")),
        Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("lbl"), col("doc_id")))
      .withColumn("bucket", pmod(XHash.hash60(
        concat(lit("csplit:"), col("rep").cast("string"))), lit(100L)))
      .withColumn("split", when(col("bucket") < 80L, "train")
        .when(col("bucket") < 90L, "val").otherwise("test"))
      .groupBy("split", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("lbl").isNotNull, 1L).otherwise(0L)).as("n_clustered"),
        countDistinct(when(col("lbl").isNotNull, col("rep"))).as("n_clusters"))
      .collect().map(_.toSeq).toSet
    assert(out.collect().map(_.toSeq).toSet == expected)
    assert(out.agg(sum(col("n_docs"))).as[Long].head() == 40L)
  }

  test("the corpus discriminates rep-keyed from doc-keyed splitting") {
    // if q140 hashed doc_id instead of the cluster representative, its
    // rollup would differ on this corpus — assert that the naive
    // doc-keyed rollup is NOT what q140 produced, so the equality in the
    // previous test is load-bearing rather than formula-echoing
    val naive = spark.read.parquet(s"$dir/documents.parquet")
      .join(clusters.select(col("doc_id"), col("cluster_id").as("lbl")),
        Seq("doc_id"), "left")
      .withColumn("bucket", pmod(XHash.hash60(
        concat(lit("csplit:"), col("doc_id").cast("string"))), lit(100L)))
      .withColumn("split", when(col("bucket") < 80L, "train")
        .when(col("bucket") < 90L, "val").otherwise("test"))
      .groupBy("split", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("lbl").isNotNull, 1L).otherwise(0L)).as("n_clustered"),
        countDistinct(when(col("lbl").isNotNull, col("lbl"))).as("n_clusters"))
      .collect().map(_.toSeq).toSet
    assert(out.collect().map(_.toSeq).toSet != naive)
    // and the splits q140 reports cover >1 bucket (the corpus is not
    // degenerate: train plus at least one eval split is populated)
    assert(out.select("split").distinct().count() >= 2)
  }
}
