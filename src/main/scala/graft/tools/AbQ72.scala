package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B harness: where do q72_normalize / q22_text_quality spend
  * their time? The corpus is ~15 MB at sf1 (50k docs × ~300 chars), yet
  * the registered queries measured 5.6 / 6.8 s isolated — hundreds of
  * core-seconds for megabytes of regex, far above q74's 1.7 s for the
  * same text volume. Stages measured independently (each over the same
  * Par-repartitioned scan, noop-written, min-of-2).
  *
  * `sbt 'runMain graft.tools.AbQ72 /root/repo/testdata-sf1'`
  */
object AbQ72 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val spark = SparkSession.builder()
      .appName("ab-q72").master(s"local[${Runtime.getRuntime.availableProcessors}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def base = graft.Par(spark.read.parquet(s"$dir/documents.parquet"))
    def bench[A](name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val t = math.min(once(), once())
      println(f"[ab72] $name: $t%.2f s")
    }

    bench("scan+repart only")(base.select(col("doc_id"), length(col("text"))))
    bench("norm regex only")(base.select(col("doc_id"), length(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]+", " "), " +", " "))))
    bench("md5 only")(base.select(col("doc_id"), md5(col("text"))))
    bench("hash60 only")(base.select(col("doc_id"), graft.functions.XHash.hash60(col("text"))))
    bench("full q72 no sort") {
      base.withColumn("norm", trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]+", " "), " +", " ")))
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars_raw"),
          length(col("norm")).cast("long").as("n_chars_norm"),
          graft.functions.XHash.hash60(col("norm")).as("fp"))
    }
    bench("full q72 with sort") {
      base.withColumn("norm", trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]+", " "), " +", " ")))
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars_raw"),
          length(col("norm")).cast("long").as("n_chars_norm"),
          graft.functions.XHash.hash60(col("norm")).as("fp"))
        .orderBy(col("doc_id"))
    }
    // q22 stages
    bench("q22 tokens+punct no HOF") {
      base.withColumn("n_tokens", graft.functions.TextOps.wordCount(col("text")).cast("long"))
        .withColumn("punct_ratio", round(graft.functions.TextOps.punctRatio(col("text")), 6))
        .select(col("doc_id"), col("n_tokens"), col("punct_ratio"))
    }
    bench("q22 HOF avg_token_len only") {
      base.withColumn("n_tokens", graft.functions.TextOps.wordCount(col("text")).cast("long"))
        .withColumn("avg_token_len",
          when(col("n_tokens") === 0, lit(0.0)).otherwise(
            round(aggregate(graft.functions.TextOps.tokens(col("text")), lit(0L),
              (acc, t) => acc + length(t)).cast("double") / col("n_tokens"), 6)))
        .select(col("doc_id"), col("avg_token_len"))
    }
    val q22 = graft.TextQueries.defs.find(_.name == "q22_text_quality").get.fn
    bench("q22 registered")(q22(spark, dir))

    println("[ab72] norm-only partitions: " + base.select(col("doc_id"), length(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]+", " "), " +", " "))).rdd.getNumPartitions)
    bench("regex x2 (compute-bound probe)")(base.select(col("doc_id"),
      length(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]+", " "), " +", " ")) +
      length(regexp_replace(regexp_replace(lower(concat(col("text"), lit("x"))), "[^a-z0-9 ]+", " "), " +", " "))))
    bench("full q72 sort-early") {
      base.orderBy(col("doc_id"))
        .withColumn("norm", trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]+", " "), " +", " ")))
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars_raw"),
          length(col("norm")).cast("long").as("n_chars_norm"),
          graft.functions.XHash.hash60(col("norm")).as("fp"))
    }
    spark.stop()
  }
}
