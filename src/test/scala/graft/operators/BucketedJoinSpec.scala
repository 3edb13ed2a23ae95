package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing (100 TB posture): writing both sides
  * bucketed on the join key lets Spark plan a sort-merge join with NO
  * exchange — at cluster scale that deletes the dominant shuffle of a
  * fact-fact join. Asserted on the physical plan, not just claimed.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    // warehouse dir is a static conf — use the session default (repo-local
    // spark-warehouse); drop tables AND orphan locations from failed runs
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    Seq("li_b", "o_b").foreach { t =>
      val d = new java.io.File(s"spark-warehouse/$t")
      def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles.foreach(rm); f.delete() }
      if (d.exists) rm(d)
    }
    // tiny sf0.001 tables would broadcast — force SMJ so bucketing is what
    // removes the exchanges
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val sf = "/root/testdata/sf0.001"
    spark.read.parquet(s"$sf/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    spark.read.parquet(s"$sf/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_b")

    val joined = spark.table("li_b")
      .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("q"))
    joined.collect() // finalize AQE plan
    val full = joined.queryExecution.executedPlan.toString
    // under AQE the string carries Final + Initial plans; judge the FINAL
    val plan = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i => full.substring(0, i)
    }
    // the JOIN itself must consume bucketed scans directly — no Exchange
    // between the scans and the SortMergeJoin (the aggregation above the
    // join still exchanges, which is fine)
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, plan)
    val belowJoin = plan.substring(joinIdx)
    assert(!belowJoin.contains("Exchange"),
      "bucketed join must not shuffle either side:\n" + plan)
    assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
