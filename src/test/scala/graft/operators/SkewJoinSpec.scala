package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows under heavy skew") {
    // 90% of the big side shares one hot key
    val big = ((1 to 900).map(_ => (1L, "hot")) ++ (1 to 100).map(i => (i % 7 + 2L, "cold")))
      .toDF("k", "tag")
    val small = Seq((1L, "dim1"), (2L, "dim2"), (3L, "dim3")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).groupBy("k", "name").count()
    val salted = SkewJoin.saltedJoin(big, small, "k", saltBuckets = 8)
      .groupBy("k", "name").count()
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("outer rows survive a left salted join") {
    val big = Seq((1L, "a"), (99L, "unmatched")).toDF("k", "tag")
    val small = Seq((1L, "dim1")).toDF("k", "name")
    val out = SkewJoin.saltedJoin(big, small, "k", 4, "left")
    assert(out.count() === 2)
    assert(out.filter($"k" === 99L).select("name").head().isNullAt(0))
  }

  test("right/full outer join types are rejected (would duplicate unmatched rows)") {
    val big = Seq((1L, "a")).toDF("k", "tag")
    val small = Seq((1L, "dim1"), (2L, "unmatched")).toDF("k", "name")
    for (jt <- Seq("right", "right_outer", "full", "full_outer", "outer")) {
      intercept[IllegalArgumentException] {
        SkewJoin.saltedJoin(big, small, "k", 4, jt)
      }
    }
  }

  test("q68 gate query joins on the salted key via SMJ") {
    val df = graft.AdvancedQueries.defs.find(_.name == "q68_skew_join").get
      .fn(spark, "/root/testdata/sf0.001")
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    // the join must consume (user_id, __salt) — the spread-the-hot-key
    // shape — and stay a sort-merge join (no broadcast hiding it)
    assert(plan.contains("__salt"), plan.take(2000))
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("q69 gate query's SMJ consumes bucketed scans with no exchange below the join") {
    val df = graft.AdvancedQueries.defs.find(_.name == "q69_bucketed_join").get
      .fn(spark, "/root/testdata/sf0.001")
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    val plan = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i  => full.substring(0, i)
    }
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, plan.take(2000))
    assert(!plan.substring(joinIdx).contains("Exchange"),
      "bucketed join must not shuffle either side:\n" + plan.take(3000))
  }

  test("keySkew surfaces the hot key with its share") {
    val big = ((1 to 90).map(_ => 1L) ++ (1 to 10).map(_ => 2L)).toDF("k")
    val top = SkewJoin.keySkew(big, "k", 1).head()
    assert(top.getAs[Long]("k") === 1L)
    assert(math.abs(top.getAs[Double]("share") - 0.9) < 1e-9)
  }
}
