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

  test("keySkew surfaces the hot key with its share") {
    val big = ((1 to 90).map(_ => 1L) ++ (1 to 10).map(_ => 2L)).toDF("k")
    val top = SkewJoin.keySkew(big, "k", 1).head()
    assert(top.getAs[Long]("k") === 1L)
    assert(math.abs(top.getAs[Double]("share") - 0.9) < 1e-9)
  }
}
