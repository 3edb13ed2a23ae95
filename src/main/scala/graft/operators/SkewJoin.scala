package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware join utility (100 TB posture; SURVEY.md §7.5 "salting for
  * skew").
  *
  * AQE's skew-join split handles sort-merge joins at runtime, but a
  * pathologically hot key (one user producing 1% of a 100 TB fact table)
  * still lands its build-side row in every task that touches the key.
  * Classic salting fixes the shape statically: the BIG side gets a random
  * salt in [0, n); the SMALL side is exploded n× (one row per salt value);
  * the join key becomes (key, salt), spreading the hot key over n tasks.
  * Correctness: every big-side row still meets exactly one copy of its
  * matching small-side row.
  *
  * Use only when the small side tolerates n× duplication (dimension-table
  * sized) and a key histogram shows real skew — salting an even join just
  * adds shuffle volume.
  */
object SkewJoin {

  /** Join types where an unmatched small-side row produces no output row:
    * for right/full outer the exploded small side would emit each unmatched
    * row saltBuckets times (every salt copy survives), so those are rejected.
    */
  private val SupportedJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
        "left_anti", "leftanti")

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0)
    val normalized = joinType.toLowerCase.replace("_", "")
    require(SupportedJoinTypes.map(_.replace("_", "")).contains(normalized),
      s"saltedJoin: joinType '$joinType' would duplicate unmatched small-side rows " +
        s"${saltBuckets}x; supported: inner, left[_outer], left_semi, left_anti")
    // the internal column must not silently eat a caller's column of the
    // same name (withColumn REPLACES, and the final drop would then
    // remove the user's data from the output; r11 review)
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedJoin: inputs must not carry a '__salt' column (internal name)")
    val salted = big.withColumn("__salt", (rand(seed = 7) * saltBuckets).cast("int"))
    val exploded = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(exploded, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Key histogram helper: top-n heaviest keys with their share — the
    * measurement that decides whether salting is warranted. */
  def keySkew(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .withColumn("share", round(col("n") / total, 6))
      .orderBy(col("n").desc)
      .limit(topN)
  }
}
