package graft

import org.apache.spark.sql.functions._

/** q134_epoch_shuffle: the deterministic epoch-shuffle manifest. The
  * oracle gate pins the exact (epoch, shard, pos, doc_id) rows; this
  * spec pins the PROPERTIES that make it a usable training shuffle —
  * exactly-once per epoch, cross-epoch decorrelation, shard balance —
  * which a hash-arithmetic bug could break while still producing
  * plausible-looking manifest rows.
  */
class EpochShuffleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val q = QueryRegistry.all.find(_.name == "q134_epoch_shuffle").get
  private lazy val out = q.fn(spark, sf).cache()

  test("every document appears exactly once per epoch") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    val perEpoch = out.groupBy("epoch")
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("nd"))
      .collect()
    assert(perEpoch.length === 2)
    perEpoch.foreach { r =>
      assert(r.getLong(1) === docs, s"epoch ${r.get(0)}: row count")
      assert(r.getLong(2) === docs, s"epoch ${r.get(0)}: distinct docs")
    }
  }

  test("positions are a contiguous 1..n ranking inside every (epoch, shard)") {
    val bad = out.groupBy("epoch", "shard")
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"),
        min(col("pos")).as("mn"), countDistinct(col("pos")).as("np"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1L || col("np") =!= col("n"))
      .count()
    assert(bad === 0L)
  }

  test("epochs decorrelate: the two epoch orders of the same docs disagree") {
    // project each epoch's global order (shard-major, then pos) onto the
    // doc ids and compare — identical sequences would mean the epoch is
    // not entering the hash
    val seq0 = out.filter(col("epoch") === 0L)
      .orderBy(col("shard"), col("pos")).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val seq1 = out.filter(col("epoch") === 1L)
      .orderBy(col("shard"), col("pos")).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(seq0 !== seq1)
    // and not just a tail permutation: a large fraction of positions move
    val moved = seq0.zip(seq1).count { case (a, b) => a != b }
    assert(moved > seq0.length / 2, s"only $moved/${seq0.length} positions moved")
  }

  test("shards balance within a multinomial band") {
    // n docs over 8 shards: expected n/8 per shard, std ≈ sqrt(n·p(1−p));
    // 6 sigma keeps the test seed-stable while catching a broken mod
    val sizes = out.filter(col("epoch") === 0L)
      .groupBy("shard").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    assert(sizes.length === 8)
    val n = sizes.sum.toDouble
    val exp = n / 8
    val tol = 6 * math.sqrt(n * (1.0 / 8) * (7.0 / 8))
    sizes.foreach(sz => assert(math.abs(sz - exp) <= tol,
      s"shard size $sz vs expected $exp ± $tol"))
  }
}
