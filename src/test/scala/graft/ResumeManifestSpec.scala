package graft

/** q142_resume_manifest: checkpoint-resume positions over the q134
  * epoch-shuffle manifest. The oracle gate pins exact rows at sf0.01;
  * this spec re-derives every resume point INDEPENDENTLY from q134's
  * (oracle-gated) output with plain Scala collections — per-shard
  * consumption order is epoch 0's positions then epoch 1's — and pins
  * the exhausted-shard boundary (shards shorter than the checkpoint
  * return no row rather than a fabricated position).
  */
class ResumeManifestSpec extends SparkSpec {

  private val consumed = 62

  private def q(name: String) = QueryRegistry.all.find(_.name == name).get

  test("every resume row restates exactly `consumed` drawn samples") {
    val sf = "/root/testdata/sf0.01"
    // independent ground truth: per shard, the full consumption stream
    val stream: Map[Long, Seq[(Long, Long, Long)]] = // shard -> (epoch, pos, doc)
      q("q134_epoch_shuffle").fn(spark, sf)
        .select("shard", "epoch", "pos", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .groupBy(_._1)
        .map { case (sh, rows) =>
          sh -> rows.map(t => (t._2, t._3, t._4)).sortBy(t => (t._1, t._2)).toSeq
        }
    val got = q("q142_resume_manifest").fn(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got.keySet == stream.keySet, "one resume row per live shard")
    stream.foreach { case (sh, items) =>
      assert(items.size > consumed, s"shard $sh long enough for the test")
      val (epoch, pos, doc) = items(consumed) // 0-based: the NEXT sample
      val (gotEpoch, gotPos, nextDocs) = got(sh)
      assert(gotEpoch == epoch, s"shard $sh resume epoch")
      assert(gotPos == pos, s"shard $sh resume pos")
      // preview = the next ≤3 docs of the resume epoch, in pos order
      val expectDocs = items.drop(consumed).takeWhile(_._1 == epoch).take(3)
        .map(_._3).mkString(",")
      assert(nextDocs == expectDocs, s"shard $sh preview")
      assert(doc.toString == nextDocs.split(",").head)
    }
    // the checkpoint straddles the epoch boundary at this scale: both
    // resume-in-epoch-0 and resume-in-epoch-1 paths execute
    assert(got.values.map(_._1).toSet == Set(0L, 1L),
      "both resume paths exercised at gate scale")
  }

  test("shards exhausted before the checkpoint yield no row, not garbage") {
    // 40 docs → every shard's two-epoch total (~10) is far below 62
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-resume-").toFile
    d.deleteOnExit()
    (0 until 40).map(i => (i.toLong, s"tiny doc $i", "en", "srcA", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    val tiny = q("q142_resume_manifest").fn(spark, d.getAbsolutePath)
    assert(tiny.count() == 0L)
  }
}
