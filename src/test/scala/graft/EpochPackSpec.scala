package graft

import org.apache.spark.sql.functions._

/** r16 verdict #5: the q134 ↔ q126 COMPOSITION a training loader
  * actually runs. q134 emits the epoch's (shard, pos, doc_id) manifest
  * and q126's packer concatenates docs into fixed-capacity sequences —
  * each was gated alone, but nothing executed the pipeline: shuffle
  * epoch 0 → pack each shard IN POS ORDER → sequences a loader would
  * read. The composition is pure column plumbing (shard becomes the
  * packer's `source`, pos becomes its `doc_id`-order key), which is
  * exactly why it deserves a test — a contract drift in either QueryDef
  * (pos gaps, a packer re-sort) would break the loader while both
  * single-query gates stay green.
  */
class EpochPackSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val Cap = 256L

  /** epoch-0 manifest joined with each doc's token count, re-keyed the
    * way a loader hands it to the packer: one packing domain per shard
    * (`source`), read order = pos (`doc_id`). */
  private lazy val packed = {
    val manifest = QueryRegistry.all.find(_.name == "q134_epoch_shuffle").get
      .fn(spark, sf).filter(col("epoch") === 0L)
    val ntok = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        // the same null-text convention as q126: an absent doc packs as
        // zero tokens
        coalesce(size(split(col("text"), " ")).cast("long"), lit(0L))
          .as("n_tok"))
    val packIn = manifest.join(ntok, Seq("doc_id"))
      .select(concat(lit("shard"), col("shard").cast("string")).as("source"),
        col("pos").as("doc_id"), col("n_tok"),
        col("doc_id").as("orig_doc_id"))
    // the packer contract keys on (source, doc_id); carry the original
    // doc id through by joining it back on (shard, pos) afterwards
    val out = CurationQueries.rebasePacked(
      CurationQueries.seqPackRanges(packIn.select("source", "doc_id", "n_tok")))
    out.join(packIn.select(col("source"), col("doc_id"), col("orig_doc_id")),
        Seq("source", "doc_id"))
      .select(col("source").as("shard"), col("doc_id").as("pos"),
        col("orig_doc_id").as("doc_id"), col("n_tok"),
        col("seq_id"), col("seq_fill"))
      .cache()
  }

  test("every document lands in exactly one packed sequence across all shards") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(packed.count() === docs)
    assert(packed.select(countDistinct(col("doc_id"))).head().getLong(0) === docs)
    // and no (shard, pos) slot is duplicated or dropped by the join-back
    assert(packed.select(countDistinct(col("shard"), col("pos")))
      .head().getLong(0) === docs)
  }

  test("pack order follows pos exactly: a driver-side next-fit replay over the manifest matches seq_id and fill") {
    // replay the packer's own two-level recurrence (next-fit per
    // 128-pos range, ranges re-based by exclusive prefix bins) in plain
    // Scala over the pos-sorted manifest — the packed output must match
    // row-for-row, which pins BOTH that packing consumed docs in pos
    // order and that the re-base preserved it
    val rows = packed.select("shard", "pos", "n_tok", "seq_id", "seq_fill")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (shard, members) =>
      val byPos = members.sortBy(_._2)
      var rng = Long.MinValue
      var bin = 0L; var fill = 0L; var base = 0L; var binsBefore = 0L
      byPos.foreach { case (_, pos, nTok, seqId, seqFill) =>
        val r = pos / CurationQueries.PackRangeDocs
        if (r != rng) {
          if (rng != Long.MinValue) binsBefore += bin + 1
          rng = r; base = binsBefore; bin = 0L; fill = nTok
        } else if (fill + nTok > Cap) { bin += 1; fill = nTok }
        else fill += nTok
        assert(seqId === base + bin,
          s"$shard pos=$pos: seq_id $seqId != replay ${base + bin}")
        assert(seqFill === fill,
          s"$shard pos=$pos: seq_fill $seqFill != replay $fill")
      }
    }
  }

  test("sequences respect the capacity and fill is cumulative within a sequence") {
    val overfull = packed.groupBy("shard", "seq_id")
      .agg(sum(col("n_tok")).as("tok"), count(lit(1)).as("n"))
      // a single doc longer than Cap legitimately overflows its own
      // sequence (next-fit never splits a doc); multi-doc sequences
      // must stay within capacity
      .filter(col("n") > 1L && col("tok") > Cap)
      .count()
    assert(overfull === 0L)
  }
}
