package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** S10: JSON results sink (`src/chunking_strategy.py:138-157` dumps
  * {metadata, chunks} to one JSON file; `scripts/eval.py:147-149` dumps
  * eval records).
  *
  * Two shapes:
  *   - `writeJsonl`: the scalable path — partitioned JSON-lines, the form
  *     every downstream Spark/DuckDB job actually wants at 100 TB.
  *   - `writeDiaryJson`: reference-compatible single-document
  *     {metadata:{total_days,total_chunks,chunks_per_day,avg_chunks_per_day},
  *     chunks:[...]} file. Single-file JSON is inherently single-writer,
  *     so this path is for fixture-scale parity only (guarded).
  */
object ChunkSink {

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Metadata block computed relationally (A1-A4): total days/chunks,
    * chunks-per-day map (map_from_entries over the A3 group-count),
    * average chunks per day. */
  def metadata(chunks: DataFrame): DataFrame =
    chunks.groupBy(col("date")).agg(count(lit(1)).as("n"))
      .agg(
        count(lit(1)).as("total_days"),
        sum(col("n")).as("total_chunks"),
        map_from_entries(sort_array(collect_list(struct(col("date"), col("n"))))).as("chunks_per_day"),
        (sum(col("n")).cast("double") / count(lit(1))).as("avg_chunks_per_day"))

  def writeDiaryJson(chunks: DataFrame, path: String, maxRows: Int = 100000): Unit = {
    // one materialization for all three consumers (count, metadata agg,
    // ordered collect) — unpersisted before return; without it the whole
    // chunker lineage (shuffle + sorts) re-executed three times (r11)
    val cached = chunks.persist()
    try {
    val n = cached.count()
    require(n <= maxRows,
      s"writeDiaryJson is the fixture-parity single-file path ($n > $maxRows rows); use writeJsonl")
    // chunk_number restarts at 0 per document, so multi-doc input would
    // interleave documents nondeterministically under a chunk_number-only
    // sort AND merge same-date counts across documents in metadata —
    // this sink is the reference's SINGLE-document format (r11 review)
    if (cached.columns.contains("doc_id"))
      require(cached.select(col("doc_id")).distinct().count() <= 1,
        "writeDiaryJson emits the reference's single-document format; " +
          "multi-document chunk frames need writeJsonl (chunk_number ties " +
          "across doc_ids make the chunks array order nondeterministic)")
    val metaJson = metadata(cached).toJSON.head()
    // piece_idx (explodeOversize's split ordinal) joins the sort when
    // present so split pieces serialize in document order
    val sortCols =
      if (cached.columns.contains("piece_idx"))
        Seq(col("chunk_number"), col("piece_idx"))
      else Seq(col("chunk_number"))
    val rows = cached.orderBy(sortCols: _*).toJSON.collect()
    val out = new StringBuilder
    out ++= "{\"metadata\": " ++= metaJson ++= ", \"chunks\": [\n"
    out ++= rows.mkString(",\n")
    out ++= "\n]}"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), out.toString)
    ()
    } finally { chunks.unpersist(); () }
  }
}
