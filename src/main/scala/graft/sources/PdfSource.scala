package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1/S2: PDF text extraction (`extract_text_from_pdf`,
  * `scripts/prepare_data.py:31-42`; page-tracking variant
  * `scripts/archive/prepare_data.py:26-38`).
  *
  * The diary PDF itself is a missing large blob in the reference
  * (`.MISSING_LARGE_BLOBS:1`) and no PDF library ships in this build's
  * jars, so extraction is a pluggable trait: the Spark side — binaryFile
  * scan, per-partition extractor reuse, per-page rows with filename as
  * doc id — is real; `SplitPagesExtractor` is the deterministic offline
  * stand-in (treats payload as form-feed-separated text pages, which is
  * exactly the shape pdftotext emits). A pdfbox-backed extractor drops
  * into the same trait without touching the plan.
  */
trait PdfExtractor extends Serializable {
  /** payload → pages of text, in order. */
  def extractPages(bytes: Array[Byte]): Seq[String]
}

/** Offline stand-in: UTF-8 payload split on form-feed (\f) page breaks. */
object SplitPagesExtractor extends PdfExtractor {
  override def extractPages(bytes: Array[Byte]): Seq[String] =
    if (bytes == null) Nil
    else new String(bytes, "UTF-8").split("\f", -1).toSeq
}

/** Default: sniff the payload — a real `%PDF-` file goes through the
  * actual parser (`SimplePdfExtractor`); anything else is treated as
  * pdftotext-shaped form-feed text. A mixed document directory (the
  * normal crawl case) extracts correctly file by file.
  */
object AutoExtractor extends PdfExtractor {
  private val Magic = "%PDF-".getBytes("ISO-8859-1")
  override def extractPages(bytes: Array[Byte]): Seq[String] =
    if (bytes != null && bytes.length >= Magic.length &&
      Magic.indices.forall(i => bytes(i) == Magic(i)))
      SimplePdfExtractor.extractPages(bytes)
    else SplitPagesExtractor.extractPages(bytes)
}

object PdfSource {

  /** Scan a directory of documents into (doc_id, page, page_text) rows.
    * `spark.read.format("binaryFile")` gives (path, content); the
    * extractor initializes once per partition (executor-lifetime pattern,
    * like the Embedder — V1's per-call re-load is the reference perf bug
    * SURVEY.md §2.7 flags).
    */
  def pages(spark: SparkSession, path: String,
            extractor: PdfExtractor = AutoExtractor): DataFrame = {
    import spark.implicits._
    val extractUdf = udf((bytes: Array[Byte]) => extractor.extractPages(bytes))
    spark.read.format("binaryFile").load(path)
      .select(col("path").as("doc_id"), extractUdf(col("content")).as("pages"))
      .select(col("doc_id"), posexplode(col("pages")))
      .withColumnRenamed("pos", "page")
      .withColumnRenamed("col", "page_text")
  }

  /** S1 shape: whole-document text — pages joined with "\n" (the
    * reference concatenates page texts with a newline,
    * `scripts/prepare_data.py:37-40`). */
  def text(spark: SparkSession, path: String,
           extractor: PdfExtractor = AutoExtractor): DataFrame =
    pages(spark, path, extractor)
      .groupBy(col("doc_id"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("page"), col("page_text")))),
        s => s.getField("page_text")), "\n").as("text"))
}
