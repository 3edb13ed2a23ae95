package graft.sources

import graft.SparkSpec

class PdfSourceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("pdf").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/doc1.txt"),
      "page one text\fpage two text\fpage three".getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/doc2.txt"),
      "single page".getBytes("UTF-8"))
    d
  }

  test("S2: per-page rows with doc id and page number") {
    val got = PdfSource.pages(spark, dir)
    assert(got.count() === 4)
    val d1 = got.filter($"doc_id".contains("doc1")).orderBy("page")
      .select("page", "page_text").as[(Int, String)].collect()
    assert(d1.toSeq === Seq((0, "page one text"), (1, "page two text"), (2, "page three")))
  }

  test("S1: whole-document text joins pages with newline") {
    val got = PdfSource.text(spark, dir)
    val t = got.filter($"doc_id".contains("doc1")).select("text").as[String].head()
    assert(t === "page one text\npage two text\npage three")
  }
}
