package graft

import java.nio.file.Files

/** q153_prefix_cache: exact-prefix KV-reuse manifest. The oracle gate
  * pins exact rows; this spec pins the SEMANTICS on a constructed
  * corpus: only the first 32 tokens group (divergence at token 33 still
  * shares), the group's min-doc_id member pays the prefill (no saving),
  * sub-window docs are ineligible, and cross-source groups attribute
  * savings to each member's own source.
  */
class PrefixCacheSpec extends SparkSpec {
  import spark.implicits._

  private def toks(tag: String, n: Int, from: Int = 0) =
    (from until from + n).map(i => s"$tag$i").mkString(" ")

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-prefix-").toFile
    d.deleteOnExit()
    val shared = toks("p", 32)
    val rows = Seq(
      // three docs share the 32-token prefix, diverging from token 33;
      // docs 0 and 1 in srcA, doc 2 in srcB → the min (doc 0) pays,
      // docs 1 and 2 each save 32 in their OWN source's ledger
      (0L, s"$shared ${toks("a", 5)}", "en", "srcA"),
      (1L, s"$shared ${toks("b", 5)}", "en", "srcA"),
      (2L, s"$shared ${toks("c", 5)}", "en", "srcB"),
      // unique 32-token prefix → eligible, unshared
      (3L, toks("u", 40), "en", "srcB"),
      // 31 tokens → ineligible, absent from every count
      (4L, toks("s", 31), "en", "srcB"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  test("min-doc pays the prefill; members save 32 each in their own source; short docs drop") {
    val rows = QueryRegistry.all.find(_.name == "q153_prefix_cache")
      .get.fn(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // srcA: docs 0,1 eligible+shared; doc 0 is the group min → saves 0,
    // doc 1 saves 32
    assert(rows("srcA") === ((2L, 2L, 32L)))
    // srcB: docs 2,3 eligible; doc 2 shared (saves 32), doc 3 unshared;
    // doc 4 ineligible
    assert(rows("srcB") === ((2L, 1L, 32L)))
  }
}
