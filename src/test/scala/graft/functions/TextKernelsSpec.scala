package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-identity proof for the single-pass text kernels: each kernel must
  * equal the regex/HOF column formulation it replaced, row for row, on
  * adversarial cases (Unicode case-mapping one-offs, every Java \s char,
  * multi-byte codepoints, empties, nulls) plus seeded random strings.
  * The DuckDB oracles still state the regex semantics, so this equality
  * is what keeps the correctness gate green.
  */
class TextKernelsSpec extends SparkSpec {
  import spark.implicits._

  private val adversarial: Seq[String] = Seq(
    "", " ", "   ", "a", "A!B?c9", "hello world", "  lead and trail  ",
    "tabs\tand\nnewlines\rherevt\fff", "punct!!!runs???mixed  spaces",
    "MiXeD CaSe 123 ABC xyz", "0123456789", "!@#$%^&*()",
    "unicode éÉ café 中文 words",
    "Kkelvin sign maps to k", // K → k under toLowerCase
    "İ dotted capital I", // İ → i + combining dot
    "emoji 😀 pair", "ends with sep!", "!starts with sep",
    "a!b", "a !b", "a ! b", "double  space", "a nbsp b", //   is NOT Java \s
    "x" * 300, ("word " * 50).trim)

  private def randomStrings(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(20260814L)
    val alphabet = "abcXYZ019 \t\n!?.,;é中K-_"
    Seq.fill(n)(Seq.fill(rnd.nextInt(80))(
      alphabet(rnd.nextInt(alphabet.length))).mkString)
  }

  private val texts = adversarial ++ randomStrings(400) :+ null

  private def compare(name: String, kernel: Column, original: Column): Unit = {
    val df = texts.zipWithIndex.map(_.swap).toDF("id", "text")
    val rows = df.select(kernel.as("k"), original.as("o"), col("text")).collect()
    rows.foreach { r =>
      assert(r.get(0) == r.get(1),
        s"$name diverged on ${Option(r.get(2)).map(t => s"'$t'").getOrElse("null")}: " +
          s"kernel=${r.get(0)} original=${r.get(1)}")
    }
  }

  test("tokens kernel == filter(split(lower, non-alnum), len>0)") {
    compare("tokens", TextKernels.tokens(col("text")),
      filter(split(lower(col("text")), "[^a-z0-9]+"), t => length(t) > 0))
  }

  test("punctRatio kernel == regex count ratio") {
    compare("punctRatio", TextKernels.punctRatio(col("text")),
      when(length(col("text")) === 0, lit(0.0)).otherwise(
        length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", "")).cast("double") /
          length(col("text"))))
  }

  test("normalize kernel == double regexp_replace + trim chain") {
    compare("normalize", TextKernels.normalize(col("text")),
      trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]+", " "), " +", " ")))
  }

  test("fingerprint kernel == md5(trim(regexp_replace(lower, \\s+, ' ')))") {
    compare("fingerprint", TextKernels.fingerprint(col("text")),
      md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))))
  }

  test("tokensLocal (driver-side) == tokens column kernel on every text") {
    // ONE tokenizer governs both sides of BM25's pre-explode membership
    // filter (r14 advice): a query-literal term set built on the driver
    // must agree with the corpus-side column kernel on arbitrary text —
    // including the non-ASCII and case-mapping one-offs above — or the
    // filter silently drops tf rows while the qterms join still matches.
    val df = texts.filter(_ != null).zipWithIndex.map(_.swap).toDF("id", "text")
    val fromPlan = df.select(col("text"), TextKernels.tokens(col("text")).as("k"))
      .collect()
    fromPlan.foreach { r =>
      val t = r.getString(0)
      assert(TextKernels.tokensLocal(t) == r.getSeq[String](1),
        s"tokensLocal diverged from the column kernel on '$t'")
    }
    // and on the exact q87/q113 query literals the BM25 leg ships
    Seq("spark window join", "vector hash group", "customer order value",
      "stream batch filter", "scan slow table").foreach { q =>
      assert(TextKernels.tokensLocal(q) ==
        q.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq)
    }
  }

  test("kernels survive both codegen and interpreted evaluation") {
    // eval path: force interpreted by disabling whole-stage codegen
    val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      compare("tokens-interp", TextKernels.tokens(col("text")),
        filter(split(lower(col("text")), "[^a-z0-9]+"), t => length(t) > 0))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
  }
}
