package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column operations (tokenize / shingle / quality metrics).
  *
  * These back both the reference's string surface (SURVEY.md §2.7 F1-F10 —
  * split/trim/length/regex over diary lines) and the training-data-pipeline
  * extensions (token counting, quality scoring, n-gram shingling for dedup).
  * Pure `functions._` compositions: codegen'd, no UDFs, and each has an
  * exact DuckDB-SQL twin used by the correctness oracle.
  */
object TextOps {

  /** Lowercased alphanumeric word tokens, empties dropped — semantics of
    * filter(split(lower(text), "[^a-z0-9]+"), len > 0), which Spark `split`
    * and DuckDB `string_split_regex` agree on; evaluated by the single-pass
    * TokensKernel (TextKernelsSpec pins equality with the split form). */
  def tokens(text: Column): Column = TextKernels.tokens(text)

  def tokensSql(expr: String): String =
    s"list_filter(string_split_regex(lower($expr), '[^a-z0-9]+'), t -> len(t) > 0)"

  /** ALPHANUMERIC-RUN token count — size of `tokens(text)`, i.e. the
    * count the oracle-paired hygiene queries (q70/q95/...) define their
    * thresholds over. NOT Python `len(text.split())`: hyphens and
    * apostrophes split here ("don't" → 2), where whitespace-split counts
    * 1 — the chunker-side reference semantics live in
    * `Chunkers.wordCount` (r11 review: the old doc claimed the Python
    * contract this function never had; both engines' oracle SQL uses
    * THIS definition, so behavior is pinned and unchanged). */
  def wordCount(text: Column): Column = size(tokens(text))

  /** Word n-gram shingles from an ALREADY-STAGED tokens column (stage the
    * tokens with withColumn first — a raw tokens(text) expression inside
    * the transform lambda would re-tokenize per shingle; Catalyst has no
    * CSE inside lambdas). Used by n-gram-Jaccard and MinHash dedup. */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), size(toks) - lit(n)),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))

  /** Character-level punctuation ratio: non-alphanumeric-non-space chars /
    * chars (0.0 when empty) — semantics of
    * length(regexp_replace(text, "[a-zA-Z0-9\\s]", "")) / length(text),
    * evaluated by the single-pass PunctRatioKernel. */
  def punctRatio(text: Column): Column = TextKernels.punctRatio(text)

  /** Stopword ratio against a fixed wordlist (language-quality heuristic). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.isin(stopwords.map(lit): _*))).cast("double") / size(toks))
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercased text —
    * semantics of md5(trim(regexp_replace(lower(text), "\\s+", " "))),
    * evaluated by the single-pass FingerprintKernel.
    * Exact-dedup key (SURVEY.md scale extensions). */
  def fingerprint(text: Column): Column = TextKernels.fingerprint(text)

  def fingerprintSql(expr: String): String =
    s"md5(trim(regexp_replace(lower($expr), '\\s+', ' ', 'g')))"
}
