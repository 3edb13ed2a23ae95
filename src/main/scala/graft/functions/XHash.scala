package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing.
  *
  * The correctness gate compares our results against a DuckDB oracle, so
  * every hash that influences query OUTPUT must be computable identically
  * in both engines. Neither Spark's `hash()` (Murmur3) nor DuckDB's
  * `hash()` match each other, but `md5` does: both produce the same
  * lowercase hex digest. We take the first 15 hex chars (60 bits — fits a
  * signed 64-bit int, always non-negative) as the shared hash primitive.
  *
  * Spark:  conv(substring(md5(s), 1, 15), 16, 10)::long
  * DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT
  */
object XHash {

  /** ONE per-thread MD5 instance for the whole kernel tier (digest()
    * resets the instance) — EmbedSig, TextKernels and ShingleHash each
    * carried their own copy before (r11 review). */
  val Md5: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Byte-level twin of hash60's "first 15 hex chars" definition: bytes
    * 0..6 plus the high nibble of byte 7 = 60 bits, non-negative. ONE
    * owner — the two hand-unrolled copies this replaces had to be kept
    * in lockstep with the hex-prefix oracle definition by eye. */
  def md5Prefix60(d: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** 60-bit non-negative hash of a string column (md5-prefix). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB SQL fragment for the same hash — keep in lockstep with hash60. */
  def hash60Sql(expr: String): String =
    s"(('0x' || substr(md5($expr), 1, 15))::BIGINT)"

  /** 31-bit variant: safe to multiply by 31-bit constants without 64-bit
    * overflow (DuckDB raises on BIGINT overflow; Spark wraps — avoid both).
    */
  def hash31(c: Column): Column = hash60(c) % lit(2147483647L)

  def hash31Sql(expr: String): String = s"(${hash60Sql(expr)} % 2147483647)"

  /** Universal-hash permutation over the 31-bit space: (a*h + b) mod p,
    * p = 2^31 - 1 (prime). a,b < 2^31 so a*h < 2^62 — no overflow.
    */
  def permute(h: Column, a: Long, b: Long): Column =
    (lit(a) * h + lit(b)) % lit(2147483647L)

  /** Deterministic (a, b) parameter pairs for n minhash permutations —
    * generated from a fixed LCG so Spark and the SQL oracle share them.
    */
  def permParams(n: Int): Seq[(Long, Long)] = {
    var s = 988607929L // fixed seed
    def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; s % 2147483629L + 1 }
    Seq.fill(n)((next(), next()))
  }
}
