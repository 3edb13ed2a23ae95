package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Randomized cross-checks of the custom kernels against independent
  * naive oracles (seeded, no scalacheck bridge in the offline deps).
  * The oracles re-derive the math from the definition — per-permutation
  * min for MinHash, O(n·w) Horner re-hash for CDC — so a shared-constant
  * bug in the kernel cannot hide behind a shared implementation.
  */
class KernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private val P = 2147483647L

  test("MinHashSig: codegen'd DataFrame path equals the naive per-permutation min (200 samples)") {
    val rnd = new scala.util.Random(0x5EED1)
    val nPerms = 16
    val perms = XHash.permParams(nPerms)
    val rows = (1 to 200).map { i =>
      // 31-bit hashes, as produced by the shingle hasher upstream
      (i.toLong, Array.fill(1 + rnd.nextInt(40))(rnd.nextLong(1L << 31)))
    }
    val got = rows.toDF("id", "h")
      .select($"id", MinHashSig($"h", nPerms).as("sig"))
      .as[(Long, Array[Long])].collect().toMap
    rows.foreach { case (id, hs) =>
      val naive = perms.map { case (a, b) => hs.map(h => (a * h + b) % P).min }
      assert(got(id).toSeq === naive, s"sample id=$id diverged from the naive oracle")
    }
  }

  test("MinHashSig: interpreted eval agrees with the DataFrame path and null semantics hold") {
    val perms = XHash.permParams(8)
    val mk = (vals: Seq[Any]) => MinHashSig(
      Literal.create(vals, ArrayType(LongType, containsNull = true)),
      perms.map(_._1), perms.map(_._2))
    // non-null array: interpreted eval equals the naive oracle
    val hs = Seq(17L, 9000123L, (1L << 30) + 7L)
    val got = mk(hs).eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
    val naive = perms.map { case (a, b) => hs.map(h => (a * h + b) % P).min }
    assert(got === naive)
    // empty array → null (matches array_min-over-empty)
    assert(mk(Seq.empty).eval(null) === null)
    // null element → null (matches array_min over a transform yielding null)
    assert(mk(Seq(5L, null, 7L)).eval(null) === null)
  }

  test("CdcCuts: rolling hash equals an independent O(n*w) Horner re-hash, incl. non-BMP (120 samples)") {
    // independent oracle with the kernel's published constants
    val (w0, b0, m0, mask0) = (16, 257L, 1048573L, 64L)
    def hornerCuts(s: String): Seq[Int] = {
      val cp = s.codePoints().toArray
      (w0 until cp.length).filter { p => // 1-indexed cut position p, w <= p < n
        var h = 0L
        var i = p - w0
        while (i < p) { h = (h * b0 + cp(i)) % m0; i += 1 }
        h % mask0 == 0L
      }
    }
    val rnd = new scala.util.Random(0x5EED2)
    val alphabet: IndexedSeq[String] =
      ('a' to 'f').map(_.toString) ++ Seq(" ", "\n", "é", "汉", "😀") // U+1F600
    val samples = (1 to 120).map { i =>
      (i.toLong, (0 until rnd.nextInt(400)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val got = samples.toDF("id", "text")
      .select($"id", CdcCuts($"text").as("cuts"))
      .as[(Long, Seq[Int])].collect().toMap
    samples.foreach { case (id, s) =>
      assert(got(id) === hornerCuts(s), s"sample id=$id: rolling and Horner cuts diverged")
    }
    // the content-defined property itself: a prefix insertion shifts every
    // existing cut by exactly the insertion length (windows are content-
    // identical), it never INVALIDATES one — byte-offset chunking would
    val base = samples.maxBy(_._2.length)._2
    val shifted = "zzz" + base
    val tailCuts = hornerCuts(base).map(_ + 3).toSet
    assert(tailCuts.subsetOf(hornerCuts(shifted).toSet))
  }
}
