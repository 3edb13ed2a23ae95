package graft.operators

import scala.collection.mutable

/** Aho-Corasick multi-pattern string matching (Aho & Corasick, CACM 1975):
  * one automaton scan finds every occurrence of every pattern, versus P
  * separate `contains` scans for P patterns. This is the right shape for
  * blocklist/PII/contamination filtering at corpus scale — the automaton
  * is built ONCE on the driver from the (small) pattern list and ships to
  * executors inside the task closure, so each text is read exactly once
  * no matter how many patterns the list holds.
  *
  * Classic construction: a trie of the patterns (`next`), BFS failure
  * links (`fail`, the longest proper suffix of the current node that is
  * also a trie prefix), and output sets (`out`) accumulated through the
  * failure chain so nested/suffix patterns (e.g. "he" inside "she") are
  * reported at the same position.
  *
  * Immutable after build and Serializable — safe to capture in UDF
  * closures and reuse across partitions/threads (search keeps no state).
  */
final class AhoCorasick private (
    next: Array[Map[Char, Int]],
    fail: Array[Int],
    out: Array[Array[Int]],
    val nPatterns: Int) extends Serializable {

  /** Every match as (patternId, endIndexExclusive), overlaps and nested
    * suffix patterns included — the full AC output contract. */
  def findAll(text: String): Seq[(Int, Int)] = {
    val res = mutable.ArrayBuffer[(Int, Int)]()
    var s = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (s != 0 && !next(s).contains(c)) s = fail(s)
      s = next(s).getOrElse(c, 0)
      val o = out(s)
      var j = 0
      while (j < o.length) { res += ((o(j), i + 1)); j += 1 }
      i += 1
    }
    res.toSeq
  }

  /** Distinct matched pattern ids, sorted — presence semantics. Stops
    * scanning early once every pattern has been seen. */
  def matchedPatterns(text: String): Array[Int] = {
    val found = new Array[Boolean](nPatterns)
    var nFound = 0
    var s = 0
    var i = 0
    while (i < text.length && nFound < nPatterns) {
      val c = text.charAt(i)
      while (s != 0 && !next(s).contains(c)) s = fail(s)
      s = next(s).getOrElse(c, 0)
      val o = out(s)
      var j = 0
      while (j < o.length) {
        if (!found(o(j))) { found(o(j)) = true; nFound += 1 }
        j += 1
      }
      i += 1
    }
    (0 until nPatterns).filter(found).toArray
  }
}

object AhoCorasick {

  /** Build from a pattern list; pattern ids are list indices. Patterns
    * must be non-empty (an empty pattern matches everywhere and would
    * make `out` infinite in spirit — reject loudly). */
  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty, "AhoCorasick: empty pattern list")
    require(patterns.forall(_.nonEmpty), "AhoCorasick: empty pattern")
    val children = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    val outB = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    patterns.zipWithIndex.foreach { case (p, id) =>
      var s = 0
      p.foreach { c =>
        s = children(s).getOrElseUpdate(c, {
          children += mutable.Map.empty[Char, Int]
          outB += mutable.ArrayBuffer.empty[Int]
          children.length - 1
        })
      }
      outB(s) += id
    }
    val n = children.length
    val fail = new Array[Int](n)
    val queue = mutable.Queue.empty[Int]
    children(0).valuesIterator.foreach { v => fail(v) = 0; queue += v }
    // BFS guarantees fail(v) (strictly shallower) is finalized before v,
    // so inheriting out(fail(v)) here closes the suffix-output chain
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      children(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).contains(c)) f = fail(f)
        val target = children(f).getOrElse(c, 0)
        fail(v) = if (target != v) target else 0
        outB(v) ++= outB(fail(v))
        queue += v
      }
    }
    new AhoCorasick(
      children.map(m => Map.from(m)).toArray,
      fail,
      outB.map(_.toArray.distinct.sorted).toArray,
      patterns.length)
  }
}
