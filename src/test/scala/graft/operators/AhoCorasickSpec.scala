package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class AhoCorasickSpec extends AnyFunSuite {

  test("classic he/she/his/hers over 'ushers': nested + overlapping matches") {
    val ac = AhoCorasick.build(Seq("he", "she", "his", "hers"))
    // she ends at 4; he (suffix of she) also ends at 4; hers ends at 6
    assert(ac.findAll("ushers").toSet === Set((1, 4), (0, 4), (3, 6)))
    assert(ac.matchedPatterns("ushers").toSeq === Seq(0, 1, 3))
  }

  test("repeated and overlapping occurrences are all reported") {
    val ac = AhoCorasick.build(Seq("aba"))
    // 'ababa': matches end at 3 and 5 (overlap through the shared 'a')
    assert(ac.findAll("ababa") === Seq((0, 3), (0, 5)))
  }

  test("pattern equal to a prefix of another") {
    val ac = AhoCorasick.build(Seq("ab", "abc"))
    assert(ac.findAll("abc").toSet === Set((0, 2), (1, 3)))
    assert(ac.findAll("ab").toSet === Set((0, 2)))
  }

  test("no match / empty text") {
    val ac = AhoCorasick.build(Seq("xyz"))
    assert(ac.findAll("abcabc").isEmpty)
    assert(ac.findAll("").isEmpty)
    assert(ac.matchedPatterns("abcabc").isEmpty)
  }

  test("multi-word phrase patterns match across spaces") {
    val ac = AhoCorasick.build(Seq("hash value", "value table"))
    val t = "key hash value table part"
    assert(ac.matchedPatterns(t).toSeq === Seq(0, 1))
    // both phrases share the 'value' span — overlap is fine
    assert(ac.findAll(t).toSet === Set((0, 14), (1, 20)))
  }

  test("presence scan agrees with findAll on a longer text") {
    val pats = Seq("spark", "table", "merge batch", "zz")
    val ac = AhoCorasick.build(pats)
    val t = "a table sort merge batch value spark table window"
    val viaFind = ac.findAll(t).map(_._1).distinct.sorted
    assert(ac.matchedPatterns(t).toSeq === viaFind)
    assert(viaFind === Seq(0, 1, 2))
  }

  test("empty patterns are rejected loudly") {
    intercept[IllegalArgumentException](AhoCorasick.build(Nil))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq("ok", "")))
  }

  test("randomized: automaton equals the naive indexOf oracle on a dense 2-char alphabet (150 samples)") {
    // {a,b} forces heavy pattern overlap/nesting — the regime where the
    // failure-link and suffix-output construction actually gets exercised
    val rnd = new scala.util.Random(0xAC5EED)
    def s(len: Int) = (0 until len).map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString
    for (round <- 1 to 150) {
      val patterns = (0 until 1 + rnd.nextInt(8)).map(_ => s(1 + rnd.nextInt(6)))
      val text = s(rnd.nextInt(200))
      val ac = AhoCorasick.build(patterns)
      val naive = for {
        (p, id) <- patterns.zipWithIndex
        at <- Iterator.iterate(text.indexOf(p))(i => text.indexOf(p, i + 1))
          .takeWhile(_ >= 0)
      } yield (id, at + p.length)
      assert(ac.findAll(text).sorted === naive.sorted,
        s"round=$round patterns=${patterns.mkString(",")} text=$text")
      assert(ac.matchedPatterns(text).toSeq === naive.map(_._1).distinct.sorted,
        s"round=$round presence scan diverged")
    }
  }

  test("serializable (ships in task closures)") {
    val ac = AhoCorasick.build(Seq("he", "she"))
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(ac)
    val in = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val back = in.readObject().asInstanceOf[AhoCorasick]
    assert(back.findAll("ushers").toSet === ac.findAll("ushers").toSet)
  }
}
