package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

/** Aho–Corasick contract: over ANY text and ANY needle set (small
  * alphabet so overlaps/nesting actually occur), the automaton's
  * per-needle first occurrence equals `String.indexOf` — including
  * needles that are prefixes/suffixes of each other, the failure-link
  * cases a naive trie scan gets wrong. Pure JVM, no Spark. */
object AhoCorasickSpec extends Properties("AhoCorasick") {

  private val alpha = Gen.oneOf('a', 'b', 'c', ' ')
  private val textGen = Gen.listOf(alpha).map(_.mkString)
  private val needleGen = Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, alpha).map(_.mkString))
  private val needlesGen = Gen.chooseNum(1, 8)
    .flatMap(k => Gen.listOfN(k, needleGen)).map(_.distinct.toArray)

  property("firstOccurrences == indexOf for every needle") =
    Prop.forAll(textGen, needlesGen) { (text, needles) =>
      val got = new AhoCorasick(needles).firstOccurrences(text)
      needles.indices.forall { i =>
        got(i) == text.indexOf(needles(i)) + 1 // indexOf is 0-based, -1 absent
      }
    }

  property("overlapping and nested needles all report") = {
    val needles = Array("ab", "abab", "bab", "b")
    val got = new AhoCorasick(needles).firstOccurrences("xabab")
    Prop(got.sameElements(Array(2, 2, 3, 3)))
  }
}
