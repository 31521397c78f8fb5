package graft.operators

/** Classic Aho–Corasick multi-pattern automaton — the INDEX-FREE
  * counterpart to the staged trigram postings behind
  * `t_substring_multi`: where the postings path pays an index build to
  * make each probe O(candidates), the automaton pays nothing up front and
  * scans each document ONCE for ALL needles simultaneously (O(text +
  * matches), independent of needle count). That is the right tool when
  * the needle set changes per run (secrets scans, fresh contamination
  * lists) or the corpus is read-once — the 100 TB shape is "broadcast a
  * tiny automaton, one narrow mapPartitions pass, no shuffle, no index".
  *
  * Standard construction: goto trie over the needle set, BFS failure
  * links, per-node aggregated output sets so the scan never walks
  * suffix chains. Built driver-side (needles are the bounded query
  * side), broadcast to executors.
  */
final class AhoCorasick(val needles: Array[String]) extends Serializable {
  import scala.collection.mutable

  private val goto_ = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
  private val fail = mutable.ArrayBuffer(0)
  private val out = mutable.ArrayBuffer(List.empty[Int])

  // trie
  needles.zipWithIndex.foreach { case (n, idx) =>
    var st = 0
    n.foreach { c =>
      st = goto_(st).getOrElseUpdate(c, {
        goto_ += mutable.HashMap.empty[Char, Int]
        fail += 0
        out += Nil
        goto_.length - 1
      })
    }
    out(st) = idx :: out(st)
  }
  // BFS failure links + output aggregation
  locally {
    val q = mutable.Queue.empty[Int]
    goto_(0).values.foreach(q.enqueue)
    while (q.nonEmpty) {
      val u = q.dequeue()
      goto_(u).foreach { case (c, v) =>
        q.enqueue(v)
        var f = fail(u)
        while (f != 0 && !goto_(f).contains(c)) f = fail(f)
        fail(v) = if (goto_(f).contains(c) && goto_(f)(c) != v) goto_(f)(c) else 0
        out(v) = out(v) ++ out(fail(v))
      }
    }
  }

  /** 1-based first-occurrence position per needle (0 = absent) — the
    * `instr` convention, one pass over the text. */
  def firstOccurrences(text: String): Array[Int] = {
    val first = new Array[Int](needles.length)
    var st = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (st != 0 && !goto_(st).contains(c)) st = fail(st)
      st = goto_(st).getOrElse(c, 0)
      out(st).foreach { idx =>
        if (first(idx) == 0) first(idx) = i - needles(idx).length + 2
        else {
          val p = i - needles(idx).length + 2
          if (p < first(idx)) first(idx) = p
        }
      }
      i += 1
    }
    first
  }
}
