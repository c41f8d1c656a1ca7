package graft.functions

/** Aho–Corasick multi-pattern automaton (Aho & Corasick, CACM 1975)
  * specialized to [[MultiNeedleCount]]'s contract: the total
  * per-needle GREEDY NON-OVERLAPPING occurrence count, summed over
  * needles — value-identical to running `String.indexOf` per needle
  * (the expression's interpreted fallback, property-pinned in
  * `ExpressionSpec`).
  *
  * Why it preserves the greedy semantics: the automaton reports every
  * occurrence of every needle in END-position order; for a FIXED
  * needle, end order is start order (constant length), so replaying
  * the per-needle greedy rule — count iff this occurrence starts at or
  * after the previous counted occurrence's end — over the end-ordered
  * stream reproduces the left-to-right `indexOf` scan exactly,
  * independently per needle, in ONE text pass.
  *
  * Cost: O(|text| + matches) per row versus the per-needle loop's
  * O(|text| · |needles|) — the production trade for 10³–10⁴-needle
  * blocklists. Construction is O(Σ|needle|) once on the driver; the
  * instance ships to executors inside the expression's codegen
  * references (it is `Serializable`; the transition table is a CSR
  * char-sorted array layout, ~10 bytes per trie node, binary-searched
  * per step).
  *
  * Duplicate needles collapse to one trie path with a multiplicity
  * (each copy would produce an identical independent count). Matching
  * is by UTF-16 code units, the same as `String.indexOf`. Thread
  * safety: the per-needle greedy cursor lives in a ThreadLocal scratch
  * with epoch stamping (one automaton instance is shared by all tasks
  * of a plan), so calls never allocate per row and never race.
  */
final class AhoCorasick(needles: Array[String]) extends Serializable {

  // ---- distinct patterns + multiplicity (empties dropped) ----
  private val pats: Array[String] = needles.filter(_.nonEmpty).distinct
  private val mult: Array[Long] = {
    val byPat = needles.filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    pats.map(byPat)
  }
  private val lens: Array[Int] = pats.map(_.length)

  // ---- trie + BFS links, frozen into CSR arrays ----
  private val (childOff, childChar, childNode, fail, out, dictLink) = {
    val chldn = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.SortedMap.empty[Char, Int])
    val term = scala.collection.mutable.ArrayBuffer(-1)
    pats.zipWithIndex.foreach { case (p, j) =>
      var v = 0
      p.foreach { c =>
        v = chldn(v).getOrElseUpdate(c, {
          chldn += scala.collection.mutable.SortedMap.empty[Char, Int]
          term += -1
          chldn.size - 1
        })
      }
      term(v) = j
    }
    val n = chldn.size
    val failA = new Array[Int](n)
    val dictA = new Array[Int](n)
    val queue = scala.collection.mutable.Queue.empty[Int]
    chldn(0).values.foreach { v => failA(v) = 0; dictA(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val v = queue.dequeue()
      chldn(v).foreach { case (c, u) =>
        var f = failA(v)
        while (f != 0 && !chldn(f).contains(c)) f = failA(f)
        failA(u) = if (chldn(f).contains(c) && chldn(f)(c) != u) chldn(f)(c) else 0
        dictA(u) = if (term(failA(u)) >= 0) failA(u) else dictA(failA(u))
        queue += u
      }
    }
    val off = new Array[Int](n + 1)
    (0 until n).foreach(v => off(v + 1) = off(v) + chldn(v).size)
    val cc = new Array[Char](off(n))
    val cn = new Array[Int](off(n))
    (0 until n).foreach { v =>
      var k = off(v)
      chldn(v).foreach { case (c, u) => cc(k) = c; cn(k) = u; k += 1 }
    }
    (off, cc, cn, failA, term.toArray, dictA)
  }

  /** Next state for (state, char): child edge if present, else follow
    * fail links (amortized O(1) over a text scan). */
  private def step(state: Int, c: Char): Int = {
    var s = state
    while (true) {
      val e = edge(s, c)
      if (e >= 0) return e
      if (s == 0) return 0
      s = fail(s)
    }
    0
  }

  /** Binary search of node `s`'s char-sorted CSR edge slice. */
  private def edge(s: Int, c: Char): Int = {
    var lo = childOff(s); var hi = childOff(s + 1) - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val mc = childChar(mid)
      if (mc == c) return childNode(mid)
      else if (mc < c) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** Per-thread greedy cursors, epoch-stamped so a new text resets
    * them in O(1) instead of O(|needles|) per row. */
  private final class Scratch {
    val nextAllowed = new Array[Int](pats.length)
    val stamp = new Array[Int](pats.length)
    var epoch = 0
  }
  @transient private lazy val scratch =
    ThreadLocal.withInitial[Scratch](() => new Scratch)

  /** Σ_needle greedy non-overlapping occurrence count in `text`. */
  def countNonOverlap(text: String): Long = {
    if (pats.isEmpty) return 0L
    val sc = scratch.get()
    if (sc.epoch == Int.MaxValue) {
      java.util.Arrays.fill(sc.stamp, 0); sc.epoch = 0
    }
    sc.epoch += 1
    var total = 0L
    var state = 0
    var i = 0
    while (i < text.length) {
      state = step(state, text.charAt(i))
      var v = if (out(state) >= 0) state else dictLink(state)
      while (v != 0) {
        val j = out(v)
        val start = i - lens(j) + 1
        val allowed = if (sc.stamp(j) == sc.epoch) sc.nextAllowed(j) else 0
        if (start >= allowed) {
          total += mult(j)
          sc.stamp(j) = sc.epoch
          sc.nextAllowed(j) = start + lens(j)
        }
        v = dictLink(v)
      }
      i += 1
    }
    total
  }
}
