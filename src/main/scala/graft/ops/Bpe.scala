package graft.ops

import scala.collection.mutable

/**
 * Byte-pair-encoding core (Sennrich et al., ACL 2016 — the subword
 * tokenization every modern LLM vocabulary descends from), engine-agnostic:
 * pure functions over word-count tables and symbol sequences. The Spark
 * integration lives in [[TextOps.learnBpeMerges]] (distributed word counts)
 * and [[graft.expressions.BpeEncode]] (per-document encoding kernel).
 *
 * Determinism: merge selection is (count desc, pair lexicographic asc) —
 * ties can never depend on hash-map iteration order; encoding applies
 * merges by learned rank, replacing occurrences left-to-right. No RNG,
 * no order dependence: identical inputs give identical vocabularies on
 * any engine, partitioning, or JVM.
 *
 * Simplifications vs production BPE (documented, deliberate): no
 * end-of-word marker and no byte-level fallback — tokens are encoded
 * independently as plain character sequences.
 */
object Bpe {

  /**
   * Learns `numMerges` merges from a word-frequency table. Stops early when
   * no adjacent pair remains (fully merged vocabulary).
   *
   * Incremental (the Sennrich reference implementation's shape): pair
   * counts, a pair→words index, and a lazy max-heap are maintained across
   * merges, so each merge touches only the words CONTAINING the merged
   * pair — O(affected symbols) per merge instead of re-scanning the whole
   * vocabulary, which is what makes realistic merge counts (10k–50k)
   * tractable. Stale heap snapshots are discarded on pop by comparing to
   * the live count; selection stays (count desc, pair lexicographic asc)
   * — identical to the naive rescan, and iteration-order-independent.
   */
  def learn(wordCounts: Iterable[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    val words: Array[(mutable.ArrayBuffer[String], Long)] = wordCounts.iterator
      .map { case (w, c) => (mutable.ArrayBuffer(w.map(_.toString): _*), c) }
      .toArray
    val counts = mutable.HashMap.empty[(String, String), Long]
    val index = mutable.HashMap.empty[(String, String), mutable.Set[Int]]

    // `touched` is a callback (not a collected set) so the initial build —
    // which would otherwise hash every pair of the vocabulary into a set
    // nobody reads — can pass a no-op
    def addWord(wi: Int, touched: ((String, String)) => Unit): Unit = {
      val (syms, c) = words(wi)
      var i = 0
      while (i < syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        counts.update(k, counts.getOrElse(k, 0L) + c)
        index.getOrElseUpdate(k, mutable.Set.empty) += wi
        touched(k)
        i += 1
      }
    }
    def removeWord(wi: Int, touched: ((String, String)) => Unit): Unit = {
      val (syms, c) = words(wi)
      var i = 0
      while (i < syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        val nc = counts(k) - c
        if (nc == 0L) counts.remove(k) else counts.update(k, nc)
        index.get(k).foreach { s => s -= wi; if (s.isEmpty) index.remove(k) }
        touched(k)
        i += 1
      }
    }

    words.indices.foreach(addWord(_, _ => ()))

    // max-heap of (count, pair) snapshots: best = highest count, ties to the
    // lexicographically SMALLEST pair (so "worse" = lower count or larger pair)
    val heap = mutable.PriorityQueue.empty[(Long, (String, String))](
      Ordering.fromLessThan[(Long, (String, String))] { (x, y) =>
        x._1 < y._1 ||
          (x._1 == y._1 &&
            (x._2._1 > y._2._1 || (x._2._1 == y._2._1 && x._2._2 > y._2._2)))
      })
    counts.foreach { case (k, c) => heap.enqueue((c, k)) }

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    while (merges.length < numMerges && heap.nonEmpty) {
      val (c, k) = heap.dequeue()
      if (counts.get(k).contains(c)) { // fresh snapshot — the live maximum
        merges += k
        val affected = index.get(k).map(_.toArray).getOrElse(Array.empty)
        val touched = mutable.Set.empty[(String, String)]
        affected.foreach { wi =>
          removeWord(wi, touched += _)
          applyMerge(words(wi)._1, k._1, k._2)
          addWord(wi, touched += _)
        }
        // re-enqueue the live snapshot of every pair whose count moved —
        // decreased pairs need one too, or their stale (higher) entries
        // would be popped and discarded with no fresh entry left behind
        touched.foreach(p => counts.get(p).foreach(cc => heap.enqueue((cc, p))))
      }
    }
    merges.toSeq
  }

  /** Encodes one word with the learned merges: repeatedly merges the
    * LOWEST-ranked adjacent pair present until none applies. */
  def encode(word: String, merges: IndexedSeq[(String, String)],
      ranks: collection.Map[(String, String), Int]): Seq[String] = {
    if (word.length < 2) return Seq(word)
    val syms = mutable.ArrayBuffer(word.map(_.toString): _*)
    var done = false
    while (!done && syms.length >= 2) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (a, b) = merges(bestRank)
        applyMerge(syms, a, b)
      }
    }
    syms.toSeq
  }

  /** Merges every left-to-right occurrence of the adjacent pair (a, b)
    * in place (overlaps resolve leftmost-first: "aaa" + (a,a) → "aa","a"). */
  private def applyMerge(syms: mutable.ArrayBuffer[String], a: String, b: String): Unit = {
    var i = 0
    while (i < syms.length - 1) {
      if (syms(i) == a && syms(i + 1) == b) {
        syms(i) = a + b
        syms.remove(i + 1)
      } else i += 1
    }
  }
}
