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

  /** Learns `numMerges` merges from a word-frequency table. Stops early
    * when no adjacent pair remains (fully merged vocabulary). */
  def learn(wordCounts: Iterable[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    val words: Array[(mutable.ArrayBuffer[String], Long)] = wordCounts.iterator
      .map { case (w, c) => (mutable.ArrayBuffer(w.map(_.toString): _*), c) }
      .toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.keysIterator.reduceLeft { (x, y) =>
          val cx = counts(x); val cy = counts(y)
          if (cy > cx || (cy == cx && (y._1 < x._1 || (y._1 == x._1 && y._2 < x._2)))) y else x
        }
        merges += best
        words.foreach { case (syms, _) => applyMerge(syms, best._1, best._2) }
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
