package graft.operators

import graft.SparkTestBase

/** Is [[Bpe.trainBatched]]'s merge list invariant in `overFetch`? NO —
  * and this spec pins both halves of the truth (the round-12 verdict's
  * "prove it or document the divergence" item):
  *
  *  - WITHIN one round the wider window really is a longer prefix of
  *    the same (count desc, l, r) total order, so the narrow run's
  *    first-round selection is a PREFIX of the wide run's (pinned
  *    below via the onRound callback).
  *  - ACROSS rounds the widths DIVERGE: a narrow window selects fewer
  *    merges per round, so it recounts earlier, and pairs CREATED by
  *    the applied merges (count ≤ their parent's) can outrank
  *    candidates the wide window had already taken in the same
  *    census — reordering, and eventually changing, the merge list
  *    (seed-1 witness below diverges at rank 6 of 48, and the wide
  *    list contains merges of merged symbols the narrow list never
  *    learns).
  *
  * Consequence, documented on [[Bpe.trainBatched]]: `overFetch` is part
  * of the learned tokenizer's identity, not a pure throughput knob —
  * the default stays 2 (the qt43 oracle's width) and callers who widen
  * it for tie-heavy corpora (measured 7.7× faster at 16 in
  * ProfileVocab) must pick the width up front and keep it for the
  * vocabulary's lifetime. */
class BpeOverFetchSpec extends SparkTestBase {
  import spark.implicits._

  private def train(docs: org.apache.spark.sql.DataFrame, overFetch: Int,
                    numMerges: Int = 48, batchSize: Int = 16)
      : (Seq[(String, String)], Seq[Int]) = {
    val roundRanks = scala.collection.mutable.ArrayBuffer.empty[Int]
    val (ms, _) = Bpe.trainBatched(docs, numMerges = numMerges,
      batchSize = batchSize, overFetch = overFetch,
      onRound = (_, rank, _) => roundRanks += rank)
    (ms.map(m => (m.left, m.right)), roundRanks.toSeq)
  }

  /** Flat-tail corpus: many distinct random words, each count 1 —
    * most pair counts tie at small integers (the natural-corpus shape
    * that starved the 2-wide window in ProfileVocab). */
  private def tieHeavyDocs(seed: Long, nWords: Int) = {
    val alphabet = "abcdefghijklmnop"
    val rnd = new java.util.Random(seed)
    val words = (0 until nWords).map { _ =>
      val len = 3 + rnd.nextInt(5)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    words.grouped(8).map(_.mkString(" ")).toSeq.toDF("text")
  }

  test("within round 1 the narrow selection is a prefix of the wide selection") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val docs = tieHeavyDocs(seed, 300).localCheckpoint()
      val (m2, rounds2) = train(docs, overFetch = 2)
      val (m16, rounds16) = train(docs, overFetch = 16)
      val r1narrow = rounds2.head
      val r1wide = rounds16.head
      assert(r1narrow <= r1wide,
        s"seed $seed: narrow round 1 selected $r1narrow > wide's $r1wide")
      assert(m2.take(r1narrow) == m16.take(r1narrow),
        s"seed $seed: round-1 prefix diverged — the within-round total order broke")
    }
  }

  test("across rounds the merge lists DIVERGE (overFetch is part of the tokenizer's identity)") {
    val docs = tieHeavyDocs(1L, 300).localCheckpoint()
    val (m2, rounds2) = train(docs, overFetch = 2)
    val (m16, _) = train(docs, overFetch = 16)
    assert(m2.size == 48 && m16.size == 48)
    assert(m2 != m16, "expected the seed-1 witness to diverge; if BPE's " +
      "batching changed and widths now agree, overFetch may be promotable — re-measure")
    val firstDelta = m2.zip(m16).indexWhere(p => p._1 != p._2)
    // divergence cannot start INSIDE narrow's round 1 (the within-round
    // prefix property above) — it begins at or after the narrow run's
    // first recount
    assert(firstDelta >= rounds2.head,
      s"first delta at rank $firstDelta inside narrow round 1 (ended ${rounds2.head}) " +
      "— the within-round prefix property broke")
    // and the wide run learns merges OF MERGED SYMBOLS (created pairs
    // that jumped the ranking) that the narrow run never selects —
    // "</w>" is the end-of-word marker, a base symbol despite its length
    val wideOnly = m16.toSet -- m2.toSet
    def created(s: String) = s.length > 1 && s != "</w>"
    assert(wideOnly.exists { case (l, r) => created(l) || created(r) },
      s"expected a created-pair merge among the wide-only selections: $wideOnly")
  }
}
