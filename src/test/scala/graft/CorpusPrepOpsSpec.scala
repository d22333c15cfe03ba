package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Mining, TrainingData}

/** B61/B62/B63 — the r16 corpus-preparation additions: sliding-window
  * chunking, exact repeated-substring dedup (Lee et al. 2021,
  * arXiv:2107.06499), and the CCNet perplexity filter (Wenzek et al.
  * 2019, arXiv:1911.00359). Pins each op's declared contract at
  * sf0.001 from the OUTPUT side (coverage/overlap invariants, planted
  * pair recall, tercile threshold semantics) so an implementation
  * change that keeps the oracle green but breaks the documented
  * semantics still fails here. */
class CorpusPrepOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private val W = TrainingData.ChunkWindow
  private val S = TrainingData.ChunkStride

  test("chunk_sliding: starts on the stride grid, full coverage, fixed overlap") {
    val rows = TrainingData.chunkSliding(spark, dir).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      // chunk ids are 0..n_chunks-1, one row each, starts = i*stride
      assert(sorted.map(_.getInt(1)).toSeq == (0 until sorted.length))
      assert(sorted.forall(r => r.getInt(2) == sorted.length))
      sorted.foreach(r => assert(r.getInt(3) == r.getInt(1) * S))
      // n_chunks = ceil(n_tok/stride) for the n_tok the chunks imply
      val last = sorted.last
      val nTok = last.getInt(3) + last.getInt(4)
      assert(sorted.length == math.ceil(nTok.toDouble / S).toInt,
        s"doc $doc: ${sorted.length} chunks for $nTok tokens")
      // every chunk holds min(W, n_tok - start) tokens — the text agrees
      sorted.foreach { r =>
        assert(r.getInt(4) == math.min(W, nTok - r.getInt(3)))
        assert(r.getString(5).split(" ").count(_.nonEmpty) == r.getInt(4))
      }
      // consecutive full-width chunks share exactly the W-S overlap tokens
      sorted.sliding(2).foreach {
        case Array(a, b) if a.getInt(4) == W =>
          val at = a.getString(5).split(" ")
          val bt = b.getString(5).split(" ")
          assert(at.drop(S).sameElements(bt.take(W - S)),
            s"doc $doc: overlap mismatch between chunks ${a.getInt(1)}/${b.getInt(1)}")
        case _ => ()
      }
    }
  }

  test("dedup_substring: both members of every planted wrapper-pair flag") {
    val rows = TrainingData.dedupSubstring(spark, dir).collect()
    val flagged = rows.map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    val nGrams = rows.map(r => r.getLong(0) -> r.getInt(1)).toMap
    // planted variants are 2·id+1 for id % 5 == 0; each shares every
    // interior gram with its original 2·id — a wrapper B16 cannot
    // catch. The MUST-flag contract needs the original present with
    // >= 10 tokens (see dedupSubstring scaladoc); this corpus's docs
    // all qualify today — if a future data drop adds shorter docs,
    // skip those pairs rather than throwing a bare key miss, but the
    // certified set must never be empty.
    val variants = rows.map(_.getLong(0)).filter(_ % 2 == 1)
      .filter(v => flagged.contains(v - 1))
    assert(variants.nonEmpty)
    variants.foreach { v =>
      assert(flagged(v), s"planted variant $v not flagged")
      assert(flagged(v - 1), s"original ${v - 1} of planted variant not flagged")
      // the 3-token preamble adds at most 3 grams (distinct may collapse)
      assert(nGrams(v) >= nGrams(v - 1) && nGrams(v) <= nGrams(v - 1) + 3)
    }
    rows.foreach { r =>
      val (ng, nd) = (r.getInt(1), r.getInt(2))
      assert(nd >= 0 && nd <= ng)
      // dup_ratio is the RAW IEEE division of the two graded ints
      assert(r.getDouble(3) == nd.toDouble / ng)
      assert(r.getBoolean(4) == (2L * nd >= ng))
    }
  }

  test("perplexity_filter: tie-inclusive integer terciles over the certified LM scores") {
    val rows = Mining.perplexityFilter(spark, dir).collect()
    val n = rows.length
    assert(n > 0)
    val byBucket = rows.groupBy(_.getString(2)).view.mapValues(_.toSeq).toMap
    assert(byBucket.keySet == Set("tail", "middle", "head"))
    // threshold rule: t1 is the FIRST integer score whose cumulative
    // count reaches ceil(n/3) — so tail holds at least ceil(n/3) docs,
    // overshooting only by ties on the threshold value itself
    val third = math.ceil(n / 3.0).toLong
    def si(r: org.apache.spark.sql.Row): Long = math.round(r.getDouble(1) * 10000)
    val tail = byBucket("tail")
    val tMax = tail.map(si).max
    assert(tail.size >= third)
    assert(tail.size - tail.count(si(_) == tMax) < third,
      "tail overshoots ceil(n/3) by more than the threshold tie group")
    assert(byBucket.values.map(_.size).sum == n)
    // buckets are value-disjoint and ordered: every tail score < every
    // middle score < every head score (ties never straddle buckets)
    assert(tMax < byBucket("middle").map(si).min)
    assert(byBucket("middle").map(si).max < byBucket("head").map(si).min)
    // kept is exactly the head+middle cut, and scores ARE the certified
    // B46 per-doc means (same doc set, same rounded values)
    rows.foreach(r => assert(r.getBoolean(3) == (r.getString(2) != "tail")))
    val lm = Mining.ngramLmScores(
      sources.Tables.documents(spark, dir)).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rows.length == lm.size)
    rows.foreach(r => assert(lm(r.getLong(0)) == r.getDouble(1)))
  }
}
