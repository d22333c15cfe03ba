package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.Curation
import graft.sources.Tables

/** B68–B71 — the corpus-curation additions: Bloom-filter
  * decontamination (Bloom 1970; Dolma, Soldaini et al. 2024), DSIR
  * importance weights (Xie et al. 2023, arXiv:2302.03169), exact
  * line-level dedup with rewrite (RefinedWeb, Penedo et al. 2023,
  * arXiv:2306.01116), and the corpus entropy/Zipf report. Pins each
  * op's declared contract from the OUTPUT side — the one-sided Bloom
  * invariant and planted-leak recall, tie-inclusive top-quartile
  * threshold semantics, planted-pair scrub-to-tail behavior and
  * clean-doc identity, and the report's recomputable closed forms —
  * so a change that keeps the oracle green but breaks the documented
  * semantics fails here. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("sketch_bloom: sound everywhere, every planted leak flagged, clean docs pass") {
    val rows = Curation.sketchBloom(spark, dir).collect()
    assert(rows.nonEmpty)
    // one-sided Bloom invariant: no false negatives, ever
    rows.foreach { r =>
      assert(r.getBoolean(4), s"doc ${r.getLong(0)}: n_bloom < n_exact breaks the Bloom contract")
    }
    // planted leaked copies (odd ids) contain the full held-out text:
    // both the exact and the bloom verdict must flag them
    val leaks = rows.filter(_.getLong(0) % 2 == 1)
    assert(leaks.nonEmpty)
    leaks.foreach { r =>
      assert(r.getBoolean(5) && r.getBoolean(6),
        s"leaked doc ${r.getLong(0)} must be flagged by both verdicts")
    }
    // at this SF's ~0.06 bit load the gram-level false-positive rate is
    // ~1e-5, far below what the 20% doc bar could flip: the sketch
    // verdict must AGREE with the exact verdict on every doc (the few
    // flagged even docs are the corpus's natural near-dups of held-out
    // docs — genuine contamination both verdicts find)
    rows.foreach { r =>
      assert(r.getBoolean(5) == r.getBoolean(6),
        s"doc ${r.getLong(0)}: bloom and exact verdicts disagree")
    }
    val clean = rows.filter(_.getLong(0) % 2 == 0)
    assert(clean.nonEmpty)
    assert(clean.count(!_.getBoolean(6)) > clean.length * 9 / 10,
      "most training docs are uncontaminated")
  }

  test("stream_bloom: the mask probe agrees with op_sketch_bloom row for row") {
    // two formulations of the same membership test (literal bitmask vs
    // broadcast bit-set join) over the same corpus must emit identical
    // sketch columns
    val mask = Curation.streamBloom(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    val join = Curation.sketchBloom(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(5))).toSeq
    assert(mask == join)
  }

  test("dsir_weights: tie-inclusive top-quartile threshold semantics") {
    val rows = Curation.dsirWeights(spark, dir).collect()
    assert(rows.nonEmpty)
    val n = rows.length
    val k = math.ceil(n / 4.0).toLong
    val sel = rows.filter(_.getBoolean(5))
    val unsel = rows.filterNot(_.getBoolean(5))
    // the threshold reaches the quartile…
    assert(sel.length >= k, s"selected ${sel.length} < ceil(n/4)=$k")
    // …tie-inclusively: strictly above the cut is NOT enough on its own
    val t = sel.map(_.getLong(4)).min
    assert(rows.count(_.getLong(4) > t) < k,
      "threshold is not minimal: a higher cut already reaches the quartile")
    // and membership is exactly the integer comparison
    assert(unsel.forall(_.getLong(4) < t))
    // per-doc feature count is the doc's bigram count (n_tok - 1)
    val nTok = Tables.documents(spark, dir)
      .select(col("doc_id"), size(filter(split(col("text"), " "), x => x =!= "")).as("nt"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.take(20).foreach { r =>
      assert(r.getLong(2) == nTok(r.getLong(0)) - 1L,
        s"doc ${r.getLong(0)}: n_bigrams != n_tok - 1")
    }
  }

  test("stream_dsir: same doc set as B69, per-row fold within one 4dp unit of the grouped mean") {
    val fold = Curation.streamDsir(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val grouped = Curation.dsirWeights(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(fold.keySet == grouped.keySet)
    // two summation orders of the same ~100 doubles: raw means differ
    // by ~1e-12 relative, so the rounded integer scores sit within one
    // unit of each other on every doc (NOT asserted equal — the fold
    // is the declared B77s contract, the grouped mean is B69's)
    fold.foreach { case (id, w) =>
      assert(math.abs(w - grouped(id)) <= 1L, s"doc $id: fold vs grouped drift > 1")
    }
  }

  test("dedup_lines: planted pairs scrub to at most a short tail; clean docs untouched") {
    val rows = Curation.dedupLines(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val srcText = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val plantedIds = srcText.keys.filter(_ % 5 == 0).toSeq.sorted
    assert(plantedIds.nonEmpty)
    plantedIds.foreach { id =>
      val orig = rows(id * 2); val copy = rows(id * 2 + 1)
      // the boiler prefix is exactly one line: copy has one more line
      assert(copy.getInt(1) == orig.getInt(1) + 1)
      // block alignment makes the pair share every line: everything
      // except (possibly) a sub-5-token tail is scrubbed, identically
      assert(orig.getInt(2) >= orig.getInt(1) - 1, s"orig of $id under-scrubbed")
      assert(copy.getInt(2) >= copy.getInt(1) - 1, s"copy of $id under-scrubbed")
      assert(orig.getString(3) == copy.getString(3), s"pair $id tails differ")
      val tail = orig.getString(3).split(" ").filter(_.nonEmpty)
      assert(tail.length < Curation.LineMinTokens, s"pair $id kept a long line")
    }
    // the boilerplate line vanishes from the corpus
    rows.values.foreach(r => assert(!r.getString(3).contains("subscribe")))
    // docs without a planted twin: most are untouched (the ~8% with
    // dup lines are the corpus's natural near-dup docs sharing aligned
    // blocks — genuine boilerplate the op exists to find), and every
    // UNTOUCHED doc comes back byte-identical with kept=true
    val clean = srcText.keys.filter(_ % 5 != 0).toSeq
    assert(clean.nonEmpty)
    assert(clean.count(id => rows(id * 2).getInt(2) == 0) > clean.length * 8 / 10)
    clean.foreach { id =>
      val r = rows(id * 2)
      if (r.getInt(2) == 0) {
        assert(r.getBoolean(4), s"untouched doc $id not kept")
        assert(r.getString(3) == srcText(id), s"untouched doc $id text changed")
      }
    }
  }

  test("stats_zipf: totals, entropy and slope recompute from first principles") {
    val row = Curation.statsZipf(spark, dir).collect().head
    val toks = Tables.documents(spark, dir)
      .select(explode(filter(split(col("text"), " "), x => x =!= "")).as("t"))
      .collect().map(_.getString(0))
    val counts = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = toks.length.toLong
    assert(row.getLong(0) == n, "n_tokens")
    assert(row.getLong(1) == counts.size.toLong, "n_types")
    val topCnt = counts.values.max
    val topTok = counts.filter(_._2 == topCnt).keys.min
    assert(row.getString(2) == topTok && row.getLong(3) == topCnt, "top rank")
    val entropy = math.log(n.toDouble) -
      counts.values.map(c => c * math.log(c.toDouble)).sum / n
    assert(math.abs(row.getDouble(4) - entropy) < 5e-4, "entropy")
    val ranked = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(Curation.ZipfRanks)
    val xy = ranked.zipWithIndex.map { case ((_, c), i) =>
      (math.log(i + 1.0), math.log(c.toDouble)) }
    val nr = xy.length.toDouble
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val (sxy, sxx) = (xy.map(p => p._1 * p._2).sum, xy.map(p => p._1 * p._1).sum)
    val slope = (nr * sxy - sx * sy) / (nr * sxx - sx * sx)
    assert(math.abs(row.getDouble(5) - slope) < 5e-4, "zipf slope")
    assert(slope < 0, "a Zipf slope is negative")
  }
}
