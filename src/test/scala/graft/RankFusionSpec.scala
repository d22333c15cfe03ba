package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainingData

/** B89 `op_rank_fusion` — reciprocal-rank fusion of the three index
  * rankings. Pins:
  *
  *  1. EXACT integer algebra: every fused score recomputes in plain
  *     scala from the legs' (method, q_id, vec_id, rank) rows — the
  *     op's rrf/n_methods/f_rank/in_exact columns match the
  *     independent fold row-for-row (no float ever crosses an engine
  *     or spec boundary);
  *  2. the claim RRF actually makes (Cormack et al. 2009 §3): fused
  *     recall ≥ the MEAN of the input rankers' recalls — NOT "beats
  *     the best"; with two weak rankers in the panel the fusion
  *     measures 0.27–0.37 vs ivf's 0.33–0.57 here, and a spec
  *     asserting best-dominance would be pinning a falsehood;
  *  3. consensus ordering: a vector ranked by MORE methods at equal
  *     best-rank cannot lose to a single-method pick whose rank is no
  *     better (monotonicity of the contribution sum);
  *  4. determinism: reruns identical. */
class RankFusionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def contrib(rank: Int): Long = TrainingData.RrfM / (TrainingData.RrfK + rank)

  test("fused scores recompute exactly from the legs; flags match") {
    val (exactDf, methodsDf) = TrainingData.annLegsRanked(spark, dir)
    val exact = exactDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val methods = methodsDf.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // independent fold: integer contributions per (q, v)
    val fused = methods.groupBy(m => (m._2, m._3)).map { case ((q, v), ms) =>
      (q, v, ms.map(m => contrib(m._4)).sum, ms.size)
    }.toSeq
    val expected = fused.groupBy(_._1).flatMap { case (q, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex.map {
        case ((_, v, rrf, nm), i) =>
          (q, i + 1, v, rrf, nm, exact.contains((q, v)))
      }
    }.toSeq.sorted
    val got = TrainingData.rankFusion(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getBoolean(5))).toSeq.sorted
    assert(got == expected, "op output must equal the independent integer fold")
  }

  test("fused recall >= the mean of the input rankers' recalls") {
    val recalls = TrainingData.annRecall(spark, dir).collect()
      .groupBy(_.getString(0)).view
      .mapValues(rs => rs.map(_.getDouble(4)).sum / rs.length).toMap
    val mean = recalls.values.sum / recalls.size
    val fusedRows = TrainingData.rankFusion(spark, dir).collect()
    val fusedRecall = fusedRows.count(_.getBoolean(5)).toDouble / fusedRows.length
    info(f"fused recall $fusedRecall%.4f vs ranker mean $mean%.4f " +
      f"(singles: ${recalls.map { case (k, v) => f"$k=$v%.2f" }.mkString(", ")})")
    assert(fusedRecall >= mean,
      f"RRF fell below its own claim: fused $fusedRecall%.4f < mean $mean%.4f")
  }

  test("consensus monotonicity and rerun determinism") {
    val rows = TrainingData.rankFusion(spark, dir).collect()
    // scores strictly ordered within each query by (rrf desc, vec asc)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(3) > b.getLong(3) ||
            (a.getLong(3) == b.getLong(3) && a.getLong(2) < b.getLong(2)),
            s"q=$q fused order violates (rrf desc, vec asc)")
        case _ =>
      }
    }
    // every rrf value must be a sum of 1..3 rank contributions —
    // MULTISETS, not distinct ranks: two methods may rank the same
    // vector at the same position
    val single = (1 to 3).map(contrib)
    val possible = (single ++
      (for (a <- single; b <- single) yield a + b) ++
      (for (a <- single; b <- single; c <- single) yield a + b + c)).toSet
    rows.foreach { r =>
      assert(possible.contains(r.getLong(3)),
        s"rrf ${r.getLong(3)} is not a legal contribution sum")
      assert(r.getInt(4) >= 1 && r.getInt(4) <= 3)
    }
    val again = TrainingData.rankFusion(spark, dir).collect()
    assert(rows.sameElements(again), "fusion must be rerun-stable")
  }

  test("api.Graft.fuseRankings: hand panel, exact integers, rank domain") {
    import spark.implicits._
    // two methods over one query: doc 7 ranked 1st by both must beat
    // doc 8 (one 1st) and doc 9 (one 2nd); k=10, maxRank=2 → M=11·12
    val panel = Seq(
      ("a", 1L, 7L, 1), ("a", 1L, 9L, 2),
      ("b", 1L, 7L, 1), ("b", 1L, 8L, 1),
      ("b", 1L, 5L, 9)) // rank past maxRank: ignored
      .toDF("method", "q_id", "id", "rank")
    val out = api.Graft.fuseRankings(panel, k = 10, topN = 3, maxRank = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .sortBy(_._1)
    val m = 11L * 12L
    assert(out.toSeq == Seq(
      (1, 7L, 2 * (m / 11), 2),
      (2, 8L, m / 11, 1),
      (3, 9L, m / 12, 1)))
    // the exact-integer scale must fail fast on Long overflow rather
    // than silently wrapping the ordering (r20 review)
    val e = intercept[IllegalArgumentException] {
      api.Graft.fuseRankings(panel, k = 60, maxRank = 40)
    }
    assert(e.getMessage.contains("overflows"))
  }
}
