package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.TrainingData

/** B83 `op_ann_pq_incremental` — the compressed (IVF-PQ/ADC)
  * incremental probe. Pins the contracts that make the compressed
  * layout deployable:
  *
  *  1. the probe never touches an original history vector: every
  *     8-dim block of the probe-side history representation is one of
  *     the 4 codebook blocks (a reconstruction, not the original);
  *  2. planted re-posts still surface: an identical batch vector
  *     finds its history original in its top-3 — compression must not
  *     break the incremental-dedup use;
  *  3. the fidelity cost is MEASURED (the B51 "measure, don't guess"
  *     contract): recall@3 vs the exact-vector probe (B58) on the
  *     gate corpus stays above a pinned floor — a codebook/encode
  *     rewrite that silently collapses recall fails here;
  *  4. geometry parity with B58: same batch set, same per-batch row
  *     counts (compression changes scores, not the candidate sets). */
class AnnPqIncrementalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def hits(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("probe-side history blocks are codebook reconstructions (per block)") {
    val emb = sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
    // since r20 the codebook is per-block TRAINED: (b, c_id, csub) —
    // a reconstruction's block b must be one of block b's OWN entries
    // (strictly tighter than the old any-block membership)
    val cb = TrainingData.pqCodebook(emb).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](2).toVector))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(cb.size == 8 && cb.values.forall(_.size == TrainingData.PqK),
      "8 blocks x k trained entries")
    val recon = TrainingData.pqReconstruct(
      emb.filter(col("vec_id") % 4 === 0), TrainingData.pqCodebook(emb)).collect()
    assert(recon.nonEmpty)
    recon.foreach { r =>
      r.getSeq[Double](1).grouped(8).zipWithIndex.foreach { case (blk, b) =>
        assert(cb(b).contains(blk.toVector),
          s"vec ${r.getLong(0)} block $b is not one of block $b's codebook entries")
      }
    }
  }

  test("pq oracles derive the codebook by the shared Lloyd chain, not fixed vectors") {
    for (op <- Seq("op_vector_pq", "op_ann_recall", "op_ann_pq_incremental")) {
      val sql = SparkEntry.oracleSql(op)
      assert(!sql.contains("BETWEEN 100 AND 103"),
        s"$op oracle still carries the r16-r19 fixed-vector codebook")
      assert(sql.contains("pqinit") && sql.contains("pqc2"),
        s"$op oracle lost the shared trained-codebook CTE chain")
    }
  }

  test("planted re-posts surface against their originals through ADC") {
    val pq = hits(TrainingData.annPqIncremental(spark, dir))
    val reposts = pq.keys.filter(_ % 2 == 1).toSeq
    assert(reposts.nonEmpty)
    reposts.foreach { b =>
      assert(pq(b).contains(b - 1),
        s"re-post $b must find its original ${b - 1} in its top-3")
    }
  }

  test("measured recall@3 vs the exact probe holds the pinned floor") {
    val exact = hits(TrainingData.annIncremental(spark, dir))
    val pq = hits(TrainingData.annPqIncremental(spark, dir))
    assert(exact.keySet == pq.keySet,
      "compression must not change the probed batch set")
    val (hit, tot) = exact.foldLeft((0, 0)) { case ((h, t), (b, ex)) =>
      (h + (ex & pq(b)).size, t + ex.size)
    }
    val recall = hit.toDouble / tot
    info(f"pq-vs-exact recall@3 = $recall%.4f over ${exact.size} batch vectors")
    // trained codebook (r20): measured 0.296 at sf0.001 / 0.298 at
    // sf0.01 — at or above the fixed-vector stand-in's 0.27–0.29, and
    // B51's full-corpus pq leg improved 0.03 → 0.10 on the same
    // uniform worst case. The r19 verdict contract pins the floor at
    // the pre-training measurement: training must never COST recall
    assert(recall >= 0.27, f"pq recall dropped below the trained floor: $recall%.4f")
  }
}
