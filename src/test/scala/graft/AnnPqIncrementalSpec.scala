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

  test("probe-side history blocks are codebook reconstructions") {
    val emb = sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
    val cbBlocks = TrainingData.pqCodebook(emb).collect()
      .flatMap(r => r.getSeq[Double](1).grouped(8).map(_.toVector)).toSet
    assert(cbBlocks.size == 32, "4 centroids x 8 blocks")
    val recon = TrainingData.pqReconstruct(
      emb.filter(col("vec_id") % 4 === 0), TrainingData.pqCodebook(emb)).collect()
    assert(recon.nonEmpty)
    recon.foreach { r =>
      r.getSeq[Double](1).grouped(8).zipWithIndex.foreach { case (blk, b) =>
        assert(cbBlocks.contains(blk.toVector),
          s"vec ${r.getLong(0)} block $b is not a codebook block")
      }
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
    // measured 0.29 at sf0.01 / uniform-embedding worst case (B51's
    // full-corpus pq leg measures 0.03 on the same corpus); floor set
    // well under the measured gate value but far above collapse
    assert(recall >= 0.10, f"pq recall collapsed: $recall%.4f")
  }
}
