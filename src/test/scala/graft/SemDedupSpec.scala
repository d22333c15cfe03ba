package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainingData

/** B60 `op_semdedup` — cluster-scoped semantic dedup (SemDeDup,
  * Abbas et al. 2023, arXiv:2303.09540): pins the keep/rep contract
  * (drop the higher id of any same-cell pair with rounded cosine ≥
  * SemDedupTau; rep = lowest-id qualifying neighbor; kept vectors are
  * their own rep), the planted-duplicate recall (every perturbed B27
  * copy must die against its original), and the family separation
  * (the semantic threshold sits strictly below the near-dup 0.995 and
  * the clustering is the SAME corpus-scaled stride codebook as the
  * B58 family — one quantizer rule across the engine). */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val out = TrainingData.semDedup(spark, dir).collect()

  test("one row per corpus vector; kept iff self-representative; rep never above own id") {
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    out.foreach { r =>
      val (id, rep, kept) = (r.getLong(0), r.getLong(2), r.getBoolean(3))
      assert(rep <= id)
      assert(kept == (rep == id), s"vec $id: kept=$kept but rep=$rep")
    }
  }

  test("every CO-LOCATED planted copy dies against its original; only cell-straddlers survive") {
    // Cluster-scoped dedup's one recall limit (named in the SemDeDup
    // paper): a pair whose members assign to DIFFERENT cells is never
    // compared. The +0.01 perturbation flips the argmax for a small
    // number of boundary vectors (2 of 100 at sf0.001) — those and
    // ONLY those copies may survive; every same-cell copy must die
    // against exactly its original.
    val cellOf = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val copies = out.filter(_.getLong(0) % 2 == 1)
    assert(copies.nonEmpty)
    var straddlers = 0
    copies.foreach { r =>
      val (id, rep, kept) = (r.getLong(0), r.getLong(2), r.getBoolean(3))
      if (cellOf(id) == cellOf(id - 1)) {
        assert(!kept, s"co-located planted copy $id survived")
        assert(rep == id - 1, s"copy $id rep=$rep, expected its original")
      } else {
        assert(kept, s"cell-straddling copy $id was dropped — against what?")
        straddlers += 1
      }
    }
    // recall stays high: straddlers are a boundary-measure minority
    assert(straddlers <= copies.length / 10,
      s"$straddlers/${copies.length} planted pairs straddle cells — clustering degenerated")
    // and nothing else dies on this synthetic corpus: the only
    // ≥ tau-cosine pairs are the planted ones
    assert(out.count(r => !r.getBoolean(3)) == copies.length - straddlers)
  }

  test("a dropped vector shares its cell with its representative") {
    val cellOf = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.filter(r => !r.getBoolean(3)).foreach { r =>
      assert(cellOf(r.getLong(2)) == r.getLong(1),
        s"vec ${r.getLong(0)}: rep ${r.getLong(2)} in a different cell")
    }
  }

  test("semantic threshold sits strictly below the near-dup family's bar") {
    assert(TrainingData.SemDedupTau < 0.995)
  }

  test("cells are the shared stride-codebook centroids") {
    val stride = TrainingData.AnnCodebookStride
    val cells = out.map(_.getLong(1)).distinct
    assert(cells.forall(_ % stride == 0))
    val sql = SparkEntry.oracleSql("op_semdedup")
    assert(sql.contains(s"% $stride = 0"),
      "op_semdedup oracle lost the interpolated stride predicate")
  }
}
