package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainingData

/** Pins the corpus-scaled B58/e2e codebook rule (r16): membership is
  * exactly `vec_id % AnnCodebookStride == 0`, BOTH graded oracles
  * carry the same interpolated predicate (so the Scala rule and the
  * SQL rule cannot drift apart), and cell occupancy stays in the
  * constant ≈ stride/4 band the linear-candidate claim rests on — a
  * future data drop whose embeddings collapse toward one cell would
  * fail here instead of silently re-growing the quadratic term at
  * scale (measured max occupancy 39/58 vs mean 31/39 at the two gate
  * SFs; skew ~1.5× stable through 20×, PLANS.md r16). */
class AnnCodebookSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val stride = TrainingData.AnnCodebookStride

  private def prepped(dir: String) =
    sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))

  test("codebook membership is the stride rule, nonempty at the smallest SF") {
    val emb = prepped("/root/testdata/sf0.001")
    val ids = TrainingData.annCodebook(emb)
      .select("c_id").collect().map(_.getLong(0)).sorted
    val all = emb.select("vec_id").collect().map(_.getLong(0))
    assert(ids.toSeq == all.filter(_ % stride == 0).sorted.toSeq)
    assert(ids.nonEmpty, "vec_id 0 guarantees at least one centroid")
    assert(ids.contains(0L))
  }

  test("all five graded oracles carry the SAME stride predicate as the Scala constant") {
    for (op <- Seq("op_ann_incremental", "op_incremental_e2e",
        "op_similarity_ivf", "op_ann_recall", "op_semdedup")) {
      val sql = SparkEntry.oracleSql(op)
      assert(sql.contains(s"% $stride = 0"),
        s"$op oracle lost the interpolated stride predicate")
      assert(!sql.contains("BETWEEN 100 AND 107"),
        s"$op oracle still carries the r15 fixed-literal codebook")
    }
  }

  test("history cell occupancy stays in the constant ~stride/4 band at both gate SFs") {
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = prepped(dir)
      val (history, _, cents) = TrainingData.annSplit(emb)
      val occ = TrainingData.ivfAssignWith(history, cents)
        .groupBy("cell").count().select("count")
        .collect().map(_.getLong(0))
      val maxOcc = occ.max
      val mean = occ.sum.toDouble / cents.count()
      // 3x margin over the MEASURED mean (history/K), not a fixed
      // stride bound: at sf0.01 history (125) < stride (157), so an
      // absolute bound would pass even under total single-cell
      // collapse — exactly the regression this test exists to catch.
      // Measured skew is 1.25-1.57x across four corpora (PLANS r16);
      // 3x gives ~2x headroom while a collapse (skew = K) fails.
      assert(maxOcc <= 3 * mean,
        s"$dir: max cell occupancy $maxOcc exceeds 3x the mean $mean — " +
          "codebook no longer bounds per-cell candidate work")
    }
  }
}
