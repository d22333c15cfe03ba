package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.TrainingData

/** B98 `op_k_anonymity` — generalization-ladder risk report. Pins:
  *
  *  1. hand corpus vs independent recomputation at every level
  *     (group sizes, risky counts, the GROUPING_ID level encoding);
  *  2. monotonicity: generalizing can only merge groups, so
  *     risky_docs is non-increasing up the ladder on any input;
  *  3. the graded corpus emits exactly the 4 rollup levels
  *     (0, 1, 3, 7) and the corpus level (7) is never risky at gate
  *     SF;
  *  4. the plan: ONE Expand + hash aggregate, not one scan per level. */
class KAnonymitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("hand corpus vs independent recomputation") {
    import spark.implicits._
    val rows = Seq(
      ("en", "a", 1L), ("en", "a", 1L), ("en", "a", 1L),
      ("en", "b", 1L),
      ("zh", "a", 2L), ("zh", "a", 2L))
    val got = api.Graft.kAnonymity(rows.toDF("lang", "source", "len_b"),
        Seq("lang", "source", "len_b"), k = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    // level 0 groups: (en,a,1)=3, (en,b,1)=1, (zh,a,2)=2 -> risky: 2 groups, 3 docs
    // level 1 (len_b rolled): (en,a)=3, (en,b)=1, (zh,a)=2 -> risky 2 groups, 3 docs
    // level 3 (source+len_b): en=4, zh=2 -> risky 1 group, 2 docs
    // level 7: corpus=6 -> no risk
    assert(got.toSeq == Seq(
      (0, 3, 2, 3L, 1L), (1, 3, 2, 3L, 1L), (3, 2, 1, 2L, 2L), (7, 1, 0, 0L, 6L)))
  }

  test("monotonicity + graded levels on the documents corpus") {
    val out = TrainingData.kAnonymity(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(3)))
    assert(out.map(_._1).toSeq == Seq(0, 1, 3, 7))
    val byLevel = out.toMap
    assert(byLevel(1) <= byLevel(0) && byLevel(3) <= byLevel(1) &&
      byLevel(7) <= byLevel(3), s"risk must shrink up the ladder: $out")
    assert(byLevel(7) == 0L, "the corpus level cannot be risky at gate SF")
  }

  test("plan: one Expand + aggregate, not a scan per level") {
    val plan = TrainingData.kAnonymity(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan.take(1500))
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1)
  }
}
