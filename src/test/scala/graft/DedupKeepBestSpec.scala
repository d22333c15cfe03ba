package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LlmPipeline

/** B85 `op_dedup_keep_best` — canonical selection by quality. Pins:
  *
  *  1. exactly one keeper per component, and the keeper is the
  *     (logit desc, doc_id asc) argmax — recomputed independently
  *     from the output's own columns;
  *  2. quality genuinely decides: at least one cluster's keeper is
  *     NOT the minimum doc_id (the member B17b's min-id rule would
  *     have kept);
  *  3. the (doc_id, component, csize) universe is exactly
  *     op_dedup_cc's — the closure is shared, only the policy layer
  *     differs. */
class DedupKeepBestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Dir = "/root/testdata/sf0.001"

  test("one keeper per component, argmax by (logit desc, id asc)") {
    val rows = LlmPipeline.dedupKeepBest(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (comp, members) =>
      val keepers = members.filter(_._5)
      assert(keepers.length == 1, s"component $comp keepers ${keepers.length}")
      val expected = members.minBy(m => (-m._4, m._1))
      assert(keepers.head._1 == expected._1,
        s"component $comp kept ${keepers.head._1}, argmax is ${expected._1}")
      assert(members.forall(_._3 == members.length),
        s"component $comp csize mismatch")
    }
  }

  test("quality decides: some keeper is not the min-id member") {
    val rows = LlmPipeline.dedupKeepBest(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(4)))
    val overruled = rows.groupBy(_._2).count { case (_, members) =>
      members.filter(_._3).head._1 != members.map(_._1).min
    }
    assert(overruled >= 1,
      "no cluster's quality argmax differs from the min id — test is vacuous")
  }

  test("universe matches op_dedup_cc exactly") {
    val kb = LlmPipeline.dedupKeepBest(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val cc = LlmPipeline.dedupCc(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(kb == cc, "keep-best must grade the same closure universe")
  }
}
