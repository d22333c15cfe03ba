package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relational, TrainingData}

/** Semantic pins for the late round-4 analytics ops beyond what the
  * DuckDB oracle already hash-verifies: PQ's fixed points, and the
  * funnel's order/window rules on a hand-built event sequence. */
class AnalyticsOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("vector PQ: trained-codebook fixed point — cluster means quantize to zero error") {
    // hand corpus: 4 well-separated 64-dim prototypes (ids 0..3 — the
    // Lloyd init picks exactly these) each repeated 5x; every cluster
    // mean IS its prototype (6-dp-representable coordinates, so the
    // mean quantization is exact), so after training every vector
    // must code to its own family's entry in all 8 blocks with MSE 0
    val protos = Array.tabulate(4)(p =>
      Array.tabulate(64)(d => if (d % 4 == p) 2.0 else 0.25 * p))
    val rows = for (p <- 0 until 4; c <- 0 until 5)
      yield ((p + 4 * c).toLong, protos(p).toSeq)
    val emb = rows.toDF("vec_id", "e")
    val out = TrainingData.vectorPqOf(emb).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(out.size == 20)
    rows.foreach { case (id, _) =>
      val fam = (id % 4).toInt // family p has ids p, p+4, p+8, ...
      val (code, mse) = out(id)
      assert(code == fam.toString * 8,
        s"vec $id must code to family $fam in all 8 blocks (got $code)")
      assert(mse == 0.0, s"vec $id mse $mse — prototype must reconstruct exactly")
    }
    // and on the graded corpus: codes stay in the k=4 alphabet, MSE
    // is nonnegative, and SOME error exists (real quantization)
    val graded = TrainingData.vectorPq(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(1), r.getDouble(2)))
    assert(graded.forall(_._1.forall(c => c >= '0' && c <= '3')))
    assert(graded.forall(_._2 >= 0.0) && graded.exists(_._2 > 0.0))
  }

  test("funnel: event order and the 1h conversion window are both enforced") {
    def t(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // user 1: full in-order, in-window conversion -> stage 3
      (1L, "view", t("2024-01-01 10:00:00")),
      (1L, "click", t("2024-01-01 10:30:00")),
      (1L, "purchase", t("2024-01-01 11:00:00")),
      // user 2: click BEFORE the first view -> stalls at stage 1
      (2L, "click", t("2024-01-01 09:00:00")),
      (2L, "view", t("2024-01-01 10:00:00")),
      (2L, "purchase", t("2024-01-01 10:30:00")), // purchase needs a counted click
      // user 3: click arrives 2h after the view (outside the window) -> stage 1
      (3L, "view", t("2024-01-01 10:00:00")),
      (3L, "click", t("2024-01-01 12:00:00")),
      // user 4: converts to click, purchase outside ITS window -> stage 2
      (4L, "view", t("2024-01-01 10:00:00")),
      (4L, "click", t("2024-01-01 10:10:00")),
      (4L, "purchase", t("2024-01-01 11:30:00")),
      // user 5: never views -> stage 0
      (5L, "click", t("2024-01-01 10:00:00")))
      .toDF("user_id", "event_type", "tsec")

    // the op's own chain, over the hand-built frame
    val stages = Relational.funnelStages(events)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(stages === Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 0))
  }

  test("funnel op on the corpus: stage counts cover all users exactly once") {
    val rows = Relational.funnel(spark, "/root/testdata/sf0.01").collect()
      .map(r => r.getInt(0) -> r.getLong(1))
    val nUsers = graft.sources.Tables.events(spark, "/root/testdata/sf0.01")
      .select("user_id").distinct().count()
    assert(rows.map(_._2).sum === nUsers, "funnel stages must partition the users")
    assert(rows.map(_._1).distinct.length === rows.length)
  }
}
