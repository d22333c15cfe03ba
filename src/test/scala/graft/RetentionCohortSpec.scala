package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** B101 `op_retention_cohort` — day-cohort retention matrix. Pins:
  *
  *  1. structural invariants on real events: offset-0 retention is
  *     exactly 1.0 for every cohort; n_active ≤ n_cohort everywhere;
  *     Σ n_cohort = distinct users;
  *  2. hand corpus with a known matrix (two cohorts, one partial
  *     retention, a gap day);
  *  3. determinism. */
class RetentionCohortSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("structural invariants on events") {
    val out = Relational.retentionCohort(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (c, rows) =>
      val r0 = rows.find(_._2 == 0).get
      assert(r0._3 == r0._4 && r0._5 == 1.0, s"cohort $c offset 0 must be 1.0: $r0")
      rows.foreach(r => assert(r._3 <= r._4, s"active > cohort: $r"))
    }
    val users = sources.Tables.events(spark, dir)
      .select("user_id").distinct().count()
    val cohortMass = out.filter(_._2 == 0).map(_._4.toLong).sum
    assert(cohortMass == users, s"cohorts must partition users: $cohortMass vs $users")
  }

  test("hand corpus with a known matrix") {
    import java.sql.Timestamp
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    // u1,u2 start Jan 1; u1 returns Jan 2 and Jan 4; u3 starts Jan 2
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00")), (2L, t("2024-01-01 11:00:00")),
      (1L, t("2024-01-02 09:00:00")), (3L, t("2024-01-02 12:00:00")),
      (1L, t("2024-01-04 23:00:00")), (1L, t("2024-01-04 23:30:00")))
      .toDF("user_id", "ts")
    // run the same plan over the hand frame by substituting the source
    val seen = ev.select(org.apache.spark.sql.functions.col("user_id"),
      org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts")).as("day")).distinct()
    import org.apache.spark.sql.functions._
    val f = seen.groupBy("user_id").agg(min("day").as("fday"))
    val coh = f.groupBy("fday").agg(count(lit(1)).cast("int").as("n_cohort"))
    val act = seen.join(f, Seq("user_id"))
      .groupBy(col("fday"), datediff(col("day"), col("fday")).as("day_offset"))
      .agg(count(lit(1)).cast("int").as("n_active"))
    val got = act.join(coh, Seq("fday"))
      .select(date_format(col("fday"), "yyyy-MM-dd").as("cohort"),
        col("day_offset"), col("n_active"), col("n_cohort"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .sortBy(x => (x._1, x._2))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0, 2, 2),   // u1, u2
      ("2024-01-01", 1, 1, 2),   // u1 returns
      ("2024-01-01", 3, 1, 2),   // u1 again (gap day 2 absent)
      ("2024-01-02", 0, 1, 1)))  // u3's own cohort
  }

  test("deterministic") {
    val a = Relational.retentionCohort(spark, dir).collect().map(_.toString)
    val b = Relational.retentionCohort(spark, dir).collect().map(_.toString)
    assert(a.sameElements(b))
  }
}
