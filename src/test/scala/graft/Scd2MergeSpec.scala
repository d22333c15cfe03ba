package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** B100 `op_scd2_merge` — slowly-changing-dimension type-2 merge.
  * Pins:
  *
  *  1. hand corpus: true change closes v1 and opens v2; NO-OP update
  *     does not version (the classic SCD2 bug); unknown key inserts;
  *     untouched key carries;
  *  2. graded invariants: exactly one is_current row per key; closed
  *     rows pair 1:1 with update rows; no-op keys (13s not 7s) carry;
  *  3. determinism across reruns. */
class Scd2MergeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("hand corpus: change/no-op/insert/carry verdicts") {
    import spark.implicits._
    val dim = Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("key", "bal")
    val changes = Seq((1L, 150L), (2L, 200L), (9L, 900L)).toDF("key", "nbal")
    val got = api.Graft.scd2Merge(dim, changes)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getBoolean(3), r.getString(4))).sortBy(x => (x._1, x._2))
    assert(got.toSeq == Seq(
      (1L, 1, 100L, false, "closed"),
      (1L, 2, 150L, true, "update"),
      (2L, 1, 200L, true, "carry"),   // no-op: same value, no version
      (3L, 1, 300L, true, "carry"),
      (9L, 1, 900L, true, "insert")))
  }

  test("graded invariants on the customer dimension") {
    val out = Relational.scd2Merge(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3), r.getString(4)))
    // exactly one current row per key
    out.groupBy(_._1).foreach { case (k, rows) =>
      assert(rows.count(_._4) == 1, s"key $k current rows: $rows")
    }
    val byChange = out.groupBy(_._5).view.mapValues(_.length).toMap
    assert(byChange("closed") == byChange("update"), "closed/update must pair")
    assert(byChange.getOrElse("insert", 0) > 0 && byChange("carry") > 0)
    // no-op keys (13s not 7s) must carry, not version
    out.filter(x => x._1 % 13 == 0 && x._1 % 7 != 0 && x._1 < 1000000000L)
      .foreach { x => assert(x._5 == "carry", s"no-op key must not version: $x") }
    // changed keys carry exactly versions 1 and 2
    out.filter(_._5 == "update").foreach { x =>
      assert(x._2 == 2 && x._4, s"update row must be current v2: $x") }
  }

  test("duplicate change rows for one key fail loudly (MERGE semantics)") {
    import spark.implicits._
    val dim = Seq((1L, 100L)).toDF("key", "bal")
    val dup = Seq((1L, 150L), (1L, 175L)).toDF("key", "nbal")
    val e = intercept[Exception] {
      api.Graft.scd2Merge(dim, dup).collect()
    }
    assert(e.getMessage.contains("duplicate change rows") ||
      Option(e.getCause).exists(_.getMessage.contains("duplicate change rows")),
      s"expected the loud MERGE guard, got: ${e.getMessage}")
  }

  test("deterministic") {
    val a = Relational.scd2Merge(spark, dir).collect().map(_.toString)
    val b = Relational.scd2Merge(spark, dir).collect().map(_.toString)
    assert(a.sameElements(b))
  }
}
