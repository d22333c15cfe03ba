package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** B103 `op_join_bloom` — the graded runtime-filter. Pins:
  *
  *  1. soundness: n_missed = 0 (no true-join row may fail the bloom)
  *     and n_pass = n_true + n_false_pass;
  *  2. the filter actually filters: with a selective dim predicate,
  *     n_pass < n_fact (some non-matching rows are pruned at the
  *     scan) and fp_rate is well under 1;
  *  3. the probe is map-side: no exchange sits between the scan and
  *     the bloom projection (the pass flag must be computable before
  *     any shuffle);
  *  4. api.Graft.bloomPrefilter keeps every matching row and drops
  *     pruned rows on a hand corpus. */
class JoinBloomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("soundness + ledger arithmetic + the filter filters") {
    val r = Relational.joinBloom(spark, dir).collect()(0)
    val (nFact, nDim, nPass, nTrue, nFp, nMiss, fpRate) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))
    assert(nMiss == 0L, "bloom may never miss a true join row")
    assert(nPass == nTrue + nFp)
    assert(nDim > 0 && nTrue > 0)
    assert(nPass < nFact, "a selective dim predicate must prune fact rows")
    assert(fpRate < 0.05, s"2^16 bits over a small dim: fp should be tiny, got $fpRate")
  }

  test("api.Graft.bloomPrefilter: matching rows kept, most others pruned") {
    import spark.implicits._
    val fact = (1L to 1000L).map(Tuple1(_)).toDF("k")
    val dim = Seq(10L, 20L, 30L).map(Tuple1(_)).toDF("k")
    val kept = api.Graft.bloomPrefilter(fact, "k", dim, "k")
      .select("k").as[Long].collect().toSet
    assert(Set(10L, 20L, 30L).subsetOf(kept), "no false negatives")
    assert(kept.size < 100, s"bloom must prune nearly everything: ${kept.size}")
  }
}
