package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.TrainingData

/** B90 `op_domain_cap` — per-domain frequency capping. Pins:
  *
  *  1. the cap: the planted mega-domain comes out at EXACTLY
  *     DomainCap rows, every legit source survives whole at gate SF;
  *  2. unbiased selection: the mega-domain's survivors are the
  *     hash-order sample, NOT the lowest-id prefix (the naive
  *     ORDER BY id would keep the oldest crawl slice);
  *  3. the scale plan: the rank-≤-cap filter plans as
  *     WindowGroupLimit — map-side partial top-K per domain, so the
  *     hot domain ships its cap per task, never its crawl;
  *  4. api.Graft.capDomains agrees with an independent scala
  *     recomputation on a hand corpus; determinism. */
class DomainCapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("mega-domain capped exactly; legit sources whole; deterministic") {
    val out = TrainingData.domainCap(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("boilerplate-farm") == TrainingData.DomainCap,
      s"mega-domain kept ${bySrc("boilerplate-farm")} docs")
    val legit = sources.Tables.documents(spark, dir)
      .filter(col("doc_id") % 3 === 0)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    legit.foreach { case (s, n) =>
      assert(bySrc(s).toLong == math.min(n, TrainingData.DomainCap.toLong),
        s"source $s kept ${bySrc(s)} of $n")
    }
    assert(out.forall(_._3 <= TrainingData.DomainCap))
    val again = TrainingData.domainCap(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.sameElements(again))
  }

  test("survivors are the hash sample, not the lowest-id prefix") {
    val farmIds = TrainingData.domainCap(spark, dir).collect()
      .filter(_.getString(1) == "boilerplate-farm").map(_.getLong(0)).sorted
    val allFarm = sources.Tables.documents(spark, dir)
      .filter(col("doc_id") % 3 =!= 0).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    val prefix = allFarm.take(TrainingData.DomainCap)
    assert(!farmIds.sameElements(prefix),
      "hash-ranked survivors must differ from the oldest-id prefix")
    assert(farmIds.toSet.subsetOf(allFarm.toSet))
  }

  test("the rank filter plans as WindowGroupLimit (map-side partial top-K)") {
    val p = TrainingData.domainCap(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"cap must plan the partial per-key limit:\n${p.take(2000)}")
  }

  test("api.Graft.capDomains: hand corpus vs independent recomputation") {
    import spark.implicits._
    def md5Of(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = (1L to 9L).map(i => (i, if (i <= 6) "big" else "small"))
    val got = api.Graft.capDomains(rows.toDF("doc_id", "source"), cap = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sorted
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (s, rs) =>
      rs.sortBy(r => (md5Of(r._1.toString), r._1)).take(2).zipWithIndex
        .map { case ((id, src), i) => (id, src, i + 1) }
    }.sorted
    assert(got.toSeq == expected)
  }
}
