package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Curation

/** B70 hot-key hardening (VERDICT r16 task 4 / r17 task 6): the
  * degenerate 100%-boiler corpus — every document IS the same
  * boilerplate — must produce the declared verdicts (everything
  * eligible scrubbed, every doc dropped) under BOTH line keys, and
  * the production `xxhash64` 8-byte key must agree with the
  * byte-exact string key row-for-row on the graded corpus too (the
  * B62 `hashGrams` contract applied to B70). The forced-shuffle /
  * AQE-skew-split evidence at volume lives in
  * tools.DedupLinesHotKeyProbe (PLANS.md r18). */
class DedupLinesHotKeySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** n docs, every one the SAME text: `lines` full 10-token blocks of
    * distinct words plus a 3-token tail (below LineMinTokens — must
    * survive even here). */
  private def boilerCorpus(n: Int, lines: Int): DataFrame = {
    val words = (0 until lines * 10).map(i => s"w$i").mkString(" ")
    val text = words + " tail tok end"
    spark.range(n).select(col("id").as("doc_id"), lit(text).as("text"))
  }

  private def run(c: DataFrame, hash: Boolean) =
    Curation.dedupLinesWith(c, hashLines = hash)
      .orderBy("doc_id")
      .select("doc_id", "n_lines", "n_dup", "text_clean", "kept")
      .collect()

  test("100%-boiler corpus: every eligible line scrubbed everywhere, both keys agree") {
    val c = boilerCorpus(200, 3)
    val s = run(c, hash = false)
    val h = run(c, hash = true)
    assert(s.toSeq == h.toSeq,
      "hash-key and string-key verdicts must agree row-for-row")
    assert(s.length == 200)
    s.foreach { r =>
      // 3 full lines + the 3-token tail = 4 blocks; the 3 eligible
      // ones are corpus-wide boilerplate, the sub-minTokens tail is
      // shielded by the min-span guard
      assert(r.getInt(1) == 4 && r.getInt(2) == 3,
        s"doc ${r.getLong(0)}: expected 3 of 4 lines duplicated, got $r")
      assert(r.getString(3) == "tail tok end")
      assert(r.getBoolean(4), "the shielded tail keeps the doc alive")
    }
    // and with NO tail, every doc dies entirely
    val words = (0 until 20).map(i => s"v$i").mkString(" ")
    val dead = spark.range(50).select(col("id").as("doc_id"), lit(words).as("text"))
    val d = run(dead, hash = true)
    assert(d.forall(r => !r.getBoolean(4) && r.getString(3).isEmpty),
      "a 100%-boiler doc with no shielded tail must be dropped outright")
  }

  test("graded corpus: hash key == string key row-for-row") {
    // the graded op's own planted corpus at the gate SF
    val base = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val corpus = base.select((col("doc_id") * 2).as("doc_id"), col("text"))
      .union(base.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") * 2 + 1).as("doc_id"),
          concat(lit(Curation.BoilerLine + " "), col("text")).as("text")))
    assert(run(corpus, hash = true).toSeq == run(corpus, hash = false).toSeq)
  }
}
