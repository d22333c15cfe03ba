package graft

import org.scalatest.funsuite.AnyFunSuite

/** `api.Graft.annProbe` — the caller-trained-codebook form of the
  * graded op_ann_incremental (which shares the same core,
  * TrainingData.annProbeWith). Known-answer corpus: two well-separated
  * directions, a codebook cell on each, so cell confinement, cosine
  * ordering, tie-breaks, and topK truncation are all hand-checkable. */
class ApiAnnProbeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def df(rows: Seq[(Long, Array[Double])], emb: String) = {
    import spark.implicits._
    rows.toDF("vec_id", emb)
  }

  // axis-aligned codebook: cell 0 ≈ e1, cell 1 ≈ e2
  private lazy val cents = {
    import spark.implicits._
    Seq((0L, Array(1.0, 0.0, 0.0, 0.0)), (1L, Array(0.0, 1.0, 0.0, 0.0)))
      .toDF("c_id", "centroid")
  }

  private val history = Seq(
    2L -> Array(0.9, 0.1, 0.0, 0.0),   // cell 0
    4L -> Array(1.0, 0.05, 0.0, 0.0),  // cell 0, closest to pure e1
    6L -> Array(0.1, 1.0, 0.0, 0.0))   // cell 1
  private val batch = Seq(
    1L -> Array(0.95, 0.0, 0.0, 0.0),  // cell 0 probe
    3L -> Array(0.0, 1.0, 0.1, 0.0))   // cell 1 probe

  test("cell confinement + exact-cosine ordering + schema") {
    val out = api.Graft.annProbe(
      df(history, "embedding"), df(batch, "embedding"), cents)
    assert(out.columns.toSeq == Seq("batch_id", "rank", "hist_id", "score"))
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // batch 1 (cell 0): h4 beats h2 on cosine; h6 (cell 1) never appears
    // batch 3 (cell 1): only h6
    assert(rows.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((1L, 1, 4L), (1L, 2, 2L), (3L, 1, 6L)))
    val byRank = rows.filter(_._1 == 1L).sortBy(_._2).map(_._4)
    assert(byRank(0) > byRank(1), s"rank 1 must carry the higher cosine: $byRank")
  }

  test("topK truncates per batch id") {
    val out = api.Graft.annProbe(
      df(history, "embedding"), df(batch, "embedding"), cents, topK = 1)
    assert(out.collect().map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((1L, 4L), (3L, 6L)))
  }

  test("custom column names and integer ids are accepted") {
    import spark.implicits._
    val h = history.map { case (i, e) => (i.toInt, e) }.toDF("id", "vec")
    val b = batch.map { case (i, e) => (i.toInt, e) }.toDF("id", "vec")
    val out = api.Graft.annProbe(h, b, cents, idCol = "id", embCol = "vec")
    assert(out.count() == 3)
  }

  test("parity: the graded op is this core with the corpus-scaled stride codebook") {
    val dir = "/root/testdata/sf0.001"
    val expected = operators.TrainingData.annIncremental(spark, dir)
    // rebuild the op's history/batch/codebook through the PUBLIC api
    import org.apache.spark.sql.functions._
    val emb = sources.Tables.embeddings(spark, dir)
    val cb = emb.filter(col("vec_id") % operators.TrainingData.AnnCodebookStride === 0)
      .select(col("vec_id").as("c_id"), col("embedding").as("centroid"))
    val hist = emb.filter(col("vec_id") % 4 === 0)
      .select((col("vec_id") * 2).as("vec_id"), col("embedding"))
    val bat = emb.filter(col("vec_id") % 4 =!= 0)
      .select((col("vec_id") * 2).as("vec_id"), col("embedding"))
      .union(emb.filter(col("vec_id") % 8 === 0)
        .select((col("vec_id") * 2 + 1).as("vec_id"), col("embedding")))
    val got = api.Graft.annProbe(hist, bat, cb)
    assert(got.collect().toSeq == expected.collect().toSeq,
      "public annProbe with the op's inputs must reproduce the graded op exactly")
  }
}
