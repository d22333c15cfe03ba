package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.TrainingData

/** B87 `op_epoch_export` — epoch materialization: B84's repeat
  * manifest × explode-by-n_copies × the B41-derived shard key. Pins:
  *
  *  1. conservation — the exploded epoch carries EXACTLY the
  *     manifest's Σ n_copies rows, and its token mass stays within
  *     B84's 5 % budget-drift bound of the corpus (measured 1.0006×
  *     at the gate corpus);
  *  2. shard key spreads copies — a repeat-heavy doc's copies land in
  *     more than one shard (the anti-adjacent-duplicates property the
  *     ':copy' extension of the B41 key exists for), and per-shard
  *     token mass stays within [0.5, 2.0]× the mean (measured
  *     0.72–1.43 at sf0.01 — 16-way md5 noise, not skew);
  *  3. downsampled docs (n_copies = 0) are absent from the epoch;
  *  4. determinism — reruns identical (the B57 contract carried
  *     through materialization). */
class EpochExportSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("conservation: rows == manifest copies, token mass within 5% of corpus") {
    val manifest = TrainingData.mixtureApply(spark, dir)
    val expectedRows = manifest.agg(sum("n_copies")).head().getLong(0)
    val expectedTok = manifest
      .agg(sum(col("n_copies").cast("long") * col("n_tok"))).head().getLong(0)
    val out = TrainingData.epochExport(spark, dir)
    val (gotRows, gotTok) = {
      val r = out.agg(sum("n_copies"), sum("sum_tok")).head()
      (r.getLong(0), r.getLong(1))
    }
    assert(gotRows == expectedRows, "explode must lose/invent no copies")
    assert(gotTok == expectedTok, "per-shard token mass must roll up exactly")
    val corpusTok = operators.TrainingData
      .mixtureApply(spark, dir).agg(sum("n_tok")).head().getLong(0)
    val drift = math.abs(gotTok.toDouble / corpusTok - 1.0)
    assert(drift <= 0.05, f"epoch token budget drifted $drift%.4f > 5%%")
  }

  test("shard key spreads a repeat-heavy doc's copies across shards") {
    import spark.implicits._
    // 1 doc of a rare language among many en docs → its repeat factor
    // is large → many copies; they must not co-shard
    val corpus = ((1L to 40L).map(i => (i, "en", s"the quick brown fox $i jumps")) :+
      (99L, "xx", "rare tongue")).toDF("doc_id", "lang", "text")
    val copies = TrainingData.epochMaterialize(corpus)
    val rare = copies.filter($"doc_id" === 99L)
    val n = rare.count()
    assert(n >= 4, s"rare doc should repeat (got $n copies)")
    val nShards = rare.select("shard").distinct().count()
    assert(nShards >= 2,
      s"$n copies of one doc landed in $nShards shard(s) — adjacent duplicates")
  }

  test("per-shard balance within [0.5, 2.0]x mean; zero-copy docs absent") {
    val out = TrainingData.epochExport(spark, dir).collect()
    val perShard = out.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(4)).sum).toMap
    val mean = perShard.values.sum.toDouble / perShard.size
    perShard.foreach { case (s, tok) =>
      val ratio = tok / mean
      assert(ratio >= 0.5 && ratio <= 2.0,
        f"shard $s token mass $ratio%.3fx mean outside [0.5, 2.0]")
    }
    // any doc the manifest downsamples to zero must not appear in the
    // per-copy frame
    val dropped = TrainingData.mixtureApply(spark, dir)
      .filter(col("n_copies") === 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val docsInEpoch = TrainingData.epochMaterialize(
      graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"), col("text")))
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(dropped.intersect(docsInEpoch).isEmpty,
      "downsampled (n_copies = 0) docs must be absent from the epoch")
  }

  test("determinism: reruns identical") {
    val a = TrainingData.epochExport(spark, dir).collect()
    val b = TrainingData.epochExport(spark, dir).collect()
    assert(a.sameElements(b), "epoch export must be rerun-stable")
  }
}
