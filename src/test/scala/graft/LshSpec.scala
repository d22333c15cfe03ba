package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LlmPipeline, TrainingData}

/** Properties of the LSH similarity path (B27/B28) vs the exact kernel
  * (B18) on the sf0.001 fixtures. Everything here is deterministic:
  * fixed test data (seed=42) + fixed hyperplane literals. */
class LshSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("hyperplanes are deterministic and in [-1, 1)") {
    val h0 = TrainingData.hyperplane(0)
    assert(h0 == TrainingData.hyperplane(0))
    assert(TrainingData.hyperplane(3) != TrainingData.hyperplane(4))
    (0 until 8).foreach { k =>
      assert(TrainingData.hyperplane(k).forall(v => v >= -1.0 && v < 1.0))
    }
  }

  test("LSH top-k scores agree with the exact kernel for shared neighbors") {
    val exact = LlmPipeline.similarityTopk(spark, dir)
      .select(col("q_id"), col("vec_id"), col("score").as("exact_score"))
    val lsh = TrainingData.similarityLsh(spark, dir)
      .select(col("q_id"), col("vec_id"), col("score").as("lsh_score"))
    val joined = lsh.join(exact, Seq("q_id", "vec_id")).collect()
    assert(joined.nonEmpty, "at least one LSH neighbor should be in the exact top-5")
    joined.foreach { r =>
      assert(math.abs(r.getAs[Double]("lsh_score") - r.getAs[Double]("exact_score")) < 1e-9)
    }
  }

  test("IVF probe: scores agree with the exact kernel; recall reported") {
    val exact = LlmPipeline.similarityTopk(spark, dir)
      .select(col("q_id"), col("vec_id"), col("score").as("exact_score"))
    val ivf = TrainingData.similarityIvf(spark, dir)
      .select(col("q_id"), col("vec_id"), col("score").as("ivf_score"))
    val joined = ivf.join(exact, Seq("q_id", "vec_id")).collect()
    assert(joined.nonEmpty, "no IVF neighbor in the exact top-5 — probe path broken")
    joined.foreach { r =>
      assert(math.abs(r.getAs[Double]("ivf_score") - r.getAs[Double]("exact_score")) < 1e-9)
    }
    val exactSet = exact.select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfSet = ivf.select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = if (exactSet.isEmpty) 0.0 else
      ivfSet.intersect(exactSet).size.toDouble / exactSet.size
    info(f"IVF recall (3 of top-5, nprobe=1, K=8) over 10 queries: $recall%.3f")
    // floor, not tautology: measured 0.22 at this SF; a probe-path
    // regression (empty cells, broken assignment) lands at 0
    assert(recall > 0.05, f"IVF recall collapsed: $recall%.3f")
  }

  test("LSH recall vs exact top-5 is deterministic and reported") {
    val exact = LlmPipeline.similarityTopk(spark, dir)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TrainingData.similarityLsh(spark, dir)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = if (exact.isEmpty) 0.0 else lsh.intersect(exact).size.toDouble / exact.size
    info(f"LSH recall@ (3 of top-5) over 10 queries: $recall%.3f (bucketed candidates only)")
    // 8-bit buckets over ~500 vectors: tiny buckets, low recall by
    // design at this SF — the property is determinism + subset scoring,
    // the production trade is more/shorter bands.
    assert(recall >= 0.0 && recall <= 1.0)
    assert(lsh == TrainingData.similarityLsh(spark, dir)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet, "deterministic across runs")
  }

  test("op_ann_recall agrees with recall composed from the certified index ops") {
    // independent derivation: exact top-3 = op_similarity_topk at rank<=3;
    // index top-3 = op_similarity_lsh / op_similarity_ivf; recall =
    // per-query intersection / 3
    val exact3 = LlmPipeline.similarityTopk(spark, dir).filter(col("rank") <= 3)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // pq top-3 recomputed LOCALLY from raw embeddings: per-block L2
    // argmin + ADC cosine of the query against the reconstruction —
    // the ENCODE and SCORING paths are independent of the op's plan.
    // The trained codebook itself (r20) is taken from the shared
    // artifact: its independence is certified elsewhere — the DuckDB
    // oracle re-derives the Lloyd chain from scratch, and
    // AnalyticsOpsSpec pins the train+encode fixed point on a hand
    // corpus — so re-running Lloyd here would only re-test float
    // accumulation order, not semantics
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val embPrepped = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => x.cast("double")).as("e"))
    val cbByBlock: Map[Int, Map[Int, Array[Double]]] =
      TrainingData.pqCodebook(embPrepped).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
        .groupBy(_._1).view
        .mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    def code(e: Array[Double], b: Int): Array[Double] = {
      val sub = e.slice(b * 8, b * 8 + 8)
      // minBy takes the FIRST minimum over ascending c — the op's
      // (d2 asc, c_id asc) tie rule
      val entries = cbByBlock(b)
      val best = entries.keys.toSeq.sorted.minBy { c =>
        sub.zip(entries(c)).map { case (x, y) => (x - y) * (x - y) }.sum
      }
      entries(best)
    }
    val pqTop3: Set[(Long, Long)] = (0L until 10L).flatMap { q =>
      val qe = vecs(q)
      val qn = math.sqrt(qe.map(x => x * x).sum)
      vecs.keys.filter(_ != q).toSeq.map { v =>
        val recon = (0 until 8).flatMap(code(vecs(v), _)).toArray
        val dot = qe.zip(recon).map { case (x, y) => x * y }.sum
        val rn = math.sqrt(recon.map(x => x * x).sum)
        val score = math.rint(dot / (qn * rn) * 10000) / 10000
        (v, score)
      }.sortBy { case (v, s) => (-s, v) }.take(3).map(p => (q, p._1))
    }.toSet
    val byMethod = Map(
      "lsh" -> TrainingData.similarityLsh(spark, dir),
      "ivf" -> TrainingData.similarityIvf(spark, dir)).map { case (m, df) =>
      m -> df.select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    } + ("pq" -> pqTop3)
    val out = TrainingData.annRecall(spark, dir).collect()
    assert(out.length == 30, "10 queries x 3 index methods")
    out.foreach { r =>
      val (m, q) = (r.getString(0), r.getLong(1))
      assert(r.getLong(2) == 3L, s"$m/$q graded against ${r.getLong(2)} exact neighbors")
      val expectHits = exact3.filter(_._1 == q).count(byMethod(m).contains)
      assert(r.getLong(3) == expectHits.toLong,
        s"$m/$q: op says ${r.getLong(3)} hits, composition says $expectHits")
      assert(r.getDouble(4) == math.rint(expectHits / 3.0 * 10000) / 10000)
    }
  }

  test("ann incremental: planted re-posts hit their history original at rank 1, score 1") {
    val out = TrainingData.annIncremental(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    // membership: history ids are 2*(4k) (== 0 mod 8); batch ids are not
    out.foreach { case (b, _, h, _) =>
      assert(h % 8 == 0, s"hist_id $h is not a history vector")
      assert(b % 8 != 0, s"batch_id $b is a history vector")
    }
    // planted re-post 2k+1 carries the IDENTICAL embedding as history
    // vector 2k: same cell by construction, cosine exactly 1 -> its
    // rank-1 hit must be its own original
    val planted = out.filter(t => t._1 % 2 == 1 && t._2 == 1)
    assert(planted.nonEmpty, "no planted re-posts surfaced")
    planted.foreach { case (b, _, h, s) =>
      assert(h == b - 1 && s == 1.0,
        s"re-post $b should top-match its original ${b - 1} at 1.0, got ($h, $s)")
    }
  }

  test("planted embedding near-dups are found with cosine ~1") {
    val pairs = TrainingData.dedupEmbedding(spark, dir).collect()
    assert(pairs.nonEmpty)
    // planted perturbed copies carry 2·v+1 against the original's 2·v
    val planted = pairs.filter(r => r.getLong(0) % 2 == 0 && r.getLong(1) == r.getLong(0) + 1)
    assert(planted.nonEmpty, "some planted (2v, 2v+1) perturbed pairs must survive bucketing")
    planted.foreach(r => assert(r.getAs[Double]("cos") >= 0.995))
  }
}
