package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainingData

/** `api.Graft.nearDupEmbeddings` — the banded sign-LSH near-dup path
  * (PLANS.md r15 design, shipped r16). Pins: known-answer pair
  * detection, planted-pair recall at least matching the single-table
  * graded op on the op's own corpus construction, and the bounded
  * degenerate-bucket contract. */
class ApiNearDupEmbeddingsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("known answer: near pair found with its cosine, far pair excluded") {
    import spark.implicits._
    val base = Array.tabulate(64)(i => math.sin(i + 1.0))
    val near = base.clone(); near(0) += 0.01 // cosine ~1
    val far = Array.tabulate(64)(i => math.cos(3.0 * i) * (if (i % 2 == 0) 1 else -1))
    val df = Seq((1L, base), (2L, near), (9L, far)).toDF("vec_id", "embedding")
    val out = api.Graft.nearDupEmbeddings(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(t => (t._1, t._2)).toSeq == Seq((1L, 2L)))
    assert(out.head._3 >= 0.995 && out.head._3 <= 1.0)
  }

  test("planted recall on the graded op's corpus is >= the single-table op's") {
    // the op's own construction: originals 2·id, perturbed copies
    // 2·id+1 for id % 5 == 0 (post-re-key % 10 on the doubled id)
    val base = sources.Tables.embeddings(spark, dir)
      .select((col("vec_id") * 2).as("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
    val variants = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1).as("vec_id"),
        transform(col("e"), (x, i) => when(i === 0, x + 0.01).otherwise(x)).as("e"))
    val corpus = base.union(variants)
    val nPlanted = variants.count()

    def plantedFound(pairs: Array[(Long, Long)]): Long =
      pairs.count { case (a, b) => b == a + 1 && a % 10 == 0 }

    val bandedRows = api.Graft.nearDupEmbeddings(corpus, embCol = "e").collect()
    val banded = bandedRows.map(r => (r.getLong(0), r.getLong(1)))
    val single = TrainingData.dedupEmbedding(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (rb, rs) = (plantedFound(banded), plantedFound(single))
    assert(rb >= rs,
      s"banded recall $rb/$nPlanted below single-table $rs/$nPlanted")
    assert(rb * 10 >= nPlanted * 9,
      s"banded should catch >= 90% of planted pairs, got $rb/$nPlanted")
    // every reported pair is a confirmed near-dup, not just a candidate
    bandedRows.foreach(r => assert(r.getDouble(2) >= 0.995))
  }

  test("a dims mismatch fails the job instead of zero-keying the corpus") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0, 2.0, 3.0)), (2L, Array(1.0, 2.0, 3.0)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      api.Graft.nearDupEmbeddings(df).collect()
    }
    assert(e.getMessage.contains("embedding width"), e.getMessage)
    // and the same 3-dim corpus works when dims says so
    val ok = api.Graft.nearDupEmbeddings(df, dims = 3).collect()
    assert(ok.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("degenerate corpus: output bounded by the bucket cap, never O(N^2)") {
    import spark.implicits._
    val e = Array.tabulate(64)(i => (i + 1) / 64.0)
    val df = (0 until 300).map(i => (i.toLong, e)).toDF("vec_id", "embedding")
    val out = api.Graft.nearDupEmbeddings(df, bucketCap = 16)
    // identical vectors: every table keeps the same 16 lowest ids, so
    // the distinct union is exactly C(16, 2)
    assert(out.count() == 16L * 15 / 2)
  }
}
