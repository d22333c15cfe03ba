package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KMeansLite

/** The IVF training path: Lloyd's iterations as Spark aggregations.
  * Deterministic init, monotone non-increasing inertia, and the
  * trained centroids beat the untrained init. */
class KMeansLiteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def emb = graft.sources.Tables.embeddings(spark, dir)
    .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))

  test("training is deterministic and inertia never increases") {
    val c0 = KMeansLite.train(emb, "e", "vec_id", k = 8, iters = 0)
    val c2 = KMeansLite.train(emb, "e", "vec_id", k = 8, iters = 2)
    val c2b = KMeansLite.train(emb, "e", "vec_id", k = 8, iters = 2)
    assert(c2.map(_.toSeq).toSeq == c2b.map(_.toSeq).toSeq, "training not deterministic")

    val i0 = KMeansLite.inertia(emb, "e", c0)
    val i1 = KMeansLite.inertia(emb, "e", KMeansLite.train(emb, "e", "vec_id", 8, 1))
    val i2 = KMeansLite.inertia(emb, "e", c2)
    info(f"inertia: init $i0%.4f -> iter1 $i1%.4f -> iter2 $i2%.4f")
    assert(i1 <= i0 + 1e-9 && i2 <= i1 + 1e-9, s"inertia increased: $i0 -> $i1 -> $i2")
    assert(i2 < i0, "two Lloyd's iterations should strictly improve on the raw init")
  }
}
