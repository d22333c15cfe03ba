package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Minimal distributed Lloyd's iterations for the IVF coarse quantizer
  * (`op_similarity_ivf` uses fixed corpus vectors so the DuckDB oracle
  * can derive identical cells; THIS is the production path that claim
  * refers to).
  *
  * Shape per iteration: one broadcast argmax-assignment pass (map-side,
  * the same plan as the IVF probe itself) + one (cell, dim) partial-avg
  * shuffle whose payload is k×dims doubles — independent of corpus
  * size; only the k×dims centroid matrix ever reaches the driver.
  * Deterministic: init = the k smallest `idCol` vectors, cosine
  * assignment ties break on lower cell id, empty cells keep their
  * previous centroid.
  */
object KMeansLite {

  /** Cosine argmax cell of `e` against literal `cents`. */
  private def cellOf(e: Column, cents: Array[Array[Double]]): Column = {
    val scored = cents.zipWithIndex.map { case (c, i) =>
      val lit_c = array(c.map(lit): _*)
      struct(graft.plans.VectorKernels.cosine(e, lit_c).as("cos"),
        lit(-i).as("negid")) // ties -> lower cell id wins under greatest()
    }
    -greatest(scored: _*).getField("negid")
  }

  /** Train `k` centroids over `df(eCol)` (array<double>, fixed dims).
    *
    * `meanScale >= 0` quantizes each iteration's centroid means to that
    * many decimals (HALF_UP, matching both engines' `round`): the
    * cross-engine determinism contract `op_kmeans_train` is graded on —
    * a distributed `avg` and a single-node `avg` differ in the last ulp
    * (accumulation order), and quantizing the ONLY order-sensitive
    * value in the loop makes every downstream assignment bit-equal.
    * `-1` (default) keeps raw means. */
  def train(df: DataFrame, eCol: String, idCol: String, k: Int,
      iters: Int, meanScale: Int = -1): Array[Array[Double]] = {
    require(k >= 2, s"k must be >= 2 (greatest() needs two candidates), got $k")
    val emb = df.select(col(idCol).as("__id"), col(eCol).as("__e"))
    var cents: Array[Array[Double]] = emb.orderBy("__id").limit(k)
      .select("__e").collect()
      .map(_.getSeq[Double](0).toArray)
    require(cents.length == k,
      s"corpus has only ${cents.length} vectors for k=$k centroids")
    val dims = cents.head.length
    for (_ <- 1 to iters) {
      // (cell, dim, value) partial means — the only shuffle, k×dims wide
      val means = emb
        .withColumn("__cell", cellOf(col("__e"), cents))
        .select(col("__cell"), posexplode(col("__e")).as(Seq("__d", "__v")))
        .groupBy("__cell", "__d").agg(avg("__v").as("__m"))
        .collect()
      val next = Array.tabulate(k)(i => cents(i).clone()) // empty cell: keep old
      means.foreach { r =>
        val m = r.getAs[Double]("__m")
        val q = if (meanScale < 0) m
          else BigDecimal(m).setScale(meanScale, BigDecimal.RoundingMode.HALF_UP).toDouble
        next(r.getAs[Int]("__cell"))(r.getAs[Int]("__d")) = q
      }
      cents = next
    }
    require(cents.forall(_.length == dims))
    cents
  }

  /** Mean within-cell cosine distance (1 - cos to own centroid) — the
    * quantity Lloyd's iterations must not increase. */
  def inertia(df: DataFrame, eCol: String, cents: Array[Array[Double]]): Double = {
    val emb = df.select(col(eCol).as("__e"))
    val best = cents.map { c =>
      graft.plans.VectorKernels.cosine(col("__e"), array(c.map(lit): _*))
    }.reduce((a, b) => greatest(a, b))
    emb.select(avg(lit(1.0) - best)).head().getDouble(0)
  }
}
