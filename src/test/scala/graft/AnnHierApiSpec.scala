package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

/** `api.Graft.annProbeHier` — the hierarchical (two-level) coarse
  * assign promoted from the r16 evidence tool (VERDICT r16/r17 task
  * 5). Pins the three contracts the scaladoc sells:
  *
  *  1. `superProbe` ≥ super count ⇒ IDENTICAL to the flat
  *     [[api.Graft.annProbe]] (probing all supers restores the full
  *     candidate set, tie rules match at both levels);
  *  2. the nprobe trade is real and monotone on a hand geometry —
  *     S = 1 misses a cross-super nearest centroid, S = 2 restores
  *     the flat assignment;
  *  3. identical re-posts co-locate at ANY `superProbe` (both sides
  *     share the rule), so the incremental-dedup use stays exact. */
class AnnHierApiSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def df(rows: Seq[(Long, Array[Double])], id: String, emb: String) = {
    import spark.implicits._
    rows.toDF(id, emb)
  }
  private def cdf(rows: Seq[(Long, Array[Double])]) = df(rows, "c_id", "centroid")

  // hand geometry: supers on the two axes; child c2 = (0.6, 0.8) sits
  // under SUPER e2 (cos 0.8 > 0.6) but is the flat-nearest centroid of
  // v = (0.8, 0.6) (cos 0.96 > c0's 0.8) — the classic cross-super miss
  private val supers = Seq(
    10L -> Array(1.0, 0.0, 0.0, 0.0),
    11L -> Array(0.0, 1.0, 0.0, 0.0))
  private val cents = Seq(
    0L -> Array(1.0, 0.0, 0.0, 0.0),   // child of super 10
    1L -> Array(0.0, 1.0, 0.0, 0.0),   // child of super 11
    2L -> Array(0.6, 0.8, 0.0, 0.0))   // child of super 11
  private val vProbe = Array(0.8, 0.6, 0.0, 0.0)

  test("superProbe >= super count reproduces the flat probe exactly (gate corpus)") {
    val dir = "/root/testdata/sf0.001"
    val emb = sources.Tables.embeddings(spark, dir)
    val cb = emb.filter(col("vec_id") % operators.TrainingData.AnnCodebookStride === 0)
      .select(col("vec_id").as("c_id"), col("embedding").as("centroid"))
    // supers = every 2nd centroid of the codebook (the stride rule one
    // level up); superProbe = super count ⇒ full candidate set
    val sup = cb.filter(col("c_id") % (2 * operators.TrainingData.AnnCodebookStride) === 0)
    val nSup = sup.count().toInt
    assert(nSup >= 1)
    val hist = emb.filter(col("vec_id") % 4 === 0)
      .select((col("vec_id") * 2).as("vec_id"), col("embedding"))
    val bat = emb.filter(col("vec_id") % 4 =!= 0)
      .select((col("vec_id") * 2).as("vec_id"), col("embedding"))
    // sort BOTH sides before comparing: the two plans differ
    // (different joins/windows), so partition output order is not
    // guaranteed to match even when contents are identical (r18
    // ADVICE — a latent flaky row-for-row compare)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sorted
    val flat = rows(api.Graft.annProbe(hist, bat, cb))
    val hier = rows(api.Graft.annProbeHier(hist, bat, cb, sup, superProbe = nSup))
    assert(hier == flat,
      "probing every super must restore the flat assignment row-for-row")
  }

  test("the nprobe trade: S=1 misses the cross-super centroid, S=2 restores flat") {
    val hist = Seq(20L -> Array(0.6, 0.8, 0.0, 0.0), // lives in cell 2 (flat)
      21L -> Array(1.0, 0.0, 0.0, 0.0))              // lives in cell 0
    val bat = Seq(5L -> vProbe)
    def hits(s: Int) = api.Graft.annProbeHier(
      df(hist, "vec_id", "embedding"), df(bat, "vec_id", "embedding"),
      cdf(cents), cdf(supers), superProbe = s)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    // S=1: v's top super is e1 (cos .8 > .6) → children {c0} → cell 0
    // → only hist 21 (also cell 0 under S=1? no — hist 20 assigns by
    // ITS own top super e2 → cell 2; hist 21 → cell 0) is co-located
    assert(hits(1) == Seq((1, 21L)))
    // S=2: both sides see all centroids → v lands in cell 2 with hist
    // 20 (flat behavior: cos(v, c2) = 0.96 beats cos(v, c0) = 0.8)
    assert(hits(2) == Seq((1, 20L)))
    // and S=2 ≡ flat on the same inputs
    val flat = api.Graft.annProbe(
      df(hist, "vec_id", "embedding"), df(bat, "vec_id", "embedding"),
      cdf(cents)).collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    assert(hits(2) == flat)
  }

  test("identical re-posts co-locate at any superProbe") {
    val v = Array(0.7, 0.7, 0.1, 0.0)
    val hist = Seq(30L -> v)
    val bat = Seq(31L -> v)
    for (s <- Seq(1, 2)) {
      val rows = api.Graft.annProbeHier(
        df(hist, "vec_id", "embedding"), df(bat, "vec_id", "embedding"),
        cdf(cents), cdf(supers), superProbe = s).collect()
      assert(rows.length == 1 && rows.head.getLong(2) == 30L &&
        rows.head.getDouble(3) == 1.0,
        s"re-post must hit its original at rank 1 under S=$s")
    }
  }

  test("an empty super (no child centroids) cannot drop vectors") {
    // externally trained super codebooks can contain a super that is
    // no centroid's nearest; a vector whose top-S probes were all such
    // empty supers used to vanish through the inner join (r18 ADVICE).
    // Super 12 = z-axis has no children; v/h = z-axis probe it first.
    val sup3 = supers :+ (12L -> Array(0.0, 0.0, 1.0, 0.0))
    val zc = Array(0.0, 0.0, 1.0, 0.0)
    val out = api.Graft.annProbeHier(
      df(Seq(100L -> zc), "vec_id", "embedding"),
      df(Seq(5L -> zc), "vec_id", "embedding"),
      cdf(cents), cdf(sup3), superProbe = 1).collect()
    // both sides fall back to the nearest LIVE super (tie → sup 10 →
    // cell from its children) and co-locate: identical vectors, cos 1
    assert(out.length == 1 && out.head.getLong(0) == 5L &&
      out.head.getLong(2) == 100L && out.head.getDouble(3) == 1.0,
      "vectors probing an empty super must still be assigned and co-locate")
  }

  test("graded op_ann_hier: recall-vs-flat floor and exact re-post co-location") {
    // the B83 contract pattern (recall floor stated AND measured, the
    // approximation cost never guessed): op_ann_hier runs the same
    // split/codebook/probe as flat B58 but assigns through top-1-of-2
    // supers, so its top-3 sets may differ — measured recall of the
    // flat probe's (batch, hist) pairs is 0.69 at sf0.001 / 0.62 at
    // sf0.01 (uniform embeddings, the super-probe worst case); the
    // contract floor sits at 0.40 to absorb data-drop drift without
    // ever letting the probe degrade to noise
    val dir = "/root/testdata/sf0.001"
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val flat = pairs(operators.TrainingData.annIncremental(spark, dir))
    val hier = operators.TrainingData.annHier(spark, dir)
    val hierPairs = pairs(hier)
    val recall = flat.intersect(hierPairs).size.toDouble / flat.size
    assert(recall >= 0.40, f"recall vs flat $recall%.4f below the 0.40 floor")
    // identical re-posts (batch 2·id+1 of history 2·id) must STILL hit
    // their original at rank 1 / score 1.0 under the approximate
    // assign — both sides share the rule, so the incremental-dedup
    // contract is exact, not probabilistic
    val re = hier.collect().filter(r => r.getLong(0) % 2 == 1)
    val reBatch = re.map(_.getLong(0)).distinct
    assert(reBatch.nonEmpty, "planted re-posts missing from the probe output")
    reBatch.foreach { b =>
      val top = re.filter(r => r.getLong(0) == b && r.getInt(1) == 1).head
      assert(top.getLong(2) == b - 1 && top.getDouble(3) == 1.0,
        s"re-post $b must hit its original at rank 1, score 1.0")
    }
  }

  test("guards: superProbe >= 1, lossless ids") {
    intercept[IllegalArgumentException] {
      api.Graft.annProbeHier(df(Seq(1L -> vProbe), "vec_id", "embedding"),
        df(Seq(2L -> vProbe), "vec_id", "embedding"),
        cdf(cents), cdf(supers), superProbe = 0)
    }
  }
}
