package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mining

/** Known-answer tests for the 5 mining operators on hand-computed
  * corpora (VERDICT r5/r6 item: oracle-green without a unit spec means
  * a semantics regression only surfaces at the next full Verify run).
  * Every expected constant below is derived by hand in the comments —
  * independent of both the Spark pipeline and the DuckDB oracle.
  */
class MiningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- BM25: 3-doc corpus, every factor hand-derived ----------------------
  // d1 = "spark spark hash x" (dl=4), d2 = "vector y z" (dl=3),
  // d3 = "a b c d" (dl=4). n_docs=3, avgdl=11/3. terms (spark,vector,hash)
  // each appear in exactly 1 doc -> idf = ln(1 + 2.5/1.5) = 0.980829.
  //   d1: spark tf=2: idf*4.4/(2+1.2*(0.25+0.75*4/avgdl)) = idf*4.4/3.281818
  //       hash  tf=1: idf*2.2/(1+1.281818)
  //       score = 1.315022 + 0.945661 = 2.2607 (round 4)
  //   d2: vector tf=1: idf*2.2/(1+1.2*(0.25+0.75*3/avgdl)) = 1.0596
  //   d3: no query terms -> absent from the ranking.
  test("bm25: hand-computed scores and ranks on a 3-doc corpus") {
    val docs = Seq(
      (1L, "spark spark hash x"),
      (2L, "vector y z"),
      (3L, "a b c d")).toDF("doc_id", "text")
    val got = Mining.bm25Rank(docs, Seq("spark", "vector", "hash"), topK = 20)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 1, 2.2607), (2L, 2, 1.0596)))
  }

  // ---- PageRank: planted hub star, mass conservation ----------------------
  // Star: hub 0 <-> leaves 1..5, undirected, n=6, deg(hub)=5, deg(leaf)=1.
  // p0 = 1/6 each; per iteration pr = 0.15/6 + 0.85*sum(in w):
  //   i1: hub = .025 + .85*5*(1/6)   = .733333333  leaf = .025+.85*(1/6)/5 = .053333333
  //   i2: hub = .025 + .85*5*.053333 = .251666665  leaf = .149666667
  //   i3: hub = .025 + .85*5*.149667 = .661083335  leaf = .067783333
  // round 6 -> hub .661083, leaf .067783; mass = hub + 5*leaf = 1.0.
  test("pagerank: planted hub ranks highest; mass is conserved") {
    val pairs = (1L to 5L).map(l => (0L, l)).toDF("a", "b")
    val got = Mining.pagerankRanks(pairs, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(0L) === 0.661083)
    for (l <- 1L to 5L) assert(got(l) === 0.067783)
    assert(math.abs(got.values.sum - 1.0) < 1e-4, "PageRank mass not conserved")
  }

  // ---- bigram LM: repeated-bigram doc beats rare-bigram doc ---------------
  // A = "the cat the cat the": bigrams (the,cat)x2 (cat,the)x2; each has
  //   c2=2, c1(w1)=2, vocab=5 -> logp = ln((2+1)/(2+5)) = ln(3/7) = -0.8473
  // B = "dog runs fast": (dog,runs),(runs,fast), c2=1, c1=1 ->
  //   logp = ln(2/6) = ln(1/3) = -1.0986
  test("ngram_lm: repeated bigrams score higher than rare ones (hand values)") {
    val docs = Seq(
      (1L, "the cat the cat the"),
      (2L, "dog runs fast")).toDF("doc_id", "text")
    // the scoring core is unsorted since the B63 refactor (only the
    // graded op adds the total ORDER BY) — sort here
    val got = Mining.ngramLmScores(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.toSeq === Seq((1L, 4L, -0.8473), (2L, 2L, -1.0986)))
    assert(got(0)._3 > got(1)._3, "repetition must out-score rare bigrams")
  }

  // ---- MAD: planted outlier trips the 3xMAD gate; tight group doesn't -----
  // group a: [1,2,3,4,5,100] -> med=3.5, dev=[2.5,1.5,.5,.5,1.5,96.5],
  //   mad = quantile_cont(.5) of [.5,.5,1.5,1.5,2.5,96.5] = 1.5,
  //   gate 3*1.5=4.5 -> only 96.5 flagged. max_dev=96.5.
  // group b: [10,10,10] -> mad=0, dev=0, 0 > 0 false -> zero outliers.
  test("anomaly_mad: planted outlier flagged, constant group clean") {
    val ev = (Seq(1.0, 2.0, 3.0, 4.0, 5.0, 100.0).map(("a", _)) ++
      Seq(10.0, 10.0, 10.0).map(("b", _))).toDF("event_type", "value")
    val got = Mining.madScreen(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5)))).toMap
    assert(got("a") === ((6L, 3.5, 1.5, 1L, 96.5)))
    assert(got("b") === ((3L, 10.0, 0.0, 0L, 0.0)))
  }

  // ---- kmeans: 3 well-separated direction clusters are stable -------------
  // Cosine metric: clusters along the x/y/z axes; ids 1..3 are one point
  // from each cluster, so deterministic init (k smallest ids) seeds every
  // cluster. Assignment must group points by axis and be identical after
  // 1 and 2 Lloyd iterations (converged on iteration 1).
  test("kmeans: separated clusters assign stably across iterations") {
    val pts = Seq(
      (1L, Array(1.0, 0.0, 0.0)), (2L, Array(0.0, 1.0, 0.0)), (3L, Array(0.0, 0.0, 1.0)),
      (4L, Array(0.9, 0.1, 0.0)), (5L, Array(0.1, 0.9, 0.0)), (6L, Array(0.0, 0.1, 0.9)),
      (7L, Array(0.95, 0.0, 0.05)), (8L, Array(0.0, 0.95, 0.05)), (9L, Array(0.05, 0.0, 0.95)))
    val emb = pts.toDF("vec_id", "e")
    def cells(iters: Int): Map[Long, Int] =
      Mining.kmeansAssign(emb, k = 3, iters = iters)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val c1 = cells(1)
    // cluster membership by construction: {1,4,7}=x-axis {2,5,8}=y {3,6,9}=z
    assert(Seq(c1(1L), c1(4L), c1(7L)).distinct.size == 1)
    assert(Seq(c1(2L), c1(5L), c1(8L)).distinct.size == 1)
    assert(Seq(c1(3L), c1(6L), c1(9L)).distinct.size == 1)
    assert(Seq(c1(1L), c1(2L), c1(3L)).distinct.size == 3)
    assert(cells(2) === c1, "assignment must be stable once converged")
  }

  test("select_kcenter: hand geometry, radius shrink, distinct centers") {
    import spark.implicits._
    // axis geometry: seed v0=(1,0); v2=(-1,0) is antipodal (d=2) and
    // must be picked second; v1=(0,1) (d=1 to both) third
    val hand = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)), (2L, Seq(-1.0, 0.0)))
      .toDF("vec_id", "e")
    val h = graft.operators.Mining.selectKcenterWith(hand, 3)
      .orderBy("step").collect()
    assert(h.map(_.getLong(1)).toSeq == Seq(0L, 2L, 1L))
    assert(h(1).getDouble(2) == 2.0 && h(2).getDouble(2) == 1.0)
    // the graded run: K distinct centers, seed = min id, and the
    // coverage radius (each pick's mindist) never grows — the greedy
    // k-center invariant
    val rows = graft.operators.Mining
      .selectKcenter(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == graft.operators.Mining.KCenterK)
    assert(rows.map(_.getLong(1)).distinct.length == rows.length)
    assert(rows(0).getLong(1) == 0L && rows(0).getDouble(2) == 2.0)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getDouble(2) <= a.getDouble(2),
        s"step ${b.getInt(0)}: coverage radius grew")
      case _ => ()
    }
    // the public API runs the same core at the graded parameters
    val api = graft.api.Graft
      .coresetKcenter(graft.sources.Tables
        .embeddings(spark, "/root/testdata/sf0.001"))
      .orderBy("step").collect().map(_.toString).toSeq
    assert(api == rows.map(_.toString).toSeq)
    intercept[IllegalArgumentException] {
      graft.api.Graft.coresetKcenter(
        graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001"), k = 1)
    }
  }
}
