package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LlmPipeline

/** The duplicate-cluster closure (op_dedup_cc): pairwise near-dup
  * evidence must close transitively — (A,B) and (B,C) are ONE cluster
  * keeping one document, which per-pair dedup logic gets wrong. */
class DedupCcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def cc(pairs: (Long, Long)*): Map[Long, (Long, Long)] =
    LlmPipeline.connectedComponents(pairs.toDF("doc_a", "doc_b"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("chains close transitively; disjoint clusters stay apart") {
    val out = cc((1L, 2L), (2L, 3L), (10L, 11L), (3L, 4L))
    // 1-2-3-4 is one component labeled by its minimum, size 4
    Seq(1L, 2L, 3L, 4L).foreach(id => assert(out(id) === ((1L, 4L)), s"doc $id"))
    Seq(10L, 11L).foreach(id => assert(out(id) === ((10L, 2L)), s"doc $id"))
    assert(out.size === 6)
  }

  test("a clique converges in one superstep's worth of labels") {
    val out = cc((5L, 6L), (5L, 7L), (6L, 7L))
    Seq(5L, 6L, 7L).foreach(id => assert(out(id) === ((5L, 3L))))
  }

  test("label must flow AGAINST edge orientation too (doc_a < doc_b)") {
    // min label sits at the chain's far end relative to orientation:
    // without symmetric edges 1's label never reaches 9
    val out = cc((5L, 9L), (1L, 9L))
    Seq(1L, 5L, 9L).foreach(id => assert(out(id) === ((1L, 3L))))
  }

  test("pointer jumping: a 200-node chain converges inside the superstep guard") {
    // pure min-propagation needs 200 supersteps here (one hop per
    // round) and would blow the 40-superstep guard; shortcutting makes
    // label distances halve, so this passing proves the jump works
    val out = cc((0L until 199L).map(i => (i, i + 1)): _*)
    assert(out.size === 200)
    out.foreach { case (id, (comp, csize)) =>
      assert(comp === 0L, s"node $id comp $comp"); assert(csize === 200L)
    }
  }

  test("property: components equal an in-memory union-find on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 60 + trial * 30
      val pairs = (1 to n).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        if (a < b) (a, b) else (b, a + 1) // keep doc_a < doc_b
      }.filter(p => p._1 != p._2).distinct
      // reference union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        .map(x => x -> find(x)).toMap
      val sizes = expected.groupBy(_._2).map { case (c, m) => c -> m.size.toLong }
      val got = cc(pairs: _*)
      assert(got.size === expected.size, s"trial $trial node count")
      expected.foreach { case (id, comp) =>
        assert(got(id) === ((comp, sizes(comp))), s"trial $trial node $id")
      }
    }
  }

  test("no pairs at all: closure returns empty, does not throw") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(LlmPipeline.connectedComponents(empty).collect().isEmpty)
  }

  test("Graft.nearDupClusters: one call from corpus to dup clusters") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today ok"),
      (3L, "completely different text about distributed query engines and shuffles"),
      (4L, "unrelated musings on parquet footers row groups and column statistics"))
      .toDF("my_id", "body")
    val out = graft.api.Graft.nearDupClusters(corpus, col("my_id"), col("body"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) === ((1L, 2L)) && out(2L) === ((1L, 2L)),
      s"near-identical docs not clustered: $out")
    assert(!out.contains(3L) && !out.contains(4L),
      s"singletons must not appear in cluster output: $out")
  }

  test("nearDupClusters fails fast on non-castable ids (never silent empties)") {
    val corpus = Seq(("u-1", "some text here right now"), ("u-2", "other words entirely"))
      .toDF("my_id", "body")
    // ANSI mode throws on the cast itself; non-ANSI hits the raise_error
    // guard — either way the job FAILS instead of returning zero rows
    intercept[Exception] {
      graft.api.Graft.nearDupClusters(corpus, col("my_id"), col("body")).collect()
    }
  }

  test("nearDupClusters rejects LOSSY numeric ids; integral doubles pass") {
    // 3.2 and 3.7 both truncate to 3 — a silent merge of distinct docs
    val lossy = Seq((3.2, "some text here right now"), (3.7, "other words entirely"))
      .toDF("my_id", "body")
    val e = intercept[Exception] {
      graft.api.Graft.nearDupClusters(lossy, col("my_id"), col("body")).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("losslessly"),
      s"expected the lossless-cast guard, got: ${e.getMessage}")
    // integral doubles round-trip exactly and must NOT be rejected
    val ok = Seq(
      (1.0, "the quick brown fox jumps over the lazy dog again and again today"),
      (2.0, "the quick brown fox jumps over the lazy dog again and again today ok"))
      .toDF("my_id", "body")
    val out = graft.api.Graft.nearDupClusters(ok, col("my_id"), col("body")).collect()
    assert(out.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L), out.mkString(","))
  }

  test("nearDupClusters accepts non-canonical but lossless STRING ids") {
    // "000123" and " 7" are numerically lossless; the numeric-only
    // round-trip guard must not reject them (they cast cleanly and
    // uniquely) — only numeric types get the textual round-trip.
    val corpus = Seq(
      ("000123", "the quick brown fox jumps over the lazy dog again and again today"),
      (" 7", "the quick brown fox jumps over the lazy dog again and again today ok"))
      .toDF("my_id", "body")
    val out = graft.api.Graft.nearDupClusters(corpus, col("my_id"), col("body")).collect()
    assert(out.map(_.getLong(0)).sorted.toSeq == Seq(7L, 123L), out.mkString(","))
  }

  test("nearDupClusters null id raises a READABLE message, not a null one") {
    val corpus = Seq((java.lang.Long.valueOf(1L), "some text here right now"),
      (null.asInstanceOf[java.lang.Long], "other words entirely"))
      .toDF("my_id", "body")
    val e = intercept[Exception] {
      graft.api.Graft.nearDupClusters(corpus, col("my_id"), col("body")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("NULL")),
      s"null id must surface a readable error, got: ${messages(e)}")
  }

  test("op output on the corpus: every cluster has exactly one canonical keeper") {
    val dir = "/root/testdata/sf0.001"
    val out = LlmPipeline.dedupCc(spark, dir)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty, "no candidate pairs at sf0.001?")
    // canonical id is a member of its own cluster, labels are minima
    val byComp = rows.groupBy(_._2)
    byComp.foreach { case (comp, members) =>
      assert(members.map(_._1).min === comp, s"component $comp not labeled by its min")
      assert(members.forall(_._3 == members.size), s"component $comp csize wrong")
    }
    // the closure must be at least as coarse as the pairs: both ends of
    // every candidate pair land in the same component
    val compOf = rows.map(r => r._1 -> r._2).toMap
    LlmPipeline.minhashPairs(spark, dir).collect().foreach { p =>
      val (a, b) = (p.getLong(0), p.getLong(1))
      assert(compOf(a) === compOf(b), s"pair ($a,$b) split across components")
    }
  }
}
