package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.api.Graft
import graft.operators.CorpusStats

/** Pins each B64–B67 public API to its graded twin so the gate that
  * certifies the op also protects the API semantics, plus the
  * API-only behaviors (caller stopwords, the zero-on-absent-cell CMS
  * probe, the direct-sketch ≡ count-derived-sketch equivalence). */
class ApiCorpusStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.sources.Tables.documents(spark, dir)

  test("gopherRules: graded-core parity and caller stopwords") {
    // same core ⇒ same rows as the graded battery on the plain corpus
    val api = Graft.gopherRules(docs).orderBy("doc_id").collect()
    val core = CorpusStats.gopherWith(
      docs.select(col("doc_id"), col("text"))).orderBy("doc_id").collect()
    assert(api.toSeq == core.toSeq)
    // a stopword list matching nothing fails r_stop everywhere
    val none = Graft.gopherRules(docs, stopwords = Seq("zzznope")).collect()
    assert(none.forall(r => !r.getBoolean(9) && !r.getBoolean(11)))
    intercept[IllegalArgumentException](Graft.gopherRules(docs, stopwords = Nil))
  }

  test("winnowFingerprints: parity with the graded op at the graded geometry") {
    val api = Graft.winnowFingerprints(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val graded = CorpusStats.fingerprintWinnow(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(api == graded && api.nonEmpty)
    intercept[IllegalArgumentException](
      Graft.winnowFingerprints(docs, gramChars = 0))
  }

  test("bpePairStats: the graded top-30 is the head of the full table") {
    val full = Graft.bpePairStats(docs)
      .orderBy(col("n").desc, col("pair")).limit(30).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val graded = CorpusStats.bpePairs(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(full == graded && graded.size == 30)
  }

  test("bpeTrainMerges: graded parity at 3 merges; bad merge counts rejected") {
    val api = Graft.bpeTrainMerges(docs).collect().map(_.toString).toSeq
    val graded = CorpusStats.bpeTrain(spark, dir).collect().map(_.toString).toSeq
    assert(api == graded)
    intercept[IllegalArgumentException] { Graft.bpeTrainMerges(docs, merges = 0) }
    // the apply side too: exact graded parity + loud rejection
    val segApi = Graft.bpeSegmentDocs(docs).orderBy("doc_id")
      .collect().map(_.toString).toSeq
    val segGraded = CorpusStats.bpeSegment(spark, dir)
      .collect().map(_.toString).toSeq
    assert(segApi == segGraded)
    intercept[IllegalArgumentException] { Graft.bpeSegmentDocs(docs, merges = 0) }
  }

  test("collocations: graded parity; bad parameters rejected") {
    val api = Graft.collocations(docs).collect().map(_.toString).toSeq
    val graded = CorpusStats.statsPmi(spark, dir).collect().map(_.toString).toSeq
    assert(api == graded)
    intercept[IllegalArgumentException] { Graft.collocations(docs, minCount = 0) }
  }

  test("cmsEstimates: direct-sketch estimates equal the graded count-derived ones") {
    // rebuild the graded op's bigram stream and panel, then check the
    // production path (stream → sketch → probe) lands on the same est
    val stream = docs
      .select(filter(split(col("text"), " "), t => t =!= "").as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("ts")) - 2),
        i => concat(element_at(col("ts"), i + 1), lit(" "),
          element_at(col("ts"), i + 2)))).as("item"))
    val graded = CorpusStats.sketchCms(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val api = Graft.cmsEstimates(stream,
        stream.sparkSession.createDataFrame(
          spark.sparkContext.parallelize(
            graded.keys.toSeq.sorted.map(org.apache.spark.sql.Row(_))),
          new org.apache.spark.sql.types.StructType()
            .add("item", "string")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(api == graded && graded.size == CorpusStats.CmsPanel)
    // zero-on-absent-cell: in a SPARSE sketch (one item occupies only
    // 4 of 256 cells) a never-seen candidate with at least one free
    // cell must estimate 0 — an inner-join probe would instead return
    // the phantom min of its occupied cells (or drop the row)
    val spark2 = spark
    import spark2.implicits._
    val tiny = Seq.fill(5)("alpha beta").toDF("item")
    val ghost = Graft.cmsEstimates(tiny, Seq("gamma delta").toDF("item")).collect()
    assert(ghost.length == 1 && ghost(0).getLong(1) == 0L,
      s"ghost item in a sparse sketch must read 0, got ${ghost(0).getLong(1)}")
  }
}
