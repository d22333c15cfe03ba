package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native repetition kernel must be bit-identical to the explode →
  * two-level-groupBy formulation it replaced (which the DuckDB oracle
  * still states independently), including the try_element_at edges for
  * 0-, 1- and 2-word texts and multi-space runs. */
class RepetitionStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The original formulation, verbatim. */
  private def explodeStats(base: org.apache.spark.sql.DataFrame) = {
    val withBigrams = base
      .withColumn("words", filter(split(col("text"), " "), w => w =!= ""))
      .withColumn("bigrams",
        transform(sequence(lit(1), greatest(size(col("words")) - 1, lit(1))),
          i => concat_ws(" ", try_element_at(col("words"), i),
            try_element_at(col("words"), i + 1))))
    withBigrams.select(col("doc_id"), explode(col("bigrams")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(sum("n").as("n_bigrams"), count(lit(1)).as("n_distinct"), max("n").as("top_n"))
  }

  private def kernelStats(base: org.apache.spark.sql.DataFrame) =
    base.withColumn("st", graft.plans.RepetitionStats.stats(col("text")))
      .select(col("doc_id"), col("st.n_bigrams").as("n_bigrams"),
        col("st.n_distinct").as("n_distinct"), col("st.top_n").as("top_n"))

  private def compare(base: org.apache.spark.sql.DataFrame): Unit = {
    val e = explodeStats(base).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val k = kernelStats(base).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(k.keySet === e.keySet)
    k.foreach { case (id, v) => assert(v === e(id), s"doc $id: kernel $v != fold ${e(id)}") }
  }

  test("edges: empty, 1-word, 2-word, multi-space, unicode, heavy repeats") {
    val base = Seq(
      (1L, ""), (2L, "one"), (3L, "two words"), (4L, "a  b   c"),
      (5L, "é ü 中 é ü 中 é ü"), (6L, "x x x x x x x x x x"),
      (7L, "the quick brown fox the quick brown fox"), (8L, " leading and trailing "))
      .toDF("doc_id", "text")
    compare(base)
  }

  test("random corpora match the explode formulation") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x", "yy", "zzz", "中文")
    val base = (1L to 300L).map { id =>
      val n = rnd.nextInt(40)
      (id, (0 until n).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }.toDF("doc_id", "text")
    compare(base)
  }

  test("the real corpus matches") {
    compare(graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")))
  }
}
