package graft

import org.apache.spark.sql.graftbridge.bridge
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftExtensions

/** The SparkSessionExtensions function pack: inject the custom kernels
  * into a session's function registry and call them from SQL text. */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    GraftExtensions.functions.foreach(bridge.registerFunction(s, _))
    s
  }

  test("graft_rolling_hash callable from SQL, equals the DataFrame API") {
    val viaSql = spark.sql("SELECT graft_rolling_hash('hello world', 1, 11)").head().getLong(0)
    import org.apache.spark.sql.functions._
    val viaDf = spark.range(1)
      .select(graft.plans.RollingHash.rollingHash(lit("hello world"), lit(1), lit(11)))
      .head().getLong(0)
    assert(viaSql == viaDf)
    // hand-computed: acc = acc*31 + byte mod 1e9+7 over "hello world"
    val expect = "hello world".getBytes.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
    assert(viaSql == expect)
  }

  test("graft_minhash_sig and graft_simhash_sig callable from SQL") {
    val row = spark.sql(
      """SELECT graft_minhash_sig(array(md5('a'), md5('b'))) AS m,
        |       graft_simhash_sig(array(md5('a'), md5('b'))) AS s""".stripMargin).head()
    val m = row.getSeq[String](0)
    assert(m.length == 8 && m.forall(_.length == 32))
    val s = row.getString(1)
    assert(s.length == 32 && s.forall(c => c == '0' || c == '1'))
  }

  test("graft_detect_fragments callable from SQL") {
    val row = spark.sql(
      """SELECT f.format_type, f.start_index
        |FROM (SELECT explode(graft_detect_fragments('{"a": 1}\n\nplain prose words here for raw detection')) AS f)
        |ORDER BY f.start_index""".stripMargin).collect()
    assert(row.map(_.getString(0)).contains("JSON"))
  }

  test("graft_repetition callable from SQL") {
    val r = spark.sql(
      "SELECT s.* FROM (SELECT graft_repetition('x y x y x') AS s)").head()
    // bigrams: "x y","y x","x y","y x" -> 4 total, 2 distinct, top 2
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 2L, 2L)))
  }

  test("graft_hamming callable from SQL") {
    // positions past BOTH ends compare "" = "" -> equal, so exactly 2
    val d = spark.sql("SELECT graft_hamming('0011', '0110')").head().getInt(0)
    assert(d == 2)
  }

  test("graft_shingles and graft_cosine callable from SQL") {
    val row = spark.sql(
      """SELECT graft_shingles('a b c d') AS sh,
        |       round(graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)), 4) AS cs""".stripMargin).head()
    assert(row.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(row.getDouble(1) == 1.0)
  }

  test("graft_zorder callable from SQL") {
    // 3 interleaved with 3: x bits -> positions 1,3; y bits -> 0,2 = 0b1111
    val z = spark.sql("SELECT graft_zorder(3L, 3L)").head().getLong(0)
    assert(z == 15L)
    // type guard: ints are not bigints
    val e = intercept[Exception](spark.sql("SELECT graft_zorder(3, 3)").head())
    assert(e.getMessage.contains("graft_zorder"))
  }

  test("graft_zorder SQL reaches the production 32-bit width via the bits arg") {
    // bit 16 participates at width 32 (it does not at the default 16)
    val r = spark.sql(
      "SELECT graft_zorder(65536L, 0L, 32) AS wide, graft_zorder(65536L, 0L) AS narrow").head()
    assert(r.getLong(0) == (1L << 33) && r.getLong(1) == 0L)
    // bits must be a foldable int literal
    val e = intercept[Exception](spark.sql("SELECT graft_zorder(1L, 1L, CAST(rand()*16 AS INT))").head())
    assert(e.getMessage.contains("graft_zorder"))
  }

  test("graft_quantile_bucket callable from SQL with a foldable splits array") {
    val r = spark.sql(
      """SELECT graft_quantile_bucket(CAST(2.9 AS DOUBLE), array(1.0D, 3.0D, 7.0D)) AS lo,
        |       graft_quantile_bucket(CAST(3.0 AS DOUBLE), array(1.0D, 3.0D, 7.0D)) AS tie,
        |       graft_quantile_bucket(CAST(9.0 AS DOUBLE), array(1.0D, 3.0D, 7.0D)) AS hi""".stripMargin).head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L && r.getLong(2) == 3L)
    // splits must be foldable
    val e = intercept[Exception](
      spark.sql("SELECT graft_quantile_bucket(1.0D, array(rand()))").head())
    assert(e.getMessage.contains("graft_quantile_bucket"))
  }

  test("wrong arity fails loudly at analysis") {
    val e = intercept[Exception](spark.sql("SELECT graft_minhash_sig(array('x'), 2)").head())
    assert(e.getMessage.contains("graft_minhash_sig"))
  }

  test("graft_detect_fragments_both and graft_parse_html_table callable from SQL") {
    val row = spark.sql(
      """SELECT size(ba.before) AS nb, size(ba.after) AS na,
        |  graft_parse_html_table(
        |    '<table><tr><th>K</th></tr><tr><td>v1</td></tr><tr><td>v2</td></tr></table>') AS rows
        |FROM (SELECT graft_detect_fragments_both(
        |  concat('k1: a', chr(10), 'k2: b', chr(10), chr(10), 'prose words here for raw detection')) AS ba)
        |""".stripMargin).head()
    assert(row.getInt(0) >= row.getInt(1) && row.getInt(1) > 0)
    val tables = row.getSeq[Map[String, String]](2)
    assert(tables == Seq(Map("K" -> "v1"), Map("K" -> "v2")))
  }

  test("wrong input TYPES fail at analysis, not execution (checkInputDataTypes)") {
    // integer arrays into the vector kernel: would misread unsafe bytes
    val e1 = intercept[Exception](
      spark.sql("SELECT graft_cosine(array(1, 2), array(3, 4))").head())
    assert(e1.getMessage.contains("graft_cosine"))
    // string offsets into the hash kernel: would ClassCastException at runtime
    val e2 = intercept[Exception](
      spark.sql("SELECT graft_rolling_hash('x', '1', '2')").head())
    assert(e2.getMessage.contains("graft_rolling_hash"))
    // non-string input into the shingler / detector
    val e3 = intercept[Exception](spark.sql("SELECT graft_shingles(42)").head())
    assert(e3.getMessage.contains("graft_shingles"))
    val e4 = intercept[Exception](
      spark.sql("SELECT graft_minhash_sig(array(1, 2))").head())
    assert(e4.getMessage.contains("graft_minhash_sig"))
  }
}
