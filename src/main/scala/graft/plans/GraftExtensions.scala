package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the custom Catalyst kernels, so
  * `spark.sql("SELECT graft_rolling_hash(text, 1, 100) ...")` works —
  * use `--conf spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`).
  *
  * The DataFrame API entry points (`RollingHash.rollingHash`,
  * `MinHashSignature.minhashSig`, `SimHashSignature.simhashSig`) need
  * no registration; this class exists for SQL users and demonstrates
  * the standard `SparkSessionExtensions.injectFunction` deployment of
  * the kernels.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** (identifier, info, builder) triples, also usable with
    * `FunctionRegistry` injection in tests. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_rolling_hash"),
      info("graft_rolling_hash",
        "graft_rolling_hash(str, offset, length) - polynomial rolling hash over a byte range"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_rolling_hash takes (str, offset, length)")
        RollingHash(args(0), args(1), args(2))
      }),
    (FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig",
        "graft_minhash_sig(hashes) - 8 hex-rotation MinHash minima over an array of md5 digests"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_minhash_sig takes (array<string>)")
        MinHashSignature(args(0), 8, 4)
      }),
    (FunctionIdentifier("graft_simhash_sig"),
      info("graft_simhash_sig",
        "graft_simhash_sig(hashes) - 32-bit SimHash vote signature over an array of md5 digests"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_simhash_sig takes (array<string>)")
        SimHashSignature(args(0))
      }),
    (FunctionIdentifier("graft_detect_fragments"),
      info("graft_detect_fragments",
        "graft_detect_fragments(text) - typed fragment spans from the detector cascade"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_detect_fragments takes (string)")
        DetectFragments(args(0), dedupe = true)
      }),
    (FunctionIdentifier("graft_detect_fragments_both"),
      info("graft_detect_fragments_both",
        "graft_detect_fragments_both(text) - struct(before, after): raw detections and their containment-deduped form, one cascade pass"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_detect_fragments_both takes (string)")
        DetectFragmentsBoth(args(0))
      }),
    (FunctionIdentifier("graft_parse_html_table"),
      info("graft_parse_html_table",
        "graft_parse_html_table(html) - array of header->cell maps, one per data row"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_parse_html_table takes (string)")
        ParseHtmlTable(args(0))
      }),
    (FunctionIdentifier("graft_parse_document"),
      info("graft_parse_document",
        "graft_parse_document(text) - struct(fragments, records): the reference's parse_file per document"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_parse_document takes (string)")
        ParseDocument(args(0))
      }),
    (FunctionIdentifier("graft_convert"),
      info("graft_convert",
        "graft_convert(text) - impl-B DataConverter.parse pipeline, result JSON string"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_convert takes (string)")
        ConvertDocument(args(0))
      }),
    (FunctionIdentifier("graft_shingles"),
      info("graft_shingles",
        "graft_shingles(text) - word 3-gram shingles (whole-text fallback under 3 words)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_shingles takes (string)")
        ShingleWords(args(0))
      }),
    (FunctionIdentifier("graft_repetition"),
      info("graft_repetition",
        "graft_repetition(text) - struct(n_bigrams, n_distinct, top_n) word-bigram repetition stats"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_repetition takes (string)")
        RepetitionStats(args(0))
      }),
    (FunctionIdentifier("graft_hamming"),
      info("graft_hamming",
        "graft_hamming(a, b) - Hamming distance over the first 32 character positions"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_hamming takes (string, string)")
        HammingDistance(args(0), args(1), 32)
      }),
    (FunctionIdentifier("graft_zorder"),
      info("graft_zorder",
        "graft_zorder(x, y[, bits]) - Morton (Z-order) interleave of the low `bits` " +
          "(default 16, max 32 - the production key width) bits of two bigints"),
      (args: Seq[Expression]) => {
        require(args.length == 2 || args.length == 3,
          "graft_zorder takes (bigint, bigint[, bits int literal])")
        val bits = if (args.length == 2) 16 else args(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case e if e.foldable && e.dataType == org.apache.spark.sql.types.IntegerType =>
            e.eval().asInstanceOf[Int]
          case other => throw new IllegalArgumentException(
            s"graft_zorder bits must be a foldable int literal, got $other")
        }
        ZOrderKey(args(0), args(1), bits)
      }),
    (FunctionIdentifier("graft_cosine"),
      info("graft_cosine",
        "graft_cosine(a, b) - cosine similarity of two float/double arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_cosine takes (array, array)")
        CosineSimilarity(args(0), args(1))
      }),
    (FunctionIdentifier("graft_quantile_bucket"),
      info("graft_quantile_bucket",
        "graft_quantile_bucket(x, splits) - count of splits <= x over a foldable sorted " +
          "double array: the rank coordinate for rank-normalized z-order"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_quantile_bucket takes (double, array<double> literal)")
        val splits = args(1) match {
          case e if e.foldable && (e.dataType match {
              case org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.DoubleType, _) => true
              case _ => false
            }) =>
            e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
              .toDoubleArray().distinct.sorted
          case other => throw new IllegalArgumentException(
            s"graft_quantile_bucket splits must be a foldable array<double> literal, got $other")
        }
        QuantileBucket(args(0), splits.toIndexedSeq)
      }))
}
