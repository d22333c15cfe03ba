package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: word n-gram windows — the span
  * fingerprint prep of `op_dup_ngram_spans` (fine-grained duplicated
  * text spans, Lee et al. 2022, arXiv:2107.06499 §4: fixed-length
  * token windows approximate the suffix-array substring dedup at
  * window granularity).
  *
  * Semantics differ from [[ShingleWords]] on purpose and are pinned
  * in WordGramsSpec: words = split on single spaces DROPPING empties
  * (`filter(split(text, " "), t -> t <> "")` semantics — run-together
  * whitespace must not mint distinct grams); fewer than `n` words
  * yields an EMPTY array (a document shorter than the window has no
  * spans, rather than a whole-text fallback); otherwise `count-n+1`
  * windows of `n` words joined by single spaces. One pass over the
  * UTF-8 bytes, no per-element lambda allocation (a
  * `transform`/`slice`/`concat_ws` fold is CodegenFallback AND copies
  * the token array per window).
  */
case class WordGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"WordGrams window must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_grams"

  override def checkInputDataTypes(): TypeCheckResult =
    DetectFragments.requireTypes(prettyName, child.dataType == StringType, "(string)")

  override protected def nullSafeEval(input: Any): Any =
    WordGrams.kernel(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.WordGrams.kernel($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
}

object WordGrams {

  /** Called from generated code. */
  def kernel(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    // non-empty word spans (split on ' ', empties dropped)
    val starts = new ArrayBuffer[Int](16)
    val ends = new ArrayBuffer[Int](16)
    var ws = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i > ws) { starts += ws; ends += i }
        ws = i + 1
      }
      i += 1
    }
    val words = starts.length
    if (words < n) return new GenericArrayData(Array.empty[Any])
    val m = words - n + 1
    val out = new Array[Any](m)
    var k = 0
    while (k < m) {
      val last = k + n - 1
      var len = last - k // separators
      var w = k
      while (w <= last) { len += ends(w) - starts(w); w += 1 }
      val gram = new Array[Byte](len)
      var pos = 0
      w = k
      while (w <= last) {
        if (w > k) { gram(pos) = ' '; pos += 1 }
        val wl = ends(w) - starts(w)
        System.arraycopy(bytes, starts(w), gram, pos, wl)
        pos += wl
        w += 1
      }
      out(k) = UTF8String.fromBytes(gram)
      k += 1
    }
    new GenericArrayData(out)
  }

  /** DataFrame-API entry point. */
  def grams(text: Column, n: Int): Column =
    bridge.column(WordGrams(bridge.expression(text), n))
}
