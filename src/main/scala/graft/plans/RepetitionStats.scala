package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: per-document word-bigram repetition
  * stats in ONE pass — `(n_bigrams, n_distinct, top_n)` over the
  * bigrams of the non-empty words of `text`.
  *
  * Replaces the explode → groupBy(doc_id, bigram) → groupBy(doc_id)
  * formulation of `op_text_repetition`, whose only shuffle carried
  * every bigram STRING off every document (~600 wide rows per doc —
  * the op's entire cost, 4.8 s of a 45 s bench). The stats are
  * per-document, so no cross-row data movement is needed at all: this
  * kernel counts bigrams in an open-addressed per-row map and the op
  * becomes a pure map-side projection. Semantics are bit-identical to
  * the fold (same `filter(split(text,' '), _ != '')` word list, same
  * `try_element_at` edge: a 1-word text yields its word as the one
  * "bigram", an empty text one empty bigram) — pinned against the
  * explode formulation in RepetitionStatsSpec, and the unchanged
  * DuckDB oracle still states the grouped SQL independently.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStats.schema
  override def prettyName: String = "graft_repetition"

  override def checkInputDataTypes(): TypeCheckResult =
    DetectFragments.requireTypes(prettyName, child.dataType == StringType, "(string)")

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.RepetitionStats.kernel($s);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {

  val schema: StructType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_n", LongType, nullable = false)))

  /** Called from generated code. */
  def kernel(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    // non-empty word spans (filter(split(text,' '), _ != '') semantics)
    val starts = new scala.collection.mutable.ArrayBuffer[Int](64)
    val ends = new scala.collection.mutable.ArrayBuffer[Int](64)
    var ws = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i > ws) { starts += ws; ends += i }
        ws = i + 1
      }
      i += 1
    }
    val n = starts.length
    val m = math.max(n - 1, 1)
    val counts = new java.util.HashMap[UTF8String, Int](m * 2)
    var top = 0
    var k = 0
    while (k < m) {
      val hasSecond = k + 1 < n
      val bg =
        if (n == 0) UTF8String.EMPTY_UTF8
        else {
          val l1 = ends(k) - starts(k)
          val len = if (hasSecond) l1 + 1 + (ends(k + 1) - starts(k + 1)) else l1
          val b = new Array[Byte](len)
          System.arraycopy(bytes, starts(k), b, 0, l1)
          if (hasSecond) {
            b(l1) = ' '
            System.arraycopy(bytes, starts(k + 1), b, l1 + 1, ends(k + 1) - starts(k + 1))
          }
          UTF8String.fromBytes(b)
        }
      val c = counts.merge(bg, 1, (a, b) => a + b)
      if (c > top) top = c
      k += 1
    }
    new GenericInternalRow(Array[Any](m.toLong, counts.size.toLong, top.toLong))
  }

  /** DataFrame-API entry point. */
  def stats(text: Column): Column =
    bridge.column(RepetitionStats(bridge.expression(text)))
}
