package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Hamming distance over the first `bits` character positions
  * of two signature strings — the per-candidate-pair confirm kernel of
  * `op_dedup_simhash` (B25). Replaces an interpreted
  * `aggregate(sequence(1, 32), ...)` fold: 32 lambda invocations and
  * two substring allocations per position per PAIR. Pair volume is
  * what a near-dup pass produces at scale, so the confirm must be as
  * cheap as the signature. Semantics are bit-identical to the fold:
  * `substr` past a string's end yields "" and `"" =!= ""` is false, so
  * positions beyond BOTH strings count equal while positions beyond
  * only one count as differing.
  */
case class HammingDistance(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hamming"

  override def checkInputDataTypes(): TypeCheckResult =
    DetectFragments.requireTypes(prettyName,
      left.dataType == StringType && right.dataType == StringType,
      "(string, string)")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    HammingDistance.kernel(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.plans.HammingDistance.kernel($l, $r, $bits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {

  /** Called from generated code — must stay public and static-shaped.
    * Byte-wise comparison is correct for the '0'/'1' signature
    * alphabet these ops produce (single-byte UTF-8). */
  def kernel(a: UTF8String, b: UTF8String, bits: Int): Int = {
    val ab = a.getBytes
    val bb = b.getBytes
    var d = 0
    var i = 0
    while (i < bits) {
      val x = if (i < ab.length) ab(i).toInt else -1
      val y = if (i < bb.length) bb(i).toInt else -1
      if (x != y) d += 1
      i += 1
    }
    d
  }

  /** DataFrame-API entry point. */
  def hamming(a: Column, b: Column, bits: Int = 32): Column =
    bridge.column(HammingDistance(bridge.expression(a), bridge.expression(b), bits))
}
