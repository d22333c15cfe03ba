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
    * Compares the first `bits` CHARACTER (code point) positions — the
    * same positions the `substr` fold it replaced indexed — by walking
    * UTF-8 sequence boundaries, so non-ASCII input keeps true
    * character-position semantics with zero allocation (two encoded
    * characters are equal iff their byte sequences are). The '0'/'1'
    * signature alphabet takes the single-byte fast path unchanged. */
  def kernel(a: UTF8String, b: UTF8String, bits: Int): Int = {
    val ab = a.getBytes
    val bb = b.getBytes
    var d = 0
    var i = 0
    var ia = 0
    var ib = 0
    while (i < bits) {
      val la = if (ia < ab.length) UTF8String.numBytesForFirstByte(ab(ia)) else 0
      val lb = if (ib < bb.length) UTF8String.numBytesForFirstByte(bb(ib)) else 0
      if (la != lb) d += 1 // includes one-side-exhausted: differs, as in the fold
      else if (la > 0) {
        var k = 0
        var same = true
        while (k < la && same) {
          same = ia + k < ab.length && ib + k < bb.length && ab(ia + k) == bb(ib + k)
          k += 1
        }
        if (!same) d += 1
      } // la == lb == 0: past both ends — equal, as in the fold
      ia += la
      ib += lb
      i += 1
    }
    d
  }

  /** DataFrame-API entry point. */
  def hamming(a: Column, b: Column, bits: Int = 32): Column =
    bridge.column(HammingDistance(bridge.expression(a), bridge.expression(b), bits))
}
