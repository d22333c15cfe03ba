package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: polynomial rolling hash
  * `acc = (acc*31 + byte) % 1e9+7` over the byte range
  * `[offset, offset+length)` (1-based) of a string — the hot kernel of
  * `op_text_fingerprint` (B31).
  *
  * Why a custom Expression instead of the array-fold formulation: the
  * fold materializes a per-char codes array and runs interpreted
  * higher-order lambdas; this compiles to a tight byte loop inside
  * whole-stage codegen — no allocation, no virtual calls. Semantics are
  * byte-wise, which equals the reference's char-wise `ascii()` on the
  * ASCII corpora both engines verify on (`ord` in the DuckDB oracle).
  *
  * Deployment note: for SQL-surface exposure this registers cleanly via
  * `SparkSessionExtensions.injectFunction`; the DataFrame API below
  * needs no registration.
  */
case class RollingHash(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  private val M = 1000000007L

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  // ExpectsInputTypes is private[sql] in Spark 4, so the guard is spelled
  // directly: reject wrong SQL argument types at analysis time instead of
  // a runtime ClassCastException
  override def checkInputDataTypes(): TypeCheckResult =
    DetectFragments.requireTypes(prettyName,
      first.dataType == StringType &&
        second.dataType == IntegerType && third.dataType == IntegerType,
      "(string, int, int)")

  override protected def nullSafeEval(str: Any, off: Any, len: Any): Any = {
    val bytes = str.asInstanceOf[UTF8String].getBytes
    val start = math.max(0, off.asInstanceOf[Int] - 1)
    val end = math.min(bytes.length, start.toLong + len.asInstanceOf[Int]).toInt
    var acc = 0L
    var i = start
    while (i < end) {
      acc = (acc * 31 + (bytes(i) & 0xff)) % M
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (str, off, len) => {
      val bytes = ctx.freshName("bytes")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val start = ctx.freshName("start")
      val end = ctx.freshName("end")
      s"""
         |byte[] $bytes = $str.getBytes();
         |int $start = java.lang.Math.max(0, $off - 1);
         |int $end = (int) java.lang.Math.min((long) $bytes.length, (long) $start + $len);
         |long $acc = 0L;
         |for (int $i = $start; $i < $end; $i++) {
         |  $acc = ($acc * 31 + ($bytes[$i] & 0xff)) % ${M}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): RollingHash =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object RollingHash {
  /** DataFrame-API entry point. */
  def rollingHash(str: Column, offset: Column, length: Column): Column =
    bridge.column(RollingHash(bridge.expression(str),
      bridge.expression(offset), bridge.expression(length)))
}
