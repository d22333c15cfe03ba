package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: Morton (Z-order) interleave of the low
  * `bits` bits (default 16, max 32) of two long keys — `x` occupies the
  * odd bit positions, `y` the even ones, producing a `2*bits`-wide
  * space-filling-curve value. `op_zorder` grades the 16-bit form
  * (demonstration key ranges); production tables with wider keys pass
  * `bits = 32` for a full 64-bit curve — same plan, same kernel shape.
  *
  * This is the clustering key `op_zorder` sorts/buckets by: rows close
  * in BOTH dimensions land in the same z-range, so a scan with
  * predicates on either column prunes contiguous bucket ranges instead
  * of the full table — the standard multi-dimensional data-layout
  * trick (Delta/Iceberg `OPTIMIZE ZORDER BY`) expressed as a plain
  * expression the writer's `repartitionByRange` can consume.
  *
  * Why a custom Expression: the 16-step shift/mask fold is branch-free
  * integer code that belongs inside whole-stage codegen; the
  * `transform`+`aggregate` formulation would run interpreted lambdas
  * per row (and drop the whole stage out of codegen).
  */
case class ZOrderKey(left: Expression, right: Expression, bits: Int = 16)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 32, s"bits must be in [1, 32], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  // ExpectsInputTypes is private[sql] in Spark 4 — spell the guard
  override def checkInputDataTypes(): TypeCheckResult =
    DetectFragments.requireTypes(prettyName,
      left.dataType == LongType && right.dataType == LongType,
      "(bigint, bigint)")

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrderKey.kernel(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  // companion entry point is NOT named like any inherited member
  // (static-forwarder trap: scalac emits no forwarder for a name the
  // class also inherits, and codegen would silently fall back to
  // interpreted eval)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.plans.ZOrderKey.kernel($x, $y, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {
  /** Interleave the low `bits` bits: x -> odd positions, y -> even. */
  def kernel(x: Long, y: Long, bits: Int = 16): Long = {
    var r = 0L
    var i = 0
    while (i < bits) {
      r |= ((x >> i) & 1L) << (2 * i + 1)
      r |= ((y >> i) & 1L) << (2 * i)
      i += 1
    }
    r
  }

  /** DataFrame-API entry point (`bits = 32` for production key widths —
    * a full 64-bit curve over two 32-bit dimensions). */
  def zorder(x: Column, y: Column, bits: Int = 16): Column =
    bridge.column(ZOrderKey(bridge.expression(x), bridge.expression(y), bits))

  /** The same interleave as portable SQL (for the DuckDB oracle): a
    * `bits`-term shift/mask OR chain over `x` and `y` SQL fragments. */
  def sql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i + 1}) | ((($y >> $i) & 1) << ${2 * i})"
    }.mkString("(", " | ", ")")
}
