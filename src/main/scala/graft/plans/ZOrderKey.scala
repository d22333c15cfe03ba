package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

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

  /** RANK-NORMALIZED z-key for asymmetric key cardinalities. Raw
    * interleaving puts a wide dimension's variation in the HIGH bits
    * and a narrow dimension's in the LOW bits, so every coarse z-range
    * cut lands entirely in the wide dimension — the narrow one is only
    * constrained at row-group granularity and its min/max pruning goes
    * dead. Mapping each dimension to its `rankBits`-bit approximate
    * QUANTILE INDEX first gives both dimensions the same resolution and
    * a near-uniform marginal, so every z-range bounds both RANK spans —
    * the layout Delta/Iceberg's OPTIMIZE ZORDER computes via range_ids.
    *
    * 100 TB shape: `approxQuantile` (Greenwald-Khanna) is one
    * pass + a driver array of `2^rankBits - 1` doubles (8 KiB at the
    * default 10 bits); the per-row mapping is the codegen'd
    * [[QuantileBucket]] binary search embedded in the scan projection —
    * no join, no shuffle beyond the writer's own range partitioning. */
  def rankNormalized(df: DataFrame, xCol: String, yCol: String,
      rankBits: Int = 10, relErr: Double = 1e-3): Column = {
    require(rankBits >= 1 && rankBits <= 16, s"rankBits must be in [1, 16], got $rankBits")
    def splits(c: String): Array[Double] = {
      val n = (1 << rankBits) - 1
      val probs = (1 to n).map(_.toDouble / (1 << rankBits)).toArray
      // skewed data repeats quantile values; dedupe so the binary
      // search is well-defined (ties all land in one bucket)
      df.stat.approxQuantile(c, probs, relErr).distinct.sorted
    }
    def bucket(c: String, s: Array[Double]): Column =
      bridge.column(QuantileBucket(bridge.expression(df(c).cast("double")), s.toIndexedSeq))
    zorder(bucket(xCol, splits(xCol)), bucket(yCol, splits(yCol)), bits = rankBits)
  }
}

/** Codegen'd quantile-bucket index: binary search of a double value
  * into an embedded sorted-distinct split list (from
  * `df.stat.approxQuantile`), returning the bucket in
  * `[0, splits.length]` — `count of splits <= value`. The rank-space
  * coordinate for [[ZOrderKey.rankNormalized]]; branch-free enough to
  * live inside whole-stage codegen next to the interleave.
  *
  * `splits` is a `Seq`, NOT an `Array`: a case class over an Array
  * compares by reference, which defeats Catalyst canonicalization and
  * common-subexpression elimination for semantically equal instances
  * (two buckets built from the same boundaries would never dedupe). */
case class QuantileBucket(child: Expression, splits: Seq[Double])
    extends UnaryExpression {
  require(splits.nonEmpty, "QuantileBucket needs at least one split")

  private lazy val splitsArr: Array[Double] = splits.toArray

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_quantile_bucket"

  override def checkInputDataTypes(): TypeCheckResult =
    DetectFragments.requireTypes(prettyName,
      child.dataType == DoubleType, "(double)")

  override protected def nullSafeEval(input: Any): Any =
    QuantileBucket.kernel(input.asInstanceOf[Double], splitsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("splits", splitsArr, "double[]")
    defineCodeGen(ctx, ev, v => s"graft.plans.QuantileBucket.kernel($v, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): QuantileBucket =
    copy(child = newChild)
}

object QuantileBucket {
  /** `count of splits <= v` over a sorted-distinct array. */
  def kernel(v: Double, splits: Array[Double]): Long = {
    val idx = java.util.Arrays.binarySearch(splits, v)
    if (idx >= 0) idx + 1L else (-idx - 1).toLong
  }

  /** DataFrame-API entry point (splits must be sorted-distinct). */
  def bucket(c: Column, splits: Array[Double]): Column =
    bridge.column(QuantileBucket(bridge.expression(c), splits.toIndexedSeq))
}
