package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{Fragment, Fragments}

/** Native Catalyst expression wrapping the fragment-detector cascade
  * (`graft.functions.Fragments`, port of `etl_parser.py:484-924`).
  *
  * Why not a Scala UDF: a `udf(s => Seq[Fragment])` routes every row's
  * result through the reflective Catalyst converter for the case-class
  * encoder — per-fragment `Row` boxing, schema lookups and map
  * conversion on the hot path of every Tier-A query. This expression
  * builds the `InternalRow`s and `ArrayBasedMapData` directly (one
  * allocation per fragment) and participates in whole-stage codegen as
  * a single static call. The cascade itself is unchanged — all
  * differential tests and oracle rows stay byte-identical.
  */
case class DetectFragments(child: Expression, dedupe: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = DetectFragments.schema
  override def prettyName: String =
    if (dedupe) "graft_detect_fragments" else "graft_detect_fragments_raw"

  override def checkInputDataTypes(): TypeCheckResult =
    DetectFragments.requireTypes(prettyName, child.dataType == StringType, "(string)")

  override protected def nullSafeEval(input: Any): Any =
    DetectFragments.kernel(input.asInstanceOf[UTF8String], dedupe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.DetectFragments.kernel($s, $dedupe);")

  override protected def withNewChildInternal(newChild: Expression): DetectFragments =
    copy(child = newChild)
}

/** One cascade pass returning BOTH the raw detection list and its
  * containment-deduped form as `struct(before, after)`. This is the
  * native replacement for the former `udf((fs: Seq[Fragment]) => ...)`
  * dedupe step: the UDF re-entered the reflective case-class encoder
  * per row (decode the whole fragment array, re-encode the result) —
  * and, fed from a separate `detectRaw` column, the before/after query
  * ran the cascade once per consumer. Here the cascade runs once and
  * `dedupePrioritize` works on the in-flight Scala objects; only the
  * final `InternalRow`s are materialized. */
case class DetectFragmentsBoth(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DetectFragmentsBoth.schema
  override def prettyName: String = "graft_detect_fragments_both"

  override def checkInputDataTypes(): TypeCheckResult =
    DetectFragments.requireTypes(prettyName, child.dataType == StringType, "(string)")

  override protected def nullSafeEval(input: Any): Any =
    DetectFragmentsBoth.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.DetectFragmentsBoth.kernel($s);")

  override protected def withNewChildInternal(newChild: Expression): DetectFragmentsBoth =
    copy(child = newChild)
}

object DetectFragmentsBoth {

  val schema: DataType = StructType(Seq(
    StructField("before", DetectFragments.schema, nullable = false),
    StructField("after", DetectFragments.schema, nullable = false)))

  /** Called from generated code — must stay public and static-shaped. */
  def kernel(text: UTF8String): InternalRow = {
    val raw = Fragments.detectRaw(text.toString)
    InternalRow(DetectFragments.toArrayData(raw),
      DetectFragments.toArrayData(Fragments.dedupePrioritize(raw)))
  }

  def detectBoth(text: Column): Column =
    bridge.column(DetectFragmentsBoth(bridge.expression(text)))
}

object DetectFragments {

  /** Must match the field order of `graft.functions.Fragment` (the
    * shape every consumer reads via `getField`). */
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("format_type", StringType, nullable = false),
    StructField("start_index", IntegerType, nullable = false),
    StructField("end_index", IntegerType, nullable = false),
    StructField("confidence", DoubleType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("meta", MapType(StringType, StringType, valueContainsNull = false),
      nullable = false))), containsNull = false)

  /** Shared analysis-time type guard for the graft kernels: wrong SQL
    * argument types fail analysis with the expected signature instead
    * of a runtime ClassCastException (or a silent misread on
    * unsafe-backed rows). */
  private[plans] def requireTypes(
      name: String, ok: Boolean, expected: String): TypeCheckResult =
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$name expects $expected")

  private[plans] def toArrayData(frags: Seq[Fragment]): GenericArrayData =
    new GenericArrayData(frags.map { f =>
      InternalRow(
        UTF8String.fromString(f.format_type),
        f.start_index,
        f.end_index,
        f.confidence,
        UTF8String.fromString(f.text),
        ArrayBasedMapData(
          f.meta.keysIterator.map(UTF8String.fromString).toArray[Any],
          f.meta.valuesIterator.map(UTF8String.fromString).toArray[Any]))
    }.toArray[Any])

  /** Called from generated code — must stay public and static-shaped. */
  def kernel(text: UTF8String, dedupe: Boolean): ArrayData = {
    val s = text.toString
    toArrayData(if (dedupe) Fragments.detect(s) else Fragments.detectRaw(s))
  }

  /** DataFrame-API entry points. */
  def detect(text: Column): Column =
    bridge.column(DetectFragments(bridge.expression(text), dedupe = true))
  def detectRaw(text: Column): Column =
    bridge.column(DetectFragments(bridge.expression(text), dedupe = false))
}
