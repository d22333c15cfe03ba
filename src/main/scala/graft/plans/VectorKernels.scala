package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native vector kernels for the embedding operators (B18/B27/B28).
  *
  * The `zip_with`+`aggregate` folds they replace run one lambda
  * invocation per element per fold (three folds per cosine); these
  * kernels accumulate dot and both norms in ONE index loop inside
  * whole-stage codegen. Float-point semantics are preserved exactly:
  * ascending-index accumulation (the folds' left-to-right order),
  * per-element cast to double for float inputs, NULL result when the
  * lengths differ or any element is null (`zip_with` pads with nulls,
  * which poison the folds the same way).
  */
object VectorKernels {

  private[plans] def readDouble(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  private[plans] def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** array<float> / array<double> only — integer arrays would misread
    * unsafe-backed element bytes. */
  private[plans] def isNumericVector(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  /** Raw cosine similarity (round at the call site, as before). */
  def cosine(a: Column, b: Column): Column =
    bridge.column(CosineSimilarity(bridge.expression(a), bridge.expression(b)))

  /** Sign-bit LSH bucket over fixed literal hyperplanes. */
  def lshBucket(e: Column, planes: Seq[IndexedSeq[Double]]): Column =
    bridge.column(LshBucket(bridge.expression(e), planes.map(_.toArray).toArray))
}

case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  // ExpectsInputTypes is private[sql] in Spark 4 — spell the guard
  override def checkInputDataTypes(): TypeCheckResult =
    DetectFragments.requireTypes(prettyName,
      VectorKernels.isNumericVector(left) && VectorKernels.isNumericVector(right),
      "(array<float|double>, array<float|double>)")

  private lazy val leftFloat = VectorKernels.elemIsFloat(left)
  private lazy val rightFloat = VectorKernels.elemIsFloat(right)

  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = VectorKernels.readDouble(a, i, leftFloat)
      val y = VectorKernels.readDouble(b, i, rightFloat)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val getA = if (leftFloat) s"(double) $l.getFloat($i)" else s"$l.getDouble($i)"
      val getB = if (rightFloat) s"(double) $r.getFloat($i)" else s"$r.getDouble($i)"
      s"""
         |int $n = $l.numElements();
         |if ($r.numElements() != $n) { ${ev.isNull} = true; } else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($l.isNullAt($i) || $r.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = $getA; double $y = $getB;
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** `planes` is a fixed literal matrix; bit k is '1' iff the
  * left-to-right dot of the input with plane k is >= 0, and '0' when
  * the dot is null (length mismatch / null element) — matching
  * `when(dot >= 0, "1").otherwise("0")` on the fold. */
case class LshBucket(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_lsh_bucket"

  override def checkInputDataTypes(): TypeCheckResult =
    DetectFragments.requireTypes(prettyName,
      VectorKernels.isNumericVector(child), "(array<float|double>)")

  private lazy val isFloat = VectorKernels.elemIsFloat(child)

  override protected def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val out = new Array[Byte](planes.length)
    var k = 0
    while (k < planes.length) {
      val plane = planes(k)
      var bit: Byte = '0'
      if (e.numElements() == plane.length) {
        var dot = 0.0
        var ok = true
        var i = 0
        while (ok && i < plane.length) {
          if (e.isNullAt(i)) ok = false
          else { dot += VectorKernels.readDouble(e, i, isFloat) * plane(i); i += 1 }
        }
        if (ok && dot >= 0) bit = '1'
      }
      out(k) = bit
      k += 1
    }
    UTF8String.fromBytes(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, e => {
      val out = ctx.freshName("out")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val ok = ctx.freshName("ok")
      val plane = ctx.freshName("plane")
      val bit = ctx.freshName("bit")
      val get = if (isFloat) s"(double) $e.getFloat($i)" else s"$e.getDouble($i)"
      s"""
         |byte[] $out = new byte[${planes.length}];
         |for (int $k = 0; $k < ${planes.length}; $k++) {
         |  double[] $plane = $planesRef[$k];
         |  byte $bit = '0';
         |  if ($e.numElements() == $plane.length) {
         |    double $dot = 0.0; boolean $ok = true;
         |    for (int $i = 0; $ok && $i < $plane.length; $i++) {
         |      if ($e.isNullAt($i)) { $ok = false; }
         |      else { $dot += $get * $plane[$i]; }
         |    }
         |    if ($ok && $dot >= 0) $bit = '1';
         |  }
         |  $out[$k] = $bit;
         |}
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromBytes($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}
