package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the 32-bit SimHash vote kernel of
  * `op_dedup_simhash` (B25). Input is the per-document array of md5 hex
  * digests; bit `j` of the output is the sign of the vote sum where
  * digest hex digit `j`'s top bit (char >= '8') votes +1, else -1 —
  * emitted as a 32-char '0'/'1' string, bit-identical to the
  * `transform`+`aggregate(zip_with)` fold it replaces (which allocated
  * a 32-int array per digest per row; this is one int[32] per row
  * inside whole-stage codegen).
  *
  * Fold edge semantics preserved: a position past a short digest's end
  * votes -1 (`substr` yields "" there, and `"" >= "8"` is false), and a
  * zero sum emits '0'.
  */
case class SimHashSignature(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_simhash_sig"

  // ExpectsInputTypes is private[sql] in Spark 4 — spell the guard
  override def checkInputDataTypes(): TypeCheckResult =
    DetectFragments.requireTypes(prettyName,
      child.dataType match {
        case ArrayType(StringType, _) => true
        case _ => false
      }, "(array<string>)")

  private val bits = 32

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](bits)
    var k = 0
    while (k < n) {
      // a null digest votes -1 everywhere (when(null).otherwise(-1))
      val h: Array[Byte] = if (arr.isNullAt(k)) null else arr.getUTF8String(k).getBytes
      var i = 0
      while (i < bits) {
        val up = h != null && i < h.length && (h(i) & 0xff) >= '8'
        counts(i) += (if (up) 1 else -1)
        i += 1
      }
      k += 1
    }
    val out = new Array[Byte](bits)
    var i = 0
    while (i < bits) { out(i) = if (counts(i) > 0) '1' else '0'; i += 1 }
    UTF8String.fromBytes(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val counts = ctx.freshName("counts")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val up = ctx.freshName("up")
      s"""
         |int $n = $arr.numElements();
         |int[] $counts = new int[$bits];
         |for (int $k = 0; $k < $n; $k++) {
         |  byte[] $h = $arr.isNullAt($k) ? null : $arr.getUTF8String($k).getBytes();
         |  for (int $i = 0; $i < $bits; $i++) {
         |    boolean $up = $h != null && $i < $h.length && ($h[$i] & 0xff) >= '8';
         |    $counts[$i] += $up ? 1 : -1;
         |  }
         |}
         |byte[] $out = new byte[$bits];
         |for (int $i = 0; $i < $bits; $i++) $out[$i] = (byte) ($counts[$i] > 0 ? '1' : '0');
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromBytes($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSignature =
    copy(child = newChild)
}

object SimHashSignature {
  /** DataFrame-API entry point. */
  def simhashSig(hashes: Column): Column =
    bridge.column(SimHashSignature(bridge.expression(hashes)))
}
