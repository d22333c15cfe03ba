package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the MinHash signature kernel of
  * `op_dedup_minhash` (B17). Input is the per-document array of 32-char
  * md5 hex digests (one per shingle); output is the array of
  * `numHashes` minima where hash function `s` orders digests by their
  * `s*stride`-character left rotation (the hex-rotation family — each
  * rotation leads with a disjoint 16-bit window of the digest).
  *
  * Why a custom Expression instead of the 8× `aggregate`/`least` fold:
  * each higher-order pass re-materializes `concat(substr, substr)` per
  * element (no CSE inside lambdas) — ~n·numHashes string allocations
  * per row on the hottest path of the corpus scan. This kernel keeps
  * ONE running best digest per hash function and compares candidates
  * under rotation by index arithmetic — zero allocation until the
  * final 8 outputs — inside whole-stage codegen. Values are
  * bit-identical to the fold (same rotation, same lexicographic order,
  * same `"zz"` identity for empty input), so the DuckDB oracle SQL is
  * unchanged.
  *
  * At 100 TB this is the map-side cost of near-dup: linear in corpus
  * bytes, embarrassingly parallel, no shuffle implications.
  */
case class MinHashSignature(child: Expression, numHashes: Int, stride: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  // ExpectsInputTypes is private[sql] in Spark 4 — spell the guard
  override def checkInputDataTypes(): TypeCheckResult =
    DetectFragments.requireTypes(prettyName,
      child.dataType match {
        case ArrayType(StringType, _) => true
        case _ => false
      }, "(array<string>)")

  private def rotLen = 32 // md5 hex width; rotations are mod this

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val best = new Array[Array[Byte]](numHashes)
    var k = 0
    while (k < n) {
      if (!arr.isNullAt(k)) {
        val h = arr.getUTF8String(k).getBytes
        if (h.length == rotLen) {
          var s = 0
          while (s < numHashes) {
            val off = s * stride
            val b = best(s)
            if (b == null) best(s) = h
            else {
              var i = 0
              var done = false
              while (!done && i < rotLen) {
                val j = (off + i) % rotLen
                val c = (h(j) & 0xff) - (b(j) & 0xff)
                if (c != 0) { if (c < 0) best(s) = h; done = true }
                i += 1
              }
            }
            s += 1
          }
        }
      }
      k += 1
    }
    val out = new Array[AnyRef](numHashes)
    var s = 0
    while (s < numHashes) {
      if (best(s) == null) out(s) = UTF8String.fromString("zz")
      else {
        val off = s * stride
        val r = new Array[Byte](rotLen)
        var i = 0
        while (i < rotLen) { r(i) = best(s)((off + i) % rotLen); i += 1 }
        out(s) = UTF8String.fromBytes(r)
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val best = ctx.freshName("best")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val off = ctx.freshName("off")
      val r = ctx.freshName("r")
      val b = ctx.freshName("b")
      s"""
         |int $n = $arr.numElements();
         |byte[][] $best = new byte[$numHashes][];
         |for (int $k = 0; $k < $n; $k++) {
         |  if ($arr.isNullAt($k)) continue;
         |  byte[] $h = $arr.getUTF8String($k).getBytes();
         |  if ($h.length != $rotLen) continue;
         |  for (int $s = 0; $s < $numHashes; $s++) {
         |    int $off = $s * $stride;
         |    byte[] $b = $best[$s];
         |    if ($b == null) { $best[$s] = $h; continue; }
         |    for (int $i = 0; $i < $rotLen; $i++) {
         |      int $j = ($off + $i) % $rotLen;
         |      int $c = ($h[$j] & 0xff) - ($b[$j] & 0xff);
         |      if ($c != 0) { if ($c < 0) $best[$s] = $h; break; }
         |    }
         |  }
         |}
         |Object[] $out = new Object[$numHashes];
         |for (int $s = 0; $s < $numHashes; $s++) {
         |  if ($best[$s] == null) {
         |    $out[$s] = org.apache.spark.unsafe.types.UTF8String.fromString("zz");
         |  } else {
         |    int $off = $s * $stride;
         |    byte[] $r = new byte[$rotLen];
         |    for (int $i = 0; $i < $rotLen; $i++) $r[$i] = $best[$s][($off + $i) % $rotLen];
         |    $out[$s] = org.apache.spark.unsafe.types.UTF8String.fromBytes($r);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** DataFrame-API entry point: 8 hash functions, 4-hex-char stride. */
  def minhashSig(hashes: Column, numHashes: Int = 8, stride: Int = 4): Column =
    bridge.column(MinHashSignature(bridge.expression(hashes), numHashes, stride))
}
