package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: content-defined chunk CUT offsets for
  * `op_chunk_cdc` (B81; the fingerprint-boundary rule of Manber 1994,
  * "Finding similar files in a large file system", USENIX — the
  * ancestor of Rabin/FastCDC chunking). For every k-CHAR window
  * starting at 0-based char `i` (so `i ∈ [0, chars-k]`), the window's
  * [[RollingHash]]-style polynomial `(acc·31 + codepoint) % 1e9+7` is
  * taken mod `divisor`; a hit (`== rem`) cuts AFTER the window — char
  * boundary `i + k`, end-exclusive. Output: the strictly ascending
  * int array of cut offsets in CHARS.
  *
  * Unit history: r19 fixed the OFFSET unit (the kernel emitted byte
  * offsets while the consumer sliced with char-based `substring` —
  * non-ASCII boundaries/md5 keys corrupted, r18 ADVICE) but left the
  * HASH byte-wise, so cut POSITIONS on multi-byte text still diverged
  * from the oracle's codepoint-wise `ord()` polynomial and non-ASCII
  * corpora could not sit under the oracle hash. r20 re-units the hash
  * to CODEPOINTS with the window counted in chars — ONE unit
  * everywhere (hash, window, offsets, slices), agreeing with DuckDB's
  * `ord(substring(...))`/`length()`/`substring()` on any text. On
  * ASCII, codepoints ≡ bytes and the output is bit-identical to both
  * prior kernels (expected chunk size ≈ `divisor` chars).
  *
  * Why a kernel: the per-position windowed hash is the same
  * interpreted-HOF trap [[WinnowSelect]] closed — a
  * `transform(sequence)` fold runs CodegenFallback per position. The
  * UTF-8 decode is one linear pass building the codepoint array; the
  * window loop then runs over ints. Generated Java keeps to the
  * Janino subset (no generics, raw arrays, explicit masks).
  */
case class CdcCuts(child: Expression, k: Int, divisor: Int, rem: Int)
    extends UnaryExpression {

  private val M = 1000000007L

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cdc_cuts"

  override def checkInputDataTypes(): TypeCheckResult =
    DetectFragments.requireTypes(prettyName,
      child.dataType == StringType, "(string)")

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // ONE decode pass: UTF-8 → codepoint array sized worst-case (one
    // codepoint per byte), count = however many the walk actually
    // emits. A separate count pass classifying continuation bytes
    // disagreed with this walk on malformed input (an orphan 0x80
    // counts as zero chars there but decodes as a lead here) and
    // could overflow the sized-by-count array (r20 review); a single
    // traversal makes "malformed tails decode best-effort, same every
    // run" true by construction.
    val cps = new Array[Int](bytes.length)
    var ci = 0
    var b = 0
    while (b < bytes.length) {
      val x = bytes(b) & 0xff
      var cp = 0
      var len = 1
      if (x < 0x80) { cp = x; len = 1 }
      else if ((x & 0xe0) == 0xc0) { cp = x & 0x1f; len = 2 }
      else if ((x & 0xf0) == 0xe0) { cp = x & 0x0f; len = 3 }
      else { cp = x & 0x07; len = 4 }
      var t = 1
      while (t < len && b + t < bytes.length) {
        cp = (cp << 6) | (bytes(b + t) & 0x3f); t += 1
      }
      cps(ci) = cp; ci += 1; b += len
    }
    val n = ci
    val nPos = n - k + 1
    if (nPos <= 0) return new GenericArrayData(new Array[Int](0))
    val tmp = new Array[Int](nPos)
    var r = 0
    var i = 0
    while (i < nPos) {
      var acc = 0L
      var j = i
      val end = i + k
      while (j < end) { acc = (acc * 31 + cps(j)) % M; j += 1 }
      if (acc % divisor == rem) { tmp(r) = i + k; r += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(tmp, r))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val cps = ctx.freshName("cps")
      val ci = ctx.freshName("ci")
      val b = ctx.freshName("b")
      val x = ctx.freshName("x")
      val cp = ctx.freshName("cp")
      val len = ctx.freshName("len")
      val t = ctx.freshName("t")
      val nPos = ctx.freshName("nPos")
      val tmp = ctx.freshName("tmp")
      val r = ctx.freshName("r")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |byte[] $bytes = $str.getBytes();
         |int[] $cps = new int[$bytes.length];
         |int $ci = 0;
         |for (int $b = 0; $b < $bytes.length; ) {
         |  int $x = $bytes[$b] & 0xff;
         |  int $cp; int $len;
         |  if ($x < 0x80) { $cp = $x; $len = 1; }
         |  else if (($x & 0xe0) == 0xc0) { $cp = $x & 0x1f; $len = 2; }
         |  else if (($x & 0xf0) == 0xe0) { $cp = $x & 0x0f; $len = 3; }
         |  else { $cp = $x & 0x07; $len = 4; }
         |  for (int $t = 1; $t < $len && $b + $t < $bytes.length; $t++) {
         |    $cp = ($cp << 6) | ($bytes[$b + $t] & 0x3f);
         |  }
         |  $cps[$ci] = $cp; $ci++; $b += $len;
         |}
         |int $n = $ci;
         |int $nPos = $n - $k + 1;
         |if ($nPos <= 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new int[0]);
         |} else {
         |  int[] $tmp = new int[$nPos];
         |  int $r = 0;
         |  for (int $i = 0; $i < $nPos; $i++) {
         |    long $acc = 0L;
         |    for (int $j = $i; $j < $i + $k; $j++) {
         |      $acc = ($acc * 31 + $cps[$j]) % ${M}L;
         |    }
         |    if ($acc % $divisor == $rem) { $tmp[$r] = $i + $k; $r++; }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    java.util.Arrays.copyOf($tmp, $r));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
}

object CdcCuts {
  /** DataFrame-API entry point: ascending CHAR cut offsets
    * (end-exclusive; the window, hash, and offsets all count
    * codepoints — ≡ bytes on ASCII text). */
  def cdcCuts(text: Column, k: Int, divisor: Int, rem: Int = 0): Column =
    bridge.column(CdcCuts(bridge.expression(text), k, divisor, rem))
}
