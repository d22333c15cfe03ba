package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.TrainingData

/** B81 `op_chunk_cdc` — pins the properties that make content-defined
  * chunking worth having next to B61's fixed windows:
  *
  *  1. TILING: chunks exactly partition each document (contiguous
  *     starts, lengths summing to the text length, ids dense);
  *  2. SHIFT RESISTANCE — the op's raison d'être: prepending bytes to
  *     a document must leave all chunks after the first content-
  *     defined cut IDENTICAL (fixed-offset chunking shares ~nothing
  *     after a one-byte shift);
  *  3. block-level dedup: two documents sharing a long interior region
  *     produce common chunk hashes;
  *  4. domain edges: a doc shorter than the fingerprint window is one
  *     whole chunk whose md5 is md5(text). */
class ChunkCdcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.DataFrame

  private def corpusOf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }
  private def run(c: DataFrame) = TrainingData.chunkCdcWith(
    c, TrainingData.CdcGram, TrainingData.CdcDivisor, TrainingData.CdcRem)

  test("chunks tile every graded document exactly") {
    val dir = "/root/testdata/sf0.001"
    val rows = TrainingData.chunkCdc(spark, dir).collect()
    assert(rows.nonEmpty)
    // lengths from the graded corpus itself (2·id originals ∪ 2·id+1
    // unicode-wrapped variants) — char lengths, the one unit everywhere
    val lens = TrainingData.chunkCdcCorpus(spark, dir)
      .select(col("doc_id"), length(col("text")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.groupBy(_.getLong(0)).foreach { case (id, ch) =>
      val sorted = ch.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == sorted.indices.toSeq,
        s"doc $id: chunk ids not dense")
      var off = 0
      sorted.foreach { r =>
        assert(r.getInt(2) == off, s"doc $id: gap at chunk ${r.getInt(1)}")
        off += r.getInt(3)
      }
      assert(off == lens(id), s"doc $id: chunks cover $off of ${lens(id)}")
    }
  }

  test("shift resistance: a prepended prefix preserves downstream chunk hashes") {
    val base = sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 40)
    val shifted = base.select((col("doc_id") + 1000).as("doc_id"),
      concat(lit("ZZZ "), col("text")).as("text"))
    val ch = run(base.union(shifted)).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(4)).toSet).toMap
    var multi = 0
    (0L until 40L).foreach { id =>
      val (a, b) = (ch(id), ch(id + 1000))
      val shared = (a & b).size
      // everything after the first surviving content-defined cut is
      // byte-identical, so at most the head chunk (plus the cut the
      // splice window itself may add or remove) differs
      assert(shared >= a.size - 2,
        s"doc $id: only $shared of ${a.size} chunk hashes survive a prefix shift")
      // a doc with no interior cut is ONE chunk — nothing can survive
      // a prefix there; every multi-chunk doc must re-synchronize
      if (a.size >= 3) {
        multi += 1
        assert(shared > 0, s"doc $id (${a.size} chunks) failed to re-sync")
      }
    }
    assert(multi >= 20, s"corpus too cut-poor to exercise re-sync ($multi)")
  }

  test("shared interior regions produce shared block hashes across docs") {
    val interior = (0 until 40).map(i => s"common$i").mkString(" ")
    val c = corpusOf(
      1L -> s"alpha intro text $interior",
      2L -> s"a completely different and longer preamble here $interior")
    val ch = run(c).collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getString(4)).toSet).toMap
    assert((ch(1L) & ch(2L)).nonEmpty,
      "identical interiors must chunk to common block hashes")
  }

  test("non-ASCII text tiles in CHARS and md5 keys match the char slices") {
    // the r18 ADVICE bug: the kernel emitted BYTE cut offsets while the
    // consumer sliced with char-based substring — multi-byte text got
    // wrong boundaries/md5 keys and could break the tiling invariant.
    // The kernel now reports cuts in chars; verify tiling + hashes on
    // text where bytes != chars (2-byte letters mixed with ASCII).
    val txt = (0 until 30).map(i => s"wörter$i übér dätä").mkString(" ")
    val c = corpusOf(11L -> txt, 12L -> ("é" * 100))
    val rows = run(c).collect().groupBy(_.getLong(0))
    for ((id, body) <- Seq(11L -> txt, 12L -> "é" * 100)) {
      val ch = rows(id).sortBy(_.getInt(1))
      assert(ch.map(_.getInt(1)).toSeq == ch.indices.toSeq, s"doc $id ids")
      var off = 0
      ch.foreach { r =>
        assert(r.getInt(2) == off, s"doc $id: gap at chunk ${r.getInt(1)}")
        val slice = body.substring(off, off + r.getInt(3))
        val expect = java.security.MessageDigest.getInstance("MD5")
          .digest(slice.getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(r.getString(4) == expect,
          s"doc $id chunk ${r.getInt(1)}: md5 must hash the CHAR slice")
        off += r.getInt(3)
      }
      assert(off == body.length, s"doc $id: chunks cover $off of ${body.length}")
    }
  }

  test("malformed UTF-8 must not crash the kernel (r20 review)") {
    // Spark does not validate UTF-8 on binary->string casts, so stray
    // continuation bytes reach the kernel verbatim; the r20 two-pass
    // decode sized the codepoint array by a DIFFERENT counting rule
    // than the decode walk used and overflowed it on exactly this
    // input. Best-effort decode, deterministic, no throw.
    val df = spark.sql(
      "SELECT 1L AS doc_id, cast(concat(X'41424344454647484950', X'80', " +
        "X'41424344454647484950', X'FF', X'4142') AS STRING) AS text")
    val rows = run(df).collect()
    assert(rows.nonEmpty, "malformed text must still chunk")
    val again = run(df).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted),
      "malformed decode must be deterministic")
  }

  test("short-doc edge: below the window, one whole chunk") {
    val c = corpusOf(7L -> "tiny")
    val rows = run(c).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getInt(1) == 0 && r.getInt(2) == 0 && r.getInt(3) == 4)
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("tiny".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getString(4) == expect)
  }
}
