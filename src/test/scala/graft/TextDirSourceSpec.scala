package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom DataSource V2 provider: partition planning (one per
  * file), column pruning, code-point length semantics, and round-trip
  * fidelity for messy multi-line content. */
class TextDirSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def withDir(test: Path => Unit): Unit = {
    val dir = Files.createTempDirectory("textdir")
    try test(dir)
    finally {
      Files.list(dir).forEach(p => Files.delete(p))
      Files.delete(dir)
    }
  }

  private def load(dir: Path) =
    spark.read.format("graft.sources.v2.TextDirSource")
      .option("path", dir.toString).load()

  test("one row per file; content round-trips incl. newlines and quotes") {
    withDir { dir =>
      Files.writeString(dir.resolve("a.txt"), "line one\nline two: \"quoted\"\n---\nk: v")
      Files.writeString(dir.resolve("b.txt"), "{\"j\": 1}")
      val rows = load(dir).orderBy("path").collect()
      assert(rows.length == 2)
      assert(rows(0).getString(1) == "line one\nline two: \"quoted\"\n---\nk: v")
      assert(rows(1).getString(1) == "{\"j\": 1}")
    }
  }

  test("length is code points (multi-byte text), not bytes or UTF-16 units") {
    withDir { dir =>
      Files.writeString(dir.resolve("zh.txt"), "中文三字")  // 4 code points, 12 UTF-8 bytes
      val r = load(dir).select("length").head()
      assert(r.getLong(0) == 4L)
    }
  }

  test("partition planning: one input partition per file, path-sorted") {
    withDir { dir =>
      (1 to 5).foreach(i => Files.writeString(dir.resolve(s"f$i.txt"), s"doc $i"))
      val df = load(dir)
      assert(df.rdd.getNumPartitions == 5, "expected one partition per file")
      assert(df.select("path").as(org.apache.spark.sql.Encoders.STRING)
        .collect().toSeq == df.select("path").collect().map(_.getString(0)).toSeq.sorted)
    }
  }

  test("column pruning reaches the scan (text dropped from ReadSchema)") {
    withDir { dir =>
      Files.writeString(dir.resolve("a.txt"), "abc")
      val pruned = load(dir).select("path")
      val p = pruned.queryExecution.executedPlan.toString
      assert(p.contains("TextDirScan") && p.contains("cols=path"),
        s"pruned projection did not reach the V2 scan:\n$p")
      assert(pruned.head().getString(0).endsWith("a.txt"))
    }
  }

  test("empty or missing directory yields an empty table, not an error") {
    withDir { dir => assert(load(dir).isEmpty) }
    assert(spark.read.format("graft.sources.v2.TextDirSource")
      .option("path", "/tmp/graft_no_such_dir").load().isEmpty)
  }
}
