package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Fragments, Normalizer}

/** Property tests from SURVEY §5.2 #3 / FIXTURES §2.3: structures
  * planted inside neutral prose must be detected with the right type
  * and span, and broken JSON must repair or degrade to kv extraction.
  * Generators avoid characters that would themselves trigger detectors
  * (no colons/commas/braces/angle brackets in the prose filler).
  */
class DetectorPropertySpec extends AnyFunSuite {

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(8))
  private val prose: Gen[String] =
    Gen.chooseNum(6, 14).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  private def cases[A](g: Gen[A], n: Int = 60): Seq[A] =
    Gen.listOfN(n, g).sample.get

  test("planted strict JSON objects are found with exact spans") {
    val jsonGen = for {
      keys <- Gen.listOfN(3, word).map(_.distinct)
      vals <- Gen.listOfN(3, Gen.chooseNum(0, 99999))
    } yield keys.zip(vals).map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")
    val docGen = for { p1 <- prose; j <- jsonGen; p2 <- prose } yield (s"$p1\n\n$j\n\n$p2", j)
    cases(docGen).foreach { case (doc, j) =>
      val frags = Fragments.detect(doc).filter(_.format_type == "JSON")
      assert(frags.size == 1, doc)
      assert(frags.head.text == j)
      assert(doc.substring(frags.head.start_index, frags.head.end_index) == j)
    }
  }

  test("planted CSV blocks are typed by header and delimiter") {
    val delims = Gen.oneOf(",", ";", "\t")
    val csvGen = for {
      d <- delims
      cols <- Gen.chooseNum(2, 5)
      rows <- Gen.chooseNum(2, 6)
      header <- Gen.listOfN(cols, word)
      data <- Gen.listOfN(rows, Gen.listOfN(cols, Gen.chooseNum(0, 999)))
    } yield (d, (header.mkString(d) +: data.map(_.mkString(d))).mkString("\n"))
    val docGen = for { p <- prose; (d, c) <- csvGen } yield (s"$p\n\n$c", d)
    cases(docGen).foreach { case (doc, d) =>
      val frags = Fragments.detect(doc)
      val csv = frags.filter(f => f.format_type == "CSV")
      assert(csv.size == 1, doc)
      assert(csv.head.meta("delimiter") == d)
      // headerless variant of the same block: strip letters from row 1
      val noHeader = doc.replaceAll("(?m)^[a-z" + java.util.regex.Pattern.quote(d) + "]+$", "")
      val _ = noHeader // (header detection is covered by the unit battery)
    }
  }

  test("planted key-value runs of >=2 lines are detected") {
    val kvGen = for {
      n <- Gen.chooseNum(2, 6)
      ks <- Gen.listOfN(n, word)
      vs <- Gen.listOfN(n, word)
    } yield ks.zip(vs).map { case (k, v) => s"$k: $v" }.mkString("\n")
    val docGen = for { p <- prose; kv <- kvGen } yield (s"$p\n\n$kv", kv)
    cases(docGen).foreach { case (doc, kv) =>
      val hits = Fragments.detect(doc).filter(_.format_type == "KEY_VALUE")
      assert(hits.size == 1, doc)
      assert(hits.head.text == kv)
      assert(hits.head.meta("pairs").toInt == kv.split("\n").length)
    }
  }

  test("broken JSON repairs to strict JSON or degrades to kv pairs") {
    val breakage = Gen.oneOf[String => String](
      (s: String) => s.replaceAll("\\}$", ",}"),                       // trailing comma
      (s: String) => s.replaceAll("\"(\\w+)\":", "$1:"),               // unquote keys
      (s: String) => s.replaceAll("\"(\\w+)\"( *[,}\\]])", "'$1'$2"))  // single-quote values
    val objGen = for {
      keys <- Gen.listOfN(3, word).map(_.distinct.filter(_.nonEmpty))
      if keys.nonEmpty
      vals <- Gen.listOfN(keys.size, word)
      break <- breakage
    } yield break(keys.zip(vals).map { case (k, v) => s""""$k": "$v"""" }.mkString("{", ", ", "}"))
    cases(objGen, 80).foreach { broken =>
      val frags = Fragments.detect("padding words here\n\n" + broken)
      frags.filter(_.format_type == "MALFORMED_JSON").foreach { f =>
        val rec = Normalizer.normalize(f)
        assert(rec.isDefined, broken)
        assert(Fragments.isStrictJson(rec.get), s"$broken -> ${rec.get}")
      }
    }
  }

  test("detector is total and spans are well-formed on arbitrary input") {
    val junk = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(Seq(' ', '\n', '{', '}',
      ':', ',', '<', '>', '"', '\'', ';', '-', '=')))).map(_.mkString)
    cases(junk, 120).foreach { doc =>
      val frags = Fragments.detect(doc)
      frags.foreach { f =>
        assert(f.start_index >= 0 && f.end_index <= doc.length && f.start_index <= f.end_index)
        assert(f.text == doc.substring(f.start_index, f.end_index))
        assert(f.confidence >= 0.0 && f.confidence <= 1.0)
      }
      assert(frags.map(_.start_index) == frags.map(_.start_index).sorted)
    }
  }

  test("DetectFragmentsBoth halves equal the individual kernels through Spark") {
    // kernel-pair coherence, evaluated through the actual expressions
    // (not the Scala functions): before == detectRaw, after == detect
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = cases(prose, 30).zipWithIndex.map { case (p, i) =>
      s"""k$i: v$i\nmode = on\n\n$p\n\n{"id": $i, "ok": true}\n\nSELECT $i FROM t;"""
    }
    val df = docs.toDF("text")
      .withColumn("ba", graft.plans.DetectFragmentsBoth.detectBoth(col("text")))
      .withColumn("raw", graft.plans.DetectFragments.detectRaw(col("text")))
      .withColumn("ded", graft.plans.DetectFragments.detect(col("text")))
      .select(
        // fragment structs carry a map field, which EqualTo cannot
        // order — compare the serialized forms (both kernels build the
        // map from the same Scala Map iteration, so order is identical)
        (to_json(col("ba.before")) === to_json(col("raw"))).as("rawEq"),
        (to_json(col("ba.after")) === to_json(col("ded"))).as("dedEq"))
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(r => r.getBoolean(0) && r.getBoolean(1)),
      "Both kernel diverged from the individual detect/detectRaw kernels")
  }
}
