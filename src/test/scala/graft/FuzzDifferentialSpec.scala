package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Graft
import graft.functions.Fragments

/** Seeded fuzz differential: `tools/fuzz_gen.py` composed 160 random
  * messy documents (every fragment family mixed; the last 40 lean on
  * adversarial pieces — sectioned-JSON headers, unclosed braces,
  * `;`/tab CSV, low-colon YAML, braces inside JSON strings — ~730
  * fragments total), executed the REFERENCE parser on each, and
  * recorded the observed
  * fragments/summary/record spans in `fuzz_detector.json`. The port
  * must reproduce every span, type, confidence and normalized-record
  * identity byte-for-byte — far beyond the two hand-written golden
  * fixtures. Regenerate the fixture with `python3 tools/fuzz_gen.py`.
  */
class FuzzDifferentialSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  // two independent seeds (tools/fuzz_gen.py defaults + seed 424242)
  private val docs = {
    import scala.jdk.CollectionConverters._
    Seq("/fuzz_detector.json", "/fuzz_detector_s2.json").flatMap { res =>
      val in = getClass.getResourceAsStream(res)
      require(in != null, s"$res missing from test resources")
      val root = try mapper.readTree(in) finally in.close()
      root.get("docs").elements().asScala.toSeq
    }
  }

  test("fixture sanity: 320 docs over two seeds, >2000 reference fragments") {
    assert(docs.size == 320)
    assert(docs.map(_.get("fragments").size()).sum > 2000)
    // unicode guard: the corpus must exercise Python-\w-vs-Java-\w paths
    assert(docs.count(_.get("text").asText.exists(_ > 127)) >= 20)
  }

  test("detector reproduces every reference fragment span, type and confidence") {
    import scala.jdk.CollectionConverters._
    for (d <- docs) {
      val id = d.get("id").asInt()
      val got = Fragments.detect(d.get("text").asText())
        .map(f => (f.format_type, f.start_index, f.end_index,
          math.rint(f.confidence * 1e6) / 1e6))
      val want = d.get("fragments").elements().asScala.toSeq
        .map(f => (f.get("format_type").asText(), f.get("start").asInt(),
          f.get("end").asInt(), f.get("confidence").asDouble()))
      assert(got == want, s"doc $id fragment mismatch")
    }
  }

  test("summary counts match the reference per document") {
    import scala.jdk.CollectionConverters._
    for (d <- docs) {
      val got = Fragments.detect(d.get("text").asText())
        .groupBy(_.format_type).map { case (k, v) => k -> v.size }
      val want = d.get("summary").fields().asScala
        .map(e => e.getKey -> e.getValue.asInt()).toMap
      assert(got == want, s"doc ${d.get("id").asInt()} summary mismatch")
    }
  }

  test("normalizer produces a record for exactly the fragments the reference does") {
    import scala.jdk.CollectionConverters._
    for (d <- docs) {
      val (frags, _, records) = Graft.parseFile(d.get("text").asText())
      // our records serialize format/start/end in their JSON heads
      val got = frags.flatMap { f =>
        graft.functions.Normalizer.normalize(f).map(_ =>
          (f.format_type, f.start_index, f.end_index))
      }
      val want = d.get("records").elements().asScala.toSeq
        .map(r => (r.get("format").asText(), r.get("start").asInt(), r.get("end").asInt()))
      assert(got == want, s"doc ${d.get("id").asInt()} record-identity mismatch")
      assert(records.size == want.size)
    }
  }

  test("normalized record payloads are structurally identical to the reference's") {
    import scala.jdk.CollectionConverters._
    var compared = 0
    for (d <- docs) {
      val frags = Fragments.detect(d.get("text").asText())
      val got = frags.flatMap(f => graft.functions.Normalizer.normalize(f))
      val want = d.get("records").elements().asScala.toSeq.map(_.get("data"))
      for (((g, w), k) <- got.zip(want).zipWithIndex) {
        val gTree = mapper.readTree(g)
        assert(gTree == w,
          s"doc ${d.get("id").asInt()} record $k payload mismatch:\n  port: $g\n  ref : $w")
        compared += 1
      }
    }
    assert(compared > 150, s"only $compared payloads compared")
  }
}
