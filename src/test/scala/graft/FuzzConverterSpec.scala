package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DataConverter

/** Seeded fuzz differential #2: `tools/fuzz_gen2.py` composed 140
  * random documents (sectioned and single-format, spanning metadata,
  * strict/malformed JSON, HTML tables, CSV, SQL, OCR and free-text
  * sections) and executed the reference `DataConverter().parse` on
  * each. The Scala port must produce a structurally identical JSON
  * value for every document — covering dispatch order, fix_json's
  * quirks, csv.DictReader semantics, type coercion (booleans, nulls,
  * `,`→`.` floats), OCR fixes, title-class merging and the single-key
  * flatten. Regenerate with `python3 tools/fuzz_gen2.py`.
  */
class FuzzConverterSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  // two independent seeds (tools/fuzz_gen2.py defaults + seed 20260812)
  private val docs = {
    import scala.jdk.CollectionConverters._
    Seq("/fuzz_converter.json", "/fuzz_converter_s2.json").flatMap { res =>
      val in = getClass.getResourceAsStream(res)
      require(in != null, s"$res missing from test resources")
      val root = try mapper.readTree(in) finally in.close()
      root.get("docs").elements().asScala.toSeq
    }
  }

  test("fixture sanity: 280 reference-parsed documents over two seeds") {
    assert(docs.size == 280)
  }

  test("DataConverter.parse matches the executed reference on every fuzz document") {
    for (d <- docs) {
      val got = DataConverter.parse(d.get("text").asText())
      val want = d.get("parsed")
      assert(got == want,
        s"doc ${d.get("id").asInt()} mismatch:\n  port: $got\n  ref : $want\n  text: ${d.get("text").asText().take(200)}")
    }
  }

  test("parse of the reference's own input.txt matches its committed golden output") {
    val read = (p: String) => new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
    val got = DataConverter.parse(read("/root/reference/input.txt"))
    val golden = mapper.readTree(read("/root/reference/input_parsed2.json"))
    assert(got == golden)
  }
}
