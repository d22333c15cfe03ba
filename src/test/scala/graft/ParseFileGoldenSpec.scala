package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.Graft

/** Golden differential for the full `parse_file` path (detector +
  * normalizer): the reference, executed on its own fixture inputs,
  * yields 14 normalized records for input.txt and 9 for input2.txt
  * (SURVEY.md §2 "Observed behavior") — counts that exercise every
  * normalizer branch, including the None-normal-form drops (RAW_TEXT,
  * YAML, HTML) and the headerless-thead table quirk. */
class ParseFileGoldenSpec extends AnyFunSuite {

  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")

  test("input.txt: 14 normalized records, formats as observed") {
    val (frags, summary, records) = Graft.parseFile(read("/root/reference/input.txt"))
    assert(frags.size == 22)
    assert(records.size == 14,
      "22 fragments minus the 8 RAW_TEXT fragments (no normal form)")
    // every record is valid JSON in our representation
    records.foreach(r => assert(functions.Fragments.isStrictJson(r), r.take(120)))
    assert(summary("RAW_TEXT") == 8)
  }

  test("input2.txt: 9 normalized records (RAW_TEXT, YAML and HTML dropped)") {
    val (frags, summary, records) = Graft.parseFile(read("/root/reference/input2.txt"))
    assert(frags.size == 25)
    assert(records.size == 9,
      "25 fragments minus 14 RAW_TEXT, 1 YAML_FRONTMATTER, 1 HTML")
    records.foreach(r => assert(functions.Fragments.isStrictJson(r), r.take(120)))
    assert(summary("YAML_FRONTMATTER") == 1 && summary("HTML") == 1)
  }

  test("record payloads carry the reference's parsed content") {
    val (_, _, records) = Graft.parseFile(read("/root/reference/input.txt"))
    // the strict JSON fragment (input.txt:10-22) survives verbatim,
    // nested pricing object included
    assert(records.exists(r => r.contains("\"price_usd\"") && r.contains("\"pricing\"")))
    // the SQL-in-prose trap becomes a record with a sql field
    assert(records.exists(_.contains("\"sql\": \"DROP TABLE users;\"")))
    // the key-value header block parses to string pairs
    assert(records.exists(r => r.contains("\"scraper\"") && r.contains("simple-scraper-v1")))
    // the headered HTML table parses to header-keyed rows
    assert(records.exists(r => r.startsWith("[") && r.contains("\"ProductID\"")))
  }
}
