package graft

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper

import graft.functions.{DataConverter, Fragments, Normalizer}

/** Dev harness: replay an alternate-seed fuzz fixture (written by
  * tools/fuzz_gen*.py to any path) through the ports and report
  * mismatches — lets us shake the ports with fresh seeds without
  * touching the committed fixtures.
  *
  * Usage: sbt "Test/runMain graft.FuzzCheck det /tmp/det_7.json"
  *        sbt "Test/runMain graft.FuzzCheck conv /tmp/conv_7.json"
  */
object FuzzCheck {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val mapper = new ObjectMapper()
    import scala.jdk.CollectionConverters._
    var bad = 0
    for (path <- args.drop(1)) {
      val root = mapper.readTree(new String(Files.readAllBytes(Paths.get(path)), "UTF-8"))
      val docs = root.get("docs").elements().asScala.toSeq
      for (d <- docs) {
        val text = d.get("text").asText()
        val id = d.get("id").asInt()
        if (mode == "det") {
          val got = Fragments.detect(text).map(f =>
            (f.format_type, f.start_index, f.end_index, math.rint(f.confidence * 1e6) / 1e6))
          val want = d.get("fragments").elements().asScala.toSeq.map(f =>
            (f.get("format_type").asText(), f.get("start").asInt(),
              f.get("end").asInt(), f.get("confidence").asDouble()))
          if (got != want) { bad += 1; println(s"MISMATCH $path doc $id (fragments)") }
          val gotRec = Fragments.detect(text).flatMap(f => Normalizer.normalize(f))
          val wantRec = d.get("records").elements().asScala.toSeq.map(_.get("data"))
          if (gotRec.size != wantRec.size) {
            bad += 1; println(s"MISMATCH $path doc $id (record count)")
          } else gotRec.zip(wantRec).zipWithIndex.foreach { case ((g, w), k) =>
            if (mapper.readTree(g) != w) {
              bad += 1; println(s"MISMATCH $path doc $id record $k\n  port: $g\n  ref : $w")
            }
          }
        } else {
          val got = DataConverter.parse(text)
          if (got != d.get("parsed")) {
            bad += 1
            println(s"MISMATCH $path doc $id\n  port: $got\n  ref : ${d.get("parsed")}")
          }
        }
      }
      println(s"$path: ${docs.size} docs checked")
    }
    println(if (bad == 0) "ALL MATCH" else s"$bad MISMATCHES")
    if (bad > 0) sys.exit(1)
  }
}
