package graft

import org.scalatest.funsuite.AnyFunSuite

/** ensureCorpus staleness contract (ADVICE r14): the synthesized /tmp
  * scale corpora are the evidence base for the capped-heap smokes AND
  * the BucketOccupancy cap certification, so reuse must be keyed on
  * the BASE DROP'S identity (listing fingerprint stamped in a marker
  * file), never on mere file existence — after the driver regenerates
  * /root/testdata, a corpus built from the previous drop must rebuild,
  * or the certification silently decouples from the data it claims to
  * certify. */
class ScaleCorpusMarkerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("corpus reuse is fingerprint-keyed: stamp on build, reuse on match, rebuild on mismatch") {
    // Copies = 1: the marker contract is copy-count-independent and the
    // forced rebuild below runs on every suite invocation — keep the
    // fixed cost at one base-sized corpus, not two
    val dir = ScaleSmoke.ensureCorpus(spark, 1)
    val marker = java.nio.file.Paths.get(s"$dir/.base_fingerprint")
    assert(java.nio.file.Files.exists(marker), "build must stamp the base fingerprint")
    val fp = java.nio.file.Files.readString(marker)
    assert(fp.contains("documents.parquet=") && !fp.contains("=absent"),
      s"marker must carry per-table base listings: $fp")

    // unchanged base → reuse: the corpus parquet is left untouched
    val docsDir = new java.io.File(s"$dir/documents.parquet")
    def snapshot() = docsDir.listFiles().map(f => f.getName -> f.lastModified).toMap
    val before = snapshot()
    ScaleSmoke.ensureCorpus(spark, 1)
    assert(snapshot() == before, "unchanged base drop must NOT trigger a rebuild")

    // simulated previous-drop marker → rebuild, re-stamped with the
    // CURRENT base fingerprint (part-file UUIDs prove a real rewrite)
    java.nio.file.Files.writeString(marker, "stale-previous-drop")
    ScaleSmoke.ensureCorpus(spark, 1)
    assert(java.nio.file.Files.readString(marker) == fp,
      "a fingerprint mismatch must rebuild and re-stamp the current base")
    assert(snapshot() != before, "mismatched marker must trigger an actual rebuild")
  }
}
