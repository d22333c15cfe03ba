package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end STREAMING ETL: the reference's pipeline as a continuous
  * job — `readStream` over a directory of raw text files (one file =
  * one document, the reference's I/O shape), the native parse kernel as
  * the transform, `writeStream` to parquet with a checkpoint. New files
  * dropped into the source directory flow through incrementally; the
  * checkpoint makes the job restartable. This is the `readStream →
  * transforms → writeStream` integration the per-operator streaming
  * specs don't cover.
  */
class StreamingEtlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("text-file stream -> parseDocuments -> parquet sink, incremental") {
    val root = java.nio.file.Files.createTempDirectory("streametl")
    val in = root.resolve("in"); java.nio.file.Files.createDirectory(in)
    val out = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString

    def drop(name: String, body: String): Unit =
      java.nio.file.Files.writeString(in.resolve(name), body)

    drop("d1.txt", "k1: a\nk2: b\n\n{\"id\": 1, \"ok\": true}")

    val src = spark.readStream
      .option("wholetext", "true")
      .text(in.toString)
      .withColumn("path", input_file_name())
      .withColumnRenamed("value", "text")
    val parsed = graft.api.Graft.parseDocuments(src, col("text"))
      .select(col("path"), size(col("fragments")).as("n_fragments"),
        size(col("records")).as("n_records"))

    val q = parsed.writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 1)

      // incremental: a new file flows through without reprocessing d1
      drop("d2.txt", "plain prose words for the raw detector to claim here")
      q.processAllAvailable()
      val rows = spark.read.parquet(out).collect()
        .map(r => (r.getString(0).split('/').last, r.getInt(1))).toMap
      assert(rows.size == 2, s"expected both docs, got $rows")
      assert(rows("d1.txt") >= 2 && rows("d2.txt") >= 1)
    } finally q.stop()

    // restartability: a NEW query on the same checkpoint sees d1/d2 as
    // already committed and only processes files added after
    drop("d3.txt", "id: 3\nmode: on\nnote: later arrival")
    val q2 = parsed.writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      q2.processAllAvailable()
      val names = spark.read.parquet(out).collect()
        .map(_.getString(0).split('/').last).sorted
      assert(names === Array("d1.txt", "d2.txt", "d3.txt"),
        s"restart must resume, not reprocess: ${names.mkString(",")}")
    } finally q2.stop()
  }
}
