package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every native kernel must actually COMPILE inside whole-stage codegen
  * — a failed compile silently falls back to interpreted execution
  * (logged only as an executor-side ERROR), defeating the kernels. This
  * spec trips on any codegen compile failure while executing the
  * kernel-bearing queries. */
class CodegenCompileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def assertCompiles(name: String): Unit = {
    val appender = new CodegenErrorAppender
    val logger = org.apache.logging.log4j.LogManager.getLogger(
      "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator")
      .asInstanceOf[org.apache.logging.log4j.core.Logger]
    appender.start()
    logger.addAppender(appender)
    try {
      Registry.byName(name).build(spark, dir).collect()
      assert(appender.errors.isEmpty,
        s"$name: codegen compile failed (interpreted fallback):\n${appender.errors.mkString("\n")}")
    } finally logger.removeAppender(appender)
  }

  for (name <- Seq("op_detect_json", "op_fragment_priority_dedup",
      "op_parse_html_table", "op_merge_sections", "op_dedup_minhash",
      "op_dedup_simhash", "op_dedup_embedding", "op_text_fingerprint",
      "op_similarity_topk", "op_parse_file", "op_zorder", "op_zorder_ranked",
      "op_zorder_sketch", "op_stream_minhash_probe", "op_incremental_e2e"))
    test(s"$name executes with zero codegen compile failures") {
      assertCompiles(name)
    }

  test("registry sweep: EVERY query executes with zero codegen compile failures") {
    val appender = new CodegenErrorAppender
    val logger = org.apache.logging.log4j.LogManager.getLogger(
      "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator")
      .asInstanceOf[org.apache.logging.log4j.core.Logger]
    appender.start()
    logger.addAppender(appender)
    try {
      for (q <- Registry.all) {
        val before = appender.errors.size
        q.build(spark, dir).collect()
        assert(appender.errors.size == before,
          s"${q.name}: codegen compile failed:\n${appender.errors.drop(before).mkString("\n")}")
      }
    } finally logger.removeAppender(appender)
  }
}

class CodegenErrorAppender extends org.apache.logging.log4j.core.appender.AbstractAppender(
    "graft-cg-errors", null, null, false,
    org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
  val errors = new scala.collection.mutable.ArrayBuffer[String]
  override def append(e: org.apache.logging.log4j.core.LogEvent): Unit =
    if (e.getLevel.isMoreSpecificThan(org.apache.logging.log4j.Level.ERROR))
      errors.synchronized { errors += e.getMessage.getFormattedMessage.take(500) }
}
