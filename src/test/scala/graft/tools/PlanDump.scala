package graft.tools
import graft.SparkTestSession

/** Dump the `.explain("formatted")` physical plan of one or more graded
  * queries to files — the round-deliverable format for before/after
  * plan evidence (`plans/r<N>/<query>_<tag>.txt`).
  *
  * Run: `sbt "Test/runMain graft.tools.PlanDump <op,op,...> <sfDir>
  * <outDir> [tag]"` — writes `<outDir>/<op>_<tag>.txt` (tag defaults to
  * `plan`). The single-file legacy form (`<op> <sfDir> <outFile>`) is
  * kept for scripts that pass a `.txt` path.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    def formatted(op: String, sfDir: String): String =
      graft.Registry.byName(op).build(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
    if (args.length >= 3 && args(2).endsWith(".txt")) {
      java.nio.file.Files.write(java.nio.file.Paths.get(args(2)),
        formatted(args(0), args(1)).getBytes("UTF-8"))
      println("[plandump] wrote " + args(2))
    } else {
      val tag = if (args.length > 3) args(3) else "plan"
      val outDir = java.nio.file.Paths.get(args(2))
      java.nio.file.Files.createDirectories(outDir)
      args(0).split(",").filter(_.nonEmpty).foreach { op =>
        val p = outDir.resolve(s"${op}_$tag.txt")
        java.nio.file.Files.write(p, formatted(op, args(1)).getBytes("UTF-8"))
        println("[plandump] wrote " + p)
      }
    }
  }
}
