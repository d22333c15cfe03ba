package graft.tools
import graft.SparkTestSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val df = graft.Registry.byName(args(0)).build(spark, args(1))
    java.nio.file.Files.write(java.nio.file.Paths.get(args(2)),
      df.queryExecution.executedPlan.toString.getBytes("UTF-8"))
    println("[plandump] wrote " + args(2))
  }
}
