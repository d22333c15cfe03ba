package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke runner: replicates the driver's t1 check (entry rows>0)
  * and prints the flagship plan so scan pruning / broadcast choices
  * can be eyeballed. `sbt "runMain graft.Smoke"`. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = api.GraftSession.builder("local[8]", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.explain("formatted")
    val rows = df.collect()
    println(s"[smoke] entry rows=${rows.length}")
    rows.take(10).foreach(r => println(s"[smoke] $r"))
    require(rows.nonEmpty, "entry returned no rows")
    spark.stop()
  }
}
