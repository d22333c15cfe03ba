package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator exposed through the driver contract: a Spark build
  * function plus (when SQL-expressible) semantically-equal DuckDB SQL
  * over the same parquet tables. Determinism rules (SURVEY.md §5.2):
  * every query ends in a total-order ORDER BY and floats whose
  * accumulation order could differ between engines are rounded.
  */
final case class OpQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object OpQuery {
  def apply(name: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): OpQuery =
    OpQuery(name, build, Some(oracle))

  /** Non-SQL-expressible op: driver records a weaker rows-only check. */
  def noOracle(name: String)(
      build: (SparkSession, String) => DataFrame): OpQuery =
    OpQuery(name, build, None)
}
