package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query.
  *
  * @param name   stable key, prefixed with the SURVEY.md §2 operator id
  *               it evidences (e.g. "g2_" for aggregate tier G2)
  * @param run    builds the DataFrame for the given fixture dir
  * @param oracle equivalent DuckDB SQL over the same parquet tables
  *               (None => driver records a weaker rows-only check)
  * @param bench  include in the headline benchmark sweep
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)
