package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DecimalType

/** Parquet fixture loading + shared expression helpers.
  *
  * Fixture layout per /root/repo/TESTDATA.md: one parquet file per table
  * under the scale-factor dir passed to every query.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark reads only as
    * a nanosecond long (spark.sql.legacy.parquet.nanosAsLong, set in all
    * session builders). Convert to a microsecond timestamp here; oracle
    * SQL does the matching `CAST(ts AS TIMESTAMP)` (ns → us) in DuckDB.
    * Integer `div` — double division would lose precision above 2^53.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Exact-decimal cast. The fixtures store money/quantity as double;
    * both Spark and the DuckDB oracle cast to the same DECIMAL(p,s) so
    * sums are exact and order-insensitive (float sums are neither).
    */
  def dec(c: Column, p: Int = 12, s: Int = 2): Column = c.cast(DecimalType(p, s))

  /** Timestamp literal (session TZ is pinned UTC). */
  def ts(s: String): Column = lit(s).cast("timestamp")

  /** Deterministic avg: exact decimal sum, then one double division,
    * rounded. Bit-identical in Spark and DuckDB for identical inputs.
    */
  def avgDec(c: Column, scale: Int = 6): Column =
    round(sum(dec(c)).cast("double") / count(lit(1)), scale)
}
