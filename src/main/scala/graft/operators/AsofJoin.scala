package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** ASOF join: for each left row, attach the most recent right row with
  * rightTs <= leftTs for the same key (ClickHouse `ASOF JOIN` semantics;
  * reference delegates it wholesale — SURVEY.md §2.3 J5).
  *
  * Spark-first plan: instead of a range join (quadratic blow-up) or a
  * per-key collect, union both sides and run one `last(_, ignoreNulls)`
  * window per right column. Cost = ONE shuffle of (|L|+|R|) rows on the
  * key + a sort within partitions — the same shape Spark uses for any
  * window, so it scales to 100 TB exactly like a groupBy would (skew on
  * the key is the only hazard, same as any keyed op).
  *
  * Tie rule: right rows sort before left rows at equal ts, so an exact
  * timestamp match IS taken (matches `ON l.ts >= r.ts`).
  */
object AsofJoin {

  /** @param left      left side (kept in full)
    * @param right     right side; its non-key, non-ts columns are carried
    *                  over with `rightPrefix`
    * @param on        equi-key column names present on both sides
    * @param leftTs    left timestamp/ordering column name
    * @param rightTs   right timestamp/ordering column name
    * @param inner     true: drop left rows with no match; false: keep (nulls)
    * @param forward   false (default): most recent right with
    *                  rightTs <= leftTs (ClickHouse `>=` form); true:
    *                  nearest following right with rightTs >= leftTs
    *                  (`<=` form) — same one-shuffle plan, scan order
    *                  reversed
    */
  def apply(left: DataFrame, right: DataFrame, on: Seq[String],
            leftTs: String, rightTs: String,
            rightPrefix: String = "r_", inner: Boolean = true,
            forward: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftCols  = left.columns.toSeq
    // __matched marker survives even when every carried value is null
    val right1    = right.withColumn("__matched", lit(true))
    val carryCols = right1.columns.filterNot(c => on.contains(c)).toSeq
    // the whole right row travels as ONE struct: per-column
    // last(ignoreNulls) fills would stitch values from DIFFERENT right
    // rows whenever a carried column contains real nulls
    val carryType = StructType(carryCols.map(c =>
      StructField(c, right1.schema(c).dataType, nullable = true)))

    val l2 = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(carryType))

    val r2base = right1
      .withColumn("__ts", col(rightTs)).withColumn("__side", lit(0))
    val r2cols = on.map(col) ++ Seq(col("__ts"), col("__side")) ++
      leftCols.filterNot(on.contains).map(c =>
        lit(null).cast(left.schema(c).dataType).as(c)) ++
      Seq(struct(carryCols.map(c => col(c).as(c)): _*).cast(carryType).as("__r"))
    val r2 = r2base.select(r2cols: _*)

    val unioned = r2.unionByName(l2.select(r2.columns.map(col): _*))

    val tsOrder = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(tsOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // NULL join keys never match (equi-join semantics): the window
    // partitioner groups null keys together, so null them out post-fill
    val nullKey = on.map(col(_).isNull).reduce(_ || _)
    val filled = unioned
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .withColumn("__r", when(nullKey, lit(null).cast(carryType))
        .otherwise(col("__r")))

    val matched0 = filled.filter(col("__side") === 1)
    val matched =
      if (inner)
        matched0.filter(col("__r").isNotNull &&
          col("__r").getField("__matched"))
      else matched0
    matched.select(
      (leftCols.map(col) ++
        carryCols.filterNot(_ == "__matched")
          .map(c => col("__r").getField(c).as(s"$rightPrefix$c"))): _*)
  }
}
