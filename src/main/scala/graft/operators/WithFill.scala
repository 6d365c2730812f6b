package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `ORDER BY col WITH FILL FROM a TO b [STEP s]` — ClickHouse's
  * gap-filling sort (no Spark analog; SURVEY §2.6). The result is the
  * original rows plus one synthesized row for every grid point in
  * [from, to) (exclusive upper bound, ClickHouse semantics) absent
  * from the data; synthesized rows carry type defaults (0 / '' /
  * false), matching ClickHouse's default-value fill.
  *
  * Scale shape: the grid is a `spark.range` (parallel, no driver
  * loop); missing points come from one left-anti join keyed on the
  * fill column; the union is shuffle-free. Grid size is
  * (to-from)/step rows — independent of input size.
  */
object WithFill {

  def apply(df: DataFrame, orderCol: String, from: Long, to: Long,
            step: Long): DataFrame =
    apply(df, Nil, (orderCol, true), from, to, step)

  def apply(df: DataFrame, prefixCols: Seq[String], orderCol: String,
            from: Long, to: Long, step: Long = 1L): DataFrame =
    apply(df, prefixCols.map(_ -> true), (orderCol, true), from, to, step)

  /** Gap-fill the fill key over [from, to) within every distinct
    * combination of `prefixKeys` (ClickHouse multi-key `ORDER BY k1,
    * ..., col WITH FILL`; empty prefix = global fill). Each key
    * carries its ASC/DESC flag, honored in the final sort. The grid is
    * distinct-prefixes × range — both sides distributed; the range
    * side is broadcast (its size is (to-from)/step, input-independent).
    * The anti-join uses null-safe equality: a NULL prefix group must
    * match its own grid rows, not re-emit the whole grid as fills. */
  def apply(df: DataFrame, prefixKeys: Seq[(String, Boolean)],
            orderKey: (String, Boolean), from: Long, to: Long,
            step: Long): DataFrame =
    apply(df, prefixKeys, orderKey, from, to, step, Nil)

  /** As above, plus `INTERPOLATE (col AS col)` carry-forward: the named
    * columns take the last real row's value on synthesized rows (type
    * default when the gap precedes any real row) instead of the type
    * default. Carry runs in a window partitioned by the prefix keys —
    * with an empty prefix that window is single-partition, which is
    * fine because the filled result is grid-bounded by construction,
    * not input-sized. */
  def apply(df: DataFrame, prefixKeys: Seq[(String, Boolean)],
            orderKey: (String, Boolean), from: Long, to: Long,
            step: Long, interpolate: Seq[String]): DataFrame = {
    require(step != 0, "WITH FILL STEP must be nonzero")
    val spark = df.sparkSession
    val (orderCol, orderAsc) = orderKey
    val prefixCols = prefixKeys.map(_._1)
    val colType = df.schema(orderCol).dataType
    val gridRange = spark.range(from, to, step)
      .select(col("id").cast(colType).as(orderCol))
    val keyCols = prefixCols :+ orderCol
    val grid =
      if (prefixCols.isEmpty) gridRange
      else df.select(prefixCols.map(col): _*).distinct()
        .crossJoin(broadcast(gridRange))
    val missing = grid.alias("g").join(
      df.select(keyCols.map(col): _*).distinct().alias("d"),
      keyCols.map(k => col(s"g.$k") <=> col(s"d.$k")).reduce(_ && _),
      "left_anti")
    val defaults = df.schema.fields.filterNot(f => keyCols.contains(f.name))
      .map { f =>
        val d =
          if (interpolate.contains(f.name)) lit(null).cast(f.dataType)
          else f.dataType match {
            case _: NumericType => lit(0).cast(f.dataType)
            case StringType => lit("")
            case BooleanType => lit(false)
            case other => lit(null).cast(other)
          }
        d.as(f.name)
      }
    val fillRows = missing.select(
      keyCols.map(col) ++ defaults.toIndexedSeq: _*)
    val sortKeys = (prefixKeys :+ orderKey).map {
      case (k, true) => col(k).asc
      case (k, false) => col(k).desc
    }
    val mark = "__graft_fill"
    val unioned = df.withColumn(mark, lit(false)).unionByName(
      fillRows.select(df.columns.toIndexedSeq.map(col): _*)
        .withColumn(mark, lit(true)))
    val carried =
      if (interpolate.isEmpty) unioned
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(prefixCols.map(col): _*)
          .orderBy(if (orderAsc) col(orderCol).asc else col(orderCol).desc)
          .rowsBetween(Long.MinValue, 0)
        interpolate.foldLeft(unioned) { (d, c) =>
          val default = df.schema(c).dataType match {
            case _: NumericType => lit(0).cast(df.schema(c).dataType)
            case StringType => lit("")
            case BooleanType => lit(false)
            case other => lit(null).cast(other)
          }
          // Carry the previous REAL row's value via a struct wrapper:
          // last-ignore-nulls directly on c would skip a real row whose
          // value IS null and resurrect an older stale value. The
          // struct is null only on fill rows, so ignoreNulls skips
          // exactly those; a real null value rides inside it.
          val iv = s"__graft_iv_$c"
          val ivType = StructType(Seq(StructField("v", df.schema(c).dataType)))
          val lastReal = last(col(iv), ignoreNulls = true).over(w)
          d.withColumn(iv, when(col(mark), lit(null).cast(ivType))
              .otherwise(struct(col(c).as("v")).cast(ivType)))
            .withColumn(c, when(col(mark),
              when(lastReal.isNotNull, lastReal.getField("v")).otherwise(default))
              .otherwise(col(c)))
            .drop(iv)
        }
      }
    carried.drop(mark).orderBy(sortKeys: _*)
  }
}
