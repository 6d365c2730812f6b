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
            step: Long = 1L): DataFrame = {
    require(step != 0, "WITH FILL STEP must be nonzero")
    val spark = df.sparkSession
    val colType = df.schema(orderCol).dataType
    val grid = spark.range(from, to, step)
      .select(col("id").cast(colType).as(orderCol))
    val missing = grid.join(df.select(col(orderCol)).distinct(),
      Seq(orderCol), "left_anti")
    val defaults = df.schema.fields.filter(_.name != orderCol).map { f =>
      val d = f.dataType match {
        case _: NumericType => lit(0).cast(f.dataType)
        case StringType => lit("")
        case BooleanType => lit(false)
        case other => lit(null).cast(other)
      }
      d.as(f.name)
    }
    val fillRows = missing.select(col(orderCol) +: defaults.toIndexedSeq: _*)
    df.unionByName(fillRows.select(df.columns.toIndexedSeq.map(col): _*))
      .orderBy(orderCol)
  }
}
