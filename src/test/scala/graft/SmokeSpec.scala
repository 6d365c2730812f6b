package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query runs end-to-end on the sf0.001 fixtures and
  * produces a sane result (schema non-empty; rows > 0 unless the query
  * is legitimately empty at this scale). */
class SmokeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  // legitimately empty at sf0.001 (every customer has an order)
  private val mayBeEmpty = Set("j4_anti")

  for (q <- SparkEntry.all) {
    test(s"${q.name} runs on sf0.001") {
      val df = q.run(spark, dir)
      assert(df.schema.fields.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
