package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants that don't need a SparkSession. */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size === names.size,
      s"duplicates: ${names.diff(names.distinct)}")
  }

  test("every query name carries a SURVEY §2 tier prefix") {
    val ok = "^(st|s|p|j|g|w|o|f|a|l|m|b|cb)[0-9]+[a-z0-9_]*_".r
    SparkEntry.all.foreach(q =>
      assert(ok.findPrefixOf(q.name).isDefined, s"bad name: ${q.name}"))
  }

  test("most queries have a DuckDB oracle (weaker rows-only checks are the exception)") {
    val noOracle = SparkEntry.all.filter(_.oracle.isEmpty).map(_.name)
    assert(noOracle.size <= SparkEntry.all.size / 5,
      s"too many oracle-less queries: $noOracle")
  }

  test("oracle SQL references no Spark-only functions") {
    // spot-guard against forgetting to translate to DuckDB dialect
    val sparkisms = Seq("percentile(", "approx_count_distinct", "collect_list",
      "collect_set", "array_sort(", "aggregate(")
    for (q <- SparkEntry.all; o <- q.oracle; bad <- sparkisms)
      assert(!o.contains(bad), s"${q.name} oracle contains Spark-only '$bad'")
  }

  test("bench subset is non-empty and all names resolve") {
    assert(SparkEntry.benchNames.nonEmpty)
    val names = SparkEntry.all.map(_.name).toSet
    SparkEntry.benchNames.foreach(n => assert(names(n)))
  }
}
