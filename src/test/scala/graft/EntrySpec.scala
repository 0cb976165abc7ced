package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() returns rows on a bare session. */
class EntrySpec extends AnyFunSuite {
  test("entry returns rows on sf0.001") {
    val df = SparkEntry.entry(TestSpark.spark)
    assert(df.count() > 0)
  }

  test("every catalog query name has unique spark/oracle wiring") {
    val names = SparkEntry.catalog.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
