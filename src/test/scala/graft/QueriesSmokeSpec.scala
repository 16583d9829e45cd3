package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared operator runs on Spark at sf0.001 and yields rows,
  * and has a same-named oracle (the driver requires both). */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("queries and oracleSql declare the same keys") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$name returns rows at sf0.001") {
      assert(SparkEntry.queries(name)(spark, TestSpark.Sf).count() > 0)
    }
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
