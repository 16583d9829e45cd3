package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SkewSalt

/** Skew salting must be a pure parallelism transform: the pair set is
  * identical to the unsalted self-join, for any S. */
class SkewSaltSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def skewed = {
    import spark.implicits._
    // one pathological bucket (0: 80 rows) + small buckets
    ((0 until 80).map(i => (i.toLong, 0L)) ++
      (80 until 100).map(i => (i.toLong, (i % 5 + 1).toLong)))
      .toDF("id", "bucket")
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("salted pair set equals the plain self-join pair set") {
    val df = skewed
    val plain = df.as("a").join(df.as("b"),
      col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
    for (s <- Seq(1, 4, 7)) {
      val salted = SkewSalt.saltedSelfJoinPairs(df, "id", "bucket", s)
      assert(pairSet(salted) == pairSet(plain), s"salt factor $s")
    }
    // sanity: the skewed bucket really dominates (80*79/2 pairs)
    assert(pairSet(plain).size == 80 * 79 / 2 + 5 * (4 * 3 / 2))
  }

  test("payload columns survive with a_/b_ prefixes") {
    import spark.implicits._
    val df = Seq((1L, 0L, "x"), (2L, 0L, "y")).toDF("id", "bucket", "tag")
    val out = SkewSalt.saltedSelfJoinPairs(df, "id", "bucket", 3)
    val row = out.collect().head
    assert(out.columns.toSet == Set("a_id", "a_bucket", "a_tag", "b_id", "b_bucket", "b_tag"))
    assert(row.getAs[String]("a_tag") == "x" && row.getAs[String]("b_tag") == "y")
  }
}
