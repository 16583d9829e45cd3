package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Writeback

/** The bucketed stego table must make vec_id joins shuffle-free. */
class BucketedWritebackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed writeback co-locates vec_id joins (no exchange)") {
    val n = Writeback.writeStegoBucketed(spark, TestSpark.Sf,
      "stego_bucketed", "target/test-out/stego_bucketed", buckets = 8)
    assert(n == Tables.load(spark, TestSpark.Sf, "embeddings").count())
    // force a non-broadcast join so the planner exercises bucketing
    // (a broadcast join ignores buckets and proves nothing)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val t = spark.table("stego_bucketed")
      val joined = t.as("x").join(t.as("y"), "vec_id")
      assert(joined.count() == n) // vec_id unique -> 1:1 self-join
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"bucketed scan expected:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed self-join should be shuffle-free:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
