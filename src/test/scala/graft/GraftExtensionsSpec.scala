package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** spark.sql.extensions=graft.GraftExtensions wires the function and
  * the planner strategy into a fresh session with no register() calls. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions class injects graft_dot and the CosineTopK strategy") {
    val base = TestSpark.spark // ensure the shared context exists
    // builder().getOrCreate() would return the cached default session
    // (extensions are only applied at session construction) — clear the
    // default/active slots so a NEW session is built on the SAME
    // SparkContext, then restore the shared session for other suites
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // withExtensions = the same hook spark.sql.extensions=
      // graft.GraftExtensions reaches through config (the conf is
      // static, so it can't be set on an already-running context here)
      val spark = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      assert(spark ne base)
      val dot = spark.sql(
        "select graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
        .collect()(0).getDouble(0)
      assert(dot == 11.0)

      // the strategy is present without CosineTopKStrategy.register
      import graft.plans.CosineTopK
      import org.apache.spark.sql.graftbridge.DataFrameBridge
      val corpus = spark.sql(
        """select * from values
          |  (cast(1 as bigint), array(1.0d, 0.0d)),
          |  (cast(2 as bigint), array(0.6d, 0.8d)) as t(id, v)""".stripMargin)
      val out = DataFrameBridge.ofRows(spark, CosineTopK(1,
        DataFrameBridge.logicalPlan(corpus.where("id = 1")),
        DataFrameBridge.logicalPlan(corpus))).collect()
      assert(out.length == 1 && out(0).getLong(1) == 2L)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("graft_dot wrong arity raises AnalysisException at plan time") {
    val spark = TestSpark.spark
    graft.functions.DotProduct.register(spark)
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("select graft_dot(array(1.0d))").collect()
    }
    assert(e1.getMessage.contains("graft_dot"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("select graft_dot()").collect()
    }
    assert(e2.getMessage.contains("graft_dot"))
  }
}
