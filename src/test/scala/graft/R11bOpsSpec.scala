package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sqlgen.{Gen, SparkDialect}

/** Residual IVFADC (vec_topk_ivfpq_res / vec_ivfpq_res_distortion,
  * §2 row 4d2): the served artifact path must equal the executed
  * inline Spark rendering row-for-row, the ADC ranking must be
  * well-formed, and the residual codebooks must beat the raw-PQ
  * codebooks at the same budget — the claim the layout exists for. */
class R11bOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("vec_topk_ivfpq_res: served artifact path equals the inline rendering; ranking well-formed") {
    val served = SparkEntry.queries("vec_topk_ivfpq_res")(spark, TestSpark.Sf).collect()
    val inline = {
      Tables.register(spark, TestSpark.Sf)
      WmCache.ensure(spark, TestSpark.Sf)
      // useViews = false renders the full inline train+encode chain —
      // the oracle shape — on Spark
      spark.sql(new Gen(SparkDialect).ivfPqResSql(None)).collect()
    }
    assert(served.map(_.toString).sorted.toSeq == inline.map(_.toString).sorted.toSeq)
    val byQ = served.groupBy(_.getAs[Long]("qid"))
    assert(byQ.keySet == graft.sqlgen.Wm.QueryIds.map(_.toLong).toSet)
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rn"))
      assert(sorted.length == 10, s"query $q row count")
      assert(sorted.map(_.getAs[Long]("rn")).toSeq == (1L to 10L), s"query $q ranks")
      val d2 = sorted.map(_.getAs[Double]("approx_d2")).toSeq
      assert(d2 == d2.sorted, s"query $q ADC distances ascending")
      assert(d2.forall(_ >= 0.0), s"query $q distances non-negative")
      assert(sorted.forall(_.getAs[Long]("neighbor_id") != q), s"query $q self-match")
    }
  }

  test("vec_ivfpq_res_distortion: residual codes beat raw-PQ codes at the same budget") {
    val rows = SparkEntry.queries("vec_ivfpq_res_distortion")(spark, TestSpark.Sf)
      .collect().map(r => r.getAs[Long]("subspace") ->
        (r.getAs[Double]("mean_mse_raw"), r.getAs[Double]("mean_mse_residual"))).toMap
    assert(rows.keySet == (0L to 7L).toSet, "one row per subspace")
    rows.values.foreach { case (raw, res) =>
      assert(raw > 0 && res > 0, "both schemes carry positive reconstruction error")
    }
    val wins = rows.values.count { case (raw, res) => res < raw }
    assert(wins >= 6,
      s"residual quantization must beat raw PQ in >= 6/8 subspaces (won $wins)" +
        " — even the isotropic bench corpus measures 8/8 (~5-16% each)")
  }
}
