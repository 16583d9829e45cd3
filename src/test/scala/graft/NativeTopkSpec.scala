package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gates for the native bounded-state top-k aggregate
  * (functions.TopKAgg, `graft_topk`): exact equality with the window
  * ranking it replaces, invariance under partitioning (the merge path
  * must not depend on how partials split), boundary-tie determinism,
  * and the serving key's agreement with brute recomputation.
  */
class NativeTopkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def windowForm(view: String, k: Int) =
    spark.sql(
      s"""select g, id, score, rn from (
         |  select g, id, score,
         |    row_number() over (partition by g order by score desc, id) as rn
         |  from $view) _t where rn <= $k""".stripMargin)
      .collect().map(r => (r.getAs[Long]("g"), r.getAs[Long]("id"),
        r.getAs[Double]("score"), r.getAs[Int]("rn"))).toSet

  private def nativeForm(view: String, k: Int) =
    spark.sql(
      s"""select g, e.id as id, e.score as score, p0 + 1 as rn
         |from (select g, graft_topk(id, score, $k) as tk from $view group by g) _t
         |lateral view posexplode(tk) _e as p0, e""".stripMargin)
      .collect().map(r => (r.getAs[Long]("g"), r.getAs[Long]("id"),
        r.getAs[Double]("score"), r.getAs[Int]("rn"))).toSet

  test("graft_topk equals the window ranking, under any partitioning") {
    Tables.register(spark, TestSpark.Sf) // registers graft_topk
    import spark.implicits._
    // deterministic synthetic data with score ties ACROSS partitions:
    // score has only 17 distinct values over 4 groups × 999 rows, so
    // the k boundary almost surely falls inside a tie run
    val rows = (1L to 999L).flatMap(i => (0L until 4L).map(g =>
      (g, g * 1000L + i, (i * 7919 % 17).toDouble / 16.0)))
    for (parts <- Seq(1, 7, 32)) {
      rows.toDF("g", "id", "score").repartition(parts)
        .createOrReplaceTempView("tk_in")
      val w = windowForm("tk_in", 10)
      val n = nativeForm("tk_in", 10)
      assert(n == w, s"parts=$parts")
    }
  }

  test("graft_topk with k larger than the group returns the whole group ranked") {
    Tables.register(spark, TestSpark.Sf)
    import spark.implicits._
    Seq((0L, 1L, 0.5), (0L, 2L, 0.9), (0L, 3L, 0.9))
      .toDF("g", "id", "score").createOrReplaceTempView("tk_small")
    val got = nativeForm("tk_small", 100).toSeq.sortBy(_._4)
    assert(got.map(_._2) == Seq(2L, 3L, 1L)) // score desc, id tiebreak
    assert(got.map(_._4) == Seq(1, 2, 3))
  }

  test("vec_topk_grouped serving key matches brute per-label recomputation") {
    val rows = SparkEntry.queries("vec_topk_grouped")(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    // brute mirror from the raw parquet
    val em = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .selectExpr("vec_id", "cast(label as bigint) as label", "embedding").collect()
      .map { r =>
        val v = r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray
        val nrm = math.sqrt(v.map(x => x * x).sum)
        (r.getAs[Long]("vec_id"), r.getAs[Long]("label"), v.map(_ / nrm))
      }
    val qs = em.filter(e => Set(0L, 100L, 200L, 300L, 400L).contains(e._1))
    val expect = qs.flatMap { case (qid, _, qn) =>
      em.filter(_._1 != qid).groupBy(_._2).toSeq.flatMap { case (label, cs) =>
        cs.map { case (cid, _, n) =>
          val sim = BigDecimal(qn.zip(n).map { case (a, b) => a * b }.sum)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (qid, label, cid, sim)
        }.sortBy { case (_, _, cid, sim) => (-sim, cid) }.take(3)
          .zipWithIndex.map { case ((q, l, c, s), i) => (q, l, c, i + 1) }
      }
    }.toSet
    val got = rows.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("label"),
      r.getAs[Long]("neighbor_id"), r.getAs[Long]("rn").toInt)).toSet
    assert(got == expect)
  }
}
