package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sqlgen.{Gen, SparkDialect}

/** Deep NN-decoder witness (wm_nn_decode_deep, §2 row 21r2): the
  * served key aggregates a mapPartitions-built logits artifact
  * (operators.NnDeep) whose arithmetic must be BIT-IDENTICAL to the
  * generated SQL chain — this spec executes the full inline SQL
  * rendering on Spark and pins the served census against it
  * row-for-row, then re-derives the census from the artifact itself. */
class NnDeepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("served census equals the executed inline SQL chain, row for row") {
    val served = SparkEntry.queries("wm_nn_decode_deep")(spark, TestSpark.Sf)
      .collect().map(_.toString).sorted.toSeq
    // whole-stage fusion off for the inline run: the unrolled chain's
    // fused units overflow janino's 64 KB method cap and each failed
    // compile attempt costs seconds (the reason the serving path is
    // the mapPartitions artifact in the first place)
    val wsc = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val inline =
      try spark.sql(new Gen(SparkDialect).nnDecodeDeepSql(None))
        .collect().map(_.toString).sorted.toSeq
      finally spark.conf.set("spark.sql.codegen.wholeStage", wsc)
    assert(served.nonEmpty && served.length == 24)
    assert(served == inline)
  }

  test("census recounts from the logits artifact; logits cover the corpus") {
    Tables.register(spark, TestSpark.Sf)
    SparkEntry.queries("wm_nn_decode_deep")(spark, TestSpark.Sf).collect() // arms the scratch
    val logits = spark.table("g_nn_deep_logits").collect()
    val nVec = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet").count()
    assert(logits.length.toLong == nVec, "one logit row per corpus vector")
    val got = SparkEntry.queries("wm_nn_decode_deep")(spark, TestSpark.Sf).collect()
      .map(r => r.getAs[Long]("bit_pos") ->
        (r.getAs[Long]("n_ones"), r.getAs[Double]("mean_logit"))).toMap
    (1 to 24).foreach { m =>
      val ps = logits.map(_.getAs[Long](s"p$m"))
      val ones = ps.count(_ > 0).toLong
      val mean = graft.operators.PcaSolve.roundAway(
        ps.sum.toDouble / nVec / 1000000, 6)
      assert(got(m.toLong)._1 == ones, s"bit $m ones")
      assert(got(m.toLong)._2 == mean, s"bit $m mean logit")
    }
  }

  test("forward pass structure: depth-6 residual blocks change the stream, grid holds") {
    val v = Array.tabulate(64)(k => math.sin(k + 1.0) / 8.0)
    val p = graft.operators.NnDeep.forward(v)
    assert(p.length == 24)
    // logits land on the 1e-6 grid scaled by 1e6 — exact integers
    assert(p.forall(x => math.abs(x) < 100000000L))
    // determinism: same input, same output
    assert(graft.operators.NnDeep.forward(v).toSeq == p.toSeq)
    // a constant vector has zero LN variance — the eps guard must keep
    // the pass finite (no NaN/overflow logits)
    val pc = graft.operators.NnDeep.forward(Array.fill(64)(0.125))
    assert(pc.forall(x => math.abs(x) < 100000000L))
  }
}
