package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-9 batch D: `dedup_quality_impact` — the keeper-policy
  * quality comparison, mirrored exactly in JVM collections from the
  * served component table and the 30b quality rubric. */
class R9dOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)
  private def r4(x: Double) = graft.operators.PcaSolve.roundAway(x, 4)
  private def sparkRound4(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  test("dedup_quality_impact: exact JVM mirror of both keeper policies and all per-source means") {
    Tables.register(spark, TestSpark.Sf)
    // component membership from the served components key (same
    // g_simpairs chain the impact key reads)
    val comp = run("dedup_components").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("keeper")).toMap
    val docs = spark.sql("select doc_id, source, text from documents").collect()
      .map { r =>
        val id = r.getAs[Long]("doc_id")
        val text = r.getAs[String]("text")
        val words = text.split("\\s+", -1).length
        val alpha = text.replaceAll("[^a-zA-Z]", "").length
        // the 30b rubric: round HALF_UP at 4 (Spark round), then the
        // x10^4 exact integer the key sums
        val q = sparkRound4((if (words >= 20 && words <= 80) 1.0 else 0.5) *
          (alpha.toDouble / text.length))
        id -> (r.getAs[String]("source"), math.round(q * 10000))
      }.toMap
    val members = comp.keys.toSeq
    val byComp = members.groupBy(comp)
    val keepMin = byComp.view.mapValues(_.min).toMap
    val keepBest = byComp.view.mapValues(ms =>
      ms.maxBy(id => (docs(id)._2, -id))).toMap
    case class Acc(var n: Long = 0, var sq: Long = 0)
    val all = collection.mutable.Map.empty[String, Acc]
    val kmin = collection.mutable.Map.empty[String, Acc]
    val kbest = collection.mutable.Map.empty[String, Acc]
    members.foreach { id =>
      val (src, qi) = docs(id)
      def add(m: collection.mutable.Map[String, Acc]): Unit = {
        val a = m.getOrElseUpdate(src, Acc()); a.n += 1; a.sq += qi
      }
      add(all)
      if (keepMin(comp(id)) == id) add(kmin)
      if (keepBest(comp(id)) == id) add(kbest)
    }
    val got = run("dedup_quality_impact").collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(got.keySet == all.keySet.toSet)
    all.foreach { case (src, a) =>
      val r = got(src)
      assert(r.getAs[Long]("n_members") == a.n, s"$src members")
      val nm = kmin.get(src).map(_.n).getOrElse(0L)
      val nb = kbest.get(src).map(_.n).getOrElse(0L)
      assert(r.getAs[Long]("kept_minid") == nm, s"$src kept_minid")
      assert(r.getAs[Long]("kept_bestq") == nb, s"$src kept_bestq")
      def chk(col: String, num: Long, den: Long): Unit = {
        val v = r.getAs[java.lang.Double](col)
        if (den == 0) assert(v == null, s"$src $col null")
        else assert(v.doubleValue() == r4(num.toDouble / den / 10000), s"$src $col")
      }
      chk("mean_q_kept_minid", kmin.get(src).map(_.sq).getOrElse(0L), nm)
      chk("mean_q_kept_bestq", kbest.get(src).map(_.sq).getOrElse(0L), nb)
      chk("mean_q_dropped_minid",
        a.sq - kmin.get(src).map(_.sq).getOrElse(0L), a.n - nm)
    }
    // the policy claim itself: summed over sources, best-quality
    // keepers carry at least the min-id keepers' total quality
    val totMin = kmin.values.map(_.sq).sum
    val totBest = kbest.values.map(_.sq).sum
    assert(totBest >= totMin, "best-quality policy cannot lose to min-id in total")
  }
}
