package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Prf
import java.time.{LocalDateTime, ZoneOffset}

/** Round-9 batch G: revenue Gini/Lorenz (exact tie-block rank-sum
  * identity), the Markov stationary distribution (driver-math power
  * iteration pinned to an independent JVM census), and the
  * after-delete ANN recall audit.
  */
class R9gOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)
  private def rr(x: Double, dec: Int) = graft.operators.PcaSolve.roundAway(x, dec)

  test("q_gini_revenue: exact JVM census mirror (gini, lorenz shares)") {
    val spend = spark.read.parquet(s"${TestSpark.Sf}/orders.parquet")
      .selectExpr("o_custkey", "o_totalprice").collect()
      .groupBy(_.getAs[Long]("o_custkey"))
      .map { case (_, rs) =>
        rs.map(r => rr(r.getAs[Double]("o_totalprice") * 100, 0).toLong).sum / 10000L
      }.toSeq
    val n = spend.size.toLong
    val census = spend.groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
    var f = 0L; var six = BigInt(0); var sx = 0L
    var bot50 = 0L; var top10 = 0L
    val cut50 = math.ceil(n * 0.5).toLong
    val cut90 = math.ceil(n * 0.9).toLong
    census.foreach { case (v, c) =>
      val fPrev = f; f += c
      six += BigInt(v) * (c * fPrev + c * (c + 1) / 2)
      sx += v * c
      if (f <= cut50) bot50 += v * c
      if (f > cut90) top10 += v * c
    }
    val gini = 2.0 * six.toDouble / (n.toDouble * sx) - (n + 1.0) / n
    val row = run("q_gini_revenue").collect().head
    assert(row.getAs[Long]("n_customers") == n)
    assert(row.getAs[Double]("mean_spend") == rr(sx.toDouble * 100 / n, 2))
    assert(row.getAs[Double]("gini") == rr(gini, 4))
    assert(row.getAs[Double]("bot50_share") == rr(bot50.toDouble / sx, 4))
    assert(row.getAs[Double]("top10_share") == rr(top10.toDouble / sx, 4))
    // inequality sanity: 0 < gini < 1, bottom half holds less than half
    assert(row.getAs[Double]("gini") > 0 && row.getAs[Double]("gini") < 1)
    assert(row.getAs[Double]("bot50_share") < 0.5)
  }

  test("events_markov_stationary: driver math matches an independent JVM census + iteration") {
    // independent transition census from the raw events rows
    val ev = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
      .selectExpr("user_id", "event_id", "event_type", "cast(ts as string) as tss").collect()
      .map { r =>
        val sec = LocalDateTime.parse(r.getAs[String]("tss").replace(' ', 'T'))
          .toEpochSecond(ZoneOffset.UTC)
        (r.getAs[Long]("user_id"), sec, r.getAs[Long]("event_id"), r.getAs[String]("event_type"))
      }
    val trans = collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val seq = rows.sortBy(t => (t._2, t._3)).map(_._4)
      seq.sliding(2).foreach {
        case Array(a, b) => trans((a, b)) += 1
        case _           => ()
      }
    }
    val outc = trans.groupBy(_._1._1).map { case (s0, m) => s0 -> m.values.sum }
    val ppm = trans.toSeq.map { case ((a, b), c) => (a, b, c * 1000000L / outc(a)) }
    val k = outc.size.toLong
    var st: Map[String, Long] = outc.keys.map(_ -> 1000000000000L / k).toMap.withDefaultValue(0L)
    var prev = st
    for (_ <- 1 to 8) {
      prev = st
      val nx = collection.mutable.Map[String, Long]().withDefaultValue(0L)
      ppm.foreach { case (a, b, p) => if (st.contains(a)) nx(b) += st(a) * p / 1000000L }
      st = nx.toMap.withDefaultValue(0L)
    }
    val total = outc.values.sum
    val got = run("events_markov_stationary").collect()
      .map(r => r.getAs[String]("state") -> r).toMap
    assert(got.keySet == outc.keySet.toSet)
    outc.foreach { case (state, n) =>
      val r = got(state)
      assert(r.getAs[Long]("n_out_transitions") == n, s"$state n_out")
      assert(r.getAs[Double]("occupancy") == rr(n.toDouble / total, 6), s"$state occupancy")
      assert(r.getAs[Double]("pi_stationary") == rr(st.getOrElse(state, 0L) / 1e12, 6), s"$state pi")
      assert(r.getAs[Double]("pi_prev_step") == rr(prev.getOrElse(state, 0L) / 1e12, 6), s"$state pi7")
    }
    // the chain mixes: total stationary mass ~1 and the step delta is tiny
    val mass = got.values.map(_.getAs[Double]("pi_stationary")).sum
    assert(mass > 0.99 && mass < 1.01, s"mass $mass")
    got.values.foreach(r => assert(r.getAs[Double]("step_delta") < 0.01))
  }

  test("ann_recall_after_delete: alive-set semantics, comparable to ann_recall_eval") {
    val alive = graft.sqlgen.Wm.QueryIds
      .filterNot(id => Prf.prfMod(1048576, "vdel", id) < 104858).toSet
    val rows = run("ann_recall_after_delete").collect()
    assert(rows.map(_.getAs[Long]("qid")).toSet == alive,
      "output qids must be exactly the tombstone-surviving query ids")
    rows.foreach { r =>
      val hits = r.getAs[Long]("hits")
      assert(hits >= 0L && hits <= 10L)
      assert(hits <= r.getAs[Long]("n_cand"))
      assert(math.abs(r.getAs[Double]("recall10") - hits / 10.0) < 1e-9)
    }
    // candidates only shrink vs the pre-delete audit, qid for qid
    val before = run("ann_recall_eval").collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("n_cand")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_cand") <= before(r.getAs[Long]("qid")),
        s"qid ${r.getAs[Long]("qid")}: candidate set grew under deletion")
    }
  }
}
