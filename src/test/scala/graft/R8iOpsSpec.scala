package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Prf, WmConst, WmDecode}
import graft.sqlgen.Wm

/** Semantic gates for the round-7 thirty-fifth batch: per-community
  * conductance (cut/volume refolded from the oracle-checked labels and
  * edges) and the QIM Δ tuning curve (every rung's embed, analytic
  * drift, attack, and extraction re-derived through the JVM mirror). */
class R8iOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }
  private def qL(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else -math.floor(-x + 0.5)).toLong

  test("graph_conductance: cut, volume, and phi refold from the served labels and edges") {
    val rawEdges = run("wm_knn_edges").collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    val nodes = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .select("vec_id").collect().map(_.getAs[Long]("vec_id"))
    // per-node labels via the LpaSpec JVM mirror (3 synchronous rounds,
    // mode with min-label tie-break over the symmetrized + self-loop
    // multiset — exactly the lpaCtes semantics)
    val adj = (rawEdges ++ rawEdges.map(_.swap) ++ nodes.map(n => (n, n)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var labels: Map[Long, Long] = nodes.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      labels = nodes.map { n =>
        n -> adj(n).map(labels).groupBy(identity)
          .map { case (l, vs) => (l, vs.size) }
          .maxBy { case (l, c) => (c.toLong, -l) }._1
      }.toMap
    }
    val edges = rawEdges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val m = edges.size.toLong
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val comms = labels.values.toSet
    val rows = run("graph_conductance").collect()
    assert(rows.length == comms.size)
    rows.foreach { r =>
      val c = r.getAs[Long]("community")
      val members = labels.filter(_._2 == c).keySet
      assert(r.getAs[Long]("n_members") == members.size.toLong, s"c $c")
      val vol = members.toSeq.map(v => deg.getOrElse(v, 0L)).sum
      assert(r.getAs[Long]("volume") == vol, s"c $c vol")
      val cut = edges.count(e => members(e._1) != members(e._2)).toLong
      val intra = edges.count(e => members(e._1) && members(e._2)).toLong
      assert(r.getAs[Long]("cut_edges") == cut, s"c $c cut")
      assert(r.getAs[Long]("intra_edges") == intra, s"c $c intra")
      assert(math.abs(r.getAs[Double]("conductance") -
        q(cut.toDouble / math.min(vol, 2 * m - vol), 6)) < 1e-9, s"c $c phi")
      // structural: volume = 2*intra + cut (every incident edge end)
      assert(vol == 2 * intra + cut, s"c $c conservation")
    }
  }

  test("wm_delta_curve: every rung's embed, drift, attack, and extraction match the JVM mirror") {
    def gauss(parts: Any*): Double = {
      def chunks(h: Long) = (0 until 5).map(i => ((h >> (12 * i)) & 4095L).toDouble)
      val h1 = Prf.prf(("ih1" +: parts): _*)
      val h2 = Prf.prf(("ih2" +: parts): _*)
      val s = (chunks(h1) ++ chunks(h2)).sum + 5.0
      (s / 4096.0 - 5.0) * 1.0954451150103321
    }
    Tables.register(spark, TestSpark.Sf)
    val carriers = run("wm_carriers").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("blk").toInt).toMap
    val clean = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray).toMap
    val kc = WmConst.keyed(Wm.Key)
    val msg = WmConst.msgBits(graft.sqlgen.WmParams.Default.cipherB64)
    val deltas = Seq(0.05, 0.10, 0.15, 0.25)
    val rows = run("wm_delta_curve").collect()
    assert(rows.length == 4)
    deltas.zipWithIndex.foreach { case (dl, r) =>
      // per-carrier: projections (ascending-pos fold), shifts, pn,
      // analytic drift, stego rows, noise, decode — the SQL mirror
      val votes = scala.collection.mutable.Map[(Int, Int), Int]().withDefaultValue(0)
      val liveBlks = scala.collection.mutable.Set.empty[Int]
      var driftSum = 0L
      var driftMin = Long.MaxValue
      carriers.foreach { case (id, blk) =>
        val v = clean(id)
        var ss = 0.0; var i = 0
        while (i < v.length) { ss += v(i) * v(i); i += 1 }
        val nrm = math.sqrt(ss)
        val nval = v.map(_ / nrm)
        val pj = new Array[Double](Wm.MsgLen)
        for (g <- 0 until Wm.MsgLen) {
          var s = 0.0
          for (p <- 1 to Wm.Dim)
            s += nval(p - 1) * (if (kc.dimGroup(p) == g) kc.dimSign(p) else 0.0)
          pj(g) = s
        }
        val sh = (0 until Wm.MsgLen).map { g =>
          val bit = msg(blk)(g)
          (2 * math.floor((pj(g) / dl - bit) / 2 + 0.5) + bit) * dl - pj(g)
        }.toArray
        var pnSq = 0.0
        for (g <- 0 until Wm.MsgLen)
          pnSq += (2 * sh(g) * pj(g) + sh(g) * sh(g)) / kc.groupCnt(g)
        val pn = math.sqrt(1 + pnSq)
        var dr = 1.0
        for (g <- 0 until Wm.MsgLen) dr += sh(g) * pj(g) / kc.groupCnt(g)
        val dq = qL(dr / math.sqrt(1 + pnSq) * 1000000000L)
        driftSum += dq; driftMin = math.min(driftMin, dq)
        val att = Array.tabulate(Wm.Dim) { k =>
          val p = k + 1
          val sval = (nval(k) + kc.dimSign(p) * sh(kc.dimGroup(p)) / kc.groupCnt(kc.dimGroup(p))) / pn * nrm
          sval + 0.05 * gauss("dc", r, id, p)
        }
        WmDecode.decode(att, Wm.Key, dl).foreach { case (dblk, pb) =>
          liveBlks += dblk
          pb.zipWithIndex.foreach { case (b, j) => votes((dblk, j)) += 2 * b - 1 }
        }
      }
      val errors = (0 until 16).map { blk =>
        (0 until 16).count { j =>
          val vt = votes((blk, j))
          !liveBlks.contains(blk) || (if (vt > 0) 1 else 0) != msg(blk)(8 + j)
        }
      }.sum.toLong
      val row = rows.find(x => math.abs(x.getAs[Double]("delta_step") - dl) < 1e-12).get
      assert(row.getAs[Long]("errors") == errors, s"delta $dl errors")
      assert(row.getAs[Long]("blocks_live") == liveBlks.size.toLong, s"delta $dl live")
      assert(math.abs(row.getAs[Double]("ber") - q(errors / 256.0, 4)) < 1e-9)
      assert(math.abs(row.getAs[Double]("mean_cosine") -
        q(driftSum.toDouble / carriers.size / 1e9, 6)) < 1e-9, s"delta $dl drift")
      assert(math.abs(row.getAs[Double]("min_cosine") - q(driftMin / 1e9, 6)) < 1e-9)
    }
    // the frontier laws: distortion grows monotonically with delta
    val byD = rows.sortBy(_.getAs[Double]("delta_step")).map(_.getAs[Double]("mean_cosine"))
    byD.sliding(2).foreach { case Array(a, b) => assert(a >= b - 1e-9) }
  }
}
