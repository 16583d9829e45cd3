package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Prf

/** Semantic gates for the round-7 operator batch: lexical diversity,
  * Heaps'-law growth, the Bloom m-bits curve, the component census,
  * and the multi-probe LSH curve. */
class R7bOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }

  private lazy val docs: Array[(Long, Array[String])] = {
    Tables.register(spark, TestSpark.Sf)
    spark.sql("select doc_id, lower(text) as lt from documents").collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("lt").split("\\s+").filter(_.nonEmpty)))
  }

  test("text_lexical_diversity: per-doc TTR/hapax and the corpus hapax share match the JVM mirror") {
    val perDoc = docs.map { case (id, ws) =>
      val counts = ws.groupBy(identity).map(_._2.length)
      id -> (ws.length.toLong, counts.size.toLong, counts.count(_ == 1).toLong)
    }.toMap
    val global = docs.flatMap(_._2).groupBy(identity).map(_._2.length)
    val vTypes = global.size.toLong
    val vHapax = global.count(_ == 1).toLong
    val rows = run("text_lexical_diversity").collect()
    assert(rows.length == perDoc.size)
    rows.foreach { r =>
      val (nt, ny, nh) = perDoc(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_tokens") == nt)
      assert(r.getAs[Long]("n_types") == ny)
      assert(r.getAs[Long]("n_hapax") == nh)
      assert(math.abs(r.getAs[Double]("ttr") - q(ny.toDouble / nt, 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("hapax_share") - q(nh.toDouble / ny, 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("corpus_hapax_share") - q(vHapax.toDouble / vTypes, 4)) < 1e-9)
    }
  }

  test("text_heaps_law: prefix vocabulary growth and the OLS beta match the JVM mirror") {
    val mx = docs.map(_._1).max
    def lvl(id: Long) =
      if (id * 8 <= mx) 1 else if (id * 4 <= mx) 2 else if (id * 2 <= mx) 3 else 4
    val toks = (1 to 4).map(l =>
      docs.filter(d => lvl(d._1) <= l).map(_._2.length.toLong).sum)
    val types = (1 to 4).map(l =>
      docs.filter(d => lvl(d._1) <= l).flatMap(_._2).distinct.length.toLong)
    // the same integer-ln-grid OLS as the key
    def lnq(v: Long) = math.floor(math.log(v.toDouble) * 1e6 + 0.5)
    val xs = toks.map(lnq); val ys = types.map(lnq)
    val n = 4.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val rows = run("text_heaps_law").collect().sortBy(_.getAs[Long]("prefix_lvl"))
    assert(rows.length == 4)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("n_tokens") == toks(i), s"lvl ${i + 1}")
      assert(r.getAs[Long]("v_types") == types(i), s"lvl ${i + 1}")
      assert(math.abs(r.getAs[Double]("heaps_beta") - q(beta, 4)) < 1e-9)
    }
    // Heaps' law shape: vocabulary never shrinks, TTR falls, beta in
    // [0, 1) — the synthetic corpus draws from a CLOSED vocabulary, so
    // V(N) plateaus and beta legitimately hits 0 at the small SF (a
    // natural corpus sits near 0.5; the fit itself is what the mirror
    // pins)
    assert(types.sliding(2).forall(p => p(0) <= p(1)))
    val ttrs = rows.map(_.getAs[Double]("type_token_ratio"))
    assert(ttrs.sliding(2).forall(p => p(0) >= p(1) - 1e-9))
    assert(beta >= 0 && beta < 1)
  }

  test("sketch_bloom_curve: every geometry's fill and measured FPR match the JVM mirror; FPR falls with m") {
    def shingles(side: Long => Boolean): Set[Long] =
      docs.filter(d => side(d._1)).flatMap { case (_, ws) =>
        ws.sliding(5).filter(_.length == 5)
          .map(g => java.lang.Long.parseLong(Prf.md5hex(g.mkString(" ")).take(15), 16))
      }.toSet
    val ev = shingles(_ % 50 == 0)
    val tr = shingles(_ % 50 != 0)
    def positions(g: Long, m: Long): Seq[Long] =
      (0 until 3).map(i => (g % m + i * (2 * ((g / m) % (m / 2)) + 1)) % m)
    val rows = run("sketch_bloom_curve").collect()
      .sortBy(_.getAs[Long]("m_bits"))
    assert(rows.map(_.getAs[Long]("m_bits")).toSeq == Seq(4096L, 32768L, 262144L))
    rows.foreach { r =>
      val m = r.getAs[Long]("m_bits")
      val set = ev.flatMap(positions(_, m))
      assert(r.getAs[Long]("n_bits_set") == set.size.toLong, s"m=$m")
      val fp = tr.count(g => !ev.contains(g) && positions(g, m).forall(set.contains))
      assert(r.getAs[Long]("n_false_pos") == fp.toLong, s"m=$m")
      assert(r.getAs[Long]("n_probes") == tr.size.toLong, s"m=$m")
      assert(r.getAs[Long]("n_members") == tr.count(ev.contains).toLong, s"m=$m")
      assert(math.abs(r.getAs[Double]("fill_ratio") - q(set.size.toDouble / m, 6)) < 1e-9, s"m=$m")
    }
    // more bits, fewer false positives (the curve's reason to exist)
    val fprs = rows.map(_.getAs[Double]("fpr_measured"))
    assert(fprs.sliding(2).forall(p => p(0) >= p(1)))
    assert(fprs.head > fprs.last, "curve must actually bend")
  }

  test("graph_component_sizes: 8 label rounds reach the true components of the served graph") {
    val edges = run("wm_knn_edges").collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    val ids = spark.sql("select vec_id from embeddings").collect().map(_.getLong(0))
    // union-find over the symmetrized edges
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb)); parent(hi) = lo }
    }
    edges.foreach { case (s, d2) => union(s, d2) }
    val expect = ids.groupBy(find).map { case (root, ms) =>
      ms.min -> ms.length.toLong } // min member id IS the root label here
    val got = run("graph_component_sizes").collect()
      .map(r => r.getAs[Long]("component_id") -> r.getAs[Long]("n_members")).toMap
    assert(got == expect)
    assert(got.values.sum == ids.length.toLong)
  }

  test("ann_multiprobe_curve: level 1 equals the served single-bucket index; recall and cost are monotone") {
    val base = run("ann_recall_eval").collect()
    val baseCand = base.map(_.getAs[Long]("n_cand")).sum
    val baseHits = base.map(_.getAs[Long]("hits")).sum
    val rows = run("ann_multiprobe_curve").collect().sortBy(_.getAs[Long]("lvl"))
    assert(rows.length == 3)
    assert(rows.head.getAs[Long]("n_cand") == baseCand,
      "level 1 must be exactly the own-bucket candidate set ann_recall_eval measures")
    assert(rows.head.getAs[Long]("hits") == baseHits)
    val cands = rows.map(_.getAs[Long]("n_cand"))
    val recalls = rows.map(_.getAs[Double]("recall10"))
    assert(cands.sliding(2).forall(p => p(0) <= p(1)))
    assert(recalls.sliding(2).forall(p => p(0) <= p(1) + 1e-9))
    assert(recalls.forall(r => r >= 0 && r <= 1))
    assert(recalls.last > recalls.head, "extra probes must actually buy recall")
  }
}
