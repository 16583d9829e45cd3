package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 twenty-seventh batch: eigenvector
  * centrality (3-walk counts matrix-multiplied in the JVM), word
  * burstiness (Church–Gale VMR refolded from raw text), and the
  * join-key skew profile (census, p99, shares re-derived). */
class R8aOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }

  // ---------------- graph_eigen_centrality ----------------

  test("graph_eigen_centrality: 3-walk counts equal the JVM adjacency powers") {
    val edges = run("wm_knn_edges").collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    val nodes = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .select("vec_id").collect().map(_.getAs[Long]("vec_id"))
    val und = edges.filter { case (s, t) => s != t }
      .map { case (s, t) => (math.min(s, t), math.max(s, t)) }.distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var r: Map[Long, Long] = nodes.map(_ -> 1L).toMap
    (1 to 3).foreach { _ =>
      val next = scala.collection.mutable.Map(nodes.map(_ -> 0L): _*)
      adj.foreach { case (src, dsts) => dsts.foreach(dst => next(dst) += r(src)) }
      r = next.toMap
    }
    val tot = r.values.sum
    val rows = run("graph_eigen_centrality").collect()
    assert(rows.length == nodes.length)
    rows.foreach { row =>
      val id = row.getAs[Long]("vec_id")
      assert(row.getAs[Long]("walk3_count") == r(id), s"node $id walks")
      assert(math.abs(row.getAs[Double]("centrality_share") -
        q(r(id).toDouble / tot, 9)) < 1e-12, s"node $id share")
    }
    // shares form a distribution
    assert(math.abs(rows.map(_.getAs[Double]("centrality_share")).sum - 1.0) < 1e-6)
  }

  // ---------------- text_word_burstiness ----------------

  test("text_word_burstiness: VMR refolds from a JVM word census with zeros in closed form") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("text").collect().map(_.getAs[String]("text"))
    val n = docs.length.toLong
    val perDoc = docs.map(_.toLowerCase.split("\\s+").filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap)
    val vocab = perDoc.flatMap(_.keys).distinct
    val stats = vocab.map { w =>
      val cs = perDoc.flatMap(_.get(w))
      w -> (cs.length.toLong, cs.sum, cs.map(c => c * c).sum)
    }.toMap
    val rows = run("text_word_burstiness").collect()
    val expected = stats.filter(_._2._1 >= 5)
    assert(rows.length == expected.size, "df>=5 vocabulary")
    rows.foreach { r =>
      val w = r.getAs[String]("word")
      val (df, tot, s2) = expected(w)
      assert(r.getAs[Long]("df") == df, s"$w df")
      assert(r.getAs[Long]("total_count") == tot, s"$w tot")
      assert(math.abs(r.getAs[Double]("mean_per_doc") - q(tot.toDouble / n, 6)) < 1e-9)
      val vmr = (n * s2 - tot * tot).toDouble / (n.toDouble * tot)
      assert(math.abs(r.getAs[Double]("vmr") - q(vmr, 4)) < 1e-9, s"$w vmr")
      assert(r.getAs[Long]("bursty_flag") == (if (vmr > 1) 1L else 0L), s"$w flag")
    }
  }

  // ---------------- q_key_skew ----------------

  test("q_key_skew: census, p99 selection, and both skew readouts refold per key column") {
    Tables.register(spark, TestSpark.Sf)
    val li = spark.sql("select l_orderkey, l_partkey, l_suppkey from lineitem").collect()
    val cols = Map(
      "l_orderkey" -> li.map(_.getAs[Long]("l_orderkey")),
      "l_partkey" -> li.map(_.getAs[Long]("l_partkey")),
      "l_suppkey" -> li.map(_.getAs[Long]("l_suppkey")))
    val rows = run("q_key_skew").collect()
    assert(rows.map(_.getAs[String]("key_column")).sorted.toSeq ==
      Seq("l_orderkey", "l_partkey", "l_suppkey"))
    rows.foreach { r =>
      val ks = cols(r.getAs[String]("key_column"))
      val cnt = ks.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val nKeys = cnt.size.toLong
      val nRows = ks.length.toLong
      val cmax = cnt.values.max
      // p99: smallest per-key count c with |{keys: count <= c}| >= ceil(0.99 * nKeys)
      val sortedC = cnt.values.toSeq.sorted
      val c99 = sortedC(math.ceil(nKeys * 0.99).toInt - 1)
      val r99 = cnt.values.filter(_ >= c99).sum
      val col = r.getAs[String]("key_column")
      assert(r.getAs[Long]("n_keys") == nKeys, s"$col keys")
      assert(r.getAs[Long]("n_rows") == nRows, s"$col rows")
      assert(r.getAs[Long]("max_rows_per_key") == cmax, s"$col max")
      assert(math.abs(r.getAs[Double]("mean_rows_per_key") - q(nRows.toDouble / nKeys, 4)) < 1e-9)
      assert(r.getAs[Long]("p99_rows_per_key") == c99, s"$col p99")
      assert(math.abs(r.getAs[Double]("skew_factor") - q(cmax.toDouble * nKeys / nRows, 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("p99_share") - q(r99.toDouble / nRows, 6)) < 1e-9, s"$col share")
    }
  }
}
