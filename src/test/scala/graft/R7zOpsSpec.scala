package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 twenty-sixth batch: the type×weekday
  * chi-square independence grid, the view→purchase lagged
  * cross-correlation, the Mann–Kendall trend test (integer S / tie
  * variance / τ-b refolded), YoY revenue growth (decimal-exact), the
  * k-means elbow's refinement laws, and the label silhouette mirror. */
class R7zOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }
  private def qL(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else -math.floor(-x + 0.5)).toLong

  private def eventDays(): Array[(String, Long)] = {
    Tables.register(spark, TestSpark.Sf)
    spark.sql("select event_type, (ts div 1000000000) div 86400 as day from events")
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day")))
  }

  // ---------------- events_chi2 ----------------

  test("events_chi2: grid terms, marginals, chi-square, and Cramer's V refold") {
    val ev = eventDays().map { case (t, day) => (t, (day + 4) % 7) }
    val o = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val types = ev.map(_._1).distinct.sorted
    val dows = ev.map(_._2).distinct.sorted
    val rt = types.map(t => t -> ev.count(_._1 == t).toLong).toMap
    val ct = dows.map(w => w -> ev.count(_._2 == w).toLong).toMap
    val nt = ev.length.toLong
    val tq = for (t <- types; w <- dows) yield {
      val obs = o.getOrElse((t, w), 0L)
      val e = rt(t).toDouble * ct(w) / nt
      (t, qL((obs - e) * (obs - e) / e * 1000000))
    }
    val tot = tq.map(_._2).sum
    val df = (types.length - 1).toLong * (dows.length - 1)
    val cv = math.sqrt(tot.toDouble / 1000000 /
      (nt.toDouble * (math.min(types.length, dows.length) - 1)))
    val rows = run("events_chi2").collect()
    assert(rows.length == types.length)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n_events") == rt(t), s"$t marginal")
      val contrib = tq.filter(_._1 == t).map(_._2).sum
      assert(math.abs(r.getAs[Double]("chi2_contrib") - q(contrib.toDouble / 1e6, 4)) < 1e-9, s"$t contrib")
      assert(math.abs(r.getAs[Double]("chi2_total") - q(tot.toDouble / 1e6, 4)) < 1e-9)
      assert(r.getAs[Long]("df") == df)
      assert(math.abs(r.getAs[Double]("cramers_v") - q(cv, 6)) < 1e-9)
    }
    // contributions partition the total (4dp rounding slack per row)
    val served = rows.map(_.getAs[Double]("chi2_contrib")).sum
    assert(math.abs(served - tot.toDouble / 1e6) < rows.length * 1e-4, "partition of total")
  }

  // ---------------- events_xcorr ----------------

  test("events_xcorr: every lag's Pearson r refolds from the zero-filled daily series") {
    val ev = eventDays()
    val spine = ev.map(_._2).distinct.sorted
    def series(t: String): Map[Long, Long] = {
      val c = ev.filter(_._1 == t).groupBy(_._2).view.mapValues(_.length.toLong).toMap
      spine.map(day => day -> c.getOrElse(day, 0L)).toMap
    }
    val x = series("view")
    val y = series("purchase")
    val rows = run("events_xcorr").collect().sortBy(_.getAs[Long]("lag_days"))
    assert(rows.map(_.getAs[Long]("lag_days")).toSeq == (0L to 7L))
    rows.foreach { r =>
      val k = r.getAs[Long]("lag_days")
      val days = spine.filter(day => spine.contains(day + k))
      val n = days.length.toLong
      val sx = days.map(x).sum; val sy = days.map(day => y(day + k)).sum
      val sxy = days.map(day => x(day) * y(day + k)).sum
      val sxx = days.map(day => x(day) * x(day)).sum
      val syy = days.map(day => y(day + k) * y(day + k)).sum
      assert(r.getAs[Long]("n_days") == n, s"lag $k n")
      assert(r.getAs[Long]("sum_view") == sx && r.getAs[Long]("sum_purchase") == sy, s"lag $k sums")
      if (n >= 3 && n * sxx > sx * sx && n * syy > sy * sy) {
        val pr = (n * sxy - sx * sy).toDouble /
          math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
        assert(math.abs(r.getAs[Double]("pearson_r") - q(pr, 6)) < 1e-9, s"lag $k r")
      } else assert(r.isNullAt(r.fieldIndex("pearson_r")), s"lag $k null guard")
    }
  }

  // ---------------- events_mann_kendall ----------------

  test("events_mann_kendall: S, tie-corrected variance, Z, and tau-b refold per type") {
    val ev = eventDays()
    val spine = ev.map(_._2).distinct.sorted
    val types = ev.map(_._1).distinct.sorted
    val rows = run("events_mann_kendall").collect()
    assert(rows.length == types.length)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val c = ev.filter(_._1 == t).groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val series = spine.map(day => c.getOrElse(day, 0L))
      val nd = series.length.toLong
      val s = (for (i <- series.indices; j <- i + 1 until series.length)
        yield java.lang.Long.signum(series(j) - series(i)).toLong).sum
      val tieGroups = series.groupBy(identity).values.map(_.length.toLong)
      val var18 = nd * (nd - 1) * (2 * nd + 5) - tieGroups.map(g => g * (g - 1) * (2 * g + 5)).sum
      val tie2 = tieGroups.map(g => g * (g - 1) / 2).sum
      val n0 = nd * (nd - 1) / 2
      assert(r.getAs[Long]("n_days") == nd)
      assert(r.getAs[Long]("s_stat") == s, s"$t S")
      val z = (s - java.lang.Long.signum(s)) / math.sqrt(var18.toDouble / 18)
      assert(math.abs(r.getAs[Double]("z_stat") - q(z, 4)) < 1e-9, s"$t z")
      val tau = s / math.sqrt(n0.toDouble * (n0 - tie2))
      assert(math.abs(r.getAs[Double]("tau_b") - q(tau, 4)) < 1e-9, s"$t tau")
      val flag = if (math.abs(z) > 1.96) java.lang.Long.signum(s).toLong else 0L
      assert(r.getAs[Long]("trend_flag") == flag, s"$t flag")
    }
  }

  // ---------------- q_yoy_growth ----------------

  test("q_yoy_growth: decimal-exact yearly revenue and the lag-window growth refold") {
    Tables.register(spark, TestSpark.Sf)
    val li = spark.sql(
      "select year(l_shipdate) as y, l_extendedprice as ep, l_discount as dc from lineitem")
      .collect().map(r => (r.getAs[Int]("y"), r.getAs[Double]("ep"), r.getAs[Double]("dc")))
    val byYear = li.groupBy(_._1).view.mapValues { rs =>
      (rs.length.toLong, rs.map { case (_, ep, dc) =>
        BigDecimal(ep).setScale(4, BigDecimal.RoundingMode.HALF_UP) *
          BigDecimal(1 - dc).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      }.sum)
    }.toMap
    val years = byYear.keys.toSeq.sorted
    val rows = run("q_yoy_growth").collect().sortBy(_.getAs[Long]("yr"))
    assert(rows.map(_.getAs[Long]("yr")).toSeq == years.map(_.toLong))
    rows.zipWithIndex.foreach { case (r, i) =>
      val (n, rev) = byYear(years(i))
      assert(r.getAs[Long]("n_items") == n)
      assert(math.abs(r.getAs[Double]("revenue") -
        rev.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"${years(i)} rev")
      if (i == 0) assert(r.isNullAt(r.fieldIndex("yoy_growth")), "first year null")
      else {
        val prev = byYear(years(i - 1))._2
        val g = (rev.toDouble - prev.toDouble) / prev.toDouble
        assert(math.abs(r.getAs[Double]("yoy_growth") - q(g, 6)) < 1e-9, s"${years(i)} growth")
      }
    }
  }

  // ---------------- vec_kmeans_elbow ----------------

  test("vec_kmeans_elbow: refinement chain laws — inertia nonincreasing, explained consistent") {
    val rows = run("vec_kmeans_elbow").collect().sortBy(_.getAs[Long]("k_clusters"))
    assert(rows.map(_.getAs[Long]("k_clusters")).toSeq == Seq(1L, 2L, 4L, 8L, 16L, 32L))
    val inert = rows.map(_.getAs[Double]("inertia"))
    assert(inert.forall(_ >= 0), "inertia nonnegative")
    // each level's modulus divides the next, so the partitions refine
    // and within-cluster inertia can only fall
    assert(inert.sliding(2).forall { case Array(a, b) => a >= b - 1e-9 }, "inertia monotone")
    val ng = rows.map(_.getAs[Long]("n_groups"))
    assert(ng.zip(rows.map(_.getAs[Long]("k_clusters"))).forall { case (g, k) => g >= 1 && g <= k })
    assert(ng.sliding(2).forall { case Array(a, b) => a <= b }, "groups monotone")
    // level 1: one group holding the whole corpus, explained = 0
    assert(ng.head == 1L && rows.head.getAs[Double]("explained_frac") == 0.0)
    val n = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet").count()
    assert(inert.head <= n.toDouble, "inertia bounded by the corpus size")
    // explained_frac is the inertia ratio against level 1 (4dp-rounded inputs)
    rows.foreach { r =>
      val exp = 1.0 - r.getAs[Double]("inertia") / inert.head
      assert(math.abs(r.getAs[Double]("explained_frac") - exp) < 2e-4, "explained identity")
    }
  }

  // ---------------- vec_silhouette ----------------

  test("vec_silhouette: per-label silhouette matches the quantized centroid mirror") {
    val vecs = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet").collect()
      .map { r =>
        val v = r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray
        (r.getAs[Long]("vec_id"), r.getAs[Number]("label").longValue(), v)
      }
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    val nn = vecs.map { case (id, l, v) =>
      val nrm = math.sqrt(dot(v, v)); (id, l, v.map(_ / nrm))
    }
    val labels = nn.map(_._2).distinct.sorted
    val cents = labels.map { l =>
      val ms = nn.filter(_._2 == l).map(_._3)
      l -> Array.tabulate(ms.head.length)(i => q(ms.map(_(i)).sum / ms.length, 6))
    }.toMap
    val cnrm = cents.view.mapValues(c => math.sqrt(dot(c, c))).toMap
    val per = nn.map { case (_, own, v) =>
      val sims = labels.map(l => l -> q(dot(v, cents(l)) / cnrm(l), 6)).toMap
      val a = q(1 - sims(own), 6)
      val b = q(1 - labels.filter(_ != own).map(sims).max, 6)
      val denom = math.max(1 - sims(own), 1 - labels.filter(_ != own).map(sims).max)
      val sil = if (denom > 0) Some(q(((1 - labels.filter(_ != own).map(sims).max) - (1 - sims(own))) / denom, 6)) else None
      (own, a, b, sil)
    }
    val rows = run("vec_silhouette").collect()
    assert(rows.length == labels.length)
    rows.foreach { r =>
      val l = r.getAs[Long]("label")
      val mine = per.filter(_._1 == l)
      assert(r.getAs[Long]("n_members") == mine.length.toLong, s"label $l n")
      def dmean(xs: Seq[Double]) = q(xs.map(x => BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / xs.length, 4)
      assert(math.abs(r.getAs[Double]("mean_intra_dist") - dmean(mine.map(_._2).toSeq)) < 2e-4, s"label $l a")
      assert(math.abs(r.getAs[Double]("mean_nearest_dist") - dmean(mine.map(_._3).toSeq)) < 2e-4, s"label $l b")
      val sils = mine.flatMap(_._4).toSeq
      assert(math.abs(r.getAs[Double]("mean_silhouette") - dmean(sils)) < 2e-4, s"label $l s")
      assert(r.getAs[Double]("mean_silhouette") >= -1 - 1e-9 && r.getAs[Double]("mean_silhouette") <= 1 + 1e-9)
      val allSils = per.flatMap(_._4).toSeq
      assert(math.abs(r.getAs[Double]("overall_silhouette") - dmean(allSils)) < 2e-4, "overall")
    }
  }
}
