package graft

import org.apache.spark.sql.functions._

/** Brute cross-checks for the disclosure-control / audit wave (q401–q405). */
class GovernanceAuditSpec extends SparkSuite {

  private lazy val customers: Array[(Int, String, Double)] =
    Tables.customer(spark, sf)
      .select(col("c_nationkey"), col("c_mktsegment"), col("c_acctbal"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))

  test("q401 k-anonymity matches a brute class-size recount") {
    val sizes = customers
      .groupBy(c => (c._1, c._2, math.floor(c._3 / 1000.0).toLong))
      .map(_._2.length.toLong)
    val got = SparkEntry.queries("q401_k_anonymity")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    Seq(2L, 5L, 10L).foreach { k =>
      val (nRows, nClasses, atRisk) = got(k)
      assert(nRows == customers.length)
      assert(nClasses == sizes.size)
      assert(atRisk == sizes.filter(_ < k).sum, s"k=$k")
    }
  }

  test("q402 l-diversity matches brute distinct-sensitive counts") {
    val classes = customers.groupBy(c => (c._1, c._2)).toSeq.map { case (_, g) =>
      (g.length.toLong, g.map(c => math.floor(c._3 / 2000.0).toLong).distinct.length.toLong)
    }
    val got = SparkEntry.queries("q402_l_diversity")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    Seq(2L, 3L, 5L).foreach { l =>
      val (nc, below, exposed) = got(l)
      assert(nc == classes.size)
      assert(below == classes.count(_._2 < l), s"l=$l classes below")
      assert(exposed == classes.filter(_._2 < l).map(_._1).sum, s"l=$l rows")
    }
  }

  test("q403 suppression conserves the total and publishes no small cell") {
    val got = SparkEntry.queries("q403_cell_suppression")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._3).sum == customers.length, "published total must match")
    got.filter(_._1 != "OTHER").foreach { case (n, seg, c, supp) =>
      assert(c >= 10, s"cell ($n,$seg)=$c published below threshold")
      assert(supp == 0)
    }
    val other = got.filter(_._1 == "OTHER")
    assert(other.length <= 1)
    other.foreach { case (_, _, c, supp) =>
      assert(supp > 0 && c < supp * 10, "OTHER must aggregate only small cells")
    }
  }

  test("q404 capture-recapture: counts brute-match, estimate near truth") {
    val r = SparkEntry.queries("q404_capture_recapture")(spark, sf).collect()(0)
    val (nTrue, n1, n2, m) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(m <= n1.min(n2) && n1 <= nTrue && n2 <= nTrue)
    val chapman = (n1 + 1).toDouble * (n2 + 1) / (m + 1) - 1.0
    assert(math.abs(r.getDouble(4) - chapman) < 0.01)
    // independent 20% samples: the estimate lands within 25% of truth
    assert(math.abs(r.getDouble(5)) < 0.25,
      s"estimate ${r.getDouble(4)} too far from $nTrue")
  }

  test("q405 uniqueness curve: classes and uniques monotone in QI level") {
    val got = SparkEntry.queries("q405_uniqueness_curve")(spark, sf)
      .orderBy("level").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == Seq(1, 2, 3))
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._2 >= a._2, "more QIs cannot merge classes")
        assert(b._3 >= a._3, "a unique row stays unique under more QIs")
        assert(b._4 >= a._4 - 1e-9)
      case _ =>
    }
    // brute level-3 uniqueness
    val u3 = customers
      .groupBy(c => (c._1, c._2, math.floor(c._3 / 1000.0).toLong))
      .count(_._2.length == 1).toLong
    assert(got(2)._3 == u3)
  }

  test("q498 t-closeness matches a brute integer EMD") {
    val band = (c: (Int, String, Double)) => math.floor(c._3 / 1000.0).toLong
    val n = customers.length.toLong
    val g = customers.groupBy(band).view.mapValues(_.length.toLong).toMap
    val bandsSorted = g.keys.toSeq.sorted
    val m = bandsSorted.length.toLong
    val brute = customers.groupBy(c => (c._1, c._2)).map { case (k, rows) =>
      val nc = rows.length.toLong
      val cc = rows.groupBy(band).view.mapValues(_.length.toLong).toMap
      var cum = 0L; var sumAbs = 0L
      bandsSorted.foreach { b =>
        cum += cc.getOrElse(b, 0L) * n - g(b) * nc
        sumAbs += math.abs(cum)
      }
      val den = nc * n * (m - 1)
      k -> ((nc, sumAbs.toDouble / den.toDouble, 5 * sumAbs > den))
    }
    val got = SparkEntry.queries("q498_t_closeness")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got.keySet == brute.keySet)
    brute.foreach { case (k, v) => assert(got(k) == v, s"class $k") }
    // EMD is a normalized distance: always within [0, 1]
    got.values.foreach { case (_, emd, _) => assert(emd >= 0 && emd <= 1) }
  }

  test("q499 entropy l-diversity matches the lockstep brute recurrence") {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val band = (c: (Int, String, Double)) => math.floor(c._3 / 1000.0).toLong
    val brute = customers.groupBy(c => (c._1, c._2)).map { case (k, rows) =>
      val cc = rows.groupBy(band).view.mapValues(_.length.toLong).toMap
      val nRows = rows.length.toLong
      val s = cc.values.map(c => BigDecimal(r6(c * math.log(c.toDouble))))
        .sum
      val h = r6(math.log(nRows.toDouble) - s.toDouble / nRows) + 0.0d
      k -> ((nRows, cc.size.toLong, h))
    }
    val got = SparkEntry.queries("q499_entropy_ldiversity")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == brute.keySet)
    brute.foreach { case (k, v) => assert(got(k) == v, s"class $k") }
    // uniform-ish classes: entropy bounded by ln(n_distinct)
    got.values.foreach { case (_, d, h) =>
      assert(h <= math.log(d.toDouble) + 1e-9 && h >= -1e-9)
    }
  }
}
