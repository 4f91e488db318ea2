package graft

import org.apache.spark.sql.functions._

/** Brute cross-checks for the ops-diagnostics wave (q410–q412). */
class OpsDiagnosticsSpec extends SparkSuite {

  test("q410 event paths match a brute per-user timeline scan") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    evs.groupBy(_._1).values.foreach { g =>
      val seq = g.sortBy(e => (e._2, e._3)).map(_._4)
      seq.sliding(3).filter(_.length == 3).foreach { t =>
        val p = t.mkString(">")
        counts(p) = counts.getOrElse(p, 0L) + 1
      }
    }
    val expect = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(10)
      .zipWithIndex.map { case ((p, n), i) => (i + 1, p, n) }
    val got = SparkEntry.queries("q410_event_paths")(spark, sf)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expect)
  }

  test("q411 Gini matches a brute sorted-rank computation") {
    val mult = Tables.lineitem(spark, sf)
      .groupBy("l_orderkey").count().collect().map(_.getLong(1)).sorted
    val n = mult.length.toLong
    val tot = mult.sum
    val s = mult.zipWithIndex.map { case (c, i) => (i + 1).toLong * c }.sum
    val gini = 2.0 * s / (n.toDouble * tot.toDouble) - (n + 1).toDouble / n
    val row = SparkEntry.queries("q411_join_skew")(spark, sf).collect()(0)
    assert(row.getLong(0) == n && row.getLong(1) == tot)
    assert(row.getLong(2) == mult.max)
    assert(math.abs(row.getDouble(3) - gini) < 1e-6)
  }

  test("q413 profile assembly matches a brute per-user event fold") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"), round(col("value").cast("double"), 2),
        get_json_object(col("props"), "$.k").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4), r.getLong(5)))
    val expect = evs.groupBy(_._1).map { case (u, g) =>
      val purch = g.filter(_._4 == "purchase")
      val clicks = g.filter(_._4 == "click")
      val signups = g.filter(_._4 == "signup")
      u -> (g.length.toLong, g.map(_._2).max,
        if (signups.isEmpty) None else Some(signups.map(_._2).min),
        if (purch.isEmpty) None else Some(purch.maxBy(e => (e._2, e._3))._5),
        if (clicks.isEmpty) None else Some(clicks.maxBy(e => (e._2, e._3))._6))
    }
    val got = SparkEntry.queries("q413_profile_assembly")(spark, sf)
      .collect()
      .map { r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          if (r.isNullAt(5)) None else Some(r.getLong(5)))
      }.toMap
    assert(got == expect)
  }

  test("q414 sample bias: rates near 10%, sample stats consistent") {
    val got = SparkEntry.queries("q414_sample_bias")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.length == 5)
    got.foreach { case (p, popN, sampN, popM, sampM, rate) =>
      assert(sampN <= popN && rate > 0.02 && rate < 0.25, s"$p rate $rate")
      // unbiasedness at this sf: sample mean within 25% of population mean
      assert(math.abs(sampM - popM) / popM < 0.25, s"$p means $popM/$sampM")
    }
  }

  test("q415 blocking quality: caught bounded, exact dups fully caught") {
    val r = SparkEntry.queries("q415_blocking_quality")(spark, sf).collect()(0)
    val (nTruth, nCand, nCaught) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nCaught <= nTruth && nCaught <= nCand)
    // identical text ⇒ identical signature ⇒ every truth pair is caught
    assert(nCaught == nTruth, "an exact dup escaped the banding")
    if (nTruth > 0) assert(r.getDouble(3) == 1.0)
    assert(r.getDouble(5) > 0.99, "blocking must prune ≫ all-pairs")
  }

  test("q416 U-shaped attribution: credits conserve conversions, brute parity") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val horizon = 7L * 86400L * 1000000L
    val credit = scala.collection.mutable.Map.empty[String, BigDecimal]
    val touches = scala.collection.mutable.Map.empty[String, Long]
    var attributed = 0
    evs.groupBy(_._1).values.foreach { g =>
      val ts = g.filter(e => e._4 == "click" || e._4 == "view")
      g.filter(_._4 == "purchase").foreach { case (_, cts, _, _) =>
        val win = ts.filter(t => t._2 < cts && t._2 >= cts - horizon)
          .sortBy(t => (t._2, t._3))
        if (win.nonEmpty) {
          attributed += 1
          val n = win.length
          win.zipWithIndex.foreach { case (t, i) =>
            val w =
              if (n == 1) 1.0
              else if (n == 2) 0.5
              else if (i == 0 || i == n - 1) 0.4
              else 0.2 / (n - 2)
            credit(t._4) = credit.getOrElse(t._4, BigDecimal(0)) +
              BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            touches(t._4) = touches.getOrElse(t._4, 0L) + 1
          }
        }
      }
    }
    val got = SparkEntry.queries("q416_ushaped_attribution")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    credit.keys.foreach { tt =>
      assert(got(tt)._1 == touches(tt), s"$tt touches")
      assert(math.abs(got(tt)._2 - credit(tt).toDouble) < 1e-6, s"$tt credit")
    }
    // per-conversion weights sum to 1, so total credit ≈ attributed convs
    val total = got.values.map(_._2).sum
    assert(math.abs(total - attributed) < 1e-3, s"total $total vs $attributed")
  }

  test("q417 threshold curve is monotone and agrees with q36 at 0.5") {
    val got = SparkEntry.queries("q417_dedup_threshold_curve")(spark, sf)
      .orderBy("threshold").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == Seq(0.3, 0.5, 0.7))
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._2 <= a._2, "higher floor cannot admit more pairs")
        assert(b._3 >= a._3 - 1e-9, "surviving mean jaccard must not drop")
      case _ =>
    }
    val q36n = SparkEntry.queries("q36_neardup_jaccard")(spark, sf).count()
    assert(got.find(_._1 == 0.5).get._2 == q36n, "0.5 point must equal q36")
  }

  test("q412 FK scorecard: five edges, zero orphans, full child coverage") {
    val got = SparkEntry.queries("q412_fk_scorecard")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.length == 5)
    got.foreach { case (edge, childRows, childKeys, orphans, refd, parents) =>
      assert(orphans == 0, s"$edge has orphans")
      assert(childKeys <= childRows && refd <= parents, edge)
      assert(refd >= childKeys.min(parents), s"$edge referenced count")
    }
    // brute one edge: orders->customer
    val custs = Tables.customer(spark, sf).select("c_custkey").collect()
      .map(_.getLong(0)).toSet
    val ordKeys = Tables.orders(spark, sf).select("o_custkey").collect()
      .map(_.getLong(0))
    val e = got.find(_._1 == "orders->customer").get
    assert(e._2 == ordKeys.length)
    assert(e._3 == ordKeys.distinct.length)
    assert(e._4 == ordKeys.count(k => !custs(k)))
    assert(e._5 == custs.count(ordKeys.toSet))
  }
}
