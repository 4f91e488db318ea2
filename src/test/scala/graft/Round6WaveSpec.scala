package graft

import org.apache.spark.sql.functions._
import graft.operators.Analyses

/** Brute-force cross-checks for the round-6 third-wave gates (q339–q345):
  * each gate's distributed / lockstep formulation must agree with the
  * obvious sequential reference computed from the same sf0.001 fixture —
  * an independent derivation, not a re-run of the gate's own code path. */
class Round6WaveSpec extends SparkSuite {
  import spark.implicits._

  private lazy val monthly: Seq[(java.sql.Date, BigDecimal, Long)] =
    Tables.orders(spark, sf)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("m"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"),
        count(lit(1)).as("cnt"))
      .orderBy("m")
      .collect()
      .map(r => (r.getDate(0), BigDecimal(r.getDecimal(1)), r.getLong(2)))
      .toSeq

  test("q339 Holt: gate level/trend track an unrounded reference closely") {
    // the gate rounds each recursion step to 6 dp; an UNROUNDED reference
    // fold must stay within accumulated-rounding distance (~1e-4 over 80
    // steps) — catches any formula or ordering mistake, which would move
    // results by orders of magnitude more
    val got = SparkEntry.queries("q339_holt_smoothing")(spark, sf)
      .orderBy("month")
      .select("month", "smooth_level", "smooth_trend")
      .collect()
      .map(r => (r.getDate(0).toString, r.getDouble(1), r.getDouble(2)))
    val ys = monthly.map(_._2.toDouble)
    var lev = ys.head
    var tr = ys(1) - ys.head
    val ref = scala.collection.mutable.ArrayBuffer((lev, tr))
    ys.drop(1).foreach { y =>
      val l2 = 0.3 * y + 0.7 * (lev + tr)
      val t2 = 0.2 * (l2 - lev) + 0.8 * tr
      lev = l2; tr = t2
      ref += ((lev, tr))
    }
    assert(got.length == monthly.length)
    got.zip(ref).zip(monthly).foreach { case (((m, l, t), (rl, rt)), (rm, _, _)) =>
      assert(m == rm.toString)
      assert(math.abs(l - rl) < 1e-3, s"$m level $l vs ref $rl")
      assert(math.abs(t - rt) < 1e-3, s"$m trend $t vs ref $rt")
    }
  }

  test("q340 Lorenz: shares end at 1.0 and match the brute curve") {
    val got = SparkEntry.queries("q340_lorenz_curve")(spark, sf)
      .orderBy("spend_bin")
      .select("spend_bin", "cum_customers", "cum_pop_share", "cum_rev_share")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.last._3 == 1.0 && got.last._4 == 1.0)
    // monotone nondecreasing in both shares
    got.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._3 && a._4 <= b._4)
      case _ =>
    }
    // brute reference: per-customer spend → exact cents bins
    val spend = Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("s"))
      .collect().map(r => BigDecimal(r.getDecimal(1)))
    val bins = spend.groupBy(s => (s * 100).toLongExact / 1000000L)
    val totN = spend.length.toDouble
    val totS = spend.sum.toDouble
    val sortedBins = bins.toSeq.sortBy(_._1)
    var cn = 0L
    var cs = BigDecimal(0)
    val ref = sortedBins.map { case (b, vs) =>
      cn += vs.length; cs += vs.sum
      (b, cn, cn / totN, cs.toDouble / totS)
    }
    assert(got.length == ref.length)
    got.zip(ref).foreach { case ((b, c, p, r), (rb, rc, rp, rr)) =>
      assert(b == rb && c == rc)
      assert(math.abs(p - rp) < 1e-5 && math.abs(r - rr) < 1e-5)
    }
  }

  test("q341 changepoint: argmax matches the brute sequential scan") {
    val got = SparkEntry.queries("q341_changepoint")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getDate(2).toString, r.getDouble(3)))
      .map(t => t._1 -> ((t._2, t._3))).toMap
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(sum((col("value").cast("decimal(18,2)") * lit(100))
        .cast("bigint")).as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    daily.groupBy(_._1).foreach { case (tpe, rows) =>
      val seq = rows.sortBy(_._2)
      val n = seq.length.toLong
      val tot = seq.map(_._3).sum
      var s = 0L
      val devs = seq.zipWithIndex.dropRight(1).map { case ((_, d, c), i) =>
        s += c
        (d, math.abs(s * n - (i + 1) * tot))
      }
      // earliest-day tie rule: first index attaining the max deviation
      val maxDev = devs.map(_._2).max
      val bestDay = devs.find(_._2 == maxDev).get
      val (gd, gp) = got(tpe)
      assert(gd == bestDay._1, s"$tpe cp_day $gd vs brute ${bestDay._1}")
      assert(math.abs(gp - bestDay._2.toDouble / (n * 100.0)) < 0.01)
    }
  }

  test("q342/q344: F and W match brute double-precision references") {
    val rows = Tables.orders(spark, sf)
      .select(col("o_orderstatus"), col("o_orderpriority"),
        col("o_totalprice").cast("decimal(18,2)").cast("double"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    def bruteF(vs: Seq[(String, Double)]): Double = {
      val groups = vs.groupBy(_._1).values.map(_.map(_._2)).toSeq
      val n = vs.size.toDouble
      val k = groups.size.toDouble
      val gm = vs.map(_._2).sum / n
      val ssb = groups.map(g => g.size * math.pow(g.sum / g.size - gm, 2)).sum
      val ssw = groups.map(g => {
        val m = g.sum / g.size; g.map(x => (x - m) * (x - m)).sum
      }).sum
      (ssb / (k - 1)) / (ssw / (n - k))
    }
    def bruteW(vs: Seq[(String, Double)]): Double = {
      val zs = vs.groupBy(_._1).values.flatMap { g =>
        val m = g.map(_._2).sum / g.size
        g.map(x => (x._1, math.abs(x._2 - m)))
      }.toSeq
      bruteF(zs)
    }
    val gotF = SparkEntry.queries("q342_anova_f")(spark, sf)
      .select("o_orderstatus", "f_stat").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val gotW = SparkEntry.queries("q344_levene")(spark, sf)
      .select("o_orderstatus", "w_stat").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.groupBy(_._1).foreach { case (st, rs) =>
      val vs = rs.map(t => (t._2, t._3)).toSeq
      assert(math.abs(gotF(st) - bruteF(vs)) < 1e-3,
        s"$st F ${gotF(st)} vs brute ${bruteF(vs)}")
      assert(math.abs(gotW(st) - bruteW(vs)) < 1e-3,
        s"$st W ${gotW(st)} vs brute ${bruteW(vs)}")
    }
  }

  test("q343 Kendall: pair counts match the brute quadratic count") {
    val got = SparkEntry.queries("q343_kendall_tau")(spark, sf).collect().head
    val xs = monthly.map(m => (m._2, m._3))
    var c = 0L; var d = 0L; var tx = 0L; var ty = 0L
    for (i <- xs.indices; j <- (i + 1) until xs.size) {
      val sx = xs(i)._1.compare(xs(j)._1)
      val sy = xs(i)._2.compare(xs(j)._2)
      if (sx == 0) tx += 1
      if (sy == 0) ty += 1
      if (sx * sy > 0) c += 1
      if (sx * sy < 0) d += 1
    }
    assert(got.getAs[Long]("concordant") == c)
    assert(got.getAs[Long]("discordant") == d)
    assert(got.getAs[Long]("tied_x") == tx)
    assert(got.getAs[Long]("tied_y") == ty)
    val n0 = xs.size.toLong * (xs.size - 1) / 2
    val want = (c - d).toDouble / math.sqrt((n0 - tx).toDouble * (n0 - ty))
    assert(math.abs(got.getAs[Double]("tau_b") - want) < 1e-6)
  }

  test("q346 price index: base year pins to 1.0, Fisher between L and P") {
    val got = SparkEntry.queries("q346_price_index")(spark, sf)
      .orderBy("yr").collect()
      .map(r => (r.getInt(0), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val (y0, l0, p0, f0) = got.head
    assert(l0 == 1.0 && p0 == 1.0 && f0 == 1.0, s"base year $y0 not unity")
    got.foreach { case (y, l, p, f) =>
      assert(f >= math.min(l, p) - 1e-6 && f <= math.max(l, p) + 1e-6,
        s"$y fisher $f outside [$p, $l]")
    }
  }

  test("q347 CCF: each lag matches brute Pearson on the joined series") {
    val got = SparkEntry.queries("q347_cross_correlation")(spark, sf)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    def daily(t: String): Map[java.time.LocalDate, Long] =
      Tables.events(spark, sf).filter(col("event_type") === t)
        .groupBy(col("ts").cast("date").as("d"))
        .agg(sum((col("value").cast("decimal(18,2)") * lit(100))
          .cast("bigint")).as("v"))
        .collect()
        .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    val xs = daily("click"); val ys = daily("purchase")
    for (lag <- -3 to 3) {
      val pairs = xs.toSeq.flatMap { case (d, xv) =>
        ys.get(d.plusDays(lag)).map(yv => (xv.toDouble, yv.toDouble))
      }
      val n = pairs.size.toDouble
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val want = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      val (gn, gc) = got(lag)
      assert(gn == pairs.size.toLong, s"lag $lag n_days")
      assert(math.abs(gc - want) < 1e-5, s"lag $lag ccf $gc vs brute $want")
    }
  }

  test("q348 Hill: alpha matches the brute top-k computation") {
    val got = SparkEntry.queries("q348_hill_tail")(spark, sf).collect().head
    val top = Tables.orders(spark, sf)
      .select(col("o_totalprice").cast("decimal(18,2)").cast("double"),
        col("o_orderkey"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy { case (v, k) => (-v, k) }.take(501)
    val xmin = top.last._1
    val alpha = 500.0 / top.take(500).map(t => math.log(t._1 / xmin)).sum
    assert(got.getAs[Double]("x_min") == BigDecimal(xmin)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(math.abs(got.getAs[Double]("hill_alpha") - alpha) < 1e-3,
      s"alpha ${got.getAs[Double]("hill_alpha")} vs brute $alpha")
  }

  test("q349 McNemar: b/c counts match the brute successor scan") {
    val got = SparkEntry.queries("q349_mcnemar")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val act = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"), col("ts").cast("date"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDate(2).toLocalDate))
    val d0 = act.map(_._3).min; val d1 = act.map(_._3).max
    val set = act.toSet
    act.groupBy(_._1).foreach { case (tpe, rows) =>
      val b = rows.count(r => r._3.isBefore(d1) &&
        !set.contains((r._1, r._2, r._3.plusDays(1))))
      val c = rows.count(r => r._3.isAfter(d0) &&
        !set.contains((r._1, r._2, r._3.minusDays(1))))
      val nb = rows.count(r => set.contains((r._1, r._2, r._3.plusDays(1))))
      assert(got(tpe) == ((b.toLong, c.toLong, nb.toLong)),
        s"$tpe got ${got(tpe)} want ($b, $c, $nb)")
    }
  }

  test("q350 DSO: internal consistency open_ar / daily_revenue") {
    SparkEntry.queries("q350_dso")(spark, sf).collect().foreach { r =>
      val ar = r.getAs[Double]("open_ar")
      val dr = r.getAs[Double]("daily_revenue")
      val dso = r.getAs[Double]("dso_days")
      assert(math.abs(dso - ar / dr) < 0.51, s"dso $dso vs ${ar / dr}")
      assert(ar >= 0 && dr > 0)
    }
  }

  test("q351 Heaps: monotone growth, final checkpoint covers the corpus") {
    val got = SparkEntry.queries("q351_heaps_law")(spark, sf)
      .orderBy("checkpoint").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 10)
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 <= b._2 && a._3 <= b._3 && a._4 <= b._4)
      case _ =>
    }
    val tok = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val (totTok, totVocab) = (tok.count(),
      tok.select(countDistinct(col("w"))).head().getLong(0))
    assert(got.last._3 == totTok && got.last._4 == totVocab)
  }

  test("q352 assortativity: matches brute Pearson over the edge list") {
    val got = SparkEntry.queries("q352_assortativity")(spark, sf)
      .collect().head
    val edges = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val dc = edges.groupBy(_._1).view.mapValues(_.length.toDouble).toMap
    val ds = edges.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val xs = edges.map(e => dc(e._1)); val ys = edges.map(e => ds(e._2))
    val n = edges.length.toDouble
    val sx = xs.sum; val sy = ys.sum
    val sxy = xs.zip(ys).map(p => p._1 * p._2).sum
    val sxx = xs.map(x => x * x).sum; val syy = ys.map(y => y * y).sum
    val want = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(got.getAs[Long]("n_edges") == edges.length.toLong)
    assert(math.abs(got.getAs[Double]("assortativity") - want) < 1e-5,
      s"got ${got.getAs[Double]("assortativity")} want $want")
  }

  test("q353 clustering: identities vs q120's per-node triangle table") {
    val got = SparkEntry.queries("q353_clustering_coeff")(spark, sf)
      .collect().head
    val tc = SparkEntry.queries("q120_triangle_counts")(spark, sf)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val wedges = tc.map { case (d, _) => d * (d - 1) / 2 }.sum
    val tri = tc.map(_._2).sum / 3
    assert(got.getAs[Long]("n_nodes") == tc.length.toLong)
    assert(got.getAs[Long]("n_wedges") == wedges)
    assert(got.getAs[Long]("total_triangles") == tri)
    val gcc = got.getAs[Double]("global_cc")
    assert(math.abs(gcc - 3.0 * tri / wedges) < 1e-5)
    assert(gcc >= 0.0 && gcc <= 1.0 &&
      got.getAs[Double]("avg_local_cc") <= 1.0)
  }

  test("q354 linkage: probabilities in (0,1), weight sign tracks m vs u") {
    val got = SparkEntry.queries("q354_linkage_weights")(spark, sf)
      .collect()
    assert(got.length == 3)
    got.foreach { r =>
      val m = r.getAs[Double]("m_prob"); val u = r.getAs[Double]("u_prob")
      val w = r.getAs[Double]("log2_weight")
      assert(m > 0 && m < 1 && u > 0 && u < 1)
      assert((m > u && w > 0) || (m < u && w < 0) || (m == u && w == 0.0),
        s"${r.getString(0)}: m=$m u=$u w=$w")
      // weight identity vs the rounded probabilities
      val want = math.log(m / u) / math.log(2.0)
      assert(math.abs(w - want) < 1e-5)
    }
  }

  test("q355 Fano: matches brute dispersion over (user, day) cells") {
    val got = SparkEntry.queries("q355_fano_burstiness")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("fano_factor"))
      .toMap
    val cells = Tables.events(spark, sf)
      .groupBy(col("event_type"), col("user_id"),
        col("ts").cast("date").as("d"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(3)))
    cells.groupBy(_._1).foreach { case (tpe, rows) =>
      val cs = rows.map(_._2.toDouble)
      val m = cs.sum / cs.length
      val v = cs.map(x => (x - m) * (x - m)).sum / cs.length
      assert(math.abs(got(tpe) - v / m) < 1e-5, s"$tpe ${got(tpe)} vs ${v / m}")
    }
  }

  test("q356 lognormal: exp(mu) median within the value range") {
    SparkEntry.queries("q356_lognormal_fit")(spark, sf).collect()
      .foreach { r =>
        val mu = r.getAs[Double]("mu_hat")
        val sg = r.getAs[Double]("sigma_hat")
        val med = r.getAs[Double]("median_hat")
        assert(sg > 0 && mu > 0)
        assert(math.abs(med - math.exp(mu)) < 0.5 + med * 1e-6)
      }
  }

  test("q357 Cochran Q: identity from the brute user-week matrix") {
    val got = SparkEntry.queries("q357_cochran_q")(spark, sf)
      .collect().head
    val marks = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").collect()
    val d0 = Tables.events(spark, sf)
      .agg(min(col("ts").cast("date"))).head().getDate(0).toLocalDate
    val mk = marks.map { r =>
      val d = r.getAs[java.sql.Timestamp]("ts").toLocalDateTime.toLocalDate
      (r.getAs[Long]("user_id"),
        java.time.temporal.ChronoUnit.DAYS.between(d0, d) / 7)
    }.filter(_._2 <= 3).distinct
    val ls = mk.groupBy(_._1).values.map(_.size.toLong)
    val gs = mk.groupBy(_._2).values.map(_.size.toLong)
    val t = ls.sum; val sl2 = ls.map(l => l * l).sum
    val sg2 = gs.map(g => g * g).sum
    val want = 3.0 * (4 * sg2 - t * t).toDouble / (4 * t - sl2).toDouble
    assert(got.getAs[Long]("n_users") == ls.size.toLong)
    assert(math.abs(got.getAs[Double]("cochran_q") - want) < 1e-5)
  }

  test("q358 LM-Dirichlet: per-query top-10, scores descending, overlap with BM25") {
    val lm = SparkEntry.queries("q358_lm_dirichlet")(spark, sf).collect()
    val byQ = lm.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == Set(1L, 2L, 3L))
    byQ.values.foreach { rows =>
      assert(rows.length == 10)
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("score") >= b.getAs[Double]("score"))
        case _ =>
      }
    }
    // sanity: the two models should agree on a nonempty slice of top-10s
    val bm = SparkEntry.queries("q96_bm25_topk")(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"))).toSet
    val lmSet = lm.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"))).toSet
    assert(lmSet.intersect(bm).nonEmpty)
  }

  test("q359 Hurst: slope in (0,1), R/S grows with window size") {
    val got = SparkEntry.queries("q359_hurst_rs")(spark, sf)
      .orderBy("window_size").collect()
      .map(r => (r.getInt(0), r.getAs[Double]("mean_rs"),
        r.getAs[Double]("hurst_exponent")))
    assert(got.map(_._1).toSeq == Seq(10, 20, 40))
    assert(got.sliding(2).forall {
      case Array(a, b) => a._2 < b._2
      case _ => true
    })
    val h = got.head._3
    assert(got.forall(_._3 == h))
    assert(h > 0.0 && h < 1.0, s"hurst $h outside (0,1)")
  }

  test("q360 negbin: moment identities and NB domain guard") {
    val r = SparkEntry.queries("q360_negbin_fit")(spark, sf).collect().head
    val m = r.getAs[Double]("mean_orders"); val v = r.getAs[Double]("var_orders")
    if (v > m) {
      val rh = r.getAs[Double]("r_hat"); val ph = r.getAs[Double]("p_hat")
      assert(math.abs(rh - m * m / (v - m)) < 1e-4)
      assert(math.abs(ph - m / v) < 1e-6 && ph > 0 && ph < 1)
    } else {
      assert(r.isNullAt(r.fieldIndex("r_hat")) &&
        r.isNullAt(r.fieldIndex("p_hat")))
    }
  }

  test("q361 Good-Turing: ff table sums to vocab tail, p0 = N1/N") {
    val rows = SparkEntry.queries("q361_good_turing")(spark, sf).collect()
    assert(rows.nonEmpty)
    val n1 = rows.find(_.getAs[Long]("freq") == 1L)
      .map(_.getAs[Long]("n_types")).getOrElse(0L)
    val nTok = rows.head.getAs[Long]("n_tokens")
    val p0 = rows.head.getAs[Double]("p0_unseen")
    assert(math.abs(p0 - n1.toDouble / nTok) < 1e-6)
    // every displayed class is rare by construction
    assert(rows.forall(_.getAs[Long]("freq") <= 10L))
  }

  test("q362 Simpson: index + diversity sum to 1, in-range") {
    SparkEntry.queries("q362_simpson_diversity")(spark, sf).collect()
      .foreach { r =>
        val i = r.getAs[Double]("simpson_index")
        val d = r.getAs[Double]("simpson_diversity")
        assert(i >= 0 && i <= 1 && math.abs(i + d - 1.0) < 1e-9)
      }
  }

  test("q363 Durbin-Watson: in [0,4], matches brute residual scan") {
    val got = SparkEntry.queries("q363_durbin_watson")(spark, sf)
      .collect().head.getAs[Double]("durbin_watson")
    assert(got > 0 && got < 4)
    val ys = monthly.map(_._2.toDouble)
    val n = ys.length
    val ts = (1 to n).map(_.toDouble)
    val st = ts.sum; val stt = ts.map(t => t * t).sum
    val sy = ys.sum; val sty = ts.zip(ys).map(p => p._1 * p._2).sum
    val b = (n * sty - st * sy) / (n * stt - st * st)
    val a = (sy - b * st) / n
    val es = ts.zip(ys).map { case (t, y) => y - (a + b * t) }
    val want = es.sliding(2).map { case Seq(p, c) =>
      (c - p) * (c - p)
    }.sum / es.map(e => e * e).sum
    assert(math.abs(got - want) < 1e-4, s"dw $got vs brute $want")
  }

  test("q364 GK gamma: matches brute ordinal concordance on the cells") {
    val got = SparkEntry.queries("q364_gk_gamma")(spark, sf).collect().head
    val cells = Tables.orders(spark, sf)
      .groupBy(substring(col("o_orderpriority"), 1, 1).cast("int").as("px"),
        when(col("o_orderstatus") === "F", 1)
          .when(col("o_orderstatus") === "P", 2).otherwise(3).as("sy"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    var conc = 0L; var disc = 0L
    for (a <- cells; b <- cells
         if a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)) {
      val sp = (b._1 - a._1).sign * (b._2 - a._2).sign
      if (sp > 0) conc += a._3 * b._3
      if (sp < 0) disc += a._3 * b._3
    }
    assert(got.getAs[Long]("concordant") == conc)
    assert(got.getAs[Long]("discordant") == disc)
  }

  test("q365 MI: nonnegative-ish and matches brute cell computation") {
    val got = SparkEntry.queries("q365_mutual_info")(spark, sf)
      .collect().head.getAs[Double]("mutual_info_nats")
    val cells = Tables.events(spark, sf)
      .select(col("event_type"), dayofweek(col("ts")).as("dw"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val n = cells.length.toDouble
    val cxy = cells.groupBy(identity).view.mapValues(_.length).toMap
    val cx = cells.groupBy(_._1).view.mapValues(_.length).toMap
    val cy = cells.groupBy(_._2).view.mapValues(_.length).toMap
    val want = cxy.map { case ((x, y), c) =>
      c / n * math.log(c * n / (cx(x).toDouble * cy(y))) }.sum
    assert(math.abs(got - want) < 1e-4, s"mi $got vs brute $want")
    assert(got >= -1e-9)
  }

  test("q366 IPW: matches brute stratified estimator") {
    val got = SparkEntry.queries("q366_ipw_ate")(spark, sf).collect().head
    val rows = Tables.orders(spark, sf)
      .select(col("o_orderstatus"), year(col("o_orderdate")),
        (col("o_orderpriority") === "1-URGENT").cast("int"),
        col("o_totalprice").cast("decimal(18,2)").cast("double"))
      .collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getInt(2), r.getDouble(3)))
    val strata = rows.groupBy(_._1).filter { case (_, rs) =>
      rs.exists(_._2 == 1) && rs.exists(_._2 == 0)
    }
    val terms = strata.values.map { rs =>
      val n = rs.size
      val yt = rs.filter(_._2 == 1).map(_._3).sum
      val nt = rs.count(_._2 == 1)
      val yc = rs.filter(_._2 == 0).map(_._3).sum
      (yt * n / nt - yc * n / (n - nt), n)
    }
    val want = terms.map(_._1).sum / terms.map(_._2).sum
    assert(math.abs(got.getAs[Double]("ipw_ate") - want) < 1.0,
      s"ipw ${got.getAs[Double]("ipw_ate")} vs brute $want")
    assert(got.getAs[Long]("n_strata") == strata.size.toLong)
  }

  test("q367 EB: shrinkage pulls toward the prior mean, ordering kept") {
    val rows = SparkEntry.queries("q367_eb_shrinkage")(spark, sf).collect()
    val m = rows.map(_.getAs[Double]("raw_rate")).sum / rows.length
    rows.foreach { r =>
      val raw = r.getAs[Double]("raw_rate")
      val sh = r.getAs[Double]("shrunk_rate")
      // shrunk estimate lies between the raw rate and the global mean
      assert(sh >= math.min(raw, m) - 0.02 && sh <= math.max(raw, m) + 0.02,
        s"user ${r.getLong(0)}: raw $raw shrunk $sh mean $m")
    }
  }

  test("q368 bounce: session identities vs q87's sessionization") {
    val got = SparkEntry.queries("q368_bounce_rate")(spark, sf)
      .collect().head
    val sess = SparkEntry.queries("q87_sessionize")(spark, sf)
      .groupBy(col("user_id"), col("session_seq")).count().collect()
    val n = sess.length.toLong
    val b = sess.count(_.getAs[Long]("count") == 1L).toLong
    assert(got.getAs[Long]("n_sessions") == n)
    assert(got.getAs[Long]("n_bounce") == b)
  }

  test("q369 p95: rank definition holds against brute percentile") {
    val got = SparkEntry.queries("q369_ship_delay_p95")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("p95_delay_days"))
      .toMap
    val delays = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .select(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM"),
        datediff(col("l_shipdate").cast("date"),
          col("o_orderdate").cast("date")))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    delays.groupBy(_._1).foreach { case (mth, rs) =>
      val sorted = rs.map(_._2).sorted
      val rank = (95 * sorted.length + 99) / 100
      assert(got(mth) == sorted(rank - 1).toLong,
        s"$mth p95 ${got(mth)} vs brute ${sorted(rank - 1)}")
    }
  }

  test("q370 Burrows: symmetric-positive distances, self-consistent z") {
    val rows = SparkEntry.queries("q370_burrows_delta")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("burrows_delta") >= 0.0)
      assert(r.getString(0) < r.getString(1))
    }
    // distance scale: z-scores have unit variance, so mean |dz| across
    // pairs should be O(1) — catches a wrong normalizer by 10x
    val mean = rows.map(_.getAs[Double]("burrows_delta")).sum / rows.length
    assert(mean > 0.2 && mean < 5.0, s"implausible delta scale $mean")
  }

  test("q371 reach: cumulative counts consistent with q145's distances") {
    val got = SparkEntry.queries("q371_reach_profile")(spark, sf)
      .orderBy("hops").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getAs[Double]("frac_reached")))
    assert(got.head._1 == 0)
    // cumulative is the running sum of per-level counts
    var cum = 0L
    got.foreach { case (_, n, c, f) =>
      cum += n
      assert(c == cum)
      assert(f >= 0 && f <= 1.0)
    }
    // fraction is monotone nondecreasing
    got.map(_._4).sliding(2).foreach {
      case Array(a, b) => assert(a <= b)
      case _ =>
    }
  }

  test("q372 TF-IDF: three keywords per doc, each present in the doc") {
    val got = SparkEntry.queries("q372_tfidf_keywords")(spark, sf).collect()
    val byDoc = got.groupBy(_.getAs[Long]("doc_id"))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    byDoc.foreach { case (id, rows) =>
      assert(rows.length == 3)
      rows.foreach { r =>
        assert(docs(id).split(" ").contains(r.getAs[String]("term")),
          s"doc $id keyword ${r.getAs[String]("term")} not in text")
      }
    }
  }

  test("q373 readability: counts match brute token/sentence scan") {
    val got = SparkEntry.queries("q373_readability")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    docs.groupBy(_._1).foreach { case (src, rows) =>
      var sents = 0L; var wordsN = 0L; var syls = 0L
      rows.foreach { case (_, text) =>
        text.split("[.!?]+").map(_.trim).filter(_.nonEmpty).foreach { sn =>
          sents += 1
          sn.split(" ").filter(_.nonEmpty).foreach { w =>
            wordsN += 1
            val groups = "[aeiouy]+".r.findAllIn(w.toLowerCase).length
            syls += math.max(groups, 1)
          }
        }
      }
      assert(got(src) == ((sents, wordsN, syls)),
        s"$src got ${got(src)} want ($sents, $wordsN, $syls)")
    }
  }

  test("q374 minhash accuracy: error shrinks as k grows") {
    val got = SparkEntry.queries("q374_minhash_accuracy")(spark, sf)
      .orderBy("k_hashes").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getAs[Double]("mean_abs_err")))
    assert(got.map(_._1).toSeq == Seq(8, 16, 32))
    assert(got.map(_._2).distinct.length == 1) // same pair set at every k
    // the estimator is consistent: error at k=32 below error at k=8
    assert(got.last._3 <= got.head._3 + 1e-9,
      s"err(32)=${got.last._3} err(8)=${got.head._3}")
    assert(got.forall(_._3 >= 0.0))
  }

  test("q375 IPF: fitted margins converge to the post-period targets") {
    val got = SparkEntry.queries("q375_ipf_raking")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        r.getAs[Double]("fitted")))
    val post = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
    val colTargets = post.groupBy(col("o_orderstatus")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the LAST IPF half-step scales columns, so fitted column sums match
    // the column targets almost exactly
    got.groupBy(_._1._2).foreach { case (st, cells) =>
      val s = cells.map(_._2).sum
      assert(math.abs(s - colTargets(st)) < 0.01,
        s"status $st fitted sum $s vs target ${colTargets(st)}")
    }
    // row margins converge but are not exact after the column step:
    // within 1% after 5 rounds
    val rowTargets = post.groupBy(col("o_orderpriority")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got.groupBy(_._1._1).foreach { case (p, cells) =>
      val s = cells.map(_._2).sum
      assert(math.abs(s - rowTargets(p)) < 0.01 * rowTargets(p),
        s"priority $p fitted sum $s vs target ${rowTargets(p)}")
    }
  }

  test("q376 DiD: identity from the four cell means") {
    val r = SparkEntry.queries("q376_diff_in_diff")(spark, sf)
      .collect().head
    val did = r.getAs[Double]("did_estimate")
    val id = (r.getAs[Double]("treat_post") - r.getAs[Double]("treat_pre")) -
      (r.getAs[Double]("ctrl_post") - r.getAs[Double]("ctrl_pre"))
    assert(math.abs(did - id) < 1e-5)
    assert(r.getAs[Long]("n_obs") > 0)
  }

  test("q377 gaps: histogram accounts for every missing finalized key") {
    val got = SparkEntry.queries("q377_key_gaps")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (len, n, miss) => assert(miss == len * n) }
    val keys = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted
    val bruteMissing = keys.sliding(2).collect {
      case Array(a, b) if b - a > 1 => b - a - 1
    }.sum
    assert(got.map(_._3).sum == bruteMissing,
      s"missing ${got.map(_._3).sum} vs brute $bruteMissing")
  }

  test("q378 Bayes A/B: probability consistent with the z sign and scale") {
    val r = SparkEntry.queries("q378_bayes_ab")(spark, sf).collect().head
    val z = r.getAs[Double]("z_score")
    val p = r.getAs[Double]("p_superior")
    assert(p > 0 && p < 1)
    if (z > 0.1) assert(p > 0.5) else if (z < -0.1) assert(p < 0.5)
    // A-S polynomial vs an independent Φ approximation (erf-based)
    val want = 0.5 * (1.0 + erf(z / math.sqrt(2.0)))
    assert(math.abs(p - want) < 1e-6, s"p $p vs erf-based $want")
  }

  private def erf(x: Double): Double = {
    // Abramowitz-Stegun 7.1.26 — an INDEPENDENT formula from the gate's
    // 26.2.17 polynomial, max error 1.5e-7
    val t = 1.0 / (1.0 + 0.3275911 * math.abs(x))
    val y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741)
      * t - 0.284496736) * t + 0.254829592) * t * math.exp(-x * x)
    if (x >= 0) y else -y
  }

  test("q379 power: n grows as the observed effect shrinks") {
    val got = SparkEntry.queries("q379_power_analysis")(spark, sf)
      .collect()
      .map(r => (r.getAs[Double]("observed_delta"),
        r.getAs[Double]("pooled_sd"), r.getAs[Long]("n_required_per_arm")))
    got.foreach { case (d, sd, n) =>
      // identity: n = ceil(7.849 * 2 * sd^2 / d^2) (v1+v0 = 2*pooled^2)
      val want = math.ceil(7.849 * 2.0 * sd * sd / (d * d)).toLong
      assert(math.abs(n - want) <= math.max(1L, want / 100),
        s"n $n vs identity $want")
    }
  }

  test("q380 CUPED: reduction equals rho^2, var_cuped <= var_raw") {
    val r = SparkEntry.queries("q380_cuped")(spark, sf).collect().head
    val vr = r.getAs[Double]("var_raw")
    val vc = r.getAs[Double]("var_cuped")
    val red = r.getAs[Double]("variance_reduction")
    assert(vc <= vr + 1e-9)
    assert(red >= 0 && red <= 1)
    assert(math.abs((vr - vc) / vr - red) < 1e-2,
      s"reduction $red vs (vr-vc)/vr ${(vr - vc) / vr}")
  }

  test("q381 Neyman: weights sum to 1, allocation to ~10000") {
    val got = SparkEntry.queries("q381_neyman_allocation")(spark, sf)
      .collect()
      .map(r => (r.getAs[Double]("weight"), r.getAs[Long]("allocation")))
    assert(math.abs(got.map(_._1).sum - 1.0) < 1e-4)
    val total = got.map(_._2).sum
    assert(math.abs(total - 10000L) <= got.length,
      s"allocations sum $total")
  }

  test("q382 RDD: jump equals the intercept difference; fits span the cutoff") {
    val r = SparkEntry.queries("q382_reg_discontinuity")(spark, sf)
      .collect().head
    assert(r.getAs[Long]("n_left") > 0 && r.getAs[Long]("n_right") > 0)
    val jump = r.getAs[Double]("jump_at_cutoff")
    val id = r.getAs[Double]("intercept_right") -
      r.getAs[Double]("intercept_left")
    assert(math.abs(jump - id) < 0.011)
  }

  test("q383 peaks: every reported peak is a strict local maximum") {
    val got = SparkEntry.queries("q383_peak_detection")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate,
        r.getAs[Double]("rise"), r.getAs[Double]("fall")))
    assert(got.nonEmpty)
    got.foreach { case (_, _, rise, fall) =>
      assert(rise > 0 && fall > 0)
    }
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(sum((col("value").cast("decimal(18,2)") * lit(100))
        .cast("bigint")).as("c"))
      .collect()
      .map(r => ((r.getString(0), r.getDate(1).toLocalDate), r.getLong(2)))
      .toMap
    got.foreach { case (tpe, day, _, _) =>
      val c = daily((tpe, day))
      val pv = daily.get((tpe, day.minusDays(1)))
      val nx = daily.get((tpe, day.plusDays(1)))
      assert(pv.exists(_ < c) && nx.exists(_ < c),
        s"$tpe $day not a strict local max")
    }
  }

  test("q384 drift: ratio identities and full metric set") {
    val got = SparkEntry.queries("q384_profile_drift")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getAs[Double]("period1"),
        r.getAs[Double]("period2"),
        Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(got.keySet == Set("n_rows", "n_users", "mean_value",
      "null_props_rate"))
    got.foreach { case (m, (p1, p2, ratio)) =>
      if (p1 > 0)
        assert(ratio.exists(r => math.abs(r - p2 / p1) < 1e-5), s"$m")
      else assert(ratio.isEmpty, s"$m ratio should be NULL at zero base")
    }
  }

  test("holtSmooth: a constant series is a fixed point (trend 0)") {
    val df = (1 to 30).map(i => (day(f"2024-01-${i % 28 + 1}%02d"), 500.0))
      .distinct.toDF("d", "v")
    val out = Analyses.holtSmooth(df, "d", "v").collect()
    out.foreach { r =>
      assert(r.getAs[Double]("smooth_level") == 500.0)
      assert(r.getAs[Double]("smooth_trend") == 0.0)
      assert(r.getAs[Double]("forecast_next") == 500.0)
    }
  }

  test("holtSmooth: a linear series is tracked exactly — forecast hits next point") {
    // y_t = 100 + 7t: the first-difference init makes the recursion exact
    // (l2 = α·y2 + (1−α)(y1 + b) = y2), so every one-step forecast equals
    // the next observation up to the 6-dp step rounding
    val df = (1 to 20).map(i => (day(f"2024-03-$i%02d"), 100.0 + 7.0 * i))
      .toDF("d", "v")
    val out = Analyses.holtSmooth(df, "d", "v").orderBy("d").collect()
    out.dropRight(1).zip(out.drop(1)).foreach { case (cur, nxt) =>
      assert(math.abs(cur.getAs[Double]("forecast_next") -
        nxt.getAs[Double]("v")) < 1e-6)
    }
  }

  private def day(s: String): java.sql.Date = java.sql.Date.valueOf(s)

  test("q385 latency: percentiles ordered, ranks hold against brute") {
    val got = SparkEntry.queries("q385_conversion_latency")(spark, sf)
      .orderBy("pct").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == Seq(50, 90, 99))
    assert(got.map(_._3).sliding(2).forall {
      case Array(a, b) => a <= b
      case _ => true
    })
    // brute: per-user first signup → first subsequent purchase minutes
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        floor(unix_micros(col("ts")) / lit(1000000L)).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val signup = evs.filter(_._2 == "signup").groupBy(_._1).view
      .mapValues(_.map(_._3).min).toMap
    val lats = signup.flatMap { case (u, es) =>
      val ps = evs.filter(e => e._1 == u && e._2 == "purchase" && e._3 > es)
      if (ps.isEmpty) None else Some((ps.map(_._3).min - es) / 60)
    }.toSeq.sorted
    got.foreach { case (pct, n, lat) =>
      assert(n == lats.length.toLong)
      val rank = (pct * lats.length + 99) / 100
      assert(lat == lats(rank - 1), s"p$pct $lat vs brute ${lats(rank - 1)}")
    }
  }

  test("q386 backtest: error grows with horizon on a drifting series") {
    val got = SparkEntry.queries("q386_forecast_backtest")(spark, sf)
      .orderBy("horizon").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getAs[Double]("mae"),
        r.getAs[Double]("rmse")))
    assert(got.map(_._1).toSeq == Seq(1, 2, 3))
    got.foreach { case (_, n, mae, rmse) =>
      assert(n > 0 && mae > 0 && rmse >= mae)
    }
    // each extra horizon loses exactly one evaluable origin
    assert(got(0)._2 == got(1)._2 + 1 && got(1)._2 == got(2)._2 + 1)
  }

  test("lmDirichletTopK: hand-computed golden on a 3-doc corpus") {
    // corpus: d1 = "a a b", d2 = "a c", d3 = "b b c"  (|C| = 8 tokens)
    // cf: a=3, b=3, c=2; dl: d1=3, d2=2, d3=3; query "a b", mu = 2
    // term score  t in d: ln(1 + tf*8 / (2*cf))
    //   d1: a tf2 -> ln(1+16/6), b tf1 -> ln(1+8/6)
    //   d2: a tf1 -> ln(1+8/6)
    //   d3: b tf2 -> ln(1+16/6)
    // length penalty: nq=2 terms, ln(2/(dl+2)): d1,d3 -> 2*ln(2/5);
    //   d2 -> 2*ln(2/4)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "b b c"))
      .toDF("doc_id", "text")
    val qs = Seq((1L, "a b")).toDF("query_id", "query_text")
    val got = graft.operators.TextOps
      .lmDirichletTopK(docs, "doc_id", "text", qs, "query_id",
        "query_text", k = 3, mu = 2L)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    val s1 = r6(r6(math.log(1 + 16.0 / 6)) + r6(math.log(1 + 8.0 / 6)) +
      2.0 * r6(math.log(2.0 / 5)))
    val s2 = r6(r6(math.log(1 + 8.0 / 6)) + 2.0 * r6(math.log(2.0 / 4)))
    val s3 = r6(r6(math.log(1 + 16.0 / 6)) + 2.0 * r6(math.log(2.0 / 5)))
    val want = Seq((1L, s1), (2L, s2), (3L, s3)).sortBy(-_._2)
    assert(got.length == 3)
    got.zip(want).foreach { case ((gd, gs), (wd, ws)) =>
      assert(gd == wd && math.abs(gs - ws) < 1e-9,
        s"got ($gd, $gs) want ($wd, $ws)")
    }
  }

  test("q387 corr matrix: matches per-pair brute Pearson, r in [-1,1]") {
    val got = SparkEntry.queries("q387_corr_matrix")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getAs[Double]("pearson_r")))
    assert(got.length == 6)
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("double"),
        col("l_extendedprice").cast("double"),
        col("l_discount").cast("double"), col("l_tax").cast("double"))
      .collect()
      .map(r => Map("quantity" -> r.getDouble(0),
        "extendedprice" -> r.getDouble(1), "discount" -> r.getDouble(2),
        "tax" -> r.getDouble(3)))
    def pearson(a: String, b: String): Double = {
      val xs = rows.map(_(a)); val ys = rows.map(_(b))
      val n = xs.length.toDouble
      val mx = xs.sum / n; val my = ys.sum / n
      val cov = xs.zip(ys).map(p => (p._1 - mx) * (p._2 - my)).sum
      val vx = xs.map(x => (x - mx) * (x - mx)).sum
      val vy = ys.map(y => (y - my) * (y - my)).sum
      cov / math.sqrt(vx * vy)
    }
    got.foreach { case (a, b, r) =>
      assert(r >= -1.0 && r <= 1.0)
      assert(math.abs(r - pearson(a, b)) < 1e-4,
        s"$a/$b r=$r brute=${pearson(a, b)}")
    }
  }

  test("q388 quantile norm: deciles monotone, ranks hold per source") {
    val got = SparkEntry.queries("q388_quantile_norm")(spark, sf)
      .orderBy("decile").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == (1 to 9))
    got.foreach { case (_, a, b, s2) => assert(s2 == b - a) }
    got.sliding(2).foreach {
      case Array(x, y) => assert(x._2 <= y._2 && x._3 <= y._3)
      case _ =>
    }
    val lens = Tables.documents(spark, sf)
      .filter(col("source") === "src0")
      .select(length(col("text")).cast("long")).collect()
      .map(_.getLong(0)).sorted
    got.foreach { case (d, a, _, _) =>
      val rank = (d * lens.length + 9) / 10
      assert(a == lens(rank - 1), s"decile $d src0 $a vs ${lens(rank - 1)}")
    }
  }

  test("q389 lang-ID eval: identities vs q32's confusion matrix") {
    val cm = SparkEntry.queries("q32_lang_profile")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val got = SparkEntry.queries("q389_langid_eval")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val langs = cm.map(_._1._1).distinct
    langs.foreach { l =>
      val support = cm.filter(_._1._1 == l).map(_._2).sum
      val predicted = cm.filter(_._1._2 == l).map(_._2).sum
      val tp = cm.filter(c => c._1._1 == l && c._1._2 == l)
        .map(_._2).sum
      assert(got(l) == ((support, predicted, tp)),
        s"$l got ${got(l)} want ($support, $predicted, $tp)")
    }
    // F1 lies between precision and recall wherever defined
    SparkEntry.queries("q389_langid_eval")(spark, sf).collect()
      .foreach { r =>
        val p = Option(r.get(4)).map(_.asInstanceOf[Double])
        val rc = r.getAs[Double]("recall")
        val f1 = Option(r.get(6)).map(_.asInstanceOf[Double])
        (p, f1) match {
          case (Some(pp), Some(f)) =>
            assert(f >= math.min(pp, rc) - 1e-6 &&
              f <= math.max(pp, rc) + 1e-6)
          case _ =>
        }
      }
  }

  test("phoneticKey: doubling any non-initial letter never changes the code") {
    // run collapse happens before digits are read, and dropped classes
    // (vowels, h/w) collapse with their twin. The FIRST letter is
    // excluded: it is consumed as the code letter before the chain (the
    // same caveat classic soundex carries), so doubling it introduces a
    // new leading consonant into the digit tail.
    val base = Seq("red", "rod", "blue", "widget", "bolt", "spring",
      "lavender", "goldenrod", "hash", "where", "why", "aqua", "xylo")
    val doubled = base.flatMap { w =>
      (1 until w.length).map(i => (w, w.substring(0, i + 1) + w(i) +
        w.substring(i + 1)))
    }
    val df = doubled.toDF("orig", "mut")
    val out = df.select(
      graft.operators.TextOps.phoneticKey(col("orig")).as("a"),
      graft.operators.TextOps.phoneticKey(col("mut")).as("b"),
      col("orig"), col("mut")).collect()
    out.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"${r.getString(2)} -> ${r.getString(3)}: " +
          s"${r.getString(0)} != ${r.getString(1)}")
    }
  }

  test("q390 summary: micro/macro consistent with the per-class report") {
    val sum0 = SparkEntry.queries("q390_langid_summary")(spark, sf)
      .collect().head
    val per = SparkEntry.queries("q389_langid_eval")(spark, sf).collect()
    val n = per.map(_.getAs[Long]("support")).sum
    val tp = per.map(_.getAs[Long]("true_positives")).sum
    assert(sum0.getAs[Long]("n_docs") == n)
    assert(math.abs(sum0.getAs[Double]("micro_accuracy") -
      tp.toDouble / n) < 1e-5)
    val mf = sum0.getAs[Double]("macro_f1")
    val brute = per.map(r => Option(r.get(6))
      .map(_.asInstanceOf[Double]).getOrElse(0.0)).sum / per.length
    assert(math.abs(mf - brute) < 1e-5, s"macro f1 $mf vs $brute")
  }

  test("q345 phonetic: soundex-style goldens and collision flag") {
    val got = SparkEntry.queries("q345_phonetic_blocking")(spark, sf)
      .collect()
      .map(r => r.getAs[String]("code") ->
        ((r.getAs[String]("example_a"), r.getAs[String]("example_b"),
          r.getAs[Boolean]("is_block_collision"))))
      .toMap
    // red → R, d→3 → R300; rod → R, d→3 → R300: one blocking bucket
    val r300 = got.get("R300")
    assert(r300.exists { case (a, b, coll) => a == "red" && b == "rod" && coll })
    // blue → B, l→4, vowels drop → B400, no collision partner in corpus
    assert(got.get("B400").exists { case (a, b, coll) =>
      a == "blue" && b == "blue" && !coll })
  }
}
