package graft

import org.apache.spark.sql.functions._

/** Invariant + brute cross-checks for the wave-10 engine gates
  * (q418–q421): schema evolution, dictionary encoding, the data-driven
  * rule engine, and split-conformal calibration. */
class Wave10Spec extends SparkSuite {

  test("q418 merged read accounts for every order; LEGACY bucket == v1 rows") {
    val orders = Tables.orders(spark, sf)
    val total = orders.count()
    val v1 = orders.filter(col("o_orderdate") < lit("1998-01-01")).count()
    val out = SparkEntry.queries("q418_schema_evolution")(spark, sf).collect()
    assert(out.map(_.getLong(1)).sum == total)
    val legacy = out.find(_.getString(0) == "LEGACY").get
    assert(legacy.getLong(1) == v1)
    // every non-LEGACY bucket is a real v2 priority value
    val prios = orders.filter(col("o_orderdate") >= lit("1998-01-01"))
      .select("o_orderpriority").distinct().collect()
      .map(_.getString(0)).toSet
    assert(out.map(_.getString(0)).filterNot(_ == "LEGACY").toSet == prios)
  }

  test("q419 decode round trip is lossless and codes are dense") {
    val direct = Tables.part(spark, sf).groupBy("p_type")
      .agg(count(lit(1)).as("n"), sum("p_partkey").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val out = SparkEntry.queries("q419_dict_encoding")(spark, sf).collect()
    // parity: aggregating through encode->decode equals direct aggregation
    out.foreach { r =>
      val (n, s) = direct(r.getString(0))
      assert(r.getLong(2) == n && r.getLong(3) == s)
    }
    // codes are exactly 0..nd-1 (dense), assigned in value order
    val byCode = out.sortBy(_.getInt(1))
    assert(byCode.map(_.getInt(1)).toSeq == (0 until out.length))
    assert(byCode.map(_.getString(0)).toSeq == out.map(_.getString(0)).sorted.toSeq)
    // bits_per_value is the narrowest width holding the max code
    val bits = out.head.getInt(4)
    val maxCode = out.length - 1
    assert((1L << bits) > maxCode)
    assert(bits == 1 || (1L << (bits - 1)) <= maxCode)
  }

  test("q420 rule engine matches per-rule brute recounts (null = violation)") {
    val o = Tables.orders(spark, sf)
    val expect = Map(
      "r01_status_domain" ->
        o.filter(!coalesce(col("o_orderstatus").isin("O", "F", "P"),
          lit(false))).count(),
      "r02_price_positive" ->
        o.filter(!coalesce(col("o_totalprice") > 0.0, lit(false))).count(),
      "r03_priority_format" ->
        o.filter(!coalesce(col("o_orderpriority")
          .rlike("^[1-5]-[A-Z ]+$"), lit(false))).count(),
      "r05_custkey_notnull" -> o.filter(col("o_custkey").isNull).count(),
      "r06_key_positive" ->
        o.filter(!coalesce(col("o_orderkey") > 0.0, lit(false))).count())
    val total = o.count()
    val out = SparkEntry.queries("q420_dq_rule_engine")(spark, sf).collect()
    assert(out.length == 6)
    out.foreach { r =>
      assert(r.getLong(2) == total)
      expect.get(r.getString(0)).foreach(v => assert(r.getLong(3) == v))
    }
  }

  test("q421 qhat is the brute k-th smallest calibration residual; coverage near 0.9") {
    val o = Tables.orders(spark, sf).select(
      col("o_orderpriority").as("p"),
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        .as("cents"),
      col("o_orderdate").as("d"))
    val train = o.filter(col("d") < lit("1998-01-01")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val yhat = train.groupBy(_._1).map { case (p, g) =>
      p -> g.map(_._2).sum / g.length }  // integer floor division
    val cal = o.filter(col("d") >= lit("1998-01-01") &&
        col("d") < lit("1999-01-01")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val out = SparkEntry.queries("q421_split_conformal")(spark, sf).collect()
    out.foreach { r =>
      val p = r.getString(0)
      val resid = cal.filter(_._1 == p)
        .map { case (_, c) => math.abs(c - yhat(p)) }.sorted
      val n = resid.length
      assert(r.getLong(3) == n)
      val k = (9 * (n + 1) + 9) / 10
      assert(r.getLong(4) == resid(k - 1))
      // finite-sample guarantee: coverage ~ 0.9 (slack for the small sf)
      assert(r.getDouble(6) > 0.75 && r.getDouble(6) <= 1.0)
    }
  }

  test("q422 apportionment conserves the budget exactly and floors correctly") {
    val out = SparkEntry.queries("q422_token_apportionment")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val B = 1000000L
    assert(out.map(_._5).sum == B)              // Σalloc == B, always
    assert(out.forall(r => r._4 == 0L || r._4 == 1L))
    val total = out.map(_._2).sum
    out.foreach { case (_, tok, base, extra, alloc) =>
      assert(base == B * tok / total)           // floor share
      assert(alloc == base + extra)
    }
    // every award went to a remainder at least as large as any non-award
    val awarded = out.filter(_._4 == 1L).map(r => B * r._2 % total)
    val skipped = out.filter(_._4 == 0L).map(r => B * r._2 % total)
    if (awarded.nonEmpty && skipped.nonEmpty)
      assert(awarded.min >= skipped.max) // equality = tie broken by name
  }

  test("q423 projection ratios concentrate near 1 and match a brute vector") {
    val out = SparkEntry.queries("q423_jl_projection")(spark, sf).collect()
    out.foreach { r =>
      assert(r.getDouble(2) > 0.5 && r.getDouble(2) < 1.5)  // JL concentration
      assert(r.getDouble(3) > 0.0)
    }
    // brute-check one vector end to end
    def sgn(i: Int, j: Int): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"jl_${i}_${j}".getBytes("UTF-8"))
      1 - 2 * ((h(0) & 0xff) % 2)
    }
    val v = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).collect()(0)
      .getSeq[Double](0).map(x => math.floor(x * 1e6 + 0.5) / 1e6).toArray
    val p = (1 to 16).map { j =>
      // exact-decimal sum: scale to 1e6 longs, sum, scale back
      val s = (1 to 64).map(i =>
        math.round(v(i - 1) * 1e6) * sgn(i, j)).sum
      s.toDouble / 1e6
    }
    val ratio = p.map(x => x * x).sum / (16.0 * v.map(x => x * x).sum)
    val lbl = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select("label").collect()(0).getInt(0)
    val row = out.find(_.getInt(0) == lbl).get
    assert(row.getDouble(3) <= ratio + 1e-5 && ratio <= row.getDouble(4) + 1e-5)
  }

  test("q424 matches a brute temporal-BFS enumeration") {
    val edges = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey"),
        ((year(col("o_orderdate")) - 1995) * 12 +
          month(col("o_orderdate")) - 1).as("m"))
      .distinct().collect()
      .flatMap(r => Seq(("c" + r.getLong(0), "s" + r.getLong(1), r.getInt(2)),
        ("s" + r.getLong(1), "c" + r.getLong(0), r.getInt(2))))
    val best = scala.collection.mutable.Map.empty[String, Int]
    Tables.customer(spark, sf).filter(col("c_custkey") <= 2)
      .select("c_custkey").collect()
      .foreach(r => best("c" + r.getLong(0)) = 0)
    for (_ <- 1 to 3) {
      val snapshot = best.toMap
      snapshot.foreach { case (u, arr) =>
        edges.filter(e => e._1 == u && e._3 >= arr).foreach { e =>
          if (best.getOrElse(e._2, Int.MaxValue) > e._3) best(e._2) = e._3
        }
      }
    }
    val got = SparkEntry.queries("q424_temporal_reachability")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == best.toMap)
  }

  test("q425 schedule interleaves sources and honors longest-first ranks") {
    val out = SparkEntry.queries("q425_curriculum_interleave")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getInt(3)))
    // slots strictly increasing and unique
    assert(out.map(_._1).toSeq == out.map(_._1).sorted.toSeq)
    assert(out.map(_._1).distinct.length == out.length)
    // no two adjacent schedule entries share a source
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 != b._3); case _ => }
    // rank-1 docs are each source's longest (doc_id tiebreak)
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    out.filter(_._4 == 1).foreach { case (_, docId, src, _) =>
      val best = docs.filter(_._2 == src).minBy(d => (-d._3, d._1))
      assert(docId == best._1)
    }
  }

  test("q426 run accounting matches a brute per-order scan") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_returnflag").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val runs = scala.collection.mutable.Map.empty[String, Long]
    val rows = scala.collection.mutable.Map.empty[String, Long]
    li.groupBy(_._1).values.foreach { g =>
      val seq = g.sortBy(t => (t._2, t._3, t._4)).map(_._5)
      seq.foreach(f => rows(f) = rows.getOrElse(f, 0L) + 1)
      seq.zipWithIndex.foreach { case (f, i) =>
        if (i == 0 || seq(i - 1) != f) runs(f) = runs.getOrElse(f, 0L) + 1
      }
    }
    val out = SparkEntry.queries("q426_rle_audit")(spark, sf).collect()
    out.foreach { r =>
      assert(r.getLong(1) == rows(r.getString(0)))
      assert(r.getLong(2) == runs(r.getString(0)))
    }
  }

  test("q427 stay detection matches a brute trajectory scan") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = evs.groupBy(_._1).map { case (u, g) =>
      val pts = g.sortBy(e => (e._2, e._3))
        .map(e => (e._3 * 7 % 1000, e._3 * 13 % 1000))
      val near = pts.indices.map(i => i > 0 &&
        math.max(math.abs(pts(i)._1 - pts(i - 1)._1),
          math.abs(pts(i)._2 - pts(i - 1)._2)) <= 50)
      // maximal runs of near==true with length >= 2
      var stays = 0L; var longest = 0L; var cur = 0L
      (near :+ false).foreach { n =>
        if (n) cur += 1
        else { if (cur >= 2) { stays += 1; longest = math.max(longest, cur + 1) }
          cur = 0 }
      }
      u -> (pts.length.toLong, stays, longest)
    }
    val got = SparkEntry.queries("q427_staypoints")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expect)
  }

  test("q428 two-level running max equals the brute arrival-order scan") {
    val evs = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    var rm = Long.MinValue
    val lates = evs.map { case (_, tu) =>
      rm = math.max(rm, tu); (rm - tu) / 1000000L
    }.sorted
    def pct(p: Int): Long = lates((p * lates.length + 99) / 100 - 1)
    val r = SparkEntry.queries("q428_watermark_advisor")(spark, sf)
      .collect()(0)
    assert(r.getLong(0) == lates.length)
    assert(r.getLong(1) == pct(50))
    assert(r.getLong(2) == pct(95))
    assert(r.getLong(3) == pct(99))
    assert(r.getLong(4) == r.getLong(3)) // delay IS the p99
    assert(r.getLong(1) <= r.getLong(2) && r.getLong(2) <= r.getLong(3))
  }

  test("q429 advisor stats match brute NDV/run counts and the rule table") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_returnflag"), col("l_linestatus"),
        date_format(date_trunc("month", col("l_shipdate")), "yyyy-MM"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5), r.getString(6)))
    def runsOf(f: ((Long, Int, Long, Long, String, String, String)) => Any)
        : Long =
      li.groupBy(_._1).values.map { g =>
        val seq = g.sortBy(t => (t._2, t._3, t._4)).map(f)
        seq.zipWithIndex.count { case (v, i) => i == 0 || seq(i - 1) != v }
      }.sum
    val expect = Map(
      "l_returnflag" -> (li.map(_._5).distinct.length.toLong, runsOf(_._5)),
      "l_linestatus" -> (li.map(_._6).distinct.length.toLong, runsOf(_._6)),
      "l_shipmonth" -> (li.map(_._7).distinct.length.toLong, runsOf(_._7)),
      "l_partkey" -> (li.map(_._3).distinct.length.toLong, runsOf(_._3)))
    val out = SparkEntry.queries("q429_encoding_advisor")(spark, sf)
      .collect()
    assert(out.length == 4)
    out.foreach { r =>
      val (ndv, runs) = expect(r.getString(0))
      assert(r.getLong(1) == li.length)
      assert(r.getLong(2) == ndv && r.getLong(3) == runs)
      val enc =
        if (ndv <= 4096 && runs * 2 <= li.length) "DICT_RLE"
        else if (ndv <= 4096) "DICT"
        else if (runs * 2 <= li.length) "RLE"
        else "PLAIN"
      assert(r.getString(5) == enc)
    }
  }
}
