package graft

import org.apache.spark.sql.functions._

/** Brute cross-checks and invariants for the statistics / causal-inference
  * wave (q456–q461). */
class CausalStatsSpec extends SparkSuite {

  test("q456 Mann-Whitney matches a brute rank computation") {
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("int"),
        (col("l_linestatus") === "O").cast("int"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    // brute tied average ranks over the full sample, 2x-scaled
    val sorted = rows.sortBy(_._1)
    val n = sorted.length
    val rankX2 = new Array[Long](n)
    var i = 0
    while (i < n) {
      var j = i
      while (j < n && sorted(j)._1 == sorted(i)._1) j += 1
      val avgX2 = (i + 1).toLong + j.toLong // 2*avg of ranks i+1..j
      (i until j).foreach(k => rankX2(k) = avgX2)
      i = j
    }
    val n1 = sorted.count(_._2 == 1).toLong
    val n2 = n - n1
    val r1x2 = sorted.zip(rankX2).filter(_._1._2 == 1).map(_._2).sum
    val u1x2 = r1x2 - n1 * (n1 + 1)
    val row = SparkEntry.queries("q456_mann_whitney")(spark, sf).collect()(0)
    assert(row.getLong(0) == n1 && row.getLong(1) == n2)
    assert(row.getLong(2) == u1x2)
    // conservation: U1 + U2 == n1*n2 (2x-scaled)
    assert(row.getLong(2) + row.getLong(3) == 2 * n1 * n2)
  }

  test("q457 BH rejections form a prefix of the p-value ranking") {
    val rows = SparkEntry.queries("q457_bh_fdr")(spark, sf)
      .orderBy("rnk").collect()
      .map(r => (r.getDouble(3), r.getLong(4), r.getInt(5)))
    // p monotone non-decreasing in rank
    rows.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0)._1 <= w(1)._1) }
    // rejected set is exactly ranks 1..kmax
    val kmax = rows.filter(_._3 == 1).map(_._2).sorted.toVector
    assert(kmax == (1L to kmax.length).toVector)
    // every rejected p satisfies the BH bound at its own rank or is
    // dominated by a later rank that does (step-up definition)
    val m = rows.length
    val anyBound = rows.filter { case (p, k, _) =>
      math.round(p * 1e6) * m * 20 <= k * 1000000L }.map(_._2)
    if (anyBound.nonEmpty) assert(kmax.lastOption.contains(anyBound.max))
    else assert(kmax.isEmpty)
  }

  test("q458 DiD equals the brute 2x2 cell contrast") {
    val asia = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .select(col("n_nationkey").cast("long")).collect()
      .map(_.getLong(0)).toSet
    val custNation = Tables.customer(spark, sf)
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("long"))
      .collect()
      .map(r => r.getLong(0) -> asia.contains(r.getLong(1))).toMap
    val cells = Tables.orders(spark, sf)
      .select(col("o_custkey").cast("long"), col("o_orderdate").cast("string"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect()
      .map { r =>
        val t = if (custNation(r.getLong(0))) 1 else 0
        val p = if (r.getString(1) >= "1999-01-01") 1 else 0
        ((t, p), r.getLong(2))
      }.groupBy(_._1).map { case (k, v) =>
        k -> (v.length.toLong, v.map(_._2).sum) }
    def m6(t: Int, p: Int): Long = {
      val (cn, cs) = cells((t, p))
      math.floor(cs.toDouble / cn / 100.0 * 1000000 + 0.5).toLong
    }
    val did = ((m6(1, 1) - m6(1, 0)) - (m6(0, 1) - m6(0, 0))) / 1000000.0
    val row = SparkEntry.queries("q458_did")(spark, sf).collect()(0)
    assert(row.getLong(0) == cells((0, 0))._1)
    assert(row.getLong(3) == cells((1, 1))._1)
    assert(math.abs(row.getDouble(8) - did) < 1e-9)
  }

  test("q459 CEM ATT matches a brute stratum fold") {
    val spend = Tables.orders(spark, sf)
      .groupBy(col("o_custkey").cast("long").as("ck"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long").as("sc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("long"),
        col("c_mktsegment"),
        (conv(substring(md5(concat(lit("cem:"),
          col("c_custkey").cast("string"))), 1, 8), 16, 10)
          .cast("long") % 2 === 0).cast("int"))
      .collect()
      .map(r => (r.getLong(1), r.getString(2), r.getInt(3),
        spend.getOrElse(r.getLong(0), 0L)))
    val byCell = cust.groupBy(c => (c._1, c._2))
    var wSum = 0L; var wd = 0L; var matched = 0
    byCell.foreach { case (_, rs) =>
      val t = rs.filter(_._3 == 1); val c = rs.filter(_._3 == 0)
      if (t.nonEmpty && c.nonEmpty) {
        matched += 1
        val mt = math.floor(t.map(_._4).sum.toDouble / t.length / 100.0
          * 1000000 + 0.5).toLong
        val mc = math.floor(c.map(_._4).sum.toDouble / c.length / 100.0
          * 1000000 + 0.5).toLong
        wSum += t.length; wd += t.length * (mt - mc)
      }
    }
    val att = math.floor(wd.toDouble / wSum + 0.5) / 1000000.0
    val row = SparkEntry.queries("q459_cem_att")(spark, sf).collect()(0)
    assert(row.getLong(0) == byCell.size.toLong)
    assert(row.getLong(1) == matched.toLong)
    assert(math.abs(row.getDouble(4) - att) < 1e-9)
  }

  test("q460 permutation p-value is well-formed and counts extremes") {
    val row = SparkEntry.queries("q460_permutation_test")(spark, sf)
      .collect()(0)
    val nExtreme = row.getLong(3)
    val p = row.getDouble(4)
    assert(nExtreme >= 0 && nExtreme <= 64)
    assert(p > 0.0 && p <= 1.0)
    assert(math.abs(p - math.floor((nExtreme + 1).toDouble / 65.0
      * 1000000 + 0.5) / 1000000.0) < 1e-12)
  }

  test("q468 CMH odds ratio matches a brute stratum fold") {
    val rows = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").cast("long"),
        (col("l_discount") >= 0.05).cast("int"),
        (col("l_returnflag") === "R").cast("int"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    var num6 = 0L; var den6 = 0L; var sumA = 0L
    rows.groupBy(_._1).values.foreach { g =>
      val a = g.count(x => x._2 == 1 && x._3 == 1).toLong
      val b = g.count(x => x._2 == 1 && x._3 == 0).toLong
      val c = g.count(x => x._2 == 0 && x._3 == 1).toLong
      val d = g.count(x => x._2 == 0 && x._3 == 0).toLong
      val n = a + b + c + d
      sumA += a
      num6 += math.floor((a * d).toDouble / n * 1000000 + 0.5).toLong
      den6 += math.floor((b * c).toDouble / n * 1000000 + 0.5).toLong
    }
    val or = math.floor(num6.toDouble / den6 * 1000000 + 0.5) / 1000000.0
    val row = SparkEntry.queries("q468_cmh_odds")(spark, sf).collect()(0)
    assert(row.getLong(0) == rows.map(_._1).distinct.length.toLong)
    assert(row.getLong(1) == sumA)
    assert(math.abs(row.getDouble(3) - or) < 1e-9)
    assert(row.getDouble(4) >= 0.0)
  }

  test("q469 listagg equals sorted distinct concatenation") {
    val expect = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_mktsegment"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (k, v) =>
        k -> v.map(_._2).distinct.sorted.mkString(",") }
    val got = SparkEntry.queries("q469_listagg")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == expect)
  }

  test("q472 Shapley matches brute enumeration and the efficiency axiom") {
    val users = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).toSeq.map { case (_, es) =>
        val ts = es.map(_._2).toSet
        val mask = (if (ts("click")) 1 else 0) + (if (ts("view")) 2 else 0) +
          (if (ts("signup")) 4 else 0) + (if (ts("error")) 8 else 0)
        (mask, ts("purchase"))
      }
    def v(s: Int): Long =
      users.count { case (m, c) => c && (m & s) == m }.toLong
    val w = Array(6L, 2L, 2L, 6L)
    val expect = Seq("click" -> 1, "view" -> 2, "signup" -> 4,
      "error" -> 8).map { case (name, bit) =>
      val phi24 = (0 until 16).filter(s => (s & bit) == 0).map { s =>
        w(Integer.bitCount(s)) * (v(s | bit) - v(s))
      }.sum
      name -> phi24
    }.toMap
    val got = SparkEntry.queries("q472_shapley_attribution")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // efficiency: credits sum to the grand-coalition lift (x24)
    assert(got.values.sum == 24L * (v(15) - v(0)))
  }

  test("q478 Markov attribution is well-formed and shares sum to one") {
    val rows = SparkEntry.queries("q478_markov_attribution")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.length == 4)
    val pFull = rows.head._2
    assert(pFull > 0.0 && pFull <= 1.0)
    rows.foreach { case (_, pf, pr, eff, _) =>
      assert(pf == pFull)
      assert(pr >= 0.0 && pr <= 1.0)
      // removal never helps in an absorbing chain toward 'purchase'
      assert(pr <= pf + 1e-9)
      assert(eff >= -1e-9 && eff <= 1.0 + 1e-9)
    }
    val shareSum = rows.map(_._5).sum
    assert(math.abs(shareSum - 1.0) < 4e-6, s"shares sum to $shareSum")
  }

  test("q461 Wilcoxon rank sums conserve n(n+1)") {
    val row = SparkEntry.queries("q461_wilcoxon_signed")(spark, sf)
      .collect()(0)
    val nz = row.getLong(1)
    assert(row.getLong(0) >= nz)
    // sum of 2x-scaled signed ranks is n(n+1) regardless of ties
    assert(row.getLong(2) + row.getLong(3) == nz * (nz + 1))
  }
}
