package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analyses, Graph}

/** Brute-force cross-checks for the round-6 operators on pseudo-random
  * fixtures (deterministic multiplicative-hash "randomness" — no RNG
  * state, reproducible run-to-run): each distributed formulation must
  * equal the obvious sequential reference computation. */
class Round6PropertySpec extends SparkSuite {
  import spark.implicits._

  private def prand(i: Long, salt: Long): Double =
    ((i * 2654435761L + salt * 40503L) % 1000L).toDouble / 1000.0

  test("spearmanRho equals brute Pearson-of-midranks on tied data") {
    // values quantized to one decimal → plenty of ties in both variables
    val n = 200
    val xs = (1 to n).map(i => math.floor(prand(i, 1) * 10) / 10.0)
    val ys = (1 to n).map(i => math.floor(prand(i, 2) * 10) / 10.0)
    val df = xs.zip(ys).map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val got = Analyses.spearmanRho(df, "g", col("x"), col("y"))
      .select("rho").as[Double].head()
    def midranks(v: Seq[Double]): Seq[Double] = {
      val sorted = v.sorted
      val first = sorted.zipWithIndex.groupBy(_._1)
        .map { case (k, g) => k -> (g.map(_._2).min + g.map(_._2).max + 2) / 2.0 }
      v.map(first)
    }
    val rx = midranks(xs); val ry = midranks(ys)
    val mx = rx.sum / n; val my = ry.sum / n
    val cov = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
    val vx = rx.map(a => (a - mx) * (a - mx)).sum
    val vy = ry.map(b => (b - my) * (b - my)).sum
    val want = cov / math.sqrt(vx * vy)
    assert(math.abs(got - want) < 1e-5, s"got $got want $want")
  }

  test("mannWhitneyU's U statistic equals the brute pairwise count") {
    // U_B = #{(a,b): v_b > v_a} + ties/2 — count it directly
    val n = 120
    val rows = (1 to n).map { i =>
      val arm = i % 3 == 0
      val v = math.floor(prand(i, 7) * 20) / 20.0 + (if (arm) 0.1 else 0.0)
      ("g", if (arm) 1L else 0L, v)
    }
    val df = rows.toDF("g", "arm", "v")
    val got = Analyses.mannWhitneyU(df, "g", col("arm") === 1, col("v"))
      .select("u_b").as[Double].head()
    val as = rows.filter(_._2 == 0L).map(_._3)
    val bs = rows.filter(_._2 == 1L).map(_._3)
    val want = (for (a <- as; b <- bs) yield {
      if (b > a) 1.0 else if (b == a) 0.5 else 0.0
    }).sum
    assert(got == want, s"got $got want $want")
  }

  test("kCorePeel equals the brute sequential peel to fixpoint") {
    // pseudo-random sparse graph on 40 nodes; rounds=12 >> diameter so the
    // fixed-round peel reaches the true 3-core
    val und = (1 to 120).map { i =>
      val a = (i * 2654435761L % 40L).toInt
      val b = ((i * 40503L + 17L) % 40L).toInt
      (s"n$a", s"n$b")
    }.filter { case (a, b) => a != b }.distinct
    val edges = und.toDF("src", "dst")
      .unionByName(und.map(_.swap).toDF("src", "dst")).distinct()
    val got = Graph.kCorePeel(edges, k = 3, rounds = 12)
      .as[(String, Long)].collect().toMap
    // brute: iterate removal until stable
    var adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }.distinct
      .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
    var changed = true
    while (changed) {
      val dead = adj.collect { case (v, ns) if ns.size < 3 => v }.toSet
      changed = dead.nonEmpty
      adj = adj.collect { case (v, ns) if !dead(v) =>
        v -> (ns -- dead) }
    }
    val want = adj.map { case (v, ns) => v -> ns.size.toLong }
    assert(got == want, s"got ${got.size} nodes, want ${want.size}")
  }

  test("giniStump finds the brute-force minimum-impurity threshold") {
    val n = 150
    val rows = (1 to n).map { i =>
      val x = math.floor(prand(i, 3) * 8) // 8 candidate values
      val y = if (prand(i, 4) < 0.2 + 0.08 * x) 1 else 0
      (x, y)
    }
    val df = rows.toDF("x", "y")
    val (gotThresh, gotGini) = Analyses.giniStump(
      df, Seq("x" -> col("x")), col("y"))
      .select("threshold", "gini").as[(Double, Double)].head()
    def gini(split: Double): Double = {
      val (l, r) = rows.partition(_._1 <= split)
      def g(part: Seq[(Double, Int)]): Double = {
        if (part.isEmpty) return 0.0
        val a = part.count(_._2 == 1).toDouble
        val b = part.size - a
        part.size - (a * a + b * b) / part.size
      }
      (g(l) + g(r)) / n
    }
    val cands = rows.map(_._1).distinct.sorted.dropRight(1)
    val want = cands.map(c => (BigDecimal(gini(c)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble, c)).min
    assert(gotGini == want._1 && gotThresh == want._2,
      s"got ($gotThresh, $gotGini) want (${want._2}, ${want._1})")
  }

  test("hits: authority scores rank supplier popularity on a star graph") {
    // hub-side: 10 buyers all buy from s1, half also from s2, one from s3
    val edges = ((1 to 10).map(i => (s"c$i", "s1")) ++
      (1 to 5).map(i => (s"c$i", "s2")) ++ Seq(("c1", "s3")))
      .toDF("src", "dst")
    val out = Graph.hits(edges, iters = 3)
      .filter(col("kind") === "authority")
      .as[(String, String, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(out("s1") == 1.0) // max-normalized top authority
    assert(out("s1") > out("s2") && out("s2") > out("s3"))
  }

  test("kmvIntersectAudit: estimate tracks a large planted overlap") {
    import graft.operators.Sketches
    // |A| = |B| = 1500, |A∩B| = 500 — both well past k = 128, so the
    // estimate comes from the bottom-k union trick, not exact storage;
    // k = 128 gives ~9% relative sigma, assert a generous 35% band
    val df = (Seq.tabulate(1500)(i => ("A", i)) ++
      Seq.tabulate(1500)(i => ("B", i + 1000))).toDF("s", "m")
    val (exact, est) = Sketches.kmvIntersectAudit(df, col("s"), col("m"),
      k = 128).select("exact_intersection", "est_intersection")
      .as[(Long, Double)].head()
    assert(exact == 500L)
    assert(est > 500 * 0.65 && est < 500 * 1.35, s"est $est")
  }

  test("countMinAudit: per-key overestimate bounded by the CM guarantee") {
    import graft.operators.Sketches
    // n = 2000 occurrences over 400 keys, width 64: E[overestimate] ≤
    // n/w ≈ 31 per lane; the min over 2 lanes stays well under 6·n/w
    val df = (1 to 2000).map(i => s"k${i % 400}").toDF("k")
    val out = Sketches.countMinAudit(df, col("k"), depth = 2, width = 64,
      topN = 400).as[(String, Long, Long, Long)].collect()
    assert(out.forall { case (_, exact, est, over) =>
      est >= exact && over <= 6 * 2000 / 64 })
  }

  test("luhn check digit: generator-validator round trip") {
    import graft.functions.Scalars
    // brute-force the valid check digit for pseudo-random 10-digit
    // payloads, then the validator must accept exactly that digit
    def luhnSum(digits: Seq[Int]): Int =
      digits.reverse.zipWithIndex.map { case (d, i) =>
        if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum
    val payloads = (1 to 20).map(i =>
      f"${(i * 2654435761L % 10000000000L)}%010d")
    val rows = payloads.flatMap { p =>
      (0 to 9).map { cd =>
        val num = p + cd
        val valid = luhnSum(num.map(_ - '0')) % 10 == 0
        (num, valid)
      }
    }
    val df = rows.toDF("num", "want")
    val bad = df.withColumn("got", Scalars.luhnValid(col("num"), 11))
      .filter(col("got") =!= col("want")).count()
    assert(bad == 0L)
  }
}
