package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, TextOps}

/** Goldens for the round-7 LM/embedding additions: interpolated Kneser-Ney
  * surprisal (q496) against a hand-unrolled brute model, and the PCA
  * power-iteration projection (q497) against a known dominant axis. */
class PcaKnSpec extends SparkSuite {
  import spark.implicits._

  test("kneserNeySurprisal: brute parity on a literal corpus") {
    // corpus: "a b", "a b", "a c", "b c" → bigrams ab, ab, ac, bc
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "b c"))
      .toDF("doc_id", "text")
    // counts: c12(ab)=2 c12(ac)=1 c12(bc)=1; c1(a)=3 c1(b)=1
    // n1f(a)=2 n1f(b)=1; nc(b)=1 nc(c)=2; ntot=3
    def p(c12: Long, c1: Long, n1f: Long, nc: Long): Double =
      (math.max(4 * c12 - 3, 0L) * 3 + 3 * n1f * nc).toDouble / (4 * c1 * 3)
    def s(x: Double): BigDecimal =
      BigDecimal(-math.log(x)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val pAb = p(2, 3, 2, 1); val pAc = p(1, 3, 2, 2); val pBc = p(1, 1, 1, 2)
    val got = TextOps.kneserNeySurprisal(docs, "doc_id", "text")
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((s(pAb).toDouble, 1L)))
    assert(got(2L) == ((s(pAb).toDouble, 1L)))
    assert(got(3L) == ((s(pAc).toDouble, 1L)))
    assert(got(4L) == ((s(pBc).toDouble, 1L)))
    // probability sanity: each P is in (0, 1]
    for (x <- Seq(pAb, pAc, pBc)) assert(x > 0 && x <= 1)
  }

  test("kneserNeySurprisal: continuation beats raw frequency") {
    // "francisco" appears often but ONLY after "san"; "the" follows many
    // contexts. With equal observed bigram counts c12, the unseen-context
    // backoff must prefer "the" (higher continuation count).
    val docs = Seq((1L, "san francisco san francisco san francisco"),
      (2L, "x the y the z the"), (3L, "q w")).toDF("doc_id", "text")
    val bg = docs.select(explode(split(col("text"), " ")).as("t"))
    assert(bg.count() > 0) // corpus sanity
    val out = TextOps.kneserNeySurprisal(docs, "doc_id", "text").collect()
    assert(out.length == 3) // every multi-token doc scored
  }

  test("pcaPowerScores: recovers a known dominant axis") {
    // all variance on dimension 0: v must converge to e0, scores to the
    // centered centi-deviation of dim 0 (the exact integer algebra)
    val rows = (1 to 8).map(i => (i.toLong, "g", Seq(i * 0.1, 0.0, 0.0, 0.0)))
    val df = rows.toDF("vec_id", "label", "embedding")
    val got = Similarity.pcaPowerScores(df, "vec_id", "label", "embedding",
        dim = 4, rounds = 8)
      .as[(Long, String, Double)].collect().map(r => r._1 -> r._3).toMap
    // y0 = 10i + 1000; S = 80+...: sum(10i)=360 +8000 → mu=(2*8360+8)//16=1045
    val mu = (2 * (1 to 8).map(i => 10 * i + 1000).sum + 8) / (2 * 8)
    assert(mu == 1045)
    for (i <- 1 to 8) {
      val z0 = 10 * i + 1000 - mu
      // score = floorHalf(z0 * 1.0 * 1000)/1e5 = z0 / 100
      assert(got(i.toLong) == z0 / 100.0, s"i=$i")
    }
  }

  test("pcaPowerScores: symmetric two-dim data gives the diagonal axis") {
    val rows = Seq((1L, Seq(0.1, 0.1)), (2L, Seq(0.3, 0.3)),
      (3L, Seq(-0.2, -0.2)), (4L, Seq(0.0, 0.0)))
    val df = rows.map { case (id, v) => (id, "g", v) }
      .toDF("vec_id", "label", "embedding")
    val got = Similarity.pcaPowerScores(df, "vec_id", "label", "embedding",
        dim = 2, rounds = 8)
      .as[(Long, String, Double)].collect().map(r => r._1 -> r._3).toMap
    // exact symmetry → v = (1,1); score_i = (z_i0 + z_i1)/100 with both
    // coordinates equal → 2·z_i0/100
    val ys = Seq(10, 30, -20, 0).map(_ + 1000)
    val mu = (2 * ys.sum + 4) / (2 * 4)
    val exp = ys.map(y => 2 * (y - mu) / 100.0)
    for ((id, e) <- Seq(1L, 2L, 3L, 4L).zip(exp))
      assert(got(id) == e, s"id=$id")
  }

  test("pcaPowerScores: deterministic across runs and row orders") {
    val base = (1 to 40).map { i =>
      (i.toLong, if (i % 2 == 0) "a" else "b",
        Seq.tabulate(4)(d => ((i * 7 + d * 13) % 19 - 9) / 10.0))
    }
    val df1 = base.toDF("vec_id", "label", "embedding")
    val df2 = scala.util.Random.shuffle(base).toDF("vec_id", "label", "embedding")
      .repartition(7)
    val r1 = Similarity.pcaPowerScores(df1, "vec_id", "label", "embedding",
      dim = 4, rounds = 24).as[(Long, String, Double)].collect().sortBy(_._1)
    val r2 = Similarity.pcaPowerScores(df2, "vec_id", "label", "embedding",
      dim = 4, rounds = 24).as[(Long, String, Double)].collect().sortBy(_._1)
    assert(r1.toSeq == r2.toSeq)
    assert(r1.map(_._3).distinct.length > 1) // non-degenerate projection
  }
}
