package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** SURVEY §2.12 — retrieval-side operators: BM25 ranking against a
  * hand-computed reference, inverted-index/BM25 consistency, and the maxDf
  * stop-term guard. */
class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  lazy val docs = Seq(
    (1L, "a a b"),
    (2L, "b c"),
    (3L, "c d")
  ).toDF("doc_id", "text")

  /** Reference BM25 (Lucene idf), mirroring the operator's documented
    * formula — validates the distributed plumbing end-to-end. */
  private def refScore(tf: Long, df: Long, dl: Long, n: Long, avgdl: Double,
                       k1: Double = 1.2, b: Double = 0.75): Double = {
    val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    val raw = idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
    BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble // 6-dp HALF_UP, as round() does
  }

  test("bm25TopK matches the hand-computed score on a tiny corpus") {
    val qs = Seq((10L, "a")).toDF("query_id", "query_text")
    val out = TextOps.bm25TopK(docs, "doc_id", "text", qs, "query_id", "query_text", k = 5)
      .select("query_id", "doc_id", "score", "rank")
      .as[(Long, Long, Double, Long)].collect()
    // 'a' appears only in doc 1 (tf=2, dl=3); corpus: n=3, avgdl=(3+2+2)/3
    assert(out.length == 1)
    val (qid, did, score, rank) = out.head
    assert(qid == 10L && did == 1L && rank == 1L)
    val expected = refScore(tf = 2, df = 1, dl = 3, n = 3, avgdl = 7.0 / 3.0)
    assert(math.abs(score - expected) < 1e-9, s"got $score expected $expected")
  }

  test("bm25TopK sums per-term scores and ranks rarer-match docs first") {
    val qs = Seq((1L, "b c")).toDF("query_id", "query_text")
    val out = TextOps.bm25TopK(docs, "doc_id", "text", qs, "query_id", "query_text", k = 5)
      .orderBy("rank").select("doc_id", "score").as[(Long, Double)].collect()
    // doc 2 matches both terms, docs 1 and 3 match one each → doc 2 first
    assert(out.map(_._1).head == 2L)
    assert(out.length == 3)
    val avgdl = 7.0 / 3.0
    val d2 = refScore(1, 2, 2, 3, avgdl) + refScore(1, 2, 2, 3, avgdl)
    assert(math.abs(out.head._2 - d2) < 1e-9)
    // scores strictly ordered, positive
    assert(out.map(_._2).toSeq == out.map(_._2).sortBy(-_).toSeq)
    assert(out.forall(_._2 > 0))
  }

  test("bm25TopK maxDf drops stop terms from the query side") {
    // df: a=1, b=2, c=2 → maxDf=1 drops b and c; 'a' is the only live term
    val qs = Seq((1L, "a b c")).toDF("query_id", "query_text")
    val out = TextOps.bm25TopK(docs, "doc_id", "text", qs, "query_id", "query_text",
        k = 5, maxDf = 1L)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L)) // only the 'a' posting survives
  }

  test("bm25TopK honors k and ties break by doc_id") {
    val many = (1L to 20L).map(i => (i, "x y")).toDF("doc_id", "text")
    val qs = Seq((1L, "x")).toDF("query_id", "query_text")
    val out = TextOps.bm25TopK(many, "doc_id", "text", qs, "query_id", "query_text", k = 7)
      .orderBy("rank").select("doc_id").as[Long].collect()
    assert(out.toSeq == (1L to 7L)) // identical scores → doc_id ascending
  }

  test("invertedIndex df agrees with bm25's document frequency on the fixture") {
    val d = Tables.documents(spark, sf).limit(100)
    val idx = TextOps.invertedIndex(d, "doc_id", "text", shardSize = 1000000L)
      .groupBy("term").agg(sum("df").as("df_idx"))
    val tf = d.select(col("doc_id"), explode(array_distinct(TextOps.tokens(col("text")))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("df_tf"))
    val disagree = idx.join(tf, Seq("term"), "full_outer")
      .filter(col("df_idx").isNull || col("df_tf").isNull || col("df_idx") =!= col("df_tf"))
    assert(disagree.count() == 0)
  }

  test("heavyHitters: two-pass MG top-n equals exact top-n when the guarantee holds") {
    // zipf-ish stream: item r appears ~6000/r^2 times over ~180 distinct
    // items; k=24 makes the sketch genuinely lossy, and the top-5 counts
    // clear the N/(k+1) retention threshold with margin
    val rows = (1 to 180).flatMap(r => Seq.fill(6000 / (r * r) + 1)(s"i$r"))
    val df = rows.toDF("item").repartition(13) // merge order varies per run
    val total = rows.size
    val exact = rows.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      .toSeq.sortBy { case (k, c) => (-c, k) }.take(5)
    assert(exact.head._2 * 1.0 > total / 25.0) // fixture sanity: guarantee applies
    val got = TextOps.heavyHitters(df, col("item"), n = 5, k = 24)
      .as[(String, Long)].collect().toSeq
    assert(got == exact, s"got $got expected $exact")
    // distinct items exceed k, so pass 1 really was a lossy sketch
    assert(rows.distinct.size > 24)
  }

  test("rrfFuse: hand-computed fusion, cross-list boost, deterministic ties") {
    // query 1: lexical ranks d10=1, d20=2; vector ranks d20=1, d30=2
    val lex = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("query_id", "doc_id", "rank")
    val vec = Seq((1L, 20L, 1L), (1L, 30L, 2L)).toDF("query_id", "doc_id", "rank")
    val got = TextOps.rrfFuse(Seq(lex, vec), "query_id", "doc_id", k = 3)
      .as[(Long, Long, Double, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5))).toMap
    def t(r: Long): BigDecimal =
      BigDecimal(java.math.BigDecimal.valueOf(1.0 / (60.0 + r)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // d20 appears in BOTH lists (ranks 2 and 1) and must fuse first
    assert(got(20L) == (((t(2) + t(1)).toDouble, 2L, 1L)), s"${got(20L)}")
    assert(got(10L) == ((t(1).toDouble, 1L, 2L)))
    assert(got(30L) == ((t(2).toDouble, 1L, 3L)))
  }

  test("bigramSurprisal: hand-computed add-k conditional surprisal") {
    // corpus: "a b a b" and "a c"; bigrams: (a,b)x2, (b,a)x1, (a,c)x1
    // c1: a->3, b->1; V = |{b, a, c}| = 3; k = 0.5
    val df = Seq((1L, "a b a b"), (2L, "a c"), (3L, "solo")).toDF("doc_id", "text")
    val got = TextOps.bigramSurprisal(df, "doc_id", "text")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def s(c12: Long, c1: Long): BigDecimal = {
      val raw = -math.log((c12 + 0.5) / (c1 + 0.5 * 3))
      BigDecimal(java.math.BigDecimal.valueOf(raw))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    // doc 1: bigrams (a,b),(b,a),(a,b) -> s(2,3), s(1,1), s(2,3)
    val m1 = ((s(2, 3) + s(1, 1) + s(2, 3)).toDouble / 3, 3L)
    // doc 2: (a,c) -> s(1,3)
    val m2 = (s(1, 3).toDouble / 1, 1L)
    assert(math.abs(got(1L)._1 - m1._1) < 1e-12 && got(1L)._2 == 3L, s"${got(1L)} vs $m1")
    assert(math.abs(got(2L)._1 - m2._1) < 1e-12 && got(2L)._2 == 1L)
    // single-token doc has no bigrams and is absent
    assert(!got.contains(3L))
  }

  test("MisraGriesAgg: retention guarantee and merge bound on adversarial input") {
    val agg = new TextOps.MisraGriesAgg(4)
    // uniform-ish stream where nothing is frequent: buffer stays <= k
    val uni = (1 to 200).map(i => s"u${i % 40}")
    val bufU = uni.foldLeft(agg.zero)(agg.reduce)
    assert(bufU.size <= 4)
    // heavy item keeps a positive counter through reduce AND split merges
    val heavy = Seq.fill(120)("hot") ++ (1 to 90).map(i => s"cold$i")
    val (h1, h2) = heavy.splitAt(97)
    // interleave shuffle-deterministically so both halves see both kinds
    val merged = agg.merge(
      h1.foldLeft(agg.zero)(agg.reduce), h2.foldLeft(agg.zero)(agg.reduce))
    assert(merged.size <= 4)
    assert(merged.contains("hot"), s"count 120 > 210/5 must survive: $merged")
  }
}
