package graft

import org.apache.spark.sql.functions._

/** Semantics checks for wave 16 (q450–q451): Viterbi segmentation and
  * randomized-response debiasing. */
class Wave16Spec extends SparkSuite {

  test("viterbiSegment: a dominant whole-word piece wins over any split") {
    import spark.implicits._
    // "abcd" dominates the corpus, so the 4-char piece is cheap enough
    // that splitting it can never beat the single-piece path; "zq" never
    // makes the vocabulary (everything else outranks it) so it pays two
    // unk singles... unless its singles sneak into the top pieces — use a
    // tiny vocab that the dominant word's substrings fill completely.
    val docs = (Seq.fill(50)("abcd") ++ Seq.fill(30)("ab") ++
        Seq.fill(5)("zq")).map(Tuple1(_)).toDF("text")
    val out = graft.operators.TextOps.viterbiSegment(
        docs, "text", vocabSize = 6, maxLen = 12, maxPiece = 4)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // len 4 = {abcd}: one piece exactly
    assert(out(4) == ((1L, 50L, 1.0)))
    // len 2 = {ab, zq}: ab is a vocab piece (1 piece); zq is not and no
    // single-char of z/q can outrank the abcd-family pieces in a top-6
    // vocab, so zq = 2 unk singles; weighted mean = (30·1 + 5·2)/35
    assert(out(2)._1 == 2L && out(2)._2 == 35L)
    assert(math.abs(out(2)._3 - (30.0 + 10.0) / 35.0) < 1e-6)
  }

  test("randomized response: gate equals the brute md5 reconstruction") {
    val evs = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    def nib(prefix: String, id: Long): Int = Integer.parseInt(
      org.apache.commons.codec.digest.DigestUtils
        .md5Hex(s"$prefix$id").substring(0, 1), 16)
    val brute = evs.groupBy(_._2 % 8).map { case (c, es) =>
      val n = es.length
      val t = es.count(_._3 == "purchase")
      val rep = es.count { case (id, _, ty) =>
        if (nib("rr1:", id) % 2 == 0) ty == "purchase"
        else nib("rr2:", id) % 2 == 1
      }
      c.toInt -> ((n.toLong, t.toLong, rep.toLong))
    }
    val got = SparkEntry.queries("q451_randomized_response")(spark, sf)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    assert(got.keySet == brute.keySet)
    brute.foreach { case (c, (n, t, rep)) =>
      val (gn, gt, gdeb) = got(c)
      assert(gn == n && gt == t)
      val deb = math.floor((2.0 * (rep.toDouble / n) - 0.5) * 1e6 + 0.5) / 1e6
      assert(math.abs(gdeb - deb) < 1e-12)
    }
  }
}
