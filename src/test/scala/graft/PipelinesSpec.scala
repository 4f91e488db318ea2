package graft

import org.apache.spark.sql.functions._
import graft.operators.Pipelines

/** End-to-end corpus-preparation composition: every stage's effect must be
  * observable in the final frame on a fixture crafted to trigger each one. */
class PipelinesSpec extends SparkSuite {
  import spark.implicits._

  test("pretrainCorpus: band, scrub-aware dedup, decontamination, stable splits") {
    val mid = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, "tiny"),                                        // 1 token -> below p05
      (2L, (1 to 50).map(i => s"w$i").mkString(" ")),      // 50 tokens -> above p95
      (3L, s"$mid contact a@b.com"),                       // dup pair after scrub...
      (4L, s"$mid contact c@d.net"),                       // ...only the min id stays
      (5L, "november oscar papa quebec romeo sierra"),
      (6L, "zulu yankee xray mike lima kilo"),             // shares 3-gram with benchmark
      (7L, "uniform victor whiskey tango golf hotel"),
      (8L, "one two three four five six"),
      (9L, "seven eight nine ten eleven twelve"),
      (10L, "thirteen fourteen fifteen sixteen seventeen eighteen"),
      (11L, "nineteen twenty twentyone twentytwo twentythree twentyfour"),
      (12L, "red green blue cyan magenta yellow")
    ).toDF("doc_id", "text")
    val benchmark = Seq("the eval set says zulu yankee xray here").toDF("text")

    val out = Pipelines.pretrainCorpus(docs, "doc_id", "text", benchmark, "text")
    val rows = out.select("doc_id", "n_tokens", "clean_text", "split")
      .as[(Long, Long, String, String)].collect()
    val byId = rows.map(r => r._1 -> r).toMap

    // band: 1 (too short) and 2 (too long) gone
    assert(!byId.contains(1L) && !byId.contains(2L))
    // scrub-aware dedup: 3 and 4 collapse to min id 3, with the email scrubbed
    assert(byId.contains(3L) && !byId.contains(4L))
    assert(byId(3L)._3 == s"$mid contact <EMAIL>")
    // decontamination: 6 shares "zulu yankee xray" with the benchmark
    assert(!byId.contains(6L))
    // everything else survives with its token count and a valid split
    assert(byId.keySet == Set(3L, 5L, 7L, 8L, 9L, 10L, 11L, 12L))
    // n_tokens is the PRE-scrub count: doc 3 has 8 ("… contact a@b.com")
    assert(byId(3L)._2 == 8L)
    assert(rows.filter(_._1 != 3L).forall(_._2 == 6L))
    assert(rows.forall(r => Set("train", "val", "test").contains(r._4)))
    // split stability: rerun assigns identical splits
    val again = Pipelines.pretrainCorpus(docs, "doc_id", "text", benchmark, "text")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(rows.map(r => r._1 -> r._4).toMap == again)
  }

  test("packSequences: md5 pack order, contiguous offsets, div sequence bounds") {
    val docs = Seq(
      (1L, "a b c"),          // 3 tokens
      (2L, "d e f g h"),      // 5
      (3L, ""),               // 0 -> dropped
      (4L, "i j k l m n o"),  // 7
      (5L, "p q"),            // 2
      (6L, "r s t u")         // 4
    ).toDF("doc_id", "text")
    val got = Pipelines.packSequences(docs, "doc_id", "text", budget = 5)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._3)

    // the reference model: docs ordered by (md5(id), id), exclusive prefix sum
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) =
      md5.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val lens = Map(1L -> 3L, 2L -> 5L, 4L -> 7L, 5L -> 2L, 6L -> 4L)
    val order = lens.keys.toSeq.sortBy(id => (hex(id.toString), id))
    val offsets = order.scanLeft(0L)((acc, id) => acc + lens(id)).init
    val expect = order.zip(offsets).map { case (id, off) =>
      (id, lens(id), off, off / 5, (off + lens(id) - 1) / 5)
    }
    assert(got.toSeq == expect)
    // contiguity: the packed stream has no gaps and no overlaps
    got.sliding(2).foreach { case Array(a, b) => assert(a._3 + a._2 == b._3) }
  }

  test("mergeAggStates: merge of partial states == state of the union") {
    val a = Seq(("k1", 1.0), ("k1", 2.0), ("k2", 5.0)).toDF("k", "v")
    val b = Seq(("k1", 10.0), ("k3", 7.0)).toDF("k", "v")
    val merged = Pipelines.finishAggState(Pipelines.mergeAggStates(
      Pipelines.aggState(a, "k", "v"), Pipelines.aggState(b, "k", "v")))
    val full = Pipelines.finishAggState(
      Pipelines.aggState(a.unionByName(b), "k", "v"))
    val m = merged.as[(String, Long, Double, Double, Double)].collect().toSet
    assert(m == full.as[(String, Long, Double, Double, Double)].collect().toSet)
    assert(m == Set(("k1", 3L, 13.0, 1.0, 10.0), ("k2", 1L, 5.0, 5.0, 5.0),
      ("k3", 1L, 7.0, 7.0, 7.0)))
  }

  test("applyCdc: D kills, latest I/U replaces, untouched rows carry") {
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    val snap = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
      .toDF("key", "value")
    val log = Seq(
      (1L, ts(1), 99.0, 100L, "U"),  // stale update...
      (1L, ts(2), 11.0, 101L, "U"),  // ...latest wins
      (2L, ts(1), 0.0, 102L, "D"),   // delete key 2
      (5L, ts(1), 50.0, 103L, "I")   // insert new key 5
    ).toDF("key", "ts", "value", "event_id", "op")
    val got = graft.operators.Joins.applyCdc(snap, log, "key", "value",
      col("ts"), col("event_id"))
      .as[(Long, Double, String)].collect().toSet
    assert(got == Set((1L, 11.0, "cdc"), (3L, 30.0, "base"),
      (4L, 40.0, "base"), (5L, 50.0, "cdc")))
  }

  test("preferencePairs: best/worst tie rules, singleton groups dropped") {
    val docs = Seq(
      ("a", 1L, 10L), ("a", 2L, 30L), ("a", 3L, 30L), // best: score 30 id 2
      ("a", 4L, 10L),                                  // worst: score 10 id 1
      ("b", 9L, 5L)                                    // singleton -> dropped
    ).toDF("g", "id", "sc")
    val got = graft.operators.Pipelines.preferencePairs(
        docs, Seq("g"), "id", col("sc"))
      .select("g", "n_docs", "chosen_id", "rejected_id")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 4L, 2L, 1L)), s"got $got")
  }

  test("maskSpans: adjacent masked indices merge, spans partition the mask set") {
    val docs = Seq((1L, Seq.fill(200)("w").mkString(" "))).toDF("id", "text")
    val spans = graft.operators.Pipelines.maskSpans(docs, "id", "text", 15)
      .as[(Long, Int, Long)].collect().sortBy(_._2)
    // spans are disjoint, ordered, non-adjacent (else they'd have merged)
    spans.sliding(2).foreach {
      case Array(a, b) => assert(a._2 + a._3 < b._2, s"$a and $b overlap/adjacent")
      case _ =>
    }
    // total masked tokens ~ 15% of 200 (exact count = md5-deterministic,
    // just sanity-band it) and every span has positive length
    val totalMasked = spans.map(_._3).sum
    assert(totalMasked > 10 && totalMasked < 80, s"masked $totalMasked")
    assert(spans.forall(_._3 >= 1))
    // deterministic: second run identical
    val again = graft.operators.Pipelines.maskSpans(docs, "id", "text", 15)
      .as[(Long, Int, Long)].collect().sortBy(_._2)
    assert(again.toSeq == spans.toSeq)
  }
}
