package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextOps}

/** SURVEY §2.12 — dedup/text operators: crafted docs with known relations. */
class TextDedupSpec extends SparkSuite {
  import spark.implicits._

  lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank now"), // near-dup of 1
    (3L, "completely different content about spark query engines and shuffles here"),
    (4L, "The  Quick Brown fox jumps over the lazy dog near the river bank today"), // case/space variant of 1
    (5L, "the quick brown fox jumps over the lazy dog near the river bank today")  // exact dup of 1
  ).toDF("doc_id", "text")

  test("fingerprint: exact dup and case/whitespace variant collapse together") {
    val fps = docs.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .as[(Long, String)].collect().toMap
    assert(fps(1L) == fps(5L))
    assert(fps(1L) == fps(4L)) // normalized
    assert(fps(1L) != fps(3L))
  }

  test("exactDedup keeps lowest id per text") {
    val out = Dedup.exactDedup(docs, "doc_id", col("text"))
      .filter(col("n_dups") > 1).select("keep_id", "n_dups").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 2L)))
  }

  test("jaccardPairs finds the near-dup pair above threshold, not unrelated docs") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 5L)) && pairs.contains((2L, 5L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash candidates are a superset of high-jaccard pairs on fixture docs") {
    val d = Tables.documents(spark, sf)
    val trueDups = Dedup.jaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val cand = Dedup.minhashCandidates(d, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(trueDups.nonEmpty)
    val recall = trueDups.count(cand.contains).toDouble / trueDups.size
    assert(recall >= 0.9, s"LSH recall $recall over ${trueDups.size} true pairs")
  }

  test("MLlib MinHashLSH variant recovers the exact high-jaccard pairs") {
    val d = Tables.documents(spark, sf)
    val exact = Dedup.jaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val ml = Dedup.mlMinhashPairs(d, "doc_id", "text", shingleN = 3, minJaccard = 0.6)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val recall = exact.count(ml.contains).toDouble / exact.size
    assert(recall >= 0.9, s"MLlib LSH recall $recall over ${exact.size} exact pairs")
  }

  test("simhash: near-dups land within small hamming distance, unrelated far") {
    val sh = docs.select(col("doc_id"), Dedup.simhash32(TextOps.tokens(col("text"))).as("h"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(5L)) == 0)
    assert(ham(sh(1L), sh(2L)) <= 8)
    assert(ham(sh(1L), sh(3L)) > 8)
  }

  test("simhashPairs == brute-force hamming pairs (pigeonhole exactness)") {
    val docs = Tables.documents(spark, sf).limit(150)
    val got = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3, nBands = 4)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect().toSet
    val hashes = docs.select(col("doc_id"),
        Dedup.simhash32(TextOps.tokens(col("text"))).as("sh"))
      .as[(Long, Long)].collect()
    val want = (for {
      (i, si) <- hashes; (j, sj) <- hashes if i < j
      h = java.lang.Long.bitCount(si ^ sj) if h <= 3
    } yield (i, j, h)).toSet
    assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(want.nonEmpty, "fixture should contain close simhash pairs")
  }

  test("langId picks the profile language deterministically") {
    val d = Seq(
      (1L, "der hund und die katze ist hier"),
      (2L, "the cat and the dog of the house"),
      (3L, "xyzzy plugh")
    ).toDF("doc_id", "text")
    val out = d.select(col("doc_id"), TextOps.langId(TextOps.tokens(col("text"))).as("l"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "de", 2L -> "en", 3L -> "und"))
  }

  test("piiScrub replaces urls, emails, phones with typed placeholders") {
    val out = Seq(
      "see https://example.com/x?y=1 or mail bob.smith+a@mail.example.org or call +1-555-0042 now"
    ).toDF("t").select(TextOps.piiScrub(col("t")).as("s")).as[String].collect().head
    assert(out == "see <URL> or mail <EMAIL> or call <PHONE> now")
    // no PII → unchanged
    val clean = Seq("plain text with no contacts").toDF("t")
      .select(TextOps.piiScrub(col("t")).as("s")).as[String].collect().head
    assert(clean == "plain text with no contacts")
  }

  test("repetitionStats: repeated bigram dominates; short docs drop out") {
    val docs = Seq(
      (1L, "a b a b a b"),        // bigrams: ab ba ab ba ab → top 'a b'=3 of 5
      (2L, "w x y z"),            // all distinct → top 1 of 3
      (3L, "solo")                // <2 tokens → no row
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionStats(docs, "doc_id", "text", n = 2)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(!out.contains(3L))
    assert(out(1L) == ((1L, 5L, 3L, 0.6)))
    assert(out(2L) == ((2L, 3L, 1L, 1.0 / 3)))
  }

  test("bpeish tokenizer splits words, digits and punctuation") {
    val out = Seq("ab12, cd!").toDF("t")
      .select(TextOps.bpeishTokens(col("t")).as("toks")).as[Seq[String]].collect().head
    assert(out == Seq("ab", "12", ",", "cd", "!"))
  }
}
