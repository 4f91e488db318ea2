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

  test("dedupCorpusKeepBest keeps the best-scoring doc per cluster, not the min id") {
    // docs 1,2,5 form one cluster (exact dups + near-dup); doc 4's
    // case/whitespace variant falls below jaccard 0.5 on raw shingles, so
    // it is its own cluster, as are 3. Score = id*10 -> the {1,2,5} cluster
    // keeps doc 5 (highest score), NOT doc 1 (min id, which plain
    // dedupCorpus keeps).
    val scored = docs.withColumn("score", col("doc_id") * 10)
    val kept = Dedup.dedupCorpusKeepBest(scored, "doc_id", "text", col("score"),
        shingleN = 3, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L, 5L), s"kept=$kept")
    val keptMin = Dedup.dedupCorpus(docs, "doc_id", "text", shingleN = 3, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(keptMin == Set(1L, 3L, 4L))
    // short docs (no shingles) are always kept
    val withShort = scored.union(Seq((9L, "tiny doc", 0L)).toDF("doc_id", "text", "score"))
    val kept2 = Dedup.dedupCorpusKeepBest(withShort, "doc_id", "text", col("score"),
        shingleN = 3, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 == Set(3L, 4L, 5L, 9L))
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

  test("chunkTokens: windows, overlap, trailing partial, tiny and empty docs") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b"),                                    // shorter than overlap+1
      (3L, ""),                                       // empty -> no rows
      (4L, (1 to 5).map(i => s"u$i").mkString(" "))   // odd tail
    ).toDF("doc_id", "text")
    val out = TextOps.chunkTokens(docs, "doc_id", "text", chunkSize = 4, overlap = 1)
      .as[(Long, Int, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toList).toMap
    assert(out(1L) == List(
      (1L, 0, "t1 t2 t3 t4", 4L),
      (1L, 1, "t4 t5 t6 t7", 4L),
      (1L, 2, "t7 t8 t9 t10", 4L)))
    assert(out(2L) == List((2L, 0, "a b", 2L)))
    assert(!out.contains(3L))
    assert(out(4L) == List((4L, 0, "u1 u2 u3 u4", 4L), (4L, 1, "u4 u5", 2L)))
    // every token of every doc appears in at least one chunk of that doc
    val covered = out(1L).flatMap(_._3.split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"t$i").toSet)
    intercept[IllegalArgumentException] {
      TextOps.chunkTokens(docs, "doc_id", "text", chunkSize = 4, overlap = 4)
    }
  }

  test("dedupAgainstCorpus: exact dup, near dup, and novel batch docs routed correctly") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda CHANGED"
    val corpus = Seq(
      (1L, base),
      (2L, "one two three four five six seven eight nine ten eleven twelve")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, base),  // exact dup of corpus 1 -> dropped in phase 1
      (11L, near),  // near dup of corpus 1 (J ~ 0.64) -> dropped in phase 2
      (12L, "zebra quokka wombat numbat dingo bilby kookaburra emu cassowary lyrebird")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupAgainstCorpus(corpus, batch, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(12L))
    // maxDf guard path (corpus-derived hot set) keeps the same verdicts here
    val outDf = Dedup.dedupAgainstCorpus(corpus, batch, "doc_id", "text", maxDf = 100)
      .select("doc_id").as[Long].collect().toSet
    assert(outDf == Set(12L))
  }

  test("dedupAgainstIndex == dedupAgainstCorpus; extendIndex == rebuilt index") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda CHANGED"
    val near2 = "alpha beta gamma delta epsilon zeta eta theta iota kappa CHANGED2 mu"
    val corpus = Seq(
      (1L, base, "en"),
      (2L, "one two three four five six seven eight nine ten eleven twelve", "en")
    ).toDF("doc_id", "text", "lang")
    val chunkA = Seq(
      (10L, base, "en"),  // exact dup of corpus 1 -> dropped
      (11L, near, "en"),  // near dup of corpus 1 -> dropped
      (12L, "zebra quokka wombat numbat dingo bilby kookaburra emu cassowary lyrebird", "en")
    ).toDF("doc_id", "text", "lang")
    val idx0 = Dedup.corpusIndex(corpus, "doc_id", "text")
    // the index's correctness contract: same verdicts as the from-scratch form
    val viaIdx = Dedup.dedupAgainstIndex(idx0, chunkA, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    val viaScratch = Dedup.dedupAgainstCorpus(corpus, chunkA, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(viaIdx == viaScratch && viaIdx == Set(12L))
    // chunk B: 20 near-dups doc 12 (an ACCEPTED chunk-A doc, not in the
    // original corpus) and 21 is novel — only the maintained index drops 20
    val chunkB = Seq(
      (20L, "zebra quokka wombat numbat dingo bilby kookaburra emu cassowary NOVELTAIL", "en"),
      (21L, near2, "en") // near dup of CORPUS doc 1 -> dropped either way
    ).toDF("doc_id", "text", "lang")
    val accepted = chunkA.filter(col("doc_id") === 12L)
    val idx1 = Dedup.extendIndex(idx0, accepted, "doc_id", "text")
    val seqOut = Dedup.dedupAgainstIndex(idx1, chunkB, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(seqOut == Set.empty[Long],
      s"20 near-dups accepted 12, 21 near-dups corpus 1 — got $seqOut")
    // the fixed-corpus form would have kept 20 (chunk-dependence is real)
    val fixedOut = Dedup.dedupAgainstCorpus(corpus, chunkB, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(fixedOut == Set(20L))
    // extension == rebuild: the incremental artifacts are value-identical
    // to recomputing the index from the grown corpus
    val rebuilt = Dedup.corpusIndex(corpus.unionByName(accepted), "doc_id", "text")
    assert(idx1.fingerprints.exceptAll(rebuilt.fingerprints).isEmpty &&
      rebuilt.fingerprints.exceptAll(idx1.fingerprints).isEmpty)
    assert(idx1.bands.exceptAll(rebuilt.bands).isEmpty &&
      rebuilt.bands.exceptAll(idx1.bands).isEmpty)
  }

  test("dedupAgainstIndex: short docs (no shingles) — exact dup still drops, near-dup passes through") {
    val corpus = Seq((1L, "tiny doc", "en")).toDF("doc_id", "text", "lang")
    val idx = Dedup.corpusIndex(corpus, "doc_id", "text")
    val batch = Seq(
      (10L, "tiny doc", "en"),  // exact dup → fingerprint anti-join drops it
      (11L, "tiny dog", "en"))  // 2 tokens < shingleN → no bands, survives
    .toDF("doc_id", "text", "lang")
    val out = Dedup.dedupAgainstIndex(idx, batch, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(11L), s"got $out")
  }

  test("unigramSurprisal matches a hand-computed corpus distribution") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    // counts: a=2, b=2, c=1, total=5; s(a)=s(b)=round(-ln(0.4),6)=0.916291,
    // s(c)=round(-ln(0.2),6)=1.609438
    val got = TextOps.unigramSurprisal(docs, "doc_id", "text")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L)._2 == 3L && got(2L)._2 == 2L)
    assert(math.abs(got(1L)._1 - 0.916291) < 1e-9)
    assert(math.abs(got(2L)._1 - (0.916291 + 1.609438) / 2) < 1e-9)
  }

  test("duplicateSpanStats counts corpus-wide duplicated windows per doc") {
    val docs = Seq(
      (1L, "a b c d e f"), // spans: "a b c", "d e f"
      (2L, "a b c x y z"), // "a b c" duplicated across docs
      (3L, "p q"),         // single partial span, duplicated with d4
      (4L, "p q")
    ).toDF("doc_id", "text")
    val got = TextOps.duplicateSpanStats(docs, "doc_id", "text", window = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == Map(
      1L -> (2L, 1L, 0.5), 2L -> (2L, 1L, 0.5),
      3L -> (1L, 1L, 1.0), 4L -> (1L, 1L, 1.0)))
  }

  test("dropDuplicateSpans keeps the canonical first occurrence and rebuilds") {
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c x y z"),
      (3L, "p q"),
      (4L, "p q")
    ).toDF("doc_id", "text")
    val got = TextOps.dropDuplicateSpans(docs, "doc_id", "text", window = 3)
      .select("doc_id", "dedup_text", "n_spans", "n_kept")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // canonical "a b c" lives in doc 1; canonical "p q" in doc 3; doc 4
    // loses its only span and disappears
    assert(got == Map(
      1L -> ("a b c d e f", 2L, 2L),
      2L -> ("x y z", 2L, 1L),
      3L -> ("p q", 1L, 1L)))
  }

  test("invertedIndex: sharded postings, distinct-per-doc terms, sorted lists") {
    val docs = Seq(
      (1L, "a b a"),   // 'a' twice in one doc -> one posting
      (2L, "a c"),
      (12L, "a b"),    // shard 1 with shardSize=10
      (13L, "")
    ).toDF("doc_id", "text")
    val got = TextOps.invertedIndex(docs, "doc_id", "text", shardSize = 10L)
      .as[(String, Long, Long, Seq[Long])].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got == Map(
      ("a", 0L) -> (2L, Seq(1L, 2L)), ("a", 1L) -> (1L, Seq(12L)),
      ("b", 0L) -> (1L, Seq(1L)), ("b", 1L) -> (1L, Seq(12L)),
      ("c", 0L) -> (1L, Seq(2L))))
    // concatenating shards in shard order yields the globally sorted list
    val aAll = got.collect { case (("a", sh), (_, p)) => sh -> p }.toSeq
      .sortBy(_._1).flatMap(_._2)
    assert(aAll == aAll.sorted)
  }

  test("lengthOutlierFilter keeps the inner percentile band only") {
    // 20 docs with 1..20 tokens; p05/p95 of 1..20 under linear interpolation
    // are 1.95 and 19.05 -> survivors are exactly 2..19 tokens
    val docs = (1 to 20).map(n => (n.toLong, (1 to n).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val kept = TextOps.lengthOutlierFilter(docs, "doc_id", "text", 0.05, 0.95)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == (2L to 19L).toSet)
    intercept[IllegalArgumentException] {
      TextOps.lengthOutlierFilter(docs, "doc_id", "text", 0.9, 0.1)
    }
  }

  test("filterBySourceQuality drops whole low-scoring sources") {
    val docs = Seq(
      (1L, "good", 100.0), (2L, "good", 200.0),   // mean 150
      (3L, "bad", 10.0), (4L, "bad", 20.0),       // mean 15
      (5L, "edge", 50.0), (6L, "edge", 50.0))     // mean 50, inclusive bound
      .toDF("doc_id", "source", "score")
    val kept = TextOps.filterBySourceQuality(docs, "source", "score", minMean = 50.0)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 5L, 6L))
  }

  test("editDistancePairs: banding finds all pairs incl. band-straddlers; blocking separates") {
    val docs = Seq(
      (1L, "en", "kitten sat here"),   // len 15
      (2L, "en", "sitten sat here"),   // 1 substitution from doc 1
      (3L, "en", "kitten sat here!!"), // 2 inserts from doc 1, len 17: band straddle at maxDist 3
      (4L, "en", "completely different string"),
      (5L, "fr", "kitten sat here")    // identical text, other block -> must NOT pair
    ).toDF("doc_id", "lang", "text")
    val got = Dedup.editDistancePairs(docs, "doc_id", "text", "lang", maxDist = 3)
      .select("id_a", "id_b", "lev").as[(Long, Long, Int)].collect().toSet
    // lev(1,2)=1; lev(1,3)=2 with len diff 2 (bands 5 vs 5 at maxDist 3: 15/3=5, 17/3=5);
    // lev(2,3)=3 (substitution + two inserts)
    assert(got == Set((1L, 2L, 1), (1L, 3L, 2), (2L, 3L, 3)))

    // true band-straddle: lengths 5 and 8 sit in bands 1 and 2 at maxDist 3
    val straddle = Seq((1L, "x", "aaaaa"), (2L, "x", "aaaaaaaa")).toDF("doc_id", "lang", "text")
    val s2 = Dedup.editDistancePairs(straddle, "doc_id", "text", "lang", maxDist = 3)
      .select("id_a", "id_b", "lev").as[(Long, Long, Int)].collect().toSet
    assert(s2 == Set((1L, 2L, 3)))
  }

  test("tfidfTopTerms matches a hand-computed reference on a tiny corpus") {
    // 3 docs; "common" appears in all (idf = ln(1) = 0), "rare" only in doc 1
    val docs = Seq(
      (1L, "rare common rare"),
      (2L, "common mid"),
      (3L, "common mid")).toDF("doc_id", "text")
    val got = TextOps.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .as[(Long, String, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(r => (-r._4, r._2)).toList).toMap
    def s(tf: Long, df: Long): Double =
      BigDecimal(tf * math.log(3.0 / df)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1: rare tf=2 df=1 → 2·ln3; common tf=1 df=3 → 0
    assert(got(1L) == List((1L, "rare", 2L, s(2, 1)), (1L, "common", 1L, s(1, 3))))
    // docs 2/3: mid tf=1 df=2 → ln(1.5); common 0; tie on k=2 keeps both
    assert(got(2L) == List((2L, "mid", 1L, s(1, 2)), (2L, "common", 1L, s(1, 3))))
    assert(got(3L) == List((3L, "mid", 1L, s(1, 2)), (3L, "common", 1L, s(1, 3))))
  }
}
