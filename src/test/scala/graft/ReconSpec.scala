package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analyses, Dedup, Similarity, TextOps}
import graft.sources.Sources

/** Goldens for the reconciliation/coverage batch (q186-q190): k-means EM
  * step invariants, rolling distinct, exact set-similarity join, bucket
  * checksum diff, OOV rate.
  */
class ReconSpec extends SparkSuite {
  import spark.implicits._

  test("kmeansStep: grain, mass conservation, co-assignment of duplicates") {
    // two planted blobs at 0 and 10 plus exact duplicates; whatever rows
    // the md5 sample picks as centroids, duplicates must co-assign and
    // per-cluster member counts must sum to N on every dimension
    val vecs = (1L to 6L).map(i => (i, Array(0.0f, 0.0f))) ++
      (7L to 12L).map(i => (i, Array(10.0f, 10.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.kmeansStep(df, "vec_id", "embedding", k = 2, dim = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(_._2).toSet == Set(0, 1))
    // every dim's member counts sum to the corpus size
    assert(out.filter(_._2 == 0).map(_._3).sum == 12L)
    // means stay inside the data's convex hull
    assert(out.forall(r => r._4 >= 0.0 && r._4 <= 10.0))
    // a mean is either a blob mean or a mix: with two pure blobs any
    // cluster mean is in {0, 10, weighted mix}; duplicates co-assign so
    // cluster sizes are multiples of 6 when centroids split the blobs
    val sizes = out.filter(_._2 == 0).map(r => r._1 -> r._3).toMap
    assert(sizes.values.forall(n => n % 6 == 0), s"got $sizes")
  }

  test("rollingDistinct: trailing window, repeats collapse, window slides off") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-03 10:00:00"), "b"),
      (1L, ts("2024-01-03 11:00:00"), "a"), // repeat in window
      (1L, ts("2024-01-20 10:00:00"), "c")  // far later: window slid off
    ).toDF("k", "t", "c")
    val got = Analyses.rollingDistinct(ev, "k", "t", "c", windowDays = 7)
      .collect().map(r => r.getDate(1).toString -> r.getLong(2)).toMap
    assert(got == Map("2024-01-01" -> 1L, "2024-01-03" -> 2L,
      "2024-01-20" -> 1L), s"got $got")
  }

  test("setSimilarityJoin: exact jaccard, threshold boundary inclusive") {
    // A={x,y,z,w}, B={x,y,z,q} -> J=3/5; C={p,r} disjoint
    val et = Seq(("A", "x"), ("A", "y"), ("A", "z"), ("A", "w"),
      ("B", "x"), ("B", "y"), ("B", "z"), ("B", "q"),
      ("C", "p"), ("C", "r")).toDF("e", "t")
    val got = Dedup.setSimilarityJoin(et, "e", "t", tNum = 3, tDen = 5)
      .as[(String, String, Long, Double)].collect()
    assert(got.toSeq == Seq(("A", "B", 3L, 0.6)), s"got ${got.toSeq}")
    // raising the threshold above the boundary excludes the pair
    val none = Dedup.setSimilarityJoin(et, "e", "t", tNum = 2, tDen = 3)
      .count()
    assert(none == 0)
  }

  test("checksumDiff: identical tables empty, one changed row flags one bucket") {
    val a = (1L to 100L).map(i => (i, i * 2)).toDF("id", "v")
    val same = Sources.checksumDiff(a, a, col("id").cast("string"),
      concat_ws("|", col("id"), col("v")), nBuckets = 8)
    assert(same.count() == 0)
    val b = a.withColumn("v", when(col("id") === 42, lit(999L)).otherwise(col("v")))
    val diff = Sources.checksumDiff(a, b, col("id").cast("string"),
      concat_ws("|", col("id"), col("v")), nBuckets = 8).collect()
    assert(diff.length == 1)
    // counts agree (no rows added/removed), checksums differ
    assert(diff(0).getLong(1) == diff(0).getLong(3))
    assert(diff(0).getLong(2) != diff(0).getLong(4))
  }

  test("fdViolations: clean FD silent, violated FD reports extent + examples") {
    val df = Seq(("a", 1, 10), ("a", 1, 10), ("a", 2, 20),
      ("b", 3, 30), ("b", 3, 31)).toDF("g", "k", "v")
    // (g,k) -> v: (a,1) and (a,2) determine v; (b,3) has two values
    val got = Analyses.fdViolations(df, Seq("g", "k"), "v")
      .as[(String, Int, Long, Long, Int, Int)].collect().toSeq
    assert(got == Seq(("b", 3, 2L, 2L, 30, 31)), s"got $got")
  }

  test("bloomPruneSemiJoin: equals plain semi-join, prune is selective") {
    val fact = (1L to 500L).map(i => (i, i % 50)).toDF("id", "fk")
    val dim = Seq(1L, 7L, 13L).toDF("dk")
    val got = graft.operators.Joins.bloomPruneSemiJoin(
        fact, "fk", dim, "dk", mBits = 256, kHashes = 3)
      .as[(Long, Long)].collect().toSet
    val want = (1L to 500L).filter(i => Set(1L, 7L, 13L)(i % 50))
      .map(i => (i, i % 50)).toSet
    assert(got == want)
  }

  test("tileGrid: one tile for small images, clamped last tile covers edge") {
    val imgs = Seq((1L, 100L, 100L), (2L, 224L, 224L), (3L, 230L, 624L))
      .toDF("img_id", "w", "h")
    val got = graft.operators.Multimodal.tileGrid(imgs, "w", "h", 224, 200)
      .select("img_id", "tile_x", "tile_y")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
      .map { case (k, v) => k -> v.map(r => (r._2, r._3)).toSet }
    assert(got(1L) == Set((0L, 0L)))          // smaller than a tile
    assert(got(2L) == Set((0L, 0L)))          // exact fit
    // w=230: x in {0, 6(clamped)}; h=624: y in {0, 200, 400(clamped)}
    assert(got(3L) == Set((0L,0L),(0L,200L),(0L,400L),
      (6L,0L),(6L,200L),(6L,400L)), s"got ${got(3L)}")
  }

  test("goldenRecord: B wins per column, nulls fall through, provenance") {
    val a = Seq((1L, "x", 10.0), (2L, "y", 20.0)).toDF("k", "name", "bal")
    val b = Seq((2L, null.asInstanceOf[String], 99.0), (3L, "z", 30.0))
      .toDF("k", "name", "bal")
    val got = graft.operators.Joins.goldenRecord(a, b, "k", Seq("name", "bal"))
      .as[(Long, String, Double, String)].collect().toSet
    assert(got == Set((1L, "x", 10.0, "a_only"),
      (2L, "y", 99.0, "merged"),   // bal from B, name falls through to A
      (3L, "z", 30.0, "b_only")), s"got $got")
  }

  test("incrementalJoinView: delta algebra equals full recompute") {
    val factOld = Seq((1L, 10L), (2L, 20L)).toDF("oid", "k")
    val deltaFact = Seq((3L, 10L), (4L, 30L)).toDF("oid", "k")
    val dimOld = Seq((10L, "a"), (20L, "b"), (30L, "c")).toDF("k", "v")
    val deltaDim = Seq((10L, "a2")).toDF("k", "v")
    val got = graft.operators.Pipelines.incrementalJoinView(
        factOld, deltaFact, dimOld, deltaDim, "k")
      .select("oid", "k", "v").as[(Long, Long, String)].collect().toSet
    // full recompute: fact' = 1,2,3,4; dim' = {10->a2, 20->b, 30->c}
    assert(got == Set((1L, 10L, "a2"), (2L, 20L, "b"),
      (3L, 10L, "a2"), (4L, 30L, "c")), s"got $got")
  }

  test("oovRate: top-V boundary deterministic, rate is oov/total") {
    // counts: a:4 b:3 c:2 d:1 -> V=2 keeps {a,b}
    val docs = Seq((1L, "a a b c"), (2L, "a b c d"), (3L, "a b")).toDF("doc_id", "text")
    val got = TextOps.oovRate(docs, "doc_id", "text", vocabSize = 2)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(1L -> ((4L, 1L, 0.25)), 2L -> ((4L, 2L, 0.5)),
      3L -> ((2L, 0L, 0.0))), s"got $got")
  }
}
