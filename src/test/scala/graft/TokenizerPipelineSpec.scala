package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Independent cross-checks for the tokenizer / corpus-mixing wave
  * (q391–q395): the distributed formulations must agree with obvious
  * sequential references computed from the same inputs.
  */
class TokenizerPipelineSpec extends SparkSuite {
  import spark.implicits._

  /** Sequential greedy BPE reference: pair counts over all adjacent
    * occurrences weighted by word frequency, argmax with
    * (count desc, left, right) tie-break, merges applied strictly
    * left-to-right non-overlapping. */
  private def refBpe(words: Seq[(String, Long)],
                     steps: Int): Seq[(Int, String, String, Long)] = {
    var syms: Seq[(Vector[String], Long)] =
      words.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    (1 to steps).foreach { k =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (v, f) =>
        v.iterator.zip(v.iterator.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), n) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((k, a, b, n))
        syms = syms.map { case (v, f) =>
          val nb = Vector.newBuilder[String]
          var i = 0
          while (i < v.length) {
            if (i + 1 < v.length && v(i) == a && v(i + 1) == b) {
              nb += (a + b); i += 2
            } else { nb += v(i); i += 1 }
          }
          (nb.result(), f)
        }
      }
    }
    out.toSeq
  }

  private def runBpe(words: Seq[(String, Long)], steps: Int) =
    TextOps.bpeLearn(words.toDF("word", "freq"), steps)
      .orderBy("step")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("bpeLearn: same-char runs pair greedily left-to-right (aaaa -> aa aa)") {
    // the case where naive string replace diverges: after merging (a,a),
    // 'aaaa' must become [aa, aa], so step 2's top pair is (aa, aa)
    val got = runBpe(Seq(("aaaa", 1L)), 2)
    assert(got == Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
  }

  test("bpeLearn: hand-computed two-word golden with tie-break") {
    // aaab×2: pairs aa:4, ab:2; ab×3: ab:3 → ab wins 5 vs 4.
    // after merge: aaab → [a,a,ab], ab → [ab];
    // step2 pairs: (a,a):2, (a,ab):2 → tie on count, (a,a) < (a,ab).
    val got = runBpe(Seq(("aaab", 2L), ("ab", 3L)), 2)
    assert(got == Seq((1, "a", "b", 5L), (2, "a", "a", 2L)))
  }

  test("bpeLearn matches the sequential greedy reference on random words") {
    val rnd = new scala.util.Random(42)
    val words = (0 until 40).map { _ =>
      val len = 2 + rnd.nextInt(7)
      (Vector.fill(len)(('a' + rnd.nextInt(3)).toChar).mkString,
        1L + rnd.nextInt(9))
    }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
    assert(runBpe(words, 5) == refBpe(words, 5))
  }

  test("q392 mixing weights: rounded weights sum to ~1, epochs conserve budget") {
    val rows = SparkEntry.queries("q392_mix_weights")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val wSum = rows.map(_._3).sum
    assert(math.abs(wSum - 1.0) < 1e-4, s"weights sum $wSum")
    // Σ eff_epochs·n_tokens ≈ total/2 (the budget) up to rounding
    val total = rows.map(_._2).sum.toDouble
    val spent = rows.map(r => r._4 * r._2).sum
    assert(math.abs(spent - total / 2) / total < 1e-4)
    // α = 0.5 up-weights small sources: weight/share ratio decreases in size
    val bySize = rows.sortBy(_._2)
    val ratios = bySize.map(r => r._3 / (r._2 / total))
    ratios.sliding(2).foreach {
      case Array(a, b) => assert(a >= b - 1e-9, "small sources must be up-weighted")
      case _ =>
    }
  }

  test("q393 duplicated 8-gram coverage matches a brute sequential scan") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1)))
    val gramDocs = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[Long]]
    docs.foreach { case (id, _, toks) =>
      (0 to toks.length - 8).foreach { i =>
        val g = toks.slice(i, i + 8).mkString(" ")
        gramDocs.getOrElseUpdate(g, scala.collection.mutable.Set.empty) += id
      }
    }
    val dup = gramDocs.collect { case (g, ids) if ids.size >= 2 => g }.toSet
    val bySource = scala.collection.mutable.Map.empty[String, (Long, Long)]
    docs.foreach { case (_, src, toks) =>
      val covered = Array.fill(toks.length)(false)
      (0 to toks.length - 8).foreach { i =>
        if (dup(toks.slice(i, i + 8).mkString(" ")))
          (i until i + 8).foreach(covered(_) = true)
      }
      val (n, c) = bySource.getOrElse(src, (0L, 0L))
      bySource(src) = (n + toks.length, c + covered.count(identity))
    }
    val got = SparkEntry.queries("q393_dup_ngram_coverage")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got.keySet == bySource.keySet)
    got.foreach { case (srcName, (n, d)) =>
      assert((n, d) == bySource(srcName), s"source $srcName")
    }
  }

  test("q396 compression curve: monotone, starts at corpus size, drops bounded by pair counts") {
    val curve = SparkEntry.queries("q396_bpe_compression")(spark, sf)
      .orderBy("step").collect().map(r => (r.getInt(0), r.getLong(1)))
    val merges = SparkEntry.queries("q391_bpe_merges")(spark, sf)
      .orderBy("step").collect().map(r => (r.getInt(0), r.getLong(3))).toMap
    val base = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(lower(col("t")).rlike("^[a-z]+$"))
      .agg(sum(length(lower(col("t")))).cast("long")).collect()(0).getLong(0)
    assert(curve.head == ((0, base)))
    curve.sliding(2).foreach { case Array((k0, a), (k1, b)) =>
      val drop = a - b
      assert(drop > 0, s"step $k1 must shrink the corpus")
      // each applied merge removes one symbol; overlap-counted pair mass
      // bounds the applications from above
      assert(drop <= merges(k1), s"step $k1 drop $drop > pair count ${merges(k1)}")
    case _ =>
    }
  }

  test("q397 linear attribution matches a brute per-conversion scan") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val horizon = 7L * 86400L * 1000000L
    val byUser = evs.groupBy(_._1)
    case class Acc(var convs: Set[Long] = Set.empty, var touches: Long = 0L,
                   var credit: BigDecimal = BigDecimal(0))
    val acc = scala.collection.mutable.Map("click" -> Acc(), "view" -> Acc())
    byUser.values.foreach { g =>
      val purchases = g.filter(_._3 == "purchase")
      val ts = g.filter(e => e._3 == "click" || e._3 == "view")
      purchases.foreach { case (_, cid, _, cts) =>
        val win = ts.filter(t => t._4 < cts && t._4 >= cts - horizon)
        if (win.nonEmpty) {
          val n = win.length
          win.groupBy(_._3).foreach { case (tt, tg) =>
            val a = acc(tt)
            a.convs += cid; a.touches += tg.length
            a.credit += BigDecimal(tg.length.toDouble / n)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP)
          }
        }
      }
    }
    val got = SparkEntry.queries("q397_linear_attribution")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    acc.filter(_._2.touches > 0).foreach { case (tt, a) =>
      val (nc, nt, cr) = got(tt)
      assert(nc == a.convs.size && nt == a.touches, s"type $tt counts")
      assert(math.abs(cr - a.credit.toDouble) < 1e-6, s"type $tt credit")
    }
  }

  test("q398 novelty: snapshot 0 is fully novel, rates within [0,1]") {
    val got = SparkEntry.queries("q398_ngram_novelty")(spark, sf)
      .orderBy("snapshot").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == Seq(0, 1, 2, 3))
    assert(got.head._4 == 1.0, "first snapshot must be fully novel")
    got.foreach { case (_, n, nov, rate) =>
      assert(nov <= n && rate >= 0.0 && rate <= 1.0)
    }
  }

  test("q399 yield sweep: k=0 keeps everything, survivors monotone in k") {
    val got = SparkEntry.queries("q399_quality_yield")(spark, sf)
      .collect()
      .map(r => ((r.getString(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val totals = Tables.documents(spark, sf).groupBy("source")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (src, n) =>
      assert(got((src, 0))._1 == n, s"k=0 must keep all docs of $src")
    }
    totals.keys.foreach { src =>
      (0 to 3).foreach { k =>
        val a = got.getOrElse((src, k), (0L, 0L))
        val b = got.getOrElse((src, k + 1), (0L, 0L))
        assert(b._1 <= a._1 && b._2 <= a._2, s"$src k=$k monotonicity")
      }
    }
  }

  test("q400 isotropy: cosines bounded, counts complete, centroid matches brute") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("label"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    val got = SparkEntry.queries("q400_embedding_isotropy")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(_._2).sum == vecs.length)
    got.foreach { case (_, _, c, nrm) =>
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9 && nrm > 0)
    }
    // brute mean cosine to the 6-dp-component centroid, per label
    val n = vecs.length
    val cent = Array.tabulate(64) { d =>
      vecs.map(v => BigDecimal(v._2(d)).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble / n
    }
    def dotLR(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < 64) { s += a(i) * b(i); i += 1 }; s
    }
    val cnorm = math.sqrt(dotLR(cent, cent))
    vecs.groupBy(_._1).foreach { case (label, g) =>
      val mc = g.map { case (_, v) =>
        BigDecimal(dotLR(v, cent) / (math.sqrt(dotLR(v, v)) * cnorm))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble / g.length
      val gotRow = got.find(_._1 == label).get
      assert(math.abs(gotRow._3 - mc) < 2e-6, s"label $label mean cosine")
    }
  }

  test("q406 packing curve: packed never exceeds padded, brute recount agrees") {
    val lens = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).cast("long")).collect()
      .map(_.getLong(0)).filter(_ > 0)
    val got = SparkEntry.queries("q406_packing_efficiency")(spark, sf)
      .orderBy("ctx_len").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    got.foreach { case (l, nd, tt, padded, packed) =>
      assert(nd == lens.length && tt == lens.sum)
      assert(padded == lens.map(n => (n + l - 1) / l).sum, s"L=$l padded")
      assert(packed == (tt + l - 1) / l && packed <= padded)
    }
  }

  test("q407 dedup yield: conservation and keep-first token accounting") {
    val d = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(split(col("text"), " ")))))
          .as("fp"),
        size(split(col("text"), " ")).cast("long").as("nt"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expect = d.groupBy(_._1).map { case (src, g) =>
      val groups = g.groupBy(_._3).values
      src -> (g.length.toLong, groups.size.toLong, g.map(_._4).sum,
        groups.map(_.minBy(_._2)._4).sum)
    }
    val got = SparkEntry.queries("q407_dedup_yield")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == expect)
  }

  test("q408 hapax and q409 Chao1: bounds and brute F1/F2 parity") {
    SparkEntry.queries("q408_hapax_share")(spark, sf).collect().foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "hapax cannot exceed vocab")
    }
    val counts = Tables.documents(spark, sf)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("source", "w").count().collect()
      .map(r => (r.getString(0), r.getLong(2)))
    val expect = counts.groupBy(_._1).map { case (src, g) =>
      src -> (g.length.toLong, g.count(_._2 == 1L).toLong,
        g.count(_._2 == 2L).toLong)
    }
    SparkEntry.queries("q409_chao1_richness")(spark, sf).collect()
      .foreach { r =>
        val (v, f1, f2) = expect(r.getString(0))
        assert(r.getLong(1) == v && r.getLong(2) == f1 && r.getLong(3) == f2)
        if (f2 > 0) {
          val chao1 = v + f1.toDouble * f1 / (2.0 * f2)
          assert(math.abs(r.getDouble(4) - chao1) < 0.01)
          assert(r.getDouble(4) >= v, "richness estimate below observed vocab")
        } else assert(r.isNullAt(4))
      }
  }

  test("q395 split leakage matches a brute fingerprint-set check") {
    val d = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        md5(concat_ws(" ", array_sort(array_distinct(
          TextOps.tokens(col("text")))))).as("fp"),
        graft.operators.Sampling.hashBucket(col("doc_id")).as("hb"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val trainFps = d.collect { case (_, _, fp, hb) if hb < 8000 => fp }.toSet
    val test_ = d.filter(_._4 >= 9000)
    val expect = test_.groupBy(_._2).map { case (srcName, g) =>
      srcName -> (g.length.toLong, g.count(r => trainFps(r._3)).toLong)
    }
    val got = SparkEntry.queries("q395_split_leakage")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == expect)
  }
}
