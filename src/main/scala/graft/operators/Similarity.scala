package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.12 (EXT) — similarity search over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k against a *small broadcast query set*
  * (never an unbounded cross join). Scale path: LSH bucketing — random
  * hyperplane signs (cosine LSH) computed as per-row expressions, so the
  * candidate join shuffles on the bucket key only.
  */
object Similarity {

  /** Dot product of two double arrays, summed left-to-right (deterministic,
    * reproducible by external oracles). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Fixed-dimension dot product via the native [[graft.functions.DotProduct]]
    * expression: a constant-size codegen loop, where the higher-order
    * `aggregate`/`zip_with` form evaluates interpreted lambdas per element and
    * the unrolled `element_at` form floods Janino with ~10·dim nodes per
    * cosine (measured: compile time dominated q39 when several cosines share
    * one plan). Summation is left-to-right — bit-identical to both other
    * forms and to an external oracle's sequential list sum. Use whenever
    * `dim` is known. */
  def dotU(a: Column, b: Column, dim: Int): Column =
    exprColumn(graft.functions.DotProduct(asExpr(a), asExpr(b), dim))

  def normU(a: Column, dim: Int): Column = sqrt(dotU(a, a, dim))

  def cosineU(a: Column, b: Column, dim: Int): Column =
    dotU(a, b, dim) / (normU(a, dim) * normU(b, dim))

  /** Deterministic pseudo-random weight in [-1, 1) from a seed string: the
    * first two md5 bytes scaled — fully reproducible by any engine with md5
    * (oracle form: `('0x'||substr(md5(key),1,4))::bigint / 32768.0 - 1.0`). */
  def mdWeight(key: String): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    (((h(0) & 0xffL) << 8 | (h(1) & 0xffL)).toDouble / 32768.0) - 1.0
  }

  /** Hyperplane weight for LSH bucketing (seed "plane:p:i"). */
  def planeWeight(p: Int, i: Int): Double = mdWeight(s"plane:$p:$i")

  /** Deterministic pseudo-random IVF centroid matrix (seed "centroid:c:i"):
    * the engine-reproducible coarse quantizer that makes the whole IVF
    * pipeline expressible in external SQL (the library/production variant
    * fits KMeans instead — see [[ivfKnn]]). Random directions are a standard
    * data-independent coarse quantizer; recall still comes from `nprobe`. */
  def seededCentroids(nCentroids: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nCentroids, dim)((c, i) => mdWeight(s"centroid:$c:$i"))

  /** Deterministic DATA-SAMPLED PQ sub-codebooks: centroid c of subspace s
    * is the s-th subvector of the corpus row with the c-th smallest
    * (md5(id), id) — i.e. a key-stable uniform sample of `ksub` corpus
    * vectors supplies every subspace's codebook. Unlike synthetic
    * `mdWeight` points (which sit in [-1,1]^d regardless of the data's
    * scale and quantize with errors larger than the signal — measured
    * recall 0.06), sampled codebooks are data-distributed by construction,
    * the same reason FAISS inits PQ training from data samples. The
    * ksub-row collect is the codebook FIT (the bounded-model analog of
    * [[ivfKnn]]'s KMeans fit), not a data-path collect. */
  def pqSampledCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                         m: Int, ksub: Int, subDim: Int): Array[Array[Array[Double]]] = {
    val seeds: Array[Array[Double]] = corpus
      .select(asDouble(col(vecCol)).as("v"),
        conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
          .cast("long").as("h"),
        col(idCol).cast("long").as("i"))
      .orderBy(col("h").asc, col("i").asc).limit(ksub)
      .select("v").collect()
      .map(_.getSeq[Double](0).toArray)
    require(seeds.length == ksub, s"corpus has fewer than $ksub rows")
    Array.tabulate(m, ksub, subDim)((s, c, i) => seeds(c)(s * subDim + i))
  }

  /** Cast an `array<float>` column to `array<double>` so arithmetic matches
    * a double-based oracle exactly. */
  def asDouble(a: Column): Column = a.cast("array<double>")

  /** Brute-force k-NN: for each query vector (small set, broadcast), the
    * top-k most cosine-similar rows. The fact side streams once — the plan is
    * scan → broadcast nested loop (|queries| multiplier) → per-query top-k
    * via window. At 1000 executors this is a single pass over the corpus. */
  def bruteKnn(corpus: DataFrame, queries: DataFrame, idCol: String,
               vecCol: String, k: Int, dim: Int = 0): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), asDouble(col(vecCol)).as("qvec")))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("nvec"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim",
        if (dim > 0) cosineU(col("qvec"), col("nvec"), dim)
        else cosine(col("qvec"), col("nvec")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** Cosine-LSH bucket signature: sign bits against `nPlanes` deterministic
    * pseudo-random hyperplanes (md5-seeded, so fully reproducible). A vector's
    * bucket = concatenated sign bits of its first `nPlanes` projections. */
  /** Wrap a catalyst Expression as a Column (classic-API bridge), so custom
    * expressions are usable from the Column API without requiring session
    * function registration. */
  private def exprColumn(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.GraftColumnBridge.column(e)
  private def asExpr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.GraftColumnBridge.expression(c)

  /** Top-n row indices of a small literal matrix by inner product with the
    * vector column (nearest-centroid assignment and the like) — the
    * TopDotIndices custom expression as a Column. */
  def topDotIndices(vec: Column, matrix: Array[Array[Double]], n: Int): Column =
    exprColumn(graft.functions.TopDotIndices(asExpr(vec), matrix, n))

  /** Single-table LSH bucket = the one band of a 1×nPlanes banding. */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int): Column =
    element_at(bandBuckets(vec, dim, 1, nPlanes), 1)

  /** Banded (multi-table) cosine-LSH buckets: `nBands` independent tables of
    * `rowsPerBand` sign bits each — band b uses planes [b·r, b·r+r). A pair
    * is a candidate when ALL bits of ANY band agree, the OR-of-ANDs
    * amplification that keeps recall high where a single 2^p bucket table
    * loses every neighbor that straddles one hyperplane (and whose fixed
    * bucket count makes buckets O(N/2^p) — quadratic blowup at corpus
    * scale). Returns array[bucket-string] indexed by band.
    *
    * Implemented as a custom Catalyst expression
    * (graft.functions.HyperplaneBands): the unrolled element_at formulation
    * put B·r·dim nodes in the plan and Janino compilation dominated query
    * time; the expression emits a constant-size Java loop instead.
    * Constructed directly (no session registration needed from the Column
    * API; `GraftExtensions` additionally registers it for SQL callers). */
  def bandBuckets(vec: Column, dim: Int, nBands: Int, rowsPerBand: Int): Column =
    exprColumn(graft.functions.HyperplaneBands(asExpr(vec), dim, nBands, rowsPerBand))

  /** Bit-packed [[bandBuckets]]: identical sign bits, bucket = LONG (bit r
    * = plane r's sign, LSB-first) — a bijection of the string form, so the
    * candidate partition any LSH join derives is unchanged while the join
    * key becomes 8 fixed bytes instead of a rowsPerBand-char string (less
    * shuffle, cheaper hash/compare, no per-band string allocation). For
    * join-internal use; the string form stays the multi-probe/SQL surface
    * (probeBuckets flips characters, oracles reproduce bit strings). */
  def bandBucketsPacked(vec: Column, dim: Int, nBands: Int, rowsPerBand: Int): Column = {
    require(rowsPerBand <= 63, s"packed buckets hold ≤63 bits, got $rowsPerBand")
    exprColumn(graft.functions.HyperplaneBands(asExpr(vec), dim, nBands,
      rowsPerBand, packed = true))
  }

  /** Hamming-≤radius probe set of a sign-bit bucket string: the bucket plus
    * every combination of up to `radius` bit flips. Multi-probe recovers
    * neighbors lost across hyperplane boundaries at the cost of Σ C(p,r)×
    * candidate lookups on the (small, broadcast) query side only — the
    * corpus is never re-bucketed. */
  private def probeBuckets(bucket: Column, nPlanes: Int, radius: Int): Column = {
    def flip(c: Column, i: Int): Column = concat(
      substring(c, 1, i - 1),
      when(substring(c, i, 1) === "1", "0").otherwise("1"),
      substring(c, i + 1, nPlanes - i))
    val idxSets = (0 to radius).flatMap(r => (1 to nPlanes).combinations(r))
    array(idxSets.map(is => is.foldLeft(bucket)((c, i) => flip(c, i))): _*)
  }

  /** IVF-style ANN: coarse-quantize the corpus with KMeans centroids, then
    * search only the `nprobe` nearest inverted lists per query. The classic
    * scale path when the corpus outgrows brute force: the corpus is bucketed
    * once (centroid id = shuffle key), queries fan out to nprobe buckets.
    * Deterministic via fixed seed. */
  def ivfKnn(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, nCentroids: Int = 16,
             nprobe: Int = 2, maxFitRows: Long = 100000L,
             dim: Int = 0): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // Fit the coarse quantizer on a capped prefix, never the full corpus: at
    // 100 TB KMeans trains on ≤`maxFitRows` rows once (feed a pre-sampled
    // training set or reuse a persisted model there). A prefix limit costs no
    // extra corpus pass — an exact count through an upstream repartition
    // would be one full scan+shuffle before the fit even starts.
    val train = corpus
      .select(array_to_vector(asDouble(col(vecCol))).as("features"))
      .limit(math.min(maxFitRows, Int.MaxValue.toLong).toInt)
    // random init: k-means|| costs several extra distributed passes and the
    // coarse quantizer doesn't need it (cells only bucket the corpus; recall
    // comes from nprobe, asserted in the spec)
    val model = new KMeans().setK(nCentroids).setSeed(42L).setMaxIter(10)
      .setInitMode("random")
      .fit(train)
    val centroidMatrix: Array[Array[Double]] = model.clusterCenters.map(_.toArray)
    ivfSearch(corpus, queries, idCol, vecCol, k, centroidMatrix, nprobe, dim)
  }

  /** IVF ANN with a deterministic md5-seeded coarse quantizer: identical
    * search pipeline to [[ivfKnn]], but the centroid matrix is
    * [[seededCentroids]] — engine-reproducible, so the WHOLE pipeline
    * (assignment, probe set, cosine, rank) has an exact external-SQL oracle
    * (the q41 hyperplane pattern applied to IVF). */
  def ivfKnnSeeded(corpus: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, k: Int, nCentroids: Int = 8,
                   nprobe: Int = 2, dim: Int = 64): DataFrame =
    ivfSearch(corpus, queries, idCol, vecCol, k,
      seededCentroids(nCentroids, dim), nprobe, dim)

  /** Shared IVF search core: bucket the corpus by nearest centroid (top-1
    * inner product), fan each query out to its `nprobe` nearest cells, rank
    * candidates by exact cosine. The corpus is bucketed once (cell = shuffle
    * key); only the broadcast query side fans out. */
  private def ivfSearch(corpus: DataFrame, queries: DataFrame, idCol: String,
                        vecCol: String, k: Int,
                        centroidMatrix: Array[Array[Double]],
                        nprobe: Int, dim: Int): DataFrame = {
    // Centroid assignment via the TopDotIndices custom expression (constant-
    // size codegen loop over the centroid matrix — the unrolled per-centroid
    // dot formulation put ~10³ nodes in the plan and Janino compile time
    // dominated, same pathology as pre-expression bandBuckets). Constructed
    // directly per call: no session-global registration to race or leak.
    def topCells(vec: Column, n: Int): Column =
      exprColumn(graft.functions.TopDotIndices(asExpr(vec), centroidMatrix, n))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("nvec"))
      .withColumn("cell", element_at(topCells(col("nvec"), 1), 1))
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qvec"))
        .withColumn("cell", explode(topCells(col("qvec"), nprobe))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    val sim = if (dim > 0) cosineU(col("qvec"), col("nvec"), dim)
              else cosine(col("qvec"), col("nvec"))
    c.join(q, "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), sim.as("sim"))
      .distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** PERSIST the IVF inverted lists: the corpus assigned to its coarse
    * cell and written PARTITIONED BY cell — the vector-store layout where
    * each cell is a directory, so serving a query reads ONLY its `nprobe`
    * cell partitions and the rest of a 100 TB corpus is never opened
    * (partition pruning at the scan, asserted structurally in
    * Round10OpsSpec). Write-once per corpus version; the storage half of
    * the q514 ANN-serving story (q518). */
  def writeIvfLists(corpus: DataFrame, idCol: String, vecCol: String,
                    centroidMatrix: Array[Array[Double]], path: String): Unit = {
    corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("nvec"))
      .withColumn("cell", element_at(
        exprColumn(graft.functions.TopDotIndices(
          asExpr(col("nvec")), centroidMatrix, 1)), 1))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    // record the BUILD-time cell histogram (underscore dir: hidden from
    // every data scan) — the baseline [[rebalanceDue]] measures drift
    // against. Counts come from parquet footers, not a data read.
    val spark = corpus.sparkSession
    spark.read.parquet(path).groupBy("cell")
      .agg(count(lit(1)).as("n_built"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_build_hist")
  }

  /** O(batch) maintenance of the persisted IVF lists: assign the new
    * vectors to their cells with the SAME quantizer and append — each
    * row lands as new files inside its existing cell directory, the
    * corpus partitions are never read or rewritten (the vector-store
    * analog of Dedup.appendIndex). Serving sees appended vectors
    * immediately because pruning is by directory, not by file
    * manifest. */
  def appendIvfLists(more: DataFrame, idCol: String, vecCol: String,
                     centroidMatrix: Array[Array[Double]], path: String): Unit =
    more.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("nvec"))
      .withColumn("cell", element_at(
        exprColumn(graft.functions.TopDotIndices(
          asExpr(col("nvec")), centroidMatrix, 1)), 1))
      .write.mode("append").partitionBy("cell").parquet(path)

  private def lakeFs(spark: org.apache.spark.sql.SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** The lake's cell ids, from the directory layout alone. */
  def ivfCells(spark: org.apache.spark.sql.SparkSession,
               path: String): Seq[Int] = {
    val (fs, p) = lakeFs(spark, path)
    fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
      .map(_.getPath.getName.stripPrefix("cell=").toInt)
      .sorted
  }

  /** Data files inside one cell directory — the compaction metric. */
  def cellFileCount(spark: org.apache.spark.sql.SparkSession, path: String,
                    cell: Int): Int = {
    val (fs, p) = lakeFs(spark, path)
    val d = new org.apache.hadoop.fs.Path(p, s"cell=$cell")
    if (!fs.exists(d)) 0
    else fs.listStatus(d).count { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** Compact the listed cell DIRECTORIES in place: each
    * [[appendIvfLists]] lands one-or-more new files per touched cell,
    * and small files are a scan-cost tax every probe of that cell pays
    * forever after. Per cell: read the directory, rewrite as one file
    * into a dot-prefixed staging dir (invisible to concurrent scans),
    * swap. Pure layout — same rows, same directory, so pruning and
    * serving answers are unchanged by construction (q523 proves it on
    * the q45 oracle). Per-cell and incremental: unlisted cells are
    * never read or rewritten, which is what makes compaction schedulable
    * at 100 TB (compact the hot appended cells, not the lake). */
  def compactIvfLists(spark: org.apache.spark.sql.SparkSession, path: String,
                      cells: Seq[Int]): Unit = {
    val (fs, p) = lakeFs(spark, path)
    cells.foreach { c =>
      val cellDir = new org.apache.hadoop.fs.Path(p, s"cell=$c")
      val staging = new org.apache.hadoop.fs.Path(p, s".compact_cell=$c")
      val old = new org.apache.hadoop.fs.Path(p, s".old_cell=$c")
      if (fs.exists(old)) fs.delete(old, true): Unit // dead leftover of a prior crash
      if (fs.exists(cellDir)) {
        spark.read.parquet(cellDir.toString).coalesce(1)
          .write.mode("overwrite").parquet(staging.toString)
        fs.delete(new org.apache.hadoop.fs.Path(staging, "_SUCCESS"), false): Unit
        // rename ASIDE → rename IN → delete old (round-12 advisor fix):
        // a crash between the renames leaves the cell fully intact under
        // the dot-prefixed .old_cell= dir (invisible to scans; recovery:
        // rename it back), where the previous delete-then-rename order
        // had a window with the live cell gone and data only in staging
        fs.rename(cellDir, old): Unit
        fs.rename(staging, cellDir): Unit
        fs.delete(old, true): Unit
      }
    }
  }

  /** One Lloyd refinement step for the IVF quantizer — the RETRAIN action
    * [[rebalanceDue]] signals: each centroid moves to the MEAN of the
    * vectors its cell currently attracts (assignment by the OLD
    * centroids, max-dot — the same quantizer the lake serves with), and
    * a cell that attracts nothing keeps its old centroid. One corpus
    * pass + an ≤(cells × dim)-row collect (the fit-sized class: 8×64
    * here; on a cluster, centroid matrices are driver-resident by
    * construction — that's what makes IVF serveable).
    *
    * Determinism (the oracle contract): component sums are quantized to
    * 2⁻²⁰ with the mirrored half-away floor (the q370 rule — identical
    * IEEE ops in both engines, no round() semantics) and summed as
    * BIGINT — exact, order-free — then divided once in double. A double
    * mean would accumulate in reduction order and diverge between
    * engines/partitionings. */
  def lloydStep(corpus: DataFrame, vecCol: String,
                cents: Array[Array[Double]]): Array[Array[Double]] = {
    val q = 1048576.0 // 2^20
    val assigned = corpus
      .select(asDouble(col(vecCol)).as("nvec"))
      .withColumn("cell", element_at(
        exprColumn(graft.functions.TopDotIndices(
          asExpr(col("nvec")), cents, 1)), 1))
    val comp = assigned
      .select(col("cell"), posexplode(col("nvec")).as(Seq("i", "x")))
      .withColumn("qx",
        when(col("x") >= 0, floor(col("x") * q + 0.5))
          .otherwise(-floor(-col("x") * q + 0.5)).cast("long"))
      .groupBy("cell", "i")
      .agg(sum(col("qx")).as("s"), count(lit(1)).as("n"))
      .collect()
    val out = cents.map(_.clone)
    comp.foreach { r =>
      out(r.getInt(0))(r.getInt(1)) =
        r.getLong(2).toDouble / (r.getLong(3) * q)
    }
    out
  }

  /** Rebalance policy for the persisted lake — the vector-store analog
    * of Dedup.rebuildDue, with a sharper failure mode behind it: the
    * quantizer (centroid matrix) was trained on the BUILD corpus, and
    * appends assign new vectors to the NEAREST STALE centroid, so as the
    * appended fraction grows, cells drift from the training distribution
    * — hot cells stop pruning (a probe reads an ever-bigger share of the
    * lake) and new-region vectors pile into whichever old cell is least
    * wrong. Due when the lake outgrew its build by `factor`, when any
    * single cell did (hot-spot skew), or when a cell that was EMPTY at
    * build is now populated (vectors from a region the training never
    * saw). Firing signals a RETRAIN+rewrite — which changes assignments
    * and therefore answers, a deployment decision — not [[compactIvfLists]],
    * which is answer-preserving layout folding. Counts on both sides
    * come from parquet footers (count-only aggregates), no vector data
    * is read. */
  def rebalanceDue(spark: org.apache.spark.sql.SparkSession, path: String,
                   factor: Double = 3.0): Boolean = {
    require(factor > 1.0, "factor must exceed 1 (a fresh lake never fires)")
    val built = spark.read.parquet(s"$path/_build_hist")
    val now = spark.read.parquet(path).groupBy("cell")
      .agg(count(lit(1)).as("n_now"))
    val drift = now.join(built, Seq("cell"), "full_outer")
      .select(coalesce(col("n_now"), lit(0L)).as("n_now"),
        coalesce(col("n_built"), lit(0L)).as("n_built"))
      .filter(col("n_now") > col("n_built") * factor or
        (col("n_built") === 0 && col("n_now") > 0))
    val totals = now.agg(sum(col("n_now"))).head().getLong(0)
    val builtTotal = built.agg(sum(col("n_built"))).head().getLong(0)
    totals > builtTotal * factor || !drift.isEmpty
  }

  /** Serve one (small) query batch from persisted IVF lists: compute each
    * query's `nprobe` probe cells, collect the DISTINCT cell set to the
    * driver — bounded by nprobe × |batch|, and the batch is small by the
    * serving contract (this is the fit-sized collect class, not a data
    * collect) — then scan only those partitions as literal partition
    * predicates and rank candidates by exact cosine. Identical math and
    * tie-breaks to [[ivfKnnSeeded]]/`ivfSearch`, so results are
    * batching-independent and the persisted path shares the q45 oracle. */
  def serveIvfFromLists(spark: org.apache.spark.sql.SparkSession, path: String,
                        queries: DataFrame, idCol: String, vecCol: String,
                        k: Int, centroidMatrix: Array[Array[Double]],
                        nprobe: Int, dim: Int): DataFrame = {
    def topCells(vec: Column, n: Int): Column =
      exprColumn(graft.functions.TopDotIndices(asExpr(vec), centroidMatrix, n))
    val q0 = queries.select(col(idCol).as("query_id"),
        asDouble(col(vecCol)).as("qvec"))
      .withColumn("cell", explode(topCells(col("qvec"), nprobe)))
    val probeCells: Array[Int] = q0.select("cell").distinct()
      .collect().map(_.getInt(0))
    val lists = spark.read.parquet(path)
      .filter(col("cell").isin(probeCells.map(Integer.valueOf).toSeq: _*))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    val sim = if (dim > 0) cosineU(col("qvec"), col("nvec"), dim)
              else cosine(col("qvec"), col("nvec"))
    lists.join(broadcast(q0), "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), sim.as("sim"))
      .distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** LSH-bucketed ANN: join query probes and corpus on bucket, rank within
    * the probed candidate set. The corpus is bucketed once (per-row
    * expression); only the broadcast query side fans out to its multi-probe
    * buckets, so the join stays |corpus| × small. */
  def lshKnn(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, dim: Int, nPlanes: Int, k: Int,
             multiProbe: Boolean = true, probeRadius: Int = 1): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("nvec"),
      lshBucket(asDouble(col(vecCol)), dim, nPlanes).as("bucket"))
    val qBase = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qvec"),
      lshBucket(asDouble(col(vecCol)), dim, nPlanes).as("qbucket"))
    val q = broadcast(
      if (multiProbe)
        qBase.select(col("query_id"), col("qvec"),
          explode(probeBuckets(col("qbucket"), nPlanes, probeRadius)).as("bucket"))
      else qBase.withColumnRenamed("qbucket", "bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    c.join(q, "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineU(col("qvec"), col("nvec"), dim).as("sim"))
      .distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** Scalar int8 quantization of an embedding column — the storage-path
    * operator for a corpus-scale vector store: per-DIMENSION min/max over
    * the corpus, then code_d = round((v_d − min_d) · 255 / (max_d − min_d))
    * ∈ [0, 255] (0 when the dimension is constant). At 100 TB this is the
    * difference between scanning float32 and scanning a quarter of that,
    * with the codebook (2·dim doubles) riding along as metadata.
    *
    * Returns (idCol, codes array<int>, plus `mins`/`maxs` codebook columns
    * on every row for downstream dequantization). Engine-reproducible by
    * construction: float→double widening is exact, the affine arithmetic is
    * IEEE-identical in any engine evaluating the same expression shape, and
    * round-half-up on a nonnegative argument agrees across engines.
    *
    * Scale shape: one posexplode pass → per-dim min/max hash aggregate (dim
    * rows — dimension-sized), collapsed to a single codebook row with an
    * order-fixing sorted aggregate, broadcast; the quantize itself is a pure
    * per-row transform. No corpus-sized shuffle, no driver collect. */
  def quantizeInt8(embs: DataFrame, idCol: String, vecCol: String): DataFrame =
    applyInt8(embs, vecCol, int8Codebook(embs, vecCol))
      .select(col(idCol), col("codes"), col("mins"), col("maxs"))

  /** Per-dimension min/max codebook (ONE row: `mins`/`maxs` arrays) for
    * [[applyInt8]] — computed once over the corpus and reused for every
    * batch/query-set quantized against that corpus (codes from different
    * codebooks are incomparable). Dimension-sized aggregate, order fixed by
    * a sorted aggregate. */
  def int8Codebook(embs: DataFrame, vecCol: String): DataFrame = {
    val dims = embs.select(posexplode(col(vecCol)).as(Seq("d", "v")))
    val stats = dims.groupBy(col("d"))
      .agg(min(col("v").cast("double")).as("mn"),
        max(col("v").cast("double")).as("mx"))
    stats.agg(
      array_sort(collect_list(struct(col("d"), col("mn"), col("mx")))).as("__cb"))
      .select(
        transform(col("__cb"), s => s.getField("mn")).as("mins"),
        transform(col("__cb"), s => s.getField("mx")).as("maxs"))
  }

  /** Quantize `vecCol` against a one-row codebook from [[int8Codebook]]:
    * broadcast the codebook, per-row affine transform (pure expression). */
  def applyInt8(df: DataFrame, vecCol: String, codebook: DataFrame): DataFrame =
    df.crossJoin(broadcast(codebook))
      .withColumn("codes",
        transform(col(vecCol), (v, i) => {
          val mn = element_at(col("mins"), i + 1)
          val mx = element_at(col("maxs"), i + 1)
          // clamp to [0, 255]: the codebook is reused for later batches and
          // query sets, and a value outside the corpus min/max would
          // otherwise produce a code that violates the one-byte storage
          // contract (identity for in-range values, so oracle-neutral)
          when(mx === mn, lit(0))
            .otherwise(least(greatest(
              round((v.cast("double") - mn) * 255.0d / (mx - mn)).cast("int"),
              lit(0)), lit(255)))
        }))

  /** Dequantize int8 codes back to doubles via the codebook columns
    * [[quantizeInt8]] attaches: v̂_d = min_d + code_d · (max_d − min_d)/255.
    * Max absolute error per dimension is half a quantization step,
    * (max_d − min_d)/510 — asserted by spec. */
  def dequantizeInt8(quantized: DataFrame, codesCol: String = "codes"): DataFrame =
    quantized.withColumn("decoded",
      transform(col(codesCol), (c, i) => {
        val mn = element_at(col("mins"), i + 1)
        val mx = element_at(col("maxs"), i + 1)
        mn + c.cast("double") * (mx - mn) / 255.0d
      }))

  /** ANN over the int8-quantized store — the compressed-scan + exact-rerank
    * recipe (SCANN/DiskANN shape): score every corpus row against the
    * broadcast query set on DEQUANTIZED int8 codes (a quarter of the float32
    * scan bytes — at 100 TB the scan, not the arithmetic, is the budget),
    * take the top `k·candMult` candidates per query by reconstructed cosine,
    * then rerank ONLY those with exact float cosine and keep `k`.
    *
    * Candidates are ranked on the RECONSTRUCTED values (codebook affine,
    * ≤ half-step error per dimension), not on raw code dot products: the
    * storage codes are offset-affine (min/max per dimension), so a raw
    * integer dot is dominated by the per-vector code-sum offset and ranks
    * garbage — measured recall@5 collapsed to 0.1 on the fixture. The
    * reconstruction arithmetic is the same IEEE expression shape in any
    * engine, so the candidate ranking is engine-exact without a rounding
    * contract. The candidate window carries IDS ONLY — full-precision
    * vectors re-join on the candidate set (tiny), never ride the corpus-wide
    * shuffle. Composes with [[ivfKnn]]/[[lshKnn]] bucketing when even the
    * code scan must be pruned. */
  def int8Knn(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, dim: Int, candMult: Int = 4): DataFrame = {
    require(k > 0 && candMult >= 1, "need k > 0 and candMult >= 1")
    val cb = int8Codebook(corpus, vecCol)
    def deq(codes: Column): Column =
      transform(codes, (cc, i) => {
        val mn = element_at(col("mins"), i + 1)
        val mx = element_at(col("maxs"), i + 1)
        mn + cc.cast("double") * (mx - mn) / 255.0d
      })
    // dequantize ONCE PER ROW (projection before the join), never per pair
    val c = applyInt8(corpus, vecCol, cb)
      .select(col(idCol).as("neighbor_id"), deq(col("codes")).as("__nd"))
    val q = applyInt8(queries, vecCol, cb)
      .select(col(idCol).as("query_id"), deq(col("codes")).as("__qd"))
    val isc = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineU(col("__nd"), col("__qd"), dim).as("__csim"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("__csim").desc, col("neighbor_id").asc)
    val cand = isc.withColumn("__crank", row_number().over(wc))
      .filter(col("__crank") <= k * candMult)
      .select("query_id", "neighbor_id")
    val cv = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("__nv"))
    val qv = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("__qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("__sim").desc, col("neighbor_id").asc)
    cand.join(cv, "neighbor_id").join(broadcast(qv), "query_id")
      .withColumn("__sim", cosineU(col("__qv"), col("__nv"), dim))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("int").as("rank"), round(col("__sim"), 6).as("sim"))
  }

  /** Product-quantization ANN (the FAISS PQ/ADC recipe) with deterministic
    * codebooks: the corpus stores `m` one-byte codes per vector (8 bytes vs
    * 256 for float32-dim-64 — a 32× scan shrink, the next compression step
    * after [[int8Knn]]'s 4×), queries score candidates by asymmetric
    * distance (exact distance from the query to each RECONSTRUCTED corpus
    * vector), and the top `k·candMult` candidate ids rerank with exact float
    * cosine.
    *
    * Encoding: per subspace `s`, code = argmin_c ‖x_s − C_{s,c}‖², computed
    * as argmax ⟨[x_s, 1], [C_{s,c}, −‖C_{s,c}‖²/2]⟩ through the native
    * [[graft.functions.TopDotIndices]] loop (the augmented-bias trick turns
    * nearest-centroid into the inner-product form the expression already
    * ranks, ties to the lower code — same argmin). ADC uses the identity
    * ‖q−x̂‖² = ‖q‖² − 2⟨q,x̂⟩ + ‖x̂‖²: ‖x̂‖² is per-DOC (once), ‖q‖² per-QUERY
    * (once), and only the ⟨q,x̂⟩ native loop runs per pair. Candidate
    * windows carry ids only; reconstruction happens once per row before the
    * join (the [[int8Knn]] discipline). Every arithmetic step is the same
    * IEEE expression shape in external SQL, so the full pipeline — codebook
    * sampling, assignment argmin, ADC ranking, rerank — is exactly
    * oracle-able (via [[pqSampledCodebooks]]' md5 row selection). */
  def pqKnnSeeded(corpus: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, k: Int, m: Int = 8, ksub: Int = 16,
                  dim: Int = 64, candMult: Int = 4): DataFrame = {
    require(dim % m == 0, "dim must divide into m subspaces")
    require(k > 0 && candMult >= 1, "need k > 0 and candMult >= 1")
    val subDim = dim / m
    val books = pqSampledCodebooks(corpus, idCol, vecCol, m, ksub, subDim)
    // assignment matrices with the L2 bias folded into an extra column
    val mats: Array[Array[Array[Double]]] =
      books.map(_.map(w => w :+ (-w.map(x => x * x).sum / 2.0)))
    def codeOf(vec: Column, s: Int): Column =
      element_at(exprColumn(graft.functions.TopDotIndices(
        asExpr(concat(slice(vec, s * subDim + 1, subDim), array(lit(1.0d)))),
        mats(s), 1)), 1)
    val flatBooks: Array[Double] = books.flatMap(_.flatMap(_.toSeq))
    val flatLit = typedLit(flatBooks)
    def reconstruct(codes: Column): Column =
      flatten(transform(codes, (code, s) =>
        transform(sequence(lit(0), lit(subDim - 1)),
          d => element_at(flatLit, s * (ksub * subDim) + code * subDim + d + 1))))
    val cEnc = corpus
      .select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("__nv"))
      .withColumn("__codes", array((0 until m).map(s => codeOf(col("__nv"), s)): _*))
      .withColumn("__xhat", reconstruct(col("__codes")))
      .withColumn("__xx", dotU(col("__xhat"), col("__xhat"), dim))
      .select("neighbor_id", "__xhat", "__xx")
    val q0 = queries
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("__qv"))
      .withColumn("__qq", dotU(col("__qv"), col("__qv"), dim))
    val adc = cEnc.crossJoin(broadcast(q0))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (col("__qq") - lit(2.0d) * dotU(col("__qv"), col("__xhat"), dim) + col("__xx"))
          .as("__adc"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("__adc").asc, col("neighbor_id").asc)
    val cand = adc.withColumn("__crank", row_number().over(wc))
      .filter(col("__crank") <= k * candMult)
      .select("query_id", "neighbor_id")
    val cv = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("__nv"))
    val qv = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("__qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("__sim").desc, col("neighbor_id").asc)
    cand.join(cv, "neighbor_id").join(broadcast(qv), "query_id")
      .withColumn("__sim", cosineU(col("__qv"), col("__nv"), dim))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("int").as("rank"), round(col("__sim"), 6).as("sim"))
  }

  /** One distributed k-means EM step: assign every corpus vector to its
    * nearest of `k` DATA-SAMPLED centroids (the [[pqSampledCodebooks]]
    * md5 row selection — key-stable, engine-reproducible), then recompute
    * per-cluster per-dimension means. Long-form output
    * `(cluster, dim, n, mean_val)` keeps downstream joins and the oracle
    * on a plain GROUP BY grain. Iterating this to a fit is the caller's
    * loop (see [[ivfKnn]] for the MLlib-fitted production variant); ONE
    * step is the oracle-exact building block.
    *
    * Assignment is argmin-L2 via the augmented-bias trick — argmax
    * ⟨[x,1],[w,−‖w‖²/2]⟩ through the native [[graft.functions.TopDotIndices]]
    * codegen loop, ties to the lower cluster id (the q106 kernel).
    * Means: components rounded to 6 dp, summed as EXACT decimals, ONE
    * final double division — engine-order-free.
    *
    * Scale shape: the centroid fit is a bounded k-row collect (model fit,
    * not a data path); assignment is a per-row constant-size loop; the M
    * step is one hash agg over the k·dim group grain with map-side
    * partials. The posexplode reads only the vector column. */
  def kmeansStep(vecs: DataFrame, idCol: String, vecCol: String,
                 k: Int, dim: Int): DataFrame = {
    val cent: Array[Array[Double]] = vecs
      .select(asDouble(col(vecCol)).as("v"),
        conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
          .cast("long").as("h"),
        col(idCol).cast("long").as("i"))
      .orderBy(col("h").asc, col("i").asc).limit(k)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    require(cent.length == k, s"corpus has fewer than $k rows")
    val mats = cent.map(w => w :+ (-w.map(x => x * x).sum / 2.0))
    vecs
      .select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .withColumn("cluster", element_at(exprColumn(graft.functions.TopDotIndices(
        asExpr(concat(col("__v"), array(lit(1.0d)))), mats, 1)), 1))
      .select(col("cluster"), posexplode(col("__v")).as(Seq("dim", "x")))
      .groupBy(col("cluster"), col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("x"), 6).cast("decimal(18,6)")).as("__s"))
      .select(col("cluster"), col("dim"), col("n"),
        (col("__s").cast("double") / col("n").cast("double")).as("mean_val"))
  }

  /** SemDeDup — SEMANTIC deduplication by cluster-then-prune (Abbas et al.
    * 2023): assign every vector to its nearest data-sampled centroid (the
    * [[kmeansStep]] assignment kernel, argmin-L2 via the augmented-bias
    * TopDotIndices codegen loop, ties to the lower cluster id), then inside
    * each cluster drop every vector that has ANY same-cluster neighbor with
    * a SMALLER id and cosine ≥ `threshold` (the deterministic keep-earliest
    * rule — the published recipe keeps one exemplar per ε-neighborhood;
    * anchoring on the min id makes the survivor set order-free and
    * engine-reproducible without a closure pass).
    *
    * Returns one row per cluster: size, drop count, and ORDER-INSENSITIVE
    * 56-bit md5-XOR checksums of the kept and dropped id sets (the q440
    * manifest trick) — the gate proves the exact MEMBERSHIP of both sets,
    * not just their cardinality, while staying k-row small.
    *
    * Scale shape — the whole point of SemDeDup at 100 TB: the pairwise
    * stage is confined to single-cluster partitions, so with k chosen ~n/C
    * (bounded mean cluster size C) the quadratic term is n·C, not n²; the
    * cluster equi-join shuffles each side once on the cluster key, cosines
    * run in the constant-size native codegen loop, and nothing but the
    * k-row centroid fit ever reaches the driver. */
  def semDedup(vecs: DataFrame, idCol: String, vecCol: String,
               k: Int, dim: Int, threshold: Double): DataFrame = {
    val cent: Array[Array[Double]] = vecs
      .select(asDouble(col(vecCol)).as("v"),
        conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
          .cast("long").as("h"),
        col(idCol).cast("long").as("i"))
      .orderBy(col("h").asc, col("i").asc).limit(k)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    require(cent.length == k, s"corpus has fewer than $k rows")
    val mats = cent.map(w => w :+ (-w.map(x => x * x).sum / 2.0))
    val assigned = vecs
      .select(col(idCol).as("__id"), asDouble(col(vecCol)).as("__v"))
      .withColumn("cluster", element_at(exprColumn(graft.functions.TopDotIndices(
        asExpr(concat(col("__v"), array(lit(1.0d)))), mats, 1)), 1))
    val a = assigned.select(col("cluster"), col("__id").as("__aid"),
      col("__v").as("__av"))
    val b = assigned.select(col("cluster"), col("__id").as("__bid"),
      col("__v").as("__bv"))
    // a vector is dropped iff SOME smaller-id cluster-mate is ≥ threshold;
    // the 6-dp round before the compare keeps the boundary engine-free
    // (q51 discipline), the distinct collapses the pair table back to the
    // dropped-id set before anything else touches it
    val drops = b.as("b").join(a.as("a"),
        col("b.cluster") === col("a.cluster") &&
          col("a.__aid") < col("b.__bid"))
      .filter(round(cosineU(col("a.__av"), col("b.__bv"), dim), 6)
        >= threshold)
      .select(col("b.cluster").as("cluster"), col("b.__bid").as("__id"))
      .distinct()
    assigned.select(col("cluster"), col("__id"))
      .join(drops.withColumn("__isdrop", lit(1L)),
        Seq("cluster", "__id"), "left")
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(coalesce(col("__isdrop"), lit(0L))).as("n_dropped"),
        expr("bit_xor(case when __isdrop is null then " +
          "cast(conv(substring(md5(cast(__id as string)), 1, 14), 16, 10) " +
          "as bigint) else 0L end)").as("kept_xor"),
        expr("bit_xor(case when __isdrop = 1 then " +
          "cast(conv(substring(md5(cast(__id as string)), 1, 14), 16, 10) " +
          "as bigint) else 0L end)").as("dropped_xor"))
  }

  /** PCA first principal component via deterministic power iteration —
    * the dimensionality-reduction head of the embedding stack (whitening,
    * drift monitoring, the classic pre-step before coarse ANN quantizers;
    * q423's JL projection is the data-oblivious sibling, this is the
    * data-ADAPTED axis). Returns one row per vector: its signed
    * projection on the dominant covariance eigenvector.
    *
    * Determinism contract (everything cross-engine exact, NO sqrt/ln):
    *  1. components quantize to integer centi-units (half-away rounding),
    *     shifted +1000 so every later division is on positives;
    *  2. the per-dimension mean is a PINNED integer centi
    *     ((2S+n) div 2n — truncating = flooring on positives), so
    *     centered components z are small exact integers;
    *  3. the d×d covariance Gram G = Σ z·zᵀ is an exact int64 hash
    *     aggregate (|z| ≤ ~2·10³ centi ⇒ no overflow at any SF);
    *  4. `rounds` lockstep iterations v ← G·v, each matrix-vector
    *     product summed as exact milli-integers (per-term half-away
    *     floor), renormalized by the max-|component| (an INTEGER max —
    *     no norm, no sqrt), components re-pinned to 6 dp;
    *  5. scores are exact milli-integer sums of z·v terms, one final
    *     division.
    * The eigensolve itself is a bounded model fit (d² = 4096 cells on
    * the driver — the PQ-codebook/k-means precedent); the corpus only
    * ever flows through hash aggregates and one broadcast-vector scan.
    * Power iteration converges at (λ₂/λ₁)^k; `rounds` is a FIXED
    * iteration budget both engines unroll identically, so the gate is
    * exact whether or not the ratio has fully settled. */
  def pcaPowerScores(emb: DataFrame, idCol: String, labelCol: String,
                     vecCol: String, dim: Int = 64,
                     rounds: Int = 24): DataFrame = {
    require(dim >= 2 && dim <= 128, "pcaPowerScores: dim must be in [2,128]")
    require(rounds >= 1 && rounds <= 64,
      "pcaPowerScores: rounds must be in [1,64]")
    // half-away-from-zero rounding to integer `scale`-units, as a Column
    def qhalf(c: Column, scale: Double): Column =
      when(c >= 0, floor(c * lit(scale) + lit(0.5d)))
        .otherwise(-floor(-c * lit(scale) + lit(0.5d))).cast("long")
    val y = emb.select(col(idCol), col(labelCol),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("__d", "__x")))
      // a vector longer than `dim` would index past the driver-side Gram
      // matrix — fail the JOB with a clear message, not the driver loop
      // with ArrayIndexOutOfBounds
      .withColumn("__d", when(col("__d") < dim, col("__d"))
        .otherwise(raise_error(concat(
          lit(s"pcaPowerScores: embedding dimension exceeds dim=$dim at position "),
          col("__d").cast("string")))))
      .select(col(idCol), col(labelCol), col("__d"),
        (qhalf(col("__x"), 100.0) + lit(1000L)).as("__y"))
    val mu = y.groupBy(col("__d"))
      .agg(sum(col("__y")).as("__s"), count(lit(1)).as("__n"))
      .select(col("__d"),
        expr("(2 * __s + __n) div (2 * __n)").as("__mu"))
    val z = y.join(broadcast(mu), Seq("__d"))
      .select(col(idCol), col(labelCol), col("__d"),
        (col("__y") - col("__mu")).as("__z"))
    // d×d exact-integer Gram: self-join on the row id, hash-agg to d² cells
    val g = z.select(col(idCol), col("__d").as("__i"), col("__z").as("__zi"))
      .join(z.select(col(idCol), col("__d").as("__j"), col("__z").as("__zj")),
        Seq(idCol))
      .groupBy(col("__i"), col("__j"))
      .agg(sum(col("__zi") * col("__zj")).as("__g"))
    // bounded model fit: d² cells to the driver (4096 longs at dim=64)
    val gm = Array.ofDim[Long](dim, dim)
    g.collect().foreach { r =>
      gm(r.getAs[Number]("__i").intValue)(r.getAs[Number]("__j").intValue) =
        r.getAs[Long]("__g")
    }
    def floorHalf(x: Double): Double =
      if (x >= 0) math.floor(x + 0.5d) else -math.floor(-x + 0.5d)
    var v = Array.fill(dim)(1.0d)
    var it = 0
    while (it < rounds) {
      val w = new Array[Long](dim)
      var i = 0
      while (i < dim) {
        var acc = 0L
        var j = 0
        while (j < dim) { // exact milli-integer terms: order-free sum
          acc += floorHalf(gm(i)(j).toDouble * v(j) * 1000.0d).toLong
          j += 1
        }
        w(i) = acc
        i += 1
      }
      val m = w.map(math.abs).max
      v = w.map { wi =>
        if (m == 0L) 0.0d
        else floorHalf(wi.toDouble / m.toDouble * 1000000.0d) / 1000000.0d
      }
      it += 1
    }
    val vdf = broadcast(emb.sparkSession
      .createDataFrame(emb.sparkSession.sparkContext
        .parallelize(v.toSeq.zipWithIndex.map { case (x, d) =>
          org.apache.spark.sql.Row(d, x) }, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("__d",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("__v",
            org.apache.spark.sql.types.DoubleType)))))
    z.join(vdf, Seq("__d"))
      .withColumn("__t", qhalf(col("__z") * col("__v"), 1000.0))
      .groupBy(col(idCol), col(labelCol))
      .agg((sum(col("__t")).cast("double") / lit(100000.0d)).as("pc1"))
  }
}
