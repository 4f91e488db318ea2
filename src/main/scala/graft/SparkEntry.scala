package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import graft.operators.{Dedup, Joins, Similarity, TextOps, Relational => R}
import graft.functions.Scalars

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a matching DuckDB oracle in `oracleSql`
  * computing the same result with the same column names. Monetary/value
  * aggregates are computed in `decimal(18,2)` on BOTH sides so sums are exact
  * and engine-independent (double summation order would otherwise diverge).
  */
object SparkEntry {
  private val D = "decimal(18,2)"

  /** One SQL text shared verbatim by the Spark SQL surface (q49) and its
    * DuckDB oracle — revenue per supplier nation in a region and date range
    * (TPC-H Q5 shape over the fixture star schema).
    *
    * Every decimal aggregate in this file is summed exactly in decimal and
    * then cast to double as the FINAL output: engines widen decimal sums to
    * different precisions (Spark → decimal(28,2), DuckDB → decimal(38,2)),
    * which breaks byte-level hash parity even when values agree; exact
    * decimal → double is deterministic and identical in both engines. */
  private val RegionRevenueSql: String =
    """SELECT n_name,
       cast(sum(cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(18,2)))) as double) AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1999-01-01'
       GROUP BY n_name"""

  /** Shared verbatim by the Spark SQL surface (q104) and its DuckDB oracle:
    * explicit GROUPING SETS — per-status totals, per-year totals, and the
    * grand total in one aggregate pass (Spark expands to one Expand + one
    * hash aggregate; never three scans). */
  private val GroupingSetsSql: String =
    """SELECT o_orderstatus, cast(year(o_orderdate) AS bigint) AS yr,
       count(*) AS n,
       cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS total
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus), (yr), ())"""

  /** Generated DuckDB oracle for q111: five unrolled PageRank iterations
    * over the undirected customer↔supplier graph. Float literals are cast
    * to double explicitly — DuckDB evaluates bare `1 - 0.85` in EXACT
    * decimal (0.15), while Spark's `lit(1.0 - 0.85)` is the IEEE double
    * 0.15000000000000002; the casts force the identical IEEE operations. */
  private val PageRankOracleSql: String = {
    val pairSql =
      """SELECT DISTINCT 'c' || cast(o_custkey AS varchar) AS src,
                         's' || cast(l_suppkey AS varchar) AS dst
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey"""
    val base =
      s"""WITH ed AS (SELECT src, dst FROM ($pairSql) p
            UNION ALL
            SELECT dst AS src, src AS dst FROM ($pairSql) p2),
          deg AS (SELECT src, count(*) AS deg FROM ed GROUP BY 1),
          nodes AS (SELECT DISTINCT node FROM (
            SELECT src AS node FROM ed UNION ALL SELECT dst FROM ed) u),
          st AS (SELECT cast(count(*) AS double) AS n FROM nodes),
          r0 AS (SELECT node, cast(1.0 AS double) / st.n AS r FROM nodes, st)"""
    val iterSql = (1 to 5).map { k =>
      s""",
          inf$k AS (SELECT e.dst AS node,
               cast(sum(cast(round(r.r / d.deg, 12) AS decimal(38,12))) AS double) AS inflow
             FROM ed e JOIN r${k - 1} r ON e.src = r.node JOIN deg d ON e.src = d.src
             GROUP BY 1),
          r$k AS (SELECT n.node,
               round((cast(1 AS double) - cast(0.85 AS double)) / st.n
                 + cast(0.85 AS double) * coalesce(i.inflow, cast(0 AS double)), 12) AS r
             FROM nodes n CROSS JOIN st LEFT JOIN inf$k i ON n.node = i.node)"""
    }.mkString
    base + iterSql + "\n          SELECT node, r FROM r5"
  }

  /** Generated DuckDB oracle for q296: six unrolled k-core peel rounds over
    * the same undirected customer↔supplier graph as q111 — each round keeps
    * the nodes whose degree WITHIN the surviving subgraph is ≥ k. Pure
    * integer counting, so the Spark loop and this unrolled SQL agree
    * bit-for-bit (the PageRank unrolled-iteration discipline). */
  private val KCoreOracleSql: String = {
    val rounds = 6
    val k = 5
    val base =
      """WITH pairs AS (SELECT DISTINCT 'c' || cast(o_custkey AS varchar) AS src,
               's' || cast(l_suppkey AS varchar) AS dst
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
          edges AS MATERIALIZED (SELECT src, dst FROM pairs
            UNION ALL SELECT dst AS src, src AS dst FROM pairs),
          n0 AS MATERIALIZED (SELECT DISTINCT src AS v FROM edges)"""
    val iterSql = (1 to rounds).map { r =>
      s""",
          d$r AS MATERIALIZED (SELECT e.src AS v, cast(count(*) AS bigint) AS c
             FROM edges e
             JOIN n${r - 1} a ON e.src = a.v
             JOIN n${r - 1} b ON e.dst = b.v
             GROUP BY 1),
          n$r AS MATERIALIZED (SELECT v FROM d$r WHERE c >= $k)"""
    }.mkString
    base + iterSql +
      s"\n          SELECT v AS node, c AS degree FROM d$rounds WHERE c >= $k"
  }

  /** Generated DuckDB oracle for q307: three unrolled IRLS (Newton)
    * iterations of 2-feature logistic regression. Per-row gradient/Hessian
    * terms are rounded then decimal-summed, coefficients rounded to 8 dp
    * between rounds, and the 3×3 cofactor solve is written with the exact
    * expression text of the Scala driver solve — the q111 unrolled-
    * iteration discipline applied to model training. The β=0 start makes
    * iteration 1 exp-free (p = 0.5 exactly). */
  private val LogisticOracleSql: String = {
    val iters = 3
    def sumsCte(k: Int, b0: String, b1: String, b2: String): String = {
      val from =
        if (k == 1) "feats"
        else s"feats CROSS JOIN b${k - 1}"
      s""",
         s$k AS (SELECT
             cast(count(*) AS bigint) AS n,
             cast(sum(cast(round(y - p, 6) AS decimal(18,6))) AS double) AS g0,
             cast(sum(cast(round((y - p) * x1, 6) AS decimal(18,6))) AS double) AS g1,
             cast(sum(cast(round((y - p) * x2, 6) AS decimal(18,6))) AS double) AS g2,
             cast(sum(cast(round(w, 6) AS decimal(18,6))) AS double) AS h00,
             cast(sum(cast(round(w * x1, 6) AS decimal(18,6))) AS double) AS h01,
             cast(sum(cast(round(w * x2, 6) AS decimal(18,6))) AS double) AS h02,
             cast(sum(cast(round(w * x1 * x1, 6) AS decimal(18,6))) AS double) AS h11,
             cast(sum(cast(round(w * x1 * x2, 6) AS decimal(18,6))) AS double) AS h12,
             cast(sum(cast(round(w * x2 * x2, 6) AS decimal(18,6))) AS double) AS h22
           FROM (SELECT y, x1, x2, p, p * (1.0 - p) AS w
             FROM (SELECT y, x1, x2,
                 1.0 / (1.0 + exp(-($b0 + $b1 * x1 + $b2 * x2))) AS p
               FROM $from) ip) iw),
         c$k AS (SELECT *,
             h11 * h22 - h12 * h12 AS cA, h02 * h12 - h01 * h22 AS cB,
             h01 * h12 - h02 * h11 AS cC, h00 * h22 - h02 * h02 AS cD,
             h01 * h02 - h00 * h12 AS cE, h00 * h11 - h01 * h01 AS cF
           FROM s$k),
         b$k AS (SELECT
             round($b0 + (cA * g0 + cB * g1 + cC * g2)
               / (h00 * cA + h01 * cB + h02 * cC), 8) AS b0,
             round($b1 + (cB * g0 + cD * g1 + cE * g2)
               / (h00 * cA + h01 * cB + h02 * cC), 8) AS b1,
             round($b2 + (cC * g0 + cE * g1 + cF * g2)
               / (h00 * cA + h01 * cB + h02 * cC), 8) AS b2
           FROM c$k${if (k == 1) "" else s" CROSS JOIN b${k - 1}"})"""
    }
    val body = (1 to iters).map { k =>
      if (k == 1) sumsCte(k, "0.0", "0.0", "0.0")
      else sumsCte(k, s"b${k - 1}.b0", s"b${k - 1}.b1", s"b${k - 1}.b2")
    }.mkString
    s"""WITH feats AS MATERIALIZED (SELECT cast(event_type = 'purchase' AS int) AS y,
             value / 100 AS x1, hour(ts) / 24.0 AS x2 FROM events)$body
         SELECT (SELECT cast(count(*) AS bigint) FROM feats) AS n,
           $iters AS iters,
           b0 + 0.0 AS b0, b1 + 0.0 AS b1, b2 + 0.0 AS b2,
           (SELECT round(cast(sum(cast(round(
               y * ln(p) + (1 - y) * ln(1.0 - p), 6) AS decimal(18,6)))
               AS double), 6) + 0.0
             FROM (SELECT y,
                 1.0 / (1.0 + exp(-(b$iters.b0 + b$iters.b1 * x1
                   + b$iters.b2 * x2))) AS p
               FROM feats CROSS JOIN b$iters) lp) AS log_likelihood
         FROM b$iters"""
  }

  /** Generated DuckDB oracle for q311: five unrolled greedy set-cover
    * rounds — round k picks the document with the most shingles outside
    * cov(k−1) (gain desc, id asc), then folds its shingles in. Pure
    * integer counting over the q36 shingle grain, so the Spark loop and
    * this unrolled SQL agree exactly. */
  private val GreedyCoverOracleSql: String = {
    val rounds = 5
    val base =
      """WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
          toks AS (SELECT doc_id, list_distinct(list_transform(
              generate_series(1, len(w) - 2),
              i -> array_to_string(w[i:i+2], ' '))) AS t
            FROM t0 WHERE len(w) >= 3),
          ds AS MATERIALIZED (SELECT doc_id, unnest(t) AS s FROM toks),
          g1 AS (SELECT doc_id, cast(count(*) AS bigint) AS gain
            FROM ds GROUP BY 1),
          w1 AS (SELECT doc_id, gain FROM g1
            ORDER BY gain DESC, doc_id ASC LIMIT 1),
          cov1 AS MATERIALIZED (SELECT DISTINCT s FROM ds JOIN w1 USING (doc_id))"""
    val iterSql = (2 to rounds).map { k =>
      val notIn = (1 until k).map(j => s"SELECT doc_id FROM w$j")
        .mkString(" UNION ALL ")
      s""",
          g$k AS (SELECT doc_id, cast(count(*) AS bigint) AS gain
            FROM ds ANTI JOIN cov${k - 1} USING (s)
            WHERE doc_id NOT IN ($notIn) GROUP BY 1),
          w$k AS (SELECT doc_id, gain FROM g$k
            ORDER BY gain DESC, doc_id ASC LIMIT 1),
          cov$k AS MATERIALIZED (SELECT s FROM cov${k - 1}
            UNION SELECT s FROM ds JOIN w$k USING (doc_id))"""
    }.mkString
    val rows = (1 to rounds).map { k =>
      s"""SELECT $k AS round, doc_id, gain,
          (SELECT cast(count(*) AS bigint) FROM cov$k) AS covered_total
          FROM w$k"""
    }.mkString("\n          UNION ALL ")
    s"$base$iterSql\n          $rows"
  }

  /** Shared verbatim by the Spark SQL surface (q317) and its DuckDB
    * oracle: `GROUP BY ALL` — group on every non-aggregate select item,
    * the analyst-ergonomics syntax both engines support natively. */
  private val GroupByAllSql: String =
    """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
       cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS total
       FROM orders GROUP BY ALL"""

  /** Generated DuckDB oracle for q326: the windowed polynomial hash
    * recomputed per position from the explicit 16-term sum (B^j mod M
    * powers inlined as a literal list) — same arithmetic as the O(n)
    * incremental kernel, so boundaries agree exactly. */
  private val CdcOracleSql: String = {
    val w = graft.functions.CdcBounds.W
    val b = graft.functions.CdcBounds.B
    val m = graft.functions.CdcBounds.M
    val mask = graft.functions.CdcBounds.Mask
    val powers = Iterator.iterate(1L)(p => p * b % m).take(w).toSeq
    val powList = powers.mkString("[", ", ", "]")
    s"""WITH t AS (SELECT doc_id, source, text,
            cast(length(text) AS int) AS n
          FROM documents WHERE length(text) > 0),
        pos AS (SELECT doc_id, source, text, n,
            unnest(generate_series(1, n)) AS i FROM t),
        hs AS (SELECT doc_id, i AS e FROM pos
          WHERE i >= $w
            AND (list_sum(list_transform(generate_series(0, ${w - 1}),
              j -> ord(substr(text, cast(i - j AS int), 1))
                * ($powList)[j + 1])) % $m) % $mask = 0),
        cuts AS (SELECT doc_id, e FROM hs
          UNION SELECT doc_id, n AS e FROM t),
        ordered AS (SELECT c.doc_id, t.source, t.text, e,
            lag(e) OVER (PARTITION BY c.doc_id ORDER BY e) AS pe
          FROM cuts c JOIN t ON c.doc_id = t.doc_id),
        chunks AS (SELECT doc_id, source,
            substr(text, cast(coalesce(pe, 0) + 1 AS int),
              cast(e - coalesce(pe, 0) AS int)) AS chunk
          FROM ordered)
        SELECT source, cast(count(DISTINCT doc_id) AS bigint) AS n_docs,
          cast(count(*) AS bigint) AS total_chunks,
          cast(count(DISTINCT chunk) AS bigint) AS distinct_chunks,
          round(1.0 - cast(count(DISTINCT chunk) AS double)
            / cast(count(*) AS double), 6) + 0.0 AS dedup_ratio
        FROM chunks GROUP BY 1"""
  }

  /** Generated DuckDB oracle for q327: three unrolled HITS rounds
    * (authority-from-hubs then hubs-from-authorities, max-normalized and
    * 12-dp-rounded between steps) plus the final authority pass — the
    * PageRank unrolled-iteration discipline on the bipartite graph. */
  private val HitsOracleSql: String = {
    val iters = 3
    val base =
      """WITH pairs AS MATERIALIZED (SELECT DISTINCT 'c' || cast(o_custkey AS varchar) AS src,
               's' || cast(l_suppkey AS varchar) AS dst
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
          h0 AS MATERIALIZED (SELECT DISTINCT src AS node,
              cast(1.0 AS decimal(26,12)) AS h FROM pairs)"""
    def aStep(k: Int): String =
      s""",
          a${k}r AS MATERIALIZED (SELECT dst, sum(h) AS a FROM pairs
            JOIN h${k - 1} ON src = node GROUP BY 1),
          a$k AS MATERIALIZED (SELECT dst AS node,
              cast(round(cast(a AS double)
                / cast((SELECT max(a) FROM a${k}r) AS double), 12)
                AS decimal(26,12)) AS a
            FROM a${k}r)"""
    def hStep(k: Int): String =
      s""",
          h${k}r AS MATERIALIZED (SELECT src, sum(a) AS h FROM pairs
            JOIN a$k ON dst = node GROUP BY 1),
          h$k AS MATERIALIZED (SELECT src AS node,
              cast(round(cast(h AS double)
                / cast((SELECT max(h) FROM h${k}r) AS double), 12)
                AS decimal(26,12)) AS h
            FROM h${k}r)"""
    val body = (1 to iters).map(k => aStep(k) + hStep(k)).mkString
    val fin = aStep(iters + 1)
    s"""$base$body$fin
          SELECT node, 'hub' AS kind, cast(h AS double) AS score FROM h$iters
          UNION ALL
          SELECT node, 'authority' AS kind, cast(a AS double) AS score
          FROM a${iters + 1}"""
  }

  /** Generated DuckDB oracle for q332: twenty unrolled value-iteration
    * rounds of x = Qx + b on the 5-state event chain (absorbing
    * purchase=1 / error=0 pinned each round; 12-dp-rounded terms summed
    * as exact decimals; q142's 6-dp transition probabilities). */
  private val AbsorptionOracleSql: String = {
    val rounds = 20
    val base =
      """WITH seq AS (SELECT event_type,
              lead(event_type) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS next_type
            FROM events),
          cnt AS (SELECT event_type AS f, next_type AS t, count(*) AS n
            FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
          trans AS MATERIALIZED (SELECT f, t,
              round(cast(n AS double) /
                cast(sum(n) OVER (PARTITION BY f) AS double), 6) AS p
            FROM cnt),
          states AS MATERIALIZED (SELECT DISTINCT f AS s FROM trans),
          x0 AS (SELECT s, CASE WHEN s = 'purchase' THEN 1.0
              WHEN s = 'error' THEN 0.0 ELSE 0.0 END AS x
            FROM states)"""
    val iterSql = (1 to rounds).map { k =>
      s""",
          x$k AS MATERIALIZED (
            SELECT s, x FROM x${k - 1} WHERE s IN ('purchase', 'error')
            UNION ALL
            SELECT tr.f AS s,
              cast(sum(cast(round(tr.p * xp.x, 12) AS decimal(18,12)))
                AS double) AS x
            FROM trans tr JOIN x${k - 1} xp ON tr.t = xp.s
            WHERE tr.f NOT IN ('purchase', 'error')
            GROUP BY 1)"""
    }.mkString
    base + iterSql +
      s"""
          SELECT s AS event_type,
            round(round(x, 12), 6) + 0.0 AS p_convert_before_error
          FROM x$rounds WHERE s NOT IN ('purchase', 'error')"""
  }

  /** Generated DuckDB oracle for q478 (Markov removal-effect
    * attribution): the q332 machinery extended with a virtual 'start'
    * state (per-user first event) and a '__null' absorber (journey end
    * without purchase), journeys truncated at the first purchase — then
    * FIVE scenarios unrolled (full chain + one per removed channel,
    * edges into the removed channel redirected to '__null', its outgoing
    * row dropped), 20 value-iteration rounds each, 12-dp-rounded terms
    * summed as exact decimals. Removal effects and shares come off the
    * scenarios' start-state values in mirrored floors. */
  private val MarkovRemovalOracleSql: String = {
    val rounds = 20
    val channels = Seq("click", "view", "signup", "error")
    val base =
      """WITH j AS (SELECT user_id, ts, event_id, event_type,
              coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1
                  ELSE 0 END) OVER (PARTITION BY user_id
                ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS prior_purchases
            FROM events),
          jj AS (SELECT user_id, ts, event_id, event_type
            FROM j WHERE prior_purchases = 0),
          hops AS (SELECT f, t FROM (
              SELECT event_type AS f,
                coalesce(lead(event_type) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id), '__null') AS t
              FROM jj) h
            WHERE f <> 'purchase'),
          starts AS (SELECT 'start' AS f, arg_min(event_type,
                printf('%020d%020d', epoch_us(ts), event_id)) AS t
            FROM jj GROUP BY user_id),
          edges AS (SELECT f, t FROM hops UNION ALL
            SELECT f, t FROM starts),
          cnt AS (SELECT f, t, count(*) AS n FROM edges GROUP BY 1, 2),
          trans AS MATERIALIZED (SELECT f, t,
              round(cast(n AS double) /
                cast(sum(n) OVER (PARTITION BY f) AS double), 6) AS p
            FROM cnt),
          states AS MATERIALIZED (
            SELECT DISTINCT f AS s FROM trans
            UNION SELECT DISTINCT t FROM trans)"""
    def scenario(tag: String, removed: Option[String]): String = {
      val transCte = removed match {
        case Some(c) =>
          s""",
          trans_$tag AS MATERIALIZED (SELECT f,
              CASE WHEN t = '$c' THEN '__null' ELSE t END AS t, p
            FROM trans WHERE f <> '$c')"""
        case None =>
          s""",
          trans_$tag AS MATERIALIZED (SELECT f, t, p FROM trans)"""
      }
      val x0 = s""",
          x${tag}_0 AS (SELECT s, CASE WHEN s = 'purchase' THEN 1.0
              ELSE 0.0 END AS x
            FROM states${removed.map(c => s" WHERE s <> '$c'").getOrElse("")})"""
      val iters = (1 to rounds).map { k =>
        s""",
          x${tag}_$k AS MATERIALIZED (
            SELECT s, x FROM x${tag}_${k - 1}
            WHERE s IN ('purchase', '__null')
            UNION ALL
            SELECT tr.f AS s,
              cast(sum(cast(round(tr.p * xp.x, 12) AS decimal(18,12)))
                AS double) AS x
            FROM trans_$tag tr JOIN x${tag}_${k - 1} xp ON tr.t = xp.s
            WHERE tr.f NOT IN ('purchase', '__null')
            GROUP BY 1)"""
      }.mkString
      transCte + x0 + iters
    }
    val scenarios = scenario("full", None) +
      channels.map(c => scenario(c, Some(c))).mkString
    val finals = channels.map { c =>
      s"""SELECT '$c' AS channel,
           (SELECT round(round(x, 12), 6) + 0.0 FROM xfull_$rounds
             WHERE s = 'start') AS p_full,
           (SELECT round(round(x, 12), 6) + 0.0 FROM x${c}_$rounds
             WHERE s = 'start') AS p_removed,
           (SELECT cast(floor((1.0 - x2.x / x1.x) * 1000000 + 0.5)
               AS bigint)
             FROM xfull_$rounds x1, x${c}_$rounds x2
             WHERE x1.s = 'start' AND x2.s = 'start') AS removal6"""
    }.mkString("\n           UNION ALL\n           ")
    base + scenarios +
      s""",
          fin AS MATERIALIZED ($finals)
          SELECT channel, p_full, p_removed,
            cast(removal6 AS double) / 1000000.0 AS removal_effect,
            floor(cast(removal6 AS double)
              / cast(sum(removal6) OVER () AS double)
              * 1000000 + 0.5) / 1000000.0 AS share
          FROM fin"""
  }

  /** Generated geohash-6 encoder as ONE SQL scalar expression, shared
    * verbatim by the Spark side (`expr`) and the DuckDB oracle except
    * for the integer-division spelling (`div` vs `//`, the only operator
    * the engines name differently). Integer inputs make every step exact:
    * 15-bit lat/lon cells, 30 generated interleave terms in pure
    * div/mod/multiply algebra (no shift operators — Spark and DuckDB
    * disagree on those), base32 chars via substr on the standard
    * alphabet. */
  private def geohashSqlExpr(lon: String, lat: String,
                             intDiv: String): String = {
    val xi = s"((($lon) + 180) * 32768 $intDiv 360)"
    val yi = s"((($lat) + 90) * 32768 $intDiv 180)"
    val bits = (0 until 15).map { b =>
      val pow = 1L << b
      s"(($xi $intDiv $pow) % 2) * ${1L << (2 * b + 1)}" +
        s" + (($yi $intDiv $pow) % 2) * ${1L << (2 * b)}"
    }.mkString(" + ")
    val chars = (0 until 6).map { k =>
      val shift = 1L << (25 - 5 * k)
      s"substr('0123456789bcdefghjkmnpqrstuvwxyz'," +
        s" cast((($bits) $intDiv $shift) % 32 AS int) + 1, 1)"
    }.mkString(", ")
    s"concat($chars)"
  }

  /** Test hook: the Spark-side geohash expression text (SpcWaveSpec's
    * anchor-cell checks). */
  private[graft] def geohashExprForTest(lon: String, lat: String): String =
    geohashSqlExpr(lon, lat, "div")

  /** Generated DuckDB oracle for q312: the Luhn sum as twelve explicit
    * per-position terms (odd distance from the right doubles, minus 9
    * above 4) — the same expression tree `Scalars.luhnValid` emits. */
  private val LuhnOracleSql: String = {
    val width = 12
    val terms = (1 to width).map { pos =>
      val d = s"cast(substr(acct, $pos, 1) AS int)"
      if ((width - pos) % 2 == 1)
        s"(CASE WHEN $d * 2 > 9 THEN $d * 2 - 9 ELSE $d * 2 END)"
      else d
    }.mkString(" + ")
    s"""WITH nums AS (SELECT c_mktsegment,
            lpad(cast(c_custkey * 37 % 100000000000 AS varchar), 11, '0')
              || cast(c_custkey % 10 AS varchar) AS acct
          FROM customer)
        SELECT c_mktsegment, cast(count(*) AS bigint) AS n,
          cast(sum(CASE WHEN length(acct) = $width
            AND ($terms) % 10 = 0 THEN 1 ELSE 0 END) AS bigint) AS n_valid,
          round(cast(sum(CASE WHEN length(acct) = $width
              AND ($terms) % 10 = 0 THEN 1 ELSE 0 END) AS double)
            / cast(count(*) AS double), 6) + 0.0 AS valid_rate
        FROM nums GROUP BY 1"""
  }

  /** The fixed AOI pentagon shared by q43 and q70 (an arbitrary convex-ish
    * ring in lon/lat, integer vertices so all derived arithmetic is exact). */
  private val AoiPentagon: Seq[(Double, Double)] =
    Seq((0.0, 0.0), (120.0, 10.0), (140.0, 80.0), (-30.0, 70.0), (-100.0, 20.0))

  /** Interior ring (hole) strictly inside [[AoiPentagon]] for q114's
    * hole-aware overlap gate — big enough that some per-customer triangle
    * footprints fall entirely inside it (those must NOT overlap the AOI
    * region). Integer vertices keep the arithmetic engine-exact. */
  private val AoiHole: Seq[(Double, Double)] =
    Seq((10.0, 15.0), (90.0, 15.0), (90.0, 60.0), (10.0, 60.0))

  /** Generated DuckDB oracle for q70: the polygon-overlap verdict unrolled to
    * scalar SQL — 15 proper-segment-crossing terms (3 triangle edges × 5 AOI
    * edges, strict orientation-sign tests) plus two ray-cast containment
    * probes (triangle vertex A in the AOI; AOI vertex 0 in the triangle),
    * term-for-term the same arithmetic as the native
    * [[graft.functions.PolygonsOverlap]] kernel. Programmatic generation
    * (instead of a hand-written 20-term SQL literal) keeps oracle and engine
    * in lockstep if the fixture polygons change. */
  private def q70OracleSql: String = {
    val pent = AoiPentagon
    // triangle vertices as SQL expressions over the CTE columns
    val tri = Seq(("ax", "ay"), ("(ax + 40)", "(ay + 11)"), ("(ax + 17)", "(ay + 33)"))
    def num(d: Double): String = if (d == d.floor) f"$d%.1f" else d.toString
    // cross(o, d, p) = (dx-ox)*(py-oy) - (dy-oy)*(px-ox), operands as SQL text
    def cross(ox: String, oy: String, dx: String, dy: String,
              px: String, py: String): String =
      s"(($dx - $ox) * ($py - $oy) - ($dy - $oy) * ($px - $ox))"
    // proper crossing of triangle edge (p1,p2) × AOI edge (q1,q2)
    def properCross(p1: (String, String), p2: (String, String),
                    q1: (Double, Double), q2: (Double, Double)): String = {
      val (q1x, q1y) = (num(q1._1), num(q1._2))
      val (q2x, q2y) = (num(q2._1), num(q2._2))
      val d1 = cross(q1x, q1y, q2x, q2y, p1._1, p1._2)
      val d2 = cross(q1x, q1y, q2x, q2y, p2._1, p2._2)
      val d3 = cross(p1._1, p1._2, p2._1, p2._2, q1x, q1y)
      val d4 = cross(p1._1, p1._2, p2._1, p2._2, q2x, q2y)
      s"((($d1 > 0 AND $d2 < 0) OR ($d1 < 0 AND $d2 > 0)) AND (($d3 > 0 AND $d4 < 0) OR ($d3 < 0 AND $d4 > 0)))"
    }
    val triEdges = tri.indices.map(i => (tri((i + tri.size - 1) % tri.size), tri(i)))
    val pentEdges = pent.indices.map(i => (pent((i + pent.size - 1) % pent.size), pent(i)))
    val crossings = (for {
      (p1, p2) <- triEdges
      (q1, q2) <- pentEdges
    } yield properCross(p1, p2, q1, q2)).mkString("(", "\n OR ", ")")
    // ray-cast of point (px,py) against the fixed pentagon: the q43 unroll,
    // edge (pi, pj) with j = i-1 wrapping — identical to the kernel's loop
    def pointInPent(px: String, py: String): String =
      pent.indices.map { i =>
        val (xi, yi) = pent(i); val (xj, yj) = pent((i + pent.size - 1) % pent.size)
        s"(CASE WHEN ((${num(yi)} > $py) != (${num(yj)} > $py)) AND $px < (${num(xj)} - ${num(xi)}) * ($py - ${num(yi)}) / (${num(yj)} - ${num(yi)}) + ${num(xi)} THEN 1 ELSE 0 END)"
      }.mkString("((", "\n + ", s") % 2 = 1)")
    // ray-cast of a fixed pentagon vertex against the triangle (column exprs)
    def pointInTri(px: String, py: String): String =
      tri.indices.map { i =>
        val (xi, yi) = tri(i); val (xj, yj) = tri((i + tri.size - 1) % tri.size)
        s"(CASE WHEN (($yi > $py) != ($yj > $py)) AND $px < ($xj - $xi) * ($py - $yi) / ($yj - $yi) + $xi THEN 1 ELSE 0 END)"
      }.mkString("((", "\n + ", s") % 2 = 1)")
    val aInPent = pointInPent("ax", "ay")
    val p0InTri = pointInTri(num(pent.head._1), num(pent.head._2))
    s"""WITH t AS (SELECT c_custkey,
         cast(c_custkey * 19 % 300 - 160 as double) AS ax,
         cast(c_custkey * 31 % 140 - 75 as double) AS ay
       FROM customer)
       SELECT c_custkey FROM t
       WHERE $crossings
          OR $aInPent
          OR $p0InTri"""
  }

  /** Second, disjoint AOI component for q118's MultiPolygon gate — sits in
    * the triangle coordinate range's south-west corner, far from
    * [[AoiPentagon]]. Integer vertices keep the arithmetic engine-exact. */
  private val AoiQuad: Seq[(Double, Double)] =
    Seq((-160.0, -70.0), (-110.0, -70.0), (-110.0, -30.0), (-160.0, -30.0))

  /** Generated WHERE-clause for "the per-customer triangle overlaps the
    * region of `poly`" (ring 0 exterior, rest holes), unrolled to scalar
    * SQL term-for-term with [[graft.functions.PolygonsOverlapFull]]:
    * proper-crossing terms (3 triangle edges × every ring edge), triangle
    * vertex probes (NOT on any ring edge, ray-cast in the exterior AND NOT
    * in any hole) and ring-vertex probes against the triangle (NOT on any
    * triangle edge, then ray-cast) — including the kernel's on-boundary
    * probe skip; the identical-rings fallback cannot fire for these
    * fixtures and is omitted. Programmatic generation keeps oracle and
    * kernel in lockstep if fixtures change. */
  private def triOverlapsPolySql(poly: Seq[Seq[(Double, Double)]]): String = {
    val tri = Seq(("ax", "ay"), ("(ax + 40)", "(ay + 11)"), ("(ax + 17)", "(ay + 33)"))
    def num(d: Double): String = if (d == d.floor) f"$d%.1f" else d.toString
    def cross(ox: String, oy: String, dx: String, dy: String,
              px: String, py: String): String =
      s"(($dx - $ox) * ($py - $oy) - ($dy - $oy) * ($px - $ox))"
    def properCross(p1: (String, String), p2: (String, String),
                    q1: (Double, Double), q2: (Double, Double)): String = {
      val (q1x, q1y) = (num(q1._1), num(q1._2))
      val (q2x, q2y) = (num(q2._1), num(q2._2))
      val d1 = cross(q1x, q1y, q2x, q2y, p1._1, p1._2)
      val d2 = cross(q1x, q1y, q2x, q2y, p2._1, p2._2)
      val d3 = cross(p1._1, p1._2, p2._1, p2._2, q1x, q1y)
      val d4 = cross(p1._1, p1._2, p2._1, p2._2, q2x, q2y)
      s"((($d1 > 0 AND $d2 < 0) OR ($d1 < 0 AND $d2 > 0)) AND (($d3 > 0 AND $d4 < 0) OR ($d3 < 0 AND $d4 > 0)))"
    }
    val triEdges = tri.indices.map(i => (tri((i + tri.size - 1) % tri.size), tri(i)))
    def ringEdges(r: Seq[(Double, Double)]) =
      r.indices.map(i => (r((i + r.size - 1) % r.size), r(i)))
    val crossings = (for {
      (p1, p2) <- triEdges
      ring <- poly
      (q1, q2) <- ringEdges(ring)
    } yield properCross(p1, p2, q1, q2)).mkString("(", "\n OR ", ")")
    def pointInFixedRing(ring: Seq[(Double, Double)], px: String, py: String): String =
      ring.indices.map { i =>
        val (xi, yi) = ring(i); val (xj, yj) = ring((i + ring.size - 1) % ring.size)
        s"(CASE WHEN ((${num(yi)} > $py) != (${num(yj)} > $py)) AND $px < (${num(xj)} - ${num(xi)}) * ($py - ${num(yi)}) / (${num(yj)} - ${num(yi)}) + ${num(xi)} THEN 1 ELSE 0 END)"
      }.mkString("((", "\n + ", ") % 2 = 1)")
    def pointInTri(px: String, py: String): String =
      tri.indices.map { i =>
        val (xi, yi) = tri(i); val (xj, yj) = tri((i + tri.size - 1) % tri.size)
        s"(CASE WHEN (($yi > $py) != ($yj > $py)) AND $px < ($xj - $xi) * ($py - $yi) / ($yj - $yi) + $xi THEN 1 ELSE 0 END)"
      }.mkString("((", "\n + ", ") % 2 = 1)")
    // point exactly ON an edge: collinear and inside the edge bbox — probe
    // vertices on the other boundary are SKIPPED, the kernel's convention
    def onEdge(px: String, py: String, x1: String, y1: String,
               x2: String, y2: String): String =
      s"(($x2 - $x1) * ($py - $y1) - ($y2 - $y1) * ($px - $x1) = 0" +
        s" AND $px >= least($x1, $x2) AND $px <= greatest($x1, $x2)" +
        s" AND $py >= least($y1, $y2) AND $py <= greatest($y1, $y2))"
    def onFixedRings(px: String, py: String): String =
      poly.flatMap(ringEdges).map { case (q1, q2) =>
        onEdge(px, py, num(q1._1), num(q1._2), num(q2._1), num(q2._2))
      }.mkString("(", "\n OR ", ")")
    def onTriEdges(px: String, py: String): String =
      triEdges.map { case (p1, p2) =>
        onEdge(px, py, p1._1, p1._2, p2._1, p2._2)
      }.mkString("(", "\n OR ", ")")
    val triProbes = tri.map { case (px, py) =>
      val inRegion = (s"${pointInFixedRing(poly.head, px, py)}" +:
        poly.tail.map(h => s"NOT ${pointInFixedRing(h, px, py)}")).mkString(" AND ")
      s"(NOT ${onFixedRings(px, py)} AND $inRegion)"
    }.mkString("(", "\n OR ", ")")
    val ringProbes = poly.flatten.map { case (x, y) =>
      s"(NOT ${onTriEdges(num(x), num(y))} AND ${pointInTri(num(x), num(y))})"
    }.mkString("(", "\n OR ", ")")
    s"($crossings\n OR $triProbes\n OR $ringProbes)"
  }

  private def triangleAoiCte: String =
    """WITH t AS (SELECT c_custkey,
         cast(c_custkey * 19 % 300 - 160 as double) AS ax,
         cast(c_custkey * 31 % 140 - 75 as double) AS ay
       FROM customer)
       SELECT c_custkey FROM t"""

  /** q114 oracle: the hole-aware verdict against the holed pentagon. */
  private def q114OracleSql: String =
    s"""$triangleAoiCte
       WHERE ${triOverlapsPolySql(Seq(AoiPentagon, AoiHole))}"""

  /** q118 oracle: MultiPolygon = holed pentagon ∪ disjoint quad; a union of
    * polygons overlaps iff SOME component does — the exists() composition
    * [[graft.operators.Spatial.multiPolygonsOverlap]] evaluates. */
  private def q118OracleSql: String =
    s"""$triangleAoiCte
       WHERE ${triOverlapsPolySql(Seq(AoiPentagon, AoiHole))}
          OR ${triOverlapsPolySql(Seq(AoiQuad))}"""

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- aggregation core (SURVEY §2.4) ----
    "q01_pricing_summary" -> ((s, dir) => {
      // A1/A5 analog at TPC-H Q1 shape: single shuffle, map-side partials.
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(D)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(D)).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast(D) * (lit(1) - col("l_discount").cast(D))).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),
    "q07_rollup_status" -> ((s, dir) =>
      R.rollupCount(Tables.events(s, dir), "event_type")),
    "q08_time_buckets" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value").cast(D)).cast("double").as("sum_value"))),
    "q15_bbox_agg" -> ((s, dir) => {
      // A3 bbox per group over derived integer coordinates (exact arithmetic).
      val li = Tables.lineitem(s, dir)
        .withColumn("lon", (col("l_partkey") * 7 % 360 - 180).cast("long"))
        .withColumn("lat", (col("l_suppkey") * 13 % 180 - 90).cast("long"))
      R.bboxAgg(li, Seq("l_returnflag"), col("lon"), col("lat"))
    }),
    "q28_validation_split" -> ((s, dir) =>
      // P13 CHECK-constraint predicate as a validation rollup.
      Tables.events(s, dir)
        .groupBy(col("value").between(0, 100).as("valid"))
        .agg(count(lit(1)).as("n"))),

    // ---- filters / lookups / projections (SURVEY §2.2) ----
    "q02_point_lookup" -> ((s, dir) =>
      R.pointLookup(Tables.customer(s, dir), "c_custkey", 42L)
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")),
    "q03_or_lookup" -> ((s, dir) =>
      Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING" || col("c_acctbal") < 100)
        .select("c_custkey", "c_name", "c_mktsegment")),
    "q04_multi_filter" -> ((s, dir) =>
      R.multiFilter(Tables.lineitem(s, dir), Seq(
        col("l_shipdate").between(lit("1996-01-01"), lit("1997-12-31")),
        col("l_quantity").between(10, 20),
        R.memberOf(col("l_returnflag"), Seq("A", "R"))))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")),
    "q05_regex_filter" -> ((s, dir) =>
      Tables.part(s, dir)
        .filter(col("p_name").rlike("^(blue|large) .*t$"))
        .select("p_partkey", "p_name", "p_brand")),
    "q06_projection_scalar" -> ((s, dir) =>
      Tables.customer(s, dir).select(
        col("c_custkey"),
        lower(col("c_name")).as("name_lower"),
        length(col("c_name")).as("name_len"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        concat(col("c_mktsegment"), lit(":"), col("c_name")).as("tagged"))),

    // ---- sort / limit / pagination (SURVEY §2.5) ----
    "q09_topk" -> ((s, dir) =>
      R.topK(Tables.orders(s, dir), 10, col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_custkey", "o_totalprice")),
    "q10_page" -> ((s, dir) =>
      R.page(Tables.customer(s, dir), page = 3, size = 20, col("c_custkey").asc)),
    "q11_pagination_meta" -> ((s, dir) =>
      R.paginationMeta(Tables.customer(s, dir), page = 2, size = 100)),

    // ---- windows (SURVEY §2.7) ----
    "q12_latest_per_key" -> ((s, dir) =>
      R.latestPerKey(Tables.events(s, dir), "user_id", col("ts"), col("event_id"))
        .select("user_id", "event_id", "event_type", "value")),
    "q13_window_lag" -> ((s, dir) =>
      R.withLag(Tables.events(s, dir), "user_id", "value", col("ts"), col("event_id"))
        .select("user_id", "event_id", "value", "prev_value", "delta_value")),
    "q14_running_sum" -> ((s, dir) =>
      R.runningSum(Tables.orders(s, dir), "o_custkey",
        col("o_totalprice").cast(D), "run_total",
        col("o_orderdate"), col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          col("run_total").cast("double").as("run_total"))),

    // ---- joins (SURVEY §2.3) ----
    "q16_dim_join" -> ((s, dir) => {
      // J1-J3 shape: fact ⋈ two broadcast dims, then rollup.
      val c = Tables.customer(s, dir).withColumnRenamed("c_nationkey", "n_nationkey")
      val n = Tables.nation(s, dir).withColumnRenamed("n_regionkey", "r_regionkey")
      Joins.dimJoin(Joins.dimJoin(c, n, Seq("n_nationkey")), Tables.region(s, dir), Seq("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"))
    }),
    "q17_join_topk_revenue" -> ((s, dir) => {
      val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val ord  = Tables.orders(s, dir).filter(col("o_orderdate") < lit("1999-01-01"))
      val li   = Tables.lineitem(s, dir).filter(col("l_shipdate") > lit("1997-01-01"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), to_date(col("o_orderdate")).as("o_date"))
        .agg(sum(col("l_extendedprice").cast(D) * (lit(1) - col("l_discount").cast(D))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
    }),
    "q18_semi_join" -> ((s, dir) =>
      Joins.semiJoin(Tables.customer(s, dir),
        Tables.orders(s, dir).select(col("o_custkey").as("c_custkey")), Seq("c_custkey"))
        .select("c_custkey", "c_name")),
    "q19_anti_join" -> ((s, dir) =>
      Joins.antiJoin(Tables.customer(s, dir),
        Tables.orders(s, dir).select(col("o_custkey").as("c_custkey")), Seq("c_custkey"))
        .select("c_custkey", "c_name")),
    "q20_left_join" -> ((s, dir) => {
      val n = Tables.nation(s, dir)
      val c = Tables.customer(s, dir).select(col("c_nationkey").as("n_nationkey"), col("c_custkey"))
      Joins.leftJoin(n, c, Seq("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(col("c_custkey")).as("n_customers"))
    }),
    "q21_explode_join" -> ((s, dir) => {
      // J6/J7 lineage shape: per-order array of part keys, exploded, joined.
      val lineage = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(collect_list(col("l_partkey")).as("part_ids"))
      Joins.explodeJoin(lineage, "part_ids", broadcast(Tables.part(s, dir)), "p_partkey")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"))
    }),

    // ---- P4/P6: row-level security + optional filter ----
    "q60_rls_optional_filter" -> ((s, dir) =>
      // the reference's universal read path: non-admin RLS scope, then an
      // optional equality filter only when the caller passed a value
      R.optionalFilter(
        R.forUser(Tables.events(s, dir), "user_id", 42L, "user"),
        "event_type", Some("click"))
        .select("event_id", "user_id", "event_type", "value")),

    // ---- A6: progress rollup (deterministic derived mean) ----
    "q61_progress_rollup" -> ((s, dir) =>
      R.progressRollup(
        Tables.events(s, dir).withColumn("p", col("value").cast(D)),
        "event_type", "p")
        .select(col("event_type"), col("avg_progress"),
          col("min_progress").cast("double").as("min_progress"),
          col("max_progress").cast("double").as("max_progress"))),

    // ---- P10: coordinate-range validation ----
    "q62_coord_validation" -> ((s, dir) =>
      // derived coords intentionally spill out of [-180,180]×[-90,90] so
      // both branches of the CHECK predicate carry rows
      Tables.customer(s, dir)
        .select((col("c_custkey") * 7 % 400 - 200).cast("double").as("lon"),
          (col("c_custkey") * 13 % 200 - 100).cast("double").as("lat"))
        .groupBy(R.validCoords(col("lon"), col("lat")).as("valid"))
        .agg(count(lit(1)).as("n"))),

    // ---- P12: UUID-format validation ----
    "q63_uuid_validation" -> ((s, dir) => {
      val h = md5(col("doc_id").cast("string"))
      val uuid = concat_ws("-", substring(h, 1, 8), substring(h, 9, 4),
        substring(h, 13, 4), substring(h, 17, 4), substring(h, 21, 12))
      Tables.documents(s, dir)
        .select(when(col("doc_id") % 7 === 0, lit("not-a-uuid"))
          .otherwise(uuid).as("cand"))
        .groupBy(col("cand").rlike(R.UuidRe).as("valid"))
        .agg(count(lit(1)).as("n"))
    }),

    // ---- F4: MIME sniff over synthesized magic bytes ----
    "q64_mime_sniff" -> ((s, dir) => {
      // the oracle derives the expected MIME from doc_id directly, so the
      // sniff's magic-prefix decisions are what the hash gate verifies
      val magic = when(col("doc_id") % 5 === 0, "FFD8FFE000104A46")
        .when(col("doc_id") % 5 === 1, "89504E470D0A1A0A")
        .when(col("doc_id") % 5 === 2, "49492A0000000000")
        .when(col("doc_id") % 5 === 3, "504B030414000000")
        .otherwise("0011223344556677")
      Tables.documents(s, dir)
        .select(Scalars.sniffMime(unhex(magic)).as("mime"))
        .groupBy("mime").agg(count(lit(1)).as("n"))
    }),

    // ---- F8: exponential-backoff delay series ----
    "q65_backoff" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), (col("o_orderkey") % 6).cast("int").as("attempt"))
        .withColumn("delay_s",
          Scalars.backoffDelay(col("attempt"), delay = 1.0, backoff = 2.0))),

    // ---- S5: insert-path DDL defaults ----
    "q66_insert_defaults" -> ((s, dir) => {
      // task-insert rows with nulls/missing columns; applyDefaults fills
      // status/progress where null and adds the absent priority column —
      // the DDL-default write path (init.sql:64-65) with deterministic
      // defaults so the gate hashes (uuid/now defaults stay spec-tested).
      val inserts = Tables.orders(s, dir).select(
        col("o_orderkey").as("id"),
        when(col("o_orderkey") % 3 === 0, col("o_orderstatus")).as("status"),
        when(col("o_orderkey") % 2 === 0,
          (col("o_orderkey") % 100).cast("double") / 100).as("progress"))
      Schemas.applyDefaults(inserts, scala.collection.immutable.ListMap(
        "status" -> lit("pending"),
        "progress" -> lit(0.0),
        "priority" -> lit(5)))
    }),

    // ---- W2 scale path: keyset pagination ----
    "q67_keyset_page" -> ((s, dir) =>
      // the 100 TB-safe variant of q10: pushdown range + top-k, no global
      // row_number window
      R.keysetPage(Tables.customer(s, dir), "c_custkey", Some(40L), 20)),

    // ---- J9: audit ⋈ users null-preserving join ----
    "q68_audit_user_join" -> ((s, dir) => {
      val users = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("user_id"), col("c_name"))
      Tables.events(s, dir).join(broadcast(users), Seq("user_id"), "left_outer")
        .groupBy(col("c_name").isNull.as("unknown_user"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
    }),

    // ---- as-of join (custom operator; DuckDB ASOF JOIN oracle) ----
    "q69_asof_join" -> ((s, dir) => {
      // each event joined to the rate version effective as of its
      // timestamp — 25 keys × 30 daily versions derived deterministically
      // from nation so both engines build the identical rates table
      val ev = Tables.events(s, dir).select(col("event_id"),
        (col("user_id") % 25).as("k"),
        date_trunc("second", col("ts")).as("ets"))
      val rates = Tables.nation(s, dir)
        .select(col("n_nationkey").as("k"),
          explode(sequence(lit(0), lit(29))).as("d"))
        .select(col("k"),
          to_timestamp(date_add(lit("2024-01-01").cast("date"), col("d"))).as("eff"),
          (((col("k") * 31 + col("d") * 7) % 100).cast("double") / 10).as("rate"))
      Joins.asofJoin(ev, rates, "k", "ets", "eff", rightCols = Seq("rate"))
        .select("event_id", "k", "asof_rate")
    }),

    // ---- stateful streaming hard gates (T2/T5): replay == batch view ----
    "q71_stream_latest_status" -> ((s, dir) =>
      // the events table replayed through a 3-micro-batch file-source stream
      // into flatMapGroupsWithState (T2 latestStatus); the memory-sink
      // updates reduce to a final state that must equal the W1 batch view —
      // the oracle is the same SQL as q12. Exercises cross-batch state
      // merge with interleaved users/timestamps per batch.
      graft.streaming.Streams.replayedFinalState(
          s, Tables.events(s, dir), chunks = 3, name = "latest_status")(
          (sp, ev) => graft.streaming.Streams.latestStatus(sp, ev))
        .select("user_id", "event_id", "event_type", "value")),
    "q72_stream_session_state" -> ((s, dir) =>
      // same replay through the T5 TTL-session operator with a TTL long
      // enough that no processing-time timeout fires during the run: its
      // state-merge path must land on the identical final state (TTL expiry
      // itself is processing-time-dependent and stays spec-asserted).
      graft.streaming.Streams.replayedFinalState(
          s, Tables.events(s, dir), chunks = 3, name = "session_state")(
          (sp, ev) => graft.streaming.Streams.sessionWithTtl(sp, ev, ttlMs = 3600000L))
        .select("user_id", "event_id", "event_type", "value")),

    "q108_stream_interval_join" -> ((s, dir) =>
      // stream-stream interval join replayed as two independent chunked
      // file streams; appended pairs must equal the batch inequality join
      graft.streaming.Streams.replayedIntervalJoin(
        s, Tables.events(s, dir), chunks = 3, name = "interval_join")),

    "q244_stream_left_interval_join" -> ((s, dir) =>
      // LEFT OUTER stream-stream interval join: null-extended rows emit
      // only when the advancing watermark proves no match can arrive —
      // time-sliced replay + flush sentinels; result == batch left join
      graft.streaming.Streams.replayedLeftIntervalJoin(
        s, Tables.events(s, dir), chunks = 3, name = "left_interval_join")),

    // ---- exact polygon×polygon overlap (§2.9; the last spatial gap) ----
    "q70_polygon_overlap" -> ((s, dir) => {
      // AOI-polygon × scene-footprint join: per-customer triangle footprints
      // against the fixed pentagon AOI (q43's), through the bbox-prefilter +
      // exact ring-overlap polygonJoin. Integer-derived coordinates keep the
      // arithmetic engine-exact; the oracle unrolls the identical
      // proper-crossing and ray-cast terms (generated, see q70OracleSql).
      val t = Tables.customer(s, dir).select(col("c_custkey"),
          (col("c_custkey") * 19 % 300 - 160).cast("double").as("ax"),
          (col("c_custkey") * 31 % 140 - 75).cast("double").as("ay"))
        .withColumn("ring", array(
          array(col("ax"), col("ay")),
          array(col("ax") + 40, col("ay") + 11),
          array(col("ax") + 17, col("ay") + 33)))
        .withColumn("bbox", struct(
          col("ax").as("min_lon"), col("ay").as("min_lat"),
          (col("ax") + 40).as("max_lon"), (col("ay") + 33).as("max_lat")))
      val aoi = s.range(1).select(
        array(AoiPentagon.map { case (x, y) =>
          array(lit(x), lit(y)) }: _*).as("aoi_ring"),
        struct(lit(-100.0).as("min_lon"), lit(0.0).as("min_lat"),
          lit(140.0).as("max_lon"), lit(80.0).as("max_lat")).as("aoi_bbox"))
      graft.operators.Spatial.polygonJoin(
          t, col("ring"), col("bbox"), aoi, col("aoi_ring"), col("aoi_bbox"))
        .select("c_custkey")
    }),

    // ---- EXT: PMI collocation extraction ----
    "q126_pmi_collocations" -> ((s, dir) =>
      graft.operators.TextOps.pmiCollocations(
        Tables.documents(s, dir), "doc_id", "text", minCount = 5, k = 20)),

    // ---- EXT: corpus-composition statistics ----
    "q127_source_kl" -> ((s, dir) =>
      graft.operators.TextOps.sourceKlDivergence(
        Tables.documents(s, dir), "source", "text")),
    "q128_chi2_lang_source" -> ((s, dir) =>
      graft.operators.Analyses.contingencyChi2(
        Tables.documents(s, dir), "lang", "source")),

    // ---- J: multi-dim star joins (TPC-H Q5/Q13 shapes) ----
    "q131_regional_revenue" -> ((s, dir) => {
      // Q5 shape: revenue by nation where customer and supplier share the
      // nation. region⋈nation is a by-NATURE dimension (25×5 rows) →
      // broadcast; customer/supplier/orders scale with data → shuffled
      // equi-joins that AQE may demote to broadcast at small SF.
      val rn = Tables.nation(s, dir)
        .join(Tables.region(s, dir).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cust = Tables.customer(s, dir)
        .join(broadcast(rn), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"))
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1998-01-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      val supp = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(rn), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_extendedprice").cast(D) *
          (lit(1) - col("l_discount").cast(D))).cast("double").as("revenue"))
    }),
    "q132_custdist" -> ((s, dir) => {
      // Q13 shape: distribution of per-customer order counts, zero-order
      // customers included (left join + count(non-null)); two hash
      // aggregates, the second over a count-cardinality-bounded table.
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"))
      Tables.customer(s, dir).select(col("c_custkey"))
        .join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),

    // ---- A: cube (completes rollup/grouping-sets/pivot family) ----
    "q135_cube" -> ((s, dir) =>
      Tables.documents(s, dir)
        .cube(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("total_chars"))),

    // ---- EXT: frontier BFS — shortest-hop reachability from a seed set ----
    "q145_bfs_hops" -> ((s, dir) => {
      // same customer↔supplier bipartite graph as q111; seeds = 5 flagged
      // customers, 3 hops (c → s → c → s): "which entities sit within k
      // hops of a flagged account" — the impact-radius query
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      val pairs = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst")).distinct()
      val edges = pairs.union(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = Tables.customer(s, dir).filter(col("c_custkey") <= 5)
        .select(concat(lit("c"), col("c_custkey")).as("node"))
      graft.operators.Graph.bfsHops(edges, seeds, maxHops = 3)
    }),

    // ---- J/A/L: TPC-H Q3 shape — top open orders by revenue ----
    "q146_shipping_priority" -> ((s, dir) => {
      // dim-filtered fact⋈fact⋈fact star, grouped top-k with a total-order
      // tie-break (revenue desc, date, orderkey) so LIMIT is deterministic
      val c = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") < lit("1997-01-01"))
        .select(col("o_orderkey"), col("o_custkey"),
          to_date(col("o_orderdate")).as("o_date"), col("o_orderpriority"))
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > lit("1997-01-01"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_date"), col("o_orderpriority"))
        .agg(sum(col("l_extendedprice").cast(D) *
          (lit(1) - col("l_discount").cast(D))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_date"), col("l_orderkey"))
        .limit(10)
    }),

    // ---- J/A/L: TPC-H Q10 shape — returned-item revenue by customer ----
    "q147_returned_items" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1996-07-01"))
        .select("o_orderkey", "o_custkey")
      val l = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val n = Tables.nation(s, dir).select("n_nationkey", "n_name")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(col("l_extendedprice").cast(D) *
          (lit(1) - col("l_discount").cast(D))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // ---- W: gaps-and-islands — longest consecutive-day activity streak ----
    "q148_activity_streaks" -> ((s, dir) =>
      R.activityStreaks(Tables.events(s, dir), "user_id", "ts")),

    // ---- A: rolling 7-day distinct active users (sliding distinct) ----
    "q149_rolling_active" -> ((s, dir) =>
      R.rollingActiveUsers(Tables.events(s, dir), "user_id", "ts",
        windowDays = 7)),

    // ---- A: unpivot/melt — wide measure columns back to long rows ----
    "q150_unpivot" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("quantity"),
          col("l_extendedprice").cast("double").as("extendedprice"),
          col("l_tax").cast("double").as("tax"))
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("quantity"), col("extendedprice"), col("tax")),
          "measure", "value")),

    // ---- A: market-basket co-purchase top-k (item-item recommendation) ----
    "q151_copurchase" -> ((s, dir) =>
      graft.operators.Analyses.coPurchasePairs(
        Tables.lineitem(s, dir), "l_orderkey", "l_partkey", k = 5)),

    // ---- A: per-group Pearson correlation from exact moments ----
    "q152_exact_corr" -> ((s, dir) =>
      graft.operators.Analyses.exactCorr(
        Tables.lineitem(s, dir), "l_suppkey", "l_quantity", "l_extendedprice")),

    // ---- J/A: TPC-H Q4 shape — late-shipment order-priority rollup ----
    "q153_priority_check" -> ((s, dir) => {
      // EXISTS rewritten as a left-semi equi-join on the order key with a
      // residual date predicate — the semi-join stops at the first witness
      // line and never multiplies rows
      val o = Tables.orders(s, dir)
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val l = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
      o.join(l, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("interval 60 days"),
          "left_semi")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n_orders"))
    }),

    // ---- A: TPC-H Q12 shape — priority mix per line status (cond. agg) ----
    "q154_priority_mix" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1998-01-01") &&
          col("l_shipdate") < lit("1999-01-01"))
        .select("l_orderkey", "l_linestatus")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
    }),

    // ---- A/J: TPC-H Q17 shape — small-quantity-line revenue ----
    "q155_small_qty_revenue" -> ((s, dir) => {
      // correlated avg subquery as a pre-agg join; the 0.2·avg threshold is
      // compared EXACTLY: qty < 0.2·(sum/n) ⇔ 5·n·qty < sum — all decimal,
      // no division, no float threshold to diverge on
      val l = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_quantity").cast(D).as("qty"),
          col("l_extendedprice").cast(D).as("price"))
      val pa = l.groupBy("l_partkey")
        .agg(count(lit(1)).as("n_lines"), sum(col("qty")).as("sum_qty"))
      l.join(pa, Seq("l_partkey"))
        .filter(col("qty") * lit(5) * col("n_lines") < col("sum_qty"))
        .agg(count(lit(1)).as("n_small"),
          (sum(col("price")).cast("double") / lit(7.0)).as("avg_yearly"))
    }),

    // ---- A/J: TPC-H Q18 shape — large-volume orders ----
    "q156_big_orders" -> ((s, dir) => {
      // HAVING sum(qty) ≥ 300 bounds the probe side to a handful of orders
      // BEFORE the two dimension joins — AQE broadcasts the survivors
      val l = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_quantity").cast(D).as("qty"))
      val big = l.groupBy("l_orderkey").agg(sum(col("qty")).as("sq"))
        .filter(col("sq") >= 300)
        .select(col("l_orderkey"), col("sq").cast("double").as("sum_qty"))
      big.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("o_date"), col("o_totalprice"),
          col("sum_qty"))
    }),

    // ---- J: TPC-H Q21 shape — the only-late supplier on multi-supplier
    // orders (semi + anti probes against the same derived late-set) ----
    "q157_waiting_supplier" -> ((s, dir) => {
      val lo = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
          (col("l_shipdate") > col("o_orderdate") + expr("interval 60 days"))
            .as("late"))
      val all = lo.select("ok", "sk").distinct()
      val lateS = lo.filter(col("late")).select("ok", "sk").distinct()
      val others = all.select(col("ok").as("ok2"), col("sk").as("sk2"))
      val lateOthers = lateS.select(col("ok").as("ok3"), col("sk").as("sk3"))
      lateS
        .join(others,
          col("ok") === col("ok2") && col("sk") =!= col("sk2"), "left_semi")
        .join(lateOthers,
          col("ok") === col("ok3") && col("sk") =!= col("sk3"), "left_anti")
        .join(Tables.supplier(s, dir), col("sk") === col("s_suppkey"))
        .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
    }),

    // ---- A/J: TPC-H Q22 shape — dormant above-average-balance value ----
    "q158_dormant_value" -> ((s, dir) => {
      // the global-average threshold is a ONE-ROW aggregate — broadcast by
      // nature (the allowed class); bal > avg compared exactly as
      // bal·n > sum (no decimal division, whose rounding differs by engine)
      val c = Tables.customer(s, dir)
      val thr = c.filter(col("c_acctbal") > 0)
        .agg(count(lit(1)).as("n_pos"),
          sum(col("c_acctbal").cast(D)).as("sum_bal"))
      val recent = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("2001-01-01")).select("o_custkey")
      c.crossJoin(broadcast(thr))
        .filter(col("c_acctbal").cast(D) * col("n_pos") > col("sum_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("c_acctbal").cast(D)).cast("double").as("total_bal"))
    }),

    // ---- A: 2-D skyline / Pareto frontier ----
    "q159_skyline" -> ((s, dir) =>
      graft.operators.Analyses.skyline2D(
        Tables.part(s, dir), "p_retailprice", "p_size")),

    // ---- A/W: per-group weighted median ----
    "q160_weighted_median" -> ((s, dir) =>
      graft.operators.Analyses.weightedMedian(
        Tables.lineitem(s, dir), "l_suppkey", "l_extendedprice", "l_quantity")),

    // ---- A: one-pass column profiler (long-form data-quality report) ----
    "q161_profile" -> ((s, dir) =>
      graft.operators.Analyses.profileColumns(Tables.lineitem(s, dir),
        numCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        strCols = Seq("l_returnflag", "l_linestatus"))),

    // ---- A: per-group Shannon entropy (stream-mix diagnostics) ----
    "q162_entropy" -> ((s, dir) =>
      graft.operators.Analyses.groupEntropy(
        Tables.events(s, dir), "user_id", "event_type")),

    // ---- T: streaming Misra–Gries sketch + batch exact recount ----
    "q163_stream_heavy_hitters" -> ((s, dir) => {
      // same zipf-derived item as q116 so the N/(k+1) guarantee margin
      // carries over; the stream maintains the sketch, the compaction pass
      // recounts candidates exactly — output == the batch top-4
      val d = Tables.documents(s, dir)
        .withColumn("__h", graft.operators.Sampling.hashBucket(col("doc_id"), 1000))
        .withColumn("item", expr("1000 div (1 + __h)"))
      graft.streaming.Streams.replayedHeavyHitters(s, d, "doc_id", "item",
        chunks = 3, n = 4, k = 32, name = "hh")
    }),

    // ---- A: per-group equi-depth histogram (quantile profile) ----
    "q164_equidepth" -> ((s, dir) =>
      graft.operators.Analyses.equiDepthHistogram(
        Tables.lineitem(s, dir), "l_returnflag", "l_extendedprice", buckets = 8)),

    // ---- A/W: per-key rolling windowed Pearson correlation ----
    "q165_rolling_corr" -> ((s, dir) =>
      graft.operators.Analyses.rollingCorr(
        Tables.lineitem(s, dir), "l_suppkey", "l_shipdate",
        "l_quantity", "l_extendedprice", windowDays = 30)
        .select(col("l_orderkey"), col("l_linenumber"), col("n_win"), col("r"))),

    // ---- J/W: TPC-H Q2 shape — cheapest observed supplier per part ----
    "q166_cheapest_supplier" -> ((s, dir) => {
      // correlated-min as a per-part top-1 window (parts bound the
      // partitions). The unit price is built as an exact integer-cents
      // rational and divided ONCE as doubles — bit-identical across
      // engines, unlike round(p/q, 6) whose half-boundary behavior diverges
      // (found at sf0.1: repeating-binary quotients landing on the 5)
      import org.apache.spark.sql.expressions.Window
      val u = Tables.lineitem(s, dir).filter(col("l_quantity") > 0)
        .select(col("l_partkey"), col("l_suppkey"),
          (round(col("l_extendedprice") * 100, 0).cast("long").cast("double") /
            round(col("l_quantity") * 100, 0).cast("long").cast("double"))
            .as("unit"))
      val w = Window.partitionBy(col("l_partkey"))
        .orderBy(col("unit").asc, col("l_suppkey").asc)
      u.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .join(broadcast(Tables.supplier(s, dir)
          .select("s_suppkey", "s_name")), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey"), col("s_name"), col("unit"))
    }),

    // ---- A/J: period-over-period cohort diff (churned / new / retained) ----
    "q167_churn" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val a = ev.filter(col("ts") >= lit("2024-01-01") &&
        col("ts") < lit("2024-01-15")).select("user_id").distinct()
      val b = ev.filter(col("ts") >= lit("2024-01-15")).select("user_id").distinct()
      a.join(b, Seq("user_id"), "left_semi").withColumn("status", lit("retained"))
        .unionByName(a.join(b, Seq("user_id"), "left_anti")
          .withColumn("status", lit("churned")))
        .unionByName(b.join(a, Seq("user_id"), "left_anti")
          .withColumn("status", lit("new")))
    }),

    // ---- EXT: degree distribution of the customer⋈supplier graph ----
    "q168_degree_dist" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      val pairs = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst")).distinct()
      val edges = pairs.unionAll(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
      edges.groupBy(col("src")).agg(count(lit(1)).as("degree"))
        .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
    }),

    // ---- EXT: incremental aggregate maintenance (merge == recompute) ----
    "q169_incremental_agg" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val base = graft.operators.Pipelines.aggState(
        o.filter(col("o_orderdate") < lit("1999-01-01")), "o_custkey", "o_totalprice")
      val delta = graft.operators.Pipelines.aggState(
        o.filter(col("o_orderdate") >= lit("1999-01-01")), "o_custkey", "o_totalprice")
      graft.operators.Pipelines.finishAggState(
        graft.operators.Pipelines.mergeAggStates(base, delta))
    }),

    // ---- EXT: CDC apply (batch MERGE of an I/U/D change log) ----
    "q170_cdc_apply" -> ((s, dir) => {
      val snap = Tables.customer(s, dir)
        .select(col("c_custkey").as("key"), col("c_acctbal").as("value"))
      val log = Tables.events(s, dir).select(
        col("user_id").as("key"), col("ts"), col("value"), col("event_id"),
        when(graft.operators.Sampling.hashBucket(col("event_id"), 3) === 0, "U")
          .when(graft.operators.Sampling.hashBucket(col("event_id"), 3) === 1, "I")
          .otherwise("D").as("op"))
      graft.operators.Joins.applyCdc(snap, log, "key", "value",
        col("ts"), col("event_id"))
    }),

    // ---- A: association rules (support / confidence / lift) ----
    "q171_assoc_rules" -> ((s, dir) =>
      graft.operators.Analyses.associationRules(
        Tables.lineitem(s, dir), "l_orderkey", "l_partkey", minCo = 2)),

    // ---- A/W: per-key daily OHLC bars ----
    "q172_ohlc" -> ((s, dir) =>
      graft.operators.Analyses.ohlcBars(
        Tables.events(s, dir), "user_id", "ts", "value",
        tieBreak = col("event_id"))),

    // ---- A/L: monthly trending parts (top-k per period) ----
    "q173_monthly_top_parts" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_partkey")
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), date_trunc("month", col("o_orderdate")).as("month"))
      val cnt = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("month"), col("l_partkey")).agg(count(lit(1)).as("n_lines"))
      val w = Window.partitionBy(col("month"))
        .orderBy(col("n_lines").desc, col("l_partkey").asc)
      cnt.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
    }),

    // ---- J/A: TPC-H Q7 shape — nation-pair trade volume by year ----
    "q174_volume_shipping" -> ((s, dir) => {
      // both nation dims filtered to the two trading partners BEFORE the
      // fact joins (25-row by-NATURE broadcasts); the directed-pair
      // predicate reduces to supp ≠ cust after the restriction
      val ns = Tables.nation(s, dir)
        .filter(col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4"))
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val nc = Tables.nation(s, dir)
        .filter(col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4"))
        .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1998-01-01"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).as("l_year"),
          (col("l_extendedprice").cast(D) *
            (lit(1) - col("l_discount").cast(D))).as("vol"))
      val su = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
        .join(broadcast(ns), col("s_nationkey") === col("sk"))
      val cu = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
        .join(broadcast(nc), col("c_nationkey") === col("ck"))
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      l.join(su, col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(cu, col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(sum(col("vol")).cast("double").as("revenue"))
    }),

    // ---- J/A: TPC-H Q8 shape — nation market share within a region ----
    "q175_market_share" -> ((s, dir) => {
      val rn = Tables.nation(s, dir)
        .join(Tables.region(s, dir).filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("rk"))
      val cu = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
        .join(broadcast(rn), col("c_nationkey") === col("rk"))
      val p = Tables.part(s, dir)
        .filter(col("p_type") === "ECONOMY").select("p_partkey")
      val ns = Tables.nation(s, dir)
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val su = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
        .join(broadcast(ns), col("s_nationkey") === col("sk"))
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1998-01-01"))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).as("o_year"))
      val l = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice").cast(D) *
            (lit(1) - col("l_discount").cast(D))).as("vol"))
      // share = one division of two exact-decimal sums cast to double —
      // bit-identical across engines with no rounding step
      l.join(p, col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(cu, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_5", col("vol"))
            .otherwise(lit(0).cast(D))).cast("double").as("nation_vol"),
          sum(col("vol")).cast("double").as("total_vol"))
        .select(col("o_year"),
          (col("nation_vol") / col("total_vol")).as("mkt_share"))
    }),

    // ---- J/A: TPC-H Q9 shape — product-line profit by nation and year ----
    "q176_product_profit" -> ((s, dir) => {
      // adapted: no partsupp table in the corpus, so unit cost is modeled
      // as 10% of p_retailprice — revenue and cost are SEPARATE exact
      // decimal sums (a fused rev−0.1·retail·qty decimal term would
      // overflow precision 38 and round differently per engine); they
      // combine as doubles in one mirrored parse tree at the end
      val p = Tables.part(s, dir)
        .filter(col("p_name").like("%red%"))
        .select(col("p_partkey"), col("p_retailprice"))
      val ns = Tables.nation(s, dir)
        .select(col("n_nationkey").as("sk"), col("n_name"))
      val su = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
        .join(broadcast(ns), col("s_nationkey") === col("sk"))
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      Tables.lineitem(s, dir)
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"), col("o_year"))
        .agg(
          sum(col("l_extendedprice").cast(D) *
            (lit(1) - col("l_discount").cast(D))).cast("double").as("rev"),
          sum(col("p_retailprice").cast(D) *
            col("l_quantity").cast(D)).cast("double").as("retail"))
        .select(col("n_name"), col("o_year"),
          (col("rev") - col("retail") * lit(0.1).cast("double")).as("profit"))
    }),

    // ---- A: TPC-H Q14 shape — promo revenue share by month ----
    "q177_promo_share" -> ((s, dir) => {
      val p = Tables.part(s, dir).select(col("p_partkey"), col("p_type"))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1998-01-01"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(date_trunc("month", col("l_shipdate")).as("month"))
        .agg(
          sum(when(col("p_type") === "PROMO",
            col("l_extendedprice").cast(D) *
              (lit(1) - col("l_discount").cast(D)))
            .otherwise(lit(0).cast(D))).cast("double").as("promo_rev"),
          sum(col("l_extendedprice").cast(D) *
            (lit(1) - col("l_discount").cast(D))).cast("double").as("total_rev"))
        .select(col("month"),
          (col("promo_rev") / col("total_rev") * lit(100.0).cast("double"))
            .as("promo_pct"))
    }),

    // ---- J/A: TPC-H Q16 shape — supplier diversity per part profile ----
    "q178_supplier_diversity" -> ((s, dir) => {
      // count(DISTINCT supp) per (brand,type,size) from the observed
      // lineitem pairs; "complaint" suppliers (negative balance) removed
      // by anti-join BEFORE the distinct expansion
      val p = Tables.part(s, dir)
        .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 5, 9, 15, 20, 25, 30, 35))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val bad = Tables.supplier(s, dir)
        .filter(col("s_acctbal") < 0).select("s_suppkey")
      Tables.lineitem(s, dir).select("l_partkey", "l_suppkey")
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(bad, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }),

    // ---- J/L: TPC-H Q20 shape — high-volume suppliers of a part family ----
    "q179_part_family_suppliers" -> ((s, dir) => {
      // nested-aggregate semi-join: per (part,supp) shipped quantity over
      // the window, HAVING over the agg, then DISTINCT suppliers via
      // semi-join (adapted: shipped-qty threshold stands in for the
      // partsupp availqty comparison — no partsupp table in the corpus)
      val p = Tables.part(s, dir)
        .filter(col("p_name").like("small%")).select("p_partkey")
      val pairs = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1998-01-01"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity").cast(D)).as("qty"))
      val tot = pairs.agg(sum(col("qty")).as("tq"), count(lit(1)).as("np"))
      // SF-robust relative threshold: qty > 2× the family's mean pair
      // quantity, compared exactly as qty·np > 2·tq (integer multiplies
      // of exact decimals — no division, no absolute constant that goes
      // vacuous at a different scale)
      val heavy = pairs.crossJoin(broadcast(tot))
        .filter(col("qty") * col("np") > col("tq") * 2)
        .select("l_suppkey")
      Tables.supplier(s, dir)
        .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_nationkey")
    }),

    // ---- A: TPC-H Q11 shape — parts above a global revenue fraction ----
    "q180_important_parts" -> ((s, dir) => {
      // scalar-subquery threshold: the one-row global total is broadcast
      // by NATURE; the fraction compare is exact-decimal sum·1000 > total
      // (integer multiply, no decimal division whose scale differs by
      // engine)
      val rev = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_extendedprice").cast(D) *
          (lit(1) - col("l_discount").cast(D))).as("rev"))
      // SF-robust: parts above 1.3× the MEAN part revenue (the corpus has
      // no heavy head, so a fixed global fraction goes empty at larger
      // SF); 1.3× as the exact integer compare rev·n·10 > 13·total
      val tot = rev.agg(sum(col("rev")).as("total"), count(lit(1)).as("np"))
      rev.crossJoin(broadcast(tot))
        .filter(col("rev") * col("np") * 10 > col("total") * 13)
        .select(col("l_partkey"), col("rev").cast("double").as("part_value"))
    }),

    // ---- A/W: peak concurrency per key (+1/−1 interval sweep) ----
    "q181_max_concurrent" -> ((s, dir) =>
      graft.operators.Analyses.maxConcurrent(
        Tables.events(s, dir), "user_id",
        col("ts"), col("ts") + expr("INTERVAL 1 HOUR"))),

    // ---- A: ABC/Pareto classification (two-level global prefix sum) ----
    "q182_pareto_class" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_extendedprice").cast(D) *
          (lit(1) - col("l_discount").cast(D))).as("rev"))
      graft.operators.Analyses.paretoClass(rev, "l_partkey", "rev")
    }),

    // ---- A: per-group Gini coefficient (concentration diagnostic) ----
    "q183_gini" -> ((s, dir) =>
      graft.operators.Analyses.giniByGroup(
        Tables.customer(s, dir).filter(col("c_acctbal") > 0),
        "c_nationkey", "c_acctbal", col("c_custkey"))),

    // ---- W/J: first/last-touch attribution (trailing-horizon range window) ----
    "q184_attribution" -> ((s, dir) =>
      graft.operators.Relational.touchAttribution(
        Tables.events(s, dir), "user_id", "ts", "event_type", "event_id",
        convType = "purchase", touchType = "click",
        horizonSeconds = 7L * 24 * 3600)),

    // ---- G: bounded-round min-label propagation (connected components) ----
    "q185_label_propagation" -> ((s, dir) => {
      val b = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("it")).distinct()
      val p = b.join(b.select(col("ok"), col("it").as("jt")), Seq("ok"))
        .filter(col("it") < col("jt"))
        .groupBy(col("it"), col("jt")).agg(count(lit(1)).as("n_co"))
        .filter(col("n_co") >= 2)
      val edges = p.select(col("it").as("src"), col("jt").as("dst"))
        .unionAll(p.select(col("jt").as("src"), col("it").as("dst")))
      graft.operators.Graph.labelPropagation(edges, rounds = 10)
    }),

    // ---- V: one k-means EM step (assign + recompute means) ----
    "q186_kmeans_step" -> ((s, dir) =>
      graft.operators.Similarity.kmeansStep(
        Tables.spread(s, Tables.embeddings(s, dir)), "vec_id", "embedding",
        k = 8, dim = 64)),

    // ---- A/W: rolling distinct count (trailing-window diversity) ----
    "q187_rolling_distinct" -> ((s, dir) =>
      graft.operators.Analyses.rollingDistinct(
        Tables.events(s, dir), "user_id", "ts", "event_type",
        windowDays = 7)),

    // ---- D: exact set-similarity join with prefix filtering ----
    "q188_set_similarity" -> ((s, dir) => {
      // planted-overlap fixture (the q42/q51 integer-derived pattern):
      // customers in the same block of 10 share 8 md5 tokens and carry 4
      // private ones -> within-block Jaccard exactly 8/16 = 1/2, cross-block 0
      val toks = Tables.customer(s, dir)
        .select(col("c_custkey"),
          explode(sequence(lit(0), lit(11))).as("i"))
        .select(col("c_custkey"),
          when(col("i") < 8,
            md5(concat_ws(":", expr("c_custkey div 10").cast("string"),
              col("i").cast("string"))))
          .otherwise(
            md5(concat_ws(":", lit("own"), col("c_custkey").cast("string"),
              col("i").cast("string")))).as("tok"))
      graft.operators.Dedup.setSimilarityJoin(toks, "c_custkey", "tok",
        tNum = 1, tDen = 2)
    }),

    // ---- S: anti-entropy bucket checksum diff (table reconciliation) ----
    "q189_checksum_diff" -> ((s, dir) => {
      val a = Tables.lineitem(s, dir)
      // b = a with a deterministic simulated drift: every 997th order's
      // lines get +1 quantity (reconciliation target)
      val b = a.withColumn("l_quantity",
        when(col("l_orderkey") % 997 === 0, col("l_quantity") + 1)
          .otherwise(col("l_quantity")))
      val repr = concat_ws("|",
        col("l_orderkey").cast("string"), col("l_linenumber").cast("string"),
        col("l_quantity").cast("string"))
      graft.sources.Sources.checksumDiff(a, b,
        concat_ws("#", col("l_orderkey").cast("string"),
          col("l_linenumber").cast("string")),
        repr, nBuckets = 64)
    }),

    // ---- T: out-of-vocabulary rate against the corpus top-V vocab ----
    "q190_oov_rate" -> ((s, dir) =>
      graft.operators.TextOps.oovRate(
        Tables.documents(s, dir), "doc_id", "text", vocabSize = 20)),

    // ---- G: bounded-round multi-source shortest paths (Bellman-Ford) ----
    "q191_shortest_paths" -> ((s, dir) => {
      // copurchase graph, integer edge cost = 1000 div n_co (cheaper =
      // stronger tie); seeds = every 97th part key
      val b = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("it")).distinct()
      val p = b.join(b.select(col("ok"), col("it").as("jt")), Seq("ok"))
        .filter(col("it") < col("jt"))
        .groupBy(col("it"), col("jt")).agg(count(lit(1)).as("n_co"))
        .filter(col("n_co") >= 2)
        .withColumn("w", expr("1000L div n_co"))
      val edges = p.select(col("it").as("src"), col("jt").as("dst"), col("w"))
        .unionAll(p.select(col("jt").as("src"), col("it").as("dst"), col("w")))
      val seeds = edges.select(col("src").as("node")).distinct()
        .filter(col("node") % 97 === 0)
      graft.operators.Graph.shortestPaths(edges, seeds, rounds = 6)
    }),

    // ---- J: SCD2 point-in-time lookup (status stream ⋈ fact stream) ----
    "q192_scd2_lookup" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val dim = R.scd2(ev.filter(col("event_type") =!= "purchase"),
          "user_id", "ts", "event_type", tieBreak = col("event_id"))
        .select(col("user_id"), col("event_type").as("status"),
          col("valid_from"))
      val facts = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      Joins.asofJoin(facts, dim, "user_id", "ts", "valid_from", Seq("status"))
    }),

    // ---- A: functional-dependency violation detector ----
    "q193_fd_violations" -> ((s, dir) =>
      graft.operators.Analyses.fdViolations(
        Tables.part(s, dir), Seq("p_brand", "p_type"), "p_size")),

    // ---- A: ratio-to-parent rollup (nation share of region + global) ----
    "q194_ratio_to_parent" -> ((s, dir) => {
      val rn = Tables.nation(s, dir)
        .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
      val nrev = Tables.lineitem(s, dir)
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(rn), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(col("l_extendedprice").cast(D) *
          (lit(1) - col("l_discount").cast(D))).as("__rev"))
      // parent/global totals re-aggregate the nation grain (dimension-sized
      // BY NATURE) — shares are single divisions of exact-decimal doubles
      val rrev = nrev.groupBy(col("r_name")).agg(sum(col("__rev")).as("__rrev"))
      val grev = nrev.agg(sum(col("__rev")).as("__grev"))
      nrev.join(broadcast(rrev), Seq("r_name")).crossJoin(broadcast(grev))
        .select(col("r_name"), col("n_name"),
          col("__rev").cast("double").as("revenue"),
          (col("__rev").cast("double") / col("__rrev").cast("double"))
            .as("share_of_region"),
          (col("__rev").cast("double") / col("__grev").cast("double"))
            .as("share_of_total"))
    }),

    // ---- J: bloom-pruned semi-join (prune + exact verify) ----
    "q195_bloom_semi_join" -> ((s, dir) =>
      graft.operators.Joins.bloomPruneSemiJoin(
        Tables.lineitem(s, dir)
          .select("l_orderkey", "l_linenumber", "l_suppkey"),
        "l_suppkey",
        Tables.supplier(s, dir).filter(col("s_suppkey") % 11 === 0),
        "s_suppkey", mBits = 4096, kHashes = 3)),

    // ---- M: ViT-style tile/patch grid plan (metadata explode) ----
    "q196_tile_grid" -> ((s, dir) => {
      // integer-derived image dims (the q42 fixture pattern); every 17th
      // part stands in for an image row
      val imgs = Tables.part(s, dir)
        .filter(col("p_partkey") % 17 === 0)
        .select(col("p_partkey").as("img_id"),
          (lit(64L) + (col("p_partkey") * 13) % 1980).as("w"),
          (lit(64L) + (col("p_partkey") * 29) % 1080).as("h"))
      graft.operators.Multimodal.tileGrid(imgs, "w", "h",
        tile = 224, stride = 200)
    }),

    // ---- M: video frame-sampling plan (duration metadata explode) ----
    "q197_frame_sample" -> ((s, dir) => {
      val media = Tables.events(s, dir)
        .filter(col("event_id") % 101 === 0)
        .select(col("event_id"),
          struct((lit(1000L) + (col("event_id") * 37) % 60000)
            .as("duration_ms")).as("media_meta"))
      graft.operators.Multimodal.sampleFrames(media, stepMs = 2000L)
        .select(col("event_id"),
          col("media_meta.duration_ms").as("duration_ms"), col("frame_ms"))
    }),

    // ---- J: golden-record two-source merge (survivorship) ----
    "q198_golden_record" -> ((s, dir) => {
      val a = Tables.customer(s, dir)
      // feed B: every 10th customer re-arrives with a new balance but a
      // NULL segment (falls through to A), plus genuinely new entities
      val updates = a.filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), col("c_name"),
          (col("c_acctbal") + 100).as("c_acctbal"),
          lit(null).cast("string").as("c_mktsegment"))
      val arrivals = a.filter(col("c_custkey") % 250 === 0)
        .select((col("c_custkey") + 1000000).as("c_custkey"),
          concat(lit("new_"), col("c_name")).as("c_name"),
          col("c_acctbal"), col("c_mktsegment"))
      graft.operators.Joins.goldenRecord(a, updates.unionByName(arrivals),
        "c_custkey", Seq("c_name", "c_acctbal", "c_mktsegment"))
    }),

    // ---- V: deterministic contrastive eval-pair sampler ----
    "q199_eval_pairs" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("__v"))
      val n = e.agg(count(lit(1)).as("__n"))
      val pairs = s.range(500).select(col("id").as("pair_id"))
        .crossJoin(broadcast(n))
        .withColumn("a", conv(substring(md5(
          concat(lit("a:"), col("pair_id").cast("string"))), 1, 8), 16, 10)
          .cast("long") % col("__n"))
        .withColumn("b", conv(substring(md5(
          concat(lit("b:"), col("pair_id").cast("string"))), 1, 8), 16, 10)
          .cast("long") % col("__n"))
        .filter(col("a") =!= col("b"))
        .select("pair_id", "a", "b")
      // the pair table is param-sized (500 rows) -> broadcast by nature;
      // the corpus streams through two id joins
      broadcast(pairs)
        .join(e.select(col("vec_id").as("a"), col("__v").as("__va")), Seq("a"))
        .join(e.select(col("vec_id").as("b"), col("__v").as("__vb")), Seq("b"))
        .select(col("pair_id"), col("a"), col("b"),
          round(Similarity.cosineU(col("__va"), col("__vb"), 64), 6)
            .as("cos_sim"))
    }),

    // ---- P: incremental JOIN-view maintenance (delta algebra) ----
    "q200_incremental_join_view" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey").as("c_custkey"),
          col("o_orderdate"))
      val factOld = o.filter(col("o_orderdate") < lit("2000-01-01"))
      val deltaFact = o.filter(col("o_orderdate") >= lit("2000-01-01"))
      val dimOld = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
      val deltaDim = dimOld.filter(col("c_custkey") % 100 === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 50)
      graft.operators.Pipelines.incrementalJoinView(
          factOld, deltaFact, dimOld, deltaDim, "c_custkey")
        .select(col("o_orderkey"), col("c_custkey"), col("c_acctbal"),
          col("c_mktsegment"))
    }),

    // ---- A: per-group winsorized mean (robust location) ----
    "q201_winsorized_mean" -> ((s, dir) =>
      graft.operators.Analyses.winsorizedMean(
        Tables.customer(s, dir), "c_nationkey", "c_acctbal",
        pLo = 0.05, pHi = 0.95)),

    // ---- A: Kaplan-Meier survival (signup -> first purchase) ----
    "q202_kaplan_meier" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val t0 = ev.groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("d0"),
          min(when(col("event_type") === "purchase", to_date(col("ts"))))
            .as("dp"),
          max(to_date(col("ts"))).as("dl"))
      val subj = t0.select((col("user_id") % 3).as("seg"),
        when(col("dp").isNotNull, datediff(col("dp"), col("d0")))
          .otherwise(datediff(col("dl"), col("d0"))).as("dur"),
        when(col("dp").isNotNull, 1).otherwise(0).as("ev"))
      graft.operators.Analyses.kaplanMeier(subj, "seg", "dur", "ev")
    }),

    // ---- W: month-over-month growth with calendar-adjacency guard ----
    "q203_mom_growth" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val monthly = Tables.orders(s, dir)
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
          .as("month"), col("o_orderpriority"))
        .agg(sum(col("o_totalprice").cast(D)).as("__rev"))
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("month").asc)
      monthly
        .withColumn("__prev", lag(col("__rev"), 1).over(w))
        .withColumn("__pm", lag(col("month"), 1).over(w))
        .select(col("month"), col("o_orderpriority"),
          col("__rev").cast("double").as("revenue"),
          when(col("__pm") === add_months(col("month"), -1),
            col("__rev").cast("double") / col("__prev").cast("double"))
            .as("mom_ratio"))
    }),

    // ---- T: multinomial naive-Bayes fit + self-score ----
    "q204_naive_bayes" -> ((s, dir) =>
      graft.operators.TextOps.naiveBayesScore(
        Tables.documents(s, dir), "doc_id", "text", "lang")),

    // ---- A: two-feature OLS per group (normal equations, exact moments) ----
    "q205_ols2" -> ((s, dir) => {
      // every raw moment is an EXACT integer/decimal sum; the closed-form
      // solve is ONE mirrored double tree on bit-identical inputs
      val e = Tables.events(s, dir).select(col("event_type"),
        hour(col("ts")).cast("long").as("x1"),
        dayofweek(col("ts")).cast("long").as("x2"),
        col("value").cast(D).as("y"))
      val m = e.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
        sum(col("x1") * col("x1")).as("s11"),
        sum(col("x2") * col("x2")).as("s22"),
        sum(col("x1") * col("x2")).as("s12"),
        sum(col("y")).as("sy"),
        sum(col("y") * col("x1")).as("s1y"),
        sum(col("y") * col("x2")).as("s2y"))
      val nD = col("n").cast("double")
      val (s1D, s2D) = (col("s1").cast("double"), col("s2").cast("double"))
      val (s11D, s22D, s12D) = (col("s11").cast("double"),
        col("s22").cast("double"), col("s12").cast("double"))
      val (syD, s1yD, s2yD) = (col("sy").cast("double"),
        col("s1y").cast("double"), col("s2y").cast("double"))
      val S11 = s11D - s1D * s1D / nD
      val S22 = s22D - s2D * s2D / nD
      val S12 = s12D - s1D * s2D / nD
      val S1y = s1yD - s1D * syD / nD
      val S2y = s2yD - s2D * syD / nD
      val det = S11 * S22 - S12 * S12
      val b1 = (S22 * S1y - S12 * S2y) / det
      val b2 = (S11 * S2y - S12 * S1y) / det
      val b0 = syD / nD - b1 * (s1D / nD) - b2 * (s2D / nD)
      m.select(col("event_type"), col("n"),
        round(b0, 6).as("b0"), round(b1, 6).as("b1"), round(b2, 6).as("b2"))
    }),

    // ---- A: two-sample A/B z-test per metric (exact moments) ----
    "q206_ab_test" -> ((s, dir) => {
      // variant = user parity (deterministic assignment); per event_type:
      // diff of means over pooled standard error, all from exact sums in
      // ONE mirrored double tree
      val e = Tables.events(s, dir).select(col("event_type"),
        (col("user_id") % 2).as("__v"), col("value").cast(D).as("__y"))
      val m = e.groupBy(col("event_type")).agg(
        sum(when(col("__v") === 0, 1).otherwise(0)).cast("long").as("na"),
        sum(when(col("__v") === 1, 1).otherwise(0)).cast("long").as("nb"),
        sum(when(col("__v") === 0, col("__y"))
          .otherwise(lit(0).cast(D))).as("sa"),
        sum(when(col("__v") === 1, col("__y"))
          .otherwise(lit(0).cast(D))).as("sb"),
        sum(when(col("__v") === 0, col("__y") * col("__y"))
          .otherwise(lit(0).cast("decimal(38,4)"))).as("qa"),
        sum(when(col("__v") === 1, col("__y") * col("__y"))
          .otherwise(lit(0).cast("decimal(38,4)"))).as("qb"))
      val (naD, nbD) = (col("na").cast("double"), col("nb").cast("double"))
      val (saD, sbD) = (col("sa").cast("double"), col("sb").cast("double"))
      val (qaD, qbD) = (col("qa").cast("double"), col("qb").cast("double"))
      val va = (qaD - saD * saD / naD) / (naD - 1)
      val vb = (qbD - sbD * sbD / nbD) / (nbD - 1)
      val z = (sbD / nbD - saD / naD) / sqrt(va / naD + vb / nbD)
      m.select(col("event_type"), col("na"), col("nb"),
        round(saD / naD, 6).as("mean_a"), round(sbD / nbD, 6).as("mean_b"),
        round(z, 6).as("z_score"))
    }),

    // ---- W: top event paths (3-step sequences within user streams) ----
    "q207_top_paths" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, dir)
        .withColumn("__n1", lead(col("event_type"), 1).over(w))
        .withColumn("__n2", lead(col("event_type"), 2).over(w))
        .filter(col("__n2").isNotNull)
        .select(concat_ws(">", col("event_type"), col("__n1"), col("__n2"))
          .as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path").asc)
        .limit(20)
    }),

    // ---- P: multi-rule validation with violation tags ----
    "q208_rule_tags" -> ((s, dir) => {
      // rule-tagged quarantine split: each failing row carries the SORTED
      // list of violated rules (joined to one string for a stable compare)
      val c = Tables.customer(s, dir)
      val viol = array_sort(org.apache.spark.sql.functions.filter(array(
        when(col("c_acctbal") < -500, lit("balance_low")),
        when(col("c_acctbal") > 9000, lit("balance_high")),
        when(!col("c_mktsegment").isin("AUTOMOBILE", "BUILDING", "FURNITURE",
          "HOUSEHOLD", "MACHINERY"), lit("bad_segment")),
        when(col("c_custkey") % 1000 === 0, lit("audit_sample"))),
        x => x.isNotNull))
      c.withColumn("violations", concat_ws(",", viol))
        .filter(col("violations") =!= "")
        .select("c_custkey", "c_acctbal", "c_mktsegment", "violations")
    }),

    // ---- J: nearest-event join (closest by |Δt|, tie to earlier) ----
    "q209_nearest_join" -> ((s, dir) => {
      // align each purchase to its NEAREST click either side within 1 day:
      // backward as-of (max ts ≤ t) + forward as-of (min ts > t) via ONE
      // key-partitioned pass each, then pick the closer (tie -> earlier)
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts")).as("__cts"),
          col("event_id").as("__cid"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          unix_micros(col("ts")).as("__pts"))
      val horizon = 86400000000L
      val wB = Window.partitionBy(col("user_id")).orderBy(col("__t").asc)
        .rangeBetween(-horizon, 0)
      val wF = Window.partitionBy(col("user_id")).orderBy(col("__t").asc)
        .rangeBetween(0, horizon)
      val u = buys.select(col("event_id"), col("user_id"), col("ts"),
          col("__pts").as("__t"), lit(null).cast("long").as("__cts"),
          lit(null).cast("long").as("__cid"), lit(1).as("__isbuy"))
        .unionByName(clicks.select(lit(null).cast("long").as("event_id"),
          col("user_id"), lit(null).cast("timestamp").as("ts"),
          col("__cts").as("__t"), col("__cts"), col("__cid"),
          lit(0).as("__isbuy")))
      val back = max(when(col("__isbuy") === 0,
        struct(col("__cts").as("t"), col("__cid").as("id")))).over(wB)
      val fwd = min(when(col("__isbuy") === 0,
        struct(col("__cts").as("t"), col("__cid").as("id")))).over(wF)
      u.withColumn("__b", back).withColumn("__f", fwd)
        .filter(col("__isbuy") === 1)
        .withColumn("__db", col("__t") - col("__b.t"))
        .withColumn("__df", col("__f.t") - col("__t"))
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("__b").isNull && col("__f").isNull, lit(null).cast("long"))
            .when(col("__f").isNull, col("__b.id"))
            .when(col("__b").isNull, col("__f.id"))
            .when(col("__db") <= col("__df"), col("__b.id"))
            .otherwise(col("__f.id")).as("nearest_click_id"))
    }),

    // ---- A/L: top-k per group with OTHERS rollup ----
    "q210_topk_others" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val rev = Tables.lineitem(s, dir)
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey"), col("l_partkey"))
        .agg(sum(col("l_extendedprice").cast(D) *
          (lit(1) - col("l_discount").cast(D))).as("__rev"))
      val w = Window.partitionBy(col("s_nationkey"))
        .orderBy(col("__rev").desc, col("l_partkey").asc)
      val ranked = rev.withColumn("__rnk", row_number().over(w))
      val top = ranked.filter(col("__rnk") <= 5)
        .select(col("s_nationkey"), col("l_partkey").cast("string").as("part"),
          col("__rev").cast("double").as("revenue"))
      val others = ranked.filter(col("__rnk") > 5)
        .groupBy(col("s_nationkey"))
        .agg(sum(col("__rev")).cast("double").as("revenue"))
        .select(col("s_nationkey"), lit("OTHERS").as("part"), col("revenue"))
      top.unionByName(others)
    }),

    // ---- P: curation filter-chain attrition report ----
    "q211_filter_attrition" -> ((s, dir) => {
      // per-rule sequential attrition: ONE pass computes every prefix
      // count, then the one-row aggregate unpivots to a row per rule
      val d = Tables.documents(s, dir)
        .select(col("n_chars"), col("lang"),
          size(graft.operators.TextOps.tokens(col("text"))).as("__nt"))
      val agg = d.agg(
        count(lit(1)).as("c0"),
        sum(when(col("n_chars") >= 50, 1).otherwise(0)).cast("long").as("c1"),
        sum(when(col("n_chars") >= 50 && col("lang") =!= "zh", 1)
          .otherwise(0)).cast("long").as("c2"),
        sum(when(col("n_chars") >= 50 && col("lang") =!= "zh" &&
          col("__nt") >= 5, 1).otherwise(0)).cast("long").as("c3"))
      agg.select(explode(array(
          struct(lit("1_min_length").as("rule"), col("c0").as("n_in"),
            col("c1").as("n_out")),
          struct(lit("2_lang_allowlist").as("rule"), col("c1").as("n_in"),
            col("c2").as("n_out")),
          struct(lit("3_min_tokens").as("rule"), col("c2").as("n_in"),
            col("c3").as("n_out")))).as("__r"))
        .select(col("__r.rule"), col("__r.n_in"), col("__r.n_out"),
          (col("__r.n_in") - col("__r.n_out")).as("n_dropped"))
    }),

    // ---- T/P: per-source contamination-rate report ----
    "q212_contamination_report" -> ((s, dir) => {
      val d = Tables.spread(s, Tables.documents(s, dir))
      val train = d.filter(col("doc_id") % 97 =!= 0)
      val hits = graft.operators.TextOps.contaminationHits(
        train, "doc_id", "text",
        d.filter(col("doc_id") % 97 === 0), "text", n = 3)
      train.join(hits.select(col("doc_id"), lit(1).as("__hit")),
          Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("__hit").isNotNull, 1).otherwise(0)).cast("long")
            .as("n_contaminated"))
        .select(col("source"), col("n_docs"), col("n_contaminated"),
          (col("n_contaminated").cast("double") / col("n_docs").cast("double"))
            .as("contamination_rate"))
    }),

    // ---- P: RLHF preference-pair construction (best vs worst per group) ----
    "q213_preference_pairs" -> ((s, dir) =>
      graft.operators.Pipelines.preferencePairs(
        Tables.documents(s, dir), Seq("source", "lang"), "doc_id",
        col("n_chars"))),

    // ---- D: duplicate-cluster size distribution (dedup report) ----
    "q214_dup_cluster_sizes" -> ((s, dir) => {
      // exact-duplicate clusters via the bag fingerprint; the report is the
      // histogram of cluster sizes — the dedup-audit summary a curation run
      // publishes (how much boilerplate, how big the families)
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), graft.operators.TextOps.bagFingerprint(
          graft.operators.TextOps.tokens(col("text"))).as("__fp"))
      d.groupBy(col("__fp")).agg(count(lit(1)).as("__sz"))
        .groupBy(col("__sz").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
    }),

    // ---- T/P: span-corruption masking plan (T5-style, deterministic) ----
    "q215_mask_spans" -> ((s, dir) =>
      graft.operators.Pipelines.maskSpans(
        Tables.documents(s, dir), "doc_id", "text", maskPct = 15)),

    // ---- A: leave-one-out target encoding (leakage-safe feature) ----
    "q216_target_encoding" -> ((s, dir) => {
      // enc_i = (Σ_cat y − y_i) / (n_cat − 1): numerator exact decimal,
      // ONE division; single-member categories yield null (no self-leak)
      val e = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          col("value").cast(D).as("__y"))
      val agg = e.groupBy(col("event_type"))
        .agg(sum(col("__y")).as("__s"), count(lit(1)).as("__n"))
      e.join(agg, Seq("event_type"))
        .select(col("event_id"), col("event_type"),
          when(col("__n") > 1, round(
            (col("__s") - col("__y")).cast("double") /
              (col("__n") - 1).cast("double"), 6)).as("loo_enc"))
    }),

    // ---- A: k-anonymity audit over quasi-identifiers ----
    "q217_k_anonymity" -> ((s, dir) =>
      // groups of quasi-identifiers smaller than k are re-identification
      // risks — the privacy audit an export pipeline runs before release
      Tables.customer(s, dir)
        .groupBy(col("c_mktsegment"), col("c_nationkey"),
          expr("cast(floor(c_acctbal / 1000) as bigint)").as("bal_band"))
        .agg(count(lit(1)).as("group_size"))
        .filter(col("group_size") < 5)),

    // ---- A: Benford first-digit conformance per group ----
    "q218_benford" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .filter(col("o_totalprice") >= 1)
        .select(col("o_orderpriority"),
          substring(floor(col("o_totalprice")).cast("long").cast("string"),
            1, 1).cast("int").as("digit"))
      val cnt = o.groupBy(col("o_orderpriority"), col("digit"))
        .agg(count(lit(1)).as("observed"))
      val tot = cnt.groupBy(col("o_orderpriority"))
        .agg(sum(col("observed")).as("__n"))
      cnt.join(tot, Seq("o_orderpriority"))
        .withColumn("__e", col("__n").cast("double") *
          log(10.0, lit(1.0d) + lit(1.0d) / col("digit").cast("double")))
        .select(col("o_orderpriority"), col("digit"), col("observed"),
          round(col("__e"), 6).as("expected"),
          round((col("observed").cast("double") - col("__e")) *
            (col("observed").cast("double") - col("__e")) / col("__e"), 6)
            .as("chi2_contrib"))
    }),

    // ---- A: join-key skew report (scale-planning diagnostic) ----
    "q219_skew_report" -> ((s, dir) => {
      // per candidate shuffle key: cardinality, hottest-key share, and the
      // max/mean ratio that predicts reducer imbalance — the numbers that
      // decide salting/AQE-skew config before a 100 TB run
      def keyStats(keyCol: String) = Tables.lineitem(s, dir)
        .groupBy(col(keyCol).as("__k")).agg(count(lit(1)).as("__c"))
        .agg(lit(keyCol).as("join_key"), count(lit(1)).as("n_keys"),
          sum(col("__c")).as("n_rows"), max(col("__c")).as("max_cnt"))
        .select(col("join_key"), col("n_keys"), col("max_cnt"),
          round(col("n_rows").cast("double") / col("n_keys").cast("double"), 6)
            .as("mean_cnt"),
          round(col("max_cnt").cast("double") * col("n_keys").cast("double") /
            col("n_rows").cast("double"), 6).as("skew_ratio"))
      keyStats("l_suppkey").unionByName(keyStats("l_partkey"))
        .unionByName(keyStats("l_orderkey"))
    }),

    // ---- P: RAG ingest prep (chunk -> dedup -> per-doc index stats) ----
    "q220_rag_prep" -> ((s, dir) => {
      // the retrieval-ingest composition: overlapped chunking, exact chunk
      // dedup (boilerplate chunks collapse corpus-wide), then per-doc
      // index statistics a RAG store reports after ingest
      val chunks = graft.operators.TextOps.chunkTokens(
        Tables.documents(s, dir), "doc_id", "text",
        chunkSize = 20, overlap = 5)
      val keyed = chunks.withColumn("__fp", md5(col("chunk_text")))
      val keep = keyed.withColumn("__keep",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("__fp"))
          .orderBy(col("doc_id").asc, col("chunk_id").asc)) === 1)
      keep.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("__keep"), 1).otherwise(0)).cast("long")
            .as("n_kept_chunks"),
          sum(col("n_chunk_tokens")).as("n_tokens"))
    }),

    // ---- P: dataset card (per-source release datasheet) ----
    "q221_dataset_card" -> ((s, dir) => {
      // the release artifact a curated corpus ships with: per source, the
      // size, token mass, language mix, and exact-dup rate in ONE row —
      // every number from exact sums, each rate ONE division
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
          size(graft.operators.TextOps.tokens(col("text"))).as("__nt"),
          graft.operators.TextOps.bagFingerprint(
            graft.operators.TextOps.tokens(col("text"))).as("__fp"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__fp")).orderBy(col("doc_id").asc)
      d.withColumn("__dup", row_number().over(w) > 1)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("__nt")).as("total_tokens"),
          (sum(col("n_chars")).cast("double") /
            count(lit(1)).cast("double")).as("mean_chars"),
          (sum(when(col("lang") === "en", 1).otherwise(0)).cast("double") /
            count(lit(1)).cast("double")).as("pct_en"),
          (sum(when(col("__dup"), 1).otherwise(0)).cast("double") /
            count(lit(1)).cast("double")).as("dup_rate"))
    }),

    // ---- V: retrieval evaluation (recall@k + MRR of ANN vs brute truth) ----
    "q222_retrieval_eval" -> ((s, dir) => {
      // the eval harness AS a data op: ground truth from the exact scan,
      // candidates from the LSH index, metrics per query — each metric ONE
      // division of exact integers
      val e = Tables.spread(s, Tables.embeddings(s, dir))
      val truth = Similarity.bruteKnn(e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, dim = 64)
      val cand = Similarity.lshKnn(e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", dim = 64, nPlanes = 6, k = 5)
      val hits = truth.select(col("query_id"), col("neighbor_id"))
        .join(cand.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
      val top1 = truth.filter(col("rank") === 1)
        .select(col("query_id"), col("neighbor_id").as("__t1"))
      val rr = top1.join(cand.select(col("query_id"),
          col("neighbor_id").as("__t1"), col("rank").as("__cr")),
          Seq("query_id", "__t1"), "left")
        .select(col("query_id"),
          coalesce(lit(1.0d) / col("__cr").cast("double"), lit(0.0d))
            .as("rr"))
      truth.select(col("query_id")).distinct()
        .join(hits, Seq("query_id"), "left")
        .join(rr, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)).cast("double") /
            lit(5.0d)).as("recall5"),
          col("rr"))
    }),

    // ---- W/A: session quality metrics (bounce rate, duration) ----
    "q223_session_metrics" -> ((s, dir) => {
      // per session-start day: session count, bounce rate (single-event
      // sessions), mean events/session, mean duration — the product
      // dashboard built on the q87 sessionizer; rates are single exact
      // divisions
      val sess = R.sessionize(Tables.events(s, dir), "user_id", "ts",
          gapSeconds = 1800, tieBreak = col("event_id"))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(to_date(col("ts"))).as("day"),
          count(lit(1)).as("__n"),
          (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
            .as("__dur_us"))
      sess.groupBy(col("day"))
        .agg(count(lit(1)).as("n_sessions"),
          (sum(when(col("__n") === 1, 1).otherwise(0)).cast("double") /
            count(lit(1)).cast("double")).as("bounce_rate"),
          (sum(col("__n")).cast("double") / count(lit(1)).cast("double"))
            .as("mean_events"),
          (sum(col("__dur_us")).cast("double") /
            count(lit(1)).cast("double")).as("mean_duration_us"))
    }),

    // ---- A: utilization heatmap (dow × hour with share-of-day) ----
    "q224_usage_heatmap" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(dayofweek(col("ts")).as("dow"), hour(col("ts")).as("hod"))
      val cell = e.groupBy(col("dow"), col("hod"))
        .agg(count(lit(1)).as("n"))
      val day = cell.groupBy(col("dow")).agg(sum(col("n")).as("__d"))
      cell.join(day, Seq("dow"))
        .select(col("dow"), col("hod"), col("n"),
          (col("n").cast("double") / col("__d").cast("double"))
            .as("share_of_day"))
    }),

    // ---- A: TPC-H Q6 shape — forecast revenue from a discount band ----
    "q225_forecast_revenue" -> ((s, dir) => {
      // the canonical scan-dominant aggregate: one predicate over the fact
      // table, zero joins, single-row partial+final agg. At 100 TB this is
      // pure scan bandwidth — the three filters and the 3-column projection
      // must reach the parquet reader (PushedFilters/ReadSchema audited in
      // PLANS.md); revenue is an exact decimal sum cast to double last.
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1998-01-01") &&
          col("l_discount").between(0.04, 0.08) &&
          col("l_quantity") < 24)
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_extendedprice").cast(D) * col("l_discount").cast(D))
            .cast("double").as("revenue"))
    }),

    // ---- J/A: TPC-H Q15 shape — top supplier(s) by quarterly revenue ----
    "q226_top_supplier" -> ((s, dir) => {
      // two-pass argmax: aggregate once per supplier, reduce to the single
      // max row, then equi-join back on the EXACT decimal revenue (never a
      // global window sort). Spark's ReuseExchange collapses the two uses
      // of `rev` into one shuffle; `best` is a 1-row broadcast.
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1997-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_extendedprice").cast(D) *
          (lit(1) - col("l_discount").cast(D))).as("r"))
      val best = rev.agg(max(col("r")).as("rmax"))
      rev.join(broadcast(best), col("r") === col("rmax"))
        .join(Tables.supplier(s, dir).select("s_suppkey", "s_name"),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("r").cast("double").as("total_revenue"))
    }),

    // ---- J/A: TPC-H Q19 shape — disjunctive brand/size/qty revenue ----
    "q227_disjunctive_revenue" -> ((s, dir) => {
      // the classic Q19 rewrite: the OR-of-ANDs stays a RESIDUAL filter on
      // an equi-hash-join (never a nested-loop θ-join), and the disjunction's
      // union bounds (3 brands, size ≤ 35, qty ∈ [1,30]) are factored out and
      // pushed to each scan so both sides prune before the shuffle.
      val p = Tables.part(s, dir)
        .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34") &&
          col("p_size").between(1, 35))
        .select("p_partkey", "p_brand", "p_size")
      val l = Tables.lineitem(s, dir)
        .filter(col("l_quantity").between(1, 30))
        .select(col("l_partkey"), col("l_quantity"),
          (col("l_extendedprice").cast(D) *
            (lit(1) - col("l_discount").cast(D))).as("vol"))
      val cond =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 30))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(cond)
        .agg(count(lit(1)).as("n_lines"),
          sum(col("vol")).cast("double").as("revenue"))
    }),

    // ---- A: exponentially-decayed popularity (recency-weighted counts) ----
    "q228_decayed_popularity" -> ((s, dir) => {
      // the feature-store staple: counts where each event contributes
      // 2^(-age/halflife) — one scan + one agg, the anchor timestamp is a
      // 1-row broadcast. Decay terms are 6dp-rounded then summed EXACTLY in
      // decimal (the kaplanMeier ln-sum discipline) so the sum is
      // order-independent across engines and partitionings.
      val e = Tables.events(s, dir)
      val anchor = e.agg(max(col("ts")).as("__mts"))
      e.crossJoin(broadcast(anchor))
        .withColumn("__w",
          round(pow(lit(0.5d),
            (unix_micros(col("__mts")) - unix_micros(col("ts"))) /
              lit(86400000000.0d) / lit(7.0d)), 6).cast("decimal(18,6)"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("__w")).cast("double").as("decayed_count"))
    }),

    // ---- A: PSI distribution-drift report (population stability index) ----
    "q229_psi_drift" -> ((s, dir) => {
      // per-source drift of the n_chars distribution between the even-id
      // (reference) and odd-id (current) halves: 10 equi-width bins over the
      // GLOBAL min/max (one 1-row broadcast), add-1 smoothing over the full
      // bin grid (empty bins included via the 10-row literal bin table),
      // contributions 6dp-rounded then summed exactly in decimal. The
      // monitoring op a production corpus pipeline runs on every refresh.
      val d = Tables.documents(s, dir).select(col("source"),
        (col("doc_id") % 2).cast("int").as("half"), col("n_chars"))
      val mm = d.agg(min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"))
      val binned = d.crossJoin(broadcast(mm))
        .withColumn("bin", least(floor(
          (col("n_chars") - col("lo")).cast("double") /
            ((col("hi") - col("lo")).cast("double") / lit(10.0d)))
          .cast("int"), lit(9)))
      val cnt = binned.groupBy(col("source"), col("half"), col("bin"))
        .agg(count(lit(1)).as("c"))
      val tot = d.groupBy(col("source"))
        .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("n_ref"),
          sum(when(col("half") === 1, 1L).otherwise(0L)).as("n_cur"))
      val bins = s.range(10).select(col("id").cast("int").as("bin"))
      val grid = d.select(col("source")).distinct()
        .crossJoin(broadcast(bins))
      val g = grid
        .join(cnt.filter(col("half") === 0).select(col("source"), col("bin"),
          col("c").as("c_ref")), Seq("source", "bin"), "left")
        .join(cnt.filter(col("half") === 1).select(col("source"), col("bin"),
          col("c").as("c_cur")), Seq("source", "bin"), "left")
        .na.fill(0L, Seq("c_ref", "c_cur"))
        .join(tot, Seq("source"))
      val p = (col("c_ref") + lit(1.0d)) / (col("n_ref") + lit(10.0d))
      val q = (col("c_cur") + lit(1.0d)) / (col("n_cur") + lit(10.0d))
      g.withColumn("__t",
          round((p - q) * log(p / q), 6).cast("decimal(18,6)"))
        .groupBy(col("source"))
        .agg(max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
          sum(col("__t")).cast("double").as("psi"))
    }),

    // ---- A: HLL sketch accuracy gate (approx distinct within bound) ----
    "q230_hll_accuracy" -> ((s, dir) =>
      // the 100 TB cardinality path is the HLL++ sketch (mergeable, fixed
      // size); this gate runs sketch and exact side by side and asserts the
      // sketch lands within 3× its 5% rsd — the oracle can't run Spark's
      // HLL, so the CONTRACT (exact value + bound holds) is what's gated.
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"),
          approx_count_distinct(col("user_id"), 0.05).as("__a"))
        .select(col("event_type"), col("n_exact"),
          (abs(col("__a") - col("n_exact")) <=
            lit(0.15d) * col("n_exact").cast("double")).as("within_bound"))),

    // ---- EXT: train/val/test leakage audit (cross-split duplicates) ----
    "q231_split_leakage" -> ((s, dir) => {
      // composition gate: q54's md5-stable split assignment × q35's
      // order-insensitive bag fingerprint — per split, how many distinct
      // fingerprints also appear in ANOTHER split (the leakage a dedup pass
      // must run BEFORE splitting to avoid). One distinct + one self-sized
      // join on fp; no windows.
      val d = Tables.documents(s, dir).select(
        graft.operators.Sampling.splitAssign(col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"),
        TextOps.bagFingerprint(TextOps.tokens(col("text"))).as("fp"))
        .distinct()
      val multi = d.groupBy(col("fp"))
        .agg(countDistinct(col("split")).as("__ns"))
      d.join(multi, Seq("fp"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_fps"),
          sum(when(col("__ns") >= 2, 1L).otherwise(0L)).as("n_leaked"))
    }),

    // ---- A: approx-percentile accuracy gate (the 100 TB quantile path) ----
    "q232_approx_quantile_gate" -> ((s, dir) =>
      // exact interpolated percentiles don't scale (full sort per group);
      // the scale path is the mergeable KLL-style sketch. Its merge order
      // varies with partitioning, so the VALUE can't be oracled — the gate
      // asserts the rank-error CONTRACT instead: the sketch's p50/p90 must
      // land within the exact [p45,p55]/[p85,p95] rank windows (accuracy
      // 10000 → rank error 1e-4 ≪ the 0.05 window).
      Tables.documents(s, dir)
        .select(col("lang"), size(TextOps.tokens(col("text"))).as("n_tokens"))
        .groupBy(col("lang"))
        .agg(
          expr("percentile(n_tokens, array(0.45, 0.5, 0.55, 0.85, 0.9, 0.95))")
            .as("__ex"),
          expr("approx_percentile(n_tokens, array(0.5, 0.9), 10000)").as("__ap"))
        .select(col("lang"),
          element_at(col("__ex"), 2).as("p50_exact"),
          element_at(col("__ex"), 5).as("p90_exact"),
          (element_at(col("__ap"), 1) >= element_at(col("__ex"), 1) &&
            element_at(col("__ap"), 1) <= element_at(col("__ex"), 3)).as("ok50"),
          (element_at(col("__ap"), 2) >= element_at(col("__ex"), 4) &&
            element_at(col("__ap"), 2) <= element_at(col("__ex"), 6)).as("ok90"))),

    // ---- EXT: label-centroid cosine similarity matrix ----
    "q233_centroid_similarity" -> ((s, dir) => {
      // cluster-level embedding analytics: per-label centroid, then the
      // pairwise cosine matrix (labels are a design-time dimension, so the
      // matrix is dimension-sized — never corpus×corpus). Every float sum
      // runs through the 6dp/12dp round→decimal→exact-sum discipline so
      // partial-aggregation order can't shift the result.
      val e = Tables.embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding")))
        .toDF("label", "dim", "v")
      val cen = e.groupBy(col("label"), col("dim"))
        .agg((sum(round(col("v").cast("double"), 6).cast("decimal(18,6)"))
          .cast("double") / count(lit(1))).as("m"))
      val a = cen.select(col("label").as("la"), col("dim"), col("m").as("ma"))
      val b = cen.select(col("label").as("lb"), col("dim"), col("m").as("mb"))
      a.join(b, Seq("dim")).filter(col("la") < col("lb"))
        .groupBy(col("la"), col("lb"))
        .agg(
          sum(round(col("ma") * col("mb"), 12).cast("decimal(28,12)"))
            .cast("double").as("__dot"),
          sum(round(col("ma") * col("ma"), 12).cast("decimal(28,12)"))
            .cast("double").as("__na2"),
          sum(round(col("mb") * col("mb"), 12).cast("decimal(28,12)"))
            .cast("double").as("__nb2"))
        .select(col("la"), col("lb"),
          round(col("__dot") / sqrt(col("__na2") * col("__nb2")), 6)
            .as("cos_sim"))
    }),

    // ---- EXT: exact ROC-AUC via the rank-sum identity ----
    "q234_auc" -> ((s, dir) => {
      // classifier-evaluation staple: AUC of a score column against a binary
      // label, computed as P(score_pos > score_neg) + ½P(tie) from the
      // VALUE-DISTRIBUTION table (distinct n_chars — bounded by the length
      // domain, never corpus-sized; the q130 bounded-domain discipline), not
      // a corpus-sized rank window. Every term is an integer count, so the
      // whole computation is exact until the single final division.
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documents(s, dir).select(col("n_chars"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      val dist = d.groupBy(col("n_chars"))
        .agg(sum(col("pos")).as("np"), sum(lit(1L) - col("pos")).as("nn"))
      // one ordered prefix over the bounded distinct-value table (the only
      // single-partition step; its row count is the value domain, not N)
      val w = Window.orderBy(col("n_chars"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = dist.withColumn("cum_nn_below",
        coalesce(sum(col("nn")).over(w), lit(0L)))
      cum.agg(sum(col("np")).as("__p"), sum(col("nn")).as("__n"),
          sum(col("np") * col("cum_nn_below")).as("__gt"),
          sum(col("np") * col("nn")).as("__tie"))
        .select(col("__p").as("n_pos"), col("__n").as("n_neg"),
          round((col("__gt").cast("double") +
              lit(0.5d) * col("__tie").cast("double")) /
            (col("__p") * col("__n")).cast("double"), 6).as("auc"))
    }),

    // ---- EXT: Cohen's kappa inter-annotator agreement ----
    "q235_cohens_kappa" -> ((s, dir) => {
      // agreement between two deterministic labeling rules (char-length vs
      // token-count "long document" annotators) beyond chance: one scan, one
      // hash agg; po/pe assembled in ONE mirrored double expression from
      // exact integer marginals (the q152 closed-form-moments discipline).
      val d = Tables.documents(s, dir).select(
        when(col("n_chars") >= 500, 1L).otherwise(0L).as("a"),
        when(size(TextOps.tokens(col("text"))) >= 80, 1L).otherwise(0L)
          .as("b"))
      val m = d.agg(count(lit(1)).as("n"),
        sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("n_agree"),
        sum(col("a")).as("na"), sum(col("b")).as("nb"))
      val n  = col("n").cast("double")
      val po = col("n_agree").cast("double") / n
      val pe = (col("na").cast("double") / n) * (col("nb").cast("double") / n) +
        ((n - col("na").cast("double")) / n) *
          ((n - col("nb").cast("double")) / n)
      m.select(col("n"), col("n_agree"),
        round((po - pe) / (lit(1.0d) - pe), 6).as("kappa"))
    }),

    // ---- EXT: calibration reliability bins (ECE inputs) ----
    "q236_calibration_bins" -> ((s, dir) => {
      // calibration audit of a deterministic confidence score (clamped
      // length squash predicting lang='en'): 10 equi-width confidence bins,
      // per-bin accuracy vs mean confidence — the reliability-diagram table
      // ECE is read from. Confidences 6dp-rounded then summed exactly in
      // decimal so partial-agg order can't shift the mean.
      val d = Tables.documents(s, dir).select(
        (least(col("n_chars"), lit(2000)).cast("double") / lit(2000.0d))
          .as("conf"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      d.withColumn("bin",
          least(floor(col("conf") * 10).cast("long"), lit(9L)))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_b"), sum(col("y")).as("n_pos"),
          sum(round(col("conf"), 6).cast("decimal(18,6)")).as("__sc"))
        .select(col("bin"), col("n_b"),
          round(col("n_pos").cast("double") / col("n_b"), 6).as("acc"),
          round(col("__sc").cast("double") / col("n_b"), 6).as("avg_conf"))
    }),

    // ---- EXT: corpus-comparison keyness (smoothed log-odds) ----
    "q237_log_odds_keyness" -> ((s, dir) => {
      // which terms characterize the 'web' slice vs the rest: +1-smoothed
      // log-odds ratio per term over vocab-sized aggregates (term counts +
      // one 1-row broadcast of the side totals). Scores 6dp-rounded BEFORE
      // the top-k so a libm ulp can't flip the selection boundary; ties
      // broken on the term itself.
      val toks = Tables.documents(s, dir)
        .select(when(col("source") === "web", 1).otherwise(0).as("w"),
          explode(TextOps.tokens(col("text"))).as("term"))
        .filter(length(col("term")) >= 3)
      val counts = toks.groupBy(col("term"))
        .agg(sum(when(col("w") === 1, 1L).otherwise(0L)).as("n_web"),
          sum(when(col("w") === 0, 1L).otherwise(0L)).as("n_rest"))
      val tot = counts.agg(sum(col("n_web")).as("__tw"),
        sum(col("n_rest")).as("__tr"))
      counts.filter(col("n_web") + col("n_rest") >= 10)
        .crossJoin(broadcast(tot))
        .withColumn("log_odds", round(
          log((col("n_web") + lit(1.0d)) /
              (col("__tw") - col("n_web") + lit(1.0d))) -
          log((col("n_rest") + lit(1.0d)) /
              (col("__tr") - col("n_rest") + lit(1.0d))), 6))
        .orderBy(col("log_odds").desc, col("term"))
        .limit(20)
        .select(col("term"), col("n_web"), col("n_rest"), col("log_odds"))
    }),

    // ---- EXT: exponentially-weighted moving average (daily series) ----
    "q238_ewma_daily" -> ((s, dir) => {
      // adjusted EWMA over the per-type DAILY count series: ewma_t =
      // Σ_{i≤t} 0.7^(t−i)·x_i / Σ_{i≤t} 0.7^(t−i) with calendar-day decay.
      // The sequential recurrence is re-expressed as a self-join on the DAY
      // GRID — bounded by the calendar span (≤365²/type/year), never by
      // event count, so it survives 100× data growth unchanged. Terms
      // 6dp-rounded then summed exactly in decimal.
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))
      val a = daily.select(col("event_type"), col("day"))
      val b = daily.select(col("event_type"), col("day").as("iday"),
        col("x").as("ix"))
      a.join(b, Seq("event_type")).filter(col("iday") <= col("day"))
        .withColumn("__w",
          round(pow(lit(0.7d), datediff(col("day"), col("iday"))), 6))
        .groupBy(col("event_type"), col("day"))
        .agg(
          sum(round(col("__w") * col("ix"), 6).cast("decimal(28,6)"))
            .cast("double").as("__num"),
          sum(col("__w").cast("decimal(18,6)")).cast("double").as("__den"))
        .select(col("event_type"), col("day"),
          round(col("__num") / col("__den"), 6).as("ewma"))
    }),

    // ---- EXT: CUSUM change-point statistic (exact integer algebra) ----
    "q239_cusum" -> ((s, dir) => {
      // classic mean-shift detector over the per-type daily series:
      // CUSUM⁺_t = p_t − min_{i≤t} p_i with p_t = Σ_{i≤t}(x_i − mean).
      // Scaled by n (day count) the whole statistic is INTEGER-exact:
      // n·p_t = n·cumx_t − t·S — so max/argmax comparisons can't be
      // perturbed by float noise; the single division happens at output.
      // All windows run over the bounded day grid, partitioned by type.
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))
      val wAll = Window.partitionBy(col("event_type"))
      val wCum = wAll.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val p = daily
        .withColumn("__n", count(lit(1)).over(wAll))
        .withColumn("__s", sum(col("x")).over(wAll))
        .withColumn("__t", row_number().over(wAll.orderBy(col("day"))))
        .withColumn("__np",
          col("__n") * sum(col("x")).over(wCum) - col("__t") * col("__s"))
      val cu = p.withColumn("__cu", col("__np") - min(col("__np")).over(wCum))
      val best = cu.withColumn("__rn", row_number().over(
        wAll.orderBy(col("__cu").desc, col("day"))))
      best.filter(col("__rn") === 1)
        .select(col("event_type"), col("day").as("change_day"),
          round(col("__cu").cast("double") / col("__n").cast("double"), 6)
            .as("cusum"))
    }),

    // ---- EXT: day-of-week seasonality index ----
    "q240_dow_seasonality" -> ((s, dir) => {
      // traffic-shape profile: mean daily volume per weekday vs the overall
      // daily mean, per event type — the multiplicative seasonal index a
      // forecasting pipeline divides out. Integer marginals, ONE mirrored
      // double expression at output.
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))
      val byDow = daily
        .groupBy(col("event_type"),
          dayofweek(col("day")).cast("long").as("dow"))
        .agg(sum(col("x")).as("__sd"), count(lit(1)).as("n_days"))
      val tot = daily.groupBy(col("event_type"))
        .agg(sum(col("x")).as("__s"), count(lit(1)).as("__n"))
      byDow.join(tot, Seq("event_type"))
        .select(col("event_type"), col("dow"), col("n_days"),
          round((col("__sd").cast("double") / col("n_days").cast("double")) /
            (col("__s").cast("double") / col("__n").cast("double")), 6)
            .as("seasonal_index"))
    }),

    // ---- EXT: vocabulary coverage curve (tokenizer-budget planning) ----
    "q241_vocab_coverage" -> ((s, dir) => {
      // what fraction of all token OCCURRENCES a top-V vocabulary covers,
      // at V ∈ {100, 1k, 5k, 20k} — the curve a tokenizer budget is read
      // from. Counts are vocab-sized aggregates; the one ordered prefix runs
      // over the VOCAB table (bounded by distinct terms, not corpus rows —
      // the q130 bounded-domain discipline); (count desc, term) total order
      // makes the rank and the cut boundary deterministic.
      import org.apache.spark.sql.expressions.Window
      val counts = Tables.documents(s, dir)
        .select(explode(TextOps.tokens(col("text"))).as("term"))
        .filter(col("term") =!= "")
        .groupBy(col("term")).agg(count(lit(1)).as("c"))
      val w = Window.orderBy(col("c").desc, col("term"))
      val ranked = counts
        .withColumn("rank", row_number().over(w))
        .withColumn("cum", sum(col("c")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
      val tot = counts.agg(sum(col("c")).as("__t"))
      val cuts = s.createDataFrame(Seq(Tuple1(100L), Tuple1(1000L),
        Tuple1(5000L), Tuple1(20000L))).toDF("v")
      ranked.join(broadcast(cuts), col("rank") <= col("v"))
        .groupBy(col("v"))
        .agg(max(col("rank")).cast("long").as("n_terms"),
          max(col("cum")).as("__cov"))
        .crossJoin(broadcast(tot))
        .select(col("v"), col("n_terms"),
          round(col("__cov").cast("double") / col("__t").cast("double"), 6)
            .as("coverage"))
    }),

    // ---- EXT: referential-integrity orphan audit ----
    "q242_orphan_audit" -> ((s, dir) => {
      // FK health check across the star schema: per relation, child rows
      // whose key has no parent — one left join + agg per relation (parent
      // key sets deduped; AQE broadcasts the small sides). The audit every
      // warehouse load runs before publishing.
      def audit(rel: String, child: DataFrame, key: String,
                parent: DataFrame, pkey: String): DataFrame =
        child.select(col(key).as("k"))
          .join(parent.select(col(pkey).as("k")).distinct()
            .withColumn("__hit", lit(1)), Seq("k"), "left")
          .agg(count(lit(1)).as("n_children"),
            sum(when(col("__hit").isNull, 1L).otherwise(0L))
              .as("n_orphans"))
          .select(lit(rel).as("relation"), col("n_children"),
            col("n_orphans"))
      audit("customer->nation", Tables.customer(s, dir), "c_nationkey",
          Tables.nation(s, dir), "n_nationkey")
        .unionAll(audit("lineitem->orders", Tables.lineitem(s, dir),
          "l_orderkey", Tables.orders(s, dir), "o_orderkey"))
        .unionAll(audit("lineitem->part", Tables.lineitem(s, dir),
          "l_partkey", Tables.part(s, dir), "p_partkey"))
        .unionAll(audit("orders->customer", Tables.orders(s, dir),
          "o_custkey", Tables.customer(s, dir), "c_custkey"))
        .unionAll(audit("supplier->nation", Tables.supplier(s, dir),
          "s_nationkey", Tables.nation(s, dir), "n_nationkey"))
    }),

    // ---- EXT: grid-density clustering (DBSCAN-lite) ----
    "q243_grid_density_cluster" -> ((s, dir) => {
      // hot regions of the (order-month × price-band) space: cells ≥1.2×
      // the mean cell count are core; 8-connected core cells merge into
      // clusters. Distributed hash agg over the corpus; union-find on the
      // DIMENSION-sized cell table (see Spatial.gridDensityClusters).
      graft.operators.Spatial.gridDensityClusters(
        Tables.orders(s, dir).select(
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("gx"),
          floor(col("o_totalprice") / 50000).cast("long").as("gy")),
        minNum = 12, minDen = 10)
    }),

    // ---- EXT: jackknife confidence interval (delete-one-bucket) ----
    "q245_jackknife_ci" -> ((s, dir) => {
      // how production A/B pipelines put error bars on ratio metrics: users
      // hash into g=20 buckets; θ_i = the mean with bucket i deleted; SE² =
      // (g−1)/g · Σ(θ_i − θ̄_J)². Per-bucket sums are EXACT decimals (the
      // repo's monetary discipline), the 20-row θ table uses 12dp → decimal
      // sums so nothing depends on float ordering; CI = θ̂ ± 1.96·SE.
      val d = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(graft.operators.Sampling.hashBucket(col("user_id"), 20)
          .as("b"), col("value").cast(D).as("v"))
      val per = d.groupBy(col("b"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      val tot = per.agg(sum(col("s")).as("__S"), sum(col("n")).as("__N"),
        count(lit(1)).as("__g"))
      val theta = per.crossJoin(broadcast(tot))
        .select(col("__S"), col("__N"), col("__g"),
          round((col("__S") - col("s")).cast("double") /
            (col("__N") - col("n")).cast("double"), 12).as("th"))
      val tbar = theta
        .groupBy(col("__S"), col("__N"), col("__g"))
        .agg((sum(col("th").cast("decimal(28,12)")).cast("double") /
          col("__g").cast("double")).as("tb"))
      theta.join(broadcast(tbar), Seq("__S", "__N", "__g"))
        .groupBy(col("__S"), col("__N"), col("__g"), col("tb"))
        .agg(sum(round((col("th") - col("tb")) * (col("th") - col("tb")), 12)
          .cast("decimal(28,12)")).cast("double").as("__ss"))
        .select(
          round(col("__S").cast("double") / col("__N").cast("double"), 6)
            .as("theta"),
          round(sqrt((col("__g") - 1).cast("double") /
            col("__g").cast("double") * col("__ss")), 6).as("se_jack"))
        .withColumn("ci_lo", round(col("theta") - lit(1.96d) * col("se_jack"), 6))
        .withColumn("ci_hi", round(col("theta") + lit(1.96d) * col("se_jack"), 6))
    }),

    // ---- EXT: zone-map build (per-partition pruning index) ----
    "q246_zone_maps" -> ((s, dir) =>
      // the metadata pass a lakehouse layout runs at write time: per
      // ship-month partition, min/max/null-count statistics for the scan
      // planner's min-max pruning. One distributed hash agg; integer/decimal
      // exact throughout.
      Tables.lineitem(s, dir)
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("part"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_orderkey")).as("min_orderkey"),
          max(col("l_orderkey")).as("max_orderkey"),
          // lockstep contract: never ship raw DECIMAL to the hasher — finish
          // with round(cast(... as double), 2) like every other money gate.
          round(min(col("l_extendedprice").cast(D)).cast("double"), 2)
            .as("min_price"),
          round(max(col("l_extendedprice").cast(D)).cast("double"), 2)
            .as("max_price"),
          sum(when(col("l_returnflag").isNull, 1L).otherwise(0L))
            .as("null_returnflags"))),

    // ---- EXT: sentence segmentation stats ----
    "q247_sentence_stats" -> ((s, dir) => {
      // corpus pipelines segment to sentences before sentence-level dedup /
      // quality filters: split on [.!?] runs, drop empty fragments, exact
      // integer char sums per source, one final division.
      val sent = Tables.documents(s, dir)
        .select(col("source"),
          explode(split(col("text"), "[.!?]+")).as("frag"))
        .select(col("source"), trim(col("frag")).as("sent"))
        .filter(col("sent") =!= "")
      sent.groupBy(col("source"))
        .agg(count(lit(1)).as("n_sentences"),
          sum(length(col("sent"))).as("__chars"),
          max(length(col("sent"))).cast("long").as("max_sentence_chars"))
        .select(col("source"), col("n_sentences"),
          round(col("__chars").cast("double") /
            col("n_sentences").cast("double"), 6).as("avg_sentence_chars"),
          col("max_sentence_chars"))
    }),

    // ---- EXT: dominant PCA direction via Gram power iteration ----
    "q249_power_iteration" -> ((s, dir) => {
      // top principal direction of the embedding matrix without EVER
      // materializing the 64×64 Gram matrix: each iteration is two
      // distributed passes over the (row, dim, x) triples — s_r = x_r·v
      // then w = Σ_r s_r·x_r / n — followed by a 64-row normalize. The
      // iterate v is DIMENSION-sized (broadcast); the corpus only streams.
      // Every float reduction is 9dp-round → decimal → exact sum and v is
      // re-rounded after each normalize, so both engines run the identical
      // arithmetic in lockstep — that's what makes an ITERATIVE float
      // algorithm hash-gateable at all. 4 iterations; v0 = 1/8 uniform
      // (unit norm at d=64, exactly representable).
      // the triple table feeds TWO joins in each of 4 iterations — pin it
      // once (rows × dims, the op's working set by definition) so the scan+
      // explode doesn't re-run 8×, and cut the 4-round lineage chain
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), posexplode(col("embedding")))
        .toDF("vec_id", "dim0", "xf")
        .select(col("vec_id"), (col("dim0") + 1).cast("long").as("dim"),
          col("xf").cast("double").as("x"))
        .localCheckpoint()
      val cnt = Tables.embeddings(s, dir).agg(count(lit(1)).as("__n"))
      var v = s.range(64).select((col("id") + 1).as("dim"),
        lit(0.125d).as("v"))
      for (_ <- 1 to 4) {
        val sr = e.join(broadcast(v), Seq("dim"))
          .groupBy(col("vec_id"))
          .agg(sum(round(col("x") * col("v"), 9).cast("decimal(28,9)"))
            .cast("double").as("sc"))
        val w = e.join(sr, Seq("vec_id"))
          .groupBy(col("dim"))
          .agg(sum(round(col("x") * col("sc"), 9).cast("decimal(38,9)"))
            .cast("double").as("__ws"))
          .crossJoin(broadcast(cnt))
          .select(col("dim"),
            (col("__ws") / col("__n").cast("double")).as("w"))
        val nrm = w.agg(
          sqrt(sum(round(col("w") * col("w"), 12).cast("decimal(38,12)"))
            .cast("double")).as("__nrm"))
        v = w.crossJoin(broadcast(nrm))
          .select(col("dim"), round(col("w") / col("__nrm"), 9).as("v"))
      }
      v.select(col("dim"), round(col("v"), 6).as("loading"))
    }),

    // ---- EXT: cluster-quality audit (silhouette-lite per label) ----
    "q250_cluster_quality" -> ((s, dir) => {
      // is the labeling geometrically coherent? Per vector: cosine to the
      // OWN-label centroid vs the best OTHER centroid; per label: the two
      // means and their margin. Vector×centroid work is corpus × L (a
      // design-time dimension), never corpus × corpus; all reductions are
      // round→decimal→exact-sum, margins compared on ROUNDED values.
      val emb = Tables.embeddings(s, dir)
      val e = emb.select(col("vec_id"), col("label").cast("long").as("vl"),
          posexplode(col("embedding")))
        .toDF("vec_id", "vl", "dim", "xf")
        .select(col("vec_id"), col("vl"), col("dim"),
          col("xf").cast("double").as("x"))
      val cen = e.groupBy(col("vl").as("cl"), col("dim"))
        .agg((sum(round(col("x"), 6).cast("decimal(18,6)")).cast("double") /
          count(lit(1))).as("m"))
      val vnorm = e.groupBy(col("vec_id"))
        .agg(sqrt(sum(round(col("x") * col("x"), 12).cast("decimal(38,12)"))
          .cast("double")).as("nv"))
      val cnorm = cen.groupBy(col("cl"))
        .agg(sqrt(sum(round(col("m") * col("m"), 12).cast("decimal(38,12)"))
          .cast("double")).as("nc"))
      val dots = e.join(cen, Seq("dim"))
        .groupBy(col("vec_id"), col("vl"), col("cl"))
        .agg(sum(round(col("x") * col("m"), 12).cast("decimal(38,12)"))
          .cast("double").as("__dot"))
      val cos = dots.join(vnorm, Seq("vec_id")).join(cnorm, Seq("cl"))
        .select(col("vec_id"), col("vl"), col("cl"),
          round(col("__dot") / (col("nv") * col("nc")), 6).as("cos"))
      val per = cos.groupBy(col("vec_id"), col("vl"))
        .agg(max(when(col("cl") === col("vl"), col("cos"))).as("own"),
          max(when(col("cl") =!= col("vl"), col("cos"))).as("other"))
      per.groupBy(col("vl").as("label"))
        .agg(count(lit(1)).as("n_vecs"),
          (sum(col("own").cast("decimal(18,6)")).cast("double") /
            count(lit(1))).as("__mo"),
          (sum(col("other").cast("decimal(18,6)")).cast("double") /
            count(lit(1))).as("__mb"))
        .select(col("label"), col("n_vecs"),
          round(col("__mo"), 6).as("mean_own_cos"),
          round(col("__mb"), 6).as("mean_other_cos"),
          round(col("__mo") - col("__mb"), 6).as("margin"))
    }),

    // ---- EXT: probabilistic record linkage (Fellegi–Sunter-lite) ----
    "q251_record_linkage" -> ((s, dir) => {
      // blocked candidate pairs + additive field-agreement log-weights →
      // threshold classify. Pairs are generated WITHIN (nation, segment)
      // blocks only — the blocking that keeps linkage off corpus×corpus.
      // Weights ×10 as integers so scores, the threshold compare, and the
      // per-block max are all EXACT.
      val c = Tables.customer(s, dir).select(col("c_custkey"),
        col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("band"),
        (round(col("c_acctbal") * 100, 0).cast("long") % 10).as("centd"),
        (col("c_acctbal") < 0).as("neg"))
      val a = c.toDF("a_key", "c_nationkey", "c_mktsegment", "a_band",
        "a_centd", "a_neg")
      val b = c.toDF("b_key", "c_nationkey", "c_mktsegment", "b_band",
        "b_centd", "b_neg")
      a.join(b, Seq("c_nationkey", "c_mktsegment"))
        .filter(col("a_key") < col("b_key"))
        .withColumn("score10",
          when(col("a_band") === col("b_band"), 20L).otherwise(-5L) +
          when(col("a_centd") === col("b_centd"), 15L).otherwise(-3L) +
          when(col("a_neg") === col("b_neg"), 5L).otherwise(-1L))
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("score10") >= 25L, 1L).otherwise(0L))
            .as("n_matches"),
          max(col("score10")).as("max_score10"))
    }),

    // ---- EXT: asymmetric containment dedup (quote-expansion catcher) ----
    "q252_containment_dedup" -> ((s, dir) => {
      // Jaccard misses "A is a fragment of B"; the CONTAINMENT coefficient
      // |A∩B|/|A| is the asymmetric measure that catches it. Same 3-token
      // shingles + stop-shingle df cap as q36 (bounds every join group);
      // exact intersection counts via the shingle equi-join; both
      // directions emitted, 0.6 threshold on ROUNDED values.
      val sh = Tables.documents(s, dir).select(col("doc_id"),
        explode(TextOps.distinctShingles(
          TextOps.tokens(col("text")), 3)).as("sng"))
      val hot = sh.groupBy(col("sng")).agg(count(lit(1)).as("df"))
        .filter(col("df") > 100).select("sng")
      val kept = sh.join(hot, Seq("sng"), "left_anti")
      val sizes = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val inter = kept.select(col("doc_id").as("doc_a"), col("sng"))
        .join(kept.select(col("doc_id").as("doc_b"), col("sng")),
          Seq("sng"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("__i"))
      inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("na")),
          Seq("doc_a"))
        .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("nb")),
          Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          round(col("__i").cast("double") / col("na").cast("double"), 6)
            .as("containment_ab"),
          round(col("__i").cast("double") / col("nb").cast("double"), 6)
            .as("containment_ba"))
        .filter(col("containment_ab") >= 0.6 ||
          col("containment_ba") >= 0.6)
    }),

    // ---- EXT: Theil–Sen robust trend (median of pairwise slopes) ----
    "q253_theil_sen" -> ((s, dir) => {
      // the outlier-proof alternative to OLS (q141): per type, the median
      // of all pairwise day-slopes of the daily series. Pairs live on the
      // bounded DAY GRID (calendar², never event count²); slopes 6dp-
      // rounded BEFORE the median so interpolation runs on identical
      // doubles in both engines.
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))
      val a = daily.toDF("event_type", "a_day", "a_x")
      val b = daily.toDF("event_type", "b_day", "b_x")
      a.join(b, Seq("event_type")).filter(col("a_day") < col("b_day"))
        .withColumn("slope", round(
          (col("b_x") - col("a_x")).cast("double") /
            datediff(col("b_day"), col("a_day")).cast("double"), 6))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          round(expr("percentile(slope, 0.5)"), 6).as("median_slope"))
    }),

    // ---- EXT: MERGE INTO apply (insert/update/delete classification) ----
    "q255_merge_apply" -> ((s, dir) => {
      // the lakehouse MERGE statement as one full-outer join + CASE: a
      // deterministic change batch (updates %7, tombstones %13 — taking
      // precedence, inserts keys+1e9) applied to orders; output = resulting
      // table rows tagged with the action that produced them (deletes
      // excluded, as MERGE leaves them). One shuffle on the merge key.
      val t = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val src = Tables.orders(s, dir).select(col("o_orderkey"))
        .filter(col("o_orderkey") % 7 === 0 || col("o_orderkey") % 13 === 0)
        .select(col("o_orderkey").as("k"),
          when(col("o_orderkey") % 13 === 0, "D").otherwise("U").as("op"),
          lit("X").as("new_status"))
        .unionAll(Tables.orders(s, dir)
          .filter(col("o_orderkey") % 11 === 0)
          .select((col("o_orderkey") + 1000000000L).as("k"),
            lit("I").as("op"), lit("N").as("new_status")))
      t.join(src, col("o_orderkey") === col("k"), "full_outer")
        .filter(col("op").isNull || col("op") =!= "D")
        .select(
          coalesce(col("o_orderkey"), col("k")).as("o_orderkey"),
          when(col("op") === "U" || col("op") === "I", col("new_status"))
            .otherwise(col("o_orderstatus")).as("o_orderstatus"),
          when(col("op") === "U", "update")
            .when(col("op") === "I", "insert")
            .otherwise("noop").as("action"))
    }),

    // ---- EXT: aspect-ratio bucketing (image-batch shape planning) ----
    "q256_aspect_buckets" -> ((s, dir) => {
      // multimodal training batches need uniform shapes: each image maps to
      // the aspect bucket minimizing |ln(ratio) − ln(bucket_ratio)| (the
      // SDXL-style bucket table — a broadcast design-time dimension). Dims
      // here derive deterministically from doc_id (no decoder in sandbox);
      // the OPERATOR — log-ratio argmin over a broadcast bucket table with
      // a rounded, tie-broken boundary — is the real pipeline step. The
      // argmin window is per-image over exactly |buckets| rows.
      import org.apache.spark.sql.expressions.Window
      val buckets = s.createDataFrame(Seq(
        (1, 1024, 1024), (2, 1152, 896), (3, 896, 1152),
        (4, 1216, 832), (5, 832, 1216), (6, 1344, 768), (7, 768, 1344)
      )).toDF("bidx", "bw", "bh")
      val imgs = Tables.documents(s, dir).select(col("doc_id"),
        (lit(256) + col("doc_id") % 1024).cast("double").as("w"),
        (lit(256) + (col("doc_id") * 7) % 1024).cast("double").as("h"))
      val scored = imgs.crossJoin(broadcast(buckets))
        .withColumn("diff", round(abs(
          log(col("w") / col("h")) -
            log(col("bw").cast("double") / col("bh").cast("double"))), 9))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("diff"), col("bidx"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("bw"), col("bh"))
        .agg(count(lit(1)).as("n_docs"))
    }),

    // ---- EXT: top-k terms per doc via higher-order array functions ----
    "q257_topk_terms_per_doc" -> ((s, dir) => {
      // the window-free top-k: per-doc term counts collect into an array of
      // (-count, term) structs, then sort_array + slice + transform run
      // INSIDE the row — no second shuffle, no window; the array is bounded
      // by per-doc vocabulary. Struct field order gives (count desc, term
      // asc) total order, so the top-3 and its string join are exact.
      val counts = Tables.documents(s, dir)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("t"))
        .filter(col("t") =!= "")
        .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
      counts.groupBy(col("doc_id"))
        .agg(collect_list(struct((-col("c")).as("nc"), col("t").as("t")))
          .as("__a"))
        .select(col("doc_id"),
          array_join(transform(slice(sort_array(col("__a")), 1, 3),
            e => e.getField("t")), ",").as("top_terms"))
    }),

    // ---- EXT: correlated scalar subquery (Catalyst decorrelation) ----
    "q258_correlated_subquery" -> ((s, dir) => {
      // the SQL-surface shape every BI tool emits: a correlated scalar
      // subquery per outer row. Catalyst decorrelates it into ONE aggregate
      // + ONE join (never a per-row re-execution) — the rewrite is what
      // makes this runnable at scale at all. The inner mean is an exact
      // decimal sum with one final division so the > boundary is identical
      // in both engines.
      Tables.registerAll(s, dir)
      s.sql("""SELECT c.c_nationkey, count(*) AS n_above
        FROM customer c
        WHERE c.c_acctbal > (
          SELECT cast(sum(cast(i.c_acctbal AS decimal(18,2))) AS double)
                 / count(*)
          FROM customer i WHERE i.c_nationkey = c.c_nationkey)
        GROUP BY c.c_nationkey""")
    }),

    // ---- EXT: debounce (burst collapse, keep-first) ----
    "q259_debounce" -> ((s, dir) => {
      // sensor/click de-noising: consecutive events of the same (user,
      // type) within 30 minutes collapse to the burst's FIRST event. One
      // per-key lag window (key-partitioned, never global); burst size
      // carried out for auditability.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val marked = Tables.events(s, dir)
        .withColumn("__prev", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("__new", when(col("__prev").isNull ||
          unix_micros(col("ts")) - col("__prev") > 1800000000L, 1L)
          .otherwise(0L))
        .withColumn("__grp", sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
      marked.groupBy(col("user_id"), col("event_type"), col("__grp"))
        .agg(min(struct(col("ts"), col("event_id"))).as("__f"),
          count(lit(1)).as("burst_len"))
        .select(col("__f.event_id").as("event_id"), col("user_id"),
          col("event_type"), col("burst_len"))
    }),

    // ---- EXT: join-skew profile (pre-flight cardinality planning) ----
    "q260_join_skew_profile" -> ((s, dir) => {
      // what a planner computes BEFORE a big join: per-key output
      // contribution a_k·b_k from the two key histograms (never the join
      // itself), the total predicted size, and the heaviest keys — the
      // evidence that decides salting. Integer-exact; top-10 tie-broken on
      // key.
      val e = Tables.events(s, dir)
      val a = e.filter(col("event_type") === "click")
        .groupBy(col("user_id")).agg(count(lit(1)).as("na"))
      val b = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(count(lit(1)).as("nb"))
      val contrib = a.join(b, Seq("user_id"))
        .select(col("user_id"), (col("na") * col("nb")).as("pairs"))
      val tot = contrib.agg(sum(col("pairs")).as("__t"))
      contrib.crossJoin(broadcast(tot))
        .orderBy(col("pairs").desc, col("user_id"))
        .limit(10)
        .select(col("user_id"), col("pairs"),
          col("__t").as("total_predicted_pairs"))
    }),

    // ---- EXT: LATERAL correlated subquery (per-row top-n) ----
    "q262_lateral_topn" -> ((s, dir) => {
      // "top 2 orders per customer" stated as a LATERAL subquery — the SQL
      // form analysts write; Catalyst decorrelates the ORDER BY+LIMIT into
      // a window group-limit, never a per-row re-execution. Total order
      // (price desc, orderkey) makes the per-customer cut deterministic.
      Tables.registerAll(s, dir)
      s.sql("""SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l""")
    }),

    // ---- EXT: recursive CTE (Spark 4 native SQL recursion) ----
    "q263_recursive_cte" -> ((s, dir) => {
      // the q145 impact-radius BFS, this time as NATIVE SQL recursion
      // (Spark 4 WITH RECURSIVE). Spark requires UNION ALL in the
      // recursive step; the DISTINCT inside the step dedups each frontier
      // LEVEL, so the recursion carries ≤ hops × |nodes| rows — the
      // level-synchronous BFS shape, not path enumeration (which would be
      // combinatorial on this bipartite graph). min(hops) at the end
      // collapses cross-level re-visits.
      Tables.registerAll(s, dir)
      s.sql("""WITH RECURSIVE
        p AS (SELECT DISTINCT 'c' || cast(o_custkey AS string) AS src,
                's' || cast(l_suppkey AS string) AS dst
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        ed AS (SELECT src, dst FROM p
               UNION ALL SELECT dst AS src, src AS dst FROM p),
        bfs(node, hops) AS (
          SELECT 'c' || cast(c_custkey AS string) AS node, 0 AS hops
          FROM customer WHERE c_custkey <= 5
          UNION ALL
          SELECT DISTINCT e.dst, b.hops + 1
          FROM bfs b JOIN ed e ON e.src = b.node
          WHERE b.hops < 3)
        SELECT node, cast(min(hops) AS int) AS hops
        FROM bfs GROUP BY node""")
    }),

    // ---- EXT: VARIANT semi-structured extraction (Spark 4) ----
    "q264_variant_json" -> ((s, dir) => {
      // schema-on-read over the event props payload via the VARIANT type —
      // the open-schema ingestion path (parse once, extract typed fields,
      // aggregate); binary-encoded variant beats per-row JSON re-parsing
      // at scale.
      Tables.registerAll(s, dir)
      s.sql("""SELECT event_type, count(*) AS n,
        sum(variant_get(parse_json(props), '$.k', 'long')) AS sum_k,
        count(DISTINCT variant_get(parse_json(props), '$.k', 'long'))
          AS n_distinct_k
        FROM events GROUP BY event_type""")
    }),

    // ---- EXT: group-median imputation (data repair) ----
    "q265_impute_median" -> ((s, dir) => {
      // the standard repair pass: values flagged missing (deterministic
      // %17 mask here) impute to the group median, with the imputation
      // VOLUME reported per group — repairs must be auditable. Median over
      // 2dp values interpolates identically in both engines; the repaired
      // mean is assembled in ONE mirrored expression from the exact
      // decimal sum of surviving values.
      val e = Tables.events(s, dir).select(col("event_type"),
        col("value").cast(D).as("v"),
        (col("event_id") % 17 === 0).as("miss"))
      val med = e.filter(!col("miss"))
        .groupBy(col("event_type"))
        .agg(round(expr("percentile(cast(v AS double), 0.5)"), 6)
          .as("med"))
      e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("miss"), 1L).otherwise(0L)).as("n_imputed"),
          sum(when(!col("miss"), col("v")).otherwise(lit(0).cast(D)))
            .cast("double").as("__s"))
        .join(med, Seq("event_type"))
        .select(col("event_type"), col("n"), col("n_imputed"),
          round((col("__s") + col("med") * col("n_imputed")
            .cast("double")) / col("n").cast("double"), 6)
            .as("mean_after"))
    }),

    // ---- EXT: k-NN label-noise audit (confident-learning shape) ----
    "q266_knn_label_noise" -> ((s, dir) => {
      // mislabeled-example detection: for each vector, the fraction of its
      // 5 cosine neighbors carrying a DIFFERENT label, averaged per label.
      // The audit runs on a FIXED-SIZE deterministic sample: the 512
      // smallest md5(vec_id) ranks (TakeOrderedAndProject — one scan, top-K
      // per partition, never a full sort). Pair work is O(512²) CONSTANT in
      // corpus size — a budget, not a fraction (the corpus-scale path is
      // the gated ANN family q41/q45/q99/q106). Cosines go through the
      // NATIVE codegen dot-product loop on the q39 contract: sequential
      // double summation is bit-identical to DuckDB's ordered list_sum, so
      // no per-term decimal rounding is needed and the 512² pair stage is
      // pure whole-stage-codegen arithmetic (the previous explode-join +
      // decimal-sum formulation did the same work through a 16.7M-row
      // shuffle agg — 42 s vs sub-second at sf0.1).
      val sample = Tables.embeddings(s, dir)
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
        .limit(512)
      val labels = sample.select(col("vec_id"), col("label").cast("long"))
      val knn = graft.operators.Similarity.bruteKnn(
        sample, sample, "vec_id", "embedding", k = 5, dim = 64)
      knn
        .join(broadcast(labels.toDF("query_id", "l1")), Seq("query_id"))
        .join(broadcast(labels.toDF("neighbor_id", "l2")), Seq("neighbor_id"))
        .groupBy(col("l1").as("label"))
        .agg(countDistinct(col("query_id")).as("n_vecs"),
          sum(when(col("l2") =!= col("l1"), 1L).otherwise(0L))
            .as("__dis"))
        .select(col("label"), col("n_vecs"),
          round(col("__dis").cast("double") /
            (col("n_vecs") * 5).cast("double"), 6).as("noise_rate"))
    }),

    // ---- EXT: interval union (merge overlapping activity windows) ----
    "q267_interval_union" -> ((s, dir) => {
      // total covered time per user when each event opens a 30-minute
      // activity window: classic interval merging via the running-max-end
      // trick — a new island starts where ts exceeds every previous end.
      // Key-partitioned windows only; exact micros arithmetic end-to-end.
      import org.apache.spark.sql.expressions.Window
      val iv = Tables.events(s, dir).select(col("user_id"),
        col("event_id"), unix_micros(col("ts")).as("st"),
        (unix_micros(col("ts")) + 1800000000L).as("en"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("st"), col("event_id"))
      val marked = iv
        .withColumn("__pmax", max(col("en")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("__new",
          when(col("__pmax").isNull || col("st") > col("__pmax"), 1L)
            .otherwise(0L))
        .withColumn("__isl", sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
      marked.groupBy(col("user_id"), col("__isl"))
        .agg(min(col("st")).as("__s"), max(col("en")).as("__e"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_islands"),
          sum(col("__e") - col("__s")).as("covered_us"))
    }),

    // ---- EXT: cross-source duplicate flow matrix ----
    "q268_cross_source_dups" -> ((s, dir) => {
      // corpus governance: which sources share exact-duplicate content —
      // per (source_a ≤ source_b) pair, the number of shared bag
      // fingerprints (q35's order-insensitive content key). Fingerprint
      // groups bound the pair fan-out; one distinct + one self-join on fp.
      val d = Tables.documents(s, dir).select(col("source"),
        TextOps.bagFingerprint(TextOps.tokens(col("text"))).as("fp"))
        .distinct()
      d.toDF("sa", "fp")
        .join(d.toDF("sb", "fp2"), col("fp") === col("fp2"))
        .filter(col("sa") <= col("sb"))
        .filter(col("sa") =!= col("sb"))
        .groupBy(col("sa"), col("sb"))
        .agg(countDistinct(col("fp")).as("n_shared_fps"))
    }),

    // ---- EXT: mutual nearest neighbors (canonical pairing) ----
    "q269_mutual_nn" -> ((s, dir) => {
      // reciprocal best match: pairs where each vector is the other's
      // cosine top-1 — the high-precision pairing primitive under
      // merge/canonicalization decisions. Same FIXED 512-row md5-rank
      // sample as q266 (pair work O(512²) constant in corpus size; ANN is
      // the corpus path), same native-dot q39 contract: argmax on the raw
      // bit-identical cosine with neighbor-id tie-break, 6dp round on
      // OUTPUT only, v1 < v2 canonical orientation.
      val sample = Tables.embeddings(s, dir)
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
        .limit(512)
      val best = graft.operators.Similarity.bruteKnn(
          sample, sample, "vec_id", "embedding", k = 1, dim = 64)
        .select(col("query_id").as("v1"), col("neighbor_id").as("v2"),
          round(col("sim"), 6).as("cs"))
      best.join(best.toDF("b2", "b1", "cs2"),
          col("v1") === col("b1") && col("v2") === col("b2"))
        .filter(col("v1") < col("v2"))
        .select(col("v1"), col("v2"), col("cs"))
    }),

    // ---- EXT: multiset set-ops (INTERSECT ALL / EXCEPT ALL) ----
    "q270_bag_setops" -> ((s, dir) => {
      // bag semantics matter for reconciliation: INTERSECT ALL keeps
      // min(multiplicity), EXCEPT ALL subtracts it — both distinct from
      // the q22/q23 set versions. Two deterministic order slices of the
      // same column; results aggregated per key for a compact gate.
      val a = Tables.orders(s, dir).filter(col("o_orderkey") % 2 === 0)
        .select(col("o_custkey"))
      val b = Tables.orders(s, dir).filter(col("o_orderkey") % 3 === 0)
        .select(col("o_custkey"))
      val ia = a.intersectAll(b).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
      val ea = a.exceptAll(b).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
      ia.unionAll(ea).select(col("op"), col("o_custkey"), col("n"))
    }),

    // ---- EXT: null-safe equi-join (<=>) ----
    "q271_null_safe_join" -> ((s, dir) => {
      // reconciliation joins must pair NULL keys too — plain equality
      // silently drops them. Sides pre-aggregate per key (histogram
      // discipline), then one null-safe hash join; the NULL group pairs
      // like any other key.
      val e = Tables.events(s, dir)
        .select(nullif(col("event_type"), lit("view")).as("k"),
          col("event_id"))
      val a = e.filter(col("event_id") % 2 === 0)
        .groupBy(col("k")).agg(count(lit(1)).as("na"))
      val b = e.filter(col("event_id") % 2 === 1)
        .groupBy(col("k")).agg(count(lit(1)).as("nb"))
      a.join(b, a("k") <=> b("k"))
        .select(a("k").as("k"), col("na"), col("nb"),
          (col("na") * col("nb")).as("n_pairs"))
    }),

    // ---- EXT: largest-remainder proration (exact cents allocation) ----
    "q272_proration" -> ((s, dir) => {
      // the finance/ETL allocation op: spread each order's total cents
      // across its line items proportional to extended price, conserving
      // the total EXACTLY — floor shares first, then one extra cent to the
      // largest remainders (linenumber tie-break). Pure integer
      // arithmetic; windows are per-order (≤7 rows by schema).
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, dir).select(col("l_orderkey"),
        col("l_linenumber"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("w"))
      val o = Tables.orders(s, dir).select(col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("t"))
      val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
      val wSum = Window.partitionBy(col("l_orderkey"))
      val base = j
        .withColumn("__W", sum(col("w")).over(wSum))
        .withColumn("__base", expr("(t * w) div __W"))
        .withColumn("__rem", (col("t") * col("w")) % col("__W"))
      val ranked = base
        .withColumn("__left", col("t") - sum(col("__base")).over(wSum))
        .withColumn("__rk", row_number().over(wSum
          .orderBy(col("__rem").desc, col("l_linenumber"))))
      ranked.select(col("l_orderkey"), col("l_linenumber"),
        (col("__base") +
          when(col("__rk") <= col("__left"), 1L).otherwise(0L))
          .as("alloc_cents"))
    }),

    // ---- EXT: encoding-quality audit (mojibake / control chars) ----
    "q273_encoding_audit" -> ((s, dir) =>
      // corpus hygiene: per source, documents containing U+FFFD
      // replacement chars and the control-character rate per 1k chars —
      // the filter that catches broken decodes before training. Counts
      // via length-difference (no per-row lambdas); integer-exact until
      // the final rate division.
      Tables.documents(s, dir)
        .select(col("source"), col("n_chars"),
          (length(col("text")) -
            length(regexp_replace(col("text"), "�", ""))).as("__nr"),
          (length(col("text")) - length(regexp_replace(col("text"),
            "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", ""))).as("__nc"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("__nr") > 0, 1L).otherwise(0L))
            .as("n_docs_replacement"),
          sum(col("__nc")).as("__ctl"), sum(col("n_chars")).as("__ch"))
        .select(col("source"), col("n_docs"), col("n_docs_replacement"),
          round(col("__ctl").cast("double") * 1000.0d /
            col("__ch").cast("double"), 6).as("ctl_per_1k_chars"))),

    // ---- EXT: Poisson bootstrap (deterministic resampling CI) ----
    "q274_poisson_bootstrap" -> ((s, dir) => {
      // THE bootstrap that works on big data: instead of drawing n rows
      // with replacement, each (row, replicate) gets a Poisson(1) weight —
      // one scan per replicate batch, no global shuffle. Weights are
      // DETERMINISTIC: md5(row, replicate) → uniform → Poisson quantile by
      // CDF thresholds, so both engines draw the identical resamples.
      // Replicate means use exact decimal numerators; the SE over the
      // B=20 replicate means follows the q245 jackknife discipline.
      val B = 20
      val d = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("value").cast(D).as("v"))
      val reps = s.range(1, B + 1).select(col("id").as("r"))
      val u = (graft.operators.Sampling.hashBucket(
        concat_ws("_", col("event_id"), col("r")), 1000000)
        .cast("double") / lit(1000000.0d))
      val w = when(u < 0.367879d, 0L).when(u < 0.735759d, 1L)
        .when(u < 0.919699d, 2L).when(u < 0.981012d, 3L)
        .when(u < 0.996340d, 4L).when(u < 0.999406d, 5L).otherwise(6L)
      val perRep = d.crossJoin(broadcast(reps))
        .withColumn("__w", w)
        .groupBy(col("r"))
        .agg((sum(col("v") * col("__w")).cast("double") /
          sum(col("__w")).cast("double")).as("m"))
      val mbar = perRep.agg(
        (sum(round(col("m"), 12).cast("decimal(28,12)")).cast("double") /
          lit(B.toDouble)).as("mb"))
      val se = perRep.crossJoin(broadcast(mbar))
        .agg(sum(round((col("m") - col("mb")) * (col("m") - col("mb")), 12)
          .cast("decimal(28,12)")).cast("double").as("__ss"))
        .select(round(sqrt(col("__ss") / lit((B - 1).toDouble)), 6)
          .as("se_boot"))
      val theta = d.agg(
        round(sum(col("v")).cast("double") / count(lit(1)), 6).as("theta"))
      theta.crossJoin(se).withColumn("b", lit(B.toLong))
    }),

    // ---- EXT: ANALYZE-style column statistics ----
    "q275_table_stats" -> ((s, dir) => {
      // the stats pass a cost-based optimizer feeds on: per column, exact
      // NDV + null count (+ row count). Exact distincts here — bounded
      // fixture domains; the 100 TB path is the gated HLL sketch (q230).
      val li = Tables.lineitem(s, dir)
      def one(c: String): DataFrame = li.agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col(c)).as("ndv"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"))
        .select(lit(c).as("column_name"), col("n_rows"), col("ndv"),
          col("n_nulls"))
      one("l_orderkey").unionAll(one("l_returnflag"))
        .unionAll(one("l_quantity")).unionAll(one("l_shipdate"))
    }),

    // ---- EXT: sliding-window aggregation (overlapping windows) ----
    "q276_sliding_windows" -> ((s, dir) =>
      // 1-hour windows sliding every 15 minutes: each event lands in
      // exactly 4 overlapping windows — the smoothing shape monitoring
      // dashboards use (tumbling q58 is the special case slide = length).
      // Spark's `window()` generates the assignment inline (a 4-row
      // explode, no join); exact decimal sums per window.
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(D)).cast("double").as("sum_value"))
        .select(unix_timestamp(col("window.start")).as("win_start"),
          col("event_type"), col("n"), col("sum_value"))),

    // ---- EXT: chunk → reassemble round trip (inverse-operator gate) ----
    "q277_chunk_roundtrip" -> ((s, dir) => {
      // integrity proof for the RAG chunker: q82's overlapped chunks,
      // reassembled (first chunk whole, later chunks minus the `overlap`
      // leading tokens), must reproduce every document's space-normalized
      // token stream exactly. Per-doc arrays bounded by doc length; the
      // oracle is simply the normalized source text.
      val overlap = 10
      val chunks = TextOps.chunkTokens(
        Tables.documents(s, dir).filter(col("doc_id") % 20 === 0),
        "doc_id", "text", chunkSize = 50, overlap = overlap)
      chunks
        .withColumn("__kept",
          when(col("chunk_id") === 0, split(col("chunk_text"), " "))
            .otherwise(slice(split(col("chunk_text"), " "),
              overlap + 1, 1000000)))
        .groupBy(col("doc_id"))
        .agg(array_join(flatten(transform(
          sort_array(collect_list(struct(col("chunk_id").as("i"),
            col("__kept").as("t")))),
          e => e.getField("t"))), " ").as("text_norm"))
    }),

    // ---- EXT: UNPIVOT SQL syntax (wide → long in the parser) ----
    "q278_unpivot_sql" -> ((s, dir) => {
      // the SQL-native wide→long (q150 is the DataFrame melt): per-nation
      // order-status counts pivoted wide, then UNPIVOT back to long in
      // the same statement — parser-level coverage of the melt shape.
      Tables.registerAll(s, dir)
      s.sql("""SELECT c_nationkey, status, n FROM (
          SELECT c_nationkey,
            sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS open_n,
            sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS done_n,
            sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS part_n
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_nationkey)
        UNPIVOT (n FOR status IN (open_n, done_n, part_n))""")
    }),

    // ---- EXT: Neyman allocation (variance-optimal sample budget) ----
    "q279_neyman_allocation" -> ((s, dir) => {
      // survey-sampling capstone: split a 10k-row sample budget across
      // event-type strata ∝ N_h·σ_h (Neyman), integerized with the q272
      // largest-remainder trick so the budget is conserved EXACTLY.
      // σ from exact decimal moments (the q152 closed form), 6dp-rounded
      // before the share computation so both engines allocate identically.
      import org.apache.spark.sql.expressions.Window
      val budget = 10000L
      val m = Tables.events(s, dir)
        .select(col("event_type"), col("value").cast(D).as("v"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("nh"),
          sum(col("v")).cast("double").as("__s"),
          sum((col("v") * col("v")).cast("decimal(28,4)")).cast("double")
            .as("__s2"))
        .select(col("event_type"), col("nh"),
          round(sqrt(greatest(col("__s2") / col("nh") -
            (col("__s") / col("nh")) * (col("__s") / col("nh")),
            lit(0.0d))), 6).as("sigma"))
      // weight w_h = round(N_h·σ_h) as exact integers for the remainder;
      // totals as explicit 1-row broadcasts (the stratum table is
      // dimension-sized, so the "global" steps are 5-row work)
      val wt = m.withColumn("__w",
        round(col("nh").cast("double") * col("sigma"), 0).cast("long"))
        .localCheckpoint() // 5-row stratum table; breaks self-join lineage
      val tot = wt.agg(sum(col("__w")).as("__tw"))
      val base = wt.crossJoin(broadcast(tot))
        .withColumn("__base", expr(s"($budget * __w) div __tw"))
        .withColumn("__rem", (lit(budget) * col("__w")) % col("__tw"))
        .localCheckpoint()
      val used = base.agg(sum(col("__base")).as("__SB"))
      base.crossJoin(broadcast(used))
        .withColumn("__left", lit(budget) - col("__SB"))
        .withColumn("__rk", row_number().over(
          Window.orderBy(col("__rem").desc, col("event_type"))))
        .select(col("event_type"), col("nh"), col("sigma"),
          (col("__base") +
            when(col("__rk") <= col("__left"), 1L).otherwise(0L))
            .as("alloc"))
    }),

    // ---- EXT: decile lift / cumulative-gains table ----
    "q280_decile_lift" -> ((s, dir) => {
      // the ranking-evaluation closer (with q234 AUC and q236 calibration):
      // rank by score desc, cut into deciles, report per-decile positive
      // rate and cumulative capture. Deciles are assigned at the DISTINCT-
      // SCORE level via the bounded distribution table (integer cum-count
      // division — ties never straddle engines), not a corpus-sized ntile.
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documents(s, dir).select(col("n_chars"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      val dist = d.groupBy(col("n_chars"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("np"))
      val w = Window.orderBy(col("n_chars").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val tot = dist.agg(sum(col("n")).as("__N"), sum(col("np")).as("__P"))
      val cum = dist
        .withColumn("__cb", coalesce(sum(col("n")).over(w), lit(0L)))
        .crossJoin(broadcast(tot))
        .withColumn("decile",
          least(expr("(__cb * 10) div __N"), lit(9L)))
      cum.groupBy(col("decile"))
        .agg(sum(col("n")).as("n"), sum(col("np")).as("n_pos"),
          max(col("__P")).as("__p"))
        .withColumn("__cp", sum(col("n_pos")).over(
          Window.orderBy(col("decile"))
            .rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("decile"), col("n"), col("n_pos"),
          round(col("n_pos").cast("double") / col("n").cast("double"), 6)
            .as("pos_rate"),
          round(col("__cp").cast("double") / col("__p").cast("double"), 6)
            .as("cum_capture"))
    }),

    // ---- EXT: conversion latency (click → first purchase) ----
    "q281_conversion_latency" -> ((s, dir) => {
      // the funnel-latency readout: for each click, the FIRST purchase by
      // the same user within 24 h; overall conversion rate + latency
      // percentiles. Same-user interval pairing (per-user groups bound the
      // join), min() collapses to first-match, exact micros until the
      // final percentile interpolation on identical integers.
      val e = Tables.events(s, dir)
      val c = e.filter(col("event_type") === "click")
        .select(col("event_id").as("cid"), col("user_id"),
          unix_micros(col("ts")).as("cus"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("pus"))
      val lat = c.join(p, Seq("user_id"))
        .filter(col("pus") > col("cus") &&
          col("pus") <= col("cus") + 86400000000L)
        .groupBy(col("cid"))
        .agg((min(col("pus")) - max(col("cus"))).as("lat_us"))
      val nClicks = c.agg(count(lit(1)).as("n_clicks"))
      lat.agg(count(lit(1)).as("n_converted"),
          round(expr("percentile(lat_us, 0.5)"), 6).as("p50_lat_us"),
          round(expr("percentile(lat_us, 0.9)"), 6).as("p90_lat_us"))
        .crossJoin(broadcast(nClicks))
        .select(col("n_clicks"), col("n_converted"),
          round(col("n_converted").cast("double") /
            col("n_clicks").cast("double"), 6).as("conv_rate"),
          col("p50_lat_us"), col("p90_lat_us"))
    }),

    // ---- EXT: shipping-SLA conformance by month ----
    "q282_sla_conformance" -> ((s, dir) =>
      // operations reporting: per order month, the fraction of line items
      // shipped within 30/60/90 days of the order — integer day diffs,
      // exact counts, three mirrored divisions.
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir),
          col("l_orderkey") === col("o_orderkey"))
        .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
          datediff(col("l_shipdate"), col("o_orderdate")).as("d"))
        .groupBy(col("month"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("d") <= 30, 1L).otherwise(0L)).as("__n30"),
          sum(when(col("d") <= 60, 1L).otherwise(0L)).as("__n60"),
          sum(when(col("d") <= 90, 1L).otherwise(0L)).as("__n90"))
        .select(col("month"), col("n"),
          round(col("__n30").cast("double") / col("n").cast("double"), 6)
            .as("pct_30d"),
          round(col("__n60").cast("double") / col("n").cast("double"), 6)
            .as("pct_60d"),
          round(col("__n90").cast("double") / col("n").cast("double"), 6)
            .as("pct_90d"))),

    // ---- EXT: two-sample Kolmogorov–Smirnov statistic ----
    "q283_ks_test" -> ((s, dir) => {
      // distribution-shift test between two sources' length distributions:
      // D = max |CDF_a − CDF_b| over the POOLED distinct-value grid (the
      // q234 bounded-domain discipline — never a corpus sort). Counts stay
      // integer through the running sums; the two CDF divisions and their
      // gap are one mirrored expression, 9dp-rounded before the max.
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documents(s, dir)
        .filter(col("source").isin("web", "social"))
        .select(col("n_chars"),
          when(col("source") === "web", 1L).otherwise(0L).as("ia"))
      val dist = d.groupBy(col("n_chars"))
        .agg(sum(col("ia")).as("ca"), sum(lit(1L) - col("ia")).as("cb"))
      val w = Window.orderBy(col("n_chars"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val tot = dist.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      dist
        .withColumn("__cca", sum(col("ca")).over(w))
        .withColumn("__ccb", sum(col("cb")).over(w))
        .crossJoin(broadcast(tot))
        .withColumn("__gap", round(abs(
          col("__cca").cast("double") / col("na").cast("double") -
          col("__ccb").cast("double") / col("nb").cast("double")), 9))
        .agg(max(col("na")).as("na"), max(col("nb")).as("nb"),
          round(max(col("__gap")), 6).as("ks_stat"))
    }),

    // ---- EXT: exact trimmed mean (robust location, drop-10% ends) ----
    "q284_trimmed_mean" -> ((s, dir) => {
      // the robust sibling of q201's winsorized mean: DROP the lowest and
      // highest k = n div 10 observations instead of clamping them.
      // Computed over the value-DISTRIBUTION table with integer rank
      // algebra — each distinct value contributes its clamped overlap with
      // the kept rank interval (k, n−k], so boundary values partially
      // include EXACTLY; decimal value × integer count sums, one final
      // division.
      import org.apache.spark.sql.expressions.Window
      val d = Tables.events(s, dir)
        .select(col("event_type"), col("value").cast(D).as("v"))
      val dist = d.groupBy(col("event_type"), col("v"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val tot = d.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val cum = dist
        .withColumn("__cum", sum(col("c")).over(w))
        .join(tot, Seq("event_type"))
        .withColumn("__k", expr("n div 10"))
        .withColumn("__keep",
          greatest(least(col("__cum"), col("n") - col("__k")) -
            greatest(col("__cum") - col("c"), col("__k")), lit(0L)))
      cum.groupBy(col("event_type"))
        .agg(max(col("n")).as("n"), max(col("__k")).as("n_trimmed_each"),
          (sum(col("v") * col("__keep")).cast("double") /
            sum(col("__keep")).cast("double")).as("__m"))
        .select(col("event_type"), col("n"), col("n_trimmed_each"),
          round(col("__m"), 6).as("trimmed_mean"))
    }),

    // ---- EXT: direct standardization (mix-adjusted mean) ----
    "q285_mix_adjusted_mean" -> ((s, dir) => {
      // "did the metric move, or did the mix?": per-source mean value
      // reweighted to a FIXED reference mix (the all-up source shares) —
      // comparing raw vs adjusted separates composition effects from
      // true per-segment movement. Exact decimal segment sums; the
      // reference shares come from one dimension-sized aggregate.
      val d = Tables.events(s, dir)
        .select(col("event_type"),
          (col("user_id") % 2 === 0).cast("int").as("grp"),
          col("value").cast(D).as("v"))
      val seg = d.groupBy(col("grp"), col("event_type"))
        .agg(count(lit(1)).as("ns"), sum(col("v")).as("sv"))
      val ref = d.groupBy(col("event_type"))
        .agg(count(lit(1)).as("nr"))
      val tot = d.agg(count(lit(1)).as("nt"))
      seg.join(ref, Seq("event_type")).crossJoin(broadcast(tot))
        .withColumn("__term", round(
          (col("nr").cast("double") / col("nt").cast("double")) *
            (col("sv").cast("double") / col("ns").cast("double")), 9)
          .cast("decimal(28,9)"))
        .groupBy(col("grp"))
        .agg(sum(col("ns")).as("n"),
          round(sum(col("sv")).cast("double") /
            sum(col("ns")).cast("double"), 6).as("raw_mean"),
          round(sum(col("__term")).cast("double"), 6).as("adjusted_mean"))
    }),

    // ---- W: time-weighted average (duration-weighted mean per key) ----
    "q136_twap" -> ((s, dir) =>
      R.timeWeightedAvg(Tables.events(s, dir), "user_id", "ts", "value",
        tieBreak = col("event_id"))),

    // ---- S: streaming parquet file-sink round-trip ----
    "q138_stream_file_sink" -> ((s, dir) =>
      graft.streaming.Streams.replayedFileSink(
        s, Tables.events(s, dir), chunks = 3, name = "q138")),

    // ---- T: stream-static enrichment join replay gate ----
    "q137_stream_enrich" -> ((s, dir) =>
      graft.streaming.Streams.replayedEnrichment(
        s, Tables.events(s, dir), Tables.customer(s, dir),
        chunks = 3, name = "q137")),

    // ---- T: native session_window replay gate ----
    "q134_stream_session_agg" -> ((s, dir) =>
      graft.streaming.Streams.replayedSessionAgg(
        s, Tables.events(s, dir), chunks = 3, name = "q134")),

    // ---- §2.9: radius (distance-within) spatial join ----
    "q140_radius_join" -> ((s, dir) => {
      val pts = Tables.customer(s, dir).select(col("c_custkey"),
        (col("c_custkey") * 7 % 360 - 180).cast("double").as("lon"),
        (col("c_custkey") * 13 % 180 - 90).cast("double").as("lat"))
      val qs = Tables.supplier(s, dir).select(col("s_suppkey"),
        (col("s_suppkey") * 11 % 360 - 180).cast("double").as("qlon"),
        (col("s_suppkey") * 23 % 180 - 90).cast("double").as("qlat"))
      graft.operators.Spatial.radiusJoin(
        pts, "c_custkey", "lon", "lat",
        qs, "s_suppkey", "qlon", "qlat", radiusKm = 500.0)
    }),

    // ---- EXT: edit-distance near-dup (fuzzy dedup) ----
    "q133_edit_distance_pairs" -> ((s, dir) =>
      graft.operators.Dedup.editDistancePairs(
        Tables.documents(s, dir), "doc_id", "text", "lang", maxDist = 15)),

    // ---- EXT: per-key rate anomaly + score normalization ----
    "q129_rate_anomalies" -> ((s, dir) =>
      graft.operators.Analyses.rateAnomalies(
        Tables.events(s, dir), "user_id", "ts", zThresh = 2.0)),
    "q141_trend_slope" -> ((s, dir) =>
      graft.operators.Analyses.trendSlope(
        Tables.events(s, dir), "user_id", "ts", "value")),
    "q142_markov_transitions" -> ((s, dir) =>
      R.markovTransitions(Tables.events(s, dir), "user_id", "ts", "event_type",
        tieBreak = col("event_id"))),
    "q143_mode_per_group" -> ((s, dir) =>
      R.modePerGroup(Tables.events(s, dir), "user_id", "event_type")),
    "q144_active_users" -> ((s, dir) =>
      R.activeUsers(Tables.events(s, dir), "user_id", "ts")),
    "q139_mad_outliers" -> ((s, dir) =>
      graft.operators.Analyses.madOutliers(
        Tables.events(s, dir), "user_id", "ts", thresh = 3.5)),
    "q130_percent_rank_norm" -> ((s, dir) =>
      graft.operators.Analyses.percentRankNormalize(
        Tables.documents(s, dir).select("doc_id", "lang", "n_chars"),
        "lang", "n_chars")),

    // ---- W-family: SCD-2 validity intervals from the event log ----
    "q124_scd2_history" -> ((s, dir) =>
      // floor-second epochs in the output (the q87 contract) — the interval
      // semantics live in the run collapse, not sub-second precision
      R.scd2(Tables.events(s, dir), "user_id", "ts", "event_type",
          tieBreak = col("event_id"))
        .select(col("user_id"), col("event_type"),
          col("valid_from").cast("long").as("valid_from_s"),
          col("valid_to").cast("long").as("valid_to_s"),
          col("is_current"))),

    // ---- A-family: per-source equi-width histogram profile ----
    "q125_histogram_profile" -> ((s, dir) =>
      graft.operators.Analyses.histogramProfile(
        Tables.documents(s, dir), "source", "n_chars", buckets = 10)),

    // ---- A-family: ordered conversion funnel (chained min-after) ----
    "q122_funnel" -> ((s, dir) =>
      R.funnel(Tables.events(s, dir), "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))),

    // ---- A-family: weekly cohort retention matrix ----
    "q123_cohort_retention" -> ((s, dir) =>
      R.cohortRetention(Tables.events(s, dir), "user_id", "ts")),

    // ---- EXT: hybrid retrieval — BM25 + vector KNN fused with RRF ----
    "q121_hybrid_rrf" -> ((s, dir) => {
      import s.implicits._
      // the aligned id spaces (doc_id and vec_id both 1..N) stand in for a
      // corpus with both a lexical index and an embedding store; query ids
      // 1-3 query BOTH indexes and the result lists fuse rank-only
      val qs = Seq((1L, "spark window join"), (2L, "hash table scan merge"),
        (3L, "vector stream filter customer")).toDF("query_id", "query_text")
      val lex = TextOps.bm25TopK(Tables.documents(s, dir), "doc_id", "text",
          qs, "query_id", "query_text", k = 10)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val e = Tables.embeddings(s, dir)
      val sem = Similarity.bruteKnn(e, e.filter(col("vec_id").isin(1L, 2L, 3L)),
          "vec_id", "embedding", k = 10, dim = 64)
        .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
      TextOps.rrfFuse(Seq(lex, sem), "query_id", "doc_id", k = 10)
    }),

    // ---- EXT: per-node triangle counts (degree-oriented wedges) ----
    "q120_triangle_counts" -> ((s, dir) => {
      // supplier co-occurrence graph: an edge between two suppliers that
      // serve the same order (q111's bipartite graph has no triangles by
      // construction; co-occurrence projections are where triads live)
      val li = Tables.lineitem(s, dir)
        .filter(col("l_orderkey") % 10 === 0)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk")).distinct()
      val pairs = li.select(col("ok"), col("sk").as("src"))
        .join(li.select(col("ok"), col("sk").as("dst")), Seq("ok"))
        .filter(col("src") < col("dst"))
        .select("src", "dst")
      graft.operators.Graph.triangleCounts(pairs)
    }),

    // ---- EXT: bigram-LM quality score (conditional surprisal) ----
    "q119_bigram_surprisal" -> ((s, dir) =>
      graft.operators.TextOps.bigramSurprisal(
        Tables.documents(s, dir), "doc_id", "text")),

    // ---- §2.9: MultiPolygon overlap (exists over component pairs) ----
    "q118_multipolygon_overlap" -> ((s, dir) => {
      // AOI = holed pentagon UNION a disjoint SW quad; triangles are
      // single-component multipolygons through the same exists() kernel
      val t = Tables.customer(s, dir).select(col("c_custkey"),
          (col("c_custkey") * 19 % 300 - 160).cast("double").as("ax"),
          (col("c_custkey") * 31 % 140 - 75).cast("double").as("ay"))
        .withColumn("mtri", array(array(array(
          array(col("ax"), col("ay")),
          array(col("ax") + 40, col("ay") + 11),
          array(col("ax") + 17, col("ay") + 33)))))
      def ringLit(r: Seq[(Double, Double)]) =
        array(r.map { case (x, y) => array(lit(x), lit(y)) }: _*)
      val aoi = array(
        array(ringLit(AoiPentagon), ringLit(AoiHole)),
        array(ringLit(AoiQuad)))
      t.filter(graft.operators.Spatial.multiPolygonsOverlap(col("mtri"), aoi))
        .select("c_custkey")
    }),

    // ---- P11 + P13 + F4: upload validation (size cap, MIME allowlist) ----
    "q117_upload_validation" -> ((s, dir) => {
      // real binary content (q64's magic prefixes + the document bytes); a
      // 300-byte cap splits the corpus so BOTH verdict branches carry rows.
      // checksum is engine-computed but not output: DuckDB's sha256 takes
      // VARCHAR only, and the F1 hash is already gated by q26/q75.
      val magic = when(col("doc_id") % 5 === 0, "FFD8FFE000104A46")
        .when(col("doc_id") % 5 === 1, "89504E470D0A1A0A")
        .when(col("doc_id") % 5 === 2, "49492A0000000000")
        .when(col("doc_id") % 5 === 3, "504B030414000000")
        .otherwise("0011223344556677")
      val files = Tables.documents(s, dir).select(col("doc_id"),
        concat(unhex(magic), col("text").cast("binary")).as("content"))
      graft.operators.Ingest.validateUploads(files, "doc_id", maxSize = 300L)
        .select("doc_id", "size", "mime_type", "size_ok", "mime_ok", "valid")
    }),

    // ---- EXT: two-pass heavy hitters (MG sketch -> exact recount) ----
    "q116_heavy_hitters" -> ((s, dir) => {
      // deterministic zipf-shaped key (P(rank r) ~ 1/r^2) so the k=32 sketch
      // is genuinely lossy (40-62 distinct items) while the top-4 guarantee
      // holds with margin: 4th count 26/26/251 vs N/(k+1) = 15.2/15.2/151.5
      // at sf0.001/0.01/0.1 — the oracle is then the plain exact top-4.
      val d = Tables.documents(s, dir)
        .withColumn("__h", graft.operators.Sampling.hashBucket(col("doc_id"), 1000))
        .withColumn("item", expr("1000 div (1 + __h)"))
      graft.operators.TextOps.heavyHitters(d, col("item"), n = 4, k = 32)
    }),

    // ---- flagship composition: the reference's file-listing endpoint ----
    "q115_list_project_files" -> ((s, dir) => {
      // Engine.listProjectFiles end-to-end (services/file-service/
      // main.py:307-344): RLS scope -> project filter -> optional type
      // filter -> stable pagination -> response projection, over a
      // files-shaped view derived deterministically from orders. The pieces
      // are gated individually (q04/q10/q18/q60); this gates the composed
      // endpoint itself.
      val o = Tables.orders(s, dir)
      val files = o.select(
        col("o_orderkey").as("id"),
        concat(lit("f"), col("o_orderkey"), lit(".tif")).as("filename"),
        concat(lit("orig_"), col("o_orderkey"), lit(".tif")).as("original_filename"),
        when(col("o_orderkey") % 3 === 0, "image")
          .when(col("o_orderkey") % 3 === 1, "orthophoto")
          .otherwise("dsm").as("file_type"),
        (col("o_orderkey") * 37 % 100000 + 1).as("size"),
        when(col("o_orderkey") % 3 === 0, "image/tiff")
          .when(col("o_orderkey") % 3 === 1, "image/png")
          .otherwise("application/octet-stream").as("mime_type"),
        md5(col("o_orderkey").cast("string")).as("checksum"),
        concat(lit("p"), col("o_orderkey") % 4).as("project_id"),
        concat(lit("u"), col("o_custkey") % 50).as("owner_id"),
        (col("o_orderkey") % 2 === 0).as("is_processed"),
        col("o_orderdate").as("created_at"))
      graft.Engine.listProjectFiles(files, projectId = "p1", userId = "u7",
        role = "user", fileType = Some("orthophoto"), page = 1, size = 2)
    }),

    // ---- §2.9: hole-aware polygon overlap (full GeoJSON nesting) ----
    "q114_polygon_overlap_holes" -> ((s, dir) => {
      // q70's triangle footprints against the pentagon AOI with an interior
      // ring: footprints wholly inside the hole no longer overlap the AOI
      // region. Pure per-row predicate — the join machinery is q70's gate;
      // this one grades the hole-aware kernel.
      val t = Tables.customer(s, dir).select(col("c_custkey"),
          (col("c_custkey") * 19 % 300 - 160).cast("double").as("ax"),
          (col("c_custkey") * 31 % 140 - 75).cast("double").as("ay"))
        .withColumn("tri", array(array(
          array(col("ax"), col("ay")),
          array(col("ax") + 40, col("ay") + 11),
          array(col("ax") + 17, col("ay") + 33))))
      val aoi = array(
        array(AoiPentagon.map { case (x, y) => array(lit(x), lit(y)) }: _*),
        array(AoiHole.map { case (x, y) => array(lit(x), lit(y)) }: _*))
      t.filter(graft.operators.Spatial.polygonsOverlapFull(col("tri"), aoi))
        .select("c_custkey")
    }),

    // ---- S6: copy-on-write row update (upsert) ----
    "q73_upsert" -> ((s, dir) => {
      // the reference's field-wise UPDATE (crud.py:52-68) over a snapshot:
      // every 10th order gets its status rewritten; the merged view must be
      // base-with-updates-applied, which the oracle states as two UNION'd
      // complements.
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      val updates = base.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_orderstatus", lit("X"))
      Joins.upsert(base, updates, Seq("o_orderkey"))
    }),

    // ---- S13 + F9: JSON-lines log sink round-trip ----
    "q74_json_log_roundtrip" -> ((s, dir) => {
      // structured-log shape (shared/utils/__init__.py:95-140): serialize a
      // deterministic event subset to JSON-lines text files, read them back
      // through the schema'd source; the round-trip must reproduce the rows
      // bit-for-bit (Jackson round-trips doubles exactly).
      val sel = Tables.events(s, dir).filter(col("event_id") % 100 === 0)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      val out = java.nio.file.Files.createTempDirectory("graft_jsonlog").toString
      graft.sources.Sources.writeJsonLog(sel, out)
      graft.sources.Sources.readJsonLines(s, out, StructType(Seq(
          StructField("event_id", LongType), StructField("user_id", LongType),
          StructField("event_type", StringType), StructField("value", DoubleType))))
        .select("event_id", "user_id", "event_type", "value")
    }),

    // ---- S3/S4: binary object sink + source round-trip ----
    "q75_binary_roundtrip" -> ((s, dir) => {
      // upload-pipeline storage path, end to end: PUT each selected
      // document's bytes as an object (executor-side Hadoop FS writes), scan
      // the directory back with the binaryFile source, recompute identity
      // (F1 checksum + byte size) — matching the oracle's sha256/length over
      // the source table proves the sink wrote and the source read the
      // exact bytes.
      val docs = Tables.documents(s, dir).filter(col("doc_id") % 50 === 0)
        .select(col("doc_id"), col("text").cast("binary").as("content"))
      val out = java.nio.file.Files.createTempDirectory("graft_bin_rt").toString
      graft.operators.Ingest.writeBinaryObjects(docs, "doc_id", "content", out)
      graft.operators.Ingest.readBinaryDir(s, out)
        .select(
          regexp_extract(col("path"), "([0-9]+)\\.bin$", 1).cast("long").as("doc_id"),
          sha2(col("content"), 256).as("sha"),
          length(col("content")).cast("long").as("nbytes"))
    }),

    // ---- T1/T4: watermarked streaming dedup (at-least-once → exactly-once) ----
    "q76_stream_dedup" -> ((s, dir) =>
      // every event delivered TWICE through the file-source replay; the
      // append-mode dropDuplicates sink must emit each exactly once — the
      // oracle is simply the events table itself.
      graft.streaming.Streams.replayedDedupAppend(
          s, Tables.events(s, dir), chunks = 3, name = "dedup_append")
        .select("event_id", "user_id", "event_type", "value")),

    "q248_stream_dedup_within_watermark" -> ((s, dir) =>
      // the STATE-BOUNDED dedup variant: dropDuplicatesWithinWatermark
      // evicts keys as the watermark advances (time-sliced replay makes it
      // advance for real); appended rows == batch distinct
      graft.streaming.Streams.replayedDedupWithinWatermark(
          s, Tables.events(s, dir), chunks = 3, name = "dedup_within_wm")
        .select("event_id", "user_id", "event_type", "value")),

    "q254_stream_rate_limit" -> ((s, dir) =>
      // per-(user, day) quota enforcement as a stateful streaming op with
      // event-time state cleanup; admitted set == batch row_number ≤ k
      graft.streaming.Streams.replayedRateLimit(
          s, Tables.events(s, dir), chunks = 3, k = 2, name = "rate_limit")
        .select("event_id", "user_id", "event_type", "value")),

    "q261_stream_restart_exactly_once" -> ((s, dir) =>
      // kill the file-sink query mid-replay, restart on the same
      // checkpoint: the drained sink == the batch table (no loss, no dups)
      graft.streaming.Streams.replayedRestartFileSink(
          s, Tables.events(s, dir), chunks = 4, name = "restart_sink")
        .select("event_id", "ts", "user_id", "event_type", "value")),

    // ---- F15: GeoJSON polygon parse → derived bbox ----
    "q77_geojson_bbox" -> ((s, dir) => {
      // per-customer GeoJSON Polygon STRINGS built with %.1f formatting,
      // parsed by the real from_json path (polygonRing), bbox derived by
      // ringBbox; the oracle recomputes the same mins/maxes from the raw
      // arithmetic — if the parse or the bbox fold mis-read a vertex the
      // hash diverges.
      val t = Tables.customer(s, dir).select(col("c_custkey"),
        (col("c_custkey") * 19 % 300 - 160).cast("double").as("ax"),
        (col("c_custkey") * 31 % 140 - 75).cast("double").as("ay"))
      val gj = format_string(
        """{"type":"Polygon","coordinates":[[[%.1f,%.1f],[%.1f,%.1f],[%.1f,%.1f],[%.1f,%.1f]]]}""",
        col("ax"), col("ay"), col("ax") + 40, col("ay") - 11,
        col("ax") - 17, col("ay") + 33, col("ax"), col("ay"))
      val ring = graft.operators.Spatial.polygonRing(gj)
      val bbox = graft.operators.Spatial.ringBbox(ring)
      t.select(col("c_custkey"),
        bbox.getField("min_lon").as("min_lon"),
        bbox.getField("min_lat").as("min_lat"),
        bbox.getField("max_lon").as("max_lon"),
        bbox.getField("max_lat").as("max_lat"))
    }),

    // ---- S12: WebODM external-job combined view ----
    "q78_webodm_job_view" -> ((s, dir) => {
      // processing_tasks ⋈ webodm_tasks (J8 nullable-FK left join) over
      // deterministically derived job tables — every 3rd task has been
      // submitted to WebODM, the rest surface with null webodm columns.
      val pt = Tables.orders(s, dir).select(
        col("o_orderkey").as("id"),
        when(col("o_orderkey") % 2 === 0, "orthophoto").otherwise("dsm").as("task_type"),
        col("o_orderstatus").as("status"),
        ((col("o_orderkey") % 100).cast("double") / 100).as("progress"))
      val wt = Tables.orders(s, dir).filter(col("o_orderkey") % 3 === 0).select(
        col("o_orderkey").as("processing_task_id"),
        concat(lit("wo-"), col("o_orderkey")).as("webodm_task_id"),
        (col("o_custkey") % 50).as("webodm_project_id"),
        when(col("o_orderkey") % 6 === 0, "RUNNING").otherwise("QUEUED").as("status"),
        ((col("o_orderkey") % 10).cast("double") / 10).as("progress"))
      graft.sources.Sources.webodmJobView(pt, wt)
    }),

    // ---- EXT: stratified deterministic sampling (class rebalancing) ----
    "q79_stratified_sample" -> ((s, dir) =>
      // downsample the over-represented language, upsample-keep the rest —
      // the md5-bucket predicate is reproduced verbatim by the oracle
      graft.operators.Sampling.stratifiedSample(
          Tables.documents(s, dir), col("lang"), col("doc_id"),
          Map("en" -> 0.3, "fr" -> 0.8), defaultFraction = 0.5)
        .select("doc_id", "lang")),
    "q80_stratified_take" -> ((s, dir) =>
      // hard per-class cap: exactly min(12, |stratum|) docs per language,
      // chosen by hash order (unbiased w.r.t. any natural data order)
      graft.operators.Sampling.stratifiedTake(
          Tables.documents(s, dir), col("lang"), col("doc_id"), n = 12)
        .select("doc_id", "lang")),

    // ---- EXT: TF-IDF top terms per document ----
    "q81_tfidf_topk" -> ((s, dir) =>
      TextOps.tfidfTopTerms(
          Tables.documents(s, dir).filter(col("doc_id") % 20 === 0),
          "doc_id", "text", k = 5)
        .select("doc_id", "term", "tf", "tfidf")),

    // ---- EXT: token-window chunking (context-length preparation) ----
    "q82_token_chunks" -> ((s, dir) =>
      TextOps.chunkTokens(
          Tables.documents(s, dir).filter(col("doc_id") % 20 === 0),
          "doc_id", "text", chunkSize = 50, overlap = 10)
        .select("doc_id", "chunk_id", "chunk_text", "n_chunk_tokens")),

    // ---- EXT: incremental dedup of an ingest batch against a corpus ----
    "q83_dedup_against_corpus" -> ((s, dir) => {
      // the daily-ingest shape: 1/3 of the documents arrive as the new
      // batch, the other 2/3 are the standing corpus; survivors are batch
      // docs that neither exactly nor nearly (J >= 0.5) duplicate the corpus
      val docs = Tables.documents(s, dir)
      Dedup.dedupAgainstCorpus(
          docs.filter(col("doc_id") % 3 =!= 0),
          docs.filter(col("doc_id") % 3 === 0),
          "doc_id", "text")
        .select("doc_id", "lang")
    }),

    // ---- EXT: corpus-relative length-outlier filter ----
    "q84_length_filter" -> ((s, dir) =>
      TextOps.lengthOutlierFilter(Tables.documents(s, dir), "doc_id", "text",
          pLo = 0.05, pHi = 0.95)
        .select("doc_id", "n_tokens")),

    // ---- EXT: source-level (domain) quality filter ----
    "q85_source_filter" -> ((s, dir) =>
      TextOps.filterBySourceQuality(Tables.documents(s, dir),
          "source", "n_chars", minMean = 300.0)
        .select("doc_id", "source")),

    // ---- EXT: end-to-end corpus-preparation pipeline ----
    "q86_pretrain_pipeline" -> ((s, dir) => {
      // the full composition: length band -> PII scrub -> exact dedup on
      // scrubbed fingerprints -> decontaminate vs the %97 eval slice ->
      // deterministic split. The oracle rebuilds every stage from its
      // already-proven CTE fragments (q84/q56/q27/q59/q54).
      val docs = Tables.documents(s, dir)
      graft.operators.Pipelines.pretrainCorpus(
          docs, "doc_id", "text",
          benchmark = docs.filter(col("doc_id") % 97 === 0), "text")
        .select(col("doc_id"), col("n_tokens"), md5(col("clean_text")).as("clean_md5"),
          col("split"))
    }),

    // ---- EXT: unigram-surprisal quality score (LM-perplexity stand-in) ----
    "q88_unigram_surprisal" -> ((s, dir) =>
      TextOps.unigramSurprisal(Tables.documents(s, dir), "doc_id", "text")
        .select("doc_id", "mean_surprisal", "n_tokens")),

    // ---- EXT: substring-level dedup (duplicated token-window spans) ----
    "q89_dup_spans" -> ((s, dir) =>
      TextOps.duplicateSpanStats(Tables.documents(s, dir), "doc_id", "text",
          window = 10)
        .select("doc_id", "n_spans", "n_dup_spans", "dup_ratio")),
    "q90_drop_dup_spans" -> ((s, dir) =>
      // md5 of the rebuilt text keeps the gate artifact small while still
      // pinning every surviving span and its order exactly
      TextOps.dropDuplicateSpans(Tables.documents(s, dir), "doc_id", "text",
          window = 10)
        .select(col("doc_id"), col("n_spans"), col("n_kept"),
          md5(col("dedup_text")).as("dedup_md5"))),

    // ---- EXT: sequence packing (two-level distributed prefix sum) ----
    "q91_pack_sequences" -> ((s, dir) =>
      graft.operators.Pipelines.packSequences(
          Tables.documents(s, dir), "doc_id", "text", budget = 512)
        .select("doc_id", "n_tokens", "tok_offset", "seq_first", "seq_last")),

    // ---- EXT: per-source token-budget sampling (mixture caps in tokens) ----
    "q92_token_budget" -> ((s, dir) => {
      val d = Tables.documents(s, dir).withColumn("n_tokens",
        size(org.apache.spark.sql.functions.filter(
          TextOps.tokens(col("text")), t => t =!= "")).cast("long"))
      graft.operators.Sampling.tokenBudgetSample(
          d, col("source"), col("doc_id"), col("n_tokens"), budget = 700L)
        .select("doc_id", "source", "n_tokens")
    }),

    // ---- EXT: epoch-weighted mixture (dataset x epochs replication) ----
    "q93_epoch_mix" -> ((s, dir) =>
      graft.operators.Sampling.epochMix(
          Tables.documents(s, dir), col("source"), col("doc_id"),
          Map("src0" -> 2.5, "src1" -> 0.5), defaultEpochs = 1.0)
        .select("doc_id", "source", "epoch")),

    // ---- EXT: int8 scalar quantization of the embedding store ----
    "q94_quantize_int8" -> ((s, dir) =>
      // md5 over the joined codes pins every int exactly; first/last code
      // columns keep the gate human-readable
      graft.operators.Similarity.quantizeInt8(
          Tables.embeddings(s, dir), "vec_id", "embedding")
        .select(col("vec_id"),
          md5(array_join(transform(col("codes"), _.cast("string")), ","))
            .as("codes_md5"),
          element_at(col("codes"), 1).as("code_first"),
          element_at(col("codes"), -1).as("code_last"))),

    // ---- EXT: sharded inverted index (retrieval-side posting lists) ----
    "q95_inverted_index" -> ((s, dir) =>
      TextOps.invertedIndex(Tables.documents(s, dir), "doc_id", "text",
          shardSize = 200L)
        .select(col("term"), col("shard"), col("df"),
          md5(array_join(transform(col("postings"), _.cast("string")), ","))
            .as("postings_md5"))),

    // ---- EXT: product-quantization ANN (8-byte codes + ADC + rerank) ----
    "q106_pq_knn" -> ((s, dir) => {
      val e = Tables.spread(s, Tables.embeddings(s, dir))
      graft.operators.Similarity.pqKnnSeeded(
        e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, m = 8, ksub = 16, dim = 64, candMult = 4)
    }),

    // ---- range (interval) join: bucketized equi-join, never a θ-join ----
    "q105_range_join" -> ((s, dir) => {
      // 100 hourly intervals every 2h from the event log's first midnight;
      // count events + distinct users per interval
      val ev = Tables.events(s, dir).withColumn("es", col("ts").cast("long"))
      val anchor = ev.agg(floor(min(col("es")) / 86400L).cast("long").as("__d"))
      val iv = s.range(100).select(col("id").as("interval_id"))
        .crossJoin(broadcast(anchor))
        .withColumn("start_s", col("__d") * 86400L + col("interval_id") * 7200L)
        .withColumn("end_s", col("start_s") + 3600L)
        .drop("__d")
      Joins.rangeJoin(ev, "es", iv, "start_s", "end_s", bucketSeconds = 3600L)
        .groupBy("interval_id")
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("nu"))
    }),

    // ---- W-family breadth: rank statistics in partitioned windows ----
    "q109_rank_stats" -> ((s, dir) => {
      // rank/dense_rank/percent_rank/cume_dist over a COARSENED key so ties
      // actually exercise their semantics (tied rows share a rank —
      // deterministic without a total order); ntile needs a total order for
      // deterministic bucket boundaries, so it adds the id tiebreak
      val wt = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(floor(col("value") / 10).asc)
      val wo = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(floor(col("value") / 10).asc, col("event_id").asc)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          rank().over(wt).cast("long").as("rnk"),
          dense_rank().over(wt).cast("long").as("drnk"),
          round(percent_rank().over(wt), 6).as("prk"),
          round(cume_dist().over(wt), 6).as("cd"),
          ntile(4).over(wo).cast("long").as("quartile"))
    }),

    // ---- EXT: iterative PageRank over the customer<->supplier graph ----
    "q111_pagerank" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      val pairs = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst")).distinct()
      val edges = pairs.union(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
      graft.operators.Graph.pageRank(edges, iters = 5, d = 0.85)
    }),

    // ---- T4: watermark retention (late-row drop) replay gate ----
    "q113_stream_retention" -> ((s, dir) =>
      // full fixture advances the watermark, then crafted late rows (fresh
      // ids, old timestamps) arrive: the watermarked append sink must drop
      // exactly those beyond the horizon — the oracle is the batch filter
      // ts >= max(ts) - horizon (+ guard) over the same construction.
      graft.streaming.Streams.replayedRetentionAppend(
          s, Tables.events(s, dir), name = "retention", horizon = "15 days")
        .select("event_id", "user_id", "event_type", "value")),

    // ---- F13 tail: EXIF GPS decimal degrees via the IFD byte-walk ----
    "q112_exif_gps" -> ((s, dir) => {
      // per-row TIFF fixture with a GPS IFD planted from custkey-derived
      // micro-degrees; the oracle recomputes lat/lon from the same integers,
      // so the byte-walk's ref/rational decoding is what the hash verifies
      val bridge = org.apache.spark.sql.GraftColumnBridge
      val c = Tables.customer(s, dir).select(col("c_custkey"),
        (col("c_custkey") * 1234567L % 180000000L - 90000000L).as("lat_micro"),
        (col("c_custkey") * 7654321L % 360000000L - 180000000L).as("lon_micro"))
      val g = bridge.column(graft.functions.ExifGps(graft.functions.TiffGpsFixture(
        bridge.expression(col("lat_micro")), bridge.expression(col("lon_micro")))))
      c.select(col("c_custkey"),
        round(g.getField("lat"), 6).as("lat"),
        round(g.getField("lon"), 6).as("lon"))
    }),

    // ---- time-series resample + forward fill (6h grid per user) ----
    "q110_resample_ffill" -> ((s, dir) =>
      R.resampleFfill(Tables.events(s, dir), "user_id",
        col("ts").cast("long"), col("value"), col("event_id"),
        stepSeconds = 21600L)),

    // ---- EXT: weighted sample-without-replacement (A-ES) ----
    "q107_weighted_sample" -> ((s, dir) =>
      graft.operators.Sampling.weightedSample(
        Tables.documents(s, dir).select("doc_id", "source", "n_chars"),
        col("doc_id"), col("n_chars").cast("double"), n = 50)),

    // ---- EXT: deterministic contrastive negative sampling ----
    "q103_hash_negatives" -> ((s, dir) =>
      graft.operators.Sampling.hashNegatives(
          Tables.documents(s, dir).select("doc_id"), col("doc_id"),
          k = 3, nBuckets = 64)
        .select("doc_id", "neg_id", "neg_rank")),

    // ---- EXT: corpus dedup keeping the BEST-scoring copy per cluster ----
    "q100_dedup_keep_best" -> ((s, dir) =>
      Dedup.dedupCorpusKeepBest(Tables.spread(s, Tables.documents(s, dir)),
          "doc_id", "text", col("n_chars"), shingleN = 3, threshold = 0.5,
          maxDf = 100)
        .select("doc_id")),

    // ---- pivot (wide rollup; A-family) ----
    "q101_pivot" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.events(s, dir).groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        // pivot yields NULL for absent combos; the oracle's FILTER'd counts
        // yield 0 — align on 0
        .select(col("user_id") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
    }),

    // ---- rollup / grouping sets (A-family) ----
    "q102_rollup" -> ((s, dir) =>
      Tables.orders(s, dir)
        .withColumn("yr", year(col("o_orderdate")).cast("long"))
        .rollup(col("o_orderstatus"), col("yr"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(D)).cast("double").as("total"))),
    "q104_grouping_sets" -> ((s, dir) => {
      // explicit GROUPING SETS on the SQL surface (q49's path); the SQL
      // text is shared verbatim with the DuckDB oracle
      Tables.registerAll(s, dir)
      s.sql(GroupingSetsSql)
    }),

    // ---- EXT: quality-banded downsampling (importance-resampling shape) ----
    "q97_score_band_sample" -> ((s, dir) =>
      graft.operators.Sampling.scoreBandSample(
          Tables.documents(s, dir), col("doc_id"), "n_chars",
          cuts = Seq(0.25, 0.5, 0.9), rates = Seq(0.3, 1.0, 1.0, 0.5))
        .select("doc_id", "source", "n_chars", "band")),

    // ---- EXT: Z-order locality key (spatial layout at scale) ----
    "q98_zorder_key" -> ((s, dir) => {
      // same integer-derived coordinates as the q42/q50 spatial family
      val pts = Tables.customer(s, dir).select(col("c_custkey"),
        (col("c_custkey") * 7 % 360 - 180).cast("double").as("lon"),
        (col("c_custkey") * 13 % 180 - 90).cast("double").as("lat"))
      pts.withColumn("morton",
          graft.operators.Spatial.mortonKey(col("lon"), col("lat"), bits = 16))
        // top-10-bit range bin: the repartitionByRange bucket a writer uses
        .withColumn("zbin", shiftright(col("morton"), 22))
        .select("c_custkey", "morton", "zbin")
    }),

    // ---- EXT: int8-compressed ANN scan + exact rerank ----
    "q99_int8_knn" -> ((s, dir) => {
      val e = Tables.spread(s, Tables.embeddings(s, dir))
      graft.operators.Similarity.int8Knn(
        e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, dim = 64, candMult = 4)
    }),

    // ---- EXT: BM25 ranked retrieval over the corpus ----
    "q96_bm25_topk" -> ((s, dir) => {
      import s.implicits._
      val qs = Seq((1L, "spark window join"), (2L, "hash table scan merge"),
        (3L, "vector stream filter customer")).toDF("query_id", "query_text")
      TextOps.bm25TopK(Tables.spread(s, Tables.documents(s, dir)), "doc_id", "text",
        qs, "query_id", "query_text", k = 10)
    }),

    // ---- batch sessionization (W-family; twin of the T5 session store) ----
    "q87_sessionize" -> ((s, dir) =>
      R.sessionize(Tables.events(s, dir), "user_id", "ts",
          gapSeconds = 1800, tieBreak = col("event_id"))
        .select("event_id", "user_id", "session_seq")),

    // ---- set ops (SURVEY §2.6) ----
    "q22_union_distinct" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      o.filter(col("o_totalprice") > 180000).select("o_orderkey", "o_custkey")
        .union(o.filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey", "o_custkey"))
        .distinct()
    }),
    "q23_except" -> ((s, dir) => {
      val building = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val withF = Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F").select(col("o_custkey").as("c_custkey"))
      building.except(withF)
    }),

    // ---- scalar functions (SURVEY §2.8) ----
    "q24_json_extract" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(Scalars.jsonField(col("props"), "$.k").cast("int").as("k"))
        .agg(count(lit(1)).as("n"), sum(col("value").cast(D)).cast("double").as("sum_value"))),
    "q25_date_math" -> ((s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        date_add(to_date(col("o_orderdate")), 30).as("due"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01")).as("days_since"))),
    "q26_sha256" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), Scalars.sha256Hex(col("text")).as("text_sha"))),

    // ---- dedup / audit (SURVEY §2.12 + §2.4 uniqueness) ----
    "q27_exact_dedup" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
        .select(md5(col("text")).as("fp"), col("keep_id"), col("n_dups"))),
    "q29_dup_audit" -> ((s, dir) =>
      R.duplicateKeys(Tables.documents(s, dir), "text")
        .select(md5(col("text")).as("fp"), col("n_dups"))),

    // ---- EXT: text analysis (SURVEY §2.12) ----
    "q30_token_counts" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(50)),
    "q31_token_stats" -> ((s, dir) => {
      val t = TextOps.tokens(col("text"))
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(t).as("n_tokens"),
        size(array_distinct(t)).as("n_distinct"),
        ((length(col("text")) - size(t) + 1).cast("double") /
          greatest(size(t), lit(1))).as("mean_token_len"))
    }),
    "q32_lang_profile" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("pred", TextOps.langId(TextOps.tokens(col("text"))))
        .groupBy(col("lang"), col("pred")).agg(count(lit(1)).as("n"))),
    "q33_quality_score" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val cols = TextOps.qualityColumns(col("text"), TextOps.tokens(col("text")))
      d.select(col("doc_id") +: cols.map { case (n, c) => c.as(n) }: _*)
    }),
    "q34_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))),
    "q35_bag_dedup" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy(TextOps.bagFingerprint(TextOps.tokens(col("text"))).as("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))),

    // ---- EXT: near-dup dedup (SURVEY §2.12) ----
    "q36_neardup_jaccard" -> ((s, dir) =>
      // MinHash-candidates + exact-Jaccard verification: the scale path.
      // maxDf=100 drops stop-shingles (df > 100) from candidate generation —
      // the skew guard that keeps band keys bounded when a boilerplate
      // shingle spans the corpus; the verify stage still scores FULL sets.
      // (The all-pairs `jaccardPairs` variant stays available for exact
      // small-scope audits and is spec-covered.)
      Dedup.minhashVerifiedPairs(Tables.spread(s, Tables.documents(s, dir)), "doc_id", "text",
        shingleN = 3, threshold = 0.5, maxDf = 100)),
    "q37_minhash_candidates" -> ((s, dir) =>
      Dedup.minhashCandidates(Tables.spread(s, Tables.documents(s, dir)), "doc_id", "text")),
    "q38_simhash" -> ((s, dir) =>
      Tables.spread(s, Tables.documents(s, dir)).select(
        col("doc_id"),
        Dedup.simhash32(TextOps.tokens(col("text"))).as("simhash"))),
    "q52_simhash_pairs" -> ((s, dir) =>
      // Hamming-banded near-dup pairs with pigeonhole-exact recall at ≤3 bits.
      Dedup.simhashPairs(Tables.spread(s, Tables.documents(s, dir)),
        "doc_id", "text", maxHamming = 3, nBands = 4)),
    "q56_pii_scrub" -> ((s, dir) =>
      // PII scrubbing over a derived fixture (the word-salad corpus contains
      // no real PII, so plant a deterministic email+phone per doc — the op
      // and its oracle still exercise the full scrub).
      Tables.documents(s, dir).select(col("doc_id"),
        md5(TextOps.piiScrub(concat(col("text"),
          lit(" contact user"), col("doc_id"),
          lit("@example.com or +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))).as("scrubbed_md5"))),
    "q57_repetition" -> ((s, dir) =>
      TextOps.repetitionStats(Tables.spread(s, Tables.documents(s, dir)),
        "doc_id", "text", n = 2)),
    "q59_decontaminate" -> ((s, dir) => {
      // Benchmark decontamination: every 97th doc plays the eval set; flag
      // training docs sharing any distinct 3-gram with it. The benchmark
      // shingle set broadcasts; the corpus streams once.
      val d = Tables.spread(s, Tables.documents(s, dir))
      TextOps.contaminationHits(
        d.filter(col("doc_id") % 97 =!= 0), "doc_id", "text",
        d.filter(col("doc_id") % 97 === 0), "text", n = 3)
    }),
    "q55_length_quantiles" -> ((s, dir) =>
      // Exact token-length quantiles per language (interpolated percentile —
      // engine-identical to the oracle's quantile_cont). The approximate
      // sketch path (approx_percentile / approx_count_distinct) is the 100 TB
      // variant, spec-asserted against these exact values.
      Tables.documents(s, dir)
        .select(col("lang"), size(TextOps.tokens(col("text"))).as("n_tokens"))
        .groupBy("lang")
        .agg(expr("percentile(n_tokens, array(0.5, 0.9, 0.99))").as("qs"),
          count(lit(1)).as("n"))
        .select(col("lang"), col("n"),
          element_at(col("qs"), 1).as("p50"),
          element_at(col("qs"), 2).as("p90"),
          element_at(col("qs"), 3).as("p99"))),
    "q54_hash_split" -> ((s, dir) =>
      // Deterministic train/val/test assignment: key-stable md5 buckets, no
      // RNG, no shuffle — each doc keeps its split under appends/reruns.
      Tables.documents(s, dir)
        .groupBy(graft.operators.Sampling.splitAssign(col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"))),
    "q53_dedup_corpus" -> ((s, dir) =>
      // End-to-end corpus dedup: exact-dup collapse → near-dup over the
      // representatives (maxDf stop-shingle guard) → iterative component
      // closure — oracle'd via a recursive-CTE transitive closure in DuckDB
      // that mirrors the collapse and the df filter exactly.
      Dedup.dedupCorpus(Tables.spread(s, Tables.documents(s, dir)),
        "doc_id", "text", shingleN = 3, threshold = 0.5, maxDf = 100)
        .select("doc_id")),

    // ---- EXT: similarity search (SURVEY §2.12) ----
    "q39_knn_brute" -> ((s, dir) => {
      val e = Tables.spread(s, Tables.embeddings(s, dir))
      Similarity.bruteKnn(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5, dim = 64)
        .withColumn("sim", round(col("sim"), 6))
    }),
    "q40_embedding_stats" -> ((s, dir) =>
      Tables.embeddings(s, dir)
        .withColumn("nrm", Similarity.norm(Similarity.asDouble(col("embedding"))))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          // round BEFORE the decimal cast (sqrt doubles can differ by 1 ulp
          // across engines at the decimal(18,6) boundary), cast the exact
          // decimal sum to double as the final output.
          sum(round(col("nrm"), 6).cast("decimal(18,6)")).cast("double").as("sum_norm"))),
    // ---- spatial (SURVEY §2.9) ----
    "q42_bbox_join" -> ((s, dir) => {
      // J12: point-in-bbox spatial join, broadcast dim side; integer-derived
      // coordinates so the oracle is exact.
      val boxes = Tables.nation(s, dir).select(col("n_name"), struct(
        (col("n_nationkey") * 29 % 300 - 170).cast("double").as("min_lon"),
        (col("n_nationkey") * 17 % 140 - 80).cast("double").as("min_lat"),
        (col("n_nationkey") * 29 % 300 - 170 + 40).cast("double").as("max_lon"),
        (col("n_nationkey") * 17 % 140 - 80 + 30).cast("double").as("max_lat")).as("bbox"))
      val pts = Tables.customer(s, dir).select(col("c_custkey"),
        (col("c_custkey") * 7 % 360 - 180).cast("double").as("lon"),
        (col("c_custkey") * 13 % 180 - 90).cast("double").as("lat"))
      pts.join(broadcast(boxes),
          graft.operators.Spatial.pointInBbox(col("lon"), col("lat"), col("bbox")))
        .groupBy(col("n_name")).agg(count(lit(1)).as("n_points"))
    }),
    "q43_point_in_polygon" -> ((s, dir) => {
      // Exact ray-casting via the custom Catalyst expression over a fixed
      // pentagon; the oracle unrolls the same 5 edge terms.
      val ring = array(
        array(lit(0.0), lit(0.0)), array(lit(120.0), lit(10.0)),
        array(lit(140.0), lit(80.0)), array(lit(-30.0), lit(70.0)),
        array(lit(-100.0), lit(20.0)))
      Tables.customer(s, dir).select(
        col("c_custkey"),
        (col("c_custkey") * 7 % 360 - 180).cast("double").as("lon"),
        (col("c_custkey") * 13 % 180 - 90).cast("double").as("lat"))
        .withColumn("inside",
          graft.operators.Spatial.pointInPolygon(col("lon"), col("lat"), ring))
        .select("c_custkey", "inside")
    }),

    // ---- S11 scene-export query (SURVEY §2.1) ----
    "q44_scene_export" -> ((s, dir) => {
      // GEE-style collection export: date range + bbox-intersects + cloud cap
      // over a deterministic derived scenes catalog.
      val scenes = Tables.part(s, dir).select(
        col("p_partkey").as("scene_id"),
        concat(lit("c"), (col("p_partkey") % 3).cast("string")).as("collection_id"),
        date_add(lit("1995-01-01").cast("date"), (col("p_partkey") % 1000).cast("int")).as("date"),
        (col("p_partkey") * 11 % 340 - 175).cast("double").as("min_lon"),
        (col("p_partkey") * 23 % 160 - 85).cast("double").as("min_lat"),
        (col("p_partkey") * 11 % 340 - 175 + 20).cast("double").as("max_lon"),
        (col("p_partkey") * 23 % 160 - 85 + 10).cast("double").as("max_lat"),
        (col("p_partkey") % 100).cast("double").as("cloud_pct"))
      val aoi = struct(lit(-120.0).as("min_lon"), lit(-60.0).as("min_lat"),
        lit(120.0).as("max_lon"), lit(60.0).as("max_lat"))
      graft.sources.Sources.exportQuery(scenes, "c1", "1995-01-01", "1997-12-31", aoi, 60.0)
        .select("scene_id", "date", "cloud_pct")
    }),

    // ---- §2.11 analysis registry ----
    "q46_analysis_registry" -> ((s, dir) =>
      graft.operators.Analyses.run("token_stats", Tables.documents(s, dir),
        """{"column":"text"}""")),

    // ---- custom typed UDAF (§7.3) ----
    "q47_bbox_udaf" -> ((s, dir) => {
      val pts = Tables.lineitem(s, dir).select(col("l_returnflag"),
        (col("l_partkey") * 7 % 360 - 180).cast("double").as("lon"),
        (col("l_suppkey") * 13 % 180 - 90).cast("double").as("lat"))
      pts.groupBy(col("l_returnflag"))
        .agg(graft.operators.Analyses.bboxUdaf(col("lon"), col("lat")).as("b"))
        .select(col("l_returnflag"),
          col("b.minLon").as("min_lon"), col("b.maxLon").as("max_lon"),
          col("b.minLat").as("min_lat"), col("b.maxLat").as("max_lat"))
    }),

    // ---- T3 streaming windowed metrics, batch-equivalence gate ----
    "q58_windowed_metrics" -> ((s, dir) =>
      // The tumbling-window metric from Streams.windowedMetrics evaluated
      // over the batch events fixture (withWatermark is a no-op in batch;
      // stream==batch equivalence is additionally spec-asserted). win_start
      // as epoch seconds so both engines hash one integral representation.
      graft.streaming.Streams.windowedMetrics(Tables.events(s, dir))
        .select(col("win_start").cast("long").as("win_start"), col("event_type"),
          col("n"), col("sum_value"), col("avg_value"))),

    // ---- W4 rolling time-range window ----
    "q48_rolling_window" -> ((s, dir) =>
      R.rollingWindow(Tables.events(s, dir), "user_id", "ts",
        col("value").cast(D), windowSeconds = 3600L, as = "roll_sum")
        .select(col("user_id"), col("event_id"),
          col("roll_sum").cast("double").as("roll_sum"), col("roll_sum_n"))),

    // ---- SQL API surface over the registered catalog ----
    "q49_sql_api" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(RegionRevenueSql)
    }),

    // ---- grid-partitioned (non-broadcast) spatial join ----
    "q50_grid_spatial_join" -> ((s, dir) => {
      val boxes = Tables.nation(s, dir).select(col("n_name"), struct(
        (col("n_nationkey") * 29 % 300 - 170).cast("double").as("min_lon"),
        (col("n_nationkey") * 17 % 140 - 80).cast("double").as("min_lat"),
        (col("n_nationkey") * 29 % 300 - 170 + 40).cast("double").as("max_lon"),
        (col("n_nationkey") * 17 % 140 - 80 + 30).cast("double").as("max_lat")).as("bbox"))
      val pts = Tables.customer(s, dir).select(col("c_custkey"),
        (col("c_custkey") * 7 % 360 - 180).cast("double").as("lon"),
        (col("c_custkey") * 13 % 180 - 90).cast("double").as("lat"))
      graft.operators.Spatial.gridJoin(pts, "lon", "lat", boxes, "bbox", cellDeg = 30.0)
        .groupBy(col("n_name")).agg(count(lit(1)).as("n_points"))
    }),

    // ---- embedding-cosine near-dup (banded LSH + exact-cosine verify) ----
    "q51_embedding_neardup" -> ((s, dir) =>
      // Threshold 0.4 ≈ the fixture's 99.95th cosine percentile (max pairwise
      // cosine is 0.51 — the embeddings are near-random, so a realistic 0.8+
      // near-dup threshold matches nothing; recall at production thresholds
      // is spec-asserted on planted near-dups instead). 6 bits per band keep
      // random-pair band collisions at 2^-6 so candidates stay far below
      // all-pairs even in this low-threshold regime.
      Dedup.embeddingNearDups(Tables.spread(s, Tables.embeddings(s, dir)),
        "vec_id", "embedding", dim = 64, threshold = 0.4,
        nBands = 8, rowsPerBand = 6)),

    "q45_ivf_knn" -> ((s, dir) => {
      // Fully oracle-gated: the md5-seeded centroid matrix makes the whole
      // IVF pipeline (assignment, probe set, cosine, rank) reproducible in
      // DuckDB — the q41 hyperplane pattern applied to the coarse quantizer.
      // The KMeans-fitted `ivfKnn` remains the library/production variant,
      // recall-asserted in SpatialKnnSpec.
      val e = Tables.spread(s, Tables.embeddings(s, dir))
      Similarity.ivfKnnSeeded(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nCentroids = 8, nprobe = 2, dim = 64)
        .withColumn("sim", round(col("sim"), 6))
    }),
    "q41_knn_lsh" -> ((s, dir) => {
      // Fully oracle-gated: the md5-seeded hyperplane buckets and hamming-1
      // probe set are engine-reproducible, so the whole multi-probe LSH ANN
      // pipeline has an exact DuckDB oracle. Recall vs the brute baseline is
      // additionally asserted in SpatialKnnSpec.
      val e = Tables.spread(s, Tables.embeddings(s, dir))
      Similarity.lshKnn(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        dim = 64, nPlanes = 6, k = 5)
        .withColumn("sim", round(col("sim"), 6))
    }),

    // ---- EXT: autocorrelation of the daily revenue series (lags 1..7) ----
    "q286_acf_daily" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(col("o_totalprice").cast(D)).as("rev"))
      graft.operators.Analyses.acfByLag(daily, "day", "rev", maxLag = 7)
    }),

    // ---- EXT: MASE — seasonal-naive forecast quality per priority ----
    "q287_mase_forecast" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"), to_date(col("o_orderdate")).as("day"))
        .agg(sum(col("o_totalprice").cast(D)).as("rev"))
      graft.operators.Analyses.maseSeasonalNaive(
        daily, "o_orderpriority", "day", "rev", season = 7)
    }),

    // ---- EXT: Zipf rank-frequency slope per language slice ----
    "q288_zipf_slope" -> ((s, dir) =>
      TextOps.zipfSlope(Tables.documents(s, dir), "lang", "text",
        topRanks = 200)),

    // ---- EXT: Spearman rank correlation (value vs time, per type) ----
    "q289_spearman_rho" -> ((s, dir) =>
      graft.operators.Analyses.spearmanRho(
        Tables.events(s, dir).select(col("event_type"), col("value"),
          unix_micros(col("ts")).as("t_us")),
        "event_type", col("value"), col("t_us"))),

    // ---- EXT: Mann–Whitney U rank-sum A/B test per type ----
    "q290_mann_whitney" -> ((s, dir) =>
      graft.operators.Analyses.mannWhitneyU(
        Tables.events(s, dir), "event_type",
        armCol = col("user_id") % 2 === 1, valueCol = col("value"))),

    // ---- EXT: Cramér's V effect size (event type × weekday) ----
    "q291_cramers_v" -> ((s, dir) =>
      graft.operators.Analyses.cramersV(
        Tables.events(s, dir).select(col("event_type"),
          weekday(col("ts")).cast("int").as("dow")),
        "event_type", "dow")),

    // ---- EXT: geometric + harmonic means per type ----
    "q292_log_means" -> ((s, dir) =>
      graft.operators.Analyses.logMeans(
        Tables.events(s, dir), "event_type", col("value"))),

    // ---- EXT: RFM quintile segmentation (threshold buckets, no global window) ----
    "q293_rfm_segments" -> ((s, dir) =>
      graft.operators.Analyses.rfmSegments(
        Tables.orders(s, dir), "o_custkey", "o_orderdate", "o_totalprice")),

    // ---- EXT: count-min sketch accuracy audit (d=2, w=64) ----
    "q294_countmin_audit" -> ((s, dir) =>
      graft.operators.Sketches.countMinAudit(
        Tables.events(s, dir), col("user_id"), depth = 2, width = 64,
        topN = 20)),

    // ---- EXT: KMV bottom-k set-intersection estimate audit ----
    "q295_kmv_intersect" -> ((s, dir) =>
      graft.operators.Sketches.kmvIntersectAudit(
        Tables.events(s, dir), col("event_type"), col("user_id"), k = 128)),

    // ---- EXT: fixed-round k-core peel on the customer↔supplier graph ----
    "q296_kcore_peel" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      val pairs = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst")).distinct()
      val edges = pairs.union(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
      graft.operators.Graph.kCorePeel(edges, k = 5, rounds = 6)
    }),

    // ---- EXT: graded nDCG@5 of the LSH index against the exact ranking ----
    "q297_ndcg" -> ((s, dir) => {
      // q222's recall/MRR sibling with GRADED relevance: a candidate found
      // at truth-rank r carries gain 6−r, so ordering quality inside the
      // top-k matters, not just membership. Per-position terms are rounded
      // then summed as exact decimals (the q162 discipline); IDCG comes
      // from each query's own truth list so short lists normalize fairly.
      val e = Tables.spread(s, Tables.embeddings(s, dir))
      val truth = Similarity.bruteKnn(e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, dim = 64)
      val cand = Similarity.lshKnn(e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", dim = 64, nPlanes = 6, k = 5)
      val dcg = cand.select(col("query_id"), col("neighbor_id"), col("rank"))
        .join(truth.select(col("query_id"), col("neighbor_id"),
          (lit(6) - col("rank")).cast("double").as("__g")),
          Seq("query_id", "neighbor_id"), "left")
        .withColumn("__term",
          round(coalesce(col("__g"), lit(0.0d)) /
            log2(col("rank").cast("double") + 1.0d), 6).cast("decimal(18,6)"))
        .groupBy(col("query_id")).agg(sum(col("__term")).as("__dcg"))
      val idcg = truth
        .withColumn("__term",
          round((lit(6) - col("rank")).cast("double") /
            log2(col("rank").cast("double") + 1.0d), 6).cast("decimal(18,6)"))
        .groupBy(col("query_id")).agg(sum(col("__term")).as("__idcg"))
      idcg.join(dcg, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("__dcg").cast("double"), lit(0.0d)).as("dcg"),
          col("__idcg").cast("double").as("idcg"),
          (round(coalesce(col("__dcg").cast("double"), lit(0.0d)) /
            col("__idcg").cast("double"), 6) + lit(0.0d)).as("ndcg"))
    }),

    // ---- EXT: Jaro–Winkler fuzzy name resolution (native expression) ----
    "q298_fuzzy_match" -> ((s, dir) => {
      // dirty probe set: every part name with ONE character dropped at a
      // p_partkey-derived position in [2, len−1] (first char preserved so
      // first-char blocking holds); the matcher must resolve each probe
      // back to a catalog name. The JW kernel is the native codegen
      // expression — the oracle scores the same pairs with DuckDB's
      // jaro_winkler_similarity, so the gate verifies the kernel itself.
      val dirty = Tables.part(s, dir).select(col("p_partkey"),
        expr("""concat(
             substring(p_name, 1, cast(1 + p_partkey % (length(p_name) - 2) as int)),
             substring(p_name, cast(3 + p_partkey % (length(p_name) - 2) as int), length(p_name)))""")
          .as("dirty_name"))
      Dedup.fuzzyBlockMatch(dirty, "p_partkey", "dirty_name",
        Tables.part(s, dir), "p_name", minSim = 0.85)
    }),

    // ---- EXT: true Damerau–Levenshtein neighborhood audit ----
    "q299_damerau_close" -> ((s, dir) => {
      // the q298 probe set scored with the UNRESTRICTED DL kernel (native
      // expression): per probe, how many catalog names sit within edit
      // distance 2 and how close the nearest is — the ambiguity check a
      // fuzzy matcher needs before trusting best-match resolution
      val dirty = Tables.part(s, dir).select(col("p_partkey"),
        expr("""concat(
             substring(p_name, 1, cast(1 + p_partkey % (length(p_name) - 2) as int)),
             substring(p_name, cast(3 + p_partkey % (length(p_name) - 2) as int), length(p_name)))""")
          .as("dirty_name"))
      val cat = Tables.part(s, dir).select(col("p_name").as("__clean")).distinct()
      dirty.join(broadcast(cat),
          substring(col("dirty_name"), 1, 1) === substring(col("__clean"), 1, 1))
        .withColumn("__dl", Dedup.damerauLevenshtein(col("dirty_name"), col("__clean")))
        .groupBy(col("p_partkey"), col("dirty_name"))
        .agg(min(col("__dl")).as("min_dl"),
          sum(when(col("__dl") <= 2, 1L).otherwise(0L)).as("n_within2"))
    }),

    // ---- EXT: inter-arrival burstiness per event type ----
    "q300_interarrival" -> ((s, dir) =>
      graft.operators.Analyses.interarrivalStats(
        Tables.events(s, dir), "event_type", "user_id", "ts",
        tieBreak = col("event_id"))),

    // ---- EXT: Gumbel fit of monthly maxima of daily revenue ----
    "q301_gumbel_fit" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(col("o_totalprice").cast(D)).as("rev"))
      graft.operators.Analyses.gumbelBlockMaxima(daily, "day", "rev")
    }),

    // ---- EXT: weekly-activity bitmask profiles ----
    "q302_dow_bitmask" -> ((s, dir) =>
      // per user one int whose bit d is set iff the user was active on
      // weekday d, then the histogram of those masks — the compact
      // behavioral-profile encoding (bitmap index grain: OR/AND-mergeable
      // across partitions and days, the roaring-bitmap idea in miniature)
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(expr("bit_or(shiftleft(1, weekday(ts)))").as("mask"))
        .groupBy(col("mask"))
        .agg(count(lit(1)).as("n_users"))
        .select(col("mask"), expr("cast(bit_count(mask) as int)").as("n_active_days"),
          col("n_users"))),

    // ---- EXT: small-file compaction plan (start-offset bin packing) ----
    "q303_compaction_plan" -> ((s, dir) => {
      val files = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"),
          date_trunc("month", col("l_shipdate")).as("file_month"))
        .agg((count(lit(1)) * 100L).as("bytes"))
      graft.sources.Sources.compactionPlan(files,
          Seq("l_returnflag", "l_linestatus"), col("file_month"), col("bytes"),
          targetBytes = 500000L)
        .select(col("l_returnflag"), col("l_linestatus"),
          to_date(col("file_month")).as("file_month"),
          col("est_bytes"), col("bin"))
    }),

    // ---- EXT: decision-stump split search (histogram greedy) ----
    "q304_decision_stump" -> ((s, dir) =>
      // "which feature and cut best separates purchases": candidate grids
      // are the whole-unit-rounded value and the event hour — bounded by
      // construction, the XGBoost histogram discipline
      graft.operators.Analyses.giniStump(
        Tables.events(s, dir),
        features = Seq(
          "value_unit" -> round(col("value"), 0),
          "hour" -> hour(col("ts")).cast("double")),
        label = (col("event_type") === "purchase").cast("int"))),

    // ---- EXT: l-diversity privacy audit ----
    "q305_l_diversity" -> ((s, dir) => {
      val t = Tables.customer(s, dir)
        .join(Tables.orders(s, dir),
          col("c_custkey") === col("o_custkey"))
      graft.operators.Analyses.lDiversityAudit(t,
        Seq("c_mktsegment", "c_nationkey"), col("o_orderpriority"), minL = 3)
    }),

    // ---- EXT: business-day SLA latency per priority ----
    "q306_business_days" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship_d"))
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          to_date(col("o_orderdate")).as("order_d"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("__bd",
          Scalars.busDayIndex(col("ship_d")) - Scalars.busDayIndex(col("order_d")))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          (round(sum(col("__bd")).cast("double") /
            count(lit(1)).cast("double"), 6) + lit(0.0d)).as("mean_bus_days"),
          max(col("__bd")).as("max_bus_days"))
    }),

    // ---- EXT: logistic regression via IRLS (Newton), 3 iterations ----
    "q307_logistic_irls" -> ((s, dir) =>
      graft.operators.Analyses.logisticIrls(
        Tables.events(s, dir),
        x1 = col("value") / 100, x2 = hour(col("ts")) / 24.0d,
        label = col("event_type") === "purchase", iters = 3)),

    // ---- EXT: perceptual dHash over real image bytes + dup groups ----
    "q308_dhash" -> ((s, dir) => {
      // per-row 9×8 gray BMP built from the key (genuine bytes: header,
      // bottom-up padded rows), decoded by the native dHash byte-walk; the
      // oracle recomputes the hash from the pixel FORMULA in integer SQL,
      // so the decode path is exactly what the gate verifies (the q112
      // EXIF discipline applied to the multimodal dedup fingerprint)
      val bridge = org.apache.spark.sql.GraftColumnBridge
      val h = bridge.column(graft.functions.DHash64(graft.functions.GrayBmpFixture(
        bridge.expression(col("c_custkey")))))
      val hashed = Tables.customer(s, dir)
        .select(col("c_custkey"), h.as("dhash"))
      val groups = hashed.groupBy(col("dhash"))
        .agg(count(lit(1)).as("n_same_hash"))
      hashed.join(groups, Seq("dhash"))
        .select(col("c_custkey"), col("dhash"), col("n_same_hash"))
    }),

    // ---- EXT: floor-at-zero running balance (closed-form, no scan) ----
    "q309_clamped_balance" -> ((s, dir) =>
      // signed integer stock moves per user: purchases/errors draw down,
      // everything else restocks; the floor-at-zero recurrence collapses
      // to prefix-sum minus running-min — two windows, fully distributed
      graft.operators.Analyses.clampedBalance(
        Tables.events(s, dir), "user_id", "ts",
        deltaCol = round(col("value"), 0).cast("long") *
          when(col("event_type").isin("purchase", "error"), -1L).otherwise(1L),
        tieBreak = col("event_id"))),

    // ---- EXT: banded near-dup join over the perceptual hashes ----
    "q310_dhash_banded_pairs" -> ((s, dir) => {
      // the multimodal sibling of q52's SimHash pairs: 8 bands of 8 bits
      // over the DISTINCT dHash values (≤256 by the fixture's mod-256
      // pixel cycle — entity grain, bounded at any SF); pigeonhole gives
      // exact recall for hamming ≤ 7
      val bridge = org.apache.spark.sql.GraftColumnBridge
      val h = bridge.column(graft.functions.DHash64(graft.functions.GrayBmpFixture(
        bridge.expression(col("c_custkey")))))
      val d = Tables.customer(s, dir).select(h.as("dhash")).distinct()
      val bands = d.select(col("dhash"),
          explode(sequence(lit(0), lit(7))).as("band"))
        .withColumn("bv", expr("shiftright(dhash, band * 8) & 255"))
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.dhash") < col("b.dhash"))
        .select(col("a.dhash").as("dhash_a"), col("b.dhash").as("dhash_b"))
        .distinct()
      cand
        .withColumn("hamming",
          bit_count(col("dhash_a").bitwiseXOR(col("dhash_b"))).cast("int"))
        .filter(col("hamming") <= 7)
    }),

    // ---- EXT: greedy coverage-maximizing subset selection ----
    "q311_greedy_cover" -> ((s, dir) =>
      TextOps.greedyCover(Tables.documents(s, dir), "doc_id", "text",
        shingleN = 3, rounds = 5)),

    // ---- EXT: Luhn check-digit audit (q62/q63 validator family) ----
    "q312_luhn_audit" -> ((s, dir) => {
      // synthetic 12-digit account numbers: 11 payload digits from the
      // key, check digit = custkey mod 10 (so a key-dependent mix of
      // valid and invalid rows); the audit reports validity per segment
      val withNum = Tables.customer(s, dir).select(col("c_mktsegment"),
        concat(lpad((col("c_custkey") * 37 % 100000000000L).cast("string"),
          11, "0"), (col("c_custkey") % 10).cast("string")).as("acct"))
      withNum.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(Scalars.luhnValid(col("acct"), 12).cast("long")).as("n_valid"))
        .withColumn("valid_rate",
          round(col("n_valid").cast("double") / col("n").cast("double"), 6)
            + lit(0.0d))
    }),

    // ---- EXT: Horvitz–Thompson two-stage sample estimator audit ----
    "q313_horvitz_thompson" -> ((s, dir) => {
      // stage 1 samples entire users (π₁ = 3/10), stage 2 samples events
      // within sampled users (π₂ = 5/10) — both key-stable md5 buckets,
      // so the design is reproducible and the inclusion probability of
      // every sampled row is exactly π₁π₂ = 3/20. The HT estimate
      // Σ y/(π₁π₂) = Σy · 20/3 uses an exact decimal Σy (one rational
      // scale at the end) and is audited against the true total — the
      // design-unbiasedness check a sampling pipeline ships with.
      import graft.operators.Sampling.hashBucket
      val e = Tables.events(s, dir)
        .select(col("event_type"), col("user_id"), col("event_id"),
          col("value").cast(D).as("__v"))
      val sampled = e
        .filter(hashBucket(col("user_id"), 10) < 3)
        .filter(hashBucket(col("event_id"), 10) < 5)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_sampled"), sum(col("__v")).as("__sy"))
      val truth = e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_total"), sum(col("__v")).as("__ty"))
      sampled.join(truth, Seq("event_type"))
        .select(col("event_type"), col("n_sampled"), col("n_total"),
          (round(col("__sy").cast("double") * 20.0d / 3.0d, 2) + lit(0.0d))
            .as("ht_estimate"),
          (round(col("__ty").cast("double"), 2) + lit(0.0d)).as("true_total"),
          (round(col("__sy").cast("double") * 20.0d / 3.0d /
            col("__ty").cast("double"), 6) + lit(0.0d)).as("ratio"))
    }),

    // ---- EXT: run-length encoding of event-type sequences ----
    "q314_type_runs" -> ((s, dir) => {
      // gaps-and-islands over the TYPE sequence (q148 is day-streaks):
      // run id = overall rank − per-type rank, constant within a run of
      // identical consecutive types; per user the run count and the
      // longest run (ties: type asc, earliest start)
      import org.apache.spark.sql.expressions.Window
      val wAll = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wType = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val runs = Tables.events(s, dir)
        .withColumn("__grp",
          row_number().over(wAll) - row_number().over(wType))
        .groupBy(col("user_id"), col("event_type"), col("__grp"))
        .agg(count(lit(1)).as("__len"), min(col("event_id")).as("__start"))
      val wBest = Window.partitionBy(col("user_id"))
        .orderBy(col("__len").desc, col("event_type").asc, col("__start").asc)
      runs.withColumn("__rn", row_number().over(wBest))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_runs"),
          max(col("__len")).as("longest_run"),
          max(when(col("__rn") === 1, col("event_type"))).as("longest_type"))
    }),

    // ---- EXT: distribution-free median confidence interval ----
    "q316_median_ci" -> ((s, dir) => {
      // order-statistic CI: P(X_(l) ≤ median ≤ X_(u)) ≈ 95% with
      // l = floor((n − 1.96√n)/2), u = ceil(1 + (n + 1.96√n)/2) — no
      // normality assumption, pure rank lookups. All three ranks resolve
      // against the (type, value) DISTRIBUTION table (bounded window, the
      // q130 trick), never a corpus sort; the rank formulas are mirrored
      // double→floor/ceil expressions.
      import org.apache.spark.sql.expressions.Window
      val d = Tables.events(s, dir)
        .select(col("event_type"), col("value").as("__v"))
      val dist = d.groupBy(col("event_type"), col("__v"))
        .agg(count(lit(1)).as("__c"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = dist.withColumn("__cum", sum(col("__c")).over(w))
      val n = d.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val ranks = n
        .withColumn("__rmed", expr("(n + 1) div 2"))
        .withColumn("__rlo", greatest(lit(1L),
          floor((col("n").cast("double") -
            lit(1.96d) * sqrt(col("n").cast("double"))) / 2.0d).cast("long")))
        .withColumn("__rhi", least(col("n"),
          ceil(lit(1.0d) + (col("n").cast("double") +
            lit(1.96d) * sqrt(col("n").cast("double"))) / 2.0d).cast("long")))
      // ONE pass over the cumulative distribution resolves all three
      // ranks (conditional mins against the broadcast 1-row-per-type
      // rank table) — the previous three-join form recomputed the
      // distribution window per rank
      cum.join(broadcast(ranks), Seq("event_type"))
        .groupBy(col("event_type"), col("n"))
        .agg(
          min(when(col("__cum") >= col("__rlo"), col("__v"))).as("ci_lo"),
          min(when(col("__cum") >= col("__rmed"), col("__v"))).as("median"),
          min(when(col("__cum") >= col("__rhi"), col("__v"))).as("ci_hi"))
        .select(col("event_type"), col("n"), col("ci_lo"), col("median"),
          col("ci_hi"))
    }),

    // ---- SQL surface: GROUP BY ALL (shared text, q49 discipline) ----
    "q317_group_by_all" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(GroupByAllSql)
    }),

    // ---- EXT: ANN tuning curve — recall@5 vs LSH selectivity ----
    "q318_ann_tuning" -> ((s, dir) => {
      // the index-tuning decision as an oracle-checked query: more planes
      // = smaller buckets = fewer candidates = lower recall; the sweep
      // quantifies the tradeoff the q41 production setting (6 planes)
      // sits on. Each setting is one bounded LSH pass; recall is exact
      // integer division.
      val e = Tables.spread(s, Tables.embeddings(s, dir))
      val probes = e.filter(col("vec_id") < 10)
      val truth = Similarity.bruteKnn(e, probes, "vec_id", "embedding",
        k = 5, dim = 64).select(col("query_id"), col("neighbor_id"))
      Seq(4, 6, 8).map { p =>
        val cand = Similarity.lshKnn(e, probes, "vec_id", "embedding",
          dim = 64, nPlanes = p, k = 5)
          .select(col("query_id"), col("neighbor_id"))
        truth.join(cand, Seq("query_id", "neighbor_id"), "left_semi")
          .agg(count(lit(1)).as("__m"))
          .crossJoin(broadcast(truth.agg(count(lit(1)).as("__t"))))
          .select(lit(p).as("n_planes"),
            (round(col("__m").cast("double") / col("__t").cast("double"), 6)
              + lit(0.0d)).as("mean_recall5"))
      }.reduce(_.unionByName(_))
    }),

    // ---- EXT: medallion pipeline (bronze → silver → gold + audit) ----
    "q319_medallion" -> ((s, dir) => {
      // the warehouse-shaped sibling of q86's pretrain pipeline: quarantine
      // invalid rows (CHECK-style predicate), collapse duplicate
      // (user, ts, type) events keeping the lowest id, roll up the gold
      // daily grain, and carry the bronze/quarantine/dedup audit counts on
      // every row (broadcast 1-row audit — lineage you can SELECT). Every
      // stage is a pure frame transform; counts are exact integers and
      // revenue an exact decimal sum.
      val bronze = Tables.events(s, dir)
      val quarantined = bronze.filter(col("value") < 1.0d)
      val valid = bronze.filter(col("value") >= 1.0d)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("ts"), col("event_type"))
        .orderBy(col("event_id").asc)
      val silver = valid.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
      val audit = bronze.agg(count(lit(1)).as("n_bronze"))
        .crossJoin(broadcast(quarantined.agg(count(lit(1)).as("n_quarantined"))))
        .crossJoin(broadcast(silver.agg(count(lit(1)).as("__ns"))))
        .withColumn("n_dups_dropped",
          col("n_bronze") - col("n_quarantined") - col("__ns"))
        .select(col("n_bronze"), col("n_quarantined"), col("n_dups_dropped"))
      silver
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          (round(sum(col("value").cast(D)).cast("double"), 2) + lit(0.0d))
            .as("revenue"))
        .crossJoin(broadcast(audit))
    }),

    // ---- EXT: quantile-gap drift between two slices ----
    "q320_qq_drift" -> ((s, dir) => {
      // decile-grid QQ comparison of the value distribution between the
      // even- and odd-user populations — the quantile-space drift read
      // that PSI (q229, bin-mass space) and KS (q283, max-CDF-gap) don't
      // give: WHERE in the distribution the two slices diverge. Exact
      // percentiles on both slices, rounded before the gap (cross-engine
      // ulp contract); thresholds are two 1-row percentile aggregates.
      val e = Tables.events(s, dir)
        .select((col("user_id") % 2 === 0).as("__even"), col("value"))
      val cuts = (1 to 9).map(_ / 10.0).mkString(", ")
      val qa = e.filter(col("__even"))
        .agg(transform(expr(s"percentile(value, array($cuts))"),
          t => round(t, 6)).as("__qa"))
      val qb = e.filter(!col("__even"))
        .agg(transform(expr(s"percentile(value, array($cuts))"),
          t => round(t, 6)).as("__qb"))
      qa.crossJoin(broadcast(qb))
        .select(posexplode(arrays_zip(col("__qa"), col("__qb"))))
        .select(((col("pos") + 1).cast("int") * 10).as("pct"),
          col("col.__qa").as("q_even"), col("col.__qb").as("q_odd"))
        .withColumn("gap",
          round(abs(col("q_even") - col("q_odd")), 6) + lit(0.0d))
    }),

    // ---- EXT: ABC × XYZ inventory classification ----
    "q321_abc_xyz" -> ((s, dir) => {
      // q182's revenue-Pareto ABC crossed with demand-VARIABILITY XYZ:
      // X = steady (CV ≤ 0.5), Y = variable (≤ 1), Z = erratic — the
      // classic stocking-policy matrix. Monthly demand moments are exact
      // decimals (q152 discipline); the ABC cut runs on the revenue
      // distribution table with integer cumulative shares (ties can't
      // straddle engines); CV thresholds compare the 6-dp ROUNDED value.
      import org.apache.spark.sql.expressions.Window
      val monthly = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"),
          date_trunc("month", col("l_shipdate")).as("__m"))
        .agg(sum(col("l_quantity").cast(D)).as("__q"))
      val stats = monthly.groupBy(col("l_partkey")).agg(
          count(lit(1)).as("__nm"),
          sum(col("__q")).as("__sq"),
          sum(col("__q").cast("decimal(28,2)") * col("__q")).as("__sqq"))
        .filter(col("__nm") > 1)
        .withColumn("__mean",
          col("__sq").cast("double") / col("__nm").cast("double"))
        .withColumn("__sd", sqrt(
          (col("__nm").cast("double") * col("__sqq").cast("double") -
            col("__sq").cast("double") * col("__sq").cast("double")) /
            (col("__nm").cast("double") * (col("__nm").cast("double") - 1.0d))))
        .withColumn("cv", round(col("__sd") / col("__mean"), 6) + lit(0.0d))
      val rev = Tables.lineitem(s, dir).groupBy(col("l_partkey"))
        .agg(sum(col("l_extendedprice").cast(D)).as("__rev"))
      val wc = Window.orderBy(col("__rev").desc, col("l_partkey").asc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val tot = rev.agg(sum(col("__rev")).as("__tot"))
      // integer-exact Pareto cut: cum·100 ≤ tot·80 → A, ≤ 95 → B, else C
      val abc = rev.withColumn("__cum", sum(col("__rev")).over(wc))
        .crossJoin(broadcast(tot))
        .withColumn("abc_class",
          when(col("__cum") * 100 <= col("__tot") * 80, "A")
            .when(col("__cum") * 100 <= col("__tot") * 95, "B")
            .otherwise("C"))
      abc.join(stats, Seq("l_partkey"))
        .withColumn("xyz_class",
          when(col("cv") <= 0.5, "X").when(col("cv") <= 1.0, "Y")
            .otherwise("Z"))
        .groupBy(col("abc_class"), col("xyz_class"))
        .agg(count(lit(1)).as("n_parts"),
          (round(sum(col("__rev")).cast("double"), 2) + lit(0.0d))
            .as("revenue"))
    }),

    // ---- EXT: log-log price elasticity per product type ----
    "q322_price_elasticity" -> ((s, dir) => {
      // elasticity = d ln(qty) / d ln(unit price), the OLS slope in log
      // space per product type — the q288 Zipf discipline (rounded-ln
      // decimal moments, closed-form slope) applied to the pricing read.
      val d = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .filter(col("l_quantity") > 0 && col("l_extendedprice") > 0)
        .select(col("p_type"),
          round(log(col("l_quantity")), 6).cast("decimal(18,6)").as("__y"),
          round(log(col("l_extendedprice") / col("l_quantity")), 6)
            .cast("decimal(18,6)").as("__x"))
      val m = d.groupBy(col("p_type")).agg(
        count(lit(1)).as("n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      m.withColumn("__det",
          col("n").cast("double") * col("__sxx").cast("double") -
            col("__sx").cast("double") * col("__sx").cast("double"))
        .filter(col("__det") > 0)
        .select(col("p_type"), col("n"),
          (round((col("n").cast("double") * col("__sxy").cast("double") -
            col("__sx").cast("double") * col("__sy").cast("double")) /
            col("__det"), 6) + lit(0.0d)).as("elasticity"))
    }),

    // ---- EXT: partial correlation (confounder-adjusted association) ----
    "q323_partial_corr" -> ((s, dir) => {
      // r_xy·z = (r_xy − r_xz·r_zy)/√((1−r_xz²)(1−r_zy²)): does value
      // correlate with hour AFTER controlling for weekday — the
      // first-order causal hygiene step q152's raw correlation skips.
      // All three pairwise r's come from ONE exact-decimal moment
      // aggregate; the adjustment is a single mirrored double expression.
      val t = Tables.events(s, dir).select(col("event_type"),
        col("value").cast(D).as("__x"),
        hour(col("ts")).cast("decimal(18,2)").as("__y"),
        weekday(col("ts")).cast("decimal(18,2)").as("__z"))
      val m = t.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__z")).as("__sz"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__z")).as("__sxz"),
        sum(col("__y") * col("__z")).as("__syz"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"),
        sum(col("__z") * col("__z")).as("__szz"))
      def nd(c: String) = col(c).cast("double")
      def r(sab: String, sa: String, sb: String, saa: String, sbb: String) =
        (nd("n") * nd(sab) - nd(sa) * nd(sb)) /
          sqrt((nd("n") * nd(saa) - nd(sa) * nd(sa)) *
            (nd("n") * nd(sbb) - nd(sb) * nd(sb)))
      m.withColumn("__rxy", r("__sxy", "__sx", "__sy", "__sxx", "__syy"))
        .withColumn("__rxz", r("__sxz", "__sx", "__sz", "__sxx", "__szz"))
        .withColumn("__rzy", r("__syz", "__sz", "__sy", "__szz", "__syy"))
        .filter(abs(col("__rxz")) < 1 && abs(col("__rzy")) < 1)
        .select(col("event_type"), col("n"),
          (round(col("__rxy"), 6) + lit(0.0d)).as("r_xy"),
          (round((col("__rxy") - col("__rxz") * col("__rzy")) /
            sqrt((lit(1.0d) - col("__rxz") * col("__rxz")) *
              (lit(1.0d) - col("__rzy") * col("__rzy"))), 6) + lit(0.0d))
            .as("r_xy_given_z"))
    }),

    // ---- EXT: cohort LTV curve (cumulative revenue by month offset) ----
    "q324_ltv_curve" -> ((s, dir) => {
      // q123's retention matrix in MONEY: users cohorted by first-seen
      // month; per (cohort, month offset) the cumulative per-cohort
      // revenue and its per-user normalization — the payback-period
      // curve. The cumulative window runs over the bounded cohort×offset
      // grid, never event rows.
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, dir).select(col("user_id"), col("ts"),
        col("value").cast(D).as("__v"))
      val first = e.groupBy(col("user_id"))
        .agg(date_trunc("month", min(col("ts"))).as("__cohort"))
      val sizes = first.groupBy(col("__cohort"))
        .agg(countDistinct(col("user_id")).as("n_users"))
      val cell = e.join(first, Seq("user_id"))
        .withColumn("__offset",
          (months_between(date_trunc("month", col("ts")), col("__cohort")))
            .cast("int"))
        .groupBy(col("__cohort"), col("__offset"))
        .agg(sum(col("__v")).as("__rev"))
      val w = Window.partitionBy(col("__cohort")).orderBy(col("__offset"))
        .rowsBetween(Window.unboundedPreceding, 0)
      cell.withColumn("__cum", sum(col("__rev")).over(w))
        .join(sizes, Seq("__cohort"))
        .select(to_date(col("__cohort")).as("cohort"),
          col("__offset").as("month_offset"), col("n_users"),
          (round(col("__cum").cast("double"), 2) + lit(0.0d))
            .as("cum_revenue"),
          (round(col("__cum").cast("double") /
            col("n_users").cast("double"), 2) + lit(0.0d))
            .as("cum_ltv_per_user"))
    }),

    // ---- EXT: keyword-in-context concordance ----
    "q325_kwic" -> ((s, dir) => {
      // every occurrence of the probe term with its ±2-token window — the
      // corpus-inspection primitive behind annotation review and filter
      // debugging ("what does 'spark' actually look like in context").
      // Pure per-row explode; the context slice is clamped array algebra.
      val toks = TextOps.tokens(col("text"))
      Tables.documents(s, dir)
        .select(col("doc_id"), toks.as("__w"))
        .select(col("doc_id"), col("__w"),
          posexplode(col("__w")).as(Seq("__p0", "__t")))
        .filter(col("__t") === "spark")
        .withColumn("pos", (col("__p0") + 1).cast("int"))
        .withColumn("__start", greatest(lit(1), col("pos") - 2))
        .withColumn("__end", least(size(col("__w")), col("pos") + 2))
        .select(col("doc_id"), col("pos"),
          array_join(slice(col("__w"), col("__start"),
            col("__end") - col("__start") + 1), " ").as("context"))
    }),

    // ---- EXT: HITS hubs & authorities on the buyer→supplier graph ----
    "q327_hits" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      val edges = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      graft.operators.Graph.hits(edges, iters = 3)
    }),

    // ---- EXT: revenue bridge (volume / rate / mix decomposition) ----
    "q328_revenue_bridge" -> ((s, dir) => {
      // "WHY did revenue move 1996→1997": per segment the exact
      // ΔR = Δn·aov_A + n_A·Δaov + Δn·Δaov decomposition (volume, rate,
      // cross) — the waterfall q285's direct standardization only hints
      // at. Counts and revenue are exact; the three effects are mirrored
      // double expressions that reconcile to ΔR by construction.
      def yearAgg(y: Int, nc: String, rc: String) =
        Tables.orders(s, dir)
          .filter(year(col("o_orderdate")) === y)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as(nc),
            sum(col("o_totalprice").cast(D)).as(rc))
      val j = yearAgg(1996, "n_a", "__ra").join(
        yearAgg(1997, "n_b", "__rb"), Seq("o_orderpriority"))
      def aov(r: String, n: String) = col(r).cast("double") / col(n).cast("double")
      j.filter(col("n_a") > 0 && col("n_b") > 0)
        .withColumn("__aova", aov("__ra", "n_a"))
        .withColumn("__aovb", aov("__rb", "n_b"))
        .select(col("o_orderpriority"), col("n_a"), col("n_b"),
          (round(col("__ra").cast("double"), 2) + lit(0.0d)).as("rev_a"),
          (round(col("__rb").cast("double"), 2) + lit(0.0d)).as("rev_b"),
          (round((col("n_b") - col("n_a")).cast("double") * col("__aova"), 2)
            + lit(0.0d)).as("volume_effect"),
          (round(col("n_a").cast("double") * (col("__aovb") - col("__aova")), 2)
            + lit(0.0d)).as("rate_effect"),
          (round((col("n_b") - col("n_a")).cast("double") *
            (col("__aovb") - col("__aova")), 2) + lit(0.0d)).as("cross_effect"))
    }),

    // ---- EXT: Qini uplift curve by score decile ----
    "q329_qini_uplift" -> ((s, dir) => {
      // causal ranking evaluation: does targeting high-value events move
      // the PURCHASE rate differently in treatment (odd users) vs control
      // — the uplift sibling of q280's lift table and q234's AUC. Deciles
      // assign at the DISTINCT-score grain (q280's integer algebra, ties
      // can't straddle engines); Qini(k) = convT − convC·NT/NC cumulative,
      // exact integers until the final doubles.
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, dir).select(col("value").as("__s"),
        (col("user_id") % 2 === 1).cast("int").as("__t"),
        (col("event_type") === "purchase").cast("long").as("__y"))
      val dist = e.groupBy(col("__s")).agg(count(lit(1)).as("__c"))
      val tot = dist.agg(sum(col("__c")).as("__n"))
      val wd = Window.orderBy(col("__s").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val dec = dist.withColumn("__cum", sum(col("__c")).over(wd))
        .crossJoin(broadcast(tot))
        .withColumn("decile",
          expr("cast((__cum - __c) * 10 div __n as int) + 1"))
        .select(col("__s"), col("decile"))
      val cell = e.join(dec, Seq("__s"))
        .groupBy(col("decile")).agg(
          sum(col("__t")).as("__nt"),
          sum(lit(1) - col("__t")).as("__nc"),
          sum(col("__y") * col("__t")).as("__ct"),
          sum(col("__y") * (lit(1) - col("__t"))).as("__cc"))
      val wc = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, 0)
      cell
        .withColumn("__cnt", sum(col("__nt")).over(wc))
        .withColumn("__cnc", sum(col("__nc")).over(wc))
        .withColumn("__cct", sum(col("__ct")).over(wc))
        .withColumn("__ccc", sum(col("__cc")).over(wc))
        .select(col("decile"),
          col("__nt").as("n_treat"), col("__nc").as("n_control"),
          (round(col("__ct").cast("double") / col("__nt").cast("double") -
            col("__cc").cast("double") / col("__nc").cast("double"), 6)
            + lit(0.0d)).as("uplift"),
          (round(col("__cct").cast("double") -
            col("__ccc").cast("double") * col("__cnt").cast("double") /
              col("__cnc").cast("double"), 6) + lit(0.0d)).as("qini"))
    }),

    // ---- EXT: consistent-hash ring rebalance audit ----
    "q330_consistent_hash" -> ((s, dir) => {
      // the partition-rebalance math of every distributed store: 16 nodes
      // × 4 virtual points on an md5 ring; a key belongs to the first
      // point clockwise. Removing one node must move ONLY that node's
      // keys (~1/16) — the audit counts per-node keys before/after and
      // the churn, all md5-deterministic and oracle-mirrored.
      import graft.operators.Sketches.kmvHash
      val vn = (for (n <- 0 until 16; v <- 0 until 4) yield (n, v))
        .toList
      val vnodes = s.createDataFrame(vn).toDF("node", "vp")
        .withColumn("__pos",
          kmvHash(concat(lit("node:"), col("node"), lit(":"), col("vp"))))
        .select(col("node"), col("__pos"))
      val keys = Tables.events(s, dir).select(col("user_id")).distinct()
        .withColumn("__kpos", kmvHash(concat(lit("key:"), col("user_id"))))
      def assign(vns: DataFrame, out: String): DataFrame = {
        val wrapRow = vns.agg(min(col("__pos")).as("__minpos"))
        val wrapNode = vns.join(broadcast(wrapRow),
          col("__pos") === col("__minpos")).select(
          col("node").as("__wrapnode"), col("__minpos"))
        val best = keys.join(broadcast(vns), col("__pos") >= col("__kpos"))
          .groupBy(col("user_id"), col("__kpos"))
          .agg(min(col("__pos")).as("__bestpos"))
        keys.join(best, Seq("user_id", "__kpos"), "left")
          .join(broadcast(vns.withColumnRenamed("node", "__bn")),
            col("__bestpos") === col("__pos"), "left")
          .crossJoin(broadcast(wrapNode))
          .select(col("user_id"),
            coalesce(col("__bn"), col("__wrapnode")).as(out))
      }
      val before = assign(vnodes, "node_before")
      val after = assign(vnodes.filter(col("node") =!= 7), "node_after")
      val moved = before.join(after, Seq("user_id"))
      moved.groupBy(col("node_after").as("node"))
        .agg(count(lit(1)).as("n_after"),
          sum((col("node_before") =!= col("node_after")).cast("long"))
            .as("n_gained"))
        .join(before.groupBy(col("node_before").as("node"))
          .agg(count(lit(1)).as("n_before")), Seq("node"), "full")
        .select(col("node"),
          coalesce(col("n_before"), lit(0L)).as("n_before"),
          coalesce(col("n_after"), lit(0L)).as("n_after"),
          coalesce(col("n_gained"), lit(0L)).as("n_gained"))
    }),

    // ---- EXT: mass significance testing with BH-FDR control ----
    "q331_bh_fdr" -> ((s, dir) => {
      // 35 simultaneous two-sample z-tests (each (type, weekday) cell's
      // mean value vs the rest) with Benjamini–Hochberg step-up control —
      // the multiple-comparisons hygiene every metrics platform needs
      // before flagging "significant" cells. Moments are exact decimals
      // (q152); the normal tail probability is the Abramowitz–Stegun
      // 26.2.17 polynomial written EXPLICITLY (identical expression both
      // engines — no libm erf); BH compares the 9-dp-rounded p to rank/m·α
      // in integer-scaled algebra.
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, dir).select(col("event_type"),
        weekday(col("ts")).cast("int").as("dow"),
        col("value").cast(D).as("__v"))
      val cell = e.groupBy(col("event_type"), col("dow")).agg(
        count(lit(1)).as("__nc"), sum(col("__v")).as("__sc"),
        sum(col("__v") * col("__v")).as("__qc"))
      val tot = e.agg(count(lit(1)).as("__nt"), sum(col("__v")).as("__st"),
        sum(col("__v") * col("__v")).as("__qt"))
      val z = cell.crossJoin(broadcast(tot))
        .withColumn("__nr", col("__nt") - col("__nc"))
        .withColumn("__sr", col("__st") - col("__sc"))
        .withColumn("__qr", col("__qt") - col("__qc"))
        .filter(col("__nc") > 1 && col("__nr") > 1)
        .withColumn("__mc", col("__sc").cast("double") / col("__nc").cast("double"))
        .withColumn("__mr", col("__sr").cast("double") / col("__nr").cast("double"))
        .withColumn("__vc",
          (col("__qc").cast("double") - col("__nc").cast("double") *
            col("__mc") * col("__mc")) / (col("__nc").cast("double") - 1.0d))
        .withColumn("__vr",
          (col("__qr").cast("double") - col("__nr").cast("double") *
            col("__mr") * col("__mr")) / (col("__nr").cast("double") - 1.0d))
        .withColumn("__z", (col("__mc") - col("__mr")) /
          sqrt(col("__vc") / col("__nc").cast("double") +
            col("__vr") / col("__nr").cast("double")))
      // two-sided p from |z| via Abramowitz–Stegun 26.2.17
      val az = abs(col("__z"))
      val t = lit(1.0d) / (lit(1.0d) + lit(0.2316419d) * az)
      val poly = t * (lit(0.319381530d) + t * (lit(-0.356563782d) +
        t * (lit(1.781477937d) + t * (lit(-1.821255978d) +
          t * lit(1.330274429d)))))
      val phi = exp(-az * az / 2.0d) / lit(2.5066282746310002d)
      val p2 = round(lit(2.0d) * phi * poly, 9)
      val withP = z.withColumn("p", p2 + lit(0.0d))
      val wr = Window.orderBy(col("p").asc, col("event_type").asc,
        col("dow").asc)
      val wAllRows = Window.orderBy(lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      withP.withColumn("__rank", row_number().over(wr))
        .withColumn("__m", count(lit(1)).over(wAllRows))
        // BH step-up at α = 0.05 in integer-scaled algebra
        // (p·m·100 ≤ rank·5), then the closure: everything at or below
        // the LARGEST passing rank is significant
        .withColumn("__pass",
          when(col("p") * col("__m").cast("double") * 100.0d <=
            col("__rank").cast("double") * 5.0d, col("__rank")))
        .withColumn("__kmax", max(col("__pass")).over(wAllRows))
        .select(col("event_type"), col("dow"),
          (round(col("__z"), 6) + lit(0.0d)).as("z"), col("p"),
          col("__rank").as("p_rank"),
          (col("__rank") <= coalesce(col("__kmax"), lit(0))).cast("int")
            .as("significant"))
    }),

    // ---- EXT: absorbing-chain conversion probability ----
    "q332_absorption" -> ((s, dir) => {
      // q142's transition matrix turned into the product question it
      // exists for: from each transient state, the probability of
      // reaching 'purchase' before 'error' — x = Qx + b solved by 20
      // lockstep value-iteration rounds over the 5-state chain (the
      // corpus pass is the transition aggregate; the 25-entry chain is a
      // bounded model fit, the kmeans/PQ collect precedent). Terms are
      // rounded to 12 dp then exactly summed each round; transition
      // probabilities carry q142's 6-dp contract.
      import org.apache.spark.sql.expressions.Window
      val wl = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val trans = Tables.events(s, dir)
        .withColumn("__next", lead(col("event_type"), 1).over(wl))
        .filter(col("__next").isNotNull)
        .groupBy(col("event_type").as("__from"), col("__next").as("__to"))
        .agg(count(lit(1)).as("__n"))
      val withP = trans
        .withColumn("__tot", sum(col("__n")).over(
          Window.partitionBy(col("__from"))))
        .withColumn("__p",
          round(col("__n").cast("double") / col("__tot").cast("double"), 6))
        .select(col("__from"), col("__to"), col("__p"))
      val chain = withP.collect()
        .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
      val absorbing = Map("purchase" -> 1.0, "error" -> 0.0)
      val states = chain.keys.map(_._1).toSeq.distinct.sorted
      val transient = states.filterNot(absorbing.contains)
      def r12(x: Double): Double =
        BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      var x: Map[String, Double] =
        (transient.map(_ -> 0.0) ++ absorbing.toSeq).toMap
      (1 to 20).foreach { _ =>
        val next = transient.map { st =>
          val terms = states.flatMap(t => chain.get((st, t))
            .map(p => BigDecimal(r12(p * x(t)))))
          st -> (if (terms.isEmpty) 0.0 else terms.sum.toDouble)
        }.toMap
        x = next ++ absorbing
      }
      val rows = transient.map(st => (st, r12(x(st))))
      val spark = s
      import spark.implicits._
      rows.toDF("event_type", "__x")
        .select(col("event_type"),
          (round(col("__x"), 6) + lit(0.0d)).as("p_convert_before_error"))
    }),

    // ---- EXT: Jain's fairness index of per-user load ----
    "q333_jain_fairness" -> ((s, dir) =>
      // J = (Σc)²/(n·Σc²) ∈ (1/n, 1]: 1 = perfectly even per-user event
      // load, →1/n = one user dominates — the quota-health scalar behind
      // q260's skew profile, from exact integer moments
      Tables.events(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("__c")).as("__s"),
          sum(col("__c") * col("__c")).as("__q"))
        .select(col("event_type"), col("n_users"),
          (round(col("__s").cast("double") * col("__s").cast("double") /
            (col("n_users").cast("double") * col("__q").cast("double")), 6)
            + lit(0.0d)).as("jain_index"))),

    // ---- EXT: 3-D skyline (Pareto-optimal suppliers) ----
    "q334_skyline3d" -> ((s, dir) => {
      // q159's 2-D frontier in three objectives: maximize revenue,
      // maximize breadth (distinct parts), MINIMIZE mean ship delay — a
      // supplier survives unless someone is at least as good on all three
      // and strictly better on one. Metrics come off the corpus in one
      // hash aggregate to the SUPPLIER grain (dimension-bounded, so the
      // pairwise dominance test is a broadcast non-equi self-join over a
      // design-sized table — the legitimate place for one). Delay
      // compares at the exact integer-sum grain (cross-multiplied, no
      // division) so dominance can't flip on a rounded mean.
      val m = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_extendedprice").cast(D)).as("__rev"),
          countDistinct(col("l_partkey")).as("n_parts"),
          sum(datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
            .cast("long")).as("__dsum"),
          count(lit(1)).as("__dn"))
      val a = m.select(col("l_suppkey").as("sk"), col("__rev").as("ra"),
        col("n_parts").as("pa"), col("__dsum").as("sa"), col("__dn").as("na"))
      val b = m.select(col("l_suppkey").as("sk_b"), col("__rev").as("rb"),
        col("n_parts").as("pb"), col("__dsum").as("sb"), col("__dn").as("nb"))
      // b dominates a: rb ≥ ra, pb ≥ pa, delay_b ≤ delay_a (sb·na ≤ sa·nb),
      // and strict somewhere
      val dominated = a.join(broadcast(b),
        col("sk") =!= col("sk_b") &&
          col("rb") >= col("ra") && col("pb") >= col("pa") &&
          col("sb") * col("na") <= col("sa") * col("nb") &&
          (col("rb") > col("ra") || col("pb") > col("pa") ||
            col("sb") * col("na") < col("sa") * col("nb")),
        "left_semi")
      a.join(dominated.select(col("sk")), Seq("sk"), "left_anti")
        .select(col("sk").as("s_suppkey"),
          (round(col("ra").cast("double"), 2) + lit(0.0d)).as("revenue"),
          col("pa").as("n_parts"),
          (round(col("sa").cast("double") / col("na").cast("double"), 6)
            + lit(0.0d)).as("mean_ship_delay_days"))
    }),

    // ---- EXT: SPRT always-valid sequential test per user ----
    "q335_sprt" -> ((s, dir) => {
      // Wald's sequential probability ratio test replayed over each
      // user's event stream: is the user's error rate 0.2 (H0) or 0.4
      // (H1)? Each event adds a CONSTANT log-likelihood term (error:
      // ln(0.4/0.2), other: ln(0.6/0.8), both 6-dp literals), so the
      // cumulative LLR is an exact decimal prefix sum; the decision fires
      // at the FIRST crossing of ±ln(19) (α = β = 0.05) — the always-
      // valid monitoring shape that fixed-horizon tests (q206) can't
      // give. One key-partitioned window + one hash aggregate.
      import org.apache.spark.sql.expressions.Window
      val up = 2.944439d // round(ln(19), 6)
      val aTerm = 0.693147d // round(ln(0.4/0.2), 6)
      val bTerm = -0.287682d // round(ln(0.6/0.8), 6)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val llr = Tables.events(s, dir)
        .withColumn("__t",
          when(col("event_type") === "error", lit(aTerm)).otherwise(lit(bTerm))
            .cast("decimal(18,6)"))
        .withColumn("__cum", sum(col("__t")).over(w))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
      llr.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          (round(sum(col("__t")).cast("double"), 6) + lit(0.0d))
            .as("llr_final"),
          min(when(col("__cum").cast("double") >= up, col("__rn")))
            .as("__hit1"),
          min(when(col("__cum").cast("double") <= -up, col("__rn")))
            .as("__hit0"))
        .withColumn("decision",
          when(col("__hit1").isNotNull &&
            (col("__hit0").isNull || col("__hit1") < col("__hit0")),
            "accept_h1")
            .when(col("__hit0").isNotNull, "accept_h0")
            .otherwise("continue"))
        .withColumn("decided_at_event",
          coalesce(least(col("__hit1"), col("__hit0")),
            col("__hit1"), col("__hit0"), lit(0)).cast("long"))
        .select(col("user_id"), col("n_events"), col("llr_final"),
          col("decision"), col("decided_at_event"))
    }),

    // ---- EXT: classical seasonal indices (ratio-to-moving-average) ----
    "q336_seasonal_indices" -> ((s, dir) => {
      // the pre-STL decomposition every demand planner still uses: a
      // centered 12-month moving average is the trend; each month's
      // revenue/trend ratio, averaged per calendar month, is its seasonal
      // index. Windows run over the bounded monthly series (the q286
      // discipline); ratios are rounded then decimal-averaged.
      import org.apache.spark.sql.expressions.Window
      val monthly = Tables.orders(s, dir)
        .groupBy(date_trunc("month", col("o_orderdate")).as("__m"))
        .agg(sum(col("o_totalprice").cast(D)).as("__rev"))
      val wOrd = Window.orderBy(col("__m"))
      val seq = monthly.withColumn("__i", row_number().over(wOrd))
      val wMa = Window.orderBy(col("__i")).rowsBetween(-6, 5)
      val wCnt = Window.orderBy(col("__i")).rowsBetween(-6, 5)
      val withTrend = seq
        .withColumn("__cnt", count(lit(1)).over(wCnt))
        .withColumn("__masum", sum(col("__rev")).over(wMa))
        // only FULL 12-month windows define a trend point
        .filter(col("__cnt") === 12)
        .withColumn("__trend",
          col("__masum").cast("double") / 12.0d)
        .withColumn("__ratio",
          round(col("__rev").cast("double") / col("__trend"), 6)
            .cast("decimal(18,6)"))
      withTrend
        .groupBy(month(col("__m")).as("month_of_year"))
        .agg(count(lit(1)).as("n_years"),
          (round(sum(col("__ratio")).cast("double") /
            count(lit(1)).cast("double"), 6) + lit(0.0d))
            .as("seasonal_index"))
    }),

    // ---- EXT: accounts-receivable aging buckets ----
    "q337_ar_aging" -> ((s, dir) => {
      // open receivables ('O' status) aged against the ledger's horizon
      // (max order date, a 1-row broadcast): the 0-30/31-60/61-90/90+
      // buckets every finance close runs; exact integer day diffs, exact
      // decimal totals
      val o = Tables.orders(s, dir)
      val horizon = o.agg(max(to_date(col("o_orderdate"))).as("__h"))
      o.filter(col("o_orderstatus") === "O")
        .crossJoin(broadcast(horizon))
        .withColumn("__age", datediff(col("__h"), to_date(col("o_orderdate"))))
        .withColumn("age_bucket",
          when(col("__age") <= 30, "0-30")
            .when(col("__age") <= 60, "31-60")
            .when(col("__age") <= 90, "61-90")
            .otherwise("90+"))
        .groupBy(col("o_orderpriority"), col("age_bucket"))
        .agg(count(lit(1)).as("n_open"),
          (round(sum(col("o_totalprice").cast(D)).cast("double"), 2)
            + lit(0.0d)).as("open_amount"))
    }),

    // ---- EXT: duplicate-invoice heuristic (near amount, near date) ----
    "q338_dup_invoices" -> ((s, dir) =>
      // the payables fraud/error screen: two orders from the same
      // customer within 7 days for nearly the same amount (≤ 1000 apart)
      // are suspicious. The self-join blocks on the CUSTOMER key, so the
      // quadratic term is bounded by per-customer order multiplicity
      // (~10), never corpus²; the amount/date predicates are exact double
      // subtraction and integer day diffs — deterministic in both
      // engines.
      Tables.orders(s, dir).select(col("o_custkey"),
          col("o_orderkey").as("k_a"), col("o_totalprice").as("amt_a"),
          to_date(col("o_orderdate")).as("d_a"))
        .join(Tables.orders(s, dir).select(col("o_custkey"),
          col("o_orderkey").as("k_b"), col("o_totalprice").as("amt_b"),
          to_date(col("o_orderdate")).as("d_b")),
          Seq("o_custkey"))
        .filter(col("k_a") < col("k_b") &&
          abs(col("amt_a") - col("amt_b")) <= 1000.0d &&
          abs(datediff(col("d_b"), col("d_a"))) <= 7)
        .select(col("o_custkey"), col("k_a"), col("k_b"),
          (round(col("amt_a"), 2) + lit(0.0d)).as("amount_a"),
          (round(col("amt_b"), 2) + lit(0.0d)).as("amount_b"),
          abs(datediff(col("d_b"), col("d_a"))).cast("int").as("days_apart"))),

    // ---- EXT: content-defined chunking dedup audit ----
    "q326_cdc_chunks" -> ((s, dir) => {
      // Rabin-style content-defined chunk boundaries (native O(n) rolling
      // hash kernel), then the storage-dedup read: how many chunks the
      // corpus stores vs how many are DISTINCT — the rsync/backup
      // property that an edit shifts one chunk, not every block after it.
      val bridge = org.apache.spark.sql.GraftColumnBridge
      val bounds = bridge.column(graft.functions.CdcBounds(
        bridge.expression(col("text"))))
      val chunks = Tables.documents(s, dir)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), col("source"), col("text"),
          bounds.as("__b"))
        .select(col("doc_id"), col("source"), col("text"), col("__b"),
          posexplode(col("__b")).as(Seq("__k", "endp")))
        .withColumn("start",
          when(col("__k") === 0, lit(1))
            .otherwise(element_at(col("__b"), col("__k")) + 1))
        .withColumn("chunk",
          expr("substring(text, start, endp - start + 1)"))
      chunks.groupBy(col("source"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("total_chunks"),
          countDistinct(col("chunk")).as("distinct_chunks"))
        .withColumn("dedup_ratio",
          round(lit(1.0d) - col("distinct_chunks").cast("double") /
            col("total_chunks").cast("double"), 6) + lit(0.0d))
    }),

    // ---- EXT: join-cardinality estimator audit (optimizer literacy) ----
    "q315_join_card_estimate" -> ((s, dir) => {
      // |R ⋈ R on k| exactly = Σ c(k)² vs the textbook uniform estimate
      // n²/d — the statistic behind every optimizer's join reorder; the
      // ratio IS the key-skew penalty the estimate misses
      val freq = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("__c"))
      freq.agg(
          sum(col("__c")).as("n"),
          count(lit(1)).as("n_distinct_keys"),
          sum(col("__c").cast("decimal(38,0)") * col("__c")).as("__exact"))
        .select(col("n"), col("n_distinct_keys"),
          col("__exact").cast("long").as("exact_pairs"),
          (round(col("n").cast("double") * col("n").cast("double") /
            col("n_distinct_keys").cast("double"), 2) + lit(0.0d))
            .as("est_pairs"),
          (round(col("__exact").cast("double") /
            (col("n").cast("double") * col("n").cast("double") /
              col("n_distinct_keys").cast("double")), 6) + lit(0.0d))
            .as("skew_ratio"))
    }),

    // ---- EXT: Holt linear (double-exponential) smoothing ----
    "q339_holt_smoothing" -> ((s, dir) => {
      // level+trend exponential smoothing (alpha=0.3, beta=0.2) over the
      // bounded monthly revenue series — the short-horizon forecaster
      // complementing q336's seasonal decomposition and q48's EWMA. The
      // corpus pass is ONE monthly aggregate; the ~80-row recursion is a
      // bounded model fit (the q332 collect precedent) with every step
      // rounded to 6 dp so it is lockstep-identical to the oracle's
      // recursive CTE.
      val monthly = Tables.orders(s, dir)
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
          .as("month"))
        .agg(sum(col("o_totalprice").cast(D)).cast("double").as("__y"))
      graft.operators.Analyses
        .holtSmooth(monthly, "month", "__y", alpha = 0.3, beta = 0.2)
        .select(col("month"),
          (round(col("__y"), 2) + lit(0.0d)).as("revenue"),
          (col("smooth_level") + lit(0.0d)).as("smooth_level"),
          (col("smooth_trend") + lit(0.0d)).as("smooth_trend"),
          (col("forecast_next") + lit(0.0d)).as("forecast_next"))
    }),

    // ---- EXT: Lorenz concentration curve (value-binned) ----
    "q340_lorenz_curve" -> ((s, dir) => {
      // the Lorenz curve behind the suite's Gini gates, on a VALUE-BINNED
      // grid ($10k bins of exact integer cents): the corpus pass is one
      // per-customer aggregate + one per-bin aggregate; the cumulative
      // curve runs over the BOUNDED bin table (q336's bounded-series
      // window discipline) — never a global sort of the customer grain,
      // which is the formulation that survives 100 TB.
      import org.apache.spark.sql.expressions.Window
      val spend = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(D)).as("__s"))
        .withColumn("__cents", (col("__s") * lit(100)).cast("bigint"))
      val binned = spend
        .withColumn("spend_bin", expr("__cents div 1000000"))
        .groupBy(col("spend_bin"))
        .agg(count(lit(1)).as("n_customers"), sum(col("__s")).as("__bs"))
      val tot = binned.agg(sum(col("n_customers")).as("__tn"),
        sum(col("__bs")).as("__ts"))
      val wc = Window.orderBy(col("spend_bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      binned
        .withColumn("cum_customers", sum(col("n_customers")).over(wc))
        .withColumn("__cs", sum(col("__bs")).over(wc))
        .crossJoin(broadcast(tot))
        .select(col("spend_bin"), col("n_customers"), col("cum_customers"),
          (round(col("cum_customers").cast("double") /
            col("__tn").cast("double"), 6) + lit(0.0d))
            .as("cum_pop_share"),
          (round(col("__cs").cast("double") /
            col("__ts").cast("double"), 6) + lit(0.0d))
            .as("cum_rev_share"))
    }),

    // ---- EXT: CUSUM changepoint localization per stream ----
    "q341_changepoint" -> ((s, dir) => {
      // where did the level shift? per event stream, the day t maximizing
      // |S_t·n − t·T| — the integer-scaled CUSUM deviation from a flat
      // mean, EXACT cents algebra with no rounding until output (q335's
      // prefix-sum discipline turned from monitoring into localization).
      // Windows are key-partitioned on event_type; the split must leave
      // both halves non-empty (t < n); ties break to the earliest day.
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), col("ts").cast("date").as("d"))
        .agg(sum((col("value").cast(D) * lit(100)).cast("bigint"))
          .as("cents"))
      val wOrd = Window.partitionBy(col("event_type")).orderBy(col("d"))
      val wAll = Window.partitionBy(col("event_type"))
      val dev = daily
        .withColumn("t", row_number().over(wOrd).cast("long"))
        .withColumn("s", sum(col("cents")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("tot", sum(col("cents")).over(wAll))
        .filter(col("t") < col("n"))
        .withColumn("dv", abs(col("s") * col("n") - col("t") * col("tot")))
      val wPick = Window.partitionBy(col("event_type"))
        .orderBy(col("dv").desc, col("d"))
      dev.withColumn("__rk", row_number().over(wPick))
        .filter(col("__rk") === 1)
        .select(col("event_type"), col("n").as("n_days"),
          col("d").as("cp_day"),
          (round(col("dv").cast("double") /
            (col("n").cast("double") * lit(100.0d)), 2) + lit(0.0d))
            .as("cusum_peak"),
          (round(col("s").cast("double") /
            (col("t").cast("double") * lit(100.0d)), 6) + lit(0.0d))
            .as("mean_before"),
          (round((col("tot") - col("s")).cast("double") /
            ((col("n") - col("t")).cast("double") * lit(100.0d)), 6)
            + lit(0.0d)).as("mean_after"))
    }),

    // ---- EXT: one-way ANOVA F across priority classes ----
    "q342_anova_f" -> ((s, dir) => {
      // does order value differ across the five priority classes? per
      // status: SSB/SSW from EXACT integer-cents moments (n, S, Q — the
      // Q sum in decimal(38,0), q315's precedent); the per-cell S²/n
      // terms are rounded to 4 dp then EXACTLY summed so the k=5
      // reduction has no float summation-order freedom.
      val cents = (col("o_totalprice").cast(D) * lit(100)).cast("bigint")
      val cell = Tables.orders(s, dir)
        .select(col("o_orderstatus"), col("o_orderpriority"),
          cents.as("__c"))
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("__n"), sum(col("__c")).as("__s"),
          sum(col("__c").cast("decimal(38,0)") * col("__c")).as("__q"))
      val terms = cell.withColumn("__a",
        round(col("__s").cast("double") * col("__s").cast("double") /
          col("__n").cast("double"), 4).cast("decimal(38,4)"))
      val st = terms.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("k_groups"), sum(col("__n")).as("n"),
          sum(col("__s").cast("decimal(38,0)")).as("__st"),
          sum(col("__q")).as("__qt"),
          sum(col("__a")).as("__at"))
      st.select(col("o_orderstatus"), col("k_groups"), col("n"),
        (round((col("__at").cast("double") -
          col("__st").cast("double") * col("__st").cast("double") /
            col("n").cast("double")) / lit(10000.0d), 2) + lit(0.0d))
          .as("ss_between"),
        (round((col("__qt").cast("double") - col("__at").cast("double")) /
          lit(10000.0d), 2) + lit(0.0d)).as("ss_within"),
        (round(((col("__at").cast("double") -
          col("__st").cast("double") * col("__st").cast("double") /
            col("n").cast("double")) /
          (col("k_groups") - lit(1)).cast("double")) /
          ((col("__qt").cast("double") - col("__at").cast("double")) /
            (col("n") - col("k_groups")).cast("double")), 6) + lit(0.0d))
          .as("f_stat"))
    }),

    // ---- EXT: Kendall tau-b rank correlation (bounded series) ----
    "q343_kendall_tau" -> ((s, dir) => {
      // Kendall tau-b between monthly revenue and monthly order count —
      // the rank-robust complement to q141's OLS slope and the Spearman
      // gate: concordance counted by EXACT decimal/integer sign
      // comparisons over the bounded-series broadcast self-join (80²
      // pairs); the only float op is the final tie-corrected
      // normalization (IEEE sqrt is correctly rounded — deterministic).
      import org.apache.spark.sql.expressions.Window
      val monthly = Tables.orders(s, dir)
        .groupBy(date_trunc("month", col("o_orderdate")).as("__m"))
        .agg(sum(col("o_totalprice").cast(D)).as("__rev"),
          count(lit(1)).as("__cnt"))
        .withColumn("__i", row_number().over(Window.orderBy(col("__m"))))
      val a = monthly.select(col("__i").as("ia"), col("__rev").as("xa"),
        col("__cnt").as("ya"))
      val b = monthly.select(col("__i").as("ib"), col("__rev").as("xb"),
        col("__cnt").as("yb"))
      val pairs = a.join(broadcast(b), col("ia") < col("ib"))
      val agg = pairs.agg(
        count(lit(1)).as("__n0"),
        sum(when((col("xa") < col("xb") && col("ya") < col("yb")) ||
          (col("xa") > col("xb") && col("ya") > col("yb")), 1L)
          .otherwise(0L)).as("concordant"),
        sum(when((col("xa") < col("xb") && col("ya") > col("yb")) ||
          (col("xa") > col("xb") && col("ya") < col("yb")), 1L)
          .otherwise(0L)).as("discordant"),
        sum(when(col("xa") === col("xb"), 1L).otherwise(0L)).as("tied_x"),
        sum(when(col("ya") === col("yb"), 1L).otherwise(0L)).as("tied_y"))
      val nm = monthly.agg(count(lit(1)).as("n_months"))
      agg.crossJoin(broadcast(nm))
        .select(col("n_months"), col("concordant"), col("discordant"),
          col("tied_x"), col("tied_y"),
          (round((col("concordant") - col("discordant")).cast("double") /
            sqrt((col("__n0") - col("tied_x")).cast("double") *
              (col("__n0") - col("tied_y")).cast("double")), 6)
            + lit(0.0d)).as("tau_b"))
    }),

    // ---- EXT: Levene variance-homogeneity test ----
    "q344_levene" -> ((s, dir) => {
      // the ANOVA precondition q342 assumes, tested: Levene's W across
      // priority classes per status. Stage 1 pins 6-dp group means (a
      // broadcast dimension), the per-row |x − mean| terms are rounded
      // to 6 dp and summed EXACTLY in decimal, and the k=5 reduction
      // reuses q342's rounded-term discipline — no float summation-order
      // freedom anywhere.
      val x = Tables.orders(s, dir)
        .select(col("o_orderstatus"), col("o_orderpriority"),
          col("o_totalprice").cast(D).cast("double").as("__v"))
      val gm = x.groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(round(sum(col("__v").cast(D)).cast("double") /
          count(lit(1)).cast("double"), 6).as("__mg"))
      val z = x.join(broadcast(gm), Seq("o_orderstatus", "o_orderpriority"))
        .withColumn("__z",
          round(abs(col("__v") - col("__mg")), 6).cast("decimal(18,6)"))
      val cell = z.groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("__n"), sum(col("__z")).as("__sz"),
          sum(col("__z").cast("decimal(19,6)") * col("__z")).as("__qz"))
      val terms = cell.withColumn("__a",
        round(col("__sz").cast("double") * col("__sz").cast("double") /
          col("__n").cast("double"), 6).cast("decimal(38,6)"))
      val st = terms.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("k_groups"), sum(col("__n")).as("n"),
          sum(col("__sz")).cast("double").as("__szt"),
          sum(col("__qz")).cast("double").as("__qzt"),
          sum(col("__a")).cast("double").as("__at"))
      st.select(col("o_orderstatus"), col("k_groups"), col("n"),
        (round(((col("__at") - col("__szt") * col("__szt") /
          col("n").cast("double")) /
          (col("k_groups") - lit(1)).cast("double")) /
          ((col("__qzt") - col("__at")) /
            (col("n") - col("k_groups")).cast("double")), 6) + lit(0.0d))
          .as("w_stat"))
    }),

    // ---- EXT: phonetic blocking key (record-linkage pass) ----
    "q345_phonetic_blocking" -> ((s, dir) => {
      // soundex-style phonetic blocking over the corpus vocabulary
      // (part names + document text): the record-linkage blocking pass
      // that puts "red"/"rod" in one candidate bucket before q251's
      // verify stage. The code is an EXPLICIT shared regexp chain
      // (consonant classes → digits, run-collapse, vowel drop) written
      // identically in both engines — RE2 has no backreferences, so runs
      // collapse one digit class at a time; Java and RE2 agree on every
      // pattern used.
      val words = Tables.part(s, dir)
        .select(explode(split(col("p_name"), " ")).as("word"))
        .union(Tables.documents(s, dir)
          .select(explode(split(col("text"), " ")).as("word")))
        .select(lower(col("word")).as("word"))
        .filter(col("word").rlike("^[a-z]+$"))
        .groupBy(col("word")).agg(count(lit(1)).as("occ"))
      words
        .withColumn("code", TextOps.phoneticKey(col("word")))
        .groupBy(col("code"))
        .agg(count(lit(1)).as("n_distinct_words"),
          sum(col("occ")).as("n_occurrences"),
          min(col("word")).as("example_a"),
          max(col("word")).as("example_b"))
        .withColumn("is_block_collision", col("n_distinct_words") > 1)
    }),

    // ---- EXT: Laspeyres / Paasche / Fisher price indices ----
    "q346_price_index" -> ((s, dir) => {
      // the economics of the fact table: per year vs the base year, the
      // fixed-basket (Laspeyres), current-basket (Paasche) and geometric-
      // mean (Fisher) price indices over the common part set. Unit prices
      // are pinned to 6-dp decimals, so every Σp·q is an EXACT decimal
      // sum; the base-year basket is a part-dimension broadcast.
      val py = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("o_orderdate")).cast("int").as("yr"),
          col("l_partkey"))
        .agg(sum(col("l_quantity").cast(D)).as("__q"),
          sum(col("l_extendedprice").cast(D)).as("__e"))
        .withColumn("__p",
          round(col("__e").cast("double") / col("__q").cast("double"), 6)
            .cast("decimal(19,6)"))
      val y0 = py.agg(min(col("yr")).as("__y0"))
      val base = py.crossJoin(broadcast(y0))
        .filter(col("yr") === col("__y0"))
        .select(col("l_partkey"), col("__q").as("__q0"),
          col("__p").as("__p0"))
      py.join(broadcast(base), Seq("l_partkey"))
        .groupBy(col("yr"))
        .agg(count(lit(1)).as("n_common_parts"),
          sum(col("__p") * col("__q0")).as("__pq0"),
          sum(col("__p0") * col("__q0")).as("__p0q0"),
          sum(col("__p") * col("__q")).as("__pq"),
          sum(col("__p0") * col("__q")).as("__p0q"))
        .select(col("yr"), col("n_common_parts"),
          (round(col("__pq0").cast("double") /
            col("__p0q0").cast("double"), 6) + lit(0.0d)).as("laspeyres"),
          (round(col("__pq").cast("double") /
            col("__p0q").cast("double"), 6) + lit(0.0d)).as("paasche"),
          (round(sqrt((col("__pq0").cast("double") /
            col("__p0q0").cast("double")) *
            (col("__pq").cast("double") /
              col("__p0q").cast("double"))), 6) + lit(0.0d)).as("fisher"))
    }),

    // ---- EXT: cross-correlation function (lead/lag between streams) ----
    "q347_cross_correlation" -> ((s, dir) => {
      // does click volume LEAD purchase volume? corr(x_d, y_{d+k}) for
      // k ∈ [−3, 3] over the bounded daily series — exact integer-cents
      // moments per lag (products in decimal(38,0)); one double division
      // per lag at the end.
      val spark = s
      import spark.implicits._
      def daily(t: String, dc: String, vc: String) =
        Tables.events(s, dir).filter(col("event_type") === t)
          .groupBy(col("ts").cast("date").as(dc))
          .agg(sum((col("value").cast(D) * lit(100)).cast("bigint"))
            .as(vc))
      val x = daily("click", "dx", "xv")
      val y = daily("purchase", "dy", "yv")
      val lags = (-3 to 3).toDF("lag")
      val pairs = x.crossJoin(broadcast(lags))
        .join(y, col("dy") === date_add(col("dx"), col("lag")))
      pairs.groupBy(col("lag"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("xv")).as("__sx"), sum(col("yv")).as("__sy"),
          sum(col("xv").cast("decimal(18,0)") *
            col("yv").cast("decimal(19,0)")).as("__sxy"),
          sum(col("xv").cast("decimal(18,0)") *
            col("xv").cast("decimal(19,0)")).as("__sxx"),
          sum(col("yv").cast("decimal(18,0)") *
            col("yv").cast("decimal(19,0)")).as("__syy"))
        .select(col("lag"), col("n_days"),
          (round((col("n_days").cast("double") *
            col("__sxy").cast("double") -
            col("__sx").cast("double") * col("__sy").cast("double")) /
            sqrt((col("n_days").cast("double") *
              col("__sxx").cast("double") -
              col("__sx").cast("double") * col("__sx").cast("double")) *
              (col("n_days").cast("double") *
                col("__syy").cast("double") -
                col("__sy").cast("double") * col("__sy").cast("double"))),
            6) + lit(0.0d)).as("ccf"))
    }),

    // ---- EXT: Hill tail-index estimator ----
    "q348_hill_tail" -> ((s, dir) => {
      // how heavy is the order-value tail? the Hill estimator over the
      // top k=500 order statistics: α̂ = k / Σ ln(x_i/x_min). The top-501
      // selection is a TakeOrderedAndProject (deterministic price-desc,
      // orderkey tiebreak — never a global sort); ln terms are rounded
      // to 9 dp then EXACTLY summed (the q322/q331 libm-boundary
      // discipline).
      import org.apache.spark.sql.expressions.Window
      val top = Tables.orders(s, dir)
        .select(col("o_totalprice").cast(D).as("__v"), col("o_orderkey"))
        .orderBy(col("__v").desc, col("o_orderkey"))
        .limit(501)
      // the 501-row post-limit set is design-bounded: a global window
      // over it is a single-partition window over 501 rows by construction
      val ranked = top.withColumn("__rk", row_number().over(
        Window.orderBy(col("__v").desc, col("o_orderkey"))))
      val thr = ranked.filter(col("__rk") === 501)
        .select(col("__v").cast("double").as("__xmin"))
      ranked.filter(col("__rk") <= 500)
        .crossJoin(broadcast(thr))
        .select(col("__xmin"),
          round(log(col("__v").cast("double") / col("__xmin")), 9)
            .cast("decimal(18,9)").as("__t"))
        .groupBy(col("__xmin"))
        .agg(sum(col("__t")).as("__st"))
        .select(lit(500L).as("k"),
          (round(col("__xmin"), 2) + lit(0.0d)).as("x_min"),
          (round(lit(500.0d) / col("__st").cast("double"), 6) + lit(0.0d))
            .as("hill_alpha"))
    }),

    // ---- EXT: McNemar paired day-over-day activity test ----
    "q349_mcnemar" -> ((s, dir) => {
      // is (user, day) activity symmetric day-over-day? the paired-
      // proportions test on consecutive-day activity: b = active then
      // gone, c = gone then active, χ² = (b−c)²/(b+c). Counts come from
      // EXACT anti/semi self-joins on the distinct activity table — no
      // user×day grid is ever materialized, so the formulation is linear
      // in the activity table at any scale.
      val a = Tables.events(s, dir)
        .select(col("event_type"), col("user_id"),
          col("ts").cast("date").as("d")).distinct()
      val bounds = Tables.events(s, dir)
        .agg(min(col("ts").cast("date")).as("__d0"),
          max(col("ts").cast("date")).as("__d1"))
      val y = a.select(col("event_type").as("__et"),
        col("user_id").as("__u"), col("d").as("__dn"))
      val b = a.crossJoin(broadcast(bounds))
        .filter(col("d") < col("__d1"))
        .join(y, col("__et") === col("event_type") &&
          col("__u") === col("user_id") &&
          col("__dn") === date_add(col("d"), 1), "left_anti")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("active_then_gone"))
      val c = a.crossJoin(broadcast(bounds))
        .filter(col("d") > col("__d0"))
        .join(y, col("__et") === col("event_type") &&
          col("__u") === col("user_id") &&
          col("__dn") === date_sub(col("d"), 1), "left_anti")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("gone_then_active"))
      val both = a
        .join(y, col("__et") === col("event_type") &&
          col("__u") === col("user_id") &&
          col("__dn") === date_add(col("d"), 1), "left_semi")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_both"))
      b.join(c, Seq("event_type")).join(both, Seq("event_type"))
        .select(col("event_type"), col("active_then_gone"),
          col("gone_then_active"), col("n_both"),
          (round(((col("active_then_gone") - col("gone_then_active")) *
            (col("active_then_gone") - col("gone_then_active")))
            .cast("double") /
            (col("active_then_gone") + col("gone_then_active"))
              .cast("double"), 6) + lit(0.0d)).as("chi2_mcnemar"))
    }),

    // ---- EXT: days-sales-outstanding working-capital scalar ----
    "q350_dso" -> ((s, dir) => {
      // the finance close's DSO: open receivables over daily revenue run
      // rate, per priority class — exact decimal totals, one global span
      // broadcast, mirrored double divisions at the end.
      val span = Tables.orders(s, dir)
        .agg((datediff(max(col("o_orderdate").cast("date")),
          min(col("o_orderdate").cast("date"))) + lit(1))
          .cast("long").as("__nd"))
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(sum(when(col("o_orderstatus") === "O",
          col("o_totalprice").cast(D))
          .otherwise(lit(0).cast(D))).as("__ar"),
          sum(col("o_totalprice").cast(D)).as("__rev"))
        .crossJoin(broadcast(span))
        .select(col("o_orderpriority"),
          (round(col("__ar").cast("double"), 2) + lit(0.0d)).as("open_ar"),
          (round(col("__rev").cast("double") / col("__nd").cast("double"),
            2) + lit(0.0d)).as("daily_revenue"),
          (round(col("__ar").cast("double") /
            (col("__rev").cast("double") / col("__nd").cast("double")), 2)
            + lit(0.0d)).as("dso_days"))
    }),

    // ---- EXT: Heaps' law vocabulary growth curve ----
    "q351_heaps_law" -> ((s, dir) => {
      // vocabulary size vs corpus size at ten doc-count checkpoints —
      // the sublinear growth every tokenizer-budget plan assumes. No
      // corpus sort: doc_ids are dense 0..n−1, so checkpoints are pure
      // arithmetic on the count; vocab(k) counts words by their
      // FIRST-occurrence doc (one min-agg), tokens(k) sums per-doc
      // counts — both against the broadcast 10-row checkpoint table.
      val docs = Tables.documents(s, dir)
      val cps = docs.agg(count(lit(1)).as("__n"))
        .select(explode(sequence(lit(1), lit(10))).as("checkpoint"),
          col("__n"))
        .select(col("checkpoint").cast("int").as("checkpoint"),
          expr("(__n * checkpoint) div 10").as("__t"))
      val tok = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
      val fs = tok.groupBy(col("w")).agg(min(col("doc_id")).as("__fd"))
      val dt = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("__c"))
      val v = fs.crossJoin(broadcast(cps))
        .groupBy(col("checkpoint"), col("__t"))
        .agg(sum(when(col("__fd") < col("__t"), 1L).otherwise(0L))
          .as("vocab_size"))
      val tk = dt.crossJoin(broadcast(cps))
        .groupBy(col("checkpoint"))
        .agg(coalesce(sum(when(col("doc_id") < col("__t"), col("__c"))),
          lit(0L)).as("n_tokens_seen"))
      v.join(tk, Seq("checkpoint"))
        .select(col("checkpoint"), col("__t").cast("long").as("n_docs_seen"),
          col("n_tokens_seen"), col("vocab_size"))
    }),

    // ---- EXT: degree assortativity of the purchase graph ----
    "q352_assortativity" -> ((s, dir) => {
      // do high-degree customers buy from high-degree suppliers? Pearson
      // correlation of endpoint degrees over the distinct customer→
      // supplier edge set (q111's graph) — exact integer moments with
      // decimal(38,0) products, one double division at the end.
      val e = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("s2"))
        .distinct()
      val dc = e.groupBy(col("c")).agg(count(lit(1)).as("__x"))
      val ds = e.groupBy(col("s2")).agg(count(lit(1)).as("__y"))
      e.join(dc, Seq("c")).join(ds, Seq("s2"))
        .agg(count(lit(1)).as("n_edges"),
          sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
          sum(col("__x").cast("decimal(18,0)") *
            col("__y").cast("decimal(19,0)")).as("__sxy"),
          sum(col("__x").cast("decimal(18,0)") *
            col("__x").cast("decimal(19,0)")).as("__sxx"),
          sum(col("__y").cast("decimal(18,0)") *
            col("__y").cast("decimal(19,0)")).as("__syy"))
        .select(col("n_edges"),
          (round(col("__sx").cast("double") /
            col("n_edges").cast("double"), 6) + lit(0.0d))
            .as("mean_deg_cust"),
          (round(col("__sy").cast("double") /
            col("n_edges").cast("double"), 6) + lit(0.0d))
            .as("mean_deg_supp"),
          (round((col("n_edges").cast("double") *
            col("__sxy").cast("double") -
            col("__sx").cast("double") * col("__sy").cast("double")) /
            sqrt((col("n_edges").cast("double") *
              col("__sxx").cast("double") -
              col("__sx").cast("double") * col("__sx").cast("double")) *
              (col("n_edges").cast("double") *
                col("__syy").cast("double") -
                col("__sy").cast("double") * col("__sy").cast("double"))),
            6) + lit(0.0d)).as("assortativity"))
    }),

    // ---- EXT: global + mean-local clustering coefficient ----
    "q353_clustering_coeff" -> ((s, dir) => {
      // the triad-closure scalars over q120's supplier co-occurrence
      // graph: global C = 3T/W from exact integer wedge/triangle counts,
      // mean local C from 6-dp rounded per-node ratios exactly summed —
      // all on triangleCounts' per-node output (the oriented-wedge join,
      // never an all-pairs pass).
      val li = Tables.lineitem(s, dir)
        .filter(col("l_orderkey") % 10 === 0)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      val pairs = li.select(col("ok"), col("sk").as("src"))
        .join(li.select(col("ok"), col("sk").as("dst")), Seq("ok"))
        .filter(col("src") < col("dst"))
        .select("src", "dst")
      val tc = graft.operators.Graph.triangleCounts(pairs)
      tc.agg(count(lit(1)).as("n_nodes"),
          sum((col("degree") * (col("degree") - lit(1)))
            .cast("decimal(38,0)")).cast("long").as("__dd2"),
          sum(col("triangles")).as("__tri3"),
          sum(when(col("degree") >= 2,
            round((col("triangles") * 2).cast("double") /
              (col("degree") * (col("degree") - lit(1))).cast("double"), 6)
              .cast("decimal(18,6)"))).as("__lcs"),
          sum(when(col("degree") >= 2, 1L).otherwise(0L)).as("__nge2"))
        .select(col("n_nodes"),
          expr("__dd2 div 2").as("n_wedges"),
          expr("__tri3 div 3").as("total_triangles"),
          (round(col("__tri3").cast("double") /
            col("__dd2").cast("double") * lit(2.0d), 6) + lit(0.0d))
            .as("global_cc"),
          (round(col("__lcs").cast("double") /
            col("__nge2").cast("double"), 6) + lit(0.0d))
            .as("avg_local_cc"))
    }),

    // ---- EXT: Fellegi–Sunter field match weights ----
    "q354_linkage_weights" -> ((s, dir) => {
      // record-linkage calibration: per comparison field, m = P(agree |
      // match) from the customer-blocked pair set (q338's bounded self-
      // join) and u = P(agree | nonmatch) from a FIXED 512-order md5-rank
      // sample's cross-customer pairs (the q266 budget discipline —
      // O(512²) constant forever). log2 weights take ln of the 6-dp
      // ROUNDED probabilities so both engines feed libm identical
      // doubles.
      val cols = Seq("o_orderkey", "o_custkey", "o_orderpriority",
        "o_orderstatus", "o_orderdate")
      val o = Tables.orders(s, dir).select(cols.map(col): _*)
      def agrees(df: DataFrame) = df.agg(
        count(lit(1)).as("n"),
        sum(when(col("pa") === col("pb"), 1L).otherwise(0L)).as("ap"),
        sum(when(col("sa") === col("sb"), 1L).otherwise(0L)).as("ast"),
        sum(when(col("ma") === col("mb"), 1L).otherwise(0L)).as("am"))
      def sides(df: DataFrame, sfx: String) = df.select(
        col("o_orderkey").as(s"k$sfx"), col("o_custkey").as(s"c$sfx"),
        col("o_orderpriority").as(s"p$sfx"), col("o_orderstatus").as(s"s$sfx"),
        month(col("o_orderdate")).as(s"m$sfx"))
      val mp = agrees(sides(o, "a").join(sides(o, "b"),
        col("ca") === col("cb") && col("ka") < col("kb")))
        .select(col("n").as("mn"), col("ap").as("map_"),
          col("ast").as("mast"), col("am").as("mam"))
      val samp = o.orderBy(md5(col("o_orderkey").cast("string")),
        col("o_orderkey")).limit(512)
      val up = agrees(sides(samp, "a").join(sides(samp, "b"),
        col("ka") < col("kb") && col("ca") =!= col("cb")))
        .select(col("n").as("un"), col("ap").as("uap"),
          col("ast").as("uast"), col("am").as("uam"))
      val x = mp.crossJoin(up)
      def fld(name: String, ma: String, ua: String) = {
        val m6 = round(col(ma).cast("double") / col("mn").cast("double"), 6) +
          lit(0.0d)
        val u6 = round(col(ua).cast("double") / col("un").cast("double"), 6) +
          lit(0.0d)
        x.select(lit(name).as("field"),
          col("mn").as("n_match_pairs"), col("un").as("n_nonmatch_pairs"),
          m6.as("m_prob"), u6.as("u_prob"),
          (round(log(m6 / u6) / log(lit(2.0d)), 6) + lit(0.0d))
            .as("log2_weight"))
      }
      fld("priority", "map_", "uap")
        .unionByName(fld("status", "mast", "uast"))
        .unionByName(fld("month", "mam", "uam"))
    }),

    // ---- EXT: Fano factor — burstiness of per-user daily activity ----
    "q355_fano_burstiness" -> ((s, dir) =>
      // index of dispersion Var/Mean over (user, day) event counts per
      // stream: 1 = Poisson, > 1 = bursty, < 1 = regular — the traffic-
      // shape scalar behind q300's interarrival profile. Exact integer
      // moments, one double division each.
      Tables.events(s, dir)
        .groupBy(col("event_type"), col("user_id"),
          col("ts").cast("date").as("d"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_cells"), sum(col("__c")).as("__s"),
          sum(col("__c") * col("__c")).as("__q"))
        .select(col("event_type"), col("n_cells"),
          (round(col("__s").cast("double") / col("n_cells").cast("double"),
            6) + lit(0.0d)).as("mean_count"),
          (round((col("__q").cast("double") -
            col("__s").cast("double") * col("__s").cast("double") /
              col("n_cells").cast("double")) /
            col("n_cells").cast("double"), 6) + lit(0.0d)).as("var_count"),
          (round((col("n_cells").cast("double") *
            col("__q").cast("double") -
            col("__s").cast("double") * col("__s").cast("double")) /
            (col("n_cells").cast("double") * col("__s").cast("double")),
            6) + lit(0.0d)).as("fano_factor"))),

    // ---- EXT: lognormal method-of-moments fit ----
    "q356_lognormal_fit" -> ((s, dir) =>
      // the distributional model behind q301's Gumbel fit, for the body
      // instead of the tail: μ̂, σ̂ of ln(order value) per priority from
      // 9-dp rounded-ln decimal moments (q322's libm discipline), median
      // estimate exp(μ̂) from the 6-dp rounded mean so both engines
      // exponentiate the identical double.
      Tables.orders(s, dir)
        .select(col("o_orderpriority"),
          round(log(col("o_totalprice").cast(D).cast("double")), 9)
            .cast("decimal(18,9)").as("__lv"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("__lv")).as("__sl"),
          sum(col("__lv").cast("decimal(19,9)") * col("__lv")).as("__ql"))
        .select(col("o_orderpriority"), col("n"),
          (round(col("__sl").cast("double") / col("n").cast("double"), 6)
            + lit(0.0d)).as("mu_hat"),
          (round(sqrt((col("__ql").cast("double") -
            col("__sl").cast("double") * col("__sl").cast("double") /
              col("n").cast("double")) / col("n").cast("double")), 6)
            + lit(0.0d)).as("sigma_hat"),
          (round(exp(round(col("__sl").cast("double") /
            col("n").cast("double"), 6)), 2) + lit(0.0d))
            .as("median_hat"))),

    // ---- EXT: Cochran's Q over weekly purchase activity ----
    "q357_cochran_q" -> ((s, dir) => {
      // did purchase propensity stay flat across the four weeks? the
      // k-treatment generalization of q349's McNemar on the binary
      // user×week activity matrix: Q = (k−1)(k·ΣG² − T²)/(k·T − ΣL²) —
      // every moment an exact integer, one double division at the end.
      val d0 = Tables.events(s, dir)
        .agg(min(col("ts").cast("date")).as("__d0"))
      val marks = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .crossJoin(broadcast(d0))
        .withColumn("__wk",
          expr("datediff(cast(ts as date), __d0) div 7"))
        .filter(col("__wk") <= 3)
        .select(col("user_id"), col("__wk")).distinct()
      val lrow = marks.groupBy(col("user_id")).agg(count(lit(1)).as("__l"))
      val rowStats = lrow.agg(count(lit(1)).as("n_users"),
        sum(col("__l")).as("__t"),
        sum(col("__l") * col("__l")).as("__sl2"))
      val colStats = marks.groupBy(col("__wk"))
        .agg(count(lit(1)).as("__g"))
        .agg(sum(col("__g") * col("__g")).as("__sg2"))
      rowStats.crossJoin(broadcast(colStats))
        .select(lit(4).as("k_periods"), col("n_users"),
          col("__t").as("total_marks"), col("__sl2").as("sum_l_sq"),
          col("__sg2").as("sum_g_sq"),
          (round((lit(3L) * (lit(4L) * col("__sg2") -
            col("__t") * col("__t"))).cast("double") /
            (lit(4L) * col("__t") - col("__sl2")).cast("double"), 6)
            + lit(0.0d)).as("cochran_q"))
    }),

    // ---- EXT: LM-Dirichlet query-likelihood retrieval ----
    "q358_lm_dirichlet" -> ((s, dir) => {
      // the probabilistic retrieval model next to q96's BM25 — same
      // probe queries, same broadcast inverted-index shape, Dirichlet
      // smoothing μ=2000 (Zhai & Lafferty's rank-equivalent scoring)
      import s.implicits._
      val qs = Seq((1L, "spark window join"), (2L, "hash table scan merge"),
        (3L, "vector stream filter customer")).toDF("query_id", "query_text")
      TextOps.lmDirichletTopK(Tables.spread(s, Tables.documents(s, dir)),
        "doc_id", "text", qs, "query_id", "query_text", k = 10)
    }),

    // ---- EXT: Hurst exponent via rescaled-range analysis ----
    "q359_hurst_rs" -> ((s, dir) => {
      // long-range dependence of the monthly revenue series: R/S per
      // block at window sizes {10, 20, 40}, Hurst = log-log slope.
      // Everything runs on the bounded monthly series (q336 discipline);
      // block means are 6-dp pinned, running deviations are sequential-
      // frame window sums (deterministic order), block stds come from
      // exact integer-cents moments, and the 3-point slope fit uses
      // exact decimal products so no double summation-order freedom.
      import org.apache.spark.sql.expressions.Window
      val spark = s
      import spark.implicits._
      val monthly = Tables.orders(s, dir)
        .groupBy(date_trunc("month", col("o_orderdate")).as("__m"))
        .agg(sum(col("o_totalprice").cast(D)).as("__rev"))
      val seq0 = monthly
        .withColumn("__i", row_number().over(Window.orderBy(col("__m"))))
        .withColumn("__cents", (col("__rev") * lit(100)).cast("bigint"))
        .select("__i", "__cents")
      val nRow = seq0.agg(count(lit(1)).as("__nm"))
      val ws = Seq(10, 20, 40).toDF("window_size")
      val blocks = seq0.crossJoin(broadcast(ws))
        .crossJoin(broadcast(nRow))
        .filter(col("__i") <=
          expr("(__nm div window_size) * window_size"))
        .withColumn("__blk", expr("(__i - 1) div window_size"))
      val bm = blocks.groupBy(col("window_size"), col("__blk"))
        .agg(count(lit(1)).as("__n"), sum(col("__cents")).as("__s"),
          sum(col("__cents").cast("decimal(18,0)") *
            col("__cents").cast("decimal(19,0)")).as("__q"))
        .withColumn("__mean6", round(col("__s").cast("double") /
          (col("__n").cast("double") * lit(100.0d)), 6))
      val wCum = Window.partitionBy(col("window_size"), col("__blk"))
        .orderBy(col("__i"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dev = blocks
        .join(bm.select(col("window_size"), col("__blk"), col("__mean6")),
          Seq("window_size", "__blk"))
        .withColumn("__cum", sum(col("__cents").cast("double") /
          lit(100.0d) - col("__mean6")).over(wCum))
      val rpart = dev.groupBy(col("window_size"), col("__blk"))
        .agg((max(col("__cum")) - min(col("__cum"))).as("__r"))
      val rs = rpart.join(bm, Seq("window_size", "__blk"))
        .withColumn("__sd",
          sqrt((col("__q").cast("double") -
            col("__s").cast("double") * col("__s").cast("double") /
              col("__n").cast("double")) / col("__n").cast("double")) /
            lit(100.0d))
      val mrs = rs.groupBy(col("window_size"))
        .agg(count(lit(1)).as("n_blocks"),
          round(sum(round(col("__r") / col("__sd"), 6)
            .cast("decimal(18,6)")).cast("double") /
            count(lit(1)).cast("double"), 6).as("__mrs"))
      val pts = mrs.select(
        round(log(col("window_size").cast("double")), 9)
          .cast("decimal(18,9)").as("__x"),
        round(log(col("__mrs")), 9).cast("decimal(18,9)").as("__y"))
      val fit = pts.agg(
        sum(col("__x").cast("decimal(19,9)") * col("__y")).as("__sxy"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x").cast("decimal(19,9)") * col("__x")).as("__sxx"))
        .select(((lit(3.0d) * col("__sxy").cast("double") -
          col("__sx").cast("double") * col("__sy").cast("double")) /
          (lit(3.0d) * col("__sxx").cast("double") -
            col("__sx").cast("double") * col("__sx").cast("double")))
          .as("__slope"))
      mrs.crossJoin(broadcast(fit))
        .select(col("window_size"), col("n_blocks"),
          (col("__mrs") + lit(0.0d)).as("mean_rs"),
          (round(col("__slope"), 6) + lit(0.0d)).as("hurst_exponent"))
    }),

    // ---- EXT: negative-binomial method-of-moments fit ----
    "q360_negbin_fit" -> ((s, dir) =>
      // overdispersion model of per-customer order counts (q132's
      // custdist domain): r̂ = m²/(v−m), p̂ = m/v — defined only when the
      // data is actually overdispersed (v > m), NULL otherwise, matching
      // NB's domain. Exact integer moments, mirrored double algebra.
      Tables.orders(s, dir)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("__c"))
        .agg(count(lit(1)).as("n_customers"), sum(col("__c")).as("__s"),
          sum(col("__c") * col("__c")).as("__q"))
        .withColumn("__m",
          col("__s").cast("double") / col("n_customers").cast("double"))
        .withColumn("__v",
          (col("__q").cast("double") -
            col("__s").cast("double") * col("__s").cast("double") /
              col("n_customers").cast("double")) /
            col("n_customers").cast("double"))
        .select(col("n_customers"),
          (round(col("__m"), 6) + lit(0.0d)).as("mean_orders"),
          (round(col("__v"), 6) + lit(0.0d)).as("var_orders"),
          when(col("__v") > col("__m"),
            round(col("__m") * col("__m") / (col("__v") - col("__m")), 6)
              + lit(0.0d)).as("r_hat"),
          when(col("__v") > col("__m"),
            round(col("__m") / col("__v"), 6) + lit(0.0d)).as("p_hat"))),

    // ---- EXT: Good–Turing frequency-of-frequencies ----
    "q361_good_turing" -> ((s, dir) => {
      // the smoothing table LM estimators start from: how many bigram
      // types occur r times (r ≤ 10), plus the Good–Turing unseen-mass
      // estimate P₀ = N₁/N — the vocabulary-coverage diagnostic for a
      // training corpus. Bigrams reuse q119's adjacency construction
      // (empties filtered BEFORE pairing).
      val toked = Tables.documents(s, dir)
        .select(org.apache.spark.sql.functions.filter(
          split(col("text"), " "), t => t =!= "").as("__toks"))
        .withColumn("__n", size(col("__toks")))
        .filter(col("__n") >= 2)
      val bg = toked
        .select(col("__toks"),
          explode(sequence(lit(1), col("__n") - 1)).as("__i"))
        .select(concat(element_at(col("__toks"), col("__i")), lit(" "),
          element_at(col("__toks"), col("__i") + 1)).as("__bg"))
      val tf = bg.groupBy(col("__bg")).agg(count(lit(1)).as("__c"))
      val ff = tf.groupBy(col("__c").as("freq"))
        .agg(count(lit(1)).as("n_types"))
      val tot = tf.agg(sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("vocab"))
      val n1 = ff.agg(coalesce(sum(when(col("freq") === 1,
        col("n_types"))), lit(0L)).as("__n1"))
      ff.filter(col("freq") <= 10)
        .crossJoin(broadcast(tot)).crossJoin(broadcast(n1))
        .select(col("freq"), col("n_types"), col("n_tokens"), col("vocab"),
          (round(col("__n1").cast("double") /
            col("n_tokens").cast("double"), 6) + lit(0.0d))
            .as("p0_unseen"))
    }),

    // ---- EXT: Simpson diversity of token distributions ----
    "q362_simpson_diversity" -> ((s, dir) =>
      // the collision-probability complement to the entropy gates:
      // Simpson's index Σc(c−1)/(N(N−1)) per source — an EXACT rational
      // (unbiased sampling-without-replacement form), one mirrored
      // division at the end.
      Tables.documents(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("__c"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("vocab"), sum(col("__c")).as("__n"),
          sum(col("__c") * (col("__c") - lit(1))).as("__cc"))
        .select(col("source"), col("vocab"), col("__n").as("n_tokens"),
          (round(col("__cc").cast("double") /
            (col("__n").cast("double") * (col("__n") - lit(1))
              .cast("double")), 6) + lit(0.0d)).as("simpson_index"),
          (round(lit(1.0d) - col("__cc").cast("double") /
            (col("__n").cast("double") * (col("__n") - lit(1))
              .cast("double")), 6) + lit(0.0d)).as("simpson_diversity"))),

    // ---- EXT: Durbin–Watson residual autocorrelation ----
    "q363_durbin_watson" -> ((s, dir) => {
      // is q141's OLS trend leaving autocorrelated residuals? DW =
      // Σ(e_t − e_{t−1})²/Σe_t² on the monthly-revenue trend fit —
      // residuals rounded to 6 dp, squared terms rounded to 4 dp then
      // EXACTLY decimal-summed (the k-cell reduction discipline), all on
      // the bounded monthly series.
      import org.apache.spark.sql.expressions.Window
      val monthly = Tables.orders(s, dir)
        .groupBy(date_trunc("month", col("o_orderdate")).as("__m"))
        .agg(sum(col("o_totalprice").cast(D)).cast("double").as("__y"))
      val seq0 = monthly.withColumn("__t",
        row_number().over(Window.orderBy(col("__m"))).cast("long"))
      val fit = seq0.agg(count(lit(1)).as("__n"),
        sum(col("__t")).as("__st"),
        sum(col("__t") * col("__t")).as("__stt"),
        sum(col("__y").cast("decimal(28,6)")).as("__syd"),
        sum(round(col("__t").cast("double") * col("__y"), 4)
          .cast("decimal(38,4)")).as("__styd"))
        .select(col("__n"), col("__st"), col("__stt"),
          col("__syd").cast("double").as("__sy"),
          col("__styd").cast("double").as("__sty"))
        .withColumn("__b",
          (col("__n").cast("double") * col("__sty") -
            col("__st").cast("double") * col("__sy")) /
            (col("__n").cast("double") * col("__stt").cast("double") -
              col("__st").cast("double") * col("__st").cast("double")))
        .withColumn("__a",
          (col("__sy") - col("__b") * col("__st").cast("double")) /
            col("__n").cast("double"))
      val res = seq0.crossJoin(broadcast(fit.select("__a", "__b")))
        .select(col("__t"),
          round(col("__y") - (col("__a") + col("__b") *
            col("__t").cast("double")), 6).as("__e"))
      val lagd = res.withColumn("__ep",
        lag(col("__e"), 1).over(Window.orderBy(col("__t"))))
      lagd.agg(
          sum(round((col("__e") - col("__ep")) * (col("__e") - col("__ep")),
            4).cast("decimal(38,4)")).as("__sdd"),
          sum(round(col("__e") * col("__e"), 4).cast("decimal(38,4)"))
            .as("__see"),
          count(lit(1)).as("n_months"))
        .select(col("n_months"),
          (round(col("__sdd").cast("double") / col("__see").cast("double"),
            6) + lit(0.0d)).as("durbin_watson"))
    }),

    // ---- EXT: Goodman–Kruskal gamma (ordinal association) ----
    "q364_gk_gamma" -> ((s, dir) => {
      // ordinal association between priority class and order-status
      // stage on the BOUNDED 15-cell contingency table: concordant/
      // discordant weighted by exact cell-count products — the ordinal
      // cousin of the Cramér's V gate, never a row-pair join.
      val cell = Tables.orders(s, dir)
        .groupBy(substring(col("o_orderpriority"), 1, 1).cast("int")
          .as("px"),
          when(col("o_orderstatus") === "F", 1)
            .when(col("o_orderstatus") === "P", 2).otherwise(3).as("sy"))
        .agg(count(lit(1)).as("c"))
      val a = cell.select(col("px").as("pxa"), col("sy").as("sya"),
        col("c").as("ca"))
      val b = cell.select(col("px").as("pxb"), col("sy").as("syb"),
        col("c").as("cb"))
      a.join(broadcast(b), col("pxa") < col("pxb") ||
          (col("pxa") === col("pxb") && col("sya") < col("syb")))
        .agg(
          sum(when((col("pxa") < col("pxb") && col("sya") < col("syb")) ||
            (col("pxa") > col("pxb") && col("sya") > col("syb")),
            col("ca") * col("cb")).otherwise(0L)).as("concordant"),
          sum(when((col("pxa") < col("pxb") && col("sya") > col("syb")) ||
            (col("pxa") > col("pxb") && col("sya") < col("syb")),
            col("ca") * col("cb")).otherwise(0L)).as("discordant"))
        .select(col("concordant"), col("discordant"),
          (round((col("concordant") - col("discordant")).cast("double") /
            (col("concordant") + col("discordant")).cast("double"), 6)
            + lit(0.0d)).as("gk_gamma"))
    }),

    // ---- EXT: categorical mutual information ----
    "q365_mutual_info" -> ((s, dir) => {
      // I(event_type; day-of-week) in nats — the dependence scalar
      // behind q128's χ² screen: 9-dp rounded p·ln terms over the
      // BOUNDED 35-cell table, exactly decimal-summed.
      val e = Tables.events(s, dir)
        .select(col("event_type"),
          dayofweek(col("ts")).as("__dw"))
        // isodow mirror: Spark dayofweek is 1=Sunday; shift to ISO
        .withColumn("dow",
          when(col("__dw") === 1, 7).otherwise(col("__dw") - 1))
      val cell = e.groupBy(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("c"))
      val mx = cell.groupBy(col("event_type")).agg(sum(col("c")).as("cx"))
      val my = cell.groupBy(col("dow")).agg(sum(col("c")).as("cy"))
      val tot = cell.agg(sum(col("c")).as("n"))
      cell.join(mx, Seq("event_type")).join(my, Seq("dow"))
        .crossJoin(broadcast(tot))
        .select(round(col("c").cast("double") / col("n").cast("double") *
          log(col("c").cast("double") * col("n").cast("double") /
            (col("cx").cast("double") * col("cy").cast("double"))), 9)
          .cast("decimal(18,9)").as("__term"))
        .agg(count(lit(1)).as("n_cells"),
          (round(sum(col("__term")).cast("double"), 6) + lit(0.0d))
            .as("mutual_info_nats"))
    }),

    // ---- EXT: stratified IPW average treatment effect ----
    "q366_ipw_ate" -> ((s, dir) => {
      // the causal-inference workhorse: effect of urgent priority on
      // order value, inverse-propensity-weighted within (status, year)
      // strata. Propensities are exact rationals (n_t/n per stratum), so
      // each stratum term is exact-integer algebra rounded to 4 dp and
      // EXACTLY summed; degenerate strata (no treated or no control) are
      // excluded on both sides, and the naive unadjusted diff ships for
      // contrast.
      val o = Tables.orders(s, dir).select(
        col("o_orderstatus").as("st"),
        year(col("o_orderdate")).cast("int").as("yr"),
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
          .as("tr"),
        (col("o_totalprice").cast(D) * lit(100)).cast("bigint").as("yc"))
      val strata = o.groupBy(col("st"), col("yr"))
        .agg(count(lit(1)).as("n"), sum(col("tr")).as("nt"),
          sum(when(col("tr") === 1, col("yc")).otherwise(0L)).as("yt"),
          sum(when(col("tr") === 0, col("yc")).otherwise(0L)).as("yc0"))
        .filter(col("nt") > 0 && col("nt") < col("n"))
        .withColumn("__term",
          round((col("yt").cast("double") * col("n").cast("double") /
            col("nt").cast("double") -
            col("yc0").cast("double") * col("n").cast("double") /
              (col("n") - col("nt")).cast("double")) / lit(100.0d), 4)
            .cast("decimal(38,4)"))
      val tot = strata.agg(sum(col("n")).as("n_orders"),
        count(lit(1)).as("n_strata"), sum(col("nt")).as("n_treat"),
        sum(col("__term")).as("__ts"))
      val naive = o.agg(
        ((sum(when(col("tr") === 1, col("yc")).otherwise(0L))
          .cast("double") / sum(col("tr")).cast("double") -
          sum(when(col("tr") === 0, col("yc")).otherwise(0L))
            .cast("double") / sum(lit(1L) - col("tr")).cast("double")) /
          lit(100.0d)).as("__nd"))
      tot.crossJoin(broadcast(naive))
        .select(col("n_orders"), col("n_treat"), col("n_strata"),
          (round(col("__nd"), 2) + lit(0.0d)).as("naive_diff"),
          (round(col("__ts").cast("double") /
            col("n_orders").cast("double"), 2) + lit(0.0d)).as("ipw_ate"))
    }),

    // ---- EXT: empirical-Bayes beta-binomial shrinkage ----
    "q367_eb_shrinkage" -> ((s, dir) => {
      // per-user click-rate smoothing: a beta prior fit by method of
      // moments on the 6-dp rounded rate distribution (exact decimal
      // moments), then every user's rate shrunk toward the global mean
      // by their own evidence — the small-sample CTR estimator. The
      // prior is a 1-row broadcast; the corpus streams once.
      val u = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("n_clicks"))
        .withColumn("__ph",
          round(col("n_clicks").cast("double") /
            col("n_events").cast("double"), 6).cast("decimal(18,6)"))
      val prior = u.agg(count(lit(1)).as("__nu"), sum(col("__ph")).as("__sp"),
          sum(col("__ph").cast("decimal(19,6)") * col("__ph")).as("__qp"))
        .select(
          round(col("__sp").cast("double") / col("__nu").cast("double"), 6)
            .as("__mm"),
          round((col("__qp").cast("double") -
            col("__sp").cast("double") * col("__sp").cast("double") /
              col("__nu").cast("double")) / col("__nu").cast("double"), 9)
            .as("__vv"))
        .withColumn("__s0",
          round(col("__mm") * (lit(1.0d) - col("__mm")) / col("__vv") -
            lit(1.0d), 6))
      u.crossJoin(broadcast(prior))
        .select(col("user_id"), col("n_events"), col("n_clicks"),
          (col("__ph").cast("double") + lit(0.0d)).as("raw_rate"),
          (round((round(col("__mm") * col("__s0"), 6) +
            col("n_clicks").cast("double")) /
            (col("__s0") + col("n_events").cast("double")), 6)
            + lit(0.0d)).as("shrunk_rate"))
    }),

    // ---- EXT: session bounce rate ----
    "q368_bounce_rate" -> ((s, dir) => {
      // the product-analytics scalar on q87's session definition
      // (1800 s inactivity gap): single-event sessions / all sessions +
      // mean session length — key-partitioned windows only.
      import org.apache.spark.sql.expressions.Window
      val wl = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val t = Tables.events(s, dir)
        .withColumn("__es",
          floor(unix_micros(col("ts")) / lit(1000000L)).cast("long"))
        .withColumn("__pe", lag(col("__es"), 1).over(wl))
      val sess = t.withColumn("__sid",
        sum(when(col("__pe").isNull ||
          col("__es") - col("__pe") > 1800, 1L).otherwise(0L))
          .over(wl.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
        .groupBy(col("user_id"), col("__sid"))
        .agg(count(lit(1)).as("__len"))
      sess.agg(count(lit(1)).as("n_sessions"),
          sum(when(col("__len") === 1, 1L).otherwise(0L)).as("n_bounce"),
          sum(col("__len")).as("__tot"))
        .select(col("n_sessions"), col("n_bounce"),
          (round(col("n_bounce").cast("double") /
            col("n_sessions").cast("double"), 6) + lit(0.0d))
            .as("bounce_rate"),
          (round(col("__tot").cast("double") /
            col("n_sessions").cast("double"), 6) + lit(0.0d))
            .as("mean_session_len"))
    }),

    // ---- EXT: p95 ship-delay SLA per month ----
    "q369_ship_delay_p95" -> ((s, dir) => {
      // the ops SLA readout: 95th-percentile order→ship delay per ship
      // month, resolved by integer rank against the (month, delay)
      // DISTRIBUTION table (q316's trick — delays are a bounded integer
      // grid, so the window input stays compressed at any corpus scale).
      import org.apache.spark.sql.expressions.Window
      val d = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir),
          col("l_orderkey") === col("o_orderkey"))
        .select(date_format(date_trunc("month", col("o_orderdate")),
          "yyyy-MM").as("ship_month"),
          datediff(col("l_shipdate").cast("date"),
            col("o_orderdate").cast("date")).as("__delay"))
      val dist = d.groupBy(col("ship_month"), col("__delay"))
        .agg(count(lit(1)).as("__c"))
      val wOrd = Window.partitionBy(col("ship_month")).orderBy(col("__delay"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("ship_month"))
      dist
        .withColumn("__cc", sum(col("__c")).over(wOrd))
        .withColumn("__n", sum(col("__c")).over(wAll))
        .groupBy(col("ship_month"), col("__n"))
        .agg(min(when(col("__cc") >=
          expr("(95 * __n + 99) div 100"), col("__delay"))).cast("bigint")
          .as("p95_delay_days"))
        .select(col("ship_month"), col("__n").as("n_items"),
          col("p95_delay_days"))
    }),

    // ---- EXT: Burrows' delta stylometric distance ----
    "q370_burrows_delta" -> ((s, dir) => {
      // the classic authorship-attribution distance between sources:
      // z-scores of the top-20 vocabulary's relative frequencies
      // (9-dp pinned), mean |Δz| per source pair — every join runs on
      // the bounded (sources × 20) grid; the top-20 vocabulary is a
      // deterministic TakeOrdered selection.
      val tok = Tables.documents(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
      val topw = tok.groupBy(col("w")).agg(count(lit(1)).as("__c"))
        .orderBy(col("__c").desc, col("w")).limit(20).select("w")
      val sn = tok.groupBy(col("source")).agg(count(lit(1)).as("__n"))
      val cnt = tok.join(broadcast(topw), Seq("w"))
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("__wc"))
      val f = sn.crossJoin(broadcast(topw))
        .join(cnt, Seq("source", "w"), "left_outer")
        .select(col("source"), col("w"),
          round(coalesce(col("__wc"), lit(0L)).cast("double") /
            col("__n").cast("double"), 9).cast("decimal(18,9)").as("__f"))
      val ms = f.groupBy(col("w"))
        .agg(count(lit(1)).as("__ns"), sum(col("__f")).as("__sf"),
          sum(col("__f").cast("decimal(19,9)") * col("__f")).as("__qf"))
      // the z-score is the suite's one knife-edge round: Spark's round()
      // rounds the double's SHORTEST-decimal rendering while DuckDB
      // rounds the binary value, and a z landing ~1e-16 from a 6-dp
      // midpoint flips between them (observed once in 400 cells at
      // sf0.01). The explicit half-away floor formula below is the SAME
      // IEEE op sequence in both engines — no engine round semantics.
      val zRaw = (col("__f").cast("double") -
        col("__sf").cast("double") / col("__ns").cast("double")) /
        sqrt((col("__qf").cast("double") -
          col("__sf").cast("double") * col("__sf").cast("double") /
            col("__ns").cast("double")) /
          col("__ns").cast("double"))
      val z = f.join(broadcast(ms), Seq("w"))
        .select(col("source"), col("w"),
          (when(zRaw >= 0,
            floor(zRaw * lit(1000000.0d) + lit(0.5d)))
            .otherwise(-floor(-zRaw * lit(1000000.0d) + lit(0.5d)))
            .cast("double") / lit(1000000.0d)).as("__z"))
      val a = z.select(col("w"), col("source").as("source_a"),
        col("__z").as("__za"))
      val b = z.select(col("w"), col("source").as("source_b"),
        col("__z").as("__zb"))
      a.join(b, Seq("w"))
        .filter(col("source_a") < col("source_b"))
        .withColumn("__dz",
          round(abs(col("__za") - col("__zb")), 6).cast("decimal(18,6)"))
        .groupBy(col("source_a"), col("source_b"))
        // the mean of EXACT 6-dp decimals over 20 words lands on exact
        // decimal midpoints systematically (sum_micro ≡ 10 mod 20), so
        // round() semantics diverge between engines — same mirrored
        // half-away floor as the z-score
        .agg((floor(sum(col("__dz")).cast("double") /
          count(lit(1)).cast("double") * lit(1000000.0d) + lit(0.5d))
          .cast("double") / lit(1000000.0d) + lit(0.0d))
          .as("burrows_delta"))
    }),

    // ---- EXT: BFS reach profile + harmonic coverage ----
    "q371_reach_profile" -> ((s, dir) => {
      // the impact-radius readout over q145's bipartite purchase graph:
      // nodes first reached at each hop, cumulative coverage fraction,
      // and the seed set's harmonic reach Σ 1/d — the level-synchronous
      // frontier BFS (checkpointEvery discipline) plus bounded per-hop
      // aggregates.
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      val pairs = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst")).distinct()
      val edges = pairs.union(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = Tables.customer(s, dir).filter(col("c_custkey") <= 5)
        .select(concat(lit("c"), col("c_custkey")).as("node"))
      val dist = graft.operators.Graph.bfsHops(edges, seeds, maxHops = 4)
      val nv = edges.agg(countDistinct(col("src")).as("__nv"))
      val lvl = dist.groupBy(col("hops")).agg(count(lit(1)).as("n_nodes"))
      val wc = Window.orderBy(col("hops"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val h = dist.filter(col("hops") > 0)
        .agg((round(sum(round(lit(1.0d) / col("hops").cast("double"), 9)
          .cast("decimal(18,9)")).cast("double"), 6) + lit(0.0d))
          .as("harmonic_sum"))
      lvl.withColumn("cum_reached", sum(col("n_nodes")).over(wc))
        .crossJoin(broadcast(nv)).crossJoin(broadcast(h))
        .select(col("hops"), col("n_nodes"), col("cum_reached"),
          (round(col("cum_reached").cast("double") /
            col("__nv").cast("double"), 6) + lit(0.0d)).as("frac_reached"),
          col("harmonic_sum"))
    }),

    // ---- EXT: per-doc TF-IDF keyword extraction ----
    "q372_tfidf_keywords" -> ((s, dir) => {
      // the classic keyword extractor next to q96's BM25: top-3 terms
      // per doc by tf·ln(N/df), idf pinned to 6 dp so the per-term score
      // is engine-identical; the top-k is a doc-partitioned
      // WindowGroupLimit, never a global sort.
      import org.apache.spark.sql.expressions.Window
      val tok = Tables.spread(s, Tables.documents(s, dir))
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "")
      val tf = tok.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("__tf"))
      val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("__df"))
      val nd = Tables.documents(s, dir).agg(count(lit(1)).as("__n"))
      val sc = tf.join(dfq, Seq("term")).crossJoin(broadcast(nd))
        .withColumn("tfidf",
          round(col("__tf").cast("double") *
            (round(log(col("__n").cast("double") /
              col("__df").cast("double")), 6) + lit(0.0d)), 6) + lit(0.0d))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term"))
      sc.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("term"), col("tfidf"),
          col("rank").cast("int").as("rank"))
    }),

    // ---- EXT: Flesch-style readability per source ----
    "q373_readability" -> ((s, dir) => {
      // corpus-quality readability: words/sentence and vowel-group
      // syllables/word (the deterministic syllable heuristic both
      // engines compute identically via the same regexp), folded into
      // the Flesch formula with mirrored literal arithmetic.
      val sent = Tables.documents(s, dir)
        .select(col("source"),
          explode(split(col("text"), "[.!?]+")).as("__s0"))
        .select(col("source"), trim(col("__s0")).as("__s"))
        .filter(col("__s") =!= "")
      val words = sent
        .select(col("source"), explode(split(col("__s"), " ")).as("__w"))
        .filter(col("__w") =!= "")
      val syl = words.withColumn("__sy",
        greatest(size(expr("regexp_extract_all(lower(__w), '[aeiouy]+', 0)"))
          .cast("long"), lit(1L)))
      val sentCnt = sent.groupBy(col("source"))
        .agg(count(lit(1)).as("n_sentences"))
      val wordCnt = syl.groupBy(col("source"))
        .agg(count(lit(1)).as("n_words"), sum(col("__sy")).as("n_syllables"))
      sentCnt.join(wordCnt, Seq("source"))
        .select(col("source"), col("n_sentences"), col("n_words"),
          col("n_syllables"),
          (round(lit(206.835d) -
            lit(1.015d) * (col("n_words").cast("double") /
              col("n_sentences").cast("double")) -
            lit(84.6d) * (col("n_syllables").cast("double") /
              col("n_words").cast("double")), 6) + lit(0.0d))
            .as("flesch_score"))
    }),

    // ---- EXT: MinHash estimator accuracy sweep ----
    "q374_minhash_accuracy" -> ((s, dir) => {
      // how many hashes does the q37 signature actually need? mean
      // |estimated − exact| Jaccard over the banded candidate pairs at
      // k ∈ {8, 16, 32} signature prefixes (a prefix of a MinHash
      // signature IS a k-hash MinHash). Completes the sketch-audit
      // family (KMV/CM/HLL); the error column must fall as k grows.
      // Final means use the mirrored half-away floor (q370 lesson —
      // means of exact 6-dp decimals).
      val docs = Tables.spread(s, Tables.documents(s, dir))
      val cand = Dedup.minhashCandidates(docs, "doc_id", "text")
        .localCheckpoint(eager = false)
      val sigd = Dedup.minhashSignatureAgg(docs, "doc_id", "text", 3)
      val candIds = cand
        .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .distinct()
      val sets = docs.join(candIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          TextOps.distinctShingles(TextOps.tokens(col("text")), 3).as("sh"))
      val ex = cand
        .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("__sha")),
          Seq("doc_a"))
        .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("__shb")),
          Seq("doc_b"))
        .withColumn("__c", size(array_intersect(col("__sha"), col("__shb"))))
        .withColumn("__j", col("__c").cast("double") /
          (size(col("__sha")) + size(col("__shb")) - col("__c"))
            .cast("double"))
        .select("doc_a", "doc_b", "__j")
      val spark = s
      import spark.implicits._
      val ks = Seq(8, 16, 32).toDF("k_hashes")
      ex
        .join(sigd.select(col("doc_id").as("doc_a"), col("sig").as("__sa")),
          Seq("doc_a"))
        .join(sigd.select(col("doc_id").as("doc_b"), col("sig").as("__sb")),
          Seq("doc_b"))
        .crossJoin(broadcast(ks))
        .withColumn("__match",
          aggregate(zip_with(
            slice(col("__sa"), lit(1), col("k_hashes")),
            slice(col("__sb"), lit(1), col("k_hashes")),
            (x, y) => when(x === y, 1L).otherwise(0L)),
            lit(0L), (acc, v) => acc + v))
        .withColumn("__err",
          round(abs(col("__match").cast("double") /
            col("k_hashes").cast("double") - col("__j")), 6)
            .cast("decimal(18,6)"))
        .groupBy(col("k_hashes"))
        .agg(count(lit(1)).as("n_pairs"),
          (floor(sum(col("__err")).cast("double") /
            count(lit(1)).cast("double") * lit(1000000.0d) + lit(0.5d))
            .cast("double") / lit(1000000.0d) + lit(0.0d))
            .as("mean_abs_err"))
    }),

    // ---- EXT: iterative proportional fitting (raking) ----
    "q375_ipf_raking" -> ((s, dir) => {
      // the survey-weighting workhorse: rake the pre-1996 (priority ×
      // status) cell matrix to the post-1996 row/column margins — five
      // lockstep IPF rounds on the BOUNDED 15-cell table (the q332
      // bounded-model-fit collect), each half-step rounded to 9 dp so
      // the Scala fold and the generated unrolled oracle agree exactly.
      val o = Tables.orders(s, dir)
      val cells = o.filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      val post = o.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      val rm = post.groupBy(col("o_orderpriority")).agg(count(lit(1)))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val cm = post.groupBy(col("o_orderstatus")).agg(count(lit(1)))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      def r9(x: Double): BigDecimal =
        BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      var state: Map[(String, String), BigDecimal] =
        cells.map { case (k, n) => k -> BigDecimal(n) }.toMap
      (1 to 5).foreach { _ =>
        val rowSum = state.groupBy(_._1._1).view
          .mapValues(_.values.sum).toMap
        state = state.map { case ((p, st), v) =>
          ((p, st), r9(v.toDouble *
            (rm(p).toDouble / rowSum(p).toDouble)))
        }
        val colSum = state.groupBy(_._1._2).view
          .mapValues(_.values.sum).toMap
        state = state.map { case ((p, st), v) =>
          ((p, st), r9(v.toDouble *
            (cm(st).toDouble / colSum(st).toDouble)))
        }
      }
      val spark = s
      import spark.implicits._
      cells.toSeq.map { case ((p, st), n) =>
        (p, st, n, state((p, st)).toDouble)
      }.toDF("o_orderpriority", "o_orderstatus", "n_base", "__v")
        .select(col("o_orderpriority"), col("o_orderstatus"), col("n_base"),
          (round(col("__v"), 6) + lit(0.0d)).as("fitted"))
    }),

    // ---- EXT: difference-in-differences estimate ----
    "q376_diff_in_diff" -> ((s, dir) => {
      // the pre/post × treated/control causal contrast completing the
      // q366/q329 family: heavy pre-period buyers (≥7 purchases) vs the
      // rest, click-value outcome; four exact-cents cell means and one
      // mirrored double contrast.
      val ev = Tables.events(s, dir)
      val b = ev.agg(min(col("ts").cast("date")).as("__d0"))
      val treat = ev.crossJoin(broadcast(b))
        .filter(col("event_type") === "purchase" &&
          col("ts").cast("date") < date_add(col("__d0"), 15))
        .groupBy(col("user_id")).agg(count(lit(1)).as("__np"))
        .filter(col("__np") >= 7).select(col("user_id"))
      val x = ev.crossJoin(broadcast(b))
        .filter(col("event_type") === "click")
        .join(treat.withColumn("__t", lit(1)), Seq("user_id"), "left_outer")
        .select(coalesce(col("__t"), lit(0)).as("tr"),
          when(col("ts").cast("date") < date_add(col("__d0"), 15), 0)
            .otherwise(1).as("post"),
          (col("value").cast(D) * lit(100)).cast("bigint").as("__yc"))
      val cells = x.groupBy(col("tr"), col("post"))
        .agg(count(lit(1)).as("__n"), sum(col("__yc")).as("__s"))
      def cellMean(t: Int, p: Int) = max(when(col("tr") === t &&
        col("post") === p, col("__s").cast("double") /
        col("__n").cast("double") / lit(100.0d)))
      cells.agg(cellMean(1, 0).as("__tp"), cellMean(1, 1).as("__tq"),
          cellMean(0, 0).as("__cp"), cellMean(0, 1).as("__cq"),
          sum(col("__n")).as("n_obs"))
        .select(col("n_obs"),
          (round(col("__tp"), 6) + lit(0.0d)).as("treat_pre"),
          (round(col("__tq"), 6) + lit(0.0d)).as("treat_post"),
          (round(col("__cp"), 6) + lit(0.0d)).as("ctrl_pre"),
          (round(col("__cq"), 6) + lit(0.0d)).as("ctrl_post"),
          (round((col("__tq") - col("__tp")) - (col("__cq") - col("__cp")),
            6) + lit(0.0d)).as("did_estimate"))
    }),

    // ---- EXT: ledger key-gap audit (bucketed, no global sort) ----
    "q377_key_gaps" -> ((s, dir) => {
      // missing-invoice detection over the finalized ('F') ledger: gap
      // length histogram of the orderkey sequence. Windows run INSIDE
      // 8192-key buckets (key-partitioned); cross-bucket adjacency is
      // one lead over the 8192×-compressed bucket summary — never a
      // global sort of the corpus.
      import org.apache.spark.sql.expressions.Window
      val k = Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("key"),
          expr("o_orderkey div 8192").as("b"))
      val wIn = Window.partitionBy(col("b")).orderBy(col("key"))
      val intra = k.withColumn("__nk", lead(col("key"), 1).over(wIn))
        .filter(col("__nk").isNotNull && col("__nk") - col("key") > 1)
        .select((col("__nk") - col("key") - 1).as("gap_len"))
      val bs = k.groupBy(col("b"))
        .agg(min(col("key")).as("__mn"), max(col("key")).as("__mx"))
      val wB = Window.orderBy(col("b"))
      val inter = bs.withColumn("__nmn", lead(col("__mn"), 1).over(wB))
        .filter(col("__nmn").isNotNull && col("__nmn") - col("__mx") > 1)
        .select((col("__nmn") - col("__mx") - 1).as("gap_len"))
      intra.unionByName(inter)
        .groupBy(col("gap_len"))
        .agg(count(lit(1)).as("n_gaps"))
        .select(col("gap_len"), col("n_gaps"),
          (col("gap_len") * col("n_gaps")).as("missing_keys"))
    }),

    // ---- EXT: Bayesian A/B probability of superiority ----
    "q378_bayes_ab" -> ((s, dir) => {
      // P(treatment mean > control mean) under the flat-prior normal
      // approximation — the "chance to beat control" readout next to
      // q206's fixed-horizon test and q335's SPRT. Exact cents moments;
      // Φ via q331's explicit Abramowitz–Stegun polynomial (no libm
      // erf).
      val o = Tables.orders(s, dir).select(
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
          .as("tr"),
        (col("o_totalprice").cast(D) * lit(100)).cast("bigint").as("yc"))
      val m = o.groupBy(col("tr"))
        .agg(count(lit(1)).as("n"), sum(col("yc")).as("s"),
          sum(col("yc").cast("decimal(38,0)") * col("yc")).as("q"))
      def g(t: Int, c: String, out: String) =
        max(when(col("tr") === t, col(c))).as(out)
      val wide = m.agg(g(1, "n", "nt"), g(1, "s", "st"), g(1, "q", "qt"),
        g(0, "n", "nc"), g(0, "s", "sc"), g(0, "q", "qc"))
        .withColumn("__mt", col("st").cast("double") /
          col("nt").cast("double") / lit(100.0d))
        .withColumn("__mc", col("sc").cast("double") /
          col("nc").cast("double") / lit(100.0d))
        .withColumn("__vt",
          (col("qt").cast("double") / lit(10000.0d) -
            col("nt").cast("double") * col("__mt") * col("__mt")) /
            (col("nt").cast("double") - lit(1.0d)))
        .withColumn("__vc",
          (col("qc").cast("double") / lit(10000.0d) -
            col("nc").cast("double") * col("__mc") * col("__mc")) /
            (col("nc").cast("double") - lit(1.0d)))
        .withColumn("__z", (col("__mt") - col("__mc")) /
          sqrt(col("__vt") / col("nt").cast("double") +
            col("__vc") / col("nc").cast("double")))
      val az = abs(col("__z"))
      val t = lit(1.0d) / (lit(1.0d) + lit(0.2316419d) * az)
      val poly = t * (lit(0.319381530d) + t * (lit(-0.356563782d) +
        t * (lit(1.781477937d) + t * (lit(-1.821255978d) +
          t * lit(1.330274429d)))))
      val tail = exp(-az * az / 2.0d) / lit(2.5066282746310002d) * poly
      wide.select(col("nt").as("n_treat"), col("nc").as("n_ctrl"),
        (round(col("__mt") - col("__mc"), 2) + lit(0.0d)).as("mean_diff"),
        (round(col("__z"), 6) + lit(0.0d)).as("z_score"),
        (round(when(col("__z") >= 0, lit(1.0d) - tail).otherwise(tail), 9)
          + lit(0.0d)).as("p_superior"))
    }),

    // ---- EXT: A/B sample-size / power analysis ----
    "q379_power_analysis" -> ((s, dir) =>
      // given each stream's observed weekend-vs-weekday effect, the n
      // per arm a two-sided α=0.05 / 80%-power test needs:
      // n = (z_{α/2}+z_β)²(v₁+v₂)/Δ² — the experiment-design readout
      // from exact cents moments, mirrored literal constants.
      Tables.events(s, dir)
        .select(col("event_type"),
          when(dayofweek(col("ts")).isin(1, 7), 1L).otherwise(0L)
            .as("we"),
          (col("value").cast(D) * lit(100)).cast("bigint").as("yc"))
        .groupBy(col("event_type"))
        .agg(
          sum(when(col("we") === 1, 1L).otherwise(0L)).as("__n1"),
          sum(when(col("we") === 1, col("yc")).otherwise(0L)).as("__s1"),
          sum(when(col("we") === 1,
            col("yc").cast("decimal(38,0)") * col("yc")).otherwise(
            lit(0).cast("decimal(38,0)"))).as("__q1"),
          sum(when(col("we") === 0, 1L).otherwise(0L)).as("__n0"),
          sum(when(col("we") === 0, col("yc")).otherwise(0L)).as("__s0"),
          sum(when(col("we") === 0,
            col("yc").cast("decimal(38,0)") * col("yc")).otherwise(
            lit(0).cast("decimal(38,0)"))).as("__q0"))
        .withColumn("__m1", col("__s1").cast("double") /
          col("__n1").cast("double") / lit(100.0d))
        .withColumn("__m0", col("__s0").cast("double") /
          col("__n0").cast("double") / lit(100.0d))
        .withColumn("__v1",
          (col("__q1").cast("double") / lit(10000.0d) -
            col("__n1").cast("double") * col("__m1") * col("__m1")) /
            (col("__n1").cast("double") - lit(1.0d)))
        .withColumn("__v0",
          (col("__q0").cast("double") / lit(10000.0d) -
            col("__n0").cast("double") * col("__m0") * col("__m0")) /
            (col("__n0").cast("double") - lit(1.0d)))
        .withColumn("__d", col("__m1") - col("__m0"))
        .select(col("event_type"),
          (round(col("__d"), 6) + lit(0.0d)).as("observed_delta"),
          (round(sqrt((col("__v1") + col("__v0")) / lit(2.0d)), 6)
            + lit(0.0d)).as("pooled_sd"),
          // (z_{0.975} + z_{0.80})² ≈ 7.849 — one shared literal, so the
          // constant is identical in both engines by construction
          ceil(lit(7.849d) * (col("__v1") + col("__v0")) /
            (col("__d") * col("__d"))).cast("bigint")
            .as("n_required_per_arm"))),

    // ---- EXT: CUPED variance reduction ----
    "q380_cuped" -> ((s, dir) => {
      // the modern experimentation stack's variance-reduction estimator:
      // θ = cov(post, pre)/var(pre) over per-user click-value totals,
      // var(y_cuped) = var(y) − cov²/var(x) analytically from EXACT
      // integer-cents moments — the reduction equals ρ².
      val ev = Tables.events(s, dir)
      val b = ev.agg(min(col("ts").cast("date")).as("__d0"))
      val u = ev.crossJoin(broadcast(b))
        .filter(col("event_type") === "click")
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("ts").cast("date") < date_add(col("__d0"), 15),
            (col("value").cast(D) * lit(100)).cast("bigint"))
            .otherwise(0L)).as("__x"),
          sum(when(col("ts").cast("date") >= date_add(col("__d0"), 15),
            (col("value").cast(D) * lit(100)).cast("bigint"))
            .otherwise(0L)).as("__y"))
      u.agg(count(lit(1)).as("n_users"),
          sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
          sum(col("__x").cast("decimal(38,0)") * col("__x")).as("qx"),
          sum(col("__y").cast("decimal(38,0)") * col("__y")).as("qy"),
          sum(col("__x").cast("decimal(38,0)") * col("__y")).as("qxy"))
        .withColumn("__vx",
          (col("qx").cast("double") - col("sx").cast("double") *
            col("sx").cast("double") / col("n_users").cast("double")) /
            col("n_users").cast("double"))
        .withColumn("__vy",
          (col("qy").cast("double") - col("sy").cast("double") *
            col("sy").cast("double") / col("n_users").cast("double")) /
            col("n_users").cast("double"))
        .withColumn("__cv",
          (col("qxy").cast("double") - col("sx").cast("double") *
            col("sy").cast("double") / col("n_users").cast("double")) /
            col("n_users").cast("double"))
        .select(col("n_users"),
          (round(col("__cv") / col("__vx"), 6) + lit(0.0d)).as("theta"),
          (round(col("__vy") / lit(10000.0d), 2) + lit(0.0d))
            .as("var_raw"),
          (round((col("__vy") - col("__cv") * col("__cv") / col("__vx")) /
            lit(10000.0d), 2) + lit(0.0d)).as("var_cuped"),
          (round(col("__cv") * col("__cv") /
            (col("__vx") * col("__vy")), 6) + lit(0.0d))
            .as("variance_reduction"))
    }),

    // ---- EXT: Neyman optimal stratified allocation ----
    "q381_neyman_allocation" -> ((s, dir) => {
      // allocate a 10,000-unit sample across priority strata ∝ N_h·S_h —
      // the optimal-variance design the sampling family (q84, q107)
      // executes. Per-stratum N·S terms are rounded to 4 dp then EXACTLY
      // summed (k=5 reduction discipline); the integer allocation uses
      // the mirrored half-away floor.
      val cents = (col("o_totalprice").cast(D) * lit(100)).cast("bigint")
      val strata = Tables.orders(s, dir)
        .select(col("o_orderpriority"), cents.as("__c"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_h"), sum(col("__c")).as("__s"),
          sum(col("__c").cast("decimal(38,0)") * col("__c")).as("__q"))
        .withColumn("__m", col("__s").cast("double") /
          col("n_h").cast("double"))
        .withColumn("__sd",
          sqrt((col("__q").cast("double") -
            col("n_h").cast("double") * col("__m") * col("__m")) /
            col("n_h").cast("double")) / lit(100.0d))
        .withColumn("__ns",
          round(col("n_h").cast("double") * col("__sd"), 4)
            .cast("decimal(38,4)"))
      val tot = strata.agg(sum(col("__ns")).as("__tns"))
      strata.crossJoin(broadcast(tot))
        .select(col("o_orderpriority"), col("n_h"),
          (round(col("__sd"), 2) + lit(0.0d)).as("stratum_sd"),
          (round(col("__ns").cast("double") / col("__tns").cast("double"),
            6) + lit(0.0d)).as("weight"),
          floor(col("__ns").cast("double") / col("__tns").cast("double") *
            lit(10000.0d) + lit(0.5d)).cast("bigint").as("allocation"))
    }),

    // ---- EXT: regression discontinuity at the 1996 boundary ----
    "q382_reg_discontinuity" -> ((s, dir) => {
      // the RDD mechanic: local linear fits on both sides of the
      // 1996-01-01 cutoff (±365-day bandwidth) over (days-to-cutoff,
      // order value); the jump is the difference of the two intercepts
      // at x=0. Exact integer moments (days × cents in decimal(38,0)),
      // closed-form OLS, mirrored double algebra.
      val o = Tables.orders(s, dir)
        .withColumn("__x", datediff(col("o_orderdate").cast("date"),
          lit("1996-01-01").cast("date")).cast("long"))
        .filter(col("__x") >= -365 && col("__x") < 365)
        .withColumn("__yc",
          (col("o_totalprice").cast(D) * lit(100)).cast("bigint"))
        .withColumn("side", when(col("__x") < 0, "left").otherwise("right"))
      val fits = o.groupBy(col("side"))
        .agg(count(lit(1)).as("n"), sum(col("__x")).as("sx"),
          sum(col("__x") * col("__x")).as("sxx"),
          sum(col("__yc")).as("sy"),
          sum(col("__x").cast("decimal(38,0)") * col("__yc")).as("sxy"))
        .withColumn("__b",
          (col("n").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            (col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")))
        .withColumn("__a",
          (col("sy").cast("double") - col("__b") *
            col("sx").cast("double")) / col("n").cast("double") /
            lit(100.0d))
      def side(sd: String, c: String, out: String) =
        max(when(col("side") === sd, col(c))).as(out)
      fits.agg(side("left", "n", "n_left"), side("right", "n", "n_right"),
          side("left", "__a", "__al"), side("right", "__a", "__ar"),
          side("left", "__b", "__bl"), side("right", "__b", "__br"))
        .select(col("n_left"), col("n_right"),
          (round(col("__al"), 2) + lit(0.0d)).as("intercept_left"),
          (round(col("__ar"), 2) + lit(0.0d)).as("intercept_right"),
          (round(col("__bl") / lit(100.0d), 6) + lit(0.0d))
            .as("slope_left"),
          (round(col("__br") / lit(100.0d), 6) + lit(0.0d))
            .as("slope_right"),
          (round(col("__ar") - col("__al"), 2) + lit(0.0d))
            .as("jump_at_cutoff"))
    }),

    // ---- EXT: local-maxima peak detection per stream ----
    "q383_peak_detection" -> ((s, dir) => {
      // strict local maxima of each stream's daily revenue with the rise
      // from the previous day and the fall to the next — the alerting
      // primitive behind q341's changepoints (exact cents comparisons,
      // key-partitioned lag/lead windows only).
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), col("ts").cast("date").as("d"))
        .agg(sum((col("value").cast(D) * lit(100)).cast("bigint"))
          .as("cents"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
      daily
        .withColumn("__pv", lag(col("cents"), 1).over(w))
        .withColumn("__nx", lead(col("cents"), 1).over(w))
        .filter(col("__pv").isNotNull && col("__nx").isNotNull &&
          col("cents") > col("__pv") && col("cents") > col("__nx"))
        .select(col("event_type"), col("d").as("peak_day"),
          (round(col("cents").cast("double") / lit(100.0d), 2)
            + lit(0.0d)).as("peak_value"),
          (round((col("cents") - col("__pv")).cast("double") /
            lit(100.0d), 2) + lit(0.0d)).as("rise"),
          (round((col("cents") - col("__nx")).cast("double") /
            lit(100.0d), 2) + lit(0.0d)).as("fall"))
    }),

    // ---- EXT: dataset profile drift between periods ----
    "q384_profile_drift" -> ((s, dir) => {
      // the data-contract monitor: volume / user-cardinality / value-mean
      // / null-rate profiles of the two event halves, with drift ratios —
      // exact moments per period, mirrored divisions, NULL-guarded where
      // the baseline is zero.
      val ev = Tables.events(s, dir)
      val b = ev.agg(min(col("ts").cast("date")).as("__d0"))
      val m = ev.crossJoin(broadcast(b))
        .withColumn("__p",
          when(col("ts").cast("date") < date_add(col("__d0"), 15), "p1")
            .otherwise("p2"))
        .groupBy(col("__p"))
        .agg(count(lit(1)).as("__nr"),
          countDistinct(col("user_id")).as("__nu"),
          round(sum(col("value").cast(D)).cast("double") /
            count(lit(1)).cast("double"), 6).as("__mv"),
          round(sum(when(col("props").isNull, 1L).otherwise(0L))
            .cast("double") / count(lit(1)).cast("double"), 6).as("__zr"))
      def g(p: String, c: String, out: String) =
        max(when(col("__p") === p, col(c))).as(out)
      val w = m.agg(g("p1", "__nr", "r1"), g("p2", "__nr", "r2"),
        g("p1", "__nu", "u1"), g("p2", "__nu", "u2"),
        g("p1", "__mv", "m1"), g("p2", "__mv", "m2"),
        g("p1", "__zr", "z1"), g("p2", "__zr", "z2"))
      def row(name: String, a: org.apache.spark.sql.Column,
              bb: org.apache.spark.sql.Column, guard: Boolean) =
        w.select(lit(name).as("metric"),
          (a.cast("double") + lit(0.0d)).as("period1"),
          (bb.cast("double") + lit(0.0d)).as("period2"),
          (if (guard)
            when(a.cast("double") > 0,
              round(bb.cast("double") / a.cast("double"), 6) + lit(0.0d))
          else round(bb.cast("double") / a.cast("double"), 6) + lit(0.0d))
            .as("drift_ratio"))
      row("n_rows", col("r1"), col("r2"), guard = false)
        .unionByName(row("n_users", col("u1"), col("u2"), guard = false))
        .unionByName(row("mean_value", col("m1"), col("m2"), guard = false))
        .unionByName(row("null_props_rate", col("z1"), col("z2"),
          guard = true))
    }),

    // ---- EXT: conversion latency percentiles ----
    "q385_conversion_latency" -> ((s, dir) => {
      // the funnel-latency readout behind q122's counts: minutes from
      // first signup to first subsequent purchase, p50/p90/p99 resolved
      // by integer rank against the minute-grain DISTRIBUTION table
      // (q316/q369's compressed-window trick); floor-second epochs and
      // integer-minute division keep the grain engine-identical.
      import org.apache.spark.sql.expressions.Window
      val spark = s
      import spark.implicits._
      val ev = Tables.events(s, dir)
      def es(c: org.apache.spark.sql.Column) =
        floor(unix_micros(c) / lit(1000000L)).cast("long")
      val sTbl = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(es(min(col("ts"))).as("__es"))
      val pTbl = ev.filter(col("event_type") === "purchase")
        .join(sTbl, Seq("user_id"))
        .filter(es(col("ts")) > col("__es"))
        .groupBy(col("user_id"), col("__es"))
        .agg(es(min(col("ts"))).as("__ep"))
      val dist = pTbl
        .select(expr("(__ep - __es) div 60").as("__mins"))
        .groupBy(col("__mins")).agg(count(lit(1)).as("__c"))
      val tot = dist.agg(sum(col("__c")).as("n_converted"))
      val wc = Window.orderBy(col("__mins"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = dist.withColumn("__cc", sum(col("__c")).over(wc))
      val q = Seq(50, 90, 99).toDF("pct")
      cum.crossJoin(broadcast(q)).crossJoin(broadcast(tot))
        .groupBy(col("pct"), col("n_converted"))
        .agg(min(when(col("__cc") >=
          expr("(pct * n_converted + 99) div 100"), col("__mins")))
          .cast("bigint").as("latency_minutes"))
        .select(col("pct"), col("n_converted"), col("latency_minutes"))
    }),

    // ---- EXT: rolling-origin drift-forecast backtest ----
    "q386_forecast_backtest" -> ((s, dir) => {
      // how good is the naive drift forecast ŷ_{t+h} = y_t + h(y_t −
      // y_{t−1})? MAE/RMSE by horizon h ∈ {1,2,3} over every origin of
      // the bounded monthly series — the rolling-origin evaluation that
      // complements q287's MASE; absolute/squared errors rounded to 2 dp
      // then exactly decimal-summed.
      import org.apache.spark.sql.expressions.Window
      val spark = s
      import spark.implicits._
      val seq0 = Tables.orders(s, dir)
        .groupBy(date_trunc("month", col("o_orderdate")).as("__m"))
        .agg(sum(col("o_totalprice").cast(D)).cast("double").as("__y"))
        .withColumn("__i", row_number().over(Window.orderBy(col("__m"))))
        .select("__i", "__y")
      val hz = Seq(1, 2, 3).toDF("horizon")
      val a = seq0.select(col("__i").as("ia"), col("__y").as("ya"))
      val b = seq0.select(col("__i").as("ib"), col("__y").as("yb"))
      val c = seq0.select(col("__i").as("ic"), col("__y").as("yc"))
      a.crossJoin(broadcast(hz))
        .join(b, col("ib") === col("ia") - col("horizon"))
        .join(c, col("ic") === col("ia") - col("horizon") - lit(1))
        .withColumn("__f", col("yb") + col("horizon").cast("double") *
          (col("yb") - col("yc")))
        .withColumn("__ae",
          round(abs(col("ya") - col("__f")), 2).cast("decimal(18,2)"))
        .withColumn("__se",
          round((col("ya") - col("__f")) * (col("ya") - col("__f")), 2)
            .cast("decimal(28,2)"))
        .groupBy(col("horizon"))
        .agg(count(lit(1)).as("n_evals"),
          (round(sum(col("__ae")).cast("double") /
            count(lit(1)).cast("double"), 2) + lit(0.0d)).as("mae"),
          (round(sqrt(sum(col("__se")).cast("double") /
            count(lit(1)).cast("double")), 2) + lit(0.0d)).as("rmse"))
    }),

    // ---- EXT: one-pass Pearson correlation matrix ----
    "q387_corr_matrix" -> ((s, dir) => {
      // the numeric-profile matrix over lineitem's four measures: all
      // 15 moments (4 sums, 10 products, count) in ONE hash aggregate —
      // exact integer-cents / decimal(38,0) — then six mirrored Pearson
      // divisions. One corpus pass for the full matrix, never a pass
      // per pair.
      def c2(n: String) =
        (col(n).cast(D) * lit(100)).cast("bigint")
      val x = Tables.lineitem(s, dir).select(
        c2("l_quantity").as("q"), c2("l_extendedprice").as("e"),
        c2("l_discount").as("d"), c2("l_tax").as("t"))
      def p(a: String, b: String) =
        sum(col(a).cast("decimal(38,0)") * col(b))
      val m = x.agg(count(lit(1)).as("n"),
        sum(col("q")).as("sq"), sum(col("e")).as("se"),
        sum(col("d")).as("sd"), sum(col("t")).as("st"),
        p("q", "q").as("qq"), p("e", "e").as("ee"),
        p("d", "d").as("dd"), p("t", "t").as("tt"),
        p("q", "e").as("qe"), p("q", "d").as("qd"),
        p("q", "t").as("qt2"), p("e", "d").as("ed"),
        p("e", "t").as("et"), p("d", "t").as("dt"))
      def pair(an: String, bn: String, sa: String, sb: String,
               saa: String, sbb: String, sab: String) =
        m.select(lit(an).as("col_a"), lit(bn).as("col_b"),
          (round((col("n").cast("double") * col(sab).cast("double") -
            col(sa).cast("double") * col(sb).cast("double")) /
            sqrt((col("n").cast("double") * col(saa).cast("double") -
              col(sa).cast("double") * col(sa).cast("double")) *
              (col("n").cast("double") * col(sbb).cast("double") -
                col(sb).cast("double") * col(sb).cast("double"))), 6)
            + lit(0.0d)).as("pearson_r"))
      pair("quantity", "extendedprice", "sq", "se", "qq", "ee", "qe")
        .unionByName(pair("quantity", "discount", "sq", "sd", "qq", "dd",
          "qd"))
        .unionByName(pair("quantity", "tax", "sq", "st", "qq", "tt",
          "qt2"))
        .unionByName(pair("extendedprice", "discount", "se", "sd", "ee",
          "dd", "ed"))
        .unionByName(pair("extendedprice", "tax", "se", "st", "ee", "tt",
          "et"))
        .unionByName(pair("discount", "tax", "sd", "st", "dd", "tt",
          "dt"))
    }),

    // ---- EXT: quantile normalization map between sources ----
    "q388_quantile_norm" -> ((s, dir) => {
      // the batch-effect correction table: src0's decile grid mapped
      // onto src1's — integer rank lookups on each source's length
      // DISTRIBUTION table (q316's compressed-window trick); the shift
      // column IS the correction.
      import org.apache.spark.sql.expressions.Window
      val spark = s
      import spark.implicits._
      val l = Tables.documents(s, dir)
        .filter(col("source").isin("src0", "src1"))
        .select(col("source"), length(col("text")).cast("long").as("len"))
      val dist = l.groupBy(col("source"), col("len"))
        .agg(count(lit(1)).as("__c"))
      val wOrd = Window.partitionBy(col("source")).orderBy(col("len"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("source"))
      val cum = dist
        .withColumn("__cc", sum(col("__c")).over(wOrd))
        .withColumn("__n", sum(col("__c")).over(wAll))
      val q = (1 to 9).toDF("decile")
      val v = cum.crossJoin(broadcast(q))
        .groupBy(col("decile"), col("source"))
        .agg(min(when(col("__cc") >=
          expr("(decile * __n + 9) div 10"), col("len"))).as("__val"))
      val a = v.filter(col("source") === "src0")
        .select(col("decile"), col("__val").as("len_src0"))
      val b = v.filter(col("source") === "src1")
        .select(col("decile"), col("__val").as("len_src1"))
      a.join(b, Seq("decile"))
        .select(col("decile"), col("len_src0"), col("len_src1"),
          (col("len_src1") - col("len_src0")).as("shift"))
    }),

    // ---- EXT: language-ID classifier evaluation ----
    "q389_langid_eval" -> ((s, dir) => {
      // q32's confusion matrix folded into the per-class
      // precision/recall/F1 report — the eval loop that decides whether
      // the stopword heuristic is good enough to gate corpus routing.
      // Exact integer tp/fp/fn; F1 from the 6-dp rounded P and R so the
      // harmonic mean is engine-identical.
      val cm = Tables.documents(s, dir)
        .withColumn("pred", TextOps.langId(TextOps.tokens(col("text"))))
        .groupBy(col("lang"), col("pred")).agg(count(lit(1)).as("__n"))
      val tp = cm.filter(col("lang") === col("pred"))
        .select(col("lang").as("language"), col("__n").as("__tp"))
      val byLang = cm.groupBy(col("lang").as("language"))
        .agg(sum(col("__n")).as("__support"))
      val byPred = cm.groupBy(col("pred").as("language"))
        .agg(sum(col("__n")).as("__predicted"))
      val p6 = round(col("__tp").cast("double") /
        col("__predicted").cast("double"), 6) + lit(0.0d)
      val r6c = round(col("__tp").cast("double") /
        col("__support").cast("double"), 6) + lit(0.0d)
      byLang.join(byPred, Seq("language"), "full_outer")
        .join(tp, Seq("language"), "left_outer")
        .select(col("language"),
          coalesce(col("__support"), lit(0L)).as("support"),
          coalesce(col("__predicted"), lit(0L)).as("n_predicted"),
          coalesce(col("__tp"), lit(0L)).as("true_positives"))
        .filter(col("support") > 0)
        .withColumn("__tp", col("true_positives"))
        .withColumn("__support", col("support"))
        .withColumn("__predicted", col("n_predicted"))
        .select(col("language"), col("support"), col("n_predicted"),
          col("true_positives"),
          when(col("__predicted") > 0, p6).as("precision"),
          r6c.as("recall"),
          when(col("__predicted") > 0 && col("__tp") > 0,
            round(lit(2.0d) *
              (round(col("__tp").cast("double") /
                col("__predicted").cast("double"), 6) + lit(0.0d)) *
              (round(col("__tp").cast("double") /
                col("__support").cast("double"), 6) + lit(0.0d)) /
              ((round(col("__tp").cast("double") /
                col("__predicted").cast("double"), 6) + lit(0.0d)) +
                (round(col("__tp").cast("double") /
                  col("__support").cast("double"), 6) + lit(0.0d))), 6)
              + lit(0.0d)).as("f1"))
    }),

    // ---- EXT: lang-ID evaluation summary (micro + macro) ----
    "q390_langid_summary" -> ((s, dir) => {
      // the 1-row report card over q389: micro accuracy Σtp/N and
      // macro-averaged P/R/F1 (undefined per-class values count as 0 —
      // the sklearn zero_division=0 convention). Per-class values are
      // the 6-dp rounded decimals, so the k-class means use the
      // mirrored half-away floor (q370 midpoint lesson).
      val perClass = queries("q389_langid_eval")(s, dir)
        .select(col("support"),
          coalesce(col("precision"), lit(0.0d)).as("__p"),
          col("recall").as("__r"),
          coalesce(col("f1"), lit(0.0d)).as("__f"))
      def fmean(c: org.apache.spark.sql.Column) =
        floor(sum(c.cast("decimal(18,6)")).cast("double") /
          count(lit(1)).cast("double") * lit(1000000.0d) + lit(0.5d))
          .cast("double") / lit(1000000.0d) + lit(0.0d)
      val tpTotal = Tables.documents(s, dir)
        .withColumn("pred", TextOps.langId(TextOps.tokens(col("text"))))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("lang") === col("pred"), 1L).otherwise(0L))
            .as("__tp"))
      perClass.agg(count(lit(1)).as("n_classes"),
          fmean(col("__p")).as("macro_precision"),
          fmean(col("__r")).as("macro_recall"),
          fmean(col("__f")).as("macro_f1"))
        .crossJoin(broadcast(tpTotal))
        .select(col("n_docs"), col("n_classes"),
          (round(col("__tp").cast("double") / col("n_docs").cast("double"),
            6) + lit(0.0d)).as("micro_accuracy"),
          col("macro_precision"), col("macro_recall"), col("macro_f1"))
    }),

    // ---- EXT: BPE merge learning (tokenizer training primitive) ----
    "q391_bpe_merges" -> ((s, dir) => {
      // Sennrich-style greedy BPE over the word-frequency TYPE table:
      // pair counts weighted by corpus frequency, argmax with
      // (count desc, left, right) tie-break, merges applied as exact
      // left-to-right non-overlapping pairing (window-algebra island
      // parity — naive string replace diverges on same-char runs). The
      // state is Heaps-bounded (types, never corpus rows); the oracle
      // unrolls all 6 steps as CTE chains (the q332/q375 generated-oracle
      // discipline).
      val wf = Tables.documents(s, dir)
        .select(explode(TextOps.tokens(col("text"))).as("tok"))
        .select(lower(col("tok")).as("word"))
        .filter(col("word").rlike("^[a-z]+$"))
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      TextOps.bpeLearn(wf, steps = 6)
    }),

    // ---- EXT: temperature-based source mixing weights ----
    "q392_mix_weights" -> ((s, dir) => {
      // pretraining data mixing: sample sources ∝ n^α (α = 0.5, the
      // multilingual-temperature convention) so small sources are
      // up-weighted without letting any source dominate. Per-source
      // sqrt-mass is 6-dp rounded THEN exact-decimal summed (q88's
      // reduction-order-free contract); effective epochs at a budget of
      // half the corpus tokens shows which sources would repeat.
      val src = Tables.documents(s, dir)
        .select(col("source"), size(TextOps.tokens(col("text"))).as("__nt"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("__nt").cast("long")).as("n_tokens"))
        .withColumn("__s",
          round(sqrt(col("n_tokens").cast("double")), 6).cast("decimal(28,6)"))
      val tot = src.agg(sum(col("__s")).as("__tot"),
        sum(col("n_tokens")).as("__ttok"))
      src.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          (round(col("__s").cast("double") / col("__tot").cast("double"), 6)
            + lit(0.0d)).as("weight"),
          (round((col("__s").cast("double") / col("__tot").cast("double")) *
            (col("__ttok").cast("double") / lit(2.0d)) /
            col("n_tokens").cast("double"), 6) + lit(0.0d)).as("eff_epochs"))
    }),

    // ---- EXT: duplicated 8-gram span coverage (exact-substring audit) ----
    "q393_dup_ngram_coverage" -> ((s, dir) => {
      // the Lee-et-al. "Deduplicating Training Data" repeated-substring
      // metric: the share of token positions covered by any 8-gram that
      // appears in ≥ 2 documents. One shuffle on the gram hash finds the
      // duplicated grams; coverage is a per-doc rolling max over the
      // 8-position window (no interval machinery, no join explosion) —
      // exactly the shape that survives a corpus 100× larger.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "tok")))
      val withG = toks.withColumn("ng",
        when(lead(col("tok"), 7).over(w).isNotNull,
          concat_ws(" ", (0 to 7).map(i =>
            if (i == 0) col("tok") else lead(col("tok"), i).over(w)): _*)))
      val dup = withG.filter(col("ng").isNotNull)
        .groupBy(col("ng")).agg(countDistinct(col("doc_id")).as("__nd"))
        .filter(col("__nd") >= 2).select(col("ng").as("__dng"))
      withG.join(dup, col("ng") === col("__dng"), "left")
        .withColumn("__d", when(col("__dng").isNotNull, 1).otherwise(0))
        .withColumn("__cov", max(col("__d")).over(w.rowsBetween(-7, 0)))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("__cov")).cast("long").as("n_dup_tokens"))
        .select(col("source"), col("n_tokens"), col("n_dup_tokens"),
          (round(col("n_dup_tokens").cast("double") /
            col("n_tokens").cast("double"), 6) + lit(0.0d))
            .as("dup_token_share"))
    }),

    // ---- EXT: tokenizer fertility / compression ratio ----
    "q394_tokenizer_fertility" -> ((s, dir) =>
      // tokenizer evaluation: subword-per-word fertility and chars-per-
      // subword compression — the cheap health check run before committing
      // a tokenizer to a corpus. Runs over customer names (mixed
      // letter/digit/punct tokens — the documents table is pure lowercase
      // words where fertility is trivially 1) per market segment. Exact
      // integer sums, two mirrored divisions at the end.
      Tables.customer(s, dir)
        .select(col("c_mktsegment"),
          size(TextOps.tokens(col("c_name"))).cast("long").as("__ws"),
          size(TextOps.bpeishTokens(col("c_name"))).cast("long").as("__bp"),
          length(col("c_name")).cast("long").as("__ch"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_rows"), sum(col("__ws")).as("ws_tokens"),
          sum(col("__bp")).as("subword_tokens"), sum(col("__ch")).as("chars"))
        .select(col("c_mktsegment"), col("n_rows"), col("ws_tokens"),
          col("subword_tokens"), col("chars"),
          (round(col("subword_tokens").cast("double") /
            col("ws_tokens").cast("double"), 6) + lit(0.0d)).as("fertility"),
          (round(col("chars").cast("double") /
            col("subword_tokens").cast("double"), 6) + lit(0.0d))
            .as("chars_per_subword"))),

    // ---- EXT: train/test split leakage audit ----
    "q395_split_leakage" -> ((s, dir) => {
      // split hygiene: test documents whose content fingerprint (q35's
      // order-insensitive bag key) also appears in train — exact-dup
      // leakage across the q54 deterministic split. Fingerprint semi-join
      // only; no corpus self-join.
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          md5(concat_ws(" ", array_sort(array_distinct(
            TextOps.tokens(col("text")))))).as("fp"),
          graft.operators.Sampling.splitAssign(col("doc_id"),
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
      val trainFps = d.filter(col("split") === "train")
        .select(col("fp").as("__tfp")).distinct()
      d.filter(col("split") === "test")
        .join(trainFps, col("fp") === col("__tfp"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_test_docs"),
          sum(when(col("__tfp").isNotNull, 1L).otherwise(0L))
            .as("n_leaked"))
        .select(col("source"), col("n_test_docs"), col("n_leaked"),
          (round(col("n_leaked").cast("double") /
            col("n_test_docs").cast("double"), 6) + lit(0.0d))
            .as("leak_rate"))
    }),

    // ---- EXT: BPE compression curve (merges vs corpus subword count) ----
    "q396_bpe_compression" -> ((s, dir) => {
      // the tokenizer-budget diagnostic over q391's learner: corpus
      // subword count after k = 0..6 merges (Σ freq × symbols-per-word) —
      // how much each merge buys. Same Heaps-bounded state chain; each
      // curve point is one sum over a checkpointed vocab-char table.
      val wf = Tables.documents(s, dir)
        .select(explode(TextOps.tokens(col("text"))).as("tok"))
        .select(lower(col("tok")).as("word"))
        .filter(col("word").rlike("^[a-z]+$"))
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      TextOps.bpeCompressionCurve(wf, steps = 6)
    }),

    // ---- EXT: linear multi-touch attribution ----
    "q397_linear_attribution" -> ((s, dir) => {
      // the equal-credit sibling of q184's first/last-touch: every
      // click/view in the 7 days before a purchase shares 1/n of that
      // conversion's credit. Linear attribution NEEDS the per-conversion
      // touch count, so the conv×touch join is inherent — it is horizon-
      // bounded (≤ one user-week of touches per conversion) and keyed on
      // user_id, the suite's interval-join discipline. Per-(conversion,
      // type) credit is 6-dp rounded then exact-decimal summed (q88).
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("__cid"),
          unix_micros(col("ts")).as("__cts"))
      val touch = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("event_type").as("__ttype"),
          unix_micros(col("ts")).as("__tts"))
      val horizon = 7L * 86400L * 1000000L
      val j = conv.join(touch, Seq("user_id"))
        .filter(col("__tts") < col("__cts") &&
          col("__tts") >= col("__cts") - lit(horizon))
      j.groupBy(col("__cid"), col("__ttype"))
        .agg(count(lit(1)).as("__ct"))
        .withColumn("__n",
          sum(col("__ct")).over(Window.partitionBy(col("__cid"))))
        .withColumn("__credit",
          round(col("__ct").cast("double") / col("__n").cast("double"), 6)
            .cast("decimal(18,6)"))
        .groupBy(col("__ttype").as("event_type"))
        .agg(countDistinct(col("__cid")).as("n_conversions_touched"),
          sum(col("__ct")).as("n_touches"),
          (round(sum(col("__credit")).cast("double"), 6) + lit(0.0d))
            .as("linear_credit"))
    }),

    // ---- EXT: cross-snapshot n-gram novelty (corpus freshness) ----
    "q398_ngram_novelty" -> ((s, dir) => {
      // crawl-freshness audit: treating doc_id % 4 as the crawl-snapshot
      // id (the suite's deterministic synthetic-arm convention, q329),
      // the share of each snapshot's distinct 8-grams first seen in that
      // snapshot. Gram-hash shuffles only; first-seen is a per-gram min.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val grams = Tables.documents(s, dir)
        .select(col("doc_id"), (col("doc_id") % 4).cast("int").as("snap"),
          posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "tok")))
        .withColumn("ng",
          when(lead(col("tok"), 7).over(w).isNotNull,
            concat_ws(" ", (0 to 7).map(i =>
              if (i == 0) col("tok") else lead(col("tok"), i).over(w)): _*)))
        .filter(col("ng").isNotNull)
        .select(col("snap"), col("ng")).distinct()
      grams
        .withColumn("__first",
          min(col("snap")).over(Window.partitionBy(col("ng"))))
        .groupBy(col("snap").as("snapshot"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("__first") === col("snap"), 1L).otherwise(0L))
            .as("n_novel"))
        .select(col("snapshot"), col("n_grams"), col("n_novel"),
          (round(col("n_novel").cast("double") /
            col("n_grams").cast("double"), 6) + lit(0.0d))
            .as("novelty_rate"))
    }),

    // ---- EXT: quality-threshold yield sweep ----
    "q399_quality_yield" -> ((s, dir) => {
      // curation tuning: how many docs/tokens survive a stopword-ratio
      // floor of k/20 for k = 0..4, per source — the parameter-sweep
      // companion to q211's fixed filter chain. The cut is exact integer
      // algebra (20·n_stop ≥ k·n_tokens — the q243 boundary lesson), so
      // no double threshold can straddle engines.
      val stop = Seq("the", "a", "of", "and", "to", "in", "is", "it",
        "that", "for")
      val t = TextOps.tokens(col("text"))
      val d = Tables.documents(s, dir)
        .select(col("source"), size(t).cast("long").as("__nt"),
          size(filter(t, x => x.isInCollection(stop))).cast("long")
            .as("__ns"))
      d.crossJoin(broadcast(s.range(0, 5).select(col("id").as("k"))))
        .filter(col("__ns") * 20L >= col("k") * col("__nt"))
        .groupBy(col("source"), col("k"))
        .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("n_tokens"))
        .select(col("source"), col("k").cast("int").as("k20"),
          col("n_docs"), col("n_tokens"))
    }),

    // ---- EXT: embedding isotropy / centroid-cosine audit ----
    "q400_embedding_isotropy" -> ((s, dir) => {
      // embedding-health diagnostic (Ethayarajh-style anisotropy): per
      // label, the mean cosine of vectors to the GLOBAL centroid and the
      // mean vector norm. The centroid is a dimension-sized exact-decimal
      // aggregate (components 6-dp rounded before the sum so the mean is
      // reduction-order-free), broadcast back as one 64-element array;
      // cosines go through the native q39 sequential-dot contract.
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("v"))
      val n = emb.agg(count(lit(1)).as("__n"))
      val cent = emb
        .select(posexplode(col("v")).as(Seq("d", "x")))
        .groupBy(col("d"))
        .agg(sum(round(col("x"), 6).cast("decimal(28,6)")).as("__s"))
        .crossJoin(broadcast(n))
        .select(col("d"),
          (col("__s").cast("double") / col("__n").cast("double")).as("c"))
        .agg(expr("transform(array_sort(collect_list(struct(d, c))), s -> s.c)")
          .as("cv"))
      def fmean(c: org.apache.spark.sql.Column) =
        floor(sum(c.cast("decimal(18,6)")).cast("double") /
          count(lit(1)).cast("double") * lit(1000000.0d) + lit(0.5d))
          .cast("double") / lit(1000000.0d) + lit(0.0d)
      import graft.operators.Similarity
      emb.crossJoin(broadcast(cent))
        .withColumn("__cos",
          round(Similarity.dotU(col("v"), col("cv"), 64) /
            (Similarity.normU(col("v"), 64) *
              Similarity.normU(col("cv"), 64)), 6))
        .withColumn("__norm", round(Similarity.normU(col("v"), 64), 6))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          fmean(col("__cos")).as("mean_cos_centroid"),
          fmean(col("__norm")).as("mean_norm"))
    }),

    // ---- EXT: k-anonymity risk audit ----
    "q401_k_anonymity" -> ((s, dir) => {
      // disclosure-risk governance over the quasi-identifier class table
      // (nation, segment, $1000 balance band): for k ∈ {2, 5, 10}, how many
      // rows sit in equivalence classes smaller than k. One hash aggregate
      // builds the class table; the k-grid is a 3-row broadcast. All
      // comparisons are exact integers.
      val classes = Tables.customer(s, dir)
        .groupBy(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000.0d).cast("long").as("__band"))
        .agg(count(lit(1)).as("__sz"))
      val ks = s.range(0, 3).select(
        element_at(array(lit(2L), lit(5L), lit(10L)), col("id").cast("int") + 1)
          .as("k"))
      classes.crossJoin(broadcast(ks))
        .groupBy(col("k"))
        .agg(sum(col("__sz")).as("n_rows"),
          count(lit(1)).as("n_classes"),
          sum(when(col("__sz") < col("k"), col("__sz")).otherwise(0L))
            .as("n_at_risk"))
        .select(col("k"), col("n_rows"), col("n_classes"), col("n_at_risk"),
          (round(col("n_at_risk").cast("double") /
            col("n_rows").cast("double"), 6) + lit(0.0d)).as("risk_share"))
    }),

    // ---- EXT: l-diversity audit ----
    "q402_l_diversity" -> ((s, dir) => {
      // the companion disclosure audit: within each (nation, segment)
      // quasi-identifier class, how diverse is the sensitive attribute
      // (the $2000 balance band)? For l ∈ {2, 3, 5}: classes with fewer
      // than l distinct sensitive values and the rows they expose.
      val classes = Tables.customer(s, dir)
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("__sz"),
          countDistinct(floor(col("c_acctbal") / 2000.0d).cast("long"))
            .as("__l"))
      val ls = s.range(0, 3).select(
        element_at(array(lit(2L), lit(3L), lit(5L)), col("id").cast("int") + 1)
          .as("l"))
      classes.crossJoin(broadcast(ls))
        .groupBy(col("l"))
        .agg(count(lit(1)).as("n_classes"),
          sum(when(col("__l") < col("l"), 1L).otherwise(0L))
            .as("n_classes_below"),
          sum(when(col("__l") < col("l"), col("__sz")).otherwise(0L))
            .as("n_rows_exposed"))
    }),

    // ---- EXT: small-cell suppression (statistical disclosure control) ----
    "q403_cell_suppression" -> ((s, dir) => {
      // the publishing rule: nation×segment counts with cells under 10
      // suppressed and rolled into one OTHER cell, so no small group is
      // identifiable in the released table. Exact integer counts; the
      // roll-up keeps the published total equal to the true total.
      val cells = Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      val kept = cells.filter(col("n") >= 10)
        .select(col("n_name"), col("c_mktsegment"), col("n"),
          lit(0L).as("n_suppressed_cells"))
      val other = cells.filter(col("n") < 10)
        .agg(sum(col("n")).as("n"), count(lit(1)).as("n_suppressed_cells"))
        .filter(col("n").isNotNull)
        .select(lit("OTHER").as("n_name"), lit("OTHER").as("c_mktsegment"),
          col("n"), col("n_suppressed_cells"))
      kept.unionByName(other)
    }),

    // ---- EXT: capture-recapture population estimate ----
    "q404_capture_recapture" -> ((s, dir) => {
      // the census/dedup-planning estimator: when a full count is too
      // expensive, two independent deterministic samples estimate the
      // population via Chapman's (n1+1)(n2+1)/(m+1) − 1. Independence
      // comes from salted md5 buckets ("a:"/"b:" prefixes — disjoint hash
      // families over the same key); the gate carries the true count so
      // the relative error is part of the artifact. Three filtered counts
      // in ONE aggregate pass.
      def in(salt: String) = graft.operators.Sampling.hashBucket(
        concat(lit(salt), col("doc_id").cast("string"))) < 2000
      Tables.documents(s, dir)
        .select(in("a:").as("__a"), in("b:").as("__b"))
        .agg(count(lit(1)).as("n_true"),
          sum(when(col("__a"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("__b"), 1L).otherwise(0L)).as("n2"),
          sum(when(col("__a") && col("__b"), 1L).otherwise(0L))
            .as("overlap"))
        .select(col("n_true"), col("n1"), col("n2"), col("overlap"),
          (round((col("n1") + 1L).cast("double") *
            (col("n2") + 1L).cast("double") /
            (col("overlap") + 1L).cast("double") - lit(1.0d), 2)
            + lit(0.0d)).as("chapman_estimate"),
          (round(((col("n1") + 1L).cast("double") *
            (col("n2") + 1L).cast("double") /
            (col("overlap") + 1L).cast("double") - lit(1.0d) -
            col("n_true").cast("double")) /
            col("n_true").cast("double"), 6) + lit(0.0d)).as("rel_error"))
    }),

    // ---- EXT: quasi-identifier uniqueness-risk curve ----
    "q405_uniqueness_curve" -> ((s, dir) => {
      // re-identification risk vs attribute release: how quickly row
      // uniqueness explodes as quasi-identifiers accumulate — level 1
      // (nation), level 2 (+segment), level 3 (+$1000 balance band).
      // Three hash aggregates over the same scan, unioned.
      def level(n: Int, qis: Seq[org.apache.spark.sql.Column]) =
        Tables.customer(s, dir)
          .groupBy(qis: _*)
          .agg(count(lit(1)).as("__sz"))
          .agg(count(lit(1)).as("n_classes"),
            sum(when(col("__sz") === 1L, 1L).otherwise(0L)).as("n_unique"),
            sum(col("__sz")).as("n_rows"))
          .select(lit(n).as("level"), col("n_classes"), col("n_unique"),
            (round(col("n_unique").cast("double") /
              col("n_rows").cast("double"), 6) + lit(0.0d))
              .as("unique_share"))
      val band = floor(col("c_acctbal") / 1000.0d).cast("long")
      level(1, Seq(col("c_nationkey")))
        .unionByName(level(2, Seq(col("c_nationkey"), col("c_mktsegment"))))
        .unionByName(level(3,
          Seq(col("c_nationkey"), col("c_mktsegment"), band)))
    }),

    // ---- EXT: padding-vs-packing efficiency curve ----
    "q406_packing_efficiency" -> ((s, dir) => {
      // the context-length economics behind q92's packer: at L ∈ {128,
      // 256, 512}, padded batching needs Σ⌈n/L⌉ sequences and wastes the
      // remainder of each, while stream packing needs ⌈Σn/L⌉. All exact
      // integer algebra (ceil via (n + L − 1) div L — no doubles until the
      // final share).
      val d = Tables.documents(s, dir)
        .select(size(TextOps.tokens(col("text"))).cast("long").as("__nt"))
        .filter(col("__nt") > 0)
      val ls = s.range(0, 3).select(
        element_at(array(lit(128L), lit(256L), lit(512L)),
          col("id").cast("int") + 1).as("ctx_len"))
      d.crossJoin(broadcast(ls))
        .groupBy(col("ctx_len"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("__nt")).as("total_tokens"),
          sum(expr("(__nt + ctx_len - 1) div ctx_len")).as("n_seqs_padded"))
        .select(col("ctx_len"), col("n_docs"), col("total_tokens"),
          col("n_seqs_padded"),
          expr("(total_tokens + ctx_len - 1) div ctx_len")
            .as("n_seqs_packed"),
          (round((col("n_seqs_padded") * col("ctx_len") -
            col("total_tokens")).cast("double") /
            (col("n_seqs_padded") * col("ctx_len")).cast("double"), 6)
            + lit(0.0d)).as("padding_share"))
    }),

    // ---- EXT: per-source dedup yield ----
    "q407_dedup_yield" -> ((s, dir) => {
      // corpus-economics report: per source, how much volume exact
      // (bag-fingerprint) dedup recovers — docs and tokens before vs after
      // keep-first. The keeper per fingerprint group is the struct-min
      // (doc_id, tokens) total-order pick; one (source, fp) hash aggregate.
      val d = Tables.documents(s, dir)
        .select(col("source"), col("doc_id"),
          TextOps.bagFingerprint(TextOps.tokens(col("text"))).as("fp"),
          size(TextOps.tokens(col("text"))).cast("long").as("__nt"))
      d.groupBy(col("source"), col("fp"))
        .agg(count(lit(1)).as("__n"), sum(col("__nt")).as("__toks"),
          min(struct(col("doc_id"), col("__nt"))).as("__keep"))
        .groupBy(col("source"))
        .agg(sum(col("__n")).as("n_docs"),
          count(lit(1)).as("n_kept"),
          sum(col("__toks")).as("tokens_total"),
          sum(col("__keep.__nt")).as("tokens_kept"))
        .select(col("source"), col("n_docs"), col("n_kept"),
          col("tokens_total"), col("tokens_kept"),
          (round((col("tokens_total") - col("tokens_kept")).cast("double") /
            col("tokens_total").cast("double"), 6) + lit(0.0d))
            .as("tokens_saved_share"))
    }),

    // ---- EXT: hapax legomena share per source ----
    "q408_hapax_share" -> ((s, dir) =>
      // vocabulary-health diagnostic: the share of each source's word
      // TYPES seen exactly once there — high hapax share flags noisy or
      // fragmentary text. Two hash aggregates, exact integers.
      Tables.documents(s, dir)
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("__c"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("vocab"),
          sum(when(col("__c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
        .select(col("source"), col("vocab"), col("n_hapax"),
          (round(col("n_hapax").cast("double") / col("vocab").cast("double"),
            6) + lit(0.0d)).as("hapax_share"))),

    // ---- EXT: Chao1 vocabulary-richness estimate ----
    "q409_chao1_richness" -> ((s, dir) =>
      // how many word types does each source REALLY have, including the
      // unseen ones? Chao1 = V + F1²/(2·F2) from the hapax (F1) and
      // dis-legomena (F2) counts — the species-richness estimator that
      // pairs with the q351 Heaps growth curve and q361 Good-Turing
      // unseen mass. Two hash aggregates; NULL-guarded when F2 = 0.
      Tables.documents(s, dir)
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("__c"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("vocab"),
          sum(when(col("__c") === 1L, 1L).otherwise(0L)).as("f1"),
          sum(when(col("__c") === 2L, 1L).otherwise(0L)).as("f2"))
        .select(col("source"), col("vocab"), col("f1"), col("f2"),
          when(col("f2") > 0,
            round(col("vocab").cast("double") +
              col("f1").cast("double") * col("f1").cast("double") /
              (lit(2.0d) * col("f2").cast("double")), 2) + lit(0.0d))
            .as("chao1_estimate"))),

    // ---- EXT: event path mining (top trigram user journeys) ----
    "q410_event_paths" -> ((s, dir) => {
      // sequence-pattern mining primitive: the 10 most frequent
      // event-type trigrams along user timelines — the "what do users do
      // next" journey report. Per-user lead windows (key-partitioned),
      // one global count over the ≤ |types|³ path table, total-order
      // top-10.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val paths = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("__t2", lead(col("event_type"), 1).over(w))
        .withColumn("__t3", lead(col("event_type"), 2).over(w))
        .filter(col("__t3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("__t2"), col("__t3"))
          .as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n"))
      paths.withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("path"))))
        .filter(col("rank") <= 10)
        .select(col("rank"), col("path"), col("n"))
    }),

    // ---- EXT: join-skew audit (exact Gini, no global sort) ----
    "q411_join_skew" -> ((s, dir) => {
      // the pre-salting diagnostic: how skewed is the lineitem→orders join
      // key? Everything derives from the FREQUENCY-OF-FREQUENCIES table
      // (multiplicity c → t keys), which is bounded by the max lines per
      // order, never key-count-sized — so the Gini's rank sums are EXACT
      // integer algebra over a ≤dozens-row table instead of a global sort
      // over millions of keys: keys of multiplicity c occupy a contiguous
      // ascending-rank run [r0, r0+t), contributing c·(t·r0 + t(t−1)/2)
      // to Σ r·c_r; G = (2·Σ r·c_r) / (n·Σc) − (n+1)/n.
      import org.apache.spark.sql.expressions.Window
      val ff = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("__c"))
        .groupBy(col("__c")).agg(count(lit(1)).as("__t"))
      val wc = Window.orderBy(col("__c"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val runs = ff
        .withColumn("__r0", coalesce(sum(col("__t")).over(wc), lit(0L)) + 1L)
        .withColumn("__rsum",
          col("__c") * (col("__t") * col("__r0") +
            expr("__t * (__t - 1) div 2")))
      runs.agg(sum(col("__t")).as("n_keys"),
          sum(col("__c") * col("__t")).as("n_rows"),
          max(col("__c")).as("max_mult"),
          sum(col("__rsum")).as("__s"))
        .select(col("n_keys"), col("n_rows"), col("max_mult"),
          (round(lit(2.0d) * col("__s").cast("double") /
            (col("n_keys").cast("double") * col("n_rows").cast("double")) -
            (col("n_keys") + 1L).cast("double") /
            col("n_keys").cast("double"), 6) + lit(0.0d)).as("gini"))
    }),

    // ---- EXT: referential-integrity scorecard ----
    "q412_fk_scorecard" -> ((s, dir) => {
      // the FK health report run before trusting any join: per edge,
      // child rows, distinct child keys, orphan rows (anti-join), and
      // coverage of the parent key space. Five anti/semi-join pairs
      // unioned; orphans being zero IS the result worth asserting.
      def edge(name: String, child: DataFrame, ck: String,
               parent: DataFrame, pk: String) = {
        val orphans = child.join(parent.select(col(pk)),
          child(ck) === col(pk), "left_anti")
          .agg(count(lit(1)).as("orphan_rows"))
        val stats = child.agg(count(lit(1)).as("child_rows"),
          countDistinct(col(ck)).as("child_keys"))
        val pcov = parent.join(child.select(col(ck)).distinct(),
            col(pk) === col(ck), "left_semi")
          .agg(count(lit(1)).as("parents_referenced"))
        val ptot = parent.agg(count(lit(1)).as("parent_rows"))
        stats.crossJoin(broadcast(orphans)).crossJoin(broadcast(pcov))
          .crossJoin(broadcast(ptot))
          .select(lit(name).as("edge"), col("child_rows"), col("child_keys"),
            col("orphan_rows"), col("parents_referenced"), col("parent_rows"),
            (round(col("parents_referenced").cast("double") /
              col("parent_rows").cast("double"), 6) + lit(0.0d))
              .as("parent_coverage"))
      }
      edge("lineitem->orders", Tables.lineitem(s, dir), "l_orderkey",
          Tables.orders(s, dir), "o_orderkey")
        .unionByName(edge("lineitem->part", Tables.lineitem(s, dir),
          "l_partkey", Tables.part(s, dir), "p_partkey"))
        .unionByName(edge("lineitem->supplier", Tables.lineitem(s, dir),
          "l_suppkey", Tables.supplier(s, dir), "s_suppkey"))
        .unionByName(edge("orders->customer", Tables.orders(s, dir),
          "o_custkey", Tables.customer(s, dir), "c_custkey"))
        .unionByName(edge("customer->nation", Tables.customer(s, dir),
          "c_nationkey", Tables.nation(s, dir), "n_nationkey"))
    }),

    // ---- EXT: user-profile assembly (field survivorship) ----
    "q413_profile_assembly" -> ((s, dir) => {
      // the CRM survivorship merge: each event TYPE carries different
      // fields, and the profile takes, per user, the latest value each
      // field was reported with — latest purchase amount, latest click
      // payload, first signup. One hash aggregate of filtered
      // max_by/min_by; the total order is a zero-padded (ts, event_id)
      // string key (DuckDB's arg_max has no composite-key overload). No
      // windows, no self-joins.
      val ord = format_string("%020d%020d", unix_micros(col("ts")),
        col("event_id"))
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          max(unix_micros(col("ts"))).as("last_seen_us"),
          min(when(col("event_type") === "signup",
            unix_micros(col("ts")))).as("signup_us"),
          max_by(when(col("event_type") === "purchase",
            round(col("value").cast("double"), 2)),
            when(col("event_type") === "purchase", ord))
            .as("latest_purchase_value"),
          max_by(when(col("event_type") === "click",
            get_json_object(col("props"), "$.k").cast("long")),
            when(col("event_type") === "click", ord))
            .as("latest_click_k"))
    }),

    // ---- EXT: deterministic-sample bias audit ----
    "q414_sample_bias" -> ((s, dir) => {
      // before trusting the md5-bucket 10% sample for profiling, prove it
      // unbiased: per order priority, population vs in-sample counts and
      // means of the order total. Means are exact-decimal sums divided
      // once at output (q88 contract); the sample predicate is the q54
      // key-stable hash bucket, so the audit reproduces anywhere.
      val D = "decimal(28,2)"
      val o = Tables.orders(s, dir)
        .withColumn("__in",
          graft.operators.Sampling.hashBucket(col("o_orderkey")) < 1000)
      o.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("pop_n"),
          sum(col("o_totalprice").cast(D)).as("__ps"),
          sum(when(col("__in"), 1L).otherwise(0L)).as("samp_n"),
          sum(when(col("__in"), col("o_totalprice").cast(D))).as("__ss"))
        .select(col("o_orderpriority"), col("pop_n"), col("samp_n"),
          (round(col("__ps").cast("double") / col("pop_n").cast("double"),
            2) + lit(0.0d)).as("pop_mean"),
          (round(col("__ss").cast("double") / col("samp_n").cast("double"),
            2) + lit(0.0d)).as("samp_mean"),
          (round(col("samp_n").cast("double") / col("pop_n").cast("double"),
            6) + lit(0.0d)).as("sampling_rate"))
    }),

    // ---- EXT: blocking-quality audit (linkage evaluation metrics) ----
    "q415_blocking_quality" -> ((s, dir) => {
      // the record-linkage evaluation triplet over the q37 MinHash banding:
      // against EXACT text duplicates as ground truth (identical text ⇒
      // identical shingle sets ⇒ identical signatures, so pair
      // completeness = 1.0 IS the soundness assertion for the banding;
      // bag-level dups are deliberately NOT the truth set — order-scrambled
      // texts share no shingles, and shingle-Jaccard blocking rightly
      // ignores them), pair precision, and the reduction ratio vs the
      // n(n−1)/2 all-pairs space — the number that justifies blocking at
      // 100 TB. Counts are exact; three divisions at output.
      val docs = Tables.spread(s, Tables.documents(s, dir))
      val cand = Dedup.minhashCandidates(docs, "doc_id", "text")
      // truth restricted to the blocking's domain (≥ 3 tokens — shorter
      // docs have no shingles and are out of scope for the banding)
      val fp = docs
        .filter(size(TextOps.tokens(col("text"))) >= 3)
        .select(col("doc_id"), md5(col("text")).as("__f"))
      val truth = fp.toDF("__da", "__f")
        .join(fp.toDF("__db", "__f2"), col("__f") === col("__f2"))
        .filter(col("__da") < col("__db"))
        .select(col("__da"), col("__db"))
      val caught = truth.join(cand,
        col("__da") === col("doc_a") && col("__db") === col("doc_b"),
        "left_semi")
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(broadcast(cand.agg(count(lit(1)).as("n_cand"))))
        .crossJoin(broadcast(caught.agg(count(lit(1)).as("n_caught"))))
        .crossJoin(broadcast(docs.agg(count(lit(1)).as("__n"))))
        .select(col("n_truth"), col("n_cand"), col("n_caught"),
          when(col("n_truth") > 0,
            round(col("n_caught").cast("double") /
              col("n_truth").cast("double"), 6) + lit(0.0d))
            .as("pair_completeness"),
          when(col("n_cand") > 0,
            round(col("n_caught").cast("double") /
              col("n_cand").cast("double"), 6) + lit(0.0d))
            .as("pair_precision"),
          (round(lit(1.0d) - col("n_cand").cast("double") /
            (col("__n").cast("double") * (col("__n") - 1L).cast("double") /
              lit(2.0d)), 6) + lit(0.0d)).as("reduction_ratio"))
    }),

    // ---- EXT: U-shaped (position-based) attribution ----
    "q416_ushaped_attribution" -> ((s, dir) => {
      // completes the attribution family (first/last q184, linear q397):
      // 40% to the first touch, 40% to the last, 20% split across the
      // middles; two touches split 50/50 and a single touch takes 1.0
      // (the standard conventions — per-conversion credit always sums to
      // exactly 1, the conservation invariant the spec asserts). Same
      // horizon-bounded conv×touch join keyed on user_id; position comes
      // from one key-partitioned window per conversion; per-touch weights
      // are 6-dp rounded then exact-decimal summed.
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("__cid"),
          unix_micros(col("ts")).as("__cts"))
      val touch = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("event_type").as("__ttype"),
          col("event_id").as("__tid"), unix_micros(col("ts")).as("__tts"))
      val horizon = 7L * 86400L * 1000000L
      val w = Window.partitionBy(col("__cid"))
        .orderBy(col("__tts"), col("__tid"))
      val j = conv.join(touch, Seq("user_id"))
        .filter(col("__tts") < col("__cts") &&
          col("__tts") >= col("__cts") - lit(horizon))
        .withColumn("__pos", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("__cid"))))
        .withColumn("__w", round(
          when(col("__n") === 1, lit(1.0d))
            .when(col("__n") === 2, lit(0.5d))
            .when(col("__pos") === 1 || col("__pos") === col("__n"),
              lit(0.4d))
            .otherwise(lit(0.2d) / (col("__n") - 2).cast("double")), 6)
          .cast("decimal(18,6)"))
      j.groupBy(col("__ttype").as("event_type"))
        .agg(count(lit(1)).as("n_touches"),
          (round(sum(col("__w")).cast("double"), 6) + lit(0.0d))
            .as("ushaped_credit"))
    }),

    // ---- EXT: near-dup threshold sensitivity curve ----
    "q417_dedup_threshold_curve" -> ((s, dir) => {
      // the dedup tuning curve: how many verified near-dup pairs survive
      // at Jaccard floors {0.3, 0.5, 0.7} — the q318 ANN-tuning
      // discipline applied to q36's candidates+verify pipeline. ONE
      // candidate verification pass; the grid is a 3-row broadcast; the
      // threshold compare uses the exact same double division as q36.
      val pairs = Dedup.minhashVerifiedPairs(
        Tables.spread(s, Tables.documents(s, dir)), "doc_id", "text",
        shingleN = 3, threshold = 0.0, maxDf = 100)
      val ts = s.range(0, 3).select(
        element_at(array(lit(0.3d), lit(0.5d), lit(0.7d)),
          col("id").cast("int") + 1).as("threshold"))
      def fmean(c: org.apache.spark.sql.Column) =
        floor(sum(c.cast("decimal(18,6)")).cast("double") /
          count(lit(1)).cast("double") * lit(1000000.0d) + lit(0.5d))
          .cast("double") / lit(1000000.0d) + lit(0.0d)
      pairs.crossJoin(broadcast(ts))
        .filter(col("jaccard") >= col("threshold"))
        .groupBy(col("threshold"))
        .agg(count(lit(1)).as("n_pairs"),
          fmean(round(col("jaccard"), 6)).as("mean_jaccard"))
    }),

    // ---- EXT: schema-evolution merged read (on-disk round trip) ----
    "q418_schema_evolution" -> ((s, dir) => {
      // lakehouse schema evolution, end to end ON DISK: a v1 snapshot
      // (orders before 1998 — written before the priority column existed)
      // and a v2 snapshot (priority added) land as separate parquet
      // directories, are read back independently, and merge with
      // unionByName(allowMissingColumns = true) — the column missing from
      // v1 materializes as NULL, the mergeSchema contract. The rollup
      // proves both the byte round trip and the merge semantics (the
      // LEGACY bucket is exactly the v1 row count). At 100 TB schema
      // evolution is append-time metadata only: old files are never
      // rewritten, and the merged scan still prunes columns per file.
      val o = Tables.orders(s, dir)
      val root = java.nio.file.Files
        .createTempDirectory("graft_schema_evo").toString
      o.filter(col("o_orderdate") < lit("1998-01-01"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .write.mode("overwrite").parquet(s"$root/v1")
      o.filter(col("o_orderdate") >= lit("1998-01-01"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderpriority"))
        .write.mode("overwrite").parquet(s"$root/v2")
      s.read.parquet(s"$root/v1")
        .unionByName(s.read.parquet(s"$root/v2"), allowMissingColumns = true)
        .groupBy(coalesce(col("o_orderpriority"), lit("LEGACY"))
          .as("priority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(D)).cast("double").as("sum_price"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
    }),

    // ---- EXT: dictionary-encoding planner + round trip ----
    "q419_dict_encoding" -> ((s, dir) => {
      // columnar dictionary encoding as an operator: build the code table
      // for p_type (dense codes in value order — deterministic), encode the
      // fact side, then DECODE BACK through the dictionary and aggregate on
      // the decoded value — parity with direct aggregation proves the round
      // trip is lossless. The dictionary is vocabulary-sized, so the rank
      // window runs over a bounded dimension table (the sanctioned
      // single-partition shape), and both joins broadcast it; the fact
      // side streams once. bits_per_value = length of the max code's
      // binary form — the storage planner's narrowest-width output, in
      // exact integer algebra on both engines.
      import org.apache.spark.sql.expressions.Window
      val p = Tables.part(s, dir)
      val dict = p.select(col("p_type")).distinct()
        .withColumn("code",
          (dense_rank().over(Window.orderBy(col("p_type"))) - 1).cast("int"))
      val nd = dict.agg(count(lit(1)).as("__nd"))
      val encoded = p.join(broadcast(dict), Seq("p_type"))
        .select(col("p_partkey"), col("code"))
      encoded.join(broadcast(dict), Seq("code"))
        .groupBy(col("p_type"), col("code"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("p_partkey")).as("sum_partkey"))
        .crossJoin(broadcast(nd))
        .withColumn("bits_per_value",
          length(bin(col("__nd").cast("long") - 1)).cast("int"))
        .drop("__nd")
    }),

    // ---- EXT: data-driven data-quality rule engine ----
    "q420_dq_rule_engine" -> ((s, dir) =>
      // the governance pattern the static CHECK gates (q28, q208) cannot
      // express: the rule set arrives as DATA and is folded into ONE scan —
      // per-rule violation counts over orders without a pass per rule. The
      // same DqRules tuples generate the oracle's unrolled UNION, so the
      // two sides cannot drift.
      graft.operators.Relational.dataRuleAudit(
        Tables.orders(s, dir), DqRules)),

    // ---- EXT: Mondrian split-conformal prediction intervals ----
    "q421_split_conformal" -> ((s, dir) => {
      // distribution-free uncertainty quantification for a trained
      // predictor — the missing member of the eval family (q316 gives a
      // median CI, q274/q284 resample; this calibrates a PREDICTION
      // interval with finite-sample coverage). Split conformal, Mondrian
      // (per-group) flavor: train < 1998 fits the group-mean predictor,
      // 1998 is the calibration year, ≥ 1999 is held out. qhat = the
      // k-th smallest |residual| with k = ceil(0.9·(n_cal+1)), resolved by
      // integer rank against the per-group residual DISTRIBUTION table
      // (q316/q369's compressed-window trick); residuals are exact integer
      // cents, so every comparison is engine-exact. Coverage on the held-out
      // year then audits the 90% guarantee. Scale: the model and qhat
      // tables are group-cardinality-sized broadcasts; the corpus streams
      // once per split.
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, dir).select(
        col("o_orderpriority").as("priority"),
        (col("o_totalprice").cast(D) * 100).cast("long").as("cents"),
        col("o_orderdate").as("d"))
      val model = o.filter(col("d") < lit("1998-01-01"))
        .groupBy(col("priority"))
        .agg(count(lit(1)).as("n_train"),
          expr("sum(cents) div count(1)").as("yhat_cents"))
      val cal = o.filter(col("d") >= lit("1998-01-01") &&
          col("d") < lit("1999-01-01"))
        .join(broadcast(model), Seq("priority"))
        .withColumn("resid", abs(col("cents") - col("yhat_cents")))
      val wOrd = Window.partitionBy(col("priority")).orderBy(col("resid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("priority"))
      val qhat = cal.groupBy(col("priority"), col("resid"))
        .agg(count(lit(1)).as("__c"))
        .withColumn("__cc", sum(col("__c")).over(wOrd))
        .withColumn("__n", sum(col("__c")).over(wAll))
        .withColumn("__k", expr("(9 * (__n + 1) + 9) div 10"))
        .groupBy(col("priority"), col("__n").as("n_cal"))
        .agg(min(when(col("__cc") >= col("__k"), col("resid")))
          .as("qhat_cents"))
      o.filter(col("d") >= lit("1999-01-01"))
        .join(broadcast(model), Seq("priority"))
        .withColumn("resid", abs(col("cents") - col("yhat_cents")))
        .join(broadcast(qhat), Seq("priority"))
        .groupBy(col("priority"), col("n_train"), col("yhat_cents"),
          col("n_cal"), col("qhat_cents"))
        .agg(count(lit(1)).as("n_eval"),
          (round(sum(when(col("resid") <= col("qhat_cents"), 1L)
              .otherwise(0L)).cast("double") /
            count(lit(1)).cast("double"), 6) + lit(0.0d)).as("coverage"))
    }),

    // ---- EXT: largest-remainder token-budget apportionment ----
    "q422_token_apportionment" -> ((s, dir) => {
      // Hamilton (largest-remainder) apportionment of a FIXED training-token
      // budget across sources — the integral companion to q392's real-valued
      // mixing weights: floor shares by exact integer division, then the
      // B − Σfloor leftover units go to the largest remainders
      // (ties broken by source name). Σalloc == B exactly, by construction.
      // Scale: the rank window runs over the source table (dimension-sized
      // by definition); the corpus contributes one hash aggregate.
      // B·tokens stays in int64 here; at larger budgets widen to decimal.
      import org.apache.spark.sql.expressions.Window
      val B = 1000000L
      val src = Tables.documents(s, dir)
        .groupBy(col("source"))
        .agg(sum(size(graft.operators.TextOps.tokens(col("text")))
          .cast("long")).as("tokens"))
      val tot = src.agg(sum(col("tokens")).as("__t"))
      val based = src.crossJoin(broadcast(tot))
        .withColumn("base_alloc", expr(s"($B * tokens) div __t"))
        .withColumn("__rem",
          expr(s"$B * tokens - (($B * tokens) div __t) * __t"))
      val seats = based.agg((lit(B) - sum(col("base_alloc"))).as("__seats"))
      based.crossJoin(broadcast(seats))
        .withColumn("__rk",
          row_number().over(Window.orderBy(col("__rem").desc, col("source"))))
        .withColumn("extra",
          when(col("__rk") <= col("__seats"), 1L).otherwise(0L))
        .select(col("source"), col("tokens"), col("base_alloc"),
          col("extra"), (col("base_alloc") + col("extra")).as("alloc"))
    }),

    // ---- EXT: Johnson-Lindenstrauss sign-projection distortion audit ----
    "q423_jl_projection" -> ((s, dir) => {
      // the cheapest embedding-compression arm the suite lacked: project
      // 64-dim vectors to 16 dims with a DETERMINISTIC ±1 sign matrix
      // (md5 parity of 'jl_i_j' — reproducible by any engine with md5) and
      // audit norm preservation: ratio = ‖Px‖² / (k·‖x‖²), which JL
      // concentration puts near 1. Each projected coordinate is an EXACT
      // decimal sum of 6-dp-rounded components times ±1 (reduction-order
      // free); the two squared norms then go through the q39 sequential-dot
      // contract. Scale: the sign matrix is a 1024-row broadcast, the
      // corpus streams once, per-vector state is k coordinates.
      import s.implicits._
      def sgn(i: Int, j: Int): Int = {
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"jl_${i}_${j}".getBytes("UTF-8"))
        1 - 2 * ((h(0) & 0xff) % 2)
      }
      val signs = (for { i <- 1 to 64; j <- 1 to 16 }
        yield (i, j, sgn(i, j))).toSeq.toDF("i", "j", "sgn")
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("v"))
      val dx = emb.select(col("vec_id"), posexplode(col("v"))
          .as(Seq("__i0", "x")))
        .withColumn("i", col("__i0") + 1)
      val proj = dx.join(broadcast(signs), Seq("i"))
        .groupBy(col("vec_id"), col("j"))
        .agg(sum(round(col("x"), 6).cast("decimal(28,6)") * col("sgn"))
          .as("__pj"))
        .withColumn("pjd", round(col("__pj").cast("double"), 6))
        .groupBy(col("vec_id"))
        .agg(expr("transform(array_sort(collect_list(struct(j, pjd)))," +
          " t -> t.pjd)").as("p"))
      import graft.operators.Similarity
      def fmean(c: org.apache.spark.sql.Column) =
        floor(sum(c.cast("decimal(18,6)")).cast("double") /
          count(lit(1)).cast("double") * lit(1000000.0d) + lit(0.5d))
          .cast("double") / lit(1000000.0d) + lit(0.0d)
      emb.join(proj, Seq("vec_id"))
        .withColumn("__vr", expr("transform(v, x -> round(x, 6))"))
        .withColumn("__n2", Similarity.dotU(col("__vr"), col("__vr"), 64))
        .filter(col("__n2") > 0)
        .withColumn("ratio",
          round(Similarity.dotU(col("p"), col("p"), 16) /
            (lit(16.0d) * col("__n2")), 6))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          fmean(col("ratio")).as("mean_ratio"),
          min(col("ratio")).as("min_ratio"),
          max(col("ratio")).as("max_ratio"))
    }),

    // ---- EXT: time-respecting (temporal) reachability ----
    "q424_temporal_reachability" -> ((s, dir) => {
      // earliest-arrival reachability over a TEMPORAL graph — q145's BFS
      // answers "how far"; this answers "how soon": an edge stamped with
      // month m is traversable only at m ≥ the arrival time at its tail
      // (Pan & Saramäki temporal-path semantics), so reachability depends
      // on edge ORDER in time, not just topology. Min-arrival relaxation
      // is sound because earlier arrival never disables an edge (the
      // condition is monotone in arrival), so each round folds the
      // frontier with groupBy-min — state stays one row per node, never
      // one per path (the oracle enumerates paths; the engine must not).
      // 3 rounds of equi-join + hash agg, lineage cut per round.
      val ord = Tables.orders(s, dir).select(col("o_orderkey"),
        col("o_custkey"),
        ((year(col("o_orderdate")) - 1995) * 12 +
          month(col("o_orderdate")) - 1).as("m"))
      val half = Tables.lineitem(s, dir)
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"), col("m"))
        .distinct()
      val edges = half.union(half.select(col("dst").as("src"),
        col("src").as("dst"), col("m"))).localCheckpoint(false)
      var state = Tables.customer(s, dir).filter(col("c_custkey") <= 2)
        .select(concat(lit("c"), col("c_custkey")).as("node"),
          lit(0).as("arr"))
      for (_ <- 1 to 3) {
        val nxt = state.join(edges,
            state("node") === edges("src") && edges("m") >= state("arr"))
          .select(edges("dst").as("node"), edges("m").as("arr"))
        state = state.union(nxt).groupBy(col("node"))
          .agg(min(col("arr")).as("arr")).localCheckpoint(false)
      }
      state.select(col("node"), col("arr").cast("int")
        .as("first_reach_month"))
    }),

    // ---- EXT: interleaved curriculum schedule ----
    "q425_curriculum_interleave" -> ((s, dir) => {
      // deterministic training-data ORDERING: rank documents within each
      // source (longest-first difficulty proxy, doc_id tiebreak), then
      // interleave sources round-robin via slot algebra —
      // slot = (rank−1)·S + source_index — so no two same-source docs are
      // adjacent and the whole schedule is reproducible WITHOUT a global
      // sort: ranks are key-partitioned windows, the source index is a
      // dimension-sized window, and the slot is pure integer arithmetic.
      // The top-100 head of the schedule ships as the gate artifact
      // (TakeOrderedAndProject — one scan, no full materialization).
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars"))
      val srcIdx = docs.select(col("source")).distinct()
        .withColumn("__si", dense_rank().over(Window.orderBy(col("source"))))
      val nSrc = srcIdx.agg(count(lit(1)).as("__s"))
      docs
        .withColumn("rank", row_number().over(Window.partitionBy(col("source"))
          .orderBy(col("n_chars").desc, col("doc_id"))))
        .join(broadcast(srcIdx), Seq("source"))
        .crossJoin(broadcast(nSrc))
        .withColumn("slot",
          (col("rank") - 1).cast("long") * col("__s") + col("__si"))
        .orderBy(col("slot")).limit(100)
        .select(col("slot"), col("doc_id"), col("source"),
          col("rank").cast("int").as("rank"))
    }),

    // ---- EXT: RLE run-length encoding audit ----
    "q426_rle_audit" -> ((s, dir) => {
      // storage-planner companion to q419 (dictionary) / q246 (zone maps) /
      // q303 (compaction): how RLE-friendly is l_returnflag along the
      // file's natural order (l_linenumber within l_orderkey)? A run
      // starts where the flag differs from its lag — key-partitioned
      // windows only, so run detection never needs a global sort; run
      // starts at each partition head are counted conservatively (each
      // order opens a new run, the per-row-group reality of columnar RLE).
      import org.apache.spark.sql.expressions.Window
      // (l_linenumber, l_partkey, l_suppkey) is the total order within an
      // order — linenumber ALONE ties in the synthetic data, and a tied
      // lag() is engine-nondeterministic.
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      Tables.lineitem(s, dir)
        .withColumn("__start",
          when(lag(col("l_returnflag"), 1).over(w).isNull ||
            lag(col("l_returnflag"), 1).over(w) =!= col("l_returnflag"), 1L)
            .otherwise(0L))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"), sum(col("__start")).as("n_runs"))
        .withColumn("mean_run_len",
          round(col("n_rows").cast("double") /
            col("n_runs").cast("double"), 6) + lit(0.0d))
        .withColumn("rle_ratio",
          round(col("n_runs").cast("double") /
            col("n_rows").cast("double"), 6) + lit(0.0d))
    }),

    // ---- EXT: trajectory stay-point detection ----
    "q427_staypoints" -> ((s, dir) => {
      // trajectory mining over the event stream: with deterministic
      // synthetic coordinates (the q15 convention), a STAY is a maximal
      // run of ≥ 2 consecutive small movements (Chebyshev distance ≤ 50)
      // along each user's timeline — i.e. ≥ 3 points dwelling in one
      // place. Gaps-and-islands with key-partitioned windows only; all
      // comparisons exact integers. Per-user output: points, stay count,
      // longest dwell.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pts = Tables.events(s, dir)
        .withColumn("x", col("event_id") * 7 % 1000)
        .withColumn("y", col("event_id") * 13 % 1000)
        .withColumn("__near",
          when(greatest(abs(col("x") - lag(col("x"), 1).over(w)),
            abs(col("y") - lag(col("y"), 1).over(w))) <= 50, 1L)
            .otherwise(0L))
        .withColumn("__rn", row_number().over(w))
        .withColumn("__isl", col("__rn") -
          sum(col("__near")).over(w.rowsBetween(
            Window.unboundedPreceding, Window.currentRow)))
      val runs = pts.filter(col("__near") === 1)
        .groupBy(col("user_id"), col("__isl"))
        .agg(count(lit(1)).as("__len"))
        .filter(col("__len") >= 2)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_stays"),
          (max(col("__len")) + 1).as("longest_stay_points"))
      pts.groupBy(col("user_id")).agg(count(lit(1)).as("n_points"))
        .join(runs, Seq("user_id"), "left")
        .select(col("user_id"), col("n_points"),
          coalesce(col("n_stays"), lit(0L)).as("n_stays"),
          coalesce(col("longest_stay_points"), lit(0L))
            .as("longest_stay_points"))
    }),

    // ---- EXT: watermark-delay advisor (event-time disorder profile) ----
    "q428_watermark_advisor" -> ((s, dir) => {
      // the streaming-design question the T-gates assume an answer to:
      // how LATE do events actually arrive? Lateness of an event = the
      // running max event-time at its arrival (arrival order = event_id)
      // minus its own event-time; the p99 of that distribution IS the
      // withWatermark delay that keeps 99% of events inside the state
      // window. The running max over arrival order is computed WITHOUT a
      // global sort: two-level decomposition (the tokenBudgetSample
      // pattern) — per-block running max via key-partitioned windows +
      // a bounded block-prefix table broadcast back. Percentiles resolve
      // by integer rank on the (lateness-seconds, count) distribution.
      import org.apache.spark.sql.expressions.Window
      val B = 4096L
      val e = Tables.events(s, dir)
        .select(col("event_id"), unix_micros(col("ts")).as("tu"))
        .withColumn("__blk", expr(s"event_id div $B"))
      val wIn = Window.partitionBy(col("__blk")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val blkMax = e.groupBy(col("__blk")).agg(max(col("tu")).as("__bm"))
      val wPre = Window.orderBy(col("__blk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val prefix = blkMax
        .withColumn("__pre", max(col("__bm")).over(wPre))
        .select(col("__blk"), col("__pre"))
      val late = e
        .withColumn("__inr", max(col("tu")).over(wIn))
        .join(broadcast(prefix), Seq("__blk"))
        .withColumn("late",
          expr("(greatest(__inr, coalesce(__pre, __inr)) - tu) div 1000000"))
      val dist = late.groupBy(col("late")).agg(count(lit(1)).as("__c"))
      val wOrd = Window.orderBy(col("late"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      def pctl(p: Int) = min(when(col("__cc") >=
        expr(s"($p * __n + 99) div 100"), col("late"))).cast("bigint")
      dist
        .withColumn("__cc", sum(col("__c")).over(wOrd))
        .withColumn("__n", sum(col("__c")).over(
          Window.partitionBy(lit(1))))
        .agg(max(col("__n")).cast("bigint").as("n_events"),
          pctl(50).as("p50_lateness_s"),
          pctl(95).as("p95_lateness_s"),
          pctl(99).as("p99_lateness_s"))
        .withColumn("watermark_delay_s", col("p99_lateness_s"))
    }),

    // ---- EXT: columnar encoding advisor ----
    "q429_encoding_advisor" -> ((s, dir) => {
      // the DECISION layer over the storage-audit family (q419 dictionary,
      // q426 RLE, q246 zone maps): per column, exact NDV + run statistics
      // along the file order, folded into the encoding rule a columnar
      // writer applies — dictionary when the vocabulary is bounded, RLE
      // stacked on top when runs average ≥ 2 rows. ONE scan computes all
      // four columns' run flags in a single window pass; the multi-
      // countDistinct aggregate expands 4× in map-side partials but never
      // reshuffles the fact twice.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      def runFlag(c: org.apache.spark.sql.Column) =
        when(lag(c, 1).over(w).isNull || lag(c, 1).over(w) =!= c, 1L)
          .otherwise(0L)
      val t = Tables.lineitem(s, dir)
        .withColumn("__m",
          date_format(date_trunc("month", col("l_shipdate")), "yyyy-MM"))
        .select(col("l_returnflag").as("c1"), col("l_linestatus").as("c2"),
          col("__m").as("c3"), col("l_partkey").as("c4"),
          runFlag(col("l_returnflag")).as("r1"),
          runFlag(col("l_linestatus")).as("r2"),
          runFlag(date_format(date_trunc("month", col("l_shipdate")),
            "yyyy-MM")).as("r3"),
          runFlag(col("l_partkey")).as("r4"))
      val stats = t.agg(count(lit(1)).as("n"),
        countDistinct(col("c1")).as("d1"), sum(col("r1")).as("s1"),
        countDistinct(col("c2")).as("d2"), sum(col("r2")).as("s2"),
        countDistinct(col("c3")).as("d3"), sum(col("r3")).as("s3"),
        countDistinct(col("c4")).as("d4"), sum(col("r4")).as("s4"))
      val cols = Seq(("l_returnflag", "d1", "s1"),
        ("l_linestatus", "d2", "s2"), ("l_shipmonth", "d3", "s3"),
        ("l_partkey", "d4", "s4"))
      stats.select(explode(array(cols.map { case (nm, d, r) =>
          struct(lit(nm).as("column_name"), col("n").as("n_rows"),
            col(d).as("ndv"), col(r).as("n_runs"))
        }: _*)).as("s"))
        .select(col("s.column_name"), col("s.n_rows"), col("s.ndv"),
          col("s.n_runs"))
        .withColumn("bits_per_code",
          length(bin(col("ndv") - 1)).cast("int"))
        .withColumn("encoding",
          when(col("ndv") <= 4096 && col("n_runs") * 2 <= col("n_rows"),
            "DICT_RLE")
            .when(col("ndv") <= 4096, "DICT")
            .when(col("n_runs") * 2 <= col("n_rows"), "RLE")
            .otherwise("PLAIN"))
    }),

    // ---- EXT: concurrent-sessions curve (interval sweep) ----
    "q430_concurrency_curve" -> ((s, dir) => {
      // the capacity-planning question: how many sessions are OPEN at
      // once? Classic interval sweep (+1 at session start, −1 one second
      // after its end), with simultaneous boundaries folded atomically at
      // second grain so tie order cannot matter — then the running count
      // decomposes two-level by day (the q428 pattern): within-day
      // cumulative via key-partitioned windows + a bounded per-day net
      // table whose prefix sum is the midnight carry. Per day: peak
      // concurrency and sessions still open at midnight. The oracle keeps
      // its sanctioned single global window; the engine never sorts the
      // corpus globally.
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
        .withColumn("__s", col("ts").cast("long"))
      val sess = graft.operators.Relational
        .sessionize(ev, "user_id", "__s", 1800L, col("event_id"))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(col("__s")).as("st"), max(col("__s")).as("en"))
      val bounds = sess.select(col("st").as("t"), lit(1L).as("delta"))
        .union(sess.select((col("en") + 1).as("t"), lit(-1L).as("delta")))
      val net = bounds.groupBy(expr("t div 86400").as("day"), col("t"))
        .agg(sum(col("delta")).as("net"))
      val wDay = Window.partitionBy(col("day")).orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dayNet = net.groupBy(col("day")).agg(sum(col("net")).as("dnet"))
      val wPre = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val carry = dayNet
        .withColumn("carry", coalesce(sum(col("dnet")).over(wPre), lit(0L)))
        .select(col("day"), col("carry"), col("dnet"))
      net
        .withColumn("__cum", sum(col("net")).over(wDay))
        .join(broadcast(carry), Seq("day"))
        .groupBy(col("day"), col("carry"), col("dnet"))
        .agg(max(col("__cum") + col("carry")).as("peak_concurrent"))
        .select(col("day").as("day_num"), col("peak_concurrent"),
          (col("carry") + col("dnet")).as("open_at_midnight"))
    }),

    // ---- EXT: hierarchical path aggregation (critical path to root) ----
    "q431_path_aggregation" -> ((s, dir) => {
      // DAG scheduling analytics WITHOUT iteration: orders form a binary
      // in-tree (parent(k) = k >> 1, the synthetic-arm convention), each
      // node costing its max ship delay; the critical-path cost from a
      // node to the root is the sum of costs along its ancestor chain.
      // Because heap ancestors are CLOSED-FORM (k >> j, j = 0..20), the
      // whole path aggregation is one explode + ONE equi-join + one hash
      // aggregate — the O(n log n) enumeration replaces the log-round
      // pointer-doubling loop entirely; no iteration state at any scale.
      // depth(k) = len(bin(k)) − 1, exact integer algebra on both sides.
      val dur = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderkey") >= 1)
        .groupBy(col("o_orderkey").as("node"))
        .agg(max(datediff(col("l_shipdate").cast("date"),
          col("o_orderdate").cast("date"))).as("dur"))
      val anc = dur
        .select(col("node"), explode(sequence(lit(0), lit(20))).as("j"))
        .withColumn("anc", expr("shiftright(node, j)"))
        .filter(col("anc") >= 1)
      anc.join(dur.select(col("node").as("anc"), col("dur").as("adur")),
          Seq("anc"))
        .groupBy(col("node"))
        .agg(sum(col("adur")).as("path_cost"))
        .withColumn("depth", (length(bin(col("node"))) - 1).cast("int"))
        .groupBy(col("depth"))
        .agg(count(lit(1)).as("n_nodes"),
          sum(col("path_cost")).as("total_path_cost"),
          max(col("path_cost")).as("max_path_cost"))
    }),

    // ---- EXT: dataset card (corpus release summary) ----
    "q432_dataset_card" -> ((s, dir) => {
      // the one-row artifact a training-data release ships: corpus size,
      // composition, duplication and diversity — each field mirrors a
      // gate family elsewhere in the suite (q35 bag fingerprints, q392
      // token convention, q162's pinned per-term entropy rounding). Two
      // scans (token/fingerprint pass + language pass), everything else
      // is scalar algebra over broadcast aggregates.
      val d = Tables.documents(s, dir)
        .withColumn("__tok", size(split(col("text"), " ")).cast("long"))
        .withColumn("__fp", md5(array_join(array_sort(array_distinct(
          split(col("text"), " "))), " ")))
      val base = d.agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("__tok")).as("n_tokens"),
        countDistinct(col("__fp")).as("__nfp"))
      val langs = d.groupBy(col("lang")).agg(count(lit(1)).as("__c"))
      val ent = langs.crossJoin(broadcast(base.select(col("n_docs")
          .as("__n"))))
        .agg(sum(round(-(col("__c").cast("double") /
            col("__n").cast("double")) *
          log(col("__c").cast("double") / col("__n").cast("double")), 6)
          .cast("decimal(18,6)")).cast("double").as("lang_entropy"))
      base.crossJoin(broadcast(ent))
        .select(col("n_docs"), col("n_sources"), col("n_langs"),
          col("n_tokens"),
          (round(lit(1.0d) - col("__nfp").cast("double") /
            col("n_docs").cast("double"), 6) + lit(0.0d))
            .as("bag_dup_rate"),
          expr("n_tokens div n_docs").as("mean_doc_tokens"),
          col("lang_entropy"))
    }),

    // ---- EXT: native as-of join (custom LogicalPlan + Strategy + Exec) ----
    "q433_asof_native" -> ((s, dir) => {
      // q69's exact query through the custom-operator VERTICAL
      // (AsofJoinNode → AsofJoinStrategy → AsofJoinExec) instead of the
      // union+window rewrite: one sort per side inside the hash
      // co-partitioning, one forward merge pass with a single row of
      // state, left partitioning/ordering passed through. Same oracle
      // shape as q69 (DuckDB native ASOF LEFT JOIN).
      val ev = Tables.events(s, dir).select(col("event_id"),
        (col("user_id") % 25).as("k"),
        date_trunc("second", col("ts")).as("ets"))
      val rates = Tables.nation(s, dir)
        .select(col("n_nationkey").as("k"),
          explode(sequence(lit(0), lit(29))).as("d"))
        .select(col("k"),
          to_timestamp(date_add(lit("2024-01-01").cast("date"), col("d")))
            .as("eff"),
          (((col("k") * 31 + col("d") * 7) % 100).cast("double") / 10)
            .as("rate"))
      graft.operators.Joins
        .asofJoinNative(ev, rates, "k", "ets", "eff", Seq("rate"))
        .select("event_id", "k", "asof_rate")
    }),

    // ---- EXT: schema type-inference profiler ----
    "q434_type_inference" -> ((s, dir) => {
      // the CSV-ingestion question q429 doesn't answer: given STRING
      // columns, what type are they really? Each value classifies by
      // regex priority (integer → float → timestamp → other; identical
      // RE2-safe patterns both engines); the inferred type is the
      // narrowest class covering every non-null value. Doubles go
      // through a decimal cast before rendering — raw double→string
      // formatting is engine-specific, decimal rendering is not. One
      // scan, all four columns classified in a single aggregate.
      val t = Tables.orders(s, dir).select(
        col("o_orderkey").cast("string").as("c1"),
        col("o_totalprice").cast(D).cast("string").as("c2"),
        col("o_orderdate").cast("string").as("c3"),
        col("o_orderpriority").as("c4"))
      def cls(c: org.apache.spark.sql.Column) =
        when(c.rlike("^-?[0-9]+$"), "int")
          .when(c.rlike("^-?[0-9]+\\.[0-9]+$"), "float")
          .when(c.rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}"), "ts")
          .otherwise("other")
      val stats = t.agg(count(lit(1)).as("n"),
        sum(when(cls(col("c1")) === "int", 1L).otherwise(0L)).as("i1"),
        sum(when(cls(col("c1")) === "float", 1L).otherwise(0L)).as("f1"),
        sum(when(cls(col("c1")) === "ts", 1L).otherwise(0L)).as("t1"),
        sum(when(cls(col("c2")) === "int", 1L).otherwise(0L)).as("i2"),
        sum(when(cls(col("c2")) === "float", 1L).otherwise(0L)).as("f2"),
        sum(when(cls(col("c2")) === "ts", 1L).otherwise(0L)).as("t2"),
        sum(when(cls(col("c3")) === "int", 1L).otherwise(0L)).as("i3"),
        sum(when(cls(col("c3")) === "float", 1L).otherwise(0L)).as("f3"),
        sum(when(cls(col("c3")) === "ts", 1L).otherwise(0L)).as("t3"),
        sum(when(cls(col("c4")) === "int", 1L).otherwise(0L)).as("i4"),
        sum(when(cls(col("c4")) === "float", 1L).otherwise(0L)).as("f4"),
        sum(when(cls(col("c4")) === "ts", 1L).otherwise(0L)).as("t4"))
      val colsSpec = Seq(("o_orderkey", "i1", "f1", "t1"),
        ("o_totalprice", "i2", "f2", "t2"),
        ("o_orderdate", "i3", "f3", "t3"),
        ("o_orderpriority", "i4", "f4", "t4"))
      stats.select(explode(array(colsSpec.map { case (nm, i, f, ts) =>
          struct(lit(nm).as("column_name"), col("n").as("n_values"),
            col(i).as("n_int"), col(f).as("n_float"), col(ts).as("n_ts"))
        }: _*)).as("s"))
        .select(col("s.column_name"), col("s.n_values"), col("s.n_int"),
          col("s.n_float"), col("s.n_ts"))
        .withColumn("inferred_type",
          when(col("n_int") === col("n_values"), "BIGINT")
            .when(col("n_int") + col("n_float") === col("n_values"),
              "DOUBLE")
            .when(col("n_ts") === col("n_values"), "TIMESTAMP")
            .otherwise("STRING"))
    }),

    // ---- EXT: corpus boilerplate removal (C4-style shared-span drop) ----
    "q435_boilerplate_removal" -> ((s, dir) => {
      // sub-document dedup, the TRANSFORM q393's coverage audit measures:
      // documents split into 5-token chunks (the line analog for the
      // synthetic corpus), chunks appearing in ≥ 10 DISTINCT documents are
      // boilerplate, and each document is re-emitted without them. The
      // chunk table is corpus-token-sized (one shuffle on the chunk hash
      // computes document frequency); reassembly is a key-partitioned
      // ordered aggregation — document identity via md5 of the cleaned
      // text so the artifact stays narrow.
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), posexplode(split(col("text"), " "))
          .as(Seq("__p", "__w")))
        .withColumn("__chunk", expr("__p div 5"))
      val chunks = toks.groupBy(col("doc_id"), col("__chunk"))
        .agg(concat_ws(" ", expr(
          "transform(array_sort(collect_list(struct(__p, __w))), t -> t.__w)"))
          .as("__ctext"))
      val df = chunks.groupBy(col("__ctext"))
        .agg(countDistinct(col("doc_id")).as("__df"))
      chunks.join(df, Seq("__ctext"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("__df") >= 10, 1L).otherwise(0L)).as("n_removed"),
          md5(concat_ws(" ", expr("transform(array_sort(" +
            "collect_list(CASE WHEN __df < 10 THEN struct(__chunk, __ctext) END))," +
            " t -> t.__ctext)"))).as("cleaned_md5"))
    }),

    // ---- EXT: snapshot diff (CDC classification) ----
    "q436_snapshot_diff" -> ((s, dir) => {
      // the warehouse diff operator: two snapshots full-outer-joined on
      // the key, every row classified added / removed / changed /
      // unchanged, plus per-column change counts — the summary a CDC
      // pipeline emits per sync. Snapshot B derives deterministically
      // from A (the q200 dimNew convention): every 50th order re-priced,
      // every 97th dropped, synthetic new keys appended. ONE shuffle on
      // the key; comparisons in exact cents.
      val a = Tables.orders(s, dir).select(col("o_orderkey").as("k"),
        (col("o_totalprice").cast(D) * 100).cast("long").as("cents"),
        col("o_orderstatus").as("st"))
      val b0 = a.filter(col("k") % 97 =!= 0)
        .withColumn("cents",
          when(col("k") % 50 === 0, col("cents") + 1000L)
            .otherwise(col("cents")))
      val bNew = a.agg(max(col("k")).as("__m"))
        .select(explode(sequence(lit(1), lit(20))).as("__i"),
          col("__m"))
        .select((col("__m") + col("__i")).as("k"),
          (col("__i") * 12345L).as("cents"), lit("O").as("st"))
      val b = b0.unionByName(bNew)
      val j = a.select(col("k"), col("cents").as("ca"), col("st").as("sa"))
        .join(b.select(col("k"), col("cents").as("cb"), col("st").as("sb")),
          Seq("k"), "full_outer")
      j.select(
          when(col("ca").isNull, "added")
            .when(col("cb").isNull, "removed")
            .when(col("ca") =!= col("cb") || col("sa") =!= col("sb"),
              "changed")
            .otherwise("unchanged").as("change_class"),
          when(col("ca").isNotNull && col("cb").isNotNull &&
            col("ca") =!= col("cb"), 1L).otherwise(0L).as("__pc"),
          when(col("ca").isNotNull && col("cb").isNotNull &&
            col("sa") =!= col("sb"), 1L).otherwise(0L).as("__sc"))
        .groupBy(col("change_class"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("__pc")).as("n_price_changes"),
          sum(col("__sc")).as("n_status_changes"))
    }),

    // ---- EXT: feature-store point-in-time training matrix ----
    "q437_feature_matrix" -> ((s, dir) => {
      // THE feature-store operator: assemble a leakage-free training
      // matrix — for every label row (purchases = the spine), each
      // feature's value AS OF the label timestamp, never after it. Two
      // feature tables with different keys and version grains: the q69
      // rates dimension (native as-of operator) and a running
      // activity-count feature derived from the event stream itself
      // (union+window as-of) — chaining both engine implementations in
      // one pipeline. Point-in-time is the ≤ convention throughout.
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
      val spine = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          (col("user_id") % 25).as("k"),
          date_trunc("second", col("ts")).as("ets"))
      val rates = Tables.nation(s, dir)
        .select(col("n_nationkey").as("k"),
          explode(sequence(lit(0), lit(29))).as("d"))
        .select(col("k"),
          to_timestamp(date_add(lit("2024-01-01").cast("date"), col("d")))
            .as("eff"),
          (((col("k") * 31 + col("d") * 7) % 100).cast("double") / 10)
            .as("rate"))
      val wCum = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val activity = ev
        .withColumn("__cum", count(lit(1)).over(wCum))
        .groupBy(col("user_id"),
          date_trunc("second", col("ts")).as("vts"))
        .agg(max(col("__cum")).as("cum_events"))
      val f1 = graft.operators.Joins.asofJoinNative(
        spine, rates, "k", "ets", "eff", Seq("rate"))
      graft.operators.Joins.asofJoin(
          f1, activity, "user_id", "ets", "vts", Seq("cum_events"))
        .select(col("event_id"), col("user_id"), col("k"),
          col("asof_rate"), col("asof_cum_events"))
    }),

    // ---- EXT: delta + varint encoding advisor (integer column arm) ----
    "q438_delta_encoding" -> ((s, dir) => {
      // completes q429's encoding family for SORTED INTEGER keys: gaps
      // between consecutive distinct orderkeys, varint-encoded — the
      // delta-compression size a columnar writer would achieve. Gap
      // computation never sorts globally: the q377 bucket decomposition
      // (8192-key buckets → within-bucket lag windows + one lead over the
      // compressed per-bucket summary for boundary gaps). varint width is
      // exact integer algebra on both engines. First key costs a full
      // 8-byte anchor.
      import org.apache.spark.sql.expressions.Window
      val keys = Tables.orders(s, dir)
        .select(col("o_orderkey").as("key")).distinct()
        .withColumn("__b", expr("key div 8192"))
      val wIn = Window.partitionBy(col("__b")).orderBy(col("key"))
      val inGaps = keys
        .withColumn("__gap", col("key") - lag(col("key"), 1).over(wIn))
      val bsum = keys.groupBy(col("__b"))
        .agg(min(col("key")).as("__mn"), max(col("key")).as("__mx"))
      val wB = Window.orderBy(col("__b"))
      val boundary = bsum
        .withColumn("__gap", col("__mn") - lag(col("__mx"), 1).over(wB))
        .select(col("__gap"))
      def vbytes(g: org.apache.spark.sql.Column) =
        lit(1L) + (g >= 128L).cast("long") + (g >= 16384L).cast("long") +
          (g >= 2097152L).cast("long") + (g >= 268435456L).cast("long")
      inGaps.select(col("__gap"))
        .unionByName(boundary)
        .filter(col("__gap").isNotNull)
        .agg((count(lit(1)) + 1).as("n_keys"),
          max(col("__gap")).as("max_gap"),
          (sum(vbytes(col("__gap"))) + 8L).as("delta_bytes"),
          ((count(lit(1)) + 1) * 8).as("plain_bytes"))
        .withColumn("compression_ratio",
          round(col("plain_bytes").cast("double") /
            col("delta_bytes").cast("double"), 6) + lit(0.0d))
    }),

    // ---- EXT: multimodal microbatch manifest (bucketed batch packing) ----
    "q439_microbatch_manifest" -> ((s, dir) => {
      // the step AFTER q256's aspect bucketing: pack each bucket's images
      // into fixed-size training microbatches (32, drop-last — uniform
      // shapes per batch is the whole point of bucketing). Batch id is
      // pure slot algebra over the per-bucket rank (key-partitioned
      // window); the summary carries a per-bucket membership checksum
      // (exact integer sum of batched doc_ids) so the manifest is
      // reproducible byte-for-byte.
      import org.apache.spark.sql.expressions.Window
      val buckets = s.createDataFrame(Seq(
        (1, 1024, 1024), (2, 1152, 896), (3, 896, 1152),
        (4, 1216, 832), (5, 832, 1216), (6, 1344, 768), (7, 768, 1344)
      )).toDF("bidx", "bw", "bh")
      val imgs = Tables.documents(s, dir).select(col("doc_id"),
        (lit(256) + col("doc_id") % 1024).cast("double").as("w"),
        (lit(256) + (col("doc_id") * 7) % 1024).cast("double").as("h"))
      val scored = imgs.crossJoin(broadcast(buckets))
        .withColumn("diff", round(abs(
          log(col("w") / col("h")) -
            log(col("bw").cast("double") / col("bh").cast("double"))), 9))
      val wPick = Window.partitionBy(col("doc_id"))
        .orderBy(col("diff"), col("bidx"))
      val assigned = scored.withColumn("rn", row_number().over(wPick))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("bidx"), col("bw"), col("bh"))
      val wRank = Window.partitionBy(col("bidx")).orderBy(col("doc_id"))
      assigned
        .withColumn("__r", row_number().over(wRank))
        .withColumn("__nb", count(lit(1)).over(
          Window.partitionBy(col("bidx"))))
        .withColumn("__batched", expr("__r <= (__nb div 32) * 32"))
        .groupBy(col("bidx"), col("bw"), col("bh"))
        .agg(count(lit(1)).as("n_images"),
          expr("count(1) div 32").as("n_batches"),
          (count(lit(1)) - (expr("count(1) div 32") * 32)).as("n_dropped"),
          sum(when(col("__batched"), col("doc_id")).otherwise(0L))
            .as("batched_docid_sum"))
    }),

    // ---- EXT: reproducibility shard manifest ----
    "q440_shard_manifest" -> ((s, dir) => {
      // the dataset-release manifest: deterministic md5 sharding, and per
      // shard an ORDER-INSENSITIVE content checksum (bit_xor of each
      // document's 56-bit md5 prefix) plus row/token accounting — the
      // artifact that lets two independent runs prove they produced the
      // same shards without sorting anything. One hash aggregate; XOR
      // state is constant-size at any scale.
      Tables.documents(s, dir)
        .withColumn("__shard",
          graft.operators.Sampling.hashBucket(col("doc_id"), 16))
        .withColumn("__h",
          conv(substring(md5(col("text")), 1, 14), 16, 10).cast("long"))
        .groupBy(col("__shard").as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
          expr("bit_xor(__h)").as("content_xor"))
    }),

    // ---- EXT: DataSource V2 GeoJSONL reader, end to end ----
    "q441_geojson_source" -> ((s, dir) => {
      // the custom-CONNECTOR vertical (TableProvider → Table → ScanBuilder
      // with column pruning → per-file InputPartitions → InternalRow
      // reader): one GeoJSON feature per customer is written as GeoJSONL
      // shards via the text sink, read back through
      // format("graft-geojson"), and aggregated — identity against the
      // oracle's recomputation from the source table proves the writer,
      // the parser, and the nested InternalRow construction (ring array,
      // props map) byte-exact. Coordinates are integers in the JSON so
      // no engine renders a float.
      val root = java.nio.file.Files
        .createTempDirectory("graft_geojson").toString
      Tables.customer(s, dir)
        .select(concat(
          lit("{\"type\":\"Feature\",\"id\":\"c"), col("c_custkey"),
          lit("\",\"geometry\":{\"type\":\"Polygon\",\"coordinates\":[[["),
          (col("c_custkey") % 20) * 10, lit(","),
          expr("(c_custkey div 20) * 10"), lit("],["),
          (col("c_custkey") % 20) * 10 + 5, lit(","),
          expr("(c_custkey div 20) * 10"), lit("],["),
          (col("c_custkey") % 20) * 10 + 5, lit(","),
          expr("(c_custkey div 20) * 10 + 5"), lit("],["),
          (col("c_custkey") % 20) * 10, lit(","),
          expr("(c_custkey div 20) * 10 + 5"), lit("],["),
          (col("c_custkey") % 20) * 10, lit(","),
          expr("(c_custkey div 20) * 10"),
          lit("]]]},\"properties\":{\"name\":\""), col("c_name"),
          lit("\"}}")).as("value"))
        .write.mode("overwrite").text(root)
      s.read.format("graft-geojson").load(root)
        .select(col("gtype"), length(col("id")).as("idlen"),
          size(col("ring")).as("nv"),
          expr("ring[0][0]").as("x0"), expr("ring[2][0]").as("x2"),
          length(element_at(col("props"), "name")).as("namelen"))
        .groupBy(col("gtype"))
        .agg(count(lit(1)).as("n_features"),
          sum(col("nv").cast("long")).as("n_vertices"),
          min(col("x0")).cast("long").as("min_x"),
          max(col("x2")).cast("long").as("max_x"),
          sum(col("idlen").cast("long")).as("sum_id_len"),
          sum(col("namelen").cast("long")).as("sum_name_len"))
    }),

    // ---- EXT: streaming arm of the GeoJSONL connector ----
    "q442_stream_geojson" -> ((s, dir) => {
      // the connector's MicroBatchStream, replay-gated like the other
      // T gates: shards appended BETWEEN micro-batches advance the
      // file-count offset one shard at a time; the final complete-mode
      // aggregate must equal the batch view — exactly-once across
      // offsets. Squares (even keys, 5 vertices) vs triangles (odd, 4)
      // give the aggregate two groups to conserve.
      val x = (col("c_custkey") % 20) * 10
      def pt(px: org.apache.spark.sql.Column,
             py: org.apache.spark.sql.Column) =
        concat(lit("["), px, lit(","), py, lit("]"))
      val y = expr("(c_custkey div 20) * 10")
      val square = concat(pt(x, y), lit(","), pt(x + 5, y), lit(","),
        pt(x + 5, expr("(c_custkey div 20) * 10 + 5")), lit(","),
        pt(x, expr("(c_custkey div 20) * 10 + 5")), lit(","), pt(x, y))
      val triangle = concat(pt(x, y), lit(","), pt(x + 5, y), lit(","),
        pt(x, expr("(c_custkey div 20) * 10 + 5")), lit(","), pt(x, y))
      val lines = Tables.customer(s, dir).select(col("c_custkey"), concat(
        lit("{\"type\":\"Feature\",\"id\":\"c"), col("c_custkey"),
        lit("\",\"geometry\":{\"type\":\"Polygon\",\"coordinates\":[["),
        when(col("c_custkey") % 2 === 0, square).otherwise(triangle),
        lit("]]},\"properties\":{}}")).as("line"))
      graft.streaming.Streams.replayedGeoJsonStream(
        s, lines, col("c_custkey"), chunks = 3,
        name = "geojson_stream")
    }),

    // ---- EXT: SemDeDup (semantic dedup — cluster then prune) ----
    "q443_semdedup" -> ((s, dir) =>
      // the published semantic-dedup recipe (cluster embeddings, prune
      // ε-close pairs WITHIN clusters only): threshold 0.35 sits at the
      // fixture's cosine tail exactly like q51's 0.4 (near-random vectors;
      // production thresholds are recall-asserted on planted dups in
      // SpatialKnnSpec). k=8 matches q186's centroid fit so the cluster
      // assignment reuses a proven-lockstep kernel.
      graft.operators.Similarity.semDedup(
        Tables.spread(s, Tables.embeddings(s, dir)), "vec_id", "embedding",
        k = 8, dim = 64, threshold = 0.35)),

    // ---- EXT: incremental view maintenance (signed-delta merge) ----
    "q444_incremental_view" -> ((s, dir) => {
      // counting-IVM correctness gate: materialize a rollup over a BASE
      // subset, absorb an insert+delete delta through the signed-delta
      // merge (base table never rescanned), and the ORACLE recomputes the
      // refreshed view from scratch — merged == recomputed proves the
      // delta algebra. Inserts: orderkey ≡ 0 (mod 10) (held out of the
      // base); deletes: base rows with orderkey ≡ 0 (mod 7).
      val o = Tables.orders(s, dir).select(col("o_orderkey"),
        col("o_orderpriority"),
        year(col("o_orderdate")).cast("long").as("yr"),
        col("o_totalprice").cast(D).as("rev"))
      val base = o.filter(col("o_orderkey") % 10 =!= 0)
      val view0 = base.groupBy(col("o_orderpriority"), col("yr"))
        .agg(count(lit(1)).as("n"), sum(col("rev")).as("rev"))
      val delta = o.filter(col("o_orderkey") % 10 === 0)
        .withColumn("sign", lit(1))
        .unionByName(base.filter(col("o_orderkey") % 7 === 0)
          .withColumn("sign", lit(-1)))
        .select(col("o_orderpriority"), col("yr"), col("rev"), col("sign"))
      graft.operators.Incremental.mergeAggDelta(view0, delta,
          Seq("o_orderpriority", "yr"), "n", Seq("rev"))
        .select(col("o_orderpriority"), col("yr"), col("n"),
          (round(col("rev").cast("double"), 2) + lit(0.0d)).as("revenue"))
    }),

    // ---- EXT: ε-DP noisy histogram (deterministic Laplace audit) ----
    "q445_dp_histogram" -> ((s, dir) => {
      // disclosure-control companion to q401–q403: Laplace(1/ε) noise via
      // the inverse CDF on an md5-derived uniform (u = (2h+1)/2^33 — an
      // odd dyadic, so u ≠ 1/2 and the log argument never hits 0), ε=0.5.
      // Deterministic noise is the TESTABLE skeleton of the DP release;
      // swapping the md5 uniform for a real RNG is the one-line production
      // change. Noise is 6-dp rounded before the add (ln-ulp discipline).
      val eps = 0.5
      Tables.events(s, dir).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("__u",
          (conv(substring(md5(concat(lit("dp:"), col("event_type"))), 1, 8),
            16, 10).cast("long").cast("double") + lit(0.5d)) / lit(4294967296.0d))
        .withColumn("__noise", round(
          lit(-1.0 / eps) * signum(col("__u") - lit(0.5d)) *
            log(lit(1.0d) - lit(2.0d) * abs(col("__u") - lit(0.5d))), 6))
        .select(col("event_type"), col("n"),
          (round(col("n").cast("double") + col("__noise"), 6) + lit(0.0d))
            .as("noisy_n"),
          (abs(col("__noise")) + lit(0.0d)).as("abs_err"))
    }),

    // ---- EXT: DoReMi-style domain reweighting (one MW update) ----
    "q446_domain_reweight" -> ((s, dir) =>
      // data-mixture tuning: per-source mean unigram surprisal (the q88
      // loss proxy) drives one multiplicative-weights update
      // w ∝ exp(η·(loss − mean loss)) — up-weight domains the reference
      // model finds hard, the DoReMi recipe's inner step. All boundary
      // math in 1e6-scaled integers (half-away floors both sides).
      graft.operators.TextOps.domainReweight(
        Tables.documents(s, dir), "source", "text", eta = 1.0)),

    // ---- EXT: DSv2 aggregate pushdown (COUNT(*) at metadata speed) ----
    "q447_count_pushdown" -> ((s, dir) => {
      // the connector's SupportsPushDownAggregates arm: COUNT(*) over a
      // GeoJSONL lake never parses a feature — each shard answers one
      // partial-count row (non-blank line count) and Spark sums the
      // partials. The plan shape (GeoJsonCountScan, no row-path parse) is
      // spec-asserted in Wave15Spec; this gate pins the ANSWER against
      // the source-table oracle across multiple shards.
      val root = java.nio.file.Files
        .createTempDirectory("graft_geojson_cnt").toString
      Tables.customer(s, dir)
        .select(concat(
          lit("{\"type\":\"Feature\",\"id\":\"c"), col("c_custkey"),
          lit("\",\"geometry\":{\"type\":\"Polygon\",\"coordinates\":" +
            "[[[0,0],[1,0],[1,1],[0,0]]]},\"properties\":{}}")).as("value"))
        .repartition(4)
        .write.mode("overwrite").text(root)
      s.read.format("graft-geojson").load(root)
        .createOrReplaceTempView("__geojson_cnt")
      s.sql("SELECT count(*) AS n_features FROM __geojson_cnt")
    }),

    // ---- EXT: DSv2 LIMIT pushdown (shard readers stop early) ----
    "q473_limit_pushdown" -> ((s, dir) => {
      // the connector's SupportsPushDownLimit arm: LIMIT n caps every
      // shard reader at n rows (partial push — the engine applies the
      // global limit on top), so a LIMIT-k probe over a 100 TB lake
      // reads k lines per shard head, never the lake. The early-stop
      // behavior is spec-asserted (GeoJsonSourceSpec reader counter);
      // this gate pins the two ANSWERS a user sees: the limited count
      // and the (aggregate-pushed) full count from the same lake.
      val root = java.nio.file.Files
        .createTempDirectory("graft_geojson_lim").toString
      Tables.customer(s, dir)
        .select(concat(
          lit("{\"type\":\"Feature\",\"id\":\"c"), col("c_custkey"),
          lit("\",\"geometry\":{\"type\":\"Point\",\"coordinates\":" +
            "[[0,0]]},\"properties\":{}}")).as("value"))
        .repartition(4)
        .write.mode("overwrite").text(root)
      val lake = s.read.format("graft-geojson").load(root)
      lake.limit(7).agg(count(lit(1)).as("n_limited"))
        .crossJoin(lake.agg(count(lit(1)).as("n_total")))
        .select(col("n_limited"), col("n_total"))
    }),

    // ---- EXT: storage-partitioned join over co-bucketed lakes ----
    "q448_spj_join" -> ((s, dir) => {
      // two GeoJSONL lakes laid out pkey=N/ and read bucketed: the
      // connector reports KeyGroupedPartitioning, so the fact⋈dim join
      // below plans ZERO exchanges (SPJ — proven structurally in
      // StoragePartitionedJoinSpec; this gate pins the ANSWER through
      // that plan against a plain SQL oracle). The 100 TB claim: two
      // co-bucketed lakes of any size join as a per-bucket zip.
      def lake(df: org.apache.spark.sql.DataFrame): String = {
        val root = java.nio.file.Files
          .createTempDirectory("graft_geojson_spj").toString
        df.repartition(col("pkey"))
          .write.partitionBy("pkey").mode("overwrite").text(root)
        root
      }
      val lroot = lake(Tables.customer(s, dir)
        .select((col("c_custkey") % 8).cast("int").as("pkey"),
          concat(lit("{\"type\":\"Feature\",\"id\":\"c"), col("c_custkey"),
            lit("\",\"geometry\":{\"type\":\"Polygon\",\"coordinates\":" +
              "[[[0,0],[1,0],[1,1],[0,0]]]},\"properties\":{\"name\":\""),
            col("c_name"), lit("\"}}")).as("value")))
      val rroot = lake(Tables.orders(s, dir)
        .select((col("o_custkey") % 8).cast("int").as("pkey"),
          concat(lit("{\"type\":\"Feature\",\"id\":\"c"), col("o_custkey"),
            lit("\",\"geometry\":{\"type\":\"Polygon\",\"coordinates\":" +
              "[[[0,0],[1,0],[1,1],[0,0]]]},\"properties\":{\"okey\":\""),
            col("o_orderkey"), lit("\"}}")).as("value")))
      def rd(p: String) = s.read.format("graft-geojson")
        .option("bucketed", "true").load(p)
      rd(lroot).as("l").join(rd(rroot).as("r"), Seq("pkey", "id"))
        .groupBy(col("pkey"))
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("id")).as("n_customers"),
          sum(length(element_at(col("l.props"), "name")).cast("long"))
            .as("sum_name_len"))
    }),

    // ---- EXT: V2 writer round-trip (commit-protocol write arm) ----
    "q449_v2_write_roundtrip" -> ((s, dir) => {
      // q441 through the connector's OWN write path instead of the text
      // sink: DataFrame rows → GeoJsonShardWriter temp files → commit
      // renames → reader. Equality with the q441-shape oracle proves the
      // serializer, the commit protocol, and the parser are inverse to
      // each other (integer-exact coordinate rendering keeps the
      // round-trip byte-deterministic).
      val root = java.nio.file.Files
        .createTempDirectory("graft_geojson_w").toString
      val x = (col("c_custkey") % 20).cast("double") * 10
      val y = expr("cast(c_custkey div 20 as double)") * 10
      Tables.customer(s, dir).select(
          concat(lit("c"), col("c_custkey")).as("id"),
          lit("Polygon").as("gtype"),
          array(array(x, y), array(x + 5, y), array(x + 5, y + 5),
            array(x, y + 5), array(x, y)).as("ring"),
          map(lit("name"), col("c_name")).as("props"))
        .write.format("graft-geojson").mode("overwrite").save(root)
      s.read.format("graft-geojson").load(root)
        .select(col("gtype"), length(col("id")).as("idlen"),
          size(col("ring")).as("nv"),
          expr("ring[0][0]").as("x0"), expr("ring[2][0]").as("x2"),
          length(element_at(col("props"), "name")).as("namelen"))
        .groupBy(col("gtype"))
        .agg(count(lit(1)).as("n_features"),
          sum(col("nv").cast("long")).as("n_vertices"),
          min(col("x0")).cast("long").as("min_x"),
          max(col("x2")).cast("long").as("max_x"),
          sum(col("idlen").cast("long")).as("sum_id_len"),
          sum(col("namelen").cast("long")).as("sum_name_len"))
    }),

    // ---- EXT: unigram-LM Viterbi segmentation (SentencePiece decode) ----
    "q450_viterbi_segment" -> ((s, dir) =>
      // the tokenizer family's decode half (BPE merge learning is q391):
      // min-surprisal segmentation over a corpus-derived 512-piece
      // vocabulary, reported as the fertility curve per word length
      graft.operators.TextOps.viterbiSegment(
        Tables.documents(s, dir), "text",
        vocabSize = 512, maxLen = 12, maxPiece = 4)),

    // ---- T: FULL OUTER stream-stream interval join ----
    // ---- Streaming: transformWithState (Spark 4 stateful API) ----
    "q466_stream_transform_with_state" -> ((s, dir) =>
      // per-user running event numbers through a named ValueState in the
      // RocksDB store; chunked replay must continue counting across
      // micro-batches — equals the batch row_number rule
      graft.streaming.Streams.replayedRunningCount(
        s, Tables.events(s, dir), chunks = 3, name = "running_count")),

    // ---- Streaming: event-time timers (transformWithState) ----
    "q467_stream_session_timers" -> ((s, dir) =>
      // per-user 30-min sessions where the LAST session closes via a
      // registered event-time timer (handleExpiredTimer), not a closing
      // event; gap boundaries decided in exact micros. Equals the batch
      // gaps-and-islands sessionization.
      graft.streaming.Streams.replayedSessionTimers(
        s, Tables.events(s, dir), chunks = 3, name = "session_timers")),

    // ---- Streaming: ListState ring buffer (transformWithState) ----
    "q470_stream_lastk_path" -> ((s, dir) =>
      // per-user last-3 event-type path via a ListState trimmed to k —
      // ordered recent history as O(k) state; equals the batch
      // lag-window paths for any time-ordered replay
      graft.streaming.Streams.replayedLastKPath(
        s, Tables.events(s, dir), chunks = 3, k = 3, name = "lastk_path")),

    // ---- Streaming: MapState keyed submap (transformWithState) ----
    "q471_stream_type_counts" -> ((s, dir) =>
      // per-(user, type) running counters in ONE MapState per user —
      // state O(type vocabulary) per key; equals the batch per-(user,
      // type) row_number
      graft.streaming.Streams.replayedTypeCounts(
        s, Tables.events(s, dir), chunks = 3, name = "type_counts")),

    // ---- Streaming: initial-state bootstrap (transformWithState) ----
    "q480_stream_seeded_count" -> ((s, dir) =>
      // lambda cutover: batch backfill seeds per-user counters via
      // handleInitialState, the stream continues numbering from the
      // cutoff — output equals the all-events batch row_number
      // restricted to the streamed half
      graft.streaming.Streams.replayedSeededCount(
        s, Tables.events(s, dir), chunks = 3, name = "seeded_count")),

    "q452_stream_full_interval_join" -> ((s, dir) =>
      // the outer-join matrix's last cell (inner q108, left q244):
      // unmatched rows on BOTH sides emit null-extended exactly once,
      // each driven by watermark progress past its own horizon —
      // time-sliced replay + flush sentinels; result == batch full join
      graft.streaming.Streams.replayedFullIntervalJoin(
        s, Tables.events(s, dir), chunks = 3,
        name = "full_interval_join")),

    // ---- SQL surface: SQL-defined scalar UDF (CREATE FUNCTION) ----
    "q453_sql_udf" -> ((s, dir) => {
      // Spark 4's SQL scalar UDFs: business logic DECLARED in SQL and
      // inlined by Catalyst into the plan (no JVM closure, full codegen)
      // — the engine-native answer to the reference's app-layer helper
      // functions. The oracle inlines the same CASE, proving the UDF is
      // a pure view over the expression.
      Tables.registerAll(s, dir)
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_tier(d DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN d < 0.02 THEN 'low'
                    WHEN d < 0.06 THEN 'mid' ELSE 'high' END""")
      s.sql("""SELECT graft_disc_tier(l_discount) AS tier,
          count(*) AS n,
          round(cast(sum(cast(l_quantity AS decimal(18,2))) AS double), 2)
            + 0.0 AS total_qty
        FROM lineitem GROUP BY 1""")
    }),

    // ---- SQL surface: collation-aware comparison and distinct ----
    "q454_collation" -> ((s, dir) => {
      // Spark 4 collations: case-insensitive equality and DISTINCT via
      // UTF8_LCASE on a deliberately case-mangled column — the
      // engine-level answer to the reference's citext-style lookups
      // (lower() on both sides is the portable oracle mirror).
      Tables.registerAll(s, dir)
      s.sql("""WITH m AS (SELECT CASE WHEN c_custkey % 2 = 0
               THEN upper(c_mktsegment) ELSE lower(c_mktsegment) END AS seg
             FROM customer)
           SELECT count(*) AS n_total,
             count(CASE WHEN seg COLLATE UTF8_LCASE = 'building'
               THEN 1 END) AS n_building,
             cast(count(DISTINCT seg COLLATE UTF8_LCASE) AS bigint)
               AS n_segments,
             cast(count(DISTINCT seg) AS bigint) AS n_raw_variants
           FROM m""")
    }),

    // ---- SQL surface: pipe syntax (|>) ----
    "q455_pipe_sql" -> ((s, dir) => {
      // Spark 4 SQL pipe syntax: the same relational algebra, staged
      // left-to-right; must plan and answer identically to the classic
      // form the oracle uses
      Tables.registerAll(s, dir)
      s.sql("""FROM orders
        |> WHERE year(o_orderdate) = 1996
        |> AGGREGATE count(*) AS n,
             round(cast(sum(cast(o_totalprice AS decimal(18,2)))
               AS double), 2) + 0.0 AS revenue
           GROUP BY o_orderpriority
        |> SELECT o_orderpriority, n, revenue""")
    }),

    // ---- EXT: Mann-Whitney U rank-sum test (compressed distribution) ----
    "q456_mann_whitney" -> ((s, dir) => {
      // two-sample rank test WITHOUT a global row sort: l_quantity has
      // ≤50 distinct values, so all rank algebra runs on the 50-row
      // compressed distribution (value → per-group counts). Tied ranks
      // stay exact by 2x-scaling (avg rank ×2 = 2·cum_before + n(v) + 1);
      // the tie-corrected normal z is the only double and goes through
      // the mirrored half-away floor (q370 discipline).
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, dir)
        .select(col("l_quantity").cast("int").as("v"),
          (col("l_linestatus") === "O").cast("long").as("g1"))
      val dist = li.groupBy("v")
        .agg(sum("g1").as("n1v"), (count(lit(1)) - sum("g1")).as("n2v"))
        .withColumn("nv", col("n1v") + col("n2v"))
      val w = Window.orderBy("v") // ≤50-row distribution table
      val ranked = dist.withColumn("cb", coalesce(
        sum("nv").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      ranked.agg(
          sum("n1v").as("n1"), sum("n2v").as("n2"),
          sum(col("n1v") * (lit(2L) * col("cb") + col("nv") + lit(1L)))
            .as("r1_x2"),
          sum(col("nv") * col("nv") * col("nv") - col("nv")).as("tt"))
        .select(col("n1"), col("n2"),
          (col("r1_x2") - col("n1") * (col("n1") + 1)).as("u1_x2"),
          (lit(2L) * col("n1") * col("n2")
            - (col("r1_x2") - col("n1") * (col("n1") + 1))).as("u2_x2"),
          (floor(((col("r1_x2") - col("n1") * (col("n1") + 1))
              .cast("double") / 2.0
            - (col("n1") * col("n2")).cast("double") / 2.0)
            / sqrt(col("n1").cast("double") * col("n2").cast("double")
              / 12.0
              * ((col("n1") + col("n2") + 1).cast("double")
                - col("tt").cast("double")
                  / ((col("n1") + col("n2")).cast("double")
                    * (col("n1") + col("n2") - 1).cast("double"))))
            * 1000000 + 0.5) / 1000000.0).as("z_approx"))
    }),

    // ---- EXT: Benjamini-Hochberg FDR over a test family ----
    "q457_bh_fdr" -> ((s, dir) => {
      // multiple-testing control for the per-nation return-rate screen:
      // one two-proportion z per supplier nation against the global rate,
      // then the BH step-up at α=0.05 stated in exact scaled-integer
      // algebra (p6·m·20 ≤ k·10^6 — no double threshold can flip a
      // boundary row between engines). Φ via the mirrored logistic
      // approximation 1/(1+exp(−1.702z)) — both engines run the same
      // IEEE ops, and the gate's subject is the step-up machinery, not
      // the tail approximation. Rank windows run on the 25-row nation
      // table only.
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, dir)
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("n_nationkey"), col("n_name"),
          (col("l_returnflag") === "R").cast("long").as("r"))
      val per = li.groupBy("n_nationkey", "n_name")
        .agg(count(lit(1)).as("n_li"), sum("r").as("x_ret"))
      val glob = per.agg(sum("n_li").as("nt"), sum("x_ret").as("xt"))
      val z = per.crossJoin(broadcast(glob))
        .withColumn("p0", col("xt").cast("double") / col("nt").cast("double"))
        .withColumn("z", (col("x_ret").cast("double")
            / col("n_li").cast("double") - col("p0"))
          / sqrt(col("p0") * (lit(1.0) - col("p0"))
            / col("n_li").cast("double")))
        .withColumn("p6", floor((lit(2.0) * (lit(1.0)
          - lit(1.0) / (lit(1.0) + exp(lit(-1.702) * abs(col("z"))))))
          * 1000000 + 0.5).cast("long"))
      val wr = Window.orderBy(col("p6"), col("n_nationkey"))
      val wAll = Window.partitionBy(lit(1)) // 25-row family
      val ranked = z.withColumn("rnk", row_number().over(wr))
        .withColumn("m", count(lit(1)).over(wAll))
        .withColumn("kmax", max(when(
          col("p6") * col("m") * 20 <= col("rnk") * lit(1000000L),
          col("rnk")).otherwise(lit(0))).over(wAll))
      ranked.select(col("n_name"), col("n_li"), col("x_ret"),
          (col("p6").cast("double") / 1000000.0).as("p_value"),
          col("rnk").cast("long").as("rnk"),
          (col("rnk") <= col("kmax")).cast("int").as("rejected"))
    }),

    // ---- EXT: difference-in-differences estimator ----
    "q458_did" -> ((s, dir) => {
      // the 2×2 causal panel in ONE conditional-aggregation pass:
      // treated = ASIA-region customers, post = orders from 1999 on,
      // outcome = mean order value. Sums stay exact in cents; each cell
      // mean is half-away-floored at 6dp FIRST, so the DiD contrast is
      // pure integer algebra at the 1e6 scale (no double subtraction
      // can diverge between engines).
      val cust = Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"),
          (col("r_name") === "ASIA").cast("int").as("treated"))
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"),
          (col("o_orderdate") >= lit("1999-01-01").cast("date"))
            .cast("int").as("post"),
          (col("o_totalprice").cast(D) * 100).cast("long").as("cents"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      def m6(t: Int, p: Int) = floor(
        sum(when(col("treated") === t && col("post") === p, col("cents")))
          .cast("double")
        / sum(when(col("treated") === t && col("post") === p, 1L))
        / 100.0 * 1000000 + 0.5).cast("long")
      def n(t: Int, p: Int) =
        sum(when(col("treated") === t && col("post") === p, 1L)).as(s"n$t$p")
      o.agg(n(0, 0), n(0, 1), n(1, 0), n(1, 1),
          m6(0, 0).as("m00"), m6(0, 1).as("m01"),
          m6(1, 0).as("m10"), m6(1, 1).as("m11"))
        .select(col("n00"), col("n01"), col("n10"), col("n11"),
          (col("m00").cast("double") / 1000000.0).as("mean_c_pre"),
          (col("m01").cast("double") / 1000000.0).as("mean_c_post"),
          (col("m10").cast("double") / 1000000.0).as("mean_t_pre"),
          (col("m11").cast("double") / 1000000.0).as("mean_t_post"),
          (((col("m11") - col("m10")) - (col("m01") - col("m00")))
            .cast("double") / 1000000.0).as("did"))
    }),

    // ---- EXT: coarsened exact matching (ATT) ----
    "q459_cem_att" -> ((s, dir) => {
      // observational causal estimate with exact-match strata: units are
      // customers (treatment = deterministic md5 parity — a testable
      // skeleton for a real exposure flag), outcome = lifetime spend,
      // strata = (nation, segment). Only strata holding BOTH arms
      // contribute; controls are reweighted to the treated distribution
      // (ATT weights = n_treated per stratum). Per-stratum means floored
      // at 6dp first so the weighted contrast is exact integer algebra;
      // the stratum table is dimension-sized (≤ 25×5 rows).
      val spend = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(D) * 100).cast("long").as("sc"))
      val cust = Tables.customer(s, dir)
        .join(spend, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_nationkey"), col("c_mktsegment"),
          coalesce(col("sc"), lit(0L)).as("cents"),
          (conv(substring(md5(concat(lit("cem:"),
            col("c_custkey").cast("string"))), 1, 8), 16, 10)
            .cast("long") % 2 === 0).cast("int").as("treated"))
      val cells = cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(sum(when(col("treated") === 1, 1L)).as("nt"),
          sum(when(col("treated") === 0, 1L)).as("nc"),
          sum(when(col("treated") === 1, col("cents"))).as("st"),
          sum(when(col("treated") === 0, col("cents"))).as("sc"))
      val matched = cells.filter(col("nt") > 0 && col("nc") > 0)
        .withColumn("d6",
          floor(col("st").cast("double") / col("nt") / 100.0
            * 1000000 + 0.5).cast("long")
          - floor(col("sc").cast("double") / col("nc") / 100.0
            * 1000000 + 0.5).cast("long"))
      cells.agg(count(lit(1)).as("n_cells")).crossJoin(
        matched.agg(count(lit(1)).as("n_matched"),
            sum("nt").as("n_treated_matched"),
            sum("nc").as("n_control_matched"),
            (floor(sum(col("nt") * col("d6")).cast("double")
              / sum("nt") + 0.5) / 1000000.0).as("att")))
        .select(col("n_cells"), col("n_matched"),
          col("n_treated_matched"), col("n_control_matched"), col("att"))
    }),

    // ---- EXT: permutation test (deterministic label reshuffles) ----
    "q460_permutation_test" -> ((s, dir) => {
      // exact-style significance WITHOUT distributional assumptions:
      // the observed open-vs-finished (l_linestatus) mean-quantity gap vs B=64 md5-parity
      // label permutations. Explode-by-64 is one hash aggregate over a
      // bounded multiple of the filtered fact (embarrassingly parallel —
      // the 100 TB shape); every mean diff is half-away-floored at 6dp
      // so 'as extreme' is an integer comparison. p = (1+#extreme)/(B+1).
      val li = Tables.lineitem(s, dir)
        .select(concat(col("l_orderkey").cast("string"), lit(":"),
            col("l_linenumber").cast("string")).as("key"),
          col("l_quantity").cast("long").as("v"),
          (col("l_linestatus") === "O").cast("int").as("g1"))
      val obs = li.groupBy("g1")
        .agg(count(lit(1)).as("n"), sum("v").as("s"))
        .agg(sum(when(col("g1") === 1, col("n"))).as("n1"),
          sum(when(col("g1") === 0, col("n"))).as("n2"),
          floor((sum(when(col("g1") === 1, col("s"))).cast("double")
              / sum(when(col("g1") === 1, col("n")))
            - sum(when(col("g1") === 0, col("s"))).cast("double")
              / sum(when(col("g1") === 0, col("n"))))
            * 1000000 + 0.5).cast("long").as("obs6"))
      val perms = li
        .select(col("key"), col("v"),
          explode(sequence(lit(1), lit(64))).as("b"))
        .withColumn("pg", (conv(substring(md5(concat(lit("pt:"),
          col("key"), lit(":"), col("b").cast("string"))), 1, 8), 16, 10)
          .cast("long") % 2).cast("int"))
        .groupBy("b", "pg")
        .agg(count(lit(1)).as("n"), sum("v").as("s"))
        .groupBy("b")
        .agg(floor((sum(when(col("pg") === 1, col("s"))).cast("double")
            / sum(when(col("pg") === 1, col("n")))
          - sum(when(col("pg") === 0, col("s"))).cast("double")
            / sum(when(col("pg") === 0, col("n"))))
          * 1000000 + 0.5).cast("long").as("d6"))
      perms.crossJoin(broadcast(obs))
        .agg(first(col("n1")).as("n1"), first(col("n2")).as("n2"),
          (first(col("obs6")).cast("double") / 1000000.0).as("obs_diff"),
          coalesce(sum(when(abs(col("d6")) >= abs(col("obs6")), 1L)),
            lit(0L)).as("n_extreme"))
        .withColumn("p_value",
          floor((col("n_extreme") + 1).cast("double") / 65.0
            * 1000000 + 0.5) / 1000000.0)
    }),

    // ---- EXT: Wilcoxon signed-rank test (paired years) ----
    "q461_wilcoxon_signed" -> ((s, dir) => {
      // the paired sibling of q456: per supplier nation, the 1997 vs
      // 1998 return-rate shift. Rates are 6dp-floored integers, so the
      // pair differences are exact; zero diffs drop (standard Wilcoxon);
      // |d| average ranks stay exact by 2x-scaling over the ≤25-row pair
      // table. w_plus_x2 + w_minus_x2 == 2·Σrank is the conservation
      // invariant the spec asserts.
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, dir)
        .filter(year(col("l_shipdate")).isin(1997, 1998))
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_nationkey"), year(col("l_shipdate")).as("y"),
          (col("l_returnflag") === "R").cast("long").as("r"))
      val rates = li.groupBy("s_nationkey", "y")
        .agg(floor(sum("r").cast("double") / count(lit(1))
          * 1000000 + 0.5).cast("long").as("rate6"))
      val pairs = rates.groupBy("s_nationkey")
        .agg(sum(when(col("y") === 1998, col("rate6"))).as("r98"),
          sum(when(col("y") === 1997, col("rate6"))).as("r97"),
          count(lit(1)).as("ny"))
        .filter(col("ny") === 2)
        .select(col("s_nationkey"), (col("r98") - col("r97")).as("d"))
      val nz = pairs.filter(col("d") =!= 0)
        .select(col("s_nationkey"), col("d"), abs(col("d")).as("ad"))
      val dist = nz.groupBy("ad").agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy("ad") // ≤25-row pair table
      val rankedVals = dist.withColumn("cb", coalesce(
        sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
        .select(col("ad").as("adv"),
          (lit(2L) * col("cb") + col("cnt") + 1).as("rank_x2"))
      val joined = nz.join(broadcast(rankedVals), col("ad") === col("adv"))
      pairs.agg(count(lit(1)).as("n_pairs")).crossJoin(
        joined.agg(count(lit(1)).as("n_nonzero"),
          coalesce(sum(when(col("d") > 0, col("rank_x2"))), lit(0L))
            .as("w_plus_x2"),
          coalesce(sum(when(col("d") < 0, col("rank_x2"))), lit(0L))
            .as("w_minus_x2")))
        .select(col("n_pairs"), col("n_nonzero"),
          col("w_plus_x2"), col("w_minus_x2"))
    }),

    // ---- SQL surface: session variables (DECLARE / SET VAR) ----
    "q462_session_variable" -> ((s, dir) => {
      // Spark 4 SQL session variables: a data-derived threshold staged
      // into a variable, then consumed by a second statement — the
      // engine-native answer to the reference's app-layer "compute
      // setting, then query with it" two-step. The threshold lives in
      // exact integer cents (floor of the mean) so the filter bound can
      // never straddle an engine-specific double; the oracle inlines the
      // same scalar through a CTE.
      Tables.registerAll(s, dir)
      s.sql("""DECLARE OR REPLACE VARIABLE thr_cents BIGINT DEFAULT 0""")
      s.sql("""SET VAR thr_cents = (SELECT cast(floor(
          sum(cast(cast(o_totalprice AS decimal(18,2)) * 100 AS bigint))
          / count(*)) AS bigint) FROM orders)""")
      s.sql("""SELECT o_orderpriority,
          count(*) AS n_above,
          round(cast(sum(cast(o_totalprice AS decimal(18,2)))
            AS double), 2) + 0.0 AS revenue_above
        FROM orders
        WHERE cast(cast(o_totalprice AS decimal(18,2)) * 100 AS bigint)
          > thr_cents
        GROUP BY o_orderpriority""")
    }),

    // ---- SQL surface: EXECUTE IMMEDIATE with bound parameters ----
    "q463_execute_immediate" -> ((s, dir) => {
      // dynamic SQL, engine-side: the statement text is data, the
      // parameters bind at execution (the reference's string-built
      // queries done safely). The oracle inlines the same constants —
      // EXECUTE IMMEDIATE must be a pure staging layer over the plan.
      Tables.registerAll(s, dir)
      s.sql("""EXECUTE IMMEDIATE
        'SELECT o_orderpriority, count(*) AS n,
           round(cast(sum(cast(o_totalprice AS decimal(18,2)))
             AS double), 2) + 0.0 AS revenue
         FROM orders WHERE o_orderdate >= ? AND o_orderdate < ?
         GROUP BY o_orderpriority'
        USING DATE '1998-01-01', DATE '1999-01-01'""")
    }),

    // ---- SQL surface: try_* error-safe arithmetic ----
    "q464_try_arithmetic" -> ((s, dir) => {
      // ANSI-mode-safe ratios: try_divide returns NULL where a raw
      // division would error (the suite runs ANSI-on everywhere else,
      // q415's CASE-guard lesson made native). Markup ratio per
      // lineitem; zero-discount rows surface as NULLs, counted — not
      // task-killing. Non-null ratios are 6dp-floored per row, then
      // exactly summed (bigint), so the aggregate is engine-exact.
      Tables.lineitem(s, dir)
        .select(col("l_discount"),
          try_divide(col("l_extendedprice"), col("l_discount")).as("m"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("m").isNull, 1L)).as("n_null_ratio"),
          count(col("m")).as("n_ok"),
          sum(when(col("m").isNotNull,
            floor(col("m") * 1000000 + 0.5).cast("long"))).as("sum_m6"))
        .select(col("n_rows"), col("n_null_ratio"), col("n_ok"),
          col("sum_m6"),
          (floor(col("sum_m6").cast("double") / col("n_ok") + 0.5)
            / 1000000.0).as("mean_markup"))
    }),

    // ---- EXT: homoglyph / zero-width skeleton dedup ----
    "q465_homoglyph_skeleton" -> ((s, dir) => {
      // spoof-resistant identity matching (UTS #39 skeleton, shrunk to a
      // testable confusable table): Cyrillic о/е lookalikes and
      // zero-width-space padding collapse to an ASCII skeleton via ONE
      // codegen'd translate (chars beyond the `to` string are deleted —
      // that's the ZWSP strip). Every customer emits its clean name AND
      // a deterministically spoofed variant; the skeleton must merge
      // exactly the spoofed pairs and nothing else — distinct-count
      // algebra proves both soundness and completeness.
      val c = Tables.customer(s, dir).select(col("c_custkey"),
        col("c_name"))
      val spoofed = c.select(
        when(col("c_custkey") % 3 === 1,
            translate(col("c_name"), "o", "\u043e"))
          .when(col("c_custkey") % 3 === 2,
            translate(col("c_name"), "e", "\u0435"))
          .otherwise(concat(col("c_name"), lit("\u200b")))
          .as("display_name"))
      val all = c.select(col("c_name").as("display_name"))
        .unionAll(spoofed)
        .withColumn("skeleton", translate(col("display_name"),
          "\u043e\u0435\u200b", "oe"))
      all.agg(count(lit(1)).as("n_rows"),
          countDistinct(col("display_name")).as("n_distinct_display"),
          countDistinct(col("skeleton")).as("n_distinct_skeleton"),
          sum(when(col("display_name") =!= col("skeleton"), 1L))
            .as("n_spoofed"))
        .select(col("n_rows"), col("n_distinct_display"),
          col("n_distinct_skeleton"), col("n_spoofed"),
          (col("n_distinct_display") - col("n_distinct_skeleton"))
            .as("n_merged_variants"))
    }),

    // ---- EXT: Cochran-Mantel-Haenszel stratified odds ratio ----
    "q468_cmh_odds" -> ((s, dir) => {
      // the confounder-adjusted sibling of q458/q459: exposure (deep
      // discount) vs outcome (return) pooled across supplier-nation
      // strata. Each stratum's 2×2 counts come from ONE conditional
      // aggregation; the rational CMH terms (ad/n, bc/n) and the
      // hypergeometric moments (E, Var) are 6dp-floored per stratum to
      // integers and exactly summed — double summation ORDER never
      // touches the result (25-row family, q342's rounded-term rule).
      // Var's 4-count product is computed in doubles on BOTH sides so it
      // cannot overflow int64 at any scale factor.
      val li = Tables.lineitem(s, dir)
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_nationkey"),
          (col("l_discount") >= 0.05).cast("int").as("e"),
          (col("l_returnflag") === "R").cast("int").as("r"))
      val strata = li.groupBy("s_nationkey").agg(
          count(when(col("e") === 1 && col("r") === 1, lit(1))).as("a"),
          count(when(col("e") === 1 && col("r") === 0, lit(1))).as("b"),
          count(when(col("e") === 0 && col("r") === 1, lit(1))).as("c"),
          count(when(col("e") === 0 && col("r") === 0, lit(1))).as("d"),
          count(lit(1)).as("n"))
        .select(col("a"), col("n"),
          floor((col("a") * col("d")).cast("double") / col("n")
            * 1000000 + 0.5).cast("long").as("num6"),
          floor((col("b") * col("c")).cast("double") / col("n")
            * 1000000 + 0.5).cast("long").as("den6"),
          floor((col("a") + col("b")).cast("double")
            * (col("a") + col("c")).cast("double") / col("n")
            * 1000000 + 0.5).cast("long").as("e6"),
          floor((col("a") + col("b")).cast("double")
            * (col("c") + col("d")).cast("double")
            * (col("a") + col("c")).cast("double")
            * (col("b") + col("d")).cast("double")
            / (col("n").cast("double") * col("n").cast("double")
              * (col("n") - 1).cast("double"))
            * 1000000 + 0.5).cast("long").as("v6"))
      strata.agg(count(lit(1)).as("n_strata"),
          sum("a").as("sum_a"), sum("num6").as("num6"),
          sum("den6").as("den6"), sum("e6").as("sume6"),
          sum("v6").as("sumv6"))
        .select(col("n_strata"), col("sum_a"),
          (col("sume6").cast("double") / 1000000.0).as("sum_expected"),
          (floor(col("num6").cast("double") / col("den6")
            * 1000000 + 0.5) / 1000000.0).as("or_cmh"),
          (floor(
            (abs(col("sum_a") * 1000000L - col("sume6")).cast("double")
              / 1000000.0 - 0.5)
            * (abs(col("sum_a") * 1000000L - col("sume6")).cast("double")
              / 1000000.0 - 0.5)
            / (col("sumv6").cast("double") / 1000000.0)
            * 1000000 + 0.5) / 1000000.0).as("chi2_cmh"))
    }),

    // ---- EXT: exact Shapley-value channel attribution ----
    "q472_shapley_attribution" -> ((s, dir) => {
      // game-theoretic credit, computed EXACTLY: 4 channels → 16
      // coalitions, so the characteristic function v(S) = converted
      // users whose touch set ⊆ S lives in a 16-row table built from ONE
      // corpus aggregate (exact-mask counts), and the Shapley sum runs
      // on a 4×8 bounded join. Weights ×4! = {6,2,2,6} keep every
      // marginal term an integer; the only division is the final /24.
      // Complements the positional heuristics (q397 linear, q416
      // U-shaped) with the axiomatic allocation.
      val ue = Tables.events(s, dir).groupBy("user_id").agg(
        (max(when(col("event_type") === "click", 1).otherwise(0))
          + max(when(col("event_type") === "view", 1).otherwise(0)) * 2
          + max(when(col("event_type") === "signup", 1).otherwise(0)) * 4
          + max(when(col("event_type") === "error", 1).otherwise(0)) * 8)
          .as("mask"),
        max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("conv"))
      val cnt = ue.filter(col("conv") === 1)
        .groupBy(col("mask").as("t")).agg(count(lit(1)).as("c"))
      val sTab = s.range(0, 16).select(col("id").cast("int").as("s"))
      val v = sTab.join(broadcast(cnt),
          cnt("t").bitwiseAND(sTab("s")) === cnt("t"), "left")
        .groupBy("s").agg(coalesce(sum("c"), lit(0L)).as("v"))
      import s.implicits._
      val ch = Seq(("click", 1), ("view", 2), ("signup", 4), ("error", 8))
        .toDF("channel", "bit")
      val v0 = v.select(col("s").as("s0"), col("v").as("vs0"))
      val v1 = v.select(col("s").as("s1"), col("v").as("vs1"))
      ch.join(broadcast(v0), v0("s0").bitwiseAND(ch("bit")) === 0)
        .join(broadcast(v1),
          v1("s1") === v0("s0").bitwiseOR(ch("bit")))
        .withColumn("w", when(bit_count(col("s0")) === 0, 6L)
          .when(bit_count(col("s0")) === 3, 6L).otherwise(2L))
        .groupBy("channel")
        .agg(sum(col("w") * (col("vs1") - col("vs0"))).as("phi24"))
        .select(col("channel"), col("phi24"),
          (floor(col("phi24").cast("double") / 24.0 * 1000000 + 0.5)
            / 1000000.0).as("phi"))
    }),

    // ---- EXT: Markov removal-effect attribution ----
    "q478_markov_attribution" -> ((s, dir) => {
      // the data-driven attribution standard beside q472's Shapley: a
      // first-order journey chain (virtual 'start', journeys truncated
      // at first purchase, '__null' absorbs non-converting ends) and
      // per-channel REMOVAL effects — delete the channel, redirect its
      // inbound edges to '__null', re-run the 20-round lockstep
      // absorption, and credit 1 − P_removed/P_full. The corpus pass is
      // one transition aggregate; the five scenario solves run on the
      // ≤36-entry chain (bounded model fit, q332 precedent). Transition
      // p's carry the 6-dp contract; round terms are 12-dp decimals.
      import org.apache.spark.sql.expressions.Window
      val wl = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val ev = Tables.events(s, dir)
        .withColumn("prior", coalesce(
          sum(when(col("event_type") === "purchase", 1).otherwise(0))
            .over(wl.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0)))
        .filter(col("prior") === 0)
      val hops = ev
        .withColumn("t", coalesce(lead(col("event_type"), 1).over(wl),
          lit("__null")))
        .filter(col("event_type") =!= "purchase")
        .select(col("event_type").as("f"), col("t"))
      val starts = ev.groupBy("user_id")
        .agg(min(struct(col("ts"), col("event_id"), col("event_type")))
          .as("m"))
        .select(lit("start").as("f"), col("m.event_type").as("t"))
      val cnt = hops.unionAll(starts).groupBy("f", "t")
        .agg(count(lit(1)).as("n"))
      val withP = cnt
        .withColumn("tot", sum("n").over(Window.partitionBy("f")))
        .withColumn("p",
          round(col("n").cast("double") / col("tot").cast("double"), 6))
        .select("f", "t", "p")
      val chain = withP.collect()
        .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
      val states = (chain.map(_._1._1) ++ chain.map(_._1._2))
        .distinct.sorted.toSeq
      val absorbingSet = Set("purchase", "__null")
      def r12(x: Double): Double =
        BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
      def absorb(removed: Option[String]): Double = {
        val tr = chain.toSeq.flatMap { case ((f, t), p) =>
          removed match {
            case Some(c) if f == c => None
            case Some(c) =>
              Some(((f, if (t == c) "__null" else t), p))
            case None => Some(((f, t), p))
          }
        }
        val sts = states.filterNot(removed.contains)
        var x: Map[String, Double] = sts.map(st =>
          st -> (if (st == "purchase") 1.0 else 0.0)).toMap
        (1 to 20).foreach { _ =>
          val next = sts.filterNot(absorbingSet).map { st =>
            val terms = tr.filter(_._1._1 == st).flatMap {
              case ((_, t), p) =>
                x.get(t).map(xv => BigDecimal(r12(p * xv)))
            }
            st -> (if (terms.isEmpty) 0.0 else terms.sum.toDouble)
          }.toMap
          x = next ++ sts.filter(absorbingSet)
            .map(st => st -> x(st)).toMap
        }
        x.getOrElse("start", 0.0)
      }
      val pFull = absorb(None)
      val channels = Seq("click", "view", "signup", "error")
      val rows = channels.map { c =>
        val pr = absorb(Some(c))
        val removal6 =
          math.floor((1.0 - pr / pFull) * 1000000 + 0.5).toLong
        (c, pFull, pr, removal6)
      }
      val tot6 = rows.map(_._4).sum
      val spark = s
      import spark.implicits._
      rows.map { case (c, pf, pr, r6) =>
        (c, pf, pr, r6.toDouble / 1000000.0,
          math.floor(r6.toDouble / tot6.toDouble * 1000000 + 0.5)
            / 1000000.0)
      }.toDF("channel", "pf", "prm", "removal_effect", "share")
        .select(col("channel"),
          (round(col("pf"), 6) + lit(0.0d)).as("p_full"),
          (round(col("prm"), 6) + lit(0.0d)).as("p_removed"),
          col("removal_effect"), col("share"))
    }),

    // ---- EXT: geohash encoding (spatial bucketing key) ----
    "q481_geohash" -> ((s, dir) => {
      // the spatial layout key the reference's tile pyramid implies:
      // geohash-6 from the fixture's integer lon/lat — 15-bit cells,
      // interleave, base32 — as ONE generated scalar expression shared
      // verbatim with the oracle (q49 discipline, modulo the `div`//`//`
      // spelling). Grouping by the hash is the geo-shuffle key at
      // 100 TB: co-located cells land in one partition.
      val pts = Tables.customer(s, dir).select(col("c_custkey"),
        (col("c_custkey") * 7 % 360 - 180).cast("long").as("lon"),
        (col("c_custkey") * 13 % 180 - 90).cast("long").as("lat"))
      pts.withColumn("geohash",
          expr(geohashSqlExpr("lon", "lat", "div")))
        .groupBy("geohash")
        .agg(count(lit(1)).as("n_points"),
          min(col("c_custkey")).cast("long").as("sample_custkey"))
    }),

    // ---- EXT: nearest-facility (Voronoi) assignment ----
    "q482_nearest_station" -> ((s, dir) => {
      // every customer point assigned to its nearest of 8 fixed ground
      // stations (the reference's receiver siting question): exact
      // integer squared distances, argmin with station-id tie-break, one
      // broadcast cross against the 8-row dimension. Flat-earth metric
      // on the synthetic integer grid — the assignment algebra, not
      // geodesy, is the subject.
      import s.implicits._
      val stations = Seq((0L, -120L, 40L), (1L, -60L, -10L),
        (2L, 0L, 50L), (3L, 30L, -25L), (4L, 75L, 20L),
        (5L, 120L, 60L), (6L, 150L, -40L), (7L, -150L, -65L))
        .toDF("station_id", "s_lon", "s_lat")
      val pts = Tables.customer(s, dir).select(col("c_custkey"),
        (col("c_custkey") * 7 % 360 - 180).cast("long").as("lon"),
        (col("c_custkey") * 13 % 180 - 90).cast("long").as("lat"))
      pts.crossJoin(broadcast(stations))
        .withColumn("d2",
          (col("lon") - col("s_lon")) * (col("lon") - col("s_lon"))
          + (col("lat") - col("s_lat")) * (col("lat") - col("s_lat")))
        .groupBy("c_custkey")
        .agg(min(struct(col("d2"), col("station_id"))).as("m"))
        .groupBy(col("m.station_id").as("station_id"))
        .agg(count(lit(1)).as("n_assigned"),
          (floor(sum(col("m.d2")).cast("double") / count(lit(1))
            * 1000000 + 0.5) / 1000000.0).as("mean_d2"))
    }),

    // ---- EXT: kernel density estimate on a fixed grid ----
    "q483_kde_grid" -> ((s, dir) => {
      // Gaussian KDE of order value at 21 grid points: one explode×21
      // conditional aggregate (the q460 shape — grid terms shuffle 21
      // partials per partition, never the corpus). Grid and bandwidth
      // derive from exact integer cents; each row's kernel term is
      // 6dp-floored so the density sums are engine-exact integers.
      val cents = Tables.orders(s, dir)
        .select((col("o_totalprice").cast(D) * 100).cast("long")
          .as("x"))
      val mm = cents.agg(min("x").as("lo"), max("x").as("hi"))
      cents.crossJoin(broadcast(mm))
        .select(col("x"), col("lo"), col("hi"),
          explode(sequence(lit(0), lit(20))).as("k"))
        .withColumn("gk", col("lo").cast("double")
          + col("k").cast("double")
            * (col("hi") - col("lo")).cast("double") / 20.0)
        .withColumn("u", (col("x").cast("double") - col("gk"))
          / ((col("hi") - col("lo")).cast("double") / 10.0))
        .withColumn("t6",
          floor(exp(col("u") * col("u") / -2.0) * 1000000 + 0.5)
            .cast("long"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"), sum("t6").as("sum_t6"),
          first(col("gk")).as("gk"))
        .select(col("k"), (col("gk") / 100.0).as("grid_dollars"),
          col("sum_t6"),
          (floor(col("sum_t6").cast("double") / col("n")
            * 1000000 + 0.5) / 1000000.0 / 1000000.0)
            .as("mean_kernel"))
    }),

    // ---- EXT: weight-of-evidence / information-value binning ----
    "q479_woe_iv" -> ((s, dir) => {
      // the credit-scoring screen: quantity decile buckets vs the
      // return outcome, WoE_b = ln(bad-share/good-share) and its IV
      // contribution per bucket — ONE conditional aggregate, bucket
      // table bounded by the binning design. Log runs on exact integer
      // cross-products (bad_b·Good vs good_b·Bad); WoE is 6dp-floored
      // FIRST so each IV term is a mirrored single-rounding product.
      val b = Tables.lineitem(s, dir)
        .select(expr("(cast(l_quantity AS int) - 1) div 10").cast("int")
          .as("bucket"),
          (col("l_returnflag") === "R").cast("int").as("r"))
        .groupBy("bucket")
        .agg(count(when(col("r") === 0, lit(1))).as("n_good"),
          count(when(col("r") === 1, lit(1))).as("n_bad"))
      val tot = b.agg(sum("n_good").as("tg"), sum("n_bad").as("tb"))
      b.crossJoin(broadcast(tot))
        .withColumn("woe6", floor(
          log(col("n_bad").cast("double") * col("tg")
            / (col("n_good").cast("double") * col("tb")))
          * 1000000 + 0.5).cast("long"))
        .select(col("bucket"), col("n_good"), col("n_bad"),
          (col("woe6").cast("double") / 1000000.0).as("woe"),
          (floor((col("n_bad").cast("double") / col("tb")
              - col("n_good").cast("double") / col("tg"))
            * (col("woe6").cast("double") / 1000000.0)
            * 1000000 + 0.5) / 1000000.0).as("iv_term"))
    }),

    // ---- EXT: Shewhart x-bar / R control chart ----
    "q474_xbar_r_chart" -> ((s, dir) => {
      // SPC over the order stream: fixed n=5 subgroups (first five
      // orders per day by orderkey — deterministic), x-bar and R charts
      // with the classical A2/D4 constants. EVERY control decision is
      // stated in cross-multiplied integer algebra (200·|sum_d·D − Σsum|
      // > 577·ΣR etc.), so no double threshold can flip a boundary day
      // between engines. The day table is bounded by the calendar.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("d").orderBy("o_orderkey")
      val sub = Tables.orders(s, dir)
        .select(col("o_orderdate").as("d"), col("o_orderkey"),
          (col("o_totalprice").cast(D) * 100).cast("long").as("cents"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
      val days = sub.groupBy("d")
        .agg(count(lit(1)).as("n"), sum("cents").as("sum5"),
          (max("cents") - min("cents")).as("r"))
        .filter(col("n") === 5)
      val tot = days.agg(count(lit(1)).as("nd"), sum("sum5").as("tsum"),
        sum("r").as("tr"))
      days.crossJoin(broadcast(tot))
        .select(
          (abs(col("sum5") * col("nd") - col("tsum")) * 200
            > col("tr") * 577).cast("int").as("xbar_out"),
          (col("r") * col("nd") * 1000 > col("tr") * 2114).cast("int")
            .as("r_out"),
          col("nd"), col("tsum"), col("tr"))
        .groupBy("nd", "tsum", "tr")
        .agg(sum("xbar_out").as("n_xbar_out"), sum("r_out").as("n_r_out"))
        .select(col("nd").as("n_days"),
          (floor(col("tsum").cast("double") / (col("nd") * 5) / 100.0
            * 1000000 + 0.5) / 1000000.0).as("grand_mean"),
          (floor(col("tr").cast("double") / col("nd") / 100.0
            * 1000000 + 0.5) / 1000000.0).as("mean_range"),
          col("n_xbar_out"), col("n_r_out"))
    }),

    // ---- EXT: Tukey IQR fences (boxplot outlier screen) ----
    "q475_tukey_fences" -> ((s, dir) => {
      // per-segment account-balance outliers by the 1.5·IQR rule.
      // Quartiles are nearest-rank values (ceil(n/4), ceil(3n/4)) on the
      // key-partitioned rank — order statistics, not interpolation — and
      // the fences double through the ×2 integer scale (2x < 2·Q1−3·IQR)
      // so 1.5 never exists as a float.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("seg").orderBy("cents", "c_custkey")
      val c = Tables.customer(s, dir)
        .select(col("c_mktsegment").as("seg"), col("c_custkey"),
          (col("c_acctbal").cast(D) * 100).cast("long").as("cents"))
        .withColumn("rn", row_number().over(w))
      val n = c.groupBy("seg").agg(count(lit(1)).as("n"))
      val q = c.join(broadcast(n), "seg")
        .filter(col("rn") === ceil(col("n") / 4) ||
          col("rn") === ceil(col("n") * 3 / lit(4.0)))
        .groupBy("seg")
        .agg(min(when(col("rn") === ceil(col("n") / 4), col("cents")))
          .as("q1"),
          max(when(col("rn") === ceil(col("n") * 3 / lit(4.0)),
            col("cents"))).as("q3"))
      c.join(broadcast(q), "seg")
        .select(col("seg"), col("q1"), col("q3"),
          (col("cents") * 2 < col("q1") * 2 - (col("q3") - col("q1")) * 3)
            .cast("int").as("lo"),
          (col("cents") * 2 > col("q3") * 2 + (col("q3") - col("q1")) * 3)
            .cast("int").as("hi"))
        .groupBy("seg")
        .agg(count(lit(1)).as("n"),
          first(floor(col("q1").cast("double")) / 100.0).as("q1_dollars"),
          first(floor(col("q3").cast("double")) / 100.0).as("q3_dollars"),
          sum("lo").as("n_low_outliers"),
          sum("hi").as("n_high_outliers"))
    }),

    // ---- EXT: Grubbs extreme-outlier statistic ----
    "q476_grubbs" -> ((s, dir) => {
      // per-nation Grubbs G = max|x − mean| / s from ONE exact-moment
      // aggregate (n, Σ, Σx² in decimal(38,0) cents — int64 squares
      // would overflow at large SF) plus the argmax deviant. The only
      // doubles are the final mirrored G computation.
      val c = Tables.customer(s, dir)
        .select(col("c_nationkey"), col("c_custkey"),
          (col("c_acctbal").cast(D) * 100).cast("decimal(38,0)")
            .as("cents"))
      val m = c.groupBy("c_nationkey").agg(count(lit(1)).as("n"),
        sum("cents").as("s1"), sum(col("cents") * col("cents")).as("s2"))
      c.join(broadcast(m), "c_nationkey")
        .select(col("c_nationkey"), col("n"), col("s1"), col("s2"),
          abs(col("cents") * col("n") - col("s1")).as("devn"),
          col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(first(col("n")).as("n"), first(col("s1")).as("s1"),
          first(col("s2")).as("s2"),
          max(struct(col("devn"), col("c_custkey"))).as("mx"))
        .select(col("c_nationkey"), col("n"),
          col("mx.c_custkey").as("worst_custkey"),
          (floor(
            (col("mx.devn").cast("double") / col("n").cast("double")
              / 100.0)
            / sqrt((col("n").cast("double")
                * col("s2").cast("double")
              - col("s1").cast("double") * col("s1").cast("double"))
              / (col("n").cast("double")
                * (col("n") - 1).cast("double")) / 10000.0)
            * 1000000 + 0.5) / 1000000.0).as("g_stat"))
    }),

    // ---- EXT: empirical-Bayes rate shrinkage ----
    "q477_eb_shrinkage" -> ((s, dir) => {
      // per-supplier return rates shrunk toward the pooled prior with a
      // method-of-moments strength K = m(1−m)/varB − 1: small suppliers
      // pull hard to the prior, large ones keep their data. Raw rates
      // are 6dp-floored INTEGERS, so the between-supplier variance that
      // feeds K is exact integer algebra; only the final shrink is a
      // mirrored double.
      val per = Tables.lineitem(s, dir).groupBy("l_suppkey")
        .agg(count(lit(1)).as("n"),
          count(when(col("l_returnflag") === "R", lit(1))).as("x"))
        .withColumn("r6", floor(col("x").cast("double") / col("n")
          * 1000000 + 0.5).cast("long"))
      val g = per.agg(count(lit(1)).as("ns"), sum("x").as("tx"),
          sum("n").as("tn"))
        .withColumn("m6", floor(col("tx").cast("double") / col("tn")
          * 1000000 + 0.5).cast("long"))
      val varB = per.crossJoin(broadcast(g))
        .agg(first(col("ns")).as("ns"), first(col("m6")).as("m6"),
          sum((col("r6") - col("m6")) * (col("r6") - col("m6")))
            .as("ssq"))
        .select(col("ns"), col("m6"),
          (col("ssq").cast("double") / (col("ns") - 1).cast("double")
            / 1.0e12).as("vb"))
        .select(col("ns"), col("m6"),
          when(col("vb") > 0,
            (col("m6").cast("double") / 1000000.0
              * (lit(1.0) - col("m6").cast("double") / 1000000.0))
              / col("vb") - 1.0)
            .otherwise(lit(0.0)).as("k"))
      per.crossJoin(broadcast(varB))
        .select(col("l_suppkey"), col("n"), col("x"),
          (col("r6").cast("double") / 1000000.0).as("raw_rate"),
          (floor((col("x").cast("double")
              + col("k") * (col("m6").cast("double") / 1000000.0))
            / (col("n").cast("double") + col("k"))
            * 1000000 + 0.5) / 1000000.0).as("shrunk_rate"))
    }),

    // ---- SQL surface: native listagg (ordered string aggregation) ----
    "q469_listagg" -> ((s, dir) => {
      // Spark 4's ANSI listagg: DISTINCT + WITHIN GROUP ordered string
      // aggregation as a NATIVE aggregate (no collect_list/array_join
      // detour) — the report-formatting shape the reference builds in
      // app code. DuckDB mirrors with ordered string_agg.
      Tables.registerAll(s, dir)
      s.sql("""SELECT n_name,
          listagg(DISTINCT c_mktsegment, ',')
            WITHIN GROUP (ORDER BY c_mktsegment) AS segments,
          count(*) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name""")
    }),

    // ---- EXT: randomized response + debias (local-DP telemetry) ----
    "q451_randomized_response" -> ((s, dir) => {
      // the q445 (central-DP) sibling at the LOCAL level: each event
      // reports its sensitive bit (purchase?) through Warner's coin —
      // truth if coin1, else coin2 — and the collector debiases
      // π̂ = 2·p̂(reported) − 1/2. Coins are independent md5 hex nibbles
      // (testable skeleton; production swaps a real RNG). Per user
      // cohort: true rate vs debiased estimate vs |error|, every ratio
      // through the mirrored half-away floor (rational values — q370).
      val h1 = conv(substring(md5(concat(lit("rr1:"),
        col("event_id"))), 1, 1), 16, 10).cast("int")
      val h2 = conv(substring(md5(concat(lit("rr2:"),
        col("event_id"))), 1, 1), 16, 10).cast("int")
      val truth = (col("event_type") === "purchase").cast("int")
      val reported = when(h1 % 2 === 0, truth)
        .otherwise((h2 % 2).cast("int"))
      val floor6 = (c: org.apache.spark.sql.Column) =>
        floor(c * lit(1e6) + lit(0.5d)) / lit(1e6)
      Tables.events(s, dir)
        .select((col("user_id") % 8).cast("int").as("cohort"),
          truth.as("__t"), reported.as("__r"))
        .groupBy(col("cohort"))
        .agg(count(lit(1)).as("n"),
          sum(col("__t")).cast("long").as("n_true"),
          sum(col("__r")).cast("long").as("n_reported"))
        .select(col("cohort"), col("n"), col("n_true"),
          floor6(col("n_true").cast("double") / col("n").cast("double"))
            .as("true_rate"),
          floor6(lit(2.0d) * (col("n_reported").cast("double") /
            col("n").cast("double")) - lit(0.5d)).as("debiased_rate"),
          floor6(abs(lit(2.0d) * (col("n_reported").cast("double") /
            col("n").cast("double")) - lit(0.5d) -
            col("n_true").cast("double") / col("n").cast("double")))
            .as("abs_err"))
    }),
  )

  /** Generated unrolled-DP oracle for q450 (the q307 pattern: a fixed
    * round count unrolls into chained CTEs, one argmin row_number per
    * position). Mirrors TextOps.viterbiSegment step for step. */
  private def viterbiOracleSql(vocabSize: Int, maxLen: Int,
                               maxPiece: Int, unkCost: String): String = {
    val sCtes = (1 to maxLen).map { i =>
      val cands = (1 to maxPiece).filter(d => i - d >= 0).map { d =>
        s"""SELECT s.w AS w, ${i - d} AS j,
              cast(s.lp + e.elp AS decimal(18,6)) AS nlp, s.np + 1 AS nnp
            FROM s${i - d} s JOIN edges e
              ON e.w = s.w AND e.j = ${i - d} AND e.i = $i"""
      }.mkString("\n            UNION ALL\n")
      s"""s$i AS MATERIALIZED (SELECT w, nlp AS lp, nnp AS np FROM (
            SELECT c.w, c.j, c.nlp, c.nnp, row_number() OVER (
              PARTITION BY c.w
              ORDER BY c.nlp ASC, c.nnp ASC, c.j ASC) AS rn
            FROM ($cands) c) t WHERE rn = 1)"""
    }.mkString(",\n         ")
    val fins = (1 to maxLen).map(l =>
      s"SELECT $l AS len, w, lp, np FROM s$l WHERE length(w) = $l")
      .mkString("\n           UNION ALL\n           ")
    s"""WITH wr AS MATERIALIZED (SELECT w, count(*) AS wc FROM (
             SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
           WHERE regexp_matches(w, '^[a-z]+$$') AND length(w) <= $maxLen
           GROUP BY w),
         occ1 AS MATERIALIZED (SELECT w, wc,
             unnest(generate_series(0, length(w) - 1)) AS j FROM wr),
         occ2 AS MATERIALIZED (SELECT w, wc, j, unnest(generate_series(1,
             least($maxPiece, length(w) - j))) AS d FROM occ1),
         occ AS MATERIALIZED (SELECT w, wc, j, d, substr(w, j + 1, d) AS piece
           FROM occ2),
         vocab AS MATERIALIZED (SELECT piece, sum(wc) AS cnt FROM occ GROUP BY piece
           ORDER BY cnt DESC, piece LIMIT $vocabSize),
         vtot AS (SELECT sum(cnt) AS tot FROM vocab),
         vlp AS MATERIALIZED (SELECT piece, cast(round(-ln(cast(cnt AS double)
             / cast(tot AS double)), 6) AS decimal(18,6)) AS lp
           FROM vocab CROSS JOIN vtot),
         edges AS MATERIALIZED (SELECT o.w, o.j, o.j + o.d AS i,
             coalesce(v.lp, cast($unkCost AS decimal(18,6))) AS elp
           FROM occ o LEFT JOIN vlp v ON o.piece = v.piece
           WHERE v.lp IS NOT NULL OR o.d = 1),
         s0 AS MATERIALIZED (SELECT w, cast(0 AS decimal(18,6)) AS lp, 0 AS np FROM wr),
         $sCtes,
         fin AS ($fins)
         SELECT len, count(*) AS n_words, cast(sum(wc) AS bigint) AS total_wc,
           floor((cast(sum(wc * np) AS double) / cast(sum(wc) AS double))
             * 1000000.0 + 0.5) / 1000000.0 AS mean_pieces,
           floor((cast(sum(cast(wc AS decimal(20,0)) * lp) AS double)
             / cast(sum(wc) AS double)) * 1000000.0 + 0.5) / 1000000.0
             AS mean_surprisal
         FROM fin JOIN wr USING (w)
         GROUP BY len"""
  }

  /** q39 / q41 oracle bodies, shared with the q222 retrieval-eval oracle. */
  private val KnnBruteSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
         s AS (SELECT qid AS query_id, e.vec_id AS neighbor_id,
                 list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * v[i]))
                 / (sqrt(list_sum(list_transform(qv, x -> x*x)))
                    * sqrt(list_sum(list_transform(v, x -> x*x)))) AS sim0
               FROM e CROSS JOIN q WHERE e.vec_id != qid),
         r AS (SELECT query_id, neighbor_id, sim0,
                 row_number() OVER (PARTITION BY query_id ORDER BY sim0 DESC, neighbor_id) AS rank
               FROM s)
         SELECT query_id, neighbor_id, cast(rank as int) AS rank, round(sim0, 6) AS sim
         FROM r WHERE rank <= 5"""
  private def lshSql(nPlanes: Int): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         b AS (SELECT vec_id, v,
             array_to_string(list_transform(generate_series(0, ${nPlanes - 1}), r ->
               CASE WHEN list_sum(list_transform(generate_series(1, 64), i ->
                 v[i] * (('0x' || substr(md5('plane:' || cast(r as varchar) || ':' || cast(i-1 as varchar)), 1, 4))::bigint / 32768.0 - 1.0))) >= 0
               THEN '1' ELSE '0' END), '') AS bucket
           FROM e),
         q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qb FROM b WHERE vec_id < 10),
         probes0 AS (SELECT query_id,
             list_prepend(qb, list_transform(generate_series(1, $nPlanes), i ->
               substr(qb, 1, i-1)
               || (CASE WHEN substr(qb, i, 1) = '1' THEN '0' ELSE '1' END)
               || substr(qb, i+1, $nPlanes-i))) AS pl
           FROM q),
         probes AS (SELECT query_id, unnest(pl) AS bucket FROM probes0),
         cand AS (SELECT DISTINCT query_id, c.vec_id AS neighbor_id
                  FROM probes p JOIN b c ON c.bucket = p.bucket
                  WHERE c.vec_id != p.query_id),
         s AS (SELECT query_id, neighbor_id,
                 list_sum(list_transform(generate_series(1, 64), i -> qe.v[i]*ne.v[i]))
                 / (sqrt(list_sum(list_transform(qe.v, x -> x*x)))
                    * sqrt(list_sum(list_transform(ne.v, x -> x*x)))) AS sim0
               FROM cand
               JOIN e qe ON qe.vec_id = query_id
               JOIN e ne ON ne.vec_id = neighbor_id),
         r AS (SELECT query_id, neighbor_id, sim0,
                 row_number() OVER (PARTITION BY query_id ORDER BY sim0 DESC, neighbor_id) AS rank
               FROM s)
         SELECT query_id, neighbor_id, cast(rank as int) AS rank, round(sim0, 6) AS sim
         FROM r WHERE rank <= 5"""

  private val KnnLshSql: String = lshSql(6)

  /** Generated DuckDB oracle for q318: the q41 LSH pipeline swept over
    * nPlanes ∈ {4, 6, 8}, each setting's recall@5 against the exact
    * ranking — the tuning curve (recall vs bucket selectivity) as an
    * oracle-checked query. */
  private val AnnTuningOracleSql: String = {
    val settings = Seq(4, 6, 8)
    settings.map { p =>
      s"""SELECT $p AS n_planes,
          round(cast((SELECT count(*) FROM ($KnnBruteSql) t
            JOIN (${lshSql(p)}) c
            ON t.query_id = c.query_id AND t.neighbor_id = c.neighbor_id)
            AS double)
          / cast((SELECT count(*) FROM ($KnnBruteSql) t2) AS double), 6)
          + 0.0 AS mean_recall5"""
    }.mkString("\n          UNION ALL ")
  }

  /** Generated DuckDB oracle for q375: five unrolled IPF rounds (row-scale
    * then column-scale per round), each half-step's cells rounded to 9 dp
    * and kept as exact decimals so the margin sums are order-free — the
    * q332 generated-oracle discipline applied to iterative proportional
    * fitting. */
  private val IpfOracleSql: String = {
    val base =
      """WITH a AS (SELECT o_orderpriority AS p, o_orderstatus AS s,
             cast(count(*) AS bigint) AS n
           FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
           GROUP BY 1, 2),
         rm AS (SELECT o_orderpriority AS p, cast(count(*) AS bigint) AS r
           FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           GROUP BY 1),
         cm AS (SELECT o_orderstatus AS s, cast(count(*) AS bigint) AS c
           FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           GROUP BY 1),
         x0 AS (SELECT p, s, n, cast(n AS decimal(28,9)) AS v FROM a)"""
    val rounds = (1 to 5).map { k =>
      s""",
         rs$k AS (SELECT p, sum(v) AS rs FROM x${k - 1} GROUP BY 1),
         xr$k AS (SELECT t.p, t.s, t.n,
             cast(round(cast(t.v AS double)
               * (cast(rm.r AS double) / cast(rs$k.rs AS double)), 9)
               AS decimal(28,9)) AS v
           FROM x${k - 1} t JOIN rm ON t.p = rm.p
             JOIN rs$k ON t.p = rs$k.p),
         cs$k AS (SELECT s, sum(v) AS cs FROM xr$k GROUP BY 1),
         x$k AS (SELECT t.p, t.s, t.n,
             cast(round(cast(t.v AS double)
               * (cast(cm.c AS double) / cast(cs$k.cs AS double)), 9)
               AS decimal(28,9)) AS v
           FROM xr$k t JOIN cm ON t.s = cm.s
             JOIN cs$k ON t.s = cs$k.s)"""
    }.mkString
    s"""$base$rounds
         SELECT p AS o_orderpriority, s AS o_orderstatus, n AS n_base,
           round(cast(v AS double), 6) + 0.0 AS fitted
         FROM x5"""
  }

  /** Generated DuckDB oracle for q391: six unrolled greedy-BPE merge steps.
    * Each step mirrors the Spark kernel exactly — pair counts via lead()
    * over (word, pos), argmax with (count desc, left, right) tie-break,
    * and the island-parity statement of left-to-right non-overlapping
    * merge application (candidates at consecutive positions — only
    * possible when left == right — merge at even island offsets; the row
    * after a merge start is consumed). */
  private val BpeOracleSql: String = bpeOracle(merges = true)
  private val BpeCurveOracleSql: String = bpeOracle(merges = false)

  private def bpeOracle(merges: Boolean): String = {
    val steps = 6
    val base =
      """WITH wf AS (SELECT word, cast(count(*) AS bigint) AS freq FROM (
             SELECT lower(t.tok) AS word
             FROM documents, LATERAL unnest(string_split(text, ' ')) AS t(tok)
             WHERE regexp_full_match(lower(t.tok), '[a-z]+'))
           GROUP BY 1),
         t0 AS (SELECT word, freq, cast(li.i AS int) AS pos,
             substr(word, cast(li.i AS int), 1) AS sym
           FROM wf, LATERAL (SELECT unnest(range(1, len(word)+1)) AS i) AS li)"""
    val rounds = (1 to steps).map { k =>
      s""",
         p$k AS (SELECT sym AS l, nxt AS r, cast(sum(freq) AS bigint) AS n
           FROM (SELECT freq, sym,
               lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
             FROM t${k - 1})
           WHERE nxt IS NOT NULL GROUP BY 1, 2),
         b$k AS (SELECT l, r, n FROM p$k ORDER BY n DESC, l, r LIMIT 1),
         m$k AS (SELECT *, pos - sum(c) OVER
               (PARTITION BY word ORDER BY pos ROWS UNBOUNDED PRECEDING)
               AS isl
           FROM (SELECT word, freq, pos, sym,
               lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt,
               CASE WHEN sym = (SELECT l FROM b$k)
                     AND lead(sym) OVER (PARTITION BY word ORDER BY pos)
                         = (SELECT r FROM b$k)
                 THEN 1 ELSE 0 END AS c
             FROM t${k - 1})),
         s$k AS (SELECT *, min(CASE WHEN c = 1 THEN pos END) OVER
               (PARTITION BY word, isl) AS strt
           FROM m$k),
         g$k AS (SELECT *,
             (c = 1 AND (pos - strt) % 2 = 0) AS mstart,
             coalesce(lag(c = 1 AND (pos - strt) % 2 = 0) OVER
               (PARTITION BY word ORDER BY pos), false) AS consumed
           FROM s$k),
         t$k AS (SELECT word, freq,
             cast(row_number() OVER (PARTITION BY word ORDER BY pos) AS int)
               AS pos,
             CASE WHEN mstart THEN sym || nxt ELSE sym END AS sym
           FROM g$k WHERE NOT consumed)"""
    }.mkString
    val out =
      if (merges)
        (1 to steps).map { k =>
          s"SELECT cast($k AS int) AS step, l AS merge_left, r AS merge_right, n AS n_pairs FROM b$k"
        }.mkString("\n         UNION ALL ")
      else
        (0 to steps).map { k =>
          s"SELECT cast($k AS int) AS step, cast(sum(freq) AS bigint) AS corpus_subwords FROM t$k"
        }.mkString("\n         UNION ALL ")
    s"$base$rounds\n         $out"
  }

  /** Generated DuckDB oracle for q412: one correlated-EXISTS scorecard row
    * per FK edge, unioned. */
  private val FkScorecardOracleSql: String = {
    val edges = Seq(
      ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
      ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"))
    edges.map { case (n, c, ck, p, pk) =>
      s"""SELECT '$n' AS edge,
           (SELECT cast(count(*) AS bigint) FROM $c) AS child_rows,
           (SELECT cast(count(DISTINCT $ck) AS bigint) FROM $c) AS child_keys,
           (SELECT cast(count(*) AS bigint) FROM $c WHERE NOT EXISTS
             (SELECT 1 FROM $p WHERE $pk = $c.$ck)) AS orphan_rows,
           (SELECT cast(count(*) AS bigint) FROM $p WHERE EXISTS
             (SELECT 1 FROM $c WHERE $ck = $p.$pk)) AS parents_referenced,
           (SELECT cast(count(*) AS bigint) FROM $p) AS parent_rows,
           round(cast((SELECT count(*) FROM $p WHERE EXISTS
             (SELECT 1 FROM $c WHERE $ck = $p.$pk)) AS double)
             / cast((SELECT count(*) FROM $p) AS double), 6) + 0.0
             AS parent_coverage"""
    }.mkString("\n         UNION ALL ")
  }

  /** q420's rule table — the SAME data drives the Spark rule engine and the
    * generated DuckDB oracle, so a rule edit cannot desynchronize the two
    * sides. (rule_id, column, op, arg). */
  private val DqRules: Seq[(String, String, String, String)] = Seq(
    ("r01_status_domain", "o_orderstatus", "in", "O|F|P"),
    ("r02_price_positive", "o_totalprice", "gt", "0"),
    ("r03_priority_format", "o_orderpriority", "regex", "^[1-5]-[A-Z ]+$"),
    ("r04_date_bounds", "o_orderdate", "between", "1995-01-01|1999-12-31"),
    ("r05_custkey_notnull", "o_custkey", "not_null", ""),
    ("r06_key_positive", "o_orderkey", "gt", "0"))

  /** Generated DuckDB oracle for q420: one UNION ALL arm per rule, each the
    * unrolled form of the predicate the Spark engine builds from the same
    * tuple. */
  private val DqRuleOracleSql: String = {
    def cond(column: String, op: String, arg: String): String = op match {
      case "not_null" => s"$column IS NOT NULL"
      case "gt"       => s"$column > $arg"
      case "ge"       => s"$column >= $arg"
      case "in"       =>
        arg.split('|').map(v => s"'$v'").mkString(s"$column IN (", ", ", ")")
      case "regex"    => s"regexp_matches($column, '$arg')"
      case "between"  =>
        val Array(lo, hi) = arg.split('|')
        s"$column BETWEEN '$lo' AND '$hi'"
    }
    DqRules.map { case (id, column, op, arg) =>
      s"""SELECT '$id' AS rule_id, '$column' AS column_name,
           cast(count(*) AS bigint) AS n_checked,
           cast(sum(CASE WHEN NOT coalesce(${cond(column, op, arg)}, FALSE)
             THEN 1 ELSE 0 END) AS bigint) AS n_violations,
           round(cast(sum(CASE WHEN NOT coalesce(${cond(column, op, arg)},
             FALSE) THEN 1 ELSE 0 END) AS double)
             / cast(count(*) AS double), 6) + 0.0 AS violation_rate
         FROM orders"""
    }.mkString("\n         UNION ALL ")
  }

  /** DuckDB-equivalent SQL per query (same parquet tables, same column names). */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty,
         cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sum_base_price,
         cast(sum(cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(18,2)))) as double) AS sum_disc_price,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus""",
    "q02_point_lookup" ->
      "SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer WHERE c_custkey = 42",
    "q03_or_lookup" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE c_mktsegment = 'BUILDING' OR c_acctbal < 100""",
    "q04_multi_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
         FROM lineitem
         WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
           AND l_quantity BETWEEN 10 AND 20
           AND l_returnflag IN ('A','R')""",
    "q05_regex_filter" ->
      """SELECT p_partkey, p_name, p_brand FROM part
         WHERE regexp_matches(p_name, '^(blue|large) .*t$')""",
    "q06_projection_scalar" ->
      """SELECT c_custkey, lower(c_name) AS name_lower,
         cast(length(c_name) as int) AS name_len,
         substr(c_name, 1, 8) AS name_prefix,
         c_mktsegment || ':' || c_name AS tagged FROM customer""",
    "q07_rollup_status" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
    "q08_time_buckets" ->
      """SELECT cast(date_trunc('day', ts) as date) AS day, event_type,
         count(*) AS n, cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
         FROM events GROUP BY 1, 2""",
    "q09_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q10_page" ->
      "SELECT * FROM customer ORDER BY c_custkey LIMIT 20 OFFSET 40",
    "q11_pagination_meta" ->
      """SELECT count(*) AS total, 2 AS page, 100 AS size,
         cast(ceil(count(*) / 100.0) as bigint) AS pages,
         2 < cast(ceil(count(*) / 100.0) as bigint) AS has_next,
         true AS has_prev
         FROM customer""",
    "q12_latest_per_key" ->
      """SELECT user_id, event_id, event_type, value FROM (
           SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) t WHERE rn = 1""",
    "q13_window_lag" ->
      """SELECT user_id, event_id, value,
         lag(value) OVER w AS prev_value,
         value - lag(value) OVER w AS delta_value
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
    "q14_running_sum" ->
      """SELECT o_orderkey, o_custkey,
         cast(sum(cast(o_totalprice as decimal(18,2))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double) AS run_total
         FROM orders""",
    "q15_bbox_agg" ->
      """SELECT l_returnflag,
         min(lon) AS min_lon, max(lon) AS max_lon,
         min(lat) AS min_lat, max(lat) AS max_lat
         FROM (SELECT l_returnflag,
                 cast(l_partkey * 7 % 360 - 180 as bigint) AS lon,
                 cast(l_suppkey * 13 % 180 - 90 as bigint) AS lat
               FROM lineitem) t GROUP BY l_returnflag""",
    "q16_dim_join" ->
      """SELECT r_name, n_name, count(*) AS n_customers
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",
    "q17_join_topk_revenue" ->
      """SELECT o_orderkey, cast(o_orderdate as date) AS o_date,
         cast(sum(cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(18,2)))) as double) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1999-01-01'
           AND l_shipdate > TIMESTAMP '1997-01-01'
         GROUP BY o_orderkey, cast(o_orderdate as date)
         ORDER BY revenue DESC, o_orderkey LIMIT 10""",
    "q18_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders)""",
    "q19_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""",
    "q20_left_join" ->
      """SELECT n_name, count(c_custkey) AS n_customers
         FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
         GROUP BY n_name""",
    "q21_explode_join" ->
      """SELECT p_brand, count(*) AS n
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand""",
    "q60_rls_optional_filter" ->
      """SELECT event_id, user_id, event_type, value FROM events
         WHERE user_id = 42 AND event_type = 'click'""",
    "q61_progress_rollup" ->
      """SELECT event_type,
         cast(sum(cast(value as decimal(18,2))) as double) / count(*) AS avg_progress,
         cast(min(cast(value as decimal(18,2))) as double) AS min_progress,
         cast(max(cast(value as decimal(18,2))) as double) AS max_progress
         FROM events GROUP BY event_type""",
    "q62_coord_validation" ->
      """WITH pts AS (SELECT cast(c_custkey * 7 % 400 - 200 as double) AS lon,
                             cast(c_custkey * 13 % 200 - 100 as double) AS lat
                      FROM customer)
         SELECT (lat BETWEEN -90 AND 90) AND (lon BETWEEN -180 AND 180) AS valid,
                count(*) AS n
         FROM pts GROUP BY 1""",
    "q63_uuid_validation" ->
      """WITH c AS (SELECT CASE WHEN doc_id % 7 = 0 THEN 'not-a-uuid'
             ELSE substr(md5(cast(doc_id as varchar)), 1, 8) || '-'
               || substr(md5(cast(doc_id as varchar)), 9, 4) || '-'
               || substr(md5(cast(doc_id as varchar)), 13, 4) || '-'
               || substr(md5(cast(doc_id as varchar)), 17, 4) || '-'
               || substr(md5(cast(doc_id as varchar)), 21, 12) END AS cand
           FROM documents)
         SELECT regexp_matches(cand,
           '^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$') AS valid,
           count(*) AS n
         FROM c GROUP BY 1""",
    "q64_mime_sniff" ->
      """SELECT CASE doc_id % 5 WHEN 0 THEN 'image/jpeg' WHEN 1 THEN 'image/png'
           WHEN 2 THEN 'image/tiff' WHEN 3 THEN 'application/zip'
           ELSE 'application/octet-stream' END AS mime, count(*) AS n
         FROM documents GROUP BY 1""",
    "q65_backoff" ->
      """SELECT o_orderkey, cast(o_orderkey % 6 as int) AS attempt,
         1.0 * power(2.0, cast(o_orderkey % 6 as int)) AS delay_s
         FROM orders""",
    "q66_insert_defaults" ->
      """SELECT o_orderkey AS id,
         coalesce(CASE WHEN o_orderkey % 3 = 0 THEN o_orderstatus END, 'pending') AS status,
         coalesce(CASE WHEN o_orderkey % 2 = 0
                       THEN cast(o_orderkey % 100 as double) / 100 END, 0.0) AS progress,
         5 AS priority
         FROM orders""",
    "q67_keyset_page" ->
      "SELECT * FROM customer WHERE c_custkey > 40 ORDER BY c_custkey LIMIT 20",
    "q68_audit_user_join" ->
      """SELECT c_name IS NULL AS unknown_user, count(*) AS n,
         count(DISTINCT user_id) AS n_users
         FROM events LEFT JOIN (SELECT c_custkey AS user_id, c_name
                                FROM customer WHERE c_mktsegment = 'BUILDING') u
         USING (user_id)
         GROUP BY 1""",
    "q69_asof_join" ->
      """WITH ev AS (SELECT event_id, user_id % 25 AS k,
                            date_trunc('second', ts) AS ets FROM events),
         rates AS (SELECT n_nationkey AS k,
                     TIMESTAMP '2024-01-01' + d * INTERVAL 1 DAY AS eff,
                     cast((n_nationkey * 31 + d * 7) % 100 as double) / 10 AS rate
                   FROM nation, unnest(generate_series(0, 29)) AS u(d))
         SELECT e.event_id, e.k, r.rate AS asof_rate
         FROM ev e ASOF LEFT JOIN rates r ON e.k = r.k AND e.ets >= r.eff""",
    "q22_union_distinct" ->
      """SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 180000
         UNION
         SELECT o_orderkey, o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'""",
    "q23_except" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
         EXCEPT
         SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'""",
    "q24_json_extract" ->
      """SELECT cast(json_extract_string(props, '$.k') as int) AS k,
         count(*) AS n, cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
         FROM events GROUP BY 1""",
    "q25_date_math" ->
      """SELECT o_orderkey,
         cast(year(o_orderdate) as int) AS y,
         cast(month(o_orderdate) as int) AS m,
         cast(o_orderdate as date) + 30 AS due,
         cast(cast(o_orderdate as date) - DATE '1995-01-01' as int) AS days_since
         FROM orders""",
    "q26_sha256" ->
      "SELECT doc_id, sha256(text) AS text_sha FROM documents",
    "q27_exact_dedup" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_dups
         FROM documents GROUP BY text""",
    "q28_validation_split" ->
      """SELECT value BETWEEN 0 AND 100 AS valid, count(*) AS n
         FROM events GROUP BY 1""",
    "q29_dup_audit" ->
      """SELECT md5(text) AS fp, count(*) AS n_dups
         FROM documents GROUP BY text HAVING count(*) > 1""",
    "q30_token_counts" ->
      """SELECT token, count(*) AS n FROM
         (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
         GROUP BY token ORDER BY n DESC, token LIMIT 50""",
    "q31_token_stats" ->
      """SELECT doc_id,
         cast(len(string_split(text,' ')) as int) AS n_tokens,
         cast(len(list_distinct(string_split(text,' '))) as int) AS n_distinct,
         cast(length(text) - len(string_split(text,' ')) + 1 as double)
           / greatest(len(string_split(text,' ')), 1) AS mean_token_len
         FROM documents""",
    "q32_lang_profile" ->
      """WITH sc AS (SELECT lang,
           len(list_filter(string_split(text,' '), x -> x IN ('the','a','of','and','to'))) AS en,
           len(list_filter(string_split(text,' '), x -> x IN ('der','die','das','und','ist'))) AS de,
           len(list_filter(string_split(text,' '), x -> x IN ('le','la','les','et','est'))) AS fr,
           len(list_filter(string_split(text,' '), x -> x IN ('el','los','las','y','es'))) AS es
           FROM documents)
         SELECT lang,
           CASE WHEN en >= de AND en >= fr AND en >= es AND en > 0 THEN 'en'
                WHEN de >= fr AND de >= es AND de > 0 THEN 'de'
                WHEN fr >= es AND fr > 0 THEN 'fr'
                WHEN es > 0 THEN 'es' ELSE 'und' END AS pred,
           count(*) AS n
         FROM sc GROUP BY 1, 2""",
    "q33_quality_score" ->
      """WITH d AS (SELECT doc_id, text, string_split(text,' ') AS t FROM documents)
         SELECT doc_id,
           cast(len(t) as int) AS n_tokens,
           cast(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) as double)
             / greatest(length(text), 1) AS punct_ratio,
           cast(len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is','it','that','for'))) as double)
             / greatest(len(t), 1) AS stopword_ratio,
           cast(length(text) - len(t) + 1 as double) / greatest(len(t), 1) AS mean_token_len
         FROM d""",
    "q34_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
         FROM documents""",
    "q35_bag_dedup" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(string_split(text,' '))), ' ')) AS fp,
         min(doc_id) AS keep_id, count(*) AS n_dups
         FROM documents GROUP BY 1""",
    "q36_neardup_jaccard" ->
      """WITH t0 AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
         toks AS (SELECT doc_id, list_distinct(list_transform(
                    generate_series(1, len(w)-2), i -> array_to_string(w[i:i+2], ' '))) AS t
                  FROM t0 WHERE len(w) >= 3),
         shl AS (SELECT doc_id, unnest(t) AS sng FROM toks),
         hot AS (SELECT sng FROM shl GROUP BY sng HAVING count(*) > 100),
         kept AS (SELECT doc_id, sng FROM shl WHERE sng NOT IN (SELECT sng FROM hot)),
         hs AS (SELECT doc_id, list(('0x' || substr(md5(sng), 1, 15))::bigint % 1000000007) AS h
                FROM kept GROUP BY doc_id),
         sig AS (SELECT doc_id, list_transform(generate_series(0, 31),
                   i -> list_min(list_transform(h, x -> (x*(i*2+3) + (i*5+7)) % 1000000007))) AS s
                 FROM hs),
         bands AS (SELECT doc_id, b AS band_id,
                     md5(array_to_string(s[b*4+1 : b*4+4], ',')) AS band_hash
                   FROM sig, unnest(generate_series(0, 7)) AS u(b)),
         cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                  FROM bands a
                  JOIN bands b ON a.band_id = b.band_id AND a.band_hash = b.band_hash
                              AND a.doc_id < b.doc_id)
         SELECT doc_a, doc_b,
           cast(len(list_intersect(sa.t, sb.t)) as double)
             / (len(sa.t) + len(sb.t) - len(list_intersect(sa.t, sb.t))) AS jaccard
         FROM cand
         JOIN toks sa ON sa.doc_id = doc_a
         JOIN toks sb ON sb.doc_id = doc_b
         WHERE cast(len(list_intersect(sa.t, sb.t)) as double)
             / (len(sa.t) + len(sb.t) - len(list_intersect(sa.t, sb.t))) >= 0.5""",
    "q37_minhash_candidates" ->
      """WITH t0 AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
         toks AS (SELECT doc_id, list_distinct(list_transform(
                    generate_series(1, len(w)-2), i -> array_to_string(w[i:i+2], ' '))) AS t
                  FROM t0 WHERE len(w) >= 3),
         hs AS (SELECT doc_id, list_transform(t,
                  tok -> ('0x' || substr(md5(tok), 1, 15))::bigint % 1000000007) AS h
                FROM toks),
         sig AS (SELECT doc_id, list_transform(generate_series(0, 31),
                   i -> list_min(list_transform(h, x -> (x*(i*2+3) + (i*5+7)) % 1000000007))) AS s
                 FROM hs),
         bands AS (SELECT doc_id, b AS band_id,
                     md5(array_to_string(s[b*4+1 : b*4+4], ',')) AS band_hash
                   FROM sig, unnest(generate_series(0, 7)) AS u(b))
         SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a
         JOIN bands b ON a.band_id = b.band_id AND a.band_hash = b.band_hash
                     AND a.doc_id < b.doc_id""",
    "q38_simhash" ->
      """WITH hs AS (SELECT doc_id, list_transform(string_split(text,' '),
                  tok -> ('0x' || substr(md5(tok), 1, 8))::bigint) AS h
                FROM documents)
         SELECT doc_id, cast(list_sum(list_transform(generate_series(0, 31), j ->
           CASE WHEN list_sum(list_transform(h, x ->
             CASE WHEN (x // cast(2**j as bigint)) % 2 = 1 THEN 1 ELSE -1 END)) > 0
           THEN cast(2**j as bigint) ELSE 0 END)) as bigint) AS simhash
         FROM hs""",
    "q56_pii_scrub" ->
      """SELECT doc_id, md5(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 text || ' contact user' || cast(doc_id as varchar)
                      || '@example.com or +1-555-'
                      || lpad(cast(doc_id % 10000 as varchar), 4, '0'),
                 'https?://[^ ]+', '<URL>', 'g'),
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS scrubbed_md5
         FROM documents""",
    "q57_repetition" ->
      """WITH t0 AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
         g AS (SELECT doc_id, unnest(list_transform(
                 generate_series(1, len(w)-1), i -> array_to_string(w[i:i+1], ' '))) AS gram
               FROM t0 WHERE len(w) >= 2),
         c AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2)
         SELECT doc_id, cast(sum(c) as bigint) AS n_grams,
           max(c) AS top_gram_count,
           cast(max(c) as double) / sum(c) AS repetition_ratio
         FROM c GROUP BY doc_id""",
    "q59_decontaminate" ->
      """WITH t0 AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
                  generate_series(1, len(w)-2), i -> array_to_string(w[i:i+2], ' ')))) AS s
                FROM t0 WHERE len(w) >= 3),
         bsh AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0)
         SELECT doc_id, count(*) AS n_hits FROM sh
         WHERE doc_id % 97 <> 0 AND s IN (SELECT s FROM bsh)
         GROUP BY doc_id""",
    "q55_length_quantiles" ->
      """WITH t AS (SELECT lang, len(string_split(text,' ')) AS n_tokens FROM documents)
         SELECT lang, count(*) AS n,
           quantile_cont(n_tokens, 0.5) AS p50,
           quantile_cont(n_tokens, 0.9) AS p90,
           quantile_cont(n_tokens, 0.99) AS p99
         FROM t GROUP BY lang""",
    "q54_hash_split" ->
      """WITH b AS (SELECT doc_id,
           ('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::bigint % 10000 AS hb
         FROM documents)
         SELECT CASE WHEN hb < 8000 THEN 'train'
                     WHEN hb < 9000 THEN 'val'
                     ELSE 'test' END AS split,
           count(*) AS n, min(doc_id) AS min_id
         FROM b GROUP BY 1""",
    "q53_dedup_corpus" ->
      """WITH RECURSIVE elig AS (SELECT doc_id, text FROM documents
                                 WHERE len(string_split(text,' ')) >= 3),
         reps AS (SELECT min(doc_id) AS doc_id, text FROM elig GROUP BY text),
         t0 AS (SELECT doc_id, string_split(text,' ') AS w FROM reps),
         toks AS (SELECT doc_id, list_distinct(list_transform(
                    generate_series(1, len(w)-2), i -> array_to_string(w[i:i+2], ' '))) AS t
                  FROM t0),
         shl AS (SELECT doc_id, unnest(t) AS sng FROM toks),
         hot AS (SELECT sng FROM shl GROUP BY sng HAVING count(*) > 100),
         kept AS (SELECT doc_id, sng FROM shl WHERE sng NOT IN (SELECT sng FROM hot)),
         hs AS (SELECT doc_id, list(('0x' || substr(md5(sng), 1, 15))::bigint % 1000000007) AS h
                FROM kept GROUP BY doc_id),
         sig AS (SELECT doc_id, list_transform(generate_series(0, 31),
                   i -> list_min(list_transform(h, x -> (x*(i*2+3) + (i*5+7)) % 1000000007))) AS s
                 FROM hs),
         bands AS (SELECT doc_id, b AS band_id,
                     md5(array_to_string(s[b*4+1 : b*4+4], ',')) AS band_hash
                   FROM sig, unnest(generate_series(0, 7)) AS u(b)),
         cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                  FROM bands a
                  JOIN bands b ON a.band_id = b.band_id AND a.band_hash = b.band_hash
                              AND a.doc_id < b.doc_id),
         pairs AS (SELECT doc_a, doc_b FROM cand
                   JOIN toks sa ON sa.doc_id = doc_a
                   JOIN toks sb ON sb.doc_id = doc_b
                   WHERE cast(len(list_intersect(sa.t, sb.t)) as double)
                       / (len(sa.t) + len(sb.t) - len(list_intersect(sa.t, sb.t))) >= 0.5),
         edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                   UNION SELECT doc_b, doc_a FROM pairs),
         reach(a, b) AS (SELECT a, b FROM edges
                         UNION SELECT r.a, e.b FROM reach r
                               JOIN edges e ON r.b = e.a AND e.b <> r.a),
         rep_dropped AS (SELECT DISTINCT a AS doc_id FROM reach WHERE b < a),
         member_dropped AS (SELECT e.doc_id FROM elig e
                            JOIN reps r ON e.text = r.text AND e.doc_id <> r.doc_id)
         SELECT doc_id FROM documents
         WHERE doc_id NOT IN (SELECT doc_id FROM rep_dropped)
           AND doc_id NOT IN (SELECT doc_id FROM member_dropped)""",
    "q52_simhash_pairs" ->
      """WITH hs AS (SELECT doc_id, list_transform(string_split(text,' '),
                  tok -> ('0x' || substr(md5(tok), 1, 8))::bigint) AS h
                FROM documents),
         sh AS (SELECT doc_id, cast(list_sum(list_transform(generate_series(0, 31), j ->
             CASE WHEN list_sum(list_transform(h, x ->
               CASE WHEN (x // cast(2**j as bigint)) % 2 = 1 THEN 1 ELSE -1 END)) > 0
             THEN cast(2**j as bigint) ELSE 0 END)) as bigint) AS simhash
           FROM hs),
         bands AS (SELECT doc_id, simhash, b AS band_id,
             (simhash // cast(2**(b*8) as bigint)) % 256 AS band_val
           FROM sh, unnest(generate_series(0, 3)) AS u(b)),
         cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sa, b.simhash AS sb
           FROM bands a
           JOIN bands b ON a.band_id = b.band_id AND a.band_val = b.band_val
                       AND a.doc_id < b.doc_id)
         SELECT doc_a, doc_b, cast(bit_count(xor(sa, sb)) as int) AS hamming
         FROM cand WHERE bit_count(xor(sa, sb)) <= 3""",
    "q39_knn_brute" -> KnnBruteSql,
    "q41_knn_lsh" -> KnnLshSql,
    "q42_bbox_join" ->
      """WITH boxes AS (SELECT n_name,
             cast(n_nationkey * 29 % 300 - 170 as double) AS min_lon,
             cast(n_nationkey * 17 % 140 - 80 as double) AS min_lat,
             cast(n_nationkey * 29 % 300 - 170 + 40 as double) AS max_lon,
             cast(n_nationkey * 17 % 140 - 80 + 30 as double) AS max_lat
           FROM nation),
         pts AS (SELECT c_custkey,
             cast(c_custkey * 7 % 360 - 180 as double) AS lon,
             cast(c_custkey * 13 % 180 - 90 as double) AS lat
           FROM customer)
         SELECT n_name, count(*) AS n_points
         FROM pts JOIN boxes
           ON lon BETWEEN min_lon AND max_lon AND lat BETWEEN min_lat AND max_lat
         GROUP BY n_name""",
    "q43_point_in_polygon" ->
      """WITH pts AS (SELECT c_custkey,
             cast(c_custkey * 7 % 360 - 180 as double) AS lon,
             cast(c_custkey * 13 % 180 - 90 as double) AS lat
           FROM customer)
         SELECT c_custkey,
           ((CASE WHEN ((0.0 > lat) != (20.0 > lat)) AND lon < (-100.0 - 0.0) * (lat - 0.0) / (20.0 - 0.0) + 0.0 THEN 1 ELSE 0 END)
          + (CASE WHEN ((10.0 > lat) != (0.0 > lat)) AND lon < (0.0 - 120.0) * (lat - 10.0) / (0.0 - 10.0) + 120.0 THEN 1 ELSE 0 END)
          + (CASE WHEN ((80.0 > lat) != (10.0 > lat)) AND lon < (120.0 - 140.0) * (lat - 80.0) / (10.0 - 80.0) + 140.0 THEN 1 ELSE 0 END)
          + (CASE WHEN ((70.0 > lat) != (80.0 > lat)) AND lon < (140.0 - (-30.0)) * (lat - 70.0) / (80.0 - 70.0) + (-30.0) THEN 1 ELSE 0 END)
          + (CASE WHEN ((20.0 > lat) != (70.0 > lat)) AND lon < ((-30.0) - (-100.0)) * (lat - 20.0) / (70.0 - 20.0) + (-100.0) THEN 1 ELSE 0 END)
           ) % 2 = 1 AS inside
         FROM pts""",
    "q70_polygon_overlap" -> q70OracleSql,
    "q114_polygon_overlap_holes" -> q114OracleSql,
    "q118_multipolygon_overlap" -> q118OracleSql,
    // PMI: ln(c12*N/(c1*c2)) rounded to 6 dp, min-count floor, global
    // top-20 with (pmi desc, pair) tie-break
    "q126_pmi_collocations" ->
      """WITH d AS (SELECT list_filter(string_split(text, ' '), t -> t <> '') AS toks
           FROM documents),
         nn AS (SELECT toks, len(toks) AS n FROM d WHERE len(toks) >= 2),
         bg AS (SELECT toks[i] AS t1, toks[i + 1] AS t2
           FROM (SELECT toks, unnest(range(1, n)) AS i FROM nn) x),
         c12 AS (SELECT t1, t2, count(*) AS c12 FROM bg GROUP BY 1, 2),
         c1 AS (SELECT t1, count(*) AS c1 FROM bg GROUP BY 1),
         c2 AS (SELECT t2, count(*) AS c2 FROM bg GROUP BY 1),
         nb AS (SELECT count(*) AS n_bigrams FROM bg)
         SELECT t1, t2, c12,
           round(ln((cast(c12 AS double) * cast(n_bigrams AS double)) /
             (cast(c1 AS double) * cast(c2 AS double))), 6) AS pmi
         FROM c12 JOIN c1 USING (t1) JOIN c2 USING (t2) CROSS JOIN nb
         WHERE c12 >= 5
         ORDER BY pmi DESC, t1, t2 LIMIT 20""",
    // Q5: local-supplier star join; same decimal-revenue idiom as q17
    "q131_regional_revenue" ->
      """SELECT n_name,
         cast(sum(cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(18,2)))) as double) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY n_name""",
    // Q13: zero-order customers kept by the left join + count(non-null)
    "q132_custdist" ->
      """SELECT c_count, count(*) AS custdist FROM (
           SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT JOIN (
             SELECT o_orderkey, o_custkey FROM orders
             WHERE o_orderpriority <> '1-URGENT') o ON c_custkey = o_custkey
           GROUP BY c_custkey)
         GROUP BY c_count""",
    "q135_cube" ->
      """SELECT lang, source, count(*) AS n,
           cast(sum(n_chars) AS bigint) AS total_chars
         FROM documents GROUP BY CUBE (lang, source)""",
    // BFS: recursive CTE over the same undirected bipartite graph; UNION
    // (not UNION ALL) dedups (node, hops) states, hops < 3 bounds recursion,
    // min(hops) per node = shortest distance — exactly the frontier
    // invariant on the Spark side
    "q145_bfs_hops" ->
      """WITH RECURSIVE
         p AS (SELECT DISTINCT 'c' || cast(o_custkey AS varchar) AS src,
                 's' || cast(l_suppkey AS varchar) AS dst
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         ed AS (SELECT src, dst FROM p UNION ALL SELECT dst AS src, src AS dst FROM p),
         bfs(node, hops) AS (
           SELECT 'c' || cast(c_custkey AS varchar) AS node, 0 AS hops
           FROM customer WHERE c_custkey <= 5
           UNION
           SELECT e.dst, b.hops + 1 FROM bfs b JOIN ed e ON e.src = b.node
           WHERE b.hops < 3)
         SELECT node, cast(min(hops) AS int) AS hops FROM bfs GROUP BY node""",
    // Q3: same decimal-revenue idiom as q131; ORDER BY is a total order
    // (revenue desc, date, orderkey) so the LIMIT is engine-deterministic
    "q146_shipping_priority" ->
      """SELECT l_orderkey, cast(o_orderdate AS date) AS o_date, o_orderpriority,
           cast(sum(cast(l_extendedprice AS decimal(18,2)) * (1 - cast(l_discount AS decimal(18,2)))) AS double) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1997-01-01'
           AND l_shipdate > TIMESTAMP '1997-01-01'
         GROUP BY 1, 2, 3
         ORDER BY revenue DESC, o_date, l_orderkey LIMIT 10""",
    "q147_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
           cast(sum(cast(l_extendedprice AS decimal(18,2)) * (1 - cast(l_discount AS decimal(18,2)))) AS double) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE l_returnflag = 'R'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1996-07-01'
         GROUP BY 1, 2, 3, 4
         ORDER BY revenue DESC, c_custkey LIMIT 20""",
    // gaps-and-islands: day − row_number() is constant within a consecutive
    // run; day-level grain so the window is span-bounded
    "q148_activity_streaks" ->
      """WITH daily AS (SELECT DISTINCT user_id,
             cast(date_trunc('day', ts) AS date) AS day FROM events),
         isl AS (SELECT user_id,
             (day - DATE '1995-01-01') - row_number() OVER (
               PARTITION BY user_id ORDER BY day) AS grp
           FROM daily),
         runs AS (SELECT user_id, grp, count(*) AS len FROM isl GROUP BY 1, 2)
         SELECT user_id, max(len) AS best_streak, count(*) AS n_streaks,
           cast(sum(len) AS bigint) AS active_days
         FROM runs GROUP BY user_id""",
    // rolling distinct: same day-grain contribution-explode construction —
    // a (user, day) pair contributes to the 7 window-end days it covers;
    // count(*) after the (user, win_day) distinct IS the distinct-user count
    "q149_rolling_active" ->
      """WITH daily AS (SELECT DISTINCT user_id,
             cast(date_trunc('day', ts) AS date) AS day FROM events),
         days AS (SELECT DISTINCT day FROM daily),
         contrib AS (SELECT DISTINCT user_id, day + cast(x AS integer) AS win_day
           FROM daily CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS x) o)
         SELECT c.win_day, count(*) AS active_users
         FROM contrib c JOIN days d ON c.win_day = d.day
         GROUP BY c.win_day""",
    // unpivot = stacked UNION ALL; measure names are the Spark-side column
    // aliases, values cast to the common double type on both sides
    "q150_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
           cast(l_quantity AS double) AS value FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'extendedprice' AS measure,
           cast(l_extendedprice AS double) AS value FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'tax' AS measure,
           cast(l_tax AS double) AS value FROM lineitem""",
    // co-purchase: within-basket a<b pairs, symmetric re-orientation, top-k
    // per item on (n_co desc, other asc) — a total order, so row_number is
    // deterministic on both engines
    "q151_copurchase" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS item
             FROM lineitem),
         pairs AS (SELECT a.item AS item, c.item AS other, count(*) AS n_co
           FROM b a JOIN b c ON a.ok = c.ok AND a.item < c.item GROUP BY 1, 2),
         sym AS (SELECT item, other, n_co FROM pairs
           UNION ALL SELECT other AS item, item AS other, n_co FROM pairs),
         rk AS (SELECT item, other, n_co, row_number() OVER (
             PARTITION BY item ORDER BY n_co DESC, other) AS rnk FROM sym)
         SELECT item, other, n_co, rnk FROM rk WHERE rnk <= 5""",
    // Pearson r from exact decimal moments, mirrored double tree:
    // vx = n*sxx − sx², vy likewise, r = (n*sxy − sx*sy)/sqrt(vx*vy);
    // zero-variance groups excluded (r undefined)
    "q152_exact_corr" ->
      """WITH t AS (SELECT l_suppkey,
             cast(l_quantity AS decimal(18,2)) AS x,
             cast(l_extendedprice AS decimal(18,2)) AS y FROM lineitem),
         m AS (SELECT l_suppkey, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
             sum(x * x) AS sxx, sum(y * y) AS syy
           FROM t GROUP BY 1),
         d AS (SELECT l_suppkey, n,
             cast(n AS double) * cast(sxx AS double) -
               cast(sx AS double) * cast(sx AS double) AS vx,
             cast(n AS double) * cast(syy AS double) -
               cast(sy AS double) * cast(sy AS double) AS vy,
             cast(n AS double) * cast(sxy AS double) -
               cast(sx AS double) * cast(sy AS double) AS num
           FROM m)
         SELECT l_suppkey, n, round(num / sqrt(vx * vy), 6) AS corr
         FROM d WHERE vx > 0 AND vy > 0""",
    // Q4 shape: EXISTS with a correlated date predicate
    "q153_priority_check" ->
      """SELECT o_orderpriority, count(*) AS n_orders FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
           AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
         GROUP BY 1""",
    // Q12 shape: two-way conditional counts; cast(sum AS bigint) because
    // DuckDB widens sum(int) past int64
    "q154_priority_mix" ->
      """SELECT l_linestatus,
           cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 1 ELSE 0 END) AS bigint) AS high_line_count,
           cast(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             THEN 1 ELSE 0 END) AS bigint) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1998-01-01'
           AND l_shipdate < TIMESTAMP '1999-01-01'
         GROUP BY 1""",
    // Q17 shape: qty < 0.2·avg as the exact decimal inequality 5·n·qty < sum
    "q155_small_qty_revenue" ->
      """WITH l AS (SELECT l_partkey,
             cast(l_quantity AS decimal(18,2)) AS qty,
             cast(l_extendedprice AS decimal(18,2)) AS price FROM lineitem),
         pa AS (SELECT l_partkey, count(*) AS n_lines, sum(qty) AS sum_qty
           FROM l GROUP BY 1)
         SELECT count(*) AS n_small,
           cast(sum(price) AS double) / cast(7.0 AS double) AS avg_yearly
         FROM l JOIN pa USING (l_partkey)
         WHERE qty * 5 * n_lines < sum_qty""",
    // Q18 shape: HAVING-filtered order rollup joined back to its dimensions
    "q156_big_orders" ->
      """WITH big AS (SELECT l_orderkey,
             cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS sum_qty
           FROM lineitem GROUP BY 1
           HAVING sum(cast(l_quantity AS decimal(18,2))) >= 300)
         SELECT c_name, c_custkey, o_orderkey,
           cast(o_orderdate AS date) AS o_date, o_totalprice, sum_qty
         FROM big JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey""",
    // Q21 shape: distinct late-(order,supplier) pairs, EXISTS another
    // supplier on the order, NOT EXISTS another LATE supplier
    "q157_waiting_supplier" ->
      """WITH lo AS (SELECT l_orderkey AS ok, l_suppkey AS sk,
             l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         lateS AS (SELECT DISTINCT ok, sk FROM lo WHERE late),
         lone AS (SELECT * FROM lateS t
           WHERE EXISTS (SELECT 1 FROM lo WHERE lo.ok = t.ok AND lo.sk <> t.sk)
             AND NOT EXISTS (SELECT 1 FROM lo
               WHERE lo.ok = t.ok AND lo.sk <> t.sk AND lo.late))
         SELECT s_name, count(*) AS numwait
         FROM lone JOIN supplier ON sk = s_suppkey GROUP BY 1""",
    // Q22 shape: bal > global positive avg as the exact inequality
    // bal·n > sum; dormancy = no orders since the cutoff
    "q158_dormant_value" ->
      """WITH thr AS (SELECT count(*) AS n_pos,
             sum(cast(c_acctbal AS decimal(18,2))) AS sum_bal
           FROM customer WHERE c_acctbal > 0)
         SELECT c_nationkey, count(*) AS n_cust,
           cast(sum(cast(c_acctbal AS decimal(18,2))) AS double) AS total_bal
         FROM customer, thr
         WHERE cast(c_acctbal AS decimal(18,2)) * n_pos > sum_bal
           AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
             AND o_orderdate >= TIMESTAMP '2001-01-01')
         GROUP BY 1""",
    // skyline: dominance NOT EXISTS over the distinct-pair grain
    "q159_skyline" ->
      """WITH pairs AS (SELECT p_retailprice, p_size, count(*) AS n
           FROM part GROUP BY 1, 2)
         SELECT p_retailprice, p_size, n FROM pairs t
         WHERE NOT EXISTS (SELECT 1 FROM pairs o
           WHERE o.p_retailprice <= t.p_retailprice AND o.p_size >= t.p_size
             AND (o.p_retailprice < t.p_retailprice OR o.p_size > t.p_size))""",
    // weighted median: smallest v with 2·cumw ≥ total, exact decimal
    // weights at the (group, value) grain
    "q160_weighted_median" ->
      """WITH grain AS (SELECT l_suppkey, l_extendedprice AS v,
             sum(cast(l_quantity AS decimal(18,2))) AS wv
           FROM lineitem WHERE cast(l_quantity AS decimal(18,2)) > 0
           GROUP BY 1, 2),
         c AS (SELECT l_suppkey, v,
             sum(wv) OVER (PARTITION BY l_suppkey ORDER BY v) AS cum,
             sum(wv) OVER (PARTITION BY l_suppkey) AS tot FROM grain)
         SELECT l_suppkey, min(v) AS wmedian FROM c
         WHERE cum * 2 >= tot GROUP BY 1""",
    // profiler: per-column stats as UNION ALL branches; numeric min/max as
    // double, string min/max lexicographic (ASCII-only columns)
    "q161_profile" ->
      """SELECT 'l_quantity' AS col_name, count(l_quantity) AS n_nonnull,
           count(DISTINCT l_quantity) AS n_distinct,
           cast(min(l_quantity) AS double) AS min_num,
           cast(max(l_quantity) AS double) AS max_num,
           cast(NULL AS varchar) AS min_str, cast(NULL AS varchar) AS max_str
         FROM lineitem
         UNION ALL
         SELECT 'l_extendedprice', count(l_extendedprice),
           count(DISTINCT l_extendedprice),
           cast(min(l_extendedprice) AS double),
           cast(max(l_extendedprice) AS double),
           cast(NULL AS varchar), cast(NULL AS varchar) FROM lineitem
         UNION ALL
         SELECT 'l_discount', count(l_discount), count(DISTINCT l_discount),
           cast(min(l_discount) AS double), cast(max(l_discount) AS double),
           cast(NULL AS varchar), cast(NULL AS varchar) FROM lineitem
         UNION ALL
         SELECT 'l_tax', count(l_tax), count(DISTINCT l_tax),
           cast(min(l_tax) AS double), cast(max(l_tax) AS double),
           cast(NULL AS varchar), cast(NULL AS varchar) FROM lineitem
         UNION ALL
         SELECT 'l_returnflag', count(l_returnflag),
           count(DISTINCT l_returnflag), cast(NULL AS double),
           cast(NULL AS double), min(l_returnflag), max(l_returnflag)
         FROM lineitem
         UNION ALL
         SELECT 'l_linestatus', count(l_linestatus),
           count(DISTINCT l_linestatus), cast(NULL AS double),
           cast(NULL AS double), min(l_linestatus), max(l_linestatus)
         FROM lineitem""",
    // entropy: −Σ p·ln p, per-term 6-dp rounded, exact decimal sum (the
    // q127 KL discipline)
    "q162_entropy" ->
      """WITH gc AS (SELECT user_id, event_type, count(*) AS c
           FROM events GROUP BY 1, 2),
         n AS (SELECT user_id, cast(sum(c) AS bigint) AS n FROM gc GROUP BY 1)
         SELECT user_id, max(n) AS n_events,
           count(DISTINCT event_type) AS n_cats,
           cast(sum(cast(round(-(cast(c AS double) / cast(n AS double)) *
             ln(cast(c AS double) / cast(n AS double)), 6)
             AS decimal(18,6))) AS double) AS entropy
         FROM gc JOIN n USING (user_id) GROUP BY user_id""",
    // streamed sketch + exact recount == plain batch top-n (q116's oracle)
    "q163_stream_heavy_hitters" ->
      """WITH it AS (SELECT cast(1000 // (1 +
             (('0x' || substr(md5(cast(doc_id AS varchar)), 1, 8))::bigint % 1000))
             AS varchar) AS key
           FROM documents)
         SELECT key, count(*) AS cnt FROM it GROUP BY 1
         ORDER BY cnt DESC, key ASC LIMIT 4""",
    // equi-depth: bucket = (cum−c)·B div tot, pure integer arithmetic over
    // the (group, value) distribution grain
    "q164_equidepth" ->
      """WITH grain AS (SELECT l_returnflag, l_extendedprice AS v,
             count(*) AS c FROM lineitem GROUP BY 1, 2),
         cumt AS (SELECT l_returnflag, v, c,
             sum(c) OVER (PARTITION BY l_returnflag ORDER BY v) AS cum,
             sum(c) OVER (PARTITION BY l_returnflag) AS tot FROM grain)
         SELECT l_returnflag,
           cast(((cum - c) * 8) // tot AS bigint) AS bucket,
           cast(sum(c) AS bigint) AS n_rows, min(v) AS v_min, max(v) AS v_max
         FROM cumt GROUP BY 1, 2""",
    // rolling corr: micros-exact trailing range frame, six exact decimal
    // window sums, one mirrored double tree; degenerate windows -> null r
    "q165_rolling_corr" ->
      """WITH t AS (SELECT l_orderkey, l_linenumber, l_suppkey,
             epoch_us(l_shipdate) AS us,
             cast(l_quantity AS decimal(18,2)) AS x,
             cast(l_extendedprice AS decimal(18,2)) AS y FROM lineitem),
         m AS (SELECT l_orderkey, l_linenumber,
             count(*) OVER w AS n, sum(x) OVER w AS sx, sum(y) OVER w AS sy,
             sum(x * y) OVER w AS sxy, sum(x * x) OVER w AS sxx,
             sum(y * y) OVER w AS syy
           FROM t WINDOW w AS (PARTITION BY l_suppkey ORDER BY us
             RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW)),
         d AS (SELECT l_orderkey, l_linenumber, n,
             cast(n AS double) * cast(sxx AS double) -
               cast(sx AS double) * cast(sx AS double) AS vx,
             cast(n AS double) * cast(syy AS double) -
               cast(sy AS double) * cast(sy AS double) AS vy,
             cast(n AS double) * cast(sxy AS double) -
               cast(sx AS double) * cast(sy AS double) AS num
           FROM m)
         SELECT l_orderkey, l_linenumber, cast(n AS bigint) AS n_win,
           CASE WHEN vx > 0 AND vy > 0
             THEN round(num / sqrt(vx * vy), 6) END AS r
         FROM d""",
    // Q2 shape: per-part top-1 on (exact integer-cents unit price, suppkey)
    "q166_cheapest_supplier" ->
      """WITH u AS (SELECT l_partkey, l_suppkey,
             cast(cast(round(l_extendedprice * 100) AS bigint) AS double) /
               cast(cast(round(l_quantity * 100) AS bigint) AS double) AS unit
           FROM lineitem WHERE l_quantity > 0),
         r AS (SELECT *, row_number() OVER (PARTITION BY l_partkey
             ORDER BY unit, l_suppkey) AS rn FROM u)
         SELECT l_partkey, s_name, unit FROM r
         JOIN supplier ON l_suppkey = s_suppkey WHERE rn = 1""",
    // churn: distinct-actives set algebra across two periods
    "q167_churn" ->
      """WITH a AS (SELECT DISTINCT user_id FROM events
           WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-15'),
         b AS (SELECT DISTINCT user_id FROM events
           WHERE ts >= TIMESTAMP '2024-01-15')
         SELECT user_id, 'retained' AS status FROM a
           WHERE EXISTS (SELECT 1 FROM b WHERE b.user_id = a.user_id)
         UNION ALL
         SELECT user_id, 'churned' FROM a
           WHERE NOT EXISTS (SELECT 1 FROM b WHERE b.user_id = a.user_id)
         UNION ALL
         SELECT user_id, 'new' FROM b
           WHERE NOT EXISTS (SELECT 1 FROM a WHERE a.user_id = b.user_id)""",
    // degree distribution over the undirected bipartite graph
    "q168_degree_dist" ->
      """WITH pairs AS (SELECT DISTINCT 'c' || o_custkey AS src,
             's' || l_suppkey AS dst
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         edges AS (SELECT src, dst FROM pairs
           UNION ALL SELECT dst AS src, src AS dst FROM pairs),
         deg AS (SELECT src, count(*) AS degree FROM edges GROUP BY 1)
         SELECT degree, count(*) AS n_nodes FROM deg GROUP BY 1""",
    // incremental agg: merged partial states == full recompute
    "q169_incremental_agg" ->
      """SELECT o_custkey, count(*) AS n,
           cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS sum_v,
           min(o_totalprice) AS min_v, max(o_totalprice) AS max_v
         FROM orders GROUP BY 1""",
    // CDC apply: latest op per key over the log; D kills, I/U replaces,
    // untouched snapshot rows carry with src='base'
    "q170_cdc_apply" ->
      """WITH log AS (SELECT user_id AS key, ts, value, event_id,
             CASE ('0x' || substr(md5(cast(event_id AS varchar)), 1, 8))::bigint % 3
               WHEN 0 THEN 'U' WHEN 1 THEN 'I' ELSE 'D' END AS op
           FROM events),
         latest AS (SELECT key, op, value FROM (SELECT *, row_number() OVER (
             PARTITION BY key ORDER BY ts DESC, event_id DESC) AS rn FROM log)
           WHERE rn = 1)
         SELECT c_custkey AS key, c_acctbal AS value, 'base' AS src
         FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM latest WHERE latest.key = c_custkey)
         UNION ALL
         SELECT key, value, 'cdc' FROM latest WHERE op <> 'D'""",
    // association rules: every statistic ONE division of exact integer
    // counts (lift = n_co*N / n_item*n_other) — bit-identical, no rounding
    "q171_assoc_rules" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS item
             FROM lineitem),
         pairs AS (SELECT a.item AS item, c.item AS other, count(*) AS n_co
           FROM b a JOIN b c ON a.ok = c.ok AND a.item < c.item
           GROUP BY 1, 2 HAVING count(*) >= 2),
         sym AS (SELECT item, other, n_co FROM pairs
           UNION ALL SELECT other AS item, item AS other, n_co FROM pairs),
         supp AS (SELECT item, count(*) AS n_item FROM b GROUP BY 1),
         tot AS (SELECT count(DISTINCT ok) AS n_baskets FROM b)
         SELECT item, other, n_co,
           cast(n_co AS double) / cast(n_baskets AS double) AS support,
           cast(n_co AS double) / cast(n_item AS double) AS confidence,
           cast(n_co * n_baskets AS double) /
             cast(n_item * n_other AS double) AS lift
         FROM sym JOIN supp USING (item)
         JOIN (SELECT item AS other, n_item AS n_other FROM supp) USING (other)
         CROSS JOIN tot""",
    // OHLC: first/last under the (ts, event_id) total order via two
    // row_number flags folded into one hash agg
    "q172_ohlc" ->
      """WITH t AS (SELECT user_id, cast(date_trunc('day', ts) AS date) AS day,
             value,
             row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
               ORDER BY ts ASC, event_id ASC) AS ra,
             row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
               ORDER BY ts DESC, event_id DESC) AS rd
           FROM events)
         SELECT user_id, day,
           max(CASE WHEN ra = 1 THEN value END) AS open,
           max(value) AS high, min(value) AS low,
           max(CASE WHEN rd = 1 THEN value END) AS close,
           count(*) AS n_events
         FROM t GROUP BY 1, 2""",
    // trending: per-month part counts, top-5 on (n desc, partkey)
    "q173_monthly_top_parts" ->
      """WITH cnt AS (SELECT date_trunc('month', o_orderdate) AS month,
             l_partkey, count(*) AS n_lines
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY 1, 2),
         r AS (SELECT *, row_number() OVER (PARTITION BY month
             ORDER BY n_lines DESC, l_partkey ASC) AS rnk FROM cnt)
         SELECT month, l_partkey, n_lines, rnk FROM r WHERE rnk <= 5""",
    // Q7: nation-pair volume; same decimal-revenue idiom as q17/q131
    "q174_volume_shipping" ->
      """SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           cast(extract(year FROM l_shipdate) AS int) AS l_year,
           cast(sum(cast(l_extendedprice AS decimal(18,2)) *
             (1 - cast(l_discount AS decimal(18,2)))) AS double) AS revenue
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ns ON s_nationkey = ns.n_nationkey
         JOIN nation nc ON c_nationkey = nc.n_nationkey
         WHERE ns.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
           AND nc.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
           AND ns.n_name <> nc.n_name
           AND l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
         GROUP BY 1, 2, 3""",
    // Q8: market share = one division of two exact-decimal sums as doubles
    "q175_market_share" ->
      """SELECT cast(extract(year FROM o_orderdate) AS int) AS o_year,
           cast(sum(CASE WHEN ns.n_name = 'NATION_5'
               THEN cast(l_extendedprice AS decimal(18,2)) *
                 (1 - cast(l_discount AS decimal(18,2)))
               ELSE cast(0 AS decimal(18,2)) END) AS double) /
           cast(sum(cast(l_extendedprice AS decimal(18,2)) *
             (1 - cast(l_discount AS decimal(18,2)))) AS double) AS mkt_share
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ncust ON c_nationkey = ncust.n_nationkey
         JOIN region ON ncust.n_regionkey = r_regionkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ns ON s_nationkey = ns.n_nationkey
         WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY 1""",
    // Q9 adapted: rev and retail-cost as SEPARATE exact-decimal sums,
    // combined once as doubles (fused term would overflow decimal-38)
    "q176_product_profit" ->
      """SELECT n_name, cast(extract(year FROM o_orderdate) AS int) AS o_year,
           cast(sum(cast(l_extendedprice AS decimal(18,2)) *
             (1 - cast(l_discount AS decimal(18,2)))) AS double) -
           cast(sum(cast(p_retailprice AS decimal(18,2)) *
             cast(l_quantity AS decimal(18,2))) AS double) *
             cast(0.1 AS double) AS profit
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN orders ON l_orderkey = o_orderkey
         WHERE p_name LIKE '%red%'
         GROUP BY 1, 2""",
    // Q14: promo share per month — division then ×100, mirrored tree
    "q177_promo_share" ->
      """SELECT date_trunc('month', l_shipdate) AS month,
           cast(sum(CASE WHEN p_type = 'PROMO'
               THEN cast(l_extendedprice AS decimal(18,2)) *
                 (1 - cast(l_discount AS decimal(18,2)))
               ELSE cast(0 AS decimal(18,2)) END) AS double) /
           cast(sum(cast(l_extendedprice AS decimal(18,2)) *
             (1 - cast(l_discount AS decimal(18,2)))) AS double) *
             cast(100.0 AS double) AS promo_pct
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
         GROUP BY 1""",
    // Q16: distinct suppliers per part profile, complaints anti-joined
    "q178_supplier_diversity" ->
      """SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
           AND p_size IN (1, 5, 9, 15, 20, 25, 30, 35)
           AND l_suppkey NOT IN
             (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         GROUP BY 1, 2, 3""",
    // Q20 adapted: nested agg, relative 2×-mean HAVING, suppliers via semi
    "q179_part_family_suppliers" ->
      """WITH pairs AS (SELECT l_partkey, l_suppkey,
             sum(cast(l_quantity AS decimal(18,2))) AS qty
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE p_name LIKE 'small%'
             AND l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate < TIMESTAMP '1998-01-01'
           GROUP BY 1, 2),
         heavy AS (SELECT DISTINCT l_suppkey FROM pairs
           CROSS JOIN (SELECT sum(qty) AS tq, count(*) AS np FROM pairs) t
           WHERE qty * np > tq * 2)
         SELECT s_suppkey, s_name, s_nationkey FROM supplier
         JOIN heavy ON s_suppkey = l_suppkey""",
    // Q11 analog: exact-decimal 1.3×-mean compare as integer multiplies
    "q180_important_parts" ->
      """WITH rev AS (SELECT l_partkey,
             sum(cast(l_extendedprice AS decimal(18,2)) *
               (1 - cast(l_discount AS decimal(18,2)))) AS rev
           FROM lineitem GROUP BY 1)
         SELECT l_partkey, cast(rev AS double) AS part_value
         FROM rev CROSS JOIN
           (SELECT sum(rev) AS total, count(*) AS np FROM rev) t
         WHERE rev * np * 10 > total * 13""",
    // peak concurrency: running-sum max is tie-order-independent (within a
    // +1 run the sum only rises, within a −1 run only falls)
    "q181_max_concurrent" ->
      """WITH d AS (
           SELECT user_id, ts AS t, cast(1 AS bigint) AS dd FROM events
           UNION ALL
           SELECT user_id, ts + INTERVAL 1 HOUR, cast(-1 AS bigint) FROM events),
         r AS (SELECT user_id, sum(dd) OVER (PARTITION BY user_id
             ORDER BY t ASC, dd ASC ROWS UNBOUNDED PRECEDING) AS run FROM d)
         SELECT user_id, cast(max(run) AS bigint) AS peak FROM r GROUP BY 1""",
    // Pareto/ABC: oracle's ONE global window equals the engine's two-level
    // range-partitioned prefix sum exactly (associative decimal addition);
    // 80/95 cuts as exact integer-multiply compares
    "q182_pareto_class" ->
      """WITH rev AS (SELECT l_partkey,
             sum(cast(l_extendedprice AS decimal(18,2)) *
               (1 - cast(l_discount AS decimal(18,2)))) AS v
           FROM lineitem GROUP BY 1),
         t AS (SELECT sum(v) AS total FROM rev),
         r AS (SELECT l_partkey, v, sum(v) OVER (ORDER BY v DESC, l_partkey
             ROWS UNBOUNDED PRECEDING) AS cum FROM rev)
         SELECT l_partkey, cast(v AS double) AS value,
           CASE WHEN cum * 10 <= total * 8 THEN 'A'
                WHEN cum * 100 <= total * 95 THEN 'B'
                ELSE 'C' END AS abc_class
         FROM r CROSS JOIN t""",
    // Gini: exact decimal·rank sums, ONE final division of identical doubles
    "q183_gini" ->
      """WITH t AS (SELECT c_nationkey AS g,
             cast(c_acctbal AS decimal(18,2)) AS v,
             cast(row_number() OVER (PARTITION BY c_nationkey
               ORDER BY c_acctbal ASC, c_custkey ASC) AS bigint) AS i
           FROM customer WHERE c_acctbal > 0)
         SELECT g AS c_nationkey, count(*) AS n,
           cast(sum(v) AS double) AS total,
           cast(sum(v * i) * 2 - sum(v) * (count(*) + 1) AS double) /
             cast(sum(v) * count(*) AS double) AS gini
         FROM t GROUP BY 1 HAVING sum(v) > 0""",
    // attribution: correlated first/last probes mirror the engine's RANGE
    // window (touch at the conversion instant included on both sides)
    "q184_attribution" ->
      """SELECT e.event_id AS conv_id, e.user_id, e.ts AS conv_ts,
           (SELECT t.event_id FROM events t
            WHERE t.user_id = e.user_id AND t.event_type = 'click'
              AND epoch_us(t.ts) BETWEEN epoch_us(e.ts) - 604800000000
                AND epoch_us(e.ts)
            ORDER BY t.ts ASC, t.event_id ASC LIMIT 1) AS first_touch_id,
           (SELECT t.event_id FROM events t
            WHERE t.user_id = e.user_id AND t.event_type = 'click'
              AND epoch_us(t.ts) BETWEEN epoch_us(e.ts) - 604800000000
                AND epoch_us(e.ts)
            ORDER BY t.ts DESC, t.event_id DESC LIMIT 1) AS last_touch_id
         FROM events e WHERE e.event_type = 'purchase'""",
    // label propagation: the oracle chains the SAME 10 synchronized
    // min-label rounds the engine runs — equality independent of diameter
    "q185_label_propagation" ->
      """WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok,
             l_partkey AS it FROM lineitem),
         p AS MATERIALIZED (SELECT a.it AS i, c.it AS j
           FROM b a JOIN b c ON a.ok = c.ok
             AND a.it < c.it GROUP BY 1, 2 HAVING count(*) >= 2),
         e AS MATERIALIZED (SELECT i AS src, j AS dst FROM p
           UNION ALL SELECT j AS src, i AS dst FROM p),
         l0 AS MATERIALIZED (SELECT node, node AS lbl
           FROM (SELECT DISTINCT src AS node FROM e) n),
         l1 AS MATERIALIZED (SELECT node, min(lbl) AS lbl
           FROM (SELECT node, lbl FROM l0 UNION ALL
             SELECT e.dst, l0.lbl FROM l0 JOIN e ON e.src = l0.node) u
           GROUP BY node),
         l2 AS MATERIALIZED (SELECT node, min(lbl) AS lbl
           FROM (SELECT node, lbl FROM l1 UNION ALL
             SELECT e.dst, l1.lbl FROM l1 JOIN e ON e.src = l1.node) u
           GROUP BY node),
         l3 AS MATERIALIZED (SELECT node, min(lbl) AS lbl
           FROM (SELECT node, lbl FROM l2 UNION ALL
             SELECT e.dst, l2.lbl FROM l2 JOIN e ON e.src = l2.node) u
           GROUP BY node),
         l4 AS MATERIALIZED (SELECT node, min(lbl) AS lbl
           FROM (SELECT node, lbl FROM l3 UNION ALL
             SELECT e.dst, l3.lbl FROM l3 JOIN e ON e.src = l3.node) u
           GROUP BY node),
         l5 AS MATERIALIZED (SELECT node, min(lbl) AS lbl
           FROM (SELECT node, lbl FROM l4 UNION ALL
             SELECT e.dst, l4.lbl FROM l4 JOIN e ON e.src = l4.node) u
           GROUP BY node),
         l6 AS MATERIALIZED (SELECT node, min(lbl) AS lbl
           FROM (SELECT node, lbl FROM l5 UNION ALL
             SELECT e.dst, l5.lbl FROM l5 JOIN e ON e.src = l5.node) u
           GROUP BY node),
         l7 AS MATERIALIZED (SELECT node, min(lbl) AS lbl
           FROM (SELECT node, lbl FROM l6 UNION ALL
             SELECT e.dst, l6.lbl FROM l6 JOIN e ON e.src = l6.node) u
           GROUP BY node),
         l8 AS MATERIALIZED (SELECT node, min(lbl) AS lbl
           FROM (SELECT node, lbl FROM l7 UNION ALL
             SELECT e.dst, l7.lbl FROM l7 JOIN e ON e.src = l7.node) u
           GROUP BY node),
         l9 AS MATERIALIZED (SELECT node, min(lbl) AS lbl
           FROM (SELECT node, lbl FROM l8 UNION ALL
             SELECT e.dst, l8.lbl FROM l8 JOIN e ON e.src = l8.node) u
           GROUP BY node),
         l10 AS MATERIALIZED (SELECT node, min(lbl) AS lbl
           FROM (SELECT node, lbl FROM l9 UNION ALL
             SELECT e.dst, l9.lbl FROM l9 JOIN e ON e.src = l9.node) u
           GROUP BY node)
         SELECT node, lbl FROM l10""",
    // k-means step: md5-row centroids, augmented-bias argmin (q106 kernel),
    // 6dp-rounded exact-decimal component sums, ONE final division
    "q186_kmeans_step" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         seeds AS MATERIALIZED (SELECT v AS w, row_number() OVER (ORDER BY
             ('0x' || substr(md5(cast(vec_id AS varchar)), 1, 8))::bigint,
             vec_id) - 1 AS c
           FROM e),
         cent AS MATERIALIZED (SELECT c, w FROM seeds WHERE c < 8),
         sc AS (SELECT vec_id, v, c,
             list_sum(list_transform(generate_series(1, 64), i -> v[i] * w[i]))
               - list_sum(list_transform(w, x -> x*x)) / 2.0 AS score
           FROM e, cent),
         a AS (SELECT vec_id, v, c AS cluster FROM (
             SELECT vec_id, v, c, row_number() OVER (PARTITION BY vec_id
               ORDER BY score DESC, c) AS rn FROM sc) t
           WHERE rn = 1),
         x AS (SELECT cluster, i - 1 AS dim, v[i] AS x
           FROM a, generate_series(1, 64) g(i))
         SELECT cast(cluster AS int) AS cluster, cast(dim AS int) AS dim,
           count(*) AS n,
           cast(sum(cast(round(x, 6) AS decimal(18,6))) AS double) /
             cast(count(*) AS double) AS mean_val
         FROM x GROUP BY 1, 2""",
    // rolling distinct: the oracle is the plain trailing-range inequality
    // join (the constant-factor visibility explode is internal)
    "q187_rolling_distinct" ->
      """WITH obs AS (SELECT DISTINCT user_id AS k,
             cast(date_trunc('day', ts) AS date) AS day, event_type AS c
           FROM events),
         days AS (SELECT DISTINCT k, day FROM obs)
         SELECT d.k AS user_id, d.day, count(DISTINCT o.c) AS n_distinct
         FROM days d JOIN obs o ON o.k = d.k
           AND o.day BETWEEN d.day - 6 AND d.day
         GROUP BY 1, 2""",
    // set-similarity: brute-force pair oracle; threshold and membership in
    // exact integer arithmetic, jaccard = one division of exact ints
    "q188_set_similarity" ->
      """WITH et AS MATERIALIZED (SELECT DISTINCT c_custkey AS e,
             CASE WHEN i < 8
               THEN md5(cast(c_custkey // 10 AS varchar) || ':' ||
                 cast(i AS varchar))
               ELSE md5('own:' || cast(c_custkey AS varchar) || ':' ||
                 cast(i AS varchar)) END AS t
           FROM customer, generate_series(0, 11) g(i)),
         sz AS (SELECT e, count(*) AS s FROM et GROUP BY 1),
         i AS (SELECT a.e AS e1, b.e AS e2, count(*) AS n_common
           FROM et a JOIN et b ON a.t = b.t AND a.e < b.e GROUP BY 1, 2)
         SELECT e1, e2, n_common,
           cast(n_common AS double) /
             cast(s1.s + s2.s - n_common AS double) AS jaccard
         FROM i JOIN sz s1 ON i.e1 = s1.e JOIN sz s2 ON i.e2 = s2.e
         WHERE n_common * 2 >= (s1.s + s2.s - n_common) * 1""",
    // checksum diff: same-construction both sides; bit_xor of a 60-bit md5
    // digest is order-independent, so engine shuffle order cannot matter
    "q189_checksum_diff" ->
      """WITH a AS (SELECT
             ('0x' || substr(md5(cast(l_orderkey AS varchar) || '#' ||
               cast(l_linenumber AS varchar)), 1, 8))::bigint % 64 AS bucket,
             ('0x' || substr(md5(cast(l_orderkey AS varchar) || '|' ||
               cast(l_linenumber AS varchar) || '|' ||
               cast(l_quantity AS varchar)), 1, 15))::bigint AS h
           FROM lineitem),
         b AS (SELECT
             ('0x' || substr(md5(cast(l_orderkey AS varchar) || '#' ||
               cast(l_linenumber AS varchar)), 1, 8))::bigint % 64 AS bucket,
             ('0x' || substr(md5(cast(l_orderkey AS varchar) || '|' ||
               cast(l_linenumber AS varchar) || '|' ||
               cast(CASE WHEN l_orderkey % 997 = 0 THEN l_quantity + 1
                 ELSE l_quantity END AS varchar)), 1, 15))::bigint AS h
           FROM lineitem),
         ca AS (SELECT bucket, count(*) AS n_a, bit_xor(h) AS sum_a
           FROM a GROUP BY 1),
         cb AS (SELECT bucket, count(*) AS n_b, bit_xor(h) AS sum_b
           FROM b GROUP BY 1)
         SELECT bucket, n_a, sum_a, n_b, sum_b
         FROM ca FULL OUTER JOIN cb USING (bucket)
         WHERE n_a IS NULL OR n_b IS NULL OR n_a <> n_b OR sum_a <> sum_b""",
    // OOV: top-V vocab with (count desc, token) deterministic boundary;
    // rate = one division of exact integer counts
    "q190_oov_rate" ->
      """WITH tok AS (SELECT doc_id, t FROM (SELECT doc_id,
             unnest(string_split(text, ' ')) AS t FROM documents) u
           WHERE t <> ''),
         v AS (SELECT t, 1 AS iv FROM tok GROUP BY t
           ORDER BY count(*) DESC, t LIMIT 20)
         SELECT doc_id, count(*) AS n_tokens,
           cast(sum(CASE WHEN v.iv IS NULL THEN 1 ELSE 0 END) AS bigint)
             AS n_oov,
           cast(sum(CASE WHEN v.iv IS NULL THEN 1 ELSE 0 END) AS double) /
             cast(count(*) AS double) AS oov_rate
         FROM tok LEFT JOIN v ON tok.t = v.t
         GROUP BY doc_id""",
    // shortest paths: the oracle chains the SAME 6 relaxation rounds
    // (integer costs -> exact); MATERIALIZED stops exponential CTE inlining
    "q191_shortest_paths" ->
      """WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok,
             l_partkey AS it FROM lineitem),
         p AS MATERIALIZED (SELECT a.it AS i, c.it AS j,
             1000 // count(*) AS w
           FROM b a JOIN b c ON a.ok = c.ok AND a.it < c.it
           GROUP BY 1, 2 HAVING count(*) >= 2),
         e AS MATERIALIZED (SELECT i AS src, j AS dst, w FROM p
           UNION ALL SELECT j AS src, i AS dst, w FROM p),
         d0 AS MATERIALIZED (SELECT node, cast(0 AS bigint) AS dist FROM
           (SELECT DISTINCT src AS node FROM e) n WHERE node % 97 = 0),
         d1 AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
           SELECT node, dist FROM d0 UNION ALL
           SELECT e.dst, d0.dist + e.w FROM d0 JOIN e ON e.src = d0.node) u
           GROUP BY node),
         d2 AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
           SELECT node, dist FROM d1 UNION ALL
           SELECT e.dst, d1.dist + e.w FROM d1 JOIN e ON e.src = d1.node) u
           GROUP BY node),
         d3 AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
           SELECT node, dist FROM d2 UNION ALL
           SELECT e.dst, d2.dist + e.w FROM d2 JOIN e ON e.src = d2.node) u
           GROUP BY node),
         d4 AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
           SELECT node, dist FROM d3 UNION ALL
           SELECT e.dst, d3.dist + e.w FROM d3 JOIN e ON e.src = d3.node) u
           GROUP BY node),
         d5 AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
           SELECT node, dist FROM d4 UNION ALL
           SELECT e.dst, d4.dist + e.w FROM d4 JOIN e ON e.src = d4.node) u
           GROUP BY node),
         d6 AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
           SELECT node, dist FROM d5 UNION ALL
           SELECT e.dst, d5.dist + e.w FROM d5 JOIN e ON e.src = d5.node) u
           GROUP BY node)
         SELECT node, dist FROM d6""",
    // SCD2 lookup: native ASOF JOIN against run starts (ranges are
    // consecutive, so latest-start-at-or-before IS the validity lookup);
    // no (user, ts) ties in the status stream (verified per SF)
    "q192_scd2_lookup" ->
      """WITH st AS (SELECT user_id, event_type, ts, event_id FROM events
           WHERE event_type <> 'purchase'),
         o AS (SELECT user_id, event_type, ts,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev
           FROM st),
         dim AS (SELECT user_id, event_type AS status, ts AS valid_from
           FROM o WHERE prev IS NULL OR prev IS DISTINCT FROM event_type),
         f AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase')
         SELECT f.event_id, f.user_id, f.ts, d.status AS asof_status
         FROM f ASOF LEFT JOIN dim d
           ON f.user_id = d.user_id AND f.ts >= d.valid_from""",
    // FD violations: plain grouped count-distinct probe
    "q193_fd_violations" ->
      """SELECT p_brand, p_type, count(DISTINCT p_size) AS n_rhs,
           count(*) AS n_rows, min(p_size) AS rhs_min, max(p_size) AS rhs_max
         FROM part GROUP BY 1, 2 HAVING count(DISTINCT p_size) > 1""",
    // ratio-to-parent: shares are single divisions of exact-decimal sums
    "q194_ratio_to_parent" ->
      """WITH nrev AS (SELECT r_name, n_name,
             sum(cast(l_extendedprice AS decimal(18,2)) *
               (1 - cast(l_discount AS decimal(18,2)))) AS rev
           FROM lineitem
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           GROUP BY 1, 2),
         rrev AS (SELECT r_name, sum(rev) AS rrev FROM nrev GROUP BY 1),
         grev AS (SELECT sum(rev) AS grev FROM nrev)
         SELECT nrev.r_name, n_name, cast(rev AS double) AS revenue,
           cast(rev AS double) / cast(rrev AS double) AS share_of_region,
           cast(rev AS double) / cast(grev AS double) AS share_of_total
         FROM nrev JOIN rrev ON nrev.r_name = rrev.r_name CROSS JOIN grev""",
    // bloom semi-join: bloom filters have no false negatives and the
    // engine exact-verifies, so the oracle is the plain semi-join
    "q195_bloom_semi_join" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey FROM lineitem
         WHERE l_suppkey IN
           (SELECT s_suppkey FROM supplier WHERE s_suppkey % 11 = 0)""",
    // tile grid: pure integer tiling rule, last tile clamps to the edge
    "q196_tile_grid" ->
      """WITH imgs AS (SELECT p_partkey AS img_id,
             64 + (p_partkey * 13) % 1980 AS w,
             64 + (p_partkey * 29) % 1080 AS h
           FROM part WHERE p_partkey % 17 = 0),
         n AS (SELECT img_id, w, h,
             CASE WHEN w <= 224 THEN 1 ELSE (w - 224 + 199) // 200 + 1 END AS nx,
             CASE WHEN h <= 224 THEN 1 ELSE (h - 224 + 199) // 200 + 1 END AS ny
           FROM imgs)
         SELECT img_id, w, h,
           least(i * 200, greatest(w - 224, 0)) AS tile_x,
           least(j * 200, greatest(h - 224, 0)) AS tile_y
         FROM n, generate_series(0, 15) gi(i), generate_series(0, 15) gj(j)
         WHERE i < nx AND j < ny""",
    // frame sampling: stepped generate_series over the duration
    "q197_frame_sample" ->
      """SELECT event_id, 1000 + (event_id * 37) % 60000 AS duration_ms,
           k * 2000 AS frame_ms
         FROM events, generate_series(0, 30) g(k)
         WHERE event_id % 101 = 0
           AND k * 2000 <= 1000 + (event_id * 37) % 60000 - 1""",
    // golden record: full-outer coalesce with per-column survivorship
    "q198_golden_record" ->
      """WITH b AS (
           SELECT c_custkey, c_name, c_acctbal + 100 AS c_acctbal,
             cast(NULL AS varchar) AS c_mktsegment
           FROM customer WHERE c_custkey % 10 = 0
           UNION ALL
           SELECT c_custkey + 1000000, 'new_' || c_name, c_acctbal,
             c_mktsegment
           FROM customer WHERE c_custkey % 250 = 0)
         SELECT coalesce(b.c_custkey, a.c_custkey) AS c_custkey,
           coalesce(b.c_name, a.c_name) AS c_name,
           coalesce(b.c_acctbal, a.c_acctbal) AS c_acctbal,
           coalesce(b.c_mktsegment, a.c_mktsegment) AS c_mktsegment,
           CASE WHEN b.c_custkey IS NULL THEN 'a_only'
                WHEN a.c_custkey IS NULL THEN 'b_only'
                ELSE 'merged' END AS src
         FROM customer a FULL OUTER JOIN b ON a.c_custkey = b.c_custkey""",
    // eval pairs: md5-derived indices over the dense id space, exact-mirror
    // cosine (the q39/q106 expression shape)
    "q199_eval_pairs" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         n AS (SELECT count(*) AS cnt FROM e),
         p AS (SELECT i AS pair_id,
             ('0x' || substr(md5('a:' || cast(i AS varchar)), 1, 8))::bigint
               % cnt AS a,
             ('0x' || substr(md5('b:' || cast(i AS varchar)), 1, 8))::bigint
               % cnt AS b
           FROM generate_series(0, 499) g(i), n)
         SELECT pair_id, a, b,
           round(
             list_sum(list_transform(generate_series(1, 64),
               i -> ea.v[i] * eb.v[i]))
             / (sqrt(list_sum(list_transform(ea.v, x -> x*x)))
                * sqrt(list_sum(list_transform(eb.v, x -> x*x)))), 6)
             AS cos_sim
         FROM p JOIN e ea ON p.a = ea.vec_id JOIN e eb ON p.b = eb.vec_id
         WHERE a <> b""",
    // incremental join view: the oracle is the FULL recompute fact' ⋈ dim'
    // (the delta algebra is row-identical by construction)
    "q200_incremental_join_view" ->
      """WITH dimNew AS (
           SELECT c_custkey, c_acctbal + 50 AS c_acctbal, c_mktsegment
           FROM customer WHERE c_custkey % 100 = 0
           UNION ALL
           SELECT c_custkey, c_acctbal, c_mktsegment
           FROM customer WHERE c_custkey % 100 <> 0)
         SELECT o_orderkey, c_custkey, c_acctbal, c_mktsegment
         FROM orders JOIN dimNew ON o_custkey = c_custkey""",
    // winsorized mean: thresholds rounded to 6dp BEFORE the clip compare
    // (ulp-divergent interpolation), clipped values summed exactly
    "q201_winsorized_mean" ->
      """WITH cuts AS (SELECT c_nationkey,
             round(quantile_cont(c_acctbal, 0.05), 6) AS lo,
             round(quantile_cont(c_acctbal, 0.95), 6) AS hi
           FROM customer GROUP BY 1)
         SELECT c.c_nationkey, count(*) AS n,
           max(lo) AS p_lo, max(hi) AS p_hi,
           cast(sum(cast(round(least(greatest(c_acctbal, lo), hi), 6)
             AS decimal(18,6))) AS double) / cast(count(*) AS double)
             AS winsorized_mean
         FROM customer c JOIN cuts ON c.c_nationkey = cuts.c_nationkey
         GROUP BY 1""",
    // Kaplan-Meier: 6dp-rounded ln factors summed exactly; d = r final
    // point bypasses ln(0)
    "q202_kaplan_meier" ->
      """WITH t0 AS (SELECT user_id,
             min(cast(date_trunc('day', ts) AS date)) AS d0,
             min(CASE WHEN event_type = 'purchase'
               THEN cast(date_trunc('day', ts) AS date) END) AS dp,
             max(cast(date_trunc('day', ts) AS date)) AS dl
           FROM events GROUP BY 1),
         subj AS (SELECT user_id % 3 AS seg,
             CASE WHEN dp IS NOT NULL THEN dp - d0 ELSE dl - d0 END AS dur,
             CASE WHEN dp IS NOT NULL THEN 1 ELSE 0 END AS ev FROM t0),
         grid AS (SELECT seg, cast(dur AS bigint) AS t,
             cast(sum(ev) AS bigint) AS d, count(*) AS al
           FROM subj GROUP BY 1, 2),
         wr AS (SELECT seg, t, d, cast(sum(al) OVER (PARTITION BY seg
             ORDER BY t ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             AS bigint) AS r
           FROM grid),
         tm AS (SELECT seg, t, d, r,
             CASE WHEN d < r THEN cast(round(ln(1.0 -
                 cast(d AS double) / cast(r AS double)), 6) AS decimal(18,6))
               ELSE cast(0 AS decimal(18,6)) END AS term FROM wr),
         cm AS (SELECT seg, t, d, r, sum(term) OVER (PARTITION BY seg
             ORDER BY t ROWS UNBOUNDED PRECEDING) AS cum FROM tm)
         SELECT seg, t, d, r,
           CASE WHEN d = r THEN 0.0
                ELSE round(exp(cast(cum AS double)), 6) END AS survival
         FROM cm""",
    // MoM growth: ratio only when the previous row is the adjacent month
    "q203_mom_growth" ->
      """WITH m AS (SELECT cast(date_trunc('month', o_orderdate) AS date)
             AS month, o_orderpriority,
             sum(cast(o_totalprice AS decimal(18,2))) AS rev
           FROM orders GROUP BY 1, 2),
         l AS (SELECT month, o_orderpriority, rev,
             lag(rev) OVER (PARTITION BY o_orderpriority ORDER BY month)
               AS prev,
             lag(month) OVER (PARTITION BY o_orderpriority ORDER BY month)
               AS pm
           FROM m)
         SELECT month, o_orderpriority, cast(rev AS double) AS revenue,
           CASE WHEN pm = month - INTERVAL 1 MONTH
             THEN cast(rev AS double) / cast(prev AS double) END AS mom_ratio
         FROM l""",
    // naive Bayes: Laplace-smoothed ratios of exact counts, 6dp ln-sum
    // discipline, (score desc, class) argmax
    "q204_naive_bayes" ->
      """WITH toks AS (SELECT id, true_c, w FROM (SELECT doc_id AS id,
             lang AS true_c, unnest(string_split(text, ' ')) AS w
           FROM documents) u WHERE w <> ''),
         ct AS (SELECT w, true_c AS c, count(*) AS cnt FROM toks GROUP BY 1, 2),
         tot AS (SELECT c, sum(cnt) AS tot FROM ct GROUP BY 1),
         v AS (SELECT count(DISTINCT w) AS v FROM ct),
         nd AS (SELECT count(*) AS nd FROM documents),
         cd AS (SELECT lang AS c, count(*) AS ndc FROM documents GROUP BY 1),
         terms AS (SELECT toks.id, tot.c,
             cast(round(ln(cast(coalesce(ct.cnt, 0) + 1 AS double) /
               cast(tot.tot + v.v AS double)), 6) AS decimal(18,6)) AS term
           FROM toks CROSS JOIN tot
           LEFT JOIN ct ON ct.w = toks.w AND ct.c = tot.c
           CROSS JOIN v),
         lik AS (SELECT id, c, sum(term) AS lik FROM terms GROUP BY 1, 2),
         pr AS (SELECT c, cast(round(ln(cast(ndc AS double) /
             cast(nd AS double)), 6) AS decimal(18,6)) AS prior
           FROM cd CROSS JOIN nd),
         sc AS (SELECT id, lik.c, cast(lik + prior AS double) AS score
           FROM lik JOIN pr ON lik.c = pr.c),
         r AS (SELECT id, c, score, row_number() OVER (PARTITION BY id
             ORDER BY score DESC, c ASC) AS rn FROM sc)
         SELECT id AS doc_id, c AS pred_class, round(score, 6) AS score
         FROM r WHERE rn = 1""",
    // OLS-2: raw moments exact, one mirrored closed-form solve
    "q205_ols2" ->
      """WITH e AS (SELECT event_type,
             cast(hour(ts) AS bigint) AS x1,
             cast(dayofweek(ts) + 1 AS bigint) AS x2,
             cast(value AS decimal(18,2)) AS y
           FROM events),
         m AS (SELECT event_type, count(*) AS n,
             sum(x1) AS s1, sum(x2) AS s2,
             sum(x1 * x1) AS s11, sum(x2 * x2) AS s22,
             sum(x1 * x2) AS s12,
             sum(y) AS sy, sum(y * x1) AS s1y, sum(y * x2) AS s2y
           FROM e GROUP BY 1),
         d AS (SELECT event_type, n,
             cast(n AS double) AS nD,
             cast(s1 AS double) AS s1D, cast(s2 AS double) AS s2D,
             cast(s11 AS double) AS s11D, cast(s22 AS double) AS s22D,
             cast(s12 AS double) AS s12D,
             cast(sy AS double) AS syD, cast(s1y AS double) AS s1yD,
             cast(s2y AS double) AS s2yD
           FROM m),
         k AS (SELECT event_type, n, nD, s1D, s2D, syD,
             s11D - s1D * s1D / nD AS S11,
             s22D - s2D * s2D / nD AS S22,
             s12D - s1D * s2D / nD AS S12,
             s1yD - s1D * syD / nD AS S1y,
             s2yD - s2D * syD / nD AS S2y
           FROM d),
         b AS (SELECT event_type, n, nD, s1D, s2D, syD,
             (S22 * S1y - S12 * S2y) / (S11 * S22 - S12 * S12) AS b1,
             (S11 * S2y - S12 * S1y) / (S11 * S22 - S12 * S12) AS b2
           FROM k)
         SELECT event_type, n,
           round(syD / nD - b1 * (s1D / nD) - b2 * (s2D / nD), 6) AS b0,
           round(b1, 6) AS b1, round(b2, 6) AS b2
         FROM b""",
    // A/B z-test: all moments exact, one mirrored double tree
    "q206_ab_test" ->
      """WITH e AS (SELECT event_type, user_id % 2 AS v,
             cast(value AS decimal(18,2)) AS y FROM events),
         m AS (SELECT event_type,
             cast(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS bigint) AS na,
             cast(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS bigint) AS nb,
             sum(CASE WHEN v = 0 THEN y ELSE cast(0 AS decimal(18,2)) END) AS sa,
             sum(CASE WHEN v = 1 THEN y ELSE cast(0 AS decimal(18,2)) END) AS sb,
             sum(CASE WHEN v = 0 THEN y * y ELSE cast(0 AS decimal(38,4)) END) AS qa,
             sum(CASE WHEN v = 1 THEN y * y ELSE cast(0 AS decimal(38,4)) END) AS qb
           FROM e GROUP BY 1),
         d AS (SELECT event_type, na, nb,
             cast(na AS double) AS naD, cast(nb AS double) AS nbD,
             cast(sa AS double) AS saD, cast(sb AS double) AS sbD,
             cast(qa AS double) AS qaD, cast(qb AS double) AS qbD
           FROM m)
         SELECT event_type, na, nb,
           round(saD / naD, 6) AS mean_a, round(sbD / nbD, 6) AS mean_b,
           round((sbD / nbD - saD / naD) /
             sqrt(((qaD - saD * saD / naD) / (naD - 1)) / naD +
                  ((qbD - sbD * sbD / nbD) / (nbD - 1)) / nbD), 6) AS z_score
         FROM d""",
    // top paths: lead-lead trigrams, (n desc, path) total order
    "q207_top_paths" ->
      """WITH p AS (SELECT event_type || '>' ||
             lead(event_type, 1) OVER w || '>' ||
             lead(event_type, 2) OVER w AS path
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT path, count(*) AS n FROM p WHERE path IS NOT NULL
         GROUP BY 1 ORDER BY n DESC, path LIMIT 20""",
    // rule tags: sorted violated-rule list joined to one stable string
    "q208_rule_tags" ->
      """SELECT * FROM (
           SELECT c_custkey, c_acctbal, c_mktsegment,
             array_to_string(list_sort(list_filter([
               CASE WHEN c_acctbal < -500 THEN 'balance_low' END,
               CASE WHEN c_acctbal > 9000 THEN 'balance_high' END,
               CASE WHEN c_mktsegment NOT IN ('AUTOMOBILE', 'BUILDING',
                 'FURNITURE', 'HOUSEHOLD', 'MACHINERY') THEN 'bad_segment' END,
               CASE WHEN c_custkey % 1000 = 0 THEN 'audit_sample' END],
               x -> x IS NOT NULL)), ',') AS violations
           FROM customer) t
         WHERE violations <> ''""",
    // nearest join: correlated nearest-either-side probe, tie to earlier
    "q209_nearest_join" ->
      """SELECT p.event_id, p.user_id, p.ts,
           (SELECT c.event_id FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND abs(epoch_us(c.ts) - epoch_us(p.ts)) <= 86400000000
            ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)) ASC,
              epoch_us(c.ts) ASC LIMIT 1) AS nearest_click_id
         FROM events p WHERE p.event_type = 'purchase'""",
    // top-k with OTHERS: window cut + residual rollup
    "q210_topk_others" ->
      """WITH rev AS (SELECT s_nationkey, l_partkey,
             sum(cast(l_extendedprice AS decimal(18,2)) *
               (1 - cast(l_discount AS decimal(18,2)))) AS rev
           FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           GROUP BY 1, 2),
         r AS (SELECT *, row_number() OVER (PARTITION BY s_nationkey
             ORDER BY rev DESC, l_partkey ASC) AS rnk FROM rev)
         SELECT s_nationkey, cast(l_partkey AS varchar) AS part,
           cast(rev AS double) AS revenue
         FROM r WHERE rnk <= 5
         UNION ALL
         SELECT s_nationkey, 'OTHERS' AS part,
           cast(sum(rev) AS double) AS revenue
         FROM r WHERE rnk > 5 GROUP BY 1""",
    // attrition: one-pass prefix counts, unpivoted to a row per rule
    "q211_filter_attrition" ->
      """WITH d AS (SELECT n_chars, lang,
             len(string_split(text, ' ')) AS nt
           FROM documents),
         a AS (SELECT count(*) AS c0,
             cast(sum(CASE WHEN n_chars >= 50 THEN 1 ELSE 0 END) AS bigint)
               AS c1,
             cast(sum(CASE WHEN n_chars >= 50 AND lang <> 'zh' THEN 1
               ELSE 0 END) AS bigint) AS c2,
             cast(sum(CASE WHEN n_chars >= 50 AND lang <> 'zh' AND nt >= 5
               THEN 1 ELSE 0 END) AS bigint) AS c3
           FROM d)
         SELECT '1_min_length' AS rule, c0 AS n_in, c1 AS n_out,
           c0 - c1 AS n_dropped FROM a
         UNION ALL SELECT '2_lang_allowlist', c1, c2, c1 - c2 FROM a
         UNION ALL SELECT '3_min_tokens', c2, c3, c2 - c3 FROM a""",
    // contamination report: q59 hit logic rolled up per source
    "q212_contamination_report" ->
      """WITH t0 AS (SELECT doc_id, source, string_split(text,' ') AS w
           FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             generate_series(1, len(w)-2),
             i -> array_to_string(w[i:i+2], ' ')))) AS s
           FROM t0 WHERE len(w) >= 3),
         bsh AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
         hit AS (SELECT DISTINCT doc_id FROM sh
           WHERE doc_id % 97 <> 0 AND s IN (SELECT s FROM bsh))
         SELECT source, count(*) AS n_docs,
           cast(sum(CASE WHEN hit.doc_id IS NOT NULL THEN 1 ELSE 0 END)
             AS bigint) AS n_contaminated,
           cast(sum(CASE WHEN hit.doc_id IS NOT NULL THEN 1 ELSE 0 END)
             AS double) / cast(count(*) AS double) AS contamination_rate
         FROM t0 LEFT JOIN hit ON t0.doc_id = hit.doc_id
         WHERE t0.doc_id % 97 <> 0
         GROUP BY source""",
    // preference pairs: argmax/argmin with explicit tie rules
    "q213_preference_pairs" ->
      """WITH r AS (SELECT source, lang, doc_id, n_chars,
             row_number() OVER (PARTITION BY source, lang
               ORDER BY n_chars DESC, doc_id ASC) AS rb,
             row_number() OVER (PARTITION BY source, lang
               ORDER BY n_chars ASC, doc_id ASC) AS rw,
             count(*) OVER (PARTITION BY source, lang) AS n_docs
           FROM documents)
         SELECT b.source, b.lang, b.n_docs,
           b.doc_id AS chosen_id, b.n_chars AS chosen_score,
           w.doc_id AS rejected_id, w.n_chars AS rejected_score
         FROM (SELECT * FROM r WHERE rb = 1) b
         JOIN (SELECT * FROM r WHERE rw = 1) w
           ON b.source = w.source AND b.lang = w.lang
         WHERE b.n_docs >= 2""",
    // cluster sizes: two hash aggs over the bag fingerprint
    "q214_dup_cluster_sizes" ->
      """WITH f AS (SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(
               string_split(text, ' '))), ' ')) AS fp
           FROM documents),
         c AS (SELECT fp, count(*) AS sz FROM f GROUP BY 1)
         SELECT sz AS cluster_size, count(*) AS n_clusters
         FROM c GROUP BY 1""",
    // mask spans: same md5 mask rule, islands key = idx - row_number
    "q215_mask_spans" ->
      """WITH toks AS (SELECT doc_id, unnest(list_filter(list_transform(
             generate_series(1, len(w)),
             i -> CASE WHEN w[i] <> ''
               AND ('0x' || substr(md5(cast(doc_id AS varchar) || ':' ||
                 cast(i - 1 AS varchar)), 1, 8))::bigint % 100 < 15
               THEN i - 1 END), x -> x IS NOT NULL)) AS idx
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) d),
         isl AS (SELECT doc_id, idx,
             idx - row_number() OVER (PARTITION BY doc_id ORDER BY idx)
               AS island
           FROM toks)
         SELECT doc_id, cast(min(idx) AS int) AS span_start,
           count(*) AS span_len
         FROM isl GROUP BY doc_id, island""",
    // LOO target encoding: exact-decimal numerator, one division
    "q216_target_encoding" ->
      """WITH e AS (SELECT event_id, event_type,
             cast(value AS decimal(18,2)) AS y FROM events),
         a AS (SELECT event_type, sum(y) AS s, count(*) AS n
           FROM e GROUP BY 1)
         SELECT event_id, e.event_type,
           CASE WHEN n > 1 THEN round(cast(s - y AS double) /
             cast(n - 1 AS double), 6) END AS loo_enc
         FROM e JOIN a ON e.event_type = a.event_type""",
    // k-anonymity: small quasi-identifier groups
    "q217_k_anonymity" ->
      """SELECT c_mktsegment, c_nationkey,
           cast(floor(c_acctbal / 1000) AS bigint) AS bal_band,
           count(*) AS group_size
         FROM customer GROUP BY 1, 2, 3 HAVING count(*) < 5""",
    // Benford: Spark's log(10, y) = ln(y)/ln(10) — mirror that exact tree
    "q218_benford" ->
      """WITH o AS (SELECT o_orderpriority,
             cast(substr(cast(cast(floor(o_totalprice) AS bigint) AS varchar),
               1, 1) AS int) AS digit
           FROM orders WHERE o_totalprice >= 1),
         cnt AS (SELECT o_orderpriority, digit, count(*) AS observed
           FROM o GROUP BY 1, 2),
         tot AS (SELECT o_orderpriority, sum(observed) AS n
           FROM cnt GROUP BY 1),
         x AS (SELECT cnt.o_orderpriority, digit, observed,
             cast(n AS double) * (ln(cast(1 AS double) +
               cast(1 AS double) / cast(digit AS double)) /
               ln(cast(10 AS double))) AS e
           FROM cnt JOIN tot ON cnt.o_orderpriority = tot.o_orderpriority)
         SELECT o_orderpriority, digit, observed, round(e, 6) AS expected,
           round((cast(observed AS double) - e) *
             (cast(observed AS double) - e) / e, 6) AS chi2_contrib
         FROM x""",
    // skew report: per-key count table -> one summary row per key column
    "q219_skew_report" ->
      """WITH s AS (SELECT 'l_suppkey' AS join_key, count(*) AS c
             FROM lineitem GROUP BY l_suppkey),
         p AS (SELECT 'l_partkey' AS join_key, count(*) AS c
             FROM lineitem GROUP BY l_partkey),
         o AS (SELECT 'l_orderkey' AS join_key, count(*) AS c
             FROM lineitem GROUP BY l_orderkey),
         u AS (SELECT * FROM s UNION ALL SELECT * FROM p
           UNION ALL SELECT * FROM o)
         SELECT join_key, count(*) AS n_keys, max(c) AS max_cnt,
           round(cast(sum(c) AS double) / cast(count(*) AS double), 6)
             AS mean_cnt,
           round(cast(max(c) AS double) * cast(count(*) AS double) /
             cast(sum(c) AS double), 6) AS skew_ratio
         FROM u GROUP BY 1""",
    // RAG prep: q82 chunk rule + md5 chunk dedup + per-doc rollup
    "q220_rag_prep" ->
      """WITH d AS (SELECT doc_id,
             list_filter(string_split(text, ' '), t -> t <> '') AS toks
           FROM documents),
         nn AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
         st AS (SELECT doc_id, toks, n,
             unnest(range(0, greatest(n - 5 - 1, 0) + 1, 15)) AS start
           FROM nn),
         ch AS (SELECT doc_id,
             array_to_string(toks[start + 1 : least(start + 20, n)], ' ')
               AS chunk_text,
             cast(start / 15 AS int) AS chunk_id,
             cast(least(n - start, 20) AS bigint) AS nt
           FROM st),
         k AS (SELECT doc_id, nt,
             row_number() OVER (PARTITION BY md5(chunk_text)
               ORDER BY doc_id, chunk_id) AS rn
           FROM ch)
         SELECT doc_id, count(*) AS n_chunks,
           cast(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS bigint)
             AS n_kept_chunks,
           cast(sum(nt) AS bigint) AS n_tokens
         FROM k GROUP BY doc_id""",
    // dataset card: dup = non-first member of a bag-fingerprint cluster
    // (global, ties to lower doc_id); every rate ONE exact division
    "q221_dataset_card" ->
      """WITH d AS (SELECT doc_id, source, lang, n_chars,
             len(string_split(text, ' ')) AS nt,
             md5(array_to_string(list_sort(list_distinct(
               string_split(text, ' '))), ' ')) AS fp
           FROM documents),
         k AS (SELECT *, row_number() OVER (PARTITION BY fp
             ORDER BY doc_id ASC) > 1 AS dup FROM d)
         SELECT source, count(*) AS n_docs,
           cast(sum(nt) AS bigint) AS total_tokens,
           cast(sum(n_chars) AS double) / cast(count(*) AS double)
             AS mean_chars,
           cast(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS double) /
             cast(count(*) AS double) AS pct_en,
           cast(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS double) /
             cast(count(*) AS double) AS dup_rate
         FROM k GROUP BY source""",
    // retrieval eval: truth and candidate pipelines embedded verbatim
    // (shared vals with q39/q41), metrics = single exact-int divisions
    "q222_retrieval_eval" ->
      s"""WITH truth AS (SELECT * FROM ($KnnBruteSql) t),
         cand AS (SELECT * FROM ($KnnLshSql) c),
         hits AS (SELECT t.query_id, count(*) AS n_hits FROM truth t
           JOIN cand c ON t.query_id = c.query_id
             AND t.neighbor_id = c.neighbor_id
           GROUP BY 1),
         rr AS (SELECT t.query_id,
             coalesce(cast(1 AS double) / cast(c.rank AS double),
               cast(0 AS double)) AS rr
           FROM truth t LEFT JOIN cand c ON t.query_id = c.query_id
             AND t.neighbor_id = c.neighbor_id
           WHERE t.rank = 1),
         q AS (SELECT DISTINCT query_id FROM truth)
         SELECT q.query_id, coalesce(n_hits, 0) AS n_hits,
           cast(coalesce(n_hits, 0) AS double) / cast(5 AS double)
             AS recall5,
           rr.rr
         FROM q LEFT JOIN hits ON q.query_id = hits.query_id
         LEFT JOIN rr ON q.query_id = rr.query_id""",
    // session metrics: q87's session rule re-derived, rates = single
    // divisions of exact integers
    "q223_session_metrics" ->
      """WITH o AS (SELECT user_id, ts, event_id,
             lag(cast(floor(epoch(ts)) AS bigint)) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev_s
           FROM events),
         m AS (SELECT user_id, ts, event_id,
             sum(CASE WHEN prev_s IS NULL
               OR cast(floor(epoch(ts)) AS bigint) - prev_s > 1800
               THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_seq
           FROM o),
         sess AS (SELECT user_id, session_seq,
             min(cast(date_trunc('day', ts) AS date)) AS day,
             count(*) AS n,
             max(epoch_us(ts)) - min(epoch_us(ts)) AS dur_us
           FROM m GROUP BY 1, 2)
         SELECT day, count(*) AS n_sessions,
           cast(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS double) /
             cast(count(*) AS double) AS bounce_rate,
           cast(sum(n) AS double) / cast(count(*) AS double) AS mean_events,
           cast(sum(dur_us) AS double) / cast(count(*) AS double)
             AS mean_duration_us
         FROM sess GROUP BY 1""",
    // heatmap: 2-d rollup + share-of-parent division
    "q224_usage_heatmap" ->
      """WITH cell AS (SELECT cast(dayofweek(ts) + 1 AS int) AS dow,
             cast(hour(ts) AS int) AS hod, count(*) AS n
           FROM events GROUP BY 1, 2),
         day AS (SELECT dow, sum(n) AS d FROM cell GROUP BY 1)
         SELECT cell.dow, hod, n,
           cast(n AS double) / cast(d AS double) AS share_of_day
         FROM cell JOIN day ON cell.dow = day.dow""",
    // TPC-H Q6: exact decimal(18,2) product sum, double cast last
    "q225_forecast_revenue" ->
      """SELECT count(*) AS n_lines,
         cast(sum(cast(l_extendedprice AS decimal(18,2)) *
                  cast(l_discount AS decimal(18,2))) AS double) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND l_discount BETWEEN 0.04 AND 0.08 AND l_quantity < 24""",
    // TPC-H Q15: argmax join on the EXACT decimal revenue (ties kept)
    "q226_top_supplier" ->
      """WITH rev AS (
           SELECT l_suppkey,
             sum(cast(l_extendedprice AS decimal(18,2)) *
                 (1 - cast(l_discount AS decimal(18,2)))) AS r
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate < TIMESTAMP '1997-04-01'
           GROUP BY 1)
         SELECT s_suppkey, s_name, cast(r AS double) AS total_revenue
         FROM rev JOIN supplier ON l_suppkey = s_suppkey
         WHERE r = (SELECT max(r) FROM rev)""",
    // TPC-H Q19: OR-of-ANDs residual over the part equi-join
    "q227_disjunctive_revenue" ->
      """SELECT count(*) AS n_lines,
         cast(sum(cast(l_extendedprice AS decimal(18,2)) *
                  (1 - cast(l_discount AS decimal(18,2)))) AS double) AS revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
                AND l_quantity BETWEEN 20 AND 30)""",
    // decayed popularity: mirrored pow tree, 6dp terms, exact decimal sum
    "q228_decayed_popularity" ->
      """WITH m AS (SELECT max(ts) AS mts FROM events)
         SELECT event_type, count(*) AS n_events,
           cast(sum(cast(round(pow(0.5,
             (epoch_us(mts) - epoch_us(ts)) / 86400000000.0 / 7.0), 6)
             AS decimal(18,6))) AS double) AS decayed_count
         FROM events, m GROUP BY event_type""",
    // PSI: same bin rule, add-1 smoothing over the FULL 10-bin grid,
    // mirrored (p-q)*ln(p/q) tree, 6dp terms, exact decimal sum
    "q229_psi_drift" ->
      """WITH d AS (SELECT source, cast(doc_id % 2 AS int) AS half, n_chars
           FROM documents),
         mm AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM d),
         binned AS (SELECT source, half,
             least(cast(floor(cast(n_chars - lo AS double) /
               (cast(hi - lo AS double) / 10.0)) AS int), 9) AS bin
           FROM d, mm),
         cnt AS (SELECT source, half, bin, count(*) AS c
           FROM binned GROUP BY 1, 2, 3),
         tot AS (SELECT source,
             sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS n_ref,
             sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n_cur
           FROM d GROUP BY 1),
         grid AS (SELECT DISTINCT source, bin
           FROM d, (SELECT unnest(generate_series(0, 9)) AS bin)),
         g AS (SELECT grid.source, grid.bin,
             coalesce(r.c, 0) AS c_ref, coalesce(cu.c, 0) AS c_cur
           FROM grid
           LEFT JOIN cnt r ON r.source = grid.source AND r.bin = grid.bin
             AND r.half = 0
           LEFT JOIN cnt cu ON cu.source = grid.source AND cu.bin = grid.bin
             AND cu.half = 1),
         term AS (SELECT g.source, tot.n_ref, tot.n_cur,
             cast(round(
               ((c_ref + 1.0) / (n_ref + 10.0) - (c_cur + 1.0) / (n_cur + 10.0)) *
               ln(((c_ref + 1.0) / (n_ref + 10.0)) /
                  ((c_cur + 1.0) / (n_cur + 10.0))), 6)
               AS decimal(18,6)) AS t
           FROM g JOIN tot ON g.source = tot.source)
         SELECT source, cast(max(n_ref) AS bigint) AS n_ref,
           cast(max(n_cur) AS bigint) AS n_cur,
           cast(sum(t) AS double) AS psi
         FROM term GROUP BY source""",
    // HLL gate: the oracle carries the exact side + the contract boolean
    "q230_hll_accuracy" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_exact,
         true AS within_bound
         FROM events GROUP BY event_type""",
    // split leakage: q54's split rule × q35's bag fingerprint, mirrored
    "q231_split_leakage" ->
      """WITH b AS (SELECT
           ('0x' || substr(md5(cast(doc_id AS varchar)), 1, 8))::bigint
             % 10000 AS hb,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
           FROM documents),
         s AS (SELECT DISTINCT
             CASE WHEN hb < 8000 THEN 'train'
                  WHEN hb < 9000 THEN 'val'
                  ELSE 'test' END AS split, fp
           FROM b),
         m AS (SELECT fp, count(DISTINCT split) AS ns FROM s GROUP BY 1)
         SELECT split, count(*) AS n_fps,
           cast(sum(CASE WHEN ns >= 2 THEN 1 ELSE 0 END) AS bigint) AS n_leaked
         FROM s JOIN m USING (fp) GROUP BY split""",
    // approx-quantile gate: oracle carries the exact side + the contract
    // booleans (no oracle can replay the sketch's merge order)
    "q232_approx_quantile_gate" ->
      """WITH t AS (SELECT lang, len(string_split(text,' ')) AS n_tokens
           FROM documents)
         SELECT lang,
           quantile_cont(n_tokens, 0.5) AS p50_exact,
           quantile_cont(n_tokens, 0.9) AS p90_exact,
           true AS ok50, true AS ok90
         FROM t GROUP BY lang""",
    // centroid cosine: 1-based index vs posexplode's 0-based dim — dim is
    // only a within-engine join/group key, never crosses engines
    "q233_centroid_similarity" ->
      """WITH e AS (SELECT label, i AS dim, embedding[i]::DOUBLE AS v
           FROM embeddings,
                (SELECT unnest(generate_series(1, 64)) AS i)),
         cen AS (SELECT label, dim,
             cast(sum(cast(round(v, 6) AS decimal(18,6))) AS double)
               / count(*) AS m
           FROM e GROUP BY 1, 2),
         p AS (SELECT a.label AS la, b.label AS lb,
             cast(sum(cast(round(a.m * b.m, 12) AS decimal(28,12))) AS double) AS dot,
             cast(sum(cast(round(a.m * a.m, 12) AS decimal(28,12))) AS double) AS na2,
             cast(sum(cast(round(b.m * b.m, 12) AS decimal(28,12))) AS double) AS nb2
           FROM cen a JOIN cen b ON a.dim = b.dim AND a.label < b.label
           GROUP BY 1, 2)
         SELECT la, lb, round(dot / sqrt(na2 * nb2), 6) AS cos_sim FROM p""",
    // AUC: mirrored rank-sum identity over the distinct-value distribution
    // table — integer counts throughout, one final double division
    "q234_auc" ->
      """WITH d AS (SELECT n_chars,
           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos FROM documents),
         dist AS (SELECT n_chars, sum(pos) AS np, sum(1 - pos) AS nn
           FROM d GROUP BY 1),
         cum AS (SELECT np, nn, coalesce(sum(nn) OVER (ORDER BY n_chars
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS cum_nn_below
           FROM dist)
         SELECT cast(sum(np) AS bigint) AS n_pos,
           cast(sum(nn) AS bigint) AS n_neg,
           round((cast(sum(np * cum_nn_below) AS double) +
               0.5 * cast(sum(np * nn) AS double)) /
             cast(sum(np) * sum(nn) AS double), 6) AS auc
         FROM cum""",
    // kappa: same integer marginals, ONE mirrored double expression
    "q235_cohens_kappa" ->
      """WITH d AS (SELECT
           CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END AS a,
           CASE WHEN len(string_split(text, ' ')) >= 80 THEN 1 ELSE 0 END
             AS b
           FROM documents),
         m AS (SELECT cast(count(*) AS bigint) AS n,
             cast(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS bigint)
               AS n_agree,
             cast(sum(a) AS bigint) AS na, cast(sum(b) AS bigint) AS nb
           FROM d)
         SELECT n, n_agree,
           round(((cast(n_agree AS double) / cast(n AS double)) -
               ((cast(na AS double) / cast(n AS double)) *
                  (cast(nb AS double) / cast(n AS double)) +
                ((cast(n AS double) - cast(na AS double)) /
                   cast(n AS double)) *
                  ((cast(n AS double) - cast(nb AS double)) /
                     cast(n AS double)))) /
             (1.0 - ((cast(na AS double) / cast(n AS double)) *
                  (cast(nb AS double) / cast(n AS double)) +
                ((cast(n AS double) - cast(na AS double)) /
                   cast(n AS double)) *
                  ((cast(n AS double) - cast(nb AS double)) /
                     cast(n AS double)))), 6) AS kappa
         FROM m""",
    // calibration bins: same bin rule, 6dp terms, exact decimal conf sum
    "q236_calibration_bins" ->
      """WITH d AS (SELECT
           cast(least(n_chars, 2000) AS double) / 2000.0 AS conf,
           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
         b AS (SELECT least(cast(floor(conf * 10) AS bigint), 9) AS bin,
             conf, y FROM d)
         SELECT bin, cast(count(*) AS bigint) AS n_b,
           round(cast(sum(y) AS double) / count(*), 6) AS acc,
           round(cast(sum(cast(round(conf, 6) AS decimal(18,6))) AS double)
             / count(*), 6) AS avg_conf
         FROM b GROUP BY bin""",
    // keyness: mirrored smoothed log-odds, 6dp-rounded before the top-k,
    // term tie-break — boundary-deterministic across engines
    "q237_log_odds_keyness" ->
      """WITH toks AS (SELECT
           CASE WHEN source = 'web' THEN 1 ELSE 0 END AS w,
           unnest(string_split(text, ' ')) AS term FROM documents),
         f AS (SELECT w, term FROM toks WHERE len(term) >= 3),
         counts AS (SELECT term,
             sum(CASE WHEN w = 1 THEN 1 ELSE 0 END) AS n_web,
             sum(CASE WHEN w = 0 THEN 1 ELSE 0 END) AS n_rest
           FROM f GROUP BY 1),
         tot AS (SELECT sum(n_web) AS tw, sum(n_rest) AS tr FROM counts)
         SELECT term, cast(n_web AS bigint) AS n_web,
           cast(n_rest AS bigint) AS n_rest,
           round(ln((n_web + 1.0) / (tw - n_web + 1.0)) -
                 ln((n_rest + 1.0) / (tr - n_rest + 1.0)), 6) AS log_odds
         FROM counts, tot WHERE n_web + n_rest >= 10
         ORDER BY log_odds DESC, term LIMIT 20""",
    // EWMA: same day-grid self-join, 6dp weight/term rounding, exact
    // decimal sums, one final division
    "q238_ewma_daily" ->
      """WITH daily AS (SELECT event_type, cast(ts AS date) AS day,
           count(*) AS x FROM events GROUP BY 1, 2)
         SELECT a.event_type, a.day,
           round(cast(sum(cast(round(round(pow(0.7,
                 date_diff('day', b.day, a.day)), 6) * b.x, 6)
               AS decimal(28,6))) AS double) /
             cast(sum(cast(round(pow(0.7, date_diff('day', b.day, a.day)), 6)
               AS decimal(18,6))) AS double), 6) AS ewma
         FROM daily a JOIN daily b
           ON a.event_type = b.event_type AND b.day <= a.day
         GROUP BY a.event_type, a.day""",
    // CUSUM: mirrored integer-scaled prefix-sum / running-min algebra;
    // argmax tie broken on earliest day; one final division
    "q239_cusum" ->
      """WITH daily AS (SELECT event_type, cast(ts AS date) AS day,
           count(*) AS x FROM events GROUP BY 1, 2),
         p AS (SELECT event_type, day,
             count(*) OVER (PARTITION BY event_type) AS n,
             sum(x) OVER (PARTITION BY event_type) AS s,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
             sum(x) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumx
           FROM daily),
         np AS (SELECT event_type, day, n, n * cumx - t * s AS np FROM p),
         cu AS (SELECT event_type, day, n,
             np - min(np) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cu
           FROM np),
         best AS (SELECT event_type, day, n, cu,
             row_number() OVER (PARTITION BY event_type
               ORDER BY cu DESC, day) AS rn
           FROM cu)
         SELECT event_type, day AS change_day,
           round(cast(cu AS double) / cast(n AS double), 6) AS cusum
         FROM best WHERE rn = 1""",
    // dow seasonality: DuckDB dayofweek is Sunday=0 — +1 aligns it with
    // Spark's Sunday=1 convention; ONE mirrored ratio expression
    "q240_dow_seasonality" ->
      """WITH daily AS (SELECT event_type, cast(ts AS date) AS day,
           count(*) AS x FROM events GROUP BY 1, 2),
         bydow AS (SELECT event_type,
             cast(dayofweek(day) + 1 AS bigint) AS dow,
             sum(x) AS sd, cast(count(*) AS bigint) AS n_days
           FROM daily GROUP BY 1, 2),
         tot AS (SELECT event_type, sum(x) AS s, count(*) AS n
           FROM daily GROUP BY 1)
         SELECT b.event_type, b.dow, b.n_days,
           round((cast(sd AS double) / cast(n_days AS double)) /
             (cast(s AS double) / cast(n AS double)), 6) AS seasonal_index
         FROM bydow b JOIN tot USING (event_type)""",
    // vocab coverage: mirrored (count desc, term) rank + prefix over the
    // vocab table; integer counts, one final division
    "q241_vocab_coverage" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS term
           FROM documents),
         counts AS (SELECT term, count(*) AS c FROM toks
           WHERE term <> '' GROUP BY 1),
         ranked AS (SELECT term, c,
             row_number() OVER (ORDER BY c DESC, term) AS rank,
             sum(c) OVER (ORDER BY c DESC, term
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM counts),
         tot AS (SELECT sum(c) AS t FROM counts),
         cuts AS (SELECT unnest([100, 1000, 5000, 20000]) AS v)
         SELECT cast(v AS bigint) AS v,
           cast(max(rank) AS bigint) AS n_terms,
           round(cast(max(cum) AS double) / cast((SELECT t FROM tot)
             AS double), 6) AS coverage
         FROM ranked JOIN cuts ON rank <= v GROUP BY v""",
    // orphan audit: mirrored left-join-against-distinct-parent counts
    "q242_orphan_audit" ->
      """SELECT 'customer->nation' AS relation,
           cast(count(*) AS bigint) AS n_children,
           cast(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS bigint)
             AS n_orphans
         FROM customer c LEFT JOIN
           (SELECT DISTINCT n_nationkey AS k FROM nation) p
           ON c.c_nationkey = p.k
         UNION ALL
         SELECT 'lineitem->orders', cast(count(*) AS bigint),
           cast(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS bigint)
         FROM lineitem l LEFT JOIN
           (SELECT DISTINCT o_orderkey AS k FROM orders) p
           ON l.l_orderkey = p.k
         UNION ALL
         SELECT 'lineitem->part', cast(count(*) AS bigint),
           cast(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS bigint)
         FROM lineitem l LEFT JOIN
           (SELECT DISTINCT p_partkey AS k FROM part) p
           ON l.l_partkey = p.k
         UNION ALL
         SELECT 'orders->customer', cast(count(*) AS bigint),
           cast(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS bigint)
         FROM orders o LEFT JOIN
           (SELECT DISTINCT c_custkey AS k FROM customer) p
           ON o.o_custkey = p.k
         UNION ALL
         SELECT 'supplier->nation', cast(count(*) AS bigint),
           cast(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS bigint)
         FROM supplier s LEFT JOIN
           (SELECT DISTINCT n_nationkey AS k FROM nation) p
           ON s.s_nationkey = p.k""",
    // grid density clusters: same cell rule; connected components via a
    // recursive reachability CTE over the core-cell adjacency, label = min
    // reachable cell id — integer-exact throughout
    "q243_grid_density_cluster" ->
      """WITH RECURSIVE g AS (SELECT
           cast(year(o_orderdate) * 12 + month(o_orderdate) AS bigint)
             AS gx,
           cast(floor(o_totalprice / 50000) AS bigint) AS gy,
           count(*) AS c
           FROM orders GROUP BY 1, 2),
         s AS (SELECT count(*) AS ncells, sum(c) AS total FROM g),
         core AS (SELECT gx, gy, c, gx * 1000 + gy AS id FROM g
           WHERE c * (SELECT ncells FROM s) * 10
             >= 12 * (SELECT total FROM s)),
         e AS (SELECT a.id AS src, b.id AS dst FROM core a JOIN core b
           ON abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1),
         r AS (SELECT id, id AS lab FROM core
           UNION
           SELECT e.dst, r.lab FROM r JOIN e ON e.src = r.id),
         m AS (SELECT id, min(lab) AS cluster_id FROM r GROUP BY id)
         SELECT cluster_id, cast(count(*) AS bigint) AS n_cells,
           cast(sum(core.c) AS bigint) AS n_points
         FROM m JOIN core USING (id) GROUP BY cluster_id""",
    // jackknife: mirrored delete-one-bucket algebra — exact decimal bucket
    // sums, 12dp θ table, decimal θ sums, CI from the ROUNDED outputs
    "q245_jackknife_ci" ->
      """WITH d AS (SELECT
           ('0x' || substr(md5(cast(user_id AS varchar)), 1, 8))::bigint
             % 20 AS b,
           cast(value AS decimal(18,2)) AS v
           FROM events WHERE event_type = 'purchase'),
         per AS (SELECT b, sum(v) AS s, count(*) AS n FROM d GROUP BY 1),
         tot AS (SELECT sum(s) AS ts, sum(n) AS tn, count(*) AS g FROM per),
         theta AS (SELECT ts, tn, g,
             round(cast(ts - s AS double) / cast(tn - n AS double), 12)
               AS th
           FROM per, tot),
         tbar AS (SELECT ts, tn, g,
             cast(sum(cast(th AS decimal(28,12))) AS double) /
               cast(g AS double) AS tb
           FROM theta GROUP BY 1, 2, 3),
         ss AS (SELECT t.ts, t.tn, t.g,
             cast(sum(cast(round((th - tb) * (th - tb), 12)
               AS decimal(28,12))) AS double) AS ssum
           FROM theta t JOIN tbar b USING (ts, tn, g) GROUP BY 1, 2, 3),
         f AS (SELECT
             round(cast(ts AS double) / cast(tn AS double), 6) AS theta,
             round(sqrt(cast(g - 1 AS double) / cast(g AS double) * ssum),
               6) AS se_jack
           FROM ss)
         SELECT theta, se_jack,
           round(theta - 1.96 * se_jack, 6) AS ci_lo,
           round(theta + 1.96 * se_jack, 6) AS ci_hi
         FROM f""",
    // zone maps: plain mirrored per-partition min/max/null stats
    "q246_zone_maps" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS part,
           cast(count(*) AS bigint) AS n_rows,
           min(l_orderkey) AS min_orderkey,
           max(l_orderkey) AS max_orderkey,
           round(cast(min(cast(l_extendedprice AS decimal(18,2)))
             AS double), 2) AS min_price,
           round(cast(max(cast(l_extendedprice AS decimal(18,2)))
             AS double), 2) AS max_price,
           cast(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)
             AS bigint) AS null_returnflags
         FROM lineitem GROUP BY 1""",
    // sentence stats: same [.!?]+ split rule, trim, exact char sums
    "q247_sentence_stats" ->
      """WITH sent AS (SELECT source, trim(f) AS sent FROM
           (SELECT source, unnest(string_split_regex(text, '[.!?]+')) AS f
            FROM documents)
           WHERE trim(f) <> '')
         SELECT source, cast(count(*) AS bigint) AS n_sentences,
           round(cast(sum(len(sent)) AS double) /
             cast(count(*) AS double), 6) AS avg_sentence_chars,
           cast(max(len(sent)) AS bigint) AS max_sentence_chars
         FROM sent GROUP BY 1""",
    // power iteration: the SAME 4 lockstep-rounded iterations unrolled as
    // CTE blocks — 9dp term rounds, exact decimal sums, re-rounded v
    "q249_power_iteration" ->
      """WITH e AS (SELECT vec_id, i AS dim, embedding[i]::DOUBLE AS x
           FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i)),
         n AS (SELECT count(*) AS c FROM embeddings),
         v0 AS (SELECT unnest(generate_series(1, 64)) AS dim, 0.125 AS v),
         s1 AS (SELECT vec_id, cast(sum(cast(round(x * v, 9)
             AS decimal(28,9))) AS double) AS sc
           FROM e JOIN v0 ON e.dim = v0.dim GROUP BY vec_id),
         w1 AS (SELECT dim, cast(sum(cast(round(x * sc, 9)
             AS decimal(38,9))) AS double) /
             cast((SELECT c FROM n) AS double) AS w
           FROM e JOIN s1 USING (vec_id) GROUP BY dim),
         n1 AS (SELECT sqrt(cast(sum(cast(round(w * w, 12)
             AS decimal(38,12))) AS double)) AS nrm FROM w1),
         v1 AS (SELECT dim, round(w / (SELECT nrm FROM n1), 9) AS v
           FROM w1),
         s2 AS (SELECT vec_id, cast(sum(cast(round(x * v, 9)
             AS decimal(28,9))) AS double) AS sc
           FROM e JOIN v1 ON e.dim = v1.dim GROUP BY vec_id),
         w2 AS (SELECT dim, cast(sum(cast(round(x * sc, 9)
             AS decimal(38,9))) AS double) /
             cast((SELECT c FROM n) AS double) AS w
           FROM e JOIN s2 USING (vec_id) GROUP BY dim),
         n2 AS (SELECT sqrt(cast(sum(cast(round(w * w, 12)
             AS decimal(38,12))) AS double)) AS nrm FROM w2),
         v2 AS (SELECT dim, round(w / (SELECT nrm FROM n2), 9) AS v
           FROM w2),
         s3 AS (SELECT vec_id, cast(sum(cast(round(x * v, 9)
             AS decimal(28,9))) AS double) AS sc
           FROM e JOIN v2 ON e.dim = v2.dim GROUP BY vec_id),
         w3 AS (SELECT dim, cast(sum(cast(round(x * sc, 9)
             AS decimal(38,9))) AS double) /
             cast((SELECT c FROM n) AS double) AS w
           FROM e JOIN s3 USING (vec_id) GROUP BY dim),
         n3 AS (SELECT sqrt(cast(sum(cast(round(w * w, 12)
             AS decimal(38,12))) AS double)) AS nrm FROM w3),
         v3 AS (SELECT dim, round(w / (SELECT nrm FROM n3), 9) AS v
           FROM w3),
         s4 AS (SELECT vec_id, cast(sum(cast(round(x * v, 9)
             AS decimal(28,9))) AS double) AS sc
           FROM e JOIN v3 ON e.dim = v3.dim GROUP BY vec_id),
         w4 AS (SELECT dim, cast(sum(cast(round(x * sc, 9)
             AS decimal(38,9))) AS double) /
             cast((SELECT c FROM n) AS double) AS w
           FROM e JOIN s4 USING (vec_id) GROUP BY dim),
         n4 AS (SELECT sqrt(cast(sum(cast(round(w * w, 12)
             AS decimal(38,12))) AS double)) AS nrm FROM w4),
         v4 AS (SELECT dim, round(w / (SELECT nrm FROM n4), 9) AS v
           FROM w4)
         SELECT cast(dim AS bigint) AS dim, round(v, 6) AS loading
         FROM v4""",
    // cluster quality: mirrored centroid/norm/dot pipeline, 6/12dp rounds,
    // margin from the UNROUNDED means then rounded once
    "q250_cluster_quality" ->
      """WITH e AS (SELECT vec_id, label AS vl, i AS dim,
           embedding[i]::DOUBLE AS x
           FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i)),
         cen AS (SELECT vl AS cl, dim,
             cast(sum(cast(round(x, 6) AS decimal(18,6))) AS double)
               / count(*) AS m
           FROM e GROUP BY 1, 2),
         vnorm AS (SELECT vec_id, sqrt(cast(sum(cast(round(x * x, 12)
             AS decimal(38,12))) AS double)) AS nv FROM e GROUP BY 1),
         cnorm AS (SELECT cl, sqrt(cast(sum(cast(round(m * m, 12)
             AS decimal(38,12))) AS double)) AS nc FROM cen GROUP BY 1),
         dots AS (SELECT vec_id, vl, cl,
             cast(sum(cast(round(x * m, 12) AS decimal(38,12))) AS double)
               AS dot
           FROM e JOIN cen USING (dim) GROUP BY 1, 2, 3),
         cosv AS (SELECT vec_id, vl, cl, round(dot / (nv * nc), 6) AS cs
           FROM dots JOIN vnorm USING (vec_id) JOIN cnorm USING (cl)),
         per AS (SELECT vec_id, vl,
             max(CASE WHEN cl = vl THEN cs END) AS own,
             max(CASE WHEN cl <> vl THEN cs END) AS other
           FROM cosv GROUP BY 1, 2),
         g AS (SELECT vl AS label, count(*) AS n_vecs,
             cast(sum(cast(own AS decimal(18,6))) AS double) / count(*)
               AS mo,
             cast(sum(cast(other AS decimal(18,6))) AS double) / count(*)
               AS mb
           FROM per GROUP BY 1)
         SELECT cast(label AS bigint) AS label,
           cast(n_vecs AS bigint) AS n_vecs,
           round(mo, 6) AS mean_own_cos, round(mb, 6) AS mean_other_cos,
           round(mo - mb, 6) AS margin
         FROM g""",
    // record linkage: mirrored blocked pairs + integer ×10 weights
    "q251_record_linkage" ->
      """WITH c AS (SELECT c_custkey, c_nationkey, c_mktsegment,
           cast(floor(c_acctbal / 1000) AS bigint) AS band,
           cast(round(c_acctbal * 100, 0) AS bigint) % 10 AS centd,
           c_acctbal < 0 AS neg
           FROM customer),
         p AS (SELECT a.c_nationkey, a.c_mktsegment,
             (CASE WHEN a.band = b.band THEN 20 ELSE -5 END +
              CASE WHEN a.centd = b.centd THEN 15 ELSE -3 END +
              CASE WHEN a.neg = b.neg THEN 5 ELSE -1 END) AS score10
           FROM c a JOIN c b
             ON a.c_nationkey = b.c_nationkey
             AND a.c_mktsegment = b.c_mktsegment
             AND a.c_custkey < b.c_custkey)
         SELECT c_nationkey, c_mktsegment,
           cast(count(*) AS bigint) AS n_pairs,
           cast(sum(CASE WHEN score10 >= 25 THEN 1 ELSE 0 END) AS bigint)
             AS n_matches,
           cast(max(score10) AS bigint) AS max_score10
         FROM p GROUP BY 1, 2""",
    // containment: same shingle + df-cap pipeline as q36, exact
    // intersection counts, 0.6 threshold on rounded values
    "q252_containment_dedup" ->
      """WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM documents),
         toks AS (SELECT doc_id, list_distinct(list_transform(
             generate_series(1, len(w) - 2),
             i -> array_to_string(w[i:i+2], ' '))) AS t
           FROM t0 WHERE len(w) >= 3),
         shl AS (SELECT doc_id, unnest(t) AS sng FROM toks),
         hot AS (SELECT sng FROM shl GROUP BY sng HAVING count(*) > 100),
         kept AS (SELECT doc_id, sng FROM shl
           WHERE sng NOT IN (SELECT sng FROM hot)),
         sizes AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY 1),
         inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(*) AS i
           FROM kept a JOIN kept b
             ON a.sng = b.sng AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         f AS (SELECT doc_a, doc_b,
             round(cast(i AS double) / cast(sa.sz AS double), 6)
               AS containment_ab,
             round(cast(i AS double) / cast(sb.sz AS double), 6)
               AS containment_ba
           FROM inter JOIN sizes sa ON sa.doc_id = doc_a
             JOIN sizes sb ON sb.doc_id = doc_b)
         SELECT doc_a, doc_b, containment_ab, containment_ba FROM f
         WHERE containment_ab >= 0.6 OR containment_ba >= 0.6""",
    // Theil–Sen: mirrored day-grid pairs, 6dp slopes, interpolated median
    // over identical doubles
    "q253_theil_sen" ->
      """WITH daily AS (SELECT event_type, cast(ts AS date) AS day,
           count(*) AS x FROM events GROUP BY 1, 2),
         p AS (SELECT a.event_type,
             round(cast(b.x - a.x AS double) /
               cast(date_diff('day', a.day, b.day) AS double), 6) AS slope
           FROM daily a JOIN daily b
             ON a.event_type = b.event_type AND a.day < b.day)
         SELECT event_type, cast(count(*) AS bigint) AS n_pairs,
           round(quantile_cont(slope, 0.5), 6) AS median_slope
         FROM p GROUP BY 1""",
    // merge apply: mirrored full-outer + CASE classification
    "q255_merge_apply" ->
      """WITH src AS (SELECT o_orderkey AS k,
           CASE WHEN o_orderkey % 13 = 0 THEN 'D' ELSE 'U' END AS op,
           'X' AS new_status
           FROM orders WHERE o_orderkey % 7 = 0 OR o_orderkey % 13 = 0
           UNION ALL
           SELECT o_orderkey + 1000000000 AS k, 'I' AS op, 'N' AS new_status
           FROM orders WHERE o_orderkey % 11 = 0)
         SELECT coalesce(t.o_orderkey, s.k) AS o_orderkey,
           CASE WHEN s.op IN ('U', 'I') THEN s.new_status
                ELSE t.o_orderstatus END AS o_orderstatus,
           CASE WHEN s.op = 'U' THEN 'update'
                WHEN s.op = 'I' THEN 'insert'
                ELSE 'noop' END AS action
         FROM orders t FULL OUTER JOIN src s ON t.o_orderkey = s.k
         WHERE s.op IS NULL OR s.op <> 'D'""",
    // aspect buckets: same log-ratio argmin, 9dp-rounded diff, bidx
    // tie-break — boundary-deterministic
    "q256_aspect_buckets" ->
      """WITH buckets AS (SELECT * FROM (VALUES
           (1, 1024, 1024), (2, 1152, 896), (3, 896, 1152),
           (4, 1216, 832), (5, 832, 1216), (6, 1344, 768), (7, 768, 1344))
           AS b(bidx, bw, bh)),
         imgs AS (SELECT doc_id,
             cast(256 + doc_id % 1024 AS double) AS w,
             cast(256 + (doc_id * 7) % 1024 AS double) AS h
           FROM documents),
         scored AS (SELECT doc_id, bidx, bw, bh,
             round(abs(ln(w / h) -
               ln(cast(bw AS double) / cast(bh AS double))), 9) AS diff
           FROM imgs, buckets),
         best AS (SELECT bw, bh, row_number() OVER (
             PARTITION BY doc_id ORDER BY diff, bidx) AS rn
           FROM scored)
         SELECT cast(bw AS int) AS bw, cast(bh AS int) AS bh,
           cast(count(*) AS bigint) AS n_docs
         FROM best WHERE rn = 1 GROUP BY 1, 2""",
    // top-k terms: same (count desc, term) total order stated via window +
    // ordered string_agg — construction differs, semantics identical
    "q257_topk_terms_per_doc" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
           FROM documents),
         counts AS (SELECT doc_id, t, count(*) AS c FROM toks
           WHERE t <> '' GROUP BY 1, 2),
         r AS (SELECT doc_id, t, row_number() OVER (
             PARTITION BY doc_id ORDER BY c DESC, t) AS rn
           FROM counts)
         SELECT doc_id, string_agg(t, ',' ORDER BY rn) AS top_terms
         FROM r WHERE rn <= 3 GROUP BY doc_id""",
    // correlated subquery: near-verbatim — DuckDB decorrelates the same way
    "q258_correlated_subquery" ->
      """SELECT c.c_nationkey, cast(count(*) AS bigint) AS n_above
         FROM customer c
         WHERE c.c_acctbal > (
           SELECT cast(sum(cast(i.c_acctbal AS decimal(18,2))) AS double)
                  / count(*)
           FROM customer i WHERE i.c_nationkey = c.c_nationkey)
         GROUP BY c.c_nationkey""",
    // debounce: mirrored lag/gap-group windows, first row by (ts, id)
    "q259_debounce" ->
      """WITH m AS (SELECT event_id, user_id, event_type, ts,
           epoch_us(ts) AS us,
           lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
             ORDER BY ts, event_id) AS prev
           FROM events),
         g AS (SELECT *, sum(CASE WHEN prev IS NULL
               OR us - prev > 1800000000 THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
           FROM m),
         f AS (SELECT user_id, event_type, grp, event_id,
             row_number() OVER (PARTITION BY user_id, event_type, grp
               ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id, event_type, grp)
               AS burst_len
           FROM g)
         SELECT event_id, user_id, event_type,
           cast(burst_len AS bigint) AS burst_len
         FROM f WHERE rn = 1""",
    // join-skew profile: mirrored histogram product + top-10 by (pairs
    // desc, key)
    "q260_join_skew_profile" ->
      """WITH a AS (SELECT user_id, count(*) AS na FROM events
           WHERE event_type = 'click' GROUP BY 1),
         b AS (SELECT user_id, count(*) AS nb FROM events
           WHERE event_type = 'purchase' GROUP BY 1),
         c AS (SELECT a.user_id, na * nb AS pairs
           FROM a JOIN b USING (user_id)),
         t AS (SELECT sum(pairs) AS tp FROM c)
         SELECT user_id, cast(pairs AS bigint) AS pairs,
           cast((SELECT tp FROM t) AS bigint) AS total_predicted_pairs
         FROM c ORDER BY pairs DESC, user_id LIMIT 10""",
    // lateral top-n: identical LATERAL syntax in DuckDB
    "q262_lateral_topn" ->
      """SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
         FROM customer c,
         LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
           WHERE o.o_custkey = c.c_custkey
           ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l""",
    // recursive BFS: DuckDB uses UNION recursion (its level dedup);
    // min(hops) makes both recursion styles converge to the same result
    "q263_recursive_cte" ->
      """WITH RECURSIVE
         p AS (SELECT DISTINCT 'c' || cast(o_custkey AS varchar) AS src,
                 's' || cast(l_suppkey AS varchar) AS dst
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         ed AS (SELECT src, dst FROM p
                UNION ALL SELECT dst AS src, src AS dst FROM p),
         bfs(node, hops) AS (
           SELECT 'c' || cast(c_custkey AS varchar) AS node, 0 AS hops
           FROM customer WHERE c_custkey <= 5
           UNION
           SELECT e.dst, b.hops + 1 FROM bfs b JOIN ed e ON e.src = b.node
           WHERE b.hops < 3)
         SELECT node, cast(min(hops) AS int) AS hops
         FROM bfs GROUP BY node""",
    // variant extraction: DuckDB's JSON path extraction, same typed field
    "q264_variant_json" ->
      """SELECT event_type, cast(count(*) AS bigint) AS n,
         cast(sum(json_extract(props, '$.k')::bigint) AS bigint) AS sum_k,
         cast(count(DISTINCT json_extract(props, '$.k')::bigint) AS bigint)
           AS n_distinct_k
         FROM events GROUP BY event_type""",
    // impute: mirrored median + one repaired-mean expression
    "q265_impute_median" ->
      """WITH e AS (SELECT event_type,
           cast(value AS decimal(18,2)) AS v,
           event_id % 17 = 0 AS miss FROM events),
         med AS (SELECT event_type,
             round(quantile_cont(cast(v AS double), 0.5), 6) AS med
           FROM e WHERE NOT miss GROUP BY 1),
         g AS (SELECT event_type, cast(count(*) AS bigint) AS n,
             cast(sum(CASE WHEN miss THEN 1 ELSE 0 END) AS bigint)
               AS n_imputed,
             cast(sum(CASE WHEN NOT miss THEN v
               ELSE cast(0 AS decimal(18,2)) END) AS double) AS s
           FROM e GROUP BY 1)
         SELECT g.event_type, n, n_imputed,
           round((s + med * cast(n_imputed AS double)) /
             cast(n AS double), 6) AS mean_after
         FROM g JOIN med USING (event_type)""",
    // label noise: q39's sequential-double dot contract (list_sum in index
    // order == the native loop), raw-sim top-5, neighbor-id tie-break
    "q266_knn_label_noise" ->
      """WITH e0 AS (SELECT vec_id, label, embedding FROM embeddings
           ORDER BY md5(cast(vec_id AS varchar)), vec_id LIMIT 512),
         e AS (SELECT vec_id, cast(label AS bigint) AS lab,
           embedding::DOUBLE[] AS v FROM e0),
         s AS (SELECT a.vec_id AS v1, a.lab AS l1, b.vec_id AS v2,
             b.lab AS l2,
             list_sum(list_transform(generate_series(1, 64),
               i -> a.v[i] * b.v[i]))
             / (sqrt(list_sum(list_transform(a.v, x -> x*x)))
                * sqrt(list_sum(list_transform(b.v, x -> x*x)))) AS sim
           FROM e a CROSS JOIN e b WHERE a.vec_id <> b.vec_id),
         top AS (SELECT v1, l1, l2, row_number() OVER (
             PARTITION BY v1 ORDER BY sim DESC, v2) AS rn
           FROM s)
         SELECT l1 AS label,
           cast(count(DISTINCT v1) AS bigint) AS n_vecs,
           round(cast(sum(CASE WHEN l2 <> l1 THEN 1 ELSE 0 END) AS double)
             / cast(count(DISTINCT v1) * 5 AS double), 6) AS noise_rate
         FROM top WHERE rn <= 5 GROUP BY l1""",
    // interval union: mirrored running-max-end island windows
    "q267_interval_union" ->
      """WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS st,
           epoch_us(ts) + 1800000000 AS en FROM events),
         m AS (SELECT user_id, st, en,
             max(en) OVER (PARTITION BY user_id ORDER BY st, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax,
             event_id
           FROM iv),
         g AS (SELECT *, sum(CASE WHEN pmax IS NULL OR st > pmax
               THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY st, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
           FROM m),
         i AS (SELECT user_id, isl, min(st) AS s, max(en) AS e
           FROM g GROUP BY 1, 2)
         SELECT user_id, cast(count(*) AS bigint) AS n_islands,
           cast(sum(e - s) AS bigint) AS covered_us
         FROM i GROUP BY 1""",
    // cross-source dup flow: q35's bag fingerprint, source-pair join
    "q268_cross_source_dups" ->
      """WITH d AS (SELECT DISTINCT source,
           md5(array_to_string(list_sort(list_distinct(
             string_split(text, ' '))), ' ')) AS fp
           FROM documents)
         SELECT a.source AS sa, b.source AS sb,
           cast(count(DISTINCT a.fp) AS bigint) AS n_shared_fps
         FROM d a JOIN d b ON a.fp = b.fp AND a.source < b.source
         GROUP BY 1, 2""",
    // mutual NN: q39's sequential-double dot contract, raw-sim argmax,
    // reciprocal join, 6dp round on output only
    "q269_mutual_nn" ->
      """WITH e0 AS (SELECT vec_id, embedding FROM embeddings
           ORDER BY md5(cast(vec_id AS varchar)), vec_id LIMIT 512),
         e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM e0),
         s AS (SELECT a.vec_id AS v1, b.vec_id AS v2,
             list_sum(list_transform(generate_series(1, 64),
               i -> a.v[i] * b.v[i]))
             / (sqrt(list_sum(list_transform(a.v, x -> x*x)))
                * sqrt(list_sum(list_transform(b.v, x -> x*x)))) AS sim
           FROM e a CROSS JOIN e b WHERE a.vec_id <> b.vec_id),
         best AS (SELECT v1, v2, round(sim, 6) AS cs
           FROM (SELECT v1, v2, sim,
             row_number() OVER (PARTITION BY v1 ORDER BY sim DESC, v2)
               AS rn FROM s) WHERE rn = 1)
         SELECT a.v1, a.v2, a.cs FROM best a
         JOIN best b ON a.v1 = b.v2 AND a.v2 = b.v1
         WHERE a.v1 < a.v2""",
    // bag set-ops: verbatim INTERSECT ALL / EXCEPT ALL
    "q270_bag_setops" ->
      """WITH a AS (SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0),
         b AS (SELECT o_custkey FROM orders WHERE o_orderkey % 3 = 0),
         ia AS (SELECT o_custkey FROM a INTERSECT ALL
                SELECT o_custkey FROM b),
         ea AS (SELECT o_custkey FROM a EXCEPT ALL
                SELECT o_custkey FROM b)
         SELECT 'intersect_all' AS op, o_custkey,
           cast(count(*) AS bigint) AS n FROM ia GROUP BY 2
         UNION ALL
         SELECT 'except_all' AS op, o_custkey,
           cast(count(*) AS bigint) AS n FROM ea GROUP BY 2""",
    // null-safe join: IS NOT DISTINCT FROM pairs the NULL group too
    "q271_null_safe_join" ->
      """WITH e AS (SELECT nullif(event_type, 'view') AS k, event_id
           FROM events),
         a AS (SELECT k, count(*) AS na FROM e
           WHERE event_id % 2 = 0 GROUP BY k),
         b AS (SELECT k, count(*) AS nb FROM e
           WHERE event_id % 2 = 1 GROUP BY k)
         SELECT a.k, cast(na AS bigint) AS na, cast(nb AS bigint) AS nb,
           cast(na * nb AS bigint) AS n_pairs
         FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k""",
    // proration: mirrored integer floor-share + largest-remainder windows
    "q272_proration" ->
      """WITH li AS (SELECT l_orderkey, l_linenumber,
           cast(round(l_extendedprice * 100, 0) AS bigint) AS w
           FROM lineitem),
         o AS (SELECT o_orderkey,
           cast(round(o_totalprice * 100, 0) AS bigint) AS t FROM orders),
         j AS (SELECT l_orderkey, l_linenumber, w, t
           FROM li JOIN o ON l_orderkey = o_orderkey),
         b AS (SELECT *, sum(w) OVER (PARTITION BY l_orderkey) AS tw
           FROM j),
         c AS (SELECT *, (t * w) // tw AS base, (t * w) % tw AS rem
           FROM b),
         r AS (SELECT *,
             t - sum(base) OVER (PARTITION BY l_orderkey) AS leftover,
             row_number() OVER (PARTITION BY l_orderkey
               ORDER BY rem DESC, l_linenumber) AS rk
           FROM c)
         SELECT l_orderkey, l_linenumber,
           cast(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
             AS bigint) AS alloc_cents
         FROM r""",
    // encoding audit: same char classes (tab/newline/CR excluded), 'g'
    // flag so DuckDB replaces ALL matches like Spark does
    "q273_encoding_audit" ->
      """SELECT source, cast(count(*) AS bigint) AS n_docs,
         cast(sum(CASE WHEN len(text) -
             len(regexp_replace(text, '\x{FFFD}', '', 'g')) > 0
           THEN 1 ELSE 0 END) AS bigint) AS n_docs_replacement,
         round(cast(sum(len(text) - len(regexp_replace(text,
             '[\x00-\x08\x0B\x0C\x0E-\x1F]', '', 'g'))) AS double)
           * 1000.0 / cast(sum(n_chars) AS double), 6)
           AS ctl_per_1k_chars
         FROM documents GROUP BY source""",
    // Poisson bootstrap: identical md5→uniform→Poisson-quantile draws,
    // exact decimal replicate numerators, q245-style SE assembly
    "q274_poisson_bootstrap" ->
      """WITH d AS (SELECT event_id, cast(value AS decimal(18,2)) AS v
           FROM events WHERE event_type = 'purchase'),
         reps AS (SELECT unnest(generate_series(1, 20)) AS r),
         j AS (SELECT event_id, v, r,
             (('0x' || substr(md5(cast(event_id AS varchar) || '_' ||
               cast(r AS varchar)), 1, 8))::bigint % 1000000)
               / 1000000.0 AS u
           FROM d, reps),
         wts AS (SELECT r, v,
             CASE WHEN u < 0.367879 THEN 0 WHEN u < 0.735759 THEN 1
                  WHEN u < 0.919699 THEN 2 WHEN u < 0.981012 THEN 3
                  WHEN u < 0.996340 THEN 4 WHEN u < 0.999406 THEN 5
                  ELSE 6 END AS w
           FROM j),
         pr AS (SELECT r, cast(sum(v * w) AS double) /
             cast(sum(w) AS double) AS m
           FROM wts GROUP BY r),
         mb AS (SELECT cast(sum(cast(round(m, 12) AS decimal(28,12)))
             AS double) / 20.0 AS mb FROM pr),
         se AS (SELECT round(sqrt(cast(sum(cast(round((m - mb) * (m - mb),
             12) AS decimal(28,12))) AS double) / 19.0), 6) AS se_boot
           FROM pr, mb),
         th AS (SELECT round(cast(sum(v) AS double) / count(*), 6)
             AS theta FROM d)
         SELECT theta, se_boot, cast(20 AS bigint) AS b FROM th, se""",
    // table stats: mirrored exact NDV/null counts per column
    "q275_table_stats" ->
      """SELECT 'l_orderkey' AS column_name,
           cast(count(*) AS bigint) AS n_rows,
           cast(count(DISTINCT l_orderkey) AS bigint) AS ndv,
           cast(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
             AS bigint) AS n_nulls
         FROM lineitem
         UNION ALL
         SELECT 'l_returnflag', cast(count(*) AS bigint),
           cast(count(DISTINCT l_returnflag) AS bigint),
           cast(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)
             AS bigint)
         FROM lineitem
         UNION ALL
         SELECT 'l_quantity', cast(count(*) AS bigint),
           cast(count(DISTINCT l_quantity) AS bigint),
           cast(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
             AS bigint)
         FROM lineitem
         UNION ALL
         SELECT 'l_shipdate', cast(count(*) AS bigint),
           cast(count(DISTINCT l_shipdate) AS bigint),
           cast(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
             AS bigint)
         FROM lineitem""",
    // sliding windows: the 4 aligned starts per event, stated directly
    "q276_sliding_windows" ->
      """WITH j AS (SELECT event_type, value,
           (epoch_us(ts) // 900000000) * 900 - k * 900 AS win_start
           FROM events, (SELECT unnest(generate_series(0, 3)) AS k))
         SELECT cast(win_start AS bigint) AS win_start, event_type,
           cast(count(*) AS bigint) AS n,
           cast(sum(cast(value AS decimal(18,2))) AS double) AS sum_value
         FROM j GROUP BY 1, 2""",
    // chunk round trip: oracle = the space-normalized source token stream
    "q277_chunk_roundtrip" ->
      """SELECT doc_id, array_to_string(list_filter(
           string_split(text, ' '), t -> t <> ''), ' ') AS text_norm
         FROM documents
         WHERE doc_id % 20 = 0
           AND len(list_filter(string_split(text, ' '), t -> t <> '')) > 0""",
    // unpivot: union-based melt with the same status labels
    "q278_unpivot_sql" ->
      """WITH w AS (SELECT c_nationkey,
           cast(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
             AS bigint) AS open_n,
           cast(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
             AS bigint) AS done_n,
           cast(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
             AS bigint) AS part_n
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY c_nationkey)
         SELECT c_nationkey, 'open_n' AS status, open_n AS n FROM w
         UNION ALL
         SELECT c_nationkey, 'done_n', done_n FROM w
         UNION ALL
         SELECT c_nationkey, 'part_n', part_n FROM w""",
    // Neyman: mirrored exact-moment sigma + largest-remainder integers
    "q279_neyman_allocation" ->
      """WITH m AS (SELECT event_type, cast(count(*) AS bigint) AS nh,
           cast(sum(cast(value AS decimal(18,2))) AS double) AS s,
           cast(sum(cast(cast(value AS decimal(18,2)) *
             cast(value AS decimal(18,2)) AS decimal(28,4))) AS double)
             AS s2
           FROM events GROUP BY 1),
         sg AS (SELECT event_type, nh,
             round(sqrt(greatest(s2 / nh - (s / nh) * (s / nh), 0.0)), 6)
               AS sigma
           FROM m),
         wt AS (SELECT *, cast(round(cast(nh AS double) * sigma, 0)
             AS bigint) AS w FROM sg),
         b AS (SELECT *, sum(w) OVER () AS tw FROM wt),
         c AS (SELECT *, (10000 * w) // tw AS base,
             (10000 * w) % tw AS rem FROM b),
         r AS (SELECT *, 10000 - sum(base) OVER () AS leftover,
             row_number() OVER (ORDER BY rem DESC, event_type) AS rk
           FROM c)
         SELECT event_type, nh, sigma,
           cast(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
             AS bigint) AS alloc
         FROM r""",
    // decile lift: mirrored distribution-table deciles + cumulative capture
    "q280_decile_lift" ->
      """WITH d AS (SELECT n_chars,
           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos FROM documents),
         dist AS (SELECT n_chars, count(*) AS n, sum(pos) AS np
           FROM d GROUP BY 1),
         tot AS (SELECT sum(n) AS tn, sum(np) AS tp FROM dist),
         cum AS (SELECT n_chars, n, np,
             coalesce(sum(n) OVER (ORDER BY n_chars DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
           FROM dist),
         dec AS (SELECT least((cb * 10) // (SELECT tn FROM tot), 9)
             AS decile, n, np FROM cum),
         g AS (SELECT decile, sum(n) AS n, sum(np) AS n_pos
           FROM dec GROUP BY 1),
         f AS (SELECT *, sum(n_pos) OVER (ORDER BY decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp
           FROM g)
         SELECT cast(decile AS bigint) AS decile, cast(n AS bigint) AS n,
           cast(n_pos AS bigint) AS n_pos,
           round(cast(n_pos AS double) / cast(n AS double), 6)
             AS pos_rate,
           round(cast(cp AS double) /
             cast((SELECT tp FROM tot) AS double), 6) AS cum_capture
         FROM f""",
    // conversion latency: mirrored first-match pairing + percentiles on
    // identical integer micros
    "q281_conversion_latency" ->
      """WITH c AS (SELECT event_id AS cid, user_id, epoch_us(ts) AS cus
           FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, epoch_us(ts) AS pus FROM events
           WHERE event_type = 'purchase'),
         lat AS (SELECT cid, min(pus) - max(cus) AS lat_us
           FROM c JOIN p USING (user_id)
           WHERE pus > cus AND pus <= cus + 86400000000
           GROUP BY cid),
         n AS (SELECT count(*) AS n_clicks FROM c),
         a AS (SELECT cast(count(*) AS bigint) AS n_converted,
             round(quantile_cont(lat_us, 0.5), 6) AS p50_lat_us,
             round(quantile_cont(lat_us, 0.9), 6) AS p90_lat_us
           FROM lat)
         SELECT cast(n_clicks AS bigint) AS n_clicks, n_converted,
           round(cast(n_converted AS double) / cast(n_clicks AS double),
             6) AS conv_rate,
           p50_lat_us, p90_lat_us
         FROM a, n""",
    // SLA conformance: integer day diffs, three mirrored divisions
    "q282_sla_conformance" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
           cast(count(*) AS bigint) AS n,
           round(cast(sum(CASE WHEN date_diff('day', o_orderdate,
               l_shipdate) <= 30 THEN 1 ELSE 0 END) AS double)
             / cast(count(*) AS double), 6) AS pct_30d,
           round(cast(sum(CASE WHEN date_diff('day', o_orderdate,
               l_shipdate) <= 60 THEN 1 ELSE 0 END) AS double)
             / cast(count(*) AS double), 6) AS pct_60d,
           round(cast(sum(CASE WHEN date_diff('day', o_orderdate,
               l_shipdate) <= 90 THEN 1 ELSE 0 END) AS double)
             / cast(count(*) AS double), 6) AS pct_90d
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1""",
    // KS: mirrored pooled-grid running CDFs, 9dp gaps before the max
    "q283_ks_test" ->
      """WITH d AS (SELECT n_chars,
           CASE WHEN source = 'web' THEN 1 ELSE 0 END AS ia
           FROM documents WHERE source IN ('web', 'social')),
         dist AS (SELECT n_chars, cast(sum(ia) AS bigint) AS ca,
             cast(sum(1 - ia) AS bigint) AS cb
           FROM d GROUP BY 1),
         tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM dist),
         c AS (SELECT n_chars,
             sum(ca) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS cca,
             sum(cb) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS ccb
           FROM dist),
         g AS (SELECT round(abs(
             cast(cca AS double) / cast((SELECT na FROM tot) AS double) -
             cast(ccb AS double) / cast((SELECT nb FROM tot) AS double)),
             9) AS gap FROM c)
         SELECT cast((SELECT na FROM tot) AS bigint) AS na,
           cast((SELECT nb FROM tot) AS bigint) AS nb,
           round(max(gap), 6) AS ks_stat
         FROM g""",
    // trimmed mean: mirrored rank-overlap algebra on the distribution table
    "q284_trimmed_mean" ->
      """WITH d AS (SELECT event_type, cast(value AS decimal(18,2)) AS v
           FROM events),
         dist AS (SELECT event_type, v, count(*) AS c FROM d GROUP BY 1, 2),
         tot AS (SELECT event_type, count(*) AS n FROM d GROUP BY 1),
         cum AS (SELECT dist.event_type, v, c, n,
             sum(c) OVER (PARTITION BY dist.event_type ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm,
             n // 10 AS k
           FROM dist JOIN tot USING (event_type)),
         kp AS (SELECT event_type, v, n, k,
             greatest(least(cm, n - k) - greatest(cm - c, k), 0) AS keep
           FROM cum)
         SELECT event_type, cast(max(n) AS bigint) AS n,
           cast(max(k) AS bigint) AS n_trimmed_each,
           round(cast(sum(v * keep) AS double) /
             cast(sum(keep) AS double), 6) AS trimmed_mean
         FROM kp GROUP BY event_type""",
    // mix adjustment: mirrored reference shares × segment means, 9dp
    // terms → exact decimal sum
    "q285_mix_adjusted_mean" ->
      """WITH d AS (SELECT event_type,
           cast(user_id % 2 = 0 AS int) AS grp,
           cast(value AS decimal(18,2)) AS v FROM events),
         seg AS (SELECT grp, event_type, count(*) AS ns, sum(v) AS sv
           FROM d GROUP BY 1, 2),
         ref AS (SELECT event_type, count(*) AS nr FROM d GROUP BY 1),
         tot AS (SELECT count(*) AS nt FROM d),
         t AS (SELECT grp, ns, sv,
             cast(round((cast(nr AS double) /
               cast((SELECT nt FROM tot) AS double)) *
               (cast(sv AS double) / cast(ns AS double)), 9)
               AS decimal(28,9)) AS term
           FROM seg JOIN ref USING (event_type))
         SELECT grp, cast(sum(ns) AS bigint) AS n,
           round(cast(sum(sv) AS double) / cast(sum(ns) AS double), 6)
             AS raw_mean,
           round(cast(sum(term) AS double), 6) AS adjusted_mean
         FROM t GROUP BY grp""",
    // TWAP: exact micros weights, decimal(18,2)*bigint exact weighted sum,
    // one final double division; zero-span keys excluded (no 0/0)
    "q136_twap" ->
      """WITH t AS (SELECT user_id, value, epoch_us(ts) AS us,
           lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_us
           FROM events),
         iv AS (SELECT user_id, value, next_us - us AS dur FROM t
           WHERE next_us IS NOT NULL)
         SELECT user_id, count(*) AS n_intervals,
           cast(sum(dur) AS bigint) AS span_us,
           cast(sum(cast(value AS decimal(18,2)) * dur) AS double) /
             cast(cast(sum(dur) AS bigint) AS double) AS twap
         FROM iv GROUP BY user_id HAVING sum(dur) > 0""",
    // file-sink round-trip: commit-log read-back == the batch table
    "q138_stream_file_sink" ->
      "SELECT event_id, ts, user_id, event_type, value FROM events",
    // stream-static enrichment: appended rows == the batch dim join
    "q137_stream_enrich" ->
      """SELECT event_id, user_id, c_mktsegment, c_nationkey, value
         FROM events JOIN customer ON user_id = c_custkey""",
    // replay == batch gap-rule sessions, MICRO-exact gap comparison (not
    // q87's floored-second convention); session_end = last event + gap
    "q134_stream_session_agg" ->
      """WITH t AS (SELECT event_id, user_id, ts, value,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           FROM events),
         s AS (SELECT user_id, ts, value,
           sum(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 minutes
                    THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
           FROM t)
         SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 30 minutes AS session_end,
           count(*) AS n_events,
           cast(sum(cast(value AS decimal(18,2))) AS double) AS sum_value
         FROM s GROUP BY user_id, seq""",
    // radius join: brute-force haversine oracle (engine side must find the
    // SAME pairs through grid candidates incl. antimeridian wrap); mirrored
    // trig tree, 6-dp rounding before the threshold
    "q140_radius_join" ->
      """WITH pts AS (SELECT c_custkey,
             cast(c_custkey * 7 % 360 - 180 AS double) AS lon,
             cast(c_custkey * 13 % 180 - 90 AS double) AS lat
           FROM customer),
         qs AS (SELECT s_suppkey,
             cast(s_suppkey * 11 % 360 - 180 AS double) AS qlon,
             cast(s_suppkey * 23 % 180 - 90 AS double) AS qlat
           FROM supplier),
         d AS (SELECT s_suppkey, c_custkey,
             round(cast(2 AS double) * cast(6371.0088 AS double) * asin(sqrt(
               sin((radians(qlat) - radians(lat)) / 2) * sin((radians(qlat) - radians(lat)) / 2) +
               cos(radians(lat)) * cos(radians(qlat)) *
               sin((radians(qlon) - radians(lon)) / 2) * sin((radians(qlon) - radians(lon)) / 2))), 6) AS dist_km
           FROM qs CROSS JOIN pts)
         SELECT s_suppkey, c_custkey, dist_km FROM d WHERE dist_km <= 500""",
    // edit-distance near-dup: the oracle verifies SEMANTICS with a plain
    // inequality self-join; banding is the engine-side scale path
    "q133_edit_distance_pairs" ->
      """SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.lang,
           cast(levenshtein(a.text, b.text) AS int) AS lev
         FROM documents a JOIN documents b
           ON a.lang = b.lang AND a.doc_id < b.doc_id
          AND abs(length(a.text) - length(b.text)) <= 15
         WHERE levenshtein(a.text, b.text) <= 15""",
    // KL: per-term 6-dp-rounded signed contributions summed as exact
    // decimals; marginals derived from the (source, term) table
    "q127_source_kl" ->
      """WITH tok AS (SELECT source,
           unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
           FROM documents),
         cst AS (SELECT source, term, count(*) AS c_st FROM tok GROUP BY 1, 2),
         ns AS (SELECT source, cast(sum(c_st) AS bigint) AS n_s FROM cst GROUP BY 1),
         ct AS (SELECT term, cast(sum(c_st) AS bigint) AS c_t FROM cst GROUP BY 1),
         n AS (SELECT cast(sum(c_t) AS bigint) AS n_tot FROM ct)
         SELECT source, max(n_s) AS n_tokens,
           cast(sum(cast(round((cast(c_st AS double) / cast(n_s AS double)) *
             ln((cast(c_st AS double) * cast(n_tot AS double)) /
                (cast(n_s AS double) * cast(c_t AS double))), 6)
             AS decimal(18,6))) AS double) AS kl
         FROM cst JOIN ns USING (source) JOIN ct USING (term) CROSS JOIN n
         GROUP BY source""",
    // chi2: expected r*c/n and (o-e)^2/e mirrored double trees; totals via
    // window sums over the bounded cell table
    "q128_chi2_lang_source" ->
      """WITH cells AS (SELECT lang, source, count(*) AS observed
           FROM documents GROUP BY 1, 2),
         t AS (SELECT lang, source, observed,
           cast(sum(observed) OVER (PARTITION BY lang) AS double) *
           cast(sum(observed) OVER (PARTITION BY source) AS double) /
           cast(sum(observed) OVER () AS double) AS e
           FROM cells)
         SELECT lang, source, observed, round(e, 6) AS expected,
           round((cast(observed AS double) - e) * (cast(observed AS double) - e) / e,
             6) AS chi2_contrib
         FROM t""",
    // z-scores from exact integer moments (never stddev_samp — accumulation
    // order is engine-specific); observed-day baseline, nd >= 2, var > 0
    "q129_rate_anomalies" ->
      """WITH daily AS (SELECT user_id, cast(date_trunc('day', ts) AS date) AS day,
           count(*) AS n_events FROM events GROUP BY 1, 2),
         stats AS (SELECT user_id, count(*) AS nd,
           cast(sum(n_events) AS bigint) AS s,
           cast(sum(n_events * n_events) AS bigint) AS ss
           FROM daily GROUP BY 1 HAVING count(*) >= 2),
         j AS (SELECT d.user_id, d.day, d.n_events,
           cast(s AS double) / cast(nd AS double) AS mean,
           (cast(ss AS double) - cast(s AS double) * cast(s AS double) /
             cast(nd AS double)) / (cast(nd AS double) - 1) AS var
           FROM daily d JOIN stats USING (user_id))
         SELECT user_id, day, n_events,
           round((cast(n_events AS double) - mean) / sqrt(var), 6) AS z
         FROM j WHERE var > 0
           AND abs((cast(n_events AS double) - mean) / sqrt(var)) >= 2""",
    // OLS trend from exact moments: x = whole seconds since the key's first
    // event (div — exact), Σx² via decimal-widened squares, one final
    // closed-form double evaluation; det-0 (co-timestamped) keys excluded
    "q141_trend_slope" ->
      """WITH t0 AS (SELECT user_id, min(ts) AS t0 FROM events GROUP BY 1),
         xy AS (SELECT e.user_id,
             (epoch_us(e.ts) - epoch_us(t0)) // 1000000 AS x,
             cast(e.value AS decimal(18,2)) AS y
           FROM events e JOIN t0 USING (user_id)),
         m AS (SELECT user_id, count(*) AS n,
             cast(sum(x) AS bigint) AS sx,
             sum(cast(x AS decimal(20,0)) * x) AS sxx,
             sum(y) AS sy,
             sum(y * x) AS sxy
           FROM xy GROUP BY 1),
         d AS (SELECT user_id, n,
             cast(n AS double) * cast(sxx AS double) -
               cast(sx AS double) * cast(sx AS double) AS det,
             cast(n AS double) * cast(sxy AS double) -
               cast(sx AS double) * cast(sy AS double) AS num,
             cast(sx AS double) AS sxd, cast(sy AS double) AS syd
           FROM m)
         SELECT user_id, n, round(num / det, 6) + 0.0 AS slope,
           round((syd - (num / det) * sxd) / cast(n AS double), 6) + 0.0
             AS intercept
         FROM d WHERE det > 0""",
    // Markov transition matrix: lead-window successor pairs; the |types|^2
    // cell table row-normalizes via a bounded window
    "q142_markov_transitions" ->
      """WITH t AS (SELECT event_type,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
           FROM events),
         c AS (SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
           FROM t WHERE next_type IS NOT NULL GROUP BY 1, 2)
         SELECT from_type, to_type, n,
           round(cast(n AS double) /
             cast(sum(n) OVER (PARTITION BY from_type) AS double), 6) AS p
         FROM c""",
    // deterministic mode: explicit (count desc, value) tie-break — built-in
    // mode() is tie-ambiguous under an exact-hash contract
    "q143_mode_per_group" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS n
           FROM events GROUP BY 1, 2),
         r AS (SELECT user_id, event_type, n,
           row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rk
           FROM c)
         SELECT user_id, event_type AS mode_value, n FROM r WHERE rk = 1""",
    // DAU + cumulative uniques via first-seen-day running sum (never a
    // running distinct over the stream)
    "q144_active_users" ->
      """WITH daily AS (SELECT cast(date_trunc('day', ts) AS date) AS day,
           count(DISTINCT user_id) AS dau FROM events GROUP BY 1),
         fs AS (SELECT user_id, min(cast(date_trunc('day', ts) AS date)) AS day
           FROM events GROUP BY 1),
         nw AS (SELECT day, count(*) AS nnew FROM fs GROUP BY 1)
         SELECT d.day, dau,
           cast(sum(coalesce(nnew, 0))
             OVER (ORDER BY d.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS bigint) AS cumulative_users
         FROM daily d LEFT JOIN nw USING (day)""",
    // MAD: integer daily counts make the interpolated median/MAD exact in
    // both engines; threshold on the unrounded modified z, output rounded
    "q139_mad_outliers" ->
      """WITH daily AS (SELECT user_id, cast(date_trunc('day', ts) AS date) AS day,
           count(*) AS n_events FROM events GROUP BY 1, 2),
         med AS (SELECT user_id, quantile_cont(n_events, 0.5) AS med
           FROM daily GROUP BY 1),
         dev AS (SELECT d.user_id, day, n_events, med,
           abs(cast(n_events AS double) - med) AS adev
           FROM daily d JOIN med USING (user_id)),
         mad AS (SELECT user_id, quantile_cont(adev, 0.5) AS mad
           FROM dev GROUP BY 1)
         SELECT v.user_id, v.day, v.n_events,
           round((cast(0.6745 AS double) * (cast(n_events AS double) - med)) / mad,
             6) AS rz
         FROM dev v JOIN mad USING (user_id)
         WHERE mad > 0
           AND abs((cast(0.6745 AS double) * (cast(n_events AS double) - med)) / mad)
             > cast(3.5 AS double)""",
    // oracle uses the REAL percent_rank so the distribution-table rewrite is
    // checked against the textbook window semantics, ties included
    "q130_percent_rank_norm" ->
      """SELECT doc_id, lang, n_chars,
           round(percent_rank() OVER (PARTITION BY lang ORDER BY n_chars), 6) AS pr
         FROM documents""",
    // SCD2: lag over the full stream finds value-run starts; lead over run
    // starts closes each interval; floor-second epochs in the output
    "q124_scd2_history" ->
      """WITH o AS (SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
         runs AS (SELECT user_id, event_type, ts, event_id FROM o
           WHERE prev IS NULL OR prev IS DISTINCT FROM event_type),
         v AS (SELECT user_id, event_type,
             cast(floor(epoch(ts)) AS bigint) AS valid_from_s,
             cast(floor(epoch(lead(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id))) AS bigint) AS valid_to_s
           FROM runs)
         SELECT user_id, event_type, valid_from_s, valid_to_s,
           valid_to_s IS NULL AS is_current
         FROM v""",
    // histogram: shared global [min, max] edges, integer bucket arithmetic,
    // top value clamped into the last bucket
    "q125_histogram_profile" ->
      """WITH mm AS (SELECT min(n_chars) AS mn, max(n_chars) AS mx FROM documents)
         SELECT source,
           cast(CASE WHEN mx = mn THEN 0
             ELSE least(((n_chars - mn) * 10) // (mx - mn), 9) END AS bigint) AS bucket,
           count(*) AS n,
           cast(min(n_chars) AS bigint) AS bucket_min,
           cast(max(n_chars) AS bigint) AS bucket_max
         FROM documents, mm GROUP BY 1, 2""",
    // funnel: chained per-stage min(ts) constrained strictly after the
    // previous stage — order-sensitive conversion counts
    "q122_funnel" ->
      """WITH s1 AS (SELECT user_id AS u, min(ts) AS t0 FROM events
             WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT e.user_id AS u, min(e.ts) AS t1 FROM events e
             JOIN s1 ON e.user_id = s1.u
             WHERE e.event_type = 'click' AND e.ts > s1.t0 GROUP BY 1),
         s3 AS (SELECT e.user_id AS u, min(e.ts) AS t2 FROM events e
             JOIN s2 ON e.user_id = s2.u
             WHERE e.event_type = 'purchase' AND e.ts > s2.t1 GROUP BY 1)
         SELECT 1 AS depth, 'view' AS stage, (SELECT count(*) FROM s1) AS n_users
         UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
         UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)""",
    // cohort retention: integer epoch-week buckets (floor-second epochs as
    // q87, then floor week division) — calendar-free, engine-exact
    "q123_cohort_retention" ->
      """WITH w AS (SELECT user_id AS u,
             cast(floor(cast(floor(epoch(ts)) AS bigint) / 604800) AS bigint) AS wk
           FROM events),
         c AS (SELECT u, min(wk) AS cohort_week FROM w GROUP BY 1)
         SELECT c.cohort_week, w.wk - c.cohort_week AS week_offset,
           count(DISTINCT w.u) AS n_users
         FROM w JOIN c ON w.u = c.u GROUP BY 1, 2""",
    // hybrid RRF: the q96 BM25 CTEs and the q39 cosine CTEs produce the two
    // rank lists; fusion terms rounded to 6 dp and summed as exact decimal
    // (the float-sum rule), fused ties broken by doc id
    "q121_hybrid_rrf" ->
      """WITH q(query_id, query_text) AS (VALUES
             (1, 'spark window join'), (2, 'hash table scan merge'),
             (3, 'vector stream filter customer')),
         tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tok WHERE term <> '' GROUP BY 1, 2),
         dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
         dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         st AS (SELECT (SELECT cast(count(*) AS double) FROM documents) AS n_docs,
                       (SELECT cast(sum(dl) AS double) / count(*) FROM dl) AS avgdl),
         qt AS (SELECT DISTINCT query_id, term FROM (
                  SELECT cast(query_id AS bigint) AS query_id,
                         unnest(string_split(query_text, ' ')) AS term FROM q) x
                WHERE term <> ''),
         sc AS (SELECT qt.query_id, tf.doc_id,
                  cast(round(ln((st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
                    * (tf.tf * 2.2)
                    / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)), 6)
                    AS decimal(38,6)) AS s
                FROM qt JOIN dfq USING (term) JOIN tf USING (term)
                  JOIN dl ON tf.doc_id = dl.doc_id, st),
         agg AS (SELECT query_id, doc_id, cast(sum(s) AS double) AS score
                 FROM sc GROUP BY 1, 2),
         lex AS (SELECT query_id, doc_id, rank FROM (
                   SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY score DESC, doc_id) AS rank FROM agg) r
                 WHERE rank <= 10),
         e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         vq AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN (1, 2, 3)),
         vs AS (SELECT qid AS query_id, e.vec_id AS neighbor_id,
                  list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * v[i]))
                  / (sqrt(list_sum(list_transform(qv, x -> x*x)))
                     * sqrt(list_sum(list_transform(v, x -> x*x)))) AS sim0
                FROM e CROSS JOIN vq WHERE e.vec_id != qid),
         sem AS (SELECT query_id, neighbor_id AS doc_id, rank FROM (
                   SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY sim0 DESC, neighbor_id) AS rank FROM vs) r
                 WHERE rank <= 10),
         u AS (SELECT * FROM lex UNION ALL SELECT * FROM sem),
         t AS (SELECT query_id, doc_id,
                 cast(round(cast(1.0 AS double) / (cast(60.0 AS double) + cast(rank AS double)), 6)
                   AS decimal(18,6)) AS tm
               FROM u),
         g AS (SELECT query_id, doc_id, sum(tm) AS rrf0, count(*) AS n_lists
               FROM t GROUP BY 1, 2)
         SELECT query_id, doc_id, cast(rrf0 AS double) AS rrf, n_lists, fused_rank
         FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY rrf0 DESC, doc_id) AS fused_rank FROM g) f
         WHERE fused_rank <= 10""",
    // triangle counts: same canonicalization, degree orientation ((d, id)
    // lexicographic), ordered wedge self-join, closure equi-join — each
    // triangle found once, every node credited three times
    "q120_triangle_counts" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
           FROM lineitem WHERE l_orderkey % 10 = 0),
         und AS (SELECT DISTINCT x.sk AS a, y.sk AS b
           FROM li x JOIN li y ON x.ok = y.ok AND x.sk < y.sk),
         deg AS (SELECT v, count(*) AS d FROM (
             SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und) z GROUP BY 1),
         o AS (SELECT
             CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b) THEN u.a ELSE u.b END AS src,
             CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b) THEN u.b ELSE u.a END AS dst,
             CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b) THEN db.d ELSE da.d END AS dd
           FROM und u JOIN deg da ON u.a = da.v JOIN deg db ON u.b = db.v),
         w AS (SELECT e1.src AS u, e1.dst AS v, e2.dst AS w2
           FROM o e1 JOIN o e2 ON e1.src = e2.src
            AND (e1.dd < e2.dd OR (e1.dd = e2.dd AND e1.dst < e2.dst))),
         tr AS (SELECT w.u, w.v, w.w2 FROM w JOIN o e3 ON w.v = e3.src AND w.w2 = e3.dst),
         n AS (SELECT unnest([u, v, w2]) AS node FROM tr),
         t AS (SELECT node, count(*) AS triangles FROM n GROUP BY 1)
         SELECT deg.v AS node, deg.d AS degree,
           cast(coalesce(t.triangles, 0) AS bigint) AS triangles
         FROM deg LEFT JOIN t ON deg.v = t.node""",
    // bigram LM: add-0.5-smoothed conditional surprisal, q88's determinism
    // contract (6-dp round, exact-decimal sum, division last); every float
    // literal cast to double so DuckDB's exact-decimal literal arithmetic
    // matches Spark's IEEE doubles
    "q119_bigram_surprisal" ->
      """WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
           FROM documents),
         nn AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) >= 2),
         bg AS (SELECT doc_id, toks[i] AS t1, toks[i + 1] AS t2
           FROM (SELECT doc_id, toks, unnest(range(1, n)) AS i FROM nn) x),
         c12 AS (SELECT t1, t2, count(*) AS c12 FROM bg GROUP BY 1, 2),
         c1 AS (SELECT t1, count(*) AS c1 FROM bg GROUP BY 1),
         v AS (SELECT count(DISTINCT t2) AS v FROM bg),
         s AS (SELECT bg.doc_id,
             cast(round(-ln((cast(c12.c12 AS double) + cast(0.5 AS double)) /
               (cast(c1.c1 AS double) + cast(0.5 AS double) * cast(v.v AS double))), 6)
               AS decimal(18,6)) AS s
           FROM bg JOIN c12 USING (t1, t2) JOIN c1 USING (t1) CROSS JOIN v)
         SELECT doc_id, cast(sum(s) AS double) / count(*) AS mean_surprisal,
           count(*) AS n_bigrams
         FROM s GROUP BY doc_id""",
    // upload validation: same byte construction (magic prefix || utf-8
    // text), size/allowlist verdicts recomputed from first principles
    "q117_upload_validation" ->
      """WITH f AS (SELECT doc_id,
             from_hex(CASE doc_id % 5
               WHEN 0 THEN 'FFD8FFE000104A46' WHEN 1 THEN '89504E470D0A1A0A'
               WHEN 2 THEN '49492A0000000000' WHEN 3 THEN '504B030414000000'
               ELSE '0011223344556677' END) || encode(text) AS content
           FROM documents)
         SELECT doc_id,
           octet_length(content) AS size,
           CASE doc_id % 5 WHEN 0 THEN 'image/jpeg' WHEN 1 THEN 'image/png'
             WHEN 2 THEN 'image/tiff' WHEN 3 THEN 'application/zip'
             ELSE 'application/octet-stream' END AS mime_type,
           octet_length(content) <= 300 AND octet_length(content) > 0 AS size_ok,
           doc_id % 5 IN (0, 1, 2, 3) AS mime_ok,
           (octet_length(content) <= 300 AND octet_length(content) > 0
             AND doc_id % 5 IN (0, 1, 2, 3)) AS valid
         FROM f""",
    // heavy hitters: the MG-guarantee fixture makes the two-pass sketch
    // output equal the plain exact top-n (string keys, count-desc/key-asc
    // tie-break on both sides)
    "q116_heavy_hitters" ->
      """WITH it AS (SELECT cast(1000 // (1 +
             (('0x' || substr(md5(cast(doc_id AS varchar)), 1, 8))::bigint % 1000))
             AS varchar) AS key
           FROM documents)
         SELECT key, count(*) AS cnt FROM it GROUP BY 1
         ORDER BY cnt DESC, key ASC LIMIT 4""",
    // flagship file listing: same derived files view, RLS + filters +
    // row_number pagination, response projection
    "q115_list_project_files" ->
      """WITH files AS (SELECT o_orderkey AS id,
             'f' || o_orderkey || '.tif' AS filename,
             'orig_' || o_orderkey || '.tif' AS original_filename,
             CASE o_orderkey % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'orthophoto'
               ELSE 'dsm' END AS file_type,
             o_orderkey * 37 % 100000 + 1 AS size,
             CASE o_orderkey % 3 WHEN 0 THEN 'image/tiff' WHEN 1 THEN 'image/png'
               ELSE 'application/octet-stream' END AS mime_type,
             md5(cast(o_orderkey AS varchar)) AS checksum,
             'p' || (o_orderkey % 4) AS project_id,
             'u' || (o_custkey % 50) AS owner_id,
             o_orderkey % 2 = 0 AS is_processed,
             o_orderdate AS created_at
           FROM orders),
         scoped AS (SELECT *, row_number() OVER (ORDER BY created_at ASC, id ASC) AS rn
           FROM files
           WHERE owner_id = 'u7' AND project_id = 'p1' AND file_type = 'orthophoto')
         SELECT id, filename, original_filename, file_type, size, mime_type,
           checksum, project_id, owner_id, is_processed, created_at
         FROM scoped WHERE rn > 0 AND rn <= 2""",
    // the streaming replays must land on exactly the W1 batch view (q12)
    "q71_stream_latest_status" ->
      """SELECT user_id, event_id, event_type, value FROM (
           SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) t WHERE rn = 1""",
    "q72_stream_session_state" ->
      """SELECT user_id, event_id, event_type, value FROM (
           SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) t WHERE rn = 1""",
    "q108_stream_interval_join" ->
      """SELECT a.event_id, b.event_id AS p_event_id
         FROM events a, events b
         WHERE a.event_type = 'click' AND b.event_type = 'purchase'
           AND a.user_id = b.user_id
           AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE""",
    // left-outer variant: unmatched clicks survive with a null purchase
    "q244_stream_left_interval_join" ->
      """WITH c AS (SELECT event_id, ts, user_id FROM events
           WHERE event_type = 'click'),
         p AS (SELECT event_id AS p_event_id, ts AS p_ts,
             user_id AS p_user_id FROM events
           WHERE event_type = 'purchase')
         SELECT c.event_id, p.p_event_id FROM c LEFT JOIN p
           ON c.user_id = p.p_user_id AND p.p_ts >= c.ts
             AND p.p_ts <= c.ts + INTERVAL 30 MINUTE""",
    // copy-on-write upsert = the two complements, stated directly
    "q73_upsert" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders WHERE o_orderkey % 10 <> 0
         UNION ALL
         SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus FROM orders WHERE o_orderkey % 10 = 0""",
    // sink round-trips must reproduce the source rows exactly
    "q74_json_log_roundtrip" ->
      "SELECT event_id, user_id, event_type, value FROM events WHERE event_id % 100 = 0",
    "q75_binary_roundtrip" ->
      """SELECT doc_id, sha256(text) AS sha, octet_length(encode(text)) AS nbytes
         FROM documents WHERE doc_id % 50 = 0""",
    // at-least-once delivery deduped back to the table itself
    "q76_stream_dedup" ->
      "SELECT event_id, user_id, event_type, value FROM events",
    // state-bounded dedup variant: same exactly-once contract
    "q248_stream_dedup_within_watermark" ->
      "SELECT event_id, user_id, event_type, value FROM events",
    // restart sink: exactly-once across kill+restart == the source table
    "q261_stream_restart_exactly_once" ->
      "SELECT event_id, ts, user_id, event_type, value FROM events",
    // rate limiter: earliest k per (user, day window) — the exact batch
    // statement of the streaming quota rule
    "q254_stream_rate_limit" ->
      """WITH r AS (SELECT event_id, user_id, event_type, value,
           row_number() OVER (
             PARTITION BY user_id, date_trunc('day', ts)
             ORDER BY ts, event_id) AS rn
           FROM events)
         SELECT event_id, user_id, event_type, value FROM r
         WHERE rn <= 2""",
    // bbox of the parsed GeoJSON ring == mins/maxes of the raw vertex arithmetic
    "q77_geojson_bbox" ->
      """WITH t AS (SELECT c_custkey,
           cast(c_custkey * 19 % 300 - 160 as double) AS ax,
           cast(c_custkey * 31 % 140 - 75 as double) AS ay
         FROM customer)
         SELECT c_custkey,
           least(ax, ax + 40, ax - 17) AS min_lon,
           least(ay, ay - 11, ay + 33) AS min_lat,
           greatest(ax, ax + 40, ax - 17) AS max_lon,
           greatest(ay, ay - 11, ay + 33) AS max_lat
         FROM t""",
    "q78_webodm_job_view" ->
      """WITH pt AS (SELECT o_orderkey AS id,
             CASE WHEN o_orderkey % 2 = 0 THEN 'orthophoto' ELSE 'dsm' END AS task_type,
             o_orderstatus AS status,
             cast(o_orderkey % 100 AS double) / 100 AS progress
           FROM orders),
         wt AS (SELECT o_orderkey AS processing_task_id,
             'wo-' || o_orderkey AS webodm_task_id,
             o_custkey % 50 AS webodm_project_id,
             CASE WHEN o_orderkey % 6 = 0 THEN 'RUNNING' ELSE 'QUEUED' END AS status,
             cast(o_orderkey % 10 AS double) / 10 AS progress
           FROM orders WHERE o_orderkey % 3 = 0)
         SELECT pt.id AS task_id, pt.task_type, pt.status AS status,
           pt.progress AS progress, wt.webodm_task_id, wt.webodm_project_id,
           wt.status AS webodm_status, wt.progress AS webodm_progress
         FROM pt LEFT JOIN wt ON wt.processing_task_id = pt.id""",
    // stratified sampling: the md5-bucket predicate restated per stratum
    "q79_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
         WHERE ('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::bigint % 10000 <
           CASE lang WHEN 'en' THEN 3000 WHEN 'fr' THEN 8000 ELSE 5000 END""",
    "q80_stratified_take" ->
      """SELECT doc_id, lang FROM (
           SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
             ORDER BY ('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::bigint % 10000, doc_id) AS rn
           FROM documents) t WHERE rn <= 12""",
    // tf-idf: identical tokenization (space split, empties dropped), df from
    // the (doc,term) rollup, ln-score rounded to 6dp BEFORE ranking on both
    // sides, term string as total tie-break
    "q81_tfidf_topk" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0),
         tok AS (SELECT doc_id, t AS term FROM (
             SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM d) x
           WHERE t <> ''),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(*) AS n_docs FROM d),
         scored AS (SELECT tf.doc_id, tf.term, tf.tf,
             round(tf.tf * ln(cast(n.n_docs AS double) / dfreq.df), 6) AS tfidf
           FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n)
         SELECT doc_id, term, tf, tfidf FROM (
           SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
           FROM scored) t WHERE rn <= 5""",
    // token chunking: starts 0, 40, 80 … while start+overlap < n (Spark
    // sequence is bound-inclusive, DuckDB range is stop-exclusive → +1)
    "q82_token_chunks" ->
      """WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
           FROM documents WHERE doc_id % 20 = 0),
         nn AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
         st AS (SELECT doc_id, toks, n,
             unnest(range(0, greatest(n - 10 - 1, 0) + 1, 40)) AS start
           FROM nn)
         SELECT doc_id, cast(start / 40 AS int) AS chunk_id,
           array_to_string(toks[start + 1 : least(start + 50, n)], ' ') AS chunk_text,
           cast(least(n - start, 50) AS bigint) AS n_chunk_tokens
         FROM st""",
    // incremental dedup: exact-fingerprint anti-join, then the q37 signature
    // machinery built separately over batch and corpus, band-joined ACROSS
    // the two tables, full-set Jaccard verify on candidates, batch anti-join
    "q83_dedup_against_corpus" ->
      """WITH corpus AS (SELECT doc_id, text, lang FROM documents WHERE doc_id % 3 <> 0),
         batch AS (SELECT doc_id, text, lang FROM documents WHERE doc_id % 3 = 0),
         cfp AS (SELECT DISTINCT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
                 FROM corpus),
         b1 AS (SELECT doc_id, text, lang FROM batch
                WHERE md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) NOT IN
                  (SELECT fp FROM cfp)),
         bt0 AS (SELECT doc_id, string_split(text,' ') AS w FROM b1),
         btoks AS (SELECT doc_id, list_distinct(list_transform(
                     generate_series(1, len(w)-2), i -> array_to_string(w[i:i+2], ' '))) AS t
                   FROM bt0 WHERE len(w) >= 3),
         bhs AS (SELECT doc_id, list_transform(t,
                   tok -> ('0x' || substr(md5(tok), 1, 15))::bigint % 1000000007) AS h
                 FROM btoks),
         bsig AS (SELECT doc_id, list_transform(generate_series(0, 31),
                    i -> list_min(list_transform(h, x -> (x*(i*2+3) + (i*5+7)) % 1000000007))) AS s
                  FROM bhs),
         bbands AS (SELECT doc_id, b AS band_id,
                      md5(array_to_string(s[b*4+1 : b*4+4], ',')) AS band_hash
                    FROM bsig, unnest(generate_series(0, 7)) AS u(b)),
         ct0 AS (SELECT doc_id, string_split(text,' ') AS w FROM corpus),
         ctoks AS (SELECT doc_id, list_distinct(list_transform(
                     generate_series(1, len(w)-2), i -> array_to_string(w[i:i+2], ' '))) AS t
                   FROM ct0 WHERE len(w) >= 3),
         chs AS (SELECT doc_id, list_transform(t,
                   tok -> ('0x' || substr(md5(tok), 1, 15))::bigint % 1000000007) AS h
                 FROM ctoks),
         csig AS (SELECT doc_id, list_transform(generate_series(0, 31),
                    i -> list_min(list_transform(h, x -> (x*(i*2+3) + (i*5+7)) % 1000000007))) AS s
                  FROM chs),
         cbands AS (SELECT doc_id, b AS band_id,
                      md5(array_to_string(s[b*4+1 : b*4+4], ',')) AS band_hash
                    FROM csig, unnest(generate_series(0, 7)) AS u(b)),
         cand AS (SELECT DISTINCT a.doc_id AS batch_id, b.doc_id AS corpus_id
                  FROM bbands a JOIN cbands b
                    ON a.band_id = b.band_id AND a.band_hash = b.band_hash),
         nearDrop AS (SELECT DISTINCT c.batch_id FROM cand c
           JOIN btoks ba ON ba.doc_id = c.batch_id
           JOIN ctoks cb ON cb.doc_id = c.corpus_id
           WHERE cast(len(list_intersect(ba.t, cb.t)) AS double) /
                 (len(ba.t) + len(cb.t) - len(list_intersect(ba.t, cb.t))) >= 0.5)
         SELECT doc_id, lang FROM b1
         WHERE doc_id NOT IN (SELECT batch_id FROM nearDrop)""",
    // exact percentile band: Spark percentile == DuckDB quantile_cont
    // (identical linear interpolation, bit-for-bit)
    "q84_length_filter" ->
      """WITH t AS (SELECT doc_id,
           cast(len(list_filter(string_split(text, ' '), x -> x <> '')) AS bigint) AS n_tokens
         FROM documents),
         b AS (SELECT quantile_cont(n_tokens, 0.05) AS lo, quantile_cont(n_tokens, 0.95) AS hi
               FROM t)
         SELECT doc_id, n_tokens FROM t, b
         WHERE n_tokens >= lo AND n_tokens <= hi""",
    // per-source exact-decimal mean, filter, semi-join back
    "q85_source_filter" ->
      """WITH m AS (SELECT source,
           cast(sum(cast(n_chars AS decimal(18,2))) AS double) / count(*) AS mean_chars
         FROM documents GROUP BY source)
         SELECT d.doc_id, d.source FROM documents d
         JOIN m ON d.source = m.source
         WHERE m.mean_chars >= 300.0""",
    // the pipeline, stage for stage: q84 band -> q56 scrub -> q27-style
    // min-id dedup on the scrubbed fingerprint -> q59 shingle anti-join ->
    // q54 bucket CASE over 0.9/0.05/0.05
    "q86_pretrain_pipeline" ->
      """WITH t AS (SELECT doc_id, text,
           cast(len(list_filter(string_split(text, ' '), x -> x <> '')) AS bigint) AS n_tokens
         FROM documents),
         b AS (SELECT quantile_cont(n_tokens, 0.05) AS lo, quantile_cont(n_tokens, 0.95) AS hi
               FROM t),
         lengthed AS (SELECT doc_id, text, n_tokens FROM t, b
                      WHERE n_tokens >= lo AND n_tokens <= hi),
         scrub AS (SELECT doc_id, n_tokens,
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, 'https?://[^ ]+', '<URL>', 'g'),
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean_text
           FROM lengthed),
         keep AS (SELECT min(doc_id) AS doc_id FROM scrub
                  GROUP BY md5(regexp_replace(trim(lower(clean_text)), '\s+', ' ', 'g'))),
         dedup AS (SELECT s.doc_id, s.n_tokens, s.clean_text FROM scrub s
                   JOIN keep k ON s.doc_id = k.doc_id),
         bw AS (SELECT string_split(text, ' ') AS w FROM documents WHERE doc_id % 97 = 0),
         bsh AS (SELECT DISTINCT unnest(list_distinct(list_transform(
                   generate_series(1, len(w)-2), i -> array_to_string(w[i:i+2], ' ')))) AS s
                 FROM bw WHERE len(w) >= 3),
         dw AS (SELECT doc_id, string_split(clean_text, ' ') AS w FROM dedup),
         dsh AS (SELECT doc_id, unnest(list_distinct(list_transform(
                   generate_series(1, len(w)-2), i -> array_to_string(w[i:i+2], ' ')))) AS s
                 FROM dw WHERE len(w) >= 3),
         contaminated AS (SELECT DISTINCT doc_id FROM dsh
                          WHERE s IN (SELECT s FROM bsh)),
         decon AS (SELECT * FROM dedup
                   WHERE doc_id NOT IN (SELECT doc_id FROM contaminated))
         SELECT doc_id, n_tokens, md5(clean_text) AS clean_md5,
           CASE WHEN hb < 9000 THEN 'train'
                WHEN hb < 9500 THEN 'val'
                ELSE 'test' END AS split
         FROM (SELECT doc_id, n_tokens, clean_text,
                 ('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::bigint % 10000 AS hb
               FROM decon) z""",
    // surprisal: per-token -ln(p) rounded to 6dp then summed EXACTLY in
    // decimal (double sums are reduction-order-dependent), one division
    "q88_unigram_surprisal" ->
      """WITH tok AS (SELECT doc_id, t AS term FROM (
             SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents) x
           WHERE t <> ''),
         c AS (SELECT term, count(*) AS c FROM tok GROUP BY 1),
         tot AS (SELECT sum(c) AS n_total FROM c),
         s AS (SELECT tok.doc_id,
             cast(round(-ln(cast(c.c AS double) / tot.n_total), 6) AS decimal(18,6)) AS s
           FROM tok JOIN c ON tok.term = c.term CROSS JOIN tot)
         SELECT doc_id, cast(sum(s) AS double) / count(*) AS mean_surprisal,
           count(*) AS n_tokens
         FROM s GROUP BY doc_id""",
    // dup spans: the q82 chunking CTE at overlap 0, span-frequency join,
    // per-doc counts (sum(int) is HUGEINT in DuckDB -> cast to bigint)
    "q89_dup_spans" ->
      """WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
           FROM documents),
         nn AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
         st AS (SELECT doc_id, toks, n,
             unnest(range(0, greatest(n - 1, 0) + 1, 10)) AS start FROM nn),
         ch AS (SELECT doc_id,
             array_to_string(toks[start + 1 : least(start + 10, n)], ' ') AS chunk_text
           FROM st),
         freq AS (SELECT chunk_text, count(*) AS occ FROM ch GROUP BY 1)
         SELECT doc_id, count(*) AS n_spans,
           cast(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS bigint) AS n_dup_spans,
           cast(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS double) / count(*) AS dup_ratio
         FROM ch JOIN freq USING (chunk_text) GROUP BY doc_id""",
    // drop dup spans: canonical occurrence = min (doc_id, chunk_id) per span
    // text; rebuild via ORDER BY chunk_id (string_agg skips the NULLs the
    // CASE leaves for dropped spans)
    "q90_drop_dup_spans" ->
      """WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
           FROM documents),
         nn AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
         st AS (SELECT doc_id, toks, n,
             unnest(range(0, greatest(n - 1, 0) + 1, 10)) AS start FROM nn),
         ch AS (SELECT doc_id, cast(start / 10 AS int) AS chunk_id,
             array_to_string(toks[start + 1 : least(start + 10, n)], ' ') AS chunk_text
           FROM st),
         rn AS (SELECT doc_id, chunk_id, chunk_text,
             row_number() OVER (PARTITION BY chunk_text ORDER BY doc_id, chunk_id) AS rn
           FROM ch)
         SELECT doc_id, count(*) AS n_spans,
           cast(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS bigint) AS n_kept,
           md5(string_agg(CASE WHEN rn = 1 THEN chunk_text END, ' ' ORDER BY chunk_id))
             AS dedup_md5
         FROM rn GROUP BY doc_id
         HAVING sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) > 0""",
    // pack: ONE global window here is fine for the oracle (DuckDB is
    // single-node); the engine's two-level prefix sum must equal it exactly.
    // '//' = integer division (DuckDB '/' is float)
    "q91_pack_sequences" ->
      """WITH d AS (SELECT doc_id,
             cast(len(list_filter(string_split(text, ' '), t -> t <> '')) AS bigint)
               AS n_tokens,
             md5(cast(doc_id AS varchar)) AS k
           FROM documents),
         nz AS (SELECT * FROM d WHERE n_tokens > 0),
         o AS (SELECT doc_id, n_tokens,
             cast(coalesce(sum(n_tokens) OVER (ORDER BY k, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bigint)
               AS tok_offset
           FROM nz)
         SELECT doc_id, n_tokens, tok_offset,
           tok_offset // 512 AS seq_first,
           (tok_offset + n_tokens - 1) // 512 AS seq_last
         FROM o""",
    // token budget: keep while the EXCLUSIVE stratum prefix sum (hash
    // order) is under budget — greedy cap, at most one doc of overshoot
    "q92_token_budget" ->
      """WITH d AS (SELECT doc_id, source,
             cast(len(list_filter(string_split(text, ' '), t -> t <> '')) AS bigint)
               AS n_tokens,
             ('0x' || substr(md5(cast(doc_id AS varchar)), 1, 8))::bigint % 10000 AS hb
           FROM documents),
         o AS (SELECT doc_id, source, n_tokens,
             cast(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY hb, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bigint)
               AS bef
           FROM d)
         SELECT doc_id, source, n_tokens FROM o WHERE bef < 700""",
    // epoch mix: floor(epochs) full copies + one key-stable fractional copy;
    // generate_series(0, -1) is empty so copies=0 rows vanish as in Spark
    "q93_epoch_mix" ->
      """WITH d AS (SELECT doc_id, source,
             ('0x' || substr(md5(cast(doc_id AS varchar)), 1, 8))::bigint % 10000 AS hb,
             CASE WHEN source = 'src0' THEN 2.5
                  WHEN source = 'src1' THEN 0.5 ELSE 1.0 END AS ep
           FROM documents),
         c AS (SELECT doc_id, source,
             cast(floor(ep) AS bigint) +
               (CASE WHEN hb < round((ep - floor(ep)) * 10000) THEN 1 ELSE 0 END)
               AS copies
           FROM d)
         SELECT doc_id, source, unnest(generate_series(0, copies - 1)) AS epoch
         FROM c WHERE copies > 0""",
    // int8 quantization: per-dim min/max over exact float->double widening,
    // same affine arithmetic, round-half-up on nonnegative args
    "q94_quantize_int8" ->
      """WITH x AS (SELECT vec_id, generate_subscripts(embedding, 1) AS d,
             cast(unnest(embedding) AS double) AS v
           FROM embeddings),
         st AS (SELECT d, min(v) AS mn, max(v) AS mx FROM x GROUP BY 1),
         q AS (SELECT vec_id, d,
             CASE WHEN mx = mn THEN 0
                  ELSE cast(round((v - mn) * 255.0 / (mx - mn)) AS int) END AS code
           FROM x JOIN st USING (d)),
         c AS (SELECT vec_id, list(code ORDER BY d) AS codes FROM q GROUP BY 1)
         SELECT vec_id, md5(array_to_string(codes, ',')) AS codes_md5,
           codes[1] AS code_first, codes[-1] AS code_last
         FROM c""",
    // inverted index: distinct terms per doc, doc-range shards, postings
    // sorted within shard
    "q95_inverted_index" ->
      """WITH t AS (SELECT DISTINCT doc_id, term FROM (
             SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents) x
           WHERE term <> '')
         SELECT term, doc_id // 200 AS shard, count(*) AS df,
           md5(string_agg(doc_id, ',' ORDER BY doc_id)) AS postings_md5
         FROM t GROUP BY 1, 2""",
    // PQ ANN: data-sampled sub-codebooks (ksub md5-chosen corpus rows
    // supply every subspace's centroids), argmin encoding via the max of
    // (dot - ||w||^2/2), reconstruction + ADC identity qq - 2<q,xhat> + xx,
    // exact-cosine rerank
    "q106_pq_knn" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         seeds AS (SELECT v, row_number() OVER (ORDER BY
                     ('0x' || substr(md5(cast(vec_id AS varchar)), 1, 8))::bigint,
                     vec_id) - 1 AS c
                   FROM e),
         cent AS (SELECT s, c, v[s*8+1 : s*8+8] AS w
                  FROM seeds, generate_series(0, 7) gs(s) WHERE c < 16),
         sc AS (SELECT e.vec_id, cent.s, cent.c,
                  list_sum(list_transform(generate_series(1, 8), i -> v[cent.s*8 + i] * w[i]))
                    - list_sum(list_transform(w, x -> x*x)) / 2.0 AS score
                FROM e, cent),
         enc AS (SELECT vec_id, s, c FROM (
                   SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s
                     ORDER BY score DESC, c) AS rn FROM sc) t
                 WHERE rn = 1),
         xh AS (SELECT enc.vec_id, flatten(list(w ORDER BY enc.s)) AS xhat
                FROM enc JOIN cent ON enc.s = cent.s AND enc.c = cent.c
                GROUP BY enc.vec_id),
         base AS (SELECT e.vec_id, xhat,
                    list_sum(list_transform(generate_series(1, 64), i -> xhat[i] * xhat[i])) AS xx
                  FROM e JOIN xh ON e.vec_id = xh.vec_id),
         q AS (SELECT vec_id AS qid, v AS qv,
                 list_sum(list_transform(generate_series(1, 64), i -> v[i] * v[i])) AS qq
               FROM e WHERE vec_id < 10),
         adc AS (SELECT qid AS query_id, b.vec_id AS neighbor_id,
                   qq - 2 * list_sum(list_transform(generate_series(1, 64), i -> qv[i] * xhat[i])) + xx AS d
                 FROM base b CROSS JOIN q WHERE b.vec_id != qid),
         cand AS (SELECT query_id, neighbor_id FROM (
                    SELECT query_id, neighbor_id,
                      row_number() OVER (PARTITION BY query_id ORDER BY d ASC, neighbor_id) AS cr
                    FROM adc) t WHERE cr <= 20),
         qv2 AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
         r AS (SELECT cand.query_id, cand.neighbor_id,
                 list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * v[i]))
                 / (sqrt(list_sum(list_transform(qv, z -> z*z)))
                    * sqrt(list_sum(list_transform(v, z -> z*z)))) AS sim0
               FROM cand JOIN e ON cand.neighbor_id = e.vec_id
                 JOIN qv2 ON cand.query_id = qv2.query_id),
         rr AS (SELECT query_id, neighbor_id, sim0,
                  row_number() OVER (PARTITION BY query_id ORDER BY sim0 DESC, neighbor_id) AS rank
                FROM r)
         SELECT query_id, neighbor_id, cast(rank AS int) AS rank, round(sim0, 6) AS sim
         FROM rr WHERE rank <= 5""",
    // range join: the oracle is the plain inequality join (the bucketized
    // equi-join is internal to the operator and result-identical)
    "q105_range_join" ->
      """WITH a AS (SELECT cast(floor(min(cast(floor(epoch(ts)) AS bigint)) / 86400) AS bigint) AS d
                    FROM events),
         iv AS (SELECT i AS interval_id, d*86400 + i*7200 AS start_s,
                       d*86400 + i*7200 + 3600 AS end_s
                FROM generate_series(0, 99) g(i), a),
         j AS (SELECT iv.interval_id, e.user_id
               FROM events e JOIN iv
                 ON cast(floor(epoch(e.ts)) AS bigint) >= iv.start_s
                AND cast(floor(epoch(e.ts)) AS bigint) < iv.end_s)
         SELECT interval_id, count(*) AS n, count(DISTINCT user_id) AS nu
         FROM j GROUP BY 1""",
    "q111_pagerank" -> PageRankOracleSql,
    // T4 retention: survivors = all originals + crafted late copies (ids
    // offset by 1e9) inside the horizon, with a 1-hour guard band so the
    // watermark boundary comparator can't flip a row across engines
    "q113_stream_retention" ->
      """WITH mx AS (SELECT max(ts) AS m FROM events)
         SELECT event_id, user_id, event_type, value FROM events
         UNION ALL
         SELECT event_id + 1000000000 AS event_id, user_id, event_type, value
         FROM events, mx
         WHERE ts >= m - INTERVAL 15 DAY + INTERVAL 1 HOUR""",
    // EXIF GPS: the fixture plants micro-degree rationals, so expected
    // lat/lon derive from the same integers; |x|/1e6 with an N/S|E/W sign
    // equals x/1e6 exactly in IEEE, and round-to-6dp cannot tie (the true
    // value has exactly 6 decimals)
    "q112_exif_gps" ->
      """SELECT c_custkey,
         round(cast(c_custkey * 1234567 % 180000000 - 90000000 AS double) / 1000000, 6) AS lat,
         round(cast(c_custkey * 7654321 % 360000000 - 180000000 AS double) / 1000000, 6) AS lon
         FROM customer""",
    // resample/ffill: per-key 6h grid between own min/max buckets; last
    // observed per bucket by (es, event_id); IGNORE NULLS carry-forward
    "q110_resample_ffill" ->
      """WITH e AS (SELECT user_id, cast(floor(epoch(ts)) AS bigint) AS es,
                      value, event_id FROM events),
         wb AS (SELECT user_id, es, value, event_id,
                  cast(floor(es / 21600) AS bigint) AS bkt FROM e),
         obs AS (SELECT user_id, bkt AS bucket, value AS v FROM (
                   SELECT user_id, bkt, value, row_number() OVER (
                     PARTITION BY user_id, bkt ORDER BY es DESC, event_id DESC) AS rn
                   FROM wb) t WHERE rn = 1),
         span AS (SELECT user_id, min(bkt) AS lo, max(bkt) AS hi FROM wb GROUP BY 1),
         grid AS (SELECT user_id, unnest(generate_series(lo, hi)) AS bucket FROM span),
         j AS (SELECT g.user_id, g.bucket, o.v FROM grid g
               LEFT JOIN obs o ON g.user_id = o.user_id AND g.bucket = o.bucket)
         SELECT user_id, bucket * 21600 AS bucket_start,
           last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill,
           v IS NOT NULL AS observed
         FROM j""",
    // rank stats: tied windows over floor(value/10); ntile adds the id
    // tiebreak (bucket boundaries need a total order)
    "q109_rank_stats" ->
      """SELECT event_id, user_id,
           cast(rank() OVER wt AS bigint) AS rnk,
           cast(dense_rank() OVER wt AS bigint) AS drnk,
           round(percent_rank() OVER wt, 6) AS prk,
           round(cume_dist() OVER wt, 6) AS cd,
           cast(ntile(4) OVER wo AS bigint) AS quartile
         FROM events
         WINDOW wt AS (PARTITION BY user_id ORDER BY floor(value / 10)),
                wo AS (PARTITION BY user_id ORDER BY floor(value / 10), event_id)""",
    // A-ES weighted sampling: priority ln(u)/w on a md5-midpoint uniform,
    // rounded to 6 dp before ranking (libm ln parity contract), id tiebreak
    "q107_weighted_sample" ->
      """SELECT doc_id, source, n_chars FROM (
           SELECT doc_id, source, n_chars,
             round(ln((('0x' || substr(md5(cast(doc_id AS varchar)), 1, 8))::bigint
                       % 1000000000 + 0.5) / 1000000000.0)
                   / cast(n_chars AS double), 6) AS pri
           FROM documents) t
         ORDER BY pri DESC, doc_id LIMIT 50""",
    // hash negatives: bucket + secondary-hash order from disjoint md5
    // windows; per-bucket top-k candidates join to the successor bucket
    "q103_hash_negatives" ->
      """WITH b AS (SELECT doc_id,
             ('0x' || substr(md5(cast(doc_id AS varchar)), 1, 8))::bigint % 64 AS bkt,
             ('0x' || substr(md5(cast(doc_id AS varchar)), 9, 8))::bigint AS h2
           FROM documents),
         cand AS (SELECT bkt AS src_bkt, doc_id AS neg_id, neg_rank FROM (
                    SELECT bkt, doc_id, row_number() OVER (PARTITION BY bkt
                      ORDER BY h2, doc_id) AS neg_rank FROM b) t
                  WHERE neg_rank <= 3)
         SELECT d.doc_id, c.neg_id, c.neg_rank
         FROM b d JOIN cand c ON c.src_bkt = (d.bkt + 1) % 64""",
    // keep-best dedup: q53's closure CTEs + component min-label, cluster =
    // component of the exact-group rep (identity for singletons/short
    // docs), keep argmax (n_chars desc, doc_id) per cluster
    "q100_dedup_keep_best" ->
      """WITH RECURSIVE elig AS (SELECT doc_id, text FROM documents
                                 WHERE len(string_split(text,' ')) >= 3),
         reps AS (SELECT min(doc_id) AS doc_id, text FROM elig GROUP BY text),
         t0 AS (SELECT doc_id, string_split(text,' ') AS w FROM reps),
         toks AS (SELECT doc_id, list_distinct(list_transform(
                    generate_series(1, len(w)-2), i -> array_to_string(w[i:i+2], ' '))) AS t
                  FROM t0),
         shl AS (SELECT doc_id, unnest(t) AS sng FROM toks),
         hot AS (SELECT sng FROM shl GROUP BY sng HAVING count(*) > 100),
         kept AS (SELECT doc_id, sng FROM shl WHERE sng NOT IN (SELECT sng FROM hot)),
         hs AS (SELECT doc_id, list(('0x' || substr(md5(sng), 1, 15))::bigint % 1000000007) AS h
                FROM kept GROUP BY doc_id),
         sig AS (SELECT doc_id, list_transform(generate_series(0, 31),
                   i -> list_min(list_transform(h, x -> (x*(i*2+3) + (i*5+7)) % 1000000007))) AS s
                 FROM hs),
         bands AS (SELECT doc_id, b AS band_id,
                     md5(array_to_string(s[b*4+1 : b*4+4], ',')) AS band_hash
                   FROM sig, unnest(generate_series(0, 7)) AS u(b)),
         cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                  FROM bands a
                  JOIN bands b ON a.band_id = b.band_id AND a.band_hash = b.band_hash
                              AND a.doc_id < b.doc_id),
         pairs AS (SELECT doc_a, doc_b FROM cand
                   JOIN toks sa ON sa.doc_id = doc_a
                   JOIN toks sb ON sb.doc_id = doc_b
                   WHERE cast(len(list_intersect(sa.t, sb.t)) as double)
                       / (len(sa.t) + len(sb.t) - len(list_intersect(sa.t, sb.t))) >= 0.5),
         edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                   UNION SELECT doc_b, doc_a FROM pairs),
         reach(a, b) AS (SELECT a, b FROM edges
                         UNION SELECT r.a, e.b FROM reach r
                               JOIN edges e ON r.b = e.a AND e.b <> r.a),
         comp AS (SELECT a AS id, least(a, min(b)) AS comp FROM reach GROUP BY a),
         clus AS (SELECT e.doc_id, coalesce(c.comp, r.doc_id) AS cluster
                  FROM elig e JOIN reps r ON e.text = r.text
                  LEFT JOIN comp c ON c.id = r.doc_id),
         allc AS (SELECT d.doc_id, coalesce(cl.cluster, d.doc_id) AS cluster, d.n_chars
                  FROM documents d LEFT JOIN clus cl ON d.doc_id = cl.doc_id)
         SELECT doc_id FROM (
           SELECT doc_id, row_number() OVER (PARTITION BY cluster
             ORDER BY n_chars DESC, doc_id) AS rn FROM allc) t
         WHERE rn = 1""",
    // pivot: fixed column list; FILTER'd counts are bigint on both sides
    "q101_pivot" ->
      """SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click') AS click,
           count(*) FILTER (WHERE event_type = 'error') AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS signup,
           count(*) FILTER (WHERE event_type = 'view') AS view
         FROM events GROUP BY user_id""",
    // rollup: NULL grouping-total rows match Spark's rollup; exact decimal
    // sum -> double
    "q102_rollup" ->
      """SELECT o_orderstatus, cast(year(o_orderdate) AS bigint) AS yr,
           count(*) AS n,
           cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS total
         FROM orders GROUP BY ROLLUP (o_orderstatus, yr)""",
    // score-band sampling: exact-quantile thresholds ROUNDED to 6 dp on both
    // sides (the two linear interpolations can differ by 1 ulp and a score
    // within that ulp of a cut would band differently), band = count of
    // thresholds strictly below the score, md5-bucket keep predicate with
    // round() on the rate product (cast double->bigint rounds in DuckDB but
    // truncates in Spark — round on both sides first)
    "q97_score_band_sample" ->
      """WITH th AS (SELECT list_transform(quantile_cont(n_chars, [0.25, 0.5, 0.9]),
                       x -> round(x, 6)) AS t FROM documents),
         b AS (SELECT doc_id, source, n_chars,
                 cast(len(list_filter(th.t, x -> n_chars > x)) AS bigint) AS band
               FROM documents, th)
         SELECT doc_id, source, n_chars, band FROM b
         WHERE ('0x' || substr(md5(cast(doc_id AS varchar)), 1, 8))::bigint % 10000
               < round([0.3, 1.0, 1.0, 0.5][band + 1] * 10000)""",
    // Z-order key: 16-bit quantized lon/lat, bit-interleave as a sum of
    // disjoint shifted bits over a 16-row series (exact bigint arithmetic)
    "q98_zorder_key" ->
      """WITH pts AS (SELECT c_custkey,
             cast(c_custkey * 7 % 360 - 180 AS double) AS lon,
             cast(c_custkey * 13 % 180 - 90 AS double) AS lat FROM customer),
         n AS (SELECT c_custkey,
             least(greatest(cast(floor((lon - (-180.0)) / 360.0 * 65536) AS bigint), 0), 65535) AS nx,
             least(greatest(cast(floor((lat - (-90.0)) / 180.0 * 65536) AS bigint), 0), 65535) AS ny
           FROM pts),
         m AS (SELECT c_custkey,
             cast(sum((((nx >> i) & 1) << (2*i)) + (((ny >> i) & 1) << (2*i + 1))) AS bigint) AS morton
           FROM n, generate_series(0, 15) g(i) GROUP BY 1)
         SELECT c_custkey, morton, morton >> 22 AS zbin FROM m""",
    // int8 ANN: corpus codebook (q94's CTE) quantizes both sides; candidates
    // rank by cosine over the DEQUANTIZED values (raw offset-affine code dot
    // products rank by code-sum offsets, not similarity), exact float cosine
    // reranks the candidate set (q39's form)
    "q99_int8_knn" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         x AS (SELECT vec_id, generate_subscripts(embedding, 1) AS d,
                 cast(unnest(embedding) AS double) AS val FROM embeddings),
         st AS (SELECT d, min(val) AS mn, max(val) AS mx FROM x GROUP BY 1),
         cb AS (SELECT list(mn ORDER BY d) AS mins, list(mx ORDER BY d) AS maxs FROM st),
         codes AS (SELECT vec_id, list_transform(generate_series(1, len(v)), i ->
                     CASE WHEN maxs[i] = mins[i] THEN 0
                          ELSE cast(round((v[i] - mins[i]) * 255.0 / (maxs[i] - mins[i])) AS int) END) AS c
                   FROM e, cb),
         deq AS (SELECT vec_id, list_transform(generate_series(1, len(c)), i ->
                   mins[i] + cast(c[i] AS double) * (maxs[i] - mins[i]) / 255.0) AS dv
                 FROM codes, cb),
         qd AS (SELECT vec_id AS qid, dv AS qdv FROM deq WHERE vec_id < 10),
         isc AS (SELECT qid AS query_id, deq.vec_id AS neighbor_id,
                   list_sum(list_transform(generate_series(1, len(dv)), i -> dv[i] * qdv[i]))
                   / (sqrt(list_sum(list_transform(dv, z -> z*z)))
                      * sqrt(list_sum(list_transform(qdv, z -> z*z)))) AS s
                 FROM deq CROSS JOIN qd WHERE deq.vec_id != qid),
         cand AS (SELECT query_id, neighbor_id FROM (
                    SELECT query_id, neighbor_id,
                      row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS cr
                    FROM isc) t WHERE cr <= 20),
         qv AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
         r AS (SELECT cand.query_id, cand.neighbor_id,
                 list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * v[i]))
                 / (sqrt(list_sum(list_transform(qv, z -> z*z)))
                    * sqrt(list_sum(list_transform(v, z -> z*z)))) AS sim0
               FROM cand JOIN e ON cand.neighbor_id = e.vec_id
                 JOIN qv ON cand.query_id = qv.query_id),
         rr AS (SELECT query_id, neighbor_id, sim0,
                  row_number() OVER (PARTITION BY query_id ORDER BY sim0 DESC, neighbor_id) AS rank
                FROM r)
         SELECT query_id, neighbor_id, cast(rank AS int) AS rank, round(sim0, 6) AS sim
         FROM rr WHERE rank <= 5""",
    // BM25: tf/dl/df from one tokenize rollup; per-term score rounded to
    // 6 dp and summed as exact decimal (reduction-order-independent), ln is
    // the Lucene non-negative idf; rank ties broken by doc_id
    "q96_bm25_topk" ->
      """WITH q(query_id, query_text) AS (VALUES
             (1, 'spark window join'), (2, 'hash table scan merge'),
             (3, 'vector stream filter customer')),
         tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tok WHERE term <> '' GROUP BY 1, 2),
         dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
         dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         st AS (SELECT (SELECT cast(count(*) AS double) FROM documents) AS n_docs,
                       (SELECT cast(sum(dl) AS double) / count(*) FROM dl) AS avgdl),
         qt AS (SELECT DISTINCT query_id, term FROM (
                  SELECT cast(query_id AS bigint) AS query_id,
                         unnest(string_split(query_text, ' ')) AS term FROM q) x
                WHERE term <> ''),
         sc AS (SELECT qt.query_id, tf.doc_id,
                  cast(round(ln((st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
                    * (tf.tf * 2.2)
                    / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)), 6)
                    AS decimal(38,6)) AS s
                FROM qt JOIN dfq USING (term) JOIN tf USING (term)
                  JOIN dl ON tf.doc_id = dl.doc_id, st),
         agg AS (SELECT query_id, doc_id, cast(sum(s) AS double) AS score
                 FROM sc GROUP BY 1, 2)
         SELECT query_id, doc_id, score, rank FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY score DESC, doc_id) AS rank FROM agg) r
         WHERE rank <= 10""",
    // sessionize: lag-gap flag + running sum over the same partitioned
    // window; floor-second epochs keep the gap boundary engine-identical
    "q87_sessionize" ->
      """SELECT event_id, user_id,
           cast(sum(CASE WHEN prev_e IS NULL OR epoch_s - prev_e > 1800 THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bigint) AS session_seq
         FROM (SELECT event_id, user_id, ts,
                 cast(floor(epoch(ts)) AS bigint) AS epoch_s,
                 lag(cast(floor(epoch(ts)) AS bigint))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_e
               FROM events) t""",
    "q48_rolling_window" ->
      """SELECT user_id, event_id,
         cast(sum(cast(value as decimal(18,2))) OVER w as double) AS roll_sum,
         count(*) OVER w AS roll_sum_n
         FROM events
         WINDOW w AS (PARTITION BY user_id
           ORDER BY cast(epoch(date_trunc('second', ts)) as bigint)
           RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""",
    "q45_ivf_knn" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         cent AS (SELECT c, list_transform(generate_series(1, 64), i ->
                    ('0x' || substr(md5('centroid:' || cast(c as varchar) || ':' || cast(i-1 as varchar)), 1, 4))::bigint / 32768.0 - 1.0) AS w
                  FROM unnest(generate_series(0, 7)) AS tc(c)),
         dots AS (SELECT vec_id, c,
                    list_sum(list_transform(generate_series(1, 64), i -> v[i] * w[i])) AS d
                  FROM e CROSS JOIN cent),
         ranked AS (SELECT vec_id, c,
                      row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, c) AS rnk
                    FROM dots),
         corp AS (SELECT vec_id AS neighbor_id, c AS cell FROM ranked WHERE rnk = 1),
         qr AS (SELECT vec_id AS query_id, c AS cell FROM ranked
                WHERE vec_id < 10 AND rnk <= 2),
         cand AS (SELECT DISTINCT query_id, neighbor_id
                  FROM qr JOIN corp USING (cell) WHERE neighbor_id <> query_id),
         s AS (SELECT query_id, neighbor_id,
                 list_sum(list_transform(generate_series(1, 64), i -> qe.v[i]*ne.v[i]))
                 / (sqrt(list_sum(list_transform(qe.v, x -> x*x)))
                    * sqrt(list_sum(list_transform(ne.v, x -> x*x)))) AS sim0
               FROM cand
               JOIN e qe ON qe.vec_id = query_id
               JOIN e ne ON ne.vec_id = neighbor_id),
         r AS (SELECT query_id, neighbor_id, sim0,
                 row_number() OVER (PARTITION BY query_id ORDER BY sim0 DESC, neighbor_id) AS rank
               FROM s)
         SELECT query_id, neighbor_id, cast(rank as int) AS rank, round(sim0, 6) AS sim
         FROM r WHERE rank <= 5""",
    "q58_windowed_metrics" ->
      """SELECT cast(epoch(date_trunc('hour', ts)) as bigint) AS win_start,
         event_type, count(*) AS n,
         cast(sum(cast(value as decimal(18,2))) as double) AS sum_value,
         cast(sum(cast(value as decimal(18,2))) as double) / count(*) AS avg_value
         FROM events GROUP BY 1, 2""",
    "q49_sql_api" -> RegionRevenueSql,
    "q104_grouping_sets" -> GroupingSetsSql,
    "q50_grid_spatial_join" ->
      """WITH boxes AS (SELECT n_name,
             cast(n_nationkey * 29 % 300 - 170 as double) AS min_lon,
             cast(n_nationkey * 17 % 140 - 80 as double) AS min_lat,
             cast(n_nationkey * 29 % 300 - 170 + 40 as double) AS max_lon,
             cast(n_nationkey * 17 % 140 - 80 + 30 as double) AS max_lat
           FROM nation),
         pts AS (SELECT c_custkey,
             cast(c_custkey * 7 % 360 - 180 as double) AS lon,
             cast(c_custkey * 13 % 180 - 90 as double) AS lat
           FROM customer)
         SELECT n_name, count(*) AS n_points
         FROM pts JOIN boxes
           ON lon BETWEEN min_lon AND max_lon AND lat BETWEEN min_lat AND max_lat
         GROUP BY n_name""",
    "q44_scene_export" ->
      """WITH scenes AS (SELECT p_partkey AS scene_id,
             'c' || cast(p_partkey % 3 as varchar) AS collection_id,
             DATE '1995-01-01' + cast(p_partkey % 1000 as int) AS date,
             cast(p_partkey * 11 % 340 - 175 as double) AS min_lon,
             cast(p_partkey * 23 % 160 - 85 as double) AS min_lat,
             cast(p_partkey * 11 % 340 - 175 + 20 as double) AS max_lon,
             cast(p_partkey * 23 % 160 - 85 + 10 as double) AS max_lat,
             cast(p_partkey % 100 as double) AS cloud_pct
           FROM part)
         SELECT scene_id, date, cloud_pct FROM scenes
         WHERE collection_id = 'c1'
           AND date BETWEEN DATE '1995-01-01' AND DATE '1997-12-31'
           AND cloud_pct <= 60.0
           AND NOT (max_lon < -120.0 OR 120.0 < min_lon
                 OR max_lat < -60.0 OR 60.0 < min_lat)""",
    "q46_analysis_registry" ->
      """WITH sc AS (SELECT len(string_split(text,' ')) AS n_tokens,
           len(list_filter(string_split(text,' '), x -> x IN ('the','a','of','and','to'))) AS en,
           len(list_filter(string_split(text,' '), x -> x IN ('der','die','das','und','ist'))) AS de,
           len(list_filter(string_split(text,' '), x -> x IN ('le','la','les','et','est'))) AS fr,
           len(list_filter(string_split(text,' '), x -> x IN ('el','los','las','y','es'))) AS es
           FROM documents)
         SELECT CASE WHEN en >= de AND en >= fr AND en >= es AND en > 0 THEN 'en'
                WHEN de >= fr AND de >= es AND de > 0 THEN 'de'
                WHEN fr >= es AND fr > 0 THEN 'fr'
                WHEN es > 0 THEN 'es' ELSE 'und' END AS lang_pred,
           count(*) AS n, avg(n_tokens) AS avg_tokens
         FROM sc GROUP BY 1""",
    "q47_bbox_udaf" ->
      """SELECT l_returnflag,
         min(lon) AS min_lon, max(lon) AS max_lon,
         min(lat) AS min_lat, max(lat) AS max_lat
         FROM (SELECT l_returnflag,
                 cast(l_partkey * 7 % 360 - 180 as double) AS lon,
                 cast(l_suppkey * 13 % 180 - 90 as double) AS lat
               FROM lineitem) t GROUP BY l_returnflag""",
    "q51_embedding_neardup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         bands AS (SELECT vec_id, v, b AS band_id,
             array_to_string(list_transform(generate_series(0, 5), r ->
               CASE WHEN list_sum(list_transform(generate_series(1, 64), i ->
                 v[i] * (('0x' || substr(md5('plane:' || cast(b*6+r as varchar) || ':' || cast(i-1 as varchar)), 1, 4))::bigint / 32768.0 - 1.0))) >= 0
               THEN '1' ELSE '0' END), '') AS bucket
           FROM e, unnest(generate_series(0, 7)) AS u(b)),
         cand AS (SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
                  FROM bands a
                  JOIN bands b ON a.band_id = b.band_id AND a.bucket = b.bucket
                              AND a.vec_id < b.vec_id),
         s AS (SELECT doc_a, doc_b,
                 round(list_sum(list_transform(generate_series(1, 64), i -> ea.v[i]*eb.v[i]))
                   / (sqrt(list_sum(list_transform(ea.v, x -> x*x)))
                      * sqrt(list_sum(list_transform(eb.v, x -> x*x)))), 6) AS cos_sim
               FROM cand
               JOIN e ea ON ea.vec_id = doc_a
               JOIN e eb ON eb.vec_id = doc_b)
         SELECT doc_a, doc_b, cos_sim FROM s WHERE cos_sim >= 0.4""",
    "q40_embedding_stats" ->
      """SELECT label, count(*) AS n,
         cast(sum(cast(round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))), 6) as decimal(18,6))) as double) AS sum_norm
         FROM embeddings GROUP BY label""",

    // ACF from exact-decimal cross moments; calendar-date lag alignment
    "q286_acf_daily" ->
      """WITH s AS (SELECT cast(o_orderdate AS date) AS d,
             cast(sum(cast(o_totalprice AS decimal(18,2))) AS decimal(18,2)) AS v
           FROM orders GROUP BY 1),
         base AS (SELECT cast(count(*) AS bigint) AS n, sum(v) AS sv,
             sum(cast(v AS decimal(28,2)) * v) AS svv FROM s),
         lags AS (SELECT l.lag, cast(count(*) AS bigint) AS n_pairs,
             sum(a.v) AS spa, sum(b.v) AS spb,
             sum(cast(a.v AS decimal(28,2)) * b.v) AS spab
           FROM (SELECT unnest(range(1, 8)) AS lag) l
           JOIN s a ON true
           JOIN s b ON b.d = a.d + cast(l.lag AS int)
           GROUP BY 1),
         mb AS (SELECT n, svv, cast(sv AS double) / cast(n AS double) AS m
           FROM base)
         SELECT cast(l.lag AS int) AS lag, l.n_pairs,
           round((cast(spab AS double) - m * cast(spa AS double)
               - m * cast(spb AS double)
               + cast(l.n_pairs AS double) * m * m)
             / (cast(svv AS double) - cast(n AS double) * m * m), 6) + 0.0
             AS acf
         FROM lags l CROSS JOIN mb
         WHERE cast(svv AS double) - cast(n AS double) * m * m > 0""",
    // MASE: exact-decimal absolute errors, two calendar-lag joins
    "q287_mase_forecast" ->
      """WITH s AS (SELECT o_orderpriority AS k, cast(o_orderdate AS date) AS d,
             cast(sum(cast(o_totalprice AS decimal(18,2))) AS decimal(18,2)) AS v
           FROM orders GROUP BY 1, 2),
         l7 AS (SELECT a.k, cast(count(*) AS bigint) AS n7,
             sum(abs(b.v - a.v)) AS sae7
           FROM s a JOIN s b ON b.k = a.k AND b.d = a.d + 7 GROUP BY 1),
         l1 AS (SELECT a.k, cast(count(*) AS bigint) AS n1,
             sum(abs(b.v - a.v)) AS sae1
           FROM s a JOIN s b ON b.k = a.k AND b.d = a.d + 1 GROUP BY 1)
         SELECT l7.k AS o_orderpriority, n7 AS n_seasonal_pairs,
           round(cast(sae7 AS double) / cast(n7 AS double), 6) + 0.0
             AS mae_seasonal,
           round(cast(sae1 AS double) / cast(n1 AS double), 6) + 0.0
             AS mae_naive,
           round((cast(sae7 AS double) / cast(n7 AS double))
             / (cast(sae1 AS double) / cast(n1 AS double)), 6) + 0.0 AS mase
         FROM l7 JOIN l1 ON l7.k = l1.k
         WHERE cast(sae1 AS double) / cast(n1 AS double) > 0""",
    // Zipf: deterministic ranks, rounded-ln decimal moments, closed-form OLS
    "q288_zipf_slope" ->
      """WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS t
           FROM documents),
         freq AS (SELECT lang, t, count(*) AS f FROM tok WHERE t <> ''
           GROUP BY 1, 2),
         ranked AS (SELECT lang, f,
             row_number() OVER (PARTITION BY lang ORDER BY f DESC, t ASC) AS r
           FROM freq),
         xy AS (SELECT lang,
             cast(round(ln(cast(r AS double)), 6) AS decimal(18,6)) AS x,
             cast(round(ln(cast(f AS double)), 6) AS decimal(18,6)) AS y
           FROM ranked WHERE r <= 200),
         m AS (SELECT lang, cast(count(*) AS bigint) AS n_ranks,
             sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
           FROM xy GROUP BY 1),
         d AS (SELECT lang, n_ranks,
             cast(n_ranks AS double) * cast(sxx AS double)
               - cast(sx AS double) * cast(sx AS double) AS det,
             cast(n_ranks AS double) * cast(sxy AS double)
               - cast(sx AS double) * cast(sy AS double) AS num,
             cast(sx AS double) AS sxd, cast(sy AS double) AS syd
           FROM m)
         SELECT lang, n_ranks, round(num / det, 6) + 0.0 AS zipf_slope,
           round((syd - (num / det) * sxd) / cast(n_ranks AS double), 6) + 0.0
             AS intercept
         FROM d WHERE det > 0""",
    // Spearman: midranks off the distribution table, exact hugeint moments
    "q289_spearman_rho" ->
      """WITH t AS (SELECT event_type AS g, value AS x, epoch_us(ts) AS y
           FROM events),
         dx AS (SELECT g, x, count(*) AS c FROM t GROUP BY 1, 2),
         rx AS (SELECT g, x,
             2 * (sum(c) OVER (PARTITION BY g ORDER BY x) - c) + c + 1 AS r2
           FROM dx),
         dy AS (SELECT g, y, count(*) AS c FROM t GROUP BY 1, 2),
         ry AS (SELECT g, y,
             2 * (sum(c) OVER (PARTITION BY g ORDER BY y) - c) + c + 1 AS r2
           FROM dy),
         j AS (SELECT t.g, rx.r2 AS ra, ry.r2 AS rb FROM t
           JOIN rx ON t.g = rx.g AND t.x = rx.x
           JOIN ry ON t.g = ry.g AND t.y = ry.y),
         m AS (SELECT g, cast(count(*) AS bigint) AS n,
             sum(cast(ra AS hugeint)) AS sx, sum(cast(rb AS hugeint)) AS sy,
             sum(cast(ra AS hugeint) * rb) AS sxy,
             sum(cast(ra AS hugeint) * ra) AS sxx,
             sum(cast(rb AS hugeint) * rb) AS syy
           FROM j GROUP BY 1),
         v AS (SELECT g, n,
             cast(n AS double) * cast(sxx AS double)
               - cast(sx AS double) * cast(sx AS double) AS vx,
             cast(n AS double) * cast(syy AS double)
               - cast(sy AS double) * cast(sy AS double) AS vy,
             cast(n AS double) * cast(sxy AS double)
               - cast(sx AS double) * cast(sy AS double) AS cxy
           FROM m)
         SELECT g AS event_type, n, round(cxy / sqrt(vx * vy), 6) + 0.0 AS rho
         FROM v WHERE vx > 0 AND vy > 0""",
    // Mann–Whitney: pooled midranks, tie-corrected variance, exact algebra
    "q290_mann_whitney" ->
      """WITH t AS (SELECT event_type AS g,
             cast(user_id % 2 = 1 AS int) AS arm, value AS v FROM events),
         d AS (SELECT g, v, count(*) AS c FROM t GROUP BY 1, 2),
         r AS (SELECT g, v,
             2 * (sum(c) OVER (PARTITION BY g ORDER BY v) - c) + c + 1 AS r2
           FROM d),
         ties AS (SELECT g, sum(cast(c AS hugeint) * c * c - c) AS tie3
           FROM d GROUP BY 1),
         m AS (SELECT t.g, cast(count(*) AS bigint) AS n,
             cast(sum(t.arm) AS bigint) AS n_b,
             sum(CASE WHEN t.arm = 1 THEN cast(r.r2 AS hugeint)
               ELSE 0 END) AS sr2b
           FROM t JOIN r ON t.g = r.g AND t.v = r.v GROUP BY 1),
         f AS (SELECT m.g, n, n_b, n - n_b AS n_a,
             cast(sr2b AS double) AS sr2bd, tie3
           FROM m JOIN ties ON m.g = ties.g),
         z AS (SELECT g, n, n_a, n_b,
             sr2bd - cast(n_b AS double) * (cast(n_b AS double) + 1.0) AS u2,
             cast(n_a AS double) * cast(n_b AS double) AS mu,
             cast(n_a AS double) * cast(n_b AS double) / 12.0
               * ((cast(n AS double) + 1.0) - cast(tie3 AS double)
                 / (cast(n AS double) * (cast(n AS double) - 1.0))) AS var
           FROM f WHERE n_a > 0 AND n_b > 0)
         SELECT g AS event_type, n_a, n_b,
           round(u2 / 2.0, 6) + 0.0 AS u_b,
           round((u2 / 2.0 - mu / 2.0) / sqrt(var), 6) + 0.0 AS z
         FROM z WHERE var > 0""",
    // Cramér's V over the COMPLETE rows×cols grid (empty cells still
    // contribute e to the χ² total — the q128 observed-cell view would
    // understate the statistic)
    "q291_cramers_v" ->
      """WITH t AS (SELECT event_type AS r, cast(isodow(ts) - 1 AS int) AS c
           FROM events),
         obs AS (SELECT r, c, cast(count(*) AS bigint) AS o FROM t GROUP BY 1, 2),
         rt AS (SELECT r, cast(sum(o) AS bigint) AS rr FROM obs GROUP BY 1),
         ct AS (SELECT c, cast(sum(o) AS bigint) AS cc FROM obs GROUP BY 1),
         nn AS (SELECT cast(sum(o) AS bigint) AS n FROM obs),
         grid AS (SELECT rt.r, ct.c, rr, cc, n,
             coalesce(o, 0) AS o,
             cast(rr AS double) * cast(cc AS double) / cast(n AS double) AS e
           FROM rt CROSS JOIN ct CROSS JOIN nn
           LEFT JOIN obs ON obs.r = rt.r AND obs.c = ct.c),
         contrib AS (SELECT r, c, n,
             round((cast(o AS double) - e) * (cast(o AS double) - e) / e, 6)
               AS chi2c
           FROM grid),
         agg AS (SELECT max(n) AS n,
             cast(count(DISTINCT r) AS bigint) AS n_rows,
             cast(count(DISTINCT c) AS bigint) AS n_cols,
             sum(cast(chi2c AS decimal(18,6))) AS chi2d
           FROM contrib)
         SELECT n, n_rows, n_cols, cast(chi2d AS double) AS chi2,
           round(sqrt(cast(chi2d AS double) / (cast(n AS double)
             * (cast(least(n_rows, n_cols) AS double) - 1.0))), 6) + 0.0
             AS cramers_v
         FROM agg WHERE least(n_rows, n_cols) > 1""",
    // geometric/harmonic means: rounded per-term transforms, decimal sums
    "q292_log_means" ->
      """WITH t AS (SELECT event_type, value AS v FROM events WHERE value > 0)
         SELECT event_type, cast(count(*) AS bigint) AS n,
           round(exp(cast(sum(cast(round(ln(v), 6) AS decimal(18,6)))
             AS double) / cast(count(*) AS double)), 6) + 0.0 AS geo_mean,
           round(cast(count(*) AS double)
             / cast(sum(cast(round(1.0 / v, 9) AS decimal(18,9))) AS double),
             6) + 0.0 AS harmonic_mean
         FROM t GROUP BY 1
         HAVING sum(cast(round(1.0 / v, 9) AS decimal(18,9))) > 0""",
    // RFM: broadcast quantile thresholds, strict-> lower-bucket ties
    "q293_rfm_segments" ->
      """WITH per AS (SELECT o_custkey, max(cast(o_orderdate AS date)) AS last_d,
             cast(count(*) AS bigint) AS frequency,
             sum(cast(o_totalprice AS decimal(18,2))) AS spend
           FROM orders GROUP BY 1),
         h AS (SELECT max(last_d) AS hd FROM per),
         base AS (SELECT o_custkey,
             cast(date_diff('day', last_d, hd) AS bigint) AS recency_days,
             frequency, round(cast(spend AS double), 2) AS monetary
           FROM per CROSS JOIN h),
         th AS (SELECT
             list_transform(quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]),
               t -> round(t, 6)) AS tr,
             list_transform(quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]),
               t -> round(t, 6)) AS tf,
             list_transform(quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]),
               t -> round(t, 6)) AS tm
           FROM base)
         SELECT o_custkey, recency_days, frequency, monetary,
           cast(1 + len(list_filter(tr,
             t -> cast(recency_days AS double) > t)) AS int) AS r_q,
           cast(1 + len(list_filter(tf,
             t -> cast(frequency AS double) > t)) AS int) AS f_q,
           cast(1 + len(list_filter(tm, t -> monetary > t)) AS int) AS m_q,
           cast((1 + len(list_filter(tr, t -> cast(recency_days AS double) > t))) * 100
             + (1 + len(list_filter(tf, t -> cast(frequency AS double) > t))) * 10
             + (1 + len(list_filter(tm, t -> monetary > t))) AS bigint)
             AS segment
         FROM base CROSS JOIN th""",
    // count-min: md5-lane counters, min-over-lanes estimate, top-20 audit
    "q294_countmin_audit" ->
      """WITH keyed AS (SELECT cast(user_id AS varchar) AS k,
             cast(count(*) AS bigint) AS exact
           FROM events GROUP BY 1),
         lanes AS (
           SELECT 0 AS j,
               ('0x' || substr(md5(k), 1, 8))::bigint % 64 AS b,
               cast(sum(exact) AS bigint) AS c
             FROM keyed GROUP BY 2
           UNION ALL
           SELECT 1,
               ('0x' || substr(md5(k), 9, 8))::bigint % 64,
               cast(sum(exact) AS bigint)
             FROM keyed GROUP BY 2),
         e0 AS (SELECT k, exact, c FROM keyed JOIN lanes ON j = 0
           AND ('0x' || substr(md5(k), 1, 8))::bigint % 64 = b),
         e1 AS (SELECT k, exact, c FROM keyed JOIN lanes ON j = 1
           AND ('0x' || substr(md5(k), 9, 8))::bigint % 64 = b),
         est AS (SELECT k, exact, min(c) AS estimate
           FROM (SELECT * FROM e0 UNION ALL SELECT * FROM e1)
           GROUP BY 1, 2)
         SELECT k AS key, exact, estimate, estimate - exact AS overestimate
         FROM est ORDER BY exact DESC, k ASC LIMIT 20""",
    // KMV: bottom-k union trick; under-full pairs are exact by construction
    "q295_kmv_intersect" ->
      """WITH m AS (SELECT DISTINCT cast(event_type AS varchar) AS s,
             cast(user_id AS varchar) AS mm FROM events),
         sizes AS (SELECT s, cast(count(*) AS bigint) AS n FROM m GROUP BY 1),
         h AS (SELECT s, mm,
             ('0x' || substr(md5(mm), 1, 15))::bigint AS hh FROM m),
         sk AS (SELECT s, mm, hh FROM (SELECT s, mm, hh,
             row_number() OVER (PARTITION BY s ORDER BY hh, mm) AS r FROM h)
           WHERE r <= 128),
         pairs AS (SELECT a.s AS set_a, b.s AS set_b, a.n AS n_a, b.n AS n_b
           FROM sizes a, sizes b WHERE a.s < b.s),
         uni AS (SELECT set_a, set_b, n_a, n_b, mm, hh, count(*) AS cnt
           FROM (
             SELECT p.set_a, p.set_b, p.n_a, p.n_b, k.mm, k.hh
               FROM pairs p JOIN sk k ON k.s = p.set_a
             UNION ALL
             SELECT p.set_a, p.set_b, p.n_a, p.n_b, k.mm, k.hh
               FROM pairs p JOIN sk k ON k.s = p.set_b)
           GROUP BY 1, 2, 3, 4, 5, 6),
         topk AS (SELECT * FROM (SELECT *,
             row_number() OVER (PARTITION BY set_a, set_b
               ORDER BY hh, mm) AS r FROM uni)
           WHERE r <= 128),
         stats AS (SELECT set_a, set_b, n_a, n_b,
             cast(count(*) AS bigint) AS ku,
             max(CASE WHEN r = 128 THEN hh END) AS thetah,
             cast(sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS bigint)
               AS inboth
           FROM topk GROUP BY 1, 2, 3, 4),
         ex AS (SELECT a.s AS set_a, b.s AS set_b,
             cast(count(*) AS bigint) AS exact_intersection
           FROM m a JOIN m b ON a.mm = b.mm AND a.s < b.s GROUP BY 1, 2)
         SELECT st.set_a, st.set_b, st.n_a, st.n_b,
           cast(coalesce(e.exact_intersection, 0) AS bigint)
             AS exact_intersection,
           round(cast(inboth AS double) / cast(least(ku, 128) AS double)
             * (CASE WHEN ku < 128 OR thetah IS NULL THEN cast(ku AS double)
                ELSE 127.0 * 1152921504606846976.0 / cast(thetah AS double)
                END), 2) + 0.0 AS est_intersection
         FROM stats st LEFT JOIN ex e
           ON st.set_a = e.set_a AND st.set_b = e.set_b""",
    "q296_kcore_peel" -> KCoreOracleSql,
    // nDCG: graded gains from the exact ranking, rounded-term decimal sums
    "q297_ndcg" ->
      s"""WITH truth AS (SELECT * FROM ($KnnBruteSql) t),
         cand AS (SELECT * FROM ($KnnLshSql) c),
         rel AS (SELECT c.query_id, c.rank,
             coalesce(cast(6 - t.rank AS double), 0.0) AS g
           FROM cand c LEFT JOIN truth t ON c.query_id = t.query_id
             AND c.neighbor_id = t.neighbor_id),
         dcg AS (SELECT query_id,
             sum(cast(round(g / log2(cast(rank AS double) + 1.0), 6)
               AS decimal(18,6))) AS dcgd
           FROM rel GROUP BY 1),
         idcg AS (SELECT query_id,
             sum(cast(round(cast(6 - rank AS double)
               / log2(cast(rank AS double) + 1.0), 6)
               AS decimal(18,6))) AS idcgd
           FROM truth GROUP BY 1)
         SELECT i.query_id,
           coalesce(cast(dcgd AS double), 0.0) AS dcg,
           cast(idcgd AS double) AS idcg,
           round(coalesce(cast(dcgd AS double), 0.0)
             / cast(idcgd AS double), 6) + 0.0 AS ndcg
         FROM idcg i LEFT JOIN dcg USING (query_id)""",
    // fuzzy match: same dirty construction, DuckDB's own JW kernel, ranked
    // on the rounded score with the clean name as tie-break
    "q298_fuzzy_match" ->
      """WITH dirty AS (SELECT p_partkey,
             substr(p_name, 1,
               cast(1 + p_partkey % (length(p_name) - 2) AS int))
             || substr(p_name,
               cast(3 + p_partkey % (length(p_name) - 2) AS int))
             AS dirty_name
           FROM part),
         cat AS (SELECT DISTINCT p_name AS clean FROM part),
         scored AS (SELECT d.p_partkey, d.dirty_name, c.clean,
             round(jaro_winkler_similarity(d.dirty_name, c.clean), 6) AS jw
           FROM dirty d JOIN cat c
             ON substr(d.dirty_name, 1, 1) = substr(c.clean, 1, 1)
           WHERE round(jaro_winkler_similarity(d.dirty_name, c.clean), 6)
             >= 0.85),
         best AS (SELECT *, row_number() OVER (PARTITION BY p_partkey
             ORDER BY jw DESC, clean ASC) AS rn
           FROM scored)
         SELECT p_partkey, dirty_name, clean AS matched_name, jw
         FROM best WHERE rn = 1""",
    // DL neighborhood: DuckDB's damerau_levenshtein is the unrestricted
    // (alphabet-table) variant — the native kernel must agree pairwise
    "q299_damerau_close" ->
      """WITH dirty AS (SELECT p_partkey,
             substr(p_name, 1,
               cast(1 + p_partkey % (length(p_name) - 2) AS int))
             || substr(p_name,
               cast(3 + p_partkey % (length(p_name) - 2) AS int))
             AS dirty_name
           FROM part),
         cat AS (SELECT DISTINCT p_name AS clean FROM part),
         scored AS (SELECT d.p_partkey, d.dirty_name,
             damerau_levenshtein(d.dirty_name, c.clean) AS dl
           FROM dirty d JOIN cat c
             ON substr(d.dirty_name, 1, 1) = substr(c.clean, 1, 1))
         SELECT p_partkey, dirty_name, min(dl) AS min_dl,
           cast(sum(CASE WHEN dl <= 2 THEN 1 ELSE 0 END) AS bigint)
             AS n_within2
         FROM scored GROUP BY 1, 2""",
    // burstiness: exact integer-microsecond gap moments, population sigma
    "q300_interarrival" ->
      """WITH g AS (SELECT event_type, user_id, epoch_us(ts) AS t,
             lag(epoch_us(ts)) OVER (PARTITION BY event_type, user_id
               ORDER BY ts, event_id) AS pt
           FROM events),
         gg AS (SELECT event_type, t - pt AS g FROM g WHERE pt IS NOT NULL),
         m AS (SELECT event_type, cast(count(*) AS bigint) AS n_gaps,
             sum(cast(g AS hugeint)) AS sg,
             sum(cast(g AS hugeint) * g) AS sgg
           FROM gg GROUP BY 1 HAVING count(*) > 1),
         s AS (SELECT event_type, n_gaps,
             cast(sg AS double) / cast(n_gaps AS double) AS mu,
             sqrt(cast(n_gaps AS double) * cast(sgg AS double)
               - cast(sg AS double) * cast(sg AS double))
               / cast(n_gaps AS double) AS sigma
           FROM m)
         SELECT event_type, n_gaps,
           round(mu / 1e6, 6) + 0.0 AS mean_gap_s,
           round(sigma / 1e6, 6) + 0.0 AS sd_gap_s,
           round((sigma - mu) / (sigma + mu), 6) + 0.0 AS burstiness
         FROM s WHERE sigma + mu > 0""",
    // Gumbel MoM fit: exact block-max moments, hardcoded gamma literal
    "q301_gumbel_fit" ->
      """WITH daily AS (SELECT cast(o_orderdate AS date) AS d,
             cast(sum(cast(o_totalprice AS decimal(18,2))) AS decimal(18,2)) AS v
           FROM orders GROUP BY 1),
         blocks AS (SELECT date_trunc('month', d) AS blk, max(v) AS mx
           FROM daily GROUP BY 1),
         m AS (SELECT cast(count(*) AS bigint) AS n_blocks, sum(mx) AS sv,
             sum(cast(mx AS decimal(28,2)) * mx) AS svv FROM blocks),
         s AS (SELECT n_blocks,
             cast(sv AS double) / cast(n_blocks AS double) AS mean,
             sqrt((cast(n_blocks AS double) * cast(svv AS double)
               - cast(sv AS double) * cast(sv AS double))
               / (cast(n_blocks AS double)
                 * (cast(n_blocks AS double) - 1.0))) AS sd
           FROM m WHERE n_blocks > 1),
         b AS (SELECT n_blocks, mean, sd, sd * sqrt(6.0) / pi() AS beta
           FROM s)
         SELECT n_blocks, round(mean, 6) + 0.0 AS block_max_mean,
           round(sd, 6) + 0.0 AS block_max_sd,
           round(beta, 6) + 0.0 AS gumbel_beta,
           round(mean - 0.5772156649015329 * beta, 6) + 0.0 AS gumbel_mu
         FROM b""",
    // bitmask profiles: OR-mergeable weekday bitmaps, Monday = bit 0
    "q302_dow_bitmask" ->
      """WITH u AS (SELECT user_id,
             bit_or(1 << cast(isodow(ts) - 1 AS int)) AS mask
           FROM events GROUP BY 1)
         SELECT mask, cast(bit_count(mask) AS int) AS n_active_days,
           cast(count(*) AS bigint) AS n_users
         FROM u GROUP BY mask""",
    // compaction plan: start-offset bin over the per-partition cumsum
    "q303_compaction_plan" ->
      """WITH files AS (SELECT l_returnflag, l_linestatus,
             date_trunc('month', l_shipdate) AS fm,
             cast(count(*) * 100 AS bigint) AS est_bytes
           FROM lineitem GROUP BY 1, 2, 3),
         c AS (SELECT l_returnflag, l_linestatus, fm, est_bytes,
             sum(est_bytes) OVER (PARTITION BY l_returnflag, l_linestatus
               ORDER BY fm) AS cum
           FROM files)
         SELECT l_returnflag, l_linestatus, cast(fm AS date) AS file_month,
           est_bytes, cast((cum - est_bytes) // 500000 AS bigint) AS bin
         FROM c""",
    // stump: cumulative class counts over the candidate grid; rank on
    // rounded Gini with the threshold as tie-break
    "q304_decision_stump" ->
      """WITH tagged AS (
           SELECT 'value_unit' AS feature, round(value, 0) AS v,
               cast(event_type = 'purchase' AS int) AS y FROM events
           UNION ALL
           SELECT 'hour', cast(hour(ts) AS double),
               cast(event_type = 'purchase' AS int) FROM events),
         dist AS (SELECT feature, v, cast(count(*) AS bigint) AS c,
             cast(sum(y) AS bigint) AS a
           FROM tagged GROUP BY 1, 2),
         tot AS (SELECT feature, cast(sum(c) AS bigint) AS n,
             cast(sum(a) AS bigint) AS at FROM dist GROUP BY 1),
         cum AS (SELECT feature, v,
             sum(c) OVER (PARTITION BY feature ORDER BY v) AS nl,
             sum(a) OVER (PARTITION BY feature ORDER BY v) AS al
           FROM dist),
         cand AS (SELECT cum.feature, v, nl, al, n - nl AS nr, at - al AS ar,
             nl - al AS bl, (n - nl) - (at - al) AS br, n
           FROM cum JOIN tot ON cum.feature = tot.feature
           WHERE nl < n),
         g AS (SELECT feature, v, nl, nr, al, ar,
             round((cast(nl AS double)
               - (cast(al AS double) * al + cast(bl AS double) * bl)
                 / cast(nl AS double)
               + cast(nr AS double)
               - (cast(ar AS double) * ar + cast(br AS double) * br)
                 / cast(nr AS double)) / cast(n AS double), 6) AS gini
           FROM cand),
         best AS (SELECT *, row_number() OVER (PARTITION BY feature
             ORDER BY gini ASC, v ASC) AS rn FROM g)
         SELECT feature, v AS threshold, gini + 0.0 AS gini,
           cast(nl AS bigint) AS n_left, cast(nr AS bigint) AS n_right,
           round(cast(al AS double) / cast(nl AS double), 6) + 0.0
             AS pos_rate_left,
           round(cast(ar AS double) / cast(nr AS double), 6) + 0.0
             AS pos_rate_right
         FROM best WHERE rn = 1""",
    // l-diversity: distinct-l + entropy-l per QI group, q162 entropy terms
    "q305_l_diversity" ->
      """WITH t AS (SELECT c_mktsegment, c_nationkey, o_orderpriority AS s
           FROM customer JOIN orders ON c_custkey = o_custkey),
         cell AS (SELECT c_mktsegment, c_nationkey, s,
             cast(count(*) AS bigint) AS c
           FROM t GROUP BY 1, 2, 3),
         totals AS (SELECT c_mktsegment, c_nationkey,
             cast(sum(c) AS bigint) AS n
           FROM cell GROUP BY 1, 2),
         terms AS (SELECT cell.c_mktsegment, cell.c_nationkey, s, c, n,
             cast(round(-(cast(c AS double) / cast(n AS double))
               * ln(cast(c AS double) / cast(n AS double)), 6)
               AS decimal(18,6)) AS term
           FROM cell JOIN totals USING (c_mktsegment, c_nationkey))
         SELECT c_mktsegment, c_nationkey, max(n) AS n,
           count(DISTINCT s) AS l_distinct,
           round(exp(cast(sum(term) AS double)), 6) + 0.0 AS entropy_l,
           cast(count(DISTINCT s) >= 3 AS int) AS diverse
         FROM terms GROUP BY 1, 2""",
    // business days: closed-form Mon-Fri day index difference, no holidays
    "q306_business_days" ->
      """WITH j AS (SELECT o_orderpriority,
             date_diff('day', DATE '1970-01-05', cast(l_shipdate AS date))
               AS ds,
             date_diff('day', DATE '1970-01-05', cast(o_orderdate AS date))
               AS doo
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         b AS (SELECT o_orderpriority,
             ((ds // 7) * 5 + least(ds % 7, 5))
               - ((doo // 7) * 5 + least(doo % 7, 5)) AS bd
           FROM j)
         SELECT o_orderpriority, cast(count(*) AS bigint) AS n,
           round(cast(sum(bd) AS double) / cast(count(*) AS double), 6) + 0.0
             AS mean_bus_days,
           cast(max(bd) AS bigint) AS max_bus_days
         FROM b GROUP BY 1""",
    "q307_logistic_irls" -> LogisticOracleSql,
    // dHash: the oracle derives the 64 gradient bits straight from the
    // fixture's pixel formula — equal output proves the BMP byte-walk
    "q308_dhash" ->
      """WITH grid AS (SELECT r.range AS r, c.range AS c
           FROM range(0, 8) r, range(0, 8) c),
         h AS (SELECT c_custkey,
             bit_or(CASE WHEN (c_custkey * 31 + r * 17 + c * 13) % 256
                 > (c_custkey * 31 + r * 17 + (c + 1) * 13) % 256
               THEN CASE WHEN r * 8 + c = 63
                 THEN (-9223372036854775807 - 1)::BIGINT
                 ELSE 1::BIGINT << cast(r * 8 + c AS int) END
               ELSE 0::BIGINT END) AS dhash
           FROM customer CROSS JOIN grid GROUP BY 1),
         g AS (SELECT dhash, cast(count(*) AS bigint) AS n_same_hash
           FROM h GROUP BY 1)
         SELECT c_custkey, h.dhash, n_same_hash
         FROM h JOIN g ON h.dhash = g.dhash""",
    // clamped balance: s = P_final − min(0, min prefix) — two windows of
    // exact integer arithmetic, no sequential scan
    "q309_clamped_balance" ->
      """WITH d AS (SELECT user_id, ts, event_id,
             cast(round(value, 0) AS bigint) *
               (CASE WHEN event_type IN ('purchase', 'error')
                THEN -1 ELSE 1 END) AS dd
           FROM events),
         p AS (SELECT user_id, dd,
             sum(dd) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS pp
           FROM d)
         SELECT user_id, cast(count(*) AS bigint) AS n,
           cast(sum(dd) AS bigint) AS net_raw,
           cast(sum(dd) - least(0, min(pp)) AS bigint) AS balance,
           cast(-least(0, min(pp)) AS bigint) AS absorbed_shortfall
         FROM p GROUP BY 1""",
    // banded near-dup over distinct perceptual hashes; pigeonhole-exact
    // for hamming <= 7 with 8 bands
    "q310_dhash_banded_pairs" ->
      """WITH grid AS (SELECT r.range AS r, c.range AS c
           FROM range(0, 8) r, range(0, 8) c),
         h AS (SELECT c_custkey,
             bit_or(CASE WHEN (c_custkey * 31 + r * 17 + c * 13) % 256
                 > (c_custkey * 31 + r * 17 + (c + 1) * 13) % 256
               THEN CASE WHEN r * 8 + c = 63
                 THEN (-9223372036854775807 - 1)::BIGINT
                 ELSE 1::BIGINT << cast(r * 8 + c AS int) END
               ELSE 0::BIGINT END) AS dhash
           FROM customer CROSS JOIN grid GROUP BY 1),
         d AS (SELECT DISTINCT dhash FROM h),
         bands AS (SELECT dhash, b.range AS band,
             (dhash >> cast(8 * b.range AS int)) & 255 AS bv
           FROM d, range(0, 8) b),
         cand AS (SELECT DISTINCT a.dhash AS dhash_a, c.dhash AS dhash_b
           FROM bands a JOIN bands c
             ON a.band = c.band AND a.bv = c.bv AND a.dhash < c.dhash)
         SELECT dhash_a, dhash_b,
           cast(bit_count(xor(dhash_a, dhash_b)) AS int) AS hamming
         FROM cand WHERE bit_count(xor(dhash_a, dhash_b)) <= 7""",
    "q311_greedy_cover" -> GreedyCoverOracleSql,
    "q312_luhn_audit" -> LuhnOracleSql,
    "q326_cdc_chunks" -> CdcOracleSql,
    "q327_hits" -> HitsOracleSql,
    "q332_absorption" -> AbsorptionOracleSql,
    // seasonal indices: centered 12-month MA trend, rounded ratio means
    "q336_seasonal_indices" ->
      """WITH monthly AS (SELECT date_trunc('month', o_orderdate) AS m,
             sum(cast(o_totalprice AS decimal(18,2))) AS rev
           FROM orders GROUP BY 1),
         seq AS (SELECT m, rev, row_number() OVER (ORDER BY m) AS i
           FROM monthly),
         t AS (SELECT m, rev,
             count(*) OVER (ORDER BY i ROWS BETWEEN 6 PRECEDING
               AND 5 FOLLOWING) AS cnt,
             sum(rev) OVER (ORDER BY i ROWS BETWEEN 6 PRECEDING
               AND 5 FOLLOWING) AS masum
           FROM seq),
         r AS (SELECT m,
             cast(round(cast(rev AS double)
               / (cast(masum AS double) / 12.0), 6) AS decimal(18,6))
               AS ratio
           FROM t WHERE cnt = 12)
         SELECT cast(month(m) AS int) AS month_of_year,
           cast(count(*) AS bigint) AS n_years,
           round(cast(sum(ratio) AS double) / cast(count(*) AS double), 6)
             + 0.0 AS seasonal_index
         FROM r GROUP BY 1""",
    // AR aging: horizon-relative integer day buckets, exact totals
    "q337_ar_aging" ->
      """WITH h AS (SELECT max(cast(o_orderdate AS date)) AS hd FROM orders)
         SELECT o_orderpriority,
           CASE WHEN date_diff('day', cast(o_orderdate AS date), hd) <= 30
               THEN '0-30'
             WHEN date_diff('day', cast(o_orderdate AS date), hd) <= 60
               THEN '31-60'
             WHEN date_diff('day', cast(o_orderdate AS date), hd) <= 90
               THEN '61-90'
             ELSE '90+' END AS age_bucket,
           cast(count(*) AS bigint) AS n_open,
           round(cast(sum(cast(o_totalprice AS decimal(18,2))) AS double),
             2) + 0.0 AS open_amount
         FROM orders CROSS JOIN h
         WHERE o_orderstatus = 'O'
         GROUP BY 1, 2""",
    // duplicate invoices: customer-blocked self-join, near amount + date
    "q338_dup_invoices" ->
      """SELECT a.o_custkey, a.o_orderkey AS k_a, b.o_orderkey AS k_b,
           round(a.o_totalprice, 2) + 0.0 AS amount_a,
           round(b.o_totalprice, 2) + 0.0 AS amount_b,
           cast(abs(date_diff('day', cast(a.o_orderdate AS date),
             cast(b.o_orderdate AS date))) AS int) AS days_apart
         FROM orders a JOIN orders b
           ON a.o_custkey = b.o_custkey
           AND a.o_orderkey < b.o_orderkey
         WHERE abs(a.o_totalprice - b.o_totalprice) <= 1000.0
           AND abs(date_diff('day', cast(a.o_orderdate AS date),
             cast(b.o_orderdate AS date))) <= 7""",
    // SPRT: constant 6-dp per-event terms, exact decimal prefix sums,
    // first ±ln(19) crossing decides
    "q335_sprt" ->
      """WITH t AS (SELECT user_id, ts, event_id,
             cast(CASE WHEN event_type = 'error' THEN 0.693147
               ELSE -0.287682 END AS decimal(18,6)) AS term
           FROM events),
         c AS (SELECT user_id, term,
             sum(term) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS cum,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rn
           FROM t),
         g AS (SELECT user_id, cast(count(*) AS bigint) AS n_events,
             round(cast(sum(term) AS double), 6) + 0.0 AS llr_final,
             min(CASE WHEN cast(cum AS double) >= 2.944439 THEN rn END)
               AS hit1,
             min(CASE WHEN cast(cum AS double) <= -2.944439 THEN rn END)
               AS hit0
           FROM c GROUP BY 1)
         SELECT user_id, n_events, llr_final,
           CASE WHEN hit1 IS NOT NULL AND (hit0 IS NULL OR hit1 < hit0)
               THEN 'accept_h1'
             WHEN hit0 IS NOT NULL THEN 'accept_h0'
             ELSE 'continue' END AS decision,
           cast(coalesce(least(hit1, hit0), hit1, hit0, 0) AS bigint)
             AS decided_at_event
         FROM g""",
    // 3-D skyline: exact integer/decimal dominance (delays compared
    // cross-multiplied), NOT EXISTS anti-dominance on the supplier grain
    "q334_skyline3d" ->
      """WITH m AS (SELECT l_suppkey,
             sum(cast(l_extendedprice AS decimal(18,2))) AS rev,
             cast(count(DISTINCT l_partkey) AS bigint) AS np,
             cast(sum(date_diff('day', cast(o_orderdate AS date),
               cast(l_shipdate AS date))) AS bigint) AS ds,
             cast(count(*) AS bigint) AS dn
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY 1)
         SELECT a.l_suppkey AS s_suppkey,
           round(cast(a.rev AS double), 2) + 0.0 AS revenue,
           a.np AS n_parts,
           round(cast(a.ds AS double) / cast(a.dn AS double), 6) + 0.0
             AS mean_ship_delay_days
         FROM m a
         WHERE NOT EXISTS (SELECT 1 FROM m b
           WHERE b.l_suppkey <> a.l_suppkey
             AND b.rev >= a.rev AND b.np >= a.np
             AND b.ds * a.dn <= a.ds * b.dn
             AND (b.rev > a.rev OR b.np > a.np
               OR b.ds * a.dn < a.ds * b.dn))""",
    // Jain: exact integer moments, one mirrored division
    "q333_jain_fairness" ->
      """WITH c AS (SELECT event_type, user_id, cast(count(*) AS bigint) AS c
           FROM events GROUP BY 1, 2)
         SELECT event_type, cast(count(*) AS bigint) AS n_users,
           round(cast(sum(c) AS double) * cast(sum(c) AS double)
             / (cast(count(*) AS double) * cast(sum(c * c) AS double)), 6)
             + 0.0 AS jain_index
         FROM c GROUP BY 1""",
    // BH-FDR: exact-moment Welch z, Abramowitz–Stegun tail polynomial
    // (explicit, no libm erf), integer-scaled step-up at alpha = 0.05
    "q331_bh_fdr" ->
      """WITH e AS (SELECT event_type, cast(isodow(ts) - 1 AS int) AS dow,
             cast(value AS decimal(18,2)) AS v FROM events),
         cell AS (SELECT event_type, dow, cast(count(*) AS bigint) AS nc,
             sum(v) AS sc, sum(v * v) AS qc
           FROM e GROUP BY 1, 2),
         tot AS (SELECT cast(count(*) AS bigint) AS nt, sum(v) AS st,
             sum(v * v) AS qt FROM e),
         z AS (SELECT event_type, dow,
             cast(sc AS double) / cast(nc AS double) AS mc,
             cast(st - sc AS double) / cast(nt - nc AS double) AS mr,
             (cast(qc AS double) - cast(nc AS double)
               * (cast(sc AS double) / cast(nc AS double))
               * (cast(sc AS double) / cast(nc AS double)))
               / (cast(nc AS double) - 1.0) AS vc,
             (cast(qt - qc AS double) - cast(nt - nc AS double)
               * (cast(st - sc AS double) / cast(nt - nc AS double))
               * (cast(st - sc AS double) / cast(nt - nc AS double)))
               / (cast(nt - nc AS double) - 1.0) AS vr,
             nc, nt - nc AS nr
           FROM cell CROSS JOIN tot
           WHERE nc > 1 AND nt - nc > 1),
         zz AS (SELECT event_type, dow,
             (mc - mr) / sqrt(vc / cast(nc AS double)
               + vr / cast(nr AS double)) AS zv
           FROM z),
         pp AS (SELECT event_type, dow, zv,
             round(2.0 * (exp(-abs(zv) * abs(zv) / 2.0)
                 / 2.5066282746310002)
               * ((1.0 / (1.0 + 0.2316419 * abs(zv)))
                 * (0.319381530 + (1.0 / (1.0 + 0.2316419 * abs(zv)))
                   * (-0.356563782 + (1.0 / (1.0 + 0.2316419 * abs(zv)))
                     * (1.781477937 + (1.0 / (1.0 + 0.2316419 * abs(zv)))
                       * (-1.821255978 + (1.0 / (1.0 + 0.2316419 * abs(zv)))
                         * 1.330274429))))), 9) + 0.0 AS p
           FROM zz),
         rk AS (SELECT event_type, dow, zv, p,
             row_number() OVER (ORDER BY p ASC, event_type ASC, dow ASC)
               AS p_rank,
             cast(count(*) OVER () AS bigint) AS m
           FROM pp),
         pass AS (SELECT *, CASE WHEN p * cast(m AS double) * 100.0
               <= cast(p_rank AS double) * 5.0 THEN p_rank END AS pr
           FROM rk),
         km AS (SELECT *, max(pr) OVER () AS kmax FROM pass)
         SELECT event_type, dow, round(zv, 6) + 0.0 AS z, p,
           cast(p_rank AS int) AS p_rank,
           cast(p_rank <= coalesce(kmax, 0) AS int) AS significant
         FROM km""",
    // revenue bridge: volume/rate/cross effects from exact per-year moments
    "q328_revenue_bridge" ->
      """WITH a AS (SELECT o_orderpriority, cast(count(*) AS bigint) AS n_a,
             sum(cast(o_totalprice AS decimal(18,2))) AS ra
           FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1),
         b AS (SELECT o_orderpriority, cast(count(*) AS bigint) AS n_b,
             sum(cast(o_totalprice AS decimal(18,2))) AS rb
           FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1),
         j AS (SELECT a.o_orderpriority, n_a, n_b,
             cast(ra AS double) AS rad, cast(rb AS double) AS rbd,
             cast(ra AS double) / cast(n_a AS double) AS aova,
             cast(rb AS double) / cast(n_b AS double) AS aovb
           FROM a JOIN b ON a.o_orderpriority = b.o_orderpriority
           WHERE n_a > 0 AND n_b > 0)
         SELECT o_orderpriority, n_a, n_b,
           round(rad, 2) + 0.0 AS rev_a, round(rbd, 2) + 0.0 AS rev_b,
           round(cast(n_b - n_a AS double) * aova, 2) + 0.0
             AS volume_effect,
           round(cast(n_a AS double) * (aovb - aova), 2) + 0.0
             AS rate_effect,
           round(cast(n_b - n_a AS double) * (aovb - aova), 2) + 0.0
             AS cross_effect
         FROM j""",
    // Qini: distribution-grain deciles (integer algebra), cumulative
    // treatment/control conversion counts
    "q329_qini_uplift" ->
      """WITH e AS (SELECT value AS s,
             cast(user_id % 2 = 1 AS int) AS t,
             cast(event_type = 'purchase' AS bigint) AS y FROM events),
         dist AS (SELECT s, count(*) AS c FROM e GROUP BY 1),
         tot AS (SELECT cast(sum(c) AS bigint) AS n FROM dist),
         dec AS (SELECT s,
             cast((sum(c) OVER (ORDER BY s DESC) - c) * 10 // n AS int) + 1
               AS decile
           FROM dist CROSS JOIN tot),
         cell AS (SELECT decile,
             cast(sum(t) AS bigint) AS nt,
             cast(sum(1 - t) AS bigint) AS nc,
             cast(sum(y * t) AS bigint) AS ct,
             cast(sum(y * (1 - t)) AS bigint) AS cc
           FROM e JOIN dec USING (s) GROUP BY 1),
         c AS (SELECT decile, nt, nc, ct, cc,
             sum(nt) OVER (ORDER BY decile) AS cnt,
             sum(nc) OVER (ORDER BY decile) AS cnc,
             sum(ct) OVER (ORDER BY decile) AS cct,
             sum(cc) OVER (ORDER BY decile) AS ccc
           FROM cell)
         SELECT decile, nt AS n_treat, nc AS n_control,
           round(cast(ct AS double) / cast(nt AS double)
             - cast(cc AS double) / cast(nc AS double), 6) + 0.0 AS uplift,
           round(cast(cct AS double) - cast(ccc AS double)
             * cast(cnt AS double) / cast(cnc AS double), 6) + 0.0 AS qini
         FROM c""",
    // consistent hashing: 64 md5 ring points, first-clockwise assignment,
    // wrap to the global minimum; node 7 removed in the after-view
    "q330_consistent_hash" ->
      """WITH vn AS (SELECT n.range AS node, v.range AS vp,
             ('0x' || substr(md5('node:' || cast(n.range AS varchar)
               || ':' || cast(v.range AS varchar)), 1, 15))::bigint AS pos
           FROM range(0, 16) n, range(0, 4) v),
         keys AS (SELECT DISTINCT user_id,
             ('0x' || substr(md5('key:' || cast(user_id AS varchar)), 1,
               15))::bigint AS kpos
           FROM events),
         bef AS (SELECT user_id,
             coalesce(
               (SELECT v2.node FROM vn v2 WHERE v2.pos =
                 (SELECT min(v3.pos) FROM vn v3 WHERE v3.pos >= k.kpos)),
               (SELECT v4.node FROM vn v4 WHERE v4.pos =
                 (SELECT min(v5.pos) FROM vn v5))) AS node_before
           FROM keys k),
         aft AS (SELECT user_id,
             coalesce(
               (SELECT v2.node FROM vn v2 WHERE v2.node <> 7 AND v2.pos =
                 (SELECT min(v3.pos) FROM vn v3 WHERE v3.node <> 7
                   AND v3.pos >= k.kpos)),
               (SELECT v4.node FROM vn v4 WHERE v4.node <> 7 AND v4.pos =
                 (SELECT min(v5.pos) FROM vn v5 WHERE v5.node <> 7)))
               AS node_after
           FROM keys k),
         m AS (SELECT b.user_id, node_before, node_after
           FROM bef b JOIN aft a ON b.user_id = a.user_id),
         ag AS (SELECT node_after AS node,
             cast(count(*) AS bigint) AS n_after,
             cast(sum(CASE WHEN node_before <> node_after THEN 1 ELSE 0 END)
               AS bigint) AS n_gained
           FROM m GROUP BY 1),
         bg AS (SELECT node_before AS node,
             cast(count(*) AS bigint) AS n_before
           FROM m GROUP BY 1)
         SELECT cast(coalesce(ag.node, bg.node) AS int) AS node,
           coalesce(n_before, 0) AS n_before,
           coalesce(n_after, 0) AS n_after,
           coalesce(n_gained, 0) AS n_gained
         FROM ag FULL JOIN bg ON ag.node = bg.node""",
    // HT estimator: md5-bucket two-stage design, exact decimal Σy, one
    // rational 20/3 scale at the end
    "q313_horvitz_thompson" ->
      """WITH e AS (SELECT event_type, user_id, event_id,
             cast(value AS decimal(18,2)) AS v FROM events),
         s AS (SELECT event_type, cast(count(*) AS bigint) AS n_sampled,
             sum(v) AS sy
           FROM e
           WHERE ('0x' || substr(md5(cast(user_id AS varchar)), 1, 8))::bigint
               % 10 < 3
             AND ('0x' || substr(md5(cast(event_id AS varchar)), 1, 8))::bigint
               % 10 < 5
           GROUP BY 1),
         t AS (SELECT event_type, cast(count(*) AS bigint) AS n_total,
             sum(v) AS ty
           FROM e GROUP BY 1)
         SELECT s.event_type, n_sampled, n_total,
           round(cast(sy AS double) * 20.0 / 3.0, 2) + 0.0 AS ht_estimate,
           round(cast(ty AS double), 2) + 0.0 AS true_total,
           round(cast(sy AS double) * 20.0 / 3.0 / cast(ty AS double), 6)
             + 0.0 AS ratio
         FROM s JOIN t ON s.event_type = t.event_type""",
    // RLE islands: run id = overall rank − per-type rank
    "q314_type_runs" ->
      """WITH r AS (SELECT user_id, event_type, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               - row_number() OVER (PARTITION BY user_id, event_type
                 ORDER BY ts, event_id) AS grp
           FROM events),
         runs AS (SELECT user_id, event_type, grp,
             cast(count(*) AS bigint) AS len,
             min(event_id) AS start_id
           FROM r GROUP BY 1, 2, 3),
         best AS (SELECT *, row_number() OVER (PARTITION BY user_id
             ORDER BY len DESC, event_type ASC, start_id ASC) AS rn
           FROM runs)
         SELECT user_id, cast(count(*) AS bigint) AS n_runs,
           max(len) AS longest_run,
           max(CASE WHEN rn = 1 THEN event_type END) AS longest_type
         FROM best GROUP BY 1""",
    // order-statistic median CI: mirrored rank formulas, distribution-
    // table value lookups
    "q316_median_ci" ->
      """WITH d AS (SELECT event_type, value AS v FROM events),
         dist AS (SELECT event_type, v, count(*) AS c FROM d GROUP BY 1, 2),
         cum AS (SELECT event_type, v,
             sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cm
           FROM dist),
         n AS (SELECT event_type, cast(count(*) AS bigint) AS n
           FROM d GROUP BY 1),
         ranks AS (SELECT event_type, n,
             (n + 1) // 2 AS rmed,
             greatest(1, cast(floor((cast(n AS double)
               - 1.96 * sqrt(cast(n AS double))) / 2.0) AS bigint)) AS rlo,
             least(n, cast(ceil(1.0 + (cast(n AS double)
               + 1.96 * sqrt(cast(n AS double))) / 2.0) AS bigint)) AS rhi
           FROM n),
         lo AS (SELECT r.event_type, r.n, min(v) AS ci_lo FROM ranks r
           JOIN cum ON cum.event_type = r.event_type AND cm >= rlo
           GROUP BY 1, 2),
         med AS (SELECT r.event_type, r.n, min(v) AS median FROM ranks r
           JOIN cum ON cum.event_type = r.event_type AND cm >= rmed
           GROUP BY 1, 2),
         hi AS (SELECT r.event_type, r.n, min(v) AS ci_hi FROM ranks r
           JOIN cum ON cum.event_type = r.event_type AND cm >= rhi
           GROUP BY 1, 2)
         SELECT lo.event_type, lo.n, ci_lo, median, ci_hi
         FROM lo JOIN med ON lo.event_type = med.event_type
         JOIN hi ON lo.event_type = hi.event_type""",
    "q317_group_by_all" -> GroupByAllSql,
    "q318_ann_tuning" -> AnnTuningOracleSql,
    // medallion: quarantine → dedup-keep-lowest-id → gold rollup, audit
    // counts broadcast onto every row
    "q319_medallion" ->
      """WITH bronze AS (SELECT * FROM events),
         quarantined AS (SELECT * FROM bronze WHERE value < 1.0),
         valid AS (SELECT * FROM bronze WHERE value >= 1.0),
         silver AS (SELECT * FROM (SELECT *, row_number() OVER (
             PARTITION BY user_id, ts, event_type ORDER BY event_id) AS rn
           FROM valid) WHERE rn = 1),
         audit AS (SELECT
             (SELECT cast(count(*) AS bigint) FROM bronze) AS n_bronze,
             (SELECT cast(count(*) AS bigint) FROM quarantined)
               AS n_quarantined,
             (SELECT cast(count(*) AS bigint) FROM bronze)
               - (SELECT cast(count(*) AS bigint) FROM quarantined)
               - (SELECT cast(count(*) AS bigint) FROM silver)
               AS n_dups_dropped)
         SELECT cast(date_trunc('day', ts) AS date) AS day, event_type,
           cast(count(*) AS bigint) AS n_events,
           cast(count(DISTINCT user_id) AS bigint) AS n_users,
           round(cast(sum(cast(value AS decimal(18,2))) AS double), 2) + 0.0
             AS revenue,
           n_bronze, n_quarantined, n_dups_dropped
         FROM silver CROSS JOIN audit
         GROUP BY 1, 2, n_bronze, n_quarantined, n_dups_dropped""",
    // QQ drift: rounded exact deciles per slice, absolute gaps
    "q320_qq_drift" ->
      """WITH qa AS (SELECT list_transform(
             quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
             t -> round(t, 6)) AS l
           FROM events WHERE user_id % 2 = 0),
         qb AS (SELECT list_transform(
             quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
             t -> round(t, 6)) AS l
           FROM events WHERE user_id % 2 <> 0),
         g AS (SELECT unnest(generate_series(1, 9)) AS i)
         SELECT cast(i * 10 AS int) AS pct,
           qa.l[i] AS q_even, qb.l[i] AS q_odd,
           round(abs(qa.l[i] - qb.l[i]), 6) + 0.0 AS gap
         FROM g CROSS JOIN qa CROSS JOIN qb""",
    // ABC×XYZ: integer-exact Pareto cut + exact-moment CV thresholds
    "q321_abc_xyz" ->
      """WITH monthly AS (SELECT l_partkey, date_trunc('month', l_shipdate) AS m,
             sum(cast(l_quantity AS decimal(18,2))) AS q
           FROM lineitem GROUP BY 1, 2),
         stats AS (SELECT l_partkey, cast(count(*) AS bigint) AS nm,
             sum(q) AS sq, sum(cast(q AS decimal(28,2)) * q) AS sqq
           FROM monthly GROUP BY 1 HAVING count(*) > 1),
         cv AS (SELECT l_partkey,
             round(sqrt((cast(nm AS double) * cast(sqq AS double)
                 - cast(sq AS double) * cast(sq AS double))
               / (cast(nm AS double) * (cast(nm AS double) - 1.0)))
               / (cast(sq AS double) / cast(nm AS double)), 6) + 0.0 AS cv
           FROM stats),
         rev AS (SELECT l_partkey,
             sum(cast(l_extendedprice AS decimal(18,2))) AS r
           FROM lineitem GROUP BY 1),
         tot AS (SELECT sum(r) AS t FROM rev),
         abc AS (SELECT l_partkey, r,
             CASE WHEN sum(r) OVER (ORDER BY r DESC, l_partkey ASC) * 100
                 <= t * 80 THEN 'A'
               WHEN sum(r) OVER (ORDER BY r DESC, l_partkey ASC) * 100
                 <= t * 95 THEN 'B'
               ELSE 'C' END AS abc_class
           FROM rev CROSS JOIN tot)
         SELECT abc_class,
           CASE WHEN cv <= 0.5 THEN 'X' WHEN cv <= 1.0 THEN 'Y'
             ELSE 'Z' END AS xyz_class,
           cast(count(*) AS bigint) AS n_parts,
           round(cast(sum(r) AS double), 2) + 0.0 AS revenue
         FROM abc JOIN cv USING (l_partkey)
         GROUP BY 1, 2""",
    // elasticity: rounded-ln decimal moments, closed-form OLS slope
    "q322_price_elasticity" ->
      """WITH d AS (SELECT p_type,
             cast(round(ln(l_quantity), 6) AS decimal(18,6)) AS y,
             cast(round(ln(l_extendedprice / l_quantity), 6)
               AS decimal(18,6)) AS x
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE l_quantity > 0 AND l_extendedprice > 0),
         m AS (SELECT p_type, cast(count(*) AS bigint) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
             sum(x * x) AS sxx
           FROM d GROUP BY 1),
         s AS (SELECT p_type, n,
             cast(n AS double) * cast(sxx AS double)
               - cast(sx AS double) * cast(sx AS double) AS det,
             cast(n AS double) * cast(sxy AS double)
               - cast(sx AS double) * cast(sy AS double) AS num
           FROM m)
         SELECT p_type, n, round(num / det, 6) + 0.0 AS elasticity
         FROM s WHERE det > 0""",
    // partial correlation: three pairwise r's from one moment aggregate
    "q323_partial_corr" ->
      """WITH t AS (SELECT event_type,
             cast(value AS decimal(18,2)) AS x,
             cast(hour(ts) AS decimal(18,2)) AS y,
             cast(isodow(ts) - 1 AS decimal(18,2)) AS z
           FROM events),
         m AS (SELECT event_type, cast(count(*) AS bigint) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(z) AS sz,
             sum(x * y) AS sxy, sum(x * z) AS sxz, sum(y * z) AS syz,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(z * z) AS szz
           FROM t GROUP BY 1),
         r AS (SELECT event_type, n,
             (cast(n AS double) * cast(sxy AS double)
               - cast(sx AS double) * cast(sy AS double))
               / sqrt((cast(n AS double) * cast(sxx AS double)
                   - cast(sx AS double) * cast(sx AS double))
                 * (cast(n AS double) * cast(syy AS double)
                   - cast(sy AS double) * cast(sy AS double))) AS rxy,
             (cast(n AS double) * cast(sxz AS double)
               - cast(sx AS double) * cast(sz AS double))
               / sqrt((cast(n AS double) * cast(sxx AS double)
                   - cast(sx AS double) * cast(sx AS double))
                 * (cast(n AS double) * cast(szz AS double)
                   - cast(sz AS double) * cast(sz AS double))) AS rxz,
             (cast(n AS double) * cast(syz AS double)
               - cast(sz AS double) * cast(sy AS double))
               / sqrt((cast(n AS double) * cast(szz AS double)
                   - cast(sz AS double) * cast(sz AS double))
                 * (cast(n AS double) * cast(syy AS double)
                   - cast(sy AS double) * cast(sy AS double))) AS rzy
           FROM m)
         SELECT event_type, n, round(rxy, 6) + 0.0 AS r_xy,
           round((rxy - rxz * rzy)
             / sqrt((1.0 - rxz * rxz) * (1.0 - rzy * rzy)), 6) + 0.0
             AS r_xy_given_z
         FROM r WHERE abs(rxz) < 1 AND abs(rzy) < 1""",
    // LTV: bounded cohort×offset grid, cumulative exact-decimal revenue
    "q324_ltv_curve" ->
      """WITH e AS (SELECT user_id, ts, cast(value AS decimal(18,2)) AS v
           FROM events),
         fst AS (SELECT user_id, date_trunc('month', min(ts)) AS cohort
           FROM e GROUP BY 1),
         sizes AS (SELECT cohort,
             cast(count(DISTINCT user_id) AS bigint) AS n_users
           FROM fst GROUP BY 1),
         cell AS (SELECT cohort,
             cast(date_diff('month', cohort, date_trunc('month', ts))
               AS int) AS month_offset,
             sum(v) AS rev
           FROM e JOIN fst USING (user_id) GROUP BY 1, 2),
         c AS (SELECT cohort, month_offset,
             sum(rev) OVER (PARTITION BY cohort ORDER BY month_offset) AS cum
           FROM cell)
         SELECT cast(c.cohort AS date) AS cohort, month_offset, n_users,
           round(cast(cum AS double), 2) + 0.0 AS cum_revenue,
           round(cast(cum AS double) / cast(n_users AS double), 2) + 0.0
             AS cum_ltv_per_user
         FROM c JOIN sizes ON c.cohort = sizes.cohort""",
    // KWIC: 1-based positions, clamped ±2-token slice
    "q325_kwic" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM documents),
         p AS (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS pos
           FROM t)
         SELECT doc_id, cast(pos AS int) AS pos,
           array_to_string(w[greatest(1, pos - 2):least(len(w), pos + 2)],
             ' ') AS context
         FROM p WHERE w[pos] = 'spark'""",
    // join cardinality: exact Σc² vs the uniform n²/d textbook estimate
    "q315_join_card_estimate" ->
      """WITH f AS (SELECT l_partkey, cast(count(*) AS bigint) AS c
           FROM lineitem GROUP BY 1),
         m AS (SELECT cast(sum(c) AS bigint) AS n,
             cast(count(*) AS bigint) AS d,
             sum(cast(c AS hugeint) * c) AS ex FROM f)
         SELECT n, d AS n_distinct_keys, cast(ex AS bigint) AS exact_pairs,
           round(cast(n AS double) * cast(n AS double) / cast(d AS double),
             2) + 0.0 AS est_pairs,
           round(cast(ex AS double) / (cast(n AS double) * cast(n AS double)
             / cast(d AS double)), 6) + 0.0 AS skew_ratio
         FROM m""",
    // Holt: recursive CTE over the bounded monthly series, every level/
    // trend step rounded to 6 dp — lockstep with the Scala fold
    "q339_holt_smoothing" ->
      """WITH RECURSIVE monthly AS (
           SELECT date_trunc('month', o_orderdate) AS m,
             cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS y
           FROM orders GROUP BY 1),
         seq AS (SELECT m, y, row_number() OVER (ORDER BY m) AS i
           FROM monthly),
         rec AS (
           SELECT s.i, round(s.y, 6) AS lev,
             round((SELECT y FROM seq WHERE i = 2) - s.y, 6) AS tr
           FROM seq s WHERE s.i = 1
           UNION ALL
           SELECT s.i,
             round(cast(0.3 AS double) * s.y
               + cast(0.7 AS double) * (r.lev + r.tr), 6) AS lev,
             round(cast(0.2 AS double)
                 * (round(cast(0.3 AS double) * s.y
                     + cast(0.7 AS double) * (r.lev + r.tr), 6) - r.lev)
               + cast(0.8 AS double) * r.tr, 6) AS tr
           FROM rec r JOIN seq s ON s.i = r.i + 1)
         SELECT cast(s.m AS date) AS month,
           round(s.y, 2) + 0.0 AS revenue,
           r.lev + 0.0 AS smooth_level,
           r.tr + 0.0 AS smooth_trend,
           round(r.lev + r.tr, 6) + 0.0 AS forecast_next
         FROM rec r JOIN seq s ON s.i = r.i""",
    // Lorenz: exact integer-cent bins, cumulative over the bounded bin
    // table, shares against one 1-row total
    "q340_lorenz_curve" ->
      """WITH spend AS (
           SELECT o_custkey, sum(cast(o_totalprice AS decimal(18,2))) AS s
           FROM orders GROUP BY 1),
         binned AS (
           SELECT cast(s * 100 AS bigint) // 1000000 AS spend_bin,
             cast(count(*) AS bigint) AS n_customers,
             sum(s) AS bin_spend
           FROM spend GROUP BY 1),
         tot AS (SELECT cast(sum(n_customers) AS bigint) AS tn,
             sum(bin_spend) AS ts
           FROM binned),
         c AS (
           SELECT spend_bin, n_customers,
             cast(sum(n_customers) OVER (ORDER BY spend_bin) AS bigint)
               AS cum_customers,
             sum(bin_spend) OVER (ORDER BY spend_bin) AS cum_spend
           FROM binned)
         SELECT spend_bin, n_customers, cum_customers,
           round(cast(cum_customers AS double) / cast(tn AS double), 6)
             + 0.0 AS cum_pop_share,
           round(cast(cum_spend AS double) / cast(ts AS double), 6)
             + 0.0 AS cum_rev_share
         FROM c CROSS JOIN tot""",
    // changepoint: exact integer-scaled CUSUM argmax, earliest-day ties
    "q341_changepoint" ->
      """WITH daily AS (
           SELECT event_type, cast(ts AS date) AS d,
             cast(sum(cast(cast(value AS decimal(18,2)) * 100 AS bigint))
               AS bigint) AS cents
           FROM events GROUP BY 1, 2),
         w AS (
           SELECT event_type, d, cents,
             cast(row_number() OVER (PARTITION BY event_type ORDER BY d)
               AS bigint) AS t,
             cast(sum(cents) OVER (PARTITION BY event_type ORDER BY d
               ROWS UNBOUNDED PRECEDING) AS bigint) AS s
           FROM daily),
         g AS (
           SELECT event_type, cast(count(*) AS bigint) AS n,
             cast(sum(cents) AS bigint) AS tot
           FROM daily GROUP BY 1),
         dev AS (
           SELECT w.event_type, w.d, w.t, w.s, g.n, g.tot,
             abs(w.s * g.n - w.t * g.tot) AS dv
           FROM w JOIN g ON w.event_type = g.event_type
           WHERE w.t < g.n),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY event_type
               ORDER BY dv DESC, d) AS rk
           FROM dev)
         SELECT event_type, n AS n_days, d AS cp_day,
           round(cast(dv AS double) / (cast(n AS double) * 100.0), 2)
             + 0.0 AS cusum_peak,
           round(cast(s AS double) / (cast(t AS double) * 100.0), 6)
             + 0.0 AS mean_before,
           round(cast(tot - s AS double)
             / (cast(n - t AS double) * 100.0), 6) + 0.0 AS mean_after
         FROM r WHERE rk = 1""",
    // ANOVA F: exact integer-cents moments, 4-dp rounded S²/n terms
    // exactly summed (no float summation-order freedom at k=5)
    "q342_anova_f" ->
      """WITH cell AS (
           SELECT o_orderstatus, o_orderpriority,
             cast(count(*) AS bigint) AS n,
             cast(sum(cast(cast(o_totalprice AS decimal(18,2)) * 100
               AS bigint)) AS bigint) AS s,
             sum(cast(cast(cast(o_totalprice AS decimal(18,2)) * 100
               AS bigint) AS hugeint)
               * cast(cast(o_totalprice AS decimal(18,2)) * 100 AS bigint))
               AS q
           FROM orders GROUP BY 1, 2),
         terms AS (
           SELECT o_orderstatus, n, s, q,
             cast(round(cast(s AS double) * cast(s AS double)
               / cast(n AS double), 4) AS decimal(38,4)) AS a_term
           FROM cell),
         st AS (
           SELECT o_orderstatus,
             cast(count(*) AS bigint) AS k_groups,
             cast(sum(n) AS bigint) AS n,
             cast(sum(s) AS hugeint) AS s_tot,
             sum(cast(q AS hugeint)) AS q_tot,
             sum(a_term) AS a
           FROM terms GROUP BY 1)
         SELECT o_orderstatus, k_groups, n,
           round((cast(a AS double) - cast(s_tot AS double)
               * cast(s_tot AS double) / cast(n AS double)) / 10000.0, 2)
             + 0.0 AS ss_between,
           round((cast(q_tot AS double) - cast(a AS double)) / 10000.0, 2)
             + 0.0 AS ss_within,
           round(((cast(a AS double) - cast(s_tot AS double)
               * cast(s_tot AS double) / cast(n AS double))
               / cast(k_groups - 1 AS double))
             / ((cast(q_tot AS double) - cast(a AS double))
               / cast(n - k_groups AS double)), 6) + 0.0 AS f_stat
         FROM st""",
    // Kendall tau-b: exact sign comparisons over the bounded-series
    // self-join; IEEE sqrt only in the final normalization
    "q343_kendall_tau" ->
      """WITH monthly AS (
           SELECT date_trunc('month', o_orderdate) AS m,
             sum(cast(o_totalprice AS decimal(18,2))) AS rev,
             cast(count(*) AS bigint) AS cnt
           FROM orders GROUP BY 1),
         seq AS (SELECT m, rev, cnt, row_number() OVER (ORDER BY m) AS i
           FROM monthly),
         pairs AS (
           SELECT a.rev AS xa, a.cnt AS ya, b.rev AS xb, b.cnt AS yb
           FROM seq a JOIN seq b ON a.i < b.i),
         agg AS (
           SELECT
             cast(count(*) AS bigint) AS n0,
             cast(sum(CASE WHEN (xa < xb AND ya < yb)
               OR (xa > xb AND ya > yb) THEN 1 ELSE 0 END) AS bigint) AS c,
             cast(sum(CASE WHEN (xa < xb AND ya > yb)
               OR (xa > xb AND ya < yb) THEN 1 ELSE 0 END) AS bigint) AS d,
             cast(sum(CASE WHEN xa = xb THEN 1 ELSE 0 END) AS bigint)
               AS tx,
             cast(sum(CASE WHEN ya = yb THEN 1 ELSE 0 END) AS bigint)
               AS ty
           FROM pairs),
         nm AS (SELECT cast(count(*) AS bigint) AS n_months FROM monthly)
         SELECT n_months, c AS concordant, d AS discordant,
           tx AS tied_x, ty AS tied_y,
           round(cast(c - d AS double)
             / sqrt(cast(n0 - tx AS double) * cast(n0 - ty AS double)), 6)
             + 0.0 AS tau_b
         FROM agg CROSS JOIN nm""",
    // Levene: 6-dp pinned group means, 6-dp rounded |x−mean| terms
    // exactly decimal-summed, q342's rounded-term reduction
    "q344_levene" ->
      """WITH x AS (
           SELECT o_orderstatus, o_orderpriority,
             cast(cast(o_totalprice AS decimal(18,2)) AS double) AS v
           FROM orders),
         gm AS (
           SELECT o_orderstatus, o_orderpriority,
             round(cast(sum(cast(v AS decimal(18,2))) AS double)
               / cast(count(*) AS double), 6) AS mg
           FROM x GROUP BY 1, 2),
         z AS (
           SELECT x.o_orderstatus, x.o_orderpriority,
             cast(round(abs(x.v - gm.mg), 6) AS decimal(18,6)) AS z
           FROM x JOIN gm USING (o_orderstatus, o_orderpriority)),
         cell AS (
           SELECT o_orderstatus, o_orderpriority,
             cast(count(*) AS bigint) AS n,
             sum(z) AS sz,
             sum(cast(z AS decimal(19,6)) * z) AS qz
           FROM z GROUP BY 1, 2),
         terms AS (
           SELECT o_orderstatus, n, sz, qz,
             cast(round(cast(sz AS double) * cast(sz AS double)
               / cast(n AS double), 6) AS decimal(38,6)) AS a_term
           FROM cell),
         st AS (
           SELECT o_orderstatus,
             cast(count(*) AS bigint) AS k_groups,
             cast(sum(n) AS bigint) AS n,
             cast(sum(sz) AS double) AS sz_tot,
             cast(sum(qz) AS double) AS qz_tot,
             cast(sum(a_term) AS double) AS a
           FROM terms GROUP BY 1)
         SELECT o_orderstatus, k_groups, n,
           round(((a - sz_tot * sz_tot / cast(n AS double))
               / cast(k_groups - 1 AS double))
             / ((qz_tot - a) / cast(n - k_groups AS double)), 6) + 0.0
             AS w_stat
         FROM st""",
    // phonetic blocking: the identical explicit regexp chain (RE2-safe —
    // no backreferences; runs collapse one digit class at a time)
    "q345_phonetic_blocking" ->
      """WITH w AS (
           SELECT word, cast(count(*) AS bigint) AS occ FROM (
             SELECT lower(unnest(string_split(p_name, ' '))) AS word
             FROM part
             UNION ALL
             SELECT lower(unnest(string_split(text, ' '))) AS word
             FROM documents
           ) t WHERE regexp_matches(word, '^[a-z]+$') GROUP BY 1),
         coded AS (
           SELECT word, occ,
             upper(substr(word, 1, 1)) ||
             rpad(substr(
               regexp_replace(
               regexp_replace(
               regexp_replace(
               regexp_replace(
               regexp_replace(
               regexp_replace(
               regexp_replace(
               regexp_replace(
                 regexp_replace(
                 regexp_replace(
                 regexp_replace(
                 regexp_replace(
                 regexp_replace(
                 regexp_replace(
                 regexp_replace(
                   regexp_replace(substr(word, 2), '[hw]', '', 'g'),
                   '[bfpv]', '1', 'g'),
                   '[cgjkqsxz]', '2', 'g'),
                   '[dt]', '3', 'g'),
                   'l', '4', 'g'),
                   '[mn]', '5', 'g'),
                   'r', '6', 'g'),
                   '[aeiouy]', '0', 'g'),
                 '0{2,}', '0', 'g'),
                 '1{2,}', '1', 'g'),
                 '2{2,}', '2', 'g'),
                 '3{2,}', '3', 'g'),
                 '4{2,}', '4', 'g'),
                 '5{2,}', '5', 'g'),
                 '6{2,}', '6', 'g'),
               '0', '', 'g'), 1, 3), 3, '0') AS code
           FROM w)
         SELECT code,
           cast(count(*) AS bigint) AS n_distinct_words,
           cast(sum(occ) AS bigint) AS n_occurrences,
           min(word) AS example_a,
           max(word) AS example_b,
           count(*) > 1 AS is_block_collision
         FROM coded
         GROUP BY 1""",
    // price indices: 6-dp pinned unit prices → exact Σp·q decimal sums;
    // base-year basket joined on the part dimension
    "q346_price_index" ->
      """WITH py AS (
           SELECT cast(year(o_orderdate) AS int) AS yr, l_partkey,
             sum(cast(l_quantity AS decimal(18,2))) AS q,
             cast(round(cast(sum(cast(l_extendedprice AS decimal(18,2)))
                 AS double)
               / cast(sum(cast(l_quantity AS decimal(18,2))) AS double), 6)
               AS decimal(19,6)) AS p
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY 1, 2),
         base AS (SELECT cast(min(yr) AS int) AS y0 FROM py),
         b AS (SELECT l_partkey, q AS q0, p AS p0 FROM py CROSS JOIN base
           WHERE yr = y0),
         agg AS (
           SELECT py.yr, cast(count(*) AS bigint) AS n_common_parts,
             sum(py.p * b.q0) AS pq0, sum(b.p0 * b.q0) AS p0q0,
             sum(py.p * py.q) AS pq, sum(b.p0 * py.q) AS p0q
           FROM py JOIN b USING (l_partkey) GROUP BY 1)
         SELECT yr, n_common_parts,
           round(cast(pq0 AS double) / cast(p0q0 AS double), 6) + 0.0
             AS laspeyres,
           round(cast(pq AS double) / cast(p0q AS double), 6) + 0.0
             AS paasche,
           round(sqrt((cast(pq0 AS double) / cast(p0q0 AS double))
             * (cast(pq AS double) / cast(p0q AS double))), 6) + 0.0
             AS fisher
         FROM agg""",
    // CCF: exact integer-cents moments per lag, one double division each
    "q347_cross_correlation" ->
      """WITH x AS (
           SELECT cast(ts AS date) AS dx,
             cast(sum(cast(cast(value AS decimal(18,2)) * 100 AS bigint))
               AS bigint) AS xv
           FROM events WHERE event_type = 'click' GROUP BY 1),
         y AS (
           SELECT cast(ts AS date) AS dy,
             cast(sum(cast(cast(value AS decimal(18,2)) * 100 AS bigint))
               AS bigint) AS yv
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
         lags AS (SELECT unnest(generate_series(-3, 3)) AS lag),
         pairs AS (
           SELECT l.lag, x.xv, y.yv
           FROM lags l
           JOIN x ON true
           JOIN y ON y.dy = x.dx + to_days(cast(l.lag AS int))),
         m AS (
           SELECT lag, cast(count(*) AS bigint) AS n,
             cast(sum(xv) AS bigint) AS sx, cast(sum(yv) AS bigint) AS sy,
             sum(cast(xv AS hugeint) * yv) AS sxy,
             sum(cast(xv AS hugeint) * xv) AS sxx,
             sum(cast(yv AS hugeint) * yv) AS syy
           FROM pairs GROUP BY 1)
         SELECT cast(lag AS int) AS lag, n AS n_days,
           round((cast(n AS double) * cast(sxy AS double)
               - cast(sx AS double) * cast(sy AS double))
             / sqrt((cast(n AS double) * cast(sxx AS double)
                 - cast(sx AS double) * cast(sx AS double))
               * (cast(n AS double) * cast(syy AS double)
                 - cast(sy AS double) * cast(sy AS double))), 6) + 0.0
             AS ccf
         FROM m""",
    // Hill: deterministic top-501 order statistics, 9-dp rounded ln
    // terms exactly summed (q322/q331 libm-boundary discipline)
    "q348_hill_tail" ->
      """WITH top AS (
           SELECT cast(o_totalprice AS decimal(18,2)) AS v,
             row_number() OVER (ORDER BY
               cast(o_totalprice AS decimal(18,2)) DESC, o_orderkey)
               AS rk
           FROM orders
           ORDER BY cast(o_totalprice AS decimal(18,2)) DESC, o_orderkey
           LIMIT 501),
         thr AS (SELECT cast(v AS double) AS xmin FROM top WHERE rk = 501),
         terms AS (
           SELECT cast(round(ln(cast(v AS double) / xmin), 9)
             AS decimal(18,9)) AS term
           FROM top CROSS JOIN thr WHERE rk <= 500)
         SELECT cast(500 AS bigint) AS k,
           round(xmin, 2) + 0.0 AS x_min,
           round(500.0 / cast(sum(term) AS double), 6) + 0.0 AS hill_alpha
         FROM terms CROSS JOIN thr
         GROUP BY xmin""",
    // McNemar: exact anti/semi self-joins on the distinct activity table
    // — no user×day grid at any scale
    "q349_mcnemar" ->
      """WITH a AS (
           SELECT DISTINCT event_type, user_id, cast(ts AS date) AS d
           FROM events),
         bounds AS (
           SELECT min(cast(ts AS date)) AS d0, max(cast(ts AS date)) AS d1
           FROM events),
         b_cnt AS (
           SELECT x.event_type, cast(count(*) AS bigint) AS b
           FROM a x CROSS JOIN bounds
           WHERE x.d < d1 AND NOT EXISTS (
             SELECT 1 FROM a y WHERE y.event_type = x.event_type
               AND y.user_id = x.user_id AND y.d = x.d + to_days(1))
           GROUP BY 1),
         c_cnt AS (
           SELECT x.event_type, cast(count(*) AS bigint) AS c
           FROM a x CROSS JOIN bounds
           WHERE x.d > d0 AND NOT EXISTS (
             SELECT 1 FROM a y WHERE y.event_type = x.event_type
               AND y.user_id = x.user_id AND y.d = x.d - to_days(1))
           GROUP BY 1),
         both_cnt AS (
           SELECT x.event_type, cast(count(*) AS bigint) AS n_both
           FROM a x JOIN a y ON y.event_type = x.event_type
             AND y.user_id = x.user_id AND y.d = x.d + to_days(1)
           GROUP BY 1)
         SELECT event_type, b AS active_then_gone, c AS gone_then_active,
           n_both,
           round(cast((b - c) * (b - c) AS double) / cast(b + c AS double),
             6) + 0.0 AS chi2_mcnemar
         FROM b_cnt JOIN c_cnt USING (event_type)
           JOIN both_cnt USING (event_type)""",
    // DSO: exact decimal totals, one global span, mirrored divisions
    "q350_dso" ->
      """WITH span AS (
           SELECT cast(date_diff('day', min(cast(o_orderdate AS date)),
             max(cast(o_orderdate AS date))) + 1 AS bigint) AS n_days
           FROM orders),
         g AS (
           SELECT o_orderpriority,
             sum(CASE WHEN o_orderstatus = 'O'
               THEN cast(o_totalprice AS decimal(18,2))
               ELSE cast(0 AS decimal(18,2)) END) AS open_ar,
             sum(cast(o_totalprice AS decimal(18,2))) AS rev
           FROM orders GROUP BY 1)
         SELECT o_orderpriority,
           round(cast(open_ar AS double), 2) + 0.0 AS open_ar,
           round(cast(rev AS double) / cast(n_days AS double), 2) + 0.0
             AS daily_revenue,
           round(cast(open_ar AS double)
             / (cast(rev AS double) / cast(n_days AS double)), 2) + 0.0
             AS dso_days
         FROM g CROSS JOIN span""",
    // Heaps: checkpoints are count arithmetic (dense doc_ids), vocab by
    // first-occurrence doc, tokens by per-doc counts — no corpus sort
    "q351_heaps_law" ->
      """WITH n1 AS (SELECT cast(count(*) AS bigint) AS n FROM documents),
         cps AS (SELECT cast(unnest(generate_series(1, 10)) AS int)
           AS checkpoint),
         thr AS (SELECT checkpoint, (n * checkpoint) // 10 AS t
           FROM cps CROSS JOIN n1),
         toks AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS w
           FROM documents),
         tok AS (SELECT doc_id, w FROM toks WHERE w <> ''),
         fs AS (SELECT w, min(doc_id) AS fd FROM tok GROUP BY 1),
         dt AS (SELECT doc_id, cast(count(*) AS bigint) AS c FROM tok
           GROUP BY 1),
         v AS (SELECT checkpoint, t,
             cast(count(CASE WHEN fd < t THEN 1 END) AS bigint)
               AS vocab_size
           FROM fs CROSS JOIN thr GROUP BY 1, 2),
         tk AS (SELECT checkpoint,
             cast(coalesce(sum(CASE WHEN doc_id < t THEN c END), 0)
               AS bigint) AS n_tokens_seen
           FROM dt CROSS JOIN thr GROUP BY 1)
         SELECT v.checkpoint, cast(v.t AS bigint) AS n_docs_seen,
           tk.n_tokens_seen, v.vocab_size
         FROM v JOIN tk USING (checkpoint)""",
    // assortativity: exact integer degree moments over the distinct edge
    // set, hugeint products, one double division
    "q352_assortativity" ->
      """WITH e AS (
           SELECT DISTINCT o_custkey AS c, l_suppkey AS s
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         dc AS (SELECT c, cast(count(*) AS bigint) AS degc FROM e
           GROUP BY 1),
         ds AS (SELECT s, cast(count(*) AS bigint) AS degs FROM e
           GROUP BY 1),
         j AS (SELECT degc AS x, degs AS y
           FROM e JOIN dc USING (c) JOIN ds USING (s)),
         m AS (
           SELECT cast(count(*) AS bigint) AS n,
             cast(sum(x) AS bigint) AS sx, cast(sum(y) AS bigint) AS sy,
             sum(cast(x AS hugeint) * y) AS sxy,
             sum(cast(x AS hugeint) * x) AS sxx,
             sum(cast(y AS hugeint) * y) AS syy
           FROM j)
         SELECT n AS n_edges,
           round(cast(sx AS double) / cast(n AS double), 6) + 0.0
             AS mean_deg_cust,
           round(cast(sy AS double) / cast(n AS double), 6) + 0.0
             AS mean_deg_supp,
           round((cast(n AS double) * cast(sxy AS double)
               - cast(sx AS double) * cast(sy AS double))
             / sqrt((cast(n AS double) * cast(sxx AS double)
                 - cast(sx AS double) * cast(sx AS double))
               * (cast(n AS double) * cast(syy AS double)
                 - cast(sy AS double) * cast(sy AS double))), 6) + 0.0
             AS assortativity
         FROM m""",
    // clustering: q120's oriented-wedge triangle CTEs + the closure
    // aggregate (global 3T/W, 6-dp rounded local ratios exactly summed)
    "q353_clustering_coeff" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
           FROM lineitem WHERE l_orderkey % 10 = 0),
         und AS (SELECT DISTINCT x.sk AS a, y.sk AS b
           FROM li x JOIN li y ON x.ok = y.ok AND x.sk < y.sk),
         deg AS (SELECT v, count(*) AS d FROM (
             SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und) z
           GROUP BY 1),
         o AS (SELECT
             CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
               THEN u.a ELSE u.b END AS src,
             CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
               THEN u.b ELSE u.a END AS dst,
             CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
               THEN db.d ELSE da.d END AS dd
           FROM und u JOIN deg da ON u.a = da.v JOIN deg db
             ON u.b = db.v),
         w AS (SELECT e1.src AS u, e1.dst AS v, e2.dst AS w2
           FROM o e1 JOIN o e2 ON e1.src = e2.src
            AND (e1.dd < e2.dd OR (e1.dd = e2.dd AND e1.dst < e2.dst))),
         tr AS (SELECT w.u, w.v, w.w2 FROM w JOIN o e3
           ON w.v = e3.src AND w.w2 = e3.dst),
         n AS (SELECT unnest([u, v, w2]) AS node FROM tr),
         t AS (SELECT node, count(*) AS triangles FROM n GROUP BY 1),
         pn AS (SELECT deg.v AS node, cast(deg.d AS bigint) AS degree,
             cast(coalesce(t.triangles, 0) AS bigint) AS tri
           FROM deg LEFT JOIN t ON deg.v = t.node),
         agg AS (
           SELECT cast(count(*) AS bigint) AS n_nodes,
             cast(sum(degree * (degree - 1)) AS bigint) AS dd2,
             cast(sum(tri) AS bigint) AS tri3,
             sum(CASE WHEN degree >= 2 THEN
               cast(round(cast(2 * tri AS double)
                 / cast(degree * (degree - 1) AS double), 6)
                 AS decimal(18,6)) END) AS lc_sum,
             cast(count(CASE WHEN degree >= 2 THEN 1 END) AS bigint)
               AS n_ge2
           FROM pn)
         SELECT n_nodes, dd2 // 2 AS n_wedges, tri3 // 3
             AS total_triangles,
           round(cast(tri3 AS double) / cast(dd2 AS double) * 2.0, 6)
             + 0.0 AS global_cc,
           round(cast(lc_sum AS double) / cast(n_ge2 AS double), 6) + 0.0
             AS avg_local_cc
         FROM agg""",
    // Fellegi–Sunter: customer-blocked match pairs, 512-order md5-rank
    // nonmatch budget; ln of the 6-dp ROUNDED probabilities
    "q354_linkage_weights" ->
      """WITH mp AS (
           SELECT cast(count(*) AS bigint) AS n,
             cast(sum(CASE WHEN a.o_orderpriority = b.o_orderpriority
               THEN 1 ELSE 0 END) AS bigint) AS ap,
             cast(sum(CASE WHEN a.o_orderstatus = b.o_orderstatus
               THEN 1 ELSE 0 END) AS bigint) AS ast,
             cast(sum(CASE WHEN month(a.o_orderdate) =
               month(b.o_orderdate) THEN 1 ELSE 0 END) AS bigint) AS am
           FROM orders a JOIN orders b
             ON a.o_custkey = b.o_custkey
             AND a.o_orderkey < b.o_orderkey),
         samp AS (
           SELECT o_orderkey, o_custkey, o_orderpriority, o_orderstatus,
             o_orderdate
           FROM orders
           ORDER BY md5(cast(o_orderkey AS varchar)), o_orderkey
           LIMIT 512),
         up AS (
           SELECT cast(count(*) AS bigint) AS n,
             cast(sum(CASE WHEN a.o_orderpriority = b.o_orderpriority
               THEN 1 ELSE 0 END) AS bigint) AS ap,
             cast(sum(CASE WHEN a.o_orderstatus = b.o_orderstatus
               THEN 1 ELSE 0 END) AS bigint) AS ast,
             cast(sum(CASE WHEN month(a.o_orderdate) =
               month(b.o_orderdate) THEN 1 ELSE 0 END) AS bigint) AS am
           FROM samp a JOIN samp b
             ON a.o_orderkey < b.o_orderkey
             AND a.o_custkey <> b.o_custkey),
         f AS (
           SELECT 'priority' AS field, mp.ap AS ma, mp.n AS mn,
             up.ap AS ua, up.n AS un FROM mp CROSS JOIN up
           UNION ALL
           SELECT 'status', mp.ast, mp.n, up.ast, up.n
           FROM mp CROSS JOIN up
           UNION ALL
           SELECT 'month', mp.am, mp.n, up.am, up.n
           FROM mp CROSS JOIN up)
         SELECT field,
           mn AS n_match_pairs, un AS n_nonmatch_pairs,
           round(cast(ma AS double) / cast(mn AS double), 6) + 0.0
             AS m_prob,
           round(cast(ua AS double) / cast(un AS double), 6) + 0.0
             AS u_prob,
           round(ln((round(cast(ma AS double) / cast(mn AS double), 6)
               + 0.0)
               / (round(cast(ua AS double) / cast(un AS double), 6)
                 + 0.0))
             / ln(cast(2.0 AS double)), 6) + 0.0 AS log2_weight
         FROM f""",
    // Fano: exact integer moments of (user, day) counts per stream
    "q355_fano_burstiness" ->
      """WITH c AS (
           SELECT event_type, user_id, cast(ts AS date) AS d,
             cast(count(*) AS bigint) AS c
           FROM events GROUP BY 1, 2, 3),
         m AS (
           SELECT event_type, cast(count(*) AS bigint) AS n,
             cast(sum(c) AS bigint) AS s,
             cast(sum(c * c) AS bigint) AS q
           FROM c GROUP BY 1)
         SELECT event_type, n AS n_cells,
           round(cast(s AS double) / cast(n AS double), 6) + 0.0
             AS mean_count,
           round((cast(q AS double) - cast(s AS double) * cast(s AS double)
               / cast(n AS double)) / cast(n AS double), 6) + 0.0
             AS var_count,
           round((cast(n AS double) * cast(q AS double)
               - cast(s AS double) * cast(s AS double))
             / (cast(n AS double) * cast(s AS double)), 6) + 0.0
             AS fano_factor
         FROM m""",
    // lognormal MoM: 9-dp rounded-ln decimal moments; exp of the 6-dp
    // rounded mean so both engines exponentiate the identical double
    "q356_lognormal_fit" ->
      """WITH l AS (
           SELECT o_orderpriority,
             cast(round(ln(cast(cast(o_totalprice AS decimal(18,2))
               AS double)), 9) AS decimal(18,9)) AS lv
           FROM orders),
         m AS (
           SELECT o_orderpriority, cast(count(*) AS bigint) AS n,
             sum(lv) AS sl,
             sum(cast(lv AS decimal(19,9)) * lv) AS ql
           FROM l GROUP BY 1)
         SELECT o_orderpriority, n,
           round(cast(sl AS double) / cast(n AS double), 6) + 0.0
             AS mu_hat,
           round(sqrt((cast(ql AS double) - cast(sl AS double)
               * cast(sl AS double) / cast(n AS double))
             / cast(n AS double)), 6) + 0.0 AS sigma_hat,
           round(exp(round(cast(sl AS double) / cast(n AS double), 6)), 2)
             + 0.0 AS median_hat
         FROM m""",
    // Cochran's Q: exact integer user×week activity moments
    "q357_cochran_q" ->
      """WITH d0 AS (SELECT min(cast(ts AS date)) AS d0 FROM events),
         marks AS (
           SELECT DISTINCT user_id,
             date_diff('day', d0, cast(ts AS date)) // 7 AS wk
           FROM events CROSS JOIN d0
           WHERE event_type = 'purchase'
             AND date_diff('day', d0, cast(ts AS date)) // 7 <= 3),
         lrow AS (SELECT user_id, cast(count(*) AS bigint) AS l
           FROM marks GROUP BY 1),
         gcol AS (SELECT wk, cast(count(*) AS bigint) AS g FROM marks
           GROUP BY 1),
         m AS (
           SELECT (SELECT cast(count(*) AS bigint) FROM lrow) AS n_users,
             (SELECT cast(sum(l) AS bigint) FROM lrow) AS t,
             (SELECT cast(sum(l * l) AS bigint) FROM lrow) AS sl2,
             (SELECT cast(sum(g * g) AS bigint) FROM gcol) AS sg2)
         SELECT cast(4 AS int) AS k_periods, n_users, t AS total_marks,
           sl2 AS sum_l_sq, sg2 AS sum_g_sq,
           round(cast(3 * (4 * sg2 - t * t) AS double)
             / cast(4 * t - sl2 AS double), 6) + 0.0 AS cochran_q
         FROM m""",
    // LM-Dirichlet: q96's inverted-index probe shape, Zhai-Lafferty
    // rank-equivalent scoring, integer products inside the ln
    "q358_lm_dirichlet" ->
      """WITH q(query_id, query_text) AS (VALUES
             (1, 'spark window join'), (2, 'hash table scan merge'),
             (3, 'vector stream filter customer')),
         tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
           FROM documents),
         tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
         tf AS (SELECT doc_id, term, cast(count(*) AS bigint) AS tf
           FROM tok2 GROUP BY 1, 2),
         dl AS (SELECT doc_id, cast(sum(tf) AS bigint) AS dl FROM tf
           GROUP BY 1),
         cf AS (SELECT term, cast(count(*) AS bigint) AS cf FROM tok2
           GROUP BY 1),
         ct AS (SELECT cast(count(*) AS bigint) AS ctot FROM tok2),
         qt AS (SELECT DISTINCT query_id, term FROM (
             SELECT cast(query_id AS bigint) AS query_id,
               unnest(string_split(query_text, ' ')) AS term FROM q) x
           WHERE term <> ''),
         qm AS (SELECT qt.query_id, qt.term, cf.cf FROM qt JOIN cf
           USING (term)),
         qn AS (SELECT query_id, cast(count(*) AS bigint) AS nq
           FROM qm GROUP BY 1),
         sc AS (
           SELECT qm.query_id, tf.doc_id,
             cast(round(ln(1.0 + cast(tf.tf * ct.ctot AS double)
               / cast(2000 * qm.cf AS double)), 6) AS decimal(18,6)) AS s
           FROM qm JOIN tf USING (term), ct),
         agg AS (SELECT query_id, doc_id, sum(s) AS ssum
           FROM sc GROUP BY 1, 2),
         scored AS (
           SELECT agg.query_id, agg.doc_id,
             round(cast(agg.ssum AS double)
               + cast(qn.nq AS double)
                 * (round(ln(cast(2000 AS double)
                     / cast(dl.dl + 2000 AS double)), 6) + 0.0), 6) + 0.0
               AS score
           FROM agg JOIN qn USING (query_id) JOIN dl USING (doc_id))
         SELECT query_id, doc_id, score, rank FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY score DESC, doc_id) AS rank FROM scored) r
         WHERE rank <= 10""",
    // Hurst R/S: 6-dp pinned block means, sequential-frame running
    // deviations, exact-cents block stds, exact-decimal 3-point slope
    "q359_hurst_rs" ->
      """WITH monthly AS (
           SELECT date_trunc('month', o_orderdate) AS m,
             sum(cast(o_totalprice AS decimal(18,2))) AS rev
           FROM orders GROUP BY 1),
         seq AS (SELECT rev, row_number() OVER (ORDER BY m) AS i
           FROM monthly),
         ws AS (SELECT unnest([10, 20, 40]) AS w),
         blocks AS (
           SELECT ws.w, (seq.i - 1) // ws.w AS blk, seq.i,
             cast(rev * 100 AS bigint) AS cents
           FROM seq CROSS JOIN ws
           WHERE seq.i <= ((SELECT count(*) FROM seq) // ws.w) * ws.w),
         bm AS (
           SELECT w, blk, cast(count(*) AS bigint) AS n,
             cast(sum(cents) AS bigint) AS s,
             sum(cast(cents AS hugeint) * cents) AS q,
             round(cast(sum(cents) AS double)
               / (cast(count(*) AS double) * 100.0), 6) AS mean6
           FROM blocks GROUP BY 1, 2),
         dev AS (
           SELECT b.w, b.blk, b.i,
             sum(cast(b.cents AS double) / 100.0 - bm.mean6)
               OVER (PARTITION BY b.w, b.blk ORDER BY b.i
                 ROWS UNBOUNDED PRECEDING) AS cum
           FROM blocks b JOIN bm ON b.w = bm.w AND b.blk = bm.blk),
         rpart AS (SELECT w, blk, max(cum) - min(cum) AS r FROM dev
           GROUP BY 1, 2),
         rs AS (
           SELECT rpart.w, rpart.blk, rpart.r,
             sqrt((cast(bm.q AS double) - cast(bm.s AS double)
                 * cast(bm.s AS double) / cast(bm.n AS double))
               / cast(bm.n AS double)) / 100.0 AS sd
           FROM rpart JOIN bm ON rpart.w = bm.w AND rpart.blk = bm.blk),
         mrs AS (
           SELECT w, cast(count(*) AS bigint) AS n_blocks,
             round(cast(sum(cast(round(r / sd, 6) AS decimal(18,6)))
                 AS double)
               / cast(count(*) AS double), 6) AS mean_rs
           FROM rs GROUP BY 1),
         pts AS (
           SELECT cast(round(ln(cast(w AS double)), 9) AS decimal(18,9))
               AS x,
             cast(round(ln(mean_rs), 9) AS decimal(18,9)) AS y
           FROM mrs),
         fit AS (
           SELECT (3.0 * cast(sum(cast(x AS decimal(19,9)) * y) AS double)
               - cast(sum(x) AS double) * cast(sum(y) AS double))
             / (3.0 * cast(sum(cast(x AS decimal(19,9)) * x) AS double)
               - cast(sum(x) AS double) * cast(sum(x) AS double))
               AS slope
           FROM pts)
         SELECT mrs.w AS window_size, mrs.n_blocks,
           mrs.mean_rs + 0.0 AS mean_rs,
           round(fit.slope, 6) + 0.0 AS hurst_exponent
         FROM mrs CROSS JOIN fit""",
    // negative binomial MoM over per-customer order counts; r/p defined
    // only when genuinely overdispersed (v > m)
    "q360_negbin_fit" ->
      """WITH c AS (SELECT o_custkey, cast(count(*) AS bigint) AS c
           FROM orders GROUP BY 1),
         m AS (SELECT cast(count(*) AS bigint) AS n,
             cast(sum(c) AS bigint) AS s,
             cast(sum(c * c) AS bigint) AS q FROM c),
         mv AS (SELECT n,
             cast(s AS double) / cast(n AS double) AS mean,
             (cast(q AS double) - cast(s AS double) * cast(s AS double)
               / cast(n AS double)) / cast(n AS double) AS var
           FROM m)
         SELECT n AS n_customers,
           round(mean, 6) + 0.0 AS mean_orders,
           round(var, 6) + 0.0 AS var_orders,
           CASE WHEN var > mean
             THEN round(mean * mean / (var - mean), 6) + 0.0 END AS r_hat,
           CASE WHEN var > mean
             THEN round(mean / var, 6) + 0.0 END AS p_hat
         FROM mv""",
    // Good-Turing: bigram frequency-of-frequencies (q119's adjacency —
    // empties filtered BEFORE pairing), unseen mass N1/N
    "q361_good_turing" ->
      """WITH d AS (SELECT list_filter(string_split(text, ' '),
             t -> t <> '') AS toks
           FROM documents),
         nn AS (SELECT toks, len(toks) AS n FROM d WHERE len(toks) >= 2),
         bg AS (SELECT toks[i] || ' ' || toks[i + 1] AS bg
           FROM nn, unnest(generate_series(1, n - 1)) AS t(i)),
         tf AS (SELECT bg, cast(count(*) AS bigint) AS c FROM bg
           GROUP BY 1),
         ff AS (SELECT c AS freq, cast(count(*) AS bigint) AS n_types
           FROM tf GROUP BY 1),
         tot AS (SELECT cast(sum(c) AS bigint) AS n_tokens,
             cast(count(*) AS bigint) AS vocab FROM tf),
         n1 AS (SELECT cast(coalesce(
             (SELECT n_types FROM ff WHERE freq = 1), 0) AS bigint) AS n1)
         SELECT ff.freq, ff.n_types, tot.n_tokens, tot.vocab,
           round(cast(n1.n1 AS double) / cast(tot.n_tokens AS double), 6)
             + 0.0 AS p0_unseen
         FROM ff CROSS JOIN tot CROSS JOIN n1
         WHERE ff.freq <= 10""",
    // Simpson: exact rational collision probability per source
    "q362_simpson_diversity" ->
      """WITH tok AS (
           SELECT source, unnest(string_split(text, ' ')) AS w
           FROM documents),
         tf AS (SELECT source, w, cast(count(*) AS bigint) AS c FROM tok
           WHERE w <> '' GROUP BY 1, 2),
         m AS (SELECT source, cast(count(*) AS bigint) AS vocab,
             cast(sum(c) AS bigint) AS n,
             cast(sum(c * (c - 1)) AS bigint) AS cc
           FROM tf GROUP BY 1)
         SELECT source, vocab, n AS n_tokens,
           round(cast(cc AS double)
             / (cast(n AS double) * cast(n - 1 AS double)), 6) + 0.0
             AS simpson_index,
           round(1.0 - cast(cc AS double)
             / (cast(n AS double) * cast(n - 1 AS double)), 6) + 0.0
             AS simpson_diversity
         FROM m""",
    // Durbin-Watson: 6-dp residuals, 4-dp rounded squared terms exactly
    // summed; the trend fit's y-moments are exact decimal sums
    "q363_durbin_watson" ->
      """WITH monthly AS (
           SELECT date_trunc('month', o_orderdate) AS m,
             cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS y
           FROM orders GROUP BY 1),
         seq AS (SELECT y, cast(row_number() OVER (ORDER BY m) AS bigint)
             AS t
           FROM monthly),
         fit AS (
           SELECT cast(count(*) AS bigint) AS n,
             cast(sum(t) AS bigint) AS st,
             cast(sum(t * t) AS bigint) AS stt,
             cast(sum(cast(y AS decimal(28,6))) AS double) AS sy,
             cast(sum(cast(round(cast(t AS double) * y, 4)
               AS decimal(38,4))) AS double) AS sty
           FROM seq),
         ab AS (
           SELECT n,
             (cast(n AS double) * sty - cast(st AS double) * sy)
               / (cast(n AS double) * cast(stt AS double)
                 - cast(st AS double) * cast(st AS double)) AS b,
             (sy - (cast(n AS double) * sty - cast(st AS double) * sy)
               / (cast(n AS double) * cast(stt AS double)
                 - cast(st AS double) * cast(st AS double))
               * cast(st AS double)) / cast(n AS double) AS a
           FROM fit),
         res AS (
           SELECT seq.t,
             round(seq.y - (ab.a + ab.b * cast(seq.t AS double)), 6) AS e
           FROM seq CROSS JOIN ab),
         lagd AS (
           SELECT t, e, lag(e) OVER (ORDER BY t) AS ep FROM res),
         agg AS (
           SELECT
             sum(cast(round((e - ep) * (e - ep), 4) AS decimal(38,4)))
               AS sdd,
             sum(cast(round(e * e, 4) AS decimal(38,4))) AS see,
             cast(count(*) AS bigint) AS n
           FROM lagd)
         SELECT n AS n_months,
           round(cast(sdd AS double) / cast(see AS double), 6) + 0.0
             AS durbin_watson
         FROM agg""",
    // GK gamma: bounded 15-cell contingency table, exact count products
    "q364_gk_gamma" ->
      """WITH cell AS (
           SELECT cast(substr(o_orderpriority, 1, 1) AS int) AS px,
             CASE o_orderstatus WHEN 'F' THEN 1 WHEN 'P' THEN 2
               ELSE 3 END AS sy,
             cast(count(*) AS bigint) AS c
           FROM orders GROUP BY 1, 2),
         pairs AS (
           SELECT a.px AS pxa, a.sy AS sya, b.px AS pxb, b.sy AS syb,
             a.c AS ca, b.c AS cb
           FROM cell a JOIN cell b
             ON a.px < b.px OR (a.px = b.px AND a.sy < b.sy)),
         agg AS (
           SELECT
             cast(sum(CASE WHEN (pxa < pxb AND sya < syb)
               OR (pxa > pxb AND sya > syb) THEN ca * cb ELSE 0 END)
               AS bigint) AS conc,
             cast(sum(CASE WHEN (pxa < pxb AND sya > syb)
               OR (pxa > pxb AND sya < syb) THEN ca * cb ELSE 0 END)
               AS bigint) AS disc
           FROM pairs)
         SELECT conc AS concordant, disc AS discordant,
           round(cast(conc - disc AS double)
             / cast(conc + disc AS double), 6) + 0.0 AS gk_gamma
         FROM agg""",
    // mutual information: 9-dp rounded p*ln terms over the bounded
    // 35-cell table, exactly decimal-summed
    "q365_mutual_info" ->
      """WITH e AS (SELECT event_type, cast(isodow(ts) AS int) AS dow
           FROM events),
         cell AS (SELECT event_type, dow, cast(count(*) AS bigint) AS c
           FROM e GROUP BY 1, 2),
         mx AS (SELECT event_type, cast(sum(c) AS bigint) AS cx FROM cell
           GROUP BY 1),
         my AS (SELECT dow, cast(sum(c) AS bigint) AS cy FROM cell
           GROUP BY 1),
         tot AS (SELECT cast(sum(c) AS bigint) AS n FROM cell),
         terms AS (
           SELECT cast(round(cast(cell.c AS double) / cast(tot.n AS double)
               * ln(cast(cell.c AS double) * cast(tot.n AS double)
                 / (cast(mx.cx AS double) * cast(my.cy AS double))), 9)
               AS decimal(18,9)) AS term
           FROM cell JOIN mx USING (event_type) JOIN my USING (dow)
             CROSS JOIN tot)
         SELECT cast(count(*) AS bigint) AS n_cells,
           round(cast(sum(term) AS double), 6) + 0.0 AS mutual_info_nats
         FROM terms""",
    // IPW ATE: exact rational propensities per stratum, 4-dp rounded
    // stratum terms exactly summed; degenerate strata excluded both sides
    "q366_ipw_ate" ->
      """WITH o AS (
           SELECT o_orderstatus AS st, cast(year(o_orderdate) AS int)
               AS yr,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
               AS tr,
             cast(cast(o_totalprice AS decimal(18,2)) * 100 AS bigint)
               AS yc
           FROM orders),
         s AS (
           SELECT st, yr, cast(count(*) AS bigint) AS n,
             cast(sum(tr) AS bigint) AS nt,
             cast(sum(CASE WHEN tr = 1 THEN yc ELSE 0 END) AS bigint)
               AS yt,
             cast(sum(CASE WHEN tr = 0 THEN yc ELSE 0 END) AS bigint)
               AS yc0
           FROM o GROUP BY 1, 2),
         terms AS (
           SELECT n, nt,
             cast(round((cast(yt AS double) * cast(n AS double)
                 / cast(nt AS double)
               - cast(yc0 AS double) * cast(n AS double)
                 / cast(n - nt AS double)) / 100.0, 4) AS decimal(38,4))
               AS term
           FROM s WHERE nt > 0 AND nt < n),
         tot AS (
           SELECT cast(sum(n) AS bigint) AS bign,
             cast(count(*) AS bigint) AS n_strata,
             cast(sum(nt) AS bigint) AS n_treat,
             sum(term) AS tsum
           FROM terms),
         naive AS (
           SELECT
             (cast(sum(CASE WHEN tr = 1 THEN yc ELSE 0 END) AS double)
               / cast(sum(tr) AS double)
              - cast(sum(CASE WHEN tr = 0 THEN yc ELSE 0 END) AS double)
               / cast(sum(1 - tr) AS double)) / 100.0 AS nd
           FROM o)
         SELECT bign AS n_orders, n_treat, n_strata,
           round(nd, 2) + 0.0 AS naive_diff,
           round(cast(tsum AS double) / cast(bign AS double), 2) + 0.0
             AS ipw_ate
         FROM tot CROSS JOIN naive""",
    // EB shrinkage: beta prior by MoM on the 6-dp rounded rate
    // distribution; 1-row broadcast prior, corpus streams once
    "q367_eb_shrinkage" ->
      """WITH u AS (
           SELECT user_id, cast(count(*) AS bigint) AS n,
             cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS bigint) AS k
           FROM events GROUP BY 1),
         p AS (
           SELECT user_id, n, k,
             cast(round(cast(k AS double) / cast(n AS double), 6)
               AS decimal(18,6)) AS ph
           FROM u),
         m AS (
           SELECT cast(count(*) AS bigint) AS nu, sum(ph) AS sp,
             sum(cast(ph AS decimal(19,6)) * ph) AS qp
           FROM p),
         ab AS (
           SELECT
             round(cast(sp AS double) / cast(nu AS double), 6) AS mm,
             round((cast(qp AS double) - cast(sp AS double)
               * cast(sp AS double) / cast(nu AS double))
               / cast(nu AS double), 9) AS vv
           FROM m),
         ab2 AS (
           SELECT mm, vv, round(mm * (1.0 - mm) / vv - 1.0, 6) AS s0
           FROM ab)
         SELECT p.user_id, p.n AS n_events, p.k AS n_clicks,
           cast(p.ph AS double) + 0.0 AS raw_rate,
           round((round(ab2.mm * ab2.s0, 6) + cast(p.k AS double))
             / (ab2.s0 + cast(p.n AS double)), 6) + 0.0 AS shrunk_rate
         FROM p CROSS JOIN ab2""",
    // bounce rate: q87's floor-second 1800 s gap sessions, one aggregate
    "q368_bounce_rate" ->
      """WITH t AS (
           SELECT user_id, ts, event_id,
             cast(floor(epoch(ts)) AS bigint) AS es,
             lag(cast(floor(epoch(ts)) AS bigint))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pe
           FROM events),
         s AS (
           SELECT user_id,
             cast(sum(CASE WHEN pe IS NULL OR es - pe > 1800
               THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS bigint) AS sid
           FROM t),
         g AS (SELECT user_id, sid, cast(count(*) AS bigint) AS len
           FROM s GROUP BY 1, 2),
         m AS (
           SELECT cast(count(*) AS bigint) AS n_sessions,
             cast(sum(CASE WHEN len = 1 THEN 1 ELSE 0 END) AS bigint)
               AS n_bounce,
             cast(sum(len) AS bigint) AS tot
           FROM g)
         SELECT n_sessions, n_bounce,
           round(cast(n_bounce AS double) / cast(n_sessions AS double), 6)
             + 0.0 AS bounce_rate,
           round(cast(tot AS double) / cast(n_sessions AS double), 6)
             + 0.0 AS mean_session_len
         FROM m""",
    // p95 ship delay: integer rank against the (month, delay)
    // distribution table — q316's compressed-window trick
    "q369_ship_delay_p95" ->
      """WITH d AS (
           SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m')
               AS mth,
             date_diff('day', cast(o_orderdate AS date),
               cast(l_shipdate AS date)) AS delay
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         dist AS (SELECT mth, delay, cast(count(*) AS bigint) AS c
           FROM d GROUP BY 1, 2),
         cum AS (
           SELECT mth, delay, c,
             cast(sum(c) OVER (PARTITION BY mth ORDER BY delay
               ROWS UNBOUNDED PRECEDING) AS bigint) AS cc,
             cast(sum(c) OVER (PARTITION BY mth) AS bigint) AS n
           FROM dist)
         SELECT mth AS ship_month, cast(n AS bigint) AS n_items,
           cast(min(CASE WHEN cc >= (95 * n + 99) // 100 THEN delay END)
             AS bigint) AS p95_delay_days
         FROM cum GROUP BY 1, 2""",
    // Burrows' delta: 9-dp pinned top-20 relative frequencies, z-scores
    // from exact decimal moments, mean |dz| on the bounded pair grid
    "q370_burrows_delta" ->
      """WITH tok AS (
           SELECT source, unnest(string_split(text, ' ')) AS w
           FROM documents),
         tok2 AS (SELECT source, w FROM tok WHERE w <> ''),
         topw AS (
           SELECT w FROM (
             SELECT w, cast(count(*) AS bigint) AS c,
               row_number() OVER (ORDER BY count(*) DESC, w) AS rk
             FROM tok2 GROUP BY w) x
           WHERE rk <= 20),
         sn AS (SELECT source, cast(count(*) AS bigint) AS n FROM tok2
           GROUP BY 1),
         cnt AS (
           SELECT t.source, t.w, cast(count(*) AS bigint) AS c
           FROM tok2 t JOIN topw ON t.w = topw.w
           GROUP BY 1, 2),
         f AS (
           SELECT sn.source, topw.w,
             cast(round(cast(coalesce(cnt.c, 0) AS double)
               / cast(sn.n AS double), 9) AS decimal(18,9)) AS f
           FROM sn CROSS JOIN topw
           LEFT JOIN cnt ON cnt.source = sn.source AND cnt.w = topw.w),
         ms AS (
           SELECT w, cast(count(*) AS bigint) AS ns, sum(f) AS sf,
             sum(cast(f AS decimal(19,9)) * f) AS qf
           FROM f GROUP BY 1),
         zr AS (
           SELECT f.source, f.w,
             (cast(f.f AS double) - cast(ms.sf AS double)
                 / cast(ms.ns AS double))
               / sqrt((cast(ms.qf AS double) - cast(ms.sf AS double)
                   * cast(ms.sf AS double) / cast(ms.ns AS double))
                 / cast(ms.ns AS double)) AS z0
           FROM f JOIN ms USING (w)),
         z AS (
           SELECT source, w,
             CASE WHEN z0 >= 0
               THEN floor(z0 * 1000000.0 + 0.5)
               ELSE -floor(-z0 * 1000000.0 + 0.5) END / 1000000.0 AS z
           FROM zr),
         pairs AS (
           SELECT a.source AS source_a, b.source AS source_b,
             cast(round(abs(a.z - b.z), 6) AS decimal(18,6)) AS dz
           FROM z a JOIN z b ON a.w = b.w AND a.source < b.source)
         SELECT source_a, source_b,
           floor(cast(sum(dz) AS double) / cast(count(*) AS double)
             * 1000000.0 + 0.5) / 1000000.0 + 0.0 AS burrows_delta
         FROM pairs GROUP BY 1, 2""",
    // reach profile: q145's recursive BFS + per-hop coverage aggregates
    // and the 9-dp rounded harmonic sum
    "q371_reach_profile" ->
      """WITH RECURSIVE
         p AS (SELECT DISTINCT 'c' || cast(o_custkey AS varchar) AS src,
             's' || cast(l_suppkey AS varchar) AS dst
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         ed AS (SELECT src, dst FROM p UNION ALL
           SELECT dst AS src, src AS dst FROM p),
         allv AS (SELECT cast(count(DISTINCT src) AS bigint) AS nv
           FROM ed),
         bfs(node, hops) AS (
           SELECT 'c' || cast(c_custkey AS varchar) AS node, 0 AS hops
           FROM customer WHERE c_custkey <= 5
           UNION
           SELECT e.dst, b.hops + 1 FROM bfs b JOIN ed e ON e.src = b.node
           WHERE b.hops < 4),
         d AS (SELECT node, cast(min(hops) AS int) AS hops FROM bfs
           GROUP BY node),
         lvl AS (SELECT hops, cast(count(*) AS bigint) AS n_nodes FROM d
           GROUP BY 1),
         cum AS (SELECT hops, n_nodes,
             cast(sum(n_nodes) OVER (ORDER BY hops) AS bigint)
               AS cum_reached
           FROM lvl),
         h AS (SELECT round(cast(sum(cast(round(1.0 / cast(hops AS double),
               9) AS decimal(18,9))) AS double), 6) + 0.0 AS harmonic_sum
           FROM d WHERE hops > 0)
         SELECT cum.hops, cum.n_nodes, cum.cum_reached,
           round(cast(cum.cum_reached AS double) / cast(allv.nv AS double),
             6) + 0.0 AS frac_reached,
           h.harmonic_sum
         FROM cum CROSS JOIN allv CROSS JOIN h""",
    // TF-IDF keywords: 6-dp pinned idf, doc-partitioned top-3
    "q372_tfidf_keywords" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' '))
             AS term
           FROM documents),
         tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
         tf AS (SELECT doc_id, term, cast(count(*) AS bigint) AS tf
           FROM tok2 GROUP BY 1, 2),
         dfq AS (SELECT term, cast(count(*) AS bigint) AS df FROM tf
           GROUP BY 1),
         nd AS (SELECT cast(count(*) AS bigint) AS n FROM documents),
         sc AS (
           SELECT tf.doc_id, tf.term,
             round(cast(tf.tf AS double)
               * (round(ln(cast(nd.n AS double) / cast(dfq.df AS double)),
                 6) + 0.0), 6) + 0.0 AS tfidf
           FROM tf JOIN dfq USING (term) CROSS JOIN nd),
         r AS (
           SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY tfidf DESC, term) AS rk
           FROM sc)
         SELECT doc_id, term, tfidf, cast(rk AS int) AS rank
         FROM r WHERE rk <= 3""",
    // readability: [.!?]+ sentences, vowel-group syllables (identical
    // regexp both engines), mirrored Flesch literals
    "q373_readability" ->
      """WITH sent AS (
           SELECT source, trim(s) AS s
           FROM (SELECT source,
               unnest(string_split_regex(text, '[.!?]+')) AS s
             FROM documents) x
           WHERE trim(s) <> ''),
         words AS (
           SELECT source, w FROM (
             SELECT source, unnest(string_split(s, ' ')) AS w FROM sent) y
           WHERE w <> ''),
         syl AS (
           SELECT source, w,
             greatest(cast(len(regexp_extract_all(lower(w), '[aeiouy]+'))
               AS bigint), 1) AS sy
           FROM words),
         sc AS (SELECT source, cast(count(*) AS bigint) AS n_sentences
           FROM sent GROUP BY 1),
         wc AS (SELECT source, cast(count(*) AS bigint) AS n_words,
             cast(sum(sy) AS bigint) AS n_syllables
           FROM syl GROUP BY 1)
         SELECT sc.source, sc.n_sentences, wc.n_words, wc.n_syllables,
           round(206.835
             - 1.015 * (cast(wc.n_words AS double)
               / cast(sc.n_sentences AS double))
             - 84.6 * (cast(wc.n_syllables AS double)
               / cast(wc.n_words AS double)), 6) + 0.0 AS flesch_score
         FROM sc JOIN wc USING (source)""",
    // minhash accuracy: q37's signatures, q36's exact verify, k-prefix
    // estimators; floor-mean (q370 midpoint lesson)
    "q374_minhash_accuracy" ->
      """WITH t0 AS (SELECT doc_id, string_split(text,' ') AS w
           FROM documents),
         toks AS (SELECT doc_id, list_distinct(list_transform(
             generate_series(1, len(w)-2),
             i -> array_to_string(w[i:i+2], ' '))) AS t
           FROM t0 WHERE len(w) >= 3),
         hs AS (SELECT doc_id, list_transform(t,
             tok -> ('0x' || substr(md5(tok), 1, 15))::bigint % 1000000007)
             AS h
           FROM toks),
         sig AS (SELECT doc_id, list_transform(generate_series(0, 31),
             i -> list_min(list_transform(h,
               x -> (x*(i*2+3) + (i*5+7)) % 1000000007))) AS s
           FROM hs),
         bands AS (SELECT doc_id, b AS band_id,
             md5(array_to_string(s[b*4+1 : b*4+4], ',')) AS band_hash
           FROM sig, unnest(generate_series(0, 7)) AS u(b)),
         cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM bands a JOIN bands b ON a.band_id = b.band_id
             AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
         ex AS (
           SELECT doc_a, doc_b,
             cast(len(list_intersect(sa.t, sb.t)) AS double)
               / (len(sa.t) + len(sb.t) - len(list_intersect(sa.t, sb.t)))
               AS jaccard
           FROM cand JOIN toks sa ON sa.doc_id = doc_a
             JOIN toks sb ON sb.doc_id = doc_b),
         ks AS (SELECT unnest([8, 16, 32]) AS k),
         est AS (
           SELECT ks.k, ex.doc_a, ex.doc_b,
             cast(round(abs(
               cast(list_sum(list_transform(generate_series(1, ks.k),
                 i -> CASE WHEN sa.s[i] = sb.s[i] THEN 1 ELSE 0 END))
                 AS double) / cast(ks.k AS double)
               - ex.jaccard), 6) AS decimal(18,6)) AS err
           FROM ex JOIN sig sa ON sa.doc_id = ex.doc_a
             JOIN sig sb ON sb.doc_id = ex.doc_b
             CROSS JOIN ks)
         SELECT cast(k AS int) AS k_hashes,
           cast(count(*) AS bigint) AS n_pairs,
           floor(cast(sum(err) AS double) / cast(count(*) AS double)
             * 1000000.0 + 0.5) / 1000000.0 + 0.0 AS mean_abs_err
         FROM est GROUP BY 1""",
    "q375_ipf_raking" -> IpfOracleSql,
    // DiD: four exact-cents cell means, one mirrored contrast
    "q376_diff_in_diff" ->
      """WITH b AS (SELECT min(cast(ts AS date)) AS d0 FROM events),
         pre AS (
           SELECT user_id, cast(count(*) AS bigint) AS np
           FROM events CROSS JOIN b
           WHERE event_type = 'purchase'
             AND cast(ts AS date) < d0 + to_days(15)
           GROUP BY 1),
         treat AS (SELECT user_id FROM pre WHERE np >= 7),
         x AS (
           SELECT CASE WHEN t.user_id IS NOT NULL THEN 1 ELSE 0 END AS tr,
             CASE WHEN cast(e.ts AS date) < b.d0 + to_days(15) THEN 0
               ELSE 1 END AS post,
             cast(cast(e.value AS decimal(18,2)) * 100 AS bigint) AS yc
           FROM events e CROSS JOIN b
             LEFT JOIN treat t ON e.user_id = t.user_id
           WHERE e.event_type = 'click'),
         cells AS (
           SELECT tr, post, cast(count(*) AS bigint) AS n,
             cast(sum(yc) AS bigint) AS s
           FROM x GROUP BY 1, 2),
         m AS (
           SELECT
             max(CASE WHEN tr=1 AND post=0 THEN cast(s AS double)
               / cast(n AS double) / 100.0 END) AS t_pre,
             max(CASE WHEN tr=1 AND post=1 THEN cast(s AS double)
               / cast(n AS double) / 100.0 END) AS t_post,
             max(CASE WHEN tr=0 AND post=0 THEN cast(s AS double)
               / cast(n AS double) / 100.0 END) AS c_pre,
             max(CASE WHEN tr=0 AND post=1 THEN cast(s AS double)
               / cast(n AS double) / 100.0 END) AS c_post,
             cast(sum(n) AS bigint) AS n_obs
           FROM cells)
         SELECT n_obs,
           round(t_pre, 6) + 0.0 AS treat_pre,
           round(t_post, 6) + 0.0 AS treat_post,
           round(c_pre, 6) + 0.0 AS ctrl_pre,
           round(c_post, 6) + 0.0 AS ctrl_post,
           round((t_post - t_pre) - (c_post - c_pre), 6) + 0.0
             AS did_estimate
         FROM m""",
    // key gaps: bucketed windows + compressed cross-bucket lead
    "q377_key_gaps" ->
      """WITH k AS (SELECT o_orderkey AS key, o_orderkey // 8192 AS b
           FROM orders WHERE o_orderstatus = 'F'),
         w AS (SELECT key, b,
             lead(key) OVER (PARTITION BY b ORDER BY key) AS nk
           FROM k),
         intra AS (SELECT nk - key - 1 AS gap_len FROM w
           WHERE nk IS NOT NULL AND nk - key > 1),
         bs AS (SELECT b, min(key) AS mn, max(key) AS mx FROM k
           GROUP BY 1),
         bw AS (SELECT b, mx, lead(mn) OVER (ORDER BY b) AS nmn FROM bs),
         inter AS (SELECT nmn - mx - 1 AS gap_len FROM bw
           WHERE nmn IS NOT NULL AND nmn - mx > 1),
         allg AS (SELECT gap_len FROM intra UNION ALL
           SELECT gap_len FROM inter)
         SELECT cast(gap_len AS bigint) AS gap_len,
           cast(count(*) AS bigint) AS n_gaps,
           cast(gap_len AS bigint) * cast(count(*) AS bigint)
             AS missing_keys
         FROM allg GROUP BY gap_len""",
    // Bayes A/B: exact cents moments, A-S polynomial Φ (q331 machinery)
    "q378_bayes_ab" ->
      """WITH o AS (
           SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
               AS tr,
             cast(cast(o_totalprice AS decimal(18,2)) * 100 AS bigint)
               AS yc
           FROM orders),
         m AS (
           SELECT tr, cast(count(*) AS bigint) AS n,
             cast(sum(yc) AS bigint) AS s,
             sum(cast(yc AS hugeint) * yc) AS q
           FROM o GROUP BY 1),
         w AS (
           SELECT
             max(CASE WHEN tr = 1 THEN n END) AS nt,
             max(CASE WHEN tr = 1 THEN s END) AS st,
             max(CASE WHEN tr = 1 THEN q END) AS qt,
             max(CASE WHEN tr = 0 THEN n END) AS nc,
             max(CASE WHEN tr = 0 THEN s END) AS sc,
             max(CASE WHEN tr = 0 THEN q END) AS qc
           FROM m),
         d AS (
           SELECT nt, nc,
             cast(st AS double) / cast(nt AS double) / 100.0 AS mt,
             cast(sc AS double) / cast(nc AS double) / 100.0 AS mc,
             (cast(qt AS double) / 10000.0 - cast(nt AS double)
               * (cast(st AS double) / cast(nt AS double) / 100.0)
               * (cast(st AS double) / cast(nt AS double) / 100.0))
               / (cast(nt AS double) - 1.0) AS vt,
             (cast(qc AS double) / 10000.0 - cast(nc AS double)
               * (cast(sc AS double) / cast(nc AS double) / 100.0)
               * (cast(sc AS double) / cast(nc AS double) / 100.0))
               / (cast(nc AS double) - 1.0) AS vc
           FROM w),
         z AS (
           SELECT nt, nc, mt, mc,
             (mt - mc) / sqrt(vt / cast(nt AS double)
               + vc / cast(nc AS double)) AS z
           FROM d),
         ph AS (
           SELECT nt, nc, mt, mc, z,
             exp(-abs(z) * abs(z) / 2.0) / 2.5066282746310002
               * ((1.0 / (1.0 + 0.2316419 * abs(z)))
                 * (0.319381530 + (1.0 / (1.0 + 0.2316419 * abs(z)))
                   * (-0.356563782 + (1.0 / (1.0 + 0.2316419 * abs(z)))
                     * (1.781477937 + (1.0 / (1.0 + 0.2316419 * abs(z)))
                       * (-1.821255978 + (1.0 / (1.0 + 0.2316419
                         * abs(z))) * 1.330274429))))) AS tail
           FROM z)
         SELECT nt AS n_treat, nc AS n_ctrl,
           round(mt - mc, 2) + 0.0 AS mean_diff,
           round(z, 6) + 0.0 AS z_score,
           round(CASE WHEN z >= 0 THEN 1.0 - tail ELSE tail END, 9) + 0.0
             AS p_superior
         FROM ph""",
    // power analysis: mirrored (z975+z80)^2 literal, exact cents moments
    "q379_power_analysis" ->
      """WITH e AS (
           SELECT event_type,
             CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END AS we,
             cast(cast(value AS decimal(18,2)) * 100 AS bigint) AS yc
           FROM events),
         m AS (
           SELECT event_type,
             cast(sum(CASE WHEN we = 1 THEN 1 ELSE 0 END) AS bigint)
               AS n1,
             cast(sum(CASE WHEN we = 1 THEN yc ELSE 0 END) AS bigint)
               AS s1,
             sum(CASE WHEN we = 1 THEN cast(yc AS hugeint) * yc
               ELSE 0 END) AS q1,
             cast(sum(CASE WHEN we = 0 THEN 1 ELSE 0 END) AS bigint)
               AS n0,
             cast(sum(CASE WHEN we = 0 THEN yc ELSE 0 END) AS bigint)
               AS s0,
             sum(CASE WHEN we = 0 THEN cast(yc AS hugeint) * yc
               ELSE 0 END) AS q0
           FROM e GROUP BY 1),
         d AS (
           SELECT event_type, n1, n0,
             cast(s1 AS double) / cast(n1 AS double) / 100.0 AS m1,
             cast(s0 AS double) / cast(n0 AS double) / 100.0 AS m0,
             (cast(q1 AS double) / 10000.0 - cast(n1 AS double)
               * (cast(s1 AS double) / cast(n1 AS double) / 100.0)
               * (cast(s1 AS double) / cast(n1 AS double) / 100.0))
               / (cast(n1 AS double) - 1.0) AS v1,
             (cast(q0 AS double) / 10000.0 - cast(n0 AS double)
               * (cast(s0 AS double) / cast(n0 AS double) / 100.0)
               * (cast(s0 AS double) / cast(n0 AS double) / 100.0))
               / (cast(n0 AS double) - 1.0) AS v0
           FROM m)
         SELECT event_type,
           round(m1 - m0, 6) + 0.0 AS observed_delta,
           round(sqrt((v1 + v0) / 2.0), 6) + 0.0 AS pooled_sd,
           cast(ceil(7.849 * (v1 + v0) / ((m1 - m0) * (m1 - m0)))
             AS bigint) AS n_required_per_arm
         FROM d""",
    // CUPED: exact integer-cents moments, analytic variance reduction
    "q380_cuped" ->
      """WITH b AS (SELECT min(cast(ts AS date)) AS d0 FROM events),
         u AS (
           SELECT user_id,
             cast(sum(CASE WHEN cast(ts AS date) < d0 + to_days(15)
               THEN cast(cast(value AS decimal(18,2)) * 100 AS bigint)
               ELSE 0 END) AS bigint) AS x,
             cast(sum(CASE WHEN cast(ts AS date) >= d0 + to_days(15)
               THEN cast(cast(value AS decimal(18,2)) * 100 AS bigint)
               ELSE 0 END) AS bigint) AS y
           FROM events CROSS JOIN b
           WHERE event_type = 'click'
           GROUP BY 1),
         m AS (
           SELECT cast(count(*) AS bigint) AS n,
             cast(sum(x) AS bigint) AS sx, cast(sum(y) AS bigint) AS sy,
             sum(cast(x AS hugeint) * x) AS qx,
             sum(cast(y AS hugeint) * y) AS qy,
             sum(cast(x AS hugeint) * y) AS qxy
           FROM u),
         d AS (
           SELECT n,
             (cast(qx AS double) - cast(sx AS double) * cast(sx AS double)
               / cast(n AS double)) / cast(n AS double) AS vx,
             (cast(qy AS double) - cast(sy AS double) * cast(sy AS double)
               / cast(n AS double)) / cast(n AS double) AS vy,
             (cast(qxy AS double) - cast(sx AS double)
               * cast(sy AS double) / cast(n AS double))
               / cast(n AS double) AS cv
           FROM m)
         SELECT n AS n_users,
           round(cv / vx, 6) + 0.0 AS theta,
           round(vy / 10000.0, 2) + 0.0 AS var_raw,
           round((vy - cv * cv / vx) / 10000.0, 2) + 0.0 AS var_cuped,
           round(cv * cv / (vx * vy), 6) + 0.0 AS variance_reduction
         FROM d""",
    // Neyman: 4-dp rounded N·S terms exactly summed, floor allocation
    "q381_neyman_allocation" ->
      """WITH s AS (
           SELECT o_orderpriority, cast(count(*) AS bigint) AS n_h,
             cast(sum(cast(cast(o_totalprice AS decimal(18,2)) * 100
               AS bigint)) AS bigint) AS sc,
             sum(cast(cast(cast(o_totalprice AS decimal(18,2)) * 100
               AS bigint) AS hugeint)
               * cast(cast(o_totalprice AS decimal(18,2)) * 100
                 AS bigint)) AS qc
           FROM orders GROUP BY 1),
         d AS (
           SELECT o_orderpriority, n_h,
             sqrt((cast(qc AS double) - cast(n_h AS double)
               * (cast(sc AS double) / cast(n_h AS double))
               * (cast(sc AS double) / cast(n_h AS double)))
               / cast(n_h AS double)) / 100.0 AS sd
           FROM s),
         t AS (
           SELECT o_orderpriority, n_h, sd,
             cast(round(cast(n_h AS double) * sd, 4) AS decimal(38,4))
               AS ns
           FROM d),
         tot AS (SELECT sum(ns) AS tns FROM t)
         SELECT o_orderpriority, n_h,
           round(sd, 2) + 0.0 AS stratum_sd,
           round(cast(ns AS double) / cast(tns AS double), 6) + 0.0
             AS weight,
           cast(floor(cast(ns AS double) / cast(tns AS double) * 10000.0
             + 0.5) AS bigint) AS allocation
         FROM t CROSS JOIN tot""",
    // RDD: exact day×cents moments, closed-form OLS each side, jump =
    // intercept difference at the cutoff
    "q382_reg_discontinuity" ->
      """WITH o AS (
           SELECT date_diff('day', cast('1996-01-01' AS date),
               cast(o_orderdate AS date)) AS x,
             cast(cast(o_totalprice AS decimal(18,2)) * 100 AS bigint)
               AS yc
           FROM orders
           WHERE date_diff('day', cast('1996-01-01' AS date),
               cast(o_orderdate AS date)) >= -365
             AND date_diff('day', cast('1996-01-01' AS date),
               cast(o_orderdate AS date)) < 365),
         f AS (
           SELECT CASE WHEN x < 0 THEN 'left' ELSE 'right' END AS side,
             cast(count(*) AS bigint) AS n,
             cast(sum(x) AS bigint) AS sx,
             cast(sum(x * x) AS bigint) AS sxx,
             cast(sum(yc) AS bigint) AS sy,
             sum(cast(x AS hugeint) * yc) AS sxy
           FROM o GROUP BY 1),
         ab AS (
           SELECT side, n,
             (cast(n AS double) * cast(sxy AS double)
               - cast(sx AS double) * cast(sy AS double))
               / (cast(n AS double) * cast(sxx AS double)
                 - cast(sx AS double) * cast(sx AS double)) AS b,
             (cast(sy AS double) - (cast(n AS double) * cast(sxy AS double)
               - cast(sx AS double) * cast(sy AS double))
               / (cast(n AS double) * cast(sxx AS double)
                 - cast(sx AS double) * cast(sx AS double))
               * cast(sx AS double)) / cast(n AS double) / 100.0 AS a
           FROM f),
         w AS (
           SELECT
             max(CASE WHEN side = 'left' THEN n END) AS n_left,
             max(CASE WHEN side = 'right' THEN n END) AS n_right,
             max(CASE WHEN side = 'left' THEN a END) AS al,
             max(CASE WHEN side = 'right' THEN a END) AS ar,
             max(CASE WHEN side = 'left' THEN b END) AS bl,
             max(CASE WHEN side = 'right' THEN b END) AS br
           FROM ab)
         SELECT n_left, n_right,
           round(al, 2) + 0.0 AS intercept_left,
           round(ar, 2) + 0.0 AS intercept_right,
           round(bl / 100.0, 6) + 0.0 AS slope_left,
           round(br / 100.0, 6) + 0.0 AS slope_right,
           round(ar - al, 2) + 0.0 AS jump_at_cutoff
         FROM w""",
    // peaks: exact cents comparisons, key-partitioned lag/lead
    "q383_peak_detection" ->
      """WITH daily AS (
           SELECT event_type, cast(ts AS date) AS d,
             cast(sum(cast(cast(value AS decimal(18,2)) * 100 AS bigint))
               AS bigint) AS cents
           FROM events GROUP BY 1, 2),
         w AS (
           SELECT event_type, d, cents,
             lag(cents) OVER (PARTITION BY event_type ORDER BY d) AS pv,
             lead(cents) OVER (PARTITION BY event_type ORDER BY d) AS nx
           FROM daily)
         SELECT event_type, d AS peak_day,
           round(cast(cents AS double) / 100.0, 2) + 0.0 AS peak_value,
           round(cast(cents - pv AS double) / 100.0, 2) + 0.0 AS rise,
           round(cast(cents - nx AS double) / 100.0, 2) + 0.0 AS fall
         FROM w
         WHERE pv IS NOT NULL AND nx IS NOT NULL AND cents > pv
           AND cents > nx""",
    // profile drift: per-period exact moments, NULL-guarded ratios
    "q384_profile_drift" ->
      """WITH b AS (SELECT min(cast(ts AS date)) AS d0 FROM events),
         e AS (SELECT CASE WHEN cast(ts AS date) < d0 + to_days(15)
             THEN 'p1' ELSE 'p2' END AS period, user_id,
             cast(cast(value AS decimal(18,2)) AS double) AS v, props
           FROM events CROSS JOIN b),
         m AS (
           SELECT period, cast(count(*) AS bigint) AS n_rows,
             cast(count(DISTINCT user_id) AS bigint) AS n_users,
             round(cast(sum(cast(v AS decimal(18,2))) AS double)
               / cast(count(*) AS double), 6) AS mean_value,
             round(cast(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)
               AS double) / cast(count(*) AS double), 6)
               AS null_props_rate
           FROM e GROUP BY 1),
         w AS (
           SELECT
             max(CASE WHEN period='p1' THEN n_rows END) AS r1,
             max(CASE WHEN period='p2' THEN n_rows END) AS r2,
             max(CASE WHEN period='p1' THEN n_users END) AS u1,
             max(CASE WHEN period='p2' THEN n_users END) AS u2,
             max(CASE WHEN period='p1' THEN mean_value END) AS m1,
             max(CASE WHEN period='p2' THEN mean_value END) AS m2,
             max(CASE WHEN period='p1' THEN null_props_rate END) AS z1,
             max(CASE WHEN period='p2' THEN null_props_rate END) AS z2
           FROM m)
         SELECT 'n_rows' AS metric, cast(r1 AS double) + 0.0 AS period1,
           cast(r2 AS double) + 0.0 AS period2,
           round(cast(r2 AS double) / cast(r1 AS double), 6) + 0.0
             AS drift_ratio
         FROM w
         UNION ALL
         SELECT 'n_users', cast(u1 AS double) + 0.0,
           cast(u2 AS double) + 0.0,
           round(cast(u2 AS double) / cast(u1 AS double), 6) + 0.0 FROM w
         UNION ALL
         SELECT 'mean_value', m1 + 0.0, m2 + 0.0,
           round(m2 / m1, 6) + 0.0 FROM w
         UNION ALL
         SELECT 'null_props_rate', z1 + 0.0, z2 + 0.0,
           CASE WHEN z1 > 0 THEN round(z2 / z1, 6) + 0.0 END FROM w""",
    // conversion latency: floor-second epochs, integer-minute grain,
    // rank lookups on the compressed distribution table
    "q385_conversion_latency" ->
      """WITH s AS (SELECT user_id,
             cast(floor(epoch(min(ts))) AS bigint) AS es
           FROM events WHERE event_type = 'signup' GROUP BY 1),
         p AS (
           SELECT e.user_id, s.es,
             cast(floor(epoch(min(e.ts))) AS bigint) AS ep
           FROM events e JOIN s ON e.user_id = s.user_id
           WHERE e.event_type = 'purchase'
             AND cast(floor(epoch(e.ts)) AS bigint) > s.es
           GROUP BY 1, 2),
         dist AS (SELECT (ep - es) // 60 AS mins,
             cast(count(*) AS bigint) AS c
           FROM p GROUP BY 1),
         tot AS (SELECT cast(sum(c) AS bigint) AS n FROM dist),
         cum AS (
           SELECT mins, c,
             cast(sum(c) OVER (ORDER BY mins ROWS UNBOUNDED PRECEDING)
               AS bigint) AS cc
           FROM dist),
         q AS (SELECT cast(unnest([50, 90, 99]) AS int) AS pct)
         SELECT q.pct, tot.n AS n_converted,
           cast(min(CASE WHEN cum.cc >= (q.pct * tot.n + 99) // 100
             THEN cum.mins END) AS bigint) AS latency_minutes
         FROM q CROSS JOIN tot CROSS JOIN cum
         GROUP BY q.pct, tot.n""",
    // backtest: naive drift forecast, 2-dp rounded errors exactly summed
    "q386_forecast_backtest" ->
      """WITH monthly AS (
           SELECT date_trunc('month', o_orderdate) AS m,
             cast(sum(cast(o_totalprice AS decimal(18,2))) AS double)
               AS y
           FROM orders GROUP BY 1),
         seq AS (SELECT y, row_number() OVER (ORDER BY m) AS i
           FROM monthly),
         hz AS (SELECT cast(unnest([1, 2, 3]) AS int) AS horizon),
         f AS (
           SELECT hz.horizon, a.y AS actual,
             b.y + cast(hz.horizon AS double) * (b.y - c.y) AS forecast
           FROM hz
           JOIN seq a ON true
           JOIN seq b ON b.i = a.i - hz.horizon
           JOIN seq c ON c.i = a.i - hz.horizon - 1),
         e AS (
           SELECT horizon,
             cast(round(abs(actual - forecast), 2) AS decimal(18,2))
               AS ae,
             cast(round((actual - forecast) * (actual - forecast), 2)
               AS decimal(28,2)) AS se
           FROM f)
         SELECT horizon, cast(count(*) AS bigint) AS n_evals,
           round(cast(sum(ae) AS double) / cast(count(*) AS double), 2)
             + 0.0 AS mae,
           round(sqrt(cast(sum(se) AS double) / cast(count(*) AS double)),
             2) + 0.0 AS rmse
         FROM e GROUP BY 1""",
    // corr matrix: 15 exact moments in one aggregate, six mirrored
    // Pearson divisions
    "q387_corr_matrix" ->
      """WITH x AS (
           SELECT cast(cast(l_quantity AS decimal(18,2)) * 100 AS bigint)
               AS q,
             cast(cast(l_extendedprice AS decimal(18,2)) * 100 AS bigint)
               AS e,
             cast(cast(l_discount AS decimal(18,2)) * 100 AS bigint)
               AS d,
             cast(cast(l_tax AS decimal(18,2)) * 100 AS bigint) AS t
           FROM lineitem),
         m AS (
           SELECT cast(count(*) AS bigint) AS n,
             cast(sum(q) AS bigint) AS sq, cast(sum(e) AS bigint) AS se,
             cast(sum(d) AS bigint) AS sd, cast(sum(t) AS bigint) AS st,
             sum(cast(q AS hugeint) * q) AS qq,
             sum(cast(e AS hugeint) * e) AS ee,
             sum(cast(d AS hugeint) * d) AS dd,
             sum(cast(t AS hugeint) * t) AS tt,
             sum(cast(q AS hugeint) * e) AS qe,
             sum(cast(q AS hugeint) * d) AS qd,
             sum(cast(q AS hugeint) * t) AS qt2,
             sum(cast(e AS hugeint) * d) AS ed,
             sum(cast(e AS hugeint) * t) AS et,
             sum(cast(d AS hugeint) * t) AS dt
           FROM x)
         SELECT p.col_a, p.col_b,
           round((cast(p.n AS double) * cast(p.sab AS double)
               - cast(p.sa AS double) * cast(p.sb AS double))
             / sqrt((cast(p.n AS double) * cast(p.saa AS double)
                 - cast(p.sa AS double) * cast(p.sa AS double))
               * (cast(p.n AS double) * cast(p.sbb AS double)
                 - cast(p.sb AS double) * cast(p.sb AS double))), 6)
             + 0.0 AS pearson_r
         FROM (
           SELECT 'quantity' AS col_a, 'extendedprice' AS col_b, n,
             sq AS sa, se AS sb, qq AS saa, ee AS sbb, qe AS sab FROM m
           UNION ALL SELECT 'quantity', 'discount', n, sq, sd, qq, dd, qd
           FROM m
           UNION ALL SELECT 'quantity', 'tax', n, sq, st, qq, tt, qt2
           FROM m
           UNION ALL SELECT 'extendedprice', 'discount', n, se, sd, ee,
             dd, ed FROM m
           UNION ALL SELECT 'extendedprice', 'tax', n, se, st, ee, tt, et
           FROM m
           UNION ALL SELECT 'discount', 'tax', n, sd, st, dd, tt, dt
           FROM m) p""",
    // quantile normalization: per-source distribution-table rank lookups
    "q388_quantile_norm" ->
      """WITH l AS (SELECT source, cast(length(text) AS bigint) AS len
           FROM documents WHERE source IN ('src0', 'src1')),
         dist AS (SELECT source, len, cast(count(*) AS bigint) AS c
           FROM l GROUP BY 1, 2),
         cum AS (
           SELECT source, len, c,
             cast(sum(c) OVER (PARTITION BY source ORDER BY len
               ROWS UNBOUNDED PRECEDING) AS bigint) AS cc,
             cast(sum(c) OVER (PARTITION BY source) AS bigint) AS n
           FROM dist),
         q AS (SELECT cast(unnest(generate_series(1, 9)) AS int)
           AS decile),
         v AS (
           SELECT q.decile, cum.source,
             min(CASE WHEN cum.cc >= (q.decile * cum.n + 9) // 10
               THEN cum.len END) AS val
           FROM q CROSS JOIN cum GROUP BY 1, 2)
         SELECT a.decile,
           cast(a.val AS bigint) AS len_src0,
           cast(b.val AS bigint) AS len_src1,
           cast(b.val - a.val AS bigint) AS shift
         FROM v a JOIN v b ON a.decile = b.decile
         WHERE a.source = 'src0' AND b.source = 'src1'""",
    // lang-ID eval: q32's confusion matrix → per-class P/R/F1; F1 from
    // the 6-dp rounded P and R
    "q389_langid_eval" ->
      """WITH sc AS (SELECT lang,
           len(list_filter(string_split(text,' '),
             x -> x IN ('the','a','of','and','to'))) AS en,
           len(list_filter(string_split(text,' '),
             x -> x IN ('der','die','das','und','ist'))) AS de,
           len(list_filter(string_split(text,' '),
             x -> x IN ('le','la','les','et','est'))) AS fr,
           len(list_filter(string_split(text,' '),
             x -> x IN ('el','los','las','y','es'))) AS es
           FROM documents),
         cm AS (SELECT lang,
           CASE WHEN en >= de AND en >= fr AND en >= es AND en > 0
               THEN 'en'
             WHEN de >= fr AND de >= es AND de > 0 THEN 'de'
             WHEN fr >= es AND fr > 0 THEN 'fr'
             WHEN es > 0 THEN 'es' ELSE 'und' END AS pred,
           cast(count(*) AS bigint) AS n
           FROM sc GROUP BY 1, 2),
         tp AS (SELECT lang AS language, cast(sum(n) AS bigint) AS tp
           FROM cm WHERE lang = pred GROUP BY 1),
         bl AS (SELECT lang AS language, cast(sum(n) AS bigint)
             AS support FROM cm GROUP BY 1),
         bp AS (SELECT pred AS language, cast(sum(n) AS bigint)
             AS predicted FROM cm GROUP BY 1),
         j AS (
           SELECT coalesce(bl.language, bp.language) AS language,
             coalesce(bl.support, 0) AS support,
             coalesce(bp.predicted, 0) AS n_predicted,
             coalesce(tp.tp, 0) AS true_positives
           FROM bl FULL OUTER JOIN bp ON bl.language = bp.language
           LEFT JOIN tp ON coalesce(bl.language, bp.language)
             = tp.language)
         SELECT language, support, n_predicted, true_positives,
           CASE WHEN n_predicted > 0 THEN
             round(cast(true_positives AS double)
               / cast(n_predicted AS double), 6) + 0.0 END AS precision,
           round(cast(true_positives AS double)
             / cast(support AS double), 6) + 0.0 AS recall,
           CASE WHEN n_predicted > 0 AND true_positives > 0 THEN
             round(2.0
               * (round(cast(true_positives AS double)
                 / cast(n_predicted AS double), 6) + 0.0)
               * (round(cast(true_positives AS double)
                 / cast(support AS double), 6) + 0.0)
               / ((round(cast(true_positives AS double)
                 / cast(n_predicted AS double), 6) + 0.0)
                 + (round(cast(true_positives AS double)
                   / cast(support AS double), 6) + 0.0)), 6) + 0.0
             END AS f1
         FROM j WHERE support > 0""",
    // lang-ID summary: micro accuracy + floor-mean macro P/R/F1
    // (zero_division=0 convention)
    "q390_langid_summary" ->
      """WITH sc AS (SELECT lang,
           len(list_filter(string_split(text,' '),
             x -> x IN ('the','a','of','and','to'))) AS en,
           len(list_filter(string_split(text,' '),
             x -> x IN ('der','die','das','und','ist'))) AS de,
           len(list_filter(string_split(text,' '),
             x -> x IN ('le','la','les','et','est'))) AS fr,
           len(list_filter(string_split(text,' '),
             x -> x IN ('el','los','las','y','es'))) AS es
           FROM documents),
         cm AS (SELECT lang,
           CASE WHEN en >= de AND en >= fr AND en >= es AND en > 0
               THEN 'en'
             WHEN de >= fr AND de >= es AND de > 0 THEN 'de'
             WHEN fr >= es AND fr > 0 THEN 'fr'
             WHEN es > 0 THEN 'es' ELSE 'und' END AS pred,
           cast(count(*) AS bigint) AS n
           FROM sc GROUP BY 1, 2),
         tp AS (SELECT lang AS language, cast(sum(n) AS bigint) AS tp
           FROM cm WHERE lang = pred GROUP BY 1),
         bl AS (SELECT lang AS language, cast(sum(n) AS bigint)
             AS support FROM cm GROUP BY 1),
         bp AS (SELECT pred AS language, cast(sum(n) AS bigint)
             AS predicted FROM cm GROUP BY 1),
         j AS (
           SELECT coalesce(bl.language, bp.language) AS language,
             coalesce(bl.support, 0) AS support,
             coalesce(bp.predicted, 0) AS n_predicted,
             coalesce(tp.tp, 0) AS true_positives
           FROM bl FULL OUTER JOIN bp ON bl.language = bp.language
           LEFT JOIN tp ON coalesce(bl.language, bp.language)
             = tp.language),
         pc AS (
           SELECT support,
             coalesce(CASE WHEN n_predicted > 0 THEN
               round(cast(true_positives AS double)
                 / cast(n_predicted AS double), 6) + 0.0 END, 0.0) AS p,
             round(cast(true_positives AS double)
               / cast(support AS double), 6) + 0.0 AS r,
             coalesce(CASE WHEN n_predicted > 0 AND true_positives > 0
               THEN round(2.0
                 * (round(cast(true_positives AS double)
                   / cast(n_predicted AS double), 6) + 0.0)
                 * (round(cast(true_positives AS double)
                   / cast(support AS double), 6) + 0.0)
                 / ((round(cast(true_positives AS double)
                   / cast(n_predicted AS double), 6) + 0.0)
                   + (round(cast(true_positives AS double)
                     / cast(support AS double), 6) + 0.0)), 6) + 0.0
               END, 0.0) AS f
           FROM j WHERE support > 0),
         mac AS (
           SELECT cast(count(*) AS bigint) AS n_classes,
             floor(cast(sum(cast(p AS decimal(18,6))) AS double)
               / cast(count(*) AS double) * 1000000.0 + 0.5) / 1000000.0
               + 0.0 AS macro_precision,
             floor(cast(sum(cast(r AS decimal(18,6))) AS double)
               / cast(count(*) AS double) * 1000000.0 + 0.5) / 1000000.0
               + 0.0 AS macro_recall,
             floor(cast(sum(cast(f AS decimal(18,6))) AS double)
               / cast(count(*) AS double) * 1000000.0 + 0.5) / 1000000.0
               + 0.0 AS macro_f1
           FROM pc),
         mic AS (
           SELECT cast(sum(support) AS bigint) AS n_docs,
             cast(sum(true_positives) AS bigint) AS tps
           FROM j)
         SELECT mic.n_docs, mac.n_classes,
           round(cast(mic.tps AS double) / cast(mic.n_docs AS double), 6)
             + 0.0 AS micro_accuracy,
           mac.macro_precision, mac.macro_recall, mac.macro_f1
         FROM mac CROSS JOIN mic""",

    "q391_bpe_merges" -> BpeOracleSql,

    "q392_mix_weights" ->
      """WITH src AS (SELECT source, cast(count(*) AS bigint) AS n_docs,
             cast(sum(len(string_split(text, ' '))) AS bigint) AS n_tokens
           FROM documents GROUP BY 1),
         s2 AS (SELECT *, cast(round(sqrt(cast(n_tokens AS double)), 6)
             AS decimal(28,6)) AS s
           FROM src),
         t AS (SELECT cast(sum(s) AS decimal(38,6)) AS tot,
             cast(sum(n_tokens) AS bigint) AS ttok
           FROM s2)
         SELECT source, n_docs, n_tokens,
           round(cast(s AS double) / cast(tot AS double), 6) + 0.0 AS weight,
           round((cast(s AS double) / cast(tot AS double))
             * (cast(ttok AS double) / 2.0)
             / cast(n_tokens AS double), 6) + 0.0 AS eff_epochs
         FROM s2 CROSS JOIN t""",

    "q393_dup_ngram_coverage" ->
      """WITH toks AS (SELECT doc_id, source, cast(t.i AS int) AS pos, t.tok
           FROM (SELECT doc_id, source, string_split(text, ' ') AS l
             FROM documents),
           LATERAL (SELECT unnest(l) AS tok,
             unnest(range(1, len(l)+1)) AS i) AS t),
         g AS (SELECT doc_id, source, pos,
             CASE WHEN lead(tok, 7) OVER w IS NOT NULL THEN
               concat_ws(' ', tok, lead(tok, 1) OVER w, lead(tok, 2) OVER w,
                 lead(tok, 3) OVER w, lead(tok, 4) OVER w, lead(tok, 5) OVER w,
                 lead(tok, 6) OVER w, lead(tok, 7) OVER w) END AS ng
           FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
         dup AS (SELECT ng FROM g WHERE ng IS NOT NULL
           GROUP BY ng HAVING count(DISTINCT doc_id) >= 2),
         f AS (SELECT g.doc_id, g.source, g.pos,
             CASE WHEN dup.ng IS NOT NULL THEN 1 ELSE 0 END AS d
           FROM g LEFT JOIN dup ON g.ng = dup.ng),
         c AS (SELECT source, max(d) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS cov
           FROM f)
         SELECT source, cast(count(*) AS bigint) AS n_tokens,
           cast(sum(cov) AS bigint) AS n_dup_tokens,
           round(cast(sum(cov) AS double) / cast(count(*) AS double), 6)
             + 0.0 AS dup_token_share
         FROM c GROUP BY 1""",

    "q394_tokenizer_fertility" ->
      """WITH d AS (SELECT c_mktsegment,
             cast(len(string_split(c_name, ' ')) AS bigint) AS ws,
             cast(len(list_filter(
               regexp_extract_all(c_name, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9]'),
               x -> trim(x) != '')) AS bigint) AS bp,
             cast(length(c_name) AS bigint) AS ch
           FROM customer)
         SELECT c_mktsegment, cast(count(*) AS bigint) AS n_rows,
           cast(sum(ws) AS bigint) AS ws_tokens,
           cast(sum(bp) AS bigint) AS subword_tokens,
           cast(sum(ch) AS bigint) AS chars,
           round(cast(sum(bp) AS double) / cast(sum(ws) AS double), 6)
             + 0.0 AS fertility,
           round(cast(sum(ch) AS double) / cast(sum(bp) AS double), 6)
             + 0.0 AS chars_per_subword
         FROM d GROUP BY 1""",

    "q395_split_leakage" ->
      """WITH d AS (SELECT doc_id, source,
             md5(array_to_string(list_sort(list_distinct(
               string_split(text, ' '))), ' ')) AS fp,
             ('0x' || substr(md5(cast(doc_id AS varchar)), 1, 8))::bigint
               % 10000 AS hb
           FROM documents),
         tr AS (SELECT DISTINCT fp FROM d WHERE hb < 8000),
         te AS (SELECT d.source, d.fp,
             CASE WHEN tr.fp IS NOT NULL THEN 1 ELSE 0 END AS leaked
           FROM d LEFT JOIN tr ON d.fp = tr.fp
           WHERE d.hb >= 9000)
         SELECT source, cast(count(*) AS bigint) AS n_test_docs,
           cast(sum(leaked) AS bigint) AS n_leaked,
           round(cast(sum(leaked) AS double) / cast(count(*) AS double), 6)
             + 0.0 AS leak_rate
         FROM te GROUP BY 1""",

    "q396_bpe_compression" -> BpeCurveOracleSql,

    "q397_linear_attribution" ->
      """WITH conv AS (SELECT user_id, event_id AS cid, epoch_us(ts) AS cts
           FROM events WHERE event_type = 'purchase'),
         tch AS (SELECT user_id, event_type AS tt, epoch_us(ts) AS tts
           FROM events WHERE event_type IN ('click', 'view')),
         j AS (SELECT c.cid, t.tt
           FROM conv c JOIN tch t ON c.user_id = t.user_id
             AND t.tts < c.cts AND t.tts >= c.cts - 604800000000),
         pc AS (SELECT cid, tt, cast(count(*) AS bigint) AS ct
           FROM j GROUP BY 1, 2),
         pn AS (SELECT *, sum(ct) OVER (PARTITION BY cid) AS n FROM pc),
         cr AS (SELECT cid, tt, ct,
             cast(round(cast(ct AS double) / cast(n AS double), 6)
               AS decimal(18,6)) AS credit
           FROM pn)
         SELECT tt AS event_type,
           cast(count(DISTINCT cid) AS bigint) AS n_conversions_touched,
           cast(sum(ct) AS bigint) AS n_touches,
           round(cast(sum(credit) AS double), 6) + 0.0 AS linear_credit
         FROM cr GROUP BY 1""",

    "q398_ngram_novelty" ->
      """WITH toks AS (SELECT doc_id, cast(doc_id % 4 AS int) AS snap,
             cast(t.i AS int) AS pos, t.tok
           FROM (SELECT doc_id, string_split(text, ' ') AS l
             FROM documents),
           LATERAL (SELECT unnest(l) AS tok,
             unnest(range(1, len(l)+1)) AS i) AS t),
         g AS (SELECT snap,
             CASE WHEN lead(tok, 7) OVER w IS NOT NULL THEN
               concat_ws(' ', tok, lead(tok, 1) OVER w, lead(tok, 2) OVER w,
                 lead(tok, 3) OVER w, lead(tok, 4) OVER w, lead(tok, 5) OVER w,
                 lead(tok, 6) OVER w, lead(tok, 7) OVER w) END AS ng
           FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
         gs AS (SELECT DISTINCT snap, ng FROM g WHERE ng IS NOT NULL),
         f AS (SELECT *, min(snap) OVER (PARTITION BY ng) AS fs FROM gs)
         SELECT snap AS snapshot, cast(count(*) AS bigint) AS n_grams,
           cast(sum(CASE WHEN fs = snap THEN 1 ELSE 0 END) AS bigint)
             AS n_novel,
           round(cast(sum(CASE WHEN fs = snap THEN 1 ELSE 0 END) AS double)
             / cast(count(*) AS double), 6) + 0.0 AS novelty_rate
         FROM f GROUP BY 1""",

    "q399_quality_yield" ->
      """WITH d AS (SELECT source,
             cast(len(string_split(text, ' ')) AS bigint) AS nt,
             cast(len(list_filter(string_split(text, ' '),
               x -> x IN ('the','a','of','and','to','in','is','it','that','for')))
               AS bigint) AS ns
           FROM documents)
         SELECT source, cast(kk.k AS int) AS k20,
           cast(count(*) AS bigint) AS n_docs,
           cast(sum(nt) AS bigint) AS n_tokens
         FROM d, LATERAL (SELECT unnest(range(0, 5)) AS k) AS kk
         WHERE ns * 20 >= kk.k * nt
         GROUP BY 1, 2""",

    "q400_embedding_isotropy" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
           FROM embeddings),
         nn AS (SELECT cast(count(*) AS bigint) AS n FROM e),
         dx AS (SELECT cast(dd.d AS int) AS d, dd.x
           FROM e, LATERAL (SELECT unnest(range(1, len(v)+1)) AS d,
             unnest(v) AS x) AS dd),
         cent AS (SELECT d, sum(cast(round(x, 6) AS decimal(28,6))) AS s
           FROM dx GROUP BY d),
         cvt AS (SELECT list(cast(s AS double)
             / (SELECT cast(n AS double) FROM nn) ORDER BY d) AS cv
           FROM cent),
         cs AS (SELECT label,
             round(list_sum(list_transform(generate_series(1, 64),
                 i -> v[i] * cv[i]))
               / (sqrt(list_sum(list_transform(v, y -> y*y)))
                  * sqrt(list_sum(list_transform(cv, y -> y*y)))), 6)
               AS cosc,
             round(sqrt(list_sum(list_transform(v, y -> y*y))), 6) AS nrm
           FROM e CROSS JOIN cvt)
         SELECT label, cast(count(*) AS bigint) AS n_vecs,
           floor(cast(sum(cast(cosc AS decimal(18,6))) AS double)
             / cast(count(*) AS double) * 1000000.0 + 0.5) / 1000000.0
             + 0.0 AS mean_cos_centroid,
           floor(cast(sum(cast(nrm AS decimal(18,6))) AS double)
             / cast(count(*) AS double) * 1000000.0 + 0.5) / 1000000.0
             + 0.0 AS mean_norm
         FROM cs GROUP BY 1""",

    "q401_k_anonymity" ->
      """WITH classes AS (SELECT c_nationkey, c_mktsegment,
             cast(floor(c_acctbal / 1000.0) AS bigint) AS band,
             cast(count(*) AS bigint) AS sz
           FROM customer GROUP BY 1, 2, 3),
         ks AS (SELECT cast(kk.k AS bigint) AS k
           FROM (SELECT unnest([2, 5, 10]) AS k) AS kk)
         SELECT k, cast(sum(sz) AS bigint) AS n_rows,
           cast(count(*) AS bigint) AS n_classes,
           cast(sum(CASE WHEN sz < k THEN sz ELSE 0 END) AS bigint)
             AS n_at_risk,
           round(cast(sum(CASE WHEN sz < k THEN sz ELSE 0 END) AS double)
             / cast(sum(sz) AS double), 6) + 0.0 AS risk_share
         FROM classes CROSS JOIN ks GROUP BY k""",

    "q402_l_diversity" ->
      """WITH classes AS (SELECT c_nationkey, c_mktsegment,
             cast(count(*) AS bigint) AS sz,
             cast(count(DISTINCT cast(floor(c_acctbal / 2000.0) AS bigint))
               AS bigint) AS l
           FROM customer GROUP BY 1, 2),
         ls AS (SELECT cast(ll.l AS bigint) AS lv
           FROM (SELECT unnest([2, 3, 5]) AS l) AS ll)
         SELECT lv AS l, cast(count(*) AS bigint) AS n_classes,
           cast(sum(CASE WHEN classes.l < lv THEN 1 ELSE 0 END) AS bigint)
             AS n_classes_below,
           cast(sum(CASE WHEN classes.l < lv THEN sz ELSE 0 END) AS bigint)
             AS n_rows_exposed
         FROM classes CROSS JOIN ls GROUP BY lv""",

    "q403_cell_suppression" ->
      """WITH cells AS (SELECT n_name, c_mktsegment,
             cast(count(*) AS bigint) AS n
           FROM customer JOIN nation ON c_nationkey = n_nationkey
           GROUP BY 1, 2)
         SELECT n_name, c_mktsegment, n,
           cast(0 AS bigint) AS n_suppressed_cells
         FROM cells WHERE n >= 10
         UNION ALL
         SELECT 'OTHER' AS n_name, 'OTHER' AS c_mktsegment,
           cast(sum(n) AS bigint) AS n,
           cast(count(*) AS bigint) AS n_suppressed_cells
         FROM cells WHERE n < 10 HAVING count(*) > 0""",

    "q404_capture_recapture" ->
      """WITH d AS (SELECT
             ('0x' || substr(md5('a:' || cast(doc_id AS varchar)), 1, 8))
               ::bigint % 10000 < 2000 AS a,
             ('0x' || substr(md5('b:' || cast(doc_id AS varchar)), 1, 8))
               ::bigint % 10000 < 2000 AS b
           FROM documents),
         g AS (SELECT cast(count(*) AS bigint) AS n_true,
             cast(sum(CASE WHEN a THEN 1 ELSE 0 END) AS bigint) AS n1,
             cast(sum(CASE WHEN b THEN 1 ELSE 0 END) AS bigint) AS n2,
             cast(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS bigint)
               AS overlap
           FROM d)
         SELECT n_true, n1, n2, overlap,
           round(cast(n1 + 1 AS double) * cast(n2 + 1 AS double)
             / cast(overlap + 1 AS double) - 1.0, 2) + 0.0
             AS chapman_estimate,
           round((cast(n1 + 1 AS double) * cast(n2 + 1 AS double)
             / cast(overlap + 1 AS double) - 1.0 - cast(n_true AS double))
             / cast(n_true AS double), 6) + 0.0 AS rel_error
         FROM g""",

    "q405_uniqueness_curve" ->
      """WITH c AS (SELECT c_nationkey, c_mktsegment,
             cast(floor(c_acctbal / 1000.0) AS bigint) AS band
           FROM customer),
         s1 AS (SELECT cast(count(*) AS bigint) AS sz FROM c
           GROUP BY c_nationkey),
         s2 AS (SELECT cast(count(*) AS bigint) AS sz FROM c
           GROUP BY c_nationkey, c_mktsegment),
         s3 AS (SELECT cast(count(*) AS bigint) AS sz FROM c
           GROUP BY c_nationkey, c_mktsegment, band),
         l1 AS (SELECT cast(1 AS int) AS level,
             cast(count(*) AS bigint) AS n_classes,
             cast(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS bigint)
               AS n_unique,
             round(cast(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS double)
               / cast(sum(sz) AS double), 6) + 0.0 AS unique_share
           FROM s1),
         l2 AS (SELECT cast(2 AS int) AS level,
             cast(count(*) AS bigint) AS n_classes,
             cast(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS bigint)
               AS n_unique,
             round(cast(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS double)
               / cast(sum(sz) AS double), 6) + 0.0 AS unique_share
           FROM s2),
         l3 AS (SELECT cast(3 AS int) AS level,
             cast(count(*) AS bigint) AS n_classes,
             cast(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS bigint)
               AS n_unique,
             round(cast(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS double)
               / cast(sum(sz) AS double), 6) + 0.0 AS unique_share
           FROM s3)
         SELECT * FROM l1 UNION ALL SELECT * FROM l2
         UNION ALL SELECT * FROM l3""",

    "q406_packing_efficiency" ->
      """WITH d AS (SELECT cast(len(string_split(text, ' ')) AS bigint) AS nt
           FROM documents WHERE len(string_split(text, ' ')) > 0),
         ls AS (SELECT cast(ll.l AS bigint) AS ctx_len
           FROM (SELECT unnest([128, 256, 512]) AS l) AS ll),
         g AS (SELECT ctx_len, cast(count(*) AS bigint) AS n_docs,
             cast(sum(nt) AS bigint) AS total_tokens,
             cast(sum((nt + ctx_len - 1) // ctx_len) AS bigint)
               AS n_seqs_padded
           FROM d CROSS JOIN ls GROUP BY 1)
         SELECT ctx_len, n_docs, total_tokens, n_seqs_padded,
           cast((total_tokens + ctx_len - 1) // ctx_len AS bigint)
             AS n_seqs_packed,
           round(cast(n_seqs_padded * ctx_len - total_tokens AS double)
             / cast(n_seqs_padded * ctx_len AS double), 6) + 0.0
             AS padding_share
         FROM g""",

    "q407_dedup_yield" ->
      """WITH d AS (SELECT source, doc_id,
             md5(array_to_string(list_sort(list_distinct(
               string_split(text, ' '))), ' ')) AS fp,
             cast(len(string_split(text, ' ')) AS bigint) AS nt
           FROM documents),
         g AS (SELECT source, fp, cast(count(*) AS bigint) AS n,
             cast(sum(nt) AS bigint) AS toks,
             arg_min(nt, doc_id) AS keep_nt
           FROM d GROUP BY 1, 2)
         SELECT source, cast(sum(n) AS bigint) AS n_docs,
           cast(count(*) AS bigint) AS n_kept,
           cast(sum(toks) AS bigint) AS tokens_total,
           cast(sum(keep_nt) AS bigint) AS tokens_kept,
           round(cast(sum(toks) - sum(keep_nt) AS double)
             / cast(sum(toks) AS double), 6) + 0.0 AS tokens_saved_share
         FROM g GROUP BY 1""",

    "q408_hapax_share" ->
      """WITH w AS (SELECT source, t.w
           FROM documents, LATERAL unnest(string_split(text, ' ')) AS t(w)
           WHERE t.w != ''),
         g AS (SELECT source, w, cast(count(*) AS bigint) AS c
           FROM w GROUP BY 1, 2)
         SELECT source, cast(count(*) AS bigint) AS vocab,
           cast(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS bigint)
             AS n_hapax,
           round(cast(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS double)
             / cast(count(*) AS double), 6) + 0.0 AS hapax_share
         FROM g GROUP BY 1""",

    "q409_chao1_richness" ->
      """WITH w AS (SELECT source, t.w
           FROM documents, LATERAL unnest(string_split(text, ' ')) AS t(w)
           WHERE t.w != ''),
         g AS (SELECT source, w, cast(count(*) AS bigint) AS c
           FROM w GROUP BY 1, 2)
         SELECT source, cast(count(*) AS bigint) AS vocab,
           cast(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS bigint) AS f1,
           cast(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS bigint) AS f2,
           CASE WHEN sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) > 0 THEN
             round(cast(count(*) AS double)
               + cast(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS double)
               * cast(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS double)
               / (2.0 * cast(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)
                 AS double)), 2) + 0.0 END AS chao1_estimate
         FROM g GROUP BY 1""",

    "q410_event_paths" ->
      """WITH p AS (SELECT concat_ws('>', event_type,
             lead(event_type, 1) OVER w, lead(event_type, 2) OVER w)
             AS path,
             lead(event_type, 2) OVER w AS t3
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         g AS (SELECT path, cast(count(*) AS bigint) AS n
           FROM p WHERE t3 IS NOT NULL GROUP BY 1),
         r AS (SELECT *, cast(row_number() OVER (ORDER BY n DESC, path)
             AS int) AS rank
           FROM g)
         SELECT rank, path, n FROM r WHERE rank <= 10""",

    "q411_join_skew" ->
      """WITH f AS (SELECT l_orderkey, cast(count(*) AS bigint) AS c
           FROM lineitem GROUP BY 1),
         ff AS (SELECT c, cast(count(*) AS bigint) AS t FROM f GROUP BY 1),
         runs AS (SELECT c, t,
             coalesce(sum(t) OVER (ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
               AS r0
           FROM ff),
         agg AS (SELECT cast(sum(t) AS bigint) AS n_keys,
             cast(sum(c * t) AS bigint) AS n_rows,
             cast(max(c) AS bigint) AS max_mult,
             cast(sum(c * (t * r0 + t * (t - 1) // 2)) AS bigint) AS s
           FROM runs)
         SELECT n_keys, n_rows, max_mult,
           round(2.0 * cast(s AS double)
             / (cast(n_keys AS double) * cast(n_rows AS double))
             - cast(n_keys + 1 AS double) / cast(n_keys AS double), 6)
             + 0.0 AS gini
         FROM agg""",

    "q412_fk_scorecard" -> FkScorecardOracleSql,

    "q413_profile_assembly" ->
      """SELECT user_id, cast(count(*) AS bigint) AS n_events,
           cast(max(epoch_us(ts)) AS bigint) AS last_seen_us,
           cast(min(epoch_us(ts)) FILTER (WHERE event_type = 'signup')
             AS bigint) AS signup_us,
           arg_max(round(value, 2), printf('%020d%020d', epoch_us(ts),
             event_id)) FILTER (WHERE event_type = 'purchase')
             AS latest_purchase_value,
           arg_max(json_extract(props, '$.k')::bigint,
             printf('%020d%020d', epoch_us(ts), event_id))
             FILTER (WHERE event_type = 'click') AS latest_click_k
         FROM events GROUP BY user_id""",

    "q414_sample_bias" ->
      """WITH o AS (SELECT o_orderpriority, o_totalprice,
             ('0x' || substr(md5(cast(o_orderkey AS varchar)), 1, 8))::bigint
               % 10000 < 1000 AS s
           FROM orders)
         SELECT o_orderpriority, cast(count(*) AS bigint) AS pop_n,
           cast(sum(CASE WHEN s THEN 1 ELSE 0 END) AS bigint) AS samp_n,
           round(cast(sum(cast(o_totalprice AS decimal(28,2))) AS double)
             / cast(count(*) AS double), 2) + 0.0 AS pop_mean,
           round(cast(sum(cast(o_totalprice AS decimal(28,2)))
               FILTER (WHERE s) AS double)
             / cast(sum(CASE WHEN s THEN 1 ELSE 0 END) AS double), 2) + 0.0
             AS samp_mean,
           round(cast(sum(CASE WHEN s THEN 1 ELSE 0 END) AS double)
             / cast(count(*) AS double), 6) + 0.0 AS sampling_rate
         FROM o GROUP BY 1""",

    "q415_blocking_quality" ->
      """WITH t0 AS (SELECT doc_id, string_split(text,' ') AS w
           FROM documents),
         toks AS (SELECT doc_id, list_distinct(list_transform(
             generate_series(1, len(w)-2),
             i -> array_to_string(w[i:i+2], ' '))) AS t
           FROM t0 WHERE len(w) >= 3),
         hs AS (SELECT doc_id, list_transform(t,
             tok -> ('0x' || substr(md5(tok), 1, 15))::bigint % 1000000007)
             AS h
           FROM toks),
         sig AS (SELECT doc_id, list_transform(generate_series(0, 31),
             i -> list_min(list_transform(h,
               x -> (x*(i*2+3) + (i*5+7)) % 1000000007))) AS s
           FROM hs),
         bands AS (SELECT doc_id, b AS band_id,
             md5(array_to_string(s[b*4+1 : b*4+4], ',')) AS band_hash
           FROM sig, unnest(generate_series(0, 7)) AS u(b)),
         cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM bands a JOIN bands b ON a.band_id = b.band_id
             AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
         fp AS (SELECT doc_id, md5(text) AS f FROM documents
           WHERE len(string_split(text, ' ')) >= 3),
         truth AS (SELECT a.doc_id AS da, b.doc_id AS db
           FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id),
         m AS (SELECT
             cast((SELECT count(*) FROM truth) AS bigint) AS n_truth,
             cast((SELECT count(*) FROM cand) AS bigint) AS n_cand,
             cast((SELECT count(*) FROM truth t JOIN cand c
               ON t.da = c.doc_a AND t.db = c.doc_b) AS bigint) AS n_caught,
             cast((SELECT count(*) FROM documents) AS bigint) AS n)
         SELECT n_truth, n_cand, n_caught,
           CASE WHEN n_truth > 0 THEN
             round(cast(n_caught AS double) / cast(n_truth AS double), 6)
               + 0.0 END AS pair_completeness,
           CASE WHEN n_cand > 0 THEN
             round(cast(n_caught AS double) / cast(n_cand AS double), 6)
               + 0.0 END AS pair_precision,
           round(1.0 - cast(n_cand AS double)
             / (cast(n AS double) * cast(n - 1 AS double) / 2.0), 6) + 0.0
             AS reduction_ratio
         FROM m""",

    "q416_ushaped_attribution" ->
      """WITH conv AS (SELECT user_id, event_id AS cid, epoch_us(ts) AS cts
           FROM events WHERE event_type = 'purchase'),
         tch AS (SELECT user_id, event_type AS tt, event_id AS tid,
             epoch_us(ts) AS tts
           FROM events WHERE event_type IN ('click', 'view')),
         j AS (SELECT c.cid, t.tt, t.tid, t.tts
           FROM conv c JOIN tch t ON c.user_id = t.user_id
             AND t.tts < c.cts AND t.tts >= c.cts - 604800000000),
         r AS (SELECT *,
             row_number() OVER (PARTITION BY cid ORDER BY tts, tid) AS pos,
             count(*) OVER (PARTITION BY cid) AS n
           FROM j),
         wgt AS (SELECT tt, cast(round(CASE WHEN n = 1 THEN 1.0
             WHEN n = 2 THEN 0.5
             WHEN pos = 1 OR pos = n THEN 0.4
             ELSE 0.2 / cast(n - 2 AS double) END, 6) AS decimal(18,6)) AS w
           FROM r)
         SELECT tt AS event_type, cast(count(*) AS bigint) AS n_touches,
           round(cast(sum(w) AS double), 6) + 0.0 AS ushaped_credit
         FROM wgt GROUP BY 1""",

    "q417_dedup_threshold_curve" ->
      """WITH t0 AS (SELECT doc_id, string_split(text,' ') AS w
           FROM documents),
         toks AS (SELECT doc_id, list_distinct(list_transform(
             generate_series(1, len(w)-2),
             i -> array_to_string(w[i:i+2], ' '))) AS t
           FROM t0 WHERE len(w) >= 3),
         shl AS (SELECT doc_id, unnest(t) AS sng FROM toks),
         hot AS (SELECT sng FROM shl GROUP BY sng HAVING count(*) > 100),
         kept AS (SELECT doc_id, sng FROM shl
           WHERE sng NOT IN (SELECT sng FROM hot)),
         hs AS (SELECT doc_id,
             list(('0x' || substr(md5(sng), 1, 15))::bigint % 1000000007)
               AS h
           FROM kept GROUP BY doc_id),
         sig AS (SELECT doc_id, list_transform(generate_series(0, 31),
             i -> list_min(list_transform(h,
               x -> (x*(i*2+3) + (i*5+7)) % 1000000007))) AS s
           FROM hs),
         bands AS (SELECT doc_id, b AS band_id,
             md5(array_to_string(s[b*4+1 : b*4+4], ',')) AS band_hash
           FROM sig, unnest(generate_series(0, 7)) AS u(b)),
         cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM bands a JOIN bands b ON a.band_id = b.band_id
             AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
         ver AS (SELECT doc_a, doc_b,
             cast(len(list_intersect(sa.t, sb.t)) AS double)
               / (len(sa.t) + len(sb.t) - len(list_intersect(sa.t, sb.t)))
               AS jaccard
           FROM cand JOIN toks sa ON sa.doc_id = doc_a
             JOIN toks sb ON sb.doc_id = doc_b),
         ts AS (SELECT cast(tt.t AS double) AS threshold
           FROM (SELECT unnest([0.3, 0.5, 0.7]) AS t) AS tt)
         SELECT threshold, cast(count(*) AS bigint) AS n_pairs,
           floor(cast(sum(cast(round(jaccard, 6) AS decimal(18,6)))
               AS double)
             / cast(count(*) AS double) * 1000000.0 + 0.5) / 1000000.0
             + 0.0 AS mean_jaccard
         FROM ver CROSS JOIN ts WHERE jaccard >= threshold GROUP BY 1""",
    // v1 rows (pre-1995) carry no priority column on disk; the merged read
    // materializes NULL for them — modeled here by explicit NULL padding.
    "q418_schema_evolution" ->
      """WITH merged AS (
           SELECT o_orderkey, o_custkey, o_totalprice,
             NULL AS o_orderpriority
           FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
           UNION ALL
           SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
           FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01')
         SELECT coalesce(o_orderpriority, 'LEGACY') AS priority,
           cast(count(*) AS bigint) AS n,
           cast(sum(cast(o_totalprice AS decimal(18,2))) AS double)
             AS sum_price,
           min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
         FROM merged GROUP BY 1""",
    "q419_dict_encoding" ->
      """WITH dict AS (SELECT p_type,
             cast(dense_rank() OVER (ORDER BY p_type) - 1 AS int) AS code
           FROM (SELECT DISTINCT p_type FROM part)),
         nd AS (SELECT count(*) AS nd FROM dict),
         enc AS (SELECT p_partkey, code FROM part JOIN dict USING (p_type)),
         dec AS (SELECT p_partkey, enc.code AS code, dict.p_type AS p_type
           FROM enc JOIN dict ON enc.code = dict.code)
         SELECT p_type, code, cast(count(*) AS bigint) AS n_rows,
           cast(sum(p_partkey) AS bigint) AS sum_partkey,
           cast(length(bin((SELECT nd FROM nd) - 1)) AS int)
             AS bits_per_value
         FROM dec GROUP BY 1, 2""",
    "q420_dq_rule_engine" -> DqRuleOracleSql,
    "q421_split_conformal" ->
      """WITH o AS (SELECT o_orderpriority AS priority,
             cast(cast(o_totalprice AS decimal(18,2)) * 100 AS bigint)
               AS cents,
             o_orderdate AS d
           FROM orders),
         m AS (SELECT priority, cast(count(*) AS bigint) AS n_train,
             cast(sum(cents) AS bigint) // count(*) AS yhat_cents
           FROM o WHERE d < TIMESTAMP '1998-01-01' GROUP BY 1),
         cal AS (SELECT o.priority, abs(cents - yhat_cents) AS resid
           FROM o JOIN m ON o.priority = m.priority
           WHERE d >= TIMESTAMP '1998-01-01'
             AND d < TIMESTAMP '1999-01-01'),
         dist AS (SELECT priority, resid, count(*) AS c
           FROM cal GROUP BY 1, 2),
         rk AS (SELECT priority, resid,
             sum(c) OVER (PARTITION BY priority ORDER BY resid) AS cc,
             sum(c) OVER (PARTITION BY priority) AS n
           FROM dist),
         q AS (SELECT priority, cast(max(n) AS bigint) AS n_cal,
             cast(min(CASE WHEN cc >= (9 * (n + 1) + 9) // 10
               THEN resid END) AS bigint) AS qhat_cents
           FROM rk GROUP BY 1),
         ev AS (SELECT o.priority, abs(cents - yhat_cents) AS resid
           FROM o JOIN m ON o.priority = m.priority
           WHERE d >= TIMESTAMP '1999-01-01')
         SELECT ev.priority, m.n_train, m.yhat_cents, q.n_cal, q.qhat_cents,
           cast(count(*) AS bigint) AS n_eval,
           round(cast(sum(CASE WHEN resid <= qhat_cents THEN 1 ELSE 0 END)
               AS double) / cast(count(*) AS double), 6) + 0.0 AS coverage
         FROM ev JOIN q ON ev.priority = q.priority
           JOIN m ON ev.priority = m.priority
         GROUP BY 1, 2, 3, 4, 5""",
    "q422_token_apportionment" ->
      """WITH src AS (SELECT source,
             cast(sum(len(string_split(text, ' '))) AS bigint) AS tokens
           FROM documents GROUP BY 1),
         t AS (SELECT cast(sum(tokens) AS bigint) AS tt FROM src),
         b AS (SELECT source, tokens,
             (1000000 * tokens) // tt AS base_alloc,
             1000000 * tokens - ((1000000 * tokens) // tt) * tt AS rem
           FROM src CROSS JOIN t),
         st AS (SELECT 1000000 - cast(sum(base_alloc) AS bigint) AS seats
           FROM b),
         r AS (SELECT *,
             row_number() OVER (ORDER BY rem DESC, source) AS rk
           FROM b)
         SELECT source, tokens, cast(base_alloc AS bigint) AS base_alloc,
           cast(CASE WHEN rk <= (SELECT seats FROM st)
             THEN 1 ELSE 0 END AS bigint) AS extra,
           cast(base_alloc + CASE WHEN rk <= (SELECT seats FROM st)
             THEN 1 ELSE 0 END AS bigint) AS alloc
         FROM r""",
    "q423_jl_projection" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
           FROM embeddings),
         sg AS (SELECT a.i, b.j,
             1 - 2 * (('0x' || substr(md5('jl_' || cast(a.i AS varchar)
               || '_' || cast(b.j AS varchar)), 1, 2))::bigint % 2) AS sgn
           FROM (SELECT unnest(range(1, 65)) AS i) a,
                (SELECT unnest(range(1, 17)) AS j) b),
         dx AS (SELECT vec_id, cast(dd.i AS int) AS i, dd.x
           FROM e, LATERAL (SELECT unnest(range(1, len(v)+1)) AS i,
             unnest(v) AS x) AS dd),
         pj AS (SELECT vec_id, j,
             cast(sum(cast(round(x, 6) AS decimal(28,6)) * sgn) AS double)
               AS pjv
           FROM dx JOIN sg ON dx.i = sg.i GROUP BY 1, 2),
         parr AS (SELECT vec_id, list(round(pjv, 6) ORDER BY j) AS p
           FROM pj GROUP BY 1),
         r AS (SELECT e.label,
             round(list_sum(list_transform(p, y -> y*y)) /
               (16.0 * list_sum(list_transform(e.v,
                 y -> round(y, 6) * round(y, 6)))), 6) AS ratio
           FROM parr pa JOIN e ON pa.vec_id = e.vec_id
           WHERE list_sum(list_transform(e.v,
             y -> round(y, 6) * round(y, 6))) > 0)
         SELECT label, cast(count(*) AS bigint) AS n_vecs,
           floor(cast(sum(cast(ratio AS decimal(18,6))) AS double)
             / cast(count(*) AS double) * 1000000.0 + 0.5) / 1000000.0
             + 0.0 AS mean_ratio,
           min(ratio) AS min_ratio, max(ratio) AS max_ratio
         FROM r GROUP BY 1""",
    // the oracle enumerates temporal paths (recursive CTE, deduped states);
    // the engine must NOT — it folds to min-arrival per node each round.
    "q424_temporal_reachability" ->
      """WITH RECURSIVE
         p AS (SELECT DISTINCT 'c' || cast(o_custkey AS varchar) AS src,
                 's' || cast(l_suppkey AS varchar) AS dst,
                 (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1
                   AS m
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         ed AS (SELECT src, dst, m FROM p
                UNION ALL SELECT dst, src, m FROM p),
         tr(node, arr, hops) AS (
           SELECT 'c' || cast(c_custkey AS varchar),
             cast(0 AS bigint), 0
           FROM customer WHERE c_custkey <= 2
           UNION
           SELECT e.dst, e.m, t.hops + 1
           FROM tr t JOIN ed e ON e.src = t.node AND e.m >= t.arr
           WHERE t.hops < 3)
         SELECT node, cast(min(arr) AS int) AS first_reach_month
         FROM tr GROUP BY 1""",
    "q425_curriculum_interleave" ->
      """WITH si AS (SELECT source,
             cast(dense_rank() OVER (ORDER BY source) AS bigint) AS sidx
           FROM (SELECT DISTINCT source FROM documents)),
         ns AS (SELECT cast(count(*) AS bigint) AS s FROM si),
         r AS (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
               ORDER BY n_chars DESC, doc_id) AS rank
           FROM documents)
         SELECT cast((rank - 1) * (SELECT s FROM ns) + sidx AS bigint)
             AS slot,
           doc_id, source, cast(rank AS int) AS rank
         FROM r JOIN si USING (source)
         ORDER BY slot LIMIT 100""",
    "q426_rle_audit" ->
      """WITH t AS (SELECT l_returnflag,
             CASE WHEN lag(l_returnflag) OVER (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_partkey, l_suppkey)
                 IS DISTINCT FROM l_returnflag
               THEN 1 ELSE 0 END AS st
           FROM lineitem)
         SELECT l_returnflag, cast(count(*) AS bigint) AS n_rows,
           cast(sum(st) AS bigint) AS n_runs,
           round(cast(count(*) AS double) / cast(sum(st) AS double), 6)
             + 0.0 AS mean_run_len,
           round(cast(sum(st) AS double) / cast(count(*) AS double), 6)
             + 0.0 AS rle_ratio
         FROM t GROUP BY 1""",
    "q427_staypoints" ->
      """WITH p AS (SELECT user_id, ts, event_id,
             (event_id * 7) % 1000 AS x, (event_id * 13) % 1000 AS y
           FROM events),
         f AS (SELECT user_id, ts, event_id, x, y,
             CASE WHEN greatest(abs(x - lag(x) OVER w),
                 abs(y - lag(y) OVER w)) <= 50
               THEN 1 ELSE 0 END AS near,
             row_number() OVER w AS rn
           FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         g AS (SELECT *, rn - sum(near) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS isl
           FROM f),
         runs AS (SELECT user_id, isl, count(*) AS len
           FROM g WHERE near = 1 GROUP BY 1, 2 HAVING count(*) >= 2),
         agg AS (SELECT user_id, cast(count(*) AS bigint) AS n_stays,
             cast(max(len) + 1 AS bigint) AS longest
           FROM runs GROUP BY 1)
         SELECT p2.user_id, p2.n_points,
           coalesce(agg.n_stays, 0) AS n_stays,
           coalesce(agg.longest, 0) AS longest_stay_points
         FROM (SELECT user_id, cast(count(*) AS bigint) AS n_points
           FROM p GROUP BY 1) p2
         LEFT JOIN agg ON p2.user_id = agg.user_id""",
    // the oracle may use the plain global running max — IT is allowed a
    // single-partition window; the engine side must decompose (two-level)
    "q428_watermark_advisor" ->
      """WITH e AS (SELECT event_id, epoch_us(ts) AS tu FROM events),
         r AS (SELECT event_id, tu,
             max(tu) OVER (ORDER BY event_id) AS rm
           FROM e),
         l AS (SELECT (rm - tu) // 1000000 AS late FROM r),
         d AS (SELECT late, count(*) AS c FROM l GROUP BY 1),
         k AS (SELECT late, sum(c) OVER (ORDER BY late) AS cc,
             sum(c) OVER () AS n
           FROM d)
         SELECT cast(max(n) AS bigint) AS n_events,
           cast(min(CASE WHEN cc >= (50 * n + 99) // 100 THEN late END)
             AS bigint) AS p50_lateness_s,
           cast(min(CASE WHEN cc >= (95 * n + 99) // 100 THEN late END)
             AS bigint) AS p95_lateness_s,
           cast(min(CASE WHEN cc >= (99 * n + 99) // 100 THEN late END)
             AS bigint) AS p99_lateness_s,
           cast(min(CASE WHEN cc >= (99 * n + 99) // 100 THEN late END)
             AS bigint) AS watermark_delay_s
         FROM k""",
    "q429_encoding_advisor" ->
      """WITH t AS (SELECT l_returnflag AS c1, l_linestatus AS c2,
             strftime(date_trunc('month', l_shipdate), '%Y-%m') AS c3,
             l_partkey AS c4,
             CASE WHEN lag(l_returnflag) OVER w
               IS DISTINCT FROM l_returnflag THEN 1 ELSE 0 END AS r1,
             CASE WHEN lag(l_linestatus) OVER w
               IS DISTINCT FROM l_linestatus THEN 1 ELSE 0 END AS r2,
             CASE WHEN lag(strftime(date_trunc('month', l_shipdate),
                 '%Y-%m')) OVER w
               IS DISTINCT FROM strftime(date_trunc('month', l_shipdate),
                 '%Y-%m') THEN 1 ELSE 0 END AS r3,
             CASE WHEN lag(l_partkey) OVER w
               IS DISTINCT FROM l_partkey THEN 1 ELSE 0 END AS r4
           FROM lineitem
           WINDOW w AS (PARTITION BY l_orderkey
             ORDER BY l_linenumber, l_partkey, l_suppkey)),
         s AS (SELECT cast(count(*) AS bigint) AS n,
             cast(count(DISTINCT c1) AS bigint) AS d1,
             cast(sum(r1) AS bigint) AS s1,
             cast(count(DISTINCT c2) AS bigint) AS d2,
             cast(sum(r2) AS bigint) AS s2,
             cast(count(DISTINCT c3) AS bigint) AS d3,
             cast(sum(r3) AS bigint) AS s3,
             cast(count(DISTINCT c4) AS bigint) AS d4,
             cast(sum(r4) AS bigint) AS s4
           FROM t),
         u AS (
           SELECT 'l_returnflag' AS column_name, n AS n_rows, d1 AS ndv,
             s1 AS n_runs FROM s
           UNION ALL SELECT 'l_linestatus', n, d2, s2 FROM s
           UNION ALL SELECT 'l_shipmonth', n, d3, s3 FROM s
           UNION ALL SELECT 'l_partkey', n, d4, s4 FROM s)
         SELECT column_name, n_rows, ndv, n_runs,
           cast(length(bin(ndv - 1)) AS int) AS bits_per_code,
           CASE WHEN ndv <= 4096 AND n_runs * 2 <= n_rows THEN 'DICT_RLE'
                WHEN ndv <= 4096 THEN 'DICT'
                WHEN n_runs * 2 <= n_rows THEN 'RLE'
                ELSE 'PLAIN' END AS encoding
         FROM u""",
    "q430_concurrency_curve" ->
      """WITH es AS (SELECT event_id, user_id,
             cast(floor(epoch(ts)) AS bigint) AS s
           FROM events),
         lg AS (SELECT user_id, s, event_id,
             lag(s) OVER (PARTITION BY user_id ORDER BY s, event_id)
               AS prev_s
           FROM es),
         sx AS (SELECT user_id, s,
             sum(CASE WHEN prev_s IS NULL OR s - prev_s > 1800
               THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
           FROM lg),
         b AS (SELECT user_id, seq, min(s) AS st, max(s) AS en
           FROM sx GROUP BY 1, 2),
         d AS (SELECT st AS t, 1 AS delta FROM b
               UNION ALL SELECT en + 1, -1 FROM b),
         n AS (SELECT t // 86400 AS day, t,
             cast(sum(delta) AS bigint) AS net
           FROM d GROUP BY 1, 2),
         c AS (SELECT day, t, sum(net) OVER (ORDER BY t) AS cum FROM n),
         dn AS (SELECT day, sum(net) AS dnet FROM n GROUP BY 1),
         dc AS (SELECT day,
             cast(sum(dnet) OVER (ORDER BY day) AS bigint) AS runend
           FROM dn)
         SELECT c.day AS day_num, cast(max(cum) AS bigint)
             AS peak_concurrent,
           max(dc.runend) AS open_at_midnight
         FROM c JOIN dc ON c.day = dc.day GROUP BY 1""",
    "q431_path_aggregation" ->
      """WITH dur AS (SELECT o_orderkey AS node,
             max(date_diff('day', cast(o_orderdate AS date),
               cast(l_shipdate AS date))) AS dur
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE o_orderkey >= 1 GROUP BY 1),
         anc AS (SELECT node, j, node >> j AS anc
           FROM dur, (SELECT unnest(range(0, 21)) AS j) js
           WHERE (node >> j) >= 1),
         pc AS (SELECT a.node, cast(sum(d2.dur) AS bigint) AS path_cost
           FROM anc a JOIN dur d2 ON d2.node = a.anc GROUP BY 1)
         SELECT cast(length(bin(node)) - 1 AS int) AS depth,
           cast(count(*) AS bigint) AS n_nodes,
           cast(sum(path_cost) AS bigint) AS total_path_cost,
           cast(max(path_cost) AS bigint) AS max_path_cost
         FROM pc GROUP BY 1""",
    "q432_dataset_card" ->
      """WITH d AS (SELECT source, lang,
             len(string_split(text, ' ')) AS tok,
             md5(array_to_string(list_sort(list_distinct(
               string_split(text, ' '))), ' ')) AS fp
           FROM documents),
         b AS (SELECT cast(count(*) AS bigint) AS n_docs,
             cast(count(DISTINCT source) AS bigint) AS n_sources,
             cast(count(DISTINCT lang) AS bigint) AS n_langs,
             cast(sum(tok) AS bigint) AS n_tokens,
             cast(count(DISTINCT fp) AS bigint) AS nfp
           FROM d),
         lg AS (SELECT lang, count(*) AS c FROM d GROUP BY 1),
         e AS (SELECT cast(sum(cast(round(
               -(cast(c AS double) / cast(b.n_docs AS double)) *
               ln(cast(c AS double) / cast(b.n_docs AS double)), 6)
             AS decimal(18,6))) AS double) AS lang_entropy
           FROM lg CROSS JOIN b)
         SELECT n_docs, n_sources, n_langs, n_tokens,
           round(1.0 - cast(nfp AS double) / cast(n_docs AS double), 6)
             + 0.0 AS bag_dup_rate,
           n_tokens // n_docs AS mean_doc_tokens,
           lang_entropy
         FROM b CROSS JOIN e""",
    "q433_asof_native" ->
      """WITH ev AS (SELECT event_id, user_id % 25 AS k,
                            date_trunc('second', ts) AS ets FROM events),
         rates AS (SELECT n_nationkey AS k,
                     TIMESTAMP '2024-01-01' + d * INTERVAL 1 DAY AS eff,
                     cast((n_nationkey * 31 + d * 7) % 100 as double) / 10 AS rate
                   FROM nation, unnest(generate_series(0, 29)) AS u(d))
         SELECT e.event_id, e.k, r.rate AS asof_rate
         FROM ev e ASOF LEFT JOIN rates r ON e.k = r.k AND e.ets >= r.eff""",
    "q434_type_inference" ->
      """WITH t AS (SELECT cast(o_orderkey AS varchar) AS c1,
             cast(cast(o_totalprice AS decimal(18,2)) AS varchar) AS c2,
             cast(o_orderdate AS varchar) AS c3,
             o_orderpriority AS c4
           FROM orders),
         s AS (SELECT cast(count(*) AS bigint) AS n,
             cast(sum(CASE WHEN regexp_matches(c1, '^-?[0-9]+$')
               THEN 1 ELSE 0 END) AS bigint) AS i1,
             cast(sum(CASE WHEN NOT regexp_matches(c1, '^-?[0-9]+$')
               AND regexp_matches(c1, '^-?[0-9]+\.[0-9]+$')
               THEN 1 ELSE 0 END) AS bigint) AS f1,
             cast(sum(CASE WHEN NOT regexp_matches(c1, '^-?[0-9]+$')
               AND NOT regexp_matches(c1, '^-?[0-9]+\.[0-9]+$')
               AND regexp_matches(c1, '^[0-9]{4}-[0-9]{2}-[0-9]{2}')
               THEN 1 ELSE 0 END) AS bigint) AS t1,
             cast(sum(CASE WHEN regexp_matches(c2, '^-?[0-9]+$')
               THEN 1 ELSE 0 END) AS bigint) AS i2,
             cast(sum(CASE WHEN NOT regexp_matches(c2, '^-?[0-9]+$')
               AND regexp_matches(c2, '^-?[0-9]+\.[0-9]+$')
               THEN 1 ELSE 0 END) AS bigint) AS f2,
             cast(sum(CASE WHEN NOT regexp_matches(c2, '^-?[0-9]+$')
               AND NOT regexp_matches(c2, '^-?[0-9]+\.[0-9]+$')
               AND regexp_matches(c2, '^[0-9]{4}-[0-9]{2}-[0-9]{2}')
               THEN 1 ELSE 0 END) AS bigint) AS t2,
             cast(sum(CASE WHEN regexp_matches(c3, '^-?[0-9]+$')
               THEN 1 ELSE 0 END) AS bigint) AS i3,
             cast(sum(CASE WHEN NOT regexp_matches(c3, '^-?[0-9]+$')
               AND regexp_matches(c3, '^-?[0-9]+\.[0-9]+$')
               THEN 1 ELSE 0 END) AS bigint) AS f3,
             cast(sum(CASE WHEN NOT regexp_matches(c3, '^-?[0-9]+$')
               AND NOT regexp_matches(c3, '^-?[0-9]+\.[0-9]+$')
               AND regexp_matches(c3, '^[0-9]{4}-[0-9]{2}-[0-9]{2}')
               THEN 1 ELSE 0 END) AS bigint) AS t3,
             cast(sum(CASE WHEN regexp_matches(c4, '^-?[0-9]+$')
               THEN 1 ELSE 0 END) AS bigint) AS i4,
             cast(sum(CASE WHEN NOT regexp_matches(c4, '^-?[0-9]+$')
               AND regexp_matches(c4, '^-?[0-9]+\.[0-9]+$')
               THEN 1 ELSE 0 END) AS bigint) AS f4,
             cast(sum(CASE WHEN NOT regexp_matches(c4, '^-?[0-9]+$')
               AND NOT regexp_matches(c4, '^-?[0-9]+\.[0-9]+$')
               AND regexp_matches(c4, '^[0-9]{4}-[0-9]{2}-[0-9]{2}')
               THEN 1 ELSE 0 END) AS bigint) AS t4
           FROM t),
         u AS (
           SELECT 'o_orderkey' AS column_name, n AS n_values, i1 AS n_int,
             f1 AS n_float, t1 AS n_ts FROM s
           UNION ALL SELECT 'o_totalprice', n, i2, f2, t2 FROM s
           UNION ALL SELECT 'o_orderdate', n, i3, f3, t3 FROM s
           UNION ALL SELECT 'o_orderpriority', n, i4, f4, t4 FROM s)
         SELECT column_name, n_values, n_int, n_float, n_ts,
           CASE WHEN n_int = n_values THEN 'BIGINT'
                WHEN n_int + n_float = n_values THEN 'DOUBLE'
                WHEN n_ts = n_values THEN 'TIMESTAMP'
                ELSE 'STRING' END AS inferred_type
         FROM u""",
    "q435_boilerplate_removal" ->
      """WITH x AS (SELECT doc_id, string_split(text, ' ') AS ws
           FROM documents),
         toks AS (SELECT doc_id, (dd.p - 1) // 5 AS chunk, dd.p AS p, dd.w
           FROM x, LATERAL (SELECT unnest(generate_series(1, len(ws)))
             AS p, unnest(ws) AS w) AS dd),
         chunks AS (SELECT doc_id, chunk,
             string_agg(w, ' ' ORDER BY p) AS ctext
           FROM toks GROUP BY 1, 2),
         dfq AS (SELECT ctext, count(DISTINCT doc_id) AS df
           FROM chunks GROUP BY 1)
         SELECT doc_id, cast(count(*) AS bigint) AS n_chunks,
           cast(sum(CASE WHEN df >= 10 THEN 1 ELSE 0 END) AS bigint)
             AS n_removed,
           md5(coalesce(string_agg(CASE WHEN df < 10 THEN ctext END,
             ' ' ORDER BY chunk), '')) AS cleaned_md5
         FROM chunks JOIN dfq USING (ctext) GROUP BY 1""",
    "q436_snapshot_diff" ->
      """WITH a AS (SELECT o_orderkey AS k,
             cast(cast(o_totalprice AS decimal(18,2)) * 100 AS bigint)
               AS cents,
             o_orderstatus AS st
           FROM orders),
         b0 AS (SELECT k,
             CASE WHEN k % 50 = 0 THEN cents + 1000 ELSE cents END AS cents,
             st
           FROM a WHERE k % 97 <> 0),
         bn AS (SELECT (SELECT max(k) FROM a) + i AS k,
             cast(i * 12345 AS bigint) AS cents, 'O' AS st
           FROM (SELECT unnest(generate_series(1, 20)) AS i)),
         b AS (SELECT * FROM b0 UNION ALL SELECT * FROM bn),
         j AS (SELECT a.cents AS ca, a.st AS sa, b.cents AS cb, b.st AS sb
           FROM a FULL OUTER JOIN b ON a.k = b.k)
         SELECT CASE WHEN ca IS NULL THEN 'added'
                WHEN cb IS NULL THEN 'removed'
                WHEN ca <> cb OR sa <> sb THEN 'changed'
                ELSE 'unchanged' END AS change_class,
           cast(count(*) AS bigint) AS n_rows,
           cast(sum(CASE WHEN ca IS NOT NULL AND cb IS NOT NULL
             AND ca <> cb THEN 1 ELSE 0 END) AS bigint)
             AS n_price_changes,
           cast(sum(CASE WHEN ca IS NOT NULL AND cb IS NOT NULL
             AND sa <> sb THEN 1 ELSE 0 END) AS bigint)
             AS n_status_changes
         FROM j GROUP BY 1""",
    "q437_feature_matrix" ->
      """WITH spine AS (SELECT event_id, user_id, user_id % 25 AS k,
             date_trunc('second', ts) AS ets
           FROM events WHERE event_type = 'purchase'),
         rates AS (SELECT n_nationkey AS k,
             TIMESTAMP '2024-01-01' + d * INTERVAL 1 DAY AS eff,
             cast((n_nationkey * 31 + d * 7) % 100 as double) / 10 AS rate
           FROM nation, unnest(generate_series(0, 29)) AS u(d)),
         act0 AS (SELECT user_id, ts, event_id,
             count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM events),
         act AS (SELECT user_id, date_trunc('second', ts) AS vts,
             cast(max(cum) AS bigint) AS cum_events
           FROM act0 GROUP BY 1, 2)
         SELECT s.event_id, s.user_id, s.k, r.rate AS asof_rate,
           a.cum_events AS asof_cum_events
         FROM spine s
         ASOF LEFT JOIN rates r ON s.k = r.k AND s.ets >= r.eff
         ASOF LEFT JOIN act a ON s.user_id = a.user_id
           AND s.ets >= a.vts""",
    "q438_delta_encoding" ->
      """WITH keys AS (SELECT DISTINCT o_orderkey AS key FROM orders),
         g AS (SELECT key - lag(key) OVER (ORDER BY key) AS gap FROM keys),
         v AS (SELECT gap,
             1 + CASE WHEN gap >= 128 THEN 1 ELSE 0 END
               + CASE WHEN gap >= 16384 THEN 1 ELSE 0 END
               + CASE WHEN gap >= 2097152 THEN 1 ELSE 0 END
               + CASE WHEN gap >= 268435456 THEN 1 ELSE 0 END AS vb
           FROM g WHERE gap IS NOT NULL)
         SELECT cast(count(*) + 1 AS bigint) AS n_keys,
           cast(max(gap) AS bigint) AS max_gap,
           cast(sum(vb) + 8 AS bigint) AS delta_bytes,
           cast((count(*) + 1) * 8 AS bigint) AS plain_bytes,
           round(cast((count(*) + 1) * 8 AS double)
             / cast(sum(vb) + 8 AS double), 6) + 0.0 AS compression_ratio
         FROM v""",
    "q439_microbatch_manifest" ->
      """WITH buckets AS (SELECT * FROM (VALUES
           (1, 1024, 1024), (2, 1152, 896), (3, 896, 1152),
           (4, 1216, 832), (5, 832, 1216), (6, 1344, 768), (7, 768, 1344))
           AS b(bidx, bw, bh)),
         imgs AS (SELECT doc_id,
             cast(256 + doc_id % 1024 AS double) AS w,
             cast(256 + (doc_id * 7) % 1024 AS double) AS h
           FROM documents),
         scored AS (SELECT doc_id, bidx, bw, bh,
             round(abs(ln(w / h)
               - ln(cast(bw AS double) / cast(bh AS double))), 9) AS diff
           FROM imgs CROSS JOIN buckets),
         asg AS (SELECT doc_id, bidx, bw, bh FROM (
             SELECT *, row_number() OVER (PARTITION BY doc_id
               ORDER BY diff, bidx) AS rn
             FROM scored) WHERE rn = 1),
         rk AS (SELECT *, row_number() OVER (PARTITION BY bidx
               ORDER BY doc_id) AS r,
             count(*) OVER (PARTITION BY bidx) AS nb
           FROM asg)
         SELECT bidx, bw, bh, cast(count(*) AS bigint) AS n_images,
           cast(count(*) // 32 AS bigint) AS n_batches,
           cast(count(*) - (count(*) // 32) * 32 AS bigint) AS n_dropped,
           cast(sum(CASE WHEN r <= (nb // 32) * 32 THEN doc_id ELSE 0 END)
             AS bigint) AS batched_docid_sum
         FROM rk GROUP BY 1, 2, 3""",
    "q440_shard_manifest" ->
      """WITH d AS (SELECT doc_id, text,
             ('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::bigint
               % 16 AS shard,
             ('0x' || substr(md5(text), 1, 14))::bigint AS h
           FROM documents)
         SELECT shard, cast(count(*) AS bigint) AS n_docs,
           cast(sum(len(string_split(text, ' '))) AS bigint) AS n_tokens,
           cast(bit_xor(h) AS bigint) AS content_xor
         FROM d GROUP BY 1""",
    // recomputed from the source table — file-identity is what the gate
    // proves on the Spark side
    "q441_geojson_source" ->
      """WITH f AS (SELECT c_custkey AS k,
             (c_custkey % 20) * 10 AS x, (c_custkey // 20) * 10 AS y,
             c_name
           FROM customer)
         SELECT 'Polygon' AS gtype, cast(count(*) AS bigint) AS n_features,
           cast(count(*) * 5 AS bigint) AS n_vertices,
           cast(min(x) AS bigint) AS min_x,
           cast(max(x + 5) AS bigint) AS max_x,
           cast(sum(length('c' || cast(k AS varchar))) AS bigint)
             AS sum_id_len,
           cast(sum(length(c_name)) AS bigint) AS sum_name_len
         FROM f""",
    "q442_stream_geojson" ->
      """SELECT CASE WHEN c_custkey % 2 = 0 THEN 5 ELSE 4 END
             AS n_vertices,
           cast(count(*) AS bigint) AS n_features
         FROM customer GROUP BY 1""",
    // SemDeDup: q186's seeded-centroid assignment CTEs, then within-cluster
    // smaller-id near-neighbor pruning; membership proven by 56-bit md5-XOR
    // set checksums (the q440 manifest trick)
    "q443_semdedup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         seeds AS MATERIALIZED (SELECT v AS w, row_number() OVER (ORDER BY
             ('0x' || substr(md5(cast(vec_id AS varchar)), 1, 8))::bigint,
             vec_id) - 1 AS c
           FROM e),
         cent AS MATERIALIZED (SELECT c, w FROM seeds WHERE c < 8),
         sc AS (SELECT vec_id, v, c,
             list_sum(list_transform(generate_series(1, 64), i -> v[i] * w[i]))
               - list_sum(list_transform(w, x -> x*x)) / 2.0 AS score
           FROM e, cent),
         a AS (SELECT vec_id, v, c AS cluster FROM (
             SELECT vec_id, v, c, row_number() OVER (PARTITION BY vec_id
               ORDER BY score DESC, c) AS rn FROM sc) t
           WHERE rn = 1),
         drops AS (SELECT DISTINCT y.cluster, y.vec_id AS bid
           FROM a x JOIN a y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
           WHERE round(
             list_sum(list_transform(generate_series(1, 64), i -> x.v[i]*y.v[i]))
             / (sqrt(list_sum(list_transform(x.v, t -> t*t)))
                * sqrt(list_sum(list_transform(y.v, t -> t*t)))), 6) >= 0.35)
         SELECT cast(a.cluster AS int) AS cluster, count(*) AS n_vecs,
           cast(sum(CASE WHEN d.bid IS NOT NULL THEN 1 ELSE 0 END) AS bigint)
             AS n_dropped,
           bit_xor(CASE WHEN d.bid IS NULL THEN
             ('0x' || substr(md5(cast(a.vec_id AS varchar)), 1, 14))::bigint
             ELSE 0 END) AS kept_xor,
           bit_xor(CASE WHEN d.bid IS NOT NULL THEN
             ('0x' || substr(md5(cast(a.vec_id AS varchar)), 1, 14))::bigint
             ELSE 0 END) AS dropped_xor
         FROM a LEFT JOIN drops d
           ON a.cluster = d.cluster AND a.vec_id = d.bid
         GROUP BY a.cluster""",
    // IVM: the oracle recomputes the refreshed view FROM SCRATCH over
    // (base \ deletes) ∪ inserts — equality with the engine's signed-delta
    // merge is the IVM correctness theorem instantiated
    "q444_incremental_view" ->
      """SELECT o_orderpriority, cast(year(o_orderdate) AS bigint) AS yr,
           count(*) AS n,
           round(cast(sum(cast(o_totalprice AS decimal(18,2))) AS double), 2)
             + 0.0 AS revenue
         FROM orders
         WHERE o_orderkey % 10 = 0 OR o_orderkey % 7 <> 0
         GROUP BY 1, 2""",
    // deterministic Laplace: u = (h + 0.5)/2^32 from the first 8 md5 hex
    // chars, inverse-CDF noise at ε = 0.5, 6-dp rounded before the add
    "q445_dp_histogram" ->
      """WITH g AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
         u AS (SELECT event_type, n,
             (('0x' || substr(md5('dp:' || event_type), 1, 8))::bigint + 0.5)
               / 4294967296.0 AS u
           FROM g),
         z AS (SELECT event_type, n,
             round(-2.0 * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)), 6)
               AS noise
           FROM u)
         SELECT event_type, n,
           round(cast(n AS double) + noise, 6) + 0.0 AS noisy_n,
           abs(noise) + 0.0 AS abs_err
         FROM z""",
    // DoReMi: q88's token-surprisal CTEs at the source grain; every
    // boundary value fixed in 1e6-scaled integers via mirrored half-away
    // floors, so the MW update is exact-integer until the final quotient
    "q446_domain_reweight" ->
      """WITH tok AS (SELECT source, t AS term FROM (
             SELECT source, unnest(string_split(text, ' ')) AS t
             FROM documents) x
           WHERE t <> ''),
         c AS (SELECT term, count(*) AS c FROM tok GROUP BY 1),
         tot AS (SELECT sum(c) AS n_total FROM c),
         s AS (SELECT tok.source,
             cast(round(-ln(cast(c.c AS double) / tot.n_total), 6)
               AS decimal(18,6)) AS s
           FROM tok JOIN c ON tok.term = c.term CROSS JOIN tot),
         loss AS (SELECT source, count(*) AS n_tokens,
             cast(floor(cast(sum(s) AS double) / count(*) * 1000000.0 + 0.5)
               AS bigint) AS lk
           FROM s GROUP BY 1),
         m AS (SELECT sum(lk) AS lsum, count(*) AS ns FROM loss),
         w AS (SELECT source, n_tokens, lk,
             cast(floor(exp(1.0 * (cast(lk AS double)
               - cast(m.lsum AS double) / m.ns) / 1000000.0) * 1000000.0
               + 0.5) AS bigint) AS wk
           FROM loss CROSS JOIN m),
         z AS (SELECT sum(wk) AS z FROM w)
         SELECT source, n_tokens,
           cast(lk AS double) / 1000000.0 AS mean_surprisal,
           floor(cast(wk AS double) / cast(z.z AS double) * 1000000.0 + 0.5)
             / 1000000.0 AS weight
         FROM w CROSS JOIN z""",
    // every customer became exactly one GeoJSONL feature; the pushed
    // shard-count partials must sum to the source cardinality
    "q447_count_pushdown" ->
      "SELECT count(*) AS n_features FROM customer",
    // the limited count is the limit itself (lake >> 7 rows); the full
    // count equals the source cardinality
    "q473_limit_pushdown" ->
      """SELECT cast(7 AS bigint) AS n_limited,
           count(*) AS n_total FROM customer""",
    // the SPJ gate's join is semantically orders⋈customer on custkey,
    // bucket key = custkey % 8
    "q448_spj_join" ->
      """SELECT cast(o_custkey % 8 AS int) AS pkey, count(*) AS n_orders,
           count(DISTINCT o_custkey) AS n_customers,
           cast(sum(length(c_name)) AS bigint) AS sum_name_len
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1""",
    // identical shape to the q441 oracle — the write path must be
    // invisible to the aggregate
    "q449_v2_write_roundtrip" ->
      """WITH f AS (SELECT c_custkey AS k,
             (c_custkey % 20) * 10 AS x, (c_custkey // 20) * 10 AS y,
             c_name
           FROM customer)
         SELECT 'Polygon' AS gtype, cast(count(*) AS bigint) AS n_features,
           cast(count(*) * 5 AS bigint) AS n_vertices,
           cast(min(x) AS bigint) AS min_x,
           cast(max(x + 5) AS bigint) AS max_x,
           cast(sum(length('c' || cast(k AS varchar))) AS bigint)
             AS sum_id_len,
           cast(sum(length(c_name)) AS bigint) AS sum_name_len
         FROM f""",
    "q450_viterbi_segment" -> viterbiOracleSql(512, 12, 4, "20.000000"),
    // the SQL-UDF body inlined — a Spark SQL UDF is a pure expression view
    "q453_sql_udf" ->
      """SELECT CASE WHEN l_discount < 0.02 THEN 'low'
             WHEN l_discount < 0.06 THEN 'mid' ELSE 'high' END AS tier,
           count(*) AS n,
           round(cast(sum(cast(l_quantity AS decimal(18,2))) AS double), 2)
             + 0.0 AS total_qty
         FROM lineitem GROUP BY 1""",
    // collation mirrored with lower()
    "q454_collation" ->
      """WITH m AS (SELECT CASE WHEN c_custkey % 2 = 0
             THEN upper(c_mktsegment) ELSE lower(c_mktsegment) END AS seg
           FROM customer)
         SELECT count(*) AS n_total,
           count(CASE WHEN lower(seg) = 'building' THEN 1 END)
             AS n_building,
           cast(count(DISTINCT lower(seg)) AS bigint) AS n_segments,
           cast(count(DISTINCT seg) AS bigint) AS n_raw_variants
         FROM m""",
    // pipe syntax answers identically to the classic form
    "q455_pipe_sql" ->
      """SELECT o_orderpriority, count(*) AS n,
           round(cast(sum(cast(o_totalprice AS decimal(18,2)))
             AS double), 2) + 0.0 AS revenue
         FROM orders WHERE year(o_orderdate) = 1996
         GROUP BY o_orderpriority""",
    // rank algebra on the compressed distribution, 2x-scaled tied ranks
    "q456_mann_whitney" ->
      """WITH b AS (SELECT cast(l_quantity AS int) AS v,
             CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END AS g1
           FROM lineitem),
         d AS (SELECT v, cast(sum(g1) AS bigint) AS n1v,
             cast(count(*) - sum(g1) AS bigint) AS n2v
           FROM b GROUP BY 1),
         r AS (SELECT v, n1v, n2v, n1v + n2v AS nv,
             cast(coalesce(sum(n1v + n2v) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS bigint) AS cb
           FROM d),
         a AS (SELECT cast(sum(n1v) AS bigint) AS n1,
             cast(sum(n2v) AS bigint) AS n2,
             cast(sum(n1v * (2 * cb + nv + 1)) AS bigint) AS r1_x2,
             cast(sum(nv * nv * nv - nv) AS bigint) AS tt
           FROM r)
         SELECT n1, n2,
           r1_x2 - n1 * (n1 + 1) AS u1_x2,
           2 * n1 * n2 - (r1_x2 - n1 * (n1 + 1)) AS u2_x2,
           floor((cast(r1_x2 - n1 * (n1 + 1) AS double) / 2.0
               - cast(n1 * n2 AS double) / 2.0)
             / sqrt(cast(n1 AS double) * cast(n2 AS double) / 12.0
               * (cast(n1 + n2 + 1 AS double) - cast(tt AS double)
                 / (cast(n1 + n2 AS double) * cast(n1 + n2 - 1 AS double))))
             * 1000000 + 0.5) / 1000000.0 AS z_approx
         FROM a""",
    // BH step-up in scaled-integer algebra; logistic Phi both sides
    "q457_bh_fdr" ->
      """WITH li AS (SELECT n.n_nationkey, n.n_name,
             CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS r
           FROM lineitem l
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
           JOIN nation n ON s.s_nationkey = n.n_nationkey),
         per AS (SELECT n_nationkey, n_name,
             cast(count(*) AS bigint) AS n_li,
             cast(sum(r) AS bigint) AS x_ret
           FROM li GROUP BY 1, 2),
         g AS (SELECT cast(sum(n_li) AS bigint) AS nt,
             cast(sum(x_ret) AS bigint) AS xt FROM per),
         z AS (SELECT per.*,
             cast(xt AS double) / cast(nt AS double) AS p0
           FROM per CROSS JOIN g),
         z2 AS (SELECT n_nationkey, n_name, n_li, x_ret,
             (cast(x_ret AS double) / cast(n_li AS double) - p0)
               / sqrt(p0 * (1.0 - p0) / cast(n_li AS double)) AS zz
           FROM z),
         p AS (SELECT *, cast(floor((2.0 * (1.0
               - 1.0 / (1.0 + exp(-1.702 * abs(zz)))))
             * 1000000 + 0.5) AS bigint) AS p6 FROM z2),
         rk AS (SELECT *,
             row_number() OVER (ORDER BY p6, n_nationkey) AS rnk,
             cast(count(*) OVER () AS bigint) AS m FROM p),
         km AS (SELECT *, max(CASE WHEN p6 * m * 20 <= rnk * 1000000
               THEN rnk ELSE 0 END) OVER () AS kmax FROM rk)
         SELECT n_name, n_li, x_ret,
           cast(p6 AS double) / 1000000.0 AS p_value,
           cast(rnk AS bigint) AS rnk,
           CASE WHEN rnk <= kmax THEN 1 ELSE 0 END AS rejected
         FROM km""",
    // 2x2 conditional aggregation; cell means 6dp-floored before the
    // contrast so the DiD is exact integer algebra
    "q458_did" ->
      """WITH cust AS (SELECT c_custkey,
             CASE WHEN r.r_name = 'ASIA' THEN 1 ELSE 0 END AS treated
           FROM customer c
           JOIN nation n ON c.c_nationkey = n.n_nationkey
           JOIN region r ON n.n_regionkey = r.r_regionkey),
         o AS (SELECT treated,
             CASE WHEN o_orderdate >= DATE '1999-01-01'
               THEN 1 ELSE 0 END AS post,
             cast(cast(o_totalprice AS decimal(18,2)) * 100 AS bigint)
               AS cents
           FROM orders JOIN cust ON o_custkey = c_custkey),
         a AS (SELECT
             cast(sum(CASE WHEN treated = 0 AND post = 0 THEN 1 END)
               AS bigint) AS n00,
             cast(sum(CASE WHEN treated = 0 AND post = 1 THEN 1 END)
               AS bigint) AS n01,
             cast(sum(CASE WHEN treated = 1 AND post = 0 THEN 1 END)
               AS bigint) AS n10,
             cast(sum(CASE WHEN treated = 1 AND post = 1 THEN 1 END)
               AS bigint) AS n11,
             cast(floor(cast(sum(CASE WHEN treated = 0 AND post = 0
                 THEN cents END) AS double)
               / sum(CASE WHEN treated = 0 AND post = 0 THEN 1 END)
               / 100.0 * 1000000 + 0.5) AS bigint) AS m00,
             cast(floor(cast(sum(CASE WHEN treated = 0 AND post = 1
                 THEN cents END) AS double)
               / sum(CASE WHEN treated = 0 AND post = 1 THEN 1 END)
               / 100.0 * 1000000 + 0.5) AS bigint) AS m01,
             cast(floor(cast(sum(CASE WHEN treated = 1 AND post = 0
                 THEN cents END) AS double)
               / sum(CASE WHEN treated = 1 AND post = 0 THEN 1 END)
               / 100.0 * 1000000 + 0.5) AS bigint) AS m10,
             cast(floor(cast(sum(CASE WHEN treated = 1 AND post = 1
                 THEN cents END) AS double)
               / sum(CASE WHEN treated = 1 AND post = 1 THEN 1 END)
               / 100.0 * 1000000 + 0.5) AS bigint) AS m11
           FROM o)
         SELECT n00, n01, n10, n11,
           cast(m00 AS double) / 1000000.0 AS mean_c_pre,
           cast(m01 AS double) / 1000000.0 AS mean_c_post,
           cast(m10 AS double) / 1000000.0 AS mean_t_pre,
           cast(m11 AS double) / 1000000.0 AS mean_t_post,
           cast((m11 - m10) - (m01 - m00) AS double) / 1000000.0 AS did
         FROM a""",
    // exact-match strata; ATT weights = treated counts per stratum
    "q459_cem_att" ->
      """WITH spend AS (SELECT o_custkey,
             cast(sum(cast(o_totalprice AS decimal(18,2)) * 100)
               AS bigint) AS sc
           FROM orders GROUP BY 1),
         cust AS (SELECT c_nationkey, c_mktsegment,
             coalesce(sc, 0) AS cents,
             CASE WHEN ('0x' || substr(md5('cem:'
                 || cast(c_custkey AS varchar)), 1, 8))::bigint % 2 = 0
               THEN 1 ELSE 0 END AS treated
           FROM customer LEFT JOIN spend ON c_custkey = o_custkey),
         cells AS (SELECT c_nationkey, c_mktsegment,
             cast(sum(CASE WHEN treated = 1 THEN 1 END) AS bigint) AS nt,
             cast(sum(CASE WHEN treated = 0 THEN 1 END) AS bigint) AS nc,
             cast(sum(CASE WHEN treated = 1 THEN cents END) AS bigint)
               AS st,
             cast(sum(CASE WHEN treated = 0 THEN cents END) AS bigint)
               AS scs
           FROM cust GROUP BY 1, 2),
         m AS (SELECT *,
             cast(floor(cast(st AS double) / nt / 100.0
               * 1000000 + 0.5) AS bigint)
             - cast(floor(cast(scs AS double) / nc / 100.0
               * 1000000 + 0.5) AS bigint) AS d6
           FROM cells WHERE nt > 0 AND nc > 0)
         SELECT (SELECT cast(count(*) AS bigint) FROM cells) AS n_cells,
           cast(count(*) AS bigint) AS n_matched,
           cast(sum(nt) AS bigint) AS n_treated_matched,
           cast(sum(nc) AS bigint) AS n_control_matched,
           floor(cast(sum(nt * d6) AS double) / sum(nt) + 0.5)
             / 1000000.0 AS att
         FROM m""",
    // 64 deterministic md5-parity label permutations
    "q460_permutation_test" ->
      """WITH li AS (SELECT cast(l_orderkey AS varchar) || ':'
             || cast(l_linenumber AS varchar) AS key,
             cast(l_quantity AS bigint) AS v,
             CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END AS g1
           FROM lineitem),
         og AS (SELECT g1, cast(count(*) AS bigint) AS n,
             cast(sum(v) AS bigint) AS s FROM li GROUP BY 1),
         obs AS (SELECT
             cast(sum(CASE WHEN g1 = 1 THEN n END) AS bigint) AS n1,
             cast(sum(CASE WHEN g1 = 0 THEN n END) AS bigint) AS n2,
             cast(floor((cast(sum(CASE WHEN g1 = 1 THEN s END) AS double)
                 / sum(CASE WHEN g1 = 1 THEN n END)
               - cast(sum(CASE WHEN g1 = 0 THEN s END) AS double)
                 / sum(CASE WHEN g1 = 0 THEN n END))
               * 1000000 + 0.5) AS bigint) AS obs6
           FROM og),
         e AS (SELECT key, v,
             unnest(generate_series(1, 64)) AS b FROM li),
         e2 AS (SELECT b, v, ('0x' || substr(md5('pt:' || key || ':'
             || cast(b AS varchar)), 1, 8))::bigint % 2 AS pg FROM e),
         pm AS (SELECT b, pg, cast(count(*) AS bigint) AS n,
             cast(sum(v) AS bigint) AS s FROM e2 GROUP BY 1, 2),
         pd AS (SELECT b,
             cast(floor((cast(sum(CASE WHEN pg = 1 THEN s END) AS double)
                 / sum(CASE WHEN pg = 1 THEN n END)
               - cast(sum(CASE WHEN pg = 0 THEN s END) AS double)
                 / sum(CASE WHEN pg = 0 THEN n END))
               * 1000000 + 0.5) AS bigint) AS d6
           FROM pm GROUP BY 1)
         SELECT obs.n1, obs.n2,
           cast(obs.obs6 AS double) / 1000000.0 AS obs_diff,
           cast(coalesce(sum(CASE WHEN abs(d6) >= abs(obs6)
             THEN 1 END), 0) AS bigint) AS n_extreme,
           floor(cast(coalesce(sum(CASE WHEN abs(d6) >= abs(obs6)
               THEN 1 END), 0) + 1 AS double) / 65.0
             * 1000000 + 0.5) / 1000000.0 AS p_value
         FROM pd CROSS JOIN obs
         GROUP BY obs.n1, obs.n2, obs.obs6""",
    // the session variable inlined through a scalar CTE
    "q462_session_variable" ->
      """WITH thr AS (SELECT cast(floor(
             sum(cast(cast(o_totalprice AS decimal(18,2)) * 100
               AS bigint)) / count(*)) AS bigint) AS thr_cents
           FROM orders)
         SELECT o_orderpriority, count(*) AS n_above,
           round(cast(sum(cast(o_totalprice AS decimal(18,2)))
             AS double), 2) + 0.0 AS revenue_above
         FROM orders CROSS JOIN thr
         WHERE cast(cast(o_totalprice AS decimal(18,2)) * 100 AS bigint)
           > thr_cents
         GROUP BY o_orderpriority""",
    // the dynamic statement with its parameters inlined
    "q463_execute_immediate" ->
      """SELECT o_orderpriority, count(*) AS n,
           round(cast(sum(cast(o_totalprice AS decimal(18,2)))
             AS double), 2) + 0.0 AS revenue
         FROM orders
         WHERE o_orderdate >= DATE '1998-01-01'
           AND o_orderdate < DATE '1999-01-01'
         GROUP BY o_orderpriority""",
    // try_divide mirrored as an explicit zero guard
    "q464_try_arithmetic" ->
      """WITH m AS (SELECT l_discount,
             CASE WHEN l_discount = 0 THEN NULL
               ELSE l_extendedprice / l_discount END AS m
           FROM lineitem)
         SELECT cast(count(*) AS bigint) AS n_rows,
           cast(sum(CASE WHEN m IS NULL THEN 1 END) AS bigint)
             AS n_null_ratio,
           cast(count(m) AS bigint) AS n_ok,
           cast(sum(CASE WHEN m IS NOT NULL
             THEN cast(floor(m * 1000000 + 0.5) AS bigint) END)
             AS bigint) AS sum_m6,
           floor(cast(sum(CASE WHEN m IS NOT NULL
               THEN cast(floor(m * 1000000 + 0.5) AS bigint) END)
               AS double)
             / count(m) + 0.5) / 1000000.0 AS mean_markup
         FROM m""",
    // per-stratum 6dp-floored rational terms, exactly summed
    "q468_cmh_odds" ->
      """WITH li AS (SELECT s.s_nationkey,
             CASE WHEN l.l_discount >= 0.05 THEN 1 ELSE 0 END AS e,
             CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS r
           FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey),
         st AS (SELECT s_nationkey,
             cast(count(CASE WHEN e = 1 AND r = 1 THEN 1 END) AS bigint)
               AS a,
             cast(count(CASE WHEN e = 1 AND r = 0 THEN 1 END) AS bigint)
               AS b,
             cast(count(CASE WHEN e = 0 AND r = 1 THEN 1 END) AS bigint)
               AS c,
             cast(count(CASE WHEN e = 0 AND r = 0 THEN 1 END) AS bigint)
               AS d,
             cast(count(*) AS bigint) AS n
           FROM li GROUP BY 1),
         t AS (SELECT a, n,
             cast(floor(cast(a * d AS double) / n * 1000000 + 0.5)
               AS bigint) AS num6,
             cast(floor(cast(b * c AS double) / n * 1000000 + 0.5)
               AS bigint) AS den6,
             cast(floor(cast(a + b AS double) * cast(a + c AS double)
               / n * 1000000 + 0.5) AS bigint) AS e6,
             cast(floor(cast(a + b AS double) * cast(c + d AS double)
               * cast(a + c AS double) * cast(b + d AS double)
               / (cast(n AS double) * cast(n AS double)
                 * cast(n - 1 AS double))
               * 1000000 + 0.5) AS bigint) AS v6
           FROM st),
         agg AS (SELECT cast(count(*) AS bigint) AS n_strata,
             cast(sum(a) AS bigint) AS sum_a,
             cast(sum(num6) AS bigint) AS num6,
             cast(sum(den6) AS bigint) AS den6,
             cast(sum(e6) AS bigint) AS sume6,
             cast(sum(v6) AS bigint) AS sumv6
           FROM t)
         SELECT n_strata, sum_a,
           cast(sume6 AS double) / 1000000.0 AS sum_expected,
           floor(cast(num6 AS double) / den6 * 1000000 + 0.5)
             / 1000000.0 AS or_cmh,
           floor((cast(abs(sum_a * 1000000 - sume6) AS double)
               / 1000000.0 - 0.5)
             * (cast(abs(sum_a * 1000000 - sume6) AS double)
               / 1000000.0 - 0.5)
             / (cast(sumv6 AS double) / 1000000.0)
             * 1000000 + 0.5) / 1000000.0 AS chi2_cmh
         FROM agg""",
    // generated 5-scenario unrolled value iteration
    "q478_markov_attribution" -> MarkovRemovalOracleSql,
    // shared generated geohash expression (// spelling)
    "q481_geohash" -> s"""
      WITH pts AS (SELECT c_custkey,
          cast(c_custkey * 7 % 360 - 180 AS bigint) AS lon,
          cast(c_custkey * 13 % 180 - 90 AS bigint) AS lat
        FROM customer)
      SELECT ${geohashSqlExpr("lon", "lat", "//")} AS geohash,
        count(*) AS n_points,
        cast(min(c_custkey) AS bigint) AS sample_custkey
      FROM pts GROUP BY 1""",
    // argmin by (d2, station_id) via a per-point window
    "q482_nearest_station" ->
      """WITH st AS (SELECT * FROM (VALUES (0, -120, 40), (1, -60, -10),
             (2, 0, 50), (3, 30, -25), (4, 75, 20), (5, 120, 60),
             (6, 150, -40), (7, -150, -65))
           AS t(station_id, s_lon, s_lat)),
         pts AS (SELECT c_custkey,
             cast(c_custkey * 7 % 360 - 180 AS bigint) AS lon,
             cast(c_custkey * 13 % 180 - 90 AS bigint) AS lat
           FROM customer),
         d AS (SELECT c_custkey, station_id,
             (lon - s_lon) * (lon - s_lon)
               + (lat - s_lat) * (lat - s_lat) AS d2,
             row_number() OVER (PARTITION BY c_custkey
               ORDER BY (lon - s_lon) * (lon - s_lon)
                 + (lat - s_lat) * (lat - s_lat), station_id) AS rk
           FROM pts CROSS JOIN st)
         SELECT cast(station_id AS bigint) AS station_id,
           cast(count(*) AS bigint) AS n_assigned,
           floor(cast(sum(d2) AS double) / count(*) * 1000000 + 0.5)
             / 1000000.0 AS mean_d2
         FROM d WHERE rk = 1 GROUP BY 1""",
    // per-row 6dp-floored kernel terms, exactly summed
    "q483_kde_grid" ->
      """WITH c AS (SELECT cast(cast(o_totalprice AS decimal(18,2)) * 100
             AS bigint) AS x FROM orders),
         mm AS (SELECT min(x) AS lo, max(x) AS hi FROM c),
         e AS (SELECT x, lo, hi,
             unnest(generate_series(0, 20)) AS k
           FROM c CROSS JOIN mm),
         t AS (SELECT k,
             cast(lo AS double) + cast(k AS double)
               * cast(hi - lo AS double) / 20.0 AS gk,
             x, lo, hi
           FROM e),
         u AS (SELECT k, gk,
             cast(floor(exp(
               ((cast(x AS double) - gk)
                 / (cast(hi - lo AS double) / 10.0))
               * ((cast(x AS double) - gk)
                 / (cast(hi - lo AS double) / 10.0))
               / -2.0) * 1000000 + 0.5) AS bigint) AS t6
           FROM t)
         SELECT cast(k AS int) AS k,
           min(gk) / 100.0 AS grid_dollars,
           cast(sum(t6) AS bigint) AS sum_t6,
           floor(cast(sum(t6) AS double) / count(*) * 1000000 + 0.5)
             / 1000000.0 / 1000000.0 AS mean_kernel
         FROM u GROUP BY 1""",
    // integer cross-product logs; WoE floored before the IV product
    "q479_woe_iv" ->
      """WITH b AS (SELECT (cast(l_quantity AS int) - 1) // 10 AS bucket,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r
           FROM lineitem),
         g AS (SELECT cast(bucket AS int) AS bucket,
             cast(count(CASE WHEN r = 0 THEN 1 END) AS bigint) AS n_good,
             cast(count(CASE WHEN r = 1 THEN 1 END) AS bigint) AS n_bad
           FROM b GROUP BY 1),
         tot AS (SELECT cast(sum(n_good) AS bigint) AS tg,
             cast(sum(n_bad) AS bigint) AS tb FROM g),
         w AS (SELECT g.*, tg, tb,
             cast(floor(ln(cast(n_bad AS double) * tg
               / (cast(n_good AS double) * tb))
               * 1000000 + 0.5) AS bigint) AS woe6
           FROM g CROSS JOIN tot)
         SELECT bucket, n_good, n_bad,
           cast(woe6 AS double) / 1000000.0 AS woe,
           floor((cast(n_bad AS double) / tb
               - cast(n_good AS double) / tg)
             * (cast(woe6 AS double) / 1000000.0)
             * 1000000 + 0.5) / 1000000.0 AS iv_term
         FROM w""",
    // cross-multiplied integer control decisions; A2=0.577, D4=2.114
    "q474_xbar_r_chart" ->
      """WITH sub AS (SELECT o_orderdate AS d, o_orderkey,
             cast(cast(o_totalprice AS decimal(18,2)) * 100 AS bigint)
               AS cents,
             row_number() OVER (PARTITION BY o_orderdate
               ORDER BY o_orderkey) AS rn
           FROM orders),
         days AS (SELECT d, cast(count(*) AS bigint) AS n,
             cast(sum(cents) AS bigint) AS sum5,
             cast(max(cents) - min(cents) AS bigint) AS r
           FROM sub WHERE rn <= 5 GROUP BY 1 HAVING count(*) = 5),
         tot AS (SELECT cast(count(*) AS bigint) AS nd,
             cast(sum(sum5) AS bigint) AS tsum,
             cast(sum(r) AS bigint) AS tr FROM days)
         SELECT nd AS n_days,
           floor(cast(tsum AS double) / (nd * 5) / 100.0
             * 1000000 + 0.5) / 1000000.0 AS grand_mean,
           floor(cast(tr AS double) / nd / 100.0
             * 1000000 + 0.5) / 1000000.0 AS mean_range,
           cast(sum(CASE WHEN abs(sum5 * nd - tsum) * 200 > tr * 577
             THEN 1 ELSE 0 END) AS bigint) AS n_xbar_out,
           cast(sum(CASE WHEN r * nd * 1000 > tr * 2114
             THEN 1 ELSE 0 END) AS bigint) AS n_r_out
         FROM days CROSS JOIN tot
         GROUP BY nd, tsum, tr""",
    // nearest-rank quartiles; fences in x2 integer scale
    "q475_tukey_fences" ->
      """WITH c AS (SELECT c_mktsegment AS seg, c_custkey,
             cast(cast(c_acctbal AS decimal(18,2)) * 100 AS bigint)
               AS cents,
             row_number() OVER (PARTITION BY c_mktsegment
               ORDER BY cast(cast(c_acctbal AS decimal(18,2)) * 100
                 AS bigint), c_custkey) AS rn,
             count(*) OVER (PARTITION BY c_mktsegment) AS n
           FROM customer),
         q AS (SELECT seg,
             min(CASE WHEN rn = ceil(n / 4.0) THEN cents END) AS q1,
             max(CASE WHEN rn = ceil(n * 3 / 4.0) THEN cents END) AS q3
           FROM c WHERE rn = ceil(n / 4.0) OR rn = ceil(n * 3 / 4.0)
           GROUP BY 1)
         SELECT c.seg, cast(count(*) AS bigint) AS n,
           floor(cast(min(q1) AS double)) / 100.0 AS q1_dollars,
           floor(cast(min(q3) AS double)) / 100.0 AS q3_dollars,
           cast(sum(CASE WHEN cents * 2 < q1 * 2 - (q3 - q1) * 3
             THEN 1 ELSE 0 END) AS bigint) AS n_low_outliers,
           cast(sum(CASE WHEN cents * 2 > q3 * 2 + (q3 - q1) * 3
             THEN 1 ELSE 0 END) AS bigint) AS n_high_outliers
         FROM c JOIN q ON c.seg = q.seg
         GROUP BY 1""",
    // exact decimal moments; the argmax deviant via a window
    "q476_grubbs" ->
      """WITH c AS (SELECT c_nationkey, c_custkey,
             cast(cast(c_acctbal AS decimal(18,2)) * 100 AS hugeint)
               AS cents
           FROM customer),
         m AS (SELECT c_nationkey, cast(count(*) AS bigint) AS n,
             sum(cents) AS s1, sum(cents * cents) AS s2
           FROM c GROUP BY 1),
         d AS (SELECT c.c_nationkey, m.n, m.s1, m.s2, c.c_custkey,
             abs(c.cents * m.n - m.s1) AS devn,
             row_number() OVER (PARTITION BY c.c_nationkey
               ORDER BY abs(c.cents * m.n - m.s1) DESC,
                 c.c_custkey DESC) AS rk
           FROM c JOIN m ON c.c_nationkey = m.c_nationkey)
         SELECT c_nationkey, n, c_custkey AS worst_custkey,
           floor(
             (cast(devn AS double) / cast(n AS double) / 100.0)
             / sqrt((cast(n AS double) * cast(s2 AS double)
               - cast(s1 AS double) * cast(s1 AS double))
               / (cast(n AS double) * cast(n - 1 AS double)) / 10000.0)
             * 1000000 + 0.5) / 1000000.0 AS g_stat
         FROM d WHERE rk = 1""",
    // integer between-supplier variance feeds the MoM strength K
    "q477_eb_shrinkage" ->
      """WITH per AS (SELECT l_suppkey, cast(count(*) AS bigint) AS n,
             cast(count(CASE WHEN l_returnflag = 'R' THEN 1 END)
               AS bigint) AS x
           FROM lineitem GROUP BY 1),
         pr AS (SELECT *, cast(floor(cast(x AS double) / n
             * 1000000 + 0.5) AS bigint) AS r6 FROM per),
         g AS (SELECT cast(count(*) AS bigint) AS ns,
             cast(sum(x) AS bigint) AS tx, cast(sum(n) AS bigint) AS tn
           FROM pr),
         g2 AS (SELECT ns, cast(floor(cast(tx AS double) / tn
             * 1000000 + 0.5) AS bigint) AS m6 FROM g),
         vb AS (SELECT g2.ns, g2.m6,
             cast(sum((r6 - m6) * (r6 - m6)) AS double)
               / cast(g2.ns - 1 AS double) / 1.0e12 AS vb
           FROM pr CROSS JOIN g2 GROUP BY 1, 2),
         k AS (SELECT ns, m6, CASE WHEN vb > 0 THEN
             (cast(m6 AS double) / 1000000.0
               * (1.0 - cast(m6 AS double) / 1000000.0)) / vb - 1.0
             ELSE 0.0 END AS k FROM vb)
         SELECT l_suppkey, n, x,
           cast(r6 AS double) / 1000000.0 AS raw_rate,
           floor((cast(x AS double)
               + k * (cast(m6 AS double) / 1000000.0))
             / (cast(n AS double) + k)
             * 1000000 + 0.5) / 1000000.0 AS shrunk_rate
         FROM pr CROSS JOIN k""",
    // 16-coalition exact Shapley; ×24 integer weights
    "q472_shapley_attribution" ->
      """WITH ue AS (SELECT user_id,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             + 2 * max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             + 4 * max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
             + 8 * max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS mask,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv
           FROM events GROUP BY 1),
         cnt AS (SELECT mask AS t, cast(count(*) AS bigint) AS c
           FROM ue WHERE conv = 1 GROUP BY 1),
         sv AS (SELECT unnest(generate_series(0, 15)) AS s),
         v AS (SELECT sv.s, cast(coalesce(sum(cnt.c), 0) AS bigint) AS v
           FROM sv LEFT JOIN cnt ON (cnt.t & sv.s) = cnt.t GROUP BY 1),
         ch AS (SELECT * FROM (VALUES ('click', 1), ('view', 2),
             ('signup', 4), ('error', 8)) AS t(channel, bit)),
         terms AS (SELECT ch.channel,
             CASE WHEN bit_count(v0.s) IN (0, 3) THEN 6 ELSE 2 END
               * (v1.v - v0.v) AS term
           FROM ch
           JOIN v v0 ON (v0.s & ch.bit) = 0
           JOIN v v1 ON v1.s = (v0.s | ch.bit))
         SELECT channel, cast(sum(term) AS bigint) AS phi24,
           floor(cast(sum(term) AS double) / 24.0 * 1000000 + 0.5)
             / 1000000.0 AS phi
         FROM terms GROUP BY 1""",
    // ordered string_agg mirrors listagg ... within group
    "q469_listagg" ->
      """SELECT n_name,
           string_agg(DISTINCT c_mktsegment, ','
             ORDER BY c_mktsegment) AS segments,
           count(*) AS n_customers
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""",
    // confusables via chr() so the oracle text stays ASCII
    "q465_homoglyph_skeleton" ->
      """WITH c AS (SELECT c_custkey, c_name FROM customer),
         sp AS (SELECT CASE
             WHEN c_custkey % 3 = 1 THEN translate(c_name, 'o', chr(1086))
             WHEN c_custkey % 3 = 2 THEN translate(c_name, 'e', chr(1077))
             ELSE c_name || chr(8203) END AS display_name FROM c),
         a AS (SELECT c_name AS display_name FROM c
           UNION ALL SELECT display_name FROM sp),
         sk AS (SELECT display_name, translate(display_name,
             chr(1086) || chr(1077) || chr(8203), 'oe') AS skeleton
           FROM a)
         SELECT cast(count(*) AS bigint) AS n_rows,
           cast(count(DISTINCT display_name) AS bigint)
             AS n_distinct_display,
           cast(count(DISTINCT skeleton) AS bigint)
             AS n_distinct_skeleton,
           cast(sum(CASE WHEN display_name <> skeleton THEN 1 END)
             AS bigint) AS n_spoofed,
           cast(count(DISTINCT display_name) - count(DISTINCT skeleton)
             AS bigint) AS n_merged_variants
         FROM sk""",
    // paired-year signed ranks, 2x-scaled tied ranks, zero diffs drop
    "q461_wilcoxon_signed" ->
      """WITH li AS (SELECT s.s_nationkey,
             year(l.l_shipdate) AS y,
             CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS r
           FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
           WHERE year(l.l_shipdate) IN (1997, 1998)),
         rates AS (SELECT s_nationkey, y,
             cast(floor(cast(sum(r) AS double) / count(*)
               * 1000000 + 0.5) AS bigint) AS rate6
           FROM li GROUP BY 1, 2),
         pairs AS (SELECT s_nationkey,
             cast(sum(CASE WHEN y = 1998 THEN rate6 END)
               - sum(CASE WHEN y = 1997 THEN rate6 END) AS bigint) AS d
           FROM rates GROUP BY 1 HAVING count(*) = 2),
         nz AS (SELECT s_nationkey, d, abs(d) AS ad FROM pairs
           WHERE d <> 0),
         dist AS (SELECT ad, cast(count(*) AS bigint) AS cnt
           FROM nz GROUP BY 1),
         rv AS (SELECT ad AS adv,
             2 * cast(coalesce(sum(cnt) OVER (ORDER BY ad
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS bigint) + cnt + 1 AS rank_x2
           FROM dist),
         j AS (SELECT nz.d, rv.rank_x2 FROM nz
           JOIN rv ON nz.ad = rv.adv)
         SELECT (SELECT cast(count(*) AS bigint) FROM pairs) AS n_pairs,
           cast(count(*) AS bigint) AS n_nonzero,
           cast(coalesce(sum(CASE WHEN d > 0 THEN rank_x2 END), 0)
             AS bigint) AS w_plus_x2,
           cast(coalesce(sum(CASE WHEN d < 0 THEN rank_x2 END), 0)
             AS bigint) AS w_minus_x2
         FROM j""",
    // state carried across micro-batches == batch row_number
    "q466_stream_transform_with_state" ->
      """SELECT user_id, event_id,
           cast(row_number() OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS bigint) AS running_n
         FROM events""",
    // seeded counters == all-events row_number on the streamed half
    "q480_stream_seeded_count" ->
      """WITH mm AS (SELECT min(epoch_us(ts)) AS lo,
             max(epoch_us(ts)) AS hi FROM events),
         rn AS (SELECT user_id, event_id, epoch_us(ts) AS us,
             cast(row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS bigint) AS running_n
           FROM events)
         SELECT user_id, event_id, running_n
         FROM rn CROSS JOIN mm
         WHERE us >= lo + (hi - lo) // 2""",
    // ListState paths == batch lag windows
    "q470_stream_lastk_path" ->
      """SELECT user_id, event_id,
           concat_ws('>',
             lag(event_type, 2) OVER (PARTITION BY user_id
               ORDER BY ts, event_id),
             lag(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id),
             event_type) AS path
         FROM events""",
    // MapState counters == batch per-(user,type) row_number
    "q471_stream_type_counts" ->
      """SELECT user_id, event_id, event_type,
           cast(row_number() OVER (PARTITION BY user_id, event_type
             ORDER BY ts, event_id) AS bigint) AS type_n
         FROM events""",
    // timer-flushed sessions == batch gaps-and-islands at the same gap
    "q467_stream_session_timers" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us
           FROM events),
         l AS (SELECT user_id, event_id, us,
             CASE WHEN lag(us) OVER (PARTITION BY user_id
                 ORDER BY us, event_id) IS NULL
               OR us - lag(us) OVER (PARTITION BY user_id
                 ORDER BY us, event_id) > 1800000000
               THEN 1 ELSE 0 END AS new_s
           FROM e),
         g AS (SELECT user_id, us,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM l)
         SELECT user_id, min(us) AS session_start_us,
           max(us) AS session_end_us,
           cast(count(*) AS bigint) AS n_events
         FROM g GROUP BY user_id, sid""",
    "q452_stream_full_interval_join" ->
      """WITH c AS (SELECT event_id, ts, user_id FROM events
           WHERE event_type = 'click'),
         p AS (SELECT event_id AS p_event_id, ts AS p_ts,
             user_id AS p_user_id FROM events
           WHERE event_type = 'purchase')
         SELECT c.event_id, p.p_event_id FROM c FULL OUTER JOIN p
           ON c.user_id = p.p_user_id AND p.p_ts >= c.ts
             AND p.p_ts <= c.ts + INTERVAL 30 MINUTE""",
    // Warner's randomized response mirrored nibble-for-nibble
    "q451_randomized_response" ->
      """WITH e AS (SELECT cast(user_id % 8 AS int) AS cohort,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS t,
             CASE WHEN ('0x' || substr(md5('rr1:' ||
                 cast(event_id AS varchar)), 1, 1))::int % 2 = 0
               THEN CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
               ELSE ('0x' || substr(md5('rr2:' ||
                 cast(event_id AS varchar)), 1, 1))::int % 2
             END AS r
           FROM events),
         g AS (SELECT cohort, count(*) AS n,
             cast(sum(t) AS bigint) AS n_true,
             cast(sum(r) AS bigint) AS n_reported
           FROM e GROUP BY 1)
         SELECT cohort, n, n_true,
           floor((cast(n_true AS double) / cast(n AS double)) * 1000000.0
             + 0.5) / 1000000.0 AS true_rate,
           floor((2.0 * (cast(n_reported AS double) / cast(n AS double))
             - 0.5) * 1000000.0 + 0.5) / 1000000.0 AS debiased_rate,
           floor(abs(2.0 * (cast(n_reported AS double) / cast(n AS double))
             - 0.5 - cast(n_true AS double) / cast(n AS double))
             * 1000000.0 + 0.5) / 1000000.0 AS abs_err
         FROM g""",
  )
}
