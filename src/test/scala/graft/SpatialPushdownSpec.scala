package graft

import org.apache.spark.sql.functions._

/** SpatialBboxPushdown (injected optimizer rule): a literal-ring
  * point_in_polygon filter must grow pushable bbox range conjuncts that
  * reach the parquet scan as PushedFilters — and the rewrite must not
  * change results. */
class SpatialPushdownSpec extends SparkSuite {

  private val ringSql =
    "array(array(-10d, -10d), array(40d, -10d), array(40d, 30d), array(-10d, 30d))"

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_bbox_push").toString
    Tables.lineitem(spark, sf)
      .select((col("l_partkey") * 7 % 360 - 180).cast("double").as("lon"),
        (col("l_suppkey") * 13 % 180 - 90).cast("double").as("lat"),
        col("l_orderkey"))
      .write.mode("overwrite").parquet(d)
    d
  }

  test("bbox conjuncts are derived and pushed to the parquet scan") {
    val q = spark.read.parquet(dir)
      .filter(expr(s"point_in_polygon(lon, lat, $ringSql)"))
    val optim = q.queryExecution.optimizedPlan.toString
    // ">= -10.0" can only come from a derived comparison — the ring
    // literal itself prints as [[-10.0,...]]
    assert(optim.contains(">= -10.0") && optim.contains("<= 40.0"),
      s"expected derived bbox range conjuncts in the optimized plan:\n$optim")
    val scans = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val pushed = scans.head.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(lon,-10.0)") &&
      pushed.contains("LessThanOrEqual(lon,40.0)") &&
      pushed.contains("GreaterThanOrEqual(lat,-10.0)") &&
      pushed.contains("LessThanOrEqual(lat,30.0)"),
      s"bbox range filters missing from PushedFilters: $pushed")
  }

  test("the rewrite preserves results exactly (brute ray-cast parity)") {
    def contains(lon: Double, lat: Double,
                 ring: Seq[(Double, Double)]): Boolean = {
      var inside = false
      var i = 0; var j = ring.length - 1
      while (i < ring.length) {
        val (xi, yi) = ring(i); val (xj, yj) = ring(j)
        if ((yi > lat) != (yj > lat) &&
          lon < (xj - xi) * (lat - yi) / (yj - yi) + xi) inside = !inside
        j = i; i += 1
      }
      inside
    }
    val ring = Seq((-10.0, -10.0), (40.0, -10.0), (40.0, 30.0), (-10.0, 30.0))
    val all = spark.read.parquet(dir).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2)))
    val expect = all.filter { case (lon, lat, _) =>
      contains(lon, lat, ring) }.map(_._3).sorted.toSeq
    val got = spark.read.parquet(dir)
      .filter(expr(s"point_in_polygon(lon, lat, $ringSql)"))
      .select("l_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == expect && got.nonEmpty)
  }

  test("no rewrite under negation (soundness guard)") {
    // a bbox conjunct derived from a NEGATED predicate would be unsound —
    // the rule must leave `NOT point_in_polygon(...)` filters untouched
    val q = spark.read.parquet(dir)
      .filter(expr(s"NOT point_in_polygon(lon, lat, $ringSql)"))
    val scans = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    val pushed = scans.head.metadata("PushedFilters")
    assert(!pushed.contains("GreaterThanOrEqual(lon,-10.0)"),
      s"unsound pushdown under NOT: $pushed")
    // and the full complement set comes back
    val n = spark.read.parquet(dir).count()
    val in = spark.read.parquet(dir)
      .filter(expr(s"point_in_polygon(lon, lat, $ringSql)")).count()
    assert(q.count() == n - in)
  }
}
