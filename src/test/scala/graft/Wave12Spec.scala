package graft

import org.apache.spark.sql.functions._

/** Brute cross-checks for wave 12 (q434–q436): type inference,
  * boilerplate removal, snapshot diff. */
class Wave12Spec extends SparkSuite {

  test("q434 inferred types match brute regex classification") {
    val rows = Tables.orders(spark, sf)
      .select(col("o_orderkey").cast("string"),
        col("o_totalprice").cast("decimal(18,2)").cast("string"),
        col("o_orderdate").cast("string"), col("o_orderpriority"))
      .collect()
    def cls(v: String): String =
      if (v.matches("-?[0-9]+")) "int"
      else if (v.matches("-?[0-9]+\\.[0-9]+")) "float"
      else if (v.matches("[0-9]{4}-[0-9]{2}-[0-9]{2}.*")) "ts"
      else "other"
    val cols = Seq("o_orderkey", "o_totalprice", "o_orderdate",
      "o_orderpriority")
    val out = SparkEntry.queries("q434_type_inference")(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    cols.zipWithIndex.foreach { case (cn, i) =>
      val vals = rows.map(_.getString(i))
      val r = out(cn)
      assert(r.getLong(1) == vals.length)
      assert(r.getLong(2) == vals.count(cls(_) == "int"))
      assert(r.getLong(3) == vals.count(cls(_) == "float"))
      assert(r.getLong(4) == vals.count(cls(_) == "ts"))
    }
    assert(out("o_orderkey").getString(5) == "BIGINT")
    assert(out("o_totalprice").getString(5) == "DOUBLE")
    assert(out("o_orderdate").getString(5) == "TIMESTAMP")
    assert(out("o_orderpriority").getString(5) == "STRING")
  }

  test("q435 removal accounting matches a brute chunk scan") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val chunksOf = docs.map { case (id, t) =>
      id -> t.split(" ", -1).grouped(5).map(_.mkString(" ")).toSeq
    }.toMap
    val dfc = scala.collection.mutable.Map.empty[String, Set[Long]]
    chunksOf.foreach { case (id, cs) =>
      cs.foreach(c => dfc(c) = dfc.getOrElse(c, Set.empty) + id) }
    val out = SparkEntry.queries("q435_boilerplate_removal")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    out.foreach { case (id, nChunks, nRemoved, cleanedMd5) =>
      val cs = chunksOf(id)
      assert(nChunks == cs.length)
      assert(nRemoved == cs.count(c => dfc(c).size >= 10))
      val cleaned = cs.filter(c => dfc(c).size < 10).mkString(" ")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(cleaned.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      assert(cleanedMd5 == md)
    }
  }

  test("q436 diff classes partition the key universe correctly") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"),
        col("o_orderstatus"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val changed = orders.count(o => o._1 % 97 != 0 && o._1 % 50 == 0)
    val removed = orders.count(o => o._1 % 97 == 0)
    val out = SparkEntry.queries("q436_snapshot_diff")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("added")._1 == 20L)
    assert(out("removed")._1 == removed)
    assert(out("changed")._1 == changed)
    assert(out("unchanged")._1 ==
      orders.length - removed - changed)
    assert(out("changed")._2 == changed)   // all changes are price changes
    assert(out("changed")._3 == 0L)        // never status changes
    assert(out.values.map(_._1).sum == orders.length + 20)
  }
}
