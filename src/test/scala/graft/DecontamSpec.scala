package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Benchmark decontamination: n-gram overlap flags training docs. */
class DecontamSpec extends SparkSuite {
  import spark.implicits._

  private val bench = Seq(
    (100L, "what is the answer to life the universe and everything")
  ).toDF("doc_id", "text")

  private val train = Seq(
    (1L, "deep thought said the answer to life the universe and everything is forty two"), // contaminated
    (2L, "a completely unrelated training document about spark shuffles"),
    (3L, "the answer to my question was simple"), // shares "the answer to"
    (4L, "life the universe") // only 3 tokens = exactly one 3-gram, contaminated
  ).toDF("doc_id", "text")

  test("contaminationHits counts shared distinct 3-grams per training doc") {
    val hits = TextOps.contaminationHits(train, "doc_id", "text", bench, "text", n = 3)
      .as[(Long, Long)].collect().toMap
    // doc 1 shares "the answer to","answer to life","to life the","life the universe",
    // "the universe and","universe and everything" = 6 grams
    assert(hits(1L) == 6L, s"doc 1 hits: ${hits.get(1L)}")
    assert(hits(3L) == 1L)
    assert(hits(4L) == 1L)
    assert(!hits.contains(2L))
  }

  test("decontaminate drops flagged docs, keeps the clean ones") {
    val kept = TextOps.decontaminate(train, "doc_id", "text", bench, "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L))
  }

  test("short docs (< n tokens) can never be contaminated") {
    val shortDocs = Seq((9L, "the answer")).toDF("doc_id", "text")
    val hits = TextOps.contaminationHits(shortDocs, "doc_id", "text", bench, "text", n = 3)
    assert(hits.isEmpty)
  }
}
