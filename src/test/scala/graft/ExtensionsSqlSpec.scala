package graft

/** The custom Catalyst expressions are callable from the SQL surface
  * (GraftExtensions registration), not only the Column API. */
class ExtensionsSqlSpec extends SparkSuite {
  import spark.implicits._

  test("dot_product / simhash32 / hyperplane_bands / image_meta from SQL") {
    val dot = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d), 2) AS d")
      .as[Double].collect().head
    assert(dot == 11.0)

    val sh = spark.sql("SELECT simhash32(array('a', 'b', 'a')) AS h")
      .as[Long].collect().head
    assert(sh >= 0L && sh < (1L << 32))

    val bands = spark.sql(
      "SELECT hyperplane_bands(array(1.0d, -1.0d), 2, 2, 3) AS b")
      .as[Seq[String]].collect().head
    assert(bands.length == 2 && bands.forall(_.length == 3))

    val meta = spark.sql(
      "SELECT image_meta(unhex('00112233')) AS m") // undecodable → null
      .select("m").collect().head
    assert(meta.isNullAt(0))
  }
}
