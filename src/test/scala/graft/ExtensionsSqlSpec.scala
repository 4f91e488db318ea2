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

  test("round-8 functions from SQL: center/shingles/hashing/audio/resize") {
    val centered = spark.sql(
      "SELECT center_vector(array(1.0d, 2.0d, 3.0d)) AS v")
      .as[Seq[Double]].collect().head
    assert(centered == Seq(-1.0, 0.0, 1.0))

    val sh = spark.sql(
      "SELECT word_shingles(array('a', 'b', 'a', 'b'), 2, true) AS s")
      .as[Seq[String]].collect().head
    assert(sh == Seq("a b", "b a")) // first-occurrence distinct order

    val hv = spark.sql(
      "SELECT hashed_ngram_vector(array('x', 'y'), 8, 2) AS v")
      .as[Seq[Double]].collect().head
    assert(hv.length == 8 && hv.map(math.abs).sum == 1.0) // one signed gram

    val st = spark.sql("SELECT wav_stats(unhex('00')) AS s").collect().head
    assert(st.isNullAt(0)) // hostile bytes → null

    val dec = spark.sql("SELECT pcm_decimate(unhex('00'), 2) AS d").collect().head
    assert(dec.isNullAt(0))

    val rz = spark.sql("SELECT image_resize_bmp(unhex('00'), 4, 4) AS r")
      .collect().head
    assert(rz.isNullAt(0))

    // per-row-positioned crop: hostile bytes null; and on a real BMP the
    // SQL form must equal the literal-window kernel byte for byte
    val ca = spark.sql("SELECT image_crop_at_bmp(unhex('00'), 0, 0, 4, 4) AS c")
      .collect().head
    assert(ca.isNullAt(0))
    val bmpHex = graft.functions.ImageFeature64.buildBmp(3L, 1L)
      .map(b => f"$b%02x").mkString
    val got = spark.sql(
      s"SELECT image_crop_at_bmp(unhex('$bmpHex'), id % 2, id div 2, 4, 4) AS c " +
        "FROM range(4)").as[Array[Byte]].collect()
    got.zipWithIndex.foreach { case (bytes, i) =>
      val want = graft.functions.ImageCropBmp.compute(
        graft.functions.ImageFeature64.buildBmp(3L, 1L), i % 2, i / 2, 4, 4)
      assert(java.util.Arrays.equals(bytes, want), s"row $i crop diverged")
    }
  }
}
