package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CdcBounds, CenterVector, DamerauLevenshtein, DotProduct, ExifGps, GeoTiffCrs, HashedNgramVector, HyperplaneBands, ImageFeature64, ImageCropBmp, ImageMeta, ImageResizeBmp, JaroWinkler, LasMeta, Mp4Meta, PcmDecimate, PointInPolygon, PolygonsOverlap, PolygonsOverlapFull, SimHash32, WavBlockEnergy, WavMeta, WavStats, WordShingles}

/** Session extension registering the engine's custom Catalyst expressions so
  * they are callable from SQL as well as the Column API.
  *
  * Install either at build time —
  * `SparkSession.builder().withExtensions(new GraftExtensions)` /
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` —
  * or post-hoc on a live session with `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.pointInPolygonDescriptor)
    e.injectFunction(GraftExtensions.polygonsOverlapDescriptor)
    e.injectFunction(GraftExtensions.polygonsOverlapFullDescriptor)
    e.injectFunction(GraftExtensions.hyperplaneBandsDescriptor)
    e.injectFunction(GraftExtensions.dotProductDescriptor)
    e.injectFunction(GraftExtensions.simhash32Descriptor)
    e.injectFunction(GraftExtensions.imageMetaDescriptor)
    e.injectFunction(GraftExtensions.exifGpsDescriptor)
    e.injectFunction(GraftExtensions.jaroWinklerDescriptor)
    e.injectFunction(GraftExtensions.damerauLevenshteinDescriptor)
    e.injectFunction(GraftExtensions.cdcBoundsDescriptor)
    e.injectFunction(GraftExtensions.geoTiffCrsDescriptor)
    e.injectFunction(GraftExtensions.lasMetaDescriptor)
    e.injectFunction(GraftExtensions.imageFeature64Descriptor)
    e.injectFunction(GraftExtensions.wavMetaDescriptor)
    e.injectFunction(GraftExtensions.wavBlockEnergyDescriptor)
    e.injectFunction(GraftExtensions.mp4MetaDescriptor)
    e.injectFunction(GraftExtensions.centerVectorDescriptor)
    e.injectFunction(GraftExtensions.wordShinglesDescriptor)
    e.injectFunction(GraftExtensions.hashedNgramVectorDescriptor)
    e.injectFunction(GraftExtensions.wavStatsDescriptor)
    e.injectFunction(GraftExtensions.pcmDecimateDescriptor)
    e.injectFunction(GraftExtensions.imageResizeBmpDescriptor)
    e.injectFunction(GraftExtensions.imageCropBmpDescriptor)
    e.injectFunction(GraftExtensions.imageCropAtBmpDescriptor)
    // optimizer rule: derive pushable bbox range conjuncts from literal-ring
    // point_in_polygon filters (row-group skipping for spatial lookups)
    e.injectOptimizerRule(_ => graft.plans.SpatialBboxPushdown)
  }
}

object GraftExtensions {
  private def pipBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 3,
      s"point_in_polygon(lon, lat, ring) takes 3 arguments, got ${args.length}")
    PointInPolygon(args(0), args(1), args(2))
  }

  private def intArg(e: Expression, what: String): Int = e.eval(null) match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => throw new IllegalArgumentException(
      s"hyperplane_bands $what must be an integer literal, got $other")
  }

  private def hbBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 4,
      s"hyperplane_bands(vec, dim, nBands, rowsPerBand) takes 4 arguments, got ${args.length}")
    HyperplaneBands(args(0), intArg(args(1), "dim"),
      intArg(args(2), "nBands"), intArg(args(3), "rowsPerBand"))
  }

  private def poBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2,
      s"polygons_overlap(ring_a, ring_b) takes 2 arguments, got ${args.length}")
    PolygonsOverlap(args(0), args(1))
  }

  private def pofBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2,
      s"polygons_overlap_full(rings_a, rings_b) takes 2 arguments, got ${args.length}")
    PolygonsOverlapFull(args(0), args(1))
  }

  val pointInPolygonDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("point_in_polygon"),
    new ExpressionInfo(classOf[PointInPolygon].getName, "point_in_polygon"),
    pipBuilder _)

  val polygonsOverlapDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("polygons_overlap"),
    new ExpressionInfo(classOf[PolygonsOverlap].getName, "polygons_overlap"),
    poBuilder _)

  val polygonsOverlapFullDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("polygons_overlap_full"),
    new ExpressionInfo(classOf[PolygonsOverlapFull].getName, "polygons_overlap_full"),
    pofBuilder _)

  val hyperplaneBandsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hyperplane_bands"),
    new ExpressionInfo(classOf[HyperplaneBands].getName, "hyperplane_bands"),
    hbBuilder _)

  private def dpBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 3,
      s"dot_product(a, b, dim) takes 3 arguments, got ${args.length}")
    DotProduct(args(0), args(1), intArg(args(2), "dim"))
  }

  private def shBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1,
      s"simhash32(tokens) takes 1 argument, got ${args.length}")
    SimHash32(args(0))
  }

  private def imBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1,
      s"image_meta(content) takes 1 argument, got ${args.length}")
    ImageMeta(args(0))
  }

  val dotProductDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    dpBuilder _)

  val simhash32Descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash32"),
    new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
    shBuilder _)

  val imageMetaDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("image_meta"),
    new ExpressionInfo(classOf[ImageMeta].getName, "image_meta"),
    imBuilder _)

  private def egBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1,
      s"exif_gps(content) takes 1 argument, got ${args.length}")
    ExifGps(args(0))
  }

  val exifGpsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("exif_gps"),
    new ExpressionInfo(classOf[ExifGps].getName, "exif_gps"),
    egBuilder _)

  private def jwBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2,
      s"jaro_winkler(a, b) takes 2 arguments, got ${args.length}")
    JaroWinkler(args(0), args(1))
  }

  val jaroWinklerDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
    jwBuilder _)

  private def dlBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2,
      s"damerau_levenshtein(a, b) takes 2 arguments, got ${args.length}")
    DamerauLevenshtein(args(0), args(1))
  }

  val damerauLevenshteinDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("damerau_levenshtein"),
    new ExpressionInfo(classOf[DamerauLevenshtein].getName, "damerau_levenshtein"),
    dlBuilder _)

  private def cbBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1,
      s"cdc_bounds(text) takes 1 argument, got ${args.length}")
    CdcBounds(args(0))
  }

  val cdcBoundsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cdc_bounds"),
    new ExpressionInfo(classOf[CdcBounds].getName, "cdc_bounds"),
    cbBuilder _)

  private def gtBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1,
      s"geotiff_crs(content) takes 1 argument, got ${args.length}")
    GeoTiffCrs(args(0))
  }

  val geoTiffCrsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("geotiff_crs"),
    new ExpressionInfo(classOf[GeoTiffCrs].getName, "geotiff_crs"),
    gtBuilder _)

  private def lmBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1,
      s"las_meta(content) takes 1 argument, got ${args.length}")
    LasMeta(args(0))
  }

  val lasMetaDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("las_meta"),
    new ExpressionInfo(classOf[LasMeta].getName, "las_meta"),
    lmBuilder _)

  private def ifBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1,
      s"image_feature64(content) takes 1 argument, got ${args.length}")
    ImageFeature64(args(0))
  }

  val imageFeature64Descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("image_feature64"),
    new ExpressionInfo(classOf[ImageFeature64].getName, "image_feature64"),
    ifBuilder _)

  private def wmBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1,
      s"wav_meta(content) takes 1 argument, got ${args.length}")
    WavMeta(args(0))
  }

  val wavMetaDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("wav_meta"),
    new ExpressionInfo(classOf[WavMeta].getName, "wav_meta"),
    wmBuilder _)

  private def weBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1,
      s"wav_block_energy(content) takes 1 argument, got ${args.length}")
    WavBlockEnergy(args(0))
  }

  val wavBlockEnergyDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("wav_block_energy"),
    new ExpressionInfo(classOf[WavBlockEnergy].getName, "wav_block_energy"),
    weBuilder _)

  private def m4Builder(args: Seq[Expression]): Expression = {
    require(args.length == 1,
      s"mp4_meta(content) takes 1 argument, got ${args.length}")
    Mp4Meta(args(0))
  }

  val mp4MetaDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("mp4_meta"),
    new ExpressionInfo(classOf[Mp4Meta].getName, "mp4_meta"),
    m4Builder _)

  private def cvBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1,
      s"center_vector(vec) takes 1 argument, got ${args.length}")
    CenterVector(args(0))
  }

  val centerVectorDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("center_vector"),
    new ExpressionInfo(classOf[CenterVector].getName, "center_vector"),
    cvBuilder _)

  private def wsBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 3,
      s"word_shingles(toks, n, distinct) takes 3 arguments, got ${args.length}")
    val dist = args(2) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(b: Boolean, _) => b
      case other => throw new IllegalArgumentException(
        s"word_shingles: distinct must be a boolean literal, got $other")
    }
    WordShingles(args(0), intArg(args(1), "n"), dist)
  }

  val wordShinglesDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_shingles"),
    new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
    wsBuilder _)

  private def hnvBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 3,
      s"hashed_ngram_vector(toks, dim, n) takes 3 arguments, got ${args.length}")
    HashedNgramVector(args(0), intArg(args(1), "dim"), intArg(args(2), "n"))
  }

  val hashedNgramVectorDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hashed_ngram_vector"),
    new ExpressionInfo(classOf[HashedNgramVector].getName, "hashed_ngram_vector"),
    hnvBuilder _)

  private def wstBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1,
      s"wav_stats(content) takes 1 argument, got ${args.length}")
    WavStats(args(0))
  }

  val wavStatsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("wav_stats"),
    new ExpressionInfo(classOf[WavStats].getName, "wav_stats"),
    wstBuilder _)

  private def pdBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2,
      s"pcm_decimate(content, k) takes 2 arguments, got ${args.length}")
    PcmDecimate(args(0), intArg(args(1), "k"))
  }

  val pcmDecimateDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("pcm_decimate"),
    new ExpressionInfo(classOf[PcmDecimate].getName, "pcm_decimate"),
    pdBuilder _)

  private def irBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 3,
      s"image_resize_bmp(content, w, h) takes 3 arguments, got ${args.length}")
    ImageResizeBmp(args(0), intArg(args(1), "w"), intArg(args(2), "h"))
  }

  val imageResizeBmpDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("image_resize_bmp"),
    new ExpressionInfo(classOf[ImageResizeBmp].getName, "image_resize_bmp"),
    irBuilder _)

  private def icBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 5,
      s"image_crop_bmp(content, x, y, w, h) takes 5 arguments, got ${args.length}")
    ImageCropBmp(args(0), intArg(args(1), "x"), intArg(args(2), "y"),
      intArg(args(3), "w"), intArg(args(4), "h"))
  }

  val imageCropBmpDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("image_crop_bmp"),
    new ExpressionInfo(classOf[ImageCropBmp].getName, "image_crop_bmp"),
    icBuilder _)

  private def icaBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 5,
      s"image_crop_at_bmp(content, x, y, w, h) takes 5 arguments (x and y " +
        s"may be per-row columns; w/h must be literals), got ${args.length}")
    graft.functions.ImageCropAtBmp(args(0),
      org.apache.spark.sql.catalyst.expressions.Cast(
        args(1), org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.catalyst.expressions.Cast(
        args(2), org.apache.spark.sql.types.LongType),
      intArg(args(3), "w"), intArg(args(4), "h"))
  }

  val imageCropAtBmpDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("image_crop_at_bmp"),
    new ExpressionInfo(classOf[graft.functions.ImageCropAtBmp].getName,
      "image_crop_at_bmp"),
    icaBuilder _)

  /** Register custom functions on an existing session (used by Verify/Bench
    * and tests, where the builder isn't ours). */
  def register(spark: SparkSession): Unit = {
    val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
      "point_in_polygon" -> pipBuilder _,
      "polygons_overlap" -> poBuilder _,
      "polygons_overlap_full" -> pofBuilder _,
      "hyperplane_bands" -> hbBuilder _,
      "dot_product" -> dpBuilder _,
      "simhash32" -> shBuilder _,
      "image_meta" -> imBuilder _,
      "exif_gps" -> egBuilder _,
      "jaro_winkler" -> jwBuilder _,
      "damerau_levenshtein" -> dlBuilder _,
      "cdc_bounds" -> cbBuilder _,
      "geotiff_crs" -> gtBuilder _,
      "las_meta" -> lmBuilder _,
      "image_feature64" -> ifBuilder _,
      "wav_meta" -> wmBuilder _,
      "wav_block_energy" -> weBuilder _,
      "mp4_meta" -> m4Builder _,
      "center_vector" -> cvBuilder _,
      "word_shingles" -> wsBuilder _,
      "hashed_ngram_vector" -> hnvBuilder _,
      "wav_stats" -> wstBuilder _,
      "pcm_decimate" -> pdBuilder _,
      "image_resize_bmp" -> irBuilder _,
      "image_crop_bmp" -> icBuilder _,
      "image_crop_at_bmp" -> icaBuilder _)
    // register-once: SimpleFunctionRegistry WARNs on every replacement, and
    // register() runs per Verify query / per test suite — skip names already
    // present (the builders are stable objects, re-binding is a no-op anyway)
    val registry = spark.sessionState.functionRegistry
    fns.foreach { case (name, builder) =>
      if (!registry.functionExists(FunctionIdentifier(name)))
        registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
    // optimizer rules cannot be injected into an already-built session via
    // SparkSessionExtensions — the session-level hook is
    // experimental.extraOptimizations (same "User Provided Optimizers"
    // fixed-point batch). Guard: register() may run more than once.
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.SpatialBboxPushdown)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          (graft.plans.SpatialBboxPushdown: org.apache.spark.sql.catalyst
            .rules.Rule[org.apache.spark.sql.catalyst.plans.logical
            .LogicalPlan])
    }
    // planner strategy for the native as-of join operator (same post-build
    // hook; the strategy only matches graft.plans.AsofJoinNode)
    if (!spark.experimental.extraStrategies
        .contains(graft.plans.AsofJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsofJoinStrategy
    }
  }
}
