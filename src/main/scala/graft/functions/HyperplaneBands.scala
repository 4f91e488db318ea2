package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Banded hyperplane sign-bit buckets as a native Catalyst expression.
  *
  * Returns, for a `dim`-dimensional double vector, `nBands` bucket strings of
  * `rowsPerBand` sign bits each — band b uses hyperplanes [b·r, b·r+r), with
  * the deterministic md5-seeded weights of `Similarity.planeWeight` (fully
  * reproducible by external oracles).
  *
  * Why an expression and not composed built-ins: the unrolled `element_at`
  * formulation creates B·r·dim expression nodes (3072 at 8×6×64), and Janino
  * compilation of that tree dominates query time (~30-80 s per plan measured
  * at sf0.1 — the data work itself is milliseconds). A HOF formulation keeps
  * the tree small but evaluates interpreted lambdas per element. This
  * expression emits a tight Java LOOP over a referenced weight matrix:
  * constant-size generated code, whole-stage codegen, per-row cost
  * O(B·r·dim) flops with no boxing.
  */
case class HyperplaneBands(child: Expression, dim: Int, nBands: Int,
                           rowsPerBand: Int, packed: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType =
    if (packed) ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
    else ArrayType(StringType, containsNull = false)
  override def prettyName: String = "hyperplane_bands"

  @transient private lazy val weights: Array[Array[Double]] =
    HyperplaneBands.weightMatrix(dim, nBands * rowsPerBand)

  override def nullSafeEval(input: Any): Any =
    if (packed)
      HyperplaneBands.computePacked(input.asInstanceOf[ArrayData], weights, dim, nBands, rowsPerBand)
    else
      HyperplaneBands.compute(input.asInstanceOf[ArrayData], weights, dim, nBands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = HyperplaneBands.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val wRef = ctx.addReferenceObj("hyperplaneWeights", weights, "double[][]")
    val method = if (packed) "computePacked" else "compute"
    nullSafeCodeGen(ctx, ev, vec =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s"$cls.$method($vec, $wRef, $dim, $nBands, $rowsPerBand);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBands {
  def weightMatrix(dim: Int, nPlanes: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim)((p, i) => graft.operators.Similarity.planeWeight(p, i))

  /** Sign-bit bucket strings; summation left-to-right per plane (matches the
    * oracle's sequential list sum bit-for-bit). Vector entries beyond the
    * declared `dim` are ignored; shorter vectors use their actual length.
    *
    * The vector is unpacked ONCE into a primitive array before the plane
    * loop: `ArrayData.getDouble` is a virtual dispatch, and at B·r·dim
    * evaluations per row (q509: 576 planes × 512 dims ≈ 295k calls/row) it
    * dominated the whole gate — 6.5 s of an 11 s gate at sf0.1; the
    * two-primitive-array hot loop the JIT can unroll measured ~5× faster,
    * value-identical (same left-to-right summation). */
  def compute(v: ArrayData, w: Array[Array[Double]], dim: Int,
              nBands: Int, rowsPerBand: Int): ArrayData = {
    val n = math.min(dim, v.numElements())
    val x = new Array[Double](n)
    var j = 0
    while (j < n) { x(j) = v.getDouble(j); j += 1 }
    val out = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      val bits = new Array[Char](rowsPerBand)
      var r = 0
      while (r < rowsPerBand) {
        val wp = w(b * rowsPerBand + r)
        var s = 0.0
        var i = 0
        while (i < n) { s += x(i) * wp(i); i += 1 }
        bits(r) = if (s >= 0) '1' else '0'
        r += 1
      }
      out(b) = UTF8String.fromString(new String(bits))
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Bit-packed variant: band b's bucket is a LONG whose bit r (LSB-first)
    * is plane (b·rowsPerBand + r)'s sign bit — a bijection of the string
    * form's characters, so any partition of rows by bucket (the LSH
    * candidate structure) is IDENTICAL; only the join-key representation
    * changes (8-byte fixed-width vs a rowsPerBand-char string — less
    * shuffle, cheaper hash/compare, no per-band string allocation).
    * Requires rowsPerBand ≤ 63 (callers assert; log2-adaptive shapes
    * reach 63 bits at ~3×10¹⁹ docs). */
  def computePacked(v: ArrayData, w: Array[Array[Double]], dim: Int,
                    nBands: Int, rowsPerBand: Int): ArrayData = {
    val n = math.min(dim, v.numElements())
    val x = new Array[Double](n)
    var j = 0
    while (j < n) { x(j) = v.getDouble(j); j += 1 }
    val out = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      var bucket = 0L
      var r = 0
      while (r < rowsPerBand) {
        val wp = w(b * rowsPerBand + r)
        var s = 0.0
        var i = 0
        while (i < n) { s += x(i) * wp(i); i += 1 }
        if (s >= 0) bucket |= (1L << r)
        r += 1
      }
      out(b) = java.lang.Long.valueOf(bucket)
      b += 1
    }
    new GenericArrayData(out)
  }
}
