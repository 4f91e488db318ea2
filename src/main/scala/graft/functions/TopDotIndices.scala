package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Top-n rows of a small literal matrix by inner product with the input
  * vector — the IVF coarse-quantizer assignment (`cell = argmax_c ⟨v, c⟩`,
  * probes = top-nprobe) as a native Catalyst expression.
  *
  * Same codegen-size rationale as [[HyperplaneBands]]: unrolling
  * nCentroids·dim `element_at` terms puts ~10³ nodes in the plan and Janino
  * compile time dominates; this emits a constant-size loop over a referenced
  * matrix. Ties break toward the lower row index (deterministic).
  */
case class TopDotIndices(child: Expression, matrix: Array[Array[Double]], n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "top_dot_indices"

  override def nullSafeEval(input: Any): Any =
    TopDotIndices.compute(input.asInstanceOf[ArrayData], matrix, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TopDotIndices.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val mRef = ctx.addReferenceObj("topDotMatrix", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, vec =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s"$cls.compute($vec, $mRef, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TopDotIndices {
  /** Scores every matrix row against `v` (left-to-right sum over the shared
    * prefix of lengths), then partial selection sort of the top `n` indices
    * (score desc, index asc on ties). nRows is small (a centroid table), so
    * O(nRows·n) selection beats building a heap. */
  def compute(v: ArrayData, m: Array[Array[Double]], n: Int): ArrayData = {
    val rows = m.length
    val scores = new Array[Double](rows)
    var c = 0
    while (c < rows) {
      val w = m(c)
      val len = math.min(w.length, v.numElements())
      var s = 0.0
      var i = 0
      while (i < len) { s += v.getDouble(i) * w(i); i += 1 }
      scores(c) = s
      c += 1
    }
    val k = math.min(n, rows)
    val picked = new Array[Boolean](rows)
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      // seed with the first unpicked index so all-NaN scores (a corrupt
      // vector) degrade to a deterministic index order instead of crashing
      // (NaN comparisons are all false).
      var best = -1
      var r = 0
      while (r < rows && best < 0) { if (!picked(r)) best = r; r += 1 }
      var bestScore = scores(best)
      r = best + 1
      while (r < rows) {
        if (!picked(r) && scores(r) > bestScore) { best = r; bestScore = scores(r) }
        r += 1
      }
      picked(best) = true
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }
}
