package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fixed-dimension dot product of two `array<double>` columns as a native
  * Catalyst expression.
  *
  * Why an expression and not composed built-ins: the unrolled `element_at`
  * formulation puts ~10·dim nodes in the plan PER cosine (a 64-dim cosine is
  * ~600 nodes: two norms + the cross term), and Janino compilation of the
  * generated straight-line code dominates query time on every plan that
  * embeds several of them — the same pathology [[HyperplaneBands]] and
  * [[TopDotIndices]] fixed for their kernels. The higher-order
  * `aggregate`/`zip_with` form keeps the tree small but evaluates interpreted
  * lambdas per element. This emits a constant-size Java loop: whole-stage
  * codegen, O(dim) flops per row, no boxing.
  *
  * Summation is left-to-right over the shared prefix of the two arrays and
  * `dim` — bit-identical to the unrolled form and to an external oracle's
  * sequential `list_sum(list_transform(...))`.
  */
case class DotProduct(left: Expression, right: Expression, dim: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = DotProduct.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $cls.compute($a, $b, $dim);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Left-to-right sum over min(dim, |a|, |b|) — deterministic order. */
  def compute(a: ArrayData, b: ArrayData, dim: Int): Double = {
    val n = math.min(dim, math.min(a.numElements(), b.numElements()))
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
}
