package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Mean-center a double vector (x_i − mean(x)) as ONE native codegen
  * expression — the embedding-preprocessing step in front of hyperplane
  * LSH (first-orthant feature vectors like PCM energies or pixel means
  * sit at cosine ≈ 1 uncentered; see q501/q502).
  *
  * Why an expression and not `transform(e, x -> x - aggregate(e, ...))`:
  * higher-order functions are CodegenFallback, and CollapseProject
  * inlines a hoisted mean column straight back into the lambda body — so
  * the aggregate re-evaluates PER ELEMENT, O(dim²) interpreted boxed ops
  * per row (measured ~2.5 s over 15k rows at dim 64, paid twice through
  * the dedup's band+verify passes). This is a tight two-pass loop,
  * O(2·dim) per row, inside whole-stage codegen. Sum order is
  * left-to-right (an external mirror reproduces it bit-for-bit).
  * Null vectors stay null; empty vectors return empty. */
case class CenterVector(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "center_vector"

  override def nullSafeEval(input: Any): Any =
    CenterVector.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CenterVector.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, vec =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $cls.compute($vec);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CenterVector {
  def compute(v: ArrayData): ArrayData = {
    val n = v.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    var s = 0.0
    var i = 0
    while (i < n) { s += v.getDouble(i); i += 1 }
    val mu = s / n
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = v.getDouble(i) - mu; i += 1 }
    new GenericArrayData(out)
  }
}
