package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** 32-bit SimHash over a token array as a native Catalyst expression.
  *
  * Semantics (bit-identical to the former HOF formulation and to the DuckDB
  * oracle): per token, h = the first 4 md5 bytes as an unsigned 32-bit value
  * (`('0x'||substr(md5(tok),1,8))::bigint`); bit j of the result is set when
  * Σ_tokens (bit_j(h) ? +1 : -1) > 0. Duplicate tokens count each time; a
  * null token contributes -1 on every bit (h = 0), matching the `when(...)
  * .otherwise(-1)` null path of the HOF form.
  *
  * Why an expression: the HOF form nests `transform`/`aggregate`/`zip_with`
  * — per token it builds a boxed 32-element bit vector and folds it with
  * interpreted lambdas, the per-row kernel of a corpus-wide pass. This emits
  * one md5 per token and a tight bit loop: whole-stage codegen, no boxing.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any =
    SimHash32.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SimHash32.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, toks => s"${ev.value} = $cls.compute($toks);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash32 {
  // MessageDigest is stateful; one instance per executor thread.
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  def compute(toks: ArrayData): Long = {
    val sums = new Array[Int](32)
    val n = toks.numElements()
    var t = 0
    while (t < n) {
      val s = toks.getUTF8String(t)
      val h: Long = if (s == null) 0L else {
        val d = md5.get()
        d.reset()
        val bytes = d.digest(s.getBytes)
        ((bytes(0) & 0xffL) << 24) | ((bytes(1) & 0xffL) << 16) |
          ((bytes(2) & 0xffL) << 8) | (bytes(3) & 0xffL)
      }
      var j = 0
      while (j < 32) {
        if (((h >>> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
        j += 1
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) { if (sums(j) > 0) out |= 1L << j; j += 1 }
    out
  }
}
