package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles over a token array as ONE native codegen
  * expression — the unit of near-dup detection for the whole text-dedup
  * family (q36/q37/q53/q83/q86/q89/q90/q100/q252/q417 share this
  * subtree).
  *
  * Semantics are EXACTLY the HOF formulation it replaces (oracles mirror
  * the shingle strings, so byte parity is a correctness contract):
  *
  *   transform(sequence(1, size-(n-1)), i -> array_join(slice(toks,i,n), ' '))
  *   [optionally array_distinct(...): FIRST-occurrence order]
  *
  * — n consecutive tokens joined by one space (null tokens skipped, the
  * array_join contract), empty result below n tokens. Why native: the
  * HOF path is CodegenFallback and allocates a boxed slice array + join
  * per position (measured 1.65 s for one pass over sf0.1's documents vs
  * 0.16 s for tokenization — and the dedup gates run the subtree 1-4×
  * each); this is one tight loop with UTF8String.concatWs, inside
  * whole-stage codegen. */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1 && n <= 64, "shingle width must be in [1, 64]")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WordShingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $cls.compute($toks, $n, $distinct);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  private val SEP = UTF8String.fromString(" ")

  def compute(toks: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val t = toks.numElements()
    if (t < n) return new GenericArrayData(Array.empty[Any])
    val m = t - n + 1
    // materialize the token views once (getUTF8String per access walks the
    // unsafe layout); concatWs allocates fresh output strings, so the
    // emitted shingles never alias a reused row buffer
    val tok = new Array[UTF8String](t)
    var i = 0
    while (i < t) { tok(i) = toks.getUTF8String(i); i += 1 }
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
      i = 0
      while (i < m) { seen.add(shingleAt(tok, i, n)); i += 1 }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](m)
      i = 0
      while (i < m) { out(i) = shingleAt(tok, i, n); i += 1 }
      new GenericArrayData(out)
    }
  }

  /** tokens[i..i+n-1] joined by one space — array_join semantics (null
    * elements skipped, no separator emitted for them). */
  private def shingleAt(tok: Array[UTF8String], i: Int, n: Int): UTF8String = {
    val parts = new Array[UTF8String](n)
    var k = 0
    var nn = 0
    while (k < n) {
      val s = tok(i + k)
      if (s != null) { parts(nn) = s; nn += 1 }
      k += 1
    }
    UTF8String.concatWs(SEP, java.util.Arrays.copyOf(parts, nn): _*)
  }
}
