package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Signed hashing-trick bag-of-n-grams vectorizer (Weinberger et al.,
  * "Feature Hashing for Large Scale Multitask Learning"): every word
  * n-gram hashes to one of `dim` buckets with a ±1 sign, and the vector
  * is the signed count per bucket — the standard way to turn raw text
  * into a FIXED-dimension dense vector with no vocabulary, no fit pass,
  * and no driver state, so it feeds this library's embedding stack
  * (CenterVector → hyperplane LSH → embeddingNearDups / ANN / PCA)
  * directly at any corpus size.
  *
  * Hashing is md5-derived so an external oracle reproduces every
  * component exactly (the [[graft.operators.TextOps.tokenHash]]
  * contract; Spark's murmur `hash()` is engine-private):
  *
  *   h      = first 15 hex chars of md5(ngram) as a base-16 integer
  *   bucket = h mod dim
  *   sign   = +1 when the 16th hex char is even, else −1
  *
  * (oracle form: `('0x' || substr(md5(g), 1, 15))::bigint % dim` and
  * `1 - 2 * (('0x' || substr(md5(g), 16, 1))::int % 2)`). Signed counts
  * are exact small integers, so the double vector is engine-identical.
  * A window containing a null token contributes nothing — the gram is
  * NULL under SQL `||`-concat semantics and a NULL gram is skipped, so
  * the SQL mirror `md5(t1 || ' ' || t2 ...)` agrees windowwise (the
  * round-8 advice fix; TextOps.tokens never emits nulls, so no gate's
  * value changes). Fewer than n tokens → the zero vector. */
case class HashedNgramVector(child: Expression, dim: Int, n: Int)
    extends UnaryExpression {
  require(dim >= 1 && dim <= 65536, "dim must be in [1, 65536]")
  require(n >= 1 && n <= 16, "n must be in [1, 16]")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "hashed_ngram_vector"

  override def nullSafeEval(input: Any): Any =
    HashedNgramVector.compute(input.asInstanceOf[ArrayData], dim, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = HashedNgramVector.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $cls.compute($toks, $dim, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedNgramVector {
  private val HEX = "0123456789abcdef".toCharArray

  def compute(toks: ArrayData, dim: Int, n: Int): ArrayData = {
    val t = toks.numElements()
    val acc = new Array[Long](dim)
    if (t >= n) {
      val md = java.security.MessageDigest.getInstance("MD5")
      val sep = " ".getBytes("UTF-8")
      var i = 0
      while (i <= t - n) {
        md.reset()
        var k = 0
        var anyNull = false
        while (k < n && !anyNull) {
          val s = toks.getUTF8String(i + k)
          if (s == null) anyNull = true
          else {
            if (k > 0) md.update(sep)
            md.update(s.getBytes)
          }
          k += 1
        }
        if (anyNull) { i += 1 }
        else {
        val d = md.digest()
        // first 15 hex chars = the top 7.5 bytes, big-endian hex order —
        // exactly ('0x' || substr(md5(g), 1, 15))::bigint
        var h = 0L
        var b = 0
        while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        h = (h << 4) | ((d(7) >> 4) & 0xfL)
        val bucket = (h % dim).toInt // h >= 0: 60 bits
        val sign = if ((d(7) & 0xf) % 2 == 0) 1L else -1L
        acc(bucket) += sign
        i += 1
        }
      }
    }
    val out = new Array[Any](dim)
    var j = 0
    while (j < dim) { out(j) = acc(j).toDouble; j += 1 }
    new GenericArrayData(out)
  }
}
