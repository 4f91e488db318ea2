package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity as a native Catalyst expression — the
  * fuzzy-matching kernel behind approximate name/entity linkage (the q251
  * record-linkage family's scoring step when keys are dirty rather than
  * structured).
  *
  * Semantics are the textbook definition (and DuckDB's
  * `jaro_winkler_similarity`, which the q298 gate verifies pairwise):
  * matches within a window of max(|a|,|b|)/2 − 1, half-counted
  * transpositions, jaro = (m/|a| + m/|b| + (m−t)/m)/3, and the Winkler
  * prefix boost jw = jaro + ℓ·0.1·(1−jaro) for the common prefix ℓ ≤ 4,
  * applied only when jaro > 0.7. Both empty → 1; one empty → 0.
  *
  * Why an expression: the per-pair kernel sits inside a blocked candidate
  * join (the hot loop of a fuzzy-dedup pass); this stays in whole-stage
  * codegen with two flat char loops and zero allocation beyond two boolean
  * match arrays — a Scala UDF would box every row and break the codegen
  * span around the join. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = JaroWinkler.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $cls.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  def compute(s1: UTF8String, s2: UTF8String): Double = {
    val a = s1.toString
    val b = s2.toString
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && a.charAt(i) == b.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val mt = t / 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 +
      (m - mt).toDouble / m) / 3.0
    if (jaro > 0.7) {
      val maxp = math.min(4, math.min(l1, l2))
      var l = 0
      while (l < maxp && a.charAt(l) == b.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }
}
