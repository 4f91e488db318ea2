package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries (Rabin-style rolling hash) — the
  * storage-dedup primitive: cut points depend only on LOCAL content, so an
  * insertion early in a document shifts at most one chunk instead of
  * re-aligning every fixed-size block (the rsync/backup-dedup property).
  * Returns the 1-based END positions of each chunk; the final position is
  * always a boundary.
  *
  * Hash: windowed polynomial over the last W=16 characters,
  * H_i = Σ_{j=0..15} code(c_{i−j})·B^j mod M with B=31, M=1000003,
  * maintained incrementally in O(1) per position (subtract the outgoing
  * char's B^15 term, multiply, add) — O(n) per document, zero allocation
  * beyond the result. Cut when i ≥ W and H_i mod 64 == 0 (expected chunk
  * ≈ 64 chars). The oracle recomputes H_i per position from the 16-term
  * sum directly — same arithmetic, quadratic-in-window but exact. */
case class CdcBounds(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_bounds"

  override def nullSafeEval(input: Any): Any =
    CdcBounds.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CdcBounds.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $cls.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcBounds {
  val W = 16
  val B = 31L
  val M = 1000003L
  val Mask = 64L

  // B^(W-1) mod M, the outgoing-character coefficient
  private val Bpow: Long = {
    var p = 1L
    var i = 0
    while (i < W - 1) { p = p * B % M; i += 1 }
    p
  }

  def compute(s: UTF8String): GenericArrayData = {
    val t = s.toString
    val n = t.length
    if (n == 0) return new GenericArrayData(Array.empty[Int])
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var h = 0L
    var i = 0
    while (i < n) {
      val c = t.charAt(i).toLong
      h =
        if (i < W) (h * B + c) % M
        else (((h - t.charAt(i - W).toLong * Bpow % M + M * B) % M) * B + c) % M
      // 1-based position; boundary only once the window is full
      if (i + 1 >= W && h % Mask == 0L) cuts += (i + 1)
      i += 1
    }
    if (cuts.isEmpty || cuts.last != n) cuts += n
    new GenericArrayData(cuts.toArray)
  }
}
