package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expressions for the INTEGER (milli-quantized) vector
  * math used by the deterministic similarity kernels (LSH bucketing, IVF
  * training, PQ encode/search). The `aggregate(zip_with(...))` HOF form
  * these replace is CodegenFallback: every element pair boxes on the
  * interpreted path, and a PQ encode evaluates codebook·subvectors folds
  * per row. Semantics are preserved exactly — left-to-right LONG
  * accumulation (exact and order-independent anyway), NULL when either
  * array is NULL, lengths mismatch, or any element is NULL.
  */
abstract class LongVectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
}

/** vec_dot_long(a, b): Σ a[i]·b[i] over long arrays — exact integer. */
case class LongVectorDot(left: Expression, right: Expression)
  extends LongVectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("ldN")
      val s = ctx.freshName("ldS")
      val i = ctx.freshName("ldI")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot_long"
}

/** vec_l2sq_slice(a, b, start, len): Σ (a[i]-b[i])² over the 0-based
  * index window [start, start+len) of two long arrays — the per-subvector
  * distance of PQ. `start`/`len` are plan-time constants (they shape the
  * loop), so the window never allocates slice copies the way
  * `slice(...)+zip_with` does. NULL when the window overruns either
  * array. */
case class LongVectorL2Slice(left: Expression, right: Expression,
                             start: Int, len: Int)
  extends LongVectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (start + len > x.numElements() || start + len > y.numElements()) return null
    var s = 0L
    var i = start
    val end = start + len
    while (i < end) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("l2S")
      val i = ctx.freshName("l2I")
      val d = ctx.freshName("l2D")
      val end = start + len
      s"""
         |if ($end > $a.numElements() || $end > $b.numElements()) { ${ev.isNull} = true; } else {
         |  long $s = 0L;
         |  for (int $i = $start; $i < $end; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $s += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "vec_l2sq_slice"
}

/** Column wrappers for the integer vector kernels. */
object LongVectorFunctions {

  def vecDotLong(a: Column, b: Column): Column =
    Bridge.column(LongVectorDot(Bridge.expression(a), Bridge.expression(b)))

  /** `start` is 0-based; the window is [start, start + len). */
  def vecL2SqSlice(a: Column, b: Column, start: Int, len: Int): Column =
    Bridge.column(LongVectorL2Slice(Bridge.expression(a), Bridge.expression(b), start, len))
}
