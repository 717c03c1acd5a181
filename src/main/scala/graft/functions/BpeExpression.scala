package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[BpeSegment]] — the one-pass native form of
  * TokenizerModel.fuse's chained `replace` fold. The fold compiles one
  * `replace(seq, " a b ", " ab ")` node PER STORED MERGE: at a
  * production 32k-merge model that is 32k chained expression nodes (far
  * past Janino's method limit, so codegen silently falls back to
  * interpreted) and 32k intermediate UTF8String copies per word. Here
  * the word is split into a symbol array ONCE and each merge is one
  * in-place scan over the symbols — same O(len · merges) worst case,
  * but no string re-materialization, no codegen blowup, and the merge
  * list is a single broadcast-referenced object.
  *
  * Replay-exact with the fold (and with the oracle's DuckDB `replace`
  * CTE): sequential string replace resumes its search AFTER the
  * replaced region, so when two pair occurrences share a boundary
  * space (" a b a b "), the second does NOT merge in that round — its
  * leading space was consumed. At symbol level that is: after merging
  * (i, i+1), symbol i+2 is emitted unmerged and scanning resumes at
  * i+3. Spec-pinned against the fold on the full fixture corpus. */
object BpeFuseCompute {

  /** merges(k) = Array(left, right) for round k, in round order. */
  def compute(w: UTF8String, merges: Array[Array[String]]): ArrayData = {
    if (w == null) return new GenericArrayData(Array.empty[Any])
    val s = w.toString
    // split into code points — the semantics of substr(i, 1)
    var syms = new Array[String](s.codePointCount(0, s.length))
    var i = 0; var j = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      syms(j) = s.substring(i, i + n)
      i += n; j += 1
    }
    var m = 0
    while (m < merges.length) {
      val a = merges(m)(0); val b = merges(m)(1)
      val out = new Array[String](syms.length)
      var oi = 0; var si = 0
      while (si < syms.length) {
        if (si + 1 < syms.length && syms(si) == a && syms(si + 1) == b) {
          out(oi) = a + b; oi += 1
          if (si + 2 < syms.length) { out(oi) = syms(si + 2); oi += 1 }
          si += 3
        } else { out(oi) = syms(si); oi += 1; si += 1 }
      }
      syms = java.util.Arrays.copyOf(out, oi)
      m += 1
    }
    val arr = new Array[Any](syms.length)
    var k = 0
    while (k < syms.length) { arr(k) = UTF8String.fromString(syms(k)); k += 1 }
    new GenericArrayData(arr)
  }
}

/** BPE pieces of a word under a STORED ordered merge list, as one
  * native per-row pass — the deployment-scale form of
  * TokenizerModel.fuse (see [[BpeFuseCompute]]). Returns array<string>
  * of the word's pieces; empty array for null input. The merge list is
  * a constructor constant (model config, not data), embedded via a
  * codegen reference object. */
case class BpeSegment(child: Expression, merges: Seq[String])
    extends UnaryExpression {

  @transient private lazy val mergeArr: Array[Array[String]] =
    merges.map { p =>
      val sp = p.indexOf(' ')
      require(sp > 0 && p.indexOf(' ', sp + 1) < 0,
        s"merge must be 'left right' (symbols are space-free): '$p'")
      Array(p.substring(0, sp), p.substring(sp + 1))
    }.toArray

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got ${other.catalogString}")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    BpeFuseCompute.compute(v.asInstanceOf[UTF8String], mergeArr)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val mRef = ctx.addReferenceObj("bpeMerges", mergeArr,
      "java.lang.String[][]")
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"""
        |${c.code}
        |$javaType ${ev.value} = graft.functions.BpeFuseCompute.compute(
        |  ${c.isNull} ? null : ${c.value}, $mRef);
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "bpe_segment"
}

object BpeFunctions {
  /** Column wrapper for [[BpeSegment]]: pieces of `word` under the
    * ordered `merges` (each "left right"). */
  def bpeSegment(word: Column, merges: Seq[String]): Column =
    Bridge.column(BpeSegment(Bridge.expression(word), merges))
}
