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
import java.security.MessageDigest

/** Static kernel for [[MinHashSignatures]] — a standalone object so the
  * generated Java can call it as a plain static method (whole-stage
  * codegen stays intact; the HOF `transform(seq, array_min(transform(
  * toks, md5(...))))` form is CodegenFallback and allocates a lambda
  * frame per element).
  *
  * Exact semantics of the HOF form (graft.ops.Dedup reference shape):
  * sig[s] = min over non-null tokens t of hex(md5(s + ":" + t)), null
  * when the token array is null or empty. Hex strings order identically
  * to their unsigned digest bytes ('0'-'9' < 'a'-'f' and hex is
  * monotone per nibble), so the min is tracked on raw 16-byte digests
  * and only the k winners are hex-encoded. */
object MinHashCompute {

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def compute(tokens: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Array[Byte]](k)
    if (tokens != null) {
      val md = mdLocal.get()
      val prefixes = new Array[Array[Byte]](k)
      var s = 0
      while (s < k) { prefixes(s) = (s.toString + ":").getBytes("UTF-8"); s += 1 }
      val n = tokens.numElements()
      var i = 0
      while (i < n) {
        if (!tokens.isNullAt(i)) {
          val tok = tokens.getUTF8String(i).getBytes
          s = 0
          while (s < k) {
            md.reset(); md.update(prefixes(s)); md.update(tok)
            val d = md.digest()
            if (mins(s) == null || lessThan(d, mins(s))) mins(s) = d
            s += 1
          }
        }
        i += 1
      }
    }
    new GenericArrayData(mins.map(m => if (m == null) null else hex(m)): Array[Any])
  }
}

/** minhash_sigs(tokens, k): the k-seed MinHash signature of a token
  * array as array<string> of md5 hex minima — one per-row pass, no
  * explode, no shuffle; at scale it runs inside the scan stage. Never
  * NULL at the top level: a null/empty token array yields an array of k
  * null slots, exactly like the HOF form it replaces (the outer
  * transform runs over a literal seed sequence). */
case class MinHashSignatures(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "k must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    MinHashCompute.compute(v.asInstanceOf[ArrayData], k)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"""
        |${c.code}
        |$javaType ${ev.value} = graft.functions.MinHashCompute.compute(
        |  ${c.isNull} ? null : ${c.value}, $k);
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_sigs"
}

object TextFunctions {
  /** Column wrapper for [[MinHashSignatures]]. */
  def minhashSigs(tokens: Column, k: Int): Column =
    Bridge.column(MinHashSignatures(Bridge.expression(tokens), k))
}
