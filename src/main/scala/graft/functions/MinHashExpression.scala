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
/** One MD5 instance per executor thread, shared by both kernels. */
private[functions] object Md5Local {
  private val local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  def get(): MessageDigest = local.get()
}

object MinHashCompute {

  /** Seed-prefix bytes ("0:", "1:", …) cached per k — identical for every
    * row, so the hot path must not rebuild k strings per document. */
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private def prefixes(k: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(k,
      kk => Array.tabulate(kk)(s => (s.toString + ":").getBytes("UTF-8")))

  /** Unsigned compare of two 16-byte digests (hex order == byte order). */
  private[functions] def lessThan16(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private val hexChars = "0123456789abcdef".toCharArray

  /** 16-byte digest → 32-char lowercase hex UTF8String. */
  private[functions] def hex32(d: Array[Byte]): UTF8String = {
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
      val md = Md5Local.get()
      val pre = prefixes(k)
      val n = tokens.numElements()
      var i = 0
      while (i < n) {
        if (!tokens.isNullAt(i)) {
          val tok = tokens.getUTF8String(i).getBytes
          var s = 0
          while (s < k) {
            md.reset(); md.update(pre(s)); md.update(tok)
            val d = md.digest()
            if (mins(s) == null || lessThan16(d, mins(s))) mins(s) = d
            s += 1
          }
        }
        i += 1
      }
    }
    new GenericArrayData(mins.map(m => if (m == null) null else hex32(m)): Array[Any])
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

  // SQL-exposed: reject non-array<string> children at analysis time
  // instead of casting garbage at runtime (ExpectsInputTypes is
  // private[sql], but checkInputDataTypes itself is public API)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.catalogString}")
    }

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

/** Static kernel for [[SimHash16]] — same static-call codegen shape as
  * [[MinHashCompute]]. Exact semantics of the HOF bit-vote fold in
  * graft.ops.Dedup.simhash16: per token, bit j (0..15) reads hex digit
  * j/4 of md5(token) (digit 0 = high nibble of digest byte 0) and votes
  * +1 if bit j%4 of that nibble is set, else −1 — a NULL token votes −1
  * on every bit (the HOF's `when` falls through to otherwise(−1));
  * fingerprint bit j is set when its vote total is positive; a null
  * token ARRAY yields 0 (null votes fall through `when(vote > 0)`). */
object SimHashCompute {

  /** nbits ≤ 64: bit j reads hex digit j/4 of the 32-digit md5, so 16
    * bits consume 4 digits and 64 bits the first 16 digits (64 bits) of
    * the digest. */
  def compute(tokens: ArrayData, nbits: Int): Long = {
    if (tokens == null) return 0L
    val votes = new Array[Long](nbits)
    val md = Md5Local.get()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) {
        var j = 0
        while (j < nbits) { votes(j) -= 1; j += 1 }
      } else {
        md.reset(); md.update(tokens.getUTF8String(i).getBytes)
        val d = md.digest()
        var j = 0
        while (j < nbits) {
          val digit = j / 4
          val b = d(digit / 2)
          val v = if (digit % 2 == 0) (b >> 4) & 0xf else b & 0xf
          if (((v >> (j % 4)) & 1) == 1) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var r = 0L
    var j = 0
    while (j < nbits) { if (votes(j) > 0) r |= 1L << j; j += 1 }
    r
  }
}

/** simhash16(tokens): 16-bit SimHash fingerprint as a long — the native
  * codegen'd twin of the 16-term HOF aggregate fold (which is
  * CodegenFallback and re-reads the hex string per bit). */
case class SimHash16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.catalogString}")
    }

  override def eval(input: InternalRow): Any =
    SimHashCompute.compute(child.eval(input).asInstanceOf[ArrayData], 16)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        |${c.code}
        |long ${ev.value} = graft.functions.SimHashCompute.compute(
        |  ${c.isNull} ? null : ${c.value}, 16);
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash16"
}

/** simhash64(tokens): 64-bit SimHash fingerprint — the same per-token
  * bit-vote scheme as [[SimHash16]] extended over the digest's first 16
  * hex digits. Wide enough for Hamming-band pigeonhole joins: split into
  * 4 disjoint 16-bit bands, any pair at Hamming distance ≤ 3 matches on
  * at least one whole band, and a 16-bit band keyspace keeps bucket
  * occupancy sub-quadratic (a 4-bit band of the 16-bit fingerprint would
  * put 1/16th of the corpus in every bucket). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.catalogString}")
    }

  override def eval(input: InternalRow): Any =
    SimHashCompute.compute(child.eval(input).asInstanceOf[ArrayData], 64)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        |${c.code}
        |long ${ev.value} = graft.functions.SimHashCompute.compute(
        |  ${c.isNull} ? null : ${c.value}, 64);
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** md5_min(arr): minimum md5 hex over the array's non-null strings, NULL
  * for a null/empty/all-null array — the winnowing-fingerprint kernel,
  * exact twin of `array_min(transform(arr, md5))` (array_min skips
  * nulls) without the HOF's CodegenFallback. Digest minima are tracked
  * raw and only the winner is hex-encoded. */
case class Md5Min(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    Md5MinCompute.compute(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.Md5MinCompute.compute($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "md5_min"
}

object Md5MinCompute {
  def compute(arr: ArrayData): UTF8String = {
    if (arr == null) return null
    val md = Md5Local.get()
    var min: Array[Byte] = null
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset(); md.update(arr.getUTF8String(i).getBytes)
        val d = md.digest()
        if (min == null || MinHashCompute.lessThan16(d, min)) min = d
      }
      i += 1
    }
    if (min == null) null else MinHashCompute.hex32(min)
  }
}

object TextFunctions {
  /** Column wrapper for [[MinHashSignatures]]. */
  def minhashSigs(tokens: Column, k: Int): Column =
    Bridge.column(MinHashSignatures(Bridge.expression(tokens), k))

  /** Column wrapper for [[SimHash16]]. */
  def simhash16(tokens: Column): Column =
    Bridge.column(SimHash16(Bridge.expression(tokens)))

  /** Column wrapper for [[SimHash64]]. */
  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))

  /** Column wrapper for [[Md5Min]]. */
  def md5Min(arr: Column): Column =
    Bridge.column(Md5Min(Bridge.expression(arr)))
}
