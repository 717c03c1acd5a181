package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[ShingleHashes64]] — the codegen-native form of
  * the shared postings projection
  * `array_distinct(transform(shinglesOf(toks, n), s => xxhash64(s)))`
  * (graft.ops.Dedup.shingleHashes). The HOF chain is CodegenFallback:
  * it allocates a lambda frame, an n-gram STRING, and an md5-free but
  * still boxed hash call per position. Here each position concatenates
  * its n window tokens once (UTF8String.concatWs — skips nulls exactly
  * like the SQL concat_ws the HOF used) and feeds Spark's own XXH64
  * with the xxhash64 default seed, so hashes are bit-identical to the
  * HOF form; first-occurrence order of the distinct hashes matches
  * array_distinct. */
object ShingleHashCompute {

  private val Space = UTF8String.fromString(" ")
  private val Seed = 42L // xxhash64's documented default seed

  def compute(tokens: ArrayData, n: Int): ArrayData = {
    if (tokens == null || tokens.numElements() < n)
      return new GenericArrayData(Array.empty[Any])
    val m = tokens.numElements() - n + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long](m * 2)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var k = 0
      while (k < n) {
        window(k) = if (tokens.isNullAt(i + k)) null
                    else tokens.getUTF8String(i + k)
        k += 1
      }
      val s = UTF8String.concatWs(Space, window: _*)
      seen.add(XXH64.hashUTF8String(s, Seed))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }
}

/** Distinct xxhash64 hashes of a token array's word n-grams, as one
  * per-row codegen-friendly pass — no HOF lambda frames, no
  * intermediate shingle array. Drop-in for the
  * `array_distinct(transform(shinglesOf(...), xxhash64))` chain: same
  * hashes (Spark's own XXH64, default seed), same null-token
  * concat_ws skipping, same first-occurrence distinct order, empty
  * array for null/short inputs. */
case class ShingleHashes64(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "n must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

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
    ShingleHashCompute.compute(v.asInstanceOf[ArrayData], n)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"""
        |${c.code}
        |$javaType ${ev.value} = graft.functions.ShingleHashCompute.compute(
        |  ${c.isNull} ? null : ${c.value}, $n);
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "shingle_hashes64"
}

object ShingleFunctions {
  /** Column wrapper for [[ShingleHashes64]]. */
  def shingleHashes64(tokens: Column, n: Int): Column =
    Bridge.column(ShingleHashes64(Bridge.expression(tokens), n))
}
