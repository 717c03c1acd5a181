package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native mergeable-sketch AGGREGATES (round-12 stretch): the HLL
  * register vector and the CMS cell grid as single Catalyst
  * `TypedImperativeAggregate`s.
  *
  * The composed forms (Sketch.hllRegisters / Sketch.cmsSketch) build the
  * same state via explode + groupBy — cells-bounded and map-side
  * combined, but the explode multiplies the scan (×depth for CMS) and
  * the shuffle carries up to cells × partitions rows. The native form is
  * the idiomatic Catalyst shape: ONE partial aggregate whose buffer IS
  * the sketch (256 max-registers / depth·width counters), merged
  * buffer-wise — zero row multiplication, shuffle rows = partitions,
  * and the plan shows a single partial/final HashAggregate pair with no
  * Generate. Results are BIT-EQUAL to the composed kernels (same md5
  * nibble hashes — Sketch.h3Jvm / the 8-hex-digit prefix), which the
  * spec pins, so the DuckDB oracles transfer unchanged.
  *
  * Hash parity contract: inputs are pre-cast to STRING by the Column
  * wrappers, exactly like the Column kernels' `.cast("string")`.
  */
object SketchAggregates {

  /** First-8-hex-digit md5 prefix as an unsigned 32-bit value — the JVM
    * twin of `conv(substring(md5(k), 1, 8), 16, 10)`. */
  private[functions] def h8Jvm(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** `hll_registers_agg(key)` → array<long> of 256 max-rank registers
    * (index = bucket). Bit-equal to Sketch.hllRegisters' (bucket, m)
    * rows at the occupied indices; unoccupied registers are 0. */
  def hllRegistersAgg(key: Column): Column =
    Bridge.column(HllRegistersAgg(Bridge.expression(key.cast("string")))
      .toAggregateExpression())

  /** `cms_sketch_agg(key)` → array<long> of depth·width counters
    * (index = r·width + bucket). Bit-equal to Sketch.cmsSketch's
    * (r, bucket, cnt) rows at the occupied indices. */
  def cmsSketchAgg(key: Column, depth: Int = 4, width: Int = 1024): Column =
    Bridge.column(CmsSketchAgg(Bridge.expression(key.cast("string")),
      depth, width).toAggregateExpression())

  /** `bitmap_cells_agg(key)` → array<long> of the OCCUPIED cell indices
    * (ascending) of the width-bit linear-counting bitmap — the native
    * form of Sketch.bitmapCell + distinct: buffer = width/64 words,
    * merge = bitwise OR (idempotent, so replays converge). */
  def bitmapCellsAgg(key: Column, width: Int = 4096): Column =
    Bridge.column(BitmapCellsAgg(Bridge.expression(key.cast("string")),
      width).toAggregateExpression())

  /** `kmv_agg(key, k)` → array<long> of the k SMALLEST distinct 32-bit
    * md5-prefix hashes (ascending) — the KMV/Theta distinct sketch as a
    * native aggregate: buffer = a ≤k sorted set, merge = k-smallest of
    * the union (the sorted-run merge every Theta engine ships). */
  def kmvAgg(key: Column, k: Int = 256): Column =
    Bridge.column(KmvAgg(Bridge.expression(key.cast("string")), k)
      .toAggregateExpression())
}

/** 256-register HLL buffer: one byte per bucket holding the max
  * leading-zero rank (ρ ∈ [1, 25]); merge = element-wise max (the HLL
  * union property — idempotent, commutative, associative, so partial
  * aggregation and at-least-once replay both converge). */
case class HllRegistersAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](256)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = SketchAggregates.h8Jvm(v.toString)
      val bucket = (h % 256L).toInt
      val rem = h / 256L
      // ρ = 25 − bitlength(rem) (rem < 2^24), 25 when rem == 0 — the
      // exact integer form the SQL oracle computes via length(bin(rem))
      val rho =
        if (rem == 0L) 25
        else 25 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < 256) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toLong))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(b: Array[Byte]): Array[Byte] = b.clone()

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): HllRegistersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllRegistersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllRegistersAgg =
    copy(child = c)
  override def prettyName: String = "hll_registers_agg"
}

/** depth×width CMS counter grid: merge = element-wise sum (counters are
  * additive across sub-streams — the CMS union property). Buffer is a
  * long array serialized big-endian. */
case class CmsSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      var r = 0
      while (r < depth) {
        // the exact composed-kernel cell: h3("r:key") mod width
        val cell = (graft.ops.Sketch.h3Jvm(r.toString + ":" + s) %
          width.toLong).toInt
        buf(r * width + cell) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(b: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(b)
    Array.fill(b.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CmsSketchAgg =
    copy(child = c)
  override def prettyName: String = "cms_sketch_agg"
}

/** width-bit linear-counting bitmap: buffer = width/64 OR-merged words
  * (512 B at width 4096 — the bounded-state distinct sketch); eval emits
  * the ascending occupied-cell indices so the row form equals
  * `SELECT DISTINCT h3(key) % width`. */
case class BitmapCellsAgg(
    child: Expression,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long]((width + 63) / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val c = (graft.ops.Sketch.h3Jvm(v.toString) % width.toLong).toInt
      buf(c >> 6) |= 1L << (c & 63)
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val out = collection.mutable.ArrayBuffer.empty[Long]
    var c = 0
    while (c < width) {
      if ((buf(c >> 6) & (1L << (c & 63))) != 0L) out += c.toLong
      c += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(b: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(b)
    Array.fill(b.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): BitmapCellsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapCellsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BitmapCellsAgg =
    copy(child = c)
  override def prettyName: String = "bitmap_cells_agg"
}

/** KMV/Theta buffer: the ≤k smallest DISTINCT h8 hashes in a sorted
  * set. Insert is O(log k) with an early reject against the current
  * max; merge keeps the k smallest of the union — associative,
  * commutative, idempotent (set semantics), so partials and replays
  * both converge. */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) { buf.add(h); if (buf.size > k) buf.pollLast(); () }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, SketchAggregates.h8Jvm(v.toString))
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
                     b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator(); var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 8)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }
  override def deserialize(b: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(b)
    val s = new java.util.TreeSet[java.lang.Long]()
    while (bb.hasRemaining) s.add(bb.getLong)
    s
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): KmvAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KmvAgg =
    copy(child = c)
  override def prettyName: String = "kmv_agg"
}
