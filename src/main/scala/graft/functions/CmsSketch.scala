package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Count-min sketch aggregate (Cormode & Muthukrishnan 2005):
  * `cms_sketch(slots, width, depth)` builds a depth×width counter matrix —
  * row j increments column `slots[j]` once per input row — and returns it
  * flattened row-major (`sketch[j*width + slot]`). The point estimate for
  * an item x is `min_j sketch[j*width + slot_j(x)]`: an upper bound on x's
  * true frequency that overshoots only when x collides in ALL depth rows
  * (error ≤ εN with ε = e/width at δ = e^-depth confidence).
  *
  * Why this shape at 100 TB: exact token frequency is a |vocab|-sized
  * shuffle that grows with the corpus; the sketch is a FIXED width·depth
  * longs per group — map-side partials merge by elementwise +, so the
  * shuffle is the sketch size regardless of input rows, and sketches from
  * different shards/days merge associatively (the same property
  * [[graft.operators.IncrementalAgg]] exploits — a CMS column fits
  * directly into its snapshot state).
  *
  * Slot hashing is the CALLER's (same design as [[KmvDistinct]]): pass
  * `array(slot_0 … slot_{depth-1})` computed from codegen'd builtins on
  * the engine's md5 convention — `conv(substring(md5(concat(j, '#', x)),
  * 1, 15), 16, 10) % width` — so a DuckDB oracle replays the ENTIRE
  * sketch bit-for-bit relationally (group occurrences by (j, slot)).
  */
case class CmsSketch(
    slots: Expression,
    width: Int,
    depth: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(width > 0 && depth > 0, "cms_sketch needs width > 0 and depth > 0")
  require(width.toLong * depth <= (1 << 22),
    s"cms_sketch state $width x $depth exceeds the 4M-counter cap")

  override def children: Seq[Expression] = Seq(slots)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](width * depth)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = slots.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == depth,
        s"cms_sketch expects $depth slots, got ${arr.numElements()}")
      // A NULL element (array(NULL,…) from a NULL input item) skips the
      // row like the NULL-array case — checked for ALL rows before any
      // counter moves, so a partial row can never be half-counted.
      var j = 0
      while (j < depth && !arr.isNullAt(j)) j += 1
      if (j < depth) return buf
      j = 0
      while (j < depth) {
        val s = arr.getLong(j)
        require(s >= 0 && s < width, s"slot $s out of [0, $width)")
        buf(j * width + s.toInt) += 1
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val arr = new Array[Any](buf.length)
    var i = 0
    while (i < buf.length) { arr(i) = buf(i); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketch =
    copy(slots = newChildren(0))
}

object CmsSketch {

  /** The sketch column: depth×width counters flattened row-major. */
  def cms(slots: Column, width: Int, depth: Int): Column =
    GraftSqlBridge.column(
      CmsSketch(GraftSqlBridge.expression(slots), width, depth)
        .toAggregateExpression())

  /** The house slot array for a string item: row j hashes
    * `md5(j || '#' || item)` through the engine's 60-bit md5-prefix
    * convention, mod width — all codegen'd builtins, DuckDB-replayable as
    * `CAST(('0x' || substring(md5(j || '#' || item), 1, 15)) AS BIGINT)
    * % width`.
    */
  def slotsFor(item: Column, width: Int, depth: Int): Column = {
    import org.apache.spark.sql.functions._
    array((0 until depth).map { j =>
      (conv(substring(md5(concat(lit(s"$j#"), item)), 1, 15), 16, 10)
        .cast(LongType) % width)
    }: _*)
  }
}
