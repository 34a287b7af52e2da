package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch: `kmv_sketch(hash, k)`
  * keeps the k SMALLEST DISTINCT 64-bit hash values per group and returns
  * them sorted ascending. With hashes uniform on [0, 2^60) the classic KMV
  * estimator recovers the distinct count as `(k-1) / (h_k / 2^60)` — see
  * Bar-Yossef et al., "Counting distinct elements in a data stream", and
  * Beyer et al. (SIGMOD'07) for the unbiased form.
  *
  * Why an aggregate and not `sort + limit k`: a global sort shuffles every
  * distinct hash to one ordering; this partial-aggregates MAP-SIDE, so each
  * map task ships at most k longs and the merge is a bounded sorted-set
  * union — shuffle is k·|groups| regardless of input size. Unlike
  * approx_count_distinct (HLL) the surviving values are DETERMINISTIC for a
  * deterministic hash — an exact-SQL oracle can replay them — and the
  * sketch doubles as a uniform distinct-value SAMPLE (the k minimums are a
  * uniform sample of the distinct set, usable for overlap/Jaccard estimates
  * between sketches).
  *
  * The hash is an argument, not computed here: callers share the engine's
  * md5-prefix hash convention (Dedup.baseHash / oracle `('0x'||substr(
  * md5(x),1,15))::BIGINT`) so Spark and DuckDB agree bit-for-bit.
  */
case class KmvDistinct(
    hash: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  require(k > 0, "kmv_sketch needs k > 0")

  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  @inline private def add(buf: java.util.TreeSet[Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) { // strictly smaller than current k-th minimum
      if (buf.add(v)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[Long], input: InternalRow)
      : java.util.TreeSet[Long] = {
    val h = hash.eval(input)
    if (h != null) add(buf, h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[Long],
      other: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[Long]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr) // ascending: TreeSet iterates sorted
  }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(hash = newChildren(0))
}

object KmvDistinct {
  /** The sketch column: sorted array of the k smallest distinct hashes. */
  def kmv(hash: Column, k: Int): Column =
    GraftSqlBridge.column(
      KmvDistinct(GraftSqlBridge.expression(hash), k).toAggregateExpression())
}
