package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Deterministic bottom-k-by-hash row sample: `hash_sample(hash, value, k)`
  * keeps the k lexicographically-smallest DISTINCT `(hash, value)` pairs
  * per group, sorted ascending. With `hash` a uniform content hash of a
  * unique row key (the engine's md5-prefix convention), the surviving rows
  * are a UNIFORM random sample of the group — but a reproducible one: the
  * "random" priority is the hash, so Spark and an exact-SQL oracle agree
  * bit-for-bit (`ROW_NUMBER() OVER (ORDER BY h, v) <= k`), and re-running
  * over the same data always draws the same sample (priority sampling /
  * bottom-k sketch; Cohen & Kaplan, "Summarizing data using bottom-k
  * sketches", PODC'07).
  *
  * The payload makes it more than a membership sketch: the sampled values
  * support group-wise estimates (quantiles, means) that refresh at DELTA
  * cost as an [[graft.operators.IncrementalAgg]] state column — two
  * sketches merge as a bounded sorted-distinct union (`slice ∘ array_sort
  * ∘ array_distinct ∘ concat`, all codegen'd builtins), the same algebra
  * as the KMV state, which makes the merge commutative and associative:
  * bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B)).
  *
  * Like every aggregate here it partial-aggregates MAP-SIDE: each map task
  * ships at most k (long, double) pairs per group, so shuffle is
  * k·|groups| regardless of input size — a uniform per-group sample of a
  * 100 TB table costs one bounded-state aggregation, never a global sort.
  * NULL hashes and NULL values are skipped (the sample covers rows where
  * both exist; the oracle mirrors with `WHERE v IS NOT NULL`).
  */
case class HashSample(
    hash: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Double)]] {

  require(k > 0, "hash_sample needs k > 0")

  override def children: Seq[Expression] = Seq(hash, value)
  override def nullable: Boolean = false
  override def dataType: DataType = HashSample.SketchType

  private val ord: Ordering[(Long, Double)] = Ordering.Tuple2[Long, Double]

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Double)] =
    new java.util.TreeSet[(Long, Double)](ord)

  @inline private def add(buf: java.util.TreeSet[(Long, Double)],
      p: (Long, Double)): Unit = {
    if (buf.size < k) { buf.add(p); () }
    else if (ord.lt(p, buf.last())) {
      if (buf.add(p)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[(Long, Double)],
      input: InternalRow): java.util.TreeSet[(Long, Double)] = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null)
      add(buf, (h.asInstanceOf[Long], v.asInstanceOf[Double]))
    buf
  }

  override def merge(buf: java.util.TreeSet[(Long, Double)],
      other: java.util.TreeSet[(Long, Double)]): java.util.TreeSet[(Long, Double)] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[(Long, Double)]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val (h, v) = it.next()
      arr(i) = new GenericInternalRow(Array[Any](h, v))
      i += 1
    }
    new GenericArrayData(arr) // ascending (h, v): TreeSet iterates sorted
  }

  override def serialize(buf: java.util.TreeSet[(Long, Double)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val (h, v) = it.next()
      bb.putLong(h); bb.putDouble(v)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Double)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getLong, bb.getDouble)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HashSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HashSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HashSample =
    copy(hash = newChildren(0), value = newChildren(1))
}

object HashSample {
  /** Sorted array of the k smallest distinct (h, v) pairs. */
  val SketchType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false))), containsNull = false)

  /** The sketch column: bottom-k (hash, value) sample per group. */
  def sample(hash: Column, value: Column, k: Int): Column =
    GraftSqlBridge.column(
      HashSample(GraftSqlBridge.expression(hash),
        GraftSqlBridge.expression(value), k).toAggregateExpression())
}
