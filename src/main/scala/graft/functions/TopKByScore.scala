package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

/** Bounded top-k aggregate: `topk_by_score(score, id, k)` keeps the k
  * highest-scoring (score, id) pairs per group, ordered score DESC then id
  * ASC (deterministic tie-break).
  *
  * Why not `row_number().over(Window.partitionBy(group).orderBy(score))`?
  * The window materializes and SORTS every candidate row after shuffling
  * ALL of them to the group's task — for ANN scoring that is the full
  * corpus × queries similarity table crossing the wire. As a
  * TypedImperativeAggregate this op partial-aggregates MAP-SIDE: each map
  * task ships at most k pairs per group, so the shuffle is k·|groups|
  * regardless of corpus size. At 100 TB that is the difference between
  * shuffling terabytes and kilobytes.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  require(k > 0, "topk_by_score needs k > 0")

  override def children: Seq[Expression] = Seq(score, id)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  /** Better-than ordering: score desc, id asc. */
  @inline private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Amortized cap: let the buffer grow to 2k, then prune to the best k —
    * O(n log k) overall without a heap structure to serialize.
    */
  private def prune(buf: ArrayBuffer[(Double, Long)]): Unit =
    if (buf.length > 2 * k) {
      val best = buf.sortWith(beats).take(k)
      buf.clear()
      buf ++= best
    }

  override def update(buf: ArrayBuffer[(Double, Long)], input: InternalRow)
      : ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf += ((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      prune(buf)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long)],
      other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    buf ++= other
    prune(buf)
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    val best = buf.sortWith(beats).take(k)
    new GenericArrayData(best.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    // ship only the surviving k — the partial result IS the bound
    val best = buf.sortWith(beats).take(k)
    val bb = ByteBuffer.allocate(4 + best.length * 16)
    bb.putInt(best.length)
    best.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) { buf += ((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScore {
  def topk(score: Column, id: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopKByScore(GraftSqlBridge.expression(score), GraftSqlBridge.expression(id), k)
        .toAggregateExpression())
}
