package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.,
  * "Counting distinct elements in a data stream", RANDOM 2002).
  *
  * Keeps the k smallest DISTINCT hash values seen; with hashes uniform
  * on [0, 2⁶⁰), the k-th smallest U₍ₖ₎ estimates k/D of the range, so
  * D̂ = (k−1)·2⁶⁰ / hₖ. With fewer than k distinct hashes the sketch
  * IS the distinct set and the count is exact.
  *
  * Why this exists next to `approx_count_distinct`: HLL register
  * layouts are implementation-specific, so the built-in can never be
  * cross-engine checked. KMV over an md5-derived hash is fully
  * deterministic and replayable in ANY SQL engine (a row_number
  * window), which makes the sketch — merge logic and estimator
  * included — hash-gated by the DuckDB oracle, not just spec-enveloped.
  *
  * Scale shape: the buffer is a bounded Array[Long] (≤ k entries), the
  * shuffle carries ≤ 8k bytes per group per partition, and merge is a
  * sorted-set union truncated to k — the same partial+final plan
  * Catalyst gives any TypedImperativeAggregate.
  */
case class KmvSketchAgg(
    hash: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val h = hash.eval(input)
    if (h != null) {
      val hv = h.asInstanceOf[Long]
      if (buf.size < k) buf.add(hv)
      else if (hv < buf.last()) { buf.add(hv); if (buf.size > k) buf.pollLast() }
    }
    buf
  }

  override def merge(
      b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) {
      val hv = it.next()
      if (b1.size < k) b1.add(hv)
      else if (hv < b1.last()) { b1.add(hv); if (b1.size > k) b1.pollLast() }
    }
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) java.lang.Double.valueOf(buf.size.toDouble)
    else java.lang.Double.valueOf((k - 1).toDouble * math.pow(2.0, 60) / buf.last().toDouble)

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong()); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(n: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression =
    copy(hash = cs(0))
}

object KmvSketchAgg {
  /** Aggregate column: KMV distinct-count estimate over a 60-bit hash
    * column (see [[graft.operators.Relational.aggKmvDistinct]] for the
    * md5-derived hash both engines compute identically). */
  def kmv_distinct(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketchAgg(ColumnBridge.expression(hash), k).toAggregateExpression())
}
