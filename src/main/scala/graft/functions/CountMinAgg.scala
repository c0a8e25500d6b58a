package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch (Cormode & Muthukrishnan 2005) — the point-query
  * frequency member of the engine's sketch family beside HLL
  * (`agg_approx_distinct`), KMV (`agg_kmv_distinct`), GK quantiles
  * (`agg_approx_quantile`) and Misra-Gries ([[MisraGriesAgg]]): where
  * MG answers "which keys are heavy", CMS answers "how often did THIS
  * key occur" for any key, in depth×width cells of constant space.
  *
  * Structure: `depth` rows of `width` counters; each update adds 1 to
  * one cell per row (row i's cell = XxHash64(key, seed=i) mod width);
  * a point query reads the MINIMUM of the key's depth cells. Merge is
  * cell-wise addition — exact, so estimates are identical under ANY
  * merge tree (stronger than MG, whose estimates are merge-order
  * dependent: a CMS sketch of a dataset is a pure function of the
  * dataset).
  *
  * Guarantees the gate relies on:
  *   - overestimate only, HARD: est(k) ≥ true(k) for every key, any
  *     data, any merge order (cells only ever add);
  *   - bounded error, PROBABILISTIC: est(k) ≤ true(k) + 2n/width per
  *     row with prob ≥ 1/2 (Markov), so the min over `depth`
  *     independent rows exceeds it with prob ≤ 2^-depth. The fixture
  *     gate asserts the realized envelope; the hard direction is
  *     asserted universally.
  *
  * The row hashes are Catalyst's own XxHash64 (seeded per row), so
  * the PROBE side is a plain column expression
  * (`pmod(xxhash64Seeded(i, key), width)`) — sketch build and point
  * query share one hash definition with no UDF in the probe path.
  *
  * Scale shape: the buffer is depth·width longs regardless of stream
  * length; Catalyst plans partial+final aggregation and the shuffle
  * carries one fixed-size array per group per partition.
  */
case class CountMinAgg(
    key: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(key)
  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_sketch requires a STRING key, got ${key.dataType.catalogString}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val k = key.eval(input)
    if (k != null) {
      val s = k.asInstanceOf[UTF8String]
      var i = 0
      while (i < depth) {
        // the same bytes Catalyst's XxHash64 expression hashes for a
        // StringType child with seed = i — probe-side parity
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, i.toLong)
        val cell = ((h % width) + width) % width
        buf(i * width + cell.toInt) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(v => v: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(n: Int): CountMinAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CountMinAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression =
    copy(key = cs(0))
}

object CountMinAgg {
  /** Aggregate column: a depth×width count-min sketch of a string key
    * column, evaluating to the flat array<long> of cells (row i's
    * cells at [i·width, (i+1)·width)). */
  def cms_sketch(key: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CountMinAgg(ColumnBridge.expression(key), depth, width).toAggregateExpression())
}
