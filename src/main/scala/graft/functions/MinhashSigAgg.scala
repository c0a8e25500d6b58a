package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-permutation MinHash signature as ONE typed imperative aggregate.
  *
  * Replaces the 64-column declarative form
  * `agg(min(xxhash64Seeded(seed+0, h0)), …, min(xxhash64Seeded(seed+63, h0)))`,
  * which produces bit-identical signatures (`XXH64.hashLong` is exactly
  * what the Catalyst `XxHash64` expression evaluates for a long child)
  * but pays a large whole-stage-codegen bill: 64 aggregate expressions
  * compile to a several-thousand-line generated class whose janino
  * compilation dominated the query's first run (~4 s of the bench's
  * 7 s for dedup_minhash at sf0.1). Here the buffer is one
  * `Array[Long](64)` and the update is a 64-iteration primitive loop;
  * Catalyst still plans partial+final (ObjectHashAggregate), so the
  * shuffle carries one 512-byte buffer per doc per partition.
  */
case class MinhashSigAgg(
    hash: Expression,
    seedBase: Long,
    numPerms: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = hash.eval(input)
    if (h != null) {
      val hv = h.asInstanceOf[Long]
      var i = 0
      while (i < numPerms) {
        val v = XXH64.hashLong(hv, seedBase + i)
        if (v < buf(i)) buf(i) = v
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerms) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numPerms * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numPerms)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(n: Int): MinhashSigAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MinhashSigAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression =
    copy(hash = cs(0))
}

object MinhashSigAgg {
  /** Aggregate column: numPerms-long MinHash signature of the hashed
    * shingle stream. */
  def minhash_sig(hash: Column, seedBase: Long, numPerms: Int): Column =
    ColumnBridge.column(
      MinhashSigAgg(ColumnBridge.expression(hash), seedBase, numPerms)
        .toAggregateExpression())
}
