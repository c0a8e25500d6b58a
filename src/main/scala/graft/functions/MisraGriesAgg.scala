package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items ("heavy hitters") summary (Misra &
  * Gries, "Finding repeated elements", 1982) — the frequent-items
  * member of the engine's sketch family beside HLL
  * (`agg_approx_distinct`), KMV (`agg_kmv_distinct`) and GK quantiles
  * (`agg_approx_quantile`).
  *
  * Structure: at most `c` (key, count) entries. Update: increment a
  * present key; insert at 1 if there is room; otherwise decrement
  * every counter and evict zeros (the stream "pays" one occurrence of
  * each tracked key). Merge (Agarwal et al., "Mergeable summaries",
  * PODS 2012): sum counts keywise, then subtract the (c+1)-th largest
  * count from all and drop non-positives.
  *
  * Guarantees, for a stream of length n and ANY merge tree (this is
  * what the oracle gates; the estimates themselves are merge-order-
  * dependent once eviction kicks in):
  *   - underestimates only: est(k) ≤ true(k);
  *   - bounded error: true(k) − est(k) ≤ n/(c+1);
  *   - hence every key with true(k) > n/(c+1) is PRESENT.
  * Special case the fixture also exploits: with c ≥ the group's
  * distinct-key count no eviction or merge-subtraction ever fires, so
  * the summary is EXACT and hash-gateable.
  *
  * Scale shape: the buffer is ≤ c entries regardless of stream
  * length, the shuffle carries ≤ c (string, long) pairs per group per
  * partition, and Catalyst plans the usual partial+final aggregation.
  * The evicting update is O(c) — the textbook formulation; the
  * offset-counter trick would make it O(1) amortized, irrelevant at
  * c ≤ 64.
  */
case class MisraGriesAgg(
    key: Expression,
    c: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]] {

  override def children: Seq[Expression] = Seq(key)
  // Reject non-string keys at ANALYSIS time — update() casts the
  // evaluated key to UTF8String, which would otherwise surface as an
  // executor-side ClassCastException. (ExpectsInputTypes would be the
  // idiomatic mixin, but its AbstractDataType is private[sql].)
  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mg_topk requires a STRING key, got ${key.dataType.catalogString}")
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "mg_topk"

  override def createAggregationBuffer(): java.util.HashMap[String, java.lang.Long] =
    new java.util.HashMap[String, java.lang.Long]()

  override def update(
      buf: java.util.HashMap[String, java.lang.Long],
      input: InternalRow): java.util.HashMap[String, java.lang.Long] = {
    val k = key.eval(input)
    if (k != null) {
      // UTF8String may point into a reused row buffer — copy to String
      val s = k.asInstanceOf[UTF8String].toString
      val cur = buf.get(s)
      if (cur != null) buf.put(s, cur + 1L)
      else if (buf.size < c) buf.put(s, 1L)
      else {
        // full and key untracked: decrement all, evict zeros
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(
      b1: java.util.HashMap[String, java.lang.Long],
      b2: java.util.HashMap[String, java.lang.Long]): java.util.HashMap[String, java.lang.Long] = {
    val it2 = b2.entrySet().iterator()
    while (it2.hasNext) {
      val e = it2.next()
      val cur = b1.get(e.getKey)
      b1.put(e.getKey, if (cur == null) e.getValue else java.lang.Long.valueOf(cur + e.getValue))
    }
    if (b1.size > c) {
      // subtract the (c+1)-th largest count, drop non-positives
      val counts = new Array[Long](b1.size)
      var i = 0
      val vit = b1.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(b1.size - (c + 1)) // (c+1)-th largest
      val it = b1.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= sub) it.remove() else e.setValue(e.getValue - sub)
      }
    }
    b1
  }

  override def eval(buf: java.util.HashMap[String, java.lang.Long]): Any = {
    // sorted keys: a deterministic map layout costs nothing and keeps
    // collected output stable for specs
    val keys = new java.util.ArrayList[String](buf.keySet())
    java.util.Collections.sort(keys)
    val n = keys.size()
    val ks = new Array[Any](n)
    val vs = new Array[Any](n)
    var i = 0
    while (i < n) {
      ks(i) = UTF8String.fromString(keys.get(i))
      vs(i) = buf.get(keys.get(i)).longValue()
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
  }

  override def serialize(buf: java.util.HashMap[String, java.lang.Long]): Array[Byte] = {
    var bytes = 4
    val it0 = buf.entrySet().iterator()
    val entries = new java.util.ArrayList[(Array[Byte], Long)](buf.size)
    while (it0.hasNext) {
      val e = it0.next()
      val kb = e.getKey.getBytes(StandardCharsets.UTF_8)
      entries.add((kb, e.getValue))
      bytes += 4 + kb.length + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(entries.size())
    var i = 0
    while (i < entries.size()) {
      val (kb, v) = entries.get(i)
      bb.putInt(kb.length); bb.put(kb); bb.putLong(v)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val m = new java.util.HashMap[String, java.lang.Long]()
    var i = 0
    while (i < n) {
      val kl = bb.getInt()
      val kb = new Array[Byte](kl)
      bb.get(kb)
      m.put(new String(kb, StandardCharsets.UTF_8), bb.getLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(n: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression =
    copy(key = cs(0))
}

object MisraGriesAgg {
  /** Aggregate column: Misra-Gries summary of a string key column with
    * capacity c, evaluating to map<string, long> of surviving
    * (key, estimate) pairs. */
  def mg_topk(key: Column, c: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(key), c).toAggregateExpression())
}
