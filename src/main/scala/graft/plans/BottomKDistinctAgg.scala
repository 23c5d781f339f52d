package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded k-minimum-values (KMV) buffer: the k smallest DISTINCT longs
  * seen by the group, returned sorted ascending.
  *
  * This is the classical KMV distinct sketch (Bar-Yossef et al., "Counting
  * distinct elements in a data stream", RANDOM 2002): feed it a uniform
  * hash of each key and the k-th smallest retained hash h₍ₖ₎ estimates the
  * distinct count as (k−1)/(h₍ₖ₎/2^width). Unlike HLL++ the retained state
  * is just hash values — any engine that computes the same hashes replays
  * the estimator EXACTLY, which is what lets the driver's DuckDB oracle
  * hash-gate `q_kmv_distinct` where `q_approx_distinct` (HLL++ internals)
  * must stay rows-only.
  *
  * Scale shape: a TypedImperativeAggregate participates in partial
  * aggregation, so each map task reduces its partition to ≤ k longs per
  * group BEFORE the exchange — the shuffle carries O(groups × k ×
  * partitions) longs and there is NO distinct pre-shuffle (the dedupe
  * happens inside the bounded buffer). Merge is a k-bounded set union,
  * commutative and associative, so the result is partition-order-free —
  * exactly replayable.
  *
  * The buffer rejects duplicate values (a duplicate would occupy a slot
  * and bias h₍ₖ₎ low); the linear scans are O(k) with k ≤ a few hundred —
  * cheaper than heap/tree bookkeeping at this size, and allocation-free.
  */
final case class BottomKDistinctAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuf] {

  require(k >= 1 && k <= 65536, s"bottomk_distinct needs 1 <= k <= 65536, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bottomk_distinct expects a bigint key, got $other")
  }

  override def createAggregationBuffer(): KmvBuf = KmvBuf.empty(k)

  override def update(buf: KmvBuf, input: InternalRow): KmvBuf = {
    val v = child.eval(input)
    // a null key is an absent key, not a zero — skipped, matching what a
    // SQL replay's WHERE h IS NOT NULL would do
    if (v != null) buf.offer(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: KmvBuf, b2: KmvBuf): KmvBuf = { b1.absorb(b2); b1 }

  /** Sorted ascending array of the retained hashes — element k IS h₍ₖ₎. */
  override def eval(buf: KmvBuf): Any = new GenericArrayData(buf.sorted)

  override def serialize(buf: KmvBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.size * 8)
    bb.putInt(buf.size); bb.putInt(k)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.vs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = KmvBuf.empty(bb.getInt)
    var i = 0
    while (i < n) { buf.offer(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): BottomKDistinctAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): BottomKDistinctAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BottomKDistinctAgg =
    copy(child = c.head)
  override def prettyName: String = "bottomk_distinct"
}

/** k-bounded distinct-min set of longs (unsigned-compared would be wrong
  * here: callers feed non-negative 48-bit hashes, so signed order IS hash
  * order, and the require below keeps that contract loud). */
final class KmvBuf(val k: Int) {
  val vs = new Array[Long](k)
  var size = 0

  def offer(v: Long): Unit = {
    require(v >= 0, s"bottomk_distinct key must be non-negative (a hash), got $v")
    var worst = 0
    var i = 0
    // one pass: reject a duplicate, and remember the current max
    while (i < size) {
      if (vs(i) == v) return
      if (vs(i) > vs(worst)) worst = i
      i += 1
    }
    if (size < k) { vs(size) = v; size += 1 }
    else if (v < vs(worst)) vs(worst) = v
  }

  def absorb(o: KmvBuf): Unit = {
    var i = 0
    while (i < o.size) { offer(o.vs(i)); i += 1 }
  }

  def sorted: Array[Long] = {
    val out = java.util.Arrays.copyOf(vs, size)
    java.util.Arrays.sort(out)
    out
  }
}

object KmvBuf {
  def empty(k: Int): KmvBuf = new KmvBuf(k)
}
