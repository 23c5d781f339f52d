package graft.plans

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** EXACT distinct count over a bounded dense-integer key domain, as a
  * fixed-size mergeable bitmap — the third point on the cardinality
  * spectrum the library ships:
  *
  *  - `countDistinct`: exact, but shuffles the distinct VALUE SET
  *    (state grows with cardinality — the expensive exact path);
  *  - `approx_count_distinct` (HLL++): fixed state, approximate;
  *  - `bitmap_distinct`: fixed state AND exact, when keys are dense
  *    integers in a known range (surrogate ids, dictionary codes,
  *    partition ordinals — exactly the id shapes a warehouse mints).
  *
  * State is maxId/8 bytes per group regardless of row count; partial
  * bitmaps OR-merge map-side, so the exchange carries O(maxId/8) per
  * group where exact countDistinct would carry every distinct key. At
  * 100 TB with billions of rows over a ~10⁶-id dimension this turns the
  * expensive-exact aggregate into a cheap fixed-width one (the roaring-
  * bitmap idea, dense-domain special case).
  *
  * Keys outside [0, maxId) fail LOUDLY — a silently dropped key would be
  * a silently wrong count.
  */
final case class BitmapDistinctAgg(
    child: Expression,
    maxId: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(maxId >= 1 && maxId <= (1 << 28),
    s"bitmap_distinct: maxId must be in 1..2^28 (32 MiB state cap), got $maxId")

  private val numWords = (maxId + 63) >>> 6

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType || child.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_distinct expects an int/bigint key, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val id = v match {
        case l: Long => l
        case i: Int => i.toLong
      }
      require(id >= 0 && id < maxId,
        s"bitmap_distinct: key $id outside [0, $maxId) — widen maxId")
      buf((id >>> 6).toInt) |= (1L << (id & 63))
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < buf.length) { n += java.lang.Long.bitCount(buf(i)); i += 1 }
    n
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill(bytes.length >>> 3)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(off: Int): BitmapDistinctAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): BitmapDistinctAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BitmapDistinctAgg =
    copy(child = c.head)
  override def prettyName: String = "bitmap_distinct"
}
