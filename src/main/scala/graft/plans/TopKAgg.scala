package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Bounded top-k aggregate over (score double, id long) pairs, ordered by
  * (score DESC, id ASC).
  *
  * The window formulation of per-group top-k (`row_number over (partition
  * by g order by score desc)` + `filter rk <= k`) SHUFFLES AND SORTS EVERY
  * SCORED ROW before discarding all but k — at corpus scale the shuffle is
  * the query. This aggregate keeps a k-bounded buffer per group; because
  * TypedImperativeAggregate participates in partial aggregation, each map
  * task pre-reduces its partition to ≤ k rows per group BEFORE the
  * exchange, so the shuffle carries O(groups × k × partitions-touched)
  * rows instead of every candidate. The tie-break on id makes results
  * deterministic and byte-stable for the oracle gate.
  *
  * Buffer is two parallel arrays scanned linearly — for the k ≤ 100 this
  * library uses, a scan beats heap bookkeeping and allocates nothing.
  */
final case class TopKAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  require(k >= 1, s"topk needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StructType(Array(a, b)) if a.dataType == DoubleType && b.dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"topk expects struct<double, long>, got $other")
    }

  override def createAggregationBuffer(): TopKBuf = TopKBuf.empty(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val row = v.asInstanceOf[InternalRow]
      // a null score is an unscorable candidate (e.g. cosine of a null
      // embedding): dropped, where the window form would rank it last
      // (desc_nulls_last) — for a top-k this only differs when a group has
      // fewer than k scorable rows, and "absent" beats "present with a
      // made-up rank" there
      if (row.isNullAt(0) || row.isNullAt(1)) buf
      else { buf.offer(row.getDouble(0), row.getLong(1)); buf }
    }
  }

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = { b1.absorb(b2); b1 }

  /** Sorted (score desc, id asc) array of structs. */
  override def eval(buf: TopKBuf): Any = {
    val sorted = buf.sorted
    new GenericArrayData(sorted.map { case (s, id) =>
      new GenericInternalRow(Array[Any](s, id))
    })
  }

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.size * 16)
    bb.putInt(buf.size); bb.putInt(k)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val kk = bb.getInt
    val buf = TopKBuf.empty(kk)
    var i = 0
    while (i < n) { buf.offer(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): TopKAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): TopKAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKAgg =
    copy(child = c.head)
  override def prettyName: String = "topk"
}

/** k-bounded (score, id) buffer; keeps the best k by (score desc, id asc). */
final class TopKBuf(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** true if (s1, id1) ranks ahead of (s2, id2). Double.compare, not `>`:
    * it totally orders NaN (greater than everything, matching Spark's desc
    * window ordering) and -0.0 < 0.0, so the buffer can never strand a NaN
    * row nor hand sort a non-transitive comparator. */
  @inline private def beats(s1: Double, id1: Long, s2: Double, id2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && id1 < id2)
  }

  def offer(s: Double, id: Long): Unit =
    if (size < k) { scores(size) = s; ids(size) = id; size += 1 }
    else {
      // replace the current worst if the candidate beats it
      var worst = 0
      var i = 1
      while (i < size) {
        if (beats(scores(worst), ids(worst), scores(i), ids(i))) worst = i
        i += 1
      }
      if (beats(s, id, scores(worst), ids(worst))) { scores(worst) = s; ids(worst) = id }
    }

  def absorb(o: TopKBuf): Unit = {
    var i = 0
    while (i < o.size) { offer(o.scores(i), o.ids(i)); i += 1 }
  }

  def sorted: Array[(Double, Long)] =
    Array.tabulate(size)(i => (scores(i), ids(i)))
      .sortWith { case ((s1, i1), (s2, i2)) => beats(s1, i1, s2, i2) }
}

object TopKBuf {
  def empty(k: Int): TopKBuf = new TopKBuf(k)
}

object TopKAgg {

  def register(spark: SparkSession): Unit = NativeFunctions.register(spark)

  /** Aggregate column: array<struct<score,id>> of the group's top k. */
  def topk(spark: SparkSession, scoreAndId: Column, k: Int): Column = {
    register(spark)
    call_function("topk", scoreAndId, org.apache.spark.sql.functions.lit(k))
  }
}
