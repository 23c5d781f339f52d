package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-group heavy hitters via the Misra–Gries summary (Misra & Gries '82;
  * merge rule from Agarwal et al. '13, "Mergeable Summaries") — the
  * bounded-memory frequent-items aggregate Spark doesn't ship (the built-in
  * `stat.freqItems` is whole-DataFrame only, not a groupBy aggregate).
  *
  * One pass, O(capacity) state per group, full partial aggregation: each
  * map task reduces its partition to ≤ capacity counters per group BEFORE
  * the exchange — at corpus scale the shuffle carries sketches, not tokens.
  * Guarantees: every reported count is within n/capacity of the true count
  * (n = group size), and any item with true frequency > n/capacity is
  * present in the summary. When capacity ≥ the group's distinct-item count
  * no decrement ever fires and the summary IS the exact count table —
  * which is what lets the heavy-hitters query hash-match a DuckDB oracle
  * while the same operator runs bounded-memory approximate at any scale.
  */
final case class FreqItemsAgg(
    child: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqItemsBuf] {

  require(capacity >= 1, s"freq_items needs capacity >= 1, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType), StructField("count", LongType))),
    containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"freq_items expects string, got $other")
    }

  override def createAggregationBuffer(): FreqItemsBuf = new FreqItemsBuf(capacity)

  override def update(buf: FreqItemsBuf, input: InternalRow): FreqItemsBuf = {
    val v = child.eval(input)
    // null items are skipped (a count of nulls is not a frequent ITEM)
    if (v != null) buf.offer(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(b1: FreqItemsBuf, b2: FreqItemsBuf): FreqItemsBuf = {
    b1.absorb(b2); b1
  }

  /** (item, count) structs sorted by (count desc, item asc) — a total
    * order, so results are byte-stable for the oracle gate. */
  override def eval(buf: FreqItemsBuf): Any = {
    val sorted = buf.sorted
    new GenericArrayData(sorted.map { case (item, n) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), n))
    })
  }

  override def serialize(buf: FreqItemsBuf): Array[Byte] = {
    val entries = buf.entries
    var bytes = 8
    entries.foreach { case (item, _) =>
      bytes += 12 + item.getBytes(StandardCharsets.UTF_8).length
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.capacity); bb.putInt(entries.length)
    entries.foreach { case (item, n) =>
      val b = item.getBytes(StandardCharsets.UTF_8)
      bb.putInt(b.length); bb.put(b); bb.putLong(n)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqItemsBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new FreqItemsBuf(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FreqItemsAgg =
    copy(child = c.head)
  override def prettyName: String = "freq_items"
}

/** capacity-bounded Misra–Gries counter table. */
final class FreqItemsBuf(val capacity: Int) {
  private val counts = new java.util.HashMap[String, Long](capacity * 2)

  /** Classic MG step: bump if tracked, insert if room, else decrement all
    * (dropping zeros) — the candidate is absorbed by the decrement. */
  def offer(item: String): Unit = {
    // counts never holds a zero (decrements remove them), so 0 = absent;
    // getOrDefault avoids the null-unboxing trap of plain get()
    val cur = counts.getOrDefault(item, 0L)
    if (cur != 0L) counts.put(item, cur + 1L)
    else if (counts.size < capacity) counts.put(item, 1L)
    else {
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  /** Restore a serialized counter (no MG step — counts are trusted). */
  def put(item: String, n: Long): Unit = counts.put(item, n)

  /** Mergeable-summaries rule: sum counts, then if over capacity subtract
    * the (capacity+1)-th largest count from everything and drop ≤ 0 —
    * keeps the additive n/capacity error bound of the one-pass form. */
  def absorb(o: FreqItemsBuf): Unit = {
    o.counts.forEach { (item, n) =>
      counts.put(item, counts.getOrDefault(item, 0L) + n)
    }
    if (counts.size > capacity) {
      val vals = new Array[Long](counts.size)
      var i = 0
      counts.forEach { (_, n) => vals(i) = n; i += 1 }
      java.util.Arrays.sort(vals)
      // vals is ascending; the (capacity+1)-th largest is at size-capacity-1
      val d = vals(counts.size - capacity - 1)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= d) it.remove() else e.setValue(e.getValue - d)
      }
    }
  }

  def entries: Array[(String, Long)] = {
    val out = new Array[(String, Long)](counts.size)
    var i = 0
    counts.forEach { (item, n) => out(i) = (item, n); i += 1 }
    out
  }

  def sorted: Array[(String, Long)] =
    entries.sortWith { case ((i1, n1), (i2, n2)) =>
      n1 > n2 || (n1 == n2 && i1 < i2)
    }
}

object FreqItems {

  def register(spark: SparkSession): Unit = NativeFunctions.register(spark)

  /** Aggregate column: array<struct<item,count>> heavy-hitter summary. */
  def freqItems(spark: SparkSession, item: Column, capacity: Int): Column = {
    register(spark)
    call_function("freq_items", item, org.apache.spark.sql.functions.lit(capacity))
  }
}
