package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** One keyed observation on the stream: `key_hash` is the 48-bit
  * non-negative hash of the distinct-counted key (the same md5-derived
  * family `q_kmv_distinct` feeds the batch aggregate). */
final case class SegmentKey(segment: String, key_hash: Long)

/** The live sketch of one segment after a micro-batch: the retained
  * bottom-k hashes (sorted ascending) and the (k−1)/h₍ₖ₎ estimate. */
final case class SketchRow(segment: String, mins: Seq[Long], kmv_estimate: Double)

/** Streaming KMV distinct sketch — the incremental analog of the batch
  * `bottomk_distinct` aggregate behind `q_kmv_distinct` /
  * `q_sketch_setops` / `q_rolling_distinct`: per-segment state is ONE
  * k-bounded hash buffer (k longs, fixed — the state store never grows
  * with distinct cardinality, which is the whole point of sketching a
  * stream), updated by the same offer/absorb laws the batch buffer obeys.
  * Because the buffer's merge is commutative/associative and duplicates
  * are rejected inside it, the sketch after ANY micro-batch split equals
  * the batch aggregate over everything seen so far — spec'd — so a live
  * dashboard reading this stream and a nightly batch job reading the lake
  * report the SAME estimate.
  */
object SketchStream {

  private val two48 = 281474976710656.0 // 2^48

  def kmvDistinct(events: Dataset[SegmentKey], k: Int): Dataset[SketchRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.segment)
      .mapGroupsWithState[Array[Long], SketchRow](GroupStateTimeout.NoTimeout) {
        (seg, it, state) =>
          val buf = graft.plans.KmvBuf.empty(k)
          state.getOption.foreach(_.foreach(buf.offer))
          it.foreach(e => buf.offer(e.key_hash)) // negative hash fails loudly
          val sorted = buf.sorted
          state.update(sorted)
          val est =
            if (sorted.length < k) sorted.length.toDouble
            else (k - 1).toDouble / (sorted(k - 1).toDouble / two48)
          SketchRow(seg, sorted.toIndexedSeq, est)
      }
  }
}
