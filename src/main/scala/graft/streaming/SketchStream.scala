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
/** Cents quantization with SQL-`round` semantics (BigDecimal of the EXACT
  * double expansion, HALF_UP = half away from zero): Java `Math.round`
  * rounds half toward +inf, so math.round(-0.5) = 0 where Spark/DuckDB
  * round(-0.5) = -1 — a streaming engine must quantize exactly like its
  * batch twin and the oracle, or negative half-cent values diverge. */
private[streaming] object Cents {
  def apply(v: Double): Long =
    new java.math.BigDecimal(v)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue
}

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

  /** Streaming Misra–Gries heavy hitters — the incremental analog of the
    * batch `freq_items` aggregate behind `text_heavy_hitters`: per-segment
    * state is ONE capacity-bounded counter table (+ the processed count),
    * updated by the same offer/decrement law `FreqItemsBuf` runs batch-side
    * — fixed state per key no matter how many distinct items stream past,
    * which is the point of sketching frequencies. Each touched segment
    * re-emits its full summary per micro-batch with a strictly increasing
    * `n_seen`, so the FINAL state is picked distributively by max n_seen —
    * never by sink append order. The MG guarantee survives any batching:
    * every item with true count > n_seen/capacity is IN the summary, and
    * each reported count is within n_seen/capacity of truth — so filtering
    * the final summary by an exact integer threshold (thr·count > n_seen
    * with capacity ≥ thr) reproduces EXACTLY the batch heavy-hitter set,
    * which is what lets a batch SQL oracle gate the engine end-to-end.
    * Within a batch rows fold in `ord` order so emissions replay
    * deterministically under the ordered-chunk feed. */
  def heavyHitters(events: Dataset[TokenObs], capacity: Int): Dataset[HeavyRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.segment)
      .mapGroupsWithState[(Map[String, Long], Long), HeavyRow](
        GroupStateTimeout.NoTimeout) { (seg, it, state) =>
        val (prev, n0) = state.getOption.getOrElse((Map.empty[String, Long], 0L))
        val buf = new graft.plans.FreqItemsBuf(capacity)
        prev.foreach { case (item, n) => buf.put(item, n) }
        var n = n0
        // (ord, item) is a TOTAL order even if a feed reuses ord values
        // (tied ords would otherwise fold in nondeterministic shuffle
        // arrival order, and in the decrement regime WHICH items survive
        // depends on offer order) — the replay determinism the contract
        // promises must not rest on the feed keeping ords unique
        it.toVector.sortBy(e => (e.ord, e.item))
          .foreach { e => buf.offer(e.item); n += 1 }
        val summary = buf.entries.toMap
        state.update((summary, n))
        HeavyRow(seg, n, summary)
      }
  }

  /** Streaming ONLINE z-score anomaly detection — the live analog of the
    * batch `q_zscore_outliers` gate, with the one semantic difference an
    * online monitor must have: each event is judged against the moments of
    * everything BEFORE it (a batch pass judges against the global moments,
    * which an unbounded stream never has). Per-series state is three exact
    * integers — n, Σ cents, Σ cents² (the last as BigDecimal: a cents
    * square sum overflows Long at ~10⁹ events) — plus the last processed
    * (ts_us, event_id) position; the ordering/stale-drop contract matches
    * [[BehaviorStream.transitions]], so under the capture-feed guarantee
    * the emission set is micro-batch-split invariant (spec'd). An event is
    * flagged once ≥ `warmup` prior observations exist and its
    * |value − μ_prior| exceeds `sigmas`·σ_prior; every event — flagged or
    * not — then joins the moments (the standard online posture: one
    * outlier must not poison the baseline by being excluded, nor freeze
    * it by halting updates). State is O(series), constant per key. */
  def zscoreOutliers(events: Dataset[MetricEvent],
      sigmas: Double = 3.0, warmup: Long = 30L): Dataset[Anomaly] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.series)
      .flatMapGroupsWithState[MomentState, Anomaly](
        org.apache.spark.sql.streaming.OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (series, it, state) =>
          var st = state.getOption.getOrElse(
            MomentState(0L, 0L, java.math.BigDecimal.ZERO, Long.MinValue, Long.MinValue))
          val out = Vector.newBuilder[Anomaly]
          it.toVector.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            val inOrder = e.ts_us > st.ts_us ||
              (e.ts_us == st.ts_us && e.event_id > st.event_id)
            if (inOrder) {
              val vc = Cents(e.value * 100)
              if (st.n >= warmup) {
                val n = st.n.toDouble
                val mean = st.sum_c.toDouble / n
                val variance =
                  (n * st.sum2_c.doubleValue() - st.sum_c.toDouble * st.sum_c.toDouble) /
                    (n * (n - 1.0))
                val sd = math.sqrt(variance)
                if (sd > 0.0) {
                  val z = (vc.toDouble - mean) / sd
                  if (math.abs(z) > sigmas)
                    out += Anomaly(series, e.event_id, e.ts_us, e.value,
                      math.floor(z * 10000) / 10000, st.n)
                }
              }
              st = MomentState(st.n + 1, st.sum_c + vc,
                st.sum2_c.add(java.math.BigDecimal.valueOf(vc).pow(2)),
                e.ts_us, e.event_id)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}

/** One counted observation on the stream; `ord` fixes the within-batch
  * fold order (the feed's chunk key). */
final case class TokenObs(segment: String, item: String, ord: Long)

/** One segment's Misra–Gries summary after a micro-batch: the counter
  * table and the strictly increasing processed count that picks the
  * final emission. */
final case class HeavyRow(segment: String, n_seen: Long, items: Map[String, Long])

/** One observation of a monitored metric series. */
final case class MetricEvent(series: String, event_id: Long, ts_us: Long, value: Double)

/** An emitted anomaly: `z` vs the series' PRIOR moments over `n_seen`
  * observations (floor-quantized to 4dp). */
final case class Anomaly(series: String, event_id: Long, ts_us: Long,
    value: Double, z: Double, n_seen: Long)

/** Per-series online-moment state: exact integer sums + last position. */
final case class MomentState(n: Long, sum_c: Long, sum2_c: java.math.BigDecimal,
    ts_us: Long, event_id: Long)
