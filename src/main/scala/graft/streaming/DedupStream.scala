package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection — the streaming analog of the batch
  * `dedup_incremental` operator: every arriving document is checked against
  * everything previously seen WITHOUT re-pairing the history against
  * itself, using the same replayable MinHash + LSH banding family as the
  * batch pipeline.
  *
  * Shape: signature + band keys are computed map-side (one codegen'd
  * expression per row), then state is keyed BY LSH BUCKET — each bucket's
  * state holds the (doc_id, signature) list of its members, so an arriving
  * doc compares only against its bucket's members (the LSH candidate set),
  * never the corpus. State per key is bounded by bucket occupancy, which
  * LSH keeps small by construction; for unbounded streams pass
  * `bucketTtlMs` to age out COLD buckets (no arrivals within the TTL):
  * the timeout re-arms on every arrival, so hot buckets are never evicted,
  * and an evicted bucket's re-arrival starts an empty member list — new
  * docs no longer match against pre-eviction history through that bucket
  * (the documented trade for bounded state; the default `None` retains
  * everything and is exactly batch-equivalent).
  *
  * A pair agreeing in SEVERAL bands is emitted once per agreeing band
  * (bucket-local state cannot see other buckets); the sink dedupes pairs
  * exactly like the batch pipeline's `distinct()` — at scale the match
  * stream is tiny next to the document stream, so the dedup is cheap.
  */
object DedupStream {

  /** One bucket member: doc id + its full minhash signature. */
  final case class SigDoc(doc_id: Long, sig: Seq[Long])

  /** Bucket state: members seen so far, in arrival order. */
  final case class BucketState(docs: Seq[SigDoc])

  /** An emitted near-dup match (doc_a < doc_b, est = slot agreement / 64). */
  final case class Match(doc_a: Long, doc_b: Long, est_jaccard: Double)

  private def agreement(a: Seq[Long], b: Seq[Long]): Double = {
    var eq = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  /** docs(doc_id, text) stream → Match stream (append). `threshold` is the
    * estimated-Jaccard verify bar (0.5 like the batch pipeline);
    * `bucketTtlMs` opts in to cold-bucket eviction (see object doc). */
  def nearDupMatches(spark: SparkSession, docs: DataFrame,
      threshold: Double = 0.5, bucketTtlMs: Option[Long] = None): Dataset[Match] = {
    import spark.implicits._
    val timeoutConf =
      if (bucketTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    val sigged = docs.select(col("doc_id"),
      graft.plans.NgramHashes.minhashMd5(spark, col("text"), 3, 64).as("sig"))
    val bucketed = sigged.select(col("doc_id"), col("sig"),
      explode(graft.plans.NgramHashes.bands(spark, col("sig"), 16, 4)).as("bucket"))
      .as[(Long, Seq[Long], Long)]
    bucketed.groupByKey(_._3)
      .flatMapGroupsWithState[BucketState, Match](
        OutputMode.Append, timeoutConf) {
        case (_, rows, state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            // cold bucket: no arrivals within the TTL — drop its members
            state.remove()
            Iterator.empty
          } else {
            val seen = state.getOption.getOrElse(BucketState(Nil)).docs
            val seenIds = seen.iterator.map(_.doc_id).toSet
            // microbatch iterator order is not deterministic — process in
            // doc_id order so restarts and re-executions emit identical
            // pairs. Drop ids already in state too: an at-least-once source
            // redelivering a doc must not duplicate its state entry (and
            // with it every future match emission).
            val batch = rows.map(r => SigDoc(r._1, r._2)).toSeq
              .distinctBy(_.doc_id).filterNot(d => seenIds(d.doc_id))
              .sortBy(_.doc_id)
            val out = Seq.newBuilder[Match]
            var members = seen
            batch.foreach { d =>
              members.foreach { m =>
                if (m.doc_id != d.doc_id) {
                  val est = agreement(m.sig, d.sig)
                  if (est >= threshold)
                    out += Match(math.min(m.doc_id, d.doc_id),
                      math.max(m.doc_id, d.doc_id),
                      math.round(est * 10000).toDouble / 10000)
                }
              }
              members = members :+ d
            }
            state.update(BucketState(members))
            // re-armed on every arrival: only buckets with NO arrivals for
            // a full TTL window go cold
            bucketTtlMs.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }
}
