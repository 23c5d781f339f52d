package graft.operators

import org.apache.spark.sql.DataFrame

/** Bounded registry for operator-INTERNAL `persist()`s — the lazy caches
  * PrefixSum / ThresholdSelect / keep-list scoring use so one query's two
  * consumers share a single computation of an intermediate. Those caches are
  * dead weight the moment the caller's action finishes, but the operator
  * cannot unpersist there (the returned plan still references the cache
  * lazily, and the operator never sees the caller's action). Left alone
  * they accumulate for the session lifetime — in a 100-query × 3-run bench
  * loop, hundreds of stale cached plans bounded only by LRU eviction.
  *
  * The lease keeps the last [[CacheLease.MaxLeases]] operator caches alive
  * and unpersists the oldest beyond that (non-blocking). Evicting early is
  * always CORRECT — every leased plan is deterministic (range partitioning
  * seeds from partition index, not wall clock), so a consumer that outlives
  * its lease simply recomputes the same rows. The window just needs to
  * cover "caches live inside one in-flight query", and 16 is far above any
  * operator's concurrent internal-cache count. */
object CacheLease {

  private val MaxLeases = 16
  private val leases = new java.util.ArrayDeque[DataFrame]()

  /** Persist `df` and lease the cache: the oldest leased cache beyond the
    * window is unpersisted (skipping sessions that already stopped). */
  def lease(df: DataFrame): DataFrame = synchronized {
    val cached = df.persist()
    leases.addLast(cached)
    while (leases.size > MaxLeases) {
      val old = leases.pollFirst()
      if (!old.sparkSession.sparkContext.isStopped) old.unpersist(blocking = false)
    }
    cached
  }
}
