package graft.operators

import org.apache.spark.sql.SparkSession

/** A (session, key)-scoped memo for stored-artifact DataFrames — the
  * signature tables, verified-pair tables and ANN indexes that a production
  * pipeline materializes once and every downstream pass reads. Entries
  * whose session has stopped are evicted on EVERY access to ANY memo (a
  * global registry backs the purge), so dead sessions and their
  * checkpointed frames can never stay pinned for the life of the JVM just
  * because one particular memo went quiet (test suites, notebooks,
  * multi-tenant drivers). */
final class SessionMemo[V] {

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), V]()
  SessionMemo.all.add(this)

  private[operators] def purgeStopped(): Unit =
    entries.keySet.removeIf(k => k._1.sparkContext.isStopped)

  /** The memoized value for (session, key), building it on first access. */
  def get(s: SparkSession, key: String)(build: => V): V = {
    SessionMemo.purgeAll()
    entries.computeIfAbsent((s, key), _ => build)
  }
}

object SessionMemo {
  private val all =
    new java.util.concurrent.CopyOnWriteArrayList[SessionMemo[_]]()

  private def purgeAll(): Unit = all.forEach(_.purgeStopped())
}
