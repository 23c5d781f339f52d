package graft.cdc

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.{PgOutputStream, SocketCapture}

/** The reference's primary entry point, `Conn.Bootstrap`
  * (postrack.go:320-338), as ONE call: SetEvents + SetLSN + connect +
  * SetSlot + SetPublication per table + Changes(lsn+1, handle). Every
  * ingredient already exists ([[PublicationCatalog]], [[SlotStore]],
  * [[graft.streaming.SocketCapture]], [[graft.streaming.PgOutputStream]]);
  * this composes them so a user reproduces the reference's README-level
  * usage 1:1 instead of hand-assembling five pieces.
  *
  * Shape (deliberately the reference's, see SocketCapture's scaladoc):
  * capture is one driver-side replication connection per slot — a protocol
  * constraint — writing a durable frame lake; everything downstream
  * (decode, publication slicing, the user's `handle`) is distributed Spark.
  *
  * Durability: TWO watermarks, both in the same [[SlotStore]]. The capture
  * slot (`slot`) is the server-side replication position — frames at or
  * below it are never re-requested. The dispatch slot (`<slot>_apply`)
  * advances only after a successful `handle`, so a crash between capture
  * and dispatch replays the batch into `handle` (at-least-once — exactly
  * the reference dispatching the change before its keepAlive ack moves,
  * postrack.go:98-117, 340-413). A re-`run` with the same `stateDir`
  * resumes both from where they durably stopped.
  *
  * One deviation from the Go signature, documented rather than hidden:
  * `fromLsn` seeds the watermarks MONOTONICALLY (a value below a stored
  * watermark does not rewind it). The reference passes the caller's LSN to
  * StartReplication verbatim, but its server-side replay below
  * `confirmed_flush_lsn` delivers nothing new either — the slot store is
  * the durability contract here, and [[SocketCapture]]'s flush filter
  * drops sub-watermark replays on principle.
  */
object Bootstrap {

  /** CreatePublicationId (postrack.go:63-65): the slot's one publication —
    * the reference adds every table to `publication_<slot>`. */
  def publicationId(slot: String): String = s"publication_$slot"

  final case class BootstrapStats(
      capture: SocketCapture.CaptureStats,
      /** Capture watermark: last frame LSN durably in the lake. */
      confirmedFlushLsn: Long,
      /** Dispatch watermark: last LSN successfully handled. */
      handledLsn: Long)

  /** Bootstrap(slot, tables, events, lsn, handle) — postrack.go:320-338.
    *
    * @param tables  per-table publications (Table + WithSelector /
    *                WithCondition / WithOverride, postrack.go:46-61)
    * @param events  the global `publish=` mask AddPublication builds from
    *                `conn.events` (postrack.go:200-211) — intersected with
    *                each publication's own mask
    * @param fromLsn SetLSN analog: replication starts strictly after it
    * @param handle  HandleFunc (postrack.go:35): called once per micro-batch
    *                with the catalog-sliced [[ChangeEvent]] dataset
    */
  def run(
      spark: SparkSession,
      host: String, port: Int, database: String, user: String,
      slot: String,
      tables: Seq[Publication],
      events: Set[String] = Set("INSERT", "UPDATE", "DELETE", "TRUNCATE"),
      fromLsn: Long = 0L,
      stateDir: String,
      flushEvery: Int = 256,
      maxReconnects: Int = 5)(
      handle: Dataset[ChangeEvent] => Unit): BootstrapStats = {
    require(tables.nonEmpty, "Bootstrap needs at least one table publication")
    require(events.nonEmpty, "empty publish mask would publish nothing")

    // SetSlot (postrack.go:258-268) + SetLSN seeding, capture side
    val slots = new SlotStore(s"$stateDir/slots")
    slots.setSlot(slot)
    if (fromLsn > 0) slots.ack(slot, fromLsn)

    // SetPublication per table (postrack.go:188-198) into the consumer-side
    // catalog, with the global publish mask folded into each definition
    val catalog = new PublicationCatalog
    tables.foreach(t => catalog.set(t.copy(eventMask = t.eventMask.intersect(events))))

    // connect + Changes(lsn+1): the capture loop fills the durable frame lake
    val lakeDir = s"$stateDir/frames"
    val captureStats = new SocketCapture(
      host, port, database, user, slot, publicationId(slot),
      slots, spark, lakeDir, flushEvery, maxReconnects).run()

    // handler (postrack.go:340-413): decode the lake from the dispatch
    // watermark, slice by publications, hand each micro-batch to `handle`
    val applySlot = s"${slot}_apply"
    if (!slots.exists(applySlot)) {
      slots.addSlot(applySlot)
      // addSlot selects the slot it creates; re-select the CALLER's capture
      // slot so the durable "selected slot survives restarts" contract
      // (SlotStore.currentSlot) still points at what the user bootstrapped,
      // not at this internal dispatch watermark
      slots.setSlot(slot)
    }
    if (fromLsn > 0) slots.ack(applySlot, fromLsn)
    val watermark = slots.confirmedFlushLsn(applySlot)
    val decoded = PgOutputStream.decodeStream(spark,
      PgOutputStream.resumeFrames(spark, lakeDir, slots, applySlot))
    // fresh checkpoint per resume position: the watermark (not the file
    // source's seen-files log) governs where a re-bootstrap resumes. Prior
    // resume positions leave abandoned checkpoints behind — prune every
    // $applySlot-<w> with w below the current watermark so a long-lived
    // state dir holds at most the live one (a failed delete is non-fatal:
    // the stale dir is dead weight, not state).
    pruneStaleCheckpoints(s"$stateDir/ck", applySlot, watermark)
    val q = PgOutputStream.captureTo(
      decoded, s"$stateDir/ck/$applySlot-$watermark", slots, applySlot) {
      batch => handle(slice(catalog, batch))
    }
    try q.processAllAvailable() finally q.stop()

    BootstrapStats(captureStats,
      slots.confirmedFlushLsn(slot), slots.confirmedFlushLsn(applySlot))
  }

  /** Remove checkpoints of previous resume positions: directories named
    * `<applySlot>-<watermark>` whose watermark is strictly below `current`.
    * Streaming never reads them again (each resume position gets a fresh
    * checkpoint), so they only accumulate. */
  private[cdc] def pruneStaleCheckpoints(
      ckRoot: String, applySlot: String, current: Long): Unit = {
    val root = new java.io.File(ckRoot)
    val prefix = s"$applySlot-"
    Option(root.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.isDirectory && f.getName.startsWith(prefix)) {
        val suffix = f.getName.drop(prefix.length)
        val stale = suffix.forall(_.isDigit) && suffix.nonEmpty &&
          scala.util.Try(suffix.toLong).toOption.exists(_ < current)
        if (stale) {
          def rm(x: java.io.File): Unit = {
            Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
            x.delete(): Unit
          }
          rm(f)
        }
      }
    }
  }

  /** The catalog applied to a decoded [[ChangeEvent]] batch — the streaming
    * analog of [[PublicationCatalog.apply]] (which slices the flattened
    * batch feed): table membership and event mask filter rows; a
    * publication's column selector narrows the before/after IMAGES to the
    * published keys (the row stays, its maps shrink — what a Postgres column
    * list does to the published tuple); a condition filters rows and may
    * reference the images (`element_at(col("after"), ...)`). Slices are
    * disjoint by table, so the union is exactly the subscription. */
  private[cdc] def slice(
      catalog: PublicationCatalog, batch: Dataset[ChangeEvent]): Dataset[ChangeEvent] = {
    import batch.sparkSession.implicits._
    val slices = catalog.tables.map { t =>
      val p = catalog.publication(t).get
      var df = batch.toDF()
        .filter(col("table_name") === t)
        .filter(col("op").isin(p.eventMask.toSeq.sorted: _*))
      p.condition.foreach(c => df = df.filter(c))
      if (p.selector.nonEmpty) {
        // native codegen'd key projection (null map → null) — the one-time
        // keep set replaces the interpreted map_filter lambda this dispatch
        // hot path carried through round 6
        val keep = array(p.selector.map(lit): _*)
        def prune(image: String) = graft.plans.MapProjectKeys.project(
          batch.sparkSession, col(image), keep)
        df = df.withColumn("before", prune("before"))
          .withColumn("after", prune("after"))
      }
      df
    }
    slices.reduce(_.unionByName(_)).as[ChangeEvent]
  }
}
