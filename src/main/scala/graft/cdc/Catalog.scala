package graft.cdc

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

/** Consumer-side publication catalog — the lifecycle surface the reference
  * drives as Postgres DDL (postrack.go:188-256): Set/Add/Alter/Drop/Replace
  * over a registry of per-table publications, including the WithOverride
  * idempotency semantics (postrack.go:57-61, 213-227). Where the reference
  * mutates pg_publication, this catalog holds the logical definitions and
  * applies them to a multi-table change feed as pushed-down scans.
  *
  * Not thread-safe by design (the reference's Conn isn't either): one
  * catalog per consumer, mutated at setup time, read at plan time.
  */
final class PublicationCatalog {

  private val pubs = scala.collection.mutable.LinkedHashMap[String, Publication]()

  def exists(table: String): Boolean = pubs.contains(table)

  def publication(table: String): Option[Publication] = pubs.get(table)

  def tables: Seq[String] = pubs.keys.toSeq

  /** SetPublication (postrack.go:188-198): add if absent, else alter with
    * the publication's own override flag. */
  def set(pub: Publication): Unit =
    if (!exists(pub.tableName)) add(pub) else alter(pub, pub.overrideExisting)

  /** AddPublication (postrack.go:200-211): CREATE PUBLICATION — errors on an
    * existing definition, like the DDL it mirrors. */
  def add(pub: Publication): Unit = {
    require(!exists(pub.tableName),
      s"publication for table '${pub.tableName}' already exists (use set/alter/replace)")
    pubs(pub.tableName) = pub
  }

  /** AlterPublication (postrack.go:213-239): with `noOverride` the existing
    * definition is KEPT (idempotent re-registration); otherwise the table is
    * dropped from the publication and re-added with the new definition. */
  def alter(pub: Publication, noOverride: Boolean): Unit = {
    if (exists(pub.tableName) && noOverride) return
    pubs(pub.tableName) = pub
  }

  /** DropPublication (postrack.go:241-248): DROP IF EXISTS semantics. */
  def drop(table: String): Unit = pubs.remove(table)

  /** ReplacePublication (postrack.go:250-256): drop + add. */
  def replace(pub: Publication): Unit = { drop(pub.tableName); add(pub) }

  /** The catalog applied to a multi-table feed: each registered publication
    * filters its own table slice (selector/condition/mask push into the
    * scan, see Publication.apply); slices are disjoint by table, so the
    * union is exactly "what this consumer subscribed to". Publications with
    * a column selector produce a NARROWER slice; allowMissingColumns pads
    * the unpublished columns with null in the union, which is exactly what
    * "this table doesn't publish that column" means downstream (a strict
    * unionByName would refuse to mix selector widths at plan time). */
  def apply(feed: DataFrame): DataFrame = {
    require(pubs.nonEmpty, "no publications registered")
    pubs.values.map(_(feed))
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }
}

/** Durable slot registry + LSN offset store — the consumer-side analog of the
  * replication slot's `confirmed_flush_lsn`: the reference creates/drops
  * slots (postrack.go:258-285) and acks progress from its keepAlive loop
  * (postrack.go:107-117, SendStandbyStatusUpdate(WALWritePosition)). Here a
  * slot is a named, durable high-watermark that `Apply.resumeFrom` restarts
  * strictly after — same contract as StartReplication(lsn+1)
  * (postrack.go:287-309).
  *
  * Storage is one tiny file per slot under `dir` (next to the streaming
  * checkpoint in a real deployment), written temp-file + atomic rename so a
  * crash mid-ack can never leave a torn offset. The SELECTED slot name is
  * durable too (`_current` file, same write discipline), so a restarted
  * process resumes the same slot it was acking before the crash without
  * re-running its bootstrap/setSlot sequence.
  */
final class SlotStore(dir: String) {

  Files.createDirectories(Paths.get(dir))

  private def currentPath: Path = Paths.get(dir, "_current.slot")

  private def path(slot: String): Path = Paths.get(dir, s"$slot.lsn")

  def exists(slot: String): Boolean = Files.exists(path(slot))

  /** SetSlot (postrack.go:258-268): select if present, create otherwise. */
  def setSlot(slot: String): Unit = {
    if (!exists(slot)) addSlot(slot) else writeCurrent(slot)
  }

  /** AddSlot (postrack.go:270-277): create; errors if the slot exists. */
  def addSlot(slot: String): Unit = {
    require(!exists(slot), s"slot '$slot' already exists")
    writeCurrent(slot)
    write(slot, 0L)
  }

  /** DropSlot (postrack.go:279-285). The selection check runs BEFORE the
    * slot file is deleted (currentSlot filters by exists, so checking after
    * would always see None and leave a dangling `_current` file behind). */
  def dropSlot(slot: String): Unit = {
    val wasCurrent = currentSlot.contains(slot)
    Files.deleteIfExists(path(slot))
    if (wasCurrent) Files.deleteIfExists(currentPath)
  }

  /** The selected slot, surviving restarts: read from the `_current` file,
    * so a fresh SlotStore over the same dir resumes where setSlot left
    * off. A dangling name (slot dropped by another process) reads as None
    * rather than resuming a deleted slot. */
  def currentSlot: Option[String] =
    if (!Files.exists(currentPath)) None
    else Some(new String(Files.readAllBytes(currentPath), StandardCharsets.UTF_8).trim)
      .filter(exists)

  private def writeCurrent(slot: String): Unit = {
    val tmp = Paths.get(dir, "._current.slot.tmp")
    Files.write(tmp, slot.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, currentPath, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Ack progress (keepAlive analog). Monotone: an out-of-order ack (a
    * reconnect replaying an older LSN) can never move the watermark back. */
  def ack(slot: String, lsn: Long): Unit = {
    // acking a non-existent slot would silently re-CREATE it (a capture
    // loop racing a dropSlot could resurrect a slot the operator removed) —
    // fail loudly instead, like Postgres rejecting a status update for an
    // unknown slot
    require(exists(slot), s"cannot ack unknown slot '$slot' (dropped?)")
    val prev = confirmedFlushLsn(slot)
    if (lsn > prev) write(slot, lsn)
  }

  /** The stored high-watermark; 0 for a fresh slot (resume from genesis). */
  def confirmedFlushLsn(slot: String): Long =
    if (!exists(slot)) 0L
    else new String(Files.readAllBytes(path(slot)), StandardCharsets.UTF_8).trim.toLong

  private def write(slot: String, lsn: Long): Unit = {
    val tmp = Paths.get(dir, s".$slot.lsn.tmp")
    Files.write(tmp, lsn.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path(slot), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }
}
