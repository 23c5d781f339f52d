package graft.cdc

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed pgoutput logical-replication messages — the wire format the
  * reference consumes via pglogrepl.Parse (postrack.go:362) and dispatches in
  * its handler switch (postrack.go:368-411). Layout follows the public
  * PostgreSQL "Logical Replication Message Formats" protocol docs
  * (protocol version 1, the version the reference requests,
  * postrack.go:299-301): big-endian integers, NUL-terminated UTF-8 strings,
  * text-format tuple columns.
  */
sealed trait PgMessage

final case class PgColumn(flags: Byte, name: String, typeOid: Int, typeMod: Int)

/** 'R' — registers relation id → (namespace, name, column names); the
  * reference keeps the two maps `tables`/`columns` from exactly this message
  * (postrack.go:369-376). */
final case class RelationMsg(
    relationId: Int, namespace: String, name: String,
    replicaIdentity: Byte, columns: Seq[PgColumn]) extends PgMessage

/** One decoded tuple: None = null ('n') or unchanged-TOAST ('u') column,
  * Some(text) = a text-format ('t') column value. */
final case class PgTuple(columns: Seq[Option[String]])

final case class InsertMsg(relationId: Int, newTuple: PgTuple) extends PgMessage

/** `oldKind` is 'K' (replica-identity key) or 'O' (full old row) when the
  * old tuple is present — the reference's `data.OldTuple != nil` branch
  * (postrack.go:387-392). The two options travel together: kind-without-
  * tuple (or vice versa) is unrepresentable on the wire, so it fails here
  * with a clear message instead of an opaque `oldTuple.get` inside encode. */
final case class UpdateMsg(
    relationId: Int, oldKind: Option[Byte], oldTuple: Option[PgTuple],
    newTuple: PgTuple) extends PgMessage {
  require(oldKind.isDefined == oldTuple.isDefined,
    s"UpdateMsg: oldKind and oldTuple must be both present or both absent " +
      s"(got oldKind=$oldKind, oldTuple ${if (oldTuple.isDefined) "present" else "absent"})")
}

final case class DeleteMsg(relationId: Int, oldKind: Byte, oldTuple: PgTuple) extends PgMessage

final case class TruncateMsg(options: Byte, relationIds: Seq[Int]) extends PgMessage

final case class BeginMsg(finalLsn: Long, commitTsUs: Long, xid: Int) extends PgMessage

final case class CommitMsg(flags: Byte, commitLsn: Long, endLsn: Long, tsUs: Long) extends PgMessage

/** The reference's HandleFunc tuple (postrack.go:35) as a row: nil maps where
  * the reference passes nil (INSERT has no before, DELETE no after, TRUNCATE
  * neither), and — matching postrack.go:379-382 exactly — null/TOAST columns
  * decode to "" inside a present map, never to an absent key. */
final case class ChangeEvent(
    lsn: Long, table_name: String, op: String,
    before: Map[String, String], after: Map[String, String])

/** Relation-schema registry versioned by LSN: a data message at LSN L decodes
  * against the most recent RelationMessage at or before L — the stream-order
  * overwrite semantics of the reference's `tables`/`columns` maps
  * (postrack.go:341-342, 369-376), made order-independent so partitions can
  * decode in parallel. O(#tables × #schema-versions) — broadcastable at any
  * corpus size. */
final class RelationRegistry(
    private val versions: Map[Int, Vector[(Long, RelationMsg)]]) extends Serializable {

  def relationAt(relationId: Int, lsn: Long): Option[RelationMsg] =
    versions.get(relationId).flatMap { v =>
      val i = v.lastIndexWhere(_._1 <= lsn)
      if (i >= 0) Some(v(i)._2) else None
    }
}

object RelationRegistry {
  def build(rels: Seq[(Long, RelationMsg)]): RelationRegistry =
    new RelationRegistry(
      rels.groupBy(_._2.relationId)
        .map { case (id, vs) => id -> vs.sortBy(_._1).toVector })
}

object PgOutput {

  // ---------------------------------------------------------------- decode

  /** Decode one pgoutput message (the payload the reference receives inside
    * XLogData, postrack.go:358-362). Throws on malformed input — a capture
    * pipeline wants loud failure, not silent row loss. */
  def decode(bytes: Array[Byte]): PgMessage = {
    require(bytes != null, "null pgoutput frame")
    require(bytes.nonEmpty, "empty pgoutput frame")
    val buf = ByteBuffer.wrap(bytes) // network byte order (big-endian)
    (buf.get(): @unchecked) match {
      case 'R' =>
        val relId = buf.getInt
        val ns = readCString(buf)
        val name = readCString(buf)
        val identity = buf.get()
        val nCols = buf.getShort.toInt
        val cols = (0 until nCols).map { _ =>
          PgColumn(buf.get(), readCString(buf), buf.getInt, buf.getInt)
        }
        RelationMsg(relId, ns, name, identity, cols)
      case 'I' =>
        val relId = buf.getInt
        val marker = buf.get()
        require(marker == 'N', s"Insert expects 'N' tuple marker, got $marker")
        InsertMsg(relId, readTuple(buf))
      case 'U' =>
        val relId = buf.getInt
        val first = buf.get()
        if (first == 'K' || first == 'O') {
          val old = readTuple(buf)
          val n = buf.get()
          require(n == 'N', s"Update expects 'N' after old tuple, got $n")
          UpdateMsg(relId, Some(first), Some(old), readTuple(buf))
        } else {
          require(first == 'N', s"Update expects 'K'|'O'|'N', got $first")
          UpdateMsg(relId, None, None, readTuple(buf))
        }
      case 'D' =>
        val relId = buf.getInt
        val kind = buf.get()
        require(kind == 'K' || kind == 'O', s"Delete expects 'K'|'O', got $kind")
        DeleteMsg(relId, kind, readTuple(buf))
      case 'T' =>
        val n = buf.getInt
        val options = buf.get()
        TruncateMsg(options, (0 until n).map(_ => buf.getInt))
      case 'B' =>
        BeginMsg(buf.getLong, buf.getLong, buf.getInt)
      case 'C' =>
        CommitMsg(buf.get(), buf.getLong, buf.getLong, buf.getLong)
      case other =>
        throw new IllegalArgumentException(s"unknown pgoutput message type '${other.toChar}'")
    }
  }

  private def readCString(buf: ByteBuffer): String = {
    val start = buf.position()
    while (buf.get() != 0) {}
    val len = buf.position() - start - 1
    new String(buf.array(), buf.arrayOffset() + start, len, StandardCharsets.UTF_8)
  }

  private def readTuple(buf: ByteBuffer): PgTuple = {
    val n = buf.getShort.toInt
    PgTuple((0 until n).map { _ =>
      (buf.get(): @unchecked) match {
        case 'n' | 'u' => None
        case 't' =>
          val len = buf.getInt
          val arr = new Array[Byte](len)
          buf.get(arr)
          Some(new String(arr, StandardCharsets.UTF_8))
      }
    })
  }

  // ---------------------------------------------------------------- encode

  /** Encode a message back to pgoutput bytes — the capture/replay side, used
    * by the round-trip specs and the synthetic frame generator. */
  def encode(msg: PgMessage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    def u8(b: Int): Unit = out.write(b)
    def u16(v: Int): Unit = { u8((v >>> 8) & 0xFF); u8(v & 0xFF) }
    def u32(v: Int): Unit = { u16((v >>> 16) & 0xFFFF); u16(v & 0xFFFF) }
    def u64(v: Long): Unit = { u32((v >>> 32).toInt); u32((v & 0xFFFFFFFFL).toInt) }
    def cstr(s: String): Unit = { out.write(s.getBytes(StandardCharsets.UTF_8)); u8(0) }
    def tuple(t: PgTuple): Unit = {
      u16(t.columns.size)
      t.columns.foreach {
        case Some(v) =>
          val b = v.getBytes(StandardCharsets.UTF_8)
          u8('t'); u32(b.length); out.write(b)
        case None => u8('n')
      }
    }
    msg match {
      case RelationMsg(id, ns, name, identity, cols) =>
        u8('R'); u32(id); cstr(ns); cstr(name); u8(identity); u16(cols.size)
        cols.foreach { c => u8(c.flags); cstr(c.name); u32(c.typeOid); u32(c.typeMod) }
      case InsertMsg(id, t) =>
        u8('I'); u32(id); u8('N'); tuple(t)
      case UpdateMsg(id, oldKind, oldTuple, newTuple) =>
        u8('U'); u32(id)
        oldKind.foreach { k => u8(k); tuple(oldTuple.get) }
        u8('N'); tuple(newTuple)
      case DeleteMsg(id, kind, t) =>
        u8('D'); u32(id); u8(kind); tuple(t)
      case TruncateMsg(options, ids) =>
        u8('T'); u32(ids.size); u8(options); ids.foreach(u32)
      case BeginMsg(finalLsn, ts, xid) =>
        u8('B'); u64(finalLsn); u64(ts); u32(xid)
      case CommitMsg(flags, commitLsn, endLsn, ts) =>
        u8('C'); u8(flags); u64(commitLsn); u64(endLsn); u64(ts)
    }
    out.toByteArray
  }

  // ------------------------------------------------- reference handler loop

  /** One decoded frame → the HandleFunc calls it produces — a direct
    * re-expression of the reference's switch (postrack.go:368-411): INSERT
    * (after, nil), UPDATE (after, before — before is an EMPTY map when no old
    * tuple arrived, postrack.go:387-392), DELETE (nil, before), TRUNCATE one
    * event per relation with (nil, nil). Begin/Commit/Relation produce no
    * events (relation registration happens in the registry). */
  def toEvents(registry: RelationRegistry, lsn: Long, bytes: Array[Byte]): Iterator[ChangeEvent] = {
    def row(relId: Int, t: PgTuple): Map[String, String] = {
      val rel = registry.relationAt(relId, lsn).getOrElse(
        throw new IllegalStateException(s"no RelationMessage for relation $relId at lsn $lsn"))
      rel.columns.iterator.zipWithIndex.map { case (c, i) =>
        // reference: string(nil) == "" for null/TOAST columns (postrack.go:381)
        c.name -> t.columns.lift(i).flatten.getOrElse("")
      }.toMap
    }
    def table(relId: Int): String =
      registry.relationAt(relId, lsn).map(_.name).getOrElse(
        throw new IllegalStateException(s"no RelationMessage for relation $relId at lsn $lsn"))
    decode(bytes) match {
      case InsertMsg(id, t) =>
        Iterator.single(ChangeEvent(lsn, table(id), "INSERT", null, row(id, t)))
      case UpdateMsg(id, _, oldT, newT) =>
        Iterator.single(ChangeEvent(lsn, table(id), "UPDATE",
          oldT.map(row(id, _)).getOrElse(Map.empty), row(id, newT)))
      case DeleteMsg(id, _, t) =>
        Iterator.single(ChangeEvent(lsn, table(id), "DELETE", row(id, t), null))
      case TruncateMsg(_, ids) =>
        ids.iterator.map(id => ChangeEvent(lsn, table(id), "TRUNCATE", null, null))
      case _: BeginMsg | _: CommitMsg | _: RelationMsg =>
        Iterator.empty
    }
  }

  // ------------------------------------------------------ distributed decode

  /** Decode a lake of raw pgoutput frames `(lsn: long, data: binary)` into
    * the reference's event stream, distributed.
    *
    * Scale shape: relation messages are O(#tables × #schema-versions) — they
    * are collected once and BROADCAST as a versioned registry, then every
    * data frame decodes partition-locally (`mapPartitions`, zero shuffle).
    * LSN-versioned lookup makes the decode independent of partition order,
    * which is what lets a 100 TB frame lake decode on 1000 executors without
    * replaying the stream serially. */
  def decodeFeed(spark: SparkSession, frames: DataFrame): DataFrame = {
    import spark.implicits._
    val typed = frames.select(col("lsn").cast("long"), col("data")).as[(Long, Array[Byte])]
    // first-byte dispatch is COLUMNAR (substring on the binary column, no
    // typed deserialization), so neither pass decodes rows it won't keep:
    // the relation pass reads frame type bytes, not a deserialized lake
    def firstByteIs(types: Seq[Char]) = substring(col("data"), 1, 1)
      .isin(types.map(c => lit(Array(c.toByte))): _*)
    val rels = typed
      .filter(firstByteIs(Seq('R')))
      .collect() // O(#tables): the only driver-side collect, by design
      .map { case (lsn, b) => (lsn, decode(b).asInstanceOf[RelationMsg]) }
    val bc = spark.sparkContext.broadcast(RelationRegistry.build(rels.toSeq))
    // Begin/Commit and the benign metadata types a real publication emits
    // (Type 'Y', Origin 'O', logical Message 'M') carry no events and are
    // ignored, as in the reference's switch. Everything else — the data
    // types AND any unknown/corrupt type byte (or empty frame) — flows into
    // the decode pass, where an unknown type fails loudly (PgOutput.decode),
    // matching the streaming route()'s posture instead of silently dropping
    // frames.
    // coalesce: a NULL data cell makes the predicate NULL, which a bare
    // Filter would silently DROP — route it into decode instead, where the
    // null/empty guard produces the loud failure this pipeline promises
    typed
      .filter(coalesce(!firstByteIs(Seq('R', 'B', 'C', 'Y', 'O', 'M')), lit(true)))
      .mapPartitions(it => it.flatMap { case (lsn, b) => toEvents(bc.value, lsn, b) })
      .toDF()
  }

  /** Decoded frames → the canonical change-feed columns (ChangeFeed schema):
    * typed pk/ts_us/value/props lifted out of the reference's string maps,
    * taking the after-image when present, else the before-image (DELETE). */
  def toCanonicalFeed(decoded: DataFrame): DataFrame = {
    def field(name: String) =
      coalesce(col("after").getItem(name), col("before").getItem(name))
    decoded.select(
      col("lsn"), col("table_name"), col("op"),
      field("pk").cast("long").as("pk"),
      field("ts_us").cast("long").as("ts_us"),
      field("value").cast("double").as("value"),
      field("props").as("props"))
  }

  // -------------------------------------------------------------- synthesis

  /** Column order of the synthetic feed's tuples — ONE definition shared
    * by the Relation frames and the data-tuple encoder below (and by the
    * loopback capture gate's served Relation frames): a drifting copy
    * would silently map tuple positions to the wrong column names in the
    * registry decode. */
  val feedColumns: Seq[String] = Seq("pk", "ts_us", "value", "props")

  /** The RelationMessage for one routed feed table (text-typed columns in
    * [[feedColumns]] order). */
  def feedRelation(id: Int, name: String): RelationMsg =
    RelationMsg(id, "public", name, 'd'.toByte,
      feedColumns.map(c => PgColumn(0, c, 25 /* text */, -1)))

  /** The driver `events` table rendered as a raw pgoutput frame lake — the
    * synthetic capture side (no live Postgres in the sandbox): one Relation
    * frame per routed table, then one Insert/Update/Delete frame per event,
    * encoded partition-locally. Routing matches ChangeFeed.fromEvents so the
    * decoded stream and the logical feed are the same data. */
  def framesFromEvents(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val relFrames = Seq(
      (ChangeFeed.relationLsn(0), PgOutput.encode(feedRelation(ChangeFeed.usersRelId, "users"))),
      (ChangeFeed.relationLsn(1), PgOutput.encode(feedRelation(ChangeFeed.accountsRelId, "accounts"))))
    val ev = events.select(
        col("event_id"), col("user_id"), col("event_type"),
        graft.sources.Tables.tsMicros(events).as("ts_us"), col("value"), col("props"))
      .as[(Long, Long, String, Long, Double, String)]
    val dataFrames = ev.mapPartitions { it =>
      it.map { case (eid, uid, etype, tsUs, value, props) =>
        val relId = if (uid % 2 == 0) ChangeFeed.usersRelId else ChangeFeed.accountsRelId
        val tuple = PgTuple(Seq(
          Some(uid.toString), Some(tsUs.toString), Some(value.toString), Some(props)))
        val msg: PgMessage = etype match {
          case "signup" => InsertMsg(relId, tuple)
          case "error" => DeleteMsg(relId, 'O'.toByte, tuple)
          case _ => UpdateMsg(relId, None, None, tuple) // REPLICA IDENTITY DEFAULT: no old tuple
        }
        (eid, PgOutput.encode(msg))
      }
    }
    spark.createDataset(relFrames).union(dataFrames).toDF("lsn", "data")
  }
}
