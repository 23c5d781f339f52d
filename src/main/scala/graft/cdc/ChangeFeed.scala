package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Canonical change-feed schema, mirroring the tuple the reference hands to
  * `HandleFunc(lsn, table, event, newValues, oldValues)` (postrack.go:35,
  * postrack.go:372-407):
  *
  *   lsn: Long         — monotone offset (reference: pglogrepl.LSN)
  *   table_name: String
  *   op: String        — INSERT | UPDATE | DELETE (| TRUNCATE)
  *   pk: Long          — replica-identity key
  *   ts_us: Long       — commit time, microseconds since epoch
  *   value, props      — the row image payload
  *
  * The driver's `events` table is the change-stream analog: event_id is the
  * LSN ordinal, user_id the key, and event_type maps deterministically onto
  * the reference's event enum (postrack.go:38-42): signup→INSERT,
  * error→DELETE, click/view/purchase→UPDATE.
  */
object ChangeFeed {

  /** Relation OIDs + relation-frame LSNs for the synthetic pgoutput capture
    * side (PgOutput.framesFromEvents). Relation frames sort before every
    * event frame (driver event_ids start at 1), mirroring a WAL stream where
    * RelationMessages precede the data messages that reference them. */
  val usersRelId = 1001
  val accountsRelId = 1002
  def relationLsn(i: Int): Long = -2L + i

  /** events.parquet (with ts read as nanosecond longs) → canonical feed.
    * Routed across TWO tables (the reference tracks any number of tables per
    * slot via RelationMessage, postrack.go:369-376): even keys → users, odd
    * keys → accounts. Must stay in lockstep with `oracleCte` and
    * `PgOutput.framesFromEvents`. */
  def fromEvents(events: DataFrame): DataFrame =
    events.select(
      col("event_id").as("lsn"),
      when(pmod(col("user_id"), lit(2)) === 0, "users")
        .otherwise("accounts").as("table_name"),
      when(col("event_type") === "signup", "INSERT")
        .when(col("event_type") === "error", "DELETE")
        .otherwise("UPDATE").as("op"),
      col("user_id").as("pk"),
      graft.sources.Tables.tsMicros(events).as("ts_us"),
      col("value"),
      col("props"))

  /** The feed with the reference's exact image shape: map-typed before/after
    * row images per op (postrack.go:372-407) — INSERT carries only `after`,
    * DELETE only `before`, UPDATE both (before = previous image per key).
    * Null maps where the reference passes nil. */
  def withImages(feed: DataFrame): DataFrame = {
    // key identity is (table, pk) — pk alone would pair images across
    // tables; TRUNCATE markers carry no row images (reference:
    // TruncateMessage) and must not enter the lag chain either
    val byKeyAsc = org.apache.spark.sql.expressions.Window
      .partitionBy("table_name", "pk").orderBy("lsn")
    val image = map(
      lit("value"), col("value").cast("string"),
      lit("props"), col("props"))
    val outCols = Seq("lsn", "table_name", "op", "pk", "ts_us", "before", "after")
    val rows = feed.filter(col("op") =!= "TRUNCATE")
      .withColumn("__img", image)
      .withColumn("__prev", lag(col("__img"), 1).over(byKeyAsc))
      .select(
        col("lsn"), col("table_name"), col("op"), col("pk"), col("ts_us"),
        when(col("op") === "DELETE", col("__prev"))
          .when(col("op") === "UPDATE", col("__prev"))
          .otherwise(lit(null)).as("before"),
        when(col("op") =!= "DELETE", col("__img"))
          .otherwise(lit(null)).as("after"))
    val markers = feed.filter(col("op") === "TRUNCATE")
      .select(col("lsn"), col("table_name"), col("op"), col("pk"), col("ts_us"),
        lit(null).cast(rows.schema("before").dataType).as("before"),
        lit(null).cast(rows.schema("after").dataType).as("after"))
    rows.select(outCols.map(col): _*).unionByName(markers)
  }

  /** DuckDB CTE producing the identical feed, for oracle SQL reuse. */
  val oracleCte: String =
    """WITH feed AS (
      |  SELECT event_id AS lsn,
      |         CASE WHEN user_id % 2 = 0 THEN 'users' ELSE 'accounts' END AS table_name,
      |         CASE WHEN event_type = 'signup' THEN 'INSERT'
      |              WHEN event_type = 'error' THEN 'DELETE'
      |              ELSE 'UPDATE' END AS op,
      |         user_id AS pk, epoch_us(ts) AS ts_us, value, props
      |  FROM events)""".stripMargin
}

/** A publication = table + column selector + row condition + event mask —
  * the reference's `Table`/`WithSelector`/`WithCondition` plus the
  * `publish='INSERT,UPDATE,...'` event list (postrack.go:27-61, 203-209).
  *
  * Spark-first: all three become plain projections/filters declared before
  * any other logic, so Catalyst pushes them into the parquet scan
  * (PushedFilters / ReadSchema) — the same "filter at the source" effect the
  * reference gets from Postgres evaluating the publication predicate.
  */
final case class Publication(
    tableName: String,
    selector: Seq[String] = Nil,
    condition: Option[Column] = None,
    eventMask: Set[String] = Set("INSERT", "UPDATE", "DELETE", "TRUNCATE"),
    /** The reference's WithOverride idempotency flag (postrack.go:57-61,
      * 213-227): when set, (re-)registering this publication over an
      * existing one for the same table KEEPS the existing definition; when
      * unset, the existing definition is dropped and replaced. Consumed by
      * PublicationCatalog.set. */
    overrideExisting: Boolean = false) {

  def apply(feed: DataFrame): DataFrame = {
    var df = feed.filter(col("table_name") === tableName)
    // always applied: a size heuristic would silently skip 4+-element masks
    // that still exclude an op; the predicate pushes to the scan anyway
    df = df.filter(col("op").isin(eventMask.toSeq.sorted: _*))
    condition.foreach(c => df = df.filter(c))
    if (selector.nonEmpty) {
      val keep = (Seq("lsn", "table_name", "op", "pk") ++ selector).distinct
      df = df.select(keep.map(col): _*)
    }
    df
  }
}
