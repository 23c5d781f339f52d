package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch operators that consume the canonical change feed — the computations
  * a postrack `HandleFunc` consumer typically performs, expressed as single-
  * shuffle Spark plans.
  *
  * Scale notes (100 TB): every operator below shuffles exactly once, on `pk`
  * (or on the grouping key), and all window specs share that partitioning so
  * Catalyst reuses the exchange across steps. No collect(), no UDFs.
  */
object Apply {

  // key identity on a multi-table slot is (table, pk) — pk alone would pair
  // events across tables (the reference feeds any number of tables per slot,
  // postrack.go:369-376); same partitioning as ChangeFeed.withImages
  private val byKey = Window.partitionBy("table_name", "pk")
  private val byKeyAsc = byKey.orderBy(col("lsn"))
  private val byKeyDesc = byKey.orderBy(col("lsn").desc)

  /** Current state per key: highest-LSN event wins; a key whose last event is
    * DELETE has no current row (tombstone). One shuffle on (table, pk). */
  def latestSnapshot(feed: DataFrame): DataFrame =
    feed
      .withColumn("rn", row_number().over(byKeyDesc))
      .filter(col("rn") === 1 && col("op") =!= "DELETE")
      .select("table_name", "pk", "lsn", "op", "value", "props")

  /** Apply one table's changes onto a base table: update matched keys,
    * insert new keys, drop tombstoned keys. Base side stays untouched for
    * keys with no changes. Full outer join on the key — the merge/upsert a
    * consumer runs against its materialized copy. The `table` argument
    * scopes the feed INSIDE the operator: a base table maps to exactly one
    * feed table, and scoping here (rather than trusting the caller to
    * pre-filter) means a multi-table feed can never silently join the base
    * row against two tables' rn=1 rows and emit duplicate keys. */
  def upsert(base: DataFrame, feed: DataFrame, table: String,
      baseKey: String, baseValue: String): DataFrame = {
    val latest = feed
      .filter(col("table_name") === table)
      .withColumn("rn", row_number().over(byKeyDesc))
      .filter(col("rn") === 1)
      .select(col("pk"), col("op").as("last_op"), col("value").as("new_value"))
    base.select(col(baseKey).cast("long").as("k"), col(baseValue).as("base_value"))
      .join(latest, col("k") === col("pk"), "full_outer")
      .filter(col("last_op").isNull || col("last_op") =!= "DELETE")
      .select(
        coalesce(col("k"), col("pk")).as("pk"),
        coalesce(col("new_value"), col("base_value")).as("value"),
        when(col("last_op").isNull, "UNCHANGED").otherwise(col("last_op")).as("provenance"))
  }

  /** SCD-2 history: each change opens a validity interval closed by the next
    * change to the same key. valid_to is null on the current row. */
  def scd2(feed: DataFrame): DataFrame =
    feed.select(
      col("table_name"), col("pk"), col("lsn"), col("op"), col("value"),
      col("ts_us").as("valid_from_us"),
      lead(col("ts_us"), 1).over(byKeyAsc).as("valid_to_us"),
      (lead(col("lsn"), 1).over(byKeyAsc).isNull).as("is_current"))

  /** Before/after image pairing for UPDATEs: the reference's UpdateMessage
    * carries OldTuple+NewTuple (postrack.go:381-394); when the upstream only
    * sends new images, the consumer reconstructs the before-image as the
    * previous value per key. */
  def beforeAfter(feed: DataFrame): DataFrame =
    feed
      .withColumn("before_value", lag(col("value"), 1).over(byKeyAsc))
      .filter(col("op") === "UPDATE" && col("before_value").isNotNull)
      .select(col("table_name"), col("pk"), col("lsn"),
        col("before_value"), col("value").as("after_value"))

  /** Offset-based resume: strictly-after semantics, matching the reference's
    * StartReplication(lsn+1) (postrack.go:285-309). */
  def resumeFrom(feed: DataFrame, lsn: Long): DataFrame =
    feed.filter(col("lsn") > lsn)

  /** TRUNCATE semantics (reference: TruncateMessage, postrack.go:408-411):
    * a TRUNCATE at LSN T wipes everything earlier on that table. Returns the
    * feed with pre-truncate events AND the consumed TRUNCATE markers removed
    * (a marker is not a row event — leaving it in would surface phantom keys
    * downstream), so any apply operator composes directly.
    *
    * Scale shape: the cutoff per table is an O(tables)-row aggregate
    * broadcast back onto the feed — the decorrelated-scalar-subquery form.
    * A `Window.partitionBy(table_name)` here would funnel each table's
    * ENTIRE history through one reducer (O(tables) partitions on a 100 TB
    * feed); the groupBy pre-aggregates map-side, and the broadcast join
    * adds no exchange on the feed at all. */
  def applyTruncates(feed: DataFrame): DataFrame = {
    val cutoffs = feed
      .filter(col("op") === "TRUNCATE")
      .groupBy("table_name")
      .agg(max(col("lsn")).as("__trunc_lsn"))
    feed
      .join(broadcast(cutoffs), Seq("table_name"), "left_outer")
      .filter((col("__trunc_lsn").isNull || col("lsn") >= col("__trunc_lsn")) &&
        col("op") =!= "TRUNCATE")
      .drop("__trunc_lsn")
  }

  /** Per-table/op monitoring counters + LSN high-watermark — what keepAlive
    * acks upstream (postrack.go:98-109). */
  def changelogStats(feed: DataFrame): DataFrame =
    feed.groupBy("table_name", "op").agg(
      count(lit(1)).as("n_events"),
      max(col("lsn")).as("watermark_lsn"),
      round(sum(col("value")), 4).as("sum_value"))

  /** Point-in-time (time-travel) state: [[latestSnapshot]] as of WAL
    * position `lsn` — the table a consumer that stopped acking at `lsn`
    * would have materialized. The LSN filter sits under the per-key window,
    * so it pushes into the scan and the shuffle carries only the prefix. */
  def asOf(feed: DataFrame, lsn: Long): DataFrame =
    latestSnapshot(feed.filter(col("lsn") <= lsn))

  /** BITEMPORAL point read — both time axes at once: the state a consumer
    * holding WAL ≤ `lsn` (transaction time — what was KNOWN) would
    * reconstruct FOR effective/valid time `tsUs` (what was TRUE): per key,
    * the latest change with valid timestamp ≤ tsUs among those with
    * LSN ≤ lsn, ordered (ts_us, lsn) lexicographically so a late-arriving
    * correction (higher LSN, same valid instant) wins; a DELETE there means
    * absent. [[asOf]] is the lsn-axis-only projection of this. Both filters
    * sit under the per-key window, so they push into the scan and the one
    * (table, pk) shuffle carries only the doubly-bounded prefix. */
  def bitemporal(feed: DataFrame, lsn: Long, tsUs: Column): DataFrame = {
    val w = byKey.orderBy(col("ts_us").desc, col("lsn").desc)
    feed.filter(col("lsn") <= lsn && col("ts_us") <= tsUs)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "DELETE")
      .select("table_name", "pk", "lsn", "ts_us", "op", "value")
  }

  /** State diff between two WAL positions: per key, its `lsnA`-state vs
    * `lsnB`-state, classified ADDED / REMOVED / MODIFIED (keys whose state
    * is identical at both positions are absent — a diff, not a join dump).
    * MODIFIED compares the WHOLE row state (`value` AND `props`) — a
    * props-only change is a change; classifying by value alone would
    * silently drop it.
    *
    * Scale shape: ONE groupBy(table, pk) computes both states via
    * conditional max_by (null ordering keys are skipped, so the `lsn ≤ A`
    * branch simply ignores later events) — map-side partials, a single
    * shuffle, no window, no self-join of two snapshots. A tombstoned state
    * (last op DELETE) counts as absent, matching [[latestSnapshot]]. */
  def snapshotDiff(feed: DataFrame, lsnA: Long, lsnB: Long): DataFrame = {
    require(lsnA < lsnB, s"diff wants lsnA < lsnB, got $lsnA >= $lsnB")
    def state(bound: Long) = max_by(
      struct(col("op"), col("value"), col("props")),
      when(col("lsn") <= bound, col("lsn")))
    def live(s: Column) = s.isNotNull && s.getField("op") =!= "DELETE"
    feed.groupBy("table_name", "pk")
      .agg(state(lsnA).as("sa"), state(lsnB).as("sb"))
      .select(col("table_name"), col("pk"),
        when(live(col("sa")), lit(true)).otherwise(lit(false)).as("live_a"),
        when(live(col("sb")), lit(true)).otherwise(lit(false)).as("live_b"),
        when(live(col("sa")), col("sa").getField("value")).as("value_a"),
        when(live(col("sa")), col("sa").getField("props")).as("props_a"),
        when(live(col("sb")), col("sb").getField("value")).as("value_b"),
        when(live(col("sb")), col("sb").getField("props")).as("props_b"))
      .withColumn("change",
        when(!col("live_a") && col("live_b"), "ADDED")
          .when(col("live_a") && !col("live_b"), "REMOVED")
          .when(col("live_a") && col("live_b") &&
            (!(col("value_a") <=> col("value_b")) ||
             !(col("props_a") <=> col("props_b"))), "MODIFIED"))
      .filter(col("change").isNotNull)
      .select("table_name", "pk", "value_a", "props_a",
        "value_b", "props_b", "change")
  }
}
