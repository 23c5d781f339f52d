package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.{Apply, ChangeFeed, Publication}
import graft.sources.Tables

/** CDC operator inventory (SURVEY.md §2, first block): the reference's
  * publication/slot/change-stream surface re-expressed as Spark plans over
  * the canonical change feed, each with a byte-matching DuckDB oracle.
  */
object CdcQueries {

  private def feed(s: SparkSession, dir: String): DataFrame =
    ChangeFeed.fromEvents(Tables(s, dir, "events"))

  private val cte = ChangeFeed.oracleCte

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_event_mask" -> ((s, dir) =>
      Publication("users", eventMask = Set("INSERT", "DELETE"))(feed(s, dir))
        .select("lsn", "op", "pk", "value")
        .orderBy("lsn")),

    "cdc_selector" -> ((s, dir) =>
      Publication("users", selector = Seq("value"))(feed(s, dir))
        .orderBy("lsn")),

    "cdc_condition" -> ((s, dir) =>
      Publication("users", condition = Some(col("value") > 150 && col("op") === "UPDATE"))(feed(s, dir))
        .select("lsn", "pk", "value")
        .orderBy("lsn")),

    "cdc_latest_snapshot" -> ((s, dir) =>
      Apply.latestSnapshot(feed(s, dir)).orderBy("pk")),

    "cdc_upsert_apply" -> ((s, dir) =>
      Apply.upsert(Tables(s, dir, "customer"), feed(s, dir), "c_custkey", "c_acctbal")
        .orderBy("pk")),

    "cdc_scd2_history" -> ((s, dir) =>
      Apply.scd2(feed(s, dir)).orderBy("pk", "lsn")),

    "cdc_before_after" -> ((s, dir) =>
      Apply.beforeAfter(feed(s, dir)).orderBy("pk", "lsn")),

    "cdc_resume_lsn" -> ((s, dir) =>
      Apply.latestSnapshot(Apply.resumeFrom(feed(s, dir), 500L)).orderBy("pk")),

    "cdc_changelog_stats" -> ((s, dir) =>
      Apply.changelogStats(feed(s, dir)).orderBy("table_name", "op")),

    // The reference's exact HandleFunc shape: map-typed before/after images
    // (nil rules per op, postrack.go:372-407). Rows-only: DuckDB's MAP
    // comparison semantics don't round-trip through the parquet gate.
    "cdc_images" -> ((s, dir) =>
      ChangeFeed.withImages(feed(s, dir))
        .select(col("lsn"), col("op"), col("pk"),
          col("before").getItem("value").as("before_value"),
          col("after").getItem("value").as("after_value"),
          col("before").isNull.as("before_nil"),
          col("after").isNull.as("after_nil"))
        .orderBy("lsn")))

  val oracles: Map[String, String] = Map(
    "cdc_event_mask" ->
      s"""$cte
         |SELECT lsn, op, pk, value FROM feed
         |WHERE op IN ('DELETE', 'INSERT') ORDER BY lsn""".stripMargin,

    "cdc_selector" ->
      s"""$cte
         |SELECT lsn, table_name, op, pk, value FROM feed ORDER BY lsn""".stripMargin,

    "cdc_condition" ->
      s"""$cte
         |SELECT lsn, pk, value FROM feed
         |WHERE value > 150 AND op = 'UPDATE' ORDER BY lsn""".stripMargin,

    "cdc_latest_snapshot" ->
      s"""$cte
         |SELECT pk, lsn, op, value, props FROM (
         |  SELECT *, row_number() OVER (PARTITION BY pk ORDER BY lsn DESC) AS rn
         |  FROM feed)
         |WHERE rn = 1 AND op <> 'DELETE' ORDER BY pk""".stripMargin,

    "cdc_upsert_apply" ->
      s"""$cte,
         |latest AS (
         |  SELECT pk, op AS last_op, value AS new_value FROM (
         |    SELECT pk, op, value,
         |           row_number() OVER (PARTITION BY pk ORDER BY lsn DESC) AS rn
         |    FROM feed)
         |  WHERE rn = 1)
         |SELECT COALESCE(b.c_custkey, l.pk) AS pk,
         |       COALESCE(l.new_value, b.c_acctbal) AS value,
         |       CASE WHEN l.pk IS NULL THEN 'UNCHANGED' ELSE l.last_op END AS provenance
         |FROM customer b FULL OUTER JOIN latest l ON b.c_custkey = l.pk
         |WHERE l.last_op IS NULL OR l.last_op <> 'DELETE'
         |ORDER BY pk""".stripMargin,

    "cdc_scd2_history" ->
      s"""$cte
         |SELECT pk, lsn, op, value,
         |       ts_us AS valid_from_us,
         |       lead(ts_us) OVER (PARTITION BY pk ORDER BY lsn) AS valid_to_us,
         |       (lead(lsn) OVER (PARTITION BY pk ORDER BY lsn) IS NULL) AS is_current
         |FROM feed ORDER BY pk, lsn""".stripMargin,

    "cdc_before_after" ->
      s"""$cte
         |SELECT pk, lsn, before_value, after_value FROM (
         |  SELECT pk, lsn, op,
         |         lag(value) OVER (PARTITION BY pk ORDER BY lsn) AS before_value,
         |         value AS after_value
         |  FROM feed)
         |WHERE op = 'UPDATE' AND before_value IS NOT NULL
         |ORDER BY pk, lsn""".stripMargin,

    "cdc_resume_lsn" ->
      s"""$cte
         |SELECT pk, lsn, op, value, props FROM (
         |  SELECT *, row_number() OVER (PARTITION BY pk ORDER BY lsn DESC) AS rn
         |  FROM feed WHERE lsn > 500)
         |WHERE rn = 1 AND op <> 'DELETE' ORDER BY pk""".stripMargin,

    "cdc_changelog_stats" ->
      s"""$cte
         |SELECT table_name, op, count(*) AS n_events, max(lsn) AS watermark_lsn,
         |       round(sum(value), 4) AS sum_value
         |FROM feed GROUP BY table_name, op ORDER BY table_name, op""".stripMargin)
}
