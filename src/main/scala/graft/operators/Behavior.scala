package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-behavior analytics over an event log: N-stage strict-order
  * conversion funnels and epoch-week cohort retention. Library operators
  * (df-in/df-out) — `BehaviorQueries` wires them to the driver tables.
  *
  * Scale shape: every stage is a linear shuffle keyed on the user column;
  * per-stage user tables are one row per converted user (monotonically
  * shrinking) and are lineage-cut, since each feeds both its own count row
  * and the next stage's join (audited: without the cut Spark re-derives
  * the full upstream subtree per reference).
  */
object Behavior {

  /** Strict-order funnel: a user reaches stage i+1 only via an event of
    * that stage's type STRICTLY AFTER their stage-i timestamp (first
    * qualifying event wins). With `maxGapUs` set, the qualifying event
    * must ALSO land within that window of the previous stage — the
    * time-bounded ("conversion within N days") form: a user whose
    * earliest in-order event falls outside the window does not convert,
    * full stop (no re-anchoring — the strict product-analytics reading).
    * Returns one row per stage: `stage` (1-based "i_name"), `n_users`,
    * and `sum_delta_us` — the exact integer sum of stage-transition
    * times (null for the first stage).
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String],
      maxGapUs: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(maxGapUs.forall(_ > 0L), "maxGapUs must be positive when set")
    val e = events.select(col(userCol).as("u"), col(typeCol).as("t"),
      col(tsCol).as("ts"))
    val first = Checkpointing.cut(
      e.filter(col("t") === stages.head)
        .groupBy("u").agg(min("ts").as("cur_ts")))
    // fold the remaining stages: each joins the previous stage's
    // (user, cur_ts) table and keeps the first strictly-later event
    // (within the window, when bounded)
    val stageTables = stages.tail.foldLeft(Vector(first)) { (acc, st) =>
      acc :+ Checkpointing.cut(
        e.filter(col("t") === st)
          .join(acc.last.select(col("u"), col("cur_ts").as("prev_ts")), "u")
          .filter(col("ts") > col("prev_ts") &&
            maxGapUs.map(g => col("ts") <= col("prev_ts") + lit(g))
              .getOrElse(lit(true)))
          .groupBy("u")
          .agg(min("ts").as("cur_ts"), max("prev_ts").as("prev_ts")))
    }
    stageTables.zipWithIndex.map { case (tbl, i) =>
      val delta =
        if (i == 0) lit(null).cast("long")
        else sum(col("cur_ts") - col("prev_ts"))
      tbl.agg(count(lit(1)).as("n_users"), delta.as("sum_delta_us"))
        .select(lit(i + 1).as("stage_idx"),
          lit(s"${i + 1}_${stages(i)}").as("stage"),
          col("n_users"), col("sum_delta_us"))
    }.reduce(_ union _)
      // order on the NUMERIC stage index carried as its own column — a
      // lexicographic sort of the label would file stage 10 between 1 and
      // 2 in a ≥10-stage funnel, and re-parsing the index out of the label
      // would break on any future label scheme
      .orderBy("stage_idx")
      .select("stage", "n_users", "sum_delta_us")
  }

  /** Cohort retention: cohort = epoch-week (integer `div` — no calendar
    * dialect) of the user's first `cohortType` event; activity = distinct
    * (user, week) pairs at or after the cohort week. Returns
    * (cohort_wk, week_offset, n_active). */
  def retention(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, cohortType: String, bucketUs: Long): DataFrame = {
    val e = events.select(col(userCol).as("u"), col(typeCol).as("t"),
      col(tsCol).as("ts"))
    val cohorts = e.filter(col("t") === cohortType)
      .groupBy("u").agg(expr(s"min(ts) div $bucketUs").as("cohort_wk"))
    val act = e.select(col("u"), expr(s"ts div $bucketUs").as("wk")).distinct()
    act.join(cohorts, "u")
      .filter(col("wk") >= col("cohort_wk"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort_wk", "week_offset")
  }
}
