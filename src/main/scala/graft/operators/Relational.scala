package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators Spark lacks as single calls, composed from built-ins
  * so Catalyst keeps optimizing them (no UDFs, no mapPartitions).
  */
object Relational {

  /** As-of join via the union+window trick: tag both sides, union by name,
    * and for each left row carry forward the latest right-side values
    * at-or-before it per key.
    *
    * Scale: ONE shuffle on the key — unlike a generic non-equi range join,
    * nothing explodes; this is the sort-merge as-of plan expressed
    * declaratively, and the window is codegen'd.
    *
    * @param key       equi-key column present on both sides
    * @param leftTs    left ordering column (monotone, e.g. epoch micros)
    * @param rightTs   right ordering column, same unit
    * @param tieBreak  unique id column present on both sides (total order)
    * @param rightVals (rightCol, outputName) values carried from the right
    */
  def asofJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, tieBreak: String,
      rightVals: Seq[(String, String)]): DataFrame = {
    val l = left.withColumn("__t", col(leftTs)).withColumn("__side", lit(1))
    val r = right.select(
      Seq(col(key), col(tieBreak), col(rightTs).as("__t"), lit(0).as("__side")) ++
        rightVals.map { case (c, as) => col(c).as(s"__r_$as") }: _*)
    // right rows sort before left rows at equal timestamps → "at-or-before"
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__side"), col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = rightVals.map { case (_, as) =>
      last(col(s"__r_$as"), ignoreNulls = true).over(w).as(as)
    }
    l.unionByName(r, allowMissingColumns = true)
      .select(col("*") +: carried: _*)
      .filter(col("__side") === 1)
      .drop((Seq("__t", "__side") ++ rightVals.map { case (_, as) => s"__r_$as" }): _*)
  }

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same key exceeds `gap` (same unit as `ts`).
    * Both windows share one (key)-partitioning → a single shuffle. */
  def sessionize(df: DataFrame, key: String, ts: String, tieBreak: String, gap: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts), col(tieBreak))
    df.withColumn("__prev", lag(col(ts), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col(ts) - col("__prev") > gap, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__prev", "__new")
  }

  /** Top-k rows per group with a fully deterministic ordering (caller must
    * include a unique tie-break in `order`). Window form: shuffles and
    * sorts EVERY row of the group — fine when the input is already small
    * or the ordering is arbitrary-typed; for large scored candidate sets
    * prefer `topKByScore`. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], order: Seq[Column], k: Int): DataFrame =
    df.withColumn("rk", row_number().over(
        Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)))
      .filter(col("rk") <= k)

  /** Top-k by (score DESC, id ASC) per group via the bounded-heap TopKAgg
    * aggregate: map-side partial aggregation reduces every partition to
    * ≤ k rows per group BEFORE the shuffle, so the exchange carries
    * O(groups × k) rows instead of every scored candidate — the form that
    * survives a 100 TB candidate set. Emits (group, rk, idCol, scoreCol),
    * byte-identical to the window form with order (score desc, id). */
  def topKByScore(df: DataFrame, groupCol: String,
      scoreCol: String, idCol: String, k: Int): DataFrame =
    df.groupBy(groupCol)
      .agg(graft.plans.TopKAgg.topk(df.sparkSession,
        struct(col(scoreCol), col(idCol).cast("long")), k).as("top"))
      .select(col(groupCol), posexplode(col("top")).as(Seq("rk0", "item")))
      .select(col(groupCol), (col("rk0") + 1).cast("long").as("rk"),
        col("item.id").as(idCol), col("item.score").as(scoreCol))

  /** Salted equi-join for skewed keys: the skewed (left) side gets a
    * deterministic salt derived from a unique column, the right side is
    * replicated saltFactor× with every salt value, and the join key becomes
    * (key, salt) — so one hot key fans out over saltFactor reducers instead
    * of melting a single one. Result is row-identical to the unsalted join.
    *
    * AQE's skew-join handles moderate skew at runtime; explicit salting is
    * for the pathological keys (null bursts, default ids) known in advance.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftUnique: String, saltFactor: Int): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(xxhash64(col(leftUnique)), lit(saltFactor)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Measured hot keys for [[skewJoin]]: per-key counts (map-side combined)
    * into ONE global bounded-heap aggregate — the q_key_skew mechanic as an
    * operator — keeping only keys whose fan-in is ≥ `minMultiple`× the
    * mean. Driver-side result is ≤ k longs (bounded collect, same class as
    * the IVF centroid pull). In production this is measured once per load
    * and stored next to the table stats, not re-derived per query. */
  def hotKeys(df: DataFrame, key: String, k: Int = 8,
      minMultiple: Double = 1.0): Seq[Long] = {
    val row = df.groupBy(key).agg(count(lit(1)).as("cnt"))
      .agg(
        graft.plans.TopKAgg.topk(df.sparkSession,
          struct(col("cnt").cast("double").as("score"), col(key).as("id")), k)
          .as("top"),
        sum("cnt").as("n_rows"), count(lit(1)).as("n_keys"))
      .collect().head
    val mean = row.getLong(1).toDouble / math.max(row.getLong(2), 1L)
    row.getSeq[org.apache.spark.sql.Row](0)
      .filter(_.getDouble(0) >= minMultiple * mean)
      .map(_.getLong(1))
  }

  /** Two-path skew join — the production refinement of [[saltedJoin]]:
    * only the MEASURED hot keys pay the saltFactor× right-side
    * replication; every other key takes the plain equi-join. The union is
    * row-identical to the unsalted join (keys partition disjointly into
    * hot/cold, each path is row-identical on its slice, and null keys
    * match nothing under an inner equi-join on either path), while the
    * replicated volume drops from |right| × saltFactor to
    * |right ⋂ hot| × saltFactor — O(|hot| × saltFactor) rows for an
    * equi-unique right side, independent of corpus size.
    *
    * `hotKeySet` empty (measurement found no skew) degenerates to exactly
    * the plain join — no salt machinery in the plan at all. */
  def skewJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftUnique: String, saltFactor: Int,
      hotKeySet: Seq[Long]): DataFrame = {
    if (hotKeySet.isEmpty) left.join(right, Seq(key))
    else {
      val hot = col(key).isin(hotKeySet: _*)
      saltedJoin(left.filter(hot), right.filter(hot), key, leftUnique, saltFactor)
        .unionByName(left.filter(!hot).join(right.filter(!hot), Seq(key)))
    }
  }

  /** Time-weighted average per key — mean of a 2-decimal `valueCol` over
    * TIME rather than over change events: each value holds until the key's
    * next event (per-key lead window, `tieCol` breaks timestamp ties), so
    * its weight is the interval length; the last event carries no
    * interval. Cents-scaled exact integer sums with ONE final division, so
    * the result replays bit-identically in an oracle. Keys whose intervals
    * sum to zero (all events simultaneous) are dropped rather than
    * dividing by zero. */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol, tieCol)
    df.select(col(keyCol), col(tieCol), col(tsCol),
        round(col(valueCol) * 100).cast("long").as("__cents"))
      .withColumn("__next_ts", lead(col(tsCol), 1).over(w))
      .filter(col("__next_ts").isNotNull)
      .withColumn("__dur", col("__next_ts") - col(tsCol))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("__cents") * col("__dur")).as("__wsum"),
        sum(col("__dur")).as("__tsum"))
      .filter(col("__tsum") > 0)
      .select(col(keyCol), col("n_intervals"),
        round(col("__wsum").cast("double") / (col("__tsum") * 100).cast("double"), 4)
          .as("twa_value"))
  }

  /** Boundary sweep-line over closed intervals: each [st, en] row becomes
    * a +1/−1 `delta` boundary, and the GLOBAL running sum of deltas in
    * (ts, delta DESC, tie...) order is the open-interval count at each
    * boundary (`cur`). Starts sort before ends at the same instant, so
    * touching intervals overlap and zero-length intervals still count.
    *
    * Two scale traps dodged at once: the O(n²) "count intervals covering
    * each instant" self-join, and the single-reducer global ordered window
    * (`Window.orderBy` with no partition funnels every boundary through
    * one task) — the running sum is the two-level distributed PrefixSum.
    * `tieCols` must make the ordering unique (range-boundary contract);
    * rows with equal (ts, delta) are interchangeable under any tie order,
    * so the prefix-value multiset — and anything aggregated from it — is
    * deterministic. */
  def concurrency(iv: DataFrame, stCol: String, enCol: String,
      tieCols: Seq[String]): DataFrame = {
    val keep = tieCols.map(col)
    val bounds = iv.select(keep :+ col(stCol).as("ts") :+ lit(1).as("delta"): _*)
      .unionByName(
        iv.select(keep :+ col(enCol).as("ts") :+ lit(-1).as("delta"): _*))
    PrefixSum.cumSum(bounds.withColumn("__g", lit(1)), "__g",
        col("ts") +: col("delta").desc +: keep, "delta", "cur")
      .drop("__g")
  }
}
