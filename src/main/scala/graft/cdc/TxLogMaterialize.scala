package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.TxLog

/** CDC → ACID-table continuous MERGE sink — the capstone that composes
  * the change feed's exactly-once landing (TxLog.commitBatch's
  * version-per-batch rule) with the upsert/tombstone apply
  * (Apply.latestSnapshot semantics): each micro-batch of changes is
  * MERGED into a TxLog table so the table's head is always the feed's
  * latest snapshot — the end-state the reference's HandleFunc consumer
  * exists to maintain (postrack.go:96-117 hands each decoded change to a
  * callback precisely so the callback can keep a materialized copy
  * current), here landing in a transactional table with time travel per
  * batch instead of an opaque application store.
  *
  * MERGE shape (the Delta copy-on-write idea, bucket-granular):
  *  - state rows are hash-bucketed by key (`pmod(xxhash64(table, pk), B)`)
  *    into one data dir per bucket (`m<version>/__bucket=<b>`), so a batch
  *    rewrites ONLY the buckets its keys touch — cost O(touched state +
  *    batch), never O(table). Untouched buckets' dirs carry forward
  *    unreferenced-by-name (no copy, no rewrite) exactly like Delta files
  *    a MERGE doesn't touch.
  *  - per key the highest-LSN change wins (max_by over the union of old
  *    state and batch — ORDER-FREE: replays and out-of-order chunks
  *    resolve by LSN, the Apply.latestSnapshot rule), and DELETEs are
  *    kept as TOMBSTONES in storage so a late-arriving lower-LSN change
  *    can never resurrect a deleted key; [[snapshot]] hides them.
  *  - exactly-once: version = batchId. A checkpoint-recovery replay sees
  *    its version committed, VERIFIES the commit carries this stream's
  *    own dir naming (the commitBatch replay-vs-reuse rule), and skips;
  *    a version that is neither the next one nor already-committed means
  *    a second writer shares the table — loud, never interleaved.
  *
  * Scale: one shuffle per batch on (table_name, pk) over touched-bucket
  * state + batch; bucket count B is the rewrite-granularity knob (more
  * buckets → smaller rewrites per batch, more files — the same trade as
  * Delta's file size). The per-dir pk stats recorded on every bucket dir
  * give point-lookup reads data skipping over the bucketed state. */
object TxLogMaterialize {

  /** Stored state row shape (tombstones included). */
  val stateSchema: StructType = StructType.fromDDL(
    "table_name STRING, pk BIGINT, lsn BIGINT, op STRING, " +
      "ts_us BIGINT, value DOUBLE")

  private def bucketOf(nBuckets: Int) =
    pmod(xxhash64(col("table_name"), col("pk")), lit(nBuckets.toLong))

  /** Apply one micro-batch of changes (the [[graft.streaming.Change]]
    * column shape: lsn, tableName, op, pk, tsUs, value) to the table —
    * the foreachBatch body. See the class doc for the merge/replay/race
    * rules. */
  /** The producer id this sink records its delivery watermark under —
    * the TxLog txn (SetTransaction) bookkeeping, so OPTIMIZE/vacuum
    * commits can interleave without colliding with batch numbering. */
  val AppId = "cdc-materialize"

  def applyBatch(batch: DataFrame, table: String, batchId: Long,
      nBuckets: Int = 8): Unit = {
    val s = batch.sparkSession
    val st = TxLog.planState(s, table) // ONE checkpoint-accelerated walk
    val watermark = st.txnWatermarks.get(AppId)
    val prefix = f"m$batchId%010d/"
    if (watermark.exists(_ >= batchId)) {
      // replay: verify the recording commit when still in the suffix; a
      // batch recorded at-or-before the log checkpoint is subsumed by
      // the snapshot (its live set reflects the delivery, and its commit
      // may be truncated away)
      st.suffix.find(_.txns.contains(AppId -> batchId)).foreach { entry =>
        require(entry.adds.forall(_.name.startsWith(prefix)),
          s"$table: '$AppId' batch $batchId is recorded with adds " +
            s"[${entry.adds.map(_.name).mkString(",")}] — not this stream's " +
            s"$prefix* dirs; a fresh checkpoint was pointed at a foreign " +
            "table under the same appId (misconfiguration, not a replay)")
      }
      return
    }
    require(watermark == (if (batchId == 0) None else Some(batchId - 1)),
      s"$table: batch $batchId arrived but '$AppId' last delivered " +
        s"$watermark — a second writer shares this sink table, or " +
        "batches were skipped")
    val changes = batch.select(
      col("tableName").as("table_name"), col("pk"), col("lsn"),
      col("op"), col("tsUs").as("ts_us"), col("value"))
    // touched buckets: bounded by nBuckets — a documented O(B) pull
    val touched = changes.select(bucketOf(nBuckets).as("b"))
      .distinct().collect().map(_.getLong(0)).sorted.toSeq
    val liveNames = st.liveAdds.map(_.name)
    // overwrite guard (mirrors commitBatch): a live dir under this
    // batch's parent means a producer without txn records (or a foreign
    // one) delivered it — the overwrite-write below would destroy live
    // state before any commit could fail; loud instead
    require(!liveNames.exists(_.startsWith(prefix)),
      s"$table: live dirs under $prefix exist but '$AppId' has no " +
        s"delivery record for batch $batchId — refusing to overwrite " +
        "live data (pre-txn table or foreign producer)")
    // the merge's correctness RESTS on the bucket layout (untouched
    // buckets carry forward by dir name): a compaction that repacked the
    // dirs would make oldDirs miss live state and the merge silently DROP
    // every key outside this batch — loud instead (generic OPTIMIZE must
    // not run on a live materialize sink; its small-file pressure is
    // already bucket-bounded by construction)
    val offLayout = liveNames.filterNot(_.matches("""m\d{10}/__bucket=\d+"""))
    require(offLayout.isEmpty,
      s"$table: live dirs [${offLayout.take(3).mkString(",")}…] break the " +
        "m<batch>/__bucket=<b> layout this merge sink's bucket-granular " +
        "carry-forward depends on — a compaction or foreign writer " +
        "repacked the table; re-bootstrap the sink instead")
    val oldDirs = touched.flatMap(b =>
      liveNames.filter(_.endsWith(s"/__bucket=$b")).sorted)
    val oldState =
      if (oldDirs.isEmpty)
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          stateSchema)
      else s.read.schema(stateSchema)
        .parquet(oldDirs.map(d => s"$table/$d"): _*)
    // per-key LSN merge over touched state ∪ batch — tombstones retained
    val merged = oldState.unionByName(changes)
      .groupBy("table_name", "pk")
      .agg(max_by(struct(col("lsn"), col("op"), col("ts_us"), col("value")),
        col("lsn")).as("cur"))
      .select(col("table_name"), col("pk"), col("cur.lsn").as("lsn"),
        col("cur.op").as("op"), col("cur.ts_us").as("ts_us"),
        col("cur.value").as("value"))
      .withColumn("__bucket", bucketOf(nBuckets))
    val parent = f"m$batchId%010d"
    // one partitioned write: each touched bucket lands as
    // m<batch>/__bucket=<b>; the partition column is layout, not data
    merged.write.mode("overwrite")
      .partitionBy("__bucket").parquet(s"$table/$parent")
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    // NUMERIC sort: a lexicographic .sorted would order __bucket=10
    // before __bucket=2 and spuriously fail this require at nBuckets ≥ 11
    val written = fs.listStatus(new org.apache.hadoop.fs.Path(s"$table/$parent"))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("__bucket=")).toSeq
      .sortBy(_.stripPrefix("__bucket=").toLong)
    require(written.map(_.stripPrefix("__bucket=").toLong) == touched,
      s"$table: batch $batchId wrote buckets $written but touched " +
        s"$touched — merge/write drift")
    val adds = written.map { w =>
      val dir = s"$parent/$w"
      val (stats, nRows) = TxLog.statsAndRows(
        s.read.schema(stateSchema).parquet(s"$table/$dir"), Seq("pk"))
      TxLog.AddFile(dir, stats, rows = Some(nRows))
    }
    val v = st.head.fold(0L)(_ + 1L)
    require(TxLog.tryCommitActions(s, table, v, adds, oldDirs,
        schemaDdl = if (batchId == 0) Some(stateSchema.toDDL) else None,
        txns = Seq(AppId -> batchId)),
      s"$table: version $v was committed by another writer while this " +
        "batch merged — two writers share one sink table; re-run the " +
        "batch (the delivery watermark makes the retry safe)")
    TxLog.maybeAutoCheckpoint(s, table, v)
  }

  /** The live (non-tombstoned) materialized state at `asOf` — the
    * continuously-maintained `cdc_latest_snapshot`. Tombstones are
    * storage, not semantics: this is the read path that hides them. */
  def snapshot(s: SparkSession, table: String,
      asOf: Option[Long] = None): DataFrame =
    TxLog.readWithLogSchema(s, table, asOf).filter(col("op") =!= "DELETE")
}
