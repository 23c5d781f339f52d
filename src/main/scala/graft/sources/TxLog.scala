package graft.sources

import org.apache.hadoop.fs.{FileSystem, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** A minimal log-structured ACID table format (the Delta/Iceberg idea
  * re-expressed standalone, without either dependency): a table is a
  * directory of immutable parquet data dirs plus an append-only `_log/` of
  * contiguously numbered JSON commit files, each holding file-level
  * add/remove actions. The LOG is the source of truth — data dirs become
  * visible only when a commit names them, and a commit becomes durable in
  * ONE atomic create-exclusive publish of its log file, so a reader never
  * observes a half-commit (it either sees version N or it doesn't).
  *
  *  - OPTIMISTIC CONCURRENCY: a writer computes against snapshot version V
  *    and commits by creating `_log/<V+1>.json` exclusively. Locally that
  *    publish is a hard LINK of a fully-written temp file (link(2) is
  *    kernel-atomic and fails EEXIST — RawLocalFileSystem's
  *    `create(overwrite = false)` is exists-then-create, a TOCTOU hole the
  *    snapshot store already hit); on HDFS it is `rename` without
  *    overwrite (NameNode-atomic, false if the destination exists). Two
  *    writers racing from the same snapshot: exactly one wins; the loser
  *    gets `false` back and must re-read the new snapshot and retry —
  *    lost update impossible by construction (two-writer race spec).
  *  - TIME TRAVEL: a reader replays actions up to `asOf`; superseded data
  *    dirs stay readable until vacuumed, so every historical version is a
  *    plain parquet scan.
  *  - SCALE: the log carries FILE-level actions — O(commits) driver-side
  *    metadata, like the production table formats — never rows; a read
  *    plans an ordinary multi-dir parquet scan, so pushdown, pruning and
  *    whole-stage codegen are exactly what the raw lake gets.
  *  - CORRUPTION IS LOUD: a gap in the version sequence, a remove of a
  *    file no prior commit added, or time travel past the table head all
  *    throw — a torn log must never silently read as a smaller table.
  */
object TxLog {

  private val LogDirName = "_log"
  private val NameRe = """(\d{10})\.json""".r
  private val AddRe = """\{"add":"(.*)"\}""".r
  private val RemoveRe = """\{"remove":"(.*)"\}""".r
  private val tmpSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  private def fsOf(s: SparkSession, p: Path): FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  private def esc(x: String): String = x.flatMap {
    case '\\' => "\\\\"
    case '"' => "\\\""
    case c => c.toString
  }

  private def unesc(x: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < x.length) {
      if (x.charAt(i) == '\\' && i + 1 < x.length) { b += x.charAt(i + 1); i += 2 }
      else { b += x.charAt(i); i += 1 }
    }
    b.toString
  }

  /** Publish `tmp` (fully written) as `dest`, failing (false) if `dest`
    * already exists — the commit's linearization point. */
  private def publishExclusive(f: FileSystem, tmp: Path, dest: Path): Boolean = {
    val isLocal = f.isInstanceOf[RawLocalFileSystem] ||
      f.isInstanceOf[LocalFileSystem]
    if (isLocal) {
      val won =
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(dest.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
      f.delete(tmp, false)
      won
    } else {
      val won = f.rename(tmp, dest)
      if (!won) f.delete(tmp, false)
      won
    }
  }

  /** Attempt to commit `version` with the given data-dir actions (paths
    * relative to the table dir). Returns false iff another writer already
    * committed this version — re-read the snapshot and retry from there. */
  def tryCommit(s: SparkSession, table: String, version: Long,
      adds: Seq[String], removes: Seq[String]): Boolean = {
    require(version >= 0, s"negative version $version")
    val ld = new Path(table, LogDirName)
    val f = fsOf(s, ld)
    f.mkdirs(ld)
    val dest = new Path(ld, f"$version%010d.json")
    if (f.exists(dest)) return false // cheap fast-path; the publish re-checks
    val tmp = new Path(ld,
      s".tmp-$version-${ProcessHandle.current().pid()}-${tmpSeq.incrementAndGet()}")
    val out = f.create(tmp, true)
    try {
      val body = (adds.map(a => s"""{"add":"${esc(a)}"}""") ++
        removes.map(r => s"""{"remove":"${esc(r)}"}""")).mkString("", "\n", "\n")
      out.write(body.getBytes("UTF-8"))
    } finally out.close()
    publishExclusive(f, tmp, dest)
  }

  /** The exactly-once foreachBatch SINK rule, in one place so the gate
    * and the restart spec share it: a batch whose version is already
    * committed is a checkpoint-recovery replay and SKIPS (its data is
    * durable — this is what turns at-least-once delivery into
    * exactly-once table contents); otherwise the batch lands in an
    * immutable data dir (overwrite absorbs a crash-partial dir from a
    * previous attempt of this same batch) and commits as
    * version = batchId. The create-exclusive CAS stays the loud backstop:
    * losing it here means a SECOND writer shares this sink table — a
    * misconfiguration, not a replay — and the batch fails rather than
    * silently interleaving two streams' commits. */
  def commitBatch(batch: DataFrame, table: String, batchId: Long): Unit = {
    val s = batch.sparkSession
    if (currentVersion(s, table).exists(_ >= batchId)) ()
    else {
      val name = f"b$batchId%010d"
      batch.write.mode("overwrite").parquet(s"$table/$name")
      require(tryCommit(s, table, batchId, Seq(name), Nil),
        s"$table: version $batchId was committed by another writer while " +
          "this batch wrote its data — two streams share one sink table")
    }
  }

  /** Highest committed version, None for a table with no log yet. */
  def currentVersion(s: SparkSession, table: String): Option[Long] = {
    val ld = new Path(table, LogDirName)
    val f = fsOf(s, ld)
    if (!f.exists(ld)) None
    else f.listStatus(ld).toSeq.map(_.getPath.getName)
      .collect { case NameRe(v) => v.toLong }
      .sorted.lastOption
  }

  /** One added action per commit, contiguity-validated and strictly
    * parsed — THE shared log walk behind liveFiles/history/vacuum (one
    * definition, so the gap/garbage loudness cannot drift between the
    * read path and the DESCRIBE-HISTORY surface, and every verb costs
    * exactly one O(commits) metadata pass). Each entry is
    * (version, adds, removes). */
  private def commits(s: SparkSession,
      table: String): Seq[(Long, Seq[String], Seq[String])] = {
    val ld = new Path(table, LogDirName)
    val f = fsOf(s, ld)
    require(f.exists(ld), s"$table has no $LogDirName — not a TxLog table")
    val versions = f.listStatus(ld).toSeq.map(_.getPath.getName)
      .collect { case NameRe(v) => v.toLong }.sorted
    require(versions.nonEmpty, s"$table: empty $LogDirName")
    require(versions == (0L to versions.last),
      s"$table: log has a GAP (${versions.mkString(",")}) — torn log, " +
        "refusing to read a partial table")
    versions.map { v =>
      val in = f.open(new Path(ld, f"$v%010d.json"))
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      val (adds, removes) =
        (Seq.newBuilder[String], Seq.newBuilder[String])
      text.split("\n").filter(_.nonEmpty).foreach {
        case AddRe(a) => adds += unesc(a)
        case RemoveRe(r) => removes += unesc(r)
        case other => throw new IllegalArgumentException(
          s"$table v$v: unrecognized action $other")
      }
      (v, adds.result(), removes.result())
    }
  }

  /** Replay `cs` in order, validating add/remove consistency; returns the
    * live set after the last entry. */
  private def replay(table: String,
      cs: Seq[(Long, Seq[String], Seq[String])]): scala.collection.mutable.LinkedHashSet[String] = {
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    cs.foreach { case (v, adds, removes) =>
      adds.foreach(p => require(live.add(p),
        s"$table v$v: add of already-live $p — corrupted log"))
      removes.foreach(p => require(live.remove(p),
        s"$table v$v: remove of unknown $p — corrupted log"))
    }
    live
  }

  /** The live data dirs of the snapshot at `asOf` (None = head), by log
    * replay. O(commits) driver-side metadata reads — never row data. */
  def liveFiles(s: SparkSession, table: String,
      asOf: Option[Long] = None): Seq[String] = {
    val cs = commits(s, table)
    val head = cs.last._1
    asOf.foreach(v => require(v >= 0 && v <= head,
      s"$table: time travel to v$v but the table head is v$head"))
    replay(table, asOf.fold(cs)(v => cs.filter(_._1 <= v))).toSeq
  }

  /** Commit history as (version, n_adds, n_removes) — the DESCRIBE
    * HISTORY surface; shares [[commits]]' contiguity and strict-parse
    * loudness (a torn log must not read as healthy here either). */
  def history(s: SparkSession, table: String): Seq[(Long, Int, Int)] =
    commits(s, table).map { case (v, a, r) => (v, a.size, r.size) }

  /** VACUUM: physically delete data dirs that are no longer live at ANY
    * retained version (the horizon is `head − retainVersions`, and never
    * moves BACKWARD — a later, laxer retention cannot un-vacuum deleted
    * history), and record the horizon in `_vacuum` so reads older than
    * it fail LOUDLY (their files are gone — a silent partial read would
    * be worse). Files live at any version ≥ the horizon are never
    * touched, so the snapshot-store-style reader grace window holds.
    * The log is walked ONCE (live set snapshotted at each retained
    * version); the head is re-checked after the walk and the delete set
    * is computed against that same snapshot, so a concurrent writer's
    * fresh commit can never lose files — the re-check aborts loudly
    * instead (single-writer is the contract; the check makes violating
    * it an error, not a corruption). Returns the deleted dir names;
    * idempotent re-runs return only dirs that still existed. */
  def vacuum(s: SparkSession, table: String, retainVersions: Int): Seq[String] = {
    require(retainVersions >= 0, s"negative retention $retainVersions")
    val cs = commits(s, table)
    val head = cs.last._1
    val horizon = math.max(vacuumHorizon(s, table),
      math.max(0L, head - retainVersions))
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    val keep = scala.collection.mutable.HashSet.empty[String]
    val everAdded = scala.collection.mutable.HashSet.empty[String]
    cs.foreach { case (v, adds, removes) =>
      adds.foreach { p =>
        require(live.add(p), s"$table v$v: add of already-live $p")
        everAdded += p
      }
      removes.foreach(p => require(live.remove(p),
        s"$table v$v: remove of unknown $p"))
      if (v >= horizon) keep ++= live
    }
    require(currentVersion(s, table).contains(head),
      s"$table: a writer advanced the log past v$head during vacuum — " +
        "aborting before any delete (vacuum is a single-writer operation)")
    val f = fsOf(s, new Path(table))
    val doomed = (everAdded -- keep).toSeq.sorted
      .filter(d => f.exists(new Path(table, d)))
    doomed.foreach(d => f.delete(new Path(table, d), true))
    // persist the (monotone) horizon AFTER the deletes — a crash in
    // between leaves a lower recorded horizon and a loud missing-file
    // read, never a silent partial one — via tmp + atomic replace: a
    // truncate-in-place create would brick every read that races it
    val tmp = new Path(table,
      s"._vacuum-tmp-${ProcessHandle.current().pid()}-${tmpSeq.incrementAndGet()}")
    val out = f.create(tmp, true)
    try out.write(horizon.toString.getBytes("UTF-8")) finally out.close()
    val dest = new Path(table, VacuumFile)
    if (f.isInstanceOf[RawLocalFileSystem] || f.isInstanceOf[LocalFileSystem])
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(dest.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    else { f.delete(dest, false); f.rename(tmp, dest) }
    doomed
  }

  private val VacuumFile = "_vacuum"

  private def vacuumHorizon(s: SparkSession, table: String): Long = {
    val p = new Path(table, VacuumFile)
    val f = fsOf(s, p)
    if (!f.exists(p)) -1L
    else {
      val in = f.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  /** Read the table at `asOf` (None = head) as a plain multi-dir parquet
    * scan with the caller's explicit schema — pushdown/pruning/codegen are
    * untouched by the log layer. An empty snapshot reads as an empty frame
    * of the schema, not an error. */
  def read(s: SparkSession, table: String, schema: StructType,
      asOf: Option[Long] = None): DataFrame = {
    val horizon = vacuumHorizon(s, table)
    // the guard only applies on a vacuumed table — on a fresh one a
    // negative asOf must get liveFiles' accurate head-range error, not a
    // phantom "horizon v-1" message
    if (horizon >= 0) asOf.foreach(v => require(v >= horizon,
      s"$table: v$v was VACUUMED (retention horizon v$horizon) — its " +
        "data files are gone; a silent partial read is not offered"))
    val files = liveFiles(s, table, asOf)
    if (files.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
    else s.read.schema(schema).parquet(files.map(p => s"$table/$p"): _*)
  }
}
