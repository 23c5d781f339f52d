package graft.sources

import java.util.{Collections, Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL-CALLABLE MAINTENANCE (r15 — Spark 4's DSv2 stored-procedure
  * surface, the Iceberg `CALL catalog.system.…` convention): every
  * driver-side maintenance verb of the table format is reachable from
  * pure SQL through the catalog —
  *
  *  - `CALL c.system.optimize('t')` — bin-packing compaction
  *    ([[TxLog.optimize]]); returns the committed version (null row
  *    when the layout was already optimal);
  *  - `CALL c.system.vacuum('t', <retain_versions>)` — physical
  *    retention ([[TxLog.vacuum]]); one row per deleted dir;
  *  - `CALL c.system.vacuum_older_than('t', <ts_ms>, <dry_run>)` —
  *    time-based retention with the dry-run report
  *    ([[TxLog.vacuumOlderThan]]);
  *  - `CALL c.system.restore('t', <version>)` — durable time travel
  *    ([[TxLog.restore]]);
  *  - `CALL c.system.checkpoint('t')` — log checkpoint
  *    ([[TxLog.checkpoint]]);
  *  - `CALL c.system.history('t')` — the classified commit history
  *    ([[TxLog.history]]), newest first.
  *
  * Each procedure returns its result as rows through a driver-local
  * scan (`LocalScan` — maintenance outputs are O(commits)/O(deleted
  * dirs) metadata, never row data). Table names resolve exactly like
  * the catalog's own (`ns.t` under the root); an unknown procedure is
  * LOUD with the available names. */
object TxLogProcedures {

  val names: Seq[String] = Seq("optimize", "zorder", "vacuum",
    "vacuum_older_than", "vacuum_derived", "restore", "checkpoint",
    "write_manifest", "history")

  def load(catalogName: String, root: String,
      ident: Identifier): UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"$catalogName: procedures live in the 'system' namespace — " +
        s"CALL $catalogName.system.<name>(…)")
    val dirOf = (t: String) => s"$root/${t.replace('.', '/')}"
    ident.name() match {
      case "optimize" => proc("optimize",
        "bin-packing compaction; returns the committed version",
        Seq("table" -> StringType),
        StructType(Seq(StructField("committed_version", LongType))),
        (s, in) => {
          val v = TxLog.optimize(s, dirOf(str(in, 0)),
            TxLog.logSchema(s, dirOf(str(in, 0))))
          Array(row(v.map(Long.box).orNull))
        })
      case "zorder" => proc("zorder",
        "rewrite into n z-order-clustered dirs over the given columns " +
          "(comma-separated) — multi-dimensional data skipping",
        Seq("table" -> StringType, "columns" -> StringType,
          "n_dirs" -> IntegerType),
        StructType(Seq(StructField("committed_version", LongType))),
        (s, in) => {
          val t = dirOf(str(in, 0))
          val sch = TxLog.logSchema(s, t).getOrElse(
            throw new IllegalArgumentException(
              s"$t: zorder needs a recorded schema"))
          val v = TxLog.optimizeClustered(s, t, sch,
            str(in, 1).split(',').map(_.trim).filter(_.nonEmpty).toSeq,
            in.getInt(2))
          Array(row(v.map(Long.box).orNull))
        })
      case "vacuum_derived" => proc("vacuum_derived",
        "reclaim stale manifests, consumed change-feed dirs, and " +
          "superseded deletion vectors",
        Seq("table" -> StringType, "retain_change_versions" -> IntegerType),
        StructType(Seq(StructField("deleted", StringType))),
        (s, in) => TxLog.vacuumDerived(s, dirOf(str(in, 0)), in.getInt(1))
          .map(d => row(UTF8String.fromString(d))).toArray)
      case "write_manifest" => proc("write_manifest",
        "materialize the head's live add-set as the parquet manifest " +
          "(incremental when one exists)",
        Seq("table" -> StringType),
        StructType(Seq(StructField("manifest_version", LongType))),
        (s, in) => Array(row(Long.box(
          TxLog.writeManifestIncremental(s, dirOf(str(in, 0)))))))
      case "vacuum" => proc("vacuum",
        "physically delete dirs dead at every retained version",
        Seq("table" -> StringType, "retain_versions" -> IntegerType),
        StructType(Seq(StructField("deleted_dir", StringType))),
        (s, in) => TxLog.vacuum(s, dirOf(str(in, 0)), in.getInt(1))
          .map(d => row(UTF8String.fromString(d))).toArray)
      case "vacuum_older_than" => proc("vacuum_older_than",
        "time-based retention; dry_run = true reports without deleting",
        Seq("table" -> StringType, "older_than_ms" -> LongType,
          "dry_run" -> BooleanType),
        StructType(Seq(StructField("horizon", LongType),
          StructField("dirs", IntegerType),
          StructField("bytes", LongType),
          StructField("dry_run", BooleanType))),
        (s, in) => {
          val r = TxLog.vacuumOlderThan(s, dirOf(str(in, 0)),
            in.getLong(1), in.getBoolean(2))
          Array(row(Long.box(r.horizon), Int.box(r.dirs.size),
            Long.box(r.bytes), Boolean.box(r.dryRun)))
        })
      case "restore" => proc("restore",
        "commit a new version whose live set equals the older snapshot",
        Seq("table" -> StringType, "version" -> LongType),
        StructType(Seq(StructField("restored_to", LongType),
          StructField("committed_version", LongType))),
        (s, in) => Array(row(Long.box(in.getLong(1)),
          Long.box(TxLog.restore(s, dirOf(str(in, 0)), in.getLong(1))))))
      case "checkpoint" => proc("checkpoint",
        "snapshot the replay state at the head into one log checkpoint",
        Seq("table" -> StringType),
        StructType(Seq(StructField("checkpointed_at", LongType))),
        (s, in) => Array(row(
          Long.box(TxLog.checkpoint(s, dirOf(str(in, 0)))))))
      case "history" => proc("history",
        "the classified commit history, newest first",
        Seq("table" -> StringType),
        StructType(Seq(StructField("version", LongType),
          StructField("ts_ms", LongType),
          StructField("operation", StringType),
          StructField("n_adds", IntegerType),
          StructField("n_removes", IntegerType),
          StructField("rows_added", LongType),
          StructField("app_ids", StringType),
          StructField("cdf", StringType),
          StructField("schema_change", BooleanType))),
        (s, in) => TxLog.history(s, dirOf(str(in, 0))).map(h =>
          row(Long.box(h.version), Long.box(h.tsMillis),
            UTF8String.fromString(h.operation), Int.box(h.nAdds),
            Int.box(h.nRemoves), h.rowsAdded.map(Long.box).orNull,
            UTF8String.fromString(h.appIds.mkString(",")),
            h.cdf.map(UTF8String.fromString).orNull,
            Boolean.box(h.schemaChange))).toArray)
      case other => throw new UnsupportedOperationException(
        s"$catalogName: no procedure '$other' — available: " +
          names.mkString(", "))
    }
  }

  private def str(in: InternalRow, i: Int): String =
    in.getUTF8String(i).toString

  private def row(vals: Any*): InternalRow =
    new GenericInternalRow(vals.toArray)

  /** One bound procedure: fixed IN parameters, a driver-local result
    * scan. Maintenance mutates the log, so never deterministic. */
  private def proc(pname: String, desc: String,
      params: Seq[(String, DataType)], out: StructType,
      body: (SparkSession, InternalRow) => Array[InternalRow])
      : UnboundProcedure = new UnboundProcedure {
    override def name(): String = pname
    override def description(): String = desc
    override def bind(inputType: StructType): BoundProcedure =
      new BoundProcedure {
        override def name(): String = pname
        override def description(): String = desc
        override def isDeterministic: Boolean = false
        override def parameters(): Array[ProcedureParameter] =
          params.map { case (n, t) =>
            ProcedureParameter.in(n, t).build()
          }.toArray
        override def call(input: InternalRow): JIterator[Scan] = {
          val result = body(SparkSession.active, input)
          Collections.singletonList(new LocalScan {
            override def readSchema(): StructType = out
            override def rows(): Array[InternalRow] = result
            override def description(): String = s"txlog-proc:$pname"
          }: Scan).iterator()
        }
      }
  }
}
