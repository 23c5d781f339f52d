package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetFileWriter
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._

/** The DSv2 STREAMING SINK over a TxLog table (r15):
  * `df.writeStream.format("txlog").option("path", t)` rides Spark's
  * native V2 streaming write — the exactly-once OTHER HALF of the
  * micro-batch source, so a table→table follow is V2 end-to-end with no
  * `foreachBatch` glue.
  *
  *  - EXECUTION: each task writes its partition's rows as ONE parquet
  *    part file under the sink's private dot-dir
  *    (`.swstage-<appId>/e<epoch>/`, invisible to every reader — the
  *    log is the source of truth), via parquet-mr (the PUBLIC library
  *    Spark embeds) straight from [[InternalRow]]s; no driver collect,
  *    no session on executors. Empty partitions write NOTHING (the
  *    file is created lazily on the first row).
  *  - COMMIT: the driver's `commit(epoch, messages)` renames exactly
  *    the files the engine's commit coordinator acknowledged into the
  *    producer's versioned data dir and commits through
  *    [[TxLog.commitStagedFiles]] — the SAME producer-transaction
  *    idempotence as [[TxLog.commitBatch]] (`{"txn":appId,"v":epoch}`),
  *    so a restart-replayed epoch verifies-and-skips, an interleaved
  *    OPTIMIZE/second-producer CAS retries, and a zombie task's
  *    unacknowledged file is left in staging (swept on the next
  *    commit), never published.
  *  - EXACTLY-ONCE identity: `appId` names the producer
  *    (`option("appId", …)`; defaults to `sw-<queryId>` — the streaming
  *    query's durable id, stable across restarts from one checkpoint).
  *  - SCOPE: append output mode over primitive / string / binary
  *    columns (the same set the V2 micro-batch reader decodes);
  *    complete/update modes and nested types are LOUD with the
  *    `foreachBatch` + [[TxLog.commitBatch]] remedy. `statsCols`
  *    (comma-separated) records per-dir min/max envelopes for data
  *    skipping, as everywhere. */
class TxLogStreamingWrite(table: String, schema: StructType,
    appId: String, statsCols: Seq[String]) extends StreamingWrite {

  TxLogParquetCodec.validate(table, schema,
    "the V2 streaming sink encodes primitive/string/binary columns",
    "write through foreachBatch + TxLog.commitBatch")

  private def stageRoot = s"$table/.swstage-$appId"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new TxLogSwWriterFactory(stageRoot, schema.toDDL)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val s = SparkSession.active
    val files = messages.collect {
      case TxLogSwMessage(path) if path.nonEmpty => new Path(path)
    }.toSeq
    val fresh = TxLog.commitStagedFiles(s, table, files, epochId, appId,
      statsCols, Some(schema.toDDL))
    // committed or verified replay either way — the epoch's staging
    // (zombie-attempt files, or the whole replayed batch) is garbage now
    val f = new Path(stageRoot).getFileSystem(
      s.sparkContext.hadoopConfiguration)
    f.delete(new Path(s"$stageRoot/e$epochId"), true)
    if (!fresh) files.foreach(p => require(!f.exists(p),
      s"$table: replayed epoch $epochId left staged $p behind"))
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val s = SparkSession.active
    val f = new Path(stageRoot).getFileSystem(
      s.sparkContext.hadoopConfiguration)
    f.delete(new Path(s"$stageRoot/e$epochId"), true)
  }

  override def toString: String = s"TxLogStreamingWrite[$table]"
}

/** One acknowledged task file (empty string = the task saw no rows). */
case class TxLogSwMessage(path: String) extends WriterCommitMessage

/** Executor-side factory: each task writes
  * `<stageRoot>/e<epoch>/p<partition>-t<taskId>.parquet` — the taskId
  * in the name keeps a speculative/zombie attempt's bytes from
  * colliding with the winner's (only the coordinator-acknowledged
  * attempt's path is ever renamed into the table). */
class TxLogSwWriterFactory(stageRoot: String, schemaDdl: String)
    extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = {
    val schema = StructType.fromDDL(schemaDdl)
    val path = new Path(
      s"$stageRoot/e$epochId/p$partitionId-t$taskId.parquet")
    new TxLogSwDataWriter(path, schema)
  }
}

/** Writes [[InternalRow]]s to one parquet file via parquet-mr's example
  * Group API — the write-side mirror of the V2 reader's decode, so the
  * two stay byte-compatible by construction. The file is created on the
  * FIRST row; an empty partition acknowledges an empty path. */
class TxLogSwDataWriter(path: Path, schema: StructType)
    extends DataWriter[InternalRow] {

  private val mt = TxLogParquetCodec.messageType(schema)
  private val factory = new SimpleGroupFactory(mt)
  private var writer
      : org.apache.parquet.hadoop.ParquetWriter[
        org.apache.parquet.example.data.Group] = _

  override def write(row: InternalRow): Unit = {
    if (writer == null)
      writer = ExampleParquetWriter.builder(path)
        .withType(mt)
        .withConf(new Configuration())
        .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
        .withCompressionCodec(CompressionCodecName.SNAPPY)
        .build()
    val g = factory.newGroup()
    var i = 0
    while (i < schema.fields.length) {
      if (!row.isNullAt(i)) schema.fields(i).dataType match {
        case LongType => g.add(i, row.getLong(i))
        case IntegerType => g.add(i, row.getInt(i))
        case ShortType => g.add(i, row.getShort(i).toInt)
        case DoubleType => g.add(i, row.getDouble(i))
        case FloatType => g.add(i, row.getFloat(i))
        case BooleanType => g.add(i, row.getBoolean(i))
        case StringType =>
          g.add(i, Binary.fromString(row.getUTF8String(i).toString))
        case BinaryType =>
          g.add(i, Binary.fromConstantByteArray(row.getBinary(i)))
        case dt => throw new IllegalStateException(
          s"unreachable: ${dt.sql} was guarded at sink creation")
      }
      i += 1
    }
    writer.write(g)
  }

  override def commit(): WriterCommitMessage = {
    if (writer == null) TxLogSwMessage("")
    else { writer.close(); TxLogSwMessage(path.toString) }
  }

  override def abort(): Unit = {
    if (writer != null) {
      writer.close()
      path.getFileSystem(new Configuration()).delete(path, false)
    }
  }

  override def close(): Unit = ()
}

/** The sink/reader's shared column-type contract: the primitive set
  * both sides handle, and the StructType → parquet MessageType mapping
  * the writer encodes with (Spark's own physical choices — INT64/INT32
  * with integer-width annotations, BINARY+UTF8 strings — so files are
  * indistinguishable from `df.write.parquet` output to every reader). */
object TxLogParquetCodec {

  def validate(table: String, schema: StructType, what: String,
      remedy: String): Unit =
    schema.fields.foreach(f => f.dataType match {
      case LongType | IntegerType | ShortType | StringType | DoubleType |
          FloatType | BooleanType | BinaryType => ()
      case dt => throw new UnsupportedOperationException(
        s"$table: $what; '${f.name}' is ${dt.sql} — $remedy")
    })

  def messageType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val t = f.dataType match {
        case LongType => Types.optional(INT64)
        case IntegerType => Types.optional(INT32)
        case ShortType => Types.optional(INT32)
          .as(LogicalTypeAnnotation.intType(16, true))
        case DoubleType => Types.optional(DOUBLE)
        case FloatType => Types.optional(FLOAT)
        case BooleanType => Types.optional(BOOLEAN)
        case StringType =>
          Types.optional(BINARY).as(LogicalTypeAnnotation.stringType())
        case BinaryType => Types.optional(BINARY)
        case dt => throw new UnsupportedOperationException(
          s"no parquet mapping for ${dt.sql}")
      }
      b.addField(t.named(f.name))
    }
    b.named("spark_schema")
  }
}
