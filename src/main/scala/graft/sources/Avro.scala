package graft.sources

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro container-file source/sink over the core Avro library — the one
  * mainstream interchange format the src_* family was missing (the
  * reference's ecosystem ships change feeds and training corpora as Avro
  * next to JSONL/CSV/ORC).
  *
  * This environment carries avro-1.12 but NOT the spark-avro module, so the
  * engine owns the container seam itself, exactly like the
  * binary-object/media tier (operators/Multimodal): the WRITE side renders
  * each partition as one Avro object-container file (schema + deflate-free
  * blocks + sync markers) via `foreachPartition`; the READ side scans the
  * files through Spark's binaryFile source and decodes partition-locally
  * with `mapPartitions` — zero driver involvement in either direction, one
  * task per container file.
  *
  * Scale notes: Avro containers are BLOCK-splittable (sync markers every
  * block) — a production deployment points the spark-avro reader at the
  * same files and gets intra-file splits; this reader is the
  * one-task-per-file path, the same trade src_binaryfile documents, so
  * parallelism = file count (the writer emits one file per input
  * partition, which is the knob). Nullability rides Avro unions
  * (["null", T]) — a null field survives the trip as a null, never a
  * sentinel. */
object Avro {

  /** Spark → Avro schema for the flat row shapes the lake exports (the
    * nested/array cases belong to parquet/ORC, not interchange Avro). */
  def avroSchema(schema: StructType, name: String = "row"): Schema = {
    var fields = SchemaBuilder.record(name).namespace("graft").fields()
    schema.fields.foreach { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case StringType => Schema.create(Schema.Type.STRING)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(
          s"unsupported Avro export type for field ${f.name}: $other")
      }
      // always-nullable unions: the writer encodes whatever nullability the
      // data actually has, and the reader never guesses
      fields = fields.name(f.name).`type`(
        Schema.createUnion(Schema.create(Schema.Type.NULL), base)).withDefault(null)
    }
    fields.endRecord()
  }

  /** Write `df` as one Avro object-container file per partition under
    * `path` (created). The schema travels IN the container header — the
    * read side can decode with no side channel, which is the format's
    * point. */
  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val avroJson = avroSchema(schema).toString // Schema is not serializable pre-1.9-style; ship JSON
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val sch = new Schema.Parser().parse(avroJson)
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val file = java.nio.file.Paths.get(path, f"part-$pid%05d.avro").toFile
        val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](sch))
        w.create(sch, file)
        try it.foreach { row =>
          val rec = new GenericData.Record(sch)
          schema.fields.zipWithIndex.foreach { case (f, i) =>
            val v: AnyRef =
              if (row.isNullAt(i)) null
              else f.dataType match {
                case BinaryType => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
                case _ => row.get(i).asInstanceOf[AnyRef]
              }
            rec.put(f.name, v)
          }
          w.append(rec)
        } finally w.close()
      }
    }
  }

  /** Read an Avro container directory back as a DataFrame with `schema`
    * (explicit, the src_* discipline — the container header is VERIFIED
    * against it rather than trusted: a drifted export fails loudly, never
    * miscasts). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val expected = avroSchema(schema).toString
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro").load(path)
      .select(col("content"))
    implicit val enc = Encoders.row(schema)
    val n = schema.fields.length
    bin.as[Array[Byte]](Encoders.BINARY).mapPartitions { it =>
      val exp = new Schema.Parser().parse(expected)
      it.flatMap { bytes =>
        val r = new DataFileReader[GenericRecord](
          new SeekableByteArrayInput(bytes), new GenericDatumReader[GenericRecord]())
        require(r.getSchema == exp,
          s"Avro container schema drifted from the declared read schema:\n" +
            s"  container: ${r.getSchema}\n  declared:  $exp")
        new Iterator[Row] {
          def hasNext: Boolean = { val h = r.hasNext; if (!h) r.close(); h }
          def next(): Row = {
            val rec = r.next()
            Row.fromSeq((0 until n).map { i =>
              rec.get(i) match {
                case null => null
                case u: org.apache.avro.util.Utf8 => u.toString
                case b: java.nio.ByteBuffer =>
                  val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
                case v => v
              }
            })
          }
        }
      }
    }.toDF(schema.fieldNames: _*)
  }
}
