package graft.sources

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file connector (SURVEY §2.3 connectors row).
  *
  * The `spark-avro` external module is not deployable in this sandbox
  * (zero egress; only Avro CORE + avro-mapred ship in /opt/spark/jars),
  * so this is a self-contained connector over the standard Hadoop
  * `AvroKey{Input,Output}Format` — the same container files, the same
  * on-disk layout (`part-*` per partition), readable by any Avro tooling
  * and by spark-avro itself once that module is on a cluster's classpath.
  *
  * Distribution shape: write is one Avro container file per partition via
  * `saveAsNewAPIHadoopFile` (no driver funnel, no repartition); read is
  * `newAPIHadoopFile` with per-partition GenericRecord→Row conversion
  * (file splits drive parallelism exactly as for text). The per-partition
  * imperative conversion is the legitimate `mapPartitions` case: format
  * IO below the DataFrame API, like the Deflater kernel.
  *
  * Type matrix (both directions, nullable as `union(null, T)`):
  * long/int/double/float/boolean/string/binary, timestamp as the Avro
  * `timestamp-micros` logical type (matching the engine's micros
  * convention, Tables.scala), and one-level `array<primitive>` (the
  * embeddings shape). Nested structs/maps are out of scope until a real
  * consumer needs them — unsupported types fail loudly at schema
  * conversion, never silently coerce.
  */
object AvroIO {

  // ---- schema conversion -------------------------------------------------

  private def primToAvro(dt: DataType): Schema = dt match {
    case LongType    => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      org.apache.avro.LogicalTypes.timestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      // Avro's tz-less twin (local-timestamp-micros, Avro ≥ 1.10) — the
      // type a tz-less parquet timestamp column becomes under Spark 4's
      // NTZ scan inference, so the connector must round-trip it too
      org.apache.avro.LogicalTypes.localTimestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case other =>
      throw new IllegalArgumentException(
        s"AvroIO: unsupported Spark type $other (supported: long/int/" +
          "double/float/boolean/string/binary/timestamp/timestamp_ntz/" +
          "array<primitive>)")
  }

  /** StructType → Avro record schema. */
  def sqlToAvro(schema: StructType, name: String = "row"): Schema = {
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case ArrayType(elem, containsNull) =>
          val e = primToAvro(elem)
          Schema.createArray(
            if (containsNull) Schema.createUnion(Schema.create(Schema.Type.NULL), e)
            else e)
        case dt => primToAvro(dt)
      }
      val t =
        if (f.nullable)
          Schema.createUnion(Schema.create(Schema.Type.NULL), base)
        else base
      new Schema.Field(f.name, t, null, null)
    }
    Schema.createRecord(name, null, "graft.sources.avro", false,
      java.util.Arrays.asList(fields: _*))
  }

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s

  private def avroToSqlType(s: Schema): DataType = {
    val b = nonNull(s)
    b.getType match {
      case Schema.Type.LONG =>
        if (b.getLogicalType != null &&
          b.getLogicalType.getName == "timestamp-micros") TimestampType
        else if (b.getLogicalType != null &&
          b.getLogicalType.getName == "local-timestamp-micros") TimestampNTZType
        else LongType
      case Schema.Type.INT     => IntegerType
      case Schema.Type.DOUBLE  => DoubleType
      case Schema.Type.FLOAT   => FloatType
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.STRING  => StringType
      case Schema.Type.BYTES   => BinaryType
      case Schema.Type.ARRAY =>
        ArrayType(avroToSqlType(b.getElementType),
          b.getElementType.getType == Schema.Type.UNION)
      case other =>
        throw new IllegalArgumentException(s"AvroIO: unsupported Avro type $other")
    }
  }

  /** Avro record schema → StructType. */
  def avroToSql(schema: Schema): StructType =
    StructType(schema.getFields.asScala.toSeq.map { f =>
      StructField(f.name, avroToSqlType(f.schema),
        f.schema.getType == Schema.Type.UNION)
    })

  // ---- value conversion (per partition, executor-side) -------------------

  private def toAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (ts: java.sql.Timestamp, TimestampType) =>
      val i = ts.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case (ldt: java.time.LocalDateTime, TimestampNTZType) =>
      // wall-clock micros, no zone involved (mirrors parquet NTZ micros)
      ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        ldt.getNano / 1000L
    case (b: Array[Byte], BinaryType) => ByteBuffer.wrap(b)
    case (seq: scala.collection.Seq[_], ArrayType(elem, _)) =>
      val out = new java.util.ArrayList[Any](seq.length)
      seq.foreach(e => out.add(toAvroValue(e, elem)))
      out
    case (other, _) => other
  }

  private def fromAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (l: java.lang.Long, TimestampType) =>
      java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(
          Math.floorDiv(l.longValue, 1000000L),
          Math.floorMod(l.longValue, 1000000L) * 1000L))
    case (l: java.lang.Long, TimestampNTZType) =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(l.longValue, 1000000L),
        (Math.floorMod(l.longValue, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    case (s: CharSequence, StringType) => s.toString
    case (bb: ByteBuffer, BinaryType) =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case (lst: java.util.Collection[_], ArrayType(elem, _)) =>
      lst.asScala.toSeq.map(e => fromAvroValue(e, elem))
    case (other, _) => other
  }

  // ---- read / write ------------------------------------------------------

  /** Write one Avro container file per partition (overwrite semantics to
    * match the other Formats writers). The schema travels to executors as
    * its JSON (Avro Schema is serializable, but JSON is version-proof).
    * `codec` selects Avro block compression (`"deflate"`/`"snappy"`/
    * `"null"`) — a storage-layer choice, value-invariant (spec'd like the
    * parquet codec matrix). */
  def writeAvro(df: DataFrame, path: String,
                codec: Option[String] = None): Unit = {
    val spark = df.sparkSession
    val structType = df.schema
    val avroSchema = sqlToAvro(structType)
    val schemaJson = avroSchema.toString
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, avroSchema)
    codec.foreach { c =>
      job.getConfiguration.setBoolean(
        org.apache.hadoop.mapreduce.lib.output.FileOutputFormat.COMPRESS, true)
      job.getConfiguration.set("avro.output.codec", c)
    }
    val p = new Path(path)
    val fs = p.getFileSystem(job.getConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val fieldTypes = structType.fields.map(_.dataType)
    df.rdd
      .mapPartitions { it =>
        val schema = new Schema.Parser().parse(schemaJson)
        it.map { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < fieldTypes.length) {
            rec.put(i, toAvroValue(row.get(i), fieldTypes(i)))
            i += 1
          }
          (new AvroKey[GenericRecord](rec), NullWritable.get())
        }
      }
      .saveAsNewAPIHadoopFile(
        path,
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        classOf[AvroKeyOutputFormat[GenericRecord]],
        job.getConfiguration)
  }

  /** Read Avro container files; the schema is INFERRED from the first
    * part file's writer schema (self-describing container format — no
    * caller-supplied schema needed, unlike headerless CSV).
    *
    * `columns` projects at the FORMAT layer: a reader schema restricted
    * to those fields makes Avro's datum reader SKIP the other fields
    * during decode (resolution by name) — the connector-level analogue
    * of parquet column pruning, so a 2-column projection never
    * deserializes a wide row. */
  def readAvro(spark: SparkSession, path: String,
               columns: Seq[String] = Nil): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val part = fs.listStatus(p)
      .map(_.getPath)
      .filter(f => f.getName.startsWith("part-"))
      .sortBy(_.getName)
      .headOption
      .getOrElse(throw new java.io.FileNotFoundException(
        s"AvroIO: no part-* files under $path"))
    val fullSchema = {
      val in = fs.open(part)
      try {
        val r = new org.apache.avro.file.DataFileStream[GenericRecord](
          in, new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
        try r.getSchema finally r.close()
      } finally in.close()
    }
    val writerSchema =
      if (columns.isEmpty) fullSchema
      else {
        val byName = fullSchema.getFields.asScala.map(f => f.name -> f).toMap
        val picked = columns.map(c => byName.getOrElse(c,
          throw new IllegalArgumentException(
            s"AvroIO: column $c not in ${byName.keys.mkString(",")}")))
        Schema.createRecord(fullSchema.getName, null,
          fullSchema.getNamespace, false,
          java.util.Arrays.asList(picked.map(f =>
            new Schema.Field(f.name, f.schema, null, null)): _*))
      }
    val structType = avroToSql(writerSchema)
    val fieldTypes = structType.fields.map(_.dataType)
    val job = Job.getInstance(conf)
    AvroJob.setInputKeySchema(job, writerSchema)
    val rows = spark.sparkContext
      .newAPIHadoopFile(
        path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        job.getConfiguration)
      .mapPartitions { it =>
        it.map { case (k, _) =>
          val rec = k.datum()
          val vals = new Array[Any](fieldTypes.length)
          var i = 0
          while (i < fieldTypes.length) {
            vals(i) = fromAvroValue(rec.get(i), fieldTypes(i))
            i += 1
          }
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
    spark.createDataFrame(rows, structType)
  }
}
