package graft.sources

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericRecord, GenericRecordBuilder}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro source/sink — the remaining common interchange format after
  * parquet/ORC/JSONL/CSV (Kafka estates and schema registries speak
  * Avro natively; corpus exchange with them shouldn't need a transcode
  * hop). The Spark distribution here ships avro-core/avro-mapred but
  * NOT the spark-avro connector, so this rides the classic
  * Hadoop-InputFormat path every pre-connector deployment used:
  * `AvroKeyInputFormat` gives a distributed, SPLITTABLE scan (Avro sync
  * markers make blocks independently readable — reads parallelize
  * across and within files), `AvroKeyOutputFormat` writes one
  * container file per partition. Records convert to/from Rows at the
  * task boundary — nothing driver-side, nothing non-splittable.
  *
  * Type scope (documented, fail-loud outside it): the flat-record
  * subset corpus tables actually use — long/int/double/float/boolean/
  * string/binary, arrays thereof, and nullable-as-union-with-null.
  * Nested records/maps/enums are out of scope for the interchange path
  * (parquet is the fidelity format; this is the exchange seam). */
object Avro {

  /** Write `df` as `numShards` Avro container files under `dir`
    * (overwrite semantics, like the parquet/ORC sinks — Hadoop's
    * FileOutputFormat itself refuses existing dirs). */
  def write(df: DataFrame, dir: String, numShards: Int): Unit = {
    require(numShards > 0, "numShards must be positive")
    val schema = toAvroSchema(df.schema, "graft_record")
    val schemaJson = schema.toString
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, schema)
    df.repartition(numShards).rdd
      .mapPartitions { rows =>
        val sch = new Schema.Parser().parse(schemaJson)
        rows.map(r => (new AvroKey[GenericRecord](rowToRecord(r, sch)), NullWritable.get()))
      }
      .saveAsNewAPIHadoopFile(dir, classOf[AvroKey[GenericRecord]],
        classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]],
        job.getConfiguration)
  }

  /** Distributed Avro scan: schema from one container header (a
    * driver-side metadata read, like parquet footers), records from a
    * splittable Hadoop RDD. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val schema = readSchema(spark, dir)
    val struct = toStructType(schema)
    val schemaJson = schema.toString
    val rdd = spark.sparkContext.newAPIHadoopFile(
        dir,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable])
      .mapPartitions { it =>
        val sch = new Schema.Parser().parse(schemaJson)
        // convert IMMEDIATELY: the record reader may reuse the datum
        it.map { case (k, _) => recordToRow(k.datum(), sch) }
      }
    spark.createDataFrame(rdd, struct)
  }

  /** First container file's embedded writer schema. */
  private def readSchema(spark: SparkSession, dir: String): Schema = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath).filter(_.getName.endsWith(".avro")).sortBy(_.getName)
      .headOption.getOrElse(throw new IllegalArgumentException(s"no .avro files in $dir"))
    val in = new org.apache.avro.file.DataFileStream[GenericRecord](
      fs.open(part), new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
    try in.getSchema finally in.close()
  }

  // ---- schema mapping ------------------------------------------------

  private[graft] def toAvroSchema(struct: StructType, name: String): Schema = {
    val fields = SchemaBuilder.record(name).fields()
    struct.fields.foldLeft(fields) { (fs, f) =>
      val base = toAvroType(f.dataType, s"${f.name}_t")
      if (f.nullable)
        fs.name(f.name).`type`(Schema.createUnion(
          java.util.List.of(Schema.create(Schema.Type.NULL), base))).withDefault(null)
      else fs.name(f.name).`type`(base).noDefault()
    }.endRecord()
  }

  private def toAvroType(dt: DataType, name: String): Schema = dt match {
    case LongType => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case ArrayType(elem, containsNull) =>
      val e = toAvroType(elem, name + "_e")
      Schema.createArray(if (containsNull) Schema.createUnion(
        java.util.List.of(Schema.create(Schema.Type.NULL), e)) else e)
    case other => throw new IllegalArgumentException(
      s"Avro interchange scope excludes $other (use parquet for full fidelity)")
  }

  private[graft] def toStructType(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD, s"expected record, got $schema")
    StructType(schema.getFields.asScala.map { f =>
      val (t, nullable) = fromAvroType(f.schema())
      StructField(f.name(), t, nullable)
    }.toArray)
  }

  private def fromAvroType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"only null-unions supported, got $s")
      (fromAvroType(nonNull.head)._1, true)
    case Schema.Type.LONG => (LongType, false)
    case Schema.Type.INT => (IntegerType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.BYTES => (BinaryType, false)
    case Schema.Type.ARRAY =>
      val (e, n) = fromAvroType(s.getElementType)
      (ArrayType(e, containsNull = n), false)
    case other => throw new IllegalArgumentException(
      s"Avro interchange scope excludes $other")
  }

  // ---- value mapping -------------------------------------------------

  private def rowToRecord(row: Row, schema: Schema): GenericRecord = {
    val b = new GenericRecordBuilder(schema)
    var i = 0
    while (i < row.length) {
      val f = schema.getFields.get(i)
      b.set(f, toAvroValue(row.get(i)))
      i += 1
    }
    b.build()
  }

  private def toAvroValue(v: Any): Any = v match {
    case null => null
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case seq: scala.collection.Seq[_] => seq.map(toAvroValue).asJava
    case other => other // primitives + String pass through
  }

  private def recordToRow(rec: GenericRecord, schema: Schema): Row = {
    val n = schema.getFields.size()
    val vals = new Array[Any](n)
    var i = 0
    while (i < n) { vals(i) = fromAvroValue(rec.get(i)); i += 1 }
    Row.fromSeq(vals.toIndexedSeq)
  }

  private def fromAvroValue(v: Any): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case bb: java.nio.ByteBuffer =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case l: java.util.List[_] => l.asScala.map(fromAvroValue).toSeq
    case other => other
  }
}
