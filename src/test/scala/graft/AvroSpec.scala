package graft

import graft.sources.Avro
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Avro interchange: typed round-trip (nullables, binary, arrays),
  * sharding, schema mapping both ways, and the documented scope fence. */
class AvroSpec extends SparkSpec {
  import spark.implicits._

  test("typed round-trip: primitives, nullables, binary, arrays") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n", IntegerType, nullable = true),
      StructField("x", DoubleType, nullable = true),
      StructField("ok", BooleanType, nullable = true),
      StructField("s", StringType, nullable = true),
      StructField("raw", BinaryType, nullable = true),
      StructField("xs", ArrayType(LongType, containsNull = false), nullable = true)))
    val rows = Seq(
      Row(1L, 7, 1.5, true, "alpha, \"q\"\nnl", Array[Byte](1, 2, -3), Seq(1L, 2L)),
      Row(2L, null, null, null, null, null, null),
      Row(3L, -1, -0.25, false, "", Array.empty[Byte], Seq.empty[Long]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val dir = java.nio.file.Files.createTempDirectory("graft_avro").toString
    Avro.write(df, dir, numShards = 3)
    val back = Avro.read(spark, dir).orderBy("id")
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq
      === schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val got = back.collect()
    assert(got(0).getLong(0) === 1L && got(0).getString(4) === "alpha, \"q\"\nnl")
    assert(got(0).getAs[Array[Byte]](5).toSeq === Seq[Byte](1, 2, -3))
    assert(got(0).getAs[Seq[Long]](6) === Seq(1L, 2L))
    assert((1 to 6).forall(got(1).isNullAt), "null row survives")
    assert(got(2).getAs[Seq[Long]](6) === Seq.empty)
    // sharded: one container file per requested partition
    val parts = new java.io.File(dir).listFiles().count(_.getName.endsWith(".avro"))
    assert(parts === 3)
  }

  test("full corpus table round-trips losslessly") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_docs").toString
    Avro.write(docs, dir, numShards = 4)
    val back = Avro.read(spark, dir)
    assert(back.count() === docs.count())
    val a = docs.orderBy("doc_id").collect().map(_.toSeq)
    val b = back.select(docs.columns.map(org.apache.spark.sql.functions.col).toSeq: _*)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("scope fence: unsupported types fail loud, not silently corrupt") {
    val df = Seq((1L, Map("k" -> 1))).toDF("id", "m")
    val e = intercept[IllegalArgumentException] {
      Avro.write(df, java.nio.file.Files.createTempDirectory("graft_avro_bad").toString, 1)
    }
    assert(e.getMessage.contains("scope"))
  }
}
