package graft

import graft.operators.Enrich
import graft.sources.OrderedCsv
import java.nio.file.Files
import scala.io.Source

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("OrderedCsv writes one *_final.csv with header and exact input order") {
    val dir = Files.createTempDirectory("graft_csv").toString
    // parallelize keeps global order across partitions (like a multi-split
    // file read); withRowIndex must run BEFORE any shuffle — that's its
    // contract (Enrich scaladoc)
    val base = spark.createDataFrame(
      spark.sparkContext.parallelize((0 until 37).map(i => (s"v$i", i * 2)), 5))
      .toDF("name", "num")
    val df = Enrich.withRowIndex(base)
    val path = OrderedCsv.write(df, dir, "myfile")
    assert(path.endsWith("/myfile_final.csv"))
    val src = Source.fromFile(new java.io.File(new java.net.URI(path).getPath))
    val lines = try src.getLines().toVector finally src.close()
    assert(lines.head == "name,num")
    assert(lines.tail == (0 until 37).map(i => s"v$i,${i * 2}").toVector)
  }

  test("publicUrl maps s3 paths to the reference's virtual-hosted URL shape") {
    // test.py:249: https://{bucket}.s3.amazonaws.com/{key}
    assert(OrderedCsv.publicUrl("s3a://my-bucket/out/f_final.csv")
      == "https://my-bucket.s3.amazonaws.com/out/f_final.csv")
    assert(OrderedCsv.publicUrl("s3://b/k_final.csv") == "https://b.s3.amazonaws.com/k_final.csv")
    assert(OrderedCsv.publicUrl("file:/tmp/out/f_final.csv") == "file:/tmp/out/f_final.csv")
    assert(OrderedCsv.publicUrl("hdfs://nn/out/f.csv") == "hdfs://nn/out/f.csv")
  }

  test("UrlStaging fetches http URLs to a local file and passes other schemes through") {
    import com.sun.net.httpserver.HttpServer
    import java.net.InetSocketAddress
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    val csv = "a,b\n1,2\n3,4\n"
    server.createContext("/data.csv", ex => {
      val bytes = csv.getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.createContext("/missing.csv", ex => { ex.sendResponseHeaders(404, -1); ex.close() })
    server.start()
    try {
      val port = server.getAddress.getPort
      val staged = graft.sources.UrlStaging.stage(s"http://localhost:$port/data.csv")
      assert(staged.startsWith("file:"))
      val df = spark.read.option("header", "true").csv(staged)
      assert(df.count() == 2 && df.columns.toSeq == Seq("a", "b"))
      intercept[RuntimeException] {
        graft.sources.UrlStaging.stage(s"http://localhost:$port/missing.csv")
      }
      assert(graft.sources.UrlStaging.stage("s3a://bucket/k.csv") == "s3a://bucket/k.csv")
      assert(graft.sources.UrlStaging.stage("/local/path.csv") == "/local/path.csv")
    } finally server.stop(0)
  }

  test("writeSharded: file-name order concatenation recovers exact row order") {
    val dir = Files.createTempDirectory("graft_shard").toString
    val base = spark.createDataFrame(
      spark.sparkContext.parallelize((0 until 500).map(i => (s"v$i", i)), 7))
      .toDF("name", "num")
    val out = OrderedCsv.writeSharded(Enrich.withRowIndex(base), dir, "big", numShards = 5)
    val parts = new java.io.File(new java.net.URI(out).getPath match {
        case p if p.nonEmpty => p; case _ => out
      }).listFiles((_, n) => n.startsWith("part-")).sortBy(_.getName)
    assert(parts.length == 5)
    val lines = parts.toSeq.flatMap { f =>
      val src = Source.fromFile(f)
      try src.getLines().toVector.tail finally src.close() // drop per-file header
    }
    assert(lines == (0 until 500).map(i => s"v$i,$i"))
  }

  test("round-trips through parquet, orc, json, and csv preserve data") {
    val dir = Files.createTempDirectory("graft_fmt").toString
    val df = (0 until 200).map(i => (i.toLong, s"s$i", i * 1.5)).toDF("id", "name", "v")
    for (fmt <- Seq("parquet", "orc", "json", "csv")) {
      val path = s"$dir/$fmt"
      df.write.format(fmt).option("header", "true").save(path)
      val back = spark.read.format(fmt)
        .option("header", "true").option("inferSchema", "true").load(path)
      assert(back.count() == 200, fmt)
      val got = back.select("id", "name", "v").collect()
        .map(r => (r.get(0).toString.toLong, r.getString(1), r.get(2).toString.toDouble)).toSet
      assert(got === df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet, fmt)
    }
  }

  test("Orc: sharded zstd write round-trips nulls/unicode; filters reach the scan") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val df = Seq(
      (1L, Some("plain"), Some(1.5)),
      (2L, Some("unicodé 中文 \u0001"), None),
      (3L, None, Some(-0.0))
    ).toDF("id", "text", "score")
    graft.sources.Orc.write(df, dir, numShards = 2)
    val back = graft.sources.Orc.read(spark, dir)
    assert(back.schema("text").dataType === org.apache.spark.sql.types.StringType,
      "schema comes from the ORC footer")
    val got = back.select("id", "text", "score")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(got === Set((1L, Some("plain"), Some(1.5)),
      (2L, Some("unicodé 中文 \u0001"), None), (3L, None, Some(-0.0))))
    // predicate pushdown: ORC stripe stats serve filters like parquet
    val plan = back.where($"id" > 2L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,2)]"),
      plan.take(600))
  }

  test("Jsonl: sharded write + schema-explicit read round-trips nulls, unicode, corrupt lines") {
    import graft.sources.Jsonl
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val df = Seq(
      (1L, Some("plain"), 10),
      (2L, Some("uni é中文 \"quoted\" \\ tab\t"), 20),
      (3L, Option.empty[String], 30)
    ).toDF("id", "text", "n")
    Jsonl.write(df, dir, numShards = 3)
    val back = Jsonl.read(spark, dir, df.schema)
      .as[(Long, Option[String], Int)].collect().toSet
    assert(back === Set(
      (1L, Some("plain"), 10),
      (2L, Some("uni é中文 \"quoted\" \\ tab\t"), 20),
      (3L, None, 30)))
    // a corrupt line yields an all-null row under PERMISSIVE, not a crash
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "bad.json"),
      "{not valid json".getBytes)
    val withBad = Jsonl.read(spark, dir, df.schema)
    assert(withBad.count() === 4)
    assert(withBad.filter($"id".isNull).count() === 1)
  }

  test("PartitionedParquet: filters on partition columns PRUNE directories, not rows") {
    import graft.sources.PartitionedParquet
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val df = (0L until 300L).map(i => (i, s"t$i", if (i % 3 == 0) "en" else "de",
        if (i % 10 < 8) "train" else "test"))
      .toDF("id", "text", "lang", "split")
    PartitionedParquet.write(df, dir, Seq("lang", "split"), "id", maxRecordsPerFile = 50)
    // layout: hive-style directories per (lang, split)
    val langDirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(langDirs.toSeq === Seq("lang=de", "lang=en"))
    // maxRecordsPerFile bounds file size: lang=de/split=train has 160
    // rows -> at least 4 files
    val deTrain = new java.io.File(s"$dir/lang=de/split=train").listFiles()
      .count(_.getName.startsWith("part-"))
    assert(deTrain >= 4, s"expected >=4 bounded files, got $deTrain")
    val back = PartitionedParquet.read(spark, dir).filter($"lang" === "en" && $"split" === "train")
    assert(back.count() === 80)
    // the filter must reach the scan as PartitionFilters (directory
    // pruning), leaving no lang/split Filter above the scan
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan.take(500))
    assert(plan.contains("lang") && plan.contains("split"))
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(scanLine.contains("isnotnull(lang") || scanLine.contains("(lang"),
      s"partition filter missing from scan: $scanLine")
  }

  test("Jdbc: overwrite sink + range-partitioned parallel read roundtrip; " +
    "stride predicates give numPartitions partitions; filters push down") {
    import spark.implicits._
    val db = java.nio.file.Files.createTempDirectory("jdbc_spec").toString
    val url = s"jdbc:derby:$db/db;create=true"
    val df = (0L until 40L).map(i => (i, s"name_$i", i % 5)).toDF("id", "name", "grp")
    graft.sources.Jdbc.write(df, url, "t")
    // overwrite is idempotent (second write drops + recreates)
    graft.sources.Jdbc.write(df, url, "t")
    val back = graft.sources.Jdbc.readPartitioned(spark, url, "t", "id", 0L, 40L, 4)
    assert(back.rdd.getNumPartitions === 4, "one stride predicate per partition")
    assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      === (0L until 40L).map(i => (i, s"name_$i", i % 5)))
    // Catalyst pushes the filter into the generated SQL: the GRP
    // predicate must appear INSIDE the PushedFilters list (an un-pushed
    // plan still prints "PushedFilters: []" plus a Filter node naming
    // GRP, which a plan-wide contains() would falsely accept —
    // round-16 review finding on this very assertion)
    val plan = back.filter($"grp" === 3L).queryExecution.executedPlan.toString
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(pushed.toLowerCase.contains("grp"), s"filter not pushed: $plan")
    assert(back.filter($"grp" === 3L).count() === 8)
  }

  test("withRowIndex is contiguous and matches input order across partitions") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize((0 until 100).map(i => Tuple1(s"r$i")), 7))
      .toDF("v")
    val indexed = Enrich.withRowIndex(df)
    val rows = indexed.orderBy("_row_idx").collect()
    assert(rows.map(_.getLong(1)).toSeq == (0L until 100L))
    assert(rows.map(_.getString(0)).toSeq == (0 until 100).map(i => s"r$i"))
  }
}
