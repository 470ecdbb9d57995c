package graft

import graft.sources.Merge
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Merge table: upsert/delete semantics, copy-on-write scope (untouched
  * buckets are POINTERS, not rewrites), crash safety (no manifest rename
  * -> previous snapshot intact), point-lookup bucket read, vacuum. */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def table(n: Int): (String, org.apache.spark.sql.DataFrame) = {
    val root = Files.createTempDirectory("graft_merge").toString
    val df = (0 until n).map(i => (i.toLong, s"text-$i", i % 3)).toDF("id", "text", "grp")
    Merge.init(df, root, "id", nBuckets = 8)
    (root, df)
  }

  test("upsert-wins changeset: replace, insert, delete land exactly") {
    val (root, _) = table(100)
    val ups = Seq((7L, "SEVEN", 0), (200L, "NEW", 1)).toDF("id", "text", "grp")
    val dels = Seq(7L, 13L, 999L).toDF("id") // 7 also upserted -> replaced; 999 absent -> no-op
    val v = Merge.upsert(spark, root, ups, dels)
    assert(v === 1 && Merge.currentVersion(spark, root) === 1)
    val got = Merge.read(spark, root).orderBy("id").collect()
    assert(got.length === 100) // -1 (13 deleted) +1 (200 new)
    val byId = got.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(7L) === "SEVEN")
    assert(byId(200L) === "NEW")
    assert(!byId.contains(13L))
    assert(byId(42L) === "text-42")
  }

  test("copy-on-write: untouched buckets keep their v0 data dirs") {
    val (root, _) = table(200)
    // a single-id changeset touches exactly one bucket
    val ups = Seq((5L, "FIVE", 0)).toDF("id", "text", "grp")
    Merge.upsert(spark, root, ups, spark.emptyDataset[Long].toDF("id"))
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "manifest", "v00001.json")))
    // data dirs carry a per-attempt suffix (concurrent-writer isolation)
    val v0refs = "data/v0-[0-9a-f]+/_pt=".r.findAllIn(manifest).size
    val v1refs = "data/v1-[0-9a-f]+/_pt=".r.findAllIn(manifest).size
    assert(v1refs === 1, s"one touched bucket, got $v1refs: $manifest")
    assert(v0refs === 7, s"seven untouched buckets must stay v0 pointers, got $v0refs")
    assert(Merge.read(spark, root).count() === 200)
  }

  test("read PLAN scans the manifest's pointer dirs directly — the pipeline_ingest landing contract") {
    // not just the manifest layout (the copy-on-write test above): the
    // actual scan must read untouched buckets from their OLD version
    // dirs and only the touched bucket from the new one. A refactor
    // that rewrote every bucket per commit — or consolidated reads
    // through a copied snapshot — would stay value-correct and blow the
    // write/read amplification at 100 TB; this pins the plan.
    val (root, _) = table(200)
    val ups = Seq((5L, "FIVE", 0)).toDF("id", "text", "grp")
    Merge.upsert(spark, root, ups, spark.emptyDataset[Long].toDF("id"))
    val files = Merge.read(spark, root).inputFiles
    val v0 = files.count(_.matches(".*data/v0-[0-9a-f]+/_pt=.*"))
    val v1 = files.count(_.matches(".*data/v1-[0-9a-f]+/_pt=.*"))
    assert(v1 >= 1, s"touched bucket must read from v1: ${files.mkString("\n")}")
    assert(v0 >= 7, s"untouched buckets must read from their v0 pointer dirs: ${files.mkString("\n")}")
    assert(v0 + v1 === files.length, "no file outside the two manifest versions")
    val buckets = files.flatMap("_pt=([0-9]+)".r.findFirstMatchIn(_).map(_.group(1))).toSet
    assert(buckets.size === 8, s"all 8 buckets covered, got $buckets")
  }

  test("crash safety: written data without a manifest commit is invisible") {
    val (root, df) = table(50)
    val before = Merge.read(spark, root).orderBy("id").collect()
    // simulate a crash AFTER data write, BEFORE commit: drop orphan data
    // dirs where a failed upsert would leave them
    df.limit(5).withColumn("text", lit("GHOST"))
      .write.parquet(s"$root/data/v1/_pt=3")
    val after = Merge.read(spark, root).orderBy("id").collect()
    assert(after.toSeq === before.toSeq, "uncommitted data dirs must never be read")
    assert(Merge.currentVersion(spark, root) === 0)
    // and a FAILING upsert (bad changeset evaluation) leaves the table intact
    val boom = udf((s: String) => { throw new RuntimeException("boom"); s })
    intercept[Exception] {
      Merge.upsert(spark, root,
        df.limit(3).withColumn("text", boom(col("text"))),
        spark.emptyDataset[Long].toDF("id"))
    }
    assert(Merge.read(spark, root).orderBy("id").collect().toSeq === before.toSeq)
    assert(Merge.currentVersion(spark, root) === 0)
  }

  test("empty changeset is a no-op, not a new version") {
    val (root, _) = table(20)
    val v = Merge.upsert(spark, root,
      spark.emptyDataset[(Long, String, Int)].toDF("id", "text", "grp"),
      spark.emptyDataset[Long].toDF("id"))
    assert(v === 0 && Merge.currentVersion(spark, root) === 0)
  }

  test("point lookup reads one bucket and finds the row") {
    val (root, _) = table(64)
    val hit = Merge.readBucketOf(spark, root, lit(17L))
      .where(col("id") === 17L).collect()
    assert(hit.length === 1 && hit(0).getString(1) === "text-17")
  }

  test("bucket files carry an id bloom filter for sub-bucket point pruning") {
    import scala.jdk.CollectionConverters._
    val (root, _) = table(64)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leaf = fs.globStatus(new org.apache.hadoop.fs.Path(s"$root/data/v0-*/_pt=*/part-*.parquet")).head
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        leaf.getPath, spark.sparkContext.hadoopConfiguration))
    try {
      val b = r.getFooter.getBlocks.get(0)
      val idc = b.getColumns.asScala.find(_.getPath.toDotString == "id").get
      assert(r.getBloomFilterDataReader(b).readBloomFilter(idc) != null,
        "merge buckets must write the id bloom filter")
    } finally r.close()
  }

  test("vacuum reclaims orphans and aged versions, never the current snapshot") {
    val (root, _) = table(40)
    Merge.upsert(spark, root, Seq((1L, "ONE", 0)).toDF("id", "text", "grp"),
      spark.emptyDataset[Long].toDF("id"))
    // orphan from a simulated crashed writer
    Seq((999L, "GHOST", 0)).toDF("id", "text", "grp")
      .write.parquet(s"$root/data/v9/_pt=0")
    val snapshot = Merge.read(spark, root).orderBy("id").collect()
    Merge.vacuum(spark, root, keepVersions = 1, minAgeMs = 0L)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "data", "v9")),
      "orphan data must be reclaimed")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "manifest", "v00000.json")),
      "aged manifest must drop")
    assert(Merge.read(spark, root).orderBy("id").collect().toSeq === snapshot.toSeq,
      "vacuum must not change the current snapshot")
  }

  test("vacuum with a RELATIVE table root never deletes live data") {
    val rel = s"target/merge_rel_${System.nanoTime()}"
    try {
      val df = (0 until 30).map(i => (i.toLong, s"t$i")).toDF("id", "text")
      Merge.init(df, rel, "id", nBuckets = 4)
      Merge.upsert(spark, rel, Seq((1L, "ONE")).toDF("id", "text"),
        spark.emptyDataset[Long].toDF("id"))
      val before = Merge.read(spark, rel).orderBy("id").collect()
      Merge.vacuum(spark, rel, keepVersions = 1, minAgeMs = 0L)
      assert(Merge.read(spark, rel).orderBy("id").collect().toSeq === before.toSeq,
        "qualified-path comparison must protect the current snapshot under relative roots")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(rel)).deleteRecursively()
    }
  }

  test("a crashed attempt's orphan data dir never wedges the next upsert") {
    val (root, df) = table(20)
    // simulate a crashed writer that claimed version 1 with its own dir
    df.limit(2).withColumn("text", lit("GHOST"))
      .write.parquet(s"$root/data/v1-deadbeef00/_pt=0")
    val v = Merge.upsert(spark, root, Seq((3L, "THREE", 0)).toDF("id", "text", "grp"),
      spark.emptyDataset[Long].toDF("id"))
    assert(v === 1, "fresh per-attempt dirs make the orphan irrelevant")
    val byId = Merge.read(spark, root).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(3L) === "THREE" && !byId.values.exists(_ == "GHOST"))
  }

  test("time travel: every committed version reads back exactly; vacuum bounds the horizon") {
    val (root, _) = table(60)
    Merge.upsert(spark, root, Seq((5L, "FIVE", 0)).toDF("id", "text", "grp"),
      spark.emptyDataset[Long].toDF("id"))
    Merge.upsert(spark, root, Seq((61L, "NEW", 1)).toDF("id", "text", "grp"),
      Seq(9L).toDF("id"))
    assert(Merge.versions(spark, root) === Seq(0, 1, 2))
    // v0: the original 60 rows, untouched by later churn
    val v0 = Merge.readVersion(spark, root, 0)
    assert(v0.count() === 60)
    assert(v0.filter($"id" === 5L).select("text").as[String].head() === "text-5")
    // v1: the replace landed, the later delete/insert did not
    val v1 = Merge.readVersion(spark, root, 1)
    assert(v1.filter($"id" === 5L).select("text").as[String].head() === "FIVE")
    assert(v1.filter($"id" === 61L).count() === 0 && v1.filter($"id" === 9L).count() === 1)
    // v2 == current
    assert(Merge.readVersion(spark, root, 2).orderBy("id").collect().toSeq ===
      Merge.read(spark, root).orderBy("id").collect().toSeq)
    // retention: keep 2 -> v0 is gone (manifest AND its exclusive dirs),
    // v1 and v2 still read
    Merge.vacuum(spark, root, keepVersions = 2, minAgeMs = 0L)
    assert(Merge.versions(spark, root) === Seq(1, 2))
    intercept[IllegalArgumentException](Merge.readVersion(spark, root, 0))
    assert(Merge.readVersion(spark, root, 1).count() === 60)
  }

  test("batch-keyed upsert: a replayed micro-batch never double-applies") {
    val (root, _) = table(40)
    val b1 = Seq((100L, "B1", 0)).toDF("id", "text", "grp")
    val none = spark.emptyDataset[Long].toDF("id")
    val v1 = Merge.upsertBatch(spark, root, batchId = 1L, b1, none)
    assert(v1 === 1)
    // restart replays batch 1 (possibly with identical content): no-op
    assert(Merge.upsertBatch(spark, root, batchId = 1L, b1, none) === 1)
    assert(Merge.currentVersion(spark, root) === 1)
    assert(Merge.read(spark, root).filter($"id" === 100L).count() === 1)
    // a LATER batch applies; a manual (unkeyed) upsert between batches
    // carries the recorded id forward, so replay protection survives it
    Merge.upsert(spark, root, Seq((101L, "MANUAL", 0)).toDF("id", "text", "grp"), none)
    assert(Merge.upsertBatch(spark, root, batchId = 1L, b1, none) ===
      Merge.currentVersion(spark, root), "old batch still skipped after manual upsert")
    val v3 = Merge.upsertBatch(spark, root, batchId = 2L,
      Seq((102L, "B2", 0)).toDF("id", "text", "grp"), none)
    assert(Merge.read(spark, root).count() === 43)
    assert(v3 === Merge.currentVersion(spark, root))
  }

  test("streaming sink: foreachBatch(Merge.foreachBatchUpsert) lands micro-batches exactly-once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = Files.createTempDirectory("graft_merge_stream").toString
    Merge.init(Seq((0L, "seed")).toDF("id", "text"), root, "id", nBuckets = 4)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("id", "text").writeStream
      .foreachBatch(Merge.foreachBatchUpsert(root))
      .option("checkpointLocation", Files.createTempDirectory("graft_merge_ckpt").toString)
      .start()
    try {
      in.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      in.addData((2L, "b2"), (3L, "c"))
      q.processAllAvailable()
      val got = Merge.read(spark, root).orderBy("id").as[(Long, String)].collect().toSeq
      assert(got === Seq((0L, "seed"), (1L, "a"), (2L, "b2"), (3L, "c")),
        "late batch upserts by id (2 replaced), earlier rows persist")
    } finally q.stop()
  }

  test("rebucket: new grid carries every row; lookups and upserts keep working") {
    val (root, df) = table(120)
    val before = Merge.read(spark, root).orderBy("id").collect().toSeq
    val v = Merge.rebucket(spark, root, newNBuckets = 16)
    assert(v === 1)
    assert(Merge.read(spark, root).orderBy("id").collect().toSeq === before,
      "re-gridding is content-neutral")
    // manifest now spans the 16-grid (more than the old 8 buckets used)
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "manifest", "v00001.json")))
    assert(manifest.contains("\"nBuckets\":16"))
    // point lookup under the NEW grid finds its row
    assert(Merge.readBucketOf(spark, root, lit(42L)).filter($"id" === 42L).count() === 1)
    // upserts target the new grid; the old version still time-travels
    Merge.upsert(spark, root, Seq((42L, "NEW", 0)).toDF("id", "text", "grp"),
      spark.emptyDataset[Long].toDF("id"))
    assert(Merge.read(spark, root).filter($"id" === 42L).select("text").as[String].head() === "NEW")
    assert(Merge.readVersion(spark, root, 0).orderBy("id").collect().toSeq === before)
    // degenerate guard: same grid is refused
    intercept[IllegalArgumentException](Merge.rebucket(spark, root, 16))
  }

  test("changes: insert/update/delete labeled exactly; unchanged rows absent") {
    val (root, _) = table(100)
    val ups = Seq((7L, "SEVEN", 0), (13L, "text-13", 1), (200L, "NEW", 1))
      .toDF("id", "text", "grp") // 13 re-upserted with IDENTICAL content (grp 13%3=1)
    val dels = Seq(21L).toDF("id")
    Merge.upsert(spark, root, ups, dels)
    val got = Merge.changes(spark, root, 0, 1)
      .select("_change", "id", "text").as[(String, Long, String)].collect().toSet
    // 13's rewrite produced equal content in a rewritten bucket — the
    // struct compare must drop it; 21 deleted; 7 updated; 200 inserted
    assert(got === Set(("update", 7L, "SEVEN"), ("insert", 200L, "NEW"),
      ("delete", 21L, "text-21")))
  }

  test("changes reads only pointer-diff buckets; same-version feed is empty") {
    val (root, _) = table(200)
    Merge.upsert(spark, root, Seq((5L, "FIVE", 0)).toDF("id", "text", "grp"),
      spark.emptyDataset[Long].toDF("id"))
    val feed = Merge.changes(spark, root, 0, 1)
    // only the touched bucket's files appear in the scan
    val scanned = feed.queryExecution.executedPlan.toString
    val bucketDirs = "_pt=\\d+".r.findAllIn(scanned).toSet
    assert(bucketDirs.size <= 2, s"scanned buckets: $bucketDirs") // old + new dir of ONE bucket
    assert(feed.select("id").as[Long].collect().toSeq === Seq(5L))
    assert(Merge.changes(spark, root, 1, 1).count() === 0)
  }

  test("changes across a rebucket falls back to the full-grid diff, still exact") {
    val (root, _) = table(60)
    Merge.rebucket(spark, root, 16)
    Merge.upsert(spark, root, Seq((3L, "THREE", 0)).toDF("id", "text", "grp"),
      Seq(9L).toDF("id"))
    val got = Merge.changes(spark, root, 0, 2)
      .select("_change", "id").as[(String, Long)].collect().toSet
    assert(got === Set(("update", 3L), ("delete", 9L)))
  }

  test("deleting a whole bucket removes it from the manifest") {
    val root = Files.createTempDirectory("graft_merge_empty").toString
    // 2 buckets, few ids: delete every id of one bucket
    val df = (0 until 10).map(i => (i.toLong, s"t$i")).toDF("id", "text")
    Merge.init(df, root, "id", nBuckets = 2)
    val bucketOf = df.select(col("id"),
      pmod(xxhash64(col("id").cast("string")), lit(2L)).cast("int").as("b")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val victims = bucketOf.filter(_._2 == 0).keys.toSeq
    assume(victims.nonEmpty && victims.size < 10)
    Merge.upsert(spark, root, df.limit(0), victims.toDF("id"))
    val got = Merge.read(spark, root).select("id").as[Long].collect().toSet
    assert(got === bucketOf.filter(_._2 == 1).keys.toSet)
  }

  test("bucketOf (driver) matches the SQL bucket expression bit-for-bit") {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    // ascii, numeric-derived cache ids, unicode, empty — all grids
    val ids = Seq("req-0", "req-123456789-Summary", "résumé-7", "", "a" * 300) ++
      (0L until 500L).map(i => s"resume-oracle-$i")
    for (n <- Seq(1, 7, 16, 64)) {
      val sql = ids.toDF("id")
        .select(col("id"), pmod(xxhash64(col("id").cast("string")), lit(n.toLong)).cast("int").as("b"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      ids.foreach(id => assert(Merge.bucketOf(id, n) == sql(id),
        s"bucketOf('$id', $n) = ${Merge.bucketOf(id, n)} != SQL ${sql(id)}"))
    }
  }

  test("upsertKnownIds commits the same snapshot as upsert") {
    val (root, _) = table(40)
    val batch = Seq((3L, "NEW3", 0), (41L, "NEW41", 1)).toDF("id", "text", "grp")
    Merge.upsertKnownIds(spark, root, batch,
      batch.select("id").limit(0), Seq("3", "41"))
    val got = Merge.read(spark, root)
      .select("id", "text").as[(Long, String)].collect().toMap
    assert(got(3L) == "NEW3" && got(41L) == "NEW41" && got.size == 41)
  }

  test("vacuum retention: a YOUNG unreferenced dir (possible in-flight upsert) survives") {
    val (root, _) = table(20)
    // simulate another writer mid-upsert: data written, manifest not yet renamed
    Seq((999L, "INFLIGHT", 0)).toDF("id", "text", "grp")
      .write.parquet(s"$root/data/v1-cafebabe01/_pt=0")
    Merge.vacuum(spark, root, keepVersions = 1) // default minAge: 1 h
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "data", "v1-cafebabe01")),
      "a freshly-written attempt dir must NOT be vacuumed out from under a live writer")
    // explicit single-writer override reclaims it
    Merge.vacuum(spark, root, keepVersions = 1, minAgeMs = 0L)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "data", "v1-cafebabe01")))
  }

}
