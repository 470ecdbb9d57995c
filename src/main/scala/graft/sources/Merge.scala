package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus MERGE/upsert — the maintenance step that APPLIES churn
  * ([[graft.operators.Snapshot.changedRows]] computes it; nothing
  * applied it before): fold a batch of upserts + deletes into a
  * standing corpus with copy-on-write partition rewrite and an atomic
  * metadata commit.
  *
  * Layout (the manifest-pointer scheme every table format uses —
  * published in the Iceberg/Delta papers — reduced to the minimum that
  * gives exactly-once semantics):
  *
  *   root/data/v<N>/_pt=<p>/part-*.parquet   immutable, written once
  *   root/manifest/v<N>.json                 pt -> data dir (relative)
  *
  * The CURRENT snapshot is the highest committed manifest version; a
  * commit is one atomic rename of a fully-written temp manifest to its
  * final name. Rows hash-bucket by id into `nBuckets` partitions, so an
  * id's partition is deterministic and an upsert touches only the
  * buckets its ids land in:
  *
  *   - touched buckets rewrite out-of-place under `data/v<N+1>/`
  *     (read old bucket -> anti-join change ids -> union upserts);
  *   - untouched buckets carry over as MANIFEST POINTERS to their
  *     existing dirs — zero data read, zero data written, which is the
  *     only shape that survives a 100 TB corpus taking a 10 GB batch;
  *   - a crash anywhere before the manifest rename leaves the previous
  *     snapshot fully intact (new data dirs are unreferenced orphans —
  *     [[vacuum]] reclaims them).
  *
  * Changeset semantics (one changeset, upsert-wins):
  *   final = corpus ∖ (upsertIds ∪ deleteIds) ∪ upserts
  * so an id present in both a delete and an upsert is REPLACED. */
object Merge {

  private case class Manifest(version: Int, nBuckets: Int, idCol: String,
                              partitions: Map[Int, String],
                              lastBatchId: Option[Long] = None)

  // ---- public API ------------------------------------------------------

  /** Create version 0 from `df`. `nBuckets` fixes the partition grid for
    * the table's life (pick ~corpus_bytes / 1 GB at scale). */
  def init(df: DataFrame, root: String, idCol: String, nBuckets: Int): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    val spark = df.sparkSession
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new Path(root, "manifest")), s"$root is already a Merge table")
    val dataDir = s"data/v0-${attemptId()}"
    writeBuckets(df, root, dataDir, idCol, nBuckets)
    val parts = listWrittenBuckets(spark, root, dataDir)
      .map(p => p -> s"$dataDir/_pt=$p").toMap
    commit(spark, root, Manifest(0, nBuckets, idCol, parts))
  }

  /** The CURRENT snapshot (all buckets, original columns). */
  def read(spark: SparkSession, root: String): DataFrame = {
    val m = currentManifest(spark, root)
    readPaths(spark, root, m.partitions.values.toSeq)
  }

  /** Only the bucket an id hashes to — the point-lookup path: one
    * bucket's files, not a corpus scan. */
  def readBucketOf(spark: SparkSession, root: String,
                   id: org.apache.spark.sql.Column): DataFrame = {
    val m = currentManifest(spark, root)
    val p = bucketOfLiteral(spark, id, m.nBuckets)
    m.partitions.get(p) match {
      case Some(rel) => readPaths(spark, root, Seq(rel))
      case None => read(spark, root).limit(0)
    }
  }

  /** Apply one changeset. `upserts` carries the full corpus schema;
    * `deleteIds` is a one-column frame of ids (may be empty). Returns
    * the new version number. Work: one distributed job over ONLY the
    * touched buckets + the batch; untouched buckets move as pointers. */
  def upsert(spark: SparkSession, root: String,
             upserts: DataFrame, deleteIds: DataFrame): Int =
    upsertFrom(spark, root, currentManifest(spark, root), upserts, deleteIds,
      batchId = None)

  /** [[upsert]] for writers that know the changeset's EXACT id set on
    * the driver (the resumable chunk loops: cache ids derive from a
    * contiguous index range) — the touched-bucket set is computed
    * locally via [[bucketOf]] instead of the distinct+collect job over
    * the changeset, one fewer action per commit (r21, guide §2
    * overhead). `changedIds` MUST cover every id in
    * `upserts` ∪ `deleteIds`: a missing id's bucket would not be
    * rewritten, leaving the OLD row alive next to the new one —
    * corruption, not slowness. Extra ids only rewrite unchanged buckets
    * (wasted IO, still correct). MergeSpec pins [[bucketOf]] against
    * the SQL bucket expression. */
  def upsertKnownIds(spark: SparkSession, root: String,
                     upserts: DataFrame, deleteIds: DataFrame,
                     changedIds: Iterable[String]): Int = {
    val m = currentManifest(spark, root)
    val touched = changedIds.iterator.map(bucketOf(_, m.nBuckets)).toSet
    upsertFrom(spark, root, m, upserts, deleteIds, batchId = None,
      knownTouched = Some(touched))
  }

  /** Driver-side twin of the SQL bucket expression
    * (`pmod(xxhash64(cast(id as string)), nBuckets)`) — byte-identical
    * hashing via catalyst's own interpreted xxhash64. */
  def bucketOf(id: String, nBuckets: Int): Int = {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(id)
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      u, org.apache.spark.sql.types.StringType, 42L)
    (((h % nBuckets) + nBuckets) % nBuckets).toInt
  }

  /** [[upsert]] keyed by a monotonic `batchId` — the exactly-once seam
    * for Structured Streaming's `foreachBatch` (micro-batch ids are
    * monotonic per query; a restart REPLAYS the last uncommitted one).
    * The id commits atomically WITH the manifest, so a replayed batch
    * observes `lastBatchId >= batchId` and no-ops instead of
    * double-applying its upserts. Manual [[upsert]] calls interleave
    * safely: they carry the recorded id forward untouched. */
  def upsertBatch(spark: SparkSession, root: String, batchId: Long,
                  upserts: DataFrame, deleteIds: DataFrame): Int = {
    val m = currentManifest(spark, root)
    if (m.lastBatchId.exists(_ >= batchId)) m.version // replay: already applied
    else upsertFrom(spark, root, m, upserts, deleteIds, Some(batchId))
  }

  /** A `(batch, batchId) => Unit` for
    * `stream.writeStream.foreachBatch(Merge.foreachBatchUpsert(root))`:
    * each micro-batch upserts by the table's id column (pure-insert
    * streams are upserts whose ids are new), idempotent across restarts
    * via [[upsertBatch]]. */
  def foreachBatchUpsert(root: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val spark = batch.sparkSession
      val idCol = currentManifest(spark, root).idCol
      upsertBatch(spark, root, batchId, batch,
        batch.select(col(idCol)).limit(0))
      ()
    }

  private def upsertFrom(spark: SparkSession, root: String, m: Manifest,
                         upserts: DataFrame, deleteIds: DataFrame,
                         batchId: Option[Long],
                         knownTouched: Option[Set[Int]] = None): Int = {
    val idCol = m.idCol
    val newV = m.version + 1
    // UNIQUE dir per attempt: two concurrent upserts racing for version
    // N+1 must not write into one directory — the commit-rename loser's
    // part files would silently pollute the winner's committed snapshot.
    // A crashed attempt's dir likewise never wedges the next attempt
    // (mode errorifexists targets a fresh path every time); orphans are
    // unreferenced and vacuum reclaims them.
    val dataDir = s"data/v$newV-${attemptId()}"

    // changed ids, bucketed. Driver-side bucket LIST only (<= nBuckets
    // values — bounded by the partition grid, not the data). Callers
    // that know the id set pass the buckets precomputed ([[bucketOf]]);
    // the anti-join below still uses the DataFrame-side ids either way.
    val changeIds = upserts.select(col(idCol))
      .unionByName(deleteIds.toDF(idCol)).distinct()
    val touched = knownTouched.getOrElse(changeIds
      .select(bucketExpr(col(idCol), m.nBuckets).as("_pt")).distinct()
      .collect().map(_.getInt(0)).toSet)
    if (touched.isEmpty) return m.version // empty changeset: no new version

    // surviving old rows of touched buckets: read ONLY those dirs,
    // anti-join the (typically batch-sized, broadcastable) change ids
    val touchedRels = m.partitions.filter(t => touched(t._1)).values.toSeq
    val oldTouched =
      if (touchedRels.isEmpty) upserts.limit(0).drop("_pt")
      else readPaths(spark, root, touchedRels)
    val survivors = oldTouched.join(broadcast(changeIds), Seq(idCol), "left_anti")

    writeBuckets(survivors.unionByName(upserts.select(oldTouched.columns.map(col): _*)),
      root, dataDir, idCol, m.nBuckets)

    // a bucket can come out EMPTY (all rows deleted) — partitionBy wrote
    // no dir for it; it simply leaves the manifest
    val written = listWrittenBuckets(spark, root, dataDir)
      .map(p => p -> s"$dataDir/_pt=$p").toMap
    val untouched = m.partitions.filter(t => !touched(t._1))
    commit(spark, root, Manifest(newV, m.nBuckets, idCol, untouched ++ written,
      batchId.orElse(m.lastBatchId)))
    newV
  }

  /** Re-grid the table to a new bucket count — the escape hatch for the
    * one parameter [[init]] fixes for the table's life: a corpus that
    * grew 100x since init has buckets 100x oversized (slow point
    * lookups, oversized upsert rewrites). The id→bucket map changes, so
    * this is necessarily a FULL rewrite (work ∝ corpus size — one
    * distributed job, the same shape as a compaction); the new grid
    * commits atomically like any version, so readers never observe a
    * mixed grid, a crash leaves the old grid fully intact, and the old
    * version stays time-travelable until vacuumed. */
  def rebucket(spark: SparkSession, root: String, newNBuckets: Int): Int = {
    require(newNBuckets > 0, "newNBuckets must be positive")
    val m = currentManifest(spark, root)
    require(newNBuckets != m.nBuckets, s"table already has $newNBuckets buckets")
    val newV = m.version + 1
    val dataDir = s"data/v$newV-${attemptId()}"
    if (m.partitions.nonEmpty) {
      val all = readPaths(spark, root, m.partitions.values.toSeq)
      writeBuckets(all, root, dataDir, m.idCol, newNBuckets)
    }
    val written = listWrittenBuckets(spark, root, dataDir)
      .map(p => p -> s"$dataDir/_pt=$p").toMap
    commit(spark, root, Manifest(newV, newNBuckets, m.idCol, written, m.lastBatchId))
    newV
  }

  /** Delete data dirs no manifest within `keepVersions` of CURRENT
    * references (crash orphans + aged-out snapshots), then drop the old
    * manifests. Never touches the current snapshot.
    *
    * `minAgeMs`: an unreferenced leaf dir younger than this is SKIPPED —
    * it is indistinguishable from the unique attempt dir of a concurrent
    * IN-FLIGHT upsert that has not yet renamed its manifest (deleting it
    * would let that upsert commit a snapshot pointing at vanished data).
    * The 1 h default covers any realistic write+commit window, same
    * retention idea as Iceberg/Delta vacuum; pass 0 only when the caller
    * KNOWS no writer is concurrent (single-writer batch jobs, tests). */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int = 1,
             minAgeMs: Long = 3600000L): Unit = {
    require(keepVersions >= 1, "must keep at least the current version")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = manifestVersions(spark, root)
    val keep = versions.sorted.takeRight(keepVersions)
    // fully-QUALIFIED comparison on both sides: a relative `root` would
    // otherwise never match listStatus's absolute paths and vacuum
    // would delete the CURRENT snapshot's data. Compare the PATH
    // component (authority-independent — `file:/x` and `file:///x`
    // stringify differently for the same location).
    def qualified(p: Path): String = fs.makeQualified(p).toUri.getPath
    val live: Set[String] = keep.flatMap(v =>
      readManifest(spark, root, v).partitions.values.map(rel =>
        qualified(new Path(new Path(root), rel)))).toSet
    val dataRoot = new Path(root, "data")
    val cutoff = System.currentTimeMillis() - minAgeMs
    if (fs.exists(dataRoot)) fs.listStatus(dataRoot).foreach { vDir =>
      val leaves = fs.listStatus(vDir.getPath)
      leaves.foreach { leaf =>
        if (!live(qualified(leaf.getPath)) &&
            leaf.getModificationTime <= cutoff) fs.delete(leaf.getPath, true)
      }
      if (fs.listStatus(vDir.getPath).isEmpty) fs.delete(vDir.getPath, false)
    }
    versions.filterNot(keep.contains).foreach(v =>
      fs.delete(new Path(root, f"manifest/v$v%05d.json"), false))
  }

  /** Current committed version (highest manifest present). */
  def currentVersion(spark: SparkSession, root: String): Int =
    manifestVersions(spark, root).max

  /** All committed versions still on disk, ascending — the time-travel
    * horizon ([[vacuum]]'s `keepVersions` is the retention knob). */
  def versions(spark: SparkSession, root: String): Seq[Int] =
    manifestVersions(spark, root).sorted

  /** Time travel: the corpus exactly as of committed version `v`.
    * Manifests are immutable and data dirs are write-once, so an old
    * snapshot is just its manifest's pointer set — zero reconstruction
    * work (the Iceberg/Delta read path). Fails loud if `v` was
    * vacuumed. */
  def readVersion(spark: SparkSession, root: String, v: Int): DataFrame = {
    val have = manifestVersions(spark, root)
    require(have.contains(v),
      s"version $v is not on disk (have: ${have.sorted.mkString(",")}) — vacuumed or never committed")
    readPaths(spark, root, readManifest(spark, root, v).partitions.values.toSeq)
  }

  /** CDC change feed between two committed versions: every row whose
    * content differs, labeled `_change` ∈ insert / update / delete.
    * Insert and update rows carry the NEW image, deletes the OLD one.
    *
    * Scale shape: buckets whose manifest pointer is IDENTICAL in both
    * versions cannot contain changes (data dirs are write-once), so only
    * pointer-diff buckets are read — work ∝ touched buckets, the same
    * bound as [[upsert]] itself. The one exception is a [[rebucket]]
    * between the versions (different grids): every bucket counts as
    * touched and the diff degrades to a full-table compare, still
    * correct. Updates are decided by null-safe struct equality over the
    * full row — exact, no hash-collision risk. */
  def changes(spark: SparkSession, root: String,
              fromVersion: Int, toVersion: Int): DataFrame = {
    require(fromVersion <= toVersion,
      s"fromVersion $fromVersion must be <= toVersion $toVersion")
    val m1 = readManifest(spark, root, fromVersion)
    val m2 = readManifest(spark, root, toVersion)
    val idCol = m2.idCol
    val (oldRels, newRels) =
      if (m1.nBuckets == m2.nBuckets) {
        val touched = (m1.partitions.keySet ++ m2.partitions.keySet).toSeq.sorted
          .filter(p => m1.partitions.get(p) != m2.partitions.get(p))
        (touched.flatMap(m1.partitions.get), touched.flatMap(m2.partitions.get))
      } else (m1.partitions.values.toSeq, m2.partitions.values.toSeq)
    if (oldRels.isEmpty && newRels.isEmpty) {
      // no pointer moved: empty feed with the table schema
      val empty = read(spark, root).limit(0)
      return empty.select(lit("").as("_change") +: empty.columns.map(col): _*).limit(0)
    }
    val base = readPaths(spark, root, (oldRels ++ newRels).distinct).limit(0)
    val oldDf = if (oldRels.isEmpty) base else readPaths(spark, root, oldRels)
    val newDf = if (newRels.isEmpty) base else readPaths(spark, root, newRels)
    val cols = newDf.columns
    val o = oldDf.select(col(idCol).as("_cdc_id"),
      struct(cols.map(col): _*).as("_old"))
    val n = newDf.select(col(idCol).as("_cdc_id2"),
      struct(cols.map(col): _*).as("_new"))
    o.join(n, col("_cdc_id") === col("_cdc_id2"), "full_outer")
      .filter(col("_old").isNull || col("_new").isNull || !(col("_old") <=> col("_new")))
      .select(
        when(col("_old").isNull, lit("insert"))
          .when(col("_new").isNull, lit("delete"))
          .otherwise(lit("update")).as("_change"),
        coalesce(col("_new"), col("_old")).as("_row"))
      .select(col("_change") +: cols.map(c => col(s"_row.`$c`").as(c)): _*)
  }

  // ---- internals -------------------------------------------------------

  private def attemptId(): String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(10)

  private def bucketExpr(id: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(xxhash64(id.cast("string")), lit(nBuckets.toLong)).cast("int")

  private def bucketOfLiteral(spark: SparkSession, id: org.apache.spark.sql.Column,
                              nBuckets: Int): Int = {
    import spark.implicits._
    Seq(1).toDF("x").select(bucketExpr(id, nBuckets)).head().getInt(0)
  }

  /** One distributed write of `df` partitioned by bucket under
    * `root/dataDir`. repartition on the bucket first so each bucket is
    * one task's output (no small-file spray from partitionBy); rows
    * sort by id within the bucket (tight row-group min/max) and the id
    * carries a parquet bloom filter — [[readBucketOf]] point lookups
    * then prune at the directory, row-group-stats, AND bloom levels
    * (ids are unique, so dictionary encoding would blow out anyway —
    * see [[PartitionedParquet.writeIndexed]] for why bloom columns
    * disable it). */
  private def writeBuckets(df: DataFrame, root: String, dataDir: String,
                           idCol: String, nBuckets: Int): Unit =
    df.withColumn("_pt", bucketExpr(col(idCol), nBuckets))
      // EXPLICIT partition count (r21): an un-numbered repartition let
      // AQE coalesce the byte-small fixture shuffle to ONE task, which
      // then wrote every touched bucket's (bloom-filtered) file
      // serially. Pinning to the bucket grid keeps one task per
      // TOUCHED bucket at any scale — empty reduce partitions are
      // never scheduled, so a 5-bucket upsert on a 100k-bucket grid
      // still runs 5 tasks, not 100k.
      .repartition(nBuckets, col("_pt"))
      .sortWithinPartitions(col("_pt"), col(idCol))
      .write
      .option(s"parquet.bloom.filter.enabled#$idCol", "true")
      .option(s"parquet.bloom.filter.expected.ndv#$idCol", 1000000L)
      .option(s"parquet.enable.dictionary#$idCol", "false")
      .partitionBy("_pt").mode("errorifexists")
      .parquet(new Path(new Path(root), dataDir).toString)

  private def listWrittenBuckets(spark: SparkSession, root: String,
                                 dataDir: String): Seq[Int] = {
    val p = new Path(new Path(root), dataDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("_pt=")).map(_.stripPrefix("_pt=").toInt)
  }

  private def readPaths(spark: SparkSession, root: String, rels: Seq[String]): DataFrame =
    spark.read.parquet(rels.map(r => new Path(new Path(root), r).toString): _*)

  private def manifestVersions(spark: SparkSession, root: String): Seq[Int] = {
    val dir = new Path(root, "manifest")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(dir), s"$root is not a Merge table (no manifest/)")
    val vs = fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toInt)
    require(vs.nonEmpty, s"$root has no committed manifest")
    vs
  }

  private def currentManifest(spark: SparkSession, root: String): Manifest =
    readManifest(spark, root, manifestVersions(spark, root).max)

  private def readManifest(spark: SparkSession, root: String, v: Int): Manifest = {
    val p = new Path(root, f"manifest/v$v%05d.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val json = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    val parsed = JsonMethods.parse(json)
    Manifest(
      (parsed \ "version").extract[Int],
      (parsed \ "nBuckets").extract[Int],
      (parsed \ "idCol").extract[String],
      (parsed \ "partitions").extract[Map[String, String]].map { case (k, v2) => k.toInt -> v2 },
      (parsed \ "lastBatchId").extractOpt[Long])
  }

  /** The commit point: write the manifest to a temp name, then ONE
    * rename to `v<N>.json`. Rename-to-fresh-name is atomic on HDFS and
    * local FS; a concurrent committer of the same version loses the
    * rename and fails loud instead of silently overwriting. */
  private def commit(spark: SparkSession, root: String, m: Manifest): Unit = {
    val dir = new Path(root, "manifest")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    val dest = new Path(dir, f"v${m.version}%05d.json")
    require(!fs.exists(dest), s"version ${m.version} already committed (concurrent writer?)")
    val json = {
      val parts = m.partitions.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":${quote(v)}""" }.mkString("{", ",", "}")
      val batch = m.lastBatchId.map(b => s""","lastBatchId":$b""").getOrElse("")
      s"""{"version":${m.version},"nBuckets":${m.nBuckets},"idCol":${quote(m.idCol)}$batch,"partitions":$parts}"""
    }
    val tmp = new Path(dir, s".tmp-v${m.version}-${System.nanoTime()}.json")
    val out = fs.create(tmp, false)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, dest)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"commit of version ${m.version} lost the rename race — retry the upsert")
    }
  }

  private def quote(s: String): String = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}
