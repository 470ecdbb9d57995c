package graft.core

import org.apache.spark.sql.SparkSession

/** Session bootstrap for the graft engine.
  *
  * Defaults are chosen for the local[32] harness but mirror what a
  * 1000-executor cluster deployment would set: AQE on (runtime re-plan,
  * skew-join splitting, dynamic coalesce), UTC session time, shuffle
  * partitions sized to the parallelism actually available rather than
  * Spark's default 200.
  */
object GraftSession {

  /** Shuffle partitions: on local[N] match N; a cluster submit would
    * override via --conf (2-3x total executor cores is the usual rule).
    */
  def defaultCpus: Int = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
    .getOrElse(Runtime.getRuntime.availableProcessors())

  def builder(appName: String = "graft", cpus: Int = defaultCpus): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // Let AQE re-plan (and coalesce) the output partitioning of plans
      // that feed a .persist(): off by default, which leaves cached
      // frames at the static shuffle-partition count — a tiny cached
      // edge list materialized as 64 near-empty partitions re-read as
      // 128 near-empty cache blocks downstream (graph prologues,
      // measured r20). Scale-neutral: AQE sizes partitions by bytes.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")

  /** Get-or-create with graft defaults (used by tests and mains); graft's
    * native SQL functions are registered on the session. */
  def get(appName: String = "graft"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.registerAll(s)
    graft.plans.TopK.install(s) // native top-k strategy + window rewrite
    s
  }
}
