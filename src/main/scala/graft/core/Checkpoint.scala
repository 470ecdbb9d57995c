package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage-truncating materialization with a session-selectable
  * durability policy — the knob behind every eager checkpoint in the
  * operators ([[graft.operators.Dedup]], [[graft.operators.Relevance]],
  * [[graft.operators.Decontaminate]]).
  *
  * `local` (default): `localCheckpoint` — blocks live on executors,
  * non-replicated. Fastest, and blocks are ContextCleaner-freed once the
  * result is unreferenced; the trade is that losing an executor loses
  * its blocks, failing jobs that still reference the checkpointed frame
  * (they cannot recompute — lineage was truncated). Right for prompt
  * consumption on stable clusters, and for local mode where there is no
  * executor to lose.
  *
  * `reliable`: `checkpoint` to `sparkContext.getCheckpointDir` (HDFS/S3)
  * — survives executor loss, the policy for long jobs on preemptible /
  * spot clusters (the SURVEY §8.3 caveat this knob closes). Costs a
  * write of the materialized set to distributed storage. NOTE: reliable
  * checkpoint files are only auto-deleted when
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true`; otherwise
  * clean the checkpoint dir between jobs.
  *
  * Both policies materialize eagerly and truncate lineage, so operator
  * semantics are IDENTICAL either way (DedupSpec asserts it) — only the
  * failure-recovery/cost trade moves. */
object Checkpoint {

  /** Session conf key; values: `local` (default) | `reliable`. */
  val PolicyKey = "spark.graft.checkpoint.policy"

  def materialize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get(PolicyKey, "local") match {
      case "local" => df.localCheckpoint(eager = true)
      case "reliable" =>
        require(spark.sparkContext.getCheckpointDir.isDefined,
          s"$PolicyKey=reliable requires SparkContext.setCheckpointDir first")
        df.checkpoint(eager = true)
      case other =>
        throw new IllegalArgumentException(
          s"$PolicyKey must be local|reliable, got '$other'")
    }
  }
}
