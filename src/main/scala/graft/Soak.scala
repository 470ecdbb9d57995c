package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: scale soak of the heavy dedup/ANN family — generate a
  * 10x fixture from sf0.1 by TOKEN-BIJECTION replication, then time
  * each operator at 1x vs 10x and print per-op JSON.
  *
  * The replication construction: replica r of a document suffixes every
  * whitespace token with `z<r>`. A bijective token map carries shingle
  * sets bijectively, so intra-replica Jaccard/edit structure is
  * EXACTLY the original's, while replicas share zero shingles with
  * each other — true near-dup pairs scale exactly 10x at 10x the
  * corpus by construction. Anything super-linear that shows up in the
  * timings is therefore the ENGINE's doing, not the data's.
  *
  * Usage: runMain graft.Soak [baseDir] [workDir]
  * Not part of the driver contract. */
object Soak {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = args.lift(1).getOrElse("/tmp/graft_soak")
    val spark = graft.core.GraftSession.get("graft-soak")
    import spark.implicits._

    val big = s"$work/sf1"
    val reps = spark.range(10).select(col("id").cast("int").as("r"))

    // ---- generate (idempotent; ~30s) --------------------------------
    if (!new java.io.File(s"$big/documents.parquet").exists()) {
      graft.sources.Tables.documents(spark, base)
        .crossJoin(broadcast(reps))
        .select((col("doc_id") * 10 + col("r")).as("doc_id"),
          regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1z"), col("r"))).as("text"),
          col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$big/documents.parquet")
      graft.sources.Tables.embeddings(spark, base)
        .crossJoin(broadcast(reps))
        .select((col("vec_id") * 10 + col("r")).as("vec_id"),
          transform(col("embedding"),
            x => x + col("r").cast("float") * lit(0.001f)).as("embedding"),
          col("label"))
        .write.mode("overwrite").parquet(s"$big/embeddings.parquet")
    }

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    def ops(dir: String): Seq[(String, () => Long)] = {
      def docs = graft.sources.Tables.documents(spark, dir)
      def embs = graft.sources.Tables.embeddings(spark, dir)
      Seq(
        "dedup_minhash" -> (() =>
          graft.operators.Dedup.minHashNearDupPairs(docs, "doc_id", "text", 0.5).count()),
        "dedup_components" -> (() => {
          val pairs = graft.operators.Dedup.minHashNearDupPairs(docs, "doc_id", "text", 0.5)
          graft.operators.Dedup.connectedComponents(
            docs.select(col("doc_id")), "doc_id", pairs).count()
        }),
        "dedup_editdist" -> (() =>
          graft.operators.Dedup.editDistPairs(docs, "doc_id", "text",
            blockCols = Seq("lang"), maxDistFrac = 0.2).count()),
        "sim_ivfpq" -> (() => {
          val model = graft.operators.Ivf.trainPq(embs, "vec_id", "embedding",
            k = 16, iters = 2, m = 8, ks = 32, pqIters = 5)
          graft.operators.Ivf.searchTopKPq(embs.filter(col("vec_id") < 20), embs,
            model, "vec_id", "vec_id", "embedding", "embedding",
            topK = 5, nProbe = 4).count()
        }),
        // txt family: training cost should track the bounded dictionary,
        // not corpus size (phase 1 is the only corpus pass)
        "unigram_train_encode" -> (() => {
          val m = graft.operators.Unigram.train(docs, col("text"), vocabSize = 40,
            maxWords = 10000)
          docs.select(graft.operators.Unigram.tokenCount(col("text"), m).as("n"))
            .agg(sum(col("n"))).collect()(0).getLong(0)
        }),
        "bpe_train_encode" -> (() => {
          val m = graft.operators.Bpe.train(docs, col("text"), numMerges = 40,
            maxWords = 10000)
          docs.select(graft.operators.Bpe.tokenCount(col("text"), m).as("n"))
            .agg(sum(col("n"))).collect()(0).getLong(0)
        }))
    }

    val results = for {
      (scale, dir) <- Seq("1x" -> base, "10x" -> big)
      (name, op) <- ops(dir)
    } yield {
      val (sec, rows) = timed(op())
      println(f"""[soak] {"op":"$name","scale":"$scale","sec":$sec%.2f,"rows":$rows}""")
      (name, scale, sec, rows)
    }
    // paired summary: time and output growth 1x -> 10x
    results.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (name, rs) =>
      val m = rs.map(r => r._2 -> (r._3, r._4)).toMap
      val (s1, n1) = m("1x"); val (s10, n10) = m("10x")
      println(f"""[soak-summary] {"op":"$name","sec_1x":$s1%.2f,"sec_10x":$s10%.2f,"time_growth":${s10 / s1}%.1f,"rows_1x":$n1,"rows_10x":$n10,"rows_growth":${n10.toDouble / math.max(n1, 1)}%.1f}""")
    }
    spark.stop()
  }
}
