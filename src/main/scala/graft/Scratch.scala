package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time queries at SPARK_GRAFT_SF_DIR (default sf0.1), dump
  * plans with `explain <names...>`, or run the distributed CC path with
  * `ccdist`. Not part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.get("graft-scratch")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // SCRATCH_STAGES=1: print every stage over 200 ms with task metrics
    // (the no-UI sandbox's substitute for the stage page — r20)
    if (sys.env.getOrElse("SCRATCH_STAGES", "0") == "1")
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val info = sc.stageInfo
          val ms = (for {s <- info.submissionTime; c <- info.completionTime} yield c - s).getOrElse(-1L)
          if (ms > 200) {
            val tm = info.taskMetrics
            val extra = if (tm == null) "" else
              f" run=${tm.executorRunTime / 1000.0}%6.2f cpu=${tm.executorCpuTime / 1e9}%6.2f " +
              f"gc=${tm.jvmGCTime / 1000.0}%5.2f sRead=${tm.shuffleReadMetrics.totalBytesRead / 1024}%6dK " +
              f"sWrite=${tm.shuffleWriteMetrics.bytesWritten / 1024}%6dK in=${tm.inputMetrics.bytesRead / 1024}%6dK"
            println(f"[stage] ${info.stageId}%4d ${ms / 1000.0}%7.2f s  tasks=${info.numTasks}%4d$extra  ${info.name.take(60)}")
          }
        }
      })
    // SCRATCH_JOBS=1: print EVERY job with wall time and description —
    // the commit-machinery families (resume, merge-table) spend their
    // time in many sub-200ms driver-sequential jobs the stage listener
    // never prints; this accounts for them (r21)
    if (sys.env.getOrElse("SCRATCH_JOBS", "0") == "1")
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val desc = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
          val site = Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
          starts.put(js.jobId, (System.nanoTime(), if (desc.nonEmpty) desc else site))
        }
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.remove(je.jobId)).foreach { case (t0, what) =>
            println(f"[job] ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s  ${what.take(80)}")
          }
        }
      })
    if (args.headOption.contains("ccdist")) {
      // distributed-propagation CC on real near-dup pairs (driver path off)
      import org.apache.spark.sql.functions.col
      val docs = graft.sources.Tables.documents(spark, dir)
      val pairs = graft.operators.Dedup.minHashNearDupPairs(docs, "doc_id", "text", 0.5)
      val t0 = System.nanoTime()
      val labels = graft.operators.Dedup.connectedComponents(
        docs.select(col("doc_id")), "doc_id", pairs, maxDriverEdges = 0L)
      val nClusters = labels.filter(col("id") =!= col("rep")).count()
      println(f"[scratch] ccdist ${(System.nanoTime() - t0) / 1e9}%8.2f s  non-rep rows=$nClusters")
      spark.stop(); return
    }
    if (args.headOption.contains("cccross")) {
      // driver-union-find vs distributed star-contraction crossover
      // (judge r17 #5): synthetic near-dup-shaped graphs — 5-node star
      // clusters with every 1000th cluster chained to its predecessor
      // (one long backbone component stresses contraction rounds; the
      // tiny clusters are the common dedup shape) — timed through BOTH
      // connectedComponents paths at 1M/10M/30M edges. The default
      // maxDriverEdges is tuned from this table (BENCH_NOTES).
      import org.apache.spark.sql.functions._
      // optional leading path filter (driver|dist|both), then sizes
      val pathArg = args.lift(1).filter(a => a == "driver" || a == "dist" || a == "both")
      val which = pathArg.getOrElse("both")
      val rest = args.drop(if (pathArg.isDefined) 2 else 1).map(_.toLong)
      val sizes = if (rest.nonEmpty) rest.toSeq
        else Seq(1_000_000L, 10_000_000L, 30_000_000L)
      sizes.foreach { m =>
        val pairs = spark.range(m).select(col("id").as("id_a"),
          when(col("id") % 5000 === 0, greatest(col("id") - 5000, lit(0L)))
            .otherwise(col("id") - (col("id") % 5)).as("id_b"))
          .filter(col("id_a") =!= col("id_b"))
        val nodes = spark.range(m).toDF("doc_id")
        def run(label: String, maxDriver: Long): Unit = {
          val t0 = System.nanoTime()
          val labels = graft.operators.Dedup.connectedComponents(
            nodes, "doc_id", pairs, maxDriverEdges = maxDriver)
          val nonRep = labels.filter(col("id") =!= col("rep")).count()
          println(f"[cccross] edges=$m%9d path=$label%-6s " +
            f"sec=${(System.nanoTime() - t0) / 1e9}%7.2f non_rep=$nonRep")
        }
        if (which != "dist") run("driver", Long.MaxValue)
        if (which != "driver") run("dist", 0L)
      }
      spark.stop(); return
    }
    if (args.headOption.contains("topicprobe")) {
      // rpt_topics gate calibration: measured cell-vs-label purity and
      // the top-term coverage bridge at this SF (recorded in BENCH_NOTES
      // when the thresholds were chosen)
      import org.apache.spark.sql.functions._
      val e = graft.sources.Tables.embeddings(spark, dir)
      val model = graft.operators.Ivf.train(e, "vec_id", "embedding", k = 8, iters = 2)
      val cells = graft.operators.Ivf.attachCell(e, "embedding", model)
      val n = cells.count()
      val pure = cells.groupBy("cell", "label").count()
        .groupBy("cell").agg(max("count").as("maj"), sum("count").as("tot"))
      val purity = pure.agg(sum("maj"), sum("tot")).collect()(0)
      println(s"[topicprobe] n=$n cells=${cells.select("cell").distinct.count} " +
        s"purity=${purity.getLong(0).toDouble / purity.getLong(1)}")
      spark.stop(); return
    }
    if (args.headOption.contains("hybridprobe")) {
      // sim_hybrid_rrf gate calibration: measured per-query overlap of
      // the served (IVF-PQ-fed) vs exact fused top-10 at this SF — the
      // 0.25 floor sits >=2x under the minimum recorded here
      import org.apache.spark.sql.functions._
      val (_, fused, exactFused) = graft.queries.Ext.simHybridRrfFusions(spark, dir)
      val per = fused.select(col("q_id"), col("doc_id"))
        .join(exactFused.select(col("q_id"), col("doc_id")), Seq("q_id", "doc_id"))
        .groupBy(col("q_id")).agg(count(lit(1)).as("hits"))
      val n = fused.groupBy(col("q_id")).agg(count(lit(1)).as("n"))
      val stats = n.join(per, Seq("q_id"), "left")
        .select((coalesce(col("hits"), lit(0L)) / col("n")).as("ov"))
        .agg(min("ov"), avg("ov"), max("ov")).collect()(0)
      println(f"[hybridprobe] $dir overlap min=${stats.getDouble(0)}%.3f " +
        f"avg=${stats.getDouble(1)}%.3f max=${stats.getDouble(2)}%.3f")
      spark.stop(); return
    }
    if (args.headOption.contains("hybridsplit")) {
      // sim_hybrid_rrf stage decomposition (r20 regression hunt): time
      // the BM25 leg, the served ANN leg, the exact-kNN reference leg,
      // and the full query — three passes in one JVM to expose
      // accumulating-state growth.
      import org.apache.spark.sql.functions._
      // stage-level timing: print every stage over 200 ms (skipped when
      // SCRATCH_STAGES=1 already registered the shared listener —
      // ADVICE r20: the duplicate printed every stage twice)
      if (sys.env.getOrElse("SCRATCH_STAGES", "0") != "1")
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val info = sc.stageInfo
          val ms = (for {s <- info.submissionTime; c <- info.completionTime} yield c - s).getOrElse(-1L)
          if (ms > 200) {
            val tm = info.taskMetrics
            val extra = if (tm == null) "" else
              f" run=${tm.executorRunTime / 1000.0}%6.2f cpu=${tm.executorCpuTime / 1e9}%6.2f " +
              f"deser=${tm.executorDeserializeTime / 1000.0}%5.2f gc=${tm.jvmGCTime / 1000.0}%5.2f " +
              f"sRead=${tm.shuffleReadMetrics.totalBytesRead / 1024}%6dK sWrite=${tm.shuffleWriteMetrics.bytesWritten / 1024}%6dK in=${tm.inputMetrics.bytesRead / 1024}%6dK"
            println(f"[stage] ${info.stageId}%4d ${ms / 1000.0}%7.2f s  tasks=${info.numTasks}%4d$extra")
            if (ms > 1500) info.details.split("\n").take(12).foreach(l => println(s"[stage-detail] $l"))
          }
        }
      })
      def time(label: String, i: Int)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"[scratch] hybridsplit $label%-14s pass$i ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      }
      (1 to 3).foreach { i =>
        val d = graft.sources.Tables.documents(spark, dir)
        val e = graft.sources.Tables.embeddings(spark, dir)
        val q = d.filter(col("doc_id") < 24L)
          .select(col("doc_id").as("q_id"), substring(col("text"), 1, 40).as("q_text"))
        time("tokenize_scan", i) {
          d.select(explode(graft.operators.TextAnalysis.tokens(col("text"))).as("_t"))
            .queryExecution.toRdd.count()
        }
        time("bm25_lazy", i) {
          graft.operators.Relevance.bm25PerQuery(
            d, "doc_id", "text", q, "q_id", "q_text",
            eagerStats = true, materializeTf = false).count()
        }
        time("bm25_mat", i) {
          graft.operators.Relevance.bm25PerQuery(
            d, "doc_id", "text", q, "q_id", "q_text",
            eagerStats = true, materializeTf = true).count()
        }
        def bmTopDf() = {
          val bm = graft.operators.Relevance.bm25PerQuery(
            d, "doc_id", "text", q, "q_id", "q_text",
            eagerStats = true, materializeTf = false)
          val wb = org.apache.spark.sql.expressions.Window
            .partitionBy(col("q_id")).orderBy(col("bm25").desc, col("doc_id"))
          bm.withColumn("r", row_number().over(wb)).filter(col("r") <= 10)
            .select(col("q_id"), col("doc_id"), col("r"))
        }
        if (i == 1) bmTopDf().explain("formatted")
        time("wtop_count", i) { bmTopDf().count() }
        time("wtop_ckpt", i) { graft.core.Checkpoint.materialize(bmTopDf()).count() }
        time("tiny_ckpt", i) {
          graft.core.Checkpoint.materialize(
            spark.range(240).toDF("x")).count()
        }
        val qe = e.filter(col("vec_id") < 24L)
        time("ann_served", i) {
          val (model, encodedIdx) = graft.queries.Ext.sharedPqServingProbe(spark, dir)
          graft.operators.Ivf.searchEncodedTopKPq(qe, encodedIdx, model,
            "vec_id", "embedding", topK = 10, nProbe = 4).count()
        }
        time("exact_knn", i) {
          graft.operators.Similarity.knnBruteForce(qe, e, "vec_id", "vec_id",
            "embedding", "embedding", k = 10).count()
        }
        time("full_query", i) {
          SparkEntry.queries("sim_hybrid_rrf")(spark, dir).queryExecution.toRdd.count()
        }
      }
      spark.stop(); return
    }
    if (args.headOption.contains("semsplit")) {
      // harness-vs-operator decomposition for the semantic-dedup family
      // (BENCH_NOTES #35): the bench numbers for dedup_semantic /
      // dedup_drop_semantic include an exact all-pairs GATE harness;
      // this times the operator paths alone so the split is on record.
      // Each label runs twice — read the second (warm) number.
      import org.apache.spark.sql.functions.col
      val e = graft.sources.Tables.embeddings(spark, dir)
      def time(label: String)(f: => Long): Unit = (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[scratch] semsplit $label%-22s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      }
      time("sem_pairs_operator") {
        val m = graft.operators.Ivf.train(e, "vec_id", "embedding", k = 8, iters = 2)
        graft.operators.Dedup.semanticNearDupPairs(
          e, "vec_id", "embedding", m, threshold = 0.35, assignCells = 2).count()
      }
      time("sem_drop_operator") {
        val m = graft.operators.Ivf.train(e, "vec_id", "embedding", k = 8, iters = 2)
        graft.operators.Dedup.dropSemanticNearDups(
          e, "vec_id", "embedding", m, threshold = 0.35, assignCells = 2).count()
      }
      time("dedup_semantic_full") {
        SparkEntry.queries("dedup_semantic")(spark, dir).queryExecution.toRdd.count()
      }
      time("dedup_drop_sem_full") {
        SparkEntry.queries("dedup_drop_semantic")(spark, dir).queryExecution.toRdd.count()
      }
      spark.stop(); return
    }
    if (args.headOption.contains("mhdecomp")) {
      // decompose minhash near-dup at a soak fixture dir (args(1)):
      // shingle+signature scan vs banding+candidate join vs Jaccard
      // verify — each timed as a cumulative count so stage deltas are
      // attributable (per-stage persists would change what's measured)
      import org.apache.spark.sql.functions.col
      val fdir = args.lift(1).getOrElse(dir)
      val docs = graft.sources.Tables.documents(spark, fdir)
      def timeIt(label: String)(f: => Long): Unit = (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[scratch] mhdecomp $label%-18s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      }
      timeIt("signature_scan") {
        // the narrow per-doc work only: shingle sets + k-hash signature
        docs.select(col("doc_id"),
            graft.functions.MinHashSignature(
              graft.functions.TrigramShingleHashes(
                graft.operators.TextAnalysis.tokens(col("text"))), 48).as("_sig"))
          .queryExecution.toRdd.count()
      }
      timeIt("full_pairs") {
        graft.operators.Dedup.minHashNearDupPairs(docs, "doc_id", "text", 0.5).count()
      }
      spark.stop(); return
    }
    if (args.headOption.contains("edlsh")) {
      // probe: LSH-candidate editdist vs the shingle-complete exact set
      import org.apache.spark.sql.functions.col
      for (sf <- Seq("0.001", "0.01", "0.1")) {
        val d = graft.sources.Tables.documents(spark, s"/root/testdata/sf$sf")
        val found = graft.core.Checkpoint.materialize(
          graft.operators.Dedup.editDistPairsLsh(d, "doc_id", "text", maxDistFrac = 0.2))
        val exact = graft.core.Checkpoint.materialize(
          graft.operators.Dedup.editDistPairs(d, "doc_id", "text",
            blockCols = Nil, maxDistFrac = 0.2))
        val nF = found.count(); val nT = exact.count()
        val nHit = found.join(exact, Seq("id_a", "id_b")).count()
        println(s"[scratch] edlsh sf$sf found=$nF true=$nT hit=$nHit")
      }
      spark.stop(); return
    }
    val explain = args.headOption.contains("explain")
    val names = if (explain) args.tail else args
    for (name <- names) {
      if (explain) {
        println(s"########## $name")
        SparkEntry.queries(name)(spark, dir).explain("formatted")
      } else {
        val t0 = System.nanoTime()
        // materializing form, matching Bench (count() would skip projections)
        val n = SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
        println(f"[scratch] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      }
    }
    spark.stop()
  }
}
