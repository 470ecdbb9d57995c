package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** TEMP dev probe (deleted before round close): measures sketch-estimate
  * vs exact margins and ANN recalls at each SF so the decision-constant
  * oracle gates get thresholds with real margin, not guesses. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.get("graft-probe")
    import spark.implicits._
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      println(s"########## SF $sf")

      // 1. distinct sketches per event_type
      val ev = Tables.events(spark, dir)
      val d1 = ev.groupBy(col("event_type")).agg(
        count_distinct(col("user_id")).as("n_exact"),
        approx_count_distinct(col("user_id")).as("n_approx"),
        hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("n_hll"))
      d1.collect().foreach(r => println(s"[distinct] $r"))

      // 2. quantiles
      val q = ev.groupBy(col("event_type")).agg(
        expr("percentile(value, 0.5)").as("p50_exact"),
        expr("percentile(value, 0.95)").as("p95_exact"),
        kll_sketch_agg_double(col("value")).as("_sk"))
        .select(col("event_type"), col("p50_exact"), col("p95_exact"),
          kll_sketch_get_quantile_double(col("_sk"), lit(0.5)).as("p50_kll"),
          kll_sketch_get_quantile_double(col("_sk"), lit(0.95)).as("p95_kll"))
      q.collect().foreach(r => println(s"[quant] $r"))
      val qm = ev.withColumn("_shard", col("user_id") % 4)
        .groupBy(col("event_type"), col("_shard"))
        .agg(kll_sketch_agg_double(col("value")).as("_sk"))
        .groupBy(col("event_type"))
        .agg(kll_merge_agg_double(col("_sk")).as("_msk"))
        .select(col("event_type"),
          kll_sketch_get_quantile_double(col("_msk"), lit(0.5)).as("p50_merged"))
      qm.collect().foreach(r => println(s"[quantmerge] $r"))

      // 3. overlap
      def cohortA = ev.filter(col("event_type") === "view" && col("user_id") % 2 === 0)
      def cohortB = ev.filter(col("event_type") === "purchase" && col("user_id") % 3 === 0)
      val a = cohortA.agg(theta_sketch_agg(col("user_id")).as("sk_a"),
        count_distinct(col("user_id")).as("n_a"))
      val b = cohortB.agg(theta_sketch_agg(col("user_id")).as("sk_b"),
        count_distinct(col("user_id")).as("n_b"))
      val exactOv = cohortA.select(col("user_id")).intersect(cohortB.select(col("user_id"))).count()
      val ov = a.crossJoin(b).select(col("n_a"), col("n_b"),
        theta_sketch_estimate(theta_intersection(col("sk_a"), col("sk_b"))).as("ov_theta"),
        theta_sketch_estimate(theta_union(col("sk_a"), col("sk_b"))).as("un_theta"),
        theta_sketch_estimate(theta_difference(col("sk_a"), col("sk_b"))).as("da_theta"))
      println(s"[overlap] exact=$exactOv ${ov.collect()(0)}")

      // 4. joinsize
      val li = Tables.lineitem(spark, dir).select(col("l_orderkey"))
      val o = Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val ja = li.agg(count(lit(1)).as("rows_a"), count_distinct(col("l_orderkey")).as("ndv_a"),
        theta_sketch_agg(col("l_orderkey")).as("sk_a"))
      val jb = o.agg(count(lit(1)).as("rows_b"), count_distinct(col("o_orderkey")).as("ndv_b"),
        theta_sketch_agg(col("o_orderkey")).as("sk_b"))
      val exactJoin = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      val je = ja.crossJoin(jb).select(col("rows_a"), col("rows_b"), col("ndv_a"), col("ndv_b"),
        (col("rows_a").cast("double") / col("ndv_a") * (col("rows_b").cast("double") / col("ndv_b"))
          * theta_sketch_estimate(theta_intersection(col("sk_a"), col("sk_b")))).as("est"))
      println(s"[joinsize] exact=$exactJoin ${je.collect()(0)}")

      // 5. novelty
      val docs = Tables.documents(spark, dir)
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val batch = docs.filter(col("doc_id") % 5 === 0)
      val exactOv2 = batch.select(col("doc_id")).intersect(corpus.select(col("doc_id"))).count()
      val bsk = batch.agg(theta_sketch_agg(col("doc_id")).as("b"), count_distinct(col("doc_id")).as("bd"))
      val csk = corpus.agg(theta_sketch_agg(col("doc_id")).as("c"))
      val nv = bsk.crossJoin(csk).select(col("bd"),
        theta_sketch_estimate(theta_intersection(col("b"), col("c"))).as("ov_est"),
        theta_sketch_estimate(theta_difference(col("b"), col("c"))).as("new_est"))
      println(s"[novelty] exact_ov=$exactOv2 ${nv.collect()(0)}")

      // 6. ANN recalls vs exact top-5
      val e = Tables.embeddings(spark, dir)
      val qset = e.filter(col("vec_id") < 20)
      val exact = graft.operators.Similarity.knnBruteForce(qset, e, "vec_id", "vec_id",
        "embedding", "embedding", k = 5).select(col("query_id"), col("neighbor_id"))
      def recall(ann: org.apache.spark.sql.DataFrame, nm: String): Unit = {
        val hits = ann.select(col("query_id"), col("neighbor_id"))
          .join(exact, Seq("query_id", "neighbor_id")).count()
        val total = exact.count()
        println(f"[recall] $nm hits=$hits/$total = ${hits.toDouble / total}%.3f")
      }
      recall(graft.operators.Similarity.annLshTopK(qset, e, "vec_id", "vec_id",
        "embedding", "embedding", k = 5, bits = 8, probes = 9), "lsh")
      recall(graft.operators.Similarity.knnInt8(qset, e, "vec_id", "vec_id",
        "embedding", "embedding", k = 5), "int8")
      val ivfModel = graft.operators.Ivf.train(e, "vec_id", "embedding", k = 16, iters = 2)
      recall(graft.operators.Ivf.searchTopK(qset, e, ivfModel, "vec_id", "vec_id",
        "embedding", "embedding", topK = 5, nProbe = 4), "ivf")
      val pqModel = graft.operators.Ivf.trainPq(e, "vec_id", "embedding",
        k = 16, iters = 2, m = 8, ks = 32, pqIters = 5)
      recall(graft.operators.Ivf.searchTopKPq(qset, e, pqModel, "vec_id", "vec_id",
        "embedding", "embedding", topK = 5, nProbe = 4), "ivfpq")

      // 7. PCA variance: spark-sql total_var + explained frac
      val totVar = e.select(posexplode(col("embedding").cast("array<double>")))
        .groupBy(col("pos")).agg(var_pop(col("col")).as("v"))
        .agg(sum(col("v"))).collect()(0).getDouble(0)
      val m = graft.operators.Pca.fit(e, "embedding", dim = 64, k = 8)
      val explained = m.eigenvalues.sum / totVar
      // orthonormality residual
      var maxres = 0.0
      for (r1 <- 0 until 8; r2 <- 0 until 8) {
        var sdot = 0.0
        for (j <- 0 until 64) sdot += m.components(r1 * 64 + j) * m.components(r2 * 64 + j)
        val target = if (r1 == r2) 1.0 else 0.0
        maxres = math.max(maxres, math.abs(sdot - target))
      }
      println(f"[pca] total_var=$totVar%.6f explained=$explained%.4f ortho_res=$maxres%.2e")

      // 8. corpus stats approx vs exact (per source)
      println("[stats-exact]"); graft.queries.Ext.rptCorpusStats(spark, dir).collect().foreach(r => println(s"  $r"))
      println("[stats-approx]"); graft.queries.Ext.rptCorpusStatsApprox(spark, dir).collect().foreach(r => println(s"  $r"))

      // 9. bloom vs exact decontam equality
      val exDec = graft.queries.Ext.txtDecontam(spark, dir).withColumnRenamed("n_shared", "n_flagged")
        .withColumnRenamed("contamination", "contamination_ub")
      val blDec = graft.queries.Ext.txtDecontamBloom(spark, dir)
      val only = exDec.unionByName(blDec).distinct().count()
      println(s"[bloom] exact_rows=${exDec.count()} bloom_rows=${blDec.count()} union_distinct=$only")
    }
    spark.stop()
  }
}
