package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{Dedup, TextAnalysis}

/** TEMP dev probe (deleted before round close). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.get("graft-probe")
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      val d = Tables.documents(spark, dir)
      // hamming distance distribution of TRUE J>=0.5 pairs
      val sh = d.select(col("doc_id"),
        graft.functions.TrigramShingleHashes(TextAnalysis.tokens(col("text"))).as("_sh"),
        graft.operators.Dedup.simHash(TextAnalysis.tokens(col("text"))).as("_h"))
      val a = sh.select(col("doc_id").as("id_a"), col("_sh").as("_sha"), col("_h").as("_ha"))
      val b = sh.select(col("doc_id").as("id_b"), col("_sh").as("_shb"), col("_h").as("_hb"))
      val pairs = a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .withColumn("j", Dedup.jaccard(col("_sha"), col("_shb")))
        .filter(col("j") >= 0.5)
        .withColumn("ham", Dedup.hamming64(col("_ha"), col("_hb")))
      val agg = pairs.agg(count(lit(1)), max(col("ham")), expr("percentile(ham, 0.9)")).collect()(0)
      println(s"[hamprobe] sf$sf pairs=${agg.get(0)} maxham=${agg.get(1)} p90=${agg.get(2)}")
    }
    spark.stop()
  }
}
