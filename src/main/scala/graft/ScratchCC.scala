package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

object ScratchCC {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[cc] $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)
    val pairs = t("minhash pairs")(
      Dedup.minHashNearDupPairs(docs, "doc_id", "text", 0.5).persist())
    t("pairs count")(println(pairs.count()))
    val comps = t("cc build")(
      Dedup.connectedComponents(docs.select(col("doc_id")), "doc_id", pairs))
    t("cc consume")(println(comps.count()))
    spark.stop()
  }
}
