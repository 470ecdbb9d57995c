package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time queries at SPARK_GRAFT_SF_DIR (default sf0.1), or dump
  * plans with `explain <names...>`. Not part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val explain = args.headOption.contains("explain")
    val names = if (explain) args.tail else args
    for (name <- names) {
      if (explain) {
        println(s"########## $name")
        SparkEntry.queries(name)(spark, dir).explain("formatted")
      } else {
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, dir).count()
        println(f"[scratch] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      }
    }
    spark.stop()
  }
}
