package graft

import java.nio.file.Files

/** Bucketing: pre-shuffling both sides of a recurring join into the same
  * bucket layout removes the per-query Exchange — the standard tactic for
  * repeated large-large joins at scale. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft_wh").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    // a previously-failed run can leave managed-table dirs behind
    def rmRf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmRf))
      f.delete()
    }
    for (t <- Seq("b_orders", "b_lines")) rmRf(new java.io.File(s"spark-warehouse/$t"))

    (0L until 1000L).map(i => (i, s"o$i")).toDF("key", "o_payload")
      .write.bucketBy(8, "key").sortBy("key").saveAsTable("b_orders")
    (0L until 3000L).map(i => (i % 1000, s"l$i")).toDF("key", "l_payload")
      .write.bucketBy(8, "key").sortBy("key").saveAsTable("b_lines")

    // disable broadcast so the planner takes the (bucketed) SMJ path —
    // this test is about the large-large join case
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(spark.table("b_lines"), "key")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
      assert(joined.count() == 3000)

      // contrast: the same join over plain parquet DOES shuffle —
      // bucketing is what removed the exchange above
      val p1 = s"$wh/plain1"; val p2 = s"$wh/plain2"
      (0L until 1000L).map(i => (i, s"o$i")).toDF("key", "o_payload").write.parquet(p1)
      (0L until 3000L).map(i => (i % 1000, s"l$i")).toDF("key", "l_payload").write.parquet(p2)
      val plain = spark.read.parquet(p1).join(spark.read.parquet(p2), "key")
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lines")
    }
  }
}
