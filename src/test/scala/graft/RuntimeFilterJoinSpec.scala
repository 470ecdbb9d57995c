package graft

import graft.operators.RuntimeFilterJoin
import graft.functions.BloomContainsLong
import org.apache.spark.sql.functions._
import scala.util.Random

class RuntimeFilterJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloomFilteredJoin equals the plain inner join") {
    val rnd = new Random(17)
    val probe = (0 until 5000).map(i => (rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "pid")
    // selective build side: 25 of the 1000 key values
    val build = (0L until 1000L by 40L).map(k => (k, s"b$k")).toDF("bk", "p")

    val got = RuntimeFilterJoin.bloomFilteredJoin(probe, build, "k", "bk", expectedKeys = 100L)
      .select("k", "pid", "p").as[(Long, Long, String)].collect().toSet
    val want = probe.join(build, col("k") === col("bk"))
      .select("k", "pid", "p").as[(Long, Long, String)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("bloom prune cuts the probe side before the join (no false negatives)") {
    val probe = (0L until 10000L).map(k => (k, k)).toDF("k", "pid")
    val build = Seq((7L, "a"), (4242L, "b")).toDF("bk", "p")
    val bloom = build.stat.bloomFilter("bk", 10L, 0.01)
    val pruned = probe.filter(BloomContainsLong(col("k"), bloom))
    val n = pruned.count()
    // exact on the 2 real keys; false positives bounded well below 1%
    assert(n >= 2 && n < 200, s"pruned count $n")
    // and the surviving set contains both build keys
    val keys = pruned.select("k").as[Long].collect().toSet
    assert(keys.contains(7L) && keys.contains(4242L))
  }

  test("the probe-side plan carries the bloom probe predicate on the scan") {
    // parquet-backed probe: ConvertToLocalRelation would fold the filter
    // into a LocalTableScan for in-memory data, hiding it from the plan
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_rtf_${spark.sparkContext.applicationId}").toString
    (0L until 100L).map(k => (k, k)).toDF("k", "pid")
      .write.mode("overwrite").parquet(dir)
    val probe = spark.read.parquet(dir)
    val build = Seq((1L, "a")).toDF("bk", "p")
    val plan = RuntimeFilterJoin.bloomFilteredJoin(probe, build, "k", "bk", expectedKeys = 10L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_contains"), plan.take(2000))
  }
}
