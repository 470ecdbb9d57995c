package graft

import graft.llm.StubLlmClient
import graft.operators.Enrich
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** SURVEY §5.2 property tests: for any (row count, maxRows, partition
  * count, batch size), enrichment preserves order and size, and the tail
  * beyond maxRows has an empty Response. Deterministic seeds — a failure
  * reproduces. */
class EnrichPropertySpec extends SparkSpec {

  private val gen = for {
    n <- Gen.choose(0, 60)
    maxRows <- Gen.choose(0, 70)
    parts <- Gen.choose(1, 6)
    batch <- Gen.choose(1, 25)
  } yield (n, maxRows, parts, batch)

  test("sentinel placement and order survive random failure/latency mixes") {
    // the sliding window completes calls OUT of submission order (random
    // sleeps force it); emission must still be exact input order, with
    // sentinels exactly on the planted failure rows
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val n = 40 + rnd.nextInt(40)
      val failRows = (0 until n).filter(_ => rnd.nextInt(4) == 0).toSet
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize((0 until n).map(i => (s"r$i", i)), 3))
        .toDF("v", "num")
      val cfg = Enrich.Config(systemPrompt = "P", batchSize = 17, rowConcurrency = 6,
        retries = 2, retryBaseDelayMs = 1L)
      val client = () => new StubLlmClient(
        p => { Thread.sleep(p.length % 7); "ok" },
        failOn = p => failRows.exists(i => p.endsWith(s" r$i")))
      val out = Enrich.enrich(df, 0, cfg, client).collect()
      assert(out.map(_.getAs[String]("v")).toSeq == (0 until n).map(i => s"r$i"), s"seed=$seed order")
      out.zipWithIndex.foreach { case (r, i) =>
        val want = if (failRows(i)) Enrich.ErrorSentinel else "ok"
        assert(r.getAs[String]("Response") == want, s"seed=$seed row $i")
      }
    }
  }

  test("sharded index opt-in: order and size invariants hold for arbitrary shapes") {
    // same invariants as the contiguous-index test, with shardedIndex
    // enabled — restricted to unbounded maxRows (the mode's contract)
    val cases = (1 to 12).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(100L + i))) :+ ((0, 0, 1, 1)) :+ ((60, 0, 6, 1))
    cases.foreach { case (n, _, parts, batch) =>
      val label = s"sharded n=$n parts=$parts batch=$batch"
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize((0 until n).map(i => (s"r$i", i)), parts))
        .toDF("v", "num")
      val cfg = Enrich.Config(systemPrompt = "P", batchSize = batch, rowConcurrency = 4)
      val out = Enrich.enrich(df, 0, cfg, () => new StubLlmClient(identity),
        shardedIndex = true).collect()
      assert(out.length == n, label)
      assert(out.map(_.getAs[String]("v")).toSeq == (0 until n).map(i => s"r$i"), label)
      out.foreach(r => assert(r.getAs[String]("Response") == s"P\n\nInput: ${r.getAs[String]("v")}", label))
    }
  }

  test("sharded index: no RDD round-trip in the plan; bounded maxRows rejected") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sharded = Enrich.withRowIndexSharded(docs).queryExecution.executedPlan.toString
    assert(!sharded.contains("ExistingRDD"),
      "sharded index must stay a columnar scan + projection")
    val contiguous = Enrich.withRowIndex(docs).queryExecution.executedPlan.toString
    assert(contiguous.contains("ExistingRDD"),
      "(sanity) the default index pays the RDD round-trip this mode avoids")
    intercept[IllegalArgumentException] {
      Enrich.enrich(docs, 1, Enrich.Config(systemPrompt = "P", maxRows = 10L),
        () => new StubLlmClient(identity), shardedIndex = true)
    }
  }

  test("order, size, and tail invariants hold for arbitrary shapes") {
    val cases = (1 to 12).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))) :+ ((0, 0, 1, 1)) :+ ((60, 0, 6, 1))
    cases.foreach { case (n, maxRows, parts, batch) =>
      val label = s"n=$n maxRows=$maxRows parts=$parts batch=$batch"
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize((0 until n).map(i => (s"r$i", i)), parts))
        .toDF("v", "num")
      val cfg = Enrich.Config(systemPrompt = "P", maxRows = maxRows.toLong,
        batchSize = batch, rowConcurrency = 4)
      val out = Enrich.enrich(df, 0, cfg, () => new StubLlmClient(identity)).collect()
      assert(out.length == n, label)                             // |output| == |input|
      assert(out.map(_.getAs[String]("v")).toSeq == (0 until n).map(i => s"r$i"), label)
      out.zipWithIndex.foreach { case (r, i) =>
        val resp = r.getAs[String]("Response")
        if (i < maxRows) assert(resp == s"P\n\nInput: r$i", label) // head enriched
        else assert(resp == "", label)                             // tail empty
      }
    }
  }
}
