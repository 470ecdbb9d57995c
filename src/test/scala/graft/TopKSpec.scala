package graft

import graft.plans.TopK
import scala.util.Random

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("TopK.perKey matches the window row_number formulation on random data") {
    val rnd = new Random(21)
    val rows = (0 until 5000).map { i =>
      (rnd.nextInt(40).toLong, i.toLong, math.round(rnd.nextDouble() * 100) / 10.0)
    }
    // deliberately includes value ties (1-decimal values) to exercise the tie-break
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 8)).toDF("k", "id", "v")
    val got = TopK.perKey(df, Seq("k"), "v", "id", 5)
      .as[(Long, Long, Double)].collect().toSet
    val want = rows.groupBy(_._1).flatMap { case (_, g) =>
      g.sortBy { case (_, id, v) => (-v, id) }.take(5)
    }.toSet
    assert(got === want)
  }

  test("TopK.perKey ranks null order values last, like the window formulation") {
    val df = Seq((1L, 1L, Some(5.0)), (1L, 2L, None), (1L, 3L, Some(7.0)))
      .toDF("k", "id", "v")
    val got = TopK.perKey(df, Seq("k"), "v", "id", 2)
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 3L)) // null row excluded only because k=2 non-nulls exist
    val withNull = TopK.perKey(df, Seq("k"), "v", "id", 3)
      .select("id").as[Long].collect().toSet
    assert(withNull === Set(1L, 2L, 3L)) // k=3: null row kept, ranked last
  }

  test("partial-phase flush: tiny buffer bound, high key cardinality, exact results") {
    // 100k distinct keys through a 500-row partial buffer forces hundreds
    // of flushes per partition; the final phase must still produce the
    // exact per-key top-k. Two-phase plan shape is asserted too.
    spark.conf.set("graft.topk.partialMaxBufferedRows", "500")
    try {
      val rnd = new Random(33)
      val rows = (0 until 200000).map { i =>
        ((i % 100000).toLong, i.toLong, rnd.nextInt(1000).toDouble)
      }
      val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 16)).toDF("k", "id", "v")
      val out = TopK.perKey(df, Seq("k"), "v", "id", 1)
      val planStr = out.queryExecution.executedPlan.toString
      assert("TopKPerKey".r.findAllIn(planStr).size == 2, s"expected two-phase plan:\n$planStr")
      val got = out.as[(Long, Long, Double)].collect().toSet
      val want = rows.groupBy(_._1).flatMap { case (_, g) =>
        g.sortBy { case (_, id, v) => (-v, id) }.take(1)
      }.toSet
      assert(got === want)
    } finally spark.conf.unset("graft.topk.partialMaxBufferedRows")
  }

  test("null ties rank FIRST (row_number ASC NULLS FIRST parity, no MinValue overflow)") {
    // all rows share the order value; ties are null,1,2,3 -> row_number
    // over (v DESC, tie ASC NULLS FIRST) keeps {null,1,2}
    val df = Seq(
      (1L, 10L, 10.0, Option.empty[Long]), (1L, 11L, 10.0, Some(1L)),
      (1L, 12L, 10.0, Some(2L)), (1L, 13L, 10.0, Some(3L)))
      .toDF("k", "id", "v", "tie")
    val got = TopK.perKey(df, Seq("k"), "v", "tie", 3).select("id").as[Long].collect().toSet
    assert(got === Set(10L, 11L, 12L), s"null tie must rank first, got $got")
  }

  test("optimizer rule: the row_number window idiom rewrites to the native operator") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    graft.plans.TopK.install(spark)
    val rnd = new Random(55)
    val rows = (0 until 2000).map(i => (rnd.nextInt(20).toLong, i.toLong, rnd.nextInt(50).toDouble))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 4)).toDF("k", "id", "v")
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))

    val rewritten = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3).drop("rk")
    val plan = rewritten.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("Window"), s"window survived the rewrite:\n$plan")
    val want = rows.groupBy(_._1).flatMap { case (_, g) =>
      g.sortBy { case (_, id, v) => (-v, id) }.take(3)
    }.toSet
    assert(rewritten.as[(Long, Long, Double)].collect().toSet === want)

    // rk kept in the output -> must NOT rewrite (rank column observable)
    val kept = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
    assert(kept.queryExecution.executedPlan.toString.contains("Window"))

    // single sort key -> ties nondeterministic -> must NOT rewrite
    val single = df.withColumn("rk",
        row_number().over(Window.partitionBy("k").orderBy(col("v").desc)))
      .filter(col("rk") <= 3).drop("rk")
    assert(single.queryExecution.executedPlan.toString.contains("Window"))

    // ascending order -> not the TopK shape -> must NOT rewrite
    val asc = df.withColumn("rk",
        row_number().over(Window.partitionBy("k").orderBy(col("v").asc, col("id"))))
      .filter(col("rk") <= 3).drop("rk")
    assert(asc.queryExecution.executedPlan.toString.contains("Window"))
  }

  import org.apache.spark.sql.functions.col

  test("long order keys beyond 2^53 rank exactly (no double collapse)") {
    // adjacent huge longs are indistinguishable as doubles — the old
    // double packing would collapse them and let the tie column pick
    // the WRONG survivors (ids 0,1 instead of the true max values)
    val base = Long.MaxValue
    val rows = (0 until 6).map(i => (1L, i.toLong, base - i))
    val df = rows.toDF("k", "id", "v")
    val got = TopK.perKey(df, Seq("k"), "v", "id", 2).select("id").as[Long].collect().toSet
    assert(got === Set(0L, 1L)) // v = MaxValue, MaxValue-1
    val gotTail = TopK.perKey(df.filter(col("id") >= 2), Seq("k"), "v", "id", 2)
      .select("id").as[Long].collect().toSet
    assert(gotTail === Set(2L, 3L))
  }

  test("optimizer rule fires on DECIMAL order keys and matches the exact ranking") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    graft.plans.TopK.install(spark)
    val rnd = new Random(77)
    // values differing only in the last cent, far beyond double's 2^53
    // integer range once scaled: decimal(20,2) with 18 integer digits
    val rows = (0 until 400).map { i =>
      (i % 8, i.toLong, BigDecimal("123456789012345678.00") + BigDecimal(rnd.nextInt(100)) / 100)
    }
    val df = rows.toDF("k", "id", "v").withColumn("v", col("v").cast("decimal(20,2)"))
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
    val q = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3).drop("rk")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"decimal rewrite did not fire:\n$plan")
    val want = rows.groupBy(_._1).flatMap { case (_, g) =>
      g.sortBy { case (_, id, v) => (-v, id) }.take(3)
    }.map { case (k, id, v) => (k, id, v.setScale(2)) }.toSet
    val got = q.collect().map(r => (r.getInt(0), r.getLong(1), BigDecimal(r.getDecimal(2)))).toSet
    assert(got === want)
  }

  test("TopK.perKey with k larger than group size keeps all rows") {
    val df = Seq((1L, 1L, 5.0), (1L, 2L, 3.0), (2L, 3L, 9.9)).toDF("k", "id", "v")
    assert(TopK.perKey(df, Seq("k"), "v", "id", 10).count() == 3)
  }
}
