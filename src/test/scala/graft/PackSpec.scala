package graft

import graft.operators.Pack

class PackSpec extends SparkSpec {
  import spark.implicits._

  test("byTokenBudget assigns consecutive docs to budget-bounded chunks") {
    val df = Seq((1L, 100L), (2L, 200L), (3L, 300L), (4L, 400L), (5L, 50L))
      .toDF("id", "n_tok")
    val got = Pack.byTokenBudget(df, "id", "n_tok", budget = 500L)
      .select("id", "chunk").as[(Long, Long)].collect().toMap
    // cum-before: 0, 100, 300, 600, 1000 -> chunks 0,0,0,1,2
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 2L))
  }

  test("packing is independent per partition key") {
    val df = Seq((1L, "a", 400L), (2L, "a", 400L), (3L, "b", 400L))
      .toDF("id", "k", "n_tok")
    val got = Pack.byTokenBudget(df, "id", "n_tok", 500L, Seq("k"))
      .select("id", "chunk").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("stratified sampling keeps approximate per-stratum fractions") {
    val df = (0 until 4000).map(i => (i.toLong, if (i % 4 == 0) "rare" else "common"))
      .toDF("id", "stratum")
    val sampled = df.stat.sampleBy("stratum", Map("rare" -> 0.5, "common" -> 0.1), seed = 42L)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(math.abs(sampled("rare") - 500.0) / 500.0 < 0.2)
    assert(math.abs(sampled("common") - 300.0) / 300.0 < 0.2)
  }
}
