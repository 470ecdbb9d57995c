package graft

import graft.operators.Mixture

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  test("mix approximates requested rates and tags provenance") {
    val a = (0 until 2000).map(i => (i.toLong, "a")).toDF("id", "payload")
    val b = (0 until 2000).map(i => (i.toLong, "b")).toDF("id", "payload")
    val mixed = Mixture.mix(Seq(("web", a, 0.25), ("books", b, 1.5)))
    val counts = mixed.groupBy("mix_source").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("web") - 500.0) / 500.0 < 0.2)
    assert(counts("books") >= 2000 && math.abs(counts("books") - 3000.0) / 3000.0 < 0.2)
    assert(mixed.columns.contains("mix_source"))
  }

  test("rate 0 contributes nothing; integer rate repeats exactly") {
    val a = (0 until 100).map(i => (i.toLong, "x")).toDF("id", "payload")
    val mixed = Mixture.mix(Seq(("none", a, 0.0), ("twice", a, 2.0)))
    val counts = mixed.groupBy("mix_source").count().as[(String, Long)].collect().toMap
    assert(!counts.contains("none") || counts("none") == 0L)
    assert(counts("twice") == 200L)
  }
}
