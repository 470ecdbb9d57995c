package graft

import graft.operators.Privacy
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // two equivalence classes on (region, tier): ("e","a") has 3 rows /
  // 3 distinct sensitive values; ("w","b") has 2 rows / 1 distinct
  private val d = Seq(
    (1L, "e", "a", 100.0),
    (2L, "e", "a", 250.0),
    (3L, "e", "a", 390.0),
    (4L, "w", "b", 120.0),
    (5L, "w", "b", 145.0)
  ).toDF("id", "region", "tier", "bal")

  test("annotate: class sizes, distinct sensitive counts, both gates") {
    val out = Privacy.annotate(d, Seq("region", "tier"),
        floor(col("bal") / 100).cast("long"), k = 3, l = 2)
      .select("id", "grp_n", "distinct_sens", "k_ok", "l_ok")
      .orderBy("id").collect()
    // (e,a): n=3, sens bands {1,2,3} -> 3 distinct; both gates pass
    for (i <- 0 until 3)
      assert(out(i).toSeq.drop(1) === Seq(3L, 3L, true, true))
    // (w,b): n=2 < k; bands {1,1} -> 1 distinct < l; both fail
    for (i <- 3 until 5)
      assert(out(i).toSeq.drop(1) === Seq(2L, 1L, false, false))
  }

  test("suppress: only fully-passing classes survive, flags dropped") {
    val out = Privacy.suppress(d, Seq("region", "tier"),
      floor(col("bal") / 100).cast("long"), k = 3, l = 2)
    assert(out.columns.toSet === d.columns.toSet)
    assert(out.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("annotate: l gate is independent of k gate") {
    // k=2 passes both classes; l=2 still fails the homogeneous one
    val out = Privacy.annotate(d, Seq("region", "tier"),
        floor(col("bal") / 100).cast("long"), k = 2, l = 2)
      .select("id", "k_ok", "l_ok").orderBy("id").collect()
    assert(out.forall(_.getBoolean(1)))
    assert(out.map(r => (r.getLong(0), r.getBoolean(2))).toSeq ===
      Seq((1L, true), (2L, true), (3L, true), (4L, false), (5L, false)))
  }
}
