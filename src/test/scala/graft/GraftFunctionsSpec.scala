package graft

import graft.functions.GraftFunctions

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("native expressions are callable from SQL after registration") {
    GraftFunctions.registerAll(spark)
    val dot = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(dot == 11.0)
    val norm = spark.sql("SELECT graft_l2norm(array(3.0d, 4.0d)) AS n")
      .collect()(0).getDouble(0)
    assert(norm == 5.0)
    // value cross-checked against DuckDB list_reduce((acc,x)->(acc*31+x)%2147483647)
    val rh = spark.sql("SELECT graft_rolling_hash('hi') AS h").collect()(0).getLong(0)
    assert(rh == 3329L)
    val dl = spark.sql("SELECT graft_dedup_lines('a\nb\na') AS d").collect()(0).getString(0)
    assert(dl == "a\nb")
    val sig = spark.sql("SELECT graft_minhash_sig(array(CAST(1 AS BIGINT), CAST(2 AS BIGINT)), 4) AS s")
      .collect()(0).getSeq[Long](0)
    assert(sig.length == 4)
    val tf = spark.sql("SELECT graft_hashed_tf(array('a', 'b', 'a'), 8) AS v")
      .collect()(0).getSeq[Double](0)
    assert(tf.length == 8 && tf.sum == 3.0 && tf.max == 2.0, s"hashed tf counts: $tf")
    val tfSeeded = spark.sql("SELECT graft_hashed_tf(array('a'), 8, CAST(7 AS BIGINT)) AS v")
      .collect()(0).getSeq[Double](0)
    assert(tfSeeded.sum == 1.0)
  }

  test("trigram hashes: linear on a pathological 200k-token doc, parity with string shingles") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 200k tokens from a 50-word vocab: heavy duplication, worst-case
    // sort+unique load; must complete fast and match the reference count
    val rnd = new scala.util.Random(3)
    val toks = Seq.fill(200000)(s"w${rnd.nextInt(50)}")
    val t0 = System.nanoTime()
    val got = Seq(toks.mkString(" ")).toDF("text")
      .select(size(graft.functions.TrigramShingleHashes(split(col("text"), "\\s+"))).as("n"))
      .as[Int].head()
    val ms = (System.nanoTime() - t0) / 1000000L
    val want = toks.sliding(3).map(_.mkString(" ")).toSet.size
    assert(got == want, s"distinct trigram count: got $got want $want")
    assert(ms < 20000, s"took ${ms}ms on one 200k-token row — not linear")
  }

  test("span hashes: positional, xxhash64/concat_ws-compatible, empty under k") {
    GraftFunctions.registerAll(spark)
    // byte-identical to the SQL formulation over the same k-token windows
    val r = spark.sql(
      "SELECT graft_span_hashes(array('a','b','c'), 2) AS got, " +
        "array(xxhash64(concat_ws(' ','a','b')), xxhash64(concat_ws(' ','b','c'))) AS want, " +
        "graft_span_hashes(array('a'), 2) AS short")
      .collect()(0)
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    assert(r.getSeq[Long](2).isEmpty)
  }

  test("sketch expressions type-check at analysis, null array propagates null") {
    GraftFunctions.registerAll(spark)
    // wrong input types fail analysis, not at runtime mid-job
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_simhash64(1)").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_minhash_sig(array('a', 'b'), 4)").collect()
    }
    // null-in-null-out vs empty-array 0L (documented simHash semantics)
    val r = spark.sql(
      "SELECT graft_simhash64(CAST(NULL AS ARRAY<STRING>)) AS a, " +
        "graft_simhash64(CAST(array() AS ARRAY<STRING>)) AS b")
      .collect()(0)
    assert(r.isNullAt(0) && r.getLong(1) == 0L)
  }

  test("deflate ratio separates repetitive from varied text; edge semantics pinned") {
    import graft.functions.DeflateRatio
    val spam = "buy now " * 200
    val varied = {
      val rnd = new scala.util.Random(5)
      Seq.fill(400)(rnd.alphanumeric.take(4).mkString).mkString(" ")
    }
    val rows = Seq((1L, spam), (2L, varied), (3L, "")).toDF("id", "text")
      .select($"id", DeflateRatio($"text").as("r"))
      .as[(Long, Double)].collect().toMap
    assert(rows(1L) < 0.1, s"repetitive text must compress hard: ${rows(1L)}")
    assert(rows(2L) > 0.5, s"varied text must not: ${rows(2L)}")
    assert(rows(3L) === 1.0, "empty input is defined as 1.0")
    assert(rows(1L) < rows(2L) / 5, "clear separation between the classes")
    // SQL registration + null propagation
    graft.functions.GraftFunctions.registerAll(spark)
    val viaSql = spark.sql("SELECT graft_deflate_ratio('aaaaaaaaaaaaaaaaaaaaaaaa') AS r, " +
      "graft_deflate_ratio(CAST(NULL AS STRING)) AS n").collect()(0)
    assert(viaSql.getDouble(0) < 1.0)
    assert(viaSql.isNullAt(1))
  }

  test("int8 quantization round-trips through SQL registration") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT graft_int8_dot(graft_quantize_int8(array(1.0d, 0.0d)), " +
        "graft_quantize_int8(array(1.0d, 0.0d))) AS d").collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 0.01)
  }
}
