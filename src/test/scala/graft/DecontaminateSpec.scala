package graft

import graft.operators.Decontaminate
import scala.util.Random

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("flags training docs by benchmark trigram containment, exact fractions") {
    val rnd = new Random(41)
    val vocab = Vector.tabulate(5000)(i => s"w$i")
    def doc(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")

    val benchText = doc(12) // 10 distinct trigrams
    val bench = Seq((100L, benchText)).toDF("qid", "question")
    val clean = (0L until 20L).map(i => (i, doc(12)))
    // half-contaminated: 6 benchmark tokens (4 benchmark trigrams) + 8 fresh
    val partial = (20L, benchText.split(" ").take(6).mkString(" ") + " " + doc(8))
    val copied = (21L, benchText) // full copy: containment 1.0
    val train = (clean :+ partial :+ copied).toDF("doc_id", "text")

    val got = Decontaminate.ngramContamination(train, bench,
        "doc_id", "qid", "text", "question", threshold = 0.05)
      .select("doc_id", "n_shared", "n_shingles", "contamination")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap

    assert(got.keySet == Set(20L, 21L), s"only planted docs may flag: ${got.keySet}")
    assert(got(21L)._4 == 1.0 && got(21L)._2 == got(21L)._3)
    // partial doc: 14 tokens -> 12 trigrams, 4 from the benchmark prefix
    assert(got(20L)._2 == 4L && got(20L)._3 == 12L)
    assert(math.abs(got(20L)._4 - 0.3333) < 1e-9)
  }

  test("bench probe side is broadcast (no corpus shuffle for the candidate join)") {
    val train = (0L until 50L).map(i => (i, s"a b c d$i e f")).toDF("doc_id", "text")
    val bench = Seq((1L, "a b c")).toDF("qid", "question")
    val plan = Decontaminate.ngramContamination(train, bench,
      "doc_id", "qid", "text", "question", 0.01).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe:\n$plan")
  }

  test("bloom variant: equals the exact operator at tiny fpp, joinless plan") {
    val rnd = new Random(43)
    val vocab = Vector.tabulate(5000)(i => s"w$i")
    def doc(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val benchText = doc(12)
    val bench = Seq((100L, benchText)).toDF("qid", "question")
    val train = ((0L until 30L).map(i => (i, doc(12)))
      :+ (30L, benchText)
      :+ (31L, benchText.split(" ").take(6).mkString(" ") + " " + doc(8)))
      .toDF("doc_id", "text")

    val exact = Decontaminate.ngramContamination(train, bench,
        "doc_id", "qid", "text", "question", threshold = 0.05)
      .select("doc_id", "n_shared", "n_shingles")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val fuzzy = Decontaminate.bloomNgramContamination(train, bench,
        "doc_id", "qid", "text", "question", threshold = 0.05, fpp = 1e-9)
      .select("doc_id", "n_flagged", "n_shingles")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(fuzzy == exact, s"fpp=1e-9 should reproduce the exact flags\nexact=$exact\nbloom=$fuzzy")

    // no join anywhere: the probe is a codegen'd filter over the postings
    val plan = Decontaminate.bloomNgramContamination(train, bench,
      "doc_id", "qid", "text", "question", 0.05).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"bloom probe must be joinless:\n$plan")
    assert(plan.contains("graft_bloom_contains"), plan)
  }

  test("bloom variant over-flags only upward: per-doc count >= exact count at loose fpp") {
    val rnd = new Random(47)
    val vocab = Vector.tabulate(200)(i => s"v$i") // small vocab: some FP pressure
    def doc(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val bench = Seq((1L, doc(30))).toDF("qid", "question")
    val train = (0L until 40L).map(i => (i, doc(25))).toDF("doc_id", "text")
    val exact = Decontaminate.ngramContamination(train, bench,
        "doc_id", "qid", "text", "question", threshold = 0.0)
      .select("doc_id", "n_shared").as[(Long, Long)].collect().toMap
    val fuzzy = Decontaminate.bloomNgramContamination(train, bench,
        "doc_id", "qid", "text", "question", threshold = 0.0, fpp = 0.2)
      .select("doc_id", "n_flagged").as[(Long, Long)].collect().toMap
    // superset + upper bound: every exactly-contaminated doc appears with
    // at least its exact count
    exact.foreach { case (id, n) =>
      assert(fuzzy.getOrElse(id, 0L) >= n, s"doc $id: bloom ${fuzzy.get(id)} < exact $n")
    }
  }

  test("semanticContamination flags a paraphrase-style near-benchmark vector only") {
    val bench = Seq((0L, Seq(1.0f, 0.0f, 0.0f)), (1L, Seq(0.0f, 1.0f, 0.0f)))
      .toDF("qid", "emb")
    val train = Seq(
      (100L, Seq(0.98f, 0.2f, 0.0f)),  // near bench 0 -> flag
      (101L, Seq(0.0f, 0.0f, 1.0f)),   // orthogonal -> clean
      (102L, Seq(-1.0f, 0.0f, 0.0f))   // opposite direction -> clean
    ).toDF("doc_id", "emb")
    val got = Decontaminate.semanticContamination(
        train, bench, "doc_id", "qid", "emb", "emb", threshold = 0.9)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet === Set(100L))
    assert(got(100L) > 0.97 && got(100L) <= 1.0)
  }
}
