package graft

import graft.functions.UnigramVocab
import graft.operators.Unigram
import scala.util.Random

/** Property tests for the unigram-LM tokenizer: for ANY corpus,
  * coverage singles guarantee lossless round-trips, training is
  * deterministic, and the Viterbi encoder returns a TRUE max-likelihood
  * segmentation (checked against brute-force enumeration on short
  * words). Deterministic seeds — a failure reproduces. */
class UnigramPropertySpec extends SparkSpec {

  private def randomWord(rnd: Random): String = {
    val alphabet = "abcdefgh日本語é"
    (0 until (1 + rnd.nextInt(10))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
  }

  test("round-trip: concatenating a word's tokens reproduces the word exactly") {
    for (seed <- 1 to 8) {
      val rnd = new Random(seed)
      val dict = (0 until (5 + rnd.nextInt(40)))
        .map(_ => (randomWord(rnd), 1L + rnd.nextInt(50))).distinct
        .groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toArray
      val model = Unigram.trainOnDict(dict, vocabSize = 10 + rnd.nextInt(60),
        maxTokenCp = 1 + rnd.nextInt(6), emIters = 1 + rnd.nextInt(2),
        pruneFraction = 0.3)
      val vocab = model.vocab
      // trained words AND unseen words (unknown cps included) round-trip
      val probes = dict.map(_._1) ++ (0 until 10).map(_ => randomWord(rnd)) ++
        Seq("zzXX@@", "😀x😀")
      probes.foreach { w =>
        val enc = vocab.encode(w)
        assert(enc.mkString === w, s"seed=$seed word='$w' tokens=${enc.toSeq}")
        assert(enc.forall(_.nonEmpty), s"no empty tokens for '$w'")
      }
    }
  }

  test("training is deterministic; vocab respects budget once multis exist") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val dict = (0 until 30).map(_ => (randomWord(rnd), 1L + rnd.nextInt(9))).distinct
        .groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toArray
      val budget = 10 + rnd.nextInt(40)
      val a = Unigram.trainOnDict(dict, budget, maxTokenCp = 4, emIters = 2, pruneFraction = 0.2)
      val b = Unigram.trainOnDict(dict, budget, maxTokenCp = 4, emIters = 2, pruneFraction = 0.2)
      assert(a.tokens.toSeq === b.tokens.toSeq, s"seed=$seed: same dict -> same model")
      assert(a.unkLogProb === b.unkLogProb)
      val singles = a.tokens.map(_._1).filter(t => t.codePointCount(0, t.length) == 1)
      // budget holds unless coverage alone exceeds it (then only singles remain)
      assert(a.tokens.length <= math.max(budget, singles.length),
        s"seed=$seed vocab ${a.tokens.length} vs budget $budget singles ${singles.length}")
    }
  }

  test("Viterbi returns a true max-likelihood segmentation (vs enumeration)") {
    def segmentations(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to w.length).flatMap { k =>
        // split on char boundaries only for ASCII test alphabet
        segmentations(w.drop(k)).map(w.take(k) +: _)
      }
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      // random vocab over a-d with random log-probs; all singles present
      val multis = (0 until 8).map(_ =>
        (0 until (2 + rnd.nextInt(3))).map(_ => "abcd"(rnd.nextInt(4))).mkString).distinct
      val toks = ("abcd".map(_.toString) ++ multis).distinct
        .map(t => (t, -1.0 - 4.0 * rnd.nextDouble()))
      val v = new UnigramVocab(toks.toArray, unkLogProb = -50.0)
      val lp = toks.toMap
      for (_ <- 0 until 6) {
        val w = (0 until (1 + rnd.nextInt(7))).map(_ => "abcd"(rnd.nextInt(4))).mkString
        val got = v.encode(w)
        val gotScore = got.map(lp).sum
        val best = segmentations(w)
          .filter(_.forall(lp.contains))
          .map(seg => seg.map(lp).sum)
          .max
        assert(math.abs(gotScore - best) < 1e-9,
          s"seed=$seed word='$w' viterbi=${got.toSeq} ($gotScore) best=$best")
      }
    }
  }
}
