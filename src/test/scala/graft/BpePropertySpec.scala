package graft

import graft.operators.Bpe
import scala.util.Random

/** Property tests for the trainable BPE tokenizer: for ANY corpus, the
  * within-word convention guarantees lossless round-trips, training is
  * deterministic, and merge order is consistent between the trainer and
  * the greedy encoder. Deterministic seeds — a failure reproduces. */
class BpePropertySpec extends SparkSpec {

  private def randomWord(rnd: Random): String = {
    val alphabet = "abcdefgh日本語é"
    (0 until (1 + rnd.nextInt(10))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
  }

  test("round-trip: concatenating a word's BPE tokens reproduces the word exactly") {
    for (seed <- 1 to 8) {
      val rnd = new Random(seed)
      val dict = (0 until (5 + rnd.nextInt(40)))
        .map(_ => (randomWord(rnd), 1L + rnd.nextInt(50))).distinct
        .groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toArray
      val merges = Bpe.trainOnDict(dict, numMerges = rnd.nextInt(60), minPairCount = 1)
      val vocab = Bpe.Model(merges).vocab
      // every trained word AND unseen words round-trip losslessly
      val probes = dict.map(_._1) ++ (0 until 10).map(_ => randomWord(rnd))
      probes.foreach { w =>
        val enc = vocab.encode(w)
        assert(enc.mkString === w, s"seed=$seed word='$w' tokens=${enc.toSeq}")
        assert(enc.forall(_.nonEmpty), s"no empty tokens for '$w'")
      }
    }
  }

  test("training is deterministic and merge count respects the budget") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val dict = (0 until 30).map(_ => (randomWord(rnd), 1L + rnd.nextInt(9))).distinct
        .groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toArray
      val budget = rnd.nextInt(40)
      val a = Bpe.trainOnDict(dict, budget, minPairCount = 1)
      val b = Bpe.trainOnDict(dict, budget, minPairCount = 1)
      assert(a.toSeq === b.toSeq, s"seed=$seed: same dict -> same merges")
      assert(a.length <= budget)
      // each merge's output symbol is the concatenation of its pair
      a.foreach { case (l, r) => assert((l + r).nonEmpty) }
    }
  }

  test("encoding a frequent word uses the earliest applicable merge first") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val dict = (0 until 20).map(_ => (randomWord(rnd), 1L + rnd.nextInt(9))).distinct
        .groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toArray
      val merges = Bpe.trainOnDict(dict, numMerges = 30, minPairCount = 1)
      val vocab = Bpe.Model(merges).vocab
      dict.map(_._1).foreach { w =>
        val enc = vocab.encode(w)
        // no adjacent token pair in the OUTPUT may itself be a known
        // merge — greedy encoding runs until no rank applies
        enc.sliding(2).filter(_.length == 2).foreach { pair =>
          val joined = pair(0) + " " + pair(1)
          val isMerge = merges.exists(m => m._1 == pair(0) && m._2 == pair(1))
          assert(!isMerge, s"seed=$seed '$w': unapplied merge $joined in ${enc.toSeq}")
        }
      }
    }
  }
}
