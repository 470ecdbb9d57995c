package graft

import graft.operators.WordPiece
import scala.util.Random

/** Property tests for the trainable WordPiece tokenizer: for ANY
  * training corpus, the alphabet-coverage construction guarantees every
  * trained word segments WITHOUT [UNK] and round-trips after `##`
  * stripping; unknowns are all-or-nothing (one [UNK], never a partial
  * prefix); training is deterministic and the merge budget is
  * respected. Deterministic seeds — a failure reproduces. */
class WordPiecePropertySpec extends SparkSpec {

  private def randomWord(rnd: Random): String = {
    val alphabet = "abcdefgh日本語é"
    (0 until (1 + rnd.nextInt(10))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
  }

  private def roundTrip(toks: Array[String]): String =
    if (toks.isEmpty) "" else toks.head + toks.tail.map(_.stripPrefix("##")).mkString

  test("every trained word segments UNK-free and round-trips; continuations carry ##") {
    for (seed <- 1 to 8) {
      val rnd = new Random(seed)
      val dict = (0 until (5 + rnd.nextInt(40)))
        .map(_ => (randomWord(rnd), 1L + rnd.nextInt(50))).distinct
        .groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toArray
      val m = WordPiece.trainOnDict(dict, numMerges = rnd.nextInt(60),
        minPairCount = 1, unkToken = "[UNK]")
      dict.map(_._1).foreach { w =>
        val enc = m.vocab.encode(w)
        assert(!enc.contains("[UNK]"), s"seed=$seed trained word '$w' must be covered")
        assert(roundTrip(enc) === w, s"seed=$seed word='$w' tokens=${enc.toSeq}")
        assert(enc.tail.forall(_.startsWith("##")), s"seed=$seed continuations of '$w'")
        assert(!enc.head.startsWith("##"), s"seed=$seed initial piece of '$w'")
      }
      // words over the SAME alphabet also stay covered (alphabet
      // coverage is per-symbol-position, and every trained word
      // contributes both its initial and ## symbols)...
      // ...but a word whose FIRST char never appeared word-initially in
      // training may legitimately be [UNK]: all-or-nothing semantics
      (0 until 10).map(_ => randomWord(rnd)).foreach { w =>
        val enc = m.vocab.encode(w)
        if (enc.contains("[UNK]"))
          assert(enc.toSeq === Seq("[UNK]"),
            s"seed=$seed unknown '$w' must be all-or-nothing, got ${enc.toSeq}")
        else
          assert(roundTrip(enc) === w, s"seed=$seed word='$w' tokens=${enc.toSeq}")
      }
    }
  }

  test("training is deterministic and the merge budget is respected") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val dict = (0 until 30).map(_ => (randomWord(rnd), 1L + rnd.nextInt(9))).distinct
        .groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toArray
      val budget = rnd.nextInt(40)
      val m1 = WordPiece.trainOnDict(dict, budget, minPairCount = 1, unkToken = "[UNK]")
      val m2 = WordPiece.trainOnDict(dict, budget, minPairCount = 1, unkToken = "[UNK]")
      assert(m1.tokens.toSeq === m2.tokens.toSeq, s"seed=$seed determinism")
      val alphabetSize = dict.flatMap { case (w, _) =>
        val cps = w.codePoints().toArray
        cps.indices.map(i => (if (i == 0) "" else "##") + new String(Character.toChars(cps(i))))
      }.distinct.length
      assert(m1.tokens.length <= alphabetSize + budget,
        s"seed=$seed vocab ${m1.tokens.length} exceeds alphabet $alphabetSize + budget $budget")
    }
  }

  test("greedy longest-match: no emitted token is extensible within the vocab") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val dict = (0 until 25).map(_ => (randomWord(rnd), 1L + rnd.nextInt(20))).distinct
        .groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toArray
      val m = WordPiece.trainOnDict(dict, numMerges = 30, minPairCount = 1, unkToken = "[UNK]")
      dict.map(_._1).foreach { w =>
        val enc = m.vocab.encode(w)
        // re-walk: at each position the emitted token must be the
        // LONGEST vocab member starting there
        var pos = 0
        enc.foreach { tok =>
          val body = tok.stripPrefix("##")
          val rest = w.substring(pos)
          // any strictly longer candidate from this position must be absent
          val cps = rest.codePoints().toArray
          val bodyCp = body.codePointCount(0, body.length)
          var longer = bodyCp + 1
          while (longer <= cps.length) {
            val cand0 = new String(cps.take(longer).flatMap(Character.toChars))
            val cand = if (pos > 0) "##" + cand0 else cand0
            assert(!m.vocab.contains(cand),
              s"seed=$seed word='$w' emitted '$tok' but longer '$cand' is in vocab")
            longer += 1
          }
          pos += body.length
        }
        assert(pos === w.length, s"seed=$seed coverage of '$w'")
      }
    }
  }
}
