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

  test("chunkTokens: boundary shapes — short doc, exact fit, overlap, blank") {
    val df = Seq(
      (1L, (1 to 5).map(i => s"t$i").mkString(" ")),   // n=5  < window -> 1 short chunk
      (2L, (1 to 8).map(i => s"t$i").mkString(" ")),   // n=8  = window -> exactly 1 chunk
      (3L, (1 to 14).map(i => s"t$i").mkString(" ")),  // n=14 -> starts 0,4,8 -> 3 chunks
      (4L, "   "),                                      // blank -> 0 chunks
      (5L, "")                                          // empty -> 0 chunks
    ).toDF("id", "text")
      .unionByName(Seq((6L, Option.empty[String])).toDF("id", "text")) // null -> 0 chunks
    val got = Pack.chunkTokens(df, "id", "text", window = 8, stride = 4)
      .orderBy("id", "chunk_idx")
      .as[(Long, Int, Int, String)].collect()
    assert(got.map(r => (r._1, r._2, r._3)).toSeq === Seq(
      (1L, 0, 5), (2L, 0, 8), (3L, 0, 8), (3L, 1, 8), (3L, 2, 6)))
    // overlapping windows carry the overlap: chunk 1 of doc 3 starts at t5
    assert(got.find(r => r._1 == 3L && r._2 == 1).get._4 ===
      (5 to 12).map(i => s"t$i").mkString(" "))
    // last chunk is the tail only
    assert(got.find(r => r._1 == 3L && r._2 == 2).get._4 ===
      (9 to 14).map(i => s"t$i").mkString(" "))
  }

  test("chunkTokens covers every token exactly once when stride == window") {
    val text = (1 to 23).map(i => s"w$i").mkString(" ")
    val got = Pack.chunkTokens(Seq((1L, text)).toDF("id", "text"), "id", "text", 8, 8)
      .orderBy("chunk_idx").as[(Long, Int, Int, String)].collect()
    assert(got.map(_._3).sum === 23, "non-overlapping chunks must partition the tokens")
    assert(got.map(_._4).mkString(" ") === text)
  }

  test("chunkTokens matches a brute-force reference across random shapes") {
    val rnd = new scala.util.Random(17)
    def refChunks(toks: Array[String], w: Int, s: Int): Seq[(Int, Seq[String])] =
      if (toks.isEmpty) Nil
      else {
        val n = toks.length
        val nc = 1 + math.ceil(math.max(0, n - w) / s.toDouble).toInt
        (0 until nc).map(i => (i, toks.slice(i * s, math.min(i * s + w, n)).toSeq))
      }
    for (trial <- 1 to 5) {
      val w = 1 + rnd.nextInt(12)
      val s = 1 + rnd.nextInt(w)
      val docs = (0 until 40).map { id =>
        val n = rnd.nextInt(40)
        (id.toLong, Array.tabulate(n)(j => s"t${id}_$j"))
      }
      val df = docs.map { case (id, t) => (id, t.mkString(" ")) }.toDF("id", "text")
      val got = Pack.chunkTokens(df, "id", "text", w, s)
        .select("id", "chunk_idx", "chunk_text")
        .as[(Long, Int, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._2, r._3)).toSeq).toMap
      docs.foreach { case (id, toks) =>
        val expect = refChunks(toks, w, s).map { case (i, c) => (i, c.mkString(" ")) }
        assert(got.getOrElse(id, Nil) === expect, s"trial $trial doc $id w=$w s=$s")
      }
    }
  }

  test("chunkTokens tokenizer seam: regex tokens split punctuation, default unchanged") {
    import graft.operators.TextAnalysis
    val df = Seq((1L, "don't stop-me now! x2"), (2L, "!!!")).toDF("id", "text")
    // whitespace default: 4 tokens for doc 1
    val ws = Pack.chunkTokens(df, "id", "text", window = 8, stride = 8)
      .orderBy("id", "chunk_idx").as[(Long, Int, Int, String)].collect()
    assert(ws.filter(_._1 == 1L).map(_._3).sum === 4)
    // regex tokenizer: don / ' / t | stop / - / me | now / ! | x2 -> 10
    // subword-ish units (digits stay glued to letters? no: x2 -> x, 2)
    val rx = Pack.chunkTokens(df, "id", "text", window = 8, stride = 8,
        tokenizer = TextAnalysis.regexTokens)
      .orderBy("id", "chunk_idx").as[(Long, Int, Int, String)].collect()
    assert(rx.filter(_._1 == 1L).map(_._3).sum === 10,
      s"got ${rx.filter(_._1 == 1L).map(_._4).mkString("|")}")
    assert(rx.find(_._1 == 1L).get._4.startsWith("don ' t"), "punctuation splits off")
    // symbols-only text still chunks under regexTokens (3 symbol tokens)
    assert(rx.filter(_._1 == 2L).map(_._3).sum === 3)
    // a letters-only custom tokenizer returns [] on symbol-only text:
    // the size-0 guard emits zero chunks instead of one phantom chunk
    val lettersOnly = (c: org.apache.spark.sql.Column) =>
      org.apache.spark.sql.functions.expr(s"regexp_extract_all(text, '[A-Za-z]+', 0)")
    val lo = Pack.chunkTokens(df, "id", "text", 8, 8, tokenizer = lettersOnly)
      .as[(Long, Int, Int, String)].collect()
    assert(!lo.exists(_._1 == 2L), "empty tokenization must emit no chunks")
  }

  test("stratified sampling keeps approximate per-stratum fractions") {
    val df = (0 until 4000).map(i => (i.toLong, if (i % 4 == 0) "rare" else "common"))
      .toDF("id", "stratum")
    val sampled = df.stat.sampleBy("stratum", Map("rare" -> 0.5, "common" -> 0.1), seed = 42L)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(math.abs(sampled("rare") - 500.0) / 500.0 < 0.2)
    assert(math.abs(sampled("common") - 300.0) / 300.0 < 0.2)
  }

  test("chunkSentences: atoms intact, order kept, budget-target semantics") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      // 4 sentences of 3/3/3/3 tokens, budget 6 -> chunks [s1 s2][s3 s4]
      (1L, "one two three. four five six. seven eight nine! ten eleven twelve?"),
      // straddler: 4 + 4 tokens, budget 6 -> s2 straddles INTO chunk 0
      (2L, "a b c d. e f g h."),
      // a 9-token sentence alone with budget 4 fills its own chunk
      (3L, "t1 t2 t3 t4 t5 t6 t7 t8 t9."),
      (4L, ""),
      (5L, "   ")
    ).toDF("doc_id", "text")
    val out = Pack.chunkSentences(docs, "doc_id", "text", budget = 6)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Int, Int, Long, String)].collect()

    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._5).toSeq === Seq(
      "one two three. four five six.", "seven eight nine! ten eleven twelve?"))
    assert(d1.map(_._3).toSeq === Seq(2, 2), "two sentences per chunk")
    assert(d1.map(_._4).toSeq === Seq(6L, 6L))

    val d2 = out.filter(_._1 == 2L)
    assert(d2.map(_._5).toSeq === Seq("a b c d. e f g h."),
      "straddling sentence closes into the earlier bin (documented slack)")
    assert(d2.head._4 === 8L, "chunk may overrun by its straddler")

    val d3 = out.filter(_._1 == 3L)
    assert(d3.length === 1 && d3.head._3 === 1, "giant sentence stays one atom")
    assert(out.count(r => r._1 == 4L || r._1 == 5L) === 0, "blank docs emit nothing")

    // reassembly: concatenating chunks reproduces the sentence stream
    val joined = d1.map(_._5).mkString(" ")
    assert(joined === "one two three. four five six. seven eight nine! ten eleven twelve?")
  }

  test("chunkSentences: dense chunk ids when one sentence spans many bins") {
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "a b c d e f g h i j. x y.")).toDF("doc_id", "text")
    // 10-token sentence with budget 3: bins jump 0 -> 3; ids must be 0,1
    val out = Pack.chunkSentences(docs, "doc_id", "text", budget = 3)
      .orderBy("chunk_idx").as[(Long, Int, Int, Long, String)].collect()
    assert(out.map(_._2).toSeq === Seq(0, 1), "no holes in chunk_idx")
    assert(out(0)._5.startsWith("a b c") && out(1)._5 === "x y.")
  }

  test("spanCorrupt: 7/3/2 schedule masks hand-checked spans; short docs pass through") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),                  // 10 toks: block 0 masked, block 1 partial-unmasked
      (2L, "a b c d e f g h i j k l m n"),          // 14 toks: both blocks masked
      (3L, "x y"),                                   // too short for one span
      (4L, "p q r s t")                              // exactly start+len: one span, no post-span tokens
    ).toDF("id", "text")
    val out = Pack.spanCorrupt(docs, "id", "text")
      .orderBy("id")
      .as[(Long, Int, Int, String, String)].collect()
    assert(out(0) === ((1L, 10, 1, "a b c <extra_id_0> f g h i j", "<extra_id_0> d e")))
    assert(out(1) === ((2L, 14, 2,
      "a b c <extra_id_0> f g h i j <extra_id_1> m n",
      "<extra_id_0> d e <extra_id_1> k l")))
    assert(out(2) === ((3L, 2, 0, "x y", "")))
    assert(out(3) === ((4L, 5, 1, "p q r <extra_id_0>", "<extra_id_0> s t")))
    // reconstruction invariant: splicing each target span back over its
    // sentinel recovers the original token stream
    for ((id, _, _, inp, tgt) <- out) {
      val spans = tgt.split("<extra_id_\\d+> ?").filter(_.nonEmpty).map(_.trim)
      var rec = inp
      for ((s, k) <- spans.zipWithIndex)
        rec = rec.replace(s"<extra_id_$k>", s)
      val orig = docs.where($"id" === id).as[(Long, String)].head()._2
      assert(rec === orig, s"doc $id must reconstruct")
    }
    intercept[IllegalArgumentException](
      Pack.spanCorrupt(docs, "id", "text", period = 4, spanStart = 3, spanLen = 2))
  }

  test("fimSplit: thirds PSM split reconstructs the original") {
    val docs = Seq(
      (1L, "a b c d e f g h i"),  // 9 toks: P=a b c, M=d e f, S=g h i
      (2L, "x"),                  // 1 tok: P and M empty, S=x
      (3L, "p q r s")             // 4 toks: c1=1, c2=2 -> P=p, M=q, S=r s
    ).toDF("id", "text")
    val out = Pack.fimSplit(docs, "id", "text")
      .orderBy("id").as[(Long, Int, Int, Int, String)].collect()
    assert(out(0) === ((1L, 9, 3, 6,
      "<fim_prefix> a b c <fim_suffix> g h i <fim_middle> d e f")))
    assert(out(1) === ((2L, 1, 0, 0, "<fim_prefix> <fim_suffix> x <fim_middle>")))
    assert(out(2) === ((3L, 4, 1, 2, "<fim_prefix> p <fim_suffix> r s <fim_middle> q")))
    // PSM reorder recovers the original token stream
    for ((id, _, _, _, psm) <- out) {
      val m = "<fim_prefix> ?(.*?) ?<fim_suffix> ?(.*?) ?<fim_middle> ?(.*)".r
      val m(p, sfx, mid) = psm
      val rec = Seq(p, mid, sfx).filter(_.nonEmpty).mkString(" ")
      val orig = docs.where($"id" === id).as[(Long, String)].head()._2
      assert(rec === orig, s"doc $id must reconstruct")
    }
  }
}
