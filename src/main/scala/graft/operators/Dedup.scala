package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for training-data pipelines.
  *
  * Scale design: every method here reduces to hash-shuffle groupBy /
  * equi-join on a derived key (fingerprint, LSH bucket, blocking key) —
  * never an all-pairs comparison. At 100 TB the candidate space is what
  * kills you; exact dedup is one shuffle on a 128-bit fingerprint,
  * MinHash-LSH turns near-dup detection into `bands` equi-joins whose
  * fan-out is controlled by (bands x rowsPerBand) vs the similarity
  * threshold. All hashing is deterministic (xxhash64 with literal seeds),
  * so results are reproducible across runs and cluster layouts.
  */
object Dedup {

  /** Exact dedup: one representative (min id) per distinct text, with the
    * copy count. Single hash-shuffle on the md5 fingerprint — at scale the
    * 16-byte digest shuffles instead of the document body. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Keep-first dedup by arbitrary key columns: the row with the lowest
    * `orderCol` per key survives. Window shuffle on the key columns. */
  def keepFirst(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Distinct word-n-gram shingles of a token array (n fixed at 3; a doc
    * shorter than n shingles to its full text). */
  def shingles3(toks: Column): Column = {
    val sh = transform(
      sequence(lit(1), size(toks) - 2),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))
    array_distinct(when(size(toks) < 3, array(concat_ws(" ", toks))).otherwise(sh))
  }

  /** Exact Jaccard over two (already distinct) string arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      greatest(size(array_union(a, b)), lit(1)).cast("double")

  /** All-pairs n-gram Jaccard within blocks: only rows sharing
    * `blockCols` are compared (blocking keeps the join linear-ish; the
    * unblocked variant is MinHash-LSH below). Returns (id_a, id_b, j). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        blockCols: Seq[String], threshold: Double): DataFrame = {
    val withSh = df.select(col(idCol) +: blockCols.map(col) :+
      shingles3(TextAnalysis.tokens(col(textCol))).as("_sh"): _*)
    val a = withSh.select(col(idCol).as("id_a") +: blockCols.map(c => col(c)) :+ col("_sh").as("_sha"): _*)
    val b = withSh.select(col(idCol).as("id_b") +: blockCols.map(c => col(c).as(s"${c}_b")) :+ col("_sh").as("_shb"): _*)
    val joinCond = blockCols.map(c => col(c) === col(s"${c}_b")).reduce(_ && _) && col("id_a") < col("id_b")
    a.join(b, joinCond)
      .withColumn("j", round(jaccard(col("_sha"), col("_shb")), 4))
      .filter(col("j") >= threshold)
      .select(col("id_a"), col("id_b"), col("j"))
  }

  /** MinHash signature: k independent permutations simulated by salted
    * xxhash64 over the shingle set; sig[i] = min over shingles. Pure
    * codegen'd expressions (no UDF). */
  def minHashSignature(shinglesCol: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(shinglesCol, s => xxhash64(lit(i), s)))
    }: _*)

  /** LSH banding: (band, bandHash) per row; near-dup docs collide in some
    * band with probability 1-(1-j^r)^b. */
  private def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        xxhash64((0 until rowsPerBand).map(j => element_at(sig, b * rowsPerBand + j + 1)) :+ lit(b): _*).as("h"))
    }: _*)

  /** MinHash+LSH near-dup pairs, verified: LSH proposes candidates via
    * band-bucket equi-join; exact shingle-Jaccard filters false positives.
    * k = bands*rowsPerBand hash functions. The equi-join shuffles on
    * (band, bandHash) — this is the 100 TB-safe formulation (no O(n^2)).
    */
  def minHashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          threshold: Double, bands: Int = 12, rowsPerBand: Int = 4): DataFrame = {
    val k = bands * rowsPerBand
    val withSig = df
      .select(col(idCol), shingles3(TextAnalysis.tokens(col(textCol))).as("_sh"))
      .withColumn("_sig", minHashSignature(col("_sh"), k))
    val exploded = withSig
      .select(col(idCol), col("_sh"), explode(bandHashes(col("_sig"), bands, rowsPerBand)).as("_bh"))
      .select(col(idCol), col("_sh"), col("_bh.band").as("_band"), col("_bh.h").as("_h"))
    val a = exploded.select(col(idCol).as("id_a"), col("_sh").as("_sha"), col("_band"), col("_h"))
    val b = exploded.select(col(idCol).as("id_b"), col("_sh").as("_shb"), col("_band"), col("_h"))
    a.join(b, Seq("_band", "_h"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("_sha"), col("_shb"))
      .distinct() // a pair may collide in several bands
      .withColumn("j", round(jaccard(col("_sha"), col("_shb")), 4))
      .filter(col("j") >= threshold)
      .select(col("id_a"), col("id_b"), col("j"))
  }

  /** 64-bit SimHash over the token multiset: bit i of the result is the
    * sign of the population vote across token hashes — for each of 64
    * bits, fold (+1/-1) over the token array. All codegen'd expressions
    * (no UDF). */
  def simHash(toks: Column): Column = {
    val bitCols = (0 until 64).map { i =>
      val vote = aggregate(toks, lit(0),
        (acc, t) => acc + when(shiftrightunsigned(xxhash64(t), i).bitwiseAND(lit(1L)) === 1L, lit(1)).otherwise(lit(-1)))
      when(vote > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on the 4 x 16-bit sub-bands (a pair
    * within hamming distance <= 3 must agree exactly on at least one of 4
    * bands — pigeonhole), then verify the true hamming distance. Same
    * equi-join shape as MinHash-LSH: scales. */
  def simHashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int = 3): DataFrame = {
    val withH = df.select(col(idCol), simHash(TextAnalysis.tokens(col(textCol))).as("_h"))
    val banded = withH.select(col(idCol), col("_h"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"), shiftrightunsigned(col("_h"), b * 16).bitwiseAND(lit(0xFFFFL)).as("key"))
      }: _*)).as("_bh"))
      .select(col(idCol), col("_h"), col("_bh.band").as("_band"), col("_bh.key").as("_key"))
    val a = banded.select(col(idCol).as("id_a"), col("_h").as("_ha"), col("_band"), col("_key"))
    val b = banded.select(col(idCol).as("id_b"), col("_h").as("_hb"), col("_band"), col("_key"))
    a.join(b, Seq("_band", "_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("_ha"), col("_hb"))
      .distinct()
      .withColumn("hamming", hamming64(col("_ha"), col("_hb")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
