package graft.functions

import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal

/** SQL registration for graft's native expressions — after
  * `registerAll`, `spark.sql` queries can call them directly:
  * `SELECT graft_dot(a.embedding, b.embedding) ...`. */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    GraftColumnBridge.registerFunction(spark, "graft_dot", es => DotProduct(es(0), es(1)))
    GraftColumnBridge.registerFunction(spark, "graft_l2norm", es => L2Norm(es(0)))
    GraftColumnBridge.registerFunction(spark, "graft_l2normalize", es => L2Normalize(es(0)))
    GraftColumnBridge.registerFunction(spark, "graft_rolling_hash", es => RollingHash(es(0)))
    GraftColumnBridge.registerFunction(spark, "graft_simhash64", es => SimHash64(es(0)))
    GraftColumnBridge.registerFunction(spark, "graft_minhash_sig", {
      case Seq(arr, Literal(k: Int, _)) => MinHashSignature(arr, k)
      case _ => throw new IllegalArgumentException(
        "graft_minhash_sig(array<bigint>, k) requires a literal integer k")
    })
    GraftColumnBridge.registerFunction(spark, "graft_morton", es => MortonCode(es(0), es(1)))
    GraftColumnBridge.registerFunction(spark, "graft_nfc", es => NfcNormalize(es(0)))
    GraftColumnBridge.registerFunction(spark, "graft_unicode_normalize", {
      case Seq(str, Literal(form: org.apache.spark.unsafe.types.UTF8String, _)) =>
        UnicodeNormalize(str, form.toString)
      case _ => throw new IllegalArgumentException(
        "graft_unicode_normalize(str, form) requires a literal form string (NFC/NFD/NFKC/NFKD)")
    })
    GraftColumnBridge.registerFunction(spark, "graft_porter_stem", es => PorterStem(es(0)))
    GraftColumnBridge.registerFunction(spark, "graft_jaro_winkler", es => JaroWinkler(es(0), es(1)))
    GraftColumnBridge.registerFunction(spark, "graft_damerau_levenshtein",
      es => DamerauLevenshtein(es(0), es(1)))
    GraftColumnBridge.registerFunction(spark, "graft_deflate_ratio", es => DeflateRatio(es(0)))
    GraftColumnBridge.registerFunction(spark, "graft_quantize_int8", es => QuantizeInt8(es(0)))
    GraftColumnBridge.registerFunction(spark, "graft_int8_dot", es => Int8Dot(es(0), es(1)))
    GraftColumnBridge.registerFunction(spark, "graft_trigram_hashes", es => TrigramShingleHashes(es(0)))
    GraftColumnBridge.registerFunction(spark, "graft_top_bigram_frac", es => TopBigramFraction(es(0)))
    GraftColumnBridge.registerFunction(spark, "graft_span_hashes", {
      case Seq(arr, Literal(k: Int, _)) => SpanHashes(arr, k)
      case _ => throw new IllegalArgumentException(
        "graft_span_hashes(array<string>, k) requires a literal integer k")
    })
    GraftColumnBridge.registerFunction(spark, "graft_dedup_lines", es => DedupLines(es(0)))
    GraftColumnBridge.registerFunction(spark, "graft_hashed_tf", {
      // dim/seed accept any FOLDABLE int expression (a bare literal or
      // e.g. CAST(7 AS BIGINT)) — they must be plan-time constants
      // because dim fixes the output type
      case Seq(arr, dim, rest @ _*) if dim.foldable && rest.forall(_.foldable) &&
          rest.length <= 1 =>
        val d = dim.eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"graft_hashed_tf dim must be integral, got $other")
        }
        val s = rest.headOption.map(_.eval() match {
          case i: Int => i.toLong
          case l: Long => l
          case other => throw new IllegalArgumentException(
            s"graft_hashed_tf seed must be integral, got $other")
        }).getOrElse(42L)
        HashedTfVector(arr, d, s)
      case _ => throw new IllegalArgumentException(
        "graft_hashed_tf(array<string>, dim[, seed]) requires constant dim/seed")
    })
  }
}
