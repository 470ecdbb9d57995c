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
  }
}
