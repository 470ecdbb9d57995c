package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for corpus curation. */
object Sample {

  /** At most `k` rows per key, selected in md5-hash order of the id —
    * the standard "cap documents per domain" curation step. Hash order
    * makes the selection (a) uniform-ish regardless of id assignment
    * order, (b) stable across runs, partitionings, and cluster layouts,
    * and (c) reproducible in any engine with md5 (so the result is
    * DuckDB-oracle-checkable, unlike seeded RNG sampling). `salt` varies
    * the draw without touching the data. One window shuffle on the keys
    * — the same cost envelope as [[Dedup.keepFirst]]. */
  def capPerKey(df: DataFrame, keyCols: Seq[String], idCol: String, k: Int,
                salt: String = ""): DataFrame = {
    require(k > 0, "k must be positive")
    // Non-null id is a hard precondition: null ids tie completely (null
    // draw AND null tiebreaker), so which of >k null-id rows survive
    // would be partitioning-dependent. Fail loudly per-row instead of
    // silently returning engine-dependent output.
    val draw = when(col(idCol).isNull,
        raise_error(lit(s"Sample.capPerKey requires non-null '$idCol'")))
      .otherwise(md5(concat(lit(salt), lit("|"), col(idCol).cast("string"))))
    // nulls LAST explicitly: Spark's ASC default is NULLS FIRST while SQL
    // engines like DuckDB default to NULLS LAST — pin it so the oracle
    // comparison can never hinge on the engines' divergent default
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(draw.asc_nulls_last, col(idCol).asc_nulls_last)
    // rank column name chosen to not collide with any input column —
    // withColumn would silently overwrite (and drop) a caller's column
    val rn = Iterator.from(0).map(i => s"_rn$i").find(n => !df.columns.contains(n)).get
    df.withColumn(rn, row_number().over(w)).filter(col(rn) <= k).drop(rn)
  }
}
