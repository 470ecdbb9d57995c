package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-annotator agreement for preference/label data `[EXT]`:
  * pairwise Cohen's kappa (Cohen 1960) over (item, rater, label) rows —
  * the data-quality gate run BEFORE fitting anything to human labels
  * (a reward model trained on kappa≈0 labels learns noise; the
  * preference pipeline's [[BradleyTerry]] fit assumes the comparisons
  * mean something, and this measures whether they do).
  *
  * For each rater pair (a, b) over their CO-RATED items:
  * `kappa = (po - pe) / (1 - pe)` with po = observed agreement rate and
  * pe = chance agreement Σ_label p_a(label)·p_b(label) (marginals over
  * the co-rated set). kappa is NULL when pe = 1 (both raters constant
  * and identical — agreement is undefined, not perfect).
  *
  * Scale shape: one item-keyed self-join (ratings per item are a
  * handful, so the join fans out per-item-bounded), then everything
  * reduces to the (rater, rater, label, label) contingency table —
  * bounded by raters² × labels², metadata from there on. */
object Agreement {

  def cohenKappa(df: DataFrame, itemCol: String, raterCol: String,
                 labelCol: String): DataFrame = {
    val a = df.select(col(itemCol).as("it"), col(raterCol).as("rater_a"),
      col(labelCol).as("la"))
    val b = df.select(col(itemCol).as("it"), col(raterCol).as("rater_b"),
      col(labelCol).as("lb"))
    val cont = a.join(b, Seq("it")).where(col("rater_a") < col("rater_b"))
      .groupBy(col("rater_a"), col("rater_b"), col("la"), col("lb"))
      .agg(count(lit(1)).as("n"))
    val tot = cont.groupBy(col("rater_a"), col("rater_b"))
      .agg(sum(col("n")).as("n_items"),
        sum(when(col("la") === col("lb"), col("n")).otherwise(0L)).as("agree"))
    val margA = cont.groupBy(col("rater_a"), col("rater_b"), col("la"))
      .agg(sum(col("n")).as("na"))
    val margB = cont.groupBy(col("rater_a"), col("rater_b"), col("lb"))
      .agg(sum(col("n")).as("nb"))
    val cross = margA.join(margB,
        margA("rater_a") === margB("rater_a") &&
          margA("rater_b") === margB("rater_b") &&
          margA("la") === margB("lb"))
      .groupBy(margA("rater_a"), margA("rater_b"))
      .agg(sum(col("na") * col("nb")).as("cross"))
    tot.join(cross, Seq("rater_a", "rater_b"), "left")
      .na.fill(0L, Seq("cross"))
      .withColumn("po", col("agree").cast("double") / col("n_items"))
      .withColumn("pe", col("cross").cast("double") /
        (col("n_items").cast("double") * col("n_items")))
      .withColumn("kappa",
        when(col("pe") === 1.0, lit(null).cast("double"))
          .otherwise((col("po") - col("pe")) / (lit(1.0) - col("pe"))))
      .select(col("rater_a"), col("rater_b"), col("n_items"),
        col("po"), col("pe"), col("kappa"))
  }
}
