package graft

import graft.operators.Experiment

/** Two-proportion z-test: hand-computed statistics, effect/no-effect
  * significance, and variant symmetry. */
class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  test("twoProportion matches hand-computed z on a tiny exact fixture") {
    // A: 10 units, 2 converted; B: 10 units, 6 converted.
    // pa=0.2 pb=0.6 pooled=0.4 se=sqrt(0.4*0.6*(0.2))=sqrt(0.048)
    // z = 0.4/sqrt(0.048) = 1.8257418583505538
    val rows = (0 until 10).map(i => (0, if (i < 2) 1 else 0)) ++
      (0 until 10).map(i => (1, if (i < 6) 1 else 0))
    val out = Experiment.twoProportion(rows.toDF("variant", "y"), "variant", "y", "m")
      .collect()(0)
    assert(out.getAs[Long]("n_a") === 10L && out.getAs[Long]("n_b") === 10L)
    assert(out.getAs[Long]("x_a") === 2L && out.getAs[Long]("x_b") === 6L)
    assert(out.getAs[Double]("rate_a") === 0.2 && out.getAs[Double]("rate_b") === 0.6)
    assert(out.getAs[Double]("abs_lift") === 0.4)
    assert(math.abs(out.getAs[Double]("z") - 1.825742) < 1e-9)
    // |z| = 1.83 < 1.96: not significant at alpha=0.05
    assert(!out.getAs[Boolean]("significant"))
  }

  test("a strong planted effect is significant; a null effect is not") {
    val strong = ((0 until 200).map(i => (0, if (i < 40) 1 else 0)) ++
      (0 until 200).map(i => (1, if (i < 120) 1 else 0))).toDF("variant", "y")
    assert(Experiment.twoProportion(strong, "variant", "y", "m")
      .collect()(0).getAs[Boolean]("significant"))
    val none = ((0 until 200).map(i => (0, i % 2)) ++
      (0 until 200).map(i => (1, i % 2))).toDF("variant", "y")
    val row = Experiment.twoProportion(none, "variant", "y", "m").collect()(0)
    assert(row.getAs[Double]("z") === 0.0)
    assert(!row.getAs[Boolean]("significant"))
  }

  test("swapping arm labels negates z and lift, keeps significance") {
    val rows = ((0 until 50).map(i => (0, if (i < 10) 1 else 0)) ++
      (0 until 60).map(i => (1, if (i < 30) 1 else 0)))
    val fwd = Experiment.twoProportion(rows.toDF("variant", "y"), "variant", "y", "m")
      .collect()(0)
    val rev = Experiment.twoProportion(
      rows.map { case (v, y) => (1 - v, y) }.toDF("variant", "y"), "variant", "y", "m")
      .collect()(0)
    assert(math.abs(fwd.getAs[Double]("z") + rev.getAs[Double]("z")) < 1e-8)
    assert(math.abs(fwd.getAs[Double]("abs_lift") + rev.getAs[Double]("abs_lift")) < 1e-8)
    assert(fwd.getAs[Boolean]("significant") === rev.getAs[Boolean]("significant"))
  }

  test("requiredNPerArm matches the hand-computed normal-approximation value") {
    // p=0.5, delta=0.1, alpha=.05 two-sided, power=.8 -> 387.34 -> 388
    import org.apache.spark.sql.functions._
    val out = spark.range(1).select(Experiment.requiredNPerArm(
      lit(0.5), lit(0.1), lit(Experiment.Z95), lit(Experiment.Z80)).as("n"))
      .collect()(0).getAs[Long]("n")
    assert(out === 388L)
    // more power or a smaller effect always needs more samples
    def n(d: Double, zb: Double) = spark.range(1).select(
      Experiment.requiredNPerArm(lit(0.5), lit(d), lit(Experiment.Z95), lit(zb)).as("n"))
      .collect()(0).getAs[Long]("n")
    assert(n(0.1, Experiment.Z90) > 388L)
    assert(n(0.05, Experiment.Z80) > 4 * 388L * 9 / 10, "quadratic in 1/delta")
  }
}
