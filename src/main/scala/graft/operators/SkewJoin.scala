package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join splitting handles sort-merge partitions after the
  * fact; salting fixes the layout up front and also covers cases AQE
  * can't touch (aggregation hot keys feeding a join, deterministic
  * replay). The left (skewed, large) side gets a random salt in
  * [0, saltFactor); the right side is replicated saltFactor times with
  * every salt value; the join key becomes (key, salt), spreading each hot
  * key over saltFactor reducers. Result set is identical to the unsalted
  * join — salting only changes the partitioning. Cost: |R| × saltFactor
  * replication, so use for joins where the right side is the smaller one
  * but too big (or too skew-prone) to broadcast. */
object SkewJoin {

  def saltedInnerJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                      saltFactor: Int = 8, seed: Long = 42L): DataFrame = {
    require(saltFactor > 0)
    val salted = left.withColumn("_salt", (rand(seed) * saltFactor).cast("int"))
    val replicated = right.withColumn("_salt", explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }
}
