package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.BloomContainsLong

/** Explicit Bloom runtime-filter join: prune the probe (large) side with
  * a Bloom filter built from the build side's join keys BEFORE the probe
  * side is shuffled, then run the real equi-join to discard the filter's
  * false positives — result set identical to the plain join, shuffle
  * traffic proportional to the SELECTED keys instead of the whole fact
  * table.
  *
  * Spark has its own injected version (`spark.sql.optimizer.runtime.
  * bloomFilter.enabled`, off by default, and only fired when cost
  * heuristics approve); this operator is the guaranteed form for
  * pipelines that KNOW the build side is selective — e.g. "re-read all
  * lineitems of this month's flagged orders" at 100 TB, where the probe
  * scan is petabyte-scale and the flagged key set is thousands. The
  * probe-side predicate is a codegen'd [[BloomContainsLong]] sitting
  * directly on the scan (no false negatives, so no lost rows; false
  * positives at `fpp` cost only wasted shuffle, removed by the join).
  *
  * Scale notes:
  *   - the Bloom build is `df.stat.bloomFilter` — a distributed
  *     treeAggregate over the build side; the sketch itself is
  *     `~1.2 * expectedKeys * log2(1/fpp)` bits on the driver and ships
  *     to executors once per task binary (referenced object, not a
  *     plan literal);
  *   - the build side is computed twice (bloom pass + join pass);
  *     callers with an expensive build plan should persist or
  *     localCheckpoint it first — at the intended selectivities it is
  *     the small side by construction;
  *   - the final join still shuffles both (reduced) sides on the key;
  *     when the build side fits the broadcast threshold AQE converts it
  *     to a broadcast-hash join, making the whole query a single scan
  *     of the probe side with two pushed filters.
  */
object RuntimeFilterJoin {

  /** Inner equi-join `probe ⋈ build` on a single long-typed key pair,
    * with the probe side Bloom-pruned before the shuffle. */
  def bloomFilteredJoin(probe: DataFrame, build: DataFrame,
                        probeKey: String, buildKey: String,
                        expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    require(expectedKeys > 0, "expectedKeys must be > 0")
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    val bloom = build.stat.bloomFilter(buildKey, expectedKeys, fpp)
    probe.filter(BloomContainsLong(col(probeKey).cast("long"), bloom))
      .join(build, col(probeKey) === col(buildKey))
  }
}
