package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Staging hook for DataFrames that feed multiple downstream stages (the
 * band table of a dedup gate, the shingle frame of a Jaccard verify, the
 * span tiling of a span-dedup pass): compute the stage once instead of once
 * per consumer.
 *
 * The MECHANISM is a deployment decision, so it is a session config rather
 * than a call-site choice (`spark.graft.staging`):
 *
 *  - `persist` (default): `persist(MEMORY_AND_DISK)` — keeps lineage, so a
 *    lost executor recomputes the lost partitions instead of failing the
 *    job, and FULLY LAZY (CacheManager materialization is thread-safe, no
 *    checkpoint locks). The 100-TB setting, and the setting for "building
 *    an operator must not run jobs": constructing a staged operator costs
 *    nothing until an action runs, and intermediates spill to disk rather
 *    than pinning executor memory. Costs keeping the upstream lineage
 *    alive (deeper plans) and a possible recompute on failure.
 *  - `local`: `localCheckpoint(eager = true)` — blocks cached on executors
 *    with TRUNCATED lineage. Occasionally useful on local[32] to cut very
 *    deep lineages, but NOT fault-tolerant on a real cluster (losing an
 *    executor loses blocks with no lineage to recompute from) and EAGER by
 *    necessity, not preference: operator CONSTRUCTION runs a Spark job and
 *    materializes the whole staged frame into executor storage before
 *    first use — ~10× regressions were measured on sf1 staged-operator
 *    probes when this was the default (round 7). Eagerness is forced
 *    because the lazy variant DEADLOCKS when its first materialization
 *    happens on a broadcast-exchange thread concurrently with DAG-scheduler
 *    stage submission — `RDD.doCheckpoint` locks `RDDCheckpointData$` while
 *    the scheduler holds the RDD lock in `getCacheLocs` and each waits on
 *    the other (jstack-confirmed Java-level deadlock in the test suite,
 *    `Dedup.semanticDedup` under a broadcast join).
 *  - `none`: pass-through — every consumer recomputes the stage. For plan
 *    debugging and for single-consumer call shapes.
 */
object Staging {

  val ConfKey = "spark.graft.staging"

  def stage(df: DataFrame): DataFrame =
    df.sparkSession.conf.get(ConfKey, "persist") match {
      case "local"   => df.localCheckpoint(eager = true)
      case "persist" => df.persist(StorageLevel.MEMORY_AND_DISK)
      case "none"    => df
      case other => throw new IllegalArgumentException(
        s"$ConfKey must be local|persist|none, got '$other'")
    }

  /** Release a staged frame once its consumers have run. Under `persist`
    * this matters for LIFETIME: `persist()` registers the plan in the
    * session CacheManager, which holds it until explicitly unpersisted —
    * a long-running pipeline staging a frame per micro-batch would pin
    * unbounded cache otherwise (localCheckpoint RDDs are GC'd via the
    * ContextCleaner, so `local` mode self-cleans). No-op for frames that
    * are not cached. One-shot batch queries can skip this (session teardown
    * clears the cache); anything called repeatedly in one session — the
    * sink's per-batch staging, an operator invoked in a loop — must pair
    * stage with unstage or run `spark.catalog.clearCache()` periodically. */
  def unstage(df: DataFrame): Unit = df.unpersist()
}
