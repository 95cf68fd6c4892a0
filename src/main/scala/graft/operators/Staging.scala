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
 *  - `local` (default): `localCheckpoint(eager = false)` — blocks cached on
 *    executors with TRUNCATED lineage. Fastest, and the right call on
 *    local[32] where an "executor loss" is a process death anyway. NOT
 *    fault-tolerant on a real cluster: losing an executor loses blocks that
 *    have no lineage to recompute from, failing the job.
 *  - `persist`: `persist(MEMORY_AND_DISK)` — keeps lineage, so a lost
 *    executor recomputes the lost partitions instead of failing the job.
 *    The 100-TB setting. Costs keeping the upstream lineage alive (deeper
 *    plans) and a possible recompute on failure.
 *  - `none`: pass-through — every consumer recomputes the stage. For plan
 *    debugging and for single-consumer call shapes.
 *
 * All modes are LAZY: building an operator does not run the staged
 * computation (round-6 advice — `spanDedup` used the eager default and
 * materialized at DataFrame-construction time). One caveat, measured and
 * Probe-pinned: under AQE, `local` staging of a SHUFFLE-BEARING frame
 * materializes that frame's exchange stages when a consumer plan is built
 * (`localCheckpoint` resolves the plan to an RDD, and
 * `AdaptiveSparkPlanExec.execute` runs its shuffle stages to pick the
 * final plan) — map-only staged frames (the spanDedup tiling, the shingle
 * rows) build with ZERO jobs, and `persist` staging is fully lazy for any
 * plan shape (it only marks a storage level).
 */
object Staging {

  val ConfKey = "spark.graft.staging"

  def stage(df: DataFrame): DataFrame =
    df.sparkSession.conf.get(ConfKey, "local") match {
      case "local"   => df.localCheckpoint(eager = false)
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
