package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
 *    Applies to COMPACT stages only — see the shape hint below.
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
 *
 * SHAPE HINT (round-10, the q32/q84 sf1 attribution): the call site
 * declares whether the staged frame is [[Compact]] (aggregated or
 * one-row-per-item — band tables, count tables, per-doc signatures; the
 * cache pays) or [[Exploded]] (one row per token/shingle/span — LARGER
 * than the input scan it derives from, produced by a codegen'd map with
 * no shuffle). Under `persist`, Exploded stages are NOT cached: measured
 * at sf1 on q32 (`ngramJaccardPairs`), the columnar encode+decode of the
 * exploded shingle frame costs 122-259 s CPU / 6.7-25 s wall across
 * captures, while recomputing it per consumer reaches a 64 s CPU /
 * 4.8 s wall steady state — the in-memory columnar write of a frame
 * bigger than its parquet input is strictly worse than re-running the
 * scan+map, and at 100 TB it would also spill ~3-10× the input bytes to
 * executor disk. Catalyst recomputes the map from the (column-pruned,
 * pushed-down) scan per consumer instead. (Residual run-to-run CPU swings
 * on this query are JIT warm-up, not the plan: a 6-run fresh-JVM capture
 * declined monotonically 180→117→117→69→65→64 s CPU with ZERO spill bytes
 * and zero stage evictions — Bench's sf1 probe sidecar now carries
 * cpu_sec / max_task_sec / jit_ms per run so captures self-adjudicate.)
 * `spark.graft.staging.exploded=cache` restores the old behavior for A/B
 * measurement.
 *
 * LIFETIME (the round-9 ownership contract): under `persist`, every staged
 * frame registers a plan in the session CacheManager, which — unlike
 * localCheckpoint blocks, reclaimed by the ContextCleaner — holds it until
 * explicitly unpersisted. Operators stage frames INTERNAL to their plans,
 * so callers can't pair stage/unstage themselves. Stage() therefore tracks
 * every persisted frame in a SESSION-SCOPED FIFO registry with a budget
 * (`spark.graft.staging.budget`, default 64 live frames): staging past the
 * budget unpersists the oldest entry. A long-lived session invoking staged
 * operators in a loop holds O(budget) cached plans instead of O(calls) —
 * an evicted stage is still CORRECT (its plan recomputes; `persist` keeps
 * lineage by design), it just stops being cached. [[releaseAll]] drops
 * everything at once (blocking, for benchmarks and batch-job teardown);
 * [[unstage]] releases one frame early when the operator knows its last
 * consumer has run (e.g. the sink's per-batch banding).
 */
object Staging {

  val ConfKey = "spark.graft.staging"
  val BudgetKey = "spark.graft.staging.budget"
  val ExplodedKey = "spark.graft.staging.exploded"
  val DefaultBudget = 64

  /** Call-site shape hint — see the class scaladoc. */
  sealed trait Shape
  /** Aggregated / one-row-per-item frame: the cache pays. Default. */
  case object Compact extends Shape
  /** One row per token/shingle/span — larger than the scan it derives
    * from, cheap codegen'd recompute: under `persist`, NOT cached. */
  case object Exploded extends Shape

  // WeakHashMap: a session that ends (and is no longer referenced) drops its
  // queue with it. All mutation synchronized on the registry — stage() can
  // race across sink pipelines / parallel operator builds.
  private val registry =
    new java.util.WeakHashMap[SparkSession, java.util.ArrayDeque[DataFrame]]()

  // Process-lifetime count of budget evictions — an observable for bench
  // diagnostics: an eviction mid-query means a staged frame silently fell
  // back to recompute (correct but slower), which is exactly the kind of
  // run-to-run swing a probe needs to attribute (VERDICT r9 #3). Sampled
  // as before/after deltas by Bench's sf1 probe loop.
  private val evictions = new java.util.concurrent.atomic.AtomicLong(0)
  def evictionCount: Long = evictions.get

  def stage(df: DataFrame): DataFrame = stage(df, Compact)

  def stage(df: DataFrame, shape: Shape): DataFrame =
    df.sparkSession.conf.get(ConfKey, "persist") match {
      case "local"   => df.localCheckpoint(eager = true)
      case "persist" =>
        val cacheIt = shape match {
          case Compact  => true
          case Exploded =>
            // A/B override only; default is the measured winner (recompute)
            df.sparkSession.conf.get(ExplodedKey, "recompute") == "cache"
        }
        if (!cacheIt) df
        else {
          val p = df.persist(StorageLevel.MEMORY_AND_DISK)
          register(p)
          p
        }
      case "none"    => df
      case other => throw new IllegalArgumentException(
        s"$ConfKey must be local|persist|none, got '$other'")
    }

  private def register(df: DataFrame): Unit = registry.synchronized {
    val q = registry.computeIfAbsent(df.sparkSession,
      _ => new java.util.ArrayDeque[DataFrame]())
    q.addLast(df)
    val budget =
      try df.sparkSession.conf.get(BudgetKey, DefaultBudget.toString).toInt
      catch { case _: NumberFormatException => DefaultBudget }
    while (q.size > budget) {
      val oldest = q.pollFirst()
      evictions.incrementAndGet()
      // non-blocking: eviction is bookkeeping on the hot path; the blocks
      // drain in the background. Benchmarks wanting quiesced state between
      // runs use releaseAll(blocking = true).
      try oldest.unpersist(false) catch { case _: Throwable => () }
    }
  }

  /** Release a staged frame once its consumers have run. Removes it from
    * the session registry and unpersists (non-blocking). No-op for frames
    * that are not cached. One-shot batch queries can skip this (session
    * teardown clears the cache); loops that know a stage's last consumer
    * (the sink's per-batch banding) release early to keep the registry
    * budget for frames that still pay. */
  def unstage(df: DataFrame): Unit = {
    registry.synchronized {
      Option(registry.get(df.sparkSession)).foreach(_.remove(df))
    }
    df.unpersist()
  }

  /** Unpersist EVERY live graft-staged frame of the session. `blocking`
    * waits for block removal — between-run hygiene for benchmarks, where
    * async removals from run N otherwise overlap (and tax) run N+1. */
  def releaseAll(spark: SparkSession, blocking: Boolean = true): Unit = {
    val drained = registry.synchronized {
      Option(registry.get(spark)) match {
        case Some(q) =>
          val all = new java.util.ArrayList[DataFrame](q)
          q.clear()
          all
        case None => new java.util.ArrayList[DataFrame]()
      }
    }
    drained.forEach(df =>
      try df.unpersist(blocking) catch { case _: Throwable => () })
  }

  /** Live (registered, not yet evicted/released) staged frames for the
    * session — the observable the long-lived-session spec bounds. */
  def registeredCount(spark: SparkSession): Int = registry.synchronized {
    Option(registry.get(spark)).map(_.size).getOrElse(0)
  }
}
