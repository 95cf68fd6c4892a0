package graft.sources

import org.apache.spark.sql.DataFrame

/**
 * Scale-adaptive parallelism rescue for operators whose SCAN-STAGE MAP WORK
 * dominates (optimization guide §2.5 "input skew: one huge unsplittable
 * file … repartition immediately after the read", §1.2 "per-task work").
 *
 * The bench/oracle inputs are ONE parquet file per table (single row
 * group), so a scan plans exactly one input split: per-row heavy work —
 * media encode/decode, quantized dot products against a broadcast side,
 * cell-grid verify joins — runs in ONE task while the other cores idle.
 *
 * The r11 A/B established WHERE this rescue belongs. Applied at the
 * READERS (every query), the extra round-robin exchange plus 32-task
 * stages cost the ~150 cheap-aggregation rows 1.5-4× each and the bench
 * total rose; applied only inside the map-heavy operators it took q271
 * bmp-resize 3.37→0.65 s, q274 avi-roundtrip 4.13→0.72 s, q178
 * label-noise 3.70→0.94 s, q293 spatial join 2.50→1.27 s with no
 * regressions elsewhere. Same conclusion the guide's §8 worked example
 * reaches: parallelize the expensive map, not the world.
 *
 * `rescue` is a no-op whenever the input already has at least
 * `defaultParallelism` partitions — at 100 TB (multi-file tables, real
 * shuffle parallelism upstream) it never fires; there is no local[32]
 * constant anywhere, the target is the session's own parallelism. Results
 * are partitioning-independent by the engine's determinism contract
 * (re-verified 317/317 oracle-green after every application).
 */
object Scan {

  /** Spread `df` to the session's parallelism ahead of heavy per-row map
    * work; no-op when the input is already at least that parallel. The
    * round-robin exchange carries only `df`'s (pruned) columns — call on
    * the narrow projection, not the raw table.
    *
    * Applies ONLY to narrow scans (leaf + project/filter): first, a
    * computed input (join/aggregate upstream) is already shuffle-parallel,
    * so the rescue could only add an exchange; second — the sharp edge —
    * probing `df.rdd.getNumPartitions` on a plan that CONTAINS exchanges
    * makes AQE eagerly execute every non-result query stage to finalize
    * the plan, and that work is thrown away when the caller's own action
    * re-executes (measured r11: bruteForceTopK callers with computed
    * corpora ran 3-5× slower with an unguarded rescue; plain-scan corpora
    * ran 3× faster). On a narrow scan the RDD probe is plan-only. */
  def rescue(df: DataFrame): DataFrame =
    if (!isNarrowScan(df.queryExecution.analyzed)) df
    else {
      val p = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
    }

  private def isNarrowScan(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    p match {
      case _: LeafNode => true
      case u @ (_: Project | _: Filter | _: SubqueryAlias) =>
        isNarrowScan(u.asInstanceOf[UnaryNode].child)
      case _ => false
    }
  }
}
