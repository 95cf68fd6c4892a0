package graft.sink

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{RecordMapper, Upserts}

/**
 * A primary-keyed, parquet-backed table with Cassandra-flavored write
 * semantics: LWW upsert, per-column null-to-unset, delete, and counter
 * increments. Stands in for the Cassandra sink in tests and in the oracle
 * harness (the real deployment swaps this for the Cassandra connector's
 * writer — the merge algebra in [[Upserts]] is identical).
 *
 * State layout: `<root>/v<N>/` parquet + a `CURRENT` pointer file; each
 * applied batch writes v<N+1> then flips the pointer — the read-merge-write
 * cycle every LSM store does, done as one co-partitioned join per batch.
 */
class KeyedParquetTable(
    spark: SparkSession,
    val table: SinkTable,
    root: String,
    nullToUnset: Boolean = true) {

  private val rootPath = Paths.get(root)
  Files.createDirectories(rootPath)

  private def currentFile = rootPath.resolve("CURRENT")

  /** CURRENT holds "version batchId" — the batch id makes re-application of
    * an already-applied micro-batch a no-op, which upgrades the pipeline to
    * exactly-once even for counters (the one write mode LWW can't make
    * replay-idempotent; reference hard part, SURVEY §7.4). */
  private def currentMeta: (Int, Long) =
    if (!Files.exists(currentFile)) (0, -1L)
    else Files.readString(currentFile).trim.split(' ') match {
      case Array(v, b) => (v.toInt, b.toLong)
      case Array(v)    => (v.toInt, -1L)
    }

  private def currentVersion: Int = currentMeta._1

  def lastAppliedBatchId: Long = currentMeta._2

  /** Current state; empty frame with the right schema at v0. */
  def state(): DataFrame = {
    val v = currentVersion
    if (v == 0) {
      val base = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), table.schema)
      if (table.counterCols.nonEmpty) base
      else base.withColumn(RecordMapper.WritetimeCol, lit(null).cast(LongType))
    } else spark.read.parquet(rootPath.resolve(s"v$v").toString)
  }

  /** Drop state versions older than the last `keep` (bounded disk; the
    * CURRENT pointer always stays valid). */
  def vacuum(keep: Int = 2): Unit = {
    val v = currentVersion
    (1 to v - keep).foreach { old =>
      val dir = rootPath.resolve(s"v$old")
      if (Files.exists(dir)) {
        Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
      }
    }
  }

  /** Rows visible at `nowSec` — TTL'd rows past their expiry are gone
    * (reference G2: TTL'd cells disappear; modeled at row granularity). */
  def stateAt(nowSec: Long): DataFrame = {
    val s = state()
    if (!s.columns.contains(RecordMapper.ExpiresCol)) s
    else s.filter(col(RecordMapper.ExpiresCol).isNull ||
      col(RecordMapper.ExpiresCol) > nowSec)
      .drop(RecordMapper.ExpiresCol)
  }

  /** Apply one routed, mapped micro-batch (columns: mapped table cols +
    * __mode + __writetime [+ __ttl_seconds]). A batchId ≤ the last applied
    * one is a replay — skipped, exactly-once. */
  def applyBatch(batch: DataFrame, batchId: Long = Long.MinValue): Unit = {
    val (v0, lastBatch) = currentMeta
    if (batchId != Long.MinValue && batchId <= lastBatch) return
    val next =
      if (table.counterCols.nonEmpty)
        Upserts.mergeCounters(state(), Upserts.counterCombine(batch, table), table)
      else
        Upserts.mergeInto(state(), batch, table, nullToUnset)
    val v = v0 + 1
    next.write.mode("overwrite").parquet(rootPath.resolve(s"v$v").toString)
    val tmp = rootPath.resolve("CURRENT.tmp")
    Files.writeString(tmp, s"$v ${math.max(batchId, lastBatch)}")
    Files.move(tmp, currentFile, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    vacuum(keep = 2) // bounded disk: superseded versions are unreachable
  }
}
