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

  private def currentVersion: Int =
    if (Files.exists(currentFile)) Files.readString(currentFile).trim.toInt else 0

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
    * __mode + __writetime [+ __ttl_seconds]). */
  def applyBatch(batch: DataFrame): Unit = {
    val next =
      if (table.counterCols.nonEmpty)
        Upserts.mergeCounters(state(), Upserts.counterCombine(batch, table), table)
      else
        Upserts.mergeInto(state(), batch, table, nullToUnset)
    val v = currentVersion + 1
    next.write.mode("overwrite").parquet(rootPath.resolve(s"v$v").toString)
    val tmp = rootPath.resolve("CURRENT.tmp")
    Files.writeString(tmp, v.toString)
    Files.move(tmp, currentFile, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }
}
