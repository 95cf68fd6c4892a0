package graft.sink

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
 * State is HASH-BUCKETED by primary key into `numBuckets` buckets, with a
 * manifest (`CURRENT`) mapping each bucket to the state version that owns
 * it. A micro-batch merges ONLY the buckets its keys touch:
 *
 *   - the batch's bucket set is computed from the pk hash;
 *   - touched buckets' state is read with a partition filter on the bucket
 *     column (partition-pruned — untouched buckets are never scanned);
 *   - one co-partitioned merge job writes the new bucket partitions to
 *     `v<N+1>/__bucket=<k>/`; the manifest flips touched pointers to N+1 and
 *     leaves untouched buckets on their old versions.
 *
 * Per-batch cost is O(touched state), not O(total state) — the round-1
 * full-table read-merge-write rewrite is gone. This is the same
 * manifest-of-bucket-snapshots shape a table format uses at 100 TB; the
 * number of live versions is bounded by `numBuckets` and [[vacuum]] drops
 * unreferenced ones.
 */
class KeyedParquetTable(
    spark: SparkSession,
    val table: SinkTable,
    root: String,
    nullToUnset: Boolean = true,
    numBuckets: Int = 16,
    /** Parquet codec for state files (X2 `compression` mapped via
      * `SinkConfig.Config.parquetCodec`). */
    compression: String = "snappy") {

  val BucketCol = "__bucket"

  private val rootPath = Paths.get(root)
  Files.createDirectories(rootPath)

  private def currentFile = rootPath.resolve("CURRENT")

  private def bucketOf: Column =
    pmod(hash(table.primaryKey.map(col): _*), lit(numBuckets))

  /** Manifest: last applied batch id, newest version, bucket → version.
    * Replay of an already-applied micro-batch is a no-op, which upgrades the
    * pipeline to exactly-once even for counters (the one write mode LWW
    * can't make replay-idempotent; reference hard part, SURVEY §7.4).
    *
    * The header also pins `numBuckets`: bucketOf re-hashes keys, so reopening
    * existing state with a different bucket count would silently read the
    * wrong partitions and drop/duplicate rows on merge — a mismatch fails
    * fast instead. */
  private case class Meta(lastBatch: Long, maxV: Int, buckets: Map[Int, Int])

  private def currentMeta: Meta =
    if (!Files.exists(currentFile)) Meta(-1L, 0, Map.empty)
    else {
      val lines = Files.readString(currentFile).trim.split('\n')
      val head = lines.head.split(' ')
      val Array(b, v) = head.take(2)
      head.drop(2).headOption.map(_.toInt).foreach { persisted =>
        require(persisted == numBuckets,
          s"state at $root was written with numBuckets=$persisted but opened " +
            s"with numBuckets=$numBuckets; re-hashing keys would corrupt " +
            "bucket pruning — open with the original bucket count")
      }
      val buckets = lines.tail.filter(_.nonEmpty).map { ln =>
        val Array(k, ver) = ln.split(':'); k.toInt -> ver.toInt
      }.toMap
      Meta(b.toLong, v.toInt, buckets)
    }

  private def writeMeta(m: Meta): Unit = {
    val body = (s"${m.lastBatch} ${m.maxV} $numBuckets" +:
      m.buckets.toSeq.sorted.map { case (k, v) => s"$k:$v" }).mkString("\n")
    val tmp = rootPath.resolve("CURRENT.tmp")
    Files.writeString(tmp, body)
    Files.move(tmp, currentFile, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  def lastAppliedBatchId: Long = currentMeta.lastBatch

  private def emptyState: DataFrame = {
    val base = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), table.schema)
    if (table.counterCols.nonEmpty) base
    else base.withColumn(RecordMapper.WritetimeCol, lit(null).cast(LongType))
  }

  /** Read the state of `wanted` buckets (None = all): one partition-pruned
    * read per distinct owning version, unioned. */
  private def readBuckets(m: Meta, wanted: Option[Set[Int]]): DataFrame = {
    val picked = wanted match {
      case Some(w) => m.buckets.view.filterKeys(w.contains).toMap
      case None    => m.buckets
    }
    if (picked.isEmpty) emptyState
    else picked.groupBy(_._2).toSeq.map { case (v, bks) =>
      spark.read.parquet(rootPath.resolve(s"v$v").toString)
        .filter(col(BucketCol).isin(bks.keys.toSeq: _*))
        .drop(BucketCol)
    }.reduce(_ unionByName _)
  }

  /** Current full state; empty frame with the right schema before any write. */
  def state(): DataFrame = readBuckets(currentMeta, None)

  /** Drop version directories no longer referenced by any bucket pointer
    * (bounded disk; the manifest always stays valid). */
  def vacuum(): Unit = {
    val m = currentMeta
    val live = m.buckets.values.toSet
    (1 to m.maxV).filterNot(live.contains).foreach { old =>
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
    val m = currentMeta
    if (batchId != Long.MinValue && batchId <= m.lastBatch) return

    // the batch determines which buckets the merge touches at all
    val touched = batch.select(bucketOf.as(BucketCol)).distinct()
      .collect().map(_.getInt(0)).toSet
    if (touched.isEmpty) {
      writeMeta(m.copy(lastBatch = math.max(batchId, m.lastBatch)))
      return
    }

    val stTouched = readBuckets(m, Some(touched))
    val next =
      if (table.counterCols.nonEmpty)
        Upserts.mergeCounters(stTouched, Upserts.counterCombine(batch, table), table)
      else
        Upserts.mergeInto(stTouched, batch, table, nullToUnset)

    val v = m.maxV + 1
    val dir = rootPath.resolve(s"v$v").toString
    val out = next.withColumn(BucketCol, bucketOf)
    if (out.isEmpty) // all touched rows deleted: schema-only file, no partitions
      out.write.mode("overwrite").option("compression", compression).parquet(dir)
    else
      out.write.mode("overwrite").option("compression", compression)
        .partitionBy(BucketCol).parquet(dir)

    writeMeta(Meta(
      lastBatch = math.max(batchId, m.lastBatch),
      maxV = v,
      buckets = m.buckets ++ touched.map(_ -> v)))
    vacuum() // superseded versions are unreachable
  }
}
