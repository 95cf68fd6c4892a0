package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/**
 * Streaming exact deduplication over a document stream: emit each distinct
 * content hash's FIRST document, drop every later copy — the online form of
 * `Dedup.exact` (whose batch result is the DuckDB-oracled q23). An ingest
 * pipeline runs this between decode and the sink so duplicates never reach
 * downstream state.
 *
 * State = one boolean per distinct content hash, partitioned by the hash —
 * grows with distinct content (the theoretical minimum for exact streaming
 * dedup) and shards across executors with the shuffle. For corpus-scale
 * streams where even that is too large, cap it with a TTL'd state
 * (processing-time timeout) and accept re-admits after the horizon, or run
 * the batch `Dedup.exact` as a periodic compaction — both compose with this
 * operator unchanged.
 *
 * Stateless curation ops (PII redaction, quality/langid scoring, repetition
 * stats' per-doc projections) need no streaming form: they are pure
 * projections and run on a streaming DataFrame as-is.
 */
object StreamingDedup {

  case class HashedDoc(docId: Long, h: Long)

  /** 64-bit content hash (codegen'd xxhash64). `Dedup.exact` keys on md5 —
    * equal text collapses identically under either; this one is a long so
    * the state key stays 8 bytes. */
  def contentHash(text: Column): Column = xxhash64(text)

  /** First-seen filter: one output row per distinct hash, ever — the row
    * with the lowest docId within the batch that introduces the hash.
    * Append-mode; exactly-once per hash under checkpointed recovery. */
  def firstSeen(docs: Dataset[HashedDoc]): Dataset[HashedDoc] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.h)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[HashedDoc],
            state: org.apache.spark.sql.streaming.GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(it.minBy(_.docId))
          }
      }
  }

  /** Convenience: hash a (id, text) stream and keep first-seen docs. */
  def dedupStream(docs: DataFrame, textCol: String, idCol: String)
      : Dataset[HashedDoc] = {
    import docs.sparkSession.implicits._
    firstSeen(docs.select(
      col(idCol).cast("long").as("docId"),
      contentHash(col(textCol)).as("h"))
      .as[HashedDoc])
  }
}
