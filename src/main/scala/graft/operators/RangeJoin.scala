package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Range (interval) join: pair every left event with every right interval
 * that contains it — `l.time ∈ [r.start, r.end)` per join key. Spark plans
 * the naive form as a key-equi join with the range as a post-filter, which
 * degenerates to a per-key cross product when keys are hot (every event ×
 * every interval of that key).
 *
 * The scale shape is INTERVAL BUCKETING: quantize time into fixed-width
 * buckets, explode each interval over the buckets it covers (⌈len/W⌉+1
 * rows — bounded fan-out, chosen via `bucketWidth` ≈ typical interval
 * length), map each event to its single bucket, and equi-join on
 * (key, bucket) before the exact range filter. The join key gains entropy
 * (hot keys spread over their time range), and each event meets only the
 * intervals overlapping its bucket — never the key's full history.
 * An (event, interval) pair meets in exactly one bucket (the event's), so
 * no dedup pass is needed.
 */
object RangeJoin {

  def bucketed(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // end is exclusive: an interval covers buckets of [start, end-1].
    // empty/inverted intervals are dropped BEFORE the explode — Spark's
    // sequence() would otherwise step backwards and emit spurious buckets
    val rb = right.filter(col(endCol) > col(startCol))
      .withColumn("__bucket",
        explode(sequence(expr(s"$startCol DIV $bucketWidth"),
          expr(s"($endCol - 1) DIV $bucketWidth"))))
    val lb = left.withColumn("__bucket", expr(s"$timeCol DIV $bucketWidth"))
    lb.join(rb, Seq(keyCol, "__bucket"))
      .filter(col(timeCol) >= col(startCol) && col(timeCol) < col(endCol))
      .drop("__bucket")
  }
}
