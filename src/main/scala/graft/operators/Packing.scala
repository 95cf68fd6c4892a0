package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Sequence packing for training-data pipelines: documents are tokenized,
 * concatenated in id order, and cut into fixed-length sequences (the
 * GPT-style concat-and-chunk loader). This operator computes the packing
 * PLAN — each document's global token offset and the range of sequence
 * slots it lands in — without ever materializing the concatenated stream.
 *
 * The global running offset is a prefix scan, and the naive Spark spelling
 * (`sum over (order by id)` with no partition) collapses the whole corpus
 * into ONE partition — the exact WindowExec scale-killer the trained-IVF
 * seed selection had in round 2. Instead this is the classic two-stage
 * distributed scan:
 *
 *   1. bucket documents by id range (order-preserving integer math);
 *   2. per-bucket token totals — one partial-agg shuffle producing at most
 *      `nBuckets` rows, collected to the driver (bounded, tiny) and turned
 *      into exclusive per-bucket offsets;
 *   3. a KEYED window (partitioned by bucket, ordered by id) adds the
 *      within-bucket running sum to the broadcast bucket offset — map-scale
 *      parallelism across buckets at any corpus size.
 *
 * All arithmetic is int64 with truncating DIV, so the DuckDB oracle
 * reproduces the plan bit-for-bit.
 */
object Packing {

  /**
   * Packing plan: one row per document with
   *   - `n_tokens`     whitespace token count,
   *   - `start_off`    global token offset of the doc's first token when all
   *                    docs are concatenated in ascending `idCol` order,
   *   - `pack_first`   index of the `seqLen`-token sequence its first token
   *                    lands in,
   *   - `pack_last`    index for its last token (null for empty docs),
   *   - `n_packs`      sequences the doc spans (0 for empty docs).
   *
   * @param nBuckets scan fan-out: per-bucket sums collected to the driver
   *                 (≤ nBuckets rows). 1024 buckets keeps the within-bucket
   *                 windows ~corpus/1024 rows each; raise for bigger corpora.
   */
  def packPlan(df: DataFrame, textCol: String, idCol: String, seqLen: Int,
      nBuckets: Int = 1024): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    require(nBuckets > 0, "nBuckets must be positive")
    val id = col(idCol)
    val counts = df.select(id,
      TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))

    // Order-preserving buckets: fixed-width id ranges. min/max is one cheap
    // column-stats agg (parquet footers answer it without a full scan).
    val Array(minId, maxId) = counts
      .agg(min(id).cast(LongType), max(id).cast(LongType))
      .collect()(0).toSeq.map {
        case null => 0L
        case l: Long => l
      }.toArray
    val width = math.max(1L, (maxId - minId) / nBuckets + 1)
    val bucketed = counts.withColumn("bucket",
      ((id.cast(LongType) - minId) / width).cast(LongType))

    // Stage 1: per-bucket token totals → exclusive prefix offsets on the
    // driver (at most nBuckets rows — bounded by construction, not by data).
    val bucketSums = bucketed.groupBy("bucket")
      .agg(sum("n_tokens").as("bucket_tokens"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = bucketSums.map { case (b, n) =>
      val off = acc; acc += n; (b, off)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offsetsDf = offsets.toSeq.toDF("bucket", "bucket_off")

    // Stage 2: keyed within-bucket exclusive running sum + broadcast offset.
    val w = Window.partitionBy(col("bucket")).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .join(broadcast(offsetsDf), "bucket")
      .withColumn("start_off",
        col("bucket_off") + coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_first", expr(s"start_off DIV $seqLen"))
      .withColumn("pack_last",
        when(col("n_tokens") > 0,
          expr(s"(start_off + n_tokens - 1) DIV $seqLen")))
      .withColumn("n_packs",
        coalesce(col("pack_last") - col("pack_first") + 1L, lit(0L)))
      .select(id, col("n_tokens"), col("start_off"),
        col("pack_first"), col("pack_last"), col("n_packs"))
  }

  /**
   * Token-budget selection: keep the best-scoring documents until a global
   * token budget is filled (the data-selection step of a quality-ranked
   * pre-training mix — "take the top docs by quality until N tokens").
   * Rows are taken in (`scoreCol` DESC, `idCol` ASC) order; a doc is kept
   * iff the running token total BEFORE it is still under `budgetTokens`
   * (the straddling doc is kept and truncated at load time).
   *
   * Same two-stage scan as [[packPlan]], but the bucket IS the score:
   * `scoreCol` must be a bounded integer domain (e.g. an 0–100 quality
   * pct) — per-score token totals are one partial-agg groupBy collected to
   * the driver (≤ |domain| rows), turned into exclusive score-descending
   * offsets, and broadcast back onto a per-score keyed window. No global
   * sort, no single-partition window, at any corpus size.
   *
   * Output = input columns + `start_off` (global token offset in the
   * selection order), filtered to the kept rows.
   */
  def budgetSelect(df: DataFrame, scoreCol: String, idCol: String,
      tokensCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val scoreSums = df.groupBy(scoreCol)
      .agg(sum(tokensCol).as("score_tokens"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(-_._1)
    // the collect above is bounded by the score DOMAIN, not the corpus —
    // fail loudly if a caller passes a high-cardinality column (e.g. an id)
    // as the score, instead of silently ballooning the driver
    require(scoreSums.length <= 100000,
      s"budgetSelect score domain has ${scoreSums.length} distinct values; " +
        "quantize the score to a bounded range (e.g. an integer pct) first")
    var acc = 0L
    val offsets = scoreSums.map { case (s, n) =>
      val off = acc; acc += n; (s, off)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offsetsDf = offsets.toSeq.toDF(scoreCol, "__score_off")
    val w = Window.partitionBy(col(scoreCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.join(broadcast(offsetsDf), scoreCol)
      .withColumn("start_off",
        col("__score_off") + coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .filter(col("start_off") < budgetTokens)
      .drop("__score_off")
  }

  /**
   * Per-group token-budget selection — the domain-mix balancer: within each
   * group (source/domain/language), take documents best-score-first until
   * the group's token budget fills (the doc straddling the boundary is
   * kept, as [[budgetSelect]]). Unlike the global [[budgetSelect]] (which
   * needs a two-stage prefix scan to avoid a global window), the per-group
   * form is exactly one GROUP-KEYED window — groups fill in parallel, no
   * driver-side state, no collect.
   *
   * Output: the input columns plus `start_off` (tokens consumed by
   * strictly-better rows of the same group).
   */
  def groupBudgetSelect(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String, tokensCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("start_off", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .filter(col("start_off") < budgetTokens)
  }

  /**
   * Sequence-slot occupancy: for each `seqLen`-token output sequence, how
   * many documents contribute tokens to it and how many of its slots are
   * filled (the last sequence may be partial). Derived from [[packPlan]] by
   * exploding each doc's [pack_first, pack_last] range — bounded fan-out
   * (a doc adds ⌈n_tokens/seqLen⌉+1 rows) and one partial-agg groupBy.
   */
  def packOccupancy(plan: DataFrame, seqLen: Int): DataFrame =
    plan.filter(col("n_tokens") > 0)
      .select(
        explode(sequence(col("pack_first"), col("pack_last"))).as("pack_id"),
        col("start_off"), col("n_tokens"))
      .withColumn("tok_in_pack",
        least(col("start_off") + col("n_tokens"), (col("pack_id") + 1) * seqLen)
          - greatest(col("start_off"), col("pack_id") * seqLen))
      .groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("tok_in_pack").as("n_filled"))
  /**
   * Deterministic proportional mixture SCHEDULE — the materialized read
   * order a training loader follows when interleaving sources at fixed
   * weights (the complement of q66's mixture SAMPLING, which picks a
   * subset; this orders everything). Item k of a weight-w source lands at
   * rational slot (2k+1)/2w — Bresenham interleaving: a weight-4 source
   * appears 4× as often, evenly spread, no RNG. Integerized as
   * slot = (2k+1)·10⁶ DIV w; the schedule is the output sorted by
   * (slot, source, id).
   *
   * Scale shape: one keyed window (row_number per source) and a final
   * range-partitioned sort — no global window, no driver state. Ties at
   * equal slot resolve by (source, id) so any cluster layout produces
   * the same order.
   */
  def mixtureSchedule(df: DataFrame, idCol: String, sourceCol: String,
      weightCol: org.apache.spark.sql.Column): DataFrame = {
    val w = Window.partitionBy(sourceCol).orderBy(idCol)
    df.select(col(idCol), col(sourceCol), weightCol.as("__w"))
      .withColumn("k", row_number().over(w).cast(LongType) - 1L)
      .select(col(idCol), col(sourceCol), col("k"),
        IntMath.idiv((col("k") * 2L + 1L) * 1000000L, col("__w"))
          .as("slot"))
  }
}
