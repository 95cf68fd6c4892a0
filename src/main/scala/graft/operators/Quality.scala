package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Declarative data-quality checks over a batch — the contract gate a
 * training-data pipeline runs before a corpus ships (the public Deequ /
 * dbt-test shape: a named rule set, evaluated in ONE pass, reported as
 * violation counts). All integer arithmetic, so every report is
 * oracle-exact.
 */
object Quality {

  /**
   * Evaluate a set of named row-level rules in a single aggregate pass:
   * each rule is a boolean Column expected TRUE; a row violates the rule
   * when the predicate is FALSE **or NULL** (the completeness convention —
   * an unevaluable constraint is a violation, so `col.isNotNull` rules
   * behave as NOT-NULL checks).
   *
   * Shape at 100 TB: one map-side projection computes every rule's 0/1
   * per row, ONE partial-agg aggregate sums them — the rule-table then
   * unfolds from that single row. Adding rules adds columns, not passes.
   *
   * Output per rule (ordered): (rule, n_rows, violations, violation_ppm).
   */
  def ruleAudit(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val sums = Seq(count(lit(1)).as("__n")) ++
      rules.zipWithIndex.map { case ((_, pred), i) =>
        sum(when(pred, 0L).otherwise(1L)).as(s"__v$i") }
    val agg1 = df.agg(sums.head, sums.tail: _*)
    val rows = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col("__n").as("n_rows"),
        col(s"__v$i").as("violations"),
        IntMath.idiv(col(s"__v$i") * lit(1000000L),
          greatest(col("__n"), lit(1L))).as("violation_ppm"))
    }
    agg1.select(explode(array(rows: _*)).as("r")).select("r.*")
      .orderBy("rule")
  }

  /**
   * Mergeable numeric aggregate state — the materialized-view maintenance
   * primitive: build per-key (n, sum, min, max) summaries per ingest
   * batch, MERGE summaries instead of reprocessing rows, finalize into
   * the readout (mean by truncating division). The same
   * build/merge/finalize contract as the HLL sketch lifecycle
   * ([[Stats.hllSketch]]/`hllMerge`/`hllFinalize`), for plain numeric
   * rollups: merge(build(A), build(B)) ≡ build(A ∪ B) exactly, because
   * every component is associative-commutative integer arithmetic.
   *
   * Shape: build is one partial-agg groupBy per batch; merge is a groupBy
   * over key-sized state frames — row volume never re-enters.
   */
  def aggStateBuild(df: DataFrame, keyCol: String,
      valueCol: String): DataFrame =
    df.select(col(keyCol).as("key"), col(valueCol).cast(LongType).as("v"))
      .filter(col("v").isNotNull)
      .groupBy("key")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"),
        min("v").as("min_v"), max("v").as("max_v"))

  /** Combine any number of [[aggStateBuild]] states (same key domain). */
  def aggStateMerge(states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "need at least one state")
    states.reduce(_ unionByName _)
      .groupBy("key")
      .agg(sum("n").as("n"), sum("sum_v").as("sum_v"),
        min("min_v").as("min_v"), max("max_v").as("max_v"))
  }

  /** Readout: state + truncating mean, ordered by key. */
  def aggStateFinalize(state: DataFrame): DataFrame =
    state.select(col("key"), col("n"), col("sum_v"), col("min_v"),
      col("max_v"),
      IntMath.idiv(col("sum_v"), greatest(col("n"), lit(1L))).as("mean_v"))
      .orderBy("key")

  /**
   * Multi-rater label reconciliation: majority-vote consensus per item
   * (ties break on the LEXICOGRAPHICALLY SMALLEST label — deterministic),
   * then each rater scored by agreement with the consensus — the
   * annotation-quality readout (which labeling source to trust, which to
   * re-queue) that a crowd/multi-model labeling pipeline runs at corpus
   * scale. One vote per (item, rater): duplicate submissions collapse to
   * one row first.
   *
   * Shape at 100 TB: votes partial-agg to (item, label) cells; consensus
   * is ONE item-keyed window over cells; rater scoring is a cell-sized
   * join back plus a rater-keyed aggregate. No row-level shuffle past the
   * first groupBy.
   *
   * Output per rater (ordered): (rater, n_items, agree, agree_ppm).
   */
  def consensusReport(df: DataFrame, itemCol: String, raterCol: String,
      labelCol: String): DataFrame = {
    val votes = df.select(col(itemCol).as("item"), col(raterCol).as("rater"),
        col(labelCol).as("label"))
      .filter(col("label").isNotNull)
      .distinct()
    val cells = votes.groupBy("item", "label").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("c").desc, col("label"))
    val consensus = cells
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("item"), col("label").as("consensus"))
    votes.join(consensus, "item")
      .groupBy("rater")
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("label") === col("consensus"), 1L).otherwise(0L))
          .as("agree"))
      .select(col("rater"), col("n_items"), col("agree"),
        IntMath.idiv(col("agree") * lit(1000000L),
          greatest(col("n_items"), lit(1L))).as("agree_ppm"))
      .orderBy("rater")
  }

  /**
   * Seeded two-sided-geometric noisy counts — the integer
   * differential-privacy MECHANISM shape (Ghosh–Roughgarden–Sundararajan's
   * geometric mechanism, public) with the randomness replaced by a
   * deterministic per-key hash draw so the pipeline is replayable and
   * oracle-testable: magnitude = trailing-one-bits of the key's fold hash
   * (geometric, p = ½ per unit), sign = hash bit 15. A PRODUCTION DP
   * deployment must draw fresh randomness per release — this operator
   * ships the exact integer plumbing (group, perturb, suppress the true
   * count) with the draw swappable, which is the honest testable slice.
   *
   * Shape: one partial-agg groupBy; the perturbation is map-side bit
   * arithmetic on the key-sized result. Output: (key, noisy_n) — the true
   * count never leaves the operator.
   */
  def noisyCounts(df: DataFrame, keyCol: String): DataFrame = {
    val g = df.select(col(keyCol).cast(
        org.apache.spark.sql.types.StringType).as("key"))
      .filter(col("key").isNotNull)
      .groupBy("key").agg(count(lit(1)).as("n"))
    val h = TextAnalysis.stringHash(col("key"))
    val mag = (bit_count(h.bitwiseXOR(h + 1L)) - 1).cast(LongType)
    val sgn = when(IntMath.shr(h, lit(15)) % 2L === 1L, 1L).otherwise(-1L)
    g.select(col("key"), (col("n") + sgn * mag).as("noisy_n"))
      .orderBy("key")
  }

  /**
   * l-diversity audit (the companion of the k-anonymity report): for each
   * quasi-identifier group, the count of DISTINCT sensitive values and a
   * below-threshold flag — a group where every member shares one sensitive
   * value leaks it even when k-anonymous. Exact distinct per group (one
   * two-phase aggregate); the quasi columns are the caller's
   * generalization, so the operator composes with any bucketing.
   */
  def lDiversity(df: DataFrame, quasiCols: Seq[String], sensitive: Column,
      lThreshold: Int): DataFrame = {
    val qs = quasiCols.map(col)
    df.groupBy(qs: _*)
      .agg(countDistinct(sensitive).as("l_div"), count(lit(1)).as("n"))
      .withColumn("below_l",
        when(col("l_div") < lThreshold.toLong, 1L).otherwise(0L))
      .orderBy(qs: _*)
  }

  /** Luhn mod-10 checksum over a FIXED-length digit string column: digit at
    * 0-based char index i doubles when its position from the right
    * (len−1−i) is odd (the standard card-number pattern), doubled values
    * past 9 subtract 9, sum mod 10. Valid = 0. Pure integer fold — the
    * DuckDB oracle reproduces it digit for digit. */
  def luhnSum(digits: Column, len: Int): Column =
    aggregate(sequence(lit(0), lit(len - 1)), lit(0L), (acc, i) => {
      val d = (ascii(substring(digits, lit(1) + i, lit(1))) - 48L)
      val doubled = (lit(len.toLong) - 1L - i) % 2L === 1L
      val v = when(doubled,
        when(d * 2L > 9L, d * 2L - 9L).otherwise(d * 2L)).otherwise(d)
      acc + v
    }) % 10L

  /**
   * Checksum-validated card-number audit — the DLP pass a training-corpus
   * pipeline runs beyond regex PII counting (q61): a bare 16-digit regex
   * over web text is mostly order ids and timestamps, so real leak
   * detection validates the Luhn mod-10 check digit before flagging
   * (the payment-card checksum, public ISO/IEC 7812). Per document:
   * every standalone 16-digit run, the subset passing [[luhnSum]] == 0,
   * and a has_valid_card flag. Map-only (a regex extraction + a bounded
   * integer fold per candidate) — no shuffle, scans of any size.
   */
  def luhnCardAudit(df: DataFrame, textCol: String, idCol: String)
      : DataFrame = {
    val cands = regexp_extract_all(col(textCol),
      lit("""\b[0-9]{16}\b"""), lit(0))
    val valid = filter(cands, c => luhnSum(c, 16) === 0L)
    df.select(col(idCol).as("doc_id"),
      size(cands).cast(LongType).as("n_candidates"),
      size(valid).cast(LongType).as("n_valid"),
      (size(valid) > 0).as("has_valid_card"))
  }

  /**
   * Rule-to-classifier distillation: train an INTEGER batch perceptron on
   * a seed slice labeled by the rule gate
   * ([[TextAnalysis.qualityOk]] → y = ±1), then score the WHOLE corpus
   * with the learned linear function — the pipeline stage where a cheap
   * hand rule becomes a smooth ranking score (the public fastText-style
   * quality-filter recipe: label a seed by rule/reference corpus, fit a
   * linear model, gate on its score). The disagreement column is the
   * distillation's own audit: rows where the linear scorer and the rule
   * differ are exactly the boundary material a curator reviews.
   *
   * Deterministic by construction: BATCH perceptron (per epoch, ONE
   * partial-agg sums y·x over currently-misclassified seed rows — margin
   * y·(w·x) ≤ 0 — and adds it to w), integer features (bias, char count,
   * punctuation count, stopword count) CENTERED on their seed means
   * (truncating integer division; feature sums are non-negative so
   * floor = trunc and the DuckDB mirror agrees) — without centering the
   * char-count scale swamps the ±1-per-epoch bias and a few batch epochs
   * learn almost nothing. No learning rate, no shuffling: same result on
   * any partitioning or row order, any engine — the DuckDB oracle
   * unrolls the epochs as CTEs. Epoch count is the bounded driver loop
   * (one 1-row collect per epoch plus one for the means — the
   * [[Graph.pageRankLite]] / k-means iteration class).
   *
   * Overflow envelope: |w| grows ≤ epochs · Σ_seed |x|; with char counts
   * ~10³ and a 10⁸-doc seed, scores stay < 2⁶³ while
   * epochs · seed_docs · max_chars < ~10¹⁵ — seed sets are curated and
   * bounded by contract.
   *
   * Output per corpus doc: (doc_id, score, pred ∈ {−1, 1},
   * agrees_rule ∈ {0, 1}).
   */
  def distillLinearGate(docs: DataFrame, textCol: String, idCol: String,
      seedMod: Int = 5, epochs: Int = 3): DataFrame = {
    require(seedMod >= 1, s"seedMod must be >= 1, got $seedMod")
    require(epochs >= 1 && epochs <= 64,
      s"epochs in [1, 64], got $epochs")
    import TextAnalysis.{charCount, punctCount, stopwordCount, qualityOk}
    def featurize(df: DataFrame): DataFrame = df.select(
      col(idCol).as("doc_id"),
      lit(1L).as("x0"),
      charCount(col(textCol)).as("x1"),
      punctCount(col(textCol)).as("x2"),
      stopwordCount(col(textCol)).as("x3"),
      when(qualityOk(col(textCol)), 1L).otherwise(-1L).as("y"))
    val seedRaw = Staging.stage(
      featurize(docs.filter(col(idCol) % seedMod.toLong === 0L)))
    // seed-mean centering (scoring uses the SAME transform): one 1-row agg
    val st = seedRaw.agg(count(lit(1)),
      coalesce(sum(col("x1")), lit(0L)),
      coalesce(sum(col("x2")), lit(0L)),
      coalesce(sum(col("x3")), lit(0L))).head()
    val n = math.max(st.getLong(0), 1L)
    val m = Array(0L, st.getLong(1) / n, st.getLong(2) / n, st.getLong(3) / n)
    def center(df: DataFrame): DataFrame = df
      .withColumn("x1", col("x1") - m(1))
      .withColumn("x2", col("x2") - m(2))
      .withColumn("x3", col("x3") - m(3))
    val seed = center(seedRaw)
    var w = Array(0L, 0L, 0L, 0L)
    try {
      for (_ <- 1 to epochs) {
        val margin = col("y") * (lit(w(0)) * col("x0") +
          lit(w(1)) * col("x1") + lit(w(2)) * col("x2") +
          lit(w(3)) * col("x3"))
        val upd = seed.filter(margin <= 0L).agg(
          coalesce(sum(col("y") * col("x0")), lit(0L)),
          coalesce(sum(col("y") * col("x1")), lit(0L)),
          coalesce(sum(col("y") * col("x2")), lit(0L)),
          coalesce(sum(col("y") * col("x3")), lit(0L))).head()
        w = Array(w(0) + upd.getLong(0), w(1) + upd.getLong(1),
          w(2) + upd.getLong(2), w(3) + upd.getLong(3))
      }
    } finally Staging.unstage(seedRaw)
    val score = lit(w(0)) * col("x0") + lit(w(1)) * col("x1") +
      lit(w(2)) * col("x2") + lit(w(3)) * col("x3")
    center(featurize(docs))
      .withColumn("score", score)
      .withColumn("pred", when(col("score") > 0L, 1L).otherwise(-1L))
      .select(col("doc_id"), col("score"), col("pred"),
        when(col("pred") === col("y"), 1L).otherwise(0L).as("agrees_rule"))
  }
}
