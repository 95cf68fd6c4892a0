package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Record linkage / entity resolution: blocked fuzzy matching.
 *
 * The classic dedup-across-sources problem (same real-world entity, slightly
 * different spelling) is quadratic if attacked naively; the standard fix is
 * *blocking* — a cheap deterministic key that any true match must share —
 * followed by an exact edit-distance verify only within blocks. This is the
 * string-record analogue of the MinHash band gate in [[Dedup]]: candidates
 * from an equality join on the block key, then a bounded verify.
 */
object Linkage {

  /**
   * Blocked fuzzy self-pairs: all id-ordered pairs sharing `blockExpr` whose
   * `nameCol` values are within `maxDist` Levenshtein edits.
   *
   * Scale shape: one equality self-join keyed by the block value (shuffle
   * partitions by block), with two codegen'd guards BEFORE the O(len²)
   * Levenshtein — a length band (|len_a − len_b| ≤ maxDist is necessary for
   * edit distance ≤ maxDist) and the id order. While the blocked table fits
   * a broadcast, parallelism comes from repartitioning the probe side (the
   * verify work spreads over the cluster regardless of block cardinality);
   * past broadcast size the join degrades to one sort-merge task per block,
   * and `saltBuckets = S > 1` switches to a salted triangular self-join —
   * every unordered pair lands in exactly one of S(S+1)/2 combo partitions
   * per block, so a low-cardinality natural key (8 part adjectives here)
   * still spreads across the cluster. Identical output either way
   * (spec-pinned). Multi-pass blocking (union of pair sets from several
   * keys) recovers recall lost to a single key. `maxBlockSize > 0` drops
   * over-cap blocks from pairing
   * entirely (standard ER practice for junk keys — empty-string names, "n/a"
   * — whose blocks are quadratic and match-free); [[oversizedBlocks]] is the
   * companion report so the drop is observable, never silent.
   */
  def blockedFuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
      blockExpr: Column, maxDist: Int, maxBlockSize: Int = 0,
      saltBuckets: Int = 0): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    val base = df.select(col(idCol).as("id"), col(nameCol).as("name"),
      blockExpr.as("blk"), length(col(nameCol)).as("len"))
    val blocked =
      if (maxBlockSize <= 0) base
      else {
        val sizes = base.groupBy("blk").agg(count(lit(1)).as("__bsz"))
        base.join(sizes, "blk").filter(col("__bsz") <= maxBlockSize)
          .drop("__bsz")
      }
    val lenBand = abs(col("l.len") - col("r.len")) <= maxDist
    // The Levenshtein verify dominates end-to-end cost, so two plan
    // properties matter more than the join strategy: (1) the probe side
    // must be spread over the cluster — a blocked table read from one
    // parquet file otherwise runs the whole verify in ONE task under a
    // broadcast join (measured 23.5 s → 1-task serial at sf0.1); (2) the
    // distance is computed ONCE, post-join, and filtered — putting it in
    // the join condition evaluates it a second time for the output column.
    val nPar = df.sparkSession.sparkContext.defaultParallelism
    val candidates =
      if (saltBuckets <= 1) {
        val l = blocked.repartition(nPar).alias("l")
        val r = blocked.alias("r")
        l.join(r,
            col("l.blk") === col("r.blk") &&
            col("l.id") < col("r.id") && lenBand)
      } else {
        // salted TRIANGULAR self-join: rows get a deterministic salt
        // s ∈ [0, S); the left side replicates each row under combo keys
        // (s, j ≥ s), the right under (i ≤ s, s); joining on
        // (blk, i, j) lands every unordered pair in EXACTLY the combo
        // (min(sa,sb), max(sa,sb)) — parallelism becomes
        // blocks · S(S+1)/2 tasks instead of one task per block, which
        // is what keeps a low-cardinality natural block key (8 part
        // adjectives here) from serializing a 100× corpus. Replication
        // cost: ≤ S+1 copies of the (id, name, blk, len) projection.
        val s = saltBuckets
        val salted = blocked.withColumn("__salt",
          graft.operators.Sampling.idHash(col("id")) % s)
        val l = salted
          .withColumn("__cj", explode(sequence(col("__salt"), lit(s - 1))))
          .withColumnRenamed("__salt", "__ci")
          .repartition(col("blk"), col("__ci"), col("__cj")).alias("l")
        val r = salted
          .withColumn("__ci", explode(sequence(lit(0), col("__salt"))))
          .withColumnRenamed("__salt", "__cj").alias("r")
        l.join(r,
            col("l.blk") === col("r.blk") &&
            col("l.__ci") === col("r.__ci") &&
            col("l.__cj") === col("r.__cj") &&
            // same-salt combos pair by id order; cross-salt combos are
            // already unique per pair, any id order
            (col("l.__ci") =!= col("l.__cj") || col("l.id") < col("r.id")) &&
            col("l.id") =!= col("r.id") && lenBand)
      }
    // Thresholded Levenshtein: the 3-arg overload runs the banded DP
    // (O(maxDist·len) instead of O(len²)) and returns −1 past the bound —
    // the distance it does return is exact, so kept rows are identical to
    // the unbounded form filtered to ≤ maxDist (spec-pinned).
    candidates
      .select(least(col("l.id"), col("r.id")).as("id_a"),
        greatest(col("l.id"), col("r.id")).as("id_b"),
        when(col("l.id") < col("r.id"), col("l.name"))
          .otherwise(col("r.name")).as("name_a"),
        when(col("l.id") < col("r.id"), col("r.name"))
          .otherwise(col("l.name")).as("name_b"),
        levenshtein(col("l.name"), col("r.name"), maxDist).as("dist"))
      .filter(col("dist") >= 0)
  }

  /** Blocks larger than `maxBlockSize`: (blk, n_rows) — the audit row for
    * every block [[blockedFuzzyPairs]] would drop at that cap. */
  def oversizedBlocks(df: DataFrame, blockExpr: Column,
      maxBlockSize: Int): DataFrame =
    df.select(blockExpr.as("blk"))
      .groupBy("blk").agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > maxBlockSize)

  /**
   * Edit-distance near-pair mining over a document PREFIX: pairs whose
   * `prefixLen`-char prefixes are within `maxDist` Levenshtein edits,
   * gated by (equal first token, |len(text) diff| ≤ lenBand). The gate is
   * the blocking key — an equi-join, never a cross — and the verify is
   * Spark's bounded `levenshtein(a, b, maxDist)` (early-exits above the
   * threshold, O(prefixLen·maxDist) not O(prefixLen²)). The gate is part
   * of the operator CONTRACT (recall is gate-bounded, like the LSH band
   * gates in [[Dedup]]): a first-token typo escapes it; callers wanting
   * more recall add blocks, not a wider scan.
   *
   * A bare first token is a DANGEROUS natural key at web scale — a corpus
   * where a stopword dominates position 1 ("The …") makes one block
   * quadratic, and the length band doesn't save it (lengths concentrate
   * too). So, like [[blockedFuzzyPairs]], blocks larger than
   * `maxBlockSize` are DROPPED from pairing (0 disables); pair the cap
   * with [[oversizedBlocks]] (same `blockExpr` = first token) so the drop
   * is observable, never silent. Returns an unordered frame — ordering is
   * the caller's concern (a global sort is a full exchange an operator
   * must not force on a production pipeline).
   */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
      prefixLen: Int = 32, maxDist: Int = 10, lenBand: Int = 8,
      maxBlockSize: Int = 10000): DataFrame = {
    val base0 = df.select(col(idCol).as("id"),
      substring(col(textCol), 1, prefixLen).as("pfx"),
      element_at(TextAnalysis.tokens(col(textCol)), 1).as("tok0"),
      length(col(textCol)).as("n"))
    val base =
      if (maxBlockSize <= 0) base0
      else {
        val sizes = base0.groupBy("tok0").agg(count(lit(1)).as("__bsz"))
        base0.join(sizes, "tok0").filter(col("__bsz") <= maxBlockSize)
          .drop("__bsz")
      }
    val a = base.select(col("id").as("id_a"), col("pfx").as("pa"),
      col("tok0"), col("n").as("na"))
    val b = base.select(col("id").as("id_b"), col("pfx").as("pb"),
      col("tok0"), col("n").as("nb"))
    a.join(b, Seq("tok0"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("na") - col("nb")) <= lenBand)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("pa"), col("pb"), maxDist).cast(LongType).as("dist"))
      .filter(col("dist") >= 0)
  }
}
