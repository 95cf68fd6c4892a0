package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Query-driven document retrieval over the corpus: an inverted-index build
 * (tf / df / doc-length) plus BM25 scoring — the standard lexical-search
 * ranking a curation pipeline uses to pull topic slices out of a 100 TB
 * corpus (and the retrieval half of a decontamination screen: score the
 * eval question against the corpus, inspect the top hits).
 *
 * Determinism contract (the whole module is integer-exact so the DuckDB
 * oracle hash-matches):
 *
 *  - BM25's `tf` saturation term is an exact rational: with k1 = 6/5 and
 *    b = 3/4, `tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` multiplied through
 *    by `10·avgdl` becomes `22·tf·A / (20·tf·A + 6·A + 18·dl·1000)` where
 *    `A = (1000·T) div N` is the corpus mean doc length in exact
 *    milli-tokens — every factor is corpus-size-INDEPENDENT (A ≈ 1000·avgdl,
 *    tf and dl are per-doc), so the int64 arithmetic never outgrows 64 bits
 *    no matter how large the corpus is. Scaled to 1e6 fixed-point by
 *    truncating division (floor on the all-positive inputs, identical in
 *    both engines).
 *  - The idf log is [[qlog2]], a piecewise-LINEAR fixed-point log2 (1024
 *    units per bit, interpolated inside each octave from the integer bit
 *    length): monotone, deterministic, max |error| vs true log2 ≈ 0.086 —
 *    a rank-faithful stand-in for ln that both engines compute bit-for-bit
 *    (floating log differs in last-ulp between libm builds, which would
 *    break hash equality). idf = qlog2(odds) with Lucene's always-positive
 *    odds `1 + (N−df+0.5)/(df+0.5) = (2N+2)/(2df+1)`, carried at 2^20
 *    fixed-point before the log so small odds keep precision.
 *
 * Scale shape: tf/df/dl are one explode + two partial-aggregated groupBys
 * (the inverted-index build — shuffles on token and doc id, both
 * map-side-combined). The query set is broadcast; df joins the query terms
 * (vocabulary-sized table semi-joined down to the handful of query terms)
 * so scoring touches only postings of query terms. Final top-k is a window
 * partitioned BY QUERY — parallel across queries, never a global sort.
 */
object Retrieval {

  /** Fixed-point log2 (1024 units/bit) of a positive long column:
    * `1024·ilog2(x) + frac` where `ilog2 = length(bin(x))−1` (exact integer
    * bit length — `bin` renders minimal-width binary in Spark and DuckDB
    * alike) and `frac` linearly interpolates within the octave as
    * `(x·1024) >> ilog2 − 1024`. Monotone in x; inputs must stay below
    * 2^53 so the ·1024 cannot overflow. */
  def qlog2(x: Column): Column = {
    val ilog2 = (length(bin(x)) - 1).cast(LongType)
    lit(1024L) * ilog2 + IntMath.shr(x * 1024L, ilog2) - 1024L
  }

  /**
   * BM25 top-k retrieval: for each (query_id, terms) pair, the k best docs
   * by summed per-term BM25 (k1 = 1.2, b = 0.75, rational-exact as above).
   * Duplicate query terms count once (terms are a SET — the common
   * bag-of-words query convention). Ties break on doc id ascending.
   *
   * Output: (query_id, doc_id, score_q, rank) — `score_q` is the integer
   * fixed-point score (tf-component ×1e6, idf in 1024ths of a bit,
   * rescaled by ÷1024 after the product).
   */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
      queries: Seq[(Int, Seq[String])], k: Int = 10): DataFrame =
    rankTopK(bm25Scores(docs, textCol, idCol, queries), k)

  /** Per-(query, doc) summed BM25 — the scoring stage of [[bm25TopK]]
    * without the final cut, for callers that filter candidates first
    * (e.g. [[hardNegatives]]). Output: (query_id, doc_id, score_q). */
  def bm25Scores(docs: DataFrame, textCol: String, idCol: String,
      queries: Seq[(Int, Seq[String])]): DataFrame = {
    val spark = docs.sparkSession
    import org.apache.spark.sql.Row

    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val tf = toks.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val tfStaged = Staging.stage(tf)
    val dl = tfStaged.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    // two corpus scalars (N docs, T tokens) — collected as literals so the
    // per-row arithmetic is corpus-size-independent (see A above)
    val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("t")).head()
    val nDocs = stats.getLong(0)
    val tTokens = stats.getLong(1)
    val aMilli = (1000L * tTokens) / nDocs // JVM long division — exact

    val qRows = new java.util.ArrayList[Row]()
    queries.foreach { case (qid, terms) =>
      terms.distinct.foreach(t => qRows.add(Row(qid, t)))
    }
    val qTerms = spark.createDataFrame(qRows, StructType(Seq(
      StructField("query_id", IntegerType), StructField("token", StringType))))

    val df = tfStaged.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .join(broadcast(qTerms.select("token").distinct()), Seq("token"), "left_semi")
    // idf at 2^20 fixed-point odds, then the fixed-point log
    val idf = df.select(col("token"),
      (qlog2(IntMath.idiv(shiftleft(lit(2L) * nDocs + 2L, 20),
        lit(2L) * col("df") + 1L)) - 20L * 1024L).as("idf_q"))

    val perTerm = tfStaged
      .join(broadcast(qTerms), "token")
      .join(broadcast(idf), "token")
      .join(dl, "doc_id")
      .select(col("query_id"), col("doc_id"),
        IntMath.idiv(
          IntMath.idiv(lit(22L) * col("tf") * aMilli * 1000000L,
            lit(20L) * col("tf") * aMilli + lit(6L) * aMilli +
              lit(18L) * col("dl") * 1000L) * col("idf_q"),
          lit(1024L)).as("term_score"))

    perTerm.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_score")).as("score_q"))
  }

  /** Keyed-window top-k over (query_id, doc_id, score_q); ties on doc id. */
  private def rankTopK(scores: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_q").desc, col("doc_id").asc)
    scores.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /**
   * Hard-negative mining — the retrieval-training-data op: for each query,
   * the top-k BM25 docs EXCLUDING the known-relevant (gold) docs. These
   * lexically-close-but-not-relevant docs are the negatives a dense
   * retriever / reranker trains against (the BM25-negatives recipe of the
   * public DPR work). `gold` is (query_id, doc_id); it broadcasts into an
   * anti-join against the scored candidates, so exclusion happens BEFORE
   * the top-k cut and ranks are dense over the negatives.
   *
   * Output: (query_id, doc_id, score_q, rank).
   */
  def hardNegatives(docs: DataFrame, textCol: String, idCol: String,
      queries: Seq[(Int, Seq[String])], gold: DataFrame, k: Int = 10)
      : DataFrame = {
    val g = gold.select(col("query_id").cast(IntegerType).as("query_id"),
      col("doc_id"))
    rankTopK(bm25Scores(docs, textCol, idCol, queries)
      .join(broadcast(g), Seq("query_id", "doc_id"), "left_anti"), k)
  }

  /**
   * Reciprocal-rank fusion — the standard hybrid-retrieval merge (Cormack,
   * Clarke & Büttcher, SIGIR 2009, public): each input ranking contributes
   * `⌊1e6 / (kRrf + rank)⌋` to every (query, doc) it ranks, the fused score
   * is the sum, and docs re-rank per query by fused score (ties on doc id).
   * Docs surfacing in MULTIPLE rankings (e.g. BM25 lexical + embedding ANN)
   * rise — the lexical/semantic consensus a dense-retriever training set is
   * mined with. Integer arithmetic throughout, so fusion is deterministic
   * and engine-portable.
   *
   * Each input needs (query_id, doc_id, rank). Candidate volume is already
   * top-k-bounded per source, so the union + one partial-agg groupBy + one
   * keyed window costs O(queries × k × sources) regardless of corpus size.
   *
   * Output: (query_id, doc_id, rrf_score, n_lists, rank).
   */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 10, kRrf: Int = 60)
      : DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(kRrf >= 1, s"kRrf must be >= 1, got $kRrf")
    val norm = rankings.map(_.select(
      col("query_id").cast(IntegerType).as("query_id"),
      col("doc_id").cast(LongType).as("doc_id"),
      col("rank").cast(LongType).as("rank")))
    val fused = norm.reduce(_ unionByName _)
      .groupBy("query_id", "doc_id")
      .agg(
        sum(IntMath.idiv(lit(1000000L), lit(kRrf.toLong) + col("rank")))
          .as("rrf_score"),
        count(lit(1)).as("n_lists"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /**
   * Maximal-marginal-relevance re-rank (Carbonell & Goldstein, SIGIR 1998)
   * of a SMALL candidate set: greedily pick k items maximizing
   * `λ·relevance − (1−λ)·max_sim_to_already_picked`, trading relevance
   * against redundancy — the diversity selector applied to a retrieval
   * slice before it becomes training pairs or RAG context.
   *
   * All integer: λ = `lambdaX10`/10, score = `lambdaX10·rel −
   * (10−lambdaX10)·maxSimQ` with quantized-dot similarities, ties on id —
   * bit-reproducible in any engine. The greedy loop is inherently
   * sequential in k, so this runs on the DRIVER over a guarded collect
   * (candidates ≤ `maxCandidates`); re-ranking is a top-of-funnel
   * operation — the distributed half is producing the candidate slice
   * ([[bm25TopK]], [[Similarity.bruteForceTopK]]), never this.
   *
   * Input columns: idCol, relCol (integer relevance), vecCol (quantized
   * long vector, e.g. [[Similarity.quantize]] output).
   * Output: (mmr_rank, id, rel, score_q) — score_q of rank 1 is
   * `lambdaX10·rel` (empty picked set → no redundancy term).
   */
  def mmrRerank(candidates: DataFrame, idCol: String, relCol: String,
      vecCol: String, k: Int, lambdaX10: Int = 7,
      maxCandidates: Int = 1024): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(lambdaX10 >= 0 && lambdaX10 <= 10, "lambdaX10 in [0,10]")
    val rows = candidates
      .select(col(idCol).cast(LongType).as("id"),
        col(relCol).cast(LongType).as("rel"), col(vecCol).as("v"))
      .limit(maxCandidates + 1).collect()
    require(rows.length <= maxCandidates,
      s"mmrRerank is a driver-side re-rank: pass <= $maxCandidates " +
        "candidates (got more) — narrow the retrieval slice first")
    val ids = rows.map(_.getLong(0))
    val rel = rows.map(_.getLong(1))
    val vecs = rows.map(_.getSeq[Long](2).toArray)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => a(i) * b(i)).sum
    val n = ids.length
    val picked = scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Long)]()
    val maxSim = Array.fill(n)(Long.MinValue) // max dot to picked set
    val used = Array.fill(n)(false)
    for (rank <- 1 to math.min(k, n)) {
      var best = -1
      var bestScore = Long.MinValue
      for (i <- 0 until n if !used(i)) {
        val redundancy = if (rank == 1) 0L else maxSim(i)
        val score = lambdaX10 * rel(i) - (10 - lambdaX10) * redundancy
        if (best == -1 || score > bestScore ||
          (score == bestScore && ids(i) < ids(best))) {
          best = i; bestScore = score
        }
      }
      used(best) = true
      picked += ((rank, ids(best), rel(best), bestScore))
      for (i <- 0 until n if !used(i)) {
        val s = dot(vecs(i), vecs(best))
        if (s > maxSim(i)) maxSim(i) = s
      }
    }
    val spark = candidates.sparkSession
    import spark.implicits._
    picked.toSeq.toDF("mmr_rank", "id", "rel", "score_q")
      .select(col("mmr_rank").cast(IntegerType), col("id"), col("rel"),
        col("score_q"))
  }

  /**
   * Percolation / reverse search: match every document against a STORED
   * set of conjunctive term queries (the alerting/routing primitive —
   * Elasticsearch's percolator shape, public) — a doc matches a query iff
   * it contains EVERY query term. Queries are the small side; documents
   * stream through once.
   *
   * Shape at 100 TB: docs explode to DISTINCT (doc, token) rows once; the
   * term table (Σ query lengths rows) broadcasts; a matched-term count
   * per (doc, query) equal to the query's term count is a match. The join
   * keys on the raw token (Spark hashes internally — no false positives
   * from an explicit hash truncation).
   *
   * Output (ordered): (query_id, doc_id).
   */
  def percolate(docs: DataFrame, textCol: String, idCol: String,
      queries: Seq[(Int, Seq[String])]): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "need non-empty stored queries")
    val spark = docs.sparkSession
    import spark.implicits._
    val terms = queries.flatMap { case (qid, ts) =>
      ts.distinct.map(t => (qid, t, ts.distinct.size.toLong)) }
      .toDF("query_id", "tok", "n_terms")
    val docToks = docs.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .distinct()
    docToks.join(broadcast(terms), "tok")
      .groupBy("query_id", "doc_id", "n_terms")
      .agg(count(lit(1)).as("hit"))
      .filter(col("hit") === col("n_terms"))
      .select(col("query_id"), col("doc_id"))
      .orderBy("query_id", "doc_id")
  }
}
