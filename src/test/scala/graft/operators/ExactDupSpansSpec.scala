package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** Exact cross-doc substring dedup (Lee et al. 2022 style): operator vs a
  * serial brute-force scan, plus the crafted edge cases the span semantics
  * promise (self-repeats don't flag, overlapping runs coalesce, shorter-
  * than-k docs produce nothing, scrub reassembles exactly). */
class ExactDupSpansSpec extends SparkSuite {

  private lazy val s = sqlc

  private def df(docs: Seq[(Long, String)]): DataFrame = {
    import s.implicits._
    docs.toDF("doc_id", "text")
  }

  /** Serial reference: group k-grams by CONTENT, keep those in ≥2 distinct
    * docs, coalesce each doc's marked starts into maximal spans. */
  private def brute(docs: Seq[(Long, String)],
      k: Int): Set[(Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.trim.split("\\s+").filter(_.nonEmpty).toSeq
    }
    val grams = for {
      (id, tk) <- toks
      i <- 0 to tk.size - k
    } yield (tk.slice(i, i + k).mkString(" "), id, i.toLong)
    val shared = grams.groupBy(_._1)
      .filter(_._2.map(_._2).distinct.size >= 2).values.flatten
    shared.toSeq.groupBy(_._2).flatMap { case (id, hs) =>
      val ps = hs.map(_._3).distinct.sorted
      val spans = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      ps.foreach { p =>
        if (spans.nonEmpty && p <= spans.last._2 + 1)
          spans(spans.size - 1) = (spans.last._1, math.max(spans.last._2, p + k - 1))
        else spans += ((p, p + k - 1))
      }
      spans.map { case (a, b) => (id, a, b, b - a + 1) }
    }.toSet
  }

  private def run(docs: Seq[(Long, String)], k: Int) =
    Dedup.exactDupSpans(df(docs), "text", "doc_id", minTokens = k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("shared runs mark exactly; self-repeats and short docs don't") {
    val sharedRun = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    val docs = Seq(
      1L -> s"intro one two $sharedRun tail tokens here",
      2L -> s"$sharedRun completely different ending of second doc",
      // doc 3 repeats an 8-gram TWICE within itself but shares with no one:
      // document frequency counts DISTINCT docs, so nothing marks
      3L -> ("p q r s t u v w " * 2 + "unique suffix"),
      4L -> "too short for any span",
      5L -> "nothing shared with anything else at all in this one text")
    val out = run(docs, 8)
    assert(out == brute(docs, 8))
    // doc 1: tokens 3..10 are the shared run; doc 2: tokens 0..7
    assert(out == Set((1L, 3L, 10L, 8L), (2L, 0L, 7L, 8L)))
  }

  test("overlapping and adjacent shared runs coalesce into one maximal span") {
    // docs 1 and 2 share a 12-token run: its five 8-gram starts (0..4 in
    // the run) must coalesce into ONE span of 12 tokens, not five rows
    val run12 = "a b c d e f g h i j k l"
    val docs = Seq(
      1L -> s"$run12 then something else entirely",
      2L -> s"prefix words here $run12")
    val out = run(docs, 8)
    assert(out == brute(docs, 8))
    assert(out == Set((1L, 0L, 11L, 12L), (2L, 3L, 14L, 12L)))
  }

  test("two disjoint shared runs in one doc stay two spans") {
    val r1 = "one two three four five six seven eight"
    val r2 = "red orange yellow green blue indigo violet ultraviolet"
    val docs = Seq(
      1L -> s"$r1 XMID1 XMID2 XMID3 $r2",
      2L -> s"$r1 other stuff",
      3L -> s"more stuff $r2")
    val out = run(docs, 8)
    assert(out == brute(docs, 8))
    assert(out.count(_._1 == 1L) == 2)
  }

  test("operator equals the serial scan on a seeded phrase-heavy corpus") {
    val rnd = new scala.util.Random(42)
    val phrases = Vector(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "how vexingly quick daft zebras jump around",
      "sphinx of black quartz judge my vow today")
    def word() = "w" + rnd.nextInt(40)
    val docs = (1L to 30L).map { id =>
      val parts = (0 until rnd.nextInt(4) + 1).map { _ =>
        if (rnd.nextBoolean()) phrases(rnd.nextInt(phrases.size))
        else (0 until rnd.nextInt(10) + 3).map(_ => word()).mkString(" ")
      }
      id -> parts.mkString(" ")
    }
    assert(run(docs, 8) == brute(docs, 8))
    assert(run(docs, 5) == brute(docs, 5))
  }

  test("scrub removes exactly the covered tokens and reassembles in order") {
    val sharedRun = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      1L -> s"keep1 keep2 $sharedRun keep3",
      2L -> s"$sharedRun trailing words here stay put",
      3L -> "untouched totally unique text")
    val out = Dedup.scrubDupSpans(df(docs), "text", "doc_id", minTokens = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("keep1 keep2 keep3", 3L, 8L)))
    assert(out(2L) == (("trailing words here stay put", 5L, 8L)))
    assert(out(3L) == (("untouched totally unique text", 4L, 0L)))
  }

  test("a doc that is ENTIRELY duplicated scrubs to the empty string") {
    val t = "x1 x2 x3 x4 x5 x6 x7 x8 x9"
    val docs = Seq(1L -> t, 2L -> t)
    val out = Dedup.scrubDupSpans(df(docs), "text", "doc_id", minTokens = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("", 0L, 9L)) && out(2L) == (("", 0L, 9L)))
  }

  // ------------------------------------------------- dupSpanPartners (q315)

  private def partners(docs: Seq[(Long, String)], k: Int, cap: Int = 100) =
    Dedup.dupSpanPartners(df(docs), "text", "doc_id", minTokens = k,
        maxDocsPerGram = cap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap

  test("partners: per-pair matched positions and longest verbatim run") {
    val run12 = "a b c d e f g h i j k l" // 12 tokens → 5 8-gram starts
    val run8 = "p q r s t u v w"
    val docs = Seq(
      1L -> s"$run12 ZFILL1 ZFILL2 $run8",
      2L -> s"lead tokens $run12 trailer",
      3L -> s"$run8 something else entirely here")
    val out = partners(docs, 8)
    // pair (1,2): the 12-token run = 5 consecutive diagonal matches
    assert(out((1L, 2L)) == ((5L, 12L)))
    // pair (1,3): the 8-token run = 1 match, run = 8 tokens
    assert(out((1L, 3L)) == ((1L, 8L)))
    assert(!out.contains((2L, 3L)))
  }

  test("partners: a self-repeating doc pairs with nobody; the gram cap " +
      "drops boilerplate pairs") {
    val run8 = "m n o p q r s t"
    val selfRep = Seq(1L -> (s"$run8 middle words $run8"))
    assert(partners(selfRep, 8).isEmpty)
    // the same 8-gram in 3 docs: cap=2 drops it (df=3 > 2), cap=100 keeps
    val three = Seq(1L -> s"$run8 one", 2L -> s"$run8 two", 3L -> s"$run8 three")
    assert(partners(three, 8, cap = 2).isEmpty)
    assert(partners(three, 8).keySet ==
      Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("partners: repeated gram in ONE side yields multiple matched " +
      "positions but the run length stays exact") {
    val run8 = "d1 d2 d3 d4 d5 d6 d7 d8"
    // doc 1 contains the run twice; doc 2 once → 2 matched position pairs
    // on different diagonals, max run still 8
    val docs = Seq(
      1L -> s"$run8 gap tokens here $run8",
      2L -> s"intro $run8")
    assert(partners(docs, 8)((1L, 2L)) == ((2L, 8L)))
  }

  // --------------------------------------------------- lshBandPlan (q314)

  test("lshBandPlan: exact truncating fixed-point S-curve") {
    val out = Dedup.lshBandPlan(s, numHashes = 16, stepPermille = 50)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    // serial reference of the same truncating folds
    def powPpm(x: Long, e: Long): Long =
      (1L to e).foldLeft(1000000L)((acc, _) => acc * x / 1000000L)
    for (r <- Seq(1L, 2L, 4L, 8L, 16L); s1 <- 50L to 950L by 50L) {
      val b = 16L / r
      val expect = 1000000L - powPpm(1000000L - powPpm(s1 * 1000L, r), b)
      assert(out((r, b, s1)) == expect, s"(r=$r, b=$b, s=$s1)")
    }
    assert(out.size == 5 * 19)
    // monotone in s for a fixed split; band split beats one wide band at
    // mid similarity (the reason banding exists)
    assert(out((4L, 4L, 700L)) > out((4L, 4L, 500L)))
    assert(out((4L, 4L, 500L)) > out((16L, 1L, 500L)))
  }
}
