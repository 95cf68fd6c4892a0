package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Lifetime contract of [[Staging]] (VERDICT r8 #3): operators persist
 * internal frames their callers can't see — a long-lived session invoking
 * a staged operator in a loop must hold O(budget) cached plans, not
 * O(calls), with results unchanged when the budget evicts a stage.
 */
class StagingSpec extends SparkSuite {

  private def docs() = {
    val s = sqlc
    s.range(0L, 200L).select(col("id").as("doc_id"),
      concat_ws(" ", (1 to 12).map(i =>
        concat(lit(s"w$i"), (col("id") % 7L).cast("string")): org.apache.spark.sql.Column): _*)
        .as("text"))
  }

  test("repeated staged-operator calls hold O(budget) cached plans, results unchanged") {
    val s = sqlc
    Staging.releaseAll(s)
    s.conf.set(Staging.BudgetKey, "3")
    try {
      val d = docs()
      def once(): Seq[(Long, Long)] =
        Dedup.minhashCandidates(
          Dedup.minhashBands(Dedup.minhashSignatures(d, "text", "doc_id")))
          .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
          .sorted.toSeq
      val first = once()
      assert(first.nonEmpty, "fixture must produce candidate pairs")
      // 12 invocations of an operator that stages internally: without the
      // registry budget this pins 12 CacheManager plans for the session's
      // life (the round-8 leak); with it, the oldest evict as new ones stage
      (1 to 11).foreach { _ => assert(once() == first) }
      assert(Staging.registeredCount(s) <= 3,
        s"staged-frame registry exceeded its budget: ${Staging.registeredCount(s)}")
    } finally {
      s.conf.unset(Staging.BudgetKey)
      Staging.releaseAll(s)
    }
  }

  test("releaseAll drops every live stage; unstage removes one") {
    val s = sqlc
    Staging.releaseAll(s)
    val a = Staging.stage(docs())
    val b = Staging.stage(docs().filter(col("doc_id") < 100L))
    assert(Staging.registeredCount(s) == 2)
    assert(a.storageLevel.useMemory || a.storageLevel.useDisk)
    Staging.unstage(a)
    assert(Staging.registeredCount(s) == 1)
    assert(a.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    Staging.releaseAll(s)
    assert(Staging.registeredCount(s) == 0)
    assert(b.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }

  test("Exploded stages pass through under persist; ExplodedKey=cache restores caching") {
    val s = sqlc
    Staging.releaseAll(s)
    val exploded = docs().select(col("doc_id"),
      explode(split(col("text"), " ")).as("token"))
    // default: recompute — no cache entry, no registry slot (measured at
    // sf1: columnar encode of explode-shaped frames costs 2-4x their
    // recompute, with 1.7x run-to-run CPU variance — see Staging scaladoc)
    val st = Staging.stage(exploded, Staging.Exploded)
    assert(st.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    assert(Staging.registeredCount(s) == 0)
    // compact default is unchanged
    val comp = Staging.stage(exploded.groupBy("token").count())
    assert(comp.storageLevel.useMemory || comp.storageLevel.useDisk)
    assert(Staging.registeredCount(s) == 1)
    Staging.releaseAll(s)
    // A/B override restores the old behavior
    s.conf.set(Staging.ExplodedKey, "cache")
    try {
      val cached = Staging.stage(exploded, Staging.Exploded)
      assert(cached.storageLevel.useMemory || cached.storageLevel.useDisk)
      assert(Staging.registeredCount(s) == 1)
      // same rows either way
      assert(cached.count() == st.count())
    } finally {
      s.conf.unset(Staging.ExplodedKey)
      Staging.releaseAll(s)
    }
  }

  test("budget eviction unpersists the OLDEST stage and keeps results correct") {
    val s = sqlc
    Staging.releaseAll(s)
    s.conf.set(Staging.BudgetKey, "2")
    try {
      val first = Staging.stage(docs())
      first.count() // materialize
      val more = (1 to 3).map(i => Staging.stage(docs().filter(col("doc_id") >= i)))
      more.foreach(_.count())
      assert(Staging.registeredCount(s) <= 2)
      // evicted frame: no longer cached, but still CORRECT (lineage kept)
      assert(first.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      assert(first.count() == 200L)
    } finally {
      s.conf.unset(Staging.BudgetKey)
      Staging.releaseAll(s)
    }
  }
}
