package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-resistant equi-joins for hot fact keys against a dimension that is
 * too large to broadcast.
 *
 * The classic failure at 100 TB: one hot key (a spamming device, a default
 * value) concentrates a whole shuffle partition on one reducer, and the
 * stage runs at the speed of that reducer. AQE's skew-join split handles
 * sort-merge inputs it can see; salting is the declarative fix that works
 * on ANY equi-join shape and composes with every downstream operator:
 * replicate the dim row `salts`× (dim side grows by a constant factor),
 * scatter each fact row to ONE salt, join on (key, salt).
 *
 * Correctness does not depend on which salt a fact row lands on — every
 * salt sees the full dim row for its key — so the scatter uses a cheap
 * per-row hash with no uniqueness requirement. The join result is
 * row-for-row identical to the unsalted join (inner, or left outer).
 */
object SkewJoin {

  /**
   * Inner equi-join of `fact` to `dim` on `factKey = dimKey`, salted
   * `salts` ways. Dim columns keep their names; the salt column is dropped.
   *
   * The scatter hash folds the fact key with a per-partition row counter so
   * a single hot key spreads across all `salts` reducers (hashing the key
   * alone would defeat the point: one key → one salt).
   */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left, got $joinType")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col(factKey), spark_partition_id(),
        monotonically_increasing_id()), lit(salts.toLong)))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    salted.join(replicated,
        salted(factKey) === replicated(dimKey) &&
          salted("__salt") === replicated("__salt"), joinType)
      .drop(replicated("__salt")).drop("__salt")
  }
}
