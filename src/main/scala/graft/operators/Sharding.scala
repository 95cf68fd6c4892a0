package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Rendezvous (highest-random-weight) key-to-node assignment and the
 * rebalance report for a cluster resize — the placement math a sink uses
 * to shard state across writers (the reference world's token-ring
 * ownership, re-expressed as HRW so resizing is minimally disruptive).
 *
 * Hash: `h(id, node) = ((id+1) · c_node) mod (10⁹+7)` with a fixed
 * per-node odd multiplier `c_node = ((node+7)·2654435761) mod (10⁹+7)`;
 * a key lands on the node with the max h (ties → lowest node). Integer-
 * only and engine-reproducible. int64-safe to id ≈ 9.2e9.
 *
 * The rendezvous property — resizing n→n+1 moves ONLY keys whose new
 * argmax is the added node (expected 1/(n+1) of them, nothing else
 * shuffles) — is visible in the report: every off-diagonal entry has
 * `node_to` = the new node. Map-only per key (the node table is a tiny
 * literal cross), one groupBy on the key id; scales to any corpus.
 */
object Sharding {

  val Mod = 1000000007L

  private def withAssign(keys: DataFrame, n: Int, outCol: String): DataFrame = {
    val nodes = (0 until n).map { node =>
      val c = ((node + 7L) * 2654435761L) % Mod
      struct(lit(node).as("node"), lit(c).as("c"))
    }
    keys.select(col("id"), explode(array(nodes: _*)).as("nd"))
      .select(col("id"), col("nd.node").as("node"),
        (((col("id") + 1L) * col("nd.c")) % Mod).as("h"))
      .groupBy("id")
      .agg(max_by(col("node"), struct(col("h"), (-col("node")).as("nb")))
        .as(outCol))
  }

  /** Per-key assignment under an `n`-node ring: (id, node). */
  def assign(keys: DataFrame, idCol: String, n: Int): DataFrame =
    withAssign(keys.select(col(idCol).cast(LongType).as("id")).distinct(), n,
      "node")

  /**
   * Rebalance matrix for a resize from `nFrom` to `nTo` nodes:
   * (node_from, node_to, cnt) over the distinct keys of `idCol`.
   */
  def rebalanceReport(keys: DataFrame, idCol: String, nFrom: Int,
      nTo: Int): DataFrame = {
    val ids = keys.select(col(idCol).cast(LongType).as("id")).distinct()
    val a = withAssign(ids, nFrom, "node_from")
    val b = withAssign(ids, nTo, "node_to")
    a.join(b, "id")
      .groupBy(col("node_from").cast(IntegerType).as("node_from"),
        col("node_to").cast(IntegerType).as("node_to"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("node_from", "node_to")
  }
}
