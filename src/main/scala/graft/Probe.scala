package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan-hygiene + scale probes (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("PROBE_DIR", "/root/testdata/sf0.1")

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // 20× the sf0.1 documents with distinct ids → 100k docs
    val base = spark.read.parquet(s"$dir/documents.parquet")
    val big = (0 until 20).map(i =>
      base.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_ unionByName _)
      .select("doc_id", "text")
    big.cache().count()
    println(s"corpus: ${big.count()} docs")

    timed("minhash signatures")(
      graft.operators.Dedup.minhashSignatures(big, "text", "doc_id").count())
    timed("minhash candidates")(
      graft.operators.Dedup.minhashCandidates(graft.operators.Dedup.minhashBands(
        graft.operators.Dedup.minhashSignatures(big, "text", "doc_id"))).count())
    timed("simhash")(
      graft.operators.Dedup.simhash(big, "text", "doc_id").count())
    timed("exact dedup")(
      graft.operators.Dedup.exact(big, "text", "doc_id").count())
    big.unpersist()

    // ---- embedding-LSH fan-out bound: per-(table,bucket) occupancy is what
    // the candidate join squares, so the max bucket size IS the scale story
    // (plus the hard cap in lshCandidates). 8× the embeddings → 16k vectors.
    val ebase = spark.read.parquet(s"$dir/embeddings.parquet")
    val ebig = (0 until 8).map(i =>
      ebase.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
      .reduce(_ unionByName _).select("vec_id", "embedding")
    ebig.cache().count()
    val buckets = graft.operators.Similarity
      .lshBuckets(ebig, "vec_id", "embedding").cache()
    val occ = buckets.groupBy("table_id", "bucket").count()
      .agg(max("count").as("max_bucket"), expr("CAST(avg(count) AS DOUBLE)").as("avg_bucket"),
        count(lit(1)).as("n_buckets")).head()
    println(s"lsh fan-out @${ebig.count()} vecs: max bucket ${occ.getLong(0)}, " +
      f"avg ${occ.getDouble(1)}%.2f over ${occ.getLong(2)} buckets " +
      "(candidate pairs per key bounded by cap² — see Similarity.lshCandidates)")
    timed("lsh candidates (capped)")(
      graft.operators.Similarity.lshCandidates(buckets).count())
    buckets.unpersist(); ebig.unpersist()
    spark.stop()
  }
}
