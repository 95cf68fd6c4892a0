package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/**
 * Plan-capture tool for the optimization rounds: writes
 * `<outDir>/<query>_<tag>.txt` with the `.explain("formatted")` output of
 * each named declared query, so plan-shape claims (Exchange counts, join
 * strategy, PushedFilters) are reviewable without running Spark.
 *
 * Usage: runMain graft.PlanDump <sfDir> <outDir> <tag> <q1,q2,...>
 * (query list `all` dumps every declared query).
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val tag = args(2)
    val names: Seq[String] =
      if (args(3) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val txt =
        try fn(spark, sfDir).queryExecution.explainString(FormattedMode)
        catch { case e: Throwable => s"ERROR building plan: $e" }
      java.nio.file.Files.write(outDir.resolve(s"${name}_$tag.txt"),
        txt.getBytes("UTF-8"))
      // staged frames registered while BUILDING plans must not leak across
      // queries (budget eviction would otherwise thrash on a full dump)
      graft.operators.Staging.releaseAll(spark, blocking = false)
    }
    println(s"wrote ${names.size} plans to $outDir")
    spark.stop()
  }
}
