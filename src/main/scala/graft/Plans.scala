package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan dumper for the optimization evidence trail: writes each selected
  * query's `.explain("formatted")` output to `<outDir>/<name>_<tag>.txt`
  * (the `plans/r11/` artifacts the optimization rounds commit). Not part
  * of the driver contract — a builder-side tool.
  *
  * usage: runMain graft.Plans <sfDir> <outDir> <tag> <q1,q2,...>
  */
object Plans {
  def main(args: Array[String]): Unit = {
    if (args.length != 4) {
      System.err.println("usage: graft.Plans <sfDir> <outDir> <tag> <q1,q2,...>")
      sys.exit(2)
    }
    val Array(sfDir, outDir, tag, list) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val names = list.split(",").map(_.trim).filter(_.nonEmpty)
    names.foreach { prefix =>
      SparkEntry.queries.filter(_._1.startsWith(prefix)).foreach {
        case (name, fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), txt)
            println(s"[plans] wrote $name ($tag)")
          } catch { case e: Throwable =>
            System.err.println(s"[plans] $name failed: ${e.getMessage}")
          }
          spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
