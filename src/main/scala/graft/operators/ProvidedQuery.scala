package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * The `query` escape hatch (reference S6): the user supplies their own
 * statement instead of the generated insert; the mapping feeds its named
 * variables (reference: sink/src/it/.../ProvidedQueryCCMIT.java:89-330;
 * dist/conf/cassandra-sink-standalone.properties.sample:129-155).
 *
 * Spark translation: the mapped batch is exposed as a temp view and the
 * user's SQL fragment runs against it — same contract (no column validation,
 * mapping supplies the inputs), Catalyst plans it with the rest.
 */
object ProvidedQuery {
  private val n = new AtomicLong()

  def run(mapped: DataFrame, sql: String, viewName: String = "mapped"): DataFrame = {
    val unique = s"${viewName}_${n.incrementAndGet()}"
    mapped.createOrReplaceTempView(unique)
    mapped.sparkSession.sql(sql.replace(s"FROM $viewName", s"FROM $unique"))
  }
}
