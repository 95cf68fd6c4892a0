package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * The `query` escape hatch (reference S6): the user supplies their own
 * statement instead of the generated insert; the mapping feeds its named
 * variables (reference: sink/src/it/.../ProvidedQueryCCMIT.java:89-330;
 * dist/conf/cassandra-sink-standalone.properties.sample:129-155).
 *
 * Spark translation: the mapped batch is registered as a temp view UNDER THE
 * PUBLIC NAME and the user's SQL runs against it verbatim — no string
 * rewriting (a `replace("FROM mapped", …)` breaks on lowercase keywords,
 * aliases, or the view name inside a string literal). `spark.sql` analyzes
 * eagerly, so the view can be dropped immediately after: the returned
 * DataFrame's plan holds the resolved relation, not the view name.
 *
 * Temp views are SESSION-scoped, so the race on the view name exists only
 * within one session — the lock is per SparkSession (weakly held, so
 * short-lived sessions are collectable), and independent sessions'
 * provided queries run fully concurrently instead of contending on one
 * process-wide monitor. Within a pipeline, bindings process sequentially;
 * the lock guards cross-pipeline use of a shared session.
 */
object ProvidedQuery {

  private val locks = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, AnyRef]())

  def run(mapped: DataFrame, sql: String, viewName: String = "mapped"): DataFrame = {
    val spark = mapped.sparkSession
    val lock = locks.computeIfAbsent(spark, _ => new AnyRef)
    lock.synchronized {
      mapped.createOrReplaceTempView(viewName)
      try spark.sql(sql)
      finally spark.catalog.dropTempView(viewName)
    }
  }
}
