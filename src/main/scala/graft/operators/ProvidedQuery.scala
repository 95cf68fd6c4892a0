package graft.operators

import org.apache.spark.sql.DataFrame

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
 * DataFrame's plan holds the resolved relation, not the view name. The
 * object-level lock serializes concurrent `run` calls racing the same view
 * name on a shared session (within a pipeline, bindings process
 * sequentially; this guards cross-pipeline use).
 */
object ProvidedQuery {

  def run(mapped: DataFrame, sql: String, viewName: String = "mapped"): DataFrame =
    synchronized {
      val spark = mapped.sparkSession
      mapped.createOrReplaceTempView(viewName)
      try spark.sql(sql)
      finally spark.catalog.dropTempView(viewName)
    }
}
