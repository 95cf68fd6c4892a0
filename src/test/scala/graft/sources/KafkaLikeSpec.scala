package graft.sources

import graft.SparkSuite

/** The real-Kafka wiring (inert in this container: no broker, no
  * spark-sql-kafka jar) — covers the subscription surface and proves the
  * reader construction runs all the way to the data-source lookup. */
class KafkaLikeSpec extends SparkSuite {

  private lazy val s = sqlc

  test("kafka subscription config validates its surface") {
    intercept[IllegalArgumentException](KafkaLike.KafkaSubscription("b:9092"))
    intercept[IllegalArgumentException](KafkaLike.KafkaSubscription("b:9092",
      subscribe = Some("t"), subscribePattern = Some("t.*")))
    intercept[IllegalArgumentException](KafkaLike.KafkaSubscription("b:9092",
      subscribe = Some("t"), startingOffsets = "sometimes"))
    // reference-shaped valid forms
    KafkaLike.KafkaSubscription("b:9092", subscribe = Some("orders,users"))
    KafkaLike.KafkaSubscription("b:9092",
      subscribePattern = Some("orders.*"), startingOffsets = "latest")
  }

  test("kafka wiring runs to the data-source boundary in this container") {
    val e = intercept[Exception] {
      KafkaLike.kafkaStream(s, KafkaLike.KafkaSubscription("localhost:9092",
        subscribe = Some("orders")))
    }
    // the reader was constructed with all options; only the source lookup
    // (no spark-sql-kafka on the classpath) can fail here
    val msg = Option(e.getMessage).getOrElse("") + e.getClass.getName
    assert(msg.toLowerCase.contains("kafka") || msg.contains("DATA_SOURCE"),
      s"unexpected failure: $msg")
  }
}
