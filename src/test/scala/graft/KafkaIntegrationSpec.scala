package graft

import org.apache.spark.sql.functions._

import graft.queries.WireQueries
import graft.sources.KafkaJson
import graft.streaming.Pipelines

/** Real-broker Kafka round trip, guarded on the environment: runs only when
  * `KAFKA_BOOTSTRAP` points at a reachable broker AND the
  * spark-sql-kafka connector is on the classpath; otherwise the tests are
  * CANCELED (not passed) so CI output shows the path as unexercised rather
  * than green. This keeps `Pipelines.kafkaSource` / the kafka batch sink
  * from being permanently dead code: in the zero-egress dev image every
  * other spec drives the decode/dedup/sink chain through MemoryStream, and
  * this spec becomes live the moment an integration environment provides a
  * broker (e.g. `KAFKA_BOOTSTRAP=kafka:9092 sbt test`).
  *
  * Why not an EMBEDDED broker: this container ships NO kafka artifacts at
  * all — neither spark-sql-kafka nor kafka-clients nor the broker jars are
  * under /opt/spark/jars or the offline coursier cache, and the build has
  * zero egress to fetch them (`format("kafka")` compiles because the
  * DataSource is resolved by NAME at runtime). An in-process KafkaServer
  * therefore cannot even be constructed here; the env gate + the
  * MemoryStream replay of the identical decode/dedup/sink chain is the
  * strongest coverage this image permits.
  */
class KafkaIntegrationSpec extends SparkTestBase {

  private val bootstrap = sys.env.get("KAFKA_BOOTSTRAP")

  private def connectorPresent: Boolean =
    scala.util.Try(Class.forName(
      "org.apache.spark.sql.kafka010.KafkaSourceProvider")).isSuccess

  test("wire records survive a real produce -> AvailableNow drain -> decode") {
    assume(bootstrap.isDefined, "KAFKA_BOOTSTRAP not set")
    assume(connectorPresent, "spark-sql-kafka connector not on classpath")
    val servers = bootstrap.get
    val topic = s"graft-it-${java.util.UUID.randomUUID().toString.take(8)}"
    import spark.implicits._

    // produce: the K1 wire encoding through the real kafka batch sink
    val klines = KafkaJson.parsePrices(WireQueries.priceFixtures.toDF("value"))
    KafkaJson.toPriceMessages(klines)
      .write.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .save()

    // consume: the S4 streaming source, drained bounded (T6)
    val out = Pipelines.priceFlow(
        Pipelines.kafkaSource(spark, servers, topic))
      .writeStream.format("memory").queryName("kafka_it")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      // a false return means the AvailableNow drain did NOT finish — failing
      // here beats reading a partially-drained memory table and reporting a
      // misleading count mismatch on a slow broker
      assert(out.awaitTermination(60000), "kafka drain timed out after 60 s")
      val roundTripped = spark.table("kafka_it")
        .select("symbol", "interval").distinct().count()
      assert(roundTripped == klines.select("symbol", "interval").distinct().count())
    } finally out.stop()
  }
}
