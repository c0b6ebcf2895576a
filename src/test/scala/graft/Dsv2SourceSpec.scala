package graft

/** The custom DataSourceV2 kline source: partition-per-key planning, filter
  * pushdown as partition pruning, column pruning, the limit option, and
  * decode parity with the driver-side sweep on identical fixtures.
  */
class Dsv2SourceSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val zone: String = {
    val dir = graft.util.TempDirs.create("dsv2-spec-zone")
    val files = Map(
      "BTCUSDT-1h" -> Seq("""{"symbol":"BTCUSDT","interval":"1h","open_time":1704067200000,"open":"1.0","high":"2.0","low":"0.5","close":"1.5","volume":"10.0","close_time":1704070799999,"fetched_at":"2024-01-01T01:00:05"}""",
        """{"symbol":"BTCUSDT","interval":"1h","open_time":1704070800000,"open":"1.5","high":"2.5","low":"1.0","close":"2.0","volume":"11.0","close_time":1704074399999,"fetched_at":"2024-01-01T02:00:05"}"""),
      "BTCUSDT-1d" -> Seq("""{"symbol":"BTCUSDT","interval":"1d","open_time":1704067200000,"open":"1.0","high":"3.0","low":"0.4","close":"2.2","volume":"99.0","close_time":1704153599999,"fetched_at":"2024-01-02T00:00:07"}"""),
      "ETHUSDT-1h" -> Seq("""{"symbol":"ETHUSDT","interval":"1h","open_time":1704067200000,"open":"5.0","high":"6.0","low":"4.5","close":"5.5","volume":"20.0","close_time":1704070799999,"fetched_at":"2024-01-01T01:00:05"}"""))
    files.foreach { case (k, lines) =>
      java.nio.file.Files.write(
        dir.resolve(s"$k.jsonl"), lines.mkString("\n").getBytes("UTF-8"))
    }
    dir.toString
  }

  private def read() =
    spark.read.format("graft-klines").option("path", zone).load()

  test("one input partition per (symbol, interval) key") {
    assert(read().rdd.getNumPartitions == 3)
    assert(read().count() == 4)
  }

  test("symbol/interval filters prune partitions at planning time") {
    val bySymbol = read().filter($"symbol" === "BTCUSDT")
    assert(bySymbol.rdd.getNumPartitions == 2)
    assert(bySymbol.count() == 3)
    val byBoth = read().filter($"symbol" === "BTCUSDT" && $"interval" === "1d")
    assert(byBoth.rdd.getNumPartitions == 1)
    assert(byBoth.count() == 1)
    val in = read().filter($"interval".isin("1d"))
    assert(in.rdd.getNumPartitions == 1)
  }

  test("non-key predicates stay as residual filters, results still correct") {
    val df = read().filter($"symbol" === "BTCUSDT" && $"value".contains("\"open\":\"1.5\""))
    assert(df.rdd.getNumPartitions == 2) // value predicate cannot prune
    assert(df.count() == 1)
  }

  test("column pruning: a value-only projection reads clean") {
    val vals = read().select("value").as[String].collect()
    assert(vals.length == 4)
    assert(vals.forall(_.startsWith("{")))
  }

  test("limit option caps rows per partition (the REST sweep's LIMIT)") {
    val df = spark.read.format("graft-klines")
      .option("path", zone).option("limit", "1").load()
    assert(df.count() == 3) // one per key
  }

  test("decode parity: DSv2 scan + codec == driver-side sweep on same fixtures") {
    val viaSource = graft.sources.KafkaJson.parsePrices(read().select("value"))
      .select("symbol", "interval", "open_price", "close_price")
      .as[(String, String, BigDecimal, BigDecimal)].collect().toSet
    val fixtures = Map(
      ("BTCUSDT", "1h") -> java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(zone, "BTCUSDT-1h.jsonl")).toArray.toSeq.map(_.toString),
      ("BTCUSDT", "1d") -> java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(zone, "BTCUSDT-1d.jsonl")).toArray.toSeq.map(_.toString),
      ("ETHUSDT", "1h") -> java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(zone, "ETHUSDT-1h.jsonl")).toArray.toSeq.map(_.toString))
    val viaSweep = graft.sources.Ingest.sweep(spark,
        new graft.sources.Ingest.FixtureFetcher(fixtures),
        Seq("BTCUSDT", "ETHUSDT"), Seq("1h", "1d"))
      .select("symbol", "interval", "open_price", "close_price")
      .as[(String, String, BigDecimal, BigDecimal)].collect().toSet
    assert(viaSource == viaSweep)
  }
}
