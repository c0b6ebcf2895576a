package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.Tables

/** Round-3 breadth batch 5: native XML decode, contingency-table reshaping,
  * and the DAU/new/cumulative-user growth rollup — plus nothing that needs a
  * global single-partition pass (the cumulative window runs over the tiny
  * per-day spine, not the event stream). All DuckDB-oracled.
  */
object Ext8Queries {

  /** Native from_xml decode (Spark 4 ships the XML data source in-box): an
    * RSS-item-shaped payload is synthesized per doc, decoded through the
    * schema-explicit XML parser, and the recovered fields are aggregated.
    * The vocabulary contains no XML metacharacters, so no escaping layer is
    * under test — the parse surface is. Complements the hand-rolled RSS
    * tier (sources.Rss) with the engine-native path; oracle re-extracts
    * with regexes.
    */
  def fromXml(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType.fromDDL("id BIGINT, lang STRING, src STRING")
    Tables.documents(s, dir)
      .withColumn("xml", concat(
        lit("<item><id>"), col("doc_id").cast("string"),
        lit("</id><lang>"), col("lang"),
        lit("</lang><src>"), col("source"), lit("</src></item>")))
      .withColumn("it", from_xml(col("xml"), schema))
      .groupBy(col("it.lang").as("lang"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("it.id") === col("doc_id"), 1L).otherwise(0L)).as("n_id_ok"),
        countDistinct(col("it.src")).as("n_sources"))
  }

  val fromXmlOracle: String =
    """WITH x AS (
      |  SELECT doc_id,
      |    '<item><id>' || CAST(doc_id AS VARCHAR) || '</id><lang>' || lang ||
      |    '</lang><src>' || source || '</src></item>' AS xml
      |  FROM documents
      |), p AS (
      |  SELECT doc_id,
      |    CAST(regexp_extract(xml, '<id>([^<]*)</id>', 1) AS BIGINT) AS id,
      |    regexp_extract(xml, '<lang>([^<]*)</lang>', 1) AS lang,
      |    regexp_extract(xml, '<src>([^<]*)</src>', 1) AS src
      |  FROM x
      |)
      |SELECT lang, COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN id = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_id_ok,
      |  COUNT(DISTINCT src) AS n_sources
      |FROM p GROUP BY lang""".stripMargin

  /** Native XML FILE source (Spark 4 in-box "xml" format with rowTag):
    * item elements staged to a text landing zone are scanned by the XML
    * data source directly — the file-level complement of q_from_xml's
    * per-string decode. Schema-explicit (no inference pass), so the scan
    * cost at 100 TB is one read like every other format.
    */
  def xmlSource(s: SparkSession, dir: String): DataFrame = {
    val staged = graft.util.TempDirs.create("graft-xml")
    import s.implicits._
    // one well-formed document PER PARTITION (<items> root wrapping the
    // items): the XML scanner needs a root element — bare fragment lines
    // parse only their first rowTag occurrence
    Tables.documents(s, dir)
      .select(concat(
        lit("<item><id>"), col("doc_id").cast("string"),
        lit("</id><lang>"), col("lang"),
        lit("</lang><src>"), col("source"), lit("</src></item>")).as("value"))
      .as[String]
      // STREAM the wrapper (round-13 fix): mkString materialized a whole
      // partition's XML as ONE string/line — memory doubled and the 2 GB
      // JVM string ceiling loomed at real partition sizes; the XML reader
      // handles multi-line rowTag records, so emit fragments as their own
      // lines between root-element lines
      .mapPartitions(it =>
        Iterator.single("<items>") ++ it ++ Iterator.single("</items>"))
      .toDF("value")
      .write.mode("overwrite").text(staged.toString)
    s.read
      .option("rowTag", "item")
      .schema(StructType.fromDDL("id BIGINT, lang STRING, src STRING"))
      .xml(staged.toString)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), countDistinct("src").as("n_sources"),
        min("id").as("min_id"), max("id").as("max_id"))
  }

  val xmlSourceOracle: String =
    """SELECT lang, COUNT(*) AS n, COUNT(DISTINCT source) AS n_sources,
      |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      |FROM documents GROUP BY lang""".stripMargin

  /** Contingency table via df.stat.crosstab: event_type x user-bucket counts
    * pivoted to one column per bucket — the two-variable frequency reshape.
    * Implemented as groupBy+pivot under the hood: one shuffle, bucket
    * cardinality bounded by construction (see q_pivot for the general
    * pivot surface).
    */
  def crosstab(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("bucket", (col("user_id") % 3).cast("string"))
      .stat.crosstab("event_type", "bucket")

  val crosstabOracle: String =
    """SELECT event_type AS event_type_bucket,
      |  CAST(SUM(CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS "0",
      |  CAST(SUM(CASE WHEN user_id % 3 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS "1",
      |  CAST(SUM(CASE WHEN user_id % 3 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS "2"
      |FROM events GROUP BY event_type""".stripMargin

  /** Engine-native frequent-items sketch (Spark 4.1 approx_top_k, a
    * DataSketches ItemsSketch): top-3 event types with estimated counts.
    * At this cardinality (5 distinct values ≪ sketch capacity) the sketch
    * is EXACT, so the oracle is the exact top-3 — the same
    * bounded-error-becomes-exact gating as q_sketch_merge/q_heavy_hitters
    * (the custom CountMinSketchAgg complement).
    */
  def approxTopK(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).createOrReplaceTempView("events_atk")
    s.sql(
      """SELECT t.* FROM (
        |  SELECT inline(approx_top_k(event_type, 3)) FROM events_atk
        |) t""".stripMargin)
  }

  val approxTopKOracle: String =
    """SELECT event_type AS item, COUNT(*) AS count
      |FROM events GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 3""".stripMargin

  /** Scala UDF registered into the SQL function registry — the extension
    * tier BELOW native Expressions in the preference order (opaque to
    * Catalyst: no codegen, no pushdown through it; see functions.* for the
    * right way). Covered because users reach for spark.udf.register first;
    * the oracle recomputes the UDF's semantics relationally.
    */
  def udfRegistered(s: SparkSession, dir: String): DataFrame = {
    s.udf.register("vowel_count",
      (t: String) => if (t == null) 0L else t.count("aeiou".contains(_)).toLong)
    Tables.documents(s, dir).createOrReplaceTempView("documents_udf")
    s.sql(
      """SELECT lang, SUM(vowel_count(text)) AS vowels, COUNT(*) AS n
        |FROM documents_udf GROUP BY lang""".stripMargin)
  }

  val udfRegisteredOracle: String =
    """SELECT lang,
      |  CAST(SUM(len(regexp_extract_all(text, '[aeiou]'))) AS BIGINT) AS vowels,
      |  COUNT(*) AS n
      |FROM documents GROUP BY lang""".stripMargin

  /** Catalog tier: saveAsTable into the session catalog (managed parquet
    * table), append more rows with SQL INSERT INTO ... SELECT, and query the
    * result by table name — the create/insert/read lifecycle every
    * warehouse-resident pipeline runs, vs. the path-based reads everywhere
    * else. The managed table holds click events plus re-inserted error
    * events, so the oracle is a UNION ALL over the same slices.
    */
  def catalogTable(s: SparkSession, dir: String): DataFrame = {
    val tbl = "events_managed"
    s.sql(s"DROP TABLE IF EXISTS $tbl")
    // a location left by a PREVIOUS session is unknown to this in-memory
    // catalog; CTAS refuses to reuse it (LOCATION_ALREADY_EXISTS) — clear it
    // through the Hadoop FS API (works on any supported filesystem)
    val loc = new org.apache.hadoop.fs.Path(
      s.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl)))
    val fs = loc.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(loc)) fs.delete(loc, true)
    Tables.events(s, dir).filter(col("event_type") === "click")
      .write.mode("overwrite").saveAsTable(tbl)
    Tables.events(s, dir).filter(col("event_type") === "error")
      .createOrReplaceTempView("events_errors_v")
    s.sql(s"INSERT INTO $tbl SELECT * FROM events_errors_v")
    s.sql(
      s"""SELECT event_type, COUNT(*) AS n, MIN(event_id) AS min_id,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM $tbl GROUP BY event_type""".stripMargin)
  }

  val catalogTableOracle: String =
    """SELECT event_type, COUNT(*) AS n, MIN(event_id) AS min_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events WHERE event_type IN ('click', 'error')
      |GROUP BY event_type""".stripMargin

  /** REAL JDBC source/sink round trip (SURVEY §2 S6/K5): events land in an
    * embedded Derby database through df.write.jdbc, come back through a
    * PARALLEL partitioned JDBC scan (partitionColumn/bounds/numPartitions —
    * each executor opens its own connection and reads one key range; an
    * unpartitioned read.jdbc is a single-connection bottleneck), and
    * aggregate identically to the parquet original. The reference's MySQL
    * fact tables use exactly this path with a server-side database.
    */
  def jdbcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val db = graft.util.TempDirs.create("graft-derby")
      .resolve("eventsdb")
    val url = s"jdbc:derby:$db;create=true"
    val props = new java.util.Properties()
    // bounded slice: JDBC writes are single-connection batch inserts — the
    // sink contract under test, not a bulk-load path (at scale the real
    // server-side DB takes the parallel writes)
    val slice = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "error"))
      .select("event_id", "ts_us", "user_id", "event_type", "value")
    slice.write.mode("overwrite").jdbc(url, "events_jdbc", props)
    // one read-back aggregation for BOTH paths — duplicating it would let
    // a future edit to one branch silently desync the other
    def aggregated(readBack: DataFrame): DataFrame = readBack
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"),
        max("ts_us").as("max_ts"))
    val bounds = slice.agg(min("event_id"), max("event_id")).collect()(0)
    // an empty slice yields Row(null, null) — getLong would NPE with no
    // hint which query or input failed (round-13 guard). An empty JDBC
    // table reads back as an empty result without partition bounds.
    if (bounds.isNullAt(0))
      return aggregated(s.read.jdbc(url, "events_jdbc", props))
    aggregated(s.read
      .option("partitionColumn", "event_id")
      .option("lowerBound", bounds.getLong(0))
      .option("upperBound", bounds.getLong(1) + 1)
      .option("numPartitions", 4)
      .jdbc(url, "events_jdbc", props))
  }

  val jdbcRoundtripOracle: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  MAX(epoch_us(ts)) AS max_ts
      |FROM events WHERE event_type IN ('click', 'error')
      |GROUP BY event_type""".stripMargin

  /** ORC source round trip: the same schema-preserving trip as
    * q_csv_roundtrip through Spark's second columnar format (predicate
    * pushdown, column pruning, and vectorized reads all hold for ORC as for
    * parquet). Completes the format matrix: parquet everywhere else, CSV,
    * JSON, XML, JDBC, ORC here.
    */
  def orcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val staged = graft.util.TempDirs.create("graft-orc")
    Tables.events(s, dir)
      .select("event_id", "ts_us", "user_id", "event_type", "value")
      .write.mode("overwrite").orc(staged.toString)
    s.read.orc(staged.toString)
      .filter(col("event_type") =!= "view") // pushed into the ORC scan
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
  }

  val orcRoundtripOracle: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events WHERE event_type <> 'view' GROUP BY event_type""".stripMargin

  /** Corrupt-record tolerance: a JSON landing zone where every 10th line is
    * deterministically malformed is read in PERMISSIVE mode with a
    * _corrupt_record column — bad rows become quarantine rows instead of
    * failing the job (FAILFAST) or vanishing silently (DROPMALFORMED).
    * The schema-drift posture any pipeline over third-party feeds runs
    * with; the oracle recomputes both populations from the corruption rule.
    */
  def corruptRecords(s: SparkSession, dir: String): DataFrame = {
    val staged = graft.util.TempDirs.create("graft-corrupt")
    Tables.events(s, dir)
      .select(when(col("event_id") % 10 === 0,
          concat(lit("{\"event_id\":"), col("event_id").cast("string"),
            lit(",\"event_type\":\"TRUNC")))
        .otherwise(to_json(struct(col("event_id"), col("event_type"), col("value"))))
        .as("value"))
      .write.mode("overwrite").text(staged.toString)
    s.read
      .schema("event_id BIGINT, event_type STRING, value DOUBLE, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(staged.toString)
      // a downstream plan may prune to ONLY _corrupt_record (e.g. a bare
      // count of the groups), which Spark disallows against a raw scan
      // (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache() is the documented
      // decoupling; the quarantine set is small and short-lived by design.
      // Registered with CachedIntermediates so Dedup.unpersistIntermediates /
      // unpersistAll reclaims it under the same consume-then-drain contract.
      .cache()
      .transform(graft.operators.CachedIntermediates.track)
      .groupBy(col("_corrupt_record").isNotNull.as("is_corrupt"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"),
        min("event_id").as("min_id"))
  }

  val corruptRecordsOracle: String =
    """WITH e AS (
      |  SELECT event_id % 10 = 0 AS is_corrupt, event_id, value FROM events
      |)
      |SELECT is_corrupt, COUNT(*) AS n,
      |  CASE WHEN NOT is_corrupt
      |       THEN CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) END AS sum_value,
      |  CASE WHEN NOT is_corrupt THEN MIN(event_id) END AS min_id
      |FROM e GROUP BY is_corrupt""".stripMargin

  /** Higher central moments per group: skewness and excess kurtosis.
    * Spark's definitions are the POPULATION moments (m3/m2^1.5 and
    * m4/m2^2 - 3); the oracle recomputes exactly those from first
    * principles (two-pass: group mean, then centered-power averages) —
    * proving the formula, not just echoing the function.
    */
  def moments(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        round(skewness(col("value")), 6).as("skew"),
        round(kurtosis(col("value")), 6).as("kurt"),
        count(lit(1)).as("n"))

  val momentsOracle: String =
    """WITH m AS (
      |  SELECT event_type, AVG(value) AS mu FROM events GROUP BY event_type
      |)
      |SELECT e.event_type,
      |  ROUND(AVG(POW(value - mu, 3)) / POW(AVG(POW(value - mu, 2)), 1.5), 6) AS skew,
      |  ROUND(AVG(POW(value - mu, 4)) / POW(AVG(POW(value - mu, 2)), 2) - 3, 6) AS kurt,
      |  COUNT(*) AS n
      |FROM events e JOIN m USING (event_type)
      |GROUP BY e.event_type""".stripMargin

  /** mode() and exact interpolated median() — the central-tendency
    * aggregates (Spark 3.4+/4.0). Global row: the corpus's event-type
    * counts have a unique maximum at every SF (mode ties are
    * implementation-defined in BOTH engines, so the query surface sticks
    * to the unique-max case).
    */
  def centralTendency(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .agg(
        mode(col("event_type")).as("top_type"),
        round(median(col("value")), 6).as("med_value"),
        round(median(col("user_id")), 6).as("med_user"))

  val centralTendencyOracle: String =
    """SELECT mode(event_type) AS top_type,
      |  ROUND(median(value), 6) AS med_value,
      |  ROUND(CAST(median(user_id) AS DOUBLE), 6) AS med_user
      |FROM events""".stripMargin

  /** Weighted PageRank, 3 unrolled iterations, over the event-type
    * transition graph (edge src->dst weighted by how often dst follows src
    * in a user's stream). Each iteration is the distributed matvec: join
    * ranks to edges on src, shuffle-sum contributions by dst — the
    * iterative-graph-analytics pattern beyond connected components, built
    * as ONE composed plan (no driver-side data movement between
    * iterations). The oracle unrolls the same three steps as a CTE chain.
    */
  def pagerank(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val trans = Tables.events(s, dir)
      .withColumn("next", lead(col("event_type"), 1).over(w))
      .filter(col("next").isNotNull)
      .groupBy(col("event_type").as("src"), col("next").as("dst"))
      .agg(count(lit(1)).as("weight"))
    val outW = trans.groupBy("src").agg(sum("weight").as("out_w"))
    val edges = trans.join(outW, Seq("src"))
      .select(col("src"), col("dst"),
        (col("weight").cast("double") / col("out_w")).as("p"))
    val nodes = trans.select(col("src").as("node"))
      .unionByName(trans.select(col("dst").as("node"))).distinct()
    // node count computed from the graph itself (not a corpus-schema
    // literal): a 1-row aggregate broadcast onto every rank row. The
    // teleport term 0.15/n is folded INTO the materialized node rows once —
    // re-crossJoining the 1-row count into every unrolled iteration forced
    // re-planning + extra stages per round (measured 5.9 s vs 2.5 s). The
    // edge/node tables (one row per distinct event-type transition — tiny
    // at any corpus scale) are lazily localCheckpoint'd so the 3 unrolled
    // iterations share ONE materialization of the heavy events scan instead
    // of re-running it per round; eager=false keeps query construction
    // action-free.
    val nCnt = nodes.agg(count(lit(1)).cast("double").as("_n"))
    val edgesM = edges.localCheckpoint(eager = false)
    val base = nodes.crossJoin(broadcast(nCnt))
      .select(col("node"), (lit(0.15) / col("_n")).as("teleport"),
        (lit(1.0) / col("_n")).as("rank"))
      .localCheckpoint(eager = false)
    var ranks = base.select(col("node"), col("rank"))
    for (_ <- 1 to 3) {
      val contrib = edgesM.join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("p") * col("rank")).as("in_rank"))
      ranks = base.select(col("node"), col("teleport"))
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (col("teleport") +
            lit(0.85) * coalesce(col("in_rank"), lit(0.0))).as("rank"))
    }
    ranks.select(col("node"), round(col("rank"), 9).as("rank"))
  }

  val pagerankOracle: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |                           ORDER BY epoch_us(ts), event_id) AS next
      |  FROM events
      |), trans AS (
      |  SELECT event_type AS src, next AS dst, COUNT(*) AS weight
      |  FROM seq WHERE next IS NOT NULL GROUP BY 1, 2
      |), edges AS (
      |  SELECT src, dst,
      |    CAST(weight AS DOUBLE) / SUM(weight) OVER (PARTITION BY src) AS p
      |  FROM trans
      |), nodes AS (
      |  SELECT src AS node FROM trans UNION SELECT dst FROM trans
      |), nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
      |r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn),
      |r1 AS (
      |  SELECT n2.node, 0.15 / nn.n + 0.85 * COALESCE(SUM(e.p * r0.rank), 0.0) AS rank
      |  FROM nodes n2 CROSS JOIN nn LEFT JOIN edges e ON e.dst = n2.node
      |  LEFT JOIN r0 ON r0.node = e.src GROUP BY n2.node, nn.n
      |), r2 AS (
      |  SELECT n2.node, 0.15 / nn.n + 0.85 * COALESCE(SUM(e.p * r1.rank), 0.0) AS rank
      |  FROM nodes n2 CROSS JOIN nn LEFT JOIN edges e ON e.dst = n2.node
      |  LEFT JOIN r1 ON r1.node = e.src GROUP BY n2.node, nn.n
      |), r3 AS (
      |  SELECT n2.node, 0.15 / nn.n + 0.85 * COALESCE(SUM(e.p * r2.rank), 0.0) AS rank
      |  FROM nodes n2 CROSS JOIN nn LEFT JOIN edges e ON e.dst = n2.node
      |  LEFT JOIN r2 ON r2.node = e.src GROUP BY n2.node, nn.n
      |)
      |SELECT node, ROUND(rank, 9) AS rank FROM r3""".stripMargin

  /** Growth rollup: daily active users, first-seen (new) users, and the
    * cumulative user count. The only unpartitioned window runs over the
    * per-day spine (365 rows at any corpus size), never the event stream —
    * the scale-safe formulation of "cumulative distinct".
    */
  def userGrowth(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(to_date(timestamp_micros(col("ts_us"))).as("day"), col("user_id"))
    val dau = ev.groupBy("day").agg(countDistinct("user_id").as("dau"))
    val firstSeen = ev.groupBy("user_id").agg(min("day").as("day"))
      .groupBy("day").agg(count(lit(1)).as("new_users"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    dau.join(firstSeen, Seq("day"), "left")
      .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
      .withColumn("cum_users", sum("new_users").over(w))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("new_users"), col("cum_users"))
  }

  val userGrowthOracle: String =
    """WITH ev AS (
      |  SELECT CAST(ts AS DATE) AS day, user_id FROM events
      |), dau AS (
      |  SELECT day, COUNT(DISTINCT user_id) AS dau FROM ev GROUP BY day
      |), fs AS (
      |  SELECT MIN(day) AS day, user_id FROM ev GROUP BY user_id
      |), nu AS (
      |  SELECT day, COUNT(*) AS new_users FROM fs GROUP BY day
      |)
      |SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau,
      |  COALESCE(nu.new_users, 0) AS new_users,
      |  CAST(SUM(COALESCE(nu.new_users, 0)) OVER (ORDER BY dau.day
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
      |FROM dau LEFT JOIN nu ON dau.day = nu.day""".stripMargin
}
