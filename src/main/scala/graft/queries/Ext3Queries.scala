package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** SQL-breadth batch: explicit GROUPING SETS, FILTER-clause aggregates,
  * array and string function surfaces, and null-handling semantics. Each is
  * a small surface a reference user would expect from a complete engine;
  * all DuckDB-oracled.
  */
object Ext3Queries {

  /** Explicit GROUPING SETS — the irregular set ((rf, ls), (rf), ()) that
    * neither rollup nor cube produces.
    */
  def groupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_gs")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n, grouping_id() AS gid
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin)
  }

  val groupingSetsOracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n, GROUPING(l_returnflag, l_linestatus) AS gid
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin

  /** FILTER-clause aggregates: conditional aggregation without CASE
    * scaffolding, one pass over the fact table.
    */
  def aggFilter(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).createOrReplaceTempView("events_af")
    s.sql(
      """SELECT user_id,
        |  COUNT(*) FILTER (WHERE event_type = 'click') AS n_clicks,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'purchase')
        |       AS DOUBLE) AS purchase_value
        |FROM events_af GROUP BY user_id""".stripMargin)
  }

  val aggFilterOracle: String =
    """SELECT user_id,
      |  COUNT(*) FILTER (WHERE event_type = 'click') AS n_clicks,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'purchase')
      |       AS DOUBLE) AS purchase_value
      |FROM events GROUP BY user_id""".stripMargin

  /** Array-function surface over tokenized text: sort, slice, containment,
    * position, distinct size. Arrays leave the gate as joined strings (the
    * comparer's array renderings are not cross-engine stable).
    */
  def arrayFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(col("doc_id") < 30)
      .withColumn("arr", split(col("text"), " "))
      .select(
        col("doc_id"),
        concat_ws("|", slice(array_sort(col("arr")), 1, 3)).as("first3_sorted"),
        size(array_distinct(col("arr"))).as("n_distinct"),
        array_contains(col("arr"), "data").cast("int").as("has_data"),
        array_position(col("arr"), "the").cast("long").as("first_the"))

  val arrayFuncsOracle: String =
    """SELECT doc_id,
      |  array_to_string(list_sort(string_split(text, ' '))[1:3], '|') AS first3_sorted,
      |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
      |  CAST(list_contains(string_split(text, ' '), 'data') AS INT) AS has_data,
      |  COALESCE(list_position(string_split(text, ' '), 'the'), 0) AS first_the
      |FROM documents WHERE doc_id < 30""".stripMargin

  /** String-function surface: padding, reversal, field extraction, repeat,
    * character translation.
    */
  def stringFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .filter(col("p_partkey") < 100)
      .select(
        col("p_partkey"),
        lpad(col("p_brand"), 12, "_").as("padded"),
        reverse(col("p_type")).as("reversed"),
        expr("split_part(p_name, ' ', 1)").as("first_word"),
        repeat(col("p_brand"), 2).as("doubled"),
        translate(col("p_type"), "aeiou", "AEIOU").as("vowels_up"))

  val stringFuncsOracle: String =
    """SELECT p_partkey,
      |  lpad(p_brand, 12, '_') AS padded,
      |  reverse(p_type) AS reversed,
      |  split_part(p_name, ' ', 1) AS first_word,
      |  repeat(p_brand, 2) AS doubled,
      |  translate(p_type, 'aeiou', 'AEIOU') AS vowels_up
      |FROM part WHERE p_partkey < 100""".stripMargin

  /** Bucketed co-located join driven end-to-end: both sides written as
    * bucketed+sorted tables on the join key (the one-time shuffle), then
    * joined shuffle-free (ScaleSpec proves the exchange-free plan; this
    * gates the RESULT of the write->read->join round trip against the plain
    * join). The warehouse tables are per-run overwrites.
    */
  def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    // a fresh metastore session doesn't know about tables whose warehouse
    // directories survived an earlier run — drop BOTH the catalog entry and
    // the location or the managed-table create fails LOCATION_ALREADY_EXISTS
    def freshTable(name: String): Unit = {
      s.sql(s"DROP TABLE IF EXISTS $name")
      val p = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), name)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
    }
    freshTable("bjoin_events")
    freshTable("bjoin_users")
    val ev = Tables.events(s, dir)
      .select("event_id", "user_id", "event_type", "value")
    val perUser = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).as("sum_v"))
    graft.operators.Scale.writeBucketed(ev, "bjoin_events", 8, Seq("user_id"))
    graft.operators.Scale.writeBucketed(perUser, "bjoin_users", 8, Seq("user_id"))
    graft.operators.Scale.bucketedJoin(s, "bjoin_events", "bjoin_users", Seq("user_id"))
      .filter(col("user_id") < 20)
      .select(col("event_id"), col("user_id"), col("n_events"),
        col("sum_v").cast("double").as("sum_value"))
  }

  val bucketedJoinOracle: String =
    """WITH pu AS (
      |  SELECT user_id, COUNT(*) AS n_events,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS sum_v
      |  FROM events GROUP BY user_id
      |)
      |SELECT e.event_id, e.user_id, pu.n_events,
      |  CAST(pu.sum_v AS DOUBLE) AS sum_value
      |FROM events e JOIN pu USING (user_id)
      |WHERE e.user_id < 20""".stripMargin

  /** regexp_extract_all over the wire-ish props column: pull every digit
    * run per row (the multi-match extraction a log/text pipeline leans on;
    * single-match extraction is q_json_extract). Match lists leave as
    * joined strings for stable cross-engine rendering.
    */
  def regexExtractAll(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"),
        concat_ws("|", expr("regexp_extract_all(props, '\\\\d+', 0)")).as("numbers"),
        size(expr("regexp_extract_all(props, '\\\\d+', 0)")).as("n_matches"))

  val regexExtractAllOracle: String =
    """SELECT event_id,
      |  array_to_string(regexp_extract_all(props, '\d+'), '|') AS numbers,
      |  len(regexp_extract_all(props, '\d+')) AS n_matches
      |FROM events""".stripMargin

  /** Null-handling semantics: NULLIF, null-safe equality (<=> / IS NOT
    * DISTINCT FROM), and coalesce chains — the semantics layer idempotent
    * merges depend on.
    */
  def nullSemantics(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        nullif(col("event_type"), lit("error")).as("et_nullable"),
        (nullif(col("event_type"), lit("error")) <=> lit(null)).cast("int").as("is_error"),
        coalesce(nullif(col("event_type"), lit("error")),
          nullif(col("event_type"), lit("click")), lit("fallback")).as("chained"))

  val nullSemanticsOracle: String =
    """SELECT event_id,
      |  NULLIF(event_type, 'error') AS et_nullable,
      |  CAST(NULLIF(event_type, 'error') IS NOT DISTINCT FROM NULL AS INT) AS is_error,
      |  COALESCE(NULLIF(event_type, 'error'), NULLIF(event_type, 'click'),
      |           'fallback') AS chained
      |FROM events""".stripMargin
}
