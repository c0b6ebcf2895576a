package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-6 extension batch 8: corpus-statistics and data-discovery
  * operators — the profiling layer that decides HOW to process a new
  * 100 TB drop before any pipeline runs: Zipf-law fit (is this natural
  * language or log spam?), PMI collocations (multi-word expressions worth
  * preserving through tokenization), foreign-key/inclusion discovery
  * (which columns actually join), and seasonally-adjusted anomaly counts
  * (is the feed healthy?).
  */
object Ext27Queries {

  /** Zipf exponent per language: term frequencies, log-log regression of
    * frequency on rank over the top-100 terms, slope via `regr_slope` —
    * natural text lands near −1. The rank window runs over the per-lang
    * term HISTOGRAM (vocabulary-sized, not corpus-sized) and the top-100
    * cut bounds the regression input; the only corpus-wide work is the
    * (lang, term) count with map-side partial aggregation.
    */
  def zipfFit(s: SparkSession, dir: String): DataFrame = {
    val freq = Tables.documents(s, dir)
      .select(col("lang"), col("doc_id"),
        explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("lang", "term").agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy("lang")
      .orderBy(col("freq").desc, col("term"))
    freq.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 100)
      .groupBy("lang")
      .agg(
        round(regr_slope(log(col("freq")), log(col("rank"))), 6)
          .as("zipf_slope"),
        round(regr_r2(log(col("freq")), log(col("rank"))), 6).as("r2"),
        count(lit(1)).as("n_terms"))
  }

  val zipfFitOracle: String =
    """WITH terms AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
      |), freq AS (
      |  SELECT lang, term, COUNT(*) AS freq FROM terms
      |  WHERE term <> '' GROUP BY 1, 2
      |), ranked AS (
      |  SELECT lang, freq,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY freq DESC, term) AS rank
      |  FROM freq
      |)
      |SELECT lang,
      |  ROUND(regr_slope(ln(freq), ln(rank)), 6) AS zipf_slope,
      |  ROUND(regr_r2(ln(freq), ln(rank)), 6) AS r2,
      |  CAST(COUNT(*) AS BIGINT) AS n_terms
      |FROM ranked WHERE rank <= 100
      |GROUP BY lang""".stripMargin

  /** Top collocations by pointwise mutual information: adjacent token
    * pairs via a doc-partitioned `lead` window (no self-join), unigram and
    * bigram counts, PMI = ln((c_xy/N_bi) / ((c_x/N_uni)·(c_y/N_uni))),
    * support floor c_xy >= 5, global top-20 with a total-order tiebreak.
    * The unigram model is vocabulary-sized and broadcasts back onto the
    * bigram histogram; nothing corpus-sized is ever joined wide.
    */
  def pmiCollocations(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .withColumnRenamed("col", "term").filter(col("term") =!= "")
    val wSeq = Window.partitionBy("doc_id").orderBy("pos")
    val bi = toks
      .withColumn("next", lead(col("term"), 1).over(wSeq))
      .filter(col("next").isNotNull)
      .groupBy(col("term").as("w1"), col("next").as("w2"))
      .agg(count(lit(1)).as("c_xy"))
    val uni = toks.groupBy(col("term")).agg(count(lit(1)).as("c"))
    val nUni = toks.count().toDouble
    val nBi = bi.agg(sum("c_xy")).head().getLong(0).toDouble
    val u1 = uni.select(col("term").as("w1"), col("c").as("c_x"))
    val u2 = uni.select(col("term").as("w2"), col("c").as("c_y"))
    bi.filter(col("c_xy") >= 5)
      .join(broadcast(u1), Seq("w1"))
      .join(broadcast(u2), Seq("w2"))
      .withColumn("pmi",
        round(log((col("c_xy") / nBi)
          / ((col("c_x") / nUni) * (col("c_y") / nUni))), 6))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(20)
      .select("w1", "w2", "c_xy", "pmi")
  }

  val pmiCollocationsOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, term, ord FROM (
      |    -- DuckDB zips parallel unnests positionally (no WITH ORDINALITY)
      |    SELECT doc_id, unnest(l) AS term,
      |      unnest(generate_series(1, len(l))) AS ord
      |    FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
      |  ) WHERE term <> ''
      |), seq AS (
      |  SELECT doc_id, term,
      |    lead(term) OVER (PARTITION BY doc_id ORDER BY ord) AS next
      |  FROM toks
      |), bi AS (
      |  SELECT term AS w1, next AS w2, COUNT(*) AS c_xy
      |  FROM seq WHERE next IS NOT NULL GROUP BY 1, 2
      |), uni AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY 1),
      |n AS (
      |  SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM toks) AS n_uni,
      |    (SELECT CAST(SUM(c_xy) AS DOUBLE) FROM bi) AS n_bi
      |)
      |SELECT w1, w2, c_xy,
      |  ROUND(ln((c_xy / n.n_bi)
      |    / ((u1.c / n.n_uni) * (u2.c / n.n_uni))), 6) AS pmi
      |FROM bi
      |  JOIN uni u1 ON bi.w1 = u1.term
      |  JOIN uni u2 ON bi.w2 = u2.term
      |  CROSS JOIN n
      |WHERE c_xy >= 5
      |ORDER BY pmi DESC, w1, w2
      |LIMIT 20""".stripMargin

  /** Foreign-key discovery by inclusion coefficient: for each candidate
    * (child.column → parent.key) pair, |distinct child values contained
    * in parent| / |distinct child values|. The four real FKs of the
    * corpus score 1.0; the deliberately-wrong control (event ids against
    * customer keys) scores its true partial overlap — the
    * discriminating signal a profiler needs. Each pair is two distinct
    * aggregates and a broadcast semi-join of key sets (never fact rows);
    * the union of 5 tiny results is driver-free.
    */
  def fkDiscovery(s: SparkSession, dir: String): DataFrame = {
    def pair(name: String, child: DataFrame, childCol: String,
        parent: DataFrame, parentCol: String): DataFrame = {
      val c = child.select(col(childCol).cast("long").as("k")).distinct()
      val p = parent.select(col(parentCol).cast("long").as("k")).distinct()
      c.join(broadcast(p), Seq("k"), "left_semi")
        .agg(count(lit(1)).as("n_contained"))
        .crossJoin(c.agg(count(lit(1)).as("n_child")))
        .select(lit(name).as("candidate"), col("n_child"),
          col("n_contained"),
          round(col("n_contained").cast("double") / col("n_child"), 6)
            .as("inclusion"))
    }
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    pair("lineitem.l_orderkey->orders.o_orderkey", li, "l_orderkey",
        o, "o_orderkey")
      .unionByName(pair("orders.o_custkey->customer.c_custkey", o,
        "o_custkey", Tables.customer(s, dir), "c_custkey"))
      .unionByName(pair("lineitem.l_partkey->part.p_partkey", li,
        "l_partkey", Tables.part(s, dir), "p_partkey"))
      .unionByName(pair("lineitem.l_suppkey->supplier.s_suppkey", li,
        "l_suppkey", Tables.supplier(s, dir), "s_suppkey"))
      .unionByName(pair("events.event_id->customer.c_custkey",
        Tables.events(s, dir), "event_id",
        Tables.customer(s, dir), "c_custkey"))
  }

  val fkDiscoveryOracle: String =
    """WITH per AS (
      |  SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS candidate,
      |    (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS n_child,
      |    (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem
      |      WHERE l_orderkey IN (SELECT o_orderkey FROM orders))
      |      AS n_contained
      |  UNION ALL
      |  SELECT 'orders.o_custkey->customer.c_custkey',
      |    (SELECT COUNT(DISTINCT o_custkey) FROM orders),
      |    (SELECT COUNT(DISTINCT o_custkey) FROM orders
      |      WHERE o_custkey IN (SELECT c_custkey FROM customer))
      |  UNION ALL
      |  SELECT 'lineitem.l_partkey->part.p_partkey',
      |    (SELECT COUNT(DISTINCT l_partkey) FROM lineitem),
      |    (SELECT COUNT(DISTINCT l_partkey) FROM lineitem
      |      WHERE l_partkey IN (SELECT p_partkey FROM part))
      |  UNION ALL
      |  SELECT 'lineitem.l_suppkey->supplier.s_suppkey',
      |    (SELECT COUNT(DISTINCT l_suppkey) FROM lineitem),
      |    (SELECT COUNT(DISTINCT l_suppkey) FROM lineitem
      |      WHERE l_suppkey IN (SELECT s_suppkey FROM supplier))
      |  UNION ALL
      |  SELECT 'events.event_id->customer.c_custkey',
      |    (SELECT COUNT(DISTINCT event_id) FROM events),
      |    (SELECT COUNT(DISTINCT event_id) FROM events
      |      WHERE event_id IN (SELECT c_custkey FROM customer))
      |)
      |SELECT candidate, CAST(n_child AS BIGINT) AS n_child,
      |  CAST(n_contained AS BIGINT) AS n_contained,
      |  ROUND(CAST(n_contained AS DOUBLE) / n_child, 6) AS inclusion
      |FROM per""".stripMargin

  /** Seasonally-adjusted anomaly audit: residual = value − mean(type,
    * hour-of-day) — the hour-of-day profile absorbs the daily cycle a
    * raw z-score would flag as anomalous — then per-type σ and the count
    * beyond 3σ plus the worst |z|. Two passes over the fact (seasonal
    * profile, then residual scoring with both small profiles broadcast
    * back); no window over the corpus at all.
    */
  def anomalyResid(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .withColumn("hod", expr("ts_us div 3600000000 % 24"))
      .select("event_type", "hod", "value")
    val prof = ev.groupBy("event_type", "hod")
      .agg(avg("value").as("mu_hod"))
    val resid = ev.join(broadcast(prof), Seq("event_type", "hod"))
      .withColumn("resid", col("value") - col("mu_hod"))
    val sd = resid.groupBy("event_type")
      .agg(stddev_samp("resid").as("sd"))
    resid.join(broadcast(sd), Seq("event_type"))
      .withColumn("z", col("resid") / col("sd"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(abs(col("z")) > 3, 1L).otherwise(0L)).as("n_anomalies"),
        round(max(abs(col("z"))), 6).as("worst_z"))
  }

  val anomalyResidOracle: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 % 24 AS hod, value
      |  FROM events
      |), prof AS (
      |  SELECT event_type, hod, AVG(value) AS mu_hod
      |  FROM ev GROUP BY 1, 2
      |), resid AS (
      |  SELECT ev.event_type, ev.value - prof.mu_hod AS resid
      |  FROM ev JOIN prof ON ev.event_type = prof.event_type
      |    AND ev.hod = prof.hod
      |), sd AS (
      |  SELECT event_type, stddev_samp(resid) AS sd FROM resid GROUP BY 1
      |)
      |SELECT r.event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CASE WHEN abs(r.resid / sd.sd) > 3 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_anomalies,
      |  ROUND(MAX(abs(r.resid / sd.sd)), 6) AS worst_z
      |FROM resid r JOIN sd ON r.event_type = sd.event_type
      |GROUP BY r.event_type""".stripMargin
}
