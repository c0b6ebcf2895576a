package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Round-7 extension batch: the statistics and pipeline-accounting tier an
  * experimentation / data-quality platform runs on the warehouse — Welch's
  * two-sample test, population-stability drift (PSI), Deequ-style quality
  * checks, skyline (Pareto frontier), the Kolmogorov-Smirnov statistic,
  * deterministic A-Res weighted sampling, Observation-API job metrics,
  * UniMax temperature-scaled source mixing, and incremental aggregate
  * maintenance. All exact arithmetic over the shared tables,
  * DuckDB-oracled.
  */
object Ext13Queries {

  // --- A/B testing -------------------------------------------------------------

  /** Welch's two-sample t statistic between the 'click' and 'purchase'
    * event-value populations: one grouped aggregate (n, mean, var_samp per
    * arm), then scalar arithmetic on the two rows — the entire test is one
    * shuffle regardless of corpus size.
    */
  def abtestWelch(s: SparkSession, dir: String): DataFrame = {
    val arms = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy("event_type")
      .agg(count(lit(1)).cast("double").as("n"),
        avg(col("value")).as("m"), var_samp(col("value")).as("v"))
    val a = arms.filter(col("event_type") === "click")
      .select(col("n").as("n1"), col("m").as("m1"), col("v").as("v1"))
    val b = arms.filter(col("event_type") === "purchase")
      .select(col("n").as("n2"), col("m").as("m2"), col("v").as("v2"))
    a.crossJoin(b)
      .withColumn("_se2", col("v1") / col("n1") + col("v2") / col("n2"))
      .select(
        col("n1").cast("bigint").as("n_click"),
        col("n2").cast("bigint").as("n_purchase"),
        round(col("m1"), 6).as("mean_click"),
        round(col("m2"), 6).as("mean_purchase"),
        round((col("m1") - col("m2")) / sqrt(col("_se2")), 6).as("t_welch"),
        round(pow(col("_se2"), 2) /
          (pow(col("v1") / col("n1"), 2) / (col("n1") - 1) +
            pow(col("v2") / col("n2"), 2) / (col("n2") - 1)), 6).as("df"))
  }

  val abtestWelchOracle: String =
    """WITH arms AS (
      |  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n, AVG(value) AS m,
      |    var_samp(value) AS v
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |  GROUP BY event_type
      |), a AS (SELECT n AS n1, m AS m1, v AS v1 FROM arms WHERE event_type = 'click'),
      |b AS (SELECT n AS n2, m AS m2, v AS v2 FROM arms WHERE event_type = 'purchase')
      |SELECT CAST(n1 AS BIGINT) AS n_click, CAST(n2 AS BIGINT) AS n_purchase,
      |  ROUND(m1, 6) AS mean_click, ROUND(m2, 6) AS mean_purchase,
      |  ROUND((m1 - m2) / sqrt(v1/n1 + v2/n2), 6) AS t_welch,
      |  ROUND(POWER(v1/n1 + v2/n2, 2) /
      |    (POWER(v1/n1, 2)/(n1-1) + POWER(v2/n2, 2)/(n2-1)), 6) AS df
      |FROM a CROSS JOIN b""".stripMargin

  // --- distribution drift (PSI) --------------------------------------------------

  /** Population stability index between the src0 and src1 document-length
    * distributions: 10 fixed-width bins over the global [min, max],
    * Laplace-smoothed proportions so empty bins stay defined. PSI < 0.1 is
    * the standard "no drift" band. Global min/max is one scalar aggregate
    * broadcast onto the scan; everything else is a 10-row aggregate.
    */
  def psiDrift(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .filter(col("source").isin("src0", "src1"))
      .select(col("source"), col("n_chars").cast("double").as("x"))
    val mm = docs.agg(min(col("x")).as("_mn"), max(col("x")).as("_mx"))
    val binned = docs.crossJoin(broadcast(mm))
      .withColumn("bin", least(floor((col("x") - col("_mn"))
        / (col("_mx") - col("_mn")) * 10).cast("int"), lit(9)))
      .groupBy("source", "bin").agg(count(lit(1)).as("c"))
    val tot = binned.groupBy("source").agg(sum("c").as("nsrc"))
    val props = binned.join(tot, Seq("source"))
      .select(col("source"), col("bin"),
        ((col("c") + lit(1)).cast("double") / (col("nsrc") + lit(10)))
          .as("p"))
    val pa = props.filter(col("source") === "src0").select(col("bin"), col("p").as("pa"))
    val pb = props.filter(col("source") === "src1").select(col("bin"), col("p").as("pb"))
    // bins observed by only one source are excluded (inner join) — the
    // Laplace smoothing already keeps every COMPARED bin away from zero,
    // and the oracle applies the identical convention
    pa.join(pb, Seq("bin"))
      .agg(round(sum((col("pa") - col("pb")) * log(col("pa") / col("pb"))), 6)
        .as("psi"), count(lit(1)).as("n_bins_compared"))
  }

  val psiDriftOracle: String =
    """WITH d AS (
      |  SELECT source, CAST(n_chars AS DOUBLE) AS x FROM documents
      |  WHERE source IN ('src0', 'src1')
      |), mm AS (SELECT MIN(x) AS mn, MAX(x) AS mx FROM d),
      |binned AS (
      |  SELECT source,
      |    least(CAST(FLOOR((x - mn) / (mx - mn) * 10) AS INT), 9) AS bin,
      |    COUNT(*) AS c
      |  FROM d CROSS JOIN mm GROUP BY 1, 2
      |), tot AS (SELECT source, SUM(c) AS nsrc FROM binned GROUP BY source),
      |props AS (
      |  SELECT binned.source, bin,
      |    CAST(c + 1 AS DOUBLE) / (nsrc + 10) AS p
      |  FROM binned JOIN tot ON binned.source = tot.source
      |)
      |SELECT ROUND(SUM((pa.p - pb.p) * ln(pa.p / pb.p)), 6) AS psi,
      |  COUNT(*) AS n_bins_compared
      |FROM (SELECT bin, p FROM props WHERE source = 'src0') pa
      |JOIN (SELECT bin, p FROM props WHERE source = 'src1') pb USING (bin)"""
      .stripMargin

  // --- data-quality manifest -----------------------------------------------------

  /** Deequ-style data-quality manifest over orders: completeness,
    * distinctness, conformity, and range checks as one unioned report —
    * each check is a scalar aggregate over the same single scan (Spark
    * collapses the union of aggregates into one pass per leaf), emitted as
    * (check, metric, passed).
    */
  def dataQuality(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val checks = o.agg(
      (sum(when(col("o_custkey").isNotNull, 1L).otherwise(0L)).cast("double")
        / count(lit(1))).as("completeness_custkey"),
      (count_distinct(col("o_orderkey")).cast("double") / count(lit(1)))
        .as("distinctness_orderkey"),
      (sum(when(col("o_totalprice") > 0, 1L).otherwise(0L)).cast("double")
        / count(lit(1))).as("positive_totalprice"),
      (sum(when(col("o_orderstatus").isin("F", "O", "P"), 1L).otherwise(0L))
        .cast("double") / count(lit(1))).as("status_in_set"),
      count(lit(1)).cast("double").as("row_count"))
    checks.select(
      explode(map(
        lit("completeness_custkey"), col("completeness_custkey"),
        lit("distinctness_orderkey"), col("distinctness_orderkey"),
        lit("positive_totalprice"), col("positive_totalprice"),
        lit("status_in_set"), col("status_in_set"),
        lit("row_count"), col("row_count"))).as(Seq("check_name", "metric")))
      .select(col("check_name"), round(col("metric"), 6).as("metric"),
        (when(col("check_name") === "row_count", col("metric") > 0)
          .otherwise(col("metric") === 1.0)).as("passed"))
  }

  val dataQualityOracle: String =
    """WITH m AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |      / COUNT(*) AS completeness_custkey,
      |    CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) / COUNT(*)
      |      AS distinctness_orderkey,
      |    CAST(SUM(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS DOUBLE)
      |      / COUNT(*) AS positive_totalprice,
      |    CAST(SUM(CASE WHEN o_orderstatus IN ('F','O','P') THEN 1 ELSE 0 END)
      |      AS DOUBLE) / COUNT(*) AS status_in_set,
      |    CAST(COUNT(*) AS DOUBLE) AS row_count
      |  FROM orders
      |), u AS (
      |  SELECT 'completeness_custkey' AS check_name, completeness_custkey AS metric FROM m
      |  UNION ALL SELECT 'distinctness_orderkey', distinctness_orderkey FROM m
      |  UNION ALL SELECT 'positive_totalprice', positive_totalprice FROM m
      |  UNION ALL SELECT 'status_in_set', status_in_set FROM m
      |  UNION ALL SELECT 'row_count', row_count FROM m
      |)
      |SELECT check_name, ROUND(metric, 6) AS metric,
      |  CASE WHEN check_name = 'row_count' THEN metric > 0
      |       ELSE metric = 1.0 END AS passed
      |FROM u""".stripMargin

  // --- skyline (Pareto frontier) ---------------------------------------------------

  /** Skyline of parts: the Pareto frontier maximizing p_retailprice while
    * minimizing p_size (a part is dominated if another is >= on price, <=
    * on size, and strictly better on one). Two-window formulation over
    * DISTINCT (price, size) points: per-price minimum size, then a strict
    * running-minimum sweep in descending price order. No all-pairs
    * anti-join anywhere; the distributed form pre-filters each partition's
    * local skyline before the (tiny) global sweep — the classic two-phase
    * skyline (Borzsony/Kossmann/Stocker 2001).
    */
  def skyline(s: SparkSession, dir: String): DataFrame = {
    val pts = Tables.part(s, dir)
      .select(col("p_retailprice").as("price"), col("p_size").as("size"))
      .distinct()
    // per-price minimum size (equal-price, larger-size points are dominated);
    // checkpointed so PrefixSum's size probe reuses it instead of re-scanning
    val perPrice = pts.groupBy("price").agg(min(col("size")).as("size"))
      .localCheckpoint(eager = false)
    // strict sweep: keep iff size < every size at strictly higher price —
    // the dominance prefix-min via the two-phase bucketed pass, so the
    // price histogram never collapses onto a single-partition window
    graft.operators.PrefixSum.minBeforeDesc(perPrice, "price", "size")
      .filter(col("size_minBefore").isNull || col("size") < col("size_minBefore"))
      .select(col("price"), col("size"))
  }

  val skylineOracle: String =
    """WITH pts AS (
      |  SELECT DISTINCT p_retailprice AS price, p_size AS size FROM part
      |), pp AS (SELECT price, MIN(size) AS size FROM pts GROUP BY price),
      |sweep AS (
      |  SELECT price, size, MIN(size) OVER (ORDER BY price DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS min_before
      |  FROM pp
      |)
      |SELECT price, size FROM sweep
      |WHERE min_before IS NULL OR size < min_before""".stripMargin

  // --- Kolmogorov-Smirnov -----------------------------------------------------------

  /** Two-sample KS statistic between the 'click' and 'purchase' value
    * distributions: per-value counts, cumulative ECDFs over the ordered
    * distinct values, max absolute difference. The cumulative ECDF rides
    * the two-phase [[graft.operators.PrefixSum]] (bucketed partial sums +
    * per-bucket offsets), so a continuous value domain — |histogram| ≈
    * |corpus| — never lands on a single-task global window; the integer
    * cumulative counts are identical, so the oracle's naive-window form
    * still hash-matches.
    */
  def ksStat(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("value"),
        when(col("event_type") === "click", 1L).otherwise(0L).as("ca"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("cb"))
    // read 3x (probe, totals, prefix pass) — checkpoint the histogram
    val byVal = ev.groupBy("value")
      .agg(sum("ca").as("a"), sum("cb").as("b"))
      .localCheckpoint(eager = false)
    val tot = byVal.agg(sum("a").cast("double").as("_na"),
      sum("b").cast("double").as("_nb"))
    graft.operators.PrefixSum.exclusive(byVal, "value", Seq("a", "b"))
      .crossJoin(broadcast(tot))
      .withColumn("_cda", (col("a_excl") + col("a")) / col("_na"))
      .withColumn("_cdb", (col("b_excl") + col("b")) / col("_nb"))
      .agg(round(max(abs(col("_cda") - col("_cdb"))), 6).as("ks"),
        count(lit(1)).as("n_points"))
  }

  val ksStatOracle: String =
    """WITH ev AS (
      |  SELECT value,
      |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ca,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS cb
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |), byval AS (
      |  SELECT value, SUM(ca) AS a, SUM(cb) AS b FROM ev GROUP BY value
      |), tot AS (
      |  SELECT CAST(SUM(a) AS DOUBLE) AS na, CAST(SUM(b) AS DOUBLE) AS nb
      |  FROM byval
      |), cdf AS (
      |  SELECT SUM(a) OVER (ORDER BY value
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / na AS cda,
      |    SUM(b) OVER (ORDER BY value
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / nb AS cdb
      |  FROM byval CROSS JOIN tot
      |)
      |SELECT ROUND(MAX(ABS(cda - cdb)), 6) AS ks, COUNT(*) AS n_points
      |FROM cdf""".stripMargin

  // --- weighted sampling --------------------------------------------------------

  /** Deterministic weighted sampling without replacement (Efraimidis &
    * Spirakis 2006 A-Res): each doc draws u from a hash of its id (so the
    * "randomness" is reproducible across runs and engines) and ranks by
    * ln(u)/weight — the top-k of that key is a weight-proportional sample.
    * Selection is a TakeOrderedAndProject (per-partition heaps, no global
    * sort); weights here are document lengths, the usual
    * sample-long-docs-more-often curation knob.
    */
  def weightedSample(s: SparkSession, dir: String): DataFrame = {
    val u = (expr(
      "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS DOUBLE)")
      + lit(1.0)) / lit(4294967297.0)
    Tables.documents(s, dir)
      .withColumn("_key", log(u) / col("n_chars"))
      .orderBy(col("_key").desc, col("doc_id"))
      .limit(50)
      .select(col("doc_id"), col("source"), col("n_chars"))
  }

  val weightedSampleOracle: String =
    """SELECT doc_id, source, n_chars FROM (
      |  SELECT doc_id, source, n_chars,
      |    ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
      |      AS UBIGINT) + 1.0) / 4294967297.0) / n_chars AS key
      |  FROM documents
      |)
      |ORDER BY key DESC, doc_id LIMIT 50""".stripMargin

  // --- observation metrics --------------------------------------------------------

  /** Pipeline observability via the Observation API: metrics collected ON
    * the running job (zero extra scan — the aggregates piggyback on the
    * write) and then emitted as a result row. At 100 TB this is the only
    * affordable way to account a pipeline: a second counting pass over the
    * input is a second full read.
    */
  def observeMetrics(s: SparkSession, dir: String): DataFrame = {
    val obs = new org.apache.spark.sql.Observation("doc_metrics")
    val observed = Tables.documents(s, dir)
      .observe(obs,
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        max(col("n_chars")).as("max_chars")) // DISTINCT aggs are not
        // observable (INVALID_OBSERVED_METRICS), so plain aggregates only
      .filter(col("n_chars") > 0)
    observed.write.format("noop").mode("overwrite").save()
    val row = obs.get
    import s.implicits._
    Seq((row("n_docs").asInstanceOf[Long],
      row("total_chars").asInstanceOf[Long],
      row("max_chars").asInstanceOf[Long]))
      .toDF("n_docs", "total_chars", "max_chars")
  }

  val observeMetricsOracle: String =
    """SELECT COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  MAX(n_chars) AS max_chars
      |FROM documents""".stripMargin

  // --- temperature-scaled source mixing ---------------------------------------------

  /** UniMax-style temperature-scaled source mixing (alpha = 0.7): target
    * shares proportional to n^alpha flatten the source distribution (the
    * standard LLM data-mixing knob), allocated to an integer budget of
    * 10000 samples by largest-remainder apportionment with a deterministic
    * source-name tiebreak. One tiny per-source aggregate; nothing scales
    * with corpus size except the first groupBy.
    */
  def temperatureMix(s: SparkSession, dir: String): DataFrame = {
    val bySource = Tables.documents(s, dir)
      .groupBy("source").agg(count(lit(1)).as("n"))
    val tot = bySource.agg(
      sum(pow(col("n").cast("double"), 0.7)).as("_z"))
    // _exact is rounded to 6 dp BEFORE the floor: the parallel-summed z
    // carries ulp-level jitter, and when a share lands exactly on an
    // integer boundary (uniform corpora) a raw floor() flips
    // nondeterministically run-to-run (observed at sf0.001: 500 +- 1 ulp).
    // Rounding first puts the decision 6 orders of magnitude away from
    // the noise, identically on both engines.
    val scored = bySource.crossJoin(broadcast(tot))
      .withColumn("_share", pow(col("n").cast("double"), 0.7) / col("_z"))
      .withColumn("_exact", round(col("_share") * 10000.0, 6))
      .withColumn("base", floor(col("_exact")).cast("bigint"))
      .withColumn("_frac", col("_exact") - col("base"))
    val leftW = org.apache.spark.sql.expressions.Window
      .orderBy(col("_frac").desc, col("source"))
    val totBase = scored.agg(sum("base").as("_tb"))
    scored.crossJoin(broadcast(totBase))
      .withColumn("_rk", row_number().over(leftW))
      .withColumn("target",
        col("base") + when(col("_rk") <= lit(10000) - col("_tb"), 1L)
          .otherwise(0L))
      .select(col("source"), col("n"), round(col("_share"), 6).as("share"),
        col("target"))
  }

  val temperatureMixOracle: String =
    """WITH bys AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
      |tot AS (SELECT SUM(POWER(CAST(n AS DOUBLE), 0.7)) AS z FROM bys),
      |scored AS (
      |  SELECT source, n,
      |    POWER(CAST(n AS DOUBLE), 0.7) / z AS share,
      |    FLOOR(ROUND(POWER(CAST(n AS DOUBLE), 0.7) / z * 10000.0, 6)) AS base,
      |    ROUND(POWER(CAST(n AS DOUBLE), 0.7) / z * 10000.0, 6)
      |      - FLOOR(ROUND(POWER(CAST(n AS DOUBLE), 0.7) / z * 10000.0, 6))
      |      AS frac
      |  FROM bys CROSS JOIN tot
      |), tb AS (SELECT SUM(base) AS total_base FROM scored)
      |SELECT source, n, ROUND(share, 6) AS share,
      |  CAST(base + CASE WHEN row_number() OVER (ORDER BY frac DESC, source)
      |    <= 10000 - total_base THEN 1 ELSE 0 END AS BIGINT) AS target
      |FROM scored CROSS JOIN tb""".stripMargin

  // --- incremental aggregate maintenance ----------------------------------------------

  /** Incremental aggregate maintenance: a precomputed per-type state (rows
    * before the temporal midpoint) merged with a new-batch delta (rows
    * after) via the aggregate merge algebra — counts add, exact DECIMAL
    * sums add, mins/maxes combine through least/greatest with null
    * handling. The output is proven equal to a from-scratch recompute by
    * the oracle, which IS the full recompute: the contract that lets a
    * 100 TB pipeline update aggregates from the new partition alone
    * instead of rescanning history.
    */
  def incrementalAgg(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val mm = ev.agg(((min(col("ts_us")) + max(col("ts_us"))) / 2)
      .cast("long").as("_cut"))
    val tagged = ev.crossJoin(broadcast(mm))
    def aggSide(cond: org.apache.spark.sql.Column) = tagged.filter(cond)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).as("s"),
        min(col("value")).as("mn"), max(col("value")).as("mx"))
    val state = aggSide(col("ts_us") < col("_cut"))
    val delta = aggSide(col("ts_us") >= col("_cut"))
    state.as("a").join(delta.as("b"), Seq("event_type"), "full_outer")
      .select(col("event_type"),
        (coalesce(col("a.n"), lit(0L)) + coalesce(col("b.n"), lit(0L))).as("n"),
        (coalesce(col("a.s"), lit(0).cast(DecimalType(18, 6)))
          + coalesce(col("b.s"), lit(0).cast(DecimalType(18, 6))))
          .cast("double").as("total"),
        least(coalesce(col("a.mn"), col("b.mn")),
          coalesce(col("b.mn"), col("a.mn"))).as("mn"),
        greatest(coalesce(col("a.mx"), col("b.mx")),
          coalesce(col("b.mx"), col("a.mx"))).as("mx"))
  }

  /** The oracle is the FULL recompute — merged state+delta must equal it. */
  val incrementalAggOracle: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total,
      |  MIN(value) AS mn, MAX(value) AS mx
      |FROM events GROUP BY event_type""".stripMargin
}
