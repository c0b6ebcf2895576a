package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-6 extension batch 7: retrieval scoring + dataset-split operators —
  * the pieces between a cleaned corpus and a training run: BM25 relevance
  * (the lexical-retrieval standard the TF-IDF tier stops short of),
  * ECDF/percentile-rank normalization, deterministic k-fold assignment, and
  * the leakage-safe GROUP-aware split (every event of a user lands in
  * exactly one of train/val/test — the invariant a row-wise random split
  * silently violates).
  *
  * Reference anchor: the reference feeds its indicator table to downstream
  * consumers with no notion of evaluation hygiene (`dags/spark_job_1.py`);
  * these are the operators that make the same data usable for model work.
  * All split assignment reuses the md5-prefix hash convention of
  * `q_hash_sample` (bit-for-bit identical in Spark and DuckDB, stable under
  * re-partitioning — the property a 100 TB re-run needs).
  */
object Ext26Queries {

  /** Spark-side md5-prefix bucket of a BIGINT key: hex prefix → int in
    * [0, mod). Pure function of the key — no RNG, no partition order.
    */
  private def hashBucket(keyCol: String, mod: Int) =
    expr(s"CAST(conv(substring(md5(CAST($keyCol AS STRING)), 1, 4), 16, 10) AS BIGINT) % $mod")

  private def hashBucketSql(keyCol: String, mod: Int): String =
    s"CAST('0x' || substr(md5(CAST($keyCol AS VARCHAR)), 1, 4) AS UBIGINT) % $mod"

  // --- BM25 -------------------------------------------------------------------

  /** Okapi BM25 (k1 = 1.2, b = 0.75) of every document against the query
    * {merge, stream, window}: idf = ln((N − df + 0.5)/(df + 0.5) + 1) with
    * tf saturation and length normalization against the corpus-average
    * doclen. One explode feeds both the per-doc length aggregate and the
    * query-term tf aggregate (the term filter prunes the tf side before its
    * shuffle); df falls out of tf with a tiny per-term aggregate that
    * broadcasts back. At 100 TB the only wide exchanges are the two
    * doc-keyed hash aggregates and the final doc-keyed join — both on the
    * same key, so AQE reuses the partitioning. The floating-point formula
    * is written with identical association on both sides so Spark and
    * DuckDB produce the same doubles before the round(6).
    */
  def bm25(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val n = docs.count()
    val terms = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val totalToks = terms.count()
    val avgdl = totalToks.toDouble / n
    val doclen = terms.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val tf = terms.filter(col("term").isin("merge", "stream", "window"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("term"))
      .join(doclen, Seq("doc_id"))
      .withColumn("contrib",
        log((lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
          * (col("tf") * 2.2)
          / (col("tf") + ((col("dl") / avgdl) * 0.75 + 0.25) * 1.2))
      .groupBy("doc_id")
      .agg(round(sum(col("contrib")), 6).as("bm25"),
        count(lit(1)).as("n_terms"))
  }

  val bm25Oracle: String =
    """WITH terms AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
      |), nz AS (SELECT doc_id, term FROM terms WHERE term <> ''),
      |stats AS (
      |  SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS n,
      |    (SELECT CAST(COUNT(*) AS DOUBLE) FROM nz)
      |      / (SELECT COUNT(*) FROM documents) AS avgdl
      |), doclen AS (
      |  SELECT doc_id, COUNT(*) AS dl FROM nz GROUP BY 1
      |), tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf FROM nz
      |  WHERE term IN ('merge', 'stream', 'window') GROUP BY 1, 2
      |), df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1)
      |SELECT tf.doc_id,
      |  ROUND(SUM(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
      |    * (tf.tf * 2.2)
      |    / (tf.tf + 1.2 * (0.25 + 0.75 * (doclen.dl / stats.avgdl)))), 6)
      |    AS bm25,
      |  CAST(COUNT(*) AS BIGINT) AS n_terms
      |FROM tf
      |  JOIN df USING (term)
      |  JOIN doclen USING (doc_id)
      |  CROSS JOIN stats
      |GROUP BY tf.doc_id""".stripMargin

  // --- ECDF / percentile-rank normalization ----------------------------------

  /** ECDF (percentile-rank) normalization of event values per type,
    * verified through its decile profile: cume_dist over value, bucketed to
    * 10 bins with the exact bin populations and value ranges. The rank
    * transform is the heavy-tail-robust normalization for model features
    * (vs z-scores that one whale event distorts); the decile histogram
    * proves near-uniformity — the property the transform exists to provide.
    * One sort-based window per type partition, then a partial-aggregable
    * count — at 100 TB the sort is the cost, identical to any ranked
    * window.
    */
  def ecdf(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("value")
    Tables.events(s, dir)
      .select(col("event_type"), col("value"))
      .withColumn("cd", cume_dist().over(w))
      .withColumn("decile",
        least(floor(col("cd") * 10), lit(9)).cast("int"))
      .groupBy("event_type", "decile")
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("lo"), max(col("value")).as("hi"))
  }

  val ecdfOracle: String =
    """SELECT event_type,
      |  CAST(LEAST(FLOOR(cd * 10), 9) AS INT) AS decile,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  MIN(value) AS lo, MAX(value) AS hi
      |FROM (
      |  SELECT event_type, value,
      |    cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS cd
      |  FROM events
      |)
      |GROUP BY 1, 2""".stripMargin

  // --- deterministic k-fold assignment ---------------------------------------

  /** 5-fold cross-validation assignment by key hash, audited per fold ×
    * language: fold membership is a pure function of doc_id, so any
    * executor, any round, any scale reproduces the identical folds — the
    * alternative (rand() with a seed) changes with partitioning. The
    * per-fold language counts and mean length are the stratification
    * diagnostic: hash folds are unstratified by construction, and this is
    * the query that quantifies how close to stratified they land.
    */
  def cvFolds(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("fold", hashBucket("doc_id", 5).cast("int"))
      .groupBy("fold", "lang")
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 6).as("avg_chars"))

  val cvFoldsOracle: String =
    s"""SELECT CAST(${hashBucketSql("doc_id", 5)} AS INT) AS fold, lang,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  ROUND(AVG(n_chars), 6) AS avg_chars
       |FROM documents
       |GROUP BY 1, 2""".stripMargin

  // --- group-aware (leakage-safe) train/val/test split -----------------------

  /** Group-aware 80/10/10 split on events: the UNIT of assignment is the
    * user, not the row — hash the user key into 10 buckets, map buckets to
    * splits, and every event of a user lands in exactly one split (the
    * GroupKFold invariant; a row-level split leaks a user's behavior
    * across train and test). The audit aggregate reports per-split event
    * and user counts — the total distinct-user sum equaling the corpus
    * distinct-user count IS the no-leakage proof (a user in two splits
    * would double-count). Assignment is a projection (no shuffle); only
    * the audit aggregates.
    */
  def groupSplit(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("_b", hashBucket("user_id", 10))
      .withColumn("split",
        when(col("_b") < 8, "train").when(col("_b") === 8, "val")
          .otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_type")).as("n_types"),
        min(col("event_id")).as("min_event"))

  val groupSplitOracle: String =
    s"""SELECT CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val'
       |    ELSE 'test' END AS split,
       |  CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
       |  MIN(event_id) AS min_event
       |FROM (SELECT *, ${hashBucketSql("user_id", 10)} AS b FROM events)
       |GROUP BY 1""".stripMargin
}
