package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** TPC-H completion batch: full Q1 pricing summary, Q7 volume shipping,
  * Q8 market share, Q13 order-count distribution, Q15 top supplier, Q19
  * adapted (disjunctive predicates without p_container), plus the
  * binaryFile blob source. The corpus omits partsupp and the
  * comment/shipmode/phone/container columns; Q4/Q12/Q22 live in
  * [[Ext9Queries]] with adapted predicates, and the partsupp-dependent
  * Q2/Q9/Q11/Q16/Q20 live in [[Ext25Queries]] over a derived partsupp —
  * together all 22 TPC-H shapes are represented.
  */
object Ext14Queries {

  /** TPC-H Q1 (full pricing summary): the complete eight-aggregate version
    * of q1_agg — one pass, partial aggregation before the single 6-group
    * shuffle.
    */
  def tpchQ1(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double")
          .as("sum_qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double")
          .as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 6))).cast("double").as("sum_disc_price"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))).cast(DecimalType(18, 6))).cast("double")
          .as("sum_charge"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        round(avg("l_extendedprice"), 6).as("avg_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))

  val tpchQ1Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
      |    AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
      |    AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      |  ROUND(AVG(l_quantity), 6) AS avg_qty,
      |  ROUND(AVG(l_extendedprice), 6) AS avg_price,
      |  ROUND(AVG(l_discount), 6) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q7 (volume shipping), generalized to the full nation-pair
    * matrix (the corpus's synthetic nation list makes any fixed pair
    * scale-factor-fragile): revenue by (supplier nation, customer nation,
    * ship year) for cross-nation flows. Six-table join; both nation dims
    * broadcast, supplier broadcast, the two fact joins shuffle once each.
    */
  def tpchQ7(s: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(18, 6))).cast("double").as("revenue"))
  }

  val tpchQ7Oracle: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
      |    AS DOUBLE) AS revenue
      |FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      |WHERE n1.n_name <> n2.n_name
      |GROUP BY 1, 2, 3""".stripMargin

  /** TPC-H Q8 (national market share): the share of ASIA-region customer
    * revenue supplied by each supplier nation, by order year — the
    * two-level aggregate (nation revenue / total revenue per year) done
    * with a window over the grouped result, not a self-join.
    */
  def tpchQ8(s: SparkSession, dir: String): DataFrame = {
    val asiaNations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nk"))
    val suppNation = Tables.nation(s, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val vol = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(asiaNations), col("c_nationkey") === col("c_nk"), "left_semi")
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).as("o_year"), col("supp_nation"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(18, 6))).as("v")) // stays DECIMAL through the window
    val w = org.apache.spark.sql.expressions.Window.partitionBy("o_year")
    vol.withColumn("share",
        col("v").cast("double") / sum(col("v")).over(w).cast("double"))
      .select(col("o_year"), col("supp_nation"),
        col("v").cast("double").as("volume"), round(col("share"), 6).as("mkt_share"))
  }

  val tpchQ8Oracle: String =
    """WITH vol AS (
      |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
      |    ns.n_name AS supp_nation,
      |    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS v
      |  FROM lineitem l
      |    JOIN orders o ON l.l_orderkey = o.o_orderkey
      |    JOIN customer c ON o.o_custkey = c.c_custkey
      |    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
      |    JOIN region r ON nc.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
      |    JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
      |  GROUP BY 1, 2
      |)
      |SELECT o_year, supp_nation, CAST(v AS DOUBLE) AS volume,
      |  ROUND(CAST(v AS DOUBLE)
      |    / CAST(SUM(v) OVER (PARTITION BY o_year) AS DOUBLE), 6) AS mkt_share
      |FROM vol""".stripMargin

  /** TPC-H Q13 (customer order-count distribution): LEFT join so
    * zero-order customers count, two-level aggregate — the canonical
    * "distribution of a grouped count" shape.
    */
  def tpchQ13(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.customer(s, dir)
      .join(Tables.orders(s, dir),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  val tpchQ13Oracle: String =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey
      |)
      |GROUP BY c_count""".stripMargin

  /** TPC-H Q15 (top supplier): quarterly revenue per supplier, suppliers
    * achieving the maximum — the max is a 1-row aggregate broadcast back,
    * exactly the view + subquery of the spec without recomputing revenue.
    */
  def tpchQ15(s: SparkSession, dir: String): DataFrame = {
    val revenue = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(18, 6))).cast("double").as("total_revenue"))
    val mx = revenue.agg(max(col("total_revenue")).as("_mx"))
    revenue.crossJoin(broadcast(mx))
      .filter(col("total_revenue") === col("_mx"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("supplier_no") === col("s_suppkey"))
      .select(col("supplier_no"), col("s_name"), col("total_revenue"))
  }

  val tpchQ15Oracle: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
      |      AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-04-01'
      |  GROUP BY l_suppkey
      |)
      |SELECT supplier_no, s_name, total_revenue
      |FROM revenue JOIN supplier ON supplier_no = s_suppkey
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)""".stripMargin

  /** TPC-H Q19 (discounted revenue, adapted: the corpus has no
    * p_container, so each disjunct pairs brand + size band + quantity
    * band): the point of the query is a DISJUNCTIVE join predicate that
    * still plans as a broadcast equi-join on partkey with the OR residual
    * as a post-join filter — not a nested loop.
    */
  def tpchQ19(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir).select("p_partkey", "p_brand", "p_size")
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15)
          && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 25)
          && col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 50)
          && col("l_quantity").between(20, 30)))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(18, 6))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val tpchQ19Oracle: String =
    """SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
      |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
      |    AND l_quantity BETWEEN 1 AND 11)
      |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
      |    AND l_quantity BETWEEN 10 AND 20)
      |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50
      |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  // --- binaryFile source ------------------------------------------------------------

  /** Staged binary landing zone: the first 100 docs written as UTF-8 .bin
    * files, once per JVM — a fixture for the binaryFile-source claim, not
    * the behavior under measurement (same convention as
    * Ext6Queries.ensureStaged). Memoized via
    * [[graft.streaming.StagedDirs]] so a reaped copy re-stages on its
    * exact-file-count revalidation instead of reading a partial file set.
    */
  private def ensureBinStaged(s: SparkSession, dir: String): String =
    graft.streaming.StagedDirs.getOrStage(s"bin|$dir") {
      val staged = graft.util.TempDirs.create("graft-bin")
      Tables.documents(s, dir).filter(col("doc_id") < 100)
        .select("doc_id", "text").collect().foreach { r =>
          java.nio.file.Files.write(
            staged.resolve(f"doc_${r.getLong(0)}%05d.bin"),
            r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      staged.toString
    }

  /** `binaryFile` source scan — the ingestion shape for raw media/blob
    * corpora (each file one row: path, length, binary content). The query
    * parses ids out of file paths and digests the payloads; the oracle
    * recomputes the digests from the documents table, proving a lossless
    * bytes round trip. At 100 TB this source partitions by file and prunes
    * with pathGlobFilter/modifiedAfter predicates.
    */
  def binarySource(s: SparkSession, dir: String): DataFrame =
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin")
      .load(ensureBinStaged(s, dir))
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1)
          .cast("bigint").as("doc_id"),
        col("length").as("n_bytes"),
        md5(col("content")).as("content_md5"))

  val binarySourceOracle: String =
    """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
      |  md5(text) AS content_md5
      |FROM documents WHERE doc_id < 100""".stripMargin
}
