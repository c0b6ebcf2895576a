package graft

import org.apache.spark.sql.functions._

import graft.queries.Ext32Queries
import graft.sources.Tables

/** Semantic invariants for the training-data curation tier 2 (the DuckDB
  * oracle proves value parity; these pin the definitions' shape).
  */
class Ext32Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("cluster canonical: winner is a member, kept+dropped chars account " +
    "for the whole cluster, clusters have >= 2 members") {
    val rows = Ext32Queries.clusterCanonical(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_members") >= 2, "singleton cluster leaked")
      assert(r.getAs[Long]("kept_chars") >= 0)
      assert(r.getAs[Long]("dropped_chars") >= 0)
    }
  }

  test("containment: values in [0.6, 1]; every symmetric near-dup pair " +
    "also appears as a containment pair (J >= t implies C >= t)") {
    val rows = Ext32Queries.containment(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Double]("containment")
      assert(c >= 0.6 - 1e-9 && c <= 1.0 + 1e-9, s"containment=$c")
      assert(r.getAs[Long]("sub_id") != r.getAs[Long]("super_id"))
    }
    val pairs = rows.map(r =>
      (r.getAs[Long]("sub_id"), r.getAs[Long]("super_id"))).toSet
    val jac = graft.queries.LlmQueries.ngramJaccard(spark, sf).collect()
    graft.operators.Dedup.unpersistIntermediates()
    jac.filter(_.getAs[Double]("jaccard") >= 0.6).foreach { j =>
      val (a, b) = (j.getAs[Long]("id_1"), j.getAs[Long]("id_2"))
      assert(pairs.contains((a, b)) || pairs.contains((b, a)),
        s"jaccard>=0.6 pair ($a,$b) missing from containment output")
    }
  }

  test("containment prefix filter is lossless: identical row set to the " +
    "all-pairs verifier") {
    def keyed(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("sub_id"), r.getAs[Long]("super_id"),
        r.getAs[Double]("containment"))).toSet
    val exact = keyed(Ext32Queries.containment(spark, sf).collect())
    graft.operators.Dedup.unpersistIntermediates()
    val prefix = keyed(Ext32Queries.containmentPrefix(spark, sf).collect())
    graft.operators.Dedup.unpersistIntermediates()
    assert(exact == prefix,
      s"prefix filter lost/invented pairs: ${exact.diff(prefix)} / " +
        s"${prefix.diff(exact)}")
    assert(exact.nonEmpty)
  }

  test("boilerplate: share in [0.3, 1], common <= total shingles") {
    val rows = Ext32Queries.boilerplate(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_shingles")
      val c = r.getAs[Long]("common_shingles")
      val s = r.getAs[Double]("boilerplate_share")
      assert(c <= n)
      assert(s >= 0.3 - 1e-9 && s <= 1.0 + 1e-9, s"share=$s")
    }
  }

  test("lexical diversity: ratios in (0, 1], every lang counted") {
    val rows = Ext32Queries.lexicalDiversity(spark, sf).collect()
    assert(rows.nonEmpty)
    val langs = Tables.documents(spark, sf).select("lang").distinct().count()
    assert(rows.length == langs)
    rows.foreach { r =>
      val ttr = r.getAs[Double]("avg_ttr")
      val hap = r.getAs[Double]("avg_hapax_share")
      assert(ttr > 0 && ttr <= 1.0 + 1e-9, s"ttr=$ttr")
      assert(hap >= 0 && hap <= 1.0 + 1e-9, s"hapax=$hap")
    }
  }

  test("woe/iv: counts partition the customers; iv_term sign matches woe " +
    "sign (both factors share it)") {
    val rows = Ext32Queries.woeIv(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = Tables.customer(spark, sf).count()
    assert(rows.map(r => r.getAs[Long]("goods") + r.getAs[Long]("bads")).sum
      == total)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("woe"))) {
        val woe = r.getAs[Double]("woe")
        val iv = r.getAs[Double]("iv_term")
        assert(iv >= -1e-9, s"iv_term must be non-negative, got $iv (woe=$woe)")
      }
    }
  }

  test("clustering coeff: in [0, 1]; triangles bounded by possible pairs; " +
    "node count matches the graph") {
    val rows = Ext32Queries.clusteringCoeff(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val deg = r.getAs[Long]("degree")
      val tri = r.getAs[Long]("triangles")
      assert(tri <= deg * (deg - 1) / 2, "more triangles than wedge pairs")
      if (!r.isNullAt(r.fieldIndex("coeff"))) {
        val c = r.getAs[Double]("coeff")
        assert(c >= 0 && c <= 1.0 + 1e-9, s"coeff=$c")
      }
    }
  }
}
