package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.queries.Ext7Queries

class Ext7Spec extends SparkTestBase with AdaptiveSparkPlanHelper {

  private val sf = "/root/testdata/sf0.001"

  test("pii redact removes every synthesized email and phone") {
    val out = Ext7Queries.piiRedact(spark, sf)
    val leaked = out.filter(
      col("clean").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+") ||
      col("clean").rlike("\\+1-555-[0-9]{4}")).count()
    assert(leaked == 0, "unredacted PII survived")
    // every doc got exactly one of each planted marker
    assert(out.filter(col("n_emails") =!= 1 || col("n_phones") =!= 1).count() == 0)
    assert(out.filter(!col("clean").contains("<EMAIL>") ||
      !col("clean").contains("<PHONE>")).count() == 0)
  }

  test("pii redact is a pure projection — no shuffle in the plan") {
    val plan = Ext7Queries.piiRedact(spark, sf).queryExecution.executedPlan
    val shuffles = collectWithSubqueries(plan) { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty, s"redaction must not shuffle:\n$plan")
  }

  test("url domains recovers one host per source and all languages") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val out = Ext7Queries.urlDomains(spark, sf).collect()
    val nSources = docs.select("source").distinct().count()
    assert(out.length == nSources)
    assert(out.forall(_.getString(0).endsWith(".example.com")))
    val nDocs = out.map(_.getLong(1)).sum
    assert(nDocs == docs.count())
  }

  test("dup spans only reports spans truly present in >=2 docs") {
    val spans = Ext7Queries.dupSpans(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf)
    spans.take(3).foreach { r =>
      val span = r.getString(0)
      val n = docs.filter(col("text").contains(span)).count()
      assert(n >= r.getLong(1),
        s"span '$span' claimed in ${r.getLong(1)} docs, contains() finds $n")
    }
    // ordered by frequency, descending
    val freqs = spans.map(_.getLong(1))
    assert(freqs.sameElements(freqs.sortBy(-_)))
  }

  test("embed quantize error is bounded by the quantization step") {
    val out = Ext7Queries.embedQuantize(spark, sf)
    // per-element |err| <= 0.5/scale, so mse <= 0.25/scale^2
    val bad = out.filter(col("mse") > lit(0.25) / (col("scale") * col("scale")) * 1.0000001)
      .count()
    assert(bad == 0, "reconstruction error exceeds the quantization bound")
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    assert(out.count() == n)
    // at least the max element of each vector saturates to +/-127
    assert(out.filter(col("n_sat") < 1).count() == 0)
  }

  test("csv and json round trips preserve the aggregate exactly") {
    val parquetAgg = graft.sources.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val csvAgg = Ext7Queries.csvRoundtrip(spark, sf)
      .select("event_type", "n", "sum_value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(csvAgg == parquetAgg)
    val jsonAgg = Ext7Queries.jsonRoundtrip(spark, sf)
      .select("event_type", "n", "sum_value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(jsonAgg == parquetAgg)
  }

  test("decontaminate only flags train docs, with real eval-span overlap") {
    val out = Ext7Queries.decontaminate(spark, sf).collect()
    // no eval doc may appear in the output
    assert(out.forall(_.getLong(0) % 100 != 0))
    // spot-check: a flagged doc genuinely shares an 8-gram with SOME eval doc
    out.headOption.foreach { r =>
      val docs = graft.sources.Tables.documents(spark, sf)
      val spansOf = (cond: org.apache.spark.sql.Column) =>
        graft.operators.Dedup.shinglePostings(docs.filter(cond), "doc_id", "text", 8)
          .select("shingle")
      val overlap = spansOf(col("doc_id") === r.getLong(0))
        .intersect(spansOf(col("doc_id") % 100 === 0)).count()
      assert(overlap == r.getLong(1))
    }
  }

  test("stratified sample applies the per-language rate deterministically") {
    val out = Ext7Queries.stratifiedSample(spark, sf).collect()
    out.foreach { r =>
      val rate = r.getInt(2)
      assert(rate >= 10 && rate <= 50 && rate % 10 == 0)
    }
    // deterministic: a second run yields the identical sample
    val again = Ext7Queries.stratifiedSample(spark, sf).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSet ==
      again.map(r => (r.getString(0), r.getLong(1))).toSet)
  }

  test("pii redaction is idempotent: a second pass changes nothing") {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\+1-555-[0-9]{4}"
    val once = Ext7Queries.piiRedact(spark, sf).select("doc_id", "clean")
    val twice = once.select(col("doc_id"),
      regexp_replace(regexp_replace(col("clean"), emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>").as("clean"))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("stratified sample is a strict per-stratum subset of the corpus") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Ext7Queries.stratifiedSample(spark, sf).collect().foreach { r =>
      val (lang, n, rate) = (r.getString(0), r.getLong(1), r.getInt(2))
      assert(n <= perLang(lang), s"$lang sampled more than exists")
      // md5 prefixes are uniform: expect rate% +/- wide slack on tiny strata
      val expected = perLang(lang) * rate / 100.0
      assert(n <= expected * 3 + 10 && n >= expected / 3 - 10,
        s"$lang: sampled $n, expected ~$expected at $rate%")
    }
  }

  test("observe() reports pipeline invariants without a second action") {
    // production observability: row counts and null-rate ride along with the
    // real action instead of a separate count() re-execution
    val obs = org.apache.spark.sql.Observation("ingest_metrics")
    val observed = graft.sources.Tables.events(spark, sf)
      .observe(obs,
        count(lit(1)).as("rows"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("null_values"),
        max("ts_us").as("max_ts"))
    observed.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("rows") == observed.count())
    assert(m("null_values") == 0L)
    assert(m("max_ts").asInstanceOf[Long] > 0L)
  }

  test("stream-static join drains to the same totals as the batch join") {
    val streamed = Ext7Queries.streamStatic(spark, sf)
      .agg(sum("n")).collect()(0).getLong(0)
    val batch = graft.sources.Tables.events(spark, sf)
      .join(graft.sources.Tables.customer(spark, sf)
        .select(col("c_custkey").as("user_id")), Seq("user_id"))
      .count()
    assert(streamed == batch)
  }
}
