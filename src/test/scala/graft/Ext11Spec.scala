package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{RuntimeFilters, TextAnalysis}
import graft.queries.Ext11Queries

class Ext11Spec extends SparkTestBase {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // --- NFC normalization ------------------------------------------------------

  test("nfc_normalize composes combining sequences and is identity on ASCII") {
    val decomposed = "e\u0301clair" // e + COMBINING ACUTE ACCENT
    val composed = "\u00e9clair"    // precomposed LATIN SMALL LETTER E WITH ACUTE
    val out = Seq(decomposed, composed, "plain ascii").toDF("s")
      .select(TextFunctions.nfc_normalize(col("s")).as("n"))
      .as[String].collect()
    assert(out(0) == composed)
    assert(out(1) == composed)
    assert(out(2) == "plain ascii")
  }

  test("nfc_normalize: interpreted eval matches the codegen column path, " +
      "nulls pass through") {
    val decomposed = "cafe\u0301"
    val composed = "caf\u00e9"
    val viaExpr = graft.functions.NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(decomposed)))
      .eval(null).toString
    val viaCol = Seq(Some(decomposed), None).toDF("s")
      .select(TextFunctions.nfc_normalize(col("s")).as("n"))
      .as[Option[String]].collect()
    assert(viaExpr == composed)
    assert(viaCol(0).contains(composed))
    assert(viaCol(1).isEmpty)
  }

  test("normalize-dedup collapses every perturbed double to its original") {
    val out = Ext11Queries.normalizeDedup(spark, sf)
    val docs = graft.sources.Tables.documents(spark, sf).count()
    // every group has exactly the original + its perturbed copy, canonical
    // id is the original (min), and no cross-doc collapse happened
    assert(out.count() == docs)
    assert(out.filter(col("n_docs") =!= 2).count() == 0)
    assert(out.filter(col("canonical_id") >= 1000000L).count() == 0)
  }

  // --- unigram LM -------------------------------------------------------------

  test("unigram LM: hand-computed scores on a 3-doc corpus") {
    val docs = Seq((1L, "a a b"), (2L, "a b"), (3L, "c")).toDF("id", "text")
    val out = TextAnalysis.unigramLmScores(docs, "id", "text")
      .orderBy("doc_id").collect()
    // corpus: a=3, b=2, c=1, N=6
    val (pa, pb, pc) = (3.0 / 6, 2.0 / 6, 1.0 / 6)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(0).getLong(1) == 3)
    assert(out(0).getDouble(2) == r6((2 * math.log(pa) + math.log(pb)) / 3))
    assert(out(1).getDouble(2) == r6((math.log(pa) + math.log(pb)) / 2))
    assert(out(2).getDouble(2) == r6(math.log(pc)))
  }

  test("unigram LM: shuffle-model fallback matches the broadcast path") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val a = TextAnalysis.unigramLmScores(docs, "doc_id", "text",
      broadcastModel = true)
    val b = TextAnalysis.unigramLmScores(docs, "doc_id", "text",
      broadcastModel = false)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  // --- chunking ---------------------------------------------------------------

  test("chunking: windows tile with stride overlap, cover every token, " +
      "and stop at the first window reaching end-of-document") {
    val docs = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")), // 100 toks -> 3 chunks
      (2L, "only three tokens"),                       // 3 toks  -> 1 chunk
      (3L, (1 to 64).map(i => s"u$i").mkString(" ")),  // n == size -> 1 chunk
      (4L, (1 to 130).map(i => s"v$i").mkString(" "))  // tail chunk of 34
    ).toDF("id", "text")
    val out = TextAnalysis.chunkTokens(docs, "id", "text", size = 64, stride = 32)
      .orderBy("doc_id", "chunk_idx").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    // round-13 contained-tail fix: the old bound also emitted (96, 4),
    // a strict subset of the chunk starting at 64 — duplicated text
    assert(d1.map(_.getInt(1)).toSeq == Seq(0, 1, 2))
    assert(d1.map(_.getLong(2)).toSeq == Seq(0L, 32L, 64L))
    assert(d1.map(_.getLong(3)).toSeq == Seq(64L, 64L, 36L))
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getLong(3) == 3L)
    val d3 = out.filter(_.getLong(0) == 3L)
    assert(d3.map(_.getLong(3)).toSeq == Seq(64L))
    val d4 = out.filter(_.getLong(0) == 4L)
    assert(d4.map(_.getLong(2)).toSeq == Seq(0L, 32L, 64L, 96L))
    assert(d4.map(_.getLong(3)).toSeq == Seq(64L, 64L, 64L, 34L))
  }

  test("round-14: degenerate chunking/packing parameters throw at call " +
      "time, not as sequence-step-0 / divide-by-zero inside a job") {
    val docs = Seq((1L, "a b c")).toDF("id", "text")
    intercept[IllegalArgumentException](
      TextAnalysis.chunkTokens(docs, "id", "text", size = 64, stride = 0))
    intercept[IllegalArgumentException](
      TextAnalysis.chunkTokens(docs, "id", "text", size = 8, stride = 16))
    intercept[IllegalArgumentException](
      TextAnalysis.packSequences(docs, "id", "text", budget = 0))
    intercept[IllegalArgumentException](
      TextAnalysis.packSequences(docs, "id", "text", shards = 0))
    intercept[IllegalArgumentException](
      graft.operators.Multimodal.sampleFrames(docs.toDF(), frameBytes = 0))
    intercept[IllegalArgumentException](
      graft.operators.Multimodal.resizePlan(docs.toDF(), maxEdge = 0))
  }

  test("chunking is shuffle-free (no Exchange in the physical plan)") {
    val plan = Ext11Queries.docChunks(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  // --- mixture rebalance / schema evolution -----------------------------------

  test("source balance keeps exactly floor(0.6*min) docs per source and the " +
      "selection is repartition-stable") {
    val out = Ext11Queries.sourceBalance(spark, sf)
    val docs = graft.sources.Tables.documents(spark, sf)
    val minN = docs.groupBy("source").count()
      .agg(min("count")).head().getLong(0)
    val tgt = math.floor(minN * 0.6).toLong
    val perSource = out.groupBy("source").count().collect()
    assert(perSource.nonEmpty && perSource.forall(_.getLong(1) == tgt))
    // deterministic selection: the kept id set ignores physical layout
    val again = Ext11Queries.sourceBalance(
      spark, sf) // fresh plan over a repartitioned scan
    val a = out.select("doc_id").as[Long].collect().toSet
    val b = again.select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("schema evolution: merged read sees both generations, user_id only " +
      "from the new one") {
    val out = Ext11Queries.schemaEvolution(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) % 2 == 0, "every event appears in both generations")
      assert(r.getLong(2) == r.getLong(1) / 2, "user_id counted only from v=2")
      assert(r.getLong(3) == 2L)
    }
  }

  // --- bloom runtime filter ---------------------------------------------------

  test("bloom might-contain has no false negatives; semi-join stays exact") {
    val build = (1 to 500).filter(_ % 7 == 0).map(_.toLong).toDF("k")
    val probe = (1 to 500).map(_.toLong).toDF("k")
    val bloomed = probe.filter(
      RuntimeFilters.bloomMightContain(build, "k", col("k"), 1L << 12))
    // every true member survives the bloom pass (no false negatives)
    assert(bloomed.join(build, Seq("k"), "left_semi").count() == build.count())
    // and the exact wrapper equals a plain semi-join
    val viaBloom = RuntimeFilters.bloomSemiJoin(probe, build, "k", 1L << 12)
    val plain = probe.join(build.distinct(), Seq("k"), "left_semi")
    assert(viaBloom.exceptAll(plain).isEmpty && plain.exceptAll(viaBloom).isEmpty)
  }

  // --- sequence packing -------------------------------------------------------

  test("packing conserves docs/tokens, fills bins within one-doc overrun, " +
      "and bin ids are dense per shard") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val budget = 512
    val out = TextAnalysis.packSequences(docs, "doc_id", "text",
      budget = budget, shards = 32).collect()
    // conservation: every doc and every token lands in exactly one bin
    val totalDocs = docs.count()
    val totalToks = docs
      .agg(sum(TextAnalysis.tokenCount(col("text")))).head().getLong(0)
    assert(out.map(_.getLong(2)).sum == totalDocs)
    assert(out.map(_.getLong(3)).sum == totalToks)
    // greedy contiguous fill: only a shard's LAST bin may be under-full,
    // and no bin overruns by more than one max doc length
    val maxDoc = docs
      .agg(max(TextAnalysis.tokenCount(col("text")))).head().getInt(0)
    out.groupBy(_.getInt(0)).foreach { case (_, bins) =>
      val sorted = bins.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == sorted.indices.toSeq) // dense
      sorted.dropRight(1).foreach { b =>
        assert(b.getLong(3) >= budget - maxDoc && b.getLong(3) < budget + maxDoc,
          s"bin fill ${b.getLong(3)} out of band")
      }
    }
  }

  test("packing shards string ids by hash instead of collapsing to one " +
      "null shard") {
    // pre-fix: pmod(string_id, 32) implicitly cast the id to double (NULL),
    // every doc landed in shard = null and the window sort ran in ONE task
    val docs = (1 to 200)
      .map(i => (s"doc-$i", (1 to (i % 40 + 1)).map(t => s"w$t").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.packSequences(docs, "doc_id", "text",
      budget = 64, shards = 8).collect()
    assert(out.forall(!_.isNullAt(0)), "null shard leaked through")
    assert(out.map(_.getInt(0)).distinct.length > 1, "all docs in one shard")
    assert(out.map(_.getLong(2)).sum == 200L) // every doc packed exactly once
  }

  test("bloom-clean equals the broadcast-semi-join decontaminate complement") {
    val clean = Ext11Queries.bloomClean(spark, sf).select("doc_id")
    val docs = graft.sources.Tables.documents(spark, sf)
    val train = docs.filter(col("doc_id") % 100 =!= 0).select("doc_id")
    val contaminated = graft.queries.Ext7Queries.decontaminate(spark, sf)
      .select(col("doc_id"))
    val expected = train.join(contaminated, Seq("doc_id"), "left_anti")
    assert(clean.exceptAll(expected).isEmpty && expected.exceptAll(clean).isEmpty)
  }
}
