package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, TextAnalysis}

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("token counts: whitespace and BPE-ish") {
    val df = Seq(("hello world foo", 3), ("one-two, three!", 2)).toDF("text", "n")
    val got = df.select(TextAnalysis.tokenCount($"text")).as[Int].collect()
    assert(got.toSeq == Seq(3, 2))
    // "one-two, three!" -> one | - | two | , | three | ! = 6 bpe-ish pieces
    val bpe = df.select(TextAnalysis.bpeishCount($"text")).as[Int].collect()
    assert(bpe.toSeq == Seq(3, 6))
  }

  test("langId discriminates real multilingual sentences") {
    val samples = Seq(
      ("the cat sat on the mat and it is happy", "en"),
      ("der hund ist nicht mit der katze auf dem sofa", "de"),
      ("el perro es grande y la casa es bonita", "es"),
      ("le chat est dans la maison pour une heure", "fr"),
      ("这 是 一 个 测试 的 句子 我 不 知道", "zh"))
    val df = samples.toDF("text", "expected")
    val wrong = df.withColumn("got", TextAnalysis.langId($"text"))
      .filter($"got" =!= $"expected").collect()
    assert(wrong.isEmpty, wrong.mkString(","))
  }

  test("langId returns und for marker-free text") {
    val got = Seq("zzz qqq xxx").toDF("text")
      .select(TextAnalysis.langId($"text")).as[String].head()
    assert(got == "und")
  }

  test("quality score is in (0,1] and penalizes garbage") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and runs far away to the hills",
      "!!!! #### $$$$ %%%% ^^^^ &&&& **** (((( ))))"
    ).toDF("text")
    val scores = df.select(TextAnalysis.qualityScore($"text")).as[Double].collect()
    assert(scores.forall(s => s > 0 && s <= 1))
    assert(scores(0) > scores(1) * 2, s"garbage not penalized: ${scores.toSeq}")
  }

  test("fingerprint: deterministic, order-sensitive, matches hand computation") {
    val fp = Seq("ab", "ba", "ab").toDF("text")
      .select(TextAnalysis.fingerprint($"text")).as[Long].collect()
    assert(fp(0) == fp(2) && fp(0) != fp(1))
    // "ab": ((0*31+97)%M)*31+98 % M = 97*31+98 = 3105
    assert(fp(0) == 3105L)
  }

  test("round-13: fingerprint folds UTF-8 BYTES (not code points) and " +
      "returns the seed 0 on empty text — pinned to the DuckDB replay") {
    // hand-verified against the rewritten oracle SQL in DuckDB:
    // 'hello' -> 99162322, 'é' -> 195*31+169 = 6214 (two UTF-8 bytes,
    // NOT one 233 code-point step), '' -> 0 (list_reduce would error)
    val got = Seq((1L, "hello"), (2L, "é"), (3L, ""))
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.fingerprint(col("text")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 99162322L, 2L -> 6214L, 3L -> 0L), s"$got")
  }

  test("multimodal: pack -> decode roundtrip is deterministic and typed") {
    val docs = Seq((1L, "hello world"), (2L, "abc"), (3L, "video payload bytes here"))
      .toDF("doc_id", "text")
    val media = Multimodal.packPayload(docs, "doc_id", "text")
    assert(media.schema("payload").dataType.typeName == "binary")
    val decoded = Multimodal.decodeFeatures(media).collect()
    assert(decoded.length == 3)
    decoded.foreach { d =>
      assert(d.width >= 64 && d.width < 512 && d.height >= 64 && d.height < 512)
      assert(d.mean_luma > 0 && d.mean_luma <= 1.0)
    }
    // kind assignment: doc_id % 3 -> 1="audio"? (id%3+1 indexes image,audio,video)
    val kinds = Multimodal.packPayload(docs, "doc_id", "text")
      .select("media_id", "kind").as[(Long, String)].collect().toMap
    assert(kinds(3L) == "image" && kinds(1L) == "audio" && kinds(2L) == "video")
  }

  test("round-13: a NULL text row packs to an EMPTY payload and survives " +
      "decode (a NULL payload killed the stage on non-nullable n_bytes)") {
    val docs = Seq((1L, Some("hello")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val decoded = Multimodal.decodeFeatures(
      Multimodal.packPayload(docs, "doc_id", "text")).collect()
    assert(decoded.length == 2)
    val nullRow = decoded.find(_.media_id == 2L).get
    assert(nullRow.n_bytes == 0L && nullRow.mean_luma == 0.0)
  }

  test("multimodal frame sampling: every 4th fixed-size frame of video payloads") {
    val docs = Seq((2L, "x" * 300)).toDF("doc_id", "text") // id%3+1=3 -> video
    val media = Multimodal.packPayload(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, stride = 4).collect()
    // 300 bytes -> frames 0..3 -> sampled idx 0 only? 300/64=4 frames (0..3), stride 4 -> idx 0
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0))
    assert(frames.head.getAs[Array[Byte]]("frame").length == 64)
  }
}
