package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.9f, 0.1f)),
    (4L, Array(0.0f, 0.0f, 1.0f)),
    (5L, Array(0.577f, 0.577f, 0.577f))
  ).toDF("vec_id", "embedding")

  test("cosine: hand-computed values") {
    val out = vecs.as("a").join(vecs.as("b"),
        col("a.vec_id") === 0 && col("b.vec_id") === 2)
      .select(Similarity.cosine(col("a.embedding"), col("b.embedding")))
      .as[Double].head()
    assert(math.abs(out) < 1e-12) // orthogonal
    val self = vecs.filter($"vec_id" === 5)
      .select(Similarity.cosine(col("embedding"), col("embedding")))
      .as[Double].head()
    assert(math.abs(self - 1.0) < 1e-12)
  }

  test("bruteForceTopK: nearest neighbor of 0 is 1, k respected, self excluded") {
    val top = Similarity.bruteForceTopK(vecs.filter($"vec_id" === 0), vecs,
      "vec_id", "embedding", k = 2).collect()
    assert(top.length == 2)
    assert(top.map(_.getLong(1)).head == 1L)
    assert(!top.map(_.getLong(1)).contains(0L))
  }

  test("IVF with all-vectors-as-centroids equals brute force") {
    val brute = Similarity.bruteForceTopK(vecs, vecs, "vec_id", "embedding", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(vecs, vecs, vecs, "vec_id", "embedding",
        k = 2, nprobe = vecs.count().toInt)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf == brute)
  }

  test("IVF results are a subset of brute-force with identical scores") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter($"vec_id" < 5)
    val brute = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = Similarity.ivfTopK(queries, emb, emb.filter($"vec_id" < 10),
      "vec_id", "embedding", k = 3, nprobe = 2).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach(b => assert(math.abs(b - r.getDouble(2)) < 1e-12))
    }
  }

  test("cosineNearDup is symmetric-free (id_1 < id_2) and respects threshold") {
    val pairs = Similarity.cosineNearDup(vecs, "vec_id", "embedding", 0.9).collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(_.getDouble(2) >= 0.9))
    val ids = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ids.contains((0L, 1L)) && ids.contains((2L, 3L)))
  }

  test("lshNearDup: subset of exact output, near-identical vectors always collide") {
    val exact = Similarity.cosineNearDup(vecs, "vec_id", "embedding", 0.9)
      .select("id_1", "id_2").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshNearDup(vecs, "vec_id", "embedding", 0.9,
        bands = 4, bitsPerBand = 2)
      .select("id_1", "id_2").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), s"LSH produced non-exact pairs: ${lsh -- exact}")
    // an identical-vector pair has P(collision) = 1 — must always be found
    val dup = Seq((10L, Array(1.0f, 2.0f, 3.0f)), (11L, Array(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val found = Similarity.lshNearDup(dup, "vec_id", "embedding", 0.99,
        bands = 4, bitsPerBand = 2)
      .select("id_1", "id_2").as[(Long, Long)].collect().toSet
    assert(found == Set((10L, 11L)))
  }

  test("hard negatives never share the query's label and rank below the " +
      "unconstrained best neighbor") {
    val sf = "/root/testdata/sf0.001"
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 10)
    val hn = Similarity.hardNegatives(queries, emb, "vec_id", "embedding",
      "label", k = 3).collect()
    assert(hn.nonEmpty)
    hn.foreach(r => assert(r.getInt(1) != r.getInt(3),
      s"neighbor shares label: $r"))
    assert(hn.groupBy(_.getLong(0)).values.forall(_.length <= 3))
    // the best cross-label score can never beat the best unconstrained score
    val best = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    hn.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getDouble(4)).max <= best(q) + 1e-12)
    }
  }

  test("label centroids: hand-computed means, singleton label = its vector") {
    val vecs = Seq(
      (1L, Array(1.0f, 3.0f), 0),
      (2L, Array(3.0f, 5.0f), 0),
      (3L, Array(7.0f, 9.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroids(vecs, "embedding", "label")
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(out((0, 1)) == (2.0, 2L) && out((0, 2)) == (4.0, 2L))
    assert(out((1, 1)) == (7.0, 1L) && out((1, 2)) == (9.0, 1L))
  }

  test("round-13: array<double> embeddings are converted, not reinterpreted " +
      "(getFloat on a double buffer gave silently meaningless cosines)") {
    val f = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(2.0f, 4.0f)),
      (3L, Array(-1.0f, 1.0f))).toDF("vec_id", "embedding")
    val d = Seq((1L, Array(1.0, 2.0)), (2L, Array(2.0, 4.0)),
      (3L, Array(-1.0, 1.0))).toDF("vec_id", "embedding")
    def top(df: org.apache.spark.sql.DataFrame) =
      Similarity.bruteForceTopK(df, df, "vec_id", "embedding", 2)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
    val tf = top(f)
    val td = top(d)
    assert(tf.keySet == td.keySet)
    tf.foreach { case (k, v) => assert(math.abs(v - td(k)) < 1e-6,
      s"$k: float=$v double=${td(k)}") }
    assert(math.abs(tf((1L, 2L)) - 1.0) < 1e-9) // parallel vectors
  }

  test("round-13: lshNearDup's plane dimension comes from MAX vector size, " +
      "not an arbitrary first row (a short first vector collapsed all " +
      "buckets into one: O(n^2) candidates)") {
    // empty-vector row FIRST in the data: the old take(1) probe could
    // sample it and build 0-dim planes (every chunk identical)
    val vecs = Seq((0L, Array.empty[Float])) ++
      (1L to 40L).map(i => (i, Array(i.toFloat, (i % 7).toFloat,
        (i % 3).toFloat, 1.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.lshNearDup(df, "vec_id", "embedding",
      threshold = 0.999, bands = 4, bitsPerBand = 6)
    // with 4-dim planes the 24 sign bits spread the 40 vectors over many
    // buckets; 0-dim planes put all 41 in ONE bucket per band. Assert the
    // signature actually discriminates: far-apart vectors share no bucket.
    val sig = df.filter(col("vec_id").isin(1L, 40L))
    out.collect() // must run clean
    val cands = Similarity.lshNearDup(df, "vec_id", "embedding",
      threshold = -1.0, bands = 4, bitsPerBand = 6).count()
    val allPairs = 41L * 40L / 2L
    assert(cands < allPairs,
      s"bucketing degenerated to all-pairs: $cands of $allPairs")
  }

  test("round-13: labelCentroids n_members reports the mean's support " +
      "when vectors carry NULL elements or ragged lengths") {
    val vecs = Seq(
      (1L, Array[java.lang.Float](1.0f, null), 0),
      (2L, Array[java.lang.Float](3.0f, 5.0f), 0),
      (3L, Array[java.lang.Float](5.0f), 0) // ragged: no dim-2 element
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroids(vecs, "embedding", "label")
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(out((0, 1)) == (3.0, 3L)) // (1+3+5)/3, support 3
    assert(out((0, 2)) == (5.0, 1L),
      s"n_members must be the non-null support, got ${out((0, 2))}")
  }

  test("plane coefficients are deterministic and bounded") {
    val c = for (j <- 0 until 16; d <- 0 until 64) yield Similarity.planeCoef(j, d)
    assert(c.forall(v => v >= -1000 && v <= 1000))
    assert(c.toSet.size > 100) // spread, not collapsed
    assert(Similarity.planeCoef(3, 7) == Similarity.planeCoef(3, 7))
  }

  test("round-14: ArrayNulls word-scan agrees with per-element isNullAt " +
      "on UnsafeArrayData across word boundaries (layout reliance pinned)") {
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def unsafe(vals: Array[Any]): UnsafeArrayData = {
      // converter produces a real UnsafeArrayData with a packed null bitmap
      val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(Array[org.apache.spark.sql.types.DataType](
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, containsNull = true)))
      proj(org.apache.spark.sql.catalyst.InternalRow(
        new GenericArrayData(vals))).getArray(0).asInstanceOf[UnsafeArrayData]
    }
    val rnd = new scala.util.Random(7)
    for (n <- Seq(1, 3, 63, 64, 65, 128, 130); trial <- 1 to 5) {
      val vals: Array[Any] = Array.tabulate[Any](n)(i =>
        if (rnd.nextInt(20) == 0) null else i.toLong)
      val u = unsafe(vals)
      for (k <- Seq(0, 1, n / 2, n - 1, n).distinct.filter(_ >= 0)) {
        val expect = (0 until k).exists(u.isNullAt)
        assert(graft.functions.ArrayNulls.hasNull(u, k) == expect,
          s"n=$n k=$k vals=${vals.take(k).mkString(",")}")
      }
      // generic fallback agrees
      assert(graft.functions.ArrayNulls.hasNull(new GenericArrayData(vals), n)
        == vals.contains(null))
    }
  }

  test("round-14: NULL array elements null-propagate like the HOF " +
      "reference instead of being byte-reinterpreted by the typed getters") {
    import spark.implicits._
    import graft.functions.VectorFunctions._
    val holey = Seq(
      (1L, Array[java.lang.Float](1.0f, null, 3.0f)),
      (2L, Array[java.lang.Float](1.0f, 2.0f, 3.0f))
    ).toDF("vec_id", "embedding")
    def check(): Unit = {
      val a = holey.filter($"vec_id" === 1).select(
        cosine_sim(col("embedding"), col("embedding")).as("c"),
        sq_l2_distance(col("embedding"), col("embedding")).as("l2"),
        l1_distance(col("embedding"), col("embedding")).as("l1"),
        match_fraction(col("embedding").cast("array<bigint>"),
          col("embedding").cast("array<bigint>")).as("mf")).collect().head
      (0 until 4).foreach(i => assert(a.isNullAt(i),
        s"field $i must be NULL on a null-element vector, got $a"))
      // the HOF reference agrees (pin the parity, not just the nullness)
      val hof = holey.filter($"vec_id" === 1).select(
        Similarity.cosineHof(col("embedding"), col("embedding"))).collect().head
      assert(hof.isNullAt(0))
      // clean vector still scores on the same plan
      val b = holey.filter($"vec_id" === 2).select(
        cosine_sim(col("embedding"), col("embedding"))).collect().head
      assert(math.abs(b.getDouble(0) - 1.0) < 1e-12)
      // hyperplane chunks: a null element leaves every bit unset (the
      // HOF when(null >= 0) branch), same as a vector of all-negative dots
      val planes = Seq(Seq(1L, 1L, 1L), Seq(1L, -1L, 2L))
      val ch = holey.select(hyperplane_chunks(
        col("embedding").cast("array<bigint>"), planes, 2).as("ch"))
        .orderBy("vec_id")
        .collect().map(_.getSeq[Long](0))
      assert(ch(0) == Seq(0L), s"null-element vector must chunk to 0: ${ch(0)}")
      assert(ch(1) == Seq(3L), s"clean vector chunks normally: ${ch(1)}")
    }
    check() // codegen path
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try check() // interpreted path
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")

    // ColumnarArray branch: the vectorized parquet reader hands the
    // expression a column-vector-backed array (not UnsafeArrayData) —
    // the branch ArrayNulls reaches through the cached field offset
    val dir = graft.util.TempDirs.create("graft-nullvec").toString
    holey.write.mode("overwrite").parquet(dir)
    val fromParquet = spark.read.parquet(dir)
    val rows = fromParquet.select(col("vec_id"),
      cosine_sim(col("embedding"), col("embedding")).as("c"))
      .orderBy("vec_id").collect()
    assert(rows(0).isNullAt(1), "null-element vector via parquet must be NULL")
    assert(math.abs(rows(1).getDouble(1) - 1.0) < 1e-12)
  }

  test("round-13: zero-norm vectors score NULL cosine and never enter " +
      "rankings or near-dup pairs (NaN would win every ordering)") {
    import spark.implicits._
    val withDead = vecs.unionByName(
      Seq((9L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    // the expression itself: NULL, not NaN, on a zero-norm side — both
    // the codegen and interpreted paths
    val z = withDead.filter($"vec_id" === 9)
      .select(Similarity.cosine(col("embedding"), col("embedding")))
      .collect().head
    assert(z.isNullAt(0), s"zero-norm cosine must be NULL, got $z")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val zi = withDead.filter($"vec_id" === 9)
        .select(Similarity.cosine(col("embedding"), col("embedding")))
        .collect().head
      assert(zi.isNullAt(0), "interpreted path must also yield NULL")
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // rankings: the dead vector is never anyone's neighbor, no NULL-cos
    // rows pad out a short candidate list (k > |scoreable corpus|)
    val topk = Similarity.bruteForceTopK(
      withDead, withDead, "vec_id", "embedding", k = 10)
    assert(topk.filter($"neighbor_id" === 9L).isEmpty,
      "dead vector must not appear as a neighbor")
    assert(topk.filter($"cos".isNull).isEmpty, "no NULL-cos rank filler")
    // near-dup: NULL fails the >= threshold, so no pair involves it
    val nd = Similarity.cosineNearDup(withDead, "vec_id", "embedding", 0.1)
    assert(nd.filter($"id_1" === 9L || $"id_2" === 9L).isEmpty)
  }

  test("round-13: lshNearDup's empty-input result carries the CALLER's id " +
      "type (a hard-coded BIGINT broke unions for string ids)") {
    import spark.implicits._
    val emptyStr = Seq.empty[(String, Array[Float])].toDF("doc", "embedding")
    val out = graft.operators.Similarity.lshNearDup(
      emptyStr, "doc", "embedding", threshold = 0.5)
    assert(out.isEmpty)
    assert(out.schema("id_1").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(out.schema("id_2").dataType ==
      org.apache.spark.sql.types.StringType)
    // and unions cleanly with a non-empty-shaped frame of the same ids
    val nonEmptyShape = Seq(("a", "b", 0.9)).toDF("id_1", "id_2", "cos")
    assert(nonEmptyShape.unionByName(out).count() == 1L)
  }
}
