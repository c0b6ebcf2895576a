package graft

/** Property-based invariants from SURVEY.md §5.2, checked on seeded
  * generated price series through the real operators (deterministic
  * generation — the offline cache has no scalatest-scalacheck bridge, and
  * reproducibility beats shrinking here).
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  import graft.operators.Indicators
  import graft.operators.Indicators.SeriesSpec

  private val spec = SeriesSpec(Seq("k"), Seq("t"), "p", n = 5)

  private def genSeries(seed: Int): List[Double] = {
    val rnd = new scala.util.Random(seed)
    List.fill(6 + rnd.nextInt(35))(1.0 + rnd.nextDouble() * 999.0)
  }

  test("BB_UP >= SMA >= BB_DOWN wherever stddev is defined; RSI in [0,100]") {
    (1 to 8).foreach { seed =>
      val prices = genSeries(seed)
      val df = prices.zipWithIndex.map { case (p, i) => ("k", i, p) }.toDF("k", "t", "p")
      val out = Indicators.all(df, spec).collect()
      out.foreach { r =>
        val sma = r.getAs[Double]("sma")
        if (!r.isNullAt(r.fieldIndex("bb_up"))) {
          assert(r.getAs[Double]("bb_up") >= sma - 1e-9, s"seed $seed")
          assert(r.getAs[Double]("bb_down") <= sma + 1e-9, s"seed $seed")
        }
        if (!r.isNullAt(r.fieldIndex("rsi"))) {
          val rsi = r.getAs[Double]("rsi")
          assert(rsi >= -1e-9 && rsi <= 100 + 1e-9, s"RSI out of range: $rsi (seed $seed)")
        }
      }
    }
  }

  test("long shape: row count equals non-null wide cells; SMA never null") {
    (10 to 14).foreach { seed =>
      val prices = genSeries(seed)
      val df = prices.zipWithIndex.map { case (p, i) => ("k", i, p) }.toDF("k", "t", "p")
      val wide = Indicators.all(df, spec).collect()
      val expected = wide.map { r =>
        Seq("sma", "rsi", "bb_up", "bb_down").count(c => !r.isNullAt(r.fieldIndex(c)))
      }.sum
      val long = Indicators.allLong(df, spec)
      assert(long.count() == expected, s"seed $seed")
      assert(long.filter($"type_name" === "SMA").count() == prices.size, s"seed $seed")
    }
  }

  test("exact dedup conserves rows and distinct keys on random corpora") {
    (20 to 24).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val texts = List.fill(30)(rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString)
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val groups = graft.operators.Dedup.exact(df, "doc_id", "text")
      assert(groups.count() == texts.distinct.size, s"seed $seed")
      val copies = groups.agg(org.apache.spark.sql.functions.sum("n_copies"))
        .head().getLong(0)
      assert(copies == texts.size, s"seed $seed")
    }
  }

  test("getOrCreate assigns dense natural-key-ordered ids to 1e5 new keys distributedly") {
    import org.apache.spark.sql.functions._
    val dim = Seq((1, "key_existing_a"), (2, "key_existing_b")).toDF("id", "nk")
    val incoming = spark.range(100000)
      .select(format_string("key_%06d", col("id")).as("nk"))
    val grown = graft.operators.Joins.getOrCreate(dim, incoming, "id", "nk")
    // ids come back LONG (int dims widen; assignment never int-wraps)
    val rows = grown.collect().map(r => r.getLong(0) -> r.getString(1))
    assert(rows.length == 100002)
    // dense: ids are exactly 1..100002
    assert(rows.map(_._1).sorted.toSeq == (1L to 100002L))
    // deterministic order: fresh ids follow natural-key sort order
    val fresh = rows.filter(_._1 > 2).sortBy(_._1).map(_._2)
    assert(fresh.toSeq == fresh.sorted.toSeq, "fresh ids not in natural-key order")
    // no single-partition funnel: the numbering window is partitioned by the
    // range bucket, never a global ORDER BY over all fresh keys
    val plan = graft.operators.Joins
      .getOrCreate(dim, incoming, "id", "nk")
      .queryExecution.analyzed.toString
    assert(plan.contains("_pid"), s"expected bucketed numbering:\n$plan")
  }

  test("indicator job idempotence property: recompute on same input is a fixed point") {
    (30 to 32).foreach { seed =>
      val prices = genSeries(seed)
      val df = prices.zipWithIndex.map { case (p, i) =>
        (1, 1, java.sql.Timestamp.valueOf(f"2024-01-01 ${i % 24}%02d:${i / 24}%02d:00"), p)
      }.toDF("symbol_id", "interval_id", "close_time", "close_price")
      val typeDim = graft.model.Schemas.indicatorTypeSeed.toDF("type_id", "type_name")
      val once = graft.pipeline.IndicatorJob.computeIndicators(df, typeDim)
      val fresh = graft.pipeline.IndicatorJob.newOnly(once, once)
      assert(fresh.count() == 0, s"seed $seed: recompute appended rows")
    }
  }

  test("top-k aggregator property: any random partitioning (with NaN " +
      "contamination and tied ords) merges to the sort-based reference") {
    val rnd = new scala.util.Random(1234)
    (1 to 100).foreach { trial =>
      val k = 1 + rnd.nextInt(6)
      val agg = new graft.functions.TopKAgg(k)
      val n = rnd.nextInt(30)
      val items = List.fill(n)((
        if (rnd.nextInt(10) == 0) Double.NaN
        else rnd.nextInt(5).toDouble, // heavy ties
        rnd.nextInt(20).toLong))
      // reference: drop NaN, sort by (ord desc, id asc), take k
      val expect = items.filterNot(_._1.isNaN)
        .sortBy { case (ord, id) => (-ord, id) }.take(k)
      // random split into 1-4 chunks, each reduced independently, then
      // merged in a random order
      val chunks = items.grouped(math.max(1, n / (1 + rnd.nextInt(4)) + 1))
        .map(_.foldLeft(agg.zero)(agg.reduce)).toList
      val merged = rnd.shuffle(chunks)
        .foldLeft(agg.zero)(agg.merge)
      assert(merged.toSeq == expect,
        s"trial $trial diverged: k=$k items=$items got=${merged.toSeq} " +
          s"want=$expect")
    }
  }

  test("jaro-winkler properties on random strings: symmetric, bounded, " +
    "identity, and single-char-edit similarity beats disjoint strings") {
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double = graft.functions.JaroWinklerUtil
      .sim(UTF8String.fromString(a), UTF8String.fromString(b))
    val rnd = new scala.util.Random(42)
    def randStr(alpha: String, maxLen: Int): String =
      List.fill(1 + rnd.nextInt(maxLen))(alpha(rnd.nextInt(alpha.length)))
        .mkString
    (1 to 200).foreach { _ =>
      val a = randStr("abcdef", 12)
      val b = randStr("abcdef", 12)
      val s = jw(a, b)
      assert(s == jw(b, a), s"asymmetric on ($a, $b)")
      assert(s >= 0.0 && s <= 1.0, s"out of bounds on ($a, $b): $s")
      assert(jw(a, a) == 1.0)
      // a one-substitution neighbor (same length, same alphabet position
      // changed) is always at least as similar as a fully disjoint string
      if (a.length >= 2) {
        val i = rnd.nextInt(a.length)
        val mutated = a.updated(i, if (a(i) == 'a') 'b' else 'a')
        val disjoint = "z" * a.length
        assert(jw(a, mutated) >= jw(a, disjoint),
          s"mutation ($a -> $mutated) scored below disjoint")
      }
    }
  }
}
