package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental (streaming) indicators: the upgrade the reference wishes for in
  * README.md:161 — instead of the hourly full-table recompute
  * (spark_job_1.py:18-22), keep a per-series ring buffer of the trailing n
  * closes in keyed state and emit SMA/RSI/Bollinger per arriving kline.
  *
  * Semantics match [[graft.operators.Indicators]] exactly (same warm-up
  * partial windows, gain/loss 0.0 at series start, RSI NULL on zero average
  * loss, sample stddev NULL for a single row) — pinned by
  * StreamingSpec."stateful indicators match the batch window computation".
  *
  * State per key is O(n) doubles — bounded, so no watermark eviction is
  * required for state size; use GroupStateTimeout if series can be abandoned.
  */
object StatefulIndicators {

  /** `seq` is a unique within-key tiebreaker (e.g. event_id): duplicate
    * (key, close_time) rows otherwise make the fold order — and therefore
    * every indicator value — nondeterministic, exactly like an SQL window
    * ordered only by timestamp.
    */
  case class KlinePoint(symbol_id: Int, interval_id: Int, close_time: Long,
      close_price: Double, seq: Long = 0L)

  case class SeriesState(closes: Vector[Double], gains: Vector[Double], losses: Vector[Double])

  case class IndicatorPoint(
      symbol_id: Int,
      interval_id: Int,
      close_time: Long,
      sma: Double,
      rsi: Option[Double],
      bb_up: Option[Double],
      bb_down: Option[Double])

  private def step(n: Int, st: SeriesState, price: Double): (SeriesState, (Double, Option[Double], Option[Double], Option[Double])) = {
    val diffOpt = st.closes.lastOption.map(price - _)
    val gain = diffOpt.filter(_ > 0).getOrElse(0.0)
    val loss = diffOpt.filter(_ < 0).map(-_).getOrElse(0.0)
    val closes = (st.closes :+ price).takeRight(n)
    val gains = (st.gains :+ gain).takeRight(n)
    val losses = (st.losses :+ loss).takeRight(n)

    val sma = closes.sum / closes.size
    val avgLoss = losses.sum / losses.size
    val avgGain = gains.sum / gains.size
    val rsi = if (avgLoss == 0.0) None
      else Some(100.0 - 100.0 / (1.0 + avgGain / avgLoss))
    val (up, down) =
      if (closes.size < 2) (None, None)
      else {
        val mean = sma
        val variance = closes.map(c => (c - mean) * (c - mean)).sum / (closes.size - 1)
        val sd = math.sqrt(variance)
        (Some(mean + 2 * sd), Some(mean - 2 * sd))
      }
    (SeriesState(closes, gains, losses), (sma, rsi, up, down))
  }

  private def updateGroup(n: Int)(
      key: (Int, Int),
      rows: Iterator[KlinePoint],
      state: GroupState[SeriesState]): Iterator[IndicatorPoint] = {
    var st = state.getOption.getOrElse(SeriesState(Vector.empty, Vector.empty, Vector.empty))
    // Deterministic within-batch order; late rows across batches are the
    // batch-recompute job's concern (T8), as in the reference.
    val out = rows.toSeq.sortBy(p => (p.close_time, p.seq)).map { p =>
      val (next, (sma, rsi, up, down)) = step(n, st, p.close_price)
      st = next
      IndicatorPoint(p.symbol_id, p.interval_id, p.close_time, sma, rsi, up, down)
    }
    state.update(st)
    out.iterator
  }

  /** Attach to a streaming (or batch) Dataset of kline points. */
  def transform(points: Dataset[KlinePoint], n: Int = 14): Dataset[IndicatorPoint] = {
    import points.sparkSession.implicits._
    points
      .groupByKey(p => (p.symbol_id, p.interval_id))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(updateGroup(n))
  }

  /** Convenience: DataFrame adapter with the kline-fact column names.
    * `tiebreakCol` names a unique per-row column (event/kline id) used to
    * order duplicate timestamps deterministically; absent one, ties fold in
    * arbitrary order.
    */
  def fromDataFrame(df: DataFrame, n: Int = 14, tiebreakCol: Option[String] = None): DataFrame = {
    import df.sparkSession.implicits._
    // round-13 guard: the tiebreak feeds the non-nullable KlinePoint.seq
    // long — cast() on a string/UUID column yields NULL and the encoder
    // kills the job ("Null value appeared in non-nullable field"), or a
    // partially-numeric column nulls SOME rows and silently destroys the
    // deterministic tie order the parameter exists to provide
    tiebreakCol.foreach { c =>
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val dt = df.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"StatefulIndicators: tiebreak column '$c' must be integral (got " +
          s"${dt.simpleString}) — map string ids to longs (e.g. xxhash64) " +
          "first")
    }
    val seqCol = tiebreakCol.map(c => col(c).cast("long")).getOrElse(lit(0L))
    val typed = df.select(
      col("symbol_id").cast("int"),
      col("interval_id").cast("int"),
      col("close_time").cast("long"),
      col("close_price").cast("double"),
      seqCol.as("seq")).as[KlinePoint]
    transform(typed, n).toDF()
  }
}
