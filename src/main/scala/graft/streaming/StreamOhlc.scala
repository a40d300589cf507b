package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Streaming twin of [[graft.operators.Telemetry.ohlc]] — OHLC
  * candle resampling run as a LIVE watermarked tumbling-window
  * aggregation (the market-data / telemetry "bar builder" shape):
  * `window(ts, "1 day")` keyed by event_type in APPEND mode, so each
  * day's candle emits exactly once — when the event-time watermark
  * passes the day boundary and its state drops. open/close are
  * `min_by`/`max_by` over exact integer µs, the same partial-aggregable
  * election the batch operator uses, so per-(type, day) state is five
  * scalars however many raw events the day holds.
  *
  * The day-over-day `close_chg` needs the PREVIOUS day's closed
  * candle — a window function Structured Streaming cannot run over an
  * unbounded stream. The production shape is exactly what the gate
  * stages: candles land in an append-only sink (final, never
  * retracted), and the delta is a dimension-sized batch view over the
  * sink — #types × #days rows regardless of raw stream volume. That
  * downstream view is part of this operator, not a cheat: append-mode
  * finality is the property that MAKES the sink-side lag well-defined.
  *
  * Batch-gated run: the two micro-batches cut INSIDE the busiest
  * candle's own [first-event, last-event] span (a median-time cut can
  * land near a day boundary and split no candle at all — the corpus
  * median here falls at 23:48), so at least one candle is GUARANTEED
  * to carry window state across the cut; two sentinel batches 2 and 4
  * days past the corpus maximum advance the watermark so every real
  * day closes and flushes (emission lags one batch — sentinel 1
  * raises max event time, sentinel 2's batch computes the new
  * watermark and emits). Sentinels carry event_type "__sentinel__"
  * and filter out; their own windows never close, which is fine.
  * Shares ts_ohlc's DuckDB oracle: the streaming emission must equal
  * the batch groupBy bit-for-bit, close deltas included.
  */
object StreamOhlc {

  /** Midpoint of the busiest multi-event candle's [first, last] µs
    * span — a cut timestamp that some candle's events provably fall
    * on BOTH sides of, so the staged run must carry its window state
    * across the micro-batch boundary. None if every candle holds a
    * single instant (state carry unexercisable). Deterministic
    * election: event count desc, then (type, day) asc. */
  private[graft] def straddlingCut(spark: SparkSession, dir: String): Option[Long] = {
    import spark.implicits._
    StreamDedup.cachedHeadOption(graft.sources.Tables.events(spark, dir)
      .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
      .agg(min(unix_micros($"ts")).as("lo"), max(unix_micros($"ts")).as("hi"),
        count(lit(1)).as("n"))
      .filter($"lo" < $"hi")
      .orderBy($"n".desc, $"event_type".asc, $"day".asc)
      .limit(1))
      // lo < hi ⇒ lo ≤ midpoint < hi, so the first event lands in
      // batch 1 (≤ cut) and the last in batch 2 (> cut)
      .map(r => (r.getAs[Long]("lo") + r.getAs[Long]("hi")) / 2)
  }

  def streamedOhlc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, dir)
      .filter($"value".isNotNull)   // the batch ohlc null contract
      .select($"event_id", $"ts", $"event_type", $"value")
    val bounds = StreamDedup.cachedHead(ev.agg(min(unix_micros($"ts")), max(unix_micros($"ts"))))
    if (bounds.isNullAt(0)) return spark.emptyDataFrame
    val hiUs = bounds.getLong(1)
    val cutUs = straddlingCut(spark, dir).getOrElse((bounds.getLong(0) + hiUs) / 2)
    val dayUs = 86400000000L
    def sentinel(offsetUs: Long): DataFrame =
      spark.range(1).select(
        lit(-1L).as("event_id"),
        timestamp_micros(lit(hiUs + offsetUs)).as("ts"),
        lit("__sentinel__").as("event_type"),
        lit(0.0d).as("value"))
    // sentinel 1 rides the last data batch — identical emitted set,
    // one micro-batch cheaper (see StreamXcorr's staging note, r14)
    val candles = StreamDedup.runStagedStream(spark, Seq(
        ev.filter(unix_micros($"ts") <= cutUs),
        ev.filter(unix_micros($"ts") > cutUs)
          .unionByName(sentinel(2L * dayUs)),
        sentinel(4L * dayUs))) { stream =>
      stream
        .withWatermark("ts", "0 seconds")
        .groupBy(window($"ts", "1 day"), $"event_type")
        .agg(
          min_by($"value", unix_micros($"ts")).as("open"),
          max($"value").as("high"),
          min($"value").as("low"),
          max_by($"value", unix_micros($"ts")).as("close"),
          count(lit(1)).cast(LongType).as("n_events"))
    }.getOrElse(return spark.emptyDataFrame)
    // sink-side delta view: candles are final (append mode), so the
    // lag runs over the dimension-sized resampled series, not raw rows
    val bySeries = Window.partitionBy($"event_type").orderBy($"day")
    // null-safe: =!= on a NULL event_type is NULL and would drop
    // the whole null-type series, not just the sentinels
    candles.filter(!($"event_type" <=> "__sentinel__"))
      .select($"event_type", $"window.start".as("day"),
        $"open", $"high", $"low", $"close", $"n_events")
      .withColumn("close_chg", $"close" - lag($"close", 1).over(bySeries))
  }
}
