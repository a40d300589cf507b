package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Streaming twin of [[graft.operators.Telemetry.heatmap]] — the
  * hour-of-day × day-of-week activity calendar maintained
  * INCREMENTALLY: state is one (count, cents-sum) pair per (dow,
  * hour) cell — at most 168 cells per state store however long the
  * stream runs — flushed once at a sentinel barrier. The value sum
  * accumulates in integer CENTS (Math.addExact — the StreamBudget
  * discipline: a double accumulator drifts from the batch decimal
  * sum in the last ulp, integer state is exact in any arrival
  * order) and reconstructs through the SAME decimal→double cast as
  * the batch `dsum`, so the shared `events_heatmap` oracle
  * hash-matches bit-for-bit. A cell whose every value is NULL keeps
  * a None sum and emits NULL, matching SUM's skip-null semantics on
  * both engines. Counts crossing the staged median-time cut must
  * fold into batch-1 cell state (exactly-once emission is asserted
  * in-operator).
  */
object StreamHeatmap {

  case class Cell(dow: Long, hour: Long, cents: Option[Long], sentinel: Boolean)
  case class CellOut(dow: Long, hour: Long, n: Long, s1c: Option[Long])
  case class CellState(n: Long, s1c: Option[Long])

  /** The stateful core: per-cell (count, exact cents sum), emitted
    * once at the sentinel. */
  def census(ev: Dataset[Cell]): Dataset[CellOut] = {
    val spark = ev.sparkSession
    import spark.implicits._
    ev.groupByKey(e => (e.dow, e.hour))
      .flatMapGroupsWithState[CellState, CellOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((dow, hour), it, state: GroupState[CellState]) =>
          var s = state.getOption.getOrElse(CellState(0L, None))
          var flush = false
          it.foreach { e =>
            if (e.sentinel) flush = true
            else {
              val ns = e.cents match {
                case Some(c) => Some(Math.addExact(s.s1c.getOrElse(0L), c))
                case None    => s.s1c
              }
              s = CellState(s.n + 1L, ns)
            }
          }
          state.update(s)
          if (flush) Iterator.single(CellOut(dow, hour, s.n, s.s1c))
          else Iterator.empty
      }
  }

  def streamedHeatmap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.dec
    val ev = graft.sources.Tables.events(spark, dir)
      .filter($"ts".isNotNull)
      .select(
        pmod(expr("unix_micros(ts) div 86400000000") + 4L, lit(7L)).as("dow"),
        expr("(unix_micros(ts) % 86400000000) div 3600000000").as("hour"),
        (dec($"value") * 100).cast(LongType).as("cents"),
        unix_micros($"ts").as("tsUs"))
    val bounds = StreamDedup.cachedHead(ev.agg(min($"tsUs"), max($"tsUs")))
    if (bounds.isNullAt(0)) return spark.emptyDataFrame
    val cut = (bounds.getLong(0) + bounds.getLong(1)) / 2
    val staged = ev.select($"dow", $"hour", $"cents",
      lit(false).as("sentinel"), $"tsUs")
    val sentinels = ev.select($"dow", $"hour").distinct()
      .select($"dow", $"hour", lit(null).cast("long").as("cents"),
        lit(true).as("sentinel"))
    val cells = StreamDedup.runStagedStream(spark,
        Seq(staged.filter($"tsUs" <= cut).drop("tsUs"),
          staged.filter($"tsUs" > cut).drop("tsUs"),
          sentinels)) { stream =>
      census(stream.as[Cell]).toDF()
    }.getOrElse(return spark.emptyDataFrame)
    val bad = cells.groupBy($"dow", $"hour").count()
      .filter($"count" =!= 1L).count()
    if (bad > 0)
      throw new IllegalStateException(
        s"streamed heatmap: $bad cells emitted != once " +
          "(cross-batch census state lost or replayed)")
    cells.select($"dow", $"hour", $"n".as("n_events"),
      ($"s1c".cast(DecimalType(38, 2)) / 100).cast(DoubleType).as("sum_value"))
  }
}
