package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Telemetry.retention]] — the
  * cohort retention matrix maintained INCREMENTALLY: per-user state
  * is the running earliest signup week plus the set of distinct
  * active weeks — bounded by the TIME AXIS (weeks since launch), not
  * the event stream, the same bound every retention dashboard's
  * serving store carries. The (cohort, offset) matrix needs each
  * user's FULL week set against their FINAL cohort week (a signup
  * arriving late can move the cohort earlier and re-offset every
  * week), so users emit once at a sentinel barrier — the
  * [[StreamAnomaly]] two-phase discipline — and the distinct-user
  * rollup runs over the flushed (cohort, offset, user) cells exactly
  * as the batch operator aggregates its join. Cross-batch: a user
  * whose signup lands in batch 1 and activity in batch 2 must
  * assemble from state; shares `events_retention`'s oracle.
  */
object StreamRetention {

  case class Ev(user_id: Long, weekUs: Long, isSignup: Boolean, sentinel: Boolean)
  case class RState(signupWeekUs: Option[Long], weeks: Seq[Long])
  case class Cell(cohort_us: Long, week_offset: Long, user_id: Long)

  /** The stateful core: fold signup/activity weeks per user, emit the
    * user's retention cells once at the sentinel. */
  def cells(ev: Dataset[Ev]): Dataset[Cell] = {
    val spark = ev.sparkSession
    import spark.implicits._
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[RState, Cell](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, it, state: GroupState[RState]) =>
          var s = state.getOption.getOrElse(RState(None, Nil))
          var flush = false
          it.foreach { e =>
            if (e.sentinel) flush = true
            else {
              if (e.isSignup && !s.signupWeekUs.exists(_ <= e.weekUs))
                s = s.copy(signupWeekUs = Some(e.weekUs))
              if (!s.weeks.contains(e.weekUs))
                s = s.copy(weeks = s.weeks :+ e.weekUs)
            }
          }
          state.update(s)
          if (flush) s.signupWeekUs match {
            case Some(c) =>
              s.weeks.filter(_ >= c).map { w =>
                Cell(c, (w - c) / (7L * 86400000000L), uid)
              }.iterator
            case None => Iterator.empty
          }
          else Iterator.empty
      }
  }

  def streamedRetention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, dir)
      .filter($"ts".isNotNull && $"user_id".isNotNull)
      .select($"user_id",
        unix_micros(date_trunc("week", $"ts")).as("weekUs"),
        // NULL event_type is "not a signup", not a NULL boolean — the
        // bare comparison NPEs the non-nullable encoder field
        coalesce($"event_type" === "signup", lit(false)).as("isSignup"),
        unix_micros($"ts").as("tsUs"))
    val bounds = StreamDedup.cachedHead(ev.agg(min($"tsUs"), max($"tsUs")))
    if (bounds.isNullAt(0)) return spark.emptyDataFrame
    val cut = (bounds.getLong(0) + bounds.getLong(1)) / 2
    val staged = ev.select($"user_id", $"weekUs", $"isSignup",
      lit(false).as("sentinel"), $"tsUs")
    val sentinels = ev.select($"user_id").distinct()
      .select($"user_id", lit(0L).as("weekUs"), lit(false).as("isSignup"),
        lit(true).as("sentinel"))
    val log = StreamDedup.runStagedStream(spark,
        Seq(staged.filter($"tsUs" <= cut).drop("tsUs"),
          staged.filter($"tsUs" > cut).drop("tsUs"),
          sentinels)) { stream =>
      cells(stream.as[Ev]).toDF()
    }.getOrElse(return spark.emptyDataFrame)
    // the batch operator's own rollup over the flushed cells
    log.groupBy(timestamp_micros($"cohort_us").as("cohort_week"),
        $"week_offset")
      .agg(countDistinct($"user_id").as("n_active"))
  }
}
