package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Telemetry.rateCap]] — the
  * ingestion throttle run as an ONLINE stateful operator: per
  * (user, day) the state is the bounded keeper set (at most k
  * (ts, event_id) pairs — the same O(k) bound the batch TopKPairs
  * aggregate enforces in its buffers) plus one running total. The
  * ranked keeper rows with their final n_total emit once, at a
  * sentinel barrier, because "how much did the cap discard" is only
  * known when the day's stream has drained — the same two-phase
  * emission discipline as [[StreamAnomaly]].
  *
  * The keeper fold is order-independent (a sorted bounded set, ties
  * on equal µs break by event_id — the batch oracle's
  * ORDER BY ts, event_id), so it does not rely on arrival order;
  * cross-batch the set must survive the staged cut: a day straddling
  * the median-time split fills part of its keeper set in batch 1 and
  * must reject/displace batch-2 arrivals against it. Shares
  * `events_ratecap`'s oracle.
  */
object StreamRatecap {

  // user_id/day are Option: the batch groupBy keeps NULL-user and
  // NULL-day groups
  case class Ev(user_id: Option[Long], dayUs: Option[Long], tsUs: Option[Long],
      event_id: Long, sentinel: Boolean)
  case class CapState(kept: List[(Long, Long)], total: Long)
  case class CapOut(user_id: Option[Long], dayUs: Option[Long], rnk: Long,
      event_id: Long, n_total: Long)

  /** The stateful core: bounded keeper set + total, flushed at the
    * sentinel. NULL-ts events count toward the total but never enter
    * the keeper set — exactly the batch TopKPairs' null-skipping
    * update (its value, −unix_micros, is null there). */
  def cap(ev: Dataset[Ev], k: Int): Dataset[CapOut] = {
    val spark = ev.sparkSession
    import spark.implicits._
    ev.groupByKey(e => (e.user_id, e.dayUs))
      .flatMapGroupsWithState[CapState, CapOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((uid, day), it, state: GroupState[CapState]) =>
          var s = state.getOption.getOrElse(CapState(Nil, 0L))
          var flush = false
          it.foreach { e =>
            if (e.sentinel) flush = true
            else {
              val merged = e.tsUs match {
                case Some(t) => ((t, e.event_id) :: s.kept).sorted.take(k)
                case None => s.kept
              }
              s = CapState(merged, s.total + 1L)
            }
          }
          state.update(s)
          if (flush)
            s.kept.zipWithIndex.iterator.map { case ((_, id), i) =>
              CapOut(uid, day, (i + 1).toLong, id, s.total)
            }
          else Iterator.empty
      }
  }

  def streamedRatecap(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, dir)
      .select($"user_id", unix_micros(date_trunc("day", $"ts")).as("dayUs"),
        unix_micros($"ts").as("tsUs"), $"event_id")
    val bounds = StreamDedup.cachedHead(ev.agg(min($"tsUs"), max($"tsUs")))
    if (bounds.isNullAt(0)) return spark.emptyDataFrame
    val cut = (bounds.getLong(0) + bounds.getLong(1)) / 2
    val staged = ev.select($"user_id", $"dayUs", $"tsUs", $"event_id",
      lit(false).as("sentinel"))
    val sentinels = ev.select($"user_id", $"dayUs").distinct()
      .select($"user_id", $"dayUs", lit(null).cast("long").as("tsUs"),
        lit(-1L).as("event_id"), lit(true).as("sentinel"))
    val log = StreamDedup.runStagedStream(spark,
        Seq(staged.filter($"tsUs".isNull || $"tsUs" <= cut),
          staged.filter($"tsUs" > cut),
          sentinels)) { stream =>
      cap(stream.as[Ev], k).toDF()
    }.getOrElse(return spark.emptyDataFrame)
    // every (user, day) emits its keepers exactly once: rank 1 must
    // appear once per group or state was replayed/lost
    val bad = log.filter($"rnk" === 1L)
      .groupBy($"user_id", $"dayUs").count().filter($"count" =!= 1L).count()
    if (bad > 0)
      throw new IllegalStateException(
        s"streamed ratecap: $bad (user, day) groups emitted rank-1 != once " +
          "(cross-batch keeper state lost or replayed)")
    log.select($"user_id", timestamp_micros($"dayUs").as("day"),
      $"rnk", $"event_id", $"n_total")
  }
}
