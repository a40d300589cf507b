package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Quality.uniqueness]] — the
  * candidate-key constraint monitor run ONLINE via RUNNING
  * MULTIPLICITY: state is one counter per (candidate, key value) —
  * the honest exact-uniqueness state, ∝ distinct keys, the
  * dedup_exact_stream bound — and every arrival emits its key's new
  * multiplicity m at landing. That emission is FINAL (a count only
  * grows), so the stream is append-safe with NO sentinel, and every
  * batch headline is a plain aggregate of the emission log:
  * n_rows = #emissions, n_keys = #(m=1), n_dup_keys = #(m=2) (a key
  * crosses 2 exactly once), n_surplus_rows = #(m≥2), and
  * max_multiplicity = max m. The violation FEED — "this row just
  * made key K a duplicate" — is exactly what a live constraint
  * monitor pages on; the batch twin only sees the totals.
  *
  * All three candidate keys ride ONE stateful pass: the group key is
  * (candidate, key tuple), so the state store holds the three
  * censuses side by side, sharded by the keys themselves.
  * Shares dq_uniqueness' oracle.
  *
  * Gated property: a key occurring on both sides of the cut must
  * CONTINUE its multiplicity sequence (m = 1 then 2), not restart —
  * a restart inflates n_keys and loses the duplicate.
  */
object StreamUniqueness {

  /** Composite group key: `cand` selects the candidate key (0 =
    * event_id, 1 = (user_id, ts), 2 = (user_id, event_type, ts));
    * unused fields stay None within a candidate, so identities never
    * collide across schemas. NULL key parts group as NULL = NULL,
    * the batch groupBy semantics. */
  case class Key(cand: Int, eid: Option[Long], uid: Option[Long],
    typ: Option[String], tsUs: Option[Long])
  case class Ev(cand: Int, eid: Option[Long], uid: Option[Long],
    typ: Option[String], tsUs: Option[Long])
  case class St(n: Long)
  case class Mult(cand: Int, m: Long)

  /** The stateful core: per-(candidate, key) counter; every arrival
    * emits the key's new multiplicity. */
  def multiplicities(ev: Dataset[Ev]): Dataset[Mult] = {
    val spark = ev.sparkSession
    import spark.implicits._
    ev.groupByKey(e => Key(e.cand, e.eid, e.uid, e.typ, e.tsUs))
      .flatMapGroupsWithState[St, Mult](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, it, state: GroupState[St]) =>
          var n = state.getOption.map(_.n).getOrElse(0L)
          val out = scala.collection.mutable.ArrayBuffer.empty[Mult]
          it.foreach { _ =>
            n += 1L
            out += Mult(key.cand, n)
          }
          state.update(St(n))
          out.iterator
      }
  }

  def streamedUniqueness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"event_type",
        unix_micros($"ts").as("tsUs"))
    val bounds = StreamDedup.cachedHead(ev.agg(min($"tsUs"), max($"tsUs")))
    // all-null ts (rows exist): every row routes to batch 1 below, so
    // the cut value is irrelevant — the audit must still run (the
    // batch twin has no ts filter; bailing to a zero-column frame
    // diverged from its 3-row result, ADVICE r8). A truly EMPTY
    // corpus flows through the zero-trigger staging fallback and
    // yields the 3 zero-count audit rows, same as the batch shape.
    val cut = if (bounds.isNullAt(0)) 0L
      else (bounds.getLong(0) + bounds.getLong(1)) / 2
    // one staged stream carries all three candidates: each source row
    // fans into its three key projections SCAN-LOCAL (the Expand
    // shape — no extra scan, no join)
    def fan(df: DataFrame): DataFrame = df.selectExpr(
      """inline(array(
        |  named_struct('cand', 0, 'eid', event_id, 'uid', CAST(NULL AS BIGINT),
        |               'typ', CAST(NULL AS STRING), 'tsUs', CAST(NULL AS BIGINT)),
        |  named_struct('cand', 1, 'eid', CAST(NULL AS BIGINT), 'uid', user_id,
        |               'typ', CAST(NULL AS STRING), 'tsUs', tsUs),
        |  named_struct('cand', 2, 'eid', CAST(NULL AS BIGINT), 'uid', user_id,
        |               'typ', event_type, 'tsUs', tsUs)))""".stripMargin)
    // null-ts rows carry no order key; route them into batch 1 (the
    // batch shape has no ts filter — every row is audited)
    val log = StreamDedup.runStagedStream(spark, Seq(
        fan(ev.filter($"tsUs" <= cut || $"tsUs".isNull)),
        fan(ev.filter($"tsUs" > cut)))) { stream =>
      multiplicities(stream.as[Ev]).toDF()
    }.getOrElse(spark.emptyDataset[Mult].toDF())
    // localCheckpoint: three audits re-read the same emission log
    val cp = log.localCheckpoint()
    def audit(cand: Int, name: String): DataFrame = cp.filter($"cand" === cand)
      .agg(lit(name).as("key_cols"),
        count(lit(1)).as("n_rows"),
        coalesce(sum(when($"m" === 1L, 1L)), lit(0L)).as("n_keys"),
        coalesce(sum(when($"m" === 2L, 1L)), lit(0L)).as("n_dup_keys"),
        coalesce(sum(when($"m" >= 2L, 1L)), lit(0L)).as("n_surplus_rows"),
        max($"m").as("max_multiplicity"))
    audit(0, "event_id")
      .unionByName(audit(1, "user_id,ts"))
      .unionByName(audit(2, "user_id,event_type,ts"))
  }
}
