package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** VERDICT r6 item 3: the driver's events.parquet has shipped `ts` in
  * three different parquet encodings across rounds. This matrix spec
  * writes synthetic events in each layout and runs a representative
  * `unix_micros` consumer through `Tables.events`, so a generator
  * encoding flip can never again break 27 operators at analysis time.
  *
  * Encodings covered:
  *   1. TIMESTAMP(NANOS) — Spark can't read natively; with
  *      spark.sql.legacy.parquet.nanosAsLong it surfaces as LongType.
  *      (Spark can't WRITE nanos either, so we emulate by writing the
  *      raw Long column the legacy conf would produce.)
  *   2. TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ —
  *      what the r6 testdata shipped; broke 27 operators.
  *   3. TIMESTAMP(MICROS, isAdjustedToUTC=true) → TimestampType.
  */
class TsEncodingSpec extends SparkSpec {
  import spark.implicits._

  private val microsUtc = 1704085200123456L // 2024-01-01 05:00:00.123456 UTC

  private def writeEvents(dir: String)(mk: => org.apache.spark.sql.DataFrame): String = {
    mk.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def roundtrip(dir: String): Unit = {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"normalizeEventTs must yield TimestampType, got ${ev.schema("ts").dataType}")
    // representative consumer: unix_micros requires TimestampType —
    // this is exactly the call that died with DATATYPE_MISMATCH on NTZ
    val got = ev.select(unix_micros($"ts")).as[Long].head()
    assert(got == microsUtc, s"expected $microsUtc µs, got $got")
  }

  test("encoding 1: TIMESTAMP(NANOS) read as Long via legacy conf") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ts_nanos").toString
    roundtrip(writeEvents(dir) {
      Seq((1L, microsUtc * 1000L, 7L, "m", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    })
  }

  test("encoding 2: TIMESTAMP(MICROS, NTZ) — the r6 regression layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ts_ntz").toString
    roundtrip(writeEvents(dir) {
      // UTC session TZ ⇒ the NTZ local datetime equals the UTC instant
      Seq((1L, 7L, "m", 1.0, "{}"))
        .toDF("event_id", "user_id", "event_type", "value", "props")
        .withColumn("ts", timestamp_micros(lit(microsUtc)).cast(TimestampNTZType))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    })
  }

  test("encoding 3: TIMESTAMP(MICROS, UTC-adjusted) passes through") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ts_utc").toString
    roundtrip(writeEvents(dir) {
      Seq((1L, 7L, "m", 1.0, "{}"))
        .toDF("event_id", "user_id", "event_type", "value", "props")
        .withColumn("ts", timestamp_micros(lit(microsUtc)))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    })
  }

  test("current driver testdata loads as TimestampType regardless of file encoding") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.select(unix_micros($"ts")).limit(1).as[Long].head() > 0L)
  }
}
