package graft

import org.apache.spark.sql.functions._
import graft.functions.HashFns

/** The SQL extension surface must agree with the column API. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_* SQL functions resolve and match the column API") {
    val sql = spark.sql(
      "SELECT graft_poly_hash('hello world') AS h, graft_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d").head()
    val viaCol = Seq("hello world").toDF("s")
      .select(HashFns.polyHash($"s")).head().getLong(0)
    assert(sql.getAs[Long]("h") == viaCol)
    assert(sql.getAs[Double]("d") == 4.0)
    // squared L2: (1.5-2)^2 + (2-0.5)^2 = 2.5
    val sd = spark.sql(
      "SELECT graft_sqdist(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS sd").head()
    assert(sd.getAs[Double]("sd") == 2.5)
  }

  test("native expressions constant-fold under Catalyst") {
    // deterministic pure expressions over literals must disappear
    // into literals at optimization time (e.g. the RHS of
    // `WHERE graft_poly_hash(text) = graft_poly_hash('needle')` is
    // computed once, not per row) — holds because every graft
    // expression extends the arity bases whose foldable propagates
    // from children
    val p = spark.sql(
      "SELECT graft_poly_hash('abc') AS h, graft_sqdist(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS d")
      .queryExecution.optimizedPlan.toString
    assert(!p.toLowerCase.contains("polyhashstr") && !p.toLowerCase.contains("sqdist"),
      s"literal-input native expressions must fold:\n$p")
  }

  test("graft_pack_frame / graft_unpack_frame roundtrip in SQL") {
    val r = spark.sql(
      """SELECT graft_unpack_frame(graft_pack_frame(CAST(42 AS BIGINT), CAST(1700000000 AS BIGINT),
        |  array(CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(3 AS BIGINT), CAST(4 AS BIGINT),
        |        CAST(5 AS BIGINT), CAST(6 AS BIGINT), CAST(32767 AS BIGINT)))) AS f""".stripMargin)
      .select($"f.device", $"f.ts_secs", $"f.samples").head()
    assert(r.getInt(0) == 42)
    assert(r.getInt(1) == 1700000000)
    assert(r.getSeq[Int](2) == Seq(1, 2, 3, 4, 5, 6, 32767))
  }

  test("graft image / sketch-support functions work from SQL") {
    val img = spark.sql(
      """SELECT graft_decode_image(graft_pack_image('png', CAST(320 AS BIGINT),
        |  CAST(200 AS BIGINT), CAST('payload' AS BINARY))) AS m""".stripMargin)
      .select($"m.format", $"m.width", $"m.height").head()
    assert(img.getString(0) == "png" && img.getInt(1) == 320 && img.getInt(2) == 200)
    val agree = spark.sql(
      "SELECT graft_sig_agree(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS n").head()
    assert(agree.getLong(0) == 2L)
    val joined = spark.sql(
      "SELECT octet_length(graft_bin_join(array(CAST('ab' AS BINARY), CAST('c' AS BINARY)))) AS n")
      .head()
    assert(joined.getInt(0) == 5)   // 'ab' + 0x3a + 'c' + 0x3a
    // a null element quarantines the whole join, like a concat fold
    val nul = spark.sql(
      "SELECT graft_bin_join(array(CAST('a' AS BINARY), CAST(NULL AS BINARY))) AS j").head()
    assert(nul.isNullAt(0))
  }

  test("graft_kmv aggregate works from SQL and keeps the k smallest distinct") {
    val r = spark.sql(
      """SELECT graft_kmv(h, 3) AS kmv FROM
        |  (SELECT explode(array(9L, 5L, 7L, 5L, 1L, 8L)) AS h)""".stripMargin).head()
    assert(r.getSeq[Long](0) == Seq(1L, 5L, 7L))
    // non-literal k fails loudly at analysis, not silently
    intercept[Exception] {
      spark.sql("SELECT graft_kmv(h, h) FROM (SELECT 1L AS h) t").collect()
    }
  }
}
