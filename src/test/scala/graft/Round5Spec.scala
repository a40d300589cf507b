package graft

import org.apache.spark.sql.functions._

/** Round-5 additions: bucketed co-located joins, the TokenWindows
  * generator, and the batch of new curation/relational operators. */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  // --- bucketed co-located join ------------------------------------------------

  test("bucketed join: sort-merge with ZERO exchanges, agg included") {
    val df = operators.Relational.qBucketJoin(spark, sf)
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("SortMergeJoin"),
      s"bucketed join must stay on the sort-merge path:\n$executed")
    assert(!executed.contains("Exchange"),
      s"bucketed join + custkey-clustered agg must be shuffle-free:\n$executed")
  }

  test("bucketed join result equals the plain shuffled join") {
    import graft.sources.Tables
    val plain = Tables.customer(spark, sf).select($"c_custkey", $"c_mktsegment")
      .join(Tables.orders(spark, sf).select($"o_custkey", $"o_totalprice"),
        $"c_custkey" === $"o_custkey")
      .groupBy($"c_custkey", $"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
           operators.dsum($"o_totalprice").as("total_spent"))
    val a = operators.Relational.qBucketJoin(spark, sf).collect().toSet
    val b = plain.collect().toSet
    assert(a == b)
  }

  // --- TokenWindows generator ---------------------------------------------------

  test("token windows tile the document: stride starts, short tail, full coverage") {
    val df = Seq((1L, (1 to 60).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val rows = df.select($"doc_id",
        graft.plans.GenExprs.tokenWindowsCol(split(lower($"text"), "\\s+"), 50, 25)
          .as(Seq("win_idx", "win_len", "win_text")))
      .orderBy($"win_idx").collect()
    // n=60, stride=25 -> starts 0,25,50 -> lens 50,35,10
    assert(rows.map(_.getLong(2)).toSeq == Seq(50L, 35L, 10L))
    assert(rows(0).getString(3).startsWith("t1 t2 ") && rows(0).getString(3).endsWith(" t50"))
    assert(rows(2).getString(3) == (51 to 60).map(i => s"t$i").mkString(" "))
    // every token appears in at least one window (coverage)
    val covered = rows.flatMap(_.getString(3).split(" ")).toSet
    assert(covered == (1 to 60).map(i => s"t$i").toSet)
  }

  test("token windows: null and empty arrays generate no rows") {
    val df = Seq((1L, Some(Seq.empty[String])), (2L, None))
      .toDF("doc_id", "toks")
    val out = df.select($"doc_id",
      graft.plans.GenExprs.tokenWindowsCol($"toks", 50, 25)
        .as(Seq("win_idx", "win_len", "win_text")))
    assert(out.count() == 0L)
  }

  test("token windows generator works through the SQL surface (LATERAL VIEW)") {
    val df = Seq((7L, "a b c d e")).toDF("doc_id", "text")
    df.createOrReplaceTempView("r5_gen_docs")
    val out = spark.sql(
      """SELECT doc_id, w.win_idx, w.win_len, w.win_text
        |FROM r5_gen_docs
        |LATERAL VIEW graft_token_windows(split(lower(text), '\\s+'), 3, 2) w
        |""".stripMargin).orderBy($"win_idx").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toSeq ==
      Seq((0L, 3L, "a b c"), (1L, 3L, "c d e"), (2L, 1L, "e")))
  }
}
