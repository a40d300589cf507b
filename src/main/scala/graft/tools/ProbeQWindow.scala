package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off diagnostic (VERDICT r9 task 6): time q_window's plan under
  * the shipped GraftSession conf vs a bare session, and its pieces,
  * to attribute the 0.77 → 1.3 s isolated drift. */
object ProbeQWindow {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def run(tag: String, spark: SparkSession): Unit = {
      spark.sparkContext.setLogLevel("WARN")
      spark.read.parquet(s"$dir/lineitem.parquet").count()
      def t(name: String)(f: => Unit): Unit = {
        val xs = (1 to 5).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"[probe] $tag $name median ${xs.sorted.apply(2)}%.3f")
      }
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      import spark.implicits._
      val li = graft.sources.Tables.lineitem(spark, dir)
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
          $"l_extendedprice", $"l_quantity", $"l_shipdate")
      t("scan")(li.count())
      val rankW = Window.partitionBy($"l_suppkey")
        .orderBy($"l_extendedprice".desc, $"l_orderkey".asc, $"l_linenumber".asc)
      t("rank_only")(li.withColumn("r", row_number().over(rankW)).filter($"r" <= 3).count())
      val runW = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate".asc, $"l_orderkey".asc, $"l_linenumber".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t("runsum_dec")(li.withColumn("rq",
        sum(graft.operators.dec($"l_quantity")).over(runW)).agg(count(lit(1))).head())
      t("runsum_dbl")(li.withColumn("rq",
        sum($"l_quantity".cast("double")).over(runW)).agg(count(lit(1))).head())
      t("full")(graft.operators.Relational.qWindow(spark, dir).count())
    }
    val g = graft.GraftSession.builder().getOrCreate()
    run("graft", g)
    g.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val bare = SparkSession.builder().master("local[32]").appName("bare")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // a fresh bare context requires the graft one stopped first
    run("bare", bare)
  }
}
