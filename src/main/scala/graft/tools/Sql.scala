package graft.tools

/** Ad-hoc SQL runner against a GraftSession (graft_* functions
  * registered, test tables mounted as temp views):
  * `sbt 'runMain graft.tools.Sql "SELECT graft_poly_hash(text) FROM documents LIMIT 3"'`
  */
object Sql {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.GraftSession.builder(master = "local[8]", shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    }
    graft.sources.Tables.events(spark, sfDir).createOrReplaceTempView("events")
    args.foreach { q => spark.sql(q).show(20, truncate = false) }
    spark.stop()
  }
}
