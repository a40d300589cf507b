package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Failure contract (VERDICT r6 item 2): a query that throws must NEVER
  * silently vanish from the output set — that made 27 broken operators
  * look like a shorter-but-green round. Instead we:
  *   - write a 1-row marker frame with a `__VERIFY_FAILED__` column at
  *     the query's output path, so any downstream compare sees a loud
  *     schema/row mismatch (red row) rather than a missing key;
  *   - dump verify_failures.json (name → error) and query_keys.json
  *     (the FULL SparkEntry.queries key set) so tools/check.py can
  *     assert nothing was dropped.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated key subset for targeted
    // re-verification while iterating (the driver always runs all)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    def selected[A](m: Map[String, A]): Map[String, A] =
      only.fold(m)(ks => m.filter { case (k, _) => ks(k) })
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.registerObservationLog(spark)
    new java.io.File(outDir).mkdirs()
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    selected(SparkEntry.queries).foreach { case (name, fn) =>
      // the dump is this query's consuming action — transient
      // checkpoint blocks (kcore rounds, kmeans seed passes) are dead
      // once it finishes; drain them so the 294-query gate session
      // doesn't accumulate blocks (the label cache is NOT cleared —
      // dedup_clusters/dedup_apply share it deliberately)
      try { fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
        graft.operators.Dedup.releaseTransientBlocks() }
      catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        failures(name) = msg
        System.err.println(s"[verify] $name FAILED: $msg")
        try {
          import spark.implicits._
          Seq((name, msg.take(500))).toDF("__VERIFY_FAILED__", "error")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case _: Throwable => () }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def obj(m: Iterable[(String, String)]): String =
      m.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), obj(selected(SparkEntry.oracleSql)))
    Files.writeString(Paths.get(s"$outDir/verify_failures.json"), obj(failures))
    Files.writeString(Paths.get(s"$outDir/query_keys.json"),
      selected(SparkEntry.queries).keys.map(q).mkString("[", ",", "]"))
    if (failures.nonEmpty)
      System.err.println(s"[verify] ${failures.size}/${selected(SparkEntry.queries).size} queries FAILED: ${failures.keys.mkString(", ")}")
    else
      System.err.println(s"[verify] all ${selected(SparkEntry.queries).size} queries dumped OK")
    spark.stop()
  }
}
