package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Decomposed timing of the embed_gram pipeline stages. */
object GramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = graft.GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t(label: String)(f: => Any): Unit = {
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        f
        println(f"[probe] $label rep$rep ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    t("scan_count")(emb.count())
    val xd = transform($"embedding", x => x.cast(DoubleType))
    val ma = array_max(transform(xd, abs(_)))
    val q = when(ma > 0d,
      transform(xd, x => floor(x * lit(127.0d) / ma + lit(0.5d)).cast(LongType)))
      .otherwise(transform(xd, _ => lit(0L)))
    t("quantize_only")(emb.select(q.as("q")).agg(count(lit(1))).collect())
    t("quantize_sumfirst")(emb.select(q.as("q"))
      .agg(sum(element_at($"q", 1))).collect())
    t("full_gram")(graft.operators.Similarity.gram(spark, sfDir).count())
    spark.stop()
  }
}
