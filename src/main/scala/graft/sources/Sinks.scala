package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sink layer: how graft tables leave the engine.
  *
  * At 100 TB the write layout IS the read plan: hive-style partition
  * columns give coarse pruning (the `.where(part = x)` scan never
  * lists other directories), and sorting within partitions keeps
  * parquet row-group min/max stats selective for range predicates.
  * Frame blobs (the reference's `bytes_to_file`, main.py:52-57)
  * persist as parquet binary columns — splittable and scannable,
  * unlike raw byte files.
  */
object Sinks {

  /** Partitioned parquet write with in-partition sort (row-group
    * stats stay selective on `sortCols`). */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val sorted =
      if (sortCols.nonEmpty)
        df.repartition(partitionCols.map(col): _*)
          .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      else df
    sorted.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(path)
  }

  /** Persist packed frames (binary column + routing metadata). */
  def writeFrames(frames: DataFrame, path: String): Unit =
    frames.write.mode(SaveMode.Overwrite).parquet(path)

  /** Read persisted frames back. */
  def readFrames(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
