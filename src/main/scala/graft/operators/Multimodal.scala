package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.plans.Frame
import graft.sources.Tables

/** Multimodal column plumbing (SURVEY §2.G): media payloads ride as
  * opaque `binary` columns with typed metadata beside them — the
  * schema/partitioning pattern a 100 TB image/audio pipeline uses.
  *
  * The decode step is a MARKED STUB: real pixel/audio decoding would
  * sit behind the same column boundary (a batch-wise UDF / native
  * expression over the blob); here a deterministic byte-level
  * "feature" (ByteSum over the first 8 bytes) stands in so the
  * Spark-side plumbing — blob construction, metadata derivation,
  * schema, per-row batch shape — is real and oracle-checkable.
  */
object Multimodal {

  def meta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blob = encode($"text", "UTF-8")
    Tables.documents(spark, dir).select(
      $"doc_id",
      octet_length(blob).cast(LongType).as("n_bytes"),
      (($"n_chars" % 64) + 1).cast(LongType).as("width"),
      (($"doc_id" % 48) + 1).cast(LongType).as("height"),
      when($"lang" === "en", "png").when($"lang" === "de", "jpeg")
        .when($"lang" === "es", "webp").otherwise("raw").as("format"),
      // STUB decode: deterministic stand-in for the real media decode
      Frame.byteSum(blob, lit(8L)).as("fake_feature"))
  }
}
