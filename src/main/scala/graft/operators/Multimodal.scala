package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing (BASELINE north star; reference surface
 * `clip_embed`/`imagebind_embed`/`embed_image`,
 * `NeuronDB/neurondb--1.0.sql:712-747,6915-6948`).
 *
 * Media travel as opaque `binary` columns with typed metadata — the shape
 * that scales: bytes stay columnar in parquet, partition-local transforms
 * run as `mapPartitions` batches (the Scala analog of `mapInPandas`), and
 * nothing decodes on the driver.
 *
 * The DECODE STEP IS A STUB: this container has no image/audio codecs, so
 * [[decodeStub]] derives deterministic pseudo-features (a normalized byte
 * histogram) from the raw bytes. The schema, batching, partitioning and
 * UDF signatures are real; swapping in a true decoder changes only the
 * function body marked STUB below.
 */
object Multimodal {

  /** Canonical media schema: (media_id, media_type, payload, metadata). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Wrap any string column as a binary media payload (test harness for
    * the plumbing; real pipelines read binary files directly). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
              mediaType: String = "image"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      encode(col(payloadCol), "UTF-8").as("payload"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"))

  /**
   * STUB decode: byte-histogram features (256 bins, L1-normalized).
   * Deterministic stand-in for image decode + feature extraction — same
   * output shape (fixed-length float vector per row).
   */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](256)
    if (payload == null || payload.isEmpty) return hist
    payload.foreach(b => hist(b & 0xFF) += 1f)
    val total = payload.length.toFloat
    var i = 0
    while (i < 256) { hist(i) /= total; i += 1 }
    hist
  }

  /** Feature extraction as a partition-batch transform: one task per
    * parquet split, no shuffle, no driver involvement. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val extract = udf((payload: Array[Byte]) => decodeStub(payload))
    media.withColumn("features", extract(col("payload")))
  }

  /**
   * STUB resize: a real implementation re-encodes pixels; the stub
   * truncates/pads bytes to `targetBytes` so downstream batch shapes are
   * exercised. Marked loudly so no one mistakes it for image math.
   */
  def resizeStub(media: DataFrame, targetBytes: Int): DataFrame = {
    val resize = udf((payload: Array[Byte]) =>
      if (payload.length >= targetBytes) payload.take(targetBytes)
      else payload ++ new Array[Byte](targetBytes - payload.length))
    media.withColumn("payload", resize(col("payload")))
      .withColumn("width", lit(targetBytes)) // stand-in metadata update
  }

  /** Frame sampling for video payloads: every `stride`-th fixed-size
    * frame window of the byte stream (real frame extraction is a codec
    * concern; the partition-local batching here is the real part). */
  def frameSampleStub(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val sample = udf((payload: Array[Byte]) =>
      payload.grouped(frameBytes).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .map { case (frame, i) => (i, frame) }.toSeq)
    media.withColumn("frame", explode(sample(col("payload"))))
      .select(col("media_id"), col("media_type"),
        col("frame._1").as("frame_index"), col("frame._2").as("frame_payload"))
  }

  /** Cross-modal retrieval shape (`cross_modal_search`): embed the query
    * in the stub feature space and kNN over extracted features. */
  def crossModalSearch(mediaWithFeatures: DataFrame, queryPayload: Array[Byte],
                       k: Int = 10): DataFrame =
    Knn.search(mediaWithFeatures, "features", decodeStub(queryPayload), k, "cosine")
}
