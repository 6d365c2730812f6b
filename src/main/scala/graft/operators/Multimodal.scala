package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque BINARY payloads plus a
  * typed metadata struct, with the decode / feature-extract step run
  * batch-wise per partition.
  *
  * The Spark-side plumbing is real — schema, partition-local batch
  * processing via `mapPartitions` on a typed Dataset (the Scala
  * equivalent of a Pandas-UDF/mapInPandas batch), deterministic
  * output — while the actual media codec is a STUB: this container has
  * no image/audio libraries, so `decodeFeatures` derives its "features"
  * from an md5 digest of the payload bytes (clearly fake, fully
  * deterministic, oracle-checkable). Swapping in a real decoder changes
  * only the per-row function body, not the pipeline shape.
  */
object Multimodal {

  /** Decoded-feature row: what a real image decoder would emit. */
  case class MediaFeatures(doc_id: Long, media_type: String, width: Int,
                           height: Int, n_bytes: Int,
                           f0: Double, f1: Double, f2: Double, f3: Double)

  /** Attach a fake binary payload + metadata struct to the documents
    * table (stands in for reading real image bytes alongside text). */
  def attachPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"), col("lang"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("image/png").as("media_type"),
        (col("n_chars") % 640 + 16).cast("int").as("width"),
        (col("n_chars") * 7 % 480 + 16).cast("int").as("height")
      ).as("meta"))

  /** STUB decode: batch feature extraction over each partition. A real
    * implementation would decode pixels here; the stub emits 4
    * deterministic doubles from the payload's md5 (each an 8-hex-char
    * window scaled to [0,1)). Digest instance is reused per partition —
    * the batch-shape a real codec needs (expensive init amortized).
    */
  def decodeFeatures(withPayload: DataFrame): Dataset[MediaFeatures] = {
    import withPayload.sparkSession.implicits._
    withPayload.select(
        col("doc_id"), col("payload"),
        col("meta.media_type"), col("meta.width"), col("meta.height"))
      .as[(Long, Array[Byte], String, Int, Int)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5") // per-partition init
        rows.map { case (id, payload, mt, w, h) =>
          md.reset()
          val hex = md.digest(payload).map("%02x".format(_)).mkString
          def f(j: Int): Double =
            math.round(java.lang.Long.parseLong(hex.substring(8 * j, 8 * j + 8), 16)
              / 4294967296.0 * 1e6) / 1e6
          MediaFeatures(id, mt, w, h, payload.length, f(0), f(1), f(2), f(3))
        }
      }
  }

  /** STUB frame sampling (video-style): every strideth byte of the
    * payload, as a new binary column — pure slicing, no codec. */
  def frameSample(withPayload: DataFrame, stride: Int): DataFrame = {
    import withPayload.sparkSession.implicits._
    val sampled = udf((payload: Array[Byte]) =>
      payload.grouped(stride).map(_.head).toArray)
    withPayload.withColumn("frames", sampled(col("payload")))
      .withColumn("n_frames", length(col("frames")))
  }

  /** Resize plumbing: aspect-preserving fit into a square `box` (the
    * common model-input shape, e.g. 224). The DIMENSION math is the
    * real part — integer-exact (`w*box div max(w,h)`), so it is
    * oracle-checkable and immune to FP-ulp drift — while the pixel
    * resample is the declared codec stub: the "resized" payload is a
    * prefix slice sized to the new pixel count. Fully declarative
    * (no UDF): the dimension columns stay inside codegen. */
  def resize(withPayload: DataFrame, box: Int): DataFrame =
    withPayload
      .withColumn("new_width", expr(
        s"greatest(1, CAST(meta.width AS BIGINT) * $box div " +
          "greatest(meta.width, meta.height))").cast("int"))
      .withColumn("new_height", expr(
        s"greatest(1, CAST(meta.height AS BIGINT) * $box div " +
          "greatest(meta.width, meta.height))").cast("int"))
      .withColumn("resized_n_bytes",
        least(length(col("payload")),
          col("new_width") * col("new_height")).cast("int"))
      .withColumn("resized_payload", expr(
        "substring(payload, 1, new_width * new_height)"))
}
