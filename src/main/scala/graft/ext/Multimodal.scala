package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (extension tier): image/audio/video travel as
  * opaque `binary` columns with a typed metadata struct; decode / feature
  * extraction runs as a batched per-partition stage.
  *
  * The actual codec step is a STUB — this container has no image/audio
  * libraries — implemented as a clearly-marked deterministic fake
  * (`fakeDecodeFeatures`). Everything around it is real and tested: the
  * schema contract, the binary+metadata column shapes, the batched
  * mapPartitions execution (the JVM analog of arrow-batched UDFs), and the
  * partitioning behavior.
  *
  * Scale posture: media blobs dominate row size — the decode stage must
  * (a) run after column pruning so only (key, media) ship, (b) never
  * shuffle blobs (mapPartitions preserves partitioning), and (c) emit
  * compact features so downstream aggs shuffle features, not bytes.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType))))))

  /** Synthesize a media table from `documents`: the binary payload is the
    * md5 digest bytes of the text (deterministic stand-in for real bytes),
    * metadata derived from doc properties. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      unhex(md5(col("text"))).as("media"),
      struct(
        when(col("doc_id") % 2 === 0, "png").otherwise("wav").as("format"),
        (lit(16) + pmod(col("n_chars"), lit(64))).cast("int").as("width"),
        (lit(16) + pmod(col("n_chars") * 7, lit(64))).cast("int").as("height"),
        (pmod(col("doc_id"), lit(8)) + 1).cast("int").as("n_frames")).as("meta"))

  /** STUB decode: a real implementation would decode image/audio bytes via
    * a codec library here. Deterministic fake: one float per payload byte
    * pair, batch-applied per partition (the hot loop never crosses the
    * JVM/driver boundary and never shuffles). */
  def fakeDecodeFeatures(spark: SparkSession, media: DataFrame, dim: Int = 8): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val out: Dataset[Row] = media.select(col("doc_id"), col("media"))
      .mapPartitions { rows =>
        // batch shape: iterator-in / iterator-out, one buffer reused
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val n = if (bytes == null) 0 else bytes.length
          val feats = Array.tabulate(dim) { i =>
            if (n == 0) 0.0f
            else ((bytes(i % n) & 0xff) * 31 + (bytes((i * 2 + 1) % n) & 0xff)).toFloat / 8192.0f
          }
          Row(id, feats)
        }
      }(enc)
    out.toDF()
  }

  /** Frame sampling for "video" payloads: emit every k-th byte-slice as a
    * frame (posexplode keeps the (doc, frame_idx) grain; blobs are sliced,
    * not duplicated whole). */
  def sampleFrames(media: DataFrame, everyK: Int = 2): DataFrame =
    media
      .select(col("doc_id"), col("meta.n_frames").as("n_frames"), col("media"))
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, n_frames - 1), i -> substring(media, i * 4 + 1, 4))"))
          .as(Seq("frame_idx", "frame_bytes")))
      .filter(col("frame_idx") % everyK === 0)

  /** "Resize" stub: recompute metadata, payload untouched (a real resize
    * would transform bytes in the same mapPartitions shape as decode). */
  def resizeMeta(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      struct(col("meta.format").as("format"), lit(w).as("width"),
             lit(h).as("height"), col("meta.n_frames").as("n_frames")))
}
