package graft

import graft.ext.Multimodal
import graft.Tables.t
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema contract, deterministic stub decode,
  * partition preservation, frame sampling grain. */
class MultimodalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val media = Multimodal.mediaTable(t(spark, dir, "documents"))

  test("media table matches the declared schema contract") {
    val got = media.schema
    assert(got("media").dataType.typeName === "binary")
    val meta = got("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq === Seq("format", "width", "height", "n_frames"))
    assert(media.count() === 500)
    // md5 payload = 16 bytes, never null
    val lens = media.select(length(col("media"))).distinct().collect().map(_.getInt(0))
    assert(lens.toSeq === Seq(16))
  }

  test("stub decode: deterministic, fixed-dim, no shuffle of blobs") {
    val f1 = Multimodal.fakeDecodeFeatures(spark, media)
    val f2 = Multimodal.fakeDecodeFeatures(spark, media)
    assert(f1.schema("features").dataType.simpleString === "array<float>")
    val a = f1.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val b = f2.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(a.sameElements(b))
    assert(a.forall(_._2.length == 8))
    // decode is map-only: partition count preserved (no shuffle stage)
    assert(f1.rdd.getNumPartitions === media.select("doc_id", "media").rdd.getNumPartitions)
  }

  test("frame sampling keeps (doc, frame_idx) grain and strides correctly") {
    val frames = Multimodal.sampleFrames(media, everyK = 2)
    val byDoc = frames.groupBy("doc_id").agg(count(lit(1)).as("n"),
        max(col("frame_idx")).as("max_idx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // n_frames = doc_id % 8 + 1; sampled = ceil(n_frames / 2)
    byDoc.foreach { case (id, n, maxIdx) =>
      val nf = (id % 8 + 1).toInt
      assert(n === (nf + 1) / 2, s"doc $id")
      assert(maxIdx % 2 === 0)
    }
  }

  test("resize stub rewrites metadata only") {
    val resized = Multimodal.resizeMeta(media, 32, 32)
    val r = resized.select(col("meta.width"), col("meta.height"),
      length(col("media"))).distinct().collect()
    assert(r.map(x => (x.getInt(0), x.getInt(1), x.getInt(2))).toSeq === Seq((32, 32, 16)))
  }
}
