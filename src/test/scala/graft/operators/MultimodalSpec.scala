package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    (0L, "hello world".getBytes("UTF-8"), "image"),
    (1L, Array.fill[Byte](1024)(7), "video"),
    (2L, null.asInstanceOf[Array[Byte]], "audio")
  ).toDF("id", "payload", "media_type")

  test("decode stub: schema plumbing, typed metadata, normalized features") {
    val out = Multimodal.decodeStub(media, "payload", "media_type")
    assert(out.schema.fieldNames.toSeq === Seq("id", "payload", "media_type", "meta", "features"))
    val rows = out.orderBy("id").collect()
    val img = rows(0)
    val meta = img.getStruct(img.fieldIndex("meta"))
    assert(meta.getString(0) === "image")
    assert(meta.getInt(1) > 0 && meta.getInt(2) > 0)
    val feats = img.getSeq[Double](img.fieldIndex("features"))
    assert(feats.size === 16)
    assert(math.abs(feats.sum - 1.0) < 1e-9) // L1-normalized histogram
    // video: frame count derives from payload length
    val vid = rows(1)
    assert(vid.getStruct(vid.fieldIndex("meta")).getInt(3) === 1 + 1024 / 256)
    // null payload survives with zero features
    val aud = rows(2)
    assert(aud.getSeq[Double](aud.fieldIndex("features")).sum === 0.0)
  }

  test("decode is deterministic") {
    val a = Multimodal.decodeStub(media, "payload", "media_type")
      .drop("payload").collect().map(_.toString).sorted
    val b = Multimodal.decodeStub(media, "payload", "media_type")
      .drop("payload").collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("frame sampling strides through the payload") {
    val out = Multimodal.frameSample(media.filter($"id" === 1), "payload", 2)
    val idx = out.select("frame_idx").as[Long].collect().sorted
    assert(idx.toSeq === Seq(0L, 2L)) // 1024 bytes → frames 0..3, every 2nd
    val lens = out.select(length(col("frame_bytes"))).as[Int].collect()
    assert(lens.forall(_ <= 256))
  }
}
