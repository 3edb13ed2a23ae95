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

  test("resize stub: byte budget enforced, meta carries target dims, small payloads pass through") {
    val out = Multimodal.resizeStub(media, "payload", "media_type", 16, 16)
    assert(out.schema.fieldNames.toSeq ===
      Seq("id", "payload", "media_type", "resized", "meta"))
    val rows = out.orderBy("id").collect()
    // 11-byte payload under the 256-byte budget passes through untouched
    assert(rows(0).getAs[Array[Byte]]("resized").toSeq === "hello world".getBytes("UTF-8").toSeq)
    // 1024 bytes downsample to exactly the 16×16 budget, uniform stride
    val vid = rows(1).getAs[Array[Byte]]("resized")
    assert(vid.length === 256)
    assert(vid.forall(_ == 7))
    // meta reports the TARGET dims (the fixed-tensor-shape contract)
    val meta = rows(1).getStruct(rows(1).fieldIndex("meta"))
    assert((meta.getInt(1), meta.getInt(2)) === ((16, 16)))
    // null payload → empty bytes, never a crash
    assert(rows(2).getAs[Array[Byte]]("resized").length === 0)
  }

  test("frame sampling strides through the payload") {
    val out = Multimodal.frameSample(media.filter($"id" === 1), "payload", 2)
    val idx = out.select("frame_idx").as[Long].collect().sorted
    assert(idx.toSeq === Seq(0L, 2L)) // 1024 bytes → frames 0..3, every 2nd
    val lens = out.select(length(col("frame_bytes"))).as[Int].collect()
    assert(lens.forall(_ <= 256))
  }
}
