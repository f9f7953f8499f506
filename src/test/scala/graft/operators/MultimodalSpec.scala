package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello world"),
    (2L, "x"),
    (3L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("payload attach + stub decode: deterministic metadata, null passthrough") {
    val out = Multimodal.decodeMeta(Multimodal.attachPayload(docs))
    val metas = out.select("doc_id", "image_meta.width", "image_meta.height",
        "image_meta.format", "image_meta.n_bytes")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getInt(2), r.getString(3), r.getLong(4)))))
      .toMap
    // "hello world": bytes h=0x68, e=0x65; len 11 → odd → jpeg
    assert(metas(1L) === Some((16 + 0x68, 16 + 0x65, "jpeg", 11L)))
    // "x": single byte; h from missing second byte → 16; len 1 → jpeg
    assert(metas(2L) === Some((16 + 'x'.toInt, 16, "jpeg", 1L)))
    assert(metas(3L) === None) // null payload → null meta
  }

  test("feature extraction yields fixed-dim vectors feeding Similarity") {
    val out = Multimodal.extractFeatures(Multimodal.attachPayload(docs), dim = 4)
    val feats = out.filter($"doc_id" === 1).select("features")
      .as[Seq[Float]].head()
    assert(feats.length === 4)
    assert(feats.sum > 0.0f)
    // deterministic: same input → same features
    val again = Multimodal.extractFeatures(Multimodal.attachPayload(docs), dim = 4)
      .filter($"doc_id" === 1).select("features").as[Seq[Float]].head()
    assert(feats === again)
  }

  test("frame sampling produces bounded frame lists") {
    val out = Multimodal.frameSample(
      Multimodal.attachPayload(Seq((1L, "a" * 1000)).toDF("doc_id", "text")),
      everyN = 2, frameBytes = 64)
    val frames = out.select("frames").as[Seq[Array[Byte]]].head()
    assert(frames.nonEmpty)
    assert(frames.forall(_.length <= 64))
  }

  test("payload-aware repartitioning bounds bytes per partition") {
    val big = Multimodal.attachPayload(
      (1 to 100).map(i => (i.toLong, "x" * 10000)).toDF("doc_id", "text"))
    val parts = Multimodal.repartitionByPayload(big, targetMb = 1)
      .rdd.getNumPartitions
    assert(parts >= 1) // 1MB total < 1MB target → 1 partition; shape check
  }
}
