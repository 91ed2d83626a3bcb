package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Byte-level checks of the multimodal decoders against hand-assembled
  * container bytes, plus shape/determinism of the stubbed deep-decode.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def pngBytes(width: Int, height: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + 4 + 8 + 5)
    bb.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    bb.putInt(13).put("IHDR".getBytes)
    bb.putInt(width).putInt(height)
    bb.put("extra".getBytes)
    bb.array()
  }

  private def wavBytes(byteRate: Int, dataLen: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
    bb.putInt(byteRate / 2).putInt(byteRate).putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(dataLen).put(new Array[Byte](dataLen))
    bb.array()
  }

  private def df(bytes: Array[Byte]*) = {
    import spark.implicits._
    bytes.zipWithIndex.map { case (b, i) => (i.toLong, b) }.toDF("id", "media")
  }

  test("PNG IHDR dimensions parse from real header bytes") {
    val rows = df(pngBytes(640, 480), pngBytes(1, 4294967), wavBytes(16000, 100))
      .select(Multimodal.mediaType(col("media")).as("t"),
        Multimodal.pngWidth(col("media")).as("w"),
        Multimodal.pngHeight(col("media")).as("h"))
      .orderBy("w").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("png", "png", "wav"))
    val png = rows.filter(_.getString(0) == "png")
    assert(png.map(r => (r.getLong(1), r.getLong(2))).toSet ==
      Set((640L, 480L), (1L, 4294967L)))
    assert(rows.filter(_.getString(0) == "wav").forall(_.isNullAt(1)))
  }

  test("WAV byte rate and duration parse little-endian header") {
    val r = df(wavBytes(32000, 8000))
      .select(Multimodal.wavByteRate(col("media")).as("br"),
        Multimodal.wavDurationMs(col("media")).as("ms")).collect()(0)
    assert(r.getLong(0) == 32000L)
    assert(math.abs(r.getDouble(1) - 250.0) < 1e-9) // 8000 bytes / 32000 Bps
  }

  test("unknown bytes classify as unknown with null metadata") {
    val r = df("not media at all".getBytes)
      .select(Multimodal.mediaType(col("media")).as("t"),
        Multimodal.pngWidth(col("media")).as("w")).collect()(0)
    assert(r.getString(0) == "unknown" && r.isNullAt(1))
  }

  test("per-modality dedup groups identical payloads") {
    val d = df(pngBytes(2, 2), pngBytes(2, 2), pngBytes(3, 3), wavBytes(16000, 4))
    val groups = Multimodal.dedupByModality(d, "id", "media").collect()
    assert(groups.length == 3)
    assert(groups.map(_.getAs[Long]("n_copies")).sorted.toSeq == Seq(1L, 1L, 2L))
  }

  test("stub embedding is deterministic with fixed dim and bounded values") {
    val d = df(pngBytes(9, 9))
    val a = d.select(Multimodal.fakeEmbedding(col("media"), 8).as("e"))
      .collect()(0).getSeq[Float](0)
    val b = d.select(Multimodal.fakeEmbedding(col("media"), 8).as("e"))
      .collect()(0).getSeq[Float](0)
    assert(a == b && a.length == 8)
    assert(a.forall(v => v >= 0.0f && v < 1.0f))
  }

  test("chunk sampler emits n slices of the requested width") {
    val d = df(wavBytes(16000, 1000))
    val c = d.select(Multimodal.chunks(col("media"), 4, 16).as("c"))
      .collect()(0).getSeq[Array[Byte]](0)
    assert(c.length == 4)
    assert(c.forall(_.length == 16))
  }
}
