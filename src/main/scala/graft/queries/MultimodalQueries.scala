package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.tables.Tables

/** Multimodal-column coverage (builder-brief first-class requirement): a
  * media fixture is SYNTHESIZED as real container bytes (PNG signature +
  * IHDR, canonical 44-byte WAV header) carrying the document text as
  * payload, then the metadata decoders parse the bytes back. The DuckDB
  * oracle computes the expected values in CLOSED FORM from doc_id
  * arithmetic — so a green row proves the byte-level encode/decode round
  * trip, not just that two engines ran the same expression.
  */
object MultimodalQueries {

  /** Even doc_id → PNG (width = id%64+1, height = id%32+1); odd → WAV
    * (byte rate = 16000·(id%4+1)). Payload = utf8 text bytes. */
  private def withMedia(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val payload = encode(col("text"), "UTF-8")
    val pngSig = lit(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    val width = (id % 64 + 1).cast("long")
    val height = (id % 32 + 1).cast("long")
    val png = concat(pngSig, Multimodal.toBeBytes(lit(13L), 4) /* IHDR length */,
      lit("IHDR".getBytes), Multimodal.toBeBytes(width, 4),
      Multimodal.toBeBytes(height, 4), payload)
    val byteRate = (lit(16000L) * (id % 4 + 1)).cast("long")
    val wav = concat(lit("RIFF".getBytes), Multimodal.toLeBytes(length(payload) + 36, 4),
      lit("WAVE".getBytes), lit("fmt ".getBytes),
      Multimodal.toLeBytes(lit(16L), 4), // fmt chunk size
      Multimodal.toLeBytes(lit(1L), 2), // pcm
      Multimodal.toLeBytes(lit(1L), 2), // mono
      Multimodal.toLeBytes(byteRate / 2, 4), // sample rate (arbitrary)
      Multimodal.toLeBytes(byteRate, 4), // byte rate at offset 29
      Multimodal.toLeBytes(lit(2L), 2), // block align
      Multimodal.toLeBytes(lit(16L), 2), // bits/sample
      lit("data".getBytes), Multimodal.toLeBytes(length(payload), 4),
      payload)
    docs.withColumn("media", when(id % 2 === 0, png).otherwise(wav))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // byte-level metadata extraction round trip
    "q37_multimodal_meta" -> { (s, dir) =>
      withMedia(Tables.documents(s, dir).filter(col("doc_id") < 200))
        .select(col("doc_id"),
          Multimodal.mediaType(col("media")).as("media_type"),
          Multimodal.pngWidth(col("media")).as("width"),
          Multimodal.pngHeight(col("media")).as("height"),
          Multimodal.wavByteRate(col("media")).as("byte_rate"),
          round(Multimodal.wavDurationMs(col("media")), 3).as("duration_ms"))
        .orderBy("doc_id")
    },

    // per-modality exact dedup over the binary payloads
    "q38_multimodal_dedup" -> { (s, dir) =>
      Multimodal.dedupByModality(
          withMedia(Tables.documents(s, dir)), "doc_id", "media")
        .select(col("media_type"), col("keeper"), col("n_copies"))
        .orderBy("media_type", "keeper")
    }
  )

  val oracle: Map[String, String] = Map(
    // closed-form expectation: the oracle never sees the bytes
    "q37_multimodal_meta" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS media_type,
        | CASE WHEN doc_id % 2 = 0 THEN doc_id % 64 + 1 END AS width,
        | CASE WHEN doc_id % 2 = 0 THEN doc_id % 32 + 1 END AS height,
        | CASE WHEN doc_id % 2 = 1 THEN 16000 * (doc_id % 4 + 1) END AS byte_rate,
        | CASE WHEN doc_id % 2 = 1 THEN
        |   round(octet_length(encode(text))::DOUBLE / (16000 * (doc_id % 4 + 1)) * 1000.0, 3)
        | END AS duration_ms
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,

    // identical payload bytes ⟺ identical (modality, text): replay as a
    // group-by over the closed form
    "q38_multimodal_dedup" ->
      """SELECT CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS media_type,
        | min(doc_id) AS keeper, count(*) AS n_copies
        |FROM documents
        |GROUP BY media_type, doc_id % 2 = 0,
        |  CASE WHEN doc_id % 2 = 0 THEN doc_id % 64 END,
        |  CASE WHEN doc_id % 2 = 0 THEN doc_id % 32 END,
        |  CASE WHEN doc_id % 2 = 1 THEN doc_id % 4 END,
        |  text
        |ORDER BY media_type, keeper""".stripMargin
  )
}
