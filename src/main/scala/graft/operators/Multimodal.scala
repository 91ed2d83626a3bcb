package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns with typed metadata extraction, per-modality
  * dedup, and (stubbed) feature extraction.
  *
  * The metadata parsers are REAL byte-level decoders of the public
  * container formats, composed from codegen'd binary built-ins
  * (`substring` on binary, `hex`/`unhex`, `conv`) — no UDF:
  *  - PNG: 8-byte signature, IHDR width/height at fixed big-endian offsets;
  *  - WAV: RIFF/WAVE magic, fmt-chunk byte rate (little-endian) + data size
  *    → duration.
  *
  * The DEEP decode (pixel/sample access, resize, frame sampling) is where a
  * real pipeline hands each partition's record batches to a native decoder
  * (`mapInPandas` / `mapPartitions` over an Arrow batch per the builder
  * brief); the image/audio libraries do not exist in this environment, so
  * [[fakeEmbedding]] stands in with a deterministic hash-derived vector,
  * keeping schema, batch shape, and partitioning real and testable.
  *
  * Scale notes: every op is a narrow per-row projection (no shuffle); dedup
  * is one hash-groupBy on (modality, digest) — identical shape to
  * [[TextDedup.exactDuplicates]], so the 100 TB story is the same: one
  * shuffle of (hash, id) pairs, never payload bytes. Fingerprints travel in
  * place of blobs the moment they are computed — a join that only needs
  * identity should never shuffle a frame.
  */
object Multimodal {

  // ------------------------------------------------------- type sniffing --

  private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** 'png' | 'wav' | 'unknown' from container magic bytes. */
  def mediaType(bin: Column): Column =
    when(substring(bin, 1, 8) === lit(PngMagic), "png")
      .when(substring(bin, 1, 4) === lit("RIFF".getBytes) &&
        substring(bin, 9, 4) === lit("WAVE".getBytes), "wav")
      .otherwise("unknown")

  // ------------------------------------------------- binary int plumbing --

  /** Big-endian unsigned int from `len` bytes at 1-based `offset`. */
  def beUInt(bin: Column, offset: Int, len: Int): Column =
    conv(hex(substring(bin, offset, len)), 16, 10).cast("long")

  /** Little-endian unsigned int from `len` bytes at 1-based `offset`. */
  def leUInt(bin: Column, offset: Int, len: Int): Column =
    conv(concat((0 until len).reverse.map(i =>
      hex(substring(bin, offset + i, 1))): _*), 16, 10).cast("long")

  /** Column → `len`-byte big-endian binary (fixture building). */
  def toBeBytes(v: Column, len: Int): Column =
    unhex(lpad(hex(v), len * 2, "0"))

  /** Column → `len`-byte little-endian binary. */
  def toLeBytes(v: Column, len: Int): Column =
    unhex(concat((0 until len).map(i =>
      lpad(hex(shiftright(v, i * 8).bitwiseAND(lit(255L))), 2, "0")): _*))

  // --------------------------------------------------- metadata decoders --

  /** PNG IHDR dimensions: width at byte 17, height at 21 (both 4-byte BE —
    * signature 8 + length 4 + "IHDR" 4). NULL for non-PNG input. */
  def pngWidth(bin: Column): Column =
    when(mediaType(bin) === "png", beUInt(bin, 17, 4)).otherwise(lit(null))
  def pngHeight(bin: Column): Column =
    when(mediaType(bin) === "png", beUInt(bin, 21, 4)).otherwise(lit(null))

  /** WAV byte rate: fmt chunk at canonical offset 29 (RIFF 12 + "fmt " 4 +
    * size 4 + audio_format 2 + channels 2 + sample_rate 4 = byte 29 holds
    * the 4-byte LE byte rate). */
  def wavByteRate(bin: Column): Column =
    when(mediaType(bin) === "wav", leUInt(bin, 29, 4)).otherwise(lit(null))

  /** WAV duration in milliseconds: data bytes / byte rate. Data size is the
    * payload after the canonical 44-byte header. */
  def wavDurationMs(bin: Column): Column =
    when(mediaType(bin) === "wav",
      (length(bin) - 44).cast("double") / wavByteRate(bin) * 1000.0)
      .otherwise(lit(null))

  // ------------------------------------------------------- dedup / id ----

  /** Content digest for exact media dedup — hashes the payload bytes, never
    * shuffles them. */
  def mediaDigest(bin: Column): Column = md5(bin)

  /** Per-modality exact duplicate groups (cf. [[TextDedup.exactDuplicates]]):
    * one row per (modality, digest) with keeper + copy count. */
  def dedupByModality(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.groupBy(mediaType(col(binCol)).as("media_type"),
        mediaDigest(col(binCol)).as("digest"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))

  // ------------------------------------------------------- deep decode ---

  /** STUB deep-decoder: a real pipeline decodes pixels/samples here (native
    * lib via mapInPandas/mapPartitions, one Arrow batch per call) and emits
    * an embedding. This stand-in derives a deterministic `dim`-float vector
    * from rolling xxhash64 of the payload — same schema (`array<float>`),
    * same per-partition batch shape, no library dependency. */
  def fakeEmbedding(bin: Column, dim: Int = 8): Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      (pmod(xxhash64(bin, i), lit(1000L)).cast("double") / 1000.0).cast("float"))

  /** Frame/chunk sampling: `n` evenly-spaced `width`-byte slices of the
    * payload — the plumbing a video frame-sampler runs before decode. */
  def chunks(bin: Column, n: Int, width: Int): Column =
    transform(sequence(lit(0), lit(n - 1)), i =>
      substring(bin, (i * greatest(length(bin) / n, lit(1))) + 1, lit(width)))
}
