package graft.mm

import graft.QuerySpec
import graft.model.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, batch feature extraction over partitions.
  *
  * The container has no image/audio codecs, so the DECODE step is a clearly
  * marked deterministic stub ([[MediaCodec.decodeStub]]); everything
  * Spark-side — binary schema, metadata struct, partition-batched iteration,
  * typed output schema — is real and tested. Swapping the stub for a real
  * codec (JNI ffmpeg, javacv, …) changes one function.
  *
  * Scale notes: payload bytes stay in executors end-to-end (no collect); the
  * mapPartitions boundary processes a full partition per task, which is the
  * JVM analog of Arrow-batched `mapInPandas`; feature extraction is
  * shuffle-free.
  */
object Multimodal {

  /** A fake "media" record: the document text reinterpreted as payload
    * bytes + typed metadata. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], lang: String, source: String)

  /** Extracted features (what a real decoder would emit). */
  case class MediaFeatures(
      doc_id: Long, n_bytes: Int, mean_byte: Double, max_byte: Int,
      n_frames: Int, first_frame_hash: Long)

  object MediaCodec {
    val FrameSize = 64 // bytes per fake "frame"

    /** STUB: stands in for image/audio decode (no codecs in this
      * container). Deterministic: byte-level moments + per-frame slicing of
      * the payload. The signature — bytes in, typed features out — is the
      * real contract. */
    def decodeStub(r: MediaRecord): MediaFeatures = {
      val b = r.payload
      var sum = 0L; var max = 0
      var i = 0
      while (i < b.length) {
        val u = b(i) & 0xFF
        sum += u; if (u > max) max = u
        i += 1
      }
      val nFrames = (b.length + FrameSize - 1) / FrameSize
      var h = 0xcbf29ce484222325L
      i = 0
      while (i < math.min(FrameSize, b.length)) {
        h ^= (b(i) & 0xFF).toLong; h *= 0x100000001b3L; i += 1
      }
      MediaFeatures(
        r.doc_id, b.length,
        if (b.length == 0) 0.0 else sum.toDouble / b.length,
        max, nFrames, h)
    }
  }

  /** documents → media records: payload = utf8 bytes of text (binary
    * column), metadata kept as typed columns. */
  def asMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        col("lang"), col("source"))
      .as[MediaRecord]
  }

  /** Partition-batched feature extraction through the stub codec. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(MediaCodec.decodeStub))
  }

  /** Metadata/features expressible in pure SQL (oracle-checked): byte
    * length of the binary payload, content hash, head sample. */
  val multimodalMeta: QuerySpec = QuerySpec.sql(
    "q_multimodal_meta",
    """SELECT doc_id,
      |       octet_length(encode(text)) AS n_bytes,
      |       md5(text) AS content_hash,
      |       left(text, 16) AS head,
      |       lang, source
      |FROM documents ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        octet_length(col("text").cast("binary")).as("n_bytes"),
        md5(col("text")).as("content_hash"),
        expr("left(text, 16)").as("head"),
        col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Full decode path through the stub codec. The stub is deterministic
    * byte arithmetic, so it has a real oracle: DuckDB replays the byte
    * moments with list lambdas and the FNV-1a 64-bit head hash with a
    * recursive CTE in HUGEINT (mod-2^64 each step, re-signed at the end —
    * ≤64 iterations/doc). `mean_byte` is exact cross-engine: both sides
    * divide the same integer sum by the same integer length in one IEEE
    * double op. */
  val multimodalDecode: QuerySpec = QuerySpec.sql(
    "q_multimodal_decode",
    s"""WITH RECURSIVE base AS (
       |  SELECT doc_id, text,
       |         CAST(length(text) AS INTEGER) AS n_bytes,
       |         CAST(ceil(length(text) / ${MediaCodec.FrameSize}.0) AS INTEGER) AS n_frames,
       |         CAST(LEAST(${MediaCodec.FrameSize}, length(text)) AS INTEGER) AS hn
       |  FROM documents),
       |moments AS (
       |  SELECT doc_id,
       |         COALESCE(CAST(list_sum(list_transform(range(1, length(text) + 1),
       |                    i -> ascii(substring(text, CAST(i AS INTEGER), 1)))) AS BIGINT), 0) AS bsum,
       |         COALESCE(CAST(list_max(list_transform(range(1, length(text) + 1),
       |                    i -> ascii(substring(text, CAST(i AS INTEGER), 1)))) AS INTEGER), 0) AS max_byte
       |  FROM documents),
       |fnv AS (
       |  SELECT doc_id, text, hn, 0 AS i, CAST(14695981039346656037 AS HUGEINT) AS h FROM base
       |  UNION ALL
       |  SELECT doc_id, text, hn, i + 1,
       |         ${graft.exprs.OracleSql.fnvStep("ascii(substring(text, i + 1, 1))")}
       |  FROM fnv WHERE i < hn)
       |SELECT b.doc_id, b.n_bytes,
       |       CASE WHEN b.n_bytes = 0 THEN 0.0 ELSE CAST(m.bsum AS DOUBLE) / b.n_bytes END AS mean_byte,
       |       m.max_byte, b.n_frames,
       |       ${graft.exprs.OracleSql.signed("f.h")} AS first_frame_hash
       |FROM base b JOIN moments m USING (doc_id)
       |JOIN (SELECT doc_id, h FROM fnv WHERE i = hn) f USING (doc_id)
       |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    extractFeatures(asMedia(spark, dir)).toDF().orderBy(col("doc_id"))
  }

  /** Frame sampling — the video-frame primitive as real Spark plumbing:
    * slice the binary payload into fixed 64-byte "frames" (a row per
    * frame via explode of an index sequence), KEEP EVERY 4th frame
    * (the sample), hash each kept frame. Payload bytes never leave the
    * executors; the explode fan-out is bounded by payload size / frame
    * size. Oracle: DuckDB replays the same slicing on the (ASCII) text. */
  val multimodalFrames: QuerySpec = QuerySpec.sql(
    "q_multimodal_frames",
    s"""WITH f AS (
       |  SELECT doc_id,
       |         unnest(range(0, CAST(ceil(length(text) / ${MediaCodec.FrameSize}.0) AS BIGINT))) AS frame_idx,
       |         text
       |  FROM documents)
       |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       |       CAST(length(substring(text, CAST(frame_idx * ${MediaCodec.FrameSize} + 1 AS INTEGER), ${MediaCodec.FrameSize})) AS INTEGER) AS frame_bytes,
       |       md5(substring(text, CAST(frame_idx * ${MediaCodec.FrameSize} + 1 AS INTEGER), ${MediaCodec.FrameSize})) AS frame_hash
       |FROM f WHERE frame_idx % 4 = 0
       |ORDER BY doc_id, frame_idx""".stripMargin) { (spark, dir) =>
    val fs = MediaCodec.FrameSize
    // Empty payload: sequence(0, -1) DESCENDS to [0, -1] (the same trap as
    // the n-gram shingles), which would emit a phantom frame the oracle's
    // range(0, 0) doesn't — guard to an empty array so explode drops the row.
    val frameIdx = when(octet_length(col("payload")) > 0,
      sequence(lit(0),
        ceil(octet_length(col("payload")) / lit(fs.toDouble)).cast("int") - 1))
      .otherwise(array().cast("array<int>"))
    asMedia(spark, dir).toDF()
      .select(col("doc_id"), col("payload"), explode(frameIdx).as("frame_idx"))
      .filter(col("frame_idx") % 4 === 0) // the sample: every 4th frame
      .select(col("doc_id"), col("frame_idx"),
        expr(s"substring(payload, frame_idx * $fs + 1, $fs)").as("frame"))
      .select(col("doc_id"), col("frame_idx"),
        octet_length(col("frame")).as("frame_bytes"),
        md5(col("frame")).as("frame_hash"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Audio-waveform primitive: payload bytes as samples, windowed into
    * fixed frames, per-frame ENERGY (sum of squared sample values —
    * integer-exact, so cross-engine stable), per-doc loudness profile with
    * a deterministic peak-frame argmax (max energy, ties to the earliest
    * frame via struct ordering). All column expressions over the bounded
    * frame explode — the real resample/codec step would slot in at the
    * frame boundary exactly like [[MediaCodec.decodeStub]]. Oracle replays
    * the byte math on the (ASCII) text with per-char code points. */
  val multimodalAudio: QuerySpec = QuerySpec.sql(
    "q_multimodal_audio",
    s"""WITH f AS (
       |  SELECT doc_id,
       |         unnest(range(0, CAST(ceil(length(text) / ${MediaCodec.FrameSize}.0) AS BIGINT))) AS frame_idx,
       |         text
       |  FROM documents),
       |e AS (
       |  SELECT doc_id, frame_idx,
       |         substring(text, CAST(frame_idx * ${MediaCodec.FrameSize} + 1 AS INTEGER), ${MediaCodec.FrameSize}) AS fr
       |  FROM f),
       |en AS (
       |  SELECT doc_id, frame_idx,
       |         CAST(list_sum(list_transform(range(1, length(fr) + 1),
       |                i -> ascii(substring(fr, CAST(i AS INTEGER), 1))
       |                     * ascii(substring(fr, CAST(i AS INTEGER), 1)))) AS BIGINT) AS energy
       |  FROM e),
       |r AS (
       |  SELECT doc_id, frame_idx, energy,
       |         row_number() OVER (PARTITION BY doc_id
       |                            ORDER BY energy DESC, frame_idx ASC) AS rn
       |  FROM en)
       |SELECT en.doc_id,
       |       CAST(count(*) AS BIGINT) AS n_frames,
       |       CAST(sum(en.energy) AS BIGINT) AS total_energy,
       |       min(CASE WHEN r.rn = 1 THEN r.frame_idx END) AS peak_frame,
       |       min(CASE WHEN r.rn = 1 THEN r.energy END) AS peak_energy
       |FROM en JOIN r ON en.doc_id = r.doc_id AND en.frame_idx = r.frame_idx
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val fs = MediaCodec.FrameSize
    val frameIdx = when(octet_length(col("payload")) > 0,
      sequence(lit(0),
        ceil(octet_length(col("payload")) / lit(fs.toDouble)).cast("int") - 1))
      .otherwise(array().cast("array<int>"))
    val energies = asMedia(spark, dir).toDF()
      .select(col("doc_id"), col("payload"), explode(frameIdx).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        expr(s"substring(cast(payload as string), frame_idx * $fs + 1, $fs)").as("fr"))
      .select(col("doc_id"), col("frame_idx"),
        expr("""aggregate(
                |  transform(sequence(1, length(fr)),
                |            i -> cast(ascii(substring(fr, i, 1)) as bigint)
                |                 * cast(ascii(substring(fr, i, 1)) as bigint)),
                |  0L, (acc, x) -> acc + x)""".stripMargin).as("energy"))
    energies.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_frames"),
        sum(col("energy")).as("total_energy"),
        // argmax via struct ordering: (energy, -frame_idx) max → highest
        // energy, earliest frame on ties
        max(struct(col("energy"), (-col("frame_idx")).as("neg_idx"))).as("pk"))
      .select(col("doc_id"), col("n_frames"), col("total_energy"),
        (-col("pk.neg_idx")).as("peak_frame"),
        col("pk.energy").as("peak_energy"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[QuerySpec] =
    Seq(multimodalMeta, multimodalDecode, multimodalFrames, multimodalAudio)
}
