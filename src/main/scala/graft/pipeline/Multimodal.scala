package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2-C multimodal-column plumbing.
  *
  * Real pipelines carry image/audio/video as opaque `binary` columns with
  * typed metadata and decode via vectorized UDFs over batches. The media
  * codecs are NOT available in this environment, so the decode step is a
  * clearly-marked deterministic STUB — but everything Spark-cares-about is
  * real: the binary column, the case-class Encoders, the `mapPartitions`
  * batch shape (one decoder init per partition, streamed rows), and the
  * derived-metadata schema.
  */
object Multimodal {

  /** A document's payload as an opaque binary blob. */
  case class DocBlob(doc_id: Long, data: Array[Byte])

  /** Metadata a real decoder would emit. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
                       height: Long, format: String)

  /** STUB decoder: stands in for e.g. an image codec. Deterministic
    * function of the bytes only, so the oracle can verify the plumbing.
    * A real deployment swaps this body for the codec call; the partition
    * shape (init-once, stream rows) is already right.
    */
  def stubDecode(b: DocBlob): MediaMeta = MediaMeta(
    doc_id = b.doc_id,
    n_bytes = b.data.length.toLong,
    width = 16L + (b.data.length % 64),
    height = 16L + ((b.data.headOption.getOrElse(0: Byte) & 0xff) % 32),
    format = "fake/raw")

  // --- m1_multimodal ------------------------------------------------------
  def m1Multimodal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("data"))
      .as[DocBlob]
      .mapPartitions { it =>
        // decoder init would happen here, once per partition
        it.map(stubDecode)
      }
      .toDF()
      .orderBy("doc_id")
  }

  // Octet-based oracle: strlen is BYTE length and hex(encode(text)) yields
  // two hex chars per UTF-8 byte, so the contract holds for ANY payload —
  // no ASCII assumption (this DuckDB has no blob substring; the hex string
  // is the byte-addressable view).
  val m1Sql: String =
    """SELECT doc_id,
      |  CAST(strlen(text) AS BIGINT) AS n_bytes,
      |  16 + CAST(strlen(text) AS BIGINT) % 64 AS width,
      |  16 + CAST(CASE WHEN strlen(text) = 0 THEN 0
      |                 ELSE ('0x' || substr(hex(encode(text)), 1, 2))::BIGINT
      |            END AS BIGINT) % 32 AS height,
      |  'fake/raw' AS format
      |FROM documents ORDER BY doc_id""".stripMargin

  // --- m2_frame_sample ----------------------------------------------------
  // Video-style frame sampling over the binary payload: split into fixed
  // 64-byte frames, keep every 4th, emit per-frame metadata + checksum.
  // Same mapPartitions batch shape as m1 (decoder init once per
  // partition); a real deployment replaces the checksum with a codec's
  // frame decode. flatMap keeps it streaming — no document's full frame
  // list is ever materialized per row.
  val FrameBytes = 64
  val SampleEvery = 4

  case class FrameMeta(doc_id: Long, frame_idx: Long, n_bytes: Long,
                       checksum: Long)

  def m2FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("data"))
      .as[DocBlob]
      .mapPartitions { it =>
        it.flatMap { b =>
          val nFrames = (b.data.length + FrameBytes - 1) / FrameBytes
          (0 until nFrames).iterator
            .filter(_ % SampleEvery == 0)
            .map { f =>
              val start = f * FrameBytes
              val end = math.min(start + FrameBytes, b.data.length)
              var sum = 0L
              var i = start
              while (i < end) { sum += (b.data(i) & 0xff); i += 1 }
              FrameMeta(b.doc_id, f.toLong, (end - start).toLong, sum)
            }
        }
      }
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  // Octet-based oracle (see m1Sql): framing offsets index the hex string
  // at 2 chars per byte, so frame boundaries and checksums are byte
  // semantics for any payload, matching the Spark side's UTF-8 bytes.
  val m2Sql: String =
    s"""SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
       |  CAST(LEAST($FrameBytes, nb - f * $FrameBytes) AS BIGINT) AS n_bytes,
       |  CAST(list_reduce(list_prepend(0,
       |    list_transform(range(1, CAST(LEAST($FrameBytes, nb - f * $FrameBytes) AS BIGINT) + 1),
       |                   i -> ('0x' || substr(h, f * ${2 * FrameBytes} + 2 * i - 1, 2))::BIGINT)),
       |    (a, b) -> a + b) AS BIGINT) AS checksum
       |FROM (
       |  SELECT doc_id, f, strlen(text) AS nb, hex(encode(text)) AS h
       |  FROM (
       |    SELECT doc_id, text,
       |      unnest(range(0, CAST(ceil(strlen(text) / $FrameBytes.0) AS BIGINT))) AS f
       |    FROM documents)
       |  WHERE f % $SampleEvery = 0)
       |ORDER BY doc_id, frame_idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_multimodal" -> (m1Multimodal _),
    "m2_frame_sample" -> (m2FrameSample _))

  val oracles: Map[String, String] = Map(
    "m1_multimodal" -> m1Sql,
    "m2_frame_sample" -> m2Sql)
}
