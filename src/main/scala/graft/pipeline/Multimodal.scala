package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2-C multimodal-column plumbing.
  *
  * Real pipelines carry image/audio/video as opaque `binary` columns with
  * typed metadata and decode via vectorized UDFs over batches. The image
  * path (m1/m3) runs a REAL codec — [[Ppm]], a genuine P6 header + raster
  * parser with typed decode errors — over payloads synthesized
  * deterministically from each document's bytes (the container has no
  * stored media files or heavyweight codecs, so synthesis stands in for
  * the file read; the decode itself interprets the format for real).
  * Everything Spark-cares-about is real throughout: the binary column,
  * the case-class Encoders, the `mapPartitions` batch shape (one decoder
  * init per partition, streamed rows), and the derived-metadata schema.
  */
object Multimodal {

  /** A document's payload as an opaque binary blob. */
  case class DocBlob(doc_id: Long, data: Array[Byte])

  /** Metadata the decoder emits. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
                       height: Long, format: String)

  /** Deterministic media synthesis: each document's stored payload is a
    * canonical P6 whose dimensions derive from (byte length, first byte)
    * and whose raster tiles the document bytes cyclically (zero raster
    * for an empty document). Deterministic by construction, so the
    * octet-based oracles can state the decoder's expected output — while
    * the decoder itself genuinely parses the container format.
    */
  def synthPpm(b: DocBlob): Array[Byte] = {
    val w = 16 + (b.data.length % 64)
    val h = 16 + ((b.data.headOption.getOrElse(0: Byte) & 0xff) % 32)
    val raster = new Array[Byte](3 * w * h)
    if (b.data.length > 0) {
      var i = 0
      while (i < raster.length) { raster(i) = b.data(i % b.data.length); i += 1 }
    }
    Ppm.encode(Ppm.Image(w, h, raster))
  }

  // --- m1_multimodal ------------------------------------------------------
  def m1Multimodal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("data"))
      .as[DocBlob]
      .mapPartitions { it =>
        // decoder init would happen here, once per partition
        it.map { b =>
          val payload = synthPpm(b)
          val img = Ppm.decode(payload) // REAL parse: magic, dims, raster check
          MediaMeta(b.doc_id, payload.length.toLong,
            img.width.toLong, img.height.toLong, "image/x-portable-pixmap")
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  // Octet-based oracle: strlen is BYTE length and hex(encode(text)) yields
  // two hex chars per UTF-8 byte, so the contract holds for ANY payload —
  // no ASCII assumption (this DuckDB has no blob substring; the hex string
  // is the byte-addressable view). n_bytes is the FULL P6 size: 3-byte
  // magic+newline, the two ASCII dimension fields and their separator,
  // "\n255\n" (5), then the 3·w·h raster.
  val m1Sql: String =
    """WITH dims AS (
      |  SELECT doc_id,
      |    16 + CAST(strlen(text) AS BIGINT) % 64 AS width,
      |    16 + CAST(CASE WHEN strlen(text) = 0 THEN 0
      |                   ELSE ('0x' || substr(hex(encode(text)), 1, 2))::BIGINT
      |              END AS BIGINT) % 32 AS height
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(3 + strlen(CAST(width AS VARCHAR)) + 1
      |         + strlen(CAST(height AS VARCHAR)) + 5
      |         + 3 * width * height AS BIGINT) AS n_bytes,
      |  width, height,
      |  'image/x-portable-pixmap' AS format
      |FROM dims ORDER BY doc_id""".stripMargin

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

  // --- m3_resize ----------------------------------------------------------
  // Image resize over the DECODED raster: parse the P6 payload, downsample
  // the true w×h×3 raster 2× by strided pixel sampling (the R byte at
  // (2x, 2y), raster offset 3·(2y·src_w + 2x)), emitting the new dims and
  // a checksum of the sampled bytes. A real deployment swaps the sampler
  // for a proper scaler kernel; the decode feeding it is already a real
  // parse, and the Spark side — typed binary in, metadata out, init-once
  // per partition — is the real contract.
  case class ResizeMeta(doc_id: Long, src_w: Long, src_h: Long,
                        dst_w: Long, dst_h: Long, thumb_checksum: Long)

  def m3Resize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("data"))
      .as[DocBlob]
      .mapPartitions { it =>
        it.map { b =>
          val img = Ppm.decode(synthPpm(b))
          val dw = math.max(1, img.width / 2)
          val dh = math.max(1, img.height / 2)
          var sum = 0L
          var i = 0L
          val n = dw.toLong * dh
          while (i < n) {
            val x = i % dw; val y = i / dw
            // 2y < h and 2x < w by construction, so the offset is always
            // inside the decoded raster — no wrap, a true pixel read
            sum += (img.raster((3 * (2 * y * img.width + 2 * x)).toInt) & 0xff)
            i += 1
          }
          ResizeMeta(b.doc_id, img.width.toLong, img.height.toLong,
            dw.toLong, dh.toLong, sum)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  // Octet-based oracle (see m1Sql): one list_reduce over the dst raster.
  // The synthesized raster byte at offset j is document byte j % nb
  // (zeros for an empty document), so each sampled pixel reads the hex
  // string at 2 chars/byte of that index; an empty document's all-zero
  // raster sums to 0 (the CASE arm).
  val m3Sql: String =
    """WITH base AS (
      |  SELECT doc_id, strlen(text) AS nb, hex(encode(text)) AS h,
      |    16 + CAST(strlen(text) AS BIGINT) % 64 AS src_w,
      |    16 + CAST(CASE WHEN strlen(text) = 0 THEN 0
      |                   ELSE ('0x' || substr(hex(encode(text)), 1, 2))::BIGINT
      |              END AS BIGINT) % 32 AS src_h
      |  FROM documents),
      |dims AS (
      |  SELECT doc_id, nb, h, src_w, src_h,
      |    GREATEST(1, src_w // 2) AS dst_w, GREATEST(1, src_h // 2) AS dst_h
      |  FROM base)
      |SELECT doc_id, src_w, src_h, dst_w, dst_h,
      |  CAST(CASE WHEN nb = 0 THEN 0 ELSE list_reduce(list_prepend(0,
      |    list_transform(range(0, dst_w * dst_h),
      |      i -> ('0x' || substr(h,
      |             2 * ((3 * (2 * (i // dst_w) * src_w + 2 * (i % dst_w))) % nb) + 1,
      |             2))::BIGINT)),
      |    (a, b) -> a + b) END AS BIGINT) AS thumb_checksum
      |FROM dims ORDER BY doc_id""".stripMargin

  // --- m4_feature_extract -------------------------------------------------
  // Feature extraction over the binary payload: a 16-bin byte histogram
  // per document — the stand-in for an embedding/feature model over
  // decoded media. Long-format output (one row per (doc, bin)) keeps the
  // gate scalar-typed; the fraction is one IEEE division of exact longs.
  // Same init-once mapPartitions shape; the histogram kernel is the slot
  // where a real model's batch inference goes.
  val FeatureBins = 16

  case class FeatureRow(doc_id: Long, bin: Long, n: Long, frac: Double)

  def m4FeatureExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("data"))
      .as[DocBlob]
      .mapPartitions { it =>
        it.flatMap { b =>
          val hist = new Array[Long](FeatureBins)
          var i = 0
          while (i < b.data.length) {
            hist(((b.data(i) & 0xff) * FeatureBins) / 256) += 1
            i += 1
          }
          val total = b.data.length.toLong
          (0 until FeatureBins).iterator.map { bin =>
            // empty payload: frac 0.0, not 0/0 NaN (oracle mirrors)
            FeatureRow(b.doc_id, bin.toLong, hist(bin),
              if (total == 0) 0.0 else hist(bin).toDouble / total)
          }
        }
      }
      .toDF()
      .orderBy("doc_id", "bin")
  }

  val m4Sql: String =
    s"""WITH bytes AS (
       |  SELECT doc_id, nb, ('0x' || substr(h, 2 * i + 1, 2))::BIGINT AS b
       |  FROM (
       |    SELECT doc_id, strlen(text) AS nb, hex(encode(text)) AS h,
       |      unnest(range(0, strlen(text))) AS i
       |    FROM documents)),
       |hist AS (
       |  SELECT doc_id, (b * $FeatureBins) // 256 AS bin, COUNT(*) AS n
       |  FROM bytes GROUP BY 1, 2),
       |grid AS (
       |  SELECT doc_id, strlen(text) AS nb, unnest(range(0, $FeatureBins)) AS bin
       |  FROM documents)
       |SELECT g.doc_id, g.bin, COALESCE(h.n, 0) AS n,
       |  CASE WHEN g.nb = 0 THEN 0.0
       |       ELSE CAST(COALESCE(h.n, 0) AS DOUBLE) / g.nb END AS frac
       |FROM grid g LEFT JOIN hist h ON h.doc_id = g.doc_id AND h.bin = g.bin
       |ORDER BY g.doc_id, g.bin""".stripMargin

  // --- m5_pair_manifest ---------------------------------------------------
  // Training-record assembly: pair each document's raw payload with its
  // embedding-modality row (vec_id == doc_id where the pair exists) and
  // emit the shard manifest a multimodal data loader consumes — record
  // size (payload + 4 bytes/float dim + fixed header) and a DETERMINISTIC
  // shard assignment (ring hash mod ShardCount), so any worker can
  // recompute which shard holds which record without a catalog lookup,
  // and a resumed/backfilled write lands records in identical shards.
  // Pure declarative plan (no kernel needed): one equi-join of the two
  // modality tables on the pair key — at 100 TB both sides live
  // bucket-stored on that key (the a25 doctrine) and the join runs
  // co-located with zero exchange; the manifest write is partitioned by
  // `shard`. LEFT join: a payload without an embedding is still a
  // (text-only) training record, flagged not dropped.
  val ShardCount = 32

  /** THE shard-assignment formula — single definition on purpose: the
    * m5 manifest and st9's streaming router promise bit-identical
    * placement, which must hold by construction, not by parallel edits.
    */
  def shardOf(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(graft.functions.GenKey(
      concat(lit("m5/"), docId.cast("string"))), lit(ShardCount.toLong))

  def m5PairManifest(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("doc_id"),
        size(col("embedding")).cast("long").as("emb_dims"))
    d.join(e, Seq("doc_id"), "left")
      .withColumn("has_emb", col("emb_dims").isNotNull)
      .withColumn("emb_dims", coalesce(col("emb_dims"), lit(0L)))
      .withColumn("record_bytes",
        col("n_bytes") + lit(4L) * col("emb_dims") + lit(16L))
      .withColumn("shard", shardOf(col("doc_id")))
      .select("doc_id", "source", "n_bytes", "emb_dims", "has_emb",
              "record_bytes", "shard")
      .orderBy("doc_id")
  }

  val m5Sql: String = {
    val h = graft.arrays.HashRing.duckGenKey("'m5/' || CAST(d.doc_id AS VARCHAR)")
    s"""SELECT d.doc_id, d.source,
       |  CAST(strlen(d.text) AS BIGINT) AS n_bytes,
       |  CAST(COALESCE(len(e.embedding), 0) AS BIGINT) AS emb_dims,
       |  e.vec_id IS NOT NULL AS has_emb,
       |  CAST(strlen(d.text) + 4 * COALESCE(len(e.embedding), 0) + 16 AS BIGINT)
       |    AS record_bytes,
       |  ($h) % $ShardCount AS shard
       |FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
       |ORDER BY d.doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m5_pair_manifest" -> (m5PairManifest _),
    "m1_multimodal" -> (m1Multimodal _),
    "m2_frame_sample" -> (m2FrameSample _),
    "m3_resize" -> (m3Resize _),
    "m4_feature_extract" -> (m4FeatureExtract _))

  val oracles: Map[String, String] = Map(
    "m5_pair_manifest" -> m5Sql,
    "m1_multimodal" -> m1Sql,
    "m2_frame_sample" -> m2Sql,
    "m3_resize" -> m3Sql,
    "m4_feature_extract" -> m4Sql)
}
