package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tables.normalizeTs must be encoding-agnostic: the driver has shipped
  * events.ts as parquet TIMESTAMP(NANOS) (read as a nanos long under
  * `nanosAsLong`), TIMESTAMP(MICROS, adjustedToUTC=true) (TimestampType),
  * and TIMESTAMP(MICROS, adjustedToUTC=false) (TimestampNTZType) across
  * testdata generations. Round 8 died because the NTZ case was unhandled —
  * this spec writes the same rows in all three encodings and asserts the
  * normalized output is bit-identical, so the next encoding migration
  * fails HERE instead of in the driver gate.
  */
class TablesSpec extends SparkSpec {

  private def micros(df: DataFrame): Seq[(Long, Long)] = {
    import spark.implicits._
    df.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
  }

  private lazy val base: Seq[(Long, Long)] = Seq(
    (1L, 1704067200000000L),           // 2024-01-01T00:00:00Z
    (2L, 1704067200123456L),           // sub-second micros survive
    (3L, 1735689599999999L))           // end-of-2024 boundary

  test("normalizeTs: micros-NTZ, micros-UTC and nanos-long encodings agree") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ts-enc").toString

    // TimestampNTZType on disk (the current generator's encoding).
    base.toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/ntz")
    // TimestampType on disk (micros, adjustedToUTC=true).
    base.toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/tz")
    // Nanos as a raw long column, as nanosAsLong surfaces TIMESTAMP(NANOS).
    base.toDF("event_id", "us")
      .select(col("event_id"), (col("us") * 1000L).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/nanos")

    // date32 drift: midnight-UTC timestamps out, same rows
    base.toDF("event_id", "us")
      .select(col("event_id"),
        to_date(timestamp_micros(col("us"))).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/date32")
    val dateOut = Tables.normalizeTs(spark.read.parquet(s"$dir/date32"))
    assert(dateOut.schema("ts").dataType === TimestampType)
    assert(micros(dateOut).map(_._1) === base.map(_._1).sorted)
    assert(micros(dateOut).forall { case (_, us) => us % 86400000000L == 0 },
      "date32 must normalize to midnight-UTC timestamps")

    val expected = base.sortBy(_._1)
    for (enc <- Seq("ntz", "tz", "nanos")) {
      val out = Tables.normalizeTs(spark.read.parquet(s"$dir/$enc"))
      assert(out.schema("ts").dataType === TimestampType, s"encoding $enc")
      assert(micros(out) === expected, s"encoding $enc")
    }
  }

  test("normalizeTs: pre-epoch nanos truncate toward zero, matching DuckDB") {
    import spark.implicits._
    // DuckDB's parquet ns->us conversion truncates toward zero for pre-
    // epoch values too (verified empirically against DuckDB 1.x: -1500ns
    // reads back as -1us, not floor's -2us) — so the claimed oracle
    // parity is truncation EVERYWHERE, and these cases pin the Spark
    // side to it. Sub-us remainders on pre-epoch instants only exist in
    // the nanos encoding, hence the single-encoding test.
    val dir = Files.createTempDirectory("graft-ts-preepoch").toString
    val rows = Seq(
      (1L, -1000000000001500L),   // trunc -> -1000000000001 us (floor: -2)
      (2L, -315619200000001500L), // ~1960, trunc -> -315619200000001 us
      (3L, -1000000000000000L),   // exact us boundary: no remainder
      (4L, 1704067200123456789L)) // post-epoch control, trunc -> ...123456 us
    rows.toDF("event_id", "ts").write.mode("overwrite").parquet(s"$dir/nanos")
    val out = micros(Tables.normalizeTs(spark.read.parquet(s"$dir/nanos")))
    assert(out === Seq(
      (1L, -1000000000001L),
      (2L, -315619200000001L),
      (3L, -1000000000000L),
      (4L, 1704067200123456L)))
  }

  test("normalizeTs: an implausibly small int64 raises instead of reading as ~1970") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ts-guard").toString
    // epoch-SECONDS that lost their parquet logical type: interpreting
    // them as nanos would silently yield 1970-01-01T00:00:01.7 — the
    // magnitude guard must raise loudly instead
    Seq((1L, 1700000000L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/secs")
    val e = intercept[Exception] {
      Tables.normalizeTs(spark.read.parquet(s"$dir/secs")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("implausible for epoch-nanos")),
      s"expected the magnitude guard raise, got: $e")
    // the exact epoch (0) stays allowed
    Seq((1L, 0L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/zero")
    assert(micros(Tables.normalizeTs(spark.read.parquet(s"$dir/zero")))
      === Seq((1L, 0L)))
  }

  test("normalizeTs: an unknown encoding fails loudly, not silently") {
    import spark.implicits._
    val bad = Seq((1L, "2024-01-01")).toDF("event_id", "ts")
    val e = intercept[IllegalStateException](Tables.normalizeTs(bad))
    assert(e.getMessage.contains("StringType"))
  }

  test("normalizeTs: lineitem and orders temporal loaders are encoding-agnostic") {
    assert(Tables.lineitem(spark, sf).schema("l_shipdate").dataType === TimestampType)
    assert(Tables.orders(spark, sf).schema("o_orderdate").dataType === TimestampType)
  }

  test("normalizeTs: the real testdata events table reads as TimestampType") {
    val e = Tables.events(spark, sf)
    assert(e.schema("ts").dataType === TimestampType)
    assert(e.count() > 0)
  }

  test("embeddings loader rejects a silent float->double drift") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-emb-drift").toString
    Seq((1L, Seq(0.1, 0.2), 0)).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalStateException](Tables.embeddings(spark, dir))
    assert(e.getMessage.contains("array<float>") ||
           e.getMessage.contains("float-exact"))
    // and the real testdata still loads
    assert(Tables.embeddings(spark, sf).count() > 0)
  }

  test("readEventsStream: empty staging directory falls back to declared schema") {
    val dir = Files.createTempDirectory("graft-empty-stage").toString
    val stream = graft.streaming.Streams.readEventsStream(spark, dir)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType === TimestampType)
    assert(stream.schema.fieldNames.toSeq ===
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
  }
}
