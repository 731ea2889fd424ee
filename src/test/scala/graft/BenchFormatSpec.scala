package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver captures only the last ~2000 chars of stdout and parses the
  * bench JSON out of that tail. build.sbt suppresses sbt's `[success]`
  * trailer (Global / showSuccess := false), so the line itself owns the
  * window (LineBudget 1990 leaves slack for its newline). If the line
  * outgrows the window its head is truncated and the driver records
  * `parsed: null` (round 3 did exactly this); if the precision fallback
  * engages, the driver artifact silently loses resolution (round 5 shipped
  * 1-decimal timings that way). Both cases are guarded here against the
  * REAL inventory size, so adding an operator that overflows the format
  * fails this spec instead of silently degrading the artifact.
  */
class BenchFormatSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keys.toSeq.sorted

  test("compact bench line fits the driver tail capture at worst case") {
    // worst case: every query at a 10-99s timing (a catastrophic
    // regression — the stepwise fallback must still keep the line inside
    // the window) and some failures (name list capped in compactLine)
    val worst = Bench.compactLine(
      names.map(_ -> 99.99), failed = names.take(10), total = 9999.99,
      sfDir = "/root/testdata/sf0.1")
    assert(worst.length <= Bench.LineBudget,
      s"bench line ${worst.length} chars overflows the 2000-char tail " +
        s"capture; shorten the format or move fields to ${Bench.FullPath}")
    assert(worst.startsWith("{") && worst.endsWith("}"))
  }

  test("realistic case keeps 10ms resolution for the full real inventory") {
    // realistic: sub-10s timings, nothing failed. 4-char values ("9.99")
    // defeat trailing-zero trimming, so this is the realistic WORST case:
    // if it renders 2-decimal, any real sub-10s timing set does too. This
    // is the assertion that failed (by design intent, silently in the
    // artifact) in round 5 when a25/a26 pushed 83 keys past the old
    // budget — parameterized on the live inventory so the next operator
    // addition trips it loudly at build time.
    val fine = Bench.compactLine(names.map(_ -> 9.99), Nil, 829.17,
      "/root/testdata/sf0.1")
    assert(fine.length <= Bench.LineBudget)
    assert(fine.contains(":9.99"),
      s"expected 2-decimal timings for ${names.size} keys; the inventory " +
        "has outgrown the compact format — re-size it (or the budget) " +
        "rather than shipping a degraded artifact")
    assert(!fine.contains("\"failed\""),
      "failed field should be omitted when nothing failed")
  }

  test("trailing-zero trim preserves resolution, not bytes") {
    assert(Bench.fmt(0.37, 2) === "0.37")
    assert(Bench.fmt(0.30, 2) === "0.3")
    assert(Bench.fmt(2.00, 2) === "2")
    assert(Bench.fmt(12.50, 2) === "12.5")
    assert(Bench.fmt(0.0, 2) === "0")
    // a trimmed line still parses as JSON numbers
    val line = Bench.compactLine(Seq("q" -> 0.3, "r" -> 2.0), Nil, 2.3, "/x")
    assert(line.contains("\"q\":0.3,\"r\":2"))
  }

  test("every query key appears exactly once in the compact line") {
    val line = Bench.compactLine(names.map(_ -> 0.1), Nil, 7.4, "/x")
    names.foreach { n =>
      assert(line.indexOf("\"" + n + "\":") === line.lastIndexOf("\"" + n + "\":"),
        s"$n duplicated")
      assert(line.contains("\"" + n + "\":"), s"$n missing")
    }
  }

  test("previousTimes parses the flat queries map out of a full-bench file") {
    val tmp = java.nio.file.Files.createTempFile("bench_full", ".json")
    java.nio.file.Files.write(tmp,
      """{"metric":"total","value":3.5,"unit":"sec","queries":{"q1_agg":0.55,"d9_decontaminate":2.95},"runs":{"q1_agg":[0.6,0.55]},"sf":"/x"}"""
        .getBytes("UTF-8"))
    val prev = Bench.previousTimes(tmp.toString)
    assert(prev === Map("q1_agg" -> 0.55, "d9_decontaminate" -> 2.95))
    assert(Bench.previousTimes("/nonexistent/bench.json") === Map.empty)
  }
}
