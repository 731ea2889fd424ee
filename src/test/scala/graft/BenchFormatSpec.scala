package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver captures only the last ~2000 chars of stdout and parses the
  * bench JSON out of that tail; the sbt `[success] Total time: ...` trailer
  * (~80 chars) sits behind the line inside the same capture. If the line
  * outgrows the window its head is truncated and the driver records
  * `parsed: null` (round 3 did exactly this). Guard the worst case: every
  * query at a 6-char timing ("999.99") and every query failed.
  */
class BenchFormatSpec extends AnyFunSuite {

  test("compact bench line fits the driver tail capture at worst case") {
    // worst case: every query at a 10-99s timing (a catastrophic
    // regression — the precision fallback must still keep the line inside
    // the window) and some failures (name list capped in compactLine)
    val names = SparkEntry.queries.keys.toSeq.sorted
    val worst = Bench.compactLine(
      names.map(_ -> 99.99), failed = names.take(10), total = 9999.99,
      sfDir = "/root/testdata/sf0.1")
    assert(worst.length <= Bench.LineBudget,
      s"bench line ${worst.length} chars leaves <85 for the sbt trailer " +
        "in the 2000-char tail; shorten the format or move fields to " +
        Bench.FullPath)
    assert(worst.startsWith("{") && worst.endsWith("}"))
    // the realistic case (sub-10s timings) must keep 10ms resolution
    val fine = Bench.compactLine(names.map(_ -> 0.37), Nil, 27.0,
      "/root/testdata/sf0.1")
    assert(fine.length <= Bench.LineBudget)
    assert(fine.contains(":0.37"), "expected 2-decimal timings in the realistic case")
  }

  test("every query key appears exactly once in the compact line") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val line = Bench.compactLine(names.map(_ -> 0.1), Nil, 7.4, "/x")
    names.foreach { n =>
      assert(line.indexOf("\"" + n + "\":") === line.lastIndexOf("\"" + n + "\":"),
        s"$n duplicated")
      assert(line.contains("\"" + n + "\":"), s"$n missing")
    }
  }
}
