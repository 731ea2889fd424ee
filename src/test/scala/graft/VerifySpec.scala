package graft

import java.nio.file.{Files, Paths}

/** The gate artifact must be crash-proof: round 8's loader exception made
  * 48 failing operators vanish from CORRECTNESS entirely (Verify's catch
  * printed to stderr and wrote nothing, so the driver saw "missing key"
  * instead of an error row). This spec drives Verify.main end-to-end on a
  * healthy query and on a deliberately broken input dir and asserts both
  * leave an auditable artifact on disk.
  */
class VerifySpec extends SparkSpec {

  test("Verify writes parquet for a healthy query and oracle_sql.json") {
    val out = Files.createTempDirectory("graft-verify-ok").toString
    Verify.main(Array(sf, out, "q1_agg"))
    val files = new java.io.File(s"$out/q1_agg").listFiles()
    assert(files != null && files.exists(_.getName.endsWith(".parquet")))
    assert(Files.exists(Paths.get(s"$out/oracle_sql.json")))
    val json = Files.readString(Paths.get(s"$out/oracle_sql.json"))
    assert(json.contains("\"q1_agg\""))
  }

  test("Verify writes an _ERROR sidecar, not a silent absence, when a query throws") {
    val badSf = Files.createTempDirectory("graft-verify-badsf").toString // no tables
    val out = Files.createTempDirectory("graft-verify-err").toString
    Verify.main(Array(badSf, out, "q1_agg"))
    val marker = Paths.get(s"$out/q1_agg/_ERROR")
    assert(Files.exists(marker), "failing query must leave an auditable sidecar")
    assert(Files.readString(marker).nonEmpty)
    // and no stale parquet pretending to be a result
    val files = new java.io.File(s"$out/q1_agg").listFiles()
    assert(!files.exists(_.getName.endsWith(".parquet")))
  }

  test("Verify replaces a stale success with the error sidecar on re-run") {
    val out = Files.createTempDirectory("graft-verify-stale").toString
    Verify.main(Array(sf, out, "q1_agg")) // healthy run leaves parquet
    val badSf = Files.createTempDirectory("graft-verify-badsf2").toString
    Verify.main(Array(badSf, out, "q1_agg")) // same outDir, now failing
    val dir = new java.io.File(s"$out/q1_agg")
    assert(Files.exists(dir.toPath.resolve("_ERROR")))
    assert(!dir.listFiles().exists(_.getName.endsWith(".parquet")),
      "a failed re-run must not leave the previous round's parquet behind")
  }
}
