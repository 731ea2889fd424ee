package graft

import org.apache.spark.sql.functions._

/** The shuffle-audit harness itself must be trustworthy before its
  * artifact is: a listener that under-counts would pass any plan, one
  * that never settles would attribute one op's bytes to the next.
  */
class ShuffleAuditSpec extends SparkSpec {

  test("measure: a groupBy job shows shuffle bytes; a narrow scan shows none") {
    val acc = new ShuffleAudit.Acc
    spark.sparkContext.addSparkListener(acc)
    try {
      import spark.implicits._
      val df = (1 to 10000).map(i => (i % 97, i.toLong)).toDF("k", "v")
      // narrow: no wide dependency anywhere — collect() plans no exchange
      val (bNarrow, sNarrow) = ShuffleAudit.measure(acc) {
        df.filter($"v" > 0).select($"k").collect()
      }
      assert(bNarrow == 0L, s"narrow scan wrote shuffle bytes: $bNarrow")
      assert(sNarrow == 0, s"narrow scan had shuffle-writing stages: $sNarrow")
      // wide: groupBy must write its partial-agg exchange
      val (bWide, sWide) = ShuffleAudit.measure(acc) {
        df.groupBy($"k").agg(sum($"v")).collect()
      }
      assert(bWide > 0L, "groupBy wrote no shuffle bytes — listener broken")
      assert(sWide >= 1, s"groupBy had no shuffle-writing stage: $sWide")
      // attribution: a second identical job measures independently (the
      // drain between measures keeps bytes from bleeding across ops)
      val (bWide2, _) = ShuffleAudit.measure(acc) {
        df.groupBy($"k").agg(sum($"v")).collect()
      }
      assert(math.abs(bWide2 - bWide) < bWide,
        s"re-measured groupBy bytes implausible: $bWide vs $bWide2")
    } finally spark.sparkContext.removeSparkListener(acc)
  }
}
