package graft

/** Pins the driver contract's flagship entry point: rows > 0 at sf0.001
  * (the driver's smoke check, run here so a regression fails in CI-shape
  * first, not in the round artifact). */
class EntrySpec extends SparkTestBase {
  test("SparkEntry.entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
