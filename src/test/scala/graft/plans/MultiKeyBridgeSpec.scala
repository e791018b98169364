package graft.plans

import graft.SparkTestBase

/** Bridge-table semantics must mirror multi_key_dict.py: any member key
  * resolves; unknown keys surface as null; a key may serve one group only. */
class MultiKeyBridgeSpec extends SparkTestBase {

  private def groups = {
    import spark.implicits._
    Seq(
      (0L, Seq("smith2020", "jones2021")),
      (1L, Seq("zhao2019")))
      .toDF("group_id", "keys")
  }

  test("any member key resolves to its group") {
    import spark.implicits._
    val lookups = Seq("smith2020", "jones2021", "zhao2019").toDF("key")
    val got = MultiKeyBridge.resolve(lookups, groups)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("smith2020" -> 0L, "jones2021" -> 0L, "zhao2019" -> 1L))
  }

  test("unknown key yields null (the KeyError surface)") {
    import spark.implicits._
    val got = MultiKeyBridge.resolve(Seq("nope").toDF("key"), groups).collect()
    assert(got.length == 1 && got.head.isNullAt(1))
  }

  test("validate flags keys claimed by two groups") {
    import spark.implicits._
    val bad = Seq((0L, Seq("k1")), (1L, Seq("k1", "k2"))).toDF("group_id", "keys")
    assert(MultiKeyBridge.validate(bad).collect().map(_.getString(0)).toSeq == Seq("k1"))
    assert(MultiKeyBridge.validate(groups).isEmpty)
  }
}
