package graft

import graft.engine.Dictionary
import org.apache.spark.storage.StorageLevel

/** Pins [[Dictionary.build]]'s driver-local vs distributed split: the
  * row cap and the broadcast byte budget decide which path a dict
  * takes, and BOTH paths must assign identical deterministic keys
  * (1..N in value order). The distributed fallback is caller-owned
  * cached state released via [[Dictionary.release]]. */
class DictionarySpec extends SparkTestBase {

  private def df = {
    import spark.implicits._
    Seq("delta", "alpha", "echo", "bravo", "charlie", "alpha", "delta")
      .toDF("v")
  }

  private def keyMap(d: org.apache.spark.sql.DataFrame): Map[String, Long] =
    d.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private val expected = Map(
    "alpha" -> 1L, "bravo" -> 2L, "charlie" -> 3L, "delta" -> 4L, "echo" -> 5L)

  test("under the caps: driver-local relation, no cached state") {
    val dict = Dictionary.build(df, "v")
    assert(dict.storageLevel == StorageLevel.NONE, "local path must not persist")
    assert(keyMap(dict) == expected)
  }

  test("over the row cap: distributed fallback, same keys, caller releases") {
    val dict = Dictionary.build(df, "v", maxLocalValues = 3)
    assert(dict.storageLevel != StorageLevel.NONE,
      "over-cap build must take the persisted distributed path")
    assert(keyMap(dict) == expected, "both paths assign identical keys")
    Dictionary.release(dict)
    assert(dict.storageLevel == StorageLevel.NONE, "release unpersists the fallback")
    // releasing a driver-local dict is a safe no-op
    Dictionary.release(Dictionary.build(df, "v"))
  }

  test("over the byte budget: few rows of huge values also spill to distributed") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
      // 5 rows but ~10KB of string data — row count alone would keep
      // this driver-local; the byte budget must push it distributed
      val wide = (1 to 5).map(i => i.toString * 1000).toDF("v")
      val dict = Dictionary.build(wide, "v")
      assert(dict.storageLevel != StorageLevel.NONE,
        "oversized values must not ride the driver-local plan")
      assert(dict.count() == 5)
      Dictionary.release(dict)

      // a disabled broadcast threshold (-1) must not force every dict
      // distributed — it falls back to the 10MB default budget
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val small = Dictionary.build(df, "v")
      assert(small.storageLevel == StorageLevel.NONE)
      assert(keyMap(small) == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
