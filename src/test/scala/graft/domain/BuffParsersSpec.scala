package graft.domain

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BuffParsersSpec extends SparkSpec {

  test("BT cap extraction splits personal vs party and sums blocks") {
    import spark.implicits._
    val lines = Seq(
      ("kelger", "GL", "party  MAX BRV Cap Up by 20%"),
      ("kelger", "GL", "party  MAX BRV Cap Up by 10%"),
      ("kelger", "GL", "some unrelated buff line"),
      ("sherlotta", "GL", "MAX BRV Cap Up by 30%"),
      ("sherlotta", "GL", "party  MAX BRV Cap Up by 15%"))
      .toDF("char_name", "game_version", "line")
    val out = BuffParsers.btCaps(lines).collect()
      .map(r => r.getString(0) -> (r.getInt(2), r.getInt(3))).toMap
    assert(out("kelger") == (0, 30))
    assert(out("sherlotta") == (30, 15))
  }

  test("HA caps sum base + upgrade blocks") {
    import spark.implicits._
    val lines = Seq(
      ("auron", "GL", "High Armor: MAX BRV Cap Up by 10%"),
      ("auron", "GL", "HA+: MAX BRV Cap Up by 5%"),
      ("auron", "GL", "HA+: MAX BRV Cap Up by 5%"),
      ("auron", "GL", "HA+: party  MAX BRV Cap Up by 5%"))
      .toDF("char_name", "game_version", "line")
    val r = BuffParsers.haCaps(lines).head()
    assert(r.getAs[Int]("personal_hp_dmg_cap_up") == 20)
    assert(r.getAs[Int]("party_ha_hp_dmg_cap_up") == 5)
  }

  test("enemy-count applicability parses clause or defaults to all") {
    import spark.implicits._
    val df = Seq("MAX BRV Cap Up by 10% when 2 or more enemies", "MAX BRV Cap Up by 10%")
      .toDF("line")
      .select(BuffParsers.enemyCounts(col("line")).as("ec"))
    val got = df.as[Seq[Int]].collect()
    assert(got(0) == Seq(2, 3))
    assert(got(1) == Seq(1, 2, 3))
  }
}
