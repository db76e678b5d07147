package graft.domain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden tests against the reference's hand-verified fixtures
  * (src/test/resources/game/ — data only; see its README for provenance).
  *
  * The golden per-character CSVs are the PRE-split view of each ability
  * (total attacks); raw_abilities is the POST-split view (base row +
  * synthetic "(Uncapped HP Attack)" follow-up). Feeding the goldens through
  * this engine's override + fan-out pipeline must reproduce the raw rows.
  */
class DomainSpec extends SparkSpec {

  private def res(name: String) = getClass.getResource(s"/game/$name").getPath

  private lazy val rawAbilities: DataFrame =
    spark.read.schema(GameSchemas.rawAbilities).option("header", "true")
      .csv(res("raw_abilities_subset.csv"))

  test("staging casts apply the declared schema (stg_abilities twin)") {
    val stg = Staging.stgAbilities(rawAbilities)
    val f = stg.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(f("main_target_hp_attacks") == "smallint")
    assert(f("attributes") == "array<string>")
    val sherlotta = stg.filter(col("char_name") === "sherlotta" &&
      col("ability_name") === "Crystal Generation").head()
    assert(sherlotta.getAs[scala.collection.Seq[String]]("attributes") == Seq("Group", "Magic"))
    assert(stg.filter(col("ability_id").isNull).count() > 0) // synthetic rows
  }

  test("latest-snapshot dedup keeps one row per key (A6)") {
    val deduped = Mart.latestSnapshot(rawAbilities,
      Seq("char_name", "ability_name", "game_version"))
    val dupKeys = deduped.groupBy("char_name", "ability_name", "game_version")
      .count().filter(col("count") > 1).count()
    assert(dupKeys == 0)
    assert(deduped.count() <= rawAbilities.count())
  }

  test("override + fan-out pipeline reproduces raw rows from goldens (sherlotta)") {
    import spark.implicits._
    // golden = pre-split totals, hand-verified (README.md:75 of the reference)
    val golden = spark.read.option("header", "true")
      .schema("char_name STRING, ability_name STRING, main_target_hp_attacks INT, non_target_hp_attacks INT, hp_dmg_cap_up_perc INT")
      .csv(res("sherlotta_ability_df.csv"))
      .withColumn("ability_id", lit(null).cast("int"))
      .withColumn("attributes", array().cast("array<string>"))
      .withColumn("game_version", lit("GL"))
    val out = Overrides(
      golden,
      // J1 cap fix: golden says Crystal Dice 260; the recorded raw run says 250
      capFixes = Seq(Overrides.CapFix("sherlotta", "Crystal Dice", 250)),
      splits = Seq(
        Overrides.UncappedSplit("sherlotta", "Chuck Staff", 1, 1),
        Overrides.UncappedSplit("sherlotta", "Crystal Ray", 1, 1)))
      .select("char_name", "ability_name", "main_target_hp_attacks",
        "non_target_hp_attacks", "hp_dmg_cap_up_perc")
    val raw = Mart.latestSnapshot(
        rawAbilities.filter(col("char_name") === "sherlotta" && col("game_version") === "GL"),
        Seq("char_name", "ability_name", "game_version"))
      .select("char_name", "ability_name", "main_target_hp_attacks",
        "non_target_hp_attacks", "hp_dmg_cap_up_perc")
    val expected = raw.as("r")
      .join(out.as("o"), Seq("ability_name"), "inner") // golden covers HP abilities only
      .select(col("ability_name"),
        col("r.main_target_hp_attacks") === col("o.main_target_hp_attacks"),
        col("r.non_target_hp_attacks") === col("o.non_target_hp_attacks"),
        col("r.hp_dmg_cap_up_perc") === col("o.hp_dmg_cap_up_perc"))
      .collect()
    assert(expected.nonEmpty)
    val bad = expected.filterNot(r => r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3))
    assert(bad.isEmpty, s"mismatches: ${bad.mkString("; ")}")
    // the synthetic follow-up rows exist with the 900 sentinel
    assert(out.filter(col("ability_name").endsWith("(Uncapped HP Attack)") &&
      col("hp_dmg_cap_up_perc") === 900).count() == 2)
  }

  test("golden totals match post-split raw when recombined") {
    // auron and warrioroflight drifted between the golden scrape and the
    // recorded raw run (in-game reworks changed their attack counts:
    // e.g. auron Dragon Fang golden 4/4 vs raw 6/6) — the goldens are
    // hand-verified against the OLDER state, so those two are excluded.
    val goldens = Seq("aerith", "astos", "lenna", "paine")
      .map(c => spark.read.option("header", "true")
        .schema("char_name STRING, ability_name STRING, main_target_hp_attacks INT, non_target_hp_attacks INT, hp_dmg_cap_up_perc INT")
        .csv(res(s"${c}_ability_df.csv")))
      .reduce(_ unionByName _)
    // inverse fan-out over raw: strip the synthetic suffix, sum attacks per base name
    val recombined = Mart.latestSnapshot(
        rawAbilities.filter(col("game_version") === "GL"),
        Seq("char_name", "ability_name", "game_version"))
      .withColumn("base_name",
        regexp_replace(col("ability_name"), " \\(Uncapped HP Attack\\)$", ""))
      .groupBy("char_name", "base_name")
      .agg(
        sum("main_target_hp_attacks").as("main"),
        sum("non_target_hp_attacks").as("non"))
    val joined = goldens.as("g").join(recombined.as("r"),
      col("g.char_name") === col("r.char_name") && col("g.ability_name") === col("base_name"))
    val mismatched = joined.filter(
      col("g.main_target_hp_attacks") =!= col("main") ||
        col("g.non_target_hp_attacks") =!= col("non")).count()
    assert(joined.count() > 20)
    assert(mismatched == 0)
  }

  test("effective cap mart joins the three tables (J5 game flagship)") {
    val bt = spark.read.schema(GameSchemas.rawBtEffects).option("header", "true")
      .csv(res("raw_bt_effects_subset.csv"))
    val ha = spark.read.schema(GameSchemas.rawHighArmorCaps).option("header", "true")
      .csv(res("raw_high_armor_caps_subset.csv"))
    val mart = Mart.effectiveHpCap(rawAbilities, bt, ha)
    val rows = mart.collect()
    assert(rows.length == 7) // 7 chars, GL only in the subset
    assert(rows.forall(_.getAs[Int]("effective_hp_dmg_cap") >= 100))
  }

  test("ability parser state machine (synthetic line fixtures)") {
    import AbilityParser._
    val block = AbilityBlock("testchar", "GL", Seq(
      "Crystal Ray - Magic",
      "inline Group inline Magic",
      "HP Attack+",
      "3 times",
      "to all enemies",
      "MAX BRV Cap Up by 15%",
      "inline HP decorative line to skip",
      "HP Attack"))
    val p = parse(block)
    assert(p.ability_name == "Crystal Ray")
    assert(p.main_target_hp_attacks == 4) // 3× AOE attack + 1 single
    assert(p.non_target_hp_attacks == 3)  // only the AOE multiplies non-target
    assert(p.hp_dmg_cap_up_perc == 15)
    assert(p.attributes == Seq("Group", "Magic"))
    // Dataset surface
    import spark.implicits._
    val parsed = parseAbilities(Seq(block).toDS())
    assert(parsed.count() == 1)
  }
}
