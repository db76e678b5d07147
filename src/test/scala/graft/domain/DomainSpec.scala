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
    // recorded raw run; they are asserted in the dedicated drift test below
    // against version-matched expectations, closing all 7 reference fixtures.
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

  test("auron + warrioroflight goldens re-included: drift vs raw is exactly the documented reworks") {
    // The reference's own newer dump (datasets/temp/ability_dfs/
    // {auron,warrioroflight}_abiilty_df_gl.csv) value-matches the recorded raw
    // snapshot for these two chars, so the raw subset IS the version-matched
    // expectation; the goldens are hand-verified against the OLDER in-game
    // state. This test proves the drift is exactly the documented reworks —
    // nothing else moved — re-including both fixtures instead of excluding
    // them on an asserted (unproven) drift claim.
    //   (char, golden ability) -> (main delta, non delta), golden -> raw
    val reworks: Map[(String, String), (Int, Int)] = Map(
      ("auron", "Banishing Blade")                  -> (2, 0), // 3/1 -> 5/1
      ("auron", "Purgatory")                        -> (1, 1), // 2/2 -> 3/3
      ("auron", "Dragon Fang")                      -> (2, 2), // 4/4 -> 6/6
      ("auron", "Tornado")                          -> (1, 1), // 4/4 -> 5/5
      // a second LD-board variant (ability_id 17156, 4/0) was ADDED beside
      // the golden-era row (19241, 6/0); name-summed raw is 10/0
      ("warrioroflight", "Shining Shield Follow Up") -> (4, 0))
    val goldens = Seq("auron", "warrioroflight")
      .map(c => spark.read.option("header", "true")
        .schema("char_name STRING, ability_name STRING, main_target_hp_attacks INT, non_target_hp_attacks INT, hp_dmg_cap_up_perc INT")
        .csv(res(s"${c}_ability_df.csv")))
      .reduce(_ unionByName _)
    // snapshot keyed WITH ability_id: same-named ability variants are distinct
    // abilities (different ids), not re-scrapes — both must survive the dedup
    val snap = Mart.latestSnapshot(
      rawAbilities.filter(col("game_version") === "GL" &&
        col("char_name").isin("auron", "warrioroflight")),
      Seq("char_name", "ability_name", "ability_id", "game_version"))
    val recombined = snap
      .groupBy(col("char_name"), col("ability_name").as("base_name"))
      .agg(sum("main_target_hp_attacks").as("main"),
        sum("non_target_hp_attacks").as("non"))
    val rows = goldens.as("g").join(recombined.as("r"),
        col("g.char_name") === col("r.char_name") && col("g.ability_name") === col("base_name"))
      .select(col("g.char_name"), col("g.ability_name"),
        col("g.main_target_hp_attacks"), col("g.non_target_hp_attacks"),
        col("main"), col("non"))
      .collect()
    assert(rows.length == 15, "every golden row must match a raw ability by name")
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val (dm, dn) = reworks.getOrElse(key, (0, 0))
      assert(r.getInt(2) + dm == r.getLong(4) && r.getInt(3) + dn == r.getLong(5),
        s"$key: golden ${r.getInt(2)}/${r.getInt(3)} + rework ($dm,$dn) != raw ${r.getLong(4)}/${r.getLong(5)}")
      if (reworks.contains(key))
        assert(r.getInt(2) != r.getLong(4) || r.getInt(3) != r.getLong(5),
          s"$key is in the rework list but did not actually drift")
    }
    // the one cap-only rework: Soul of Light 260 (golden) -> 250 (raw)
    val sol = snap.filter(col("char_name") === "warrioroflight" &&
      col("ability_name") === "Soul of Light").head()
    assert(sol.getAs[Int]("hp_dmg_cap_up_perc") == 250)
    assert(goldens.filter(col("ability_name") === "Soul of Light")
      .head().getAs[Int]("hp_dmg_cap_up_perc") == 260)
  }

  test("S1 end-to-end: raw page text → parse → overrides → staging → mart in one job") {
    // The reference's real dataflow (web_scraper.py:176-186,374-490): a
    // character page prettified to text lines, parsed per ability block,
    // corrections applied, loaded to the raw layer, then dbt-staged. Here the
    // same flow from page-shaped files with NOTHING pre-built: raw lines in,
    // mart out, one job.
    val pages = Pages.readPages(spark, res("pages"))
    val parsed = Pages.parsePages(pages)

    // the hand-verified sherlotta golden, asserted from raw lines (pre-split view)
    val golden = spark.read.option("header", "true")
      .schema("char_name STRING, ability_name STRING, main_target_hp_attacks INT, non_target_hp_attacks INT, hp_dmg_cap_up_perc INT")
      .csv(res("sherlotta_ability_df.csv"))
    val gm = golden.as("g").join(parsed.as("p"),
        Seq("char_name", "ability_name"), "left")
      .filter(col("g.main_target_hp_attacks") =!= col("p.main_target_hp_attacks") ||
        col("g.non_target_hp_attacks") =!= col("p.non_target_hp_attacks") ||
        col("g.hp_dmg_cap_up_perc") =!= col("p.hp_dmg_cap_up_perc") ||
        col("p.ability_name").isNull)
    assert(gm.count() == 0, s"parsed page diverges from golden: ${gm.collect().mkString("; ")}")

    // overrides + fan-out, then re-encode to the raw layer's persisted shape
    val out = Overrides(
      parsed,
      capFixes = Seq(Overrides.CapFix("sherlotta", "Crystal Dice", 250)),
      splits = Seq(
        Overrides.UncappedSplit("sherlotta", "Chuck Staff", 1, 1),
        Overrides.UncappedSplit("sherlotta", "Crystal Ray", 1, 1)))
    val raw = Pages.toRawLayer(out, "2023-09-09 11:56:19", "2023-09-09 14:05:34")

    // row-for-row identical to the recorded raw snapshot (ids, counts, caps,
    // attribute list literals, version, timestamps)
    val recorded = rawAbilities.filter(
      col("char_name").isin("sherlotta", "auron") && col("game_version") === "GL")
    assert(raw.count() == 29)
    val missing = recorded.exceptAll(raw).collect()
    val extra = raw.exceptAll(recorded).collect()
    assert(missing.isEmpty && extra.isEmpty,
      s"raw-layer mismatch; missing=${missing.mkString("; ")} extra=${extra.mkString("; ")}")

    // staging decodes the list literal back to a real array
    val stg = Staging.stgAbilities(raw)
    assert(stg.filter(col("char_name") === "auron" && col("ability_name") === "Tornado")
      .head().getAs[scala.collection.Seq[String]]("attributes")
      == Seq("Group", "Melee", "IgnoreDEF", "NoFree"))

    // and the mart built from page-derived rows equals the mart from the snapshot
    val bt = spark.read.schema(GameSchemas.rawBtEffects).option("header", "true")
      .csv(res("raw_bt_effects_subset.csv"))
    val ha = spark.read.schema(GameSchemas.rawHighArmorCaps).option("header", "true")
      .csv(res("raw_high_armor_caps_subset.csv"))
    def martRows(ab: org.apache.spark.sql.DataFrame) =
      Mart.effectiveHpCap(ab, bt, ha)
        .filter(col("char_name").isin("sherlotta", "auron"))
        .collect().map(_.toSeq).toSet
    assert(martRows(raw) == martRows(recorded) && martRows(raw).size == 2)
  }

  test("followups source: declared schema reads, casts apply, id-carrying rows agree with raw abilities") {
    // raw_followups_manual_entry is declared in the reference's source YAML
    // (raw_sources.yml:97-170) but never modeled — read + staged here so the
    // full declared raw surface works end to end.
    val raw = spark.read.schema(GameSchemas.rawFollowups).option("header", "true")
      .csv(res("raw_followups_subset.csv"))
    val stg = Staging.stgFollowups(raw)
    assert(stg.count() == 8)
    val f = stg.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(f("main_target_hp_attacks") == "smallint" && f("during_bt") == "boolean" &&
      f("trigger_list") == "array<string>" && f("scrape_started_at_utc") == "timestamp")
    // spreadsheet-format timestamp parsed, not nulled
    assert(stg.filter(col("scrape_started_at_utc").isNull).count() == 0)
    // multi-ability trigger strings split clean
    val wol = stg.filter(col("char_name") === "warrioroflight").head()
    assert(wol.getAs[scala.collection.Seq[String]]("trigger_list") == Seq("Shining Shield"))
    assert(wol.getAs[Boolean]("during_bt") && !wol.getAs[Boolean]("double_during_bt"))
    // every followup row that carries an ability_id must describe the SAME
    // attack counts as the raw abilities table (manual entry vs scrape agree)
    val joined = stg.filter(col("ability_id").isNotNull).as("f")
      .join(Staging.stgAbilities(rawAbilities).as("a"),
        Seq("char_name", "ability_id", "game_version"))
    assert(joined.count() == 6) // every id-carrying fixture row resolves
    val mismatch = joined
      .filter(col("f.main_target_hp_attacks") =!= col("a.main_target_hp_attacks") ||
        col("f.non_target_hp_attacks") =!= col("a.non_target_hp_attacks") ||
        col("f.hp_dmg_cap_up_perc") =!= col("a.hp_dmg_cap_up_perc"))
    assert(mismatch.count() == 0, mismatch.collect().mkString("; "))
  }

  test("injectRows adds the hardcoded Seymour Chainspell follow-up (P6 injection)") {
    import spark.implicits._
    // the reference injects this row because the site omits it
    // (web_scraper.py:547-559); here it is a unionByName of a literal-row DF
    val chainspell = Seq(
      ("seymour", "Chainspell - Follow Up", Option.empty[Int], 4, 0, 20,
        Seq("Magic", "FollowUp"), "GL"))
      .toDF("char_name", "ability_name", "ability_id", "main_target_hp_attacks",
        "non_target_hp_attacks", "hp_dmg_cap_up_perc", "attributes", "game_version")
    val base = Staging.stgAbilities(rawAbilities)
    val out = Overrides.injectRows(base, chainspell)
    assert(out.count() == base.count() + 1)
    val row = out.filter(col("char_name") === "seymour").head()
    assert(row.getAs[Any]("ability_id") == null) // like the synthetic split rows
    assert(row.getAs[Int]("main_target_hp_attacks") == 4 &&
      row.getAs[Int]("hp_dmg_cap_up_perc") == 20)
    assert(row.getAs[scala.collection.Seq[String]]("attributes") == Seq("Magic", "FollowUp"))
    // columns the injected row doesn't carry (scrape timestamps) are null-filled
    assert(row.getAs[Any]("scrape_started_at_utc") == null)
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
