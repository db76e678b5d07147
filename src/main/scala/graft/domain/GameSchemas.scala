package graft.domain

import org.apache.spark.sql.types._

/** Explicit schemas for the game-domain raw tables (SURVEY.md §1.2–1.3).
  * The reference's raw layer is schemaless CSV with the declared schema only
  * in YAML docs (/root/reference/dffoo_analyzer/models/raw_sources.yml:8-170)
  * and enforcement deferred to the dbt staging casts; here the schema is
  * applied at read time — never inferred.
  */
object GameSchemas {
  val rawAbilities: StructType = StructType(Seq(
    StructField("char_name", StringType, nullable = false),
    StructField("ability_name", StringType, nullable = false),
    StructField("ability_id", IntegerType, nullable = true), // 5 real nulls (synthetic rows)
    StructField("main_target_hp_attacks", IntegerType, nullable = true),
    StructField("non_target_hp_attacks", IntegerType, nullable = true),
    StructField("hp_dmg_cap_up_perc", IntegerType, nullable = true),
    StructField("attribute_list", StringType, nullable = true), // Python-list literal text
    StructField("game_version", StringType, nullable = false),  // 'GL' | 'JP'
    StructField("scrape_started_at_utc", TimestampType, nullable = true),
    StructField("scrape_ended_at_utc", TimestampType, nullable = true)))

  /** raw_followups_manual_entry: declared in the reference's source YAML
    * (raw_sources.yml:97-170) but never modeled there — covered here so the
    * full declared raw surface is readable. Timestamps in this CSV use the
    * spreadsheet format "M/d/yyyy H:mm" (manual entry), so they stay STRING
    * at the raw layer and are parsed by [[Staging.stgFollowups]]. */
  val rawFollowups: StructType = StructType(Seq(
    StructField("char_name", StringType, nullable = false),
    StructField("ability_name", StringType, nullable = false),
    StructField("ability_id", IntegerType, nullable = true),
    StructField("main_target_hp_attacks", IntegerType, nullable = true),
    StructField("non_target_hp_attacks", IntegerType, nullable = true),
    StructField("hp_dmg_cap_up_perc", IntegerType, nullable = true),
    StructField("attribute_list", StringType, nullable = true),
    StructField("game_version", StringType, nullable = false),
    StructField("scrape_started_at_utc", StringType, nullable = true),
    StructField("scrape_ended_at_utc", StringType, nullable = true),
    StructField("timing", StringType, nullable = true),   // during | before | after
    StructField("triggers", StringType, nullable = true), // ability list or behavior label
    StructField("default", StringType, nullable = true),          // 'T' | 'F'
    StructField("during_bt", StringType, nullable = true),        // 'T' | 'F'
    StructField("double_during_bt", StringType, nullable = true)))// 'T' | 'F'

  val rawBtEffects: StructType = StructType(Seq(
    StructField("char_name", StringType, nullable = false),
    StructField("bt_personal_hp_dmg_cap_up", IntegerType, nullable = true),
    StructField("bt_party_hp_dmg_cap_up", IntegerType, nullable = true),
    StructField("enemy_count_apply_list", StringType, nullable = true),
    StructField("game_version", StringType, nullable = false),
    StructField("scrape_started_at_utc", TimestampType, nullable = true),
    StructField("scrape_ended_at_utc", TimestampType, nullable = true)))

  val rawHighArmorCaps: StructType = StructType(Seq(
    StructField("char_name", StringType, nullable = false),
    StructField("personal_hp_dmg_cap_up", IntegerType, nullable = true),
    StructField("party_ha_hp_dmg_cap_up", IntegerType, nullable = true),
    StructField("game_version", StringType, nullable = false),
    StructField("scrape_started_at_utc", TimestampType, nullable = true),
    StructField("scrape_ended_at_utc", TimestampType, nullable = true)))
}
