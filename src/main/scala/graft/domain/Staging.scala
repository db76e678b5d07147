package graft.domain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, ShortType, StringType}

/** Staging layer: typed cast projections mirroring the dbt staging views
  * (/root/reference/dffoo_analyzer/models/stg/stg_abilities.sql:4-14,
  * stg_bt_effects.sql:4-12, stg_high_armor_caps.sql:4-11), expressed as
  * composable DataFrame transformations. dbt materializes each model as a
  * Postgres view that the database re-plans per query; here Catalyst sees
  * through the whole stg stack and collapses it into one optimized plan.
  *
  * Departure from the reference (deliberate, SURVEY §1.2 F11): the
  * Python-list-literal TEXT columns ("['Magic', 'FollowUp']") are parsed to
  * real arrays — kept TEXT in the reference only to dodge Postgres array
  * friction (stg_schema.yml:33-35).
  */
object Staging {

  /** "['a', 'b']" / "[1, 2]" text → array. Single-quote to double-quote then
    * from_json; empty/null-safe. */
  def listLiteral(c: org.apache.spark.sql.Column, elem: String = "string") =
    from_json(regexp_replace(c, "'", "\""), ArrayType(
      elem match { case "int" => IntegerType; case _ => StringType }))

  def stgAbilities(raw: DataFrame): DataFrame =
    raw.select(
      col("char_name").cast(StringType),
      col("ability_name").cast(StringType),
      col("ability_id").cast(IntegerType),
      col("main_target_hp_attacks").cast(ShortType).as("main_target_hp_attacks"),
      col("non_target_hp_attacks").cast(ShortType).as("non_target_hp_attacks"),
      col("hp_dmg_cap_up_perc").cast(ShortType).as("hp_dmg_cap_up_perc"),
      col("attribute_list").cast(StringType),
      listLiteral(col("attribute_list")).as("attributes"),
      col("game_version").cast(StringType),
      col("scrape_started_at_utc").cast("timestamp"),
      col("scrape_ended_at_utc").cast("timestamp"))

  /** Staging for the declared-but-unmodeled followups source
    * (raw_sources.yml:97-170): same cast conventions as the other stg views,
    * plus the columns unique to this table — spreadsheet-format timestamps
    * ("M/d/yyyy H:mm", manual entry), 'T'/'F' booleans, and the comma-
    * separated trigger list parsed to a real array. */
  def stgFollowups(raw: DataFrame): DataFrame = {
    def tf(c: String) = (col(c) === "T").as(c)
    raw.select(
      col("char_name").cast(StringType),
      col("ability_name").cast(StringType),
      col("ability_id").cast(IntegerType),
      col("main_target_hp_attacks").cast(ShortType).as("main_target_hp_attacks"),
      col("non_target_hp_attacks").cast(ShortType).as("non_target_hp_attacks"),
      col("hp_dmg_cap_up_perc").cast(ShortType).as("hp_dmg_cap_up_perc"),
      col("attribute_list").cast(StringType),
      listLiteral(col("attribute_list")).as("attributes"),
      col("game_version").cast(StringType),
      to_timestamp(col("scrape_started_at_utc"), "M/d/yyyy H:mm").as("scrape_started_at_utc"),
      to_timestamp(col("scrape_ended_at_utc"), "M/d/yyyy H:mm").as("scrape_ended_at_utc"),
      col("timing").cast(StringType),
      col("triggers").cast(StringType),
      transform(split(col("triggers"), ","), trim(_)).as("trigger_list"),
      tf("default"), tf("during_bt"), tf("double_during_bt"))
  }

  def stgBtEffects(raw: DataFrame): DataFrame =
    raw.select(
      col("char_name").cast(StringType),
      col("bt_personal_hp_dmg_cap_up").cast(ShortType).as("bt_personal_hp_dmg_cap_up"),
      col("bt_party_hp_dmg_cap_up").cast(ShortType).as("bt_party_hp_dmg_cap_up"),
      col("enemy_count_apply_list").cast(StringType),
      listLiteral(col("enemy_count_apply_list"), "int").as("enemy_counts"),
      col("game_version").cast(StringType),
      col("scrape_started_at_utc").cast("timestamp"),
      col("scrape_ended_at_utc").cast("timestamp"))

  def stgHighArmorCaps(raw: DataFrame): DataFrame =
    raw.select(
      col("char_name").cast(StringType),
      col("personal_hp_dmg_cap_up").cast(ShortType).as("personal_hp_dmg_cap_up"),
      col("party_ha_hp_dmg_cap_up").cast(ShortType).as("party_ha_hp_dmg_cap_up"),
      col("game_version").cast(StringType),
      col("scrape_started_at_utc").cast("timestamp"),
      col("scrape_ended_at_utc").cast("timestamp"))
}
