package graft.domain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's other two per-character transforms, relationalized
  * (SURVEY.md §2.4 A2; semantics from /root/reference/web_scraper.py —
  * retrieve_hp_caps_from_bt :729-737, retrieve_ha_hp_dmg_cap_up :1041-1077).
  *
  * Unlike the ability state machine (genuinely imperative, see
  * [[AbilityParser]]), BT and HA cap extraction is regex-match + extract +
  * grouped conditional sum — pure column expressions, so these stay fully
  * relational: no UDF, whole-stage codegen, one partial+final aggregation.
  *
  * Input: one row per effect line, (char_name, game_version, line).
  */
object BuffParsers {

  private val capPerc = regexp_extract(col("line"), "MAX BRV Cap Up.*?(\\d+)%", 1)
    .cast("int")

  /** BT (Burst) buff lines → per-char personal/party cap sums. A line counts
    * as party-wide when it says "party", personal otherwise
    * (web_scraper.py:729-737 accumulates the same two counters). */
  def btCaps(lines: DataFrame): DataFrame =
    lines
      .filter(col("line").contains("MAX BRV Cap Up"))
      .groupBy("char_name", "game_version")
      .agg(
        coalesce(sum(when(!lower(col("line")).contains("party"), capPerc)), lit(0)).cast("int")
          .as("bt_personal_hp_dmg_cap_up"),
        coalesce(sum(when(lower(col("line")).contains("party"), capPerc)), lit(0)).cast("int")
          .as("bt_party_hp_dmg_cap_up"))

  /** High Armor lines → per-char personal/party cap sums: the base block plus
    * the HA+ upgrade blocks all sum into one number per scope
    * (web_scraper.py:1041-1045,1064-1077). */
  def haCaps(lines: DataFrame): DataFrame =
    lines
      .filter(col("line").contains("MAX BRV Cap Up"))
      .groupBy("char_name", "game_version")
      .agg(
        coalesce(sum(when(!lower(col("line")).contains("party"), capPerc)), lit(0)).cast("int")
          .as("personal_hp_dmg_cap_up"),
        coalesce(sum(when(lower(col("line")).contains("party"), capPerc)), lit(0)).cast("int")
          .as("party_ha_hp_dmg_cap_up"))

  /** Enemy-count applicability: "when N or more enemies" style clauses →
    * array of enemy counts the effect applies to; absent → all of 1..3
    * (enemy_count_apply_list semantics, raw_sources.yml:70-73 — lannreynn is
    * the one character with per-enemy-count rows). */
  def enemyCounts(line: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val n = regexp_extract(line, "when (\\d) or more enemies", 1)
    when(n === "", array(lit(1), lit(2), lit(3)))
      .otherwise(sequence(n.cast("int"), lit(3)))
  }
}
