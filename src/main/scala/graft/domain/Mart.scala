package graft.domain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The mart the reference was building toward but never shipped
  * (/root/reference/README.md:19-24): per-(char, game_version) effective HP
  * damage cap, joining abilities ⋈ bt_effects ⋈ high_armor_caps on the shared
  * key (raw_sources.yml:12-13,52-53,79-80). SURVEY §7.2's flagship, in the
  * game domain.
  */
object Mart {

  /** A6 latest-snapshot dedup: the raw tables are append-only, so queries
    * must pick the most recent scrape per key (the author's own critique,
    * README.md:69-71). */
  def latestSnapshot(df: DataFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("scrape_started_at_utc").desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Effective cap per char×version: 100 base + best ability cap + BT party
    * cap + HA personal cap. BT join is LEFT — only ~120 of 177 chars have a
    * BT (SURVEY §2.3 J5); HA inner. Dimension sides are broadcast: at 100 TB
    * the ability fact table is the only large input. */
  def effectiveHpCap(abilities: DataFrame, btEffects: DataFrame, haCaps: DataFrame): DataFrame = {
    val ab = latestSnapshot(abilities, Seq("char_name", "ability_name", "game_version"))
      .groupBy("char_name", "game_version")
      .agg(
        max(when(col("hp_dmg_cap_up_perc") < Overrides.UncappedCap, col("hp_dmg_cap_up_perc")))
          .as("best_ability_cap"),
        sum(col("main_target_hp_attacks").cast("int")).as("total_main_hp_attacks"))
    val bt = latestSnapshot(btEffects, Seq("char_name", "game_version"))
      .select(col("char_name"), col("game_version"), col("bt_party_hp_dmg_cap_up"))
    val ha = latestSnapshot(haCaps, Seq("char_name", "game_version"))
      .select(col("char_name"), col("game_version"), col("personal_hp_dmg_cap_up"))
    ab
      .join(broadcast(bt), Seq("char_name", "game_version"), "left")
      .join(broadcast(ha), Seq("char_name", "game_version"))
      .select(
        col("char_name"), col("game_version"), col("total_main_hp_attacks"),
        (lit(100)
          + coalesce(col("best_ability_cap").cast("int"), lit(0))
          + coalesce(col("bt_party_hp_dmg_cap_up").cast("int"), lit(0))
          + coalesce(col("personal_hp_dmg_cap_up").cast("int"), lit(0)))
          .as("effective_hp_dmg_cap"))
  }
}
