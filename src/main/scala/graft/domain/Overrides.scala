package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed override joins + the uncapped-attack row fan-out
  * (SURVEY.md §2.3 J1/J2/J4 + §2.2 P6; semantics from
  * /root/reference/web_scraper.py:56-115,501-559).
  *
  * The reference holds these as hardcoded Python dicts consulted per row in
  * a loop; here they are tiny DataFrames broadcast-joined against the
  * ability table — the 100 TB shape: corrections are config data, the fact
  * table never re-shuffles for them.
  */
object Overrides {

  /** J1: per-(char, ability) cap replacement (FIX_HP_CAP_DICT analog). */
  case class CapFix(char_name: String, ability_name: String, fixed_cap: Int)

  /** J2: membership ⇒ force cap 900 + prepend 'Uncapped' (UNCAPPED_ABILITIES_DICT). */
  case class UncappedAbility(char_name: String, ability_name: String)

  /** J4/P6: N of the ability's attacks are uncapped ⇒ split into a base row
    * (attacks − N, original cap) and a synthetic
    * "<name> (Uncapped HP Attack)" follow-up row (N attacks, cap 900,
    * 'FollowUp' prepended) — N_HP_ATTACKS_UNCAPPED analog. */
  case class UncappedSplit(
      char_name: String,
      ability_name: String,
      uncapped_main: Int,
      uncapped_non: Int)

  val UncappedCap = 900 // sentinel (web_scraper.py:508,523)

  /** Apply cap fixes then membership overrides then the split fan-out.
    * Input/output schema: char_name, ability_name, ability_id,
    * main_target_hp_attacks, non_target_hp_attacks, hp_dmg_cap_up_perc,
    * attributes (array<string>), game_version + any passthrough columns. */
  def apply(
      abilities: DataFrame,
      capFixes: Seq[CapFix] = Nil,
      uncapped: Seq[UncappedAbility] = Nil,
      splits: Seq[UncappedSplit] = Nil): DataFrame = {
    val spark = abilities.sparkSession
    import spark.implicits._

    val withFix =
      if (capFixes.isEmpty) abilities
      else abilities
        .join(broadcast(capFixes.toDF()
          .withColumnRenamed("char_name", "fx_char").withColumnRenamed("ability_name", "fx_ab")),
          col("char_name") === col("fx_char") && col("ability_name") === col("fx_ab"), "left")
        .withColumn("hp_dmg_cap_up_perc",
          coalesce(col("fixed_cap"), col("hp_dmg_cap_up_perc")))
        .drop("fx_char", "fx_ab", "fixed_cap")

    val withUncapped =
      if (uncapped.isEmpty) withFix
      else withFix
        .join(broadcast(uncapped.toDF().withColumn("is_uncapped", lit(true))
          .withColumnRenamed("char_name", "uc_char").withColumnRenamed("ability_name", "uc_ab")),
          col("char_name") === col("uc_char") && col("ability_name") === col("uc_ab"), "left")
        .withColumn("hp_dmg_cap_up_perc",
          when(col("is_uncapped"), lit(UncappedCap)).otherwise(col("hp_dmg_cap_up_perc")))
        .withColumn("attributes",
          when(col("is_uncapped"), concat(array(lit("Uncapped")), col("attributes")))
            .otherwise(col("attributes")))
        .drop("uc_char", "uc_ab", "is_uncapped")

    if (splits.isEmpty) withUncapped
    else {
      val sp = broadcast(splits.toDF()
        .withColumnRenamed("char_name", "sp_char").withColumnRenamed("ability_name", "sp_ab"))
      val joined = withUncapped.join(sp,
        col("char_name") === col("sp_char") && col("ability_name") === col("sp_ab"), "left")
      // P6: explode a conditionally built 1- or 2-element array of row variants.
      val base = struct(
        col("ability_name").as("ability_name"),
        col("ability_id").as("ability_id"),
        (col("main_target_hp_attacks") - coalesce(col("uncapped_main"), lit(0))).as("main"),
        (col("non_target_hp_attacks") - coalesce(col("uncapped_non"), lit(0))).as("non"),
        col("hp_dmg_cap_up_perc").as("cap"),
        col("attributes").as("attributes"))
      val followup = when(col("sp_char").isNotNull, struct(
        concat(col("ability_name"), lit(" (Uncapped HP Attack)")).as("ability_name"),
        lit(null).cast("int").as("ability_id"),
        col("uncapped_main").as("main"),
        col("uncapped_non").as("non"),
        lit(UncappedCap).as("cap"),
        concat(array(lit("FollowUp")), col("attributes")).as("attributes")))
      joined
        .select(col("char_name"), col("game_version"),
          explode(array_compact(array(base, followup))).as("x"))
        .select(
          col("char_name"),
          col("x.ability_name").as("ability_name"),
          col("x.ability_id").as("ability_id"),
          col("x.main").as("main_target_hp_attacks"),
          col("x.non").as("non_target_hp_attacks"),
          col("x.cap").as("hp_dmg_cap_up_perc"),
          col("x.attributes").as("attributes"),
          col("game_version"))
    }
  }

  /** Hardcoded single-row injection (Seymour Chainspell analog,
    * web_scraper.py:547-559): unionByName of literal rows. */
  def injectRows(abilities: DataFrame, rows: DataFrame): DataFrame =
    abilities.unionByName(rows, allowMissingColumns = true)
}
