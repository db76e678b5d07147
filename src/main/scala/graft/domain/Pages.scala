package graft.domain

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** S1's in-engine half (SURVEY §2.1): the reference's true raw input is a
  * scraped character page prettified into text lines
  * (/root/reference/web_scraper.py:176-186), and every downstream quantity is
  * computed from those lines. The out-of-engine half (Selenium fetching) stays
  * out by design; from the first byte the engine can see — page-shaped text
  * files — the whole dataflow runs in-engine as one Catalyst-planned job:
  *
  *   wholetext read → blank-line block split → [[AbilityParser]] state machine
  *   → [[Overrides]] fan-out → [[Staging.stgAbilities]] → [[Mart]]
  *
  * Scale shape: one row per page file (`wholetext`), blocks fan out via a
  * typed flatMap — per-file parallelism with no driver-side file loop, so a
  * large page corpus partitions by file like any other text source.
  */
object Pages {
  import AbilityParser._

  case class RawPage(char_name: String, game_version: String, text: String)

  private val FileRx = "([a-z0-9]+)_(gl|jp)\\.txt$"

  /** One row per `<char>_<gl|jp>.txt` page file under `dir`. */
  def readPages(spark: SparkSession, dir: String): Dataset[RawPage] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(dir)
      .select(
        regexp_extract(input_file_name(), FileRx, 1).as("char_name"),
        upper(regexp_extract(input_file_name(), FileRx, 2)).as("game_version"),
        col("value").as("text"))
      .as[RawPage]
  }

  /** Blank-line-separated line blocks; the first line of each block is the
    * ability header. */
  private[domain] def splitBlocks(text: String): Seq[Seq[String]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val cur = scala.collection.mutable.ArrayBuffer.empty[String]
    for (raw <- text.split("\n", -1)) {
      val line = raw.trim
      if (line.isEmpty) { if (cur.nonEmpty) { out += cur.toSeq; cur.clear() } }
      else cur += line
    }
    if (cur.nonEmpty) out += cur.toSeq
    out.toSeq
  }

  /** Trailing "#<id>" on the header line is the ability id — the reference
    * keys its ability dicts "<name> - #<id>" (web_scraper.py:374-385). */
  private val IdRx = """#(\d+)\s*$""".r

  /** Pages → parsed ability rows (pre-override view: the analog of the
    * reference's in-memory ability_df before corrections are applied). */
  def parsePages(pages: Dataset[RawPage]): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.flatMap { p =>
      splitBlocks(p.text).map { lines =>
        val id = IdRx.findFirstMatchIn(lines.head).map(_.group(1).toInt)
        val pa = parse(AbilityBlock(p.char_name, p.game_version, lines))
        (pa.char_name, pa.ability_name, id, pa.main_target_hp_attacks,
          pa.non_target_hp_attacks, pa.hp_dmg_cap_up_perc, pa.attributes,
          pa.game_version)
      }
    }.toDF("char_name", "ability_name", "ability_id", "main_target_hp_attacks",
      "non_target_hp_attacks", "hp_dmg_cap_up_perc", "attributes", "game_version")
  }

  /** Re-encode to the raw layer's persisted shape ([[GameSchemas.rawAbilities]]):
    * the attributes array becomes the Python-list-literal TEXT the reference
    * stores (F11 codec — exact inverse of [[Staging.listLiteral]]). */
  def toRawLayer(df: DataFrame, scrapeStart: String, scrapeEnd: String): DataFrame =
    df.select(
      col("char_name"),
      col("ability_name"),
      col("ability_id").cast("int"),
      col("main_target_hp_attacks").cast("int"),
      col("non_target_hp_attacks").cast("int"),
      col("hp_dmg_cap_up_perc").cast("int"),
      when(size(col("attributes")) > 0,
        concat(lit("['"), array_join(col("attributes"), "', '"), lit("']")))
        .otherwise(lit("[]")).as("attribute_list"),
      col("game_version"),
      lit(scrapeStart).cast("timestamp").as("scrape_started_at_utc"),
      lit(scrapeEnd).cast("timestamp").as("scrape_ended_at_utc"))
}
