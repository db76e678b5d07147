package graft.domain

import scala.util.matching.Regex

/** The one genuine UDF surface (SURVEY.md §2.8): a per-ability state machine
  * over prettified HTML-ish text lines, with positional lookahead and mode
  * flags — not expressible as composed column expressions
  * (/root/reference/web_scraper.py:387-490 computes the same quantities).
  *
  * WHAT it computes per ability block (cites are to the reference's
  * semantics, the grammar below is this engine's own):
  *  - main_target_hp_attacks / non_target_hp_attacks — conditional
  *    accumulation over attack lines (web_scraper.py:383-385,403-490)
  *  - hp_dmg_cap_up_perc — summed from "MAX BRV Cap … +N%" lines (:391-392)
  *  - attributes — collected from "inline <Attr>" markers (:296-305)
  *
  * Line grammar handled here (the header line carries only the name and is
  * excluded from the state machine — abilities named "HP Attack+" must not
  * count their own header as an attack):
  *   "<name> - <kind> [#<id>]"    header; name = text before " - " (:293)
  *   "inline <Attr>"              attribute token (:302)
  *   "HP Attack" [suffix +/++]    1 HP attack to the main target
  *   "... to all enemies"         following an attack: also counts non-target
  *   "<n> times"                  multiplies the preceding attack line (:474)
  *   "Group <k>"                  group attack: main + non-target (:456)
  *   "to non-targets [× <n>]"     non-target-only damage (:464-470)
  *   "MAX BRV Cap Up <n>%"        cap accumulation (:391-392,733)
  *   lines containing "inline HP" are skipped (:398-399)
  *
  * Driven from Spark as a typed flatMap over Dataset[AbilityBlock] — no
  * Catalyst opacity on the hot relational path, parallel per partition.
  */
object AbilityParser {

  case class AbilityBlock(char_name: String, game_version: String, lines: Seq[String])
  case class ParsedAbility(
      char_name: String,
      game_version: String,
      ability_name: String,
      main_target_hp_attacks: Int,
      non_target_hp_attacks: Int,
      hp_dmg_cap_up_perc: Int,
      attributes: Seq[String])

  private val header: Regex = """^(.+?) - .*$""".r
  private val inlineAttr: Regex = """inline (\w+)""".r
  private val times: Regex = """(\d+) times""".r
  private val group: Regex = """Group (\d+)""".r
  private val capUp: Regex = """MAX BRV Cap Up.*?(\d+)%""".r
  private val nonTarget: Regex = """to non-targets(?: × (\d+))?""".r

  def parse(block: AbilityBlock): ParsedAbility = {
    val lines = block.lines.toIndexedSeq
    val name = lines.headOption.collect { case header(n) => n }
      .getOrElse(lines.headOption.getOrElse(""))
    var main = 0
    var non = 0
    var cap = 0
    val attrs = scala.collection.mutable.LinkedHashSet.empty[String]

    var i = 1 // line 0 is the header: name only, never state-machine input
    while (i < lines.length) {
      val line = lines(i)
      if (line.contains("inline HP")) {
        // decorative inline icon rows — skipped, like web_scraper.py:398-399
      } else {
        inlineAttr.findAllMatchIn(line).foreach(m => attrs += m.group(1))
        capUp.findFirstMatchIn(line).foreach(m => cap += m.group(1).toInt)
        group.findFirstMatchIn(line).foreach { m =>
          val k = m.group(1).toInt
          main += k; non += k
        }
        if (line.contains("to non-targets"))
          // non-target-only damage line (web_scraper.py:464-470): counts
          // toward non_target alone, optional "× n" multiplier
          non += nonTarget.findFirstMatchIn(line)
            .flatMap(m => Option(m.group(1)).map(_.toInt)).getOrElse(1)
        if (line.contains("HP Attack") && !line.contains("Cap")) {
          // lookahead: "<n> times" multiplier and AOE marker on later lines
          val mult = lines.lift(i + 1).flatMap(times.findFirstMatchIn)
            .map(_.group(1).toInt).getOrElse(1)
          val aoe = lines.lift(i + 1).exists(_.contains("to all enemies")) ||
            lines.lift(i + 2).exists(_.contains("to all enemies"))
          main += mult
          if (aoe) non += mult
        }
      }
      i += 1
    }
    ParsedAbility(block.char_name, block.game_version, name, main, non, cap, attrs.toSeq)
  }

  /** Spark surface: typed flatMap (1 block → 1 parsed row; P6 fan-out happens
    * downstream in [[Overrides]]). */
  def parseAbilities(blocks: org.apache.spark.sql.Dataset[AbilityBlock])
      : org.apache.spark.sql.Dataset[ParsedAbility] = {
    val spark = blocks.sparkSession
    import spark.implicits._
    blocks.map(parse)
  }
}
