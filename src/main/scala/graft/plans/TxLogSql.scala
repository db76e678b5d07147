package graft.plans

import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

import graft.sources.TxLog

/** SQL surface for the ACID table format — the maintenance commands an
  * operator types at a console, grafted onto Spark's parser the way Delta
  * does it (a delegating `ParserInterface`: our statements parse to custom
  * `LeafRunnableCommand` plans, everything else falls through verbatim to
  * Spark's own parser, injected via `SparkSessionExtensions.injectParser`).
  *
  * Grammar (case-insensitive keywords; `TXLOG` disambiguates from any
  * current or future Spark statement of the same head):
  *
  *   OPTIMIZE TXLOG '<path>' [TARGET <bytes>] [ZORDER BY (c1, c2)] [WHERE <pred>] [STATS <col[,col...]>]
  *   VACUUM   TXLOG '<path>' [RETAIN <n> VERSIONS] [GRACE <ms>] [DRY RUN]
  *   RESTORE  TXLOG '<path>' VERSION AS OF <n>
  *   DESCRIBE HISTORY TXLOG '<path>'
  *   DESCRIBE DETAIL  TXLOG '<path>'
  *   DELETE FROM TXLOG '<path>' WHERE <predicate> [STATS <col[,col...]>] [CHANGEFEED] [DV]
  *   UPDATE TXLOG '<path>' SET <col> = <expr> [, ...] WHERE <predicate> [STATS <col[,col...]>] [CHANGEFEED] [DV]
  *   MERGE INTO TXLOG '<path>' KEY <col> [EVOLVE] [CHANGEFEED] USING <select-query>
  *   MERGE INTO TXLOG '<path>' KEY <col> [CHANGEFEED]
  *     { WHEN MATCHED [AND <cond>] THEN UPDATE SET <col>=<expr>[,...] | DELETE
  *     | WHEN NOT MATCHED [AND <cond>] THEN INSERT
  *     | WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE | UPDATE SET ... }+
  *     USING <select-query>            -- the FULL merge matrix (mergeFull)
  *   CLONE TXLOG '<src>' TO '<dst>' [VERSION AS OF <n>]
  *   ALTER TXLOG '<path>' ADD CONSTRAINT <name> CHECK (<expr>)
  *   ALTER TXLOG '<path>' DROP CONSTRAINT <name>
  *   CONVERT TO TXLOG '<dir>' [STATS <col[,col...]>]
  *
  * Each command is a driver-side metadata/maintenance action wrapping the
  * corresponding [[TxLog]] API (which holds the concurrency story); the
  * distributed work inside (compaction scan/write) is ordinary Spark jobs.
  */
object TxLogSql {

  private def re(p: String): Pattern =
    Pattern.compile(p, Pattern.CASE_INSENSITIVE | Pattern.DOTALL)

  // path is a single-quoted SQL string literal ('' escapes a quote)
  private val P = "'((?:[^']|'')*)'"
  // when WHERE is present its free text swallows everything to the end and
  // a trailing STATS clause is peeled by [[peelTail]] (quote/paren-aware and
  // parse-checked, not regex); without WHERE the fixed-position STATS group
  // still applies
  private val OptimizeRe = re(
    s"""\\s*OPTIMIZE\\s+TXLOG\\s+$P(?:\\s+TARGET\\s+(\\d+))?(?:\\s+ZORDER\\s+BY\\s+\\(\\s*(\\w+)\\s*,\\s*(\\w+)\\s*\\))?(?:\\s+WHERE\\s+(.+?)|\\s+STATS\\s+([\\w,]+))?\\s*;?\\s*""")
  private val VacuumRe = re(
    s"""\\s*VACUUM\\s+TXLOG\\s+$P(?:\\s+RETAIN\\s+(\\d+)\\s+VERSIONS)?(?:\\s+GRACE\\s+(\\d+))?(\\s+DRY\\s+RUN)?\\s*;?\\s*""")
  private val HistoryRe = re(s"""\\s*DESCRIBE\\s+HISTORY\\s+TXLOG\\s+$P\\s*;?\\s*""")
  private val DetailRe = re(s"""\\s*DESCRIBE\\s+DETAIL\\s+TXLOG\\s+$P\\s*;?\\s*""")
  private val RestoreRe = re(
    s"""\\s*RESTORE\\s+TXLOG\\s+$P\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*""")
  // the predicate is free SQL text (validated by Spark's own expression
  // parser inside the command); it captures to the end of the statement and
  // trailing STATS/CHANGEFEED clauses are peeled by [[peelTail]] — a
  // quote/paren-aware, parse-checked scan, NOT regex groups, because a
  // predicate legitimately ending in a bare identifier named like a clause
  // keyword (`WHERE is_active AND changefeed`) must stay a predicate
  private val DeleteRe = re(
    s"""\\s*DELETE\\s+FROM\\s+TXLOG\\s+$P\\s+WHERE\\s+(.+?)\\s*;?\\s*""")
  // SET assignments and the predicate are free SQL text (each right-hand
  // side goes through Spark's own expression parser inside the command);
  // assignments split on TOP-LEVEL commas only, so `round(x, 2)` survives.
  // The SET/WHERE boundary is found by a quote/paren-aware scan, NOT by
  // the regex — a lazy `(.+?)\s+WHERE` would split inside a string literal
  // (`SET v = 'x where y' WHERE …`) and fail a valid statement. The
  // predicate side then peels STATS/CHANGEFEED via [[peelTail]].
  private val UpdateRe = re(
    s"""\\s*UPDATE\\s+TXLOG\\s+$P\\s+SET\\s+(.+?)\\s*;?\\s*""")
  // the source is free SQL text (validated by Spark's own plan parser
  // inside the command); upsert semantics are TxLog.merge's — same-key rows
  // replaced, new keys inserted — with EVOLVE mapping to mergeSchema=true
  // the tail after KEY <col> holds [EVOLVE] [CHANGEFEED], optional WHEN
  // clauses (full matrix) and the USING query; it is decomposed by
  // quote/paren-aware top-level scans, not regex groups — clause conditions
  // are free SQL text that may contain THEN/AND inside CASE or parens
  private val MergeRe = re(
    s"""\\s*MERGE\\s+INTO\\s+TXLOG\\s+$P\\s+KEY\\s+(\\w+)\\s+(.+?)\\s*;?\\s*""")
  private val CloneRe = re(
    s"""\\s*CLONE\\s+TXLOG\\s+$P\\s+TO\\s+$P(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?\\s*;?\\s*""")
  // the CHECK body is free SQL text inside the outer parens (validated by
  // Spark's expression parser inside the command)
  private val AddConstraintRe = re(
    s"""\\s*ALTER\\s+TXLOG\\s+$P\\s+ADD\\s+CONSTRAINT\\s+(\\w+)\\s+CHECK\\s*\\((.+)\\)\\s*;?\\s*""")
  private val DropConstraintRe = re(
    s"""\\s*ALTER\\s+TXLOG\\s+$P\\s+DROP\\s+CONSTRAINT\\s+(\\w+)\\s*;?\\s*""")
  // COLUMN MAPPING DDL (metadata-only commits — see TxLog's verbs): the
  // ADD COLUMN type is free DDL text validated by Spark's own type parser
  // inside the command (`DECIMAL(10, 2)` etc.)
  private val RenameColumnRe = re(
    s"""\\s*ALTER\\s+TXLOG\\s+$P\\s+RENAME\\s+COLUMN\\s+(\\w+)\\s+TO\\s+(\\w+)\\s*;?\\s*""")
  private val AddColumnRe = re(
    s"""\\s*ALTER\\s+TXLOG\\s+$P\\s+ADD\\s+COLUMN\\s+(\\w+)\\s+([\\w()\\s,]+?)(?:\\s+GENERATED\\s+ALWAYS\\s+AS\\s*\\((.+)\\))?\\s*;?\\s*""")
  private val DropColumnRe = re(
    s"""\\s*ALTER\\s+TXLOG\\s+$P\\s+DROP\\s+COLUMN\\s+(\\w+)\\s*;?\\s*""")
  private val SetMappingRe = re(
    s"""\\s*ALTER\\s+TXLOG\\s+$P\\s+SET\\s+COLUMN\\s+MAPPING\\s*;?\\s*""")
  private val ConvertRe = re(
    s"""\\s*CONVERT\\s+TO\\s+TXLOG\\s+$P(?:\\s+STATS\\s+([\\w,]+))?\\s*;?\\s*""")

  private def unq(s: String): String = s.replace("''", "'")

  /** Split the SET clause on TOP-LEVEL commas only — commas inside parens
    * (`round(x, 2)`) or string literals (`concat(v, ',')`) belong to their
    * expression. A single-quote toggle is enough for SQL text: the `''`
    * escape flips the state twice and lands back where it was. */
  private[plans] def splitAssignments(setSql: String): Seq[(String, String)] = {
    val parts = scala.collection.mutable.Buffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    var inStr = false
    setSql.foreach {
      case '\'' => inStr = !inStr; sb += '\''
      case '(' if !inStr => depth += 1; sb += '('
      case ')' if !inStr => depth -= 1; sb += ')'
      case ',' if !inStr && depth == 0 => parts += sb.toString; sb.clear()
      case ch => sb += ch
    }
    parts += sb.toString
    val AssignRe = """(?s)\s*(\w+)\s*=\s*(.+)""".r
    parts.toSeq.map {
      case AssignRe(c, e) => (c, e.trim)
      case bad => throw new IllegalArgumentException(
        s"malformed SET assignment '$bad' (expected <col> = <expr>)")
    }
  }

  /** Find the first TOP-LEVEL occurrence of keyword `kw` (whitespace-
    * delimited, case-insensitive, outside string literals and parens) and
    * split around it. `SET v = 'x where y' WHERE k = 1` splits at the real
    * WHERE, never inside the literal. */
  private[plans] def splitTopLevelKeyword(s: String,
      kw: String): Option[(String, String)] = {
    var depth = 0
    var inStr = false
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '\'') inStr = !inStr
      else if (!inStr && ch == '(') depth += 1
      else if (!inStr && ch == ')') depth -= 1
      else if (!inStr && depth == 0 &&
          s.regionMatches(true, i, kw, 0, kw.length) &&
          i > 0 && s.charAt(i - 1).isWhitespace &&
          i + kw.length < s.length && s.charAt(i + kw.length).isWhitespace)
        return Some((s.substring(0, i).trim, s.substring(i + kw.length).trim))
      i += 1
    }
    None
  }

  /** Index of the LAST top-level occurrence of keyword `kw` — whitespace-
    * delimited (or string-final), case-insensitive, outside string literals
    * and parens. The backward-looking sibling of [[splitTopLevelKeyword]],
    * for peeling TRAILING clauses. */
  private def lastTopLevelKeyword(s: String, kw: String): Option[Int] = {
    var depth = 0
    var inStr = false
    var i = 0
    var last = -1
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '\'') inStr = !inStr
      else if (!inStr && ch == '(') depth += 1
      else if (!inStr && ch == ')') depth -= 1
      else if (!inStr && depth == 0 &&
          s.regionMatches(true, i, kw, 0, kw.length) &&
          i > 0 && s.charAt(i - 1).isWhitespace &&
          (i + kw.length == s.length || s.charAt(i + kw.length).isWhitespace))
        last = i
      i += 1
    }
    if (last < 0) None else Some(last)
  }

  private def parsesAsExpression(s: String): Boolean =
    try {
      val e = org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseExpression(s)
      // parseExpression accepts a trailing bare word as an ALIAS (`a AND`
      // parses as a AS `AND`, not a syntax error) — but a predicate is
      // never a top-level alias, so an Alias result means the candidate
      // was NOT a complete predicate and the peel that produced it is wrong
      !e.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Alias]
    } catch { case _: Exception => false }

  /** Trailing clauses peeled off free predicate text. */
  private[plans] final case class Peeled(predicateSql: String,
      statsCol: Option[String], changeFeed: Boolean, dv: Boolean)

  /** Peel optional trailing `STATS <col[,col…]>` and flag (`CHANGEFEED`,
    * `DV`) clauses off free predicate text. Quote/paren-aware AND
    * parse-checked: a candidate peel is accepted only when the remaining
    * predicate parses as a SQL expression, so `WHERE is_active AND
    * changefeed` (a COLUMN named changefeed) stays a whole predicate —
    * peeling it would leave the unparsable `is_active AND` — while
    * `WHERE is_active CHANGEFEED` peels the flag. When both readings parse,
    * the clause interpretation wins (quote the identifier into a
    * subexpression to force the other). Candidates try the most-peeled
    * interpretation first. */
  private[plans] def peelTail(raw: String,
      allowFlags: Boolean = true): Peeled = {
    val s = raw.trim
    val StatsColsRe = """(?is)\s*([\w,]+)\s*""".r
    def peelStats(t: String): Option[(String, String)] =
      lastTopLevelKeyword(t, "STATS").flatMap { i =>
        t.substring(i + "STATS".length) match {
          case StatsColsRe(cols) => Some((t.substring(0, i).trim, cols))
          case _                 => None
        }
      }
    val flagWords = if (allowFlags) Seq("CHANGEFEED", "DV") else Seq.empty
    // strip trailing flag words greedily from the outside in (each at most
    // once, any order): ["<pred> STATS k DV CHANGEFEED"] → prefixes with
    // 2, 1, 0 flags stripped — most-stripped tried first
    var prefixes = List((s, Set.empty[String]))
    var cont = true
    while (cont) {
      val (cur, have) = prefixes.head
      flagWords.filterNot(have).flatMap { f =>
        lastTopLevelKeyword(cur, f)
          .filter(i => cur.substring(i + f.length).forall(_.isWhitespace))
          .map(i => (cur.substring(0, i).trim, have + f))
      }.headOption match {
        case Some(next) => prefixes ::= next
        case None       => cont = false
      }
    }
    val candidates: Seq[Peeled] = prefixes.flatMap { case (pre, flags) =>
      val cf = flags("CHANGEFEED")
      val dv = flags("DV")
      peelStats(pre).map { case (p, cols) => Peeled(p, Some(cols), cf, dv) }.toSeq :+
        Peeled(pre, None, cf, dv)
    }
    candidates.find(c => parsesAsExpression(c.predicateSql))
      .getOrElse(Peeled(s, None, changeFeed = false, dv = false))
      // no peel parses: the whole text is the predicate and fails loudly
      // downstream in Spark's own parser if malformed
  }


  /** Decompose everything after `MERGE INTO TXLOG '<p>' KEY <col>`:
    * leading flags, optional WHEN clauses (full matrix), and the USING
    * query — all via top-level scans (a clause condition may contain
    * THEN/AND inside CASE expressions or parens; the source query may
    * itself contain top-level `JOIN … USING`, which is why the split takes
    * the FIRST top-level USING — ours precedes the source's text). */
  private def parseMergeTail(table: String, keyCol: String,
      tail: String): LogicalPlan = {
    val (head0, sourceSql) = splitTopLevelKeyword(" " + tail.trim, "USING")
      .getOrElse(throw new IllegalArgumentException(
        "MERGE INTO TXLOG needs USING <select-query>"))
    var rest = head0.trim
    var evolve = false
    var cf = false
    var scanning = true
    def eat(word: String): Boolean =
      if (rest.length >= word.length &&
          rest.regionMatches(true, 0, word, 0, word.length) &&
          (rest.length == word.length || rest.charAt(word.length).isWhitespace)) {
        rest = rest.drop(word.length).trim; true
      } else false
    while (scanning) scanning = eat("EVOLVE") match {
      case true => evolve = true; true
      case false => if (eat("CHANGEFEED")) { cf = true; true } else false
    }
    if (rest.isEmpty)
      return MergeTxLogCommand(table, keyCol, evolve, sourceSql, changeFeed = cf)
    require(!evolve,
      "EVOLVE applies to the upsert MERGE form only — the full WHEN-clause " +
        "matrix never evolves the schema")
    MergeFullTxLogCommand(table, keyCol, splitWhenClauses(rest), sourceSql,
      changeFeed = cf)
  }

  /** One parsed WHEN clause of the full-matrix SQL form. kind ∈
    * matched_update / matched_delete / insert / bysource_delete /
    * bysource_update. */
  private[plans] final case class WhenSql(kind: String,
      condSql: Option[String], setSql: Option[String])

  private[plans] def splitWhenClauses(text: String): Seq[WhenSql] = {
    // top-level WHEN positions partition the text into clause segments
    val s = " " + text.trim
    val starts = scala.collection.mutable.Buffer.empty[Int]
    var depth = 0
    var inStr = false
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '\'') inStr = !inStr
      else if (!inStr && ch == '(') depth += 1
      else if (!inStr && ch == ')') depth -= 1
      else if (!inStr && depth == 0 &&
          s.regionMatches(true, i, "WHEN", 0, 4) &&
          i > 0 && s.charAt(i - 1).isWhitespace &&
          i + 4 < s.length && s.charAt(i + 4).isWhitespace)
        starts += i
      i += 1
    }
    require(starts.nonEmpty && s.substring(0, starts.head).isBlank,
      s"MERGE clause text must start with WHEN: '$text'")
    val segs = starts.zipAll(starts.drop(1), -1, s.length)
      .map { case (a, b) => s.substring(a + 4, b).trim }
    segs.toSeq.map(parseWhen)
  }

  private def parseWhen(c: String): WhenSql = {
    def after(rest0: String, words: String*): Option[String] = {
      var rest = rest0
      for (w <- words) {
        if (rest.length > w.length &&
            rest.regionMatches(true, 0, w, 0, w.length) &&
            rest.charAt(w.length).isWhitespace)
          rest = rest.drop(w.length).trim
        else return None
      }
      Some(rest)
    }
    val (kind0, rest) = after(c, "NOT", "MATCHED", "BY", "SOURCE").map(("bysource", _))
      .orElse(after(c, "NOT", "MATCHED").map(("insert", _)))
      .orElse(after(c, "MATCHED").map(("matched", _)))
      .getOrElse(throw new IllegalArgumentException(
        s"malformed MERGE WHEN clause: 'WHEN $c'"))
    // optional AND <cond> up to the TOP-LEVEL THEN (a cond may contain
    // THEN inside a CASE — parens/quotes protect it from the scan)
    val (condSql, action) = after(rest, "AND") match {
      case Some(body) =>
        val (cond, act) = splitTopLevelKeyword(" " + body, "THEN").getOrElse(
          throw new IllegalArgumentException(
            s"MERGE WHEN clause needs THEN after its condition: 'WHEN $c'"))
        (Some(cond), act.trim)
      case None =>
        val act = after(rest, "THEN").getOrElse(
          throw new IllegalArgumentException(
            s"MERGE WHEN clause needs THEN: 'WHEN $c'"))
        (None, act.trim)
    }
    val aLow = action.toLowerCase(Locale.ROOT)
    if (aLow == "delete") kind0 match {
      case "matched"  => WhenSql("matched_delete", condSql, None)
      case "bysource" => WhenSql("bysource_delete", condSql, None)
      case _ => throw new IllegalArgumentException(
        "WHEN NOT MATCHED supports INSERT only (there is no target row to delete)")
    } else if (aLow == "insert") kind0 match {
      case "insert" => WhenSql("insert", condSql, None)
      case _ => throw new IllegalArgumentException(
        "INSERT applies to WHEN NOT MATCHED only")
    } else after(action, "UPDATE", "SET") match {
      case Some(setSql) => kind0 match {
        case "matched"  => WhenSql("matched_update", condSql, Some(setSql))
        case "bysource" => WhenSql("bysource_update", condSql, Some(setSql))
        case _ => throw new IllegalArgumentException(
          "UPDATE applies to WHEN MATCHED / WHEN NOT MATCHED BY SOURCE only")
      }
      case None => throw new IllegalArgumentException(
        s"unrecognized MERGE action '$action' (UPDATE SET … | DELETE | INSERT)")
    }
  }

  /** Parse one of the TXLOG statements, or None for anything else. */
  def parse(sqlText: String): Option[LogicalPlan] = {
    val o = OptimizeRe.matcher(sqlText)
    if (o.matches()) {
      // WHERE text swallows a trailing STATS clause; peel it parse-checked
      val (whereSql, peeledStats) = Option(o.group(5)) match {
        case Some(w) =>
          val peeled = peelTail(w, allowFlags = false)
          (Some(peeled.predicateSql), peeled.statsCol)
        case None => (None, None)
      }
      return Some(OptimizeTxLogCommand(
        unq(o.group(1)),
        Option(o.group(2)).map(_.toLong).getOrElse(128L * 1024 * 1024),
        (Option(o.group(3)), Option(o.group(4))) match {
          case (Some(x), Some(y)) => Some((x, y))
          case _                  => None
        },
        peeledStats.orElse(Option(o.group(6))),
        whereSql))
    }
    val v = VacuumRe.matcher(sqlText)
    if (v.matches()) {
      return Some(VacuumTxLogCommand(
        unq(v.group(1)),
        Option(v.group(2)).map(_.toLong).getOrElse(0L),
        Option(v.group(3)).map(_.toLong).getOrElse(TxLog.DefaultVacuumGraceMs),
        dryRun = v.group(4) != null))
    }
    val h = HistoryRe.matcher(sqlText)
    if (h.matches()) return Some(DescribeHistoryTxLogCommand(unq(h.group(1))))
    val dd = DetailRe.matcher(sqlText)
    if (dd.matches()) return Some(DescribeDetailTxLogCommand(unq(dd.group(1))))
    val r = RestoreRe.matcher(sqlText)
    if (r.matches())
      return Some(RestoreTxLogCommand(unq(r.group(1)), r.group(2).toLong))
    val del = DeleteRe.matcher(sqlText)
    if (del.matches()) {
      val pl = peelTail(del.group(2))
      return Some(DeleteTxLogCommand(unq(del.group(1)), pl.predicateSql,
        pl.statsCol, changeFeed = pl.changeFeed, dv = pl.dv))
    }
    val up = UpdateRe.matcher(sqlText)
    if (up.matches()) {
      val (setSql, whereTail) = splitTopLevelKeyword(up.group(2), "WHERE")
        .getOrElse(throw new IllegalArgumentException(
          "UPDATE TXLOG needs a WHERE clause (an unconditional update is " +
            "almost always a mistake — use WHERE true to mean it)"))
      val pl = peelTail(whereTail)
      return Some(UpdateTxLogCommand(unq(up.group(1)), setSql, pl.predicateSql,
        pl.statsCol, changeFeed = pl.changeFeed, dv = pl.dv))
    }
    val m = MergeRe.matcher(sqlText)
    if (m.matches()) return Some(parseMergeTail(unq(m.group(1)), m.group(2), m.group(3)))
    val c = CloneRe.matcher(sqlText)
    if (c.matches())
      return Some(CloneTxLogCommand(unq(c.group(1)), unq(c.group(2)),
        Option(c.group(3)).map(_.toLong).getOrElse(Long.MaxValue)))
    val ac = AddConstraintRe.matcher(sqlText)
    if (ac.matches())
      return Some(AddConstraintTxLogCommand(unq(ac.group(1)), ac.group(2), ac.group(3)))
    val dc = DropConstraintRe.matcher(sqlText)
    if (dc.matches())
      return Some(DropConstraintTxLogCommand(unq(dc.group(1)), dc.group(2)))
    val rn = RenameColumnRe.matcher(sqlText)
    if (rn.matches())
      return Some(RenameColumnTxLogCommand(unq(rn.group(1)), rn.group(2), rn.group(3)))
    val acn = AddColumnRe.matcher(sqlText)
    if (acn.matches())
      return Some(AddColumnTxLogCommand(unq(acn.group(1)), acn.group(2),
        acn.group(3), Option(acn.group(4))))
    val dcn = DropColumnRe.matcher(sqlText)
    if (dcn.matches())
      return Some(DropColumnTxLogCommand(unq(dcn.group(1)), dcn.group(2)))
    val sm = SetMappingRe.matcher(sqlText)
    if (sm.matches())
      return Some(SetMappingTxLogCommand(unq(sm.group(1))))
    val cv = ConvertRe.matcher(sqlText)
    if (cv.matches())
      return Some(ConvertTxLogCommand(unq(cv.group(1)), Option(cv.group(2))))
    None
  }
}

case class ConvertTxLogCommand(dir: String, statsCol: Option[String])
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("files", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val v = TxLog.convert(spark, dir, statsCol)
    Seq(Row(v, TxLog.snapshot(dir).files.size))
  }
}

case class AddConstraintTxLogCommand(table: String, name: String, exprSql: String)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxLog.addConstraint(spark, table, name, exprSql)))
}

case class RenameColumnTxLogCommand(table: String, oldName: String,
    newName: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxLog.renameColumn(table, oldName, newName)))
}

case class AddColumnTxLogCommand(table: String, name: String, typeDdl: String,
    generatedAs: Option[String] = None) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dt = spark.sessionState.sqlParser.parseDataType(typeDdl)
    Seq(Row(generatedAs match {
      case Some(e) => TxLog.addGeneratedColumn(spark, table, name, dt, e)
      case None    => TxLog.addColumn(table, name, dt)
    }))
  }
}

case class DropColumnTxLogCommand(table: String, name: String)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxLog.dropColumn(spark, table, name)))
}

case class SetMappingTxLogCommand(table: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxLog.enableColumnMapping(table)))
}

case class DropConstraintTxLogCommand(table: String, name: String)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxLog.dropConstraint(table, name)))
}

case class CloneTxLogCommand(src: String, dst: String, asOf: Long)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("cloned_version", LongType, nullable = false)(),
    AttributeReference("files", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val v = TxLog.clone(src, dst, asOf)
    Seq(Row(v, TxLog.snapshot(dst).files.size))
  }
}

case class OptimizeTxLogCommand(table: String, targetBytes: Long,
    zorder: Option[(String, String)], statsCol: Option[String],
    whereSql: Option[String] = None)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("files_before", IntegerType, nullable = false)(),
    AttributeReference("files_after", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val before = TxLog.snapshot(table).files.size
    val v = TxLog.optimize(spark, table, targetBytes,
      zorder = zorder, statsCol = statsCol,
      where = whereSql.map(org.apache.spark.sql.functions.expr))
    Seq(Row(v, before, TxLog.snapshot(table).files.size))
  }
}

case class VacuumTxLogCommand(table: String, retainVersions: Long,
    graceMs: Long, dryRun: Boolean = false)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("deleted_files", LongType, nullable = false)(),
    AttributeReference("dry_run", BooleanType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxLog.vacuum(table, retainVersions, graceMs, dryRun), dryRun))
}

case class RestoreTxLogCommand(table: String, version: Long)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_to", LongType, nullable = false)(),
    AttributeReference("new_version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(version, TxLog.restore(table, version)))
}

case class DeleteTxLogCommand(table: String, predicateSql: String,
    statsCol: Option[String], changeFeed: Boolean = false, dv: Boolean = false)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("files_rewritten", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    // the predicate text goes through Spark's OWN expression parser (via
    // expr), so anything standard SQL accepts works and anything malformed
    // fails with Spark's parse error, not a regex surprise
    val before = TxLog.snapshot(table).files.toSet
    val v = TxLog.delete(spark, table,
      org.apache.spark.sql.functions.expr(predicateSql), statsCol,
      changeFeed = changeFeed, useDV = dv)
    val after = TxLog.snapshot(table).files.toSet
    Seq(Row(v, (before -- after).size))
  }
}

case class UpdateTxLogCommand(table: String, setSql: String,
    predicateSql: String, statsCol: Option[String], changeFeed: Boolean = false,
    dv: Boolean = false)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("files_rewritten", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    // each right-hand side and the predicate go through Spark's OWN
    // expression parser (via expr) — standard SQL in, Spark's parse error
    // out; simultaneous-assignment semantics live in TxLog.update
    val parsed = TxLogSql.splitAssignments(setSql)
    // dedupe under the SESSION's resolution semantics: with the default
    // case-insensitive analysis, `SET a=1, A=2` is a duplicate target and
    // must be refused HERE — .toMap below would silently keep both spellings
    // as distinct keys and the resolver inside TxLog.update picks a winner
    val ci = !spark.sessionState.conf.caseSensitiveAnalysis
    val dups = parsed
      .groupBy(p => if (ci) p._1.toLowerCase(Locale.ROOT) else p._1)
      .collect { case (c, as) if as.size > 1 => c }
    require(dups.isEmpty,
      s"UPDATE assigns ${dups.mkString(", ")} more than once (SQL refuses " +
        "duplicate SET targets — the winner would be silent)")
    val assigns = parsed.map { case (c, e) =>
      c -> org.apache.spark.sql.functions.expr(e)
    }.toMap
    val before = TxLog.snapshot(table).files.toSet
    val v = TxLog.update(spark, table,
      org.apache.spark.sql.functions.expr(predicateSql), assigns, statsCol,
      changeFeed = changeFeed, useDV = dv)
    val after = TxLog.snapshot(table).files.toSet
    Seq(Row(v, (before -- after).size))
  }
}

/** The full-matrix SQL MERGE: parsed WHEN clauses map onto
  * [[TxLog.mergeFull]]'s ordered clause list; conditions and SET
  * right-hand sides go through Spark's own expression parser and reference
  * the t./s. aliases exactly as the API form does. */
case class MergeFullTxLogCommand(table: String, keyCol: String,
    clauses: Seq[TxLogSql.WhenSql], sourceSql: String,
    changeFeed: Boolean = false) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.expr
    def assigns(setSql: String): Map[String, org.apache.spark.sql.Column] =
      TxLogSql.splitAssignments(setSql)
        .map { case (c, e) => c -> expr(e) }.toMap
    val cls: Seq[TxLog.MergeClause] = clauses.map { w =>
      val cond = w.condSql.map(expr)
      w.kind match {
        case "matched_update"  => TxLog.MatchedUpdate(assigns(w.setSql.get), cond)
        case "matched_delete"  => TxLog.MatchedDelete(cond)
        case "insert"          => TxLog.NotMatchedInsert(cond)
        case "bysource_delete" => TxLog.NotMatchedBySourceDelete(cond)
        case "bysource_update" => TxLog.NotMatchedBySourceUpdate(assigns(w.setSql.get), cond)
      }
    }
    Seq(Row(TxLog.mergeFull(spark.sql(sourceSql), table, keyCol, cls,
      changeFeed = changeFeed)))
  }
}

case class MergeTxLogCommand(table: String, keyCol: String,
    mergeSchema: Boolean, sourceSql: String, changeFeed: Boolean = false)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    // the source text goes through Spark's OWN sql entry point — any
    // SELECT (or table reference) works, malformed text fails with Spark's
    // parse error; the delegating parser is not re-entered for TXLOG heads
    // because the source of a MERGE is a query, never a command
    val updates = spark.sql(sourceSql)
    Seq(Row(TxLog.merge(updates, table, keyCol, mergeSchema = mergeSchema,
      changeFeed = changeFeed)))
  }
}

/** One-row table summary (the Delta DESCRIBE DETAIL surface): current
  * version, live file count and total bytes, last-commit time, the newest
  * checkpoint, and the recorded schema in DDL form. Driver-side O(files)
  * metadata — no Spark job. */
case class DescribeDetailTxLogCommand(table: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("num_files", IntegerType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("last_commit_at", TimestampType, nullable = true)(),
    AttributeReference("checkpoint_version", LongType, nullable = true)(),
    AttributeReference("schema_ddl", StringType, nullable = true)(),
    AttributeReference("constraints", StringType, nullable = true)(),
    AttributeReference("num_rows", LongType, nullable = true)(),
    AttributeReference("partition_by", StringType, nullable = true)(),
    AttributeReference("column_mapping", StringType, nullable = true)(),
    AttributeReference("features", StringType, nullable = true)())

  override def run(spark: SparkSession): Seq[Row] = {
    val d = TxLog.describeDetail(table)
    val bytes = d.files.map { p =>
      try java.nio.file.Files.size(java.nio.file.Paths.get(p))
      catch { case _: java.io.IOException => 0L }
    }.sum
    // under column mapping the user-facing schema is the LOGICAL view —
    // physical names are storage internals, shown in column_mapping
    val schemaDdl = d.schemaJson.map { j =>
      val phys = org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[StructType]
      if (d.columnMapping.isEmpty) phys.toDDL
      else {
        val byPhys = phys.fields.map(f => f.name -> f).toMap
        StructType(d.columnMapping.collect {
          case (l, p) if byPhys.contains(p) => byPhys(p).copy(name = l)
        }).toDDL
      }
    }
    Seq(Row(
      table,
      d.version,
      d.files.size,
      bytes,
      d.lastCommitAtMs.map(new java.sql.Timestamp(_)).orNull,
      d.checkpointVersion.map(Long.box).orNull,
      schemaDdl.orNull,
      if (d.constraints.isEmpty) null
      else d.constraints.toSeq.sortBy(_._1)
        .map { case (n, e) => s"$n CHECK ($e)" }.mkString("; "),
      // metadata-only COUNT(*): present iff every live file recorded a count
      TxLog.rowCount(table).map(Long.box).orNull,
      if (d.partitionBy.isEmpty) null else d.partitionBy.mkString(", "),
      if (d.columnMapping.isEmpty) null
      else d.columnMapping.map { case (l, p) => s"$l->$p" }.mkString(", "),
      d.protocol.map(p =>
        s"read: ${p.readerFeatures.toSeq.sorted.mkString(",")}; " +
          s"write: ${p.writerFeatures.toSeq.sorted.mkString(",")}").orNull))
  }
}

case class DescribeHistoryTxLogCommand(table: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("op", StringType, nullable = false)(),
    AttributeReference("committed_at", TimestampType, nullable = false)(),
    AttributeReference("adds", IntegerType, nullable = false)(),
    AttributeReference("removes", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    TxLog.history(table).map { c =>
      Row(c.version, c.op, new java.sql.Timestamp(c.committedAtMs), c.adds, c.removes)
    }
}

/** Analyzer rule resolving `txlog.`<path>`` table references in plain SQL —
  * the read-side completion of the pure-SQL story (the Delta `delta.`path``
  * shape): `SELECT * FROM txlog.`/data/tbl`` plans the SAME log-backed,
  * stats-skipping parquet relation the `format("txlog")` reader builds, so
  * pushdown/pruning/codegen are identical. Time travel rides a version
  * suffix: `txlog.`/data/tbl@v3`` reads version 3. The rule only fires on
  * the two-part identifier whose head is exactly `txlog` AND whose second
  * part is path-shaped (contains a `/`). The rule runs in the analyzer's
  * pre-resolution hint slot (it must — see GraftExtensions), so the
  * path-shape guard is what protects a real catalog database named
  * `txlog`: `txlog.sometable` has no slash and falls through to Spark's
  * own resolution untouched, while no filesystem table path is ever
  * slash-free. */
case class ResolveTxLogRelation(spark: SparkSession)
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {

  private val Versioned = """(.+)@v(\d+)""".r

  private def txlogShaped(
      u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation): Boolean =
    u.multipartIdentifier.length == 2 &&
      u.multipartIdentifier.head.equalsIgnoreCase("txlog") &&
      u.multipartIdentifier(1).contains("/")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // INSERT targets rewrite FIRST, top-down — before the bottom-up relation
    // pass turns the target into a parquet LogicalRelation, which Spark
    // would plan as a DIRECT file write into the table root: files on disk
    // that no commit references, i.e. a write that silently VANISHES from
    // every snapshot (and is eventually vacuumed). The transactional path
    // is the only correct one, so INSERT INTO/OVERWRITE becomes the
    // append/overwrite verb; the source query stays unanalyzed inside the
    // command and resolves at run time (where a txlog.`…` READ inside it
    // goes through this same rule again).
    val withInserts = plan.resolveOperatorsDown {
      case i: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement
          if i.table.isInstanceOf[org.apache.spark.sql.catalyst.analysis.UnresolvedRelation] &&
            txlogShaped(i.table.asInstanceOf[org.apache.spark.sql.catalyst.analysis.UnresolvedRelation]) =>
        val u = i.table.asInstanceOf[org.apache.spark.sql.catalyst.analysis.UnresolvedRelation]
        require(i.partitionSpec.isEmpty && i.userSpecifiedCols.isEmpty,
          "INSERT into a txlog table supports neither PARTITION specs nor " +
            "column lists — the log tracks files, not partitions; project " +
            "the columns in the SELECT instead")
        u.multipartIdentifier(1) match {
          case Versioned(_, _) => throw new IllegalArgumentException(
            "cannot INSERT into a versioned txlog reference (@vN is a read-only snapshot)")
          case path => InsertTxLogCommand(path, i.overwrite, i.query)
        }
    }
    withInserts.resolveOperatorsUp {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation if txlogShaped(u) =>
        val params = u.multipartIdentifier(1) match {
          case Versioned(path, v) => Map("path" -> path, "versionAsOf" -> v)
          case path               => Map("path" -> path)
        }
        org.apache.spark.sql.GraftBridge.logicalRelation(
          graft.sources.TxLogBatch.relation(spark.sqlContext, params))
    }
  }
}

/** `INSERT INTO txlog.`<path>`` / `INSERT OVERWRITE txlog.`<path>`` — the
  * pure-SQL write path onto the transactional verbs (append / overwrite).
  * The source query is captured UNANALYZED and resolved at run time; the
  * write then goes through the same schema enforcement, CHECK constraints,
  * and optimistic commit protocol as every other writer. Column matching
  * is BY NAME against the table's recorded schema (TxLog's discipline):
  * a query whose columns drift fails loudly with SchemaMismatch rather
  * than silently writing positionally. */
case class InsertTxLogCommand(table: String, overwrite: Boolean,
    query: LogicalPlan) extends LeafRunnableCommand {

  // the deferred query is display-only here; it is NOT a child (analysis
  // happens inside run), so the command itself is always resolved
  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val df0 = org.apache.spark.sql.GraftBridge.ofRows(spark, query)
    // SQL INSERT matches BY POSITION (a VALUES row has no names at all):
    // reconcile the query's columns positionally against the table's
    // recorded schema — rename, and insert lossless widening casts
    // (an int literal into a bigint column) — then hand the result to the
    // verb, whose by-name enforcement now sees the table's own shape and
    // still refuses real type conflicts loudly. Arity drift is refused
    // HERE (a positional write with the wrong column count is never
    // meaningful). A brand-new/legacy table adopts the query's schema.
    val snap = TxLog.snapshot(table)
    val df = snap.schemaJson match {
      case Some(j) =>
        val phys = org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[StructType]
        // positional targets are the LOGICAL view: under column mapping the
        // verbs expect logical names (renaming to physical here would
        // double-translate), and dropped columns are not insert targets
        val logical =
          if (snap.colmap.isEmpty) phys.fields.toSeq
          else {
            val byPhys = phys.fields.map(f => f.name -> f).toMap
            snap.colmap.collect { case (l, p) if byPhys.contains(p) =>
              byPhys(p).copy(name = l)
            }
          }
        // GENERATED columns may be omitted wholesale — the write computes
        // them; physical rule names map back to logical for the exclusion
        val gens = TxLog.generatedColumns(table).keySet
        val genLogical = logical.filter { f =>
          val p = snap.colmap.collectFirst { case (l, pp) if l == f.name => pp }
            .getOrElse(f.name)
          gens.contains(p)
        }.map(_.name).toSet
        val targets =
          if (df0.schema.length == logical.length) logical
          else if (df0.schema.length == logical.length - genLogical.size)
            logical.filterNot(f => genLogical.contains(f.name))
          else throw new IllegalArgumentException(
            s"INSERT provides ${df0.schema.length} column(s) but txlog table " +
              s"$table has ${logical.length} " +
              s"(${logical.map(_.name).mkString(", ")})" +
              (if (genLogical.isEmpty) ""
               else s" of which ${genLogical.mkString(", ")} are generated and may be omitted"))
        val renamed = df0.toDF(targets.map(_.name): _*)
        renamed.select(targets.map { f =>
          val got = renamed.schema(f.name).dataType
          val c = org.apache.spark.sql.functions.col(f.name)
          if (got != f.dataType &&
              org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(got, f.dataType))
            c.cast(f.dataType).as(f.name)
          else c // exact match passes; a real conflict fails in the verb
        }.toSeq: _*)
      case None => df0
    }
    val v =
      if (overwrite) TxLog.overwrite(df, table)
      else TxLog.append(df, table)
    Seq(Row(v))
  }
}

/** Delegating parser: TXLOG statements parse here, all other text — plans,
  * expressions, identifiers, schemas — falls through to Spark's parser
  * untouched, so the extension can never change the meaning of standard
  * SQL. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    TxLogSql.parse(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
