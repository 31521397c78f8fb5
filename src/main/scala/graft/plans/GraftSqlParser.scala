package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL-surface extension: accepts `MERGE INTO … USING … ON … WHEN …`
  * statements and LOWERS them to the engine's merge plan — the
  * left-equi-join + anti-join-union formulation the `k_merge_upsert`
  * operator established (operators/Formats.scala) — handed back to the
  * delegate parser as plain SELECT text. Spark's built-in MERGE parse
  * lands on `SupportsRowLevelOperations`, which snapshot-manifest
  * tables don't implement; this closes the SQL-text gap the catalog
  * plugin (sources/GraftCatalog.scala) opened: a SQL user can now
  * MERGE against any resolvable relation and gets the post-merge
  * snapshot as the statement's result set (the next table version —
  * committing it is the write step, same as every manifest commit).
  *
  * Grammar (first-matching-clause semantics, the SQL:2003 shape):
  * {{{
  *   MERGE INTO <target> [AS] <t>
  *   USING <source | (subquery)> [AS] <s>
  *   ON <condition>
  *   { WHEN MATCHED [AND <cond>] THEN { DELETE | UPDATE SET c = e [, …] }
  *   | WHEN NOT MATCHED [AND <cond>] THEN INSERT (cols) VALUES (exprs) }+
  * }}}
  * Malformed clauses (INSERT under MATCHED, UPDATE/DELETE under NOT
  * MATCHED, empty WHEN list, bad assignments) are rejected with a
  * parse error. Every other statement passes through untouched. */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    if (MergeSqlRewrite.isMergeInto(sqlText))
      delegate.parsePlan(MergeSqlRewrite.rewrite(session, sqlText))
    else delegate.parsePlan(sqlText)

  override def parseQuery(sqlText: String): LogicalPlan =
    if (MergeSqlRewrite.isMergeInto(sqlText))
      delegate.parsePlan(MergeSqlRewrite.rewrite(session, sqlText))
    else delegate.parseQuery(sqlText)

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object MergeSqlRewrite {

  def isMergeInto(sqlText: String): Boolean = {
    val t = sqlText.trim
    t.length >= 5 && t.substring(0, 5).equalsIgnoreCase("MERGE")
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"MERGE INTO: $msg")

  /** One matched clause: None = DELETE, Some(assignments) = UPDATE SET. */
  private final case class MatchedClause(
      cond: Option[String], assigns: Option[Seq[(String, String)]])
  private final case class NotMatchedClause(
      cond: Option[String], cols: Seq[String], exprs: Seq[String])

  /** Indexes of top-level (not inside parens / quotes / backticks)
    * occurrences of a bare keyword, case-insensitive. */
  private def topLevelKeyword(text: String, kw: String): Seq[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var depth = 0
    var i = 0
    var quote: Char = 0
    val upper = text.toUpperCase
    while (i < text.length) {
      val c = text.charAt(i)
      if (quote != 0) {
        if (c == quote) quote = 0
        i += 1
      } else c match {
        case '\'' | '"' | '`' => quote = c; i += 1
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case _ =>
          if (depth == 0 && upper.startsWith(kw, i) &&
              (i == 0 || !Character.isLetterOrDigit(text.charAt(i - 1))) &&
              (i + kw.length >= text.length ||
                !Character.isLetterOrDigit(text.charAt(i + kw.length)))) {
            out += i
            i += kw.length
          } else i += 1
      }
    }
    out.toSeq
  }

  /** Split on top-level commas (for SET lists, column lists, VALUES). */
  private def splitTopLevel(text: String, sep: Char): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    text.foreach { c =>
      if (quote != 0) { if (c == quote) quote = 0; cur += c }
      else c match {
        case '\'' | '"' | '`' => quote = c; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case x if x == sep && depth == 0 => out += cur.toString; cur.clear()
        case x => cur += x
      }
    }
    out += cur.toString
    out.toSeq.map(_.trim)
  }

  /** `<relation> [AS] [alias]` → (relationText, alias). A bare name's
    * default alias is its last dotted part; a subquery must be aliased. */
  private def parseRelation(spec: String, what: String): (String, String) = {
    val t = spec.trim
    if (t.startsWith("(")) {
      // find the matching close paren, the rest is the alias
      var depth = 0; var end = -1; var i = 0; var quote: Char = 0
      while (i < t.length && end < 0) {
        val c = t.charAt(i)
        if (quote != 0) { if (c == quote) quote = 0 }
        else c match {
          case '\'' | '"' | '`' => quote = c
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) end = i
          case _ =>
        }
        i += 1
      }
      if (end < 0) fail(s"unbalanced parentheses in $what relation: $spec")
      val alias = t.substring(end + 1).trim.replaceAll("(?i)^AS\\s+", "")
      if (alias.isEmpty) fail(s"a subquery $what must have an alias")
      (t.substring(0, end + 1), alias)
    } else {
      val parts = t.split("\\s+").toSeq
      parts match {
        case Seq(name) => (name, name.split('.').last.stripPrefix("`").stripSuffix("`"))
        case Seq(name, alias) => (name, alias)
        case Seq(name, as, alias) if as.equalsIgnoreCase("AS") => (name, alias)
        case _ => fail(s"cannot parse $what relation: $spec")
      }
    }
  }

  private val MatchedRe =
    "(?is)^\\s*MATCHED\\s*(?:AND\\s+(.*?))?\\s*THEN\\s+(DELETE|UPDATE\\s+SET\\s+.*)\\s*$".r
  private val NotMatchedRe =
    "(?is)^\\s*NOT\\s+MATCHED\\s*(?:AND\\s+(.*?))?\\s*THEN\\s+INSERT\\s*\\((.*?)\\)\\s*VALUES\\s*\\((.*)\\)\\s*$".r
  private val NotMatchedBadRe =
    "(?is)^\\s*NOT\\s+MATCHED\\s*(?:AND\\s+.*?)?\\s*THEN\\s+(UPDATE|DELETE).*$".r
  private val MatchedBadRe =
    "(?is)^\\s*MATCHED\\s*(?:AND\\s+.*?)?\\s*THEN\\s+INSERT.*$".r

  private def parseAssignments(setList: String): Seq[(String, String)] =
    splitTopLevel(setList, ',').map { a =>
      val eq = {
        // first top-level '=' not part of <=, >=, <>, ==, !=
        var depth = 0; var quote: Char = 0; var found = -1; var i = 0
        while (i < a.length && found < 0) {
          val c = a.charAt(i)
          if (quote != 0) { if (c == quote) quote = 0 }
          else c match {
            case '\'' | '"' | '`' => quote = c
            case '(' => depth += 1
            case ')' => depth -= 1
            case '=' if depth == 0 &&
                (i == 0 || !"<>!=".contains(a.charAt(i - 1))) &&
                (i + 1 >= a.length || a.charAt(i + 1) != '=') => found = i
            case _ =>
          }
          i += 1
        }
        found
      }
      if (eq <= 0) fail(s"cannot parse UPDATE SET assignment: $a")
      val colName = a.substring(0, eq).trim
      if (!colName.matches("`?[A-Za-z_][A-Za-z0-9_]*`?"))
        fail(s"UPDATE SET target must be an unqualified column, got: $colName")
      (colName.stripPrefix("`").stripSuffix("`"), a.substring(eq + 1).trim)
    }

  /** Rewrites the MERGE statement into the equivalent SELECT text (the
    * k_merge_upsert plan shape): target LEFT JOIN matched-flagged source
    * with first-fired-clause CASE projection and delete filtering,
    * UNION ALL the source anti-joined insert leg. Column types are
    * pinned by CASTs to the target schema so the union resolves. */
  def rewrite(session: SparkSession, sqlText: String): String = {
    val text = sqlText.trim.stripSuffix(";")
    val re = "(?is)^MERGE\\s+INTO\\s+(.*?)\\s+USING\\s+(.*?)\\s+ON\\s+(.*)$".r
    val (targetSpec, sourceSpec, rest) = text match {
      case re(t, u, r) => (t, u, r)
      case _ => fail(s"cannot parse statement: expected MERGE INTO … USING … ON …")
    }
    val whenIdx = topLevelKeyword(rest, "WHEN")
    if (whenIdx.isEmpty) fail("at least one WHEN clause is required")
    val onCond = rest.substring(0, whenIdx.head).trim
    if (onCond.isEmpty) fail("empty ON condition")
    val clauseTexts = whenIdx.zipAll(whenIdx.drop(1), 0, rest.length).map {
      case (a, b) => rest.substring(a + "WHEN".length, b).trim
    }

    val (target, tAlias) = parseRelation(targetSpec, "target")
    val (source, sAlias) = parseRelation(sourceSpec, "source")
    if (tAlias == sAlias) fail(s"target and source aliases collide: $tAlias")

    var matched = Vector.empty[MatchedClause]
    var notMatched = Vector.empty[NotMatchedClause]
    clauseTexts.foreach {
      case MatchedBadRe() => fail("INSERT is not allowed under WHEN MATCHED")
      case NotMatchedBadRe(act) => fail(s"$act is not allowed under WHEN NOT MATCHED")
      case MatchedRe(cond, action) =>
        if (action.equalsIgnoreCase("DELETE"))
          matched :+= MatchedClause(Option(cond).map(_.trim), None)
        else {
          val setList = action.replaceAll("(?is)^UPDATE\\s+SET\\s+", "")
          matched :+= MatchedClause(Option(cond).map(_.trim),
            Some(parseAssignments(setList)))
        }
      case NotMatchedRe(cond, cols, exprs) =>
        val cs = splitTopLevel(cols, ',')
          .map(_.stripPrefix("`").stripSuffix("`"))
        val es = splitTopLevel(exprs, ',')
        if (cs.length != es.length)
          fail(s"INSERT column/value arity mismatch: ${cs.length} vs ${es.length}")
        notMatched :+= NotMatchedClause(Option(cond).map(_.trim), cs, es)
      case other => fail(s"cannot parse WHEN clause: WHEN $other")
    }

    val schema = session.table(target).schema
    val sm = s"`$sAlias`.`__graft_sm`"
    def fired(cond: Option[String], earlier: Seq[Option[String]], m: Boolean): String = {
      val self = cond.map(c => s"COALESCE(CAST(($c) AS BOOLEAN), FALSE)").getOrElse("TRUE")
      val notEarlier = earlier.map(e =>
        s"NOT ${e.map(c => s"COALESCE(CAST(($c) AS BOOLEAN), FALSE)").getOrElse("TRUE")}")
      val base = if (m) Seq(s"$sm IS NOT NULL", self) else Seq(self)
      (base ++ notEarlier).mkString("(", " AND ", ")")
    }
    val mFired = matched.zipWithIndex.map { case (c, i) =>
      (c, fired(c.cond, matched.take(i).map(_.cond), m = true))
    }
    val nmFired = notMatched.zipWithIndex.map { case (c, i) =>
      (c, fired(c.cond, notMatched.take(i).map(_.cond), m = false))
    }

    // kept/updated leg: every target column wrapped in the first-fired
    // CASE over the UPDATE clauses (delete-fired rows drop in WHERE)
    val keptItems = schema.fields.map { f =>
      val updates = mFired.collect {
        case (MatchedClause(_, Some(assigns)), fire)
            if assigns.exists(_._1.equalsIgnoreCase(f.name)) =>
          val expr = assigns.find(_._1.equalsIgnoreCase(f.name)).get._2
          s"WHEN $fire THEN CAST(($expr) AS ${f.dataType.sql})"
      }
      if (updates.isEmpty) s"`$tAlias`.`${f.name}` AS `${f.name}`"
      else s"CASE ${updates.mkString(" ")} ELSE `$tAlias`.`${f.name}` END AS `${f.name}`"
    }
    val deleteFilter = mFired.collect { case (MatchedClause(_, None), fire) => fire }
    val whereKept =
      if (deleteFilter.isEmpty) "" else s" WHERE NOT (${deleteFilter.mkString(" OR ")})"
    val keptLeg =
      s"SELECT ${keptItems.mkString(", ")} FROM $target AS `$tAlias` LEFT JOIN " +
        s"(SELECT *, TRUE AS `__graft_sm` FROM $source) AS `$sAlias` " +
        s"ON ($onCond)$whereKept"

    // insert leg: source rows with no join partner, first-fired clause
    val insertLeg = if (notMatched.isEmpty) "" else {
      val items = schema.fields.map { f =>
        val arms = nmFired.map { case (c, fire) =>
          val expr = c.cols.zip(c.exprs)
            .find(_._1.equalsIgnoreCase(f.name)).map(_._2).getOrElse("NULL")
          s"WHEN $fire THEN CAST(($expr) AS ${f.dataType.sql})"
        }
        s"CASE ${arms.mkString(" ")} END AS `${f.name}`"
      }
      val anyFired = nmFired.map(_._2).mkString(" OR ")
      s" UNION ALL SELECT ${items.mkString(", ")} FROM $source AS `$sAlias` " +
        s"LEFT ANTI JOIN $target AS `$tAlias` ON ($onCond) WHERE ($anyFired)"
    }
    keptLeg + insertLeg
  }
}
