package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Parser for the PostgREST query-string filter language the reference passes
 * through verbatim (SURVEY.md §2.2 P1/P2; xcube-geodb geodb.py:1866-1874).
 *
 * Supported surface (the PostgREST v6 operators the reference docs pin at
 * geodb.py:1372-1373, plus the shapes its tests/docs exercise):
 *   - `col=op.value` with op in eq,neq/ne,gt,gte/ge,lt,lte/le,like,ilike,
 *     in,is,cs,cd,ov,fts and a `not.` prefix
 *   - bare `col=value` equality (tests/core/test_geodb.py:191)
 *   - logic trees: `or=(a.eq.1,b.eq.2)`, nested
 *     `and=(or(x.eq.140,x.eq.168),y.gt.1)` (eurocrops notebook)
 *   - `select=`, `order=col.desc.nullslast,...`, `limit=`, `offset=`
 *
 * Emits Catalyst `Column` trees — Spark pushes the resulting predicates into
 * the Parquet scan (PushedFilters), so this parser is purely front-end.
 */
object PostgrestFilter {

  case class Parsed(
      predicate: Option[Column],
      select: Option[Seq[String]],
      order: Seq[Column],
      limit: Option[Int],
      offset: Option[Int])

  def parse(query: String): Parsed = {
    var pred: Option[Column] = None
    var select: Option[Seq[String]] = None
    var order: Seq[Column] = Seq.empty
    var limit: Option[Int] = None
    var offset: Option[Int] = None

    def and(c: Column): Unit = pred = Some(pred.map(_ && c).getOrElse(c))

    query.split("&").iterator.map(_.trim).filter(_.nonEmpty).foreach { part =>
      val eq = part.indexOf('=')
      require(eq > 0, s"malformed query fragment: $part")
      val key = part.substring(0, eq)
      val value = part.substring(eq + 1)
      key match {
        case "limit"  => limit = Some(value.toInt)
        case "offset" => offset = Some(value.toInt)
        case "select" => select = Some(value.split(",").map(_.trim).toSeq)
        case "order"  => order = value.split(",").map(_.trim).map(parseOrder).toSeq
        case "and"    => and(parseLogic("and", stripParens(value)))
        case "or"     => and(parseLogic("or", stripParens(value)))
        case "not.and" => and(!parseLogic("and", stripParens(value)))
        case "not.or"  => and(!parseLogic("or", stripParens(value)))
        case c        => and(parseCondition(c, value))
      }
    }
    Parsed(pred, select, order, limit, offset)
  }

  /** `select=` item: plain column, `alias:column`, or `column::cast`
    * (PostgREST vertical-filtering syntax). */
  private def selectItem(spec: String): Column = {
    val (alias, rest) = spec.indexOf(':') match {
      case i if i >= 0 && !spec.startsWith("::") && spec.charAt(math.min(i + 1, spec.length - 1)) != ':' =>
        (Some(spec.substring(0, i)), spec.substring(i + 1))
      case _ => (None, spec)
    }
    val c = rest.split("::") match {
      case Array(name, cast) => col(name).cast(cast)
      case _ => col(rest)
    }
    alias.map(c.as).getOrElse(c)
  }

  /** Apply a parsed query to a frame (PostgREST path: offset valid alone). */
  def apply(df: DataFrame, query: String): DataFrame = {
    val p = parse(query)
    var out = p.predicate.map(df.filter).getOrElse(df)
    out = p.select.map(cs => out.select(cs.map(selectItem): _*)).getOrElse(out)
    if (p.order.nonEmpty) out = out.orderBy(p.order: _*)
    out = p.offset.map(out.offset).getOrElse(out)
    out = p.limit.map(out.limit).getOrElse(out)
    out
  }

  private def parseOrder(spec: String): Column = {
    val parts = spec.split("\\.").toSeq
    val c = col(parts.head)
    val mods = parts.tail.map(_.toLowerCase)
    mods.foreach { m =>
      require(Set("asc", "desc", "nullsfirst", "nullslast").contains(m),
        s"bad order modifier $m")
    }
    val desc = mods.contains("desc")
    (desc, mods.contains("nullsfirst"), mods.contains("nullslast")) match {
      case (false, true, _) => c.asc_nulls_first
      case (false, _, true) => c.asc_nulls_last
      case (false, _, _)    => c.asc
      case (true, true, _)  => c.desc_nulls_first
      case (true, _, true)  => c.desc_nulls_last
      case (true, _, _)     => c.desc
    }
  }

  /** `col=<op>.<value>` (or bare `col=value`). */
  private def parseCondition(column: String, rhs: String): Column = {
    val (negated, body) =
      if (rhs.startsWith("not.")) (true, rhs.substring(4)) else (false, rhs)
    val dot = body.indexOf('.')
    val (op, value) =
      if (dot < 0) ("eq", body)
      else {
        val candidate = body.substring(0, dot)
        if (ops.contains(candidate)) (candidate, body.substring(dot + 1))
        else ("eq", body) // bare equality where value contains a dot (e.g. 3.5)
      }
    val c = buildOp(col(column), op, value)
    if (negated) !c else c
  }

  private val ops = Set("eq", "neq", "ne", "gt", "gte", "ge", "lt", "lte", "le",
    "like", "ilike", "in", "is", "cs", "cd", "ov", "fts")

  private def buildOp(c: Column, op: String, raw: String): Column = op match {
    case "eq"          => c === typed(raw)
    case "neq" | "ne"  => c =!= typed(raw)
    case "gt"          => c > typed(raw)
    case "gte" | "ge"  => c >= typed(raw)
    case "lt"          => c < typed(raw)
    case "lte" | "le"  => c <= typed(raw)
    case "like"        => c.like(raw.replace("*", "%"))
    case "ilike"       => c.ilike(raw.replace("*", "%"))
    case "fts"         => ftsPredicate(c, raw)
    case "in" =>
      val vals = splitTop(stripParens(raw)).map(v => typedValue(unquote(v)))
      c.isin(vals: _*)
    case "is" => raw.toLowerCase match {
      case "null"  => c.isNull
      case "true"  => c === true
      case "false" => c === false
      case other   => throw new IllegalArgumentException(s"is.$other not supported")
    }
    case "cs" => // column array contains all listed values
      arrayVals(raw).map(v => array_contains(c, v)).reduce(_ && _)
    case "cd" => // column array contained in listed values
      size(array_except(c, array(arrayVals(raw).map(lit): _*))) === 0
    case "ov" => // overlap
      arrays_overlap(c, array(arrayVals(raw).map(lit): _*))
    case other => throw new IllegalArgumentException(s"operator $other not supported")
  }

  /**
   * PostgREST `fts` = tsvector word matching (`to_tsvector(col) @@
   * to_tsquery(q)`), NOT substring search: `fts.cat` matches "a cat sat"
   * but not "category". Implemented as whole-word lexeme equality over a
   * lowercased unicode-word split (no stemming — documented deviation from
   * Postgres' language-aware dictionaries). Terms combine with AND when
   * separated by space/`+`/`&` (plainto/to_tsquery AND semantics) and with
   * OR when separated by `|`; mixed queries nest as OR of AND groups
   * (`cat&dog|fox` = (cat AND dog) OR fox — `|` binds loosest, matching
   * to_tsquery's precedence where `&` binds tighter than `|`).
   */
  private def ftsPredicate(c: Column, raw: String): Column = {
    val toks = split(lower(c), "[^\\p{L}\\p{N}]+")
    def term(t: String): Column = array_contains(toks, t.toLowerCase)
    def andGroup(g: String): Option[Column] =
      g.split("[\\s+&]+").toSeq.filter(_.nonEmpty).map(term).reduceOption(_ && _)
    raw.split("\\|").toSeq.map(_.trim).flatMap(andGroup)
      .reduceOption(_ || _).getOrElse(lit(true))
  }

  /** `(cond,cond,...)` body where cond = col.op.value | and(...) | or(...) */
  private def parseLogic(combiner: String, body: String): Column = {
    val parts = splitTop(body).map(parseLogicTerm)
    combiner match {
      case "and" => parts.reduce(_ && _)
      case "or"  => parts.reduce(_ || _)
    }
  }

  private def parseLogicTerm(term: String): Column = {
    val t = term.trim
    val (negated, body) = if (t.startsWith("not.")) (true, t.substring(4)) else (false, t)
    val c =
      if (body.startsWith("and(") && body.endsWith(")"))
        parseLogic("and", body.substring(4, body.length - 1))
      else if (body.startsWith("or(") && body.endsWith(")"))
        parseLogic("or", body.substring(3, body.length - 1))
      else {
        // col.op.rest — first dot separates column from op.value
        val dot = body.indexOf('.')
        require(dot > 0, s"malformed condition: $term")
        parseCondition(body.substring(0, dot), body.substring(dot + 1))
      }
    if (negated) !c else c
  }

  // ---- lexing helpers ----
  private def stripParens(s: String): String = {
    val t = s.trim
    if (t.startsWith("(") && t.endsWith(")")) t.substring(1, t.length - 1) else t
  }

  /** Split on commas not nested inside parens/braces/quotes. */
  private[query] def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inQ = false; val cur = new StringBuilder
    s.foreach {
      case '"' => inQ = !inQ; cur += '"'
      case c @ ('(' | '{' | '[') if !inQ => depth += 1; cur += c
      case c @ (')' | '}' | ']') if !inQ => depth -= 1; cur += c
      case ',' if depth == 0 && !inQ => out += cur.result(); cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.result()
    out.result()
  }

  private def unquote(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && t.startsWith("\"") && t.endsWith("\""))
      t.substring(1, t.length - 1)
    else t
  }

  private def arrayVals(raw: String): Seq[Any] = {
    val t = raw.trim
    val body =
      if (t.startsWith("{") && t.endsWith("}")) t.substring(1, t.length - 1) else t
    splitTop(body).map(v => typedValue(unquote(v)))
  }

  /** Literal with inferred type, so ANSI-mode comparisons stay well-typed. */
  private[query] def typedValue(s: String): Any =
    s.toLongOption
      .orElse(s.toDoubleOption)
      .orElse(s.toLowerCase match {
        case "true" => Some(true); case "false" => Some(false); case _ => None
      })
      .getOrElse(s)

  private def typed(s: String): Column =
    if (s.equalsIgnoreCase("null")) lit(null) else lit(typedValue(unquote(s)))
}
