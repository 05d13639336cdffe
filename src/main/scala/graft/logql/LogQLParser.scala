package graft.logql

import scala.util.parsing.combinator.RegexParsers
import LogQLAst._

/** Recursive-descent LogQL parser (combinator port of the participle
  * grammar in `reader/logql/logql_parser/model.go` + `lexer_rules.go`).
  * Produces [[LogQLAst]] nodes; no Spark dependency.
  */
object LogQLParser extends RegexParsers {

  override def skipWhitespace = true

  private def ident: Parser[String] = """[a-zA-Z_][a-zA-Z0-9_]*""".r
  private def number: Parser[Double] = """-?[0-9]+(\.[0-9]+)?""".r ^^ (_.toDouble)
  private def duration: Parser[String] =
    """[0-9]+(\.[0-9]+)?(ns|us|µs|ms|s|m|h|d|w)([0-9]+(\.[0-9]+)?(ns|us|µs|ms|s|m|h|d|w))*""".r

  private def quoted: Parser[String] =
    ("\"" + """([^"\\]|\\.)*""" + "\"").r ^^ (s => unescape(s.substring(1, s.length - 1))) |
    ("`" + "[^`]*" + "`").r ^^ (s => s.substring(1, s.length - 1))

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); case 't' => sb.append('\t')
          case 'r' => sb.append('\r'); case other => sb.append(other)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // --- stream selector --------------------------------------------------
  private def matchOp: Parser[String] = "=~" | "!~" | "!=" | "="
  private def matcher: Parser[LabelMatcher] =
    ident ~ matchOp ~ quoted ^^ { case l ~ op ~ v => LabelMatcher(l, op, v) }
  private def selector: Parser[Selector] =
    "{" ~> repsep(matcher, ",") <~ "}" ^^ Selector.apply

  // --- pipeline stages --------------------------------------------------
  // pattern expression after a filter op (`model.go:181-212`): right-
  // recursive `head (and|or tail)?`, parens group, NO precedence between
  // and/or — `"a" and "b" or "c"` is And(a, Or(b, c)), as the reference
  private def linePatHead: Parser[LinePat] =
    "(" ~> linePatExp <~ ")" | quoted ^^ PatLeaf.apply
  private def linePatExp: Parser[LinePat] =
    linePatHead ~ opt(("and" | "or") ~ linePatExp) ^^ {
      case h ~ None            => h
      case h ~ Some("and" ~ t) => PatAnd(h, t)
      case h ~ Some(_ ~ t)     => PatOr(h, t)
    }
  private def lineFilter: Parser[Stage] =
    ("|=" | "!=" | "|~" | "!~" | "|>") ~ linePatExp ^^ { case op ~ p => LineFilter(op, p) }

  private def cmpOp: Parser[String] = ">=" | "<=" | "==" | "!=" | ">" | "<" | "=~" | "!~" | "="

  private def simplePred: Parser[LabelPred] =
    ident ~ cmpOp ~ (quoted ^^ (Left(_)) | number ^^ (Right(_))) ^^ {
      case l ~ op ~ Left(s)  => StrPred(l, op, s)
      case l ~ op ~ Right(n) => NumPred(l, op, n)
    } | "(" ~> predExpr <~ ")"

  // `and` binds tighter than `or` (Go reference grammar):
  // orExpr = andExpr ('or' andExpr)* ; andExpr = simplePred (('and'|',') simplePred)*
  private def andPredExpr: Parser[LabelPred] =
    simplePred ~ rep(("and" | ",") ~> simplePred) ^^ {
      case first ~ rest => rest.foldLeft(first)(AndPred.apply)
    }

  private def predExpr: Parser[LabelPred] =
    andPredExpr ~ rep("or" ~> andPredExpr) ^^ {
      case first ~ rest => rest.foldLeft(first)(OrPred.apply)
    }

  private def jsonParam: Parser[(String, String)] =
    ident ~ ("=" ~> quoted) ^^ { case l ~ p => (l, p) }

  private def parserStage: Parser[Stage] =
    "json" ~> repsep(jsonParam, ",") ^^ JsonStage.apply |
    "logfmt" ^^^ LogfmtStage |
    "regexp" ~> quoted ^^ RegexpStage.apply |
    "line_format" ~> quoted ^^ LineFormatStage.apply |
    "label_format" ~> repsep(labelFormatOp, ",") ^^ LabelFormatStage.apply |
    "drop" ~> repsep(dropKeepEntry, ",") ^^ (DropStage(_)) |
    "keep" ~> repsep(dropKeepEntry, ",") ^^ (KeepStage(_)) |
    // unwrap_value before unwrap: the bare literal would match its prefix
    // (`model.go:335` @("unwrap"|"unwrap_value") — value-column unwrap)
    "unwrap_value" ^^^ UnwrapStage("__value__", None) |
    "unwrap" ~> unwrapBody

  // `a` (key match) or `a="v"` ((key,value)-pair match) — model.go Drop/Keep
  private def dropKeepEntry: Parser[(String, Option[String])] =
    ident ~ opt("=" ~> quoted) ^^ { case k ~ v => (k, v) }

  private def labelFormatOp: Parser[(String, Either[String, String])] =
    ident ~ ("=" ~> (quoted ^^ (Right(_)) | ident ^^ (Left(_)))) ^^ { case d ~ s => (d, s) }

  private def unwrapBody: Parser[Stage] =
    ("duration_seconds" | "duration" | "bytes") ~ ("(" ~> ident <~ ")") ^^ {
      case f ~ l => UnwrapStage(l, Some(f))
    } | ident ^^ (l => UnwrapStage(l, None))

  private def stage: Parser[Stage] =
    lineFilter | "|" ~> (parserStage | predExpr ^^ LabelFilterStage.apply)

  private def stages: Parser[Seq[Stage]] = rep(stage)

  // --- log range --------------------------------------------------------
  private def offsetClause: Parser[Long] =
    "offset" ~> duration ^^ durationToNs

  private def logRange: Parser[LogRange] =
    selector ~ stages ~ ("[" ~> duration <~ "]") ~ opt(offsetClause) ^^ {
      case sel ~ st ~ rng ~ off =>
        LogRange(sel, st, durationToNs(rng), off.getOrElse(0L))
    }

  // --- aggregations -----------------------------------------------------
  private val rangeFns = Set(
    "rate", "count_over_time", "bytes_rate", "bytes_over_time",
    "absent_over_time", "sum_over_time", "avg_over_time", "max_over_time",
    "min_over_time", "first_over_time", "last_over_time",
    "stdvar_over_time", "stddev_over_time")

  private val vectorFns = Set("sum", "min", "max", "avg", "stddev", "stdvar", "count")

  private def grouping: Parser[(Seq[String], Seq[String])] =
    ("by" ~> "(" ~> repsep(ident, ",") <~ ")") ^^ (g => (g, Nil)) |
    ("without" ~> "(" ~> repsep(ident, ",") <~ ")") ^^ (g => (Nil, g))

  private def rangeAgg: Parser[Expr] =
    ident.filter(rangeFns.contains) ~ ("(" ~> logRange <~ ")") ~ opt(grouping) ^^ {
      case fn ~ r ~ g =>
        RangeAgg(fn, r, None, g.map(_._1).getOrElse(Nil), g.map(_._2).getOrElse(Nil))
    } |
    "quantile_over_time" ~> ("(" ~> number) ~ ("," ~> logRange <~ ")") ~ opt(grouping) ^^ {
      case q ~ r ~ g =>
        RangeAgg("quantile_over_time", r, Some(q),
          g.map(_._1).getOrElse(Nil), g.map(_._2).getOrElse(Nil))
    }

  private def vectorAgg: Parser[Expr] =
    ident.filter(vectorFns.contains) ~ opt(grouping) ~ ("(" ~> metricExpr <~ ")") ~ opt(grouping) ^^ {
      case fn ~ g1 ~ e ~ g2 =>
        val g = g1.orElse(g2)
        VectorAgg(fn, e, g.map(_._1).getOrElse(Nil), g.map(_._2).getOrElse(Nil))
    } |
    ("topk" | "bottomk") ~ ("(" ~> number) ~ ("," ~> metricExpr <~ ")") ^^ {
      case fn ~ k ~ e => VectorAgg(fn, e, param = Some(k))
    }

  /** Macro atom (`model.go:485-496`): `_name("p", ...)` expands through
    * the [[LogQLMacros]] registry and the expansion parses in place; an
    * unregistered macro is rejected like the reference planner does
    * (`clickhouse_planner/planner.go:548-552`).
    */
  private def macroCall: Parser[Expr] =
    """_[a-zA-Z0-9_]+""".r ~ ("(" ~> repsep(quoted, ",") <~ ")") ^^ {
      case name ~ ps =>
        val src = LogQLMacros.expansion(name, ps).getOrElse(throw
          new IllegalArgumentException(s"LogQL macro not implemented: $name"))
        parse(src).fold(m => throw new IllegalArgumentException(
          s"LogQL macro $name expansion parse error: $m in: $src"), identity)
    }

  private def atom: Parser[Expr] =
    macroCall | vectorAgg | rangeAgg | number ^^ ScalarLit.apply |
      "(" ~> metricExpr <~ ")"

  private def binOpTail: Parser[Expr] =
    atom ~ rep(("*" | "/" | "%") ~ atom) ^^ {
      case first ~ rest => rest.foldLeft(first) { case (a, op ~ b) => BinOp(op, a, b) }
    }

  private def arith: Parser[Expr] =
    binOpTail ~ rep(("+" | "-") ~ binOpTail) ^^ {
      case first ~ rest => rest.foldLeft(first) { case (a, op ~ b) => BinOp(op, a, b) }
    }

  private def metricExpr: Parser[Expr] =
    arith ~ opt((">=" | "<=" | "==" | "!=" | ">" | "<") ~ number) ^^ {
      case e ~ None           => e
      case e ~ Some(op ~ rhs) => Cmp(e, op, rhs)
    }

  private def root: Parser[Expr] =
    metricExpr | selector ~ stages ^^ { case s ~ st => LogExpr(s, st) }

  def parse(q: String): Either[String, Expr] =
    parseAll(root, q) match {
      case Success(e, _)   => Right(e)
      case NoSuccess(m, rest) => Left(s"$m at ${rest.pos}")
      case other => Left(other.toString)
    }

  def parseOrThrow(q: String): Expr =
    parse(q).fold(m => throw new IllegalArgumentException(s"LogQL parse error: $m in: $q"), identity)
}
