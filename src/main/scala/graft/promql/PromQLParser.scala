package graft.promql

import scala.util.parsing.combinator.RegexParsers
import graft.logql.LogQLAst.durationToNs
import PromQLAst._

/** Recursive-descent PromQL parser (native subset — the shapes the
  * reference accelerates in `reader/promql/promql_transpiler/` plus the
  * engine-delegated ones we evaluate natively). Operator precedence follows
  * PromQL: `^` > `* / %` > `+ -` > comparisons; `and/or/unless` set ops are
  * not yet implemented.
  */
object PromQLParser extends RegexParsers {

  override def skipWhitespace = true

  private def metricIdent: Parser[String] = """[a-zA-Z_:][a-zA-Z0-9_:]*""".r
  private def labelIdent: Parser[String] = """[a-zA-Z_][a-zA-Z0-9_]*""".r
  private def number: Parser[Double] =
    """-?[0-9]+(\.[0-9]+)?([eE][+-]?[0-9]+)?""".r ^^ (_.toDouble)
  private def duration: Parser[String] =
    """[0-9]+(\.[0-9]+)?(ns|us|µs|ms|s|m|h|d|w)([0-9]+(\.[0-9]+)?(ns|us|µs|ms|s|m|h|d|w))*""".r

  private def quoted: Parser[String] =
    ("\"" + """([^"\\]|\\.)*""" + "\"").r ^^ (s => s.substring(1, s.length - 1)
      .replace("\\\"", "\"").replace("\\\\", "\\")) |
    ("'" + """([^'\\]|\\.)*""" + "'").r ^^ (s => s.substring(1, s.length - 1))

  private def matchOp: Parser[String] = "=~" | "!~" | "!=" | "="
  private def matcher: Parser[Matcher] =
    labelIdent ~ matchOp ~ quoted ^^ { case l ~ op ~ v => Matcher(l, op, v) }
  private def matchers: Parser[Seq[Matcher]] =
    "{" ~> repsep(matcher, ",") <~ "}"

  private def rangeClause: Parser[Long] = "[" ~> duration <~ "]" ^^ durationToNs
  // `offset -5m` looks forward of the eval time (Prometheus negative offset)
  private def offsetClause: Parser[Long] =
    "offset" ~> opt("-") ~ duration ^^ {
      case neg ~ d => (if (neg.isDefined) -1L else 1L) * durationToNs(d)
    }

  private def atClause: Parser[AtMod] =
    "@" ~> ("start" ~ "(" ~ ")" ^^^ AtStart |
      "end" ~ "(" ~ ")" ^^^ AtEnd |
      """-?[0-9]+(\.[0-9]+)?""".r ^^ (s => AtNs((s.toDouble * 1e9).toLong)))

  /** `offset` and `@` may appear in either order, at most once each
    * (Prometheus grammar). */
  private def selMods: Parser[(Long, Option[AtMod])] =
    rep(offsetClause ^^ (Left(_)) | atClause ^^ (Right(_))) ^^ { mods =>
      (mods.collectFirst { case Left(o) => o }.getOrElse(0L),
        mods.collectFirst { case Right(a) => a })
    }

  private def selector: Parser[Selector] =
    metricIdent ~ opt(matchers) ~ opt(rangeClause) ~ selMods ^^ {
      case n ~ ms ~ r ~ ((off, at)) =>
        Selector(n, ms.getOrElse(Nil), r, off, at)
    } |
    matchers ~ opt(rangeClause) ~ selMods ^^ {
      case ms ~ r ~ ((off, at)) => Selector("", ms, r, off, at)
    }

  private def grouping: Parser[(Seq[String], Seq[String])] =
    ("by" ~> "(" ~> repsep(labelIdent, ",") <~ ")") ^^ (g => (g, Nil)) |
    ("without" ~> "(" ~> repsep(labelIdent, ",") <~ ")") ^^ (g => (Nil, g))

  private def aggExpr: Parser[PExpr] =
    metricIdent.filter(AggFns.contains) ~ opt(grouping) ~ ("(" ~> expr <~ ")") ~ opt(grouping) ^^ {
      case fn ~ g1 ~ e ~ g2 =>
        val g = g1.orElse(g2)
        Agg(fn, e, g.map(_._1).getOrElse(Nil), g.map(_._2).getOrElse(Nil))
    } |
    metricIdent.filter(ParamAggFns.contains) ~ opt(grouping) ~ ("(" ~> number) ~ ("," ~> expr <~ ")") ~ opt(grouping) ^^ {
      case fn ~ g1 ~ k ~ e ~ g2 =>
        val g = g1.orElse(g2)
        Agg(fn, e, g.map(_._1).getOrElse(Nil), g.map(_._2).getOrElse(Nil), Some(k))
    } |
    "count_values" ~> opt(grouping) ~ ("(" ~> quoted) ~ ("," ~> expr <~ ")") ~ opt(grouping) ^^ {
      case g1 ~ dst ~ e ~ g2 =>
        val g = g1.orElse(g2)
        Agg("count_values", e, g.map(_._1).getOrElse(Nil),
          g.map(_._2).getOrElse(Nil), None, Some(dst))
    }

  private def fnCall: Parser[PExpr] =
    "histogram_quantile" ~> ("(" ~> number) ~ ("," ~> expr <~ ")") ^^ {
      case q ~ e => FnCall("histogram_quantile", Seq(NumLit(q), e))
    } |
    "quantile_over_time" ~> ("(" ~> number) ~ ("," ~> (subquery | selector) <~ ")") ^^ {
      case q ~ s => FnCall("quantile_over_time", Seq(NumLit(q), s))
    } |
    ("clamp_min" | "clamp_max") ~ ("(" ~> expr) ~ ("," ~> number <~ ")") ^^ {
      case fn ~ e ~ s => FnCall(fn, Seq(e, NumLit(s)))
    } |
    "round" ~> ("(" ~> expr) ~ opt("," ~> number) <~ ")" ^^ {
      case e ~ s => FnCall("round", Seq(e, NumLit(s.getOrElse(1.0))))
    } |
    "absent_over_time" ~> "(" ~> selector <~ ")" ^^ (s => FnCall("absent_over_time", Seq(s))) |
    "absent" ~> "(" ~> selector <~ ")" ^^ (s => FnCall("absent", Seq(s))) |
    "label_replace" ~> ("(" ~> expr) ~ ("," ~> quoted) ~ ("," ~> quoted) ~
      ("," ~> quoted) ~ ("," ~> quoted <~ ")") ^^ {
      case e ~ dst ~ repl ~ src ~ re =>
        FnCall("label_replace", Seq(e, StrLit(dst), StrLit(repl), StrLit(src), StrLit(re)))
    } |
    "label_join" ~> ("(" ~> expr) ~ ("," ~> quoted) ~ ("," ~> quoted) ~
      rep("," ~> quoted) <~ ")" ^^ {
      case e ~ dst ~ sep ~ srcs =>
        FnCall("label_join", e +: StrLit(dst) +: StrLit(sep) +: srcs.map(StrLit.apply))
    } |
    "predict_linear" ~> ("(" ~> (subquery | selector)) ~ ("," ~> expr <~ ")") ^^ {
      case s ~ t => FnCall("predict_linear", Seq(s, NumLit(constFold(t))))
    } |
    ("holt_winters" | "double_exponential_smoothing") ~>
      ("(" ~> (subquery | selector)) ~ ("," ~> number) ~ ("," ~> number <~ ")") ^^ {
      case s ~ sf ~ tf => FnCall("holt_winters", Seq(s, NumLit(sf), NumLit(tf)))
    } |
    "clamp" ~> ("(" ~> expr) ~ ("," ~> number) ~ ("," ~> number <~ ")") ^^ {
      case e ~ mn ~ mx => FnCall("clamp", Seq(e, NumLit(mn), NumLit(mx)))
    } |
    ("sort_desc" | "sort") ~ ("(" ~> expr <~ ")") ^^ {
      case fn ~ e => FnCall(fn, Seq(e))
    } |
    "timestamp" ~> ("(" ~> expr <~ ")") ^^ (e => FnCall("timestamp", Seq(e))) |
    "time" ~ "(" ~ ")" ^^^ FnCall("time", Nil) |
    "scalar" ~> ("(" ~> expr <~ ")") ^^ (e => FnCall("scalar", Seq(e))) |
    "vector" ~> ("(" ~> expr <~ ")") ^^ (e => FnCall("vector", Seq(e))) |
    metricIdent.filter(RangeFns.contains) ~ ("(" ~> (subquery | selector) <~ ")") ^^ {
      case fn ~ s => FnCall(fn, Seq(s))
    } |
    metricIdent.filter(InstantFns.contains) ~ ("(" ~> expr <~ ")") ^^ {
      case fn ~ e => FnCall(fn, Seq(e))
    }

  /** `expr[range:step]` — agg/fn/paren inner, or a bare instant selector
    * (`m[1h:5m]`; the selector's own rangeClause fails on `:` and
    * backtracks to the rangeless form, so the subquery gets the brackets).
    */
  /** `m[1h:]` omits the resolution step: Prometheus resolves it via
    * NoStepSubqueryIntervalFn, which the reference pins to one minute
    * (`prometheus_query_range.go:18-40` defaultSubqueryInterval).
    */
  private val DefaultSubqueryStepNs = 60L * 1000000000L

  private def subquery: Parser[Subquery] =
    (aggExpr | fnCall | "(" ~> expr <~ ")" | selector ^^ identity) ~
      ("[" ~> duration) ~ (":" ~> opt(duration) <~ "]") ~ selMods ^^ {
      case e ~ r ~ s ~ ((off, at)) =>
        Subquery(e, durationToNs(r),
          s.map(durationToNs).getOrElse(DefaultSubqueryStepNs), off, at)
    }

  // subquery before the bare paren-expr alternative: `(expr)[r:s]` must
  // bind the range to the parenthesized expression, not stop at `)`
  private def atom: Parser[PExpr] =
    subquery | aggExpr | fnCall | number ^^ NumLit.apply |
    "(" ~> expr <~ ")" | selector ^^ identity

  private def powExpr: Parser[PExpr] =
    atom ~ opt("^" ~> powExpr) ^^ {
      case a ~ None    => a
      case a ~ Some(b) => BinOp("^", a, b)
    }

  private def vecMod: Parser[(Option[Seq[String]], Option[Seq[String]])] =
    ("on" ~> "(" ~> repsep(labelIdent, ",") <~ ")") ^^ (k => (Some(k), None)) |
    ("ignoring" ~> "(" ~> repsep(labelIdent, ",") <~ ")") ^^ (k => (None, Some(k)))

  private def groupMod: Parser[(String, Seq[String])] =
    ("group_left" | "group_right") ~ opt("(" ~> repsep(labelIdent, ",") <~ ")") ^^ {
      case side ~ ls => (side, ls.getOrElse(Nil))
    }

  private def binTail(opP: Parser[String], sub: Parser[PExpr]): Parser[PExpr] =
    sub ~ rep(opP ~ opt(vecMod) ~ opt(groupMod) ~ sub) ^^ { case first ~ rest =>
      rest.foldLeft(first) { case (a, op ~ m ~ g ~ b) =>
        BinOp(op, a, b, m.flatMap(_._1), m.flatMap(_._2), boolMod = false, group = g)
      }
    }

  private def mulExpr: Parser[PExpr] = binTail("*" | "/" | "%", powExpr)
  private def addExpr: Parser[PExpr] = binTail("+" | "-", mulExpr)

  private def cmpExpr: Parser[PExpr] =
    addExpr ~ rep((">=" | "<=" | "==" | "!=" | ">" | "<") ~ opt("bool") ~ opt(vecMod) ~ addExpr) ^^ {
      case first ~ rest =>
        rest.foldLeft(first) { case (a, op ~ b ~ m ~ c) =>
          BinOp(op, a, c, m.flatMap(_._1), m.flatMap(_._2), boolMod = b.isDefined)
        }
    }

  // set operators: and/unless bind tighter than or (PromQL precedence)
  private def andExpr: Parser[PExpr] =
    cmpExpr ~ rep(("and" | "unless") ~ opt(vecMod) ~ cmpExpr) ^^ {
      case first ~ rest =>
        rest.foldLeft(first) { case (a, op ~ m ~ b) =>
          BinOp(op, a, b, m.flatMap(_._1), m.flatMap(_._2))
        }
    }

  private def orExpr: Parser[PExpr] =
    andExpr ~ rep("or" ~> opt(vecMod) ~ andExpr) ^^ {
      case first ~ rest =>
        rest.foldLeft(first) { case (a, m ~ b) =>
          BinOp("or", a, b, m.flatMap(_._1), m.flatMap(_._2))
        }
    }

  private def expr: Parser[PExpr] = orExpr

  /** Fold a constant scalar expression (predict_linear's `4 * 3600` style
    * second argument) to its numeric value.
    */
  private def constFold(e: PExpr): Double = e match {
    case NumLit(v) => v
    case BinOp(op, l, r, _, _, _, _) =>
      val (a, b) = (constFold(l), constFold(r))
      op match {
        case "+" => a + b
        case "-" => a - b
        case "*" => a * b
        case "/" => a / b
        case "%" => a % b
        case "^" => math.pow(a, b)
        case o   => throw new IllegalArgumentException(s"non-constant op $o")
      }
    case other => throw new IllegalArgumentException(s"non-constant arg: $other")
  }

  def parse(q: String): Either[String, PExpr] =
    parseAll(expr, q) match {
      case Success(e, _)      => Right(e)
      case NoSuccess(m, rest) => Left(s"$m at ${rest.pos}")
      case other              => Left(other.toString)
    }

  def parseOrThrow(q: String): PExpr =
    parse(q).fold(m => throw new IllegalArgumentException(s"PromQL parse error: $m in: $q"), identity)
}
