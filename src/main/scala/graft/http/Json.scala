package graft.http

/** Minimal JSON writer for the HTTP frontend's response bodies — the
  * output side only (requests carry no JSON bodies on the implemented
  * routes), so a full parser dependency would be dead weight. Emits
  * compact RFC 8259 JSON with sorted-key objects where the caller wants
  * deterministic bytes.
  */
object Json {

  def str(s: String): String = {
    val b = new StringBuilder(s.length + 2)
    b += '"'
    s.foreach {
      case '"' => b ++= "\\\""
      case '\\' => b ++= "\\\\"
      case '\n' => b ++= "\\n"
      case '\r' => b ++= "\\r"
      case '\t' => b ++= "\\t"
      case c if c < 0x20 => b ++= "\\u%04x".format(c.toInt)
      case c => b += c
    }
    b += '"'
    b.result()
  }

  /** Prometheus/Loki sample values are STRINGS in the wire format; whole
    * doubles render without the trailing `.0` and large magnitudes never
    * fall into scientific notation (the upstream
    * `strconv.FormatFloat(v, 'f', -1, 64)` shape) — whole doubles are
    * exact up to 2^53. Outside that, `BigDecimal.valueOf` goes through
    * Double.toString's SHORTEST round-trip form before the plain-text
    * expansion (the exact-value `new BigDecimal(double)` constructor would
    * render 0.000046 as its 67-char binary expansion). Non-finite values
    * render as their Go spellings ("NaN"/"+Inf"-style is caller-quoted:
    * the string-valued wire paths wrap num() in str(), and bare-number
    * paths must guard these — BigDecimal would throw on them.
    */
  def num(v: Double): String =
    if (v.isNaN) "NaN"
    // Go strconv.FormatFloat spellings, the upstream wire form for
    // quoted non-finite sample values (reader/service/query_range.go:495)
    else if (v == Double.PositiveInfinity) "+Inf"
    else if (v == Double.NegativeInfinity) "-Inf"
    else if (v.isWhole && math.abs(v) <= 9007199254740992.0) v.toLong.toString
    else if (math.abs(v) >= 1e15 || (v != 0 && math.abs(v) < 1e-4))
      // stripTrailingZeros: valueOf(5e-20) is "5.0E-20" and would
      // otherwise expand with a spurious trailing zero digit
      java.math.BigDecimal.valueOf(v).stripTrailingZeros.toPlainString
    else v.toString

  def obj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => s"${str(k)}:$v" }.mkString("{", ",", "}")

  def sortedObj(fields: Seq[(String, String)]): String =
    obj(fields.sortBy(_._1))

  def arr(items: Seq[String]): String = items.mkString("[", ",", "]")
}
