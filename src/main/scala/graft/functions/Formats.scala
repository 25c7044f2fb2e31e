package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Named format predicates — `Column => Column` (value → boolean), the Spark
  * analogue of the reference's format registry
  * (/root/reference/format.go:20-39, registration hook
  * /root/reference/compiler.go:75-79).
  *
  * Each predicate must be TRUE for a passing string. Non-string/NULL inputs
  * are handled by the caller (formats are vacuous there, mirroring
  * /root/reference/format.go:43-45). Everything below is built from codegen'd
  * built-in expressions (rlike / try_to_* / string ops) — no Scala UDFs — so
  * the whole validation pass stays inside WholeStageCodegen.
  */
object Formats {

  /** uuid — /root/reference/format.go:114-140 (hex groups 8-4-4-4-12). */
  private val uuidRe = "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"

  /** ipv4 — dotted quad, each octet 0-255, no leading-zero octets like the
    * strconv parse in /root/reference/format.go:212-234.
    */
  private val ipv4Re = "^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\.){3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$"

  /** date — RFC 3339 full-date with real calendar rules
    * (/root/reference/format.go:378-385). Regex handles the shape; month
    * lengths + leap years via try_to_date round-trip.
    */
  private def dateOk(v: Column): Column =
    v.rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}$") &&
      try_to_timestamp(v, lit("yyyy-MM-dd")).isNotNull

  /** time — RFC 3339 full-time incl. leap-second-at-offset rule
    * (/root/reference/format.go:389-489). The HH:MM:SS + offset shape and
    * ranges via regex; the leap-second rule (only 23:59:60Z *in UTC after
    * applying the offset*) via arithmetic on captured groups.
    */
  private def timeOk(v: Column): Column = {
    val shape = "^([01][0-9]|2[0-3]):[0-5][0-9]:([0-5][0-9]|60)(\\.[0-9]+)?(([Zz])|([+-]([01][0-9]|2[0-3]):[0-5][0-9]))$"
    val h = regexp_extract(v, "^([0-9]{2})", 1).cast("int")
    val m = regexp_extract(v, "^[0-9]{2}:([0-9]{2})", 1).cast("int")
    val s = regexp_extract(v, "^[0-9]{2}:[0-9]{2}:([0-9]{2})", 1).cast("int")
    val offSign = when(v.rlike("[+]\\d{2}:\\d{2}$"), lit(1))
      .when(v.rlike("[-]\\d{2}:\\d{2}$"), lit(-1)).otherwise(lit(0))
    val offH = regexp_extract(v, "([0-9]{2}):[0-9]{2}$", 1).cast("int")
    val offM = regexp_extract(v, ":([0-9]{2})$", 1).cast("int")
    val hasOff = v.rlike("[+-]\\d{2}:\\d{2}$")
    // minutes-of-day in UTC
    val localMin = h * 60 + m
    val utcMin = when(hasOff, localMin - offSign * (offH * 60 + offM)).otherwise(localMin)
    val utcNorm = pmod(utcMin, lit(1440))
    val leapOk = (s =!= 60) || (utcNorm === lit(23 * 60 + 59))
    v.rlike(shape) && coalesce(leapOk, lit(false))
  }

  /** date-time — full-date 'T' full-time (/root/reference/format.go:492-513). */
  private def dateTimeOk(v: Column): Column = {
    val d = regexp_extract(v, "^([0-9]{4}-[0-9]{2}-[0-9]{2})[Tt]", 1)
    val t = regexp_extract(v, "^[0-9]{4}-[0-9]{2}-[0-9]{2}[Tt](.*)$", 1)
    v.rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}[Tt]") && dateOk(d) && timeOk(t)
  }

  /** ISO-8601 duration — /root/reference/format.go:143-210 (state machine);
    * here an anchored regex covering the same grammar: P…(date parts)(T time
    * parts) or PnW, at least one component, no empty T.
    */
  private val durationRe =
    "^P(?:[0-9]+W|(?=[0-9T])(?:[0-9]+Y)?(?:[0-9]+M)?(?:[0-9]+D)?(?:T(?=[0-9])(?:[0-9]+H)?(?:[0-9]+M)?(?:[0-9]+S)?)?)$"

  /** hostname — RFC 1123: labels of [A-Za-z0-9-], no leading/trailing '-',
    * label<=63, total<=253 (/root/reference/format.go:255-296).
    */
  private def hostnameOk(v: Column): Column =
    v.rlike("^(?=.{1,253}$)[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?(\\.[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*\\.?$")

  /** email — pragmatic RFC 5321 subset mirroring
    * /root/reference/format.go:299-375: dot-separated atoms or quoted local
    * part (backslash and quote are NOT allowed inside quotes — the
    * reference's rule, exercised by Extra-Test-Suite
    * draft2020-12/optional/format/email.json), domain = hostname or
    * bracketed IP.
    */
  private def emailOk(v: Column): Column = {
    val local = "(?:[A-Za-z0-9!#$%&'*+/=?^_`{|}~-]+(?:\\.[A-Za-z0-9!#$%&'*+/=?^_`{|}~-]+)*|\"[^\"\\\\]*\")"
    val domRe = "(?:[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?(?:\\.[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*|\\[[0-9A-Fa-f:.]+\\])"
    v.rlike(s"^$local@$domRe$$")
  }

  /** ipv6 — full/compressed groups incl. v4-mapped tail
    * (/root/reference/format.go:236-252; Go net.ParseIP semantics).
    */
  private val ipv6Re = {
    val g = "[0-9A-Fa-f]{1,4}"
    val v4 = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(\\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}"
    s"^(($g:){7}$g|($g:){1,7}:|($g:){1,6}:$g|($g:){1,5}(:$g){1,2}|($g:){1,4}(:$g){1,3}|($g:){1,3}(:$g){1,4}|($g:){1,2}(:$g){1,5}|$g:((:$g){1,6})|:((:$g){1,7}|:)|($g:){6}$v4|($g:){1,5}:$v4|($g:){1,4}:($g:)?$v4|::($g:){0,5}$v4)$$"
  }

  /** json-pointer — RFC 6901: empty or /-separated tokens with ~0|~1 escapes
    * only (/root/reference/format.go:42-80).
    */
  private val jsonPointerRe = "^(/([^~/]|~[01])*)*$"

  /** relative-json-pointer — non-negative int (no leading zero unless "0")
    * then '#' or a json-pointer (/root/reference/format.go:83-111).
    */
  private val relJsonPointerRe = "^(0|[1-9][0-9]*)(#|(/([^~/]|~[01])*)*)$"

  /** semver 2.0.0 — official grammar (/root/reference/format.go:635-708). */
  private val semverRe =
    "^(0|[1-9]\\d*)\\.(0|[1-9]\\d*)\\.(0|[1-9]\\d*)(?:-((?:0|[1-9]\\d*|\\d*[a-zA-Z-][0-9a-zA-Z-]*)(?:\\.(?:0|[1-9]\\d*|\\d*[a-zA-Z-][0-9a-zA-Z-]*))*))?(?:\\+([0-9a-zA-Z-]+(?:\\.[0-9a-zA-Z-]+)*))?$"

  /** uri — absolute URI with scheme (/root/reference/format.go:535-548). */
  private val uriRe = "^[A-Za-z][A-Za-z0-9+.-]*:[^\\s]*$"

  /** uri-reference — URI or relative reference, no spaces/angle brackets
    * (/root/reference/format.go:550-560; parse-level check only).
    */
  private val uriRefRe = "^[^\\s<>\\\\^`{|}\"]*$"

  /** uri-template — RFC 6570 literals + {expr} (/root/reference/format.go:562-597). */
  private val uriTemplateRe =
    "^(?:[^\\x00-\\x20\"'%<>\\\\^`{|}]|%[0-9A-Fa-f]{2}|\\{[+#./;?&=,!@|]?[A-Za-z0-9_%.]+(?::[1-9][0-9]{0,3}|\\*)?(?:,[A-Za-z0-9_%.]+(?::[1-9][0-9]{0,3}|\\*)?)*\\})*$"

  /** period — ISO 8601 interval `<start>/<end>` split at the FIRST slash
    * (/root/reference/format.go:599-632): start is a duration (P-prefixed)
    * or date-time; a duration start requires a date-time end; a date-time
    * start allows a duration or date-time end. Composes the date-time and
    * duration predicates above.
    */
  private def periodOk(v: Column): Column = {
    val slash = instr(v, "/")
    val start = v.substr(lit(1), slash - 1)
    val end = v.substr(slash + 1, length(v))
    val dur = (c: Column) => c.rlike(durationRe)
    (slash > 0) &&
      when(start.startsWith("P"), dur(start) && dateTimeOk(end))
        .otherwise(dateTimeOk(start) &&
          when(end.startsWith("P"), dur(end)).otherwise(dateTimeOk(end)))
  }

  /** The registry: name → predicate builder. Custom formats register through
    * [[register]], mirroring RegisterFormat (/root/reference/compiler.go:75-79).
    */
  @volatile private var registry: Map[String, Column => Column] = Map(
    "uuid" -> (v => v.rlike(uuidRe)),
    "ipv4" -> (v => v.rlike(ipv4Re)),
    "ipv6" -> (v => v.rlike(ipv6Re)),
    "date" -> dateOk,
    "time" -> timeOk,
    "date-time" -> dateTimeOk,
    "duration" -> (v => v.rlike(durationRe)),
    "period" -> periodOk,
    "hostname" -> hostnameOk,
    "email" -> emailOk,
    "json-pointer" -> (v => v.rlike(jsonPointerRe)),
    "relative-json-pointer" -> (v => v.rlike(relJsonPointerRe)),
    "semver" -> (v => v.rlike(semverRe)),
    "uri" -> (v => v.rlike(uriRe)),
    "iri" -> (v => v.rlike(uriRe)),
    "uri-reference" -> (v => v.rlike(uriRefRe)),
    "iri-reference" -> (v => v.rlike(uriRefRe)),
    "uri-template" -> (v => v.rlike(uriTemplateRe)),
    // regex: value must itself be a compilable pattern
    // (/root/reference/compiler.go:321-328). rlike against the value would
    // run it; instead validate compilability on the driver is impossible for
    // data — a tiny UDF is the honest mapping; it is off the default path.
    "regex" -> (v => RegexCompiles(v))
  )

  private object RegexCompiles {
    private val compiles = udf { (s: String) =>
      if (s == null) true
      else try { java.util.regex.Pattern.compile(s); true }
      catch { case _: java.util.regex.PatternSyntaxException => false }
    }
    def apply(v: Column): Column = compiles(v)
  }

  def register(name: String, pred: Column => Column): Unit = synchronized {
    registry = registry + (name -> pred)
  }

  def get(name: String): Option[Column => Column] = registry.get(name)
  def known: Set[String] = registry.keySet

  /** Pluggable regex engine for the `pattern` keyword — the analogue of the
    * reference's `UseRegexpEngine` hook (/root/reference/compiler.go:141-151).
    * Default is Spark's `rlike` (Java regex, SEARCH semantics). Swap in e.g.
    * an RE2-backed UDF for linear-time guarantees on adversarial patterns;
    * the engine receives (value, pattern) and must return a boolean Column
    * with search (not full-match) semantics.
    */
  @volatile private var patternEngine: (Column, String) => Column =
    (v, p) => v.rlike(p)

  def setPatternEngine(engine: (Column, String) => Column): Unit =
    synchronized { patternEngine = engine }

  def patternMatch(v: Column, pattern: String): Column = patternEngine(v, pattern)

  /** Spec-time regex validation for `pattern`/`patternProperties` — returns
    * Some(description) when the pattern is invalid under the ACTIVE engine.
    * Plug alongside [[setPatternEngine]] (the reference's UseRegexpEngine
    * governs compile-time pattern validation AND matching consistently,
    * /root/reference/compiler.go:141-151); default is java.util.regex.
    */
  @volatile private var specRegexCheck: String => Option[String] = { p =>
    try { java.util.regex.Pattern.compile(p); None }
    catch {
      case e: java.util.regex.PatternSyntaxException => Some(e.getDescription)
    }
  }

  def setSpecRegexCheck(check: String => Option[String]): Unit =
    synchronized { specRegexCheck = check }

  def checkSpecRegex(pattern: String): Option[String] = specRegexCheck(pattern)

  /** Compile-time (driver-side) pattern test, paired with the runtime
    * engine — used where instance names are known statically (struct-column
    * unevaluatedProperties tests field names against patternProperties at
    * compile). Swap together with [[setPatternEngine]] so static and runtime
    * matching cannot disagree on which fields count as evaluated; default is
    * java.util.regex with search semantics, matching the default engine.
    */
  @volatile private var staticMatch: (String, String) => Boolean =
    (s, p) => java.util.regex.Pattern.compile(p).matcher(s).find()

  def setStaticPatternMatch(m: (String, String) => Boolean): Unit =
    synchronized { staticMatch = m }

  def staticPatternMatch(s: String, pattern: String): Boolean =
    staticMatch(s, pattern)
}
