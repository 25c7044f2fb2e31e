package graft

import graft.functions.Formats
import org.apache.spark.sql.functions._

/** Format predicates vs the reference's semantics (/root/reference/format.go)
  * — cases lifted from the behaviors the reference implements, including the
  * edge rules (leap seconds with offsets, calendar-valid dates, hostname
  * label rules, duration grammar).
  */
class FormatsSpec extends SparkTestBase {
  import spark.implicits._

  private def check(format: String, cases: Seq[(String, Boolean)]): Unit = {
    val fn = Formats.get(format).getOrElse(fail(s"no format $format"))
    val df = cases.map(_._1).toDF("v")
    val got = df.select(col("v"), fn(col("v")).as("ok")).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (v, exp) =>
      assert(got(v) == exp, s"format $format('$v') should be $exp")
    }
  }

  test("period: <start>/<end> of date-time|duration (format.go:599-632)") {
    check("period", Seq(
      "2024-01-01T00:00:00Z/2024-02-01T00:00:00Z" -> true,
      "P1Y2M/2024-02-01T00:00:00Z" -> true,  // duration start needs date-time end
      "2024-01-01T00:00:00Z/P1M" -> true,    // date-time start allows duration end
      "P1Y/P1M" -> false,                    // duration/duration invalid
      "2024-01-01T00:00:00Z" -> false,       // missing slash
      "/2024-02-01T00:00:00Z" -> false,      // empty start
      "2024-13-01T00:00:00Z/P1M" -> false,   // invalid start date
      "2024-01-01T00:00:00Z/P" -> false))    // empty duration
  }

  test("uuid (format.go:114-140)") {
    check("uuid", Seq(
      "2eb8aa08-aa98-11ea-b4aa-73b441d16380" -> true,
      "2EB8AA08-AA98-11EA-B4AA-73B441D16380" -> true,
      "2eb8aa08-aa98-11ea-b4aa-73b441d1638" -> false,
      "2eb8aa08aa9811eab4aa73b441d16380" -> false,
      "not-a-uuid" -> false))
  }

  test("date: calendar rules incl. leap years (format.go:378-385)") {
    check("date", Seq(
      "1963-06-19" -> true,
      "2020-02-29" -> true,  // leap year
      "2021-02-29" -> false, // not a leap year
      "2020-04-31" -> false, // April has 30 days
      "2020-13-01" -> false,
      "06/19/1963" -> false,
      "2020-1-01" -> false))
  }

  test("time: ranges, offsets, leap second rule (format.go:389-489)") {
    check("time", Seq(
      "08:30:06Z" -> true,
      "08:30:06.283185Z" -> true,
      "08:30:06+01:00" -> true,
      "23:59:60Z" -> true,          // leap second at UTC midnight
      "22:59:60-01:00" -> true,     // leap second after offset applied
      "23:59:60+01:00" -> false,    // 22:59:60 UTC — not a leap second
      "08:30:60Z" -> false,         // :60 outside the leap rule
      "24:00:00Z" -> false,
      "08:60:00Z" -> false,
      "08:30:06" -> false))         // missing offset
  }

  test("date-time composes both (format.go:492-513)") {
    check("date-time", Seq(
      "1963-06-19T08:30:06.283185Z" -> true,
      "1963-06-19t08:30:06z" -> true, // lowercase t/z allowed
      "2021-02-29T08:30:06Z" -> false,
      "1963-06-19 08:30:06Z" -> false))
  }

  test("duration grammar (format.go:143-210)") {
    check("duration", Seq(
      "P4DT12H30M5S" -> true, "P1Y2M3DT4H5M6S" -> true, "P4W" -> true,
      "PT0S" -> true, "P0D" -> true,
      "P" -> false, "PT" -> false, "P4DT" -> false,
      "P1W2D" -> false, // weeks are exclusive
      "4DT12H" -> false))
  }

  test("ipv4: octet ranges, no leading zeros (format.go:212-234)") {
    check("ipv4", Seq(
      "192.168.0.1" -> true, "255.255.255.255" -> true, "0.0.0.0" -> true,
      "256.1.1.1" -> false, "192.168.1" -> false,
      "087.10.10.10" -> false, "1.2.3.4.5" -> false))
  }

  test("ipv6 (format.go:236-252)") {
    check("ipv6", Seq(
      "::1" -> true, "fe80::1ff:fe23:4567:890a" -> true,
      "2001:db8:0:0:0:0:2:1" -> true, "::ffff:192.0.2.1" -> true,
      "12345::" -> false, "1:2:3:4:5:6:7:8:9" -> false, "::1::" -> false))
  }

  test("hostname: label + length rules (format.go:255-296)") {
    check("hostname", Seq(
      "example.com" -> true, "a.b-c.d" -> true, "localhost" -> true,
      "example.com." -> true,
      "-example.com" -> false, "example-.com" -> false,
      ("a" * 64) + ".com" -> false, // label > 63
      "exa_mple.com" -> false))
  }

  test("email (format.go:299-375)") {
    check("email", Seq(
      "joe.bloggs@example.com" -> true,
      "\"quoted local\"@example.com" -> true,
      "joe@[127.0.0.1]" -> true,
      "plainaddress" -> false, "a@b@c.com" -> false,
      ".leading@example.com" -> false))
  }

  test("json-pointer / relative-json-pointer (format.go:42-111)") {
    check("json-pointer", Seq(
      "" -> true, "/foo/bar" -> true, "/f~0o/b~1r" -> true,
      "/f~2o" -> false, "foo" -> false))
    check("relative-json-pointer", Seq(
      "0" -> true, "1/foo" -> true, "2#" -> true,
      "01" -> false, "-1" -> false, "#" -> false))
  }

  test("semver (format.go:635-708)") {
    check("semver", Seq(
      "1.2.3" -> true, "1.0.0-alpha.1" -> true, "1.0.0+build.5" -> true,
      "1.0.0-alpha+build" -> true,
      "1.2" -> false, "01.2.3" -> false, "1.0.0-01" -> false))
  }

  test("uri / uri-reference / uri-template (format.go:535-597)") {
    check("uri", Seq(
      "https://example.com/path?q=1" -> true, "urn:isbn:12345" -> true,
      "/relative/only" -> false, "has space:x" -> false))
    check("uri-reference", Seq(
      "/relative/path" -> true, "#frag" -> true, "" -> true,
      "has space" -> false))
    check("uri-template", Seq(
      "http://example.com/{term:1}/{?q,lang}" -> true,
      "http://x.org/{var}" -> true,
      "http://x.org/{unclosed" -> false))
  }

  test("non-string columns pass formats vacuously (format.go:43-45)") {
    val df = Seq(1, 2).toDF("v")
    val suite = graft.compile.SuiteCompiler.compile(
      graft.spec.Spec.fromJson("""{"columns":{"v":{"format":"uuid"}}}"""), df.schema)
    assert(graft.exec.Validator.flag(df, suite)
      .filter(!col("valid")).count() == 0)
  }

  test("uuid-fast (codegen'd Expression) agrees with the regex uuid everywhere") {
    graft.functions.UuidFormatExpr.register()
    val samples = Seq(
      "2eb8aa08-aa98-11ea-b4aa-73b441d16380",
      "2EB8AA08-AA98-11EA-B4AA-73B441D16380",
      "2eb8aa08-aa98-11ea-b4aa-73b441d1638",
      "2eb8aa08aa9811eab4aa73b441d16380",
      "2eb8aa08-aa98-11ea-b4aa-73b441d1638g",
      "2eb8aa08_aa98_11ea_b4aa_73b441d16380",
      "", "not-a-uuid", "-".padTo(36, 'a').mkString)
    val df = samples.toDF("v")
    val both = df.select(
      graft.functions.Formats.get("uuid").get(col("v")).as("re"),
      graft.functions.Formats.get("uuid-fast").get(col("v")).as("fast"))
      .collect()
    both.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1)))
    // and it genuinely codegen-evaluates (no fallback node in the plan)
    val plan = df.select(graft.functions.UuidFormatExpr(col("v")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
  }

  test("custom format registration (compiler.go:75-79)") {
    Formats.register("even-length", v => length(v) % 2 === 0)
    val df = Seq("ab", "abc").toDF("v")
    val suite = graft.compile.SuiteCompiler.compile(
      graft.spec.Spec.fromJson("""{"columns":{"v":{"format":"even-length"}}}"""), df.schema)
    assert(graft.exec.Validator.flag(df, suite)
      .filter(!col("valid")).count() == 1)
  }

  test("pluggable regex engine (UseRegexpEngine analogue)") {
    // swap in a case-insensitive engine, observe behavior change, restore
    Formats.setPatternEngine((v, p) => v.rlike("(?i)" + p))
    try {
      val df = Seq("HELLO").toDF("v")
      val suite = graft.compile.SuiteCompiler.compile(
        graft.spec.Spec.fromJson("""{"columns":{"v":{"pattern":"hello"}}}"""), df.schema)
      assert(graft.exec.Validator.flag(df, suite)
        .filter(!col("valid")).count() == 0)
    } finally Formats.setPatternEngine((v, p) => v.rlike(p))
    val df2 = Seq("HELLO").toDF("v")
    val suite2 = graft.compile.SuiteCompiler.compile(
      graft.spec.Spec.fromJson("""{"columns":{"v":{"pattern":"hello"}}}"""), df2.schema)
    assert(graft.exec.Validator.flag(df2, suite2)
      .filter(!col("valid")).count() == 1)
  }
}
