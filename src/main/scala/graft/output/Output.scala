package graft.output

import org.apache.spark.sql.DataFrame

/** Verdict/violation renderers mirroring the reference's output formats
  * (/root/reference/output.go):
  *
  *  - flag     → `{"valid": bool}`                    (output.go:114-122)
  *  - basic    → flat list of output units             (output.go:126-152)
  *  - detailed → hierarchical along the keyword path   (output.go:154-162)
  *  - simple   → indented human text                   (output.go:46-101)
  *
  * Rendering happens on the driver over a bounded sample (top-N violations)
  * — at 10^12 rows nobody prints a trillion units; the full violation set
  * lives in the violations table/parquet, these renderers are for human
  * eyes and CI logs.
  */
object Output {

  final case class Unit(keyword: String, instancePath: String, detail: String)

  def collect(vios: DataFrame, limit: Int = 100): Seq[Unit] =
    vios.orderBy("keyword", "instance_path").limit(limit).collect().map { r =>
      Unit(r.getAs[String]("keyword"), r.getAs[String]("instance_path"),
        r.getAs[String]("detail"))
    }.toSeq

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  }

  /** Translate units' error text via a (keyword path → message) index —
    * built by [[Messages.forSuite]]; keyword paths not in the index keep
    * their engine-rendered detail (runtime values included).
    */
  def localize(units: Seq[Unit], index: Map[String, String]): Seq[Unit] =
    units.map(u => index.get(u.keyword).map(m => u.copy(detail = m)).getOrElse(u))

  def flagJson(valid: Boolean): String = s"""{"valid":$valid}"""

  /** Flat unit list (BasicOutput shape). */
  def basicJson(units: Seq[Unit]): String = {
    val items = units.map { u =>
      s"""{"valid":false,"keywordLocation":"/${esc(u.keyword)}",""" +
        s""""instanceLocation":"/${esc(u.instancePath)}","error":"${esc(u.detail)}"}"""
    }
    s"""{"valid":${units.isEmpty},"errors":[${items.mkString(",")}]}"""
  }

  /** Hierarchical output: units nested along keyword-path segments — the
    * DetailedOutput tree (single-child chains elided like the reference's
    * `$ref` skip rule, output.go:38-44).
    */
  def detailedJson(units: Seq[Unit]): String = {
    final case class Node(
        var units: List[Unit] = Nil,
        children: scala.collection.mutable.LinkedHashMap[String, Node] =
          scala.collection.mutable.LinkedHashMap.empty)
    val root = Node()
    units.foreach { u =>
      val segs = u.keyword.split("/").toList
      var n = root
      segs.foreach { s => n = n.children.getOrElseUpdate(s, Node()) }
      n.units = u :: n.units
    }
    def render(name: String, n: Node): String = {
      // elide single-child pure-pass-through chains
      if (n.units.isEmpty && n.children.size == 1) {
        val (cn, c) = n.children.head
        return render(if (name.isEmpty) cn else s"$name/$cn", c)
      }
      val errs = n.units.reverse.map(u =>
        s"""{"instanceLocation":"/${esc(u.instancePath)}","error":"${esc(u.detail)}"}""")
      val kids = n.children.map { case (cn, c) => render(cn, c) }
      s"""{"keywordLocation":"/${esc(name)}","valid":false""" +
        (if (errs.nonEmpty) s""","errors":[${errs.mkString(",")}]""" else "") +
        (if (kids.nonEmpty) s""","details":[${kids.mkString(",")}]""" else "") + "}"
    }
    if (units.isEmpty) """{"valid":true}"""
    else render("", root)
  }

  /** Verbose human text (the `alt` CLI format) — the reference's `%#v`
    * GoString display (/root/reference/output.go:46-101, verbose=true):
    * every line carries the `#`-relative keyword location in brackets,
    * `at <instance> [#/<keyword>]: <detail>`. The spec is a single document
    * here, so the location is always document-relative (the reference
    * shortens same-document locations to `S#<fragment>` the same way).
    */
  def altText(units: Seq[Unit], totalViolations: Long): String = {
    val sb = new StringBuilder
    sb.append(s"invalid: $totalViolations violation(s)\n")
    units.foreach { u =>
      // keywords from the jv/lint paths arrive already '#'-rooted; table-
      // mode keywords are bare spec paths — avoid a doubled '#/#/' prefix
      val kw = if (u.keyword.startsWith("#")) u.keyword else "#/" + u.keyword
      sb.append(s"- at ${u.instancePath} [$kw]: ${u.detail}\n")
    }
    sb.result()
  }

  /** Indented human text (the `simple` CLI format). */
  def simpleText(units: Seq[Unit], totalViolations: Long): String = {
    val sb = new StringBuilder
    sb.append(s"invalid: $totalViolations violation(s)\n")
    units.groupBy(_.keyword).toSeq.sortBy(_._1).foreach { case (kw, us) =>
      sb.append(s"- $kw (showing ${math.min(5, us.size)} of ${us.size} collected)\n")
      us.take(5).foreach { u =>
        sb.append(s"    at ${u.instancePath}: ${u.detail}\n")
      }
    }
    sb.result()
  }
}
