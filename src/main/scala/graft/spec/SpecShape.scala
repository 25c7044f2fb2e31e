package graft.spec

import com.fasterxml.jackson.databind.JsonNode

import scala.jdk.CollectionConverters._

/** Driver-side structural validator over raw [[JsonNode]]s — used at SPEC
  * time, where no SparkSession exists, to check the shape of a custom
  * constraint family's spec before its parse callback runs (the analogue of
  * `Vocabulary.Schema` validation in the reference,
  * /root/reference/vocab.go:19-35 + compiler.go:102-114 — the reference can
  * reuse its full in-process validator there because it is single-node; our
  * row engine compiles to Spark plans, so spec-time checks get this compact
  * interpreter instead).
  *
  * The shape language IS the engine's spec language ([[SchemaNode]], same
  * typed parser), interpreted over the document tree: type / const / enum /
  * bounds / lengths / pattern / items / prefixItems / contains / properties /
  * required / patternProperties / additionalProperties / dependentRequired /
  * composition. Data-plane-only keywords (format, content*, json,
  * unevaluated*) are rejected at registration — a shape check should not
  * depend on runtime registries.
  */
object SpecShape {

  /** Parse a shape schema, rejecting data-plane-only keywords. */
  def parseShape(json: JsonNode, at: String): SchemaNode = {
    val n = SchemaNode.parse(json, Vector(at))
    def reject(cond: Boolean, kw: String): Unit =
      if (cond) throw SpecError(at,
        s"'$kw' is not usable in a spec-shape schema (runtime-registry keyword)")
    def walk(s: SchemaNode): Unit = {
      reject(s.format.nonEmpty, "format")
      reject(s.contentEncoding.nonEmpty || s.contentMediaType.nonEmpty ||
        s.contentSchema.nonEmpty, "content*")
      reject(s.jsonSchema.nonEmpty, "json")
      reject(s.unevaluatedProperties.nonEmpty || s.unevaluatedItems.nonEmpty,
        "unevaluated*")
      reject(s.ref.nonEmpty, "$ref")
      (s.items ++ s.contains ++ s.propertyNames ++ s.not ++ s.ifS ++ s.thenS ++
        s.elseS ++ s.prefixItems ++ s.allOf ++ s.anyOf ++ s.oneOf ++
        s.properties.map(_._2) ++ s.patternProperties.map(_._2) ++
        s.dependentSchemas.map(_._2) ++
        s.additionalProperties.toSeq.flatMap(_.toOption)).foreach(walk)
    }
    walk(n)
    n
  }

  private def typeName(n: JsonNode): String =
    if (n.isNull) "null"
    else if (n.isBoolean) "boolean"
    else if (n.isIntegralNumber) "integer"
    else if (n.isNumber) "number"
    else if (n.isTextual) "string"
    else if (n.isArray) "array"
    else "object"

  /** JSON deep equality: numeric cross-type compare at every depth (1 == 1.0
    * inside arrays/objects too) and order-insensitive object fields — the
    * same equality the engine's compilers use (canonicalized), NOT Jackson
    * node equality (which is type- and key-order-sensitive).
    */
  private def deepEq(a: JsonNode, b: JsonNode): Boolean =
    if (a.isNumber && b.isNumber) a.decimalValue().compareTo(b.decimalValue()) == 0
    else if (a.isArray && b.isArray)
      a.size() == b.size() &&
        a.asScala.zip(b.asScala).forall { case (x, y) => deepEq(x, y) }
    else if (a.isObject && b.isObject) {
      val ka = a.fieldNames().asScala.toSet
      ka == b.fieldNames().asScala.toSet &&
        ka.forall(k => deepEq(a.get(k), b.get(k)))
    }
    else a == b

  /** All violations of `n` against shape `s`, as "path: message" strings. */
  def violations(n: JsonNode, s: SchemaNode, path: String = "#"): Vector[String] = {
    val out = Vector.newBuilder[String]
    def fail(msg: String, at: String = path): Unit = out += s"$at: $msg"
    def ok(nn: JsonNode, ss: SchemaNode): Boolean =
      violations(nn, ss, path).isEmpty

    s.boolSchema match {
      case Some(false) => fail("false schema: always fails"); return out.result()
      case Some(true)  => return Vector.empty
      case None        =>
    }

    val t = typeName(n)
    s.types.foreach { ts =>
      val pass = ts.contains(t) || (ts.contains("number") && t == "integer") ||
        (ts.contains("integer") && t == "number" &&
          n.decimalValue().stripTrailingZeros().scale() <= 0)
      if (!pass) fail(s"type: got $t, want ${ts.mkString("|")}")
    }
    s.const.foreach(c => if (!deepEq(n, c)) fail(s"const: got $n, want $c"))
    s.enumVals.foreach(vs =>
      if (!vs.exists(deepEq(n, _))) fail(s"enum: got $n, want one of ${vs.mkString(", ")}"))

    if (n.isNumber) {
      val v = BigDecimal(n.decimalValue())
      s.minimum.foreach(m => if (v < m) fail(s"minimum: got $v, want >= $m"))
      s.maximum.foreach(m => if (v > m) fail(s"maximum: got $v, want <= $m"))
      s.exclusiveMinimum.foreach(m => if (v <= m) fail(s"exclusiveMinimum: got $v, want > $m"))
      s.exclusiveMaximum.foreach(m => if (v >= m) fail(s"exclusiveMaximum: got $v, want < $m"))
      s.multipleOf.foreach(m => if ((v % m) != 0) fail(s"multipleOf: got $v, want multiple of $m"))
    }
    if (n.isTextual) {
      val len = n.asText().codePointCount(0, n.asText().length)
      s.minLength.foreach(m => if (len < m) fail(s"minLength: got $len chars, want >= $m"))
      s.maxLength.foreach(m => if (len > m) fail(s"maxLength: got $len chars, want <= $m"))
      s.pattern.foreach { p =>
        if (!java.util.regex.Pattern.compile(p).matcher(n.asText()).find())
          fail(s"pattern: does not match '$p'")
      }
    }
    if (n.isArray) {
      val items = n.asScala.toVector
      s.minItems.foreach(m => if (items.size < m) fail(s"minItems: got ${items.size}, want >= $m"))
      s.maxItems.foreach(m => if (items.size > m) fail(s"maxItems: got ${items.size}, want <= $m"))
      if (s.uniqueItems && items.combinations(2).exists {
            case Seq(x, y) => deepEq(x, y); case _ => false })
        fail("uniqueItems: duplicate items")
      s.prefixItems.zipWithIndex.foreach { case (ps, i) =>
        if (i < items.size) out ++= violations(items(i), ps, s"$path/$i")
      }
      s.items.foreach { is =>
        items.drop(s.prefixItems.size).zipWithIndex.foreach { case (e, i) =>
          out ++= violations(e, is, s"$path/${i + s.prefixItems.size}")
        }
      }
      s.contains.foreach { cs =>
        val cnt = items.count(ok(_, cs))
        val minC = s.minContains.getOrElse(1)
        if (cnt < minC || s.maxContains.exists(cnt > _))
          fail(s"contains: $cnt matching, want >= $minC")
      }
    }
    if (n.isObject) {
      val keys = n.fieldNames().asScala.toVector
      s.requiredProps.foreach(k =>
        if (!n.has(k)) fail(s"required: missing property '$k'"))
      s.minProperties.foreach(m => if (keys.size < m) fail(s"minProperties: got ${keys.size}"))
      s.maxProperties.foreach(m => if (keys.size > m) fail(s"maxProperties: got ${keys.size}"))
      s.properties.foreach { case (k, ps) =>
        if (n.has(k)) out ++= violations(n.get(k), ps, s"$path/$k")
      }
      s.patternProperties.foreach { case (re, ps) =>
        val p = java.util.regex.Pattern.compile(re)
        keys.filter(k => p.matcher(k).find())
          .foreach(k => out ++= violations(n.get(k), ps, s"$path/$k"))
      }
      s.dependentRequired.foreach { case (k, reqs) =>
        if (n.has(k)) reqs.foreach(r =>
          if (!n.has(r)) fail(s"dependentRequired: '$k' present but '$r' missing"))
      }
      s.dependentSchemas.foreach { case (k, ds) =>
        if (n.has(k)) out ++= violations(n, ds, path)
      }
      s.propertyNames.foreach { ps =>
        keys.foreach { k =>
          val kn = com.fasterxml.jackson.databind.node.TextNode.valueOf(k)
          if (!ok(kn, ps)) fail(s"propertyNames: key '$k' does not match")
        }
      }
      s.additionalProperties.foreach { ap =>
        val covered = (k: String) => s.properties.exists(_._1 == k) ||
          s.patternProperties.exists { case (re, _) =>
            java.util.regex.Pattern.compile(re).matcher(k).find() }
        val extra = keys.filterNot(covered)
        ap match {
          case Left(true)  =>
          case Left(false) =>
            if (extra.nonEmpty) fail(s"additionalProperties: unexpected ${extra.mkString(", ")}")
          case Right(as)   =>
            extra.foreach(k => out ++= violations(n.get(k), as, s"$path/$k"))
        }
      }
    }
    // composition
    s.allOf.foreach(ch => out ++= violations(n, ch, path))
    if (s.anyOf.nonEmpty && !s.anyOf.exists(ok(n, _)))
      fail("anyOf: no subschema matched")
    if (s.oneOf.nonEmpty) {
      val matched = s.oneOf.count(ok(n, _))
      if (matched != 1) fail(s"oneOf: $matched matched, want exactly 1")
    }
    s.not.foreach(ch => if (ok(n, ch)) fail("not: subschema matched"))
    s.ifS.foreach { ifn =>
      if (ok(n, ifn)) s.thenS.foreach(tn => out ++= violations(n, tn, path))
      else s.elseS.foreach(en => out ++= violations(n, en, path))
    }
    out.result()
  }
}
