package graft.compile

import graft.functions.{ExactRatPredExpr, Formats}
import graft.spec.{SchemaNode, Spec, SpecError}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** DYNAMIC JSON validation over Spark 4 VariantType — the faithful mapping
  * of the reference's dynamically-typed instance model
  * (/root/reference/schema.go:112-129): where [[RowCompiler]] dispatches on
  * the STATIC Spark column type, this compiler emits runtime type dispatch
  * per value via `schema_of_variant`, so union types
  * (`"type": ["integer","string"]`), heterogeneous arrays, and
  * schema-unknown payloads validate exactly like the reference.
  *
  * Notable fidelity points:
  *  - JSON null is a first-class type here (VOID variant), distinct from an
  *    absent key (SQL NULL) — matching the reference, unlike the relational
  *    NULL=absent convention of the static compiler;
  *  - `uniqueItems`/`const` deep equality uses `to_json(variant)`, which
  *    canonicalizes object key order — the same trick as the reference's
  *    canonical hash (/root/reference/util.go:363-402);
  *  - `integer` is the zero-fraction predicate on numbers
  *    (/root/reference/util.go:272-275).
  *
  * Everything is built from codegen'd variant expressions — no UDFs.
  * Key-enumerating object keywords (patternProperties, propertyNames,
  * additionalProperties, min/maxProperties) re-serialize the object once
  * (bound) into a map<string,variant>, so their subschemas keep full
  * dynamic semantics. content* keywords apply to any runtime-string
  * instance via the same pluggable registries as the static compiler
  * (decode → mediaType → contentSchema over the decoded value,
  * /root/reference/validator.go:468-510). unevaluated* runs the same
  * static-lowering + runtime branch-set walkers as the typed compiler.
  * Unsupported here (out-of-scope territory): nested `json`.
  */
object DynamicJson {

  /** Runtime JSON type name of a variant value:
    * missing | null | object | array | string | boolean | number.
    */
  def jsonTypeOf(v: Column): Column =
    jsonTypeFrom(v, graft.functions.VariantTopKindExpr(v))

  /** Same, over a pre-computed (ideally bound) storage-kind column
    * ([[graft.functions.VariantTopKindExpr]] — O(1) header read; the
    * former `schema_of_variant` source walked the whole subtree at EVERY
    * nesting level, O(depth²) per row on recursive documents). The CASE
    * chain tests `sch` up to 5 times, so binding it first still avoids
    * repeated reads.
    */
  private def jsonTypeFrom(v: Column, sch: Column): Column =
    when(v.isNull, lit("missing"))
      .when(sch === "VOID", lit("null"))
      .when(sch.startsWith("OBJECT"), lit("object"))
      .when(sch.startsWith("ARRAY"), lit("array"))
      // non-JSON storage classes (native variant columns fed from typed
      // sources — parse_json never produces them) read as strings, which
      // is how both to_json and the variant-binary canon render them;
      // without these arms a timestamp would classify as "number"
      .when(sch === "STRING" || sch === "DATE" || sch.startsWith("TIMESTAMP") ||
        sch === "BINARY" || sch === "UUID", lit("string"))
      .when(sch === "BOOLEAN", lit("boolean"))
      .otherwise(lit("number"))

  private def asNum(v: Column): Column = try_variant_get(v, "$", "double")
  private def asDec(v: Column): Column = try_variant_get(v, "$", "decimal(38,12)")
  private def asStr(v: Column): Column = try_variant_get(v, "$", "string")
  private def asArr(v: Column): Column = try_variant_get(v, "$", "array<variant>")
  private def asBool(v: Column): Column = try_variant_get(v, "$", "boolean")

  /** Deep-equality key: canonical JSON text (sorted object keys). */
  private def canon(v: Column): Column = to_json(v)

  /** Canonical NUMBER text of a variant value, exact-rational-faithful:
    * variant-decimal numbers keep their digit-exact `to_json` text, but a
    * variant that stores the number as DOUBLE (negative-scale scientific
    * notation ≥ ~1e16, or >38 digits — decimal storage impossible) renders
    * through the shortest correctly-rounded repr instead of `to_json`'s
    * legacy Jackson form, which is a DIFFERENT rational on the excess-digit
    * class (JDK-4511638) and flipped bound/const/multipleOf verdicts vs
    * both the typed compiler and the reference (found by the differential
    * fuzz). Non-number values fall through to the plain canonical JSON.
    * Numbers NESTED inside containers get the same storage-class rule via
    * [[graft.functions.VariantCanonExpr]] (deep const/enum/uniqueItems
    * walk the variant binary, not `to_json` text), so deep and shallow
    * canon agree at every level.
    */
  private def numCanon(v: Column, sv: Column): Column =
    when(sv === "DOUBLE",
      graft.functions.ShortestReprExpr.col(asNum(v)))
      // FLOAT storage (native variant columns only): the float's OWN
      // shortest repr, matching VariantCanonExpr's deep FLOAT arm — the
      // to_json fallback would print the legacy excess-digit float text
      .when(sv === "FLOAT",
        graft.functions.ShortestFloatReprExpr.col(
          try_variant_get(v, "$", "float")))
      .otherwise(to_json(v))

  /** missing values are vacuous for every keyword (absent property —
    * subschema not applied, validator.go semantics); a type-gated core
    * passes vacuously for other types.
    */
  private def vac(v: Column, core: Column): Column =
    when(v.isNull, lit(true)).otherwise(coalesce(core, lit(false)))

  def predicate(spec: Spec, node: SchemaNode, v: Column,
                stack: List[(String, Int)] = Nil, depth: Int = 0): Column =
    compile(spec, node, v, "", stack, None, depth)
      .map(_.pred).reduceOption(_ && _).getOrElse(lit(true))

  def compile(spec: Spec, node: SchemaNode, v: Column,
              instPath: String, stack: List[(String, Int)] = Nil,
              binder: Option[Binder] = None, depth: Int = 0): Seq[Check] = {
    // bind-once views: every keyword of this node re-reads the runtime type
    // and the typed extraction, so without binding a 3-keyword node reads
    // the variant 6+ times per row
    def b(c: Column): Column = binder.map(_.bind(c)).getOrElse(c)
    val sv = b(graft.functions.VariantTopKindExpr(v))
    val t = b(jsonTypeFrom(v, sv))
    lazy val vNum = b(asNum(v))
    lazy val vStr = b(asStr(v))
    // exact-rational number text (shortest-repr for variant-double storage)
    lazy val vCanon = b(numCanon(v, sv))
    val kwBase = if (node.path.isEmpty) "" else node.path.mkString("/")
    CompileLimits.tickVisit(if (kwBase.isEmpty) "#" else kwBase)
    def kw(parts: String*): String =
      (if (kwBase.isEmpty) parts else Vector(kwBase) ++ parts).mkString("/")
    val out = Vector.newBuilder[Check]
    def add(kwPath: String, pred: Column, detail: Column,
            kind: ErrorKind): Unit =
      out += Check(kwPath, instPath, pred, detail, kind)

    node.boolSchema match {
      case Some(false) =>
        add(kwBase, vac(v, lit(false)), lit("false schema: always fails"),
          ErrorKind.FalseSchema)
        return out.result()
      case Some(true) => return Vector.empty
      case None       =>
    }

    // $ref / $dynamicRef — compile-time inlining with bounded unroll for
    // recursive descent (see RowCompiler / Refs for the stack discipline)
    def inlineRef(r: String, key: String, kwName: String,
                  target: => SchemaNode): Unit = {
      if (stack.contains((key, depth)))
        throw SpecError(kw(kwName), s"cyclic $$ref chain: " +
          (key :: stack.map(_._1)).reverse.mkString(" -> "))
      val unroll = CompileLimits.effectiveUnroll
      if (stack.count(_._1 == key) >= unroll)
        add(kw(kwName), v.isNull,
          lit(s"$kwName: recursive schema '$r' unrolled $unroll deep; " +
            "value present beyond the compiled depth"),
          ErrorKind.DepthExceeded(unroll))
      else
        out ++= compile(spec, target, v, instPath,
          (key, depth) :: stack, binder, depth)
    }
    node.ref.foreach { r => inlineRef(r, r, "$ref", spec.resolve(r, Nil)) }
    node.dynRef.foreach { r =>
      val (target, key) = Refs.resolveDynamic(spec, r, stack, kw("$dynamicRef"))
      inlineRef(r, key, "$dynamicRef", target)
    }

    // type — runtime dispatch; integer = number with zero fraction
    node.types.foreach { ts =>
      val base = ts.map(name => t === lit(name))
        .reduceOption(_ || _).getOrElse(lit(false))
      val intOk =
        if (ts.contains("integer") && !ts.contains("number"))
          // exact zero-fraction rule: multipleOf-1 over the canonical
          // number text (util.go:272-275 / big.Rat IsInt). NOT pmod-1 on
          // the double extract, whose decimal→double cast rounds
          // >16-fractional-digit texts (1.00000000000000001) onto an
          // integer the reference rejects; 1e30-class values stay integral
          // (their shortest repr has no fraction)
          (t === "number") && coalesce(
            ExactRatPredExpr.pred(vCanon, ExactRatPredExpr.MultipleOf,
              java.math.BigDecimal.ONE),
            lit(false))
        else lit(false)
      add(kw("type"), vac(v, base || intOk),
        concat(lit("type: got "), t, lit(s", want ${ts.mkString("|")}")),
        ErrorKind.TypeMismatch(ts))
    }

    // const / enum — deep equality over canonical JSON with numeric
    // cross-type handling (2 == 2.0 compares as decimal)
    def constEqDyn(jn: com.fasterxml.jackson.databind.JsonNode): Column =
      if (jn.isNumber)
        // exact rational equality over the canonical number text
        // (compareTo, so 2 == 2.0 across renderings) — no Decimal(38,12)
        // rounding, no double approximation at any magnitude or scale
        (t === "number") && coalesce(
          ExactRatPredExpr.pred(vCanon, ExactRatPredExpr.Eq,
            jn.decimalValue()),
          lit(false))
      else if (jn.isTextual) (t === "string") && (vStr === lit(jn.asText()))
      else if (jn.isBoolean) (t === "boolean") && (asBool(v) === lit(jn.asBoolean()))
      else if (jn.isNull) t === "null"
      else {
        // arrays/objects: deep canonical JSON on BOTH sides — nested
        // numbers rewritten to their exact-rational rendering and object
        // keys sorted through the SAME Jackson writer, so {"a":1.0} equals
        // const {"a":1} (the reference's deep numeric equality,
        // util.go:286-329) while digit-distinct nested numbers stay
        // distinct. The constant side canonicalizes once at COMPILE time;
        // the instance side walks the variant BINARY (VariantCanonExpr) so
        // nested variant-DOUBLE-stored numbers render by shortest repr —
        // the same storage rule numCanon applies at top level — instead of
        // to_json's legacy double text (which also destroyed the
        // decimal-vs-double distinction for any post-hoc rewrite).
        val constCanon = graft.functions.JsonNumCanonExpr.canonJson(
          org.apache.spark.unsafe.types.UTF8String.fromString(jn.toString)
        ).toString
        graft.functions.VariantCanonExpr.col(v) === lit(constCanon)
      }

    node.const.foreach { c =>
      add(kw("const"), vac(v, constEqDyn(c)),
        concat(lit("const: got "), canon(v), lit(s", want $c")),
        ErrorKind.ConstK(c.toString))
    }
    node.enumVals.foreach { vals =>
      // an empty enum matches nothing (legal under 2020-12)
      add(kw("enum"), vac(v,
          vals.map(constEqDyn).reduceOption(_ || _).getOrElse(lit(false))),
        concat(lit("enum: got "), canon(v), lit(s", want one of ${vals.mkString(", ")}")),
        ErrorKind.EnumK(vals.map(_.toString)))
    }

    // number keywords — gated on runtime number type (vacuous otherwise).
    // Exact rational compare over the canonical number text: digit-exact
    // for variant-decimal numbers, shortest-repr for variant-double ones —
    // the reference's json.Number / float64 decode modes respectively
    // (validator.go:519 feeds fmt.Sprint to big.Rat). Replaces the former
    // Decimal(38,12) extract whose cast ROUNDED >12-dp values before
    // comparing. canon(v) is already on this row path (messages, const).
    def boundCheck(name: String, bd: BigDecimal, opCode: Int, want: String,
                   kind: ErrorKind): Unit = {
      val core = ExactRatPredExpr.pred(vCanon, opCode, bd.bigDecimal)
      add(kw(name), vac(v, (t =!= "number") || coalesce(core, lit(false))),
        concat(lit(s"$name: got "), vNum.cast(StringType), lit(s", want $want")),
        kind)
    }
    node.minimum.foreach(bd =>
      boundCheck("minimum", bd, ExactRatPredExpr.Ge, s">= $bd", ErrorKind.Minimum(bd)))
    node.maximum.foreach(bd =>
      boundCheck("maximum", bd, ExactRatPredExpr.Le, s"<= $bd", ErrorKind.Maximum(bd)))
    node.exclusiveMinimum.foreach(bd =>
      boundCheck("exclusiveMinimum", bd, ExactRatPredExpr.Gt, s"> $bd",
        ErrorKind.ExclusiveMinimum(bd)))
    node.exclusiveMaximum.foreach(bd =>
      boundCheck("exclusiveMaximum", bd, ExactRatPredExpr.Lt, s"< $bd",
        ErrorKind.ExclusiveMaximum(bd)))
    node.multipleOf.foreach { m =>
      val core = coalesce(
        ExactRatPredExpr.pred(vCanon, ExactRatPredExpr.MultipleOf,
          m.bigDecimal),
        lit(false))
      add(kw("multipleOf"), vac(v, (t =!= "number") || core),
        concat(lit("multipleOf: got "), canon(v), lit(s", want multiple of $m")),
        ErrorKind.MultipleOf(m))
    }

    // string keywords — gated on runtime string type
    def strCheck(name: String, core: Column => Column, msg: String,
                 kind: ErrorKind): Unit =
      add(kw(name), vac(v, (t =!= "string") || coalesce(core(vStr), lit(false))),
        concat(lit(s"$name: "), canon(v), lit(s" $msg")),
        kind)
    node.minLength.foreach(n => strCheck("minLength", length(_) >= n,
      s"shorter than $n chars", ErrorKind.MinLength(n)))
    node.maxLength.foreach(n => strCheck("maxLength", length(_) <= n,
      s"longer than $n chars", ErrorKind.MaxLength(n)))
    node.pattern.foreach(p => strCheck("pattern", Formats.patternMatch(_, p),
      s"does not match '$p'", ErrorKind.PatternK(p)))
    node.format.foreach { f =>
      Formats.get(f) match {
        case Some(fn) =>
          strCheck("format", fn, s"is not a valid $f", ErrorKind.FormatK(f))
        case None if node.formatLenient => // compat: unregistered format is
        // an ignored annotation (the reference's nil-Format skip)
        case None =>
          throw SpecError(kw("format"), s"unknown format '$f'")
      }
    }

    // array keywords over array<variant> — bound once when any array
    // keyword is present
    lazy val arr = b(asArr(v))
    def arrCheck(name: String, core: Column, detail: Column,
                 kind: ErrorKind): Unit =
      add(kw(name), vac(v, (t =!= "array") || coalesce(core, lit(false))),
        detail, kind)
    node.minItems.foreach(n => arrCheck("minItems", size(arr) >= n,
      concat(lit("minItems: got "), size(arr).cast(StringType), lit(s", want >= $n")),
      ErrorKind.MinItems(n)))
    node.maxItems.foreach(n => arrCheck("maxItems", size(arr) <= n,
      concat(lit("maxItems: got "), size(arr).cast(StringType), lit(s", want <= $n")),
      ErrorKind.MaxItems(n)))
    if (node.uniqueItems) {
      // canonical-JSON dedup = deep equality incl. sorted object keys;
      // NUMBERS canonicalize through the exact-rational rendering so 2 and
      // 2.0 are the same element (the reference's numeric equality,
      // Extra-Test-Suite uniqueItems.json "zero fraction") while
      // digit-distinct numbers at ANY scale stay distinct — no Decimal or
      // double rounding at any magnitude (util.go:322-325 semantics).
      // EVERY element takes the storage-faithful deep canonicalizer
      // (VariantCanonExpr: one variant-binary walk per element — numbers
      // normalized at ANY nesting level by their actual storage class,
      // decimal → digit-exact / double → shortest repr, keys sorted,
      // strings re-escaped through one writer: {"a":1.0} duplicates
      // {"a":1}, 2.0 duplicates 2, "2" stays distinct from 2). No
      // schema_of_variant dispatch, no to_json + Jackson reparse — and
      // nested variant-DOUBLE numbers group by the same shortest-repr
      // rule the scalar path applies (deep = shallow at every level).
      val canonArr = transform(arr,
        e => graft.functions.VariantCanonExpr.col(e))
      arrCheck("uniqueItems", size(array_distinct(canonArr)) === size(arr),
        lit("uniqueItems: duplicate items found"),
        ErrorKind.UniqueItemsK)
    }
    node.prefixItems.zipWithIndex.foreach { case (ps, i) =>
      val p = predicate(spec, ps, element_at(arr, i + 1), stack, depth + 1)
      arrCheck(s"prefixItems/$i", size(arr) <= i || coalesce(p, lit(false)),
        lit(s"prefixItems/$i: element does not match"),
        ErrorKind.PrefixItemsK(i))
    }
    val prefixN = node.prefixItems.size
    node.items.foreach { is =>
      // 2020-12: items applies AFTER the prefix
      val rest = if (prefixN == 0) arr
        else slice(arr, lit(prefixN + 1), greatest(size(arr) - prefixN, lit(0)))
      val p = forall(rest, e => coalesce(predicate(spec, is, e, stack, depth + 1), lit(false)))
      arrCheck("items", p, lit("items: element(s) do not match"),
        ErrorKind.ItemsK)
    }
    node.contains.foreach { cs =>
      val cnt = size(filter(arr, e => coalesce(predicate(spec, cs, e, stack, depth + 1), lit(false))))
      val minC = node.minContains.getOrElse(1)
      val core = node.maxContains match {
        case Some(mx) => cnt >= minC && cnt <= mx
        case None     => cnt >= minC
      }
      arrCheck("contains", core,
        concat(lit("contains: "), cnt.cast(StringType), lit(s" matching, want >= $minC")),
        ErrorKind.ContainsK(minC, node.maxContains))
    }

    // object keywords via variant path extraction
    // bracket-quoted paths: a key containing '.' must not navigate nested
    // objects ($['a.b'], not $.a.b). Spark's variant path grammar has NO
    // escape inside quoted segments ([^']* / [^"]*), so pick the quote the
    // key does not contain; a key containing BOTH quote kinds is
    // unaddressable by any path and routes through the map view instead.
    // CAVEAT (both-quotes keys only): the map view round-trips through
    // to_json → from_json, which can change a number's variant STORAGE
    // class (e.g. FLOAT → DECIMAL/DOUBLE) — const/uniqueItems canon on
    // such a child can diverge from direct path extraction for native
    // variant columns; parse_json-produced variants are unaffected.
    def propGet(k: String): Column =
      if (!k.contains("'"))
        try_variant_get(v, "$['" + k + "']", "variant")
      else if (!k.contains("\""))
        try_variant_get(v, "$[\"" + k + "\"]", "variant")
      else
        when(t === "object", try_element_at(
          from_json(to_json(v),
            org.apache.spark.sql.types.DataType.fromDDL("map<string, variant>")),
          lit(k)))
    node.requiredProps.foreach { k =>
      add(kw("required"),
        vac(v, (t =!= "object") || propGet(k).isNotNull),
        lit(s"required: missing property '$k'"),
        ErrorKind.RequiredK(k))
    }
    node.properties.foreach { case (k, ps) =>
      val child0 = propGet(k)
      // a property value feeds every check of its subschema — extract once
      val child = binder.map(_.bind(child0)).getOrElse(child0)
      out ++= compile(spec, ps, child,
        if (instPath.isEmpty) k else s"$instPath/$k", stack, binder, depth + 1)
    }
    node.dependentSchemas.foreach { case (k, ds) =>
      val present = (t === "object") &&
        propGet(k).isNotNull
      compile(spec, ds, v, instPath, stack, binder, depth).foreach { c =>
        out += c.copy(pred = !coalesce(present, lit(false)) || c.pred)
      }
    }
    node.dependentRequired.foreach { case (k, reqs) =>
      val present = propGet(k).isNotNull
      val core = reqs.map(r => propGet(r).isNotNull)
        .reduceOption(_ && _).getOrElse(lit(true))
      add(kw("dependentRequired", k),
        vac(v, (t =!= "object") || !present || coalesce(core, lit(false))),
        lit(s"dependentRequired: '$k' present but ${reqs.mkString(",")} missing"),
        ErrorKind.DependentRequiredK(k, reqs))
    }

    // key-enumerating object keywords: variant exposes no native key list,
    // so the object is re-serialized ONCE (bound) and re-parsed as
    // map<string,variant> — values stay variant, so subschemas keep full
    // dynamic semantics. Non-objects parse to NULL → type-gated vacuous.
    lazy val asMap = b(from_json(to_json(v),
      org.apache.spark.sql.types.DataType.fromDDL("map<string, variant>")))
    def objCheck(name: String, core: Column, detail: Column,
                 kind: ErrorKind): Unit =
      add(kw(name), vac(v, (t =!= "object") || coalesce(core, lit(false))),
        detail, kind)
    node.minProperties.foreach(n =>
      objCheck("minProperties", size(map_keys(asMap)) >= n,
        concat(lit("minProperties: got "), size(map_keys(asMap)).cast(StringType),
          lit(s", want >= $n")),
        ErrorKind.MinProperties(n)))
    node.maxProperties.foreach(n =>
      objCheck("maxProperties", size(map_keys(asMap)) <= n,
        concat(lit("maxProperties: got "), size(map_keys(asMap)).cast(StringType),
          lit(s", want <= $n")),
        ErrorKind.MaxProperties(n)))
    node.propertyNames.foreach { ps =>
      // key names are strings — the STATIC string compiler applies
      val p = forall(map_keys(asMap),
        k => coalesce(RowCompiler.predicate(spec, ps, k,
          org.apache.spark.sql.types.StringType, stack, depth + 1), lit(false)))
      objCheck("propertyNames", p, lit("propertyNames: key does not match"),
        ErrorKind.PropertyNamesK("*"))
    }
    node.patternProperties.foreach { case (re, ps) =>
      val sub = map_filter(asMap, (k, _) => Formats.patternMatch(k, re))
      val p = forall(map_values(sub),
        x => coalesce(predicate(spec, ps, x, stack, depth + 1), lit(false)))
      add(kw("patternProperties", re),
        vac(v, (t =!= "object") || coalesce(p, lit(false))),
        lit(s"patternProperties: value(s) for keys matching '$re' do not match"),
        ErrorKind.PatternPropertiesK(re))
    }
    node.additionalProperties.foreach { ap =>
      def isKnown(k: Column): Column = RowCompiler.nameCovered(k,
        node.properties.map(_._1), node.patternProperties.map(_._1))
      ap match {
        case Left(true) =>
        case Left(false) =>
          objCheck("additionalProperties", forall(map_keys(asMap), isKnown),
            lit("additionalProperties: unexpected key(s)"),
            ErrorKind.AdditionalPropertiesK)
        case Right(as) =>
          val rem = map_filter(asMap, (k, _) => !isKnown(k))
          val p = forall(map_values(rem),
            x => coalesce(predicate(spec, as, x, stack, depth + 1), lit(false)))
          objCheck("additionalProperties", p,
            lit("additionalProperties: value(s) do not match"),
            ErrorKind.AdditionalPropertiesK)
      }
    }
    // content* keywords over runtime strings (/root/reference/
    // validator.go:468-510): wherever a string instance appears in the
    // dynamic tree, decode via the pluggable registry, then media-type and
    // contentSchema run over the DECODED value; non-string instances are
    // vacuous (the reference only applies content* to strings).
    if (node.contentEncoding.nonEmpty || node.contentMediaType.nonEmpty ||
        node.contentSchema.nonEmpty) {
      val contentValue = b(node.contentEncoding match {
        case Some(enc) =>
          val decode = graft.functions.Content.encoding(enc).getOrElse(
            throw SpecError(kw("contentEncoding"),
              s"unknown encoding '$enc' (registered: ${graft.functions.Content.knownEncodings.mkString(", ")})"))
          decode(vStr)
        case None => vStr
      })
      node.contentEncoding.foreach { enc =>
        add(kw("contentEncoding"),
          vac(v, (t =!= "string") || contentValue.isNotNull),
          lit(s"contentEncoding: value is not valid $enc"),
          ErrorKind.ContentEncodingK(enc))
      }
      // decode failure is already contentEncoding's violation — downstream
      // checks are vacuous on the null decoded value, like the static arm.
      // mediaOk is shared between the contentMediaType check and the
      // contentSchema !parse gate — ONE bound evaluation per row
      lazy val mediaOk: Column = {
        val mt = node.contentMediaType.get
        val parseOk = graft.functions.Content.mediaType(mt).getOrElse(
          throw SpecError(kw("contentMediaType"),
            s"unknown media type '$mt' (registered: ${graft.functions.Content.knownMediaTypes.mkString(", ")})"))
        b(coalesce(parseOk(contentValue), lit(false)))
      }
      node.contentMediaType.foreach { mt =>
        add(kw("contentMediaType"),
          vac(v, (t =!= "string") ||
            when(contentValue.isNull, lit(true)).otherwise(mediaOk)),
          lit(s"contentMediaType: value is not valid $mt"),
          ErrorKind.ContentMediaTypeK(mt))
      }
      // contentSchema recurses DYNAMICALLY: the decoded payload is itself
      // schema-unknown JSON, so it parses to variant and re-enters this
      // compiler (static mode instead derives a struct type — both mirror
      // validator.go:497-510's decode-then-validate). Per 2020-12 (and the
      // reference, Extra-Test-Suite contentSchema.json group 2) it MUST be
      // ignored when contentMediaType is absent.
      node.contentSchema.filter(_ => node.contentMediaType.nonEmpty).foreach { cs =>
        // same Go-decoder dup-key fallback + one-value guard as the
        // top-level parse (the reference decodes content via the same
        // UnmarshalJSON, content.go:47-48)
        val cc = graft.functions.SurrogateCanon.col(contentValue)
        val parsed = b(when(
          (t === "string") && graft.functions.JsonGoLexExpr.col(contentValue),
          coalesce(
            try_parse_json(cc),
            try_parse_json(graft.functions.JsonNormExpr.col(cc)))))
        // content the media type ACCEPTS but that is not JSON must FAIL
        // contentSchema, not validate vacuously (a registered media type
        // need not imply JSON parseability — the reference's
        // decode-then-validate errors there, validator.go:497-510).
        // Content the media type already REJECTED stays that keyword's
        // single violation, and decode failure stays contentEncoding's
        // (null contentValue is vacuous, like every downstream check).
        out += Check(
          (cs.path :+ "!parse").mkString("/"), instPath + "!json",
          vac(v, (t =!= "string") || contentValue.isNull || !mediaOk ||
            parsed.isNotNull),
          lit("!parse: content is not valid JSON"),
          ErrorKind.ParseError)
        out ++= compile(spec, cs, parsed, instPath + "!json", stack, binder, depth + 1)
      }
    }

    node.jsonSchema.foreach { _ =>
      throw SpecError(kw("json"), "'json' is not supported in dynamic (variant) mode")
    }

    // unevaluated* — the SAME static/runtime evaluated-set walkers as the
    // typed compiler (RowCompiler), with branch predicates compiled by THIS
    // dynamic compiler; lowering runs over the bound asMap / arr frames
    def dynBranchPred(ch: SchemaNode): Column =
      coalesce(predicate(spec, ch, v, stack, depth), lit(false))
    node.unevaluatedItems.filter(_ != Left(true)).foreach { ui =>
      def lowerStaticItems(maxPrefix: Int, containsNodes: Vector[SchemaNode]): Unit = {
        def contained(x: Column): Column = containsNodes
          .map(cn => coalesce(predicate(spec, cn, x, stack, depth + 1), lit(false)))
          .reduceOption(_ || _).getOrElse(lit(false))
        lazy val rest = if (maxPrefix == 0) arr
          else slice(arr, lit(maxPrefix + 1), greatest(size(arr) - maxPrefix, lit(0)))
        ui match {
          case Left(true) =>
          case Left(false) if containsNodes.isEmpty =>
            arrCheck("unevaluatedItems", size(arr) <= maxPrefix,
              concat(lit("unevaluatedItems: got "), size(arr).cast(StringType),
                lit(s" item(s), want <= $maxPrefix evaluated")),
              ErrorKind.UnevaluatedItemsK)
          case Left(false) =>
            arrCheck("unevaluatedItems", forall(rest, x => contained(x)),
              lit("unevaluatedItems: item(s) beyond the evaluated prefix " +
                "match no contains schema"),
              ErrorKind.UnevaluatedItemsK)
          case Right(us) =>
            arrCheck("unevaluatedItems",
              forall(rest, x => contained(x) ||
                coalesce(predicate(spec, us, x, stack, depth + 1), lit(false))),
              lit("unevaluatedItems: element(s) do not match"),
              ErrorKind.UnevaluatedItemsK)
        }
      }
      try {
        val (maxPrefix, allEval, containsNodes) =
          RowCompiler.staticEvaluatedItems(spec, node, kw("unevaluatedItems"), stack)
        if (!allEval) lowerStaticItems(maxPrefix, containsNodes)
      } catch { case _: RowCompiler.RuntimeEvalSet =>
        val (contribs0, contains0) = RowCompiler.evaluatedItemsContributions(
          spec, node, kw("unevaluatedItems"), dynBranchPred, _ => lit(false), stack)
        val contribs = contribs0.map(c =>
          if (c._2) c else (b(c._1), c._2, c._3, c._4))
        val containsC = contains0.map(c =>
          if (c._2) c else (b(c._1), c._2, c._3))
        def containedRt(x: Column): Column = containsC.map { case (cond, uncond, cn) =>
          val m = coalesce(predicate(spec, cn, x, stack, depth + 1), lit(false))
          if (uncond) m else cond && m
        }.reduceOption(_ || _).getOrElse(lit(false))
        if (!contribs.exists(c => c._2 && c._4)) {
          val allEvalCond = contribs.filter(_._4).map(_._1)
            .reduceOption(_ || _).getOrElse(lit(false))
          val prefixCol = greatest(
            (lit(0) +: contribs.filter(_._3 > 0).map { c =>
              if (c._2) lit(c._3) else when(c._1, lit(c._3)).otherwise(lit(0))
            }): _*)
          lazy val rest = slice(arr, prefixCol + 1,
            greatest(size(arr) - prefixCol, lit(0)))
          ui match {
            case Left(true) =>
            case Left(false) if containsC.isEmpty =>
              arrCheck("unevaluatedItems",
                coalesce(allEvalCond, lit(false)) || size(arr) <= prefixCol,
                concat(lit("unevaluatedItems: got "), size(arr).cast(StringType),
                  lit(" item(s), more than the evaluated prefix")),
                ErrorKind.UnevaluatedItemsK)
            case Left(false) =>
              arrCheck("unevaluatedItems",
                coalesce(allEvalCond, lit(false)) ||
                  coalesce(forall(rest, x => containedRt(x)), lit(false)),
                lit("unevaluatedItems: item(s) beyond the evaluated prefix " +
                  "match no applicable contains schema"),
                ErrorKind.UnevaluatedItemsK)
            case Right(us) =>
              arrCheck("unevaluatedItems",
                coalesce(allEvalCond, lit(false)) ||
                  coalesce(forall(rest, x => containedRt(x) ||
                    coalesce(predicate(spec, us, x, stack, depth + 1),
                      lit(false))), lit(false)),
                lit("unevaluatedItems: element(s) do not match"),
                ErrorKind.UnevaluatedItemsK)
          }
        }
      }
    }
    node.unevaluatedProperties.filter(_ != Left(true)).foreach { up =>
      def lowerProps(isEval: Column => Column): Unit = up match {
        case Left(true) =>
        case Left(false) =>
          objCheck("unevaluatedProperties",
            forall(map_keys(asMap), k => coalesce(isEval(k), lit(false))),
            lit("unevaluatedProperties: unexpected key(s)"),
            ErrorKind.UnevaluatedPropertiesK)
        case Right(us) =>
          val rem = map_filter(asMap, (k, _) => !coalesce(isEval(k), lit(false)))
          objCheck("unevaluatedProperties",
            forall(map_values(rem), x =>
              coalesce(predicate(spec, us, x, stack, depth + 1), lit(false))),
            lit("unevaluatedProperties: unevaluated value(s) do not match"),
            ErrorKind.UnevaluatedPropertiesK)
      }
      try {
        val (evalKeys, evalPats, allEval) =
          RowCompiler.staticEvaluatedProps(spec, node, kw("unevaluatedProperties"), stack)
        if (!allEval) lowerProps(k => RowCompiler.nameCovered(k, evalKeys, evalPats))
      } catch { case _: RowCompiler.RuntimeEvalSet =>
        val contribs0 = RowCompiler.evaluatedPropsContributions(spec, node,
          kw("unevaluatedProperties"), dynBranchPred,
          k => (t === "object") &&
            propGet(k).isNotNull, stack)
        val contribs = contribs0.map(c =>
          if (c.unconditional) c else c.copy(cond = b(c.cond)))
        if (!contribs.exists(c => c.unconditional && c.allEval))
          lowerProps { k =>
            contribs.map { c =>
              if (c.allEval) c.cond
              else if (c.unconditional) RowCompiler.nameCovered(k, c.keys, c.patterns)
              else c.cond && RowCompiler.nameCovered(k, c.keys, c.patterns)
            }.reduceOption(_ || _).getOrElse(lit(false))
          }
      }
    }

    // composition — same algebra, dynamic predicates
    node.allOf.foreach(ch => out ++= compile(spec, ch, v, instPath, stack, binder, depth))
    if (node.anyOf.nonEmpty) {
      val ps = node.anyOf.map(ch => predicate(spec, ch, v, stack, depth))
      add(kw("anyOf"), vac(v, ps.reduce(_ || _)), lit("anyOf: no subschema matched"),
        ErrorKind.AnyOfK)
    }
    if (node.oneOf.nonEmpty) {
      val cnt = node.oneOf
        .map(ch => when(coalesce(predicate(spec, ch, v, stack, depth), lit(false)), 1).otherwise(0))
        .reduce(_ + _)
      add(kw("oneOf"), vac(v, cnt === 1),
        concat(lit("oneOf: "), cnt.cast(StringType), lit(" matched, want exactly 1")),
        ErrorKind.OneOfK(node.oneOf.size))
    }
    node.not.foreach { ch =>
      add(kw("not"), vac(v, !coalesce(predicate(spec, ch, v, stack, depth), lit(false))),
        lit("not: subschema matched"),
        ErrorKind.NotK)
    }
    node.ifS.foreach { ifn =>
      ifn.boolSchema match {
        // literal-if pruning: the dead branch is never compiled, so an
        // unresolvable $ref inside it is never touched (the reference skips
        // the dead branch the same way — Extra-Test-Suite
        // draft7/if-then-else.json refs 'blah/blah.json' in skipped branches)
        case Some(true) => node.thenS.foreach { tn =>
          out ++= compile(spec, tn, v, instPath, stack, binder, depth)
        }
        case Some(false) => node.elseS.foreach { en =>
          out ++= compile(spec, en, v, instPath, stack, binder, depth)
        }
        case None =>
          // bind: the if-predicate feeds EVERY then/else check — without
          // this the whole if-subschema tree (schema_of_variant traversals
          // included) re-evaluates once per emitted check
          val ifPred = b(coalesce(predicate(spec, ifn, v, stack, depth), lit(false)))
          node.thenS.foreach { tn =>
            compile(spec, tn, v, instPath, stack, binder, depth)
              .foreach(c => out += c.copy(pred = !ifPred || c.pred))
          }
          node.elseS.foreach { en =>
            compile(spec, en, v, instPath, stack, binder, depth)
              .foreach(c => out += c.copy(pred = ifPred || c.pred))
          }
      }
    }

    out.result()
  }

  /** Validate a STRING column holding arbitrary JSON against a schema node,
    * dynamically. Returns the checks to feed [[graft.exec.Validator]]-style
    * plans; malformed JSON fails a synthetic `!parse` check.
    */
  def checksForJsonColumn(spec: Spec, node: SchemaNode, jsonCol: Column,
                          instPath: String,
                          binder: Option[Binder] = None,
                          depth: Int = 0): Seq[Check] = {
    // Go-decoder parity, two halves (loader.go:255-266):
    //  - duplicate object keys: Spark's variant parser rejects them, Go
    //    keeps the LAST value — the Jackson-normalize fallback arm only
    //    evaluates when the native parse returned null (Coalesce
    //    short-circuits), so well-formed JSON never pays it, and anything
    //    Jackson rejects stays a loud !parse failure;
    //  - trailing content: Spark ACCEPTS '{"a":2} x' (parses the prefix),
    //    Go errors "invalid character after top-level value" — the
    //    codegen'd one-pass lexical guard nulls the parse so such rows
    //    fail !parse like any malformed document.
    //  - lone surrogate escapes: Go decodes `"\ud800"` to U+FFFD, Spark's
    //    variant to '?' — the length-preserving textual canon rewrites the
    //    escape to � ahead of BOTH parse arms (the lex guard stays on
    //    the raw text: the rewrite never changes lexical acceptance).
    val jc = graft.functions.SurrogateCanon.col(jsonCol)
    val parsed = when(graft.functions.JsonGoLexExpr.col(jsonCol),
      coalesce(try_parse_json(jc),
        try_parse_json(graft.functions.JsonNormExpr.col(jc))))
    // the parse feeds EVERY check below — bind it so it runs once per row
    val v = binder.map(_.bind(parsed)).getOrElse(parsed)
    val parseCheck = Check(
      (node.path :+ "!parse").mkString("/"), instPath,
      when(jsonCol.isNull, lit(true)).otherwise(v.isNotNull),
      lit("!parse: value is not valid JSON"),
      ErrorKind.ParseError)
    parseCheck +: compile(spec, node, v, instPath, Nil, binder, depth)
  }
}
