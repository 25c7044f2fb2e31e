package graft.spec

import com.fasterxml.jackson.databind.JsonNode

import scala.jdk.CollectionConverters._

/** Typed errors raised while parsing/compiling a constraint spec.
  *
  * Mirrors the reference's typed compile errors
  * (/root/reference/objcompiler.go:529-537, /root/reference/util.go:406-444):
  * every error carries the spec location (a JSON-pointer-ish path) plus a
  * human message, and parsing rejects malformed specs *before* any Spark job
  * runs — the analogue of metaschema validation
  * (/root/reference/roots.go:240-248).
  */
final case class SpecError(path: String, message: String)
    extends RuntimeException(s"spec error at $path: $message")

/** One node of the constraint-spec tree — the engine's logical IR.
  *
  * Keyword set is a "2020-12-like" dialect modeled on the reference's
  * compiled `*Schema` struct (/root/reference/schema.go:11-95): one node with
  * optional keyword slots grouped by applicability, plus draft≤7 COMPAT
  * ALIASES normalized at parse (`dependencies`, tuple-form `items` +
  * `additionalItems`, draft-4 boolean `exclusiveMinimum`/`Maximum`) — the
  * reference supports those drafts natively (schema.go:30-37); we support
  * them by rewriting onto the 2020-12 forms, so validator semantics are
  * identical while keyword paths report the normalized keyword. `$ref`
  * targets any same-document pointer or `$anchor` (compile-time inlined,
  * cycles rejected — see /root/reference/compiler.go:153-214 for the
  * worklist equivalent); `$dynamicRef`/`$recursiveRef` resolve at compile
  * time over the traversal scope chain (see `Refs.resolveDynamic`).
  *
  * Null semantics (documented divergence): SQL NULL is treated as an *absent*
  * value — every keyword is vacuous on NULL and only `required` (column- or
  * object-level) rejects it. The reference distinguishes JSON null from an
  * absent property; a relational engine cannot, so we pick the data-quality
  * reading.
  */
final case class SchemaNode(
    // schema location inside the spec document, for keywordPath reporting
    path: Vector[String] = Vector.empty,
    // RESOLVED absolute URI of the embedded resource this node declares via
    // $id / draft-4 id (None for ordinary nodes) — [[SchemaNode.rebase]]
    // switches the ref-scoping base at resource boundaries with it
    resourceId: Option[String] = None,
    boolSchema: Option[Boolean] = None,
    // type-agnostic (/root/reference/schema.go:23-42)
    types: Option[Set[String]] = None,
    const: Option[JsonNode] = None,
    enumVals: Option[Vector[JsonNode]] = None,
    format: Option[String] = None,
    // parsed under a non-strict (reference-compat) dialect: an UNREGISTERED
    // format is then an ignored annotation at compile, like the reference's
    // nil-Format skip (/root/reference/objcompiler.go:186-200); strict mode
    // keeps the typed unknown-format error
    formatLenient: Boolean = false,
    ref: Option[String] = None,
    // $dynamicRef — resolved at compile time to the outermost $dynamicAnchor
    // on the compile-time scope chain (the statically-resolvable subset of
    // /root/reference/validator.go:779-811); '#name' in the root document,
    // '<url>#name' once rebased into an external document
    dynRef: Option[String] = None,
    // number keywords (/root/reference/schema.go:78-82)
    minimum: Option[BigDecimal] = None,
    maximum: Option[BigDecimal] = None,
    exclusiveMinimum: Option[BigDecimal] = None,
    exclusiveMaximum: Option[BigDecimal] = None,
    multipleOf: Option[BigDecimal] = None,
    // string keywords (/root/reference/schema.go:70-75)
    minLength: Option[Int] = None,
    maxLength: Option[Int] = None,
    pattern: Option[String] = None,
    contentEncoding: Option[String] = None,
    contentMediaType: Option[String] = None,
    contentSchema: Option[SchemaNode] = None,
    // dynamic (variant) validation of a JSON-bearing string column —
    // runtime type dispatch, union types, heterogeneous arrays
    jsonSchema: Option[SchemaNode] = None,
    // array keywords (/root/reference/schema.go:57-67)
    minItems: Option[Int] = None,
    maxItems: Option[Int] = None,
    uniqueItems: Boolean = false,
    items: Option[SchemaNode] = None,
    prefixItems: Vector[SchemaNode] = Vector.empty,
    contains: Option[SchemaNode] = None,
    minContains: Option[Int] = None,
    maxContains: Option[Int] = None,
    // object keywords (/root/reference/schema.go:44-54)
    properties: Vector[(String, SchemaNode)] = Vector.empty,
    requiredProps: Vector[String] = Vector.empty,
    minProperties: Option[Int] = None,
    maxProperties: Option[Int] = None,
    propertyNames: Option[SchemaNode] = None,
    additionalProperties: Option[Either[Boolean, SchemaNode]] = None,
    patternProperties: Vector[(String, SchemaNode)] = Vector.empty,
    dependentRequired: Vector[(String, Vector[String])] = Vector.empty,
    // dependentSchemas (/root/reference/validator.go:307-312): if the key is
    // present, the WHOLE object must match the paired schema
    dependentSchemas: Vector[(String, SchemaNode)] = Vector.empty,
    // unevaluated* (/root/reference/validator.go:633-653) — supported via the
    // STATIC evaluated-set lowering (the allPropsEvaluated precompute,
    // /root/reference/compiler.go:247-259); specs whose evaluated set depends
    // on runtime branches are rejected at compile with a typed SpecError
    unevaluatedProperties: Option[Either[Boolean, SchemaNode]] = None,
    unevaluatedItems: Option[Either[Boolean, SchemaNode]] = None,
    // composition (/root/reference/validator.go:552-631)
    allOf: Vector[SchemaNode] = Vector.empty,
    anyOf: Vector[SchemaNode] = Vector.empty,
    oneOf: Vector[SchemaNode] = Vector.empty,
    not: Option[SchemaNode] = None,
    ifS: Option[SchemaNode] = None,
    thenS: Option[SchemaNode] = None,
    elseS: Option[SchemaNode] = None
)

/** JSON Schema dialect selected by a document's root `$schema` URL — the
  * analogue of the reference's per-resource draft selection
  * (/root/reference/draft.go:138-163, roots.go:103-150). A recognized URL
  * switches on keyword-set strictness: keywords a dialect does not define
  * are typed spec errors instead of silently-honored compat aliases. With
  * no `$schema` (or an unrecognized URL, kept as an annotation) the engine
  * stays lenient: every compat form is accepted, which is the pre-dialect
  * behavior.
  */
final case class Dialect(
    name: String,
    banned: Set[String],
    arrayFormItems: Boolean = true,
    booleanExclusive: Boolean = true,
    numericExclusive: Boolean = true,
    // strict (default): unknown / out-of-dialect keywords are typed spec
    // errors — the engine's lint-grade hardening. strict = false is
    // REFERENCE-COMPAT mode: such keywords are ignored annotations, which is
    // JSON Schema's open-keyword semantics and what the reference does on
    // its own test suite (a draft-4 resource carrying `unevaluatedProperties`
    // simply ignores it, /root/reference/testdata/Extra-Test-Suite/tests/
    // draft2020-12/mixed-dialects.json)
    strict: Boolean = true,
    // keywords disabled by the active meta-schema's `$vocabulary` — ALWAYS
    // ignored regardless of strictness (that is the 2020-12 vocabulary
    // contract, /root/reference/vocab.go + metaschemas/draft/2020-12)
    vocabDisabled: Set[String] = Set.empty,
    // vocabulary NAMES the governing meta-schema lists as REQUIRED (`true`
    // in its `$vocabulary`) — what the reference's dialect.hasVocab consults
    // for the draft≥2019 format-assertion rule (/root/reference/draft.go:
    // 181-211 keeps only true-valued entries, objcompiler.go:432-440)
    requiredVocabs: Set[String] = Set.empty,
    // reference-parity assertion gating (the reference compiler's
    // AssertFormat/AssertContent switches, /root/reference/compiler.go:
    // 47-66). None = engine-native semantics: format/content* are
    // first-class constraints of the spec language, always asserted (the
    // reference's own suite runs with both switches ON, suite_test.go:
    // 54-55). Some(flag) = jv-parity mode: assert per the reference CLI's
    // draft-dependent defaults, with `flag` as the explicit override
    // (cmd/jv/main.go:28-29 --assert-format/--assert-content).
    jvAssertFormat: Option[Boolean] = None,
    jvAssertContent: Option[Boolean] = None,
    // base URI of the ENCLOSING RESOURCE, threaded through the parse: the
    // document's load URL (or absolute root $id) at the root, updated at
    // each nested $id — RELATIVE resource ids resolve against it (RFC 3986,
    // the reference's base-URI resolution, /root/reference/roots.go:103-150)
    baseUri: Option[String] = None,
    // compiler-wide DEFAULT DRAFT for documents that carry no $schema — the
    // reference compiler's DefaultDraft / jv's -d flag
    // (/root/reference/compiler.go:30-36, cmd/jv/main.go:27): resolved
    // per-document in Spec.externalDoc instead of the lenient Default, so a
    // `--draft 7` file-based schema keeps its file:// base (relative $refs
    // resolve) AND gets draft-7 keyword/assertion semantics without the CLI
    // rewriting the document.
    defaultDraftUrl: Option[String] = None) {
  def compat: Dialect = copy(strict = false)

  /** Whether `format` compiles as an ASSERTION under this dialect — the
    * reference's objCompiler.assertFormat (/root/reference/objcompiler.go:
    * 432-440): always for draft<2019 (and engine-native mode); for 2019-09
    * when the meta-schema requires the `format` vocabulary; for 2020-12
    * when it requires `format-assertion`; the jv `--assert-format` flag
    * forces it on. The no-`$schema` default dialect follows the reference
    * CLI's DefaultDraft (latest = 2020-12): annotation-only.
    */
  def assertsFormat: Boolean = jvAssertFormat match {
    case None | Some(true) => true
    case Some(false) =>
      if (name.startsWith("2020-12")) requiredVocabs("format-assertion")
      else if (name.startsWith("2019-09")) requiredVocabs("format")
      else if (name.startsWith("draft-")) true // draft-04/-06/-07
      else false // lenient default ≈ jv DefaultDraft (2020-12)
  }

  /** Whether content* keywords compile as assertions — the reference's
    * AssertContent: NEVER by default in jv mode regardless of draft
    * (/root/reference/compiler.go:57-66), always in engine-native mode.
    */
  def assertsContent: Boolean = jvAssertContent.getOrElse(true)

  /** Id spelling this dialect READS — the reference's draft-dependent getID
    * (/root/reference/draft.go:165-179): draft-4 reads `id` only, draft-6+
    * reads `$id` only; the lenient pre-dialect default accepts both (so a
    * no-`$schema` document keeps the engine's compat behavior).
    */
  def idKeywords: Seq[String] =
    if (name.startsWith("draft-04")) Seq("id")
    else if (name == "default") Seq("$id", "id")
    else Seq("$id")

  /** getID's $ref-sibling void (draft.go:169-171): for draft<2019 a `$ref`
    * next to the id keyword disables the id entirely.
    */
  def refVoidsId: Boolean = name.startsWith("draft-0")

  /** Whether `n` carries a usable identifier under THIS dialect — getID
    * fidelity: the dialect's spelling, a string value, non-empty after
    * stripping any fragment, not voided by a draft<2019 `$ref` sibling.
    */
  def hasIdOn(n: com.fasterxml.jackson.databind.JsonNode): Boolean =
    n.isObject && !(refVoidsId && n.hasNonNull("$ref")) &&
      idKeywords.exists { k =>
        val v = n.get(k)
        v != null && v.isTextual && v.asText().takeWhile(_ != '#').nonEmpty
      }
}

object Dialect {
  private val kw2019 = Set("dependentRequired", "dependentSchemas",
    "unevaluatedProperties", "unevaluatedItems", "$anchor",
    "minContains", "maxContains")
  private val kw2020 = Set("prefixItems", "$dynamicRef", "$dynamicAnchor")
  private val kwRecursive = Set("$recursiveRef", "$recursiveAnchor") // 2019-09 only
  private val kwDraft7 = Set("if", "then", "else")
  private val kwDraft6 = Set("const", "contains", "propertyNames",
    "contentEncoding", "contentMediaType")

  /** Lenient default: all compat forms accepted. */
  val Default: Dialect = Dialect("default", Set.empty)
  val V2020: Dialect = Dialect("2020-12",
    Set("dependencies", "additionalItems", "id") ++ kwRecursive,
    arrayFormItems = false, booleanExclusive = false,
    // the official 2020-12 meta-schema's true-valued $vocabulary entries
    // (format-ASSERTION is absent → format is annotation-only under the
    // reference's default, metaschemas/draft/2020-12/schema:4-13)
    requiredVocabs = Set("core", "applicator", "unevaluated", "validation",
      "meta-data", "format-annotation", "content"))
  val V2019: Dialect = Dialect("2019-09",
    Set("dependencies", "id") ++ kw2020, booleanExclusive = false,
    // official 2019-09 meta-schema: `format` is listed FALSE → not required
    // (metaschemas/draft/2019-09/schema:4-12)
    requiredVocabs = Set("core", "applicator", "validation", "meta-data",
      "content"))
  val Draft7: Dialect = Dialect("draft-07",
    kw2019 ++ kw2020 ++ kwRecursive ++ Set("contentSchema", "id"),
    booleanExclusive = false)
  val Draft6: Dialect = Dialect("draft-06",
    kw2019 ++ kw2020 ++ kwDraft7 ++ kwRecursive ++
      Set("contentSchema", "contentEncoding", "contentMediaType", "id"),
    booleanExclusive = false)
  // draft-4 spells the resource id `id`; `$id` arrived in draft-6
  val Draft4: Dialect = Dialect("draft-04",
    kw2019 ++ kw2020 ++ kwDraft7 ++ kwDraft6 ++ kwRecursive ++
      Set("contentSchema", "$id"),
    numericExclusive = false)

  /** Recognize the five official meta-schema URLs (http/https, optional
    * trailing '#'); anything else → None (caller keeps the lenient default
    * and treats `$schema` as an annotation).
    */
  def fromUrl(url: String): Option[Dialect] =
    url.replaceFirst("^http://", "https://").stripSuffix("#") match {
      case "https://json-schema.org/draft/2020-12/schema" => Some(V2020)
      case "https://json-schema.org/draft/2019-09/schema" => Some(V2019)
      case "https://json-schema.org/draft-07/schema"      => Some(Draft7)
      case "https://json-schema.org/draft-06/schema"      => Some(Draft6)
      case "https://json-schema.org/draft-04/schema"      => Some(Draft4)
      case _                                              => None
    }

  /** 2020-12 / 2019-09 vocabulary URI → the keywords that vocabulary
    * defines. A meta-schema's `$vocabulary` object lists the vocabularies in
    * use; keywords of UNLISTED vocabularies are not keywords under that
    * meta-schema and are ignored (the reference's vocabulary gating,
    * /root/reference/vocab.go, exercised by Extra-Test-Suite
    * vocabulary.json / mixed-dialects.json). Core is never disableable.
    */
  private val applicatorKw = Set("allOf", "anyOf", "oneOf", "not", "if",
    "then", "else", "dependentSchemas", "prefixItems", "items",
    "additionalItems", "contains", "properties", "patternProperties",
    "additionalProperties", "propertyNames", "dependencies")
  private val unevaluatedKw = Set("unevaluatedItems", "unevaluatedProperties")
  private val validationKw = Set("type", "enum", "const", "multipleOf",
    "maximum", "exclusiveMaximum", "minimum", "exclusiveMinimum",
    "maxLength", "minLength", "pattern", "maxItems", "minItems",
    "uniqueItems", "maxContains", "minContains", "maxProperties",
    "minProperties", "required", "dependentRequired")
  private val contentKw = Set("contentEncoding", "contentMediaType",
    "contentSchema")
  private val metaDataKw = Set("title", "description", "default",
    "deprecated", "readOnly", "writeOnly", "examples")

  private def vocabUris(draft: String, name: String, kws: Set[String]) =
    Map(s"https://json-schema.org/draft/$draft/vocab/$name" -> kws)

  private val knownVocabs: Map[String, Set[String]] =
    Seq("2020-12", "2019-09").flatMap { d =>
      vocabUris(d, "core", Set.empty) ++
        vocabUris(d, "applicator",
          // 2019-09 folds unevaluated* into applicator; 2020-12 splits them
          if (d == "2019-09") applicatorKw ++ unevaluatedKw else applicatorKw) ++
        vocabUris(d, "unevaluated", unevaluatedKw) ++
        vocabUris(d, "validation", validationKw) ++
        vocabUris(d, "format", Set("format")) ++
        vocabUris(d, "format-annotation", Set("format")) ++
        vocabUris(d, "format-assertion", Set("format")) ++
        vocabUris(d, "content", contentKw) ++
        vocabUris(d, "meta-data", metaDataKw)
    }.toMap

  private val allVocabKw: Set[String] =
    applicatorKw ++ unevaluatedKw ++ validationKw ++ contentKw ++
      metaDataKw + "format"

  // meta-schema URL → derived dialect, memoized per JVM (meta-schemas are
  // immutable documents; the reference memoizes compiled meta-schemas the
  // same way, /root/reference/roots.go:62-68)
  private val metaCache =
    scala.collection.concurrent.TrieMap.empty[String, Option[Dialect]]

  /** Test hook: loaders are swappable in tests (per-case remote maps), so
    * the memoized meta-schema dialects must be clearable with them.
    */
  def clearMetaCache(): Unit = {
    metaCache.clear()
    SchemaLint.clearCustomMetas()
  }

  // custom vocabulary URI → its vocabulary SCHEMA (the reference's
  // Vocabulary.Schema, /root/reference/vocab.go:19-25 +
  // compiler.RegisterVocabulary): a meta-schema may REQUIRE the URI, and
  // meta-validation (SchemaLint) applies the registered schema as one arm
  // of the composed lint meta (draft.go:275-283)
  private val vocabSchemas =
    scala.collection.concurrent.TrieMap.empty[String, com.fasterxml.jackson.databind.JsonNode]

  /** Register a custom vocabulary's schema (JSON Schema text) so meta-
    * schemas may list its URI as must-understand — the reference's
    * `Vocabulary{URL, Schema}` registration. The schema must be
    * self-contained (its own `$defs`, no external refs).
    */
  def registerVocabularySchema(uri: String, schemaJson: String): Unit =
    vocabSchemas.put(uri.stripSuffix("#"), Spec.readJsonDoc(schemaJson))

  private[graft] def registeredVocabSchema(uri: String) =
    vocabSchemas.get(uri.stripSuffix("#"))

  /** The vocabulary URIs a draft defines — `$vocabulary` entries marked
    * must-understand (`true`) outside this set are typed errors, mirroring
    * the reference's UnsupportedVocabularyError
    * (/root/reference/testdata/invalid_schemas.json UnsupportedVocabulary-*:
    * a 2019-09 vocabulary under a 2020-12 meta-schema is unsupported even
    * though the URI 'exists').
    */
  private def draftVocabs(d: Dialect): Map[String, Set[String]] = d.name match {
    case n if n.startsWith("2020-12") =>
      knownVocabs.view.filterKeys(_.contains("/draft/2020-12/")).toMap
    case n if n.startsWith("2019-09") =>
      knownVocabs.view.filterKeys(_.contains("/draft/2019-09/")).toMap
    case _ => knownVocabs // pre-vocabulary drafts: accept any known URI
  }

  /** Dialect from a CUSTOM meta-schema document fetched through the loader
    * registry, walking the META-SCHEMA CHAIN like the reference's
    * draftFromURL (/root/reference/draft.go:138-163 + roots.go:103-150):
    * an unknown `$schema` URL loads its document and recurses on THAT
    * document's `$schema` until an official draft is found. A chain cycle
    * and a self-declared non-official meta-schema are typed errors
    * (MetaSchemaCycleError / UnsupportedDraftError analogues). Then the
    * document's `$vocabulary` gates keywords: keywords of unlisted
    * vocabularies are disabled (ignored at parse); a must-understand
    * vocabulary outside the draft's vocabulary set is a typed error.
    * Returns None when the URL's scheme has no registered loader or the
    * document fails to load (the `$schema` then stays an annotation, the
    * engine's lenient default).
    */
  def fromMetaSchema(url: String): Option[Dialect] =
    metaCache.getOrElseUpdate(url, metaDialect(url, Nil))

  private def metaDialect(url0: String, visiting: List[String]): Option[Dialect] = {
    val url = url0.stripSuffix("#")
    fromUrl(url).orElse {
      val scheme = url.takeWhile(_ != ':')
      if (scheme.isEmpty || scheme == url || !Spec.knownSchemes.contains(scheme))
        None
      else if (visiting.contains(url))
        throw SpecError(url,
          s"meta-schema cycle: ${(url :: visiting).reverse.mkString(" -> ")}")
      else {
        val loaded =
          try Some(Spec.documentFromUrl(url))
          catch { case _: SpecError => None } // unloadable → stays annotation
        loaded.filter(_.isObject).flatMap { doc =>
          val selfSchema = Option(doc.get("$schema")).filter(_.isTextual)
            .map(_.asText().stripSuffix("#"))
          val base = selfSchema match {
            case Some(s) if s == url =>
              throw SpecError(url,
                "unsupported draft: self-declared meta-schema is not an " +
                  "official dialect")
            case Some(s) =>
              metaDialect(s, url :: visiting).getOrElse(Default)
            case None => Default
          }
          val allowed = draftVocabs(base)
          Option(doc.get("$vocabulary")).filter(_.isObject).map { v =>
            val fields = v.fieldNames().asScala.toVector.map(k => k -> v.get(k))
            fields.foreach { case (uri, req) =>
              if (req.isBoolean && req.asBoolean() && !allowed.contains(uri) &&
                  !uri.contains("/vocab/core") &&
                  registeredVocabSchema(uri).isEmpty)
                throw SpecError(url,
                  s"meta-schema requires unsupported vocabulary '$uri'")
            }
            val enabledKw = fields.map(_._1)
              .flatMap(u => allowed.getOrElse(u, Set.empty[String])).toSet
            // true-valued ("required") vocab NAMES under the base draft's
            // prefix — feeds the format-assertion rule (the reference keeps
            // only reqd==true entries, /root/reference/draft.go:198-211)
            val vocabPrefix =
              if (base.name.startsWith("2020-12")) Some("https://json-schema.org/draft/2020-12/vocab/")
              else if (base.name.startsWith("2019-09")) Some("https://json-schema.org/draft/2019-09/vocab/")
              else None
            val required = vocabPrefix.map { pre =>
              fields.collect {
                case (uri, req) if req.isBoolean && req.asBoolean() &&
                  uri.startsWith(pre) => uri.stripPrefix(pre)
              }.toSet
            }.getOrElse(base.requiredVocabs)
            base.copy(name = s"${base.name}+vocab($url)",
              vocabDisabled = allVocabKw -- enabledKw,
              requiredVocabs = required)
          }.orElse(Some(base))
        }
      }
    }
  }

  /** Resolve a `$schema` URL: one of the five official meta-schemas, or a
    * custom meta-schema reachable through the loader registry (vocabulary
    * gating); None → the URL stays an annotation.
    */
  def resolve(url: String): Option[Dialect] =
    fromUrl(url).orElse(fromMetaSchema(url))

  /** Dialect of a document from its root `$schema`, lenient otherwise. */
  def ofDocument(root: com.fasterxml.jackson.databind.JsonNode): Dialect =
    ofDocument(root, Default)

  /** Same, with an explicit fallback for documents lacking `$schema` — the
    * compiler default-draft hook ([[Dialect.defaultDraftUrl]]).
    */
  def ofDocument(root: com.fasterxml.jackson.databind.JsonNode,
                 fallback: Dialect): Dialect =
    Option(root.get("$schema")).filter(_.isTextual)
      .flatMap(u => resolve(u.asText())).getOrElse(fallback)
}

object SchemaNode {
  /** Reserved dynamic-anchor name that `$recursiveAnchor: true` (2019-09)
    * maps onto — resolution then rides the `$dynamicRef` scope-chain
    * machinery (the two coincide for resource-root anchors).
    */
  val RecursiveAnchorName = "__graft_recursive__"

  val jsonTypes: Set[String] =
    Set("null", "boolean", "integer", "number", "string", "array", "object")

  private val knownKeywords: Set[String] = Set(
    "type", "const", "enum", "format", "$ref",
    "minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum", "multipleOf",
    "minLength", "maxLength", "pattern",
    "contentEncoding", "contentMediaType", "contentSchema", "json",
    "minItems", "maxItems", "uniqueItems", "items", "prefixItems",
    "contains", "minContains", "maxContains",
    "properties", "required", "minProperties", "maxProperties",
    "propertyNames", "additionalProperties", "patternProperties",
    "dependentRequired", "dependentSchemas",
    "unevaluatedProperties", "unevaluatedItems",
    "allOf", "anyOf", "oneOf", "not", "if", "then", "else",
    // draft≤7 COMPAT ALIASES, normalized at parse onto the 2020-12 forms:
    // dependencies → dependentRequired/dependentSchemas; array-form items →
    // prefixItems; additionalItems → items-after-prefix; boolean
    // exclusiveMinimum/Maximum → numeric exclusive bounds (validator
    // semantics identical; keyword paths report the normalized form)
    "dependencies", "additionalItems",
    // annotations — accepted and ignored (reference: schema.go:87-94)
    "title", "description", "$comment", "default", "examples", "deprecated",
    "readOnly", "writeOnly",
    // $anchor names a node for '#name' refs; validated + indexed per
    // document by Spec.collectAnchorsDoc (/root/reference/root.go:78-135);
    // $dynamicAnchor additionally participates in dynamic-scope resolution
    "$anchor", "$dynamicAnchor", "$dynamicRef",
    // 2019-09 recursive-ref family, normalized onto the dynamic machinery:
    // `$recursiveAnchor: true` at a DOCUMENT ROOT indexes as the reserved
    // dynamic anchor name below; `$recursiveRef: "#"` parses as a
    // $dynamicRef to it (resolution semantics coincide for root anchors:
    // outermost declaring resource on the scope chain wins)
    "$recursiveAnchor", "$recursiveRef",
    // $schema: dialect annotation, honored at DOCUMENT roots
    // (Dialect.ofDocument) and at EMBEDDED-RESOURCE roots (a node carrying
    // $id / draft-4 id switches dialect for its subtree — the reference's
    // per-resource draft selection, /root/reference/roots.go:103-150)
    "$schema",
    // $id / draft-4 id: an ABSOLUTE URI names this node as an embedded
    // resource, indexed doc-wide so `$ref: "<that-uri>"` resolves to it
    // (/root/reference/root.go:33-76). A RELATIVE $id is rejected: it would
    // demand base-URI rebasing of every inner ref, which this engine does
    // not do (documents are addressed by their loader URL).
    "$id", "id",
    // $vocabulary: meaningful only in meta-schema documents (read by
    // Dialect.fromMetaSchema); accepted as an annotation elsewhere
    "$vocabulary",
    // $defs / draft≤7 definitions: navigation-only schema containers
    // (2020-12 allows them in any schema; refs address entries by raw JSON
    // pointer) — entries are walked for anchors + meta-validation, not
    // parsed into the node
    "$defs", "definitions"
  )

  /** Parse one schema node. Rejects unknown keywords and ill-typed keyword
    * values with typed SpecErrors — this *is* our metaschema validation
    * (mirrors /root/reference/roots.go:53-56).
    */
  def parse(n0: JsonNode, path: Vector[String],
            dialect0: Dialect = Dialect.Default): SchemaNode = {
    val at = if (path.isEmpty) "#" else "#/" + path.mkString("/")
    if (n0.isBoolean) return SchemaNode(path = path, boolSchema = Some(n0.asBoolean()))
    if (!n0.isObject) throw SpecError(at, s"schema must be object or boolean, got ${n0.getNodeType}")

    // per-resource dialect: a node that IS a resource root (document root,
    // or a node carrying the DECLARED draft's id spelling — the reference's
    // nested-$schema rule, /root/reference/roots.go:107-113) may switch
    // dialect via its own $schema; a nested $schema without that id is an
    // ignored annotation. Strictness is inherited: compat mode stays compat
    // across resource boundaries.
    val dialectPre: Dialect = {
      val declared = Option(n0.get("$schema")).filter(_.isTextual)
        .flatMap(u => Dialect.resolve(u.asText()))
      (if (path.isEmpty) declared else declared.filter(_.hasIdOn(n0)))
        // strictness AND the jv assertion switches are COMPILE-level, not
        // per-resource: they ride across resource/dialect boundaries (the
        // reference's c.assertFormat is a compiler field consulted per
        // resource-draft, objcompiler.go:432-440)
        .map(_.copy(strict = dialect0.strict, baseUri = dialect0.baseUri,
          jvAssertFormat = dialect0.jvAssertFormat,
          jvAssertContent = dialect0.jvAssertContent,
          defaultDraftUrl = dialect0.defaultDraftUrl))
        .getOrElse(dialect0)
    }

    // vocabulary-disabled keywords are ALWAYS ignored; in compat
    // (non-strict) mode, unknown and out-of-dialect keywords are too —
    // pruned from a copy so the rest of the parse never sees them (their
    // values need not even be well-formed: `allOf: 1` under a no-applicator
    // meta-schema is an ignored annotation, Extra-Test-Suite vocabulary.json)
    val drop = n0.fieldNames().asScala.filter { k =>
      dialectPre.vocabDisabled.contains(k) ||
        (!dialectPre.strict &&
          (!knownKeywords.contains(k) || dialectPre.banned.contains(k))) ||
        // jv-parity assertion gating: format / content* become ignored
        // ANNOTATIONS when the dialect does not assert them (the reference
        // skips compiling them, objcompiler.go:186,239,305)
        (k == "format" && !dialectPre.assertsFormat) ||
        ((k == "contentEncoding" || k == "contentMediaType" ||
          k == "contentSchema") && !dialectPre.assertsContent)
    }.toSet
    val n: JsonNode =
      if (drop.isEmpty) n0
      else {
        val c = n0.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
        drop.foreach(c.remove)
        c
      }

    // $id / draft-4 id: an ABSOLUTE URI names an embedded resource and
    // becomes the base for its subtree; a RELATIVE URI-reference resolves
    // against the enclosing base — the document's load URL or the nearest
    // enclosing resource id (RFC 3986 reference resolution, the reference's
    // per-resource base-URI behavior, /root/reference/roots.go:103-150).
    // With no resolvable base (in-memory document, opaque base like urn:,
    // or a '../' path escaping it) the spec is typed-rejected.
    val resolvedBase: Option[String] = {
      var base = dialectPre.baseUri
      // only the governing draft's id spelling rebases (getID,
      // draft.go:165-179); a draft<2019 $ref sibling voids the id entirely
      val idKws =
        if (dialectPre.refVoidsId && n.hasNonNull("$ref")) Seq.empty[String]
        else dialectPre.idKeywords
      idKws.foreach { ik =>
        Option(n.get(ik)).foreach { v =>
          val abs: Option[String] =
            if (!v.isTextual) None
            else {
              val u = v.asText()
              if (u.matches("^[A-Za-z][A-Za-z0-9+.-]*:\\S*$"))
                Some(u.stripSuffix("#"))
              else if (u.isEmpty || u.exists(_.isWhitespace) || u.startsWith("#"))
                None // empty / fragment-only / malformed ids never rebase
              else base.flatMap(b => Spec.tryResolveUrl(b, u))
                .map(_.stripSuffix("#"))
            }
          abs match {
            case Some(a) => base = Some(a)
            case None => throw SpecError(s"$at/$ik",
              s"expected an absolute URI or a relative reference resolvable " +
                s"against the enclosing base (document load URL or enclosing " +
                s"resource id; ${base.fold("this document has none")(b => s"base here: '$b'")}), got $v")
          }
        }
      }
      base
    }
    val dialect: Dialect =
      if (resolvedBase == dialectPre.baseUri) dialectPre
      else dialectPre.copy(baseUri = resolvedBase)

    n.fieldNames().asScala.foreach { k =>
      if (!knownKeywords.contains(k)) throw SpecError(at, s"unknown keyword '$k'")
      // $schema-driven dialect strictness (draft.go:138-163 analogue):
      // keywords outside the declared dialect are typed errors, not aliases
      if (dialect.banned.contains(k))
        throw SpecError(at, s"keyword '$k' is not defined in dialect ${dialect.name}")
    }
    // navigation-only / anchor keywords: shape-checked here, handled at the
    // Spec level (anchor collection, pointer navigation)
    Seq("$defs", "definitions").foreach { dk =>
      Option(n.get(dk)).foreach { d =>
        if (!d.isObject) throw SpecError(s"$at/$dk", "expected object")
      }
    }
    Option(n.get("$vocabulary")).foreach { v =>
      if (!v.isObject) throw SpecError(s"$at/$$vocabulary", s"expected object, got $v")
    }
    Option(n.get("$dynamicAnchor")).foreach { a =>
      if (!a.isTextual) throw SpecError(s"$at/$$dynamicAnchor", s"expected string, got $a")
    }
    Option(n.get("$recursiveAnchor")).foreach { a =>
      if (!a.isBoolean) throw SpecError(s"$at/$$recursiveAnchor", s"expected boolean, got $a")
    }
    Option(n.get("$recursiveRef")).foreach { r =>
      if (!r.isTextual || r.asText() != "#")
        throw SpecError(s"$at/$$recursiveRef",
          s"only '#' is supported (2019-09 resource-root recursion), got $r")
    }
    // annotation shape checks, ALIGNED with the meta-spec gate so the two
    // layers agree on what is a valid spec (a spec must not load with
    // --no-metaspec but fail the default gate): annotations are ignored for
    // validation but must still be well-typed
    Seq("title", "description", "$comment").foreach { k =>
      Option(n.get(k)).foreach { v =>
        if (!v.isTextual) throw SpecError(s"$at/$k", s"expected string, got $v")
      }
    }
    Seq("deprecated", "readOnly", "writeOnly").foreach { k =>
      Option(n.get(k)).foreach { v =>
        if (!v.isBoolean) throw SpecError(s"$at/$k", s"expected boolean, got $v")
      }
    }
    Option(n.get("examples")).foreach { v =>
      if (!v.isArray) throw SpecError(s"$at/examples", s"expected array, got $v")
    }

    def opt(k: String): Option[JsonNode] = Option(n.get(k))
    def optInt(k: String): Option[Int] = opt(k).map { v =>
      // a zero-fraction number IS an integer (2.0 ≡ 2): the official
      // metas' `type: integer` semantics and the reference's big.Rat
      // IsInt read (objcompiler.go:495-501) — the meta-gate and the typed
      // parser must agree on these documents
      val i =
        try { if (!v.isNumber) throw new ArithmeticException
              v.decimalValue().intValueExact() }
        catch { case _: ArithmeticException =>
          throw SpecError(s"$at/$k", s"expected non-negative integer, got $v") }
      if (i < 0) throw SpecError(s"$at/$k", s"expected non-negative integer, got $i")
      i
    }
    def optNum(k: String): Option[BigDecimal] = opt(k).map { v =>
      if (!v.isNumber) throw SpecError(s"$at/$k", s"expected number, got $v")
      BigDecimal(v.decimalValue())
    }
    def optStr(k: String): Option[String] = opt(k).map { v =>
      if (!v.isTextual) throw SpecError(s"$at/$k", s"expected string, got $v")
      v.asText()
    }
    def optSchema(k: String): Option[SchemaNode] =
      opt(k).map(v => parse(v, path :+ k, dialect))
    def schemaArray(k: String): Vector[SchemaNode] = opt(k) match {
      case None => Vector.empty
      case Some(v) =>
        if (!v.isArray || v.size() == 0)
          throw SpecError(s"$at/$k", "expected non-empty array of schemas")
        v.asScala.zipWithIndex.map { case (c, i) => parse(c, path :+ k :+ i.toString, dialect) }.toVector
    }

    val types = opt("type").map { t =>
      val names =
        if (t.isTextual) Vector(t.asText())
        else if (t.isArray) t.asScala.map { e =>
          if (!e.isTextual) throw SpecError(s"$at/type", s"expected string, got $e")
          e.asText()
        }.toVector
        else throw SpecError(s"$at/type", s"expected string or array, got $t")
      names.foreach { nm =>
        if (!jsonTypes.contains(nm)) throw SpecError(s"$at/type", s"unknown type '$nm'")
      }
      names.toSet
    }

    val enumVals = opt("enum").map { e =>
      // an EMPTY enum is legal (matches nothing): the 2020-12 meta allows
      // it ({"type": "array", "items": true}) and the reference compiles
      // it (objcompiler.go:147 newEnum); only draft-4's meta requires
      // minItems 1 — an arity rule the META-GATE enforces per draft, not
      // the typed parser
      if (!e.isArray) throw SpecError(s"$at/enum", "expected array")
      e.asScala.toVector
    }

    val pat = optStr("pattern")
    pat.foreach { p =>
      // compile once at spec time VIA THE ACTIVE ENGINE, mirroring regex
      // precompilation at /root/reference/objcompiler.go:117-126 (the
      // UseRegexpEngine hook governs validation and matching consistently)
      graft.functions.Formats.checkSpecRegex(p).foreach { msg =>
        throw SpecError(s"$at/pattern", s"invalid regex: $msg")
      }
    }

    val props = opt("properties").map { p =>
      if (!p.isObject) throw SpecError(s"$at/properties", "expected object")
      p.fieldNames().asScala.toVector.map { k =>
        k -> parse(p.get(k), path :+ "properties" :+ k, dialect)
      }
    }.getOrElse(Vector.empty)

    val patProps = opt("patternProperties").map { p =>
      if (!p.isObject) throw SpecError(s"$at/patternProperties", "expected object")
      p.fieldNames().asScala.toVector.map { k =>
        graft.functions.Formats.checkSpecRegex(k).foreach { msg =>
          throw SpecError(s"$at/patternProperties", s"invalid regex '$k': $msg")
        }
        k -> parse(p.get(k), path :+ "patternProperties" :+ k, dialect)
      }
    }.getOrElse(Vector.empty)

    val requiredProps = opt("required").map { r =>
      if (!r.isArray) throw SpecError(s"$at/required", "expected array of strings")
      r.asScala.map { e =>
        if (!e.isTextual) throw SpecError(s"$at/required", s"expected string, got $e")
        e.asText()
      }.toVector
    }.getOrElse(Vector.empty)

    val depReq = opt("dependentRequired").map { d =>
      if (!d.isObject) throw SpecError(s"$at/dependentRequired", "expected object")
      d.fieldNames().asScala.toVector.map { k =>
        val arr = d.get(k)
        if (!arr.isArray) throw SpecError(s"$at/dependentRequired/$k", "expected array")
        k -> arr.asScala.map(_.asText()).toVector
      }
    }.getOrElse(Vector.empty)

    val depSchemas = opt("dependentSchemas").map { d =>
      if (!d.isObject) throw SpecError(s"$at/dependentSchemas", "expected object")
      d.fieldNames().asScala.toVector.map { k =>
        k -> parse(d.get(k), path :+ "dependentSchemas" :+ k, dialect)
      }
    }.getOrElse(Vector.empty)

    // draft≤7 `dependencies`: array entry = dependentRequired, schema entry =
    // dependentSchemas (the 2020-12 split was exactly this normalization)
    val (depsReqCompat, depsSchemaCompat) = opt("dependencies").map { d =>
      if (!d.isObject) throw SpecError(s"$at/dependencies", "expected object")
      val reqs = Vector.newBuilder[(String, Vector[String])]
      val schemas = Vector.newBuilder[(String, SchemaNode)]
      d.fieldNames().asScala.foreach { k =>
        val v = d.get(k)
        if (v.isArray) reqs += (k -> v.asScala.map { e =>
          if (!e.isTextual)
            throw SpecError(s"$at/dependencies/$k", s"expected string, got $e")
          e.asText()
        }.toVector)
        else schemas += (k -> parse(v, path :+ "dependencies" :+ k, dialect))
      }
      (reqs.result(), schemas.result())
    }.getOrElse((Vector.empty, Vector.empty))

    // draft≤2019 tuple form: items as an ARRAY = prefixItems, and
    // additionalItems = items-after-prefix (false → boolean false schema).
    // Per draft semantics additionalItems is IGNORED without array-form
    // items (it "applies only when items is an array of schemas").
    val itemsRaw = opt("items")
    val itemsIsArray = itemsRaw.exists(_.isArray)
    if (itemsIsArray && !dialect.arrayFormItems)
      throw SpecError(s"$at/items",
        s"array-form items is not defined in dialect ${dialect.name} (use prefixItems)")
    if (itemsIsArray && opt("prefixItems").nonEmpty)
      throw SpecError(s"$at/items",
        "array-form items (draft<=2019 tuple syntax) cannot combine with prefixItems")
    val prefixCompat: Vector[SchemaNode] =
      if (itemsIsArray) {
        val arr = itemsRaw.get
        if (arr.size() == 0)
          throw SpecError(s"$at/items", "expected non-empty array of schemas")
        arr.asScala.zipWithIndex.map { case (c, i) =>
          parse(c, path :+ "items" :+ i.toString, dialect)
        }.toVector
      } else schemaArray("prefixItems")
    val itemsCompat: Option[SchemaNode] =
      if (itemsIsArray)
        opt("additionalItems").map { a =>
          if (a.isBoolean) SchemaNode(path = path :+ "additionalItems",
            boolSchema = Some(a.asBoolean()))
          else parse(a, path :+ "additionalItems", dialect)
        }
      else optSchema("items")

    // draft-4 boolean exclusiveMinimum/Maximum: a modifier on minimum/maximum
    def exclusiveBound(kw: String, base: Option[BigDecimal])
        : (Option[BigDecimal], Boolean) = opt(kw) match {
      case None => (None, false)
      case Some(v) if v.isNumber =>
        if (!dialect.numericExclusive)
          throw SpecError(s"$at/$kw",
            s"numeric $kw is not defined in dialect ${dialect.name} (draft-4 uses the boolean modifier)")
        (Some(BigDecimal(v.decimalValue())), false)
      case Some(v) if v.isBoolean =>
        if (!dialect.booleanExclusive)
          throw SpecError(s"$at/$kw",
            s"boolean $kw is not defined in dialect ${dialect.name} (draft-4 form)")
        if (!v.asBoolean()) (None, false)
        else base match {
          case Some(b) => (Some(b), true) // consumes the base bound
          case None => throw SpecError(s"$at/$kw",
            s"draft-4 boolean $kw requires ${kw.stripPrefix("exclusive").toLowerCase}")
        }
      case Some(v) =>
        throw SpecError(s"$at/$kw", s"expected number (or draft-4 boolean), got $v")
    }
    val minBase = optNum("minimum")
    val maxBase = optNum("maximum")
    val (exclMin, minConsumed) = exclusiveBound("exclusiveMinimum", minBase)
    val (exclMax, maxConsumed) = exclusiveBound("exclusiveMaximum", maxBase)

    val addProps = opt("additionalProperties").map { a =>
      if (a.isBoolean) Left(a.asBoolean())
      else Right(parse(a, path :+ "additionalProperties", dialect))
    }

    def optBoolOrSchema(k: String): Option[Either[Boolean, SchemaNode]] =
      opt(k).map { a =>
        if (a.isBoolean) Left(a.asBoolean()) else Right(parse(a, path :+ k, dialect))
      }

    SchemaNode(
      path = path,
      resourceId =
        if (n.hasNonNull("$id") || n.hasNonNull("id")) resolvedBase else None,
      types = types,
      const = opt("const"),
      enumVals = enumVals,
      format = optStr("format"),
      formatLenient = !dialectPre.strict,
      ref = optStr("$ref"),
      dynRef = optStr("$dynamicRef").orElse(
        // $recursiveRef: "#" == $dynamicRef to the reserved root anchor
        opt("$recursiveRef").map(_ => "#" + RecursiveAnchorName)),
      minimum = if (minConsumed) None else minBase,
      maximum = if (maxConsumed) None else maxBase,
      exclusiveMinimum = exclMin,
      exclusiveMaximum = exclMax,
      multipleOf = optNum("multipleOf").map { m =>
        if (m <= 0) throw SpecError(s"$at/multipleOf", "must be > 0"); m
      },
      minLength = optInt("minLength"),
      maxLength = optInt("maxLength"),
      pattern = pat,
      // encoding/media-type names resolve against the Content registry at
      // COMPILE time (a custom decoder may be registered after parse)
      contentEncoding = optStr("contentEncoding"),
      contentMediaType = optStr("contentMediaType"),
      contentSchema = optSchema("contentSchema"),
      jsonSchema = optSchema("json"),
      minItems = optInt("minItems"),
      maxItems = optInt("maxItems"),
      uniqueItems = opt("uniqueItems").exists { v =>
        // strict boolean, aligned with the meta-spec gate (no silent coercion)
        if (!v.isBoolean) throw SpecError(s"$at/uniqueItems", s"expected boolean, got $v")
        v.asBoolean()
      },
      items = itemsCompat,
      prefixItems = prefixCompat,
      contains = optSchema("contains"),
      minContains = optInt("minContains"),
      maxContains = optInt("maxContains"),
      properties = props,
      requiredProps = requiredProps,
      minProperties = optInt("minProperties"),
      maxProperties = optInt("maxProperties"),
      propertyNames = optSchema("propertyNames"),
      additionalProperties = addProps,
      patternProperties = patProps,
      dependentRequired = depReq ++ depsReqCompat,
      dependentSchemas = depSchemas ++ depsSchemaCompat,
      unevaluatedProperties = optBoolOrSchema("unevaluatedProperties"),
      unevaluatedItems = optBoolOrSchema("unevaluatedItems"),
      allOf = schemaArray("allOf"),
      anyOf = schemaArray("anyOf"),
      oneOf = schemaArray("oneOf"),
      not = optSchema("not"),
      ifS = optSchema("if"),
      thenS = optSchema("then"),
      elseS = optSchema("else")
    )
  }

  /** Rebase every relative reference (`#...`) of a node parsed from an
    * EXTERNAL document onto that document's URL, recursively — so a `#/...`
    * ref inside `file://common.json` keeps resolving against common.json
    * after the node is inlined into the root compile (the single-pass
    * analogue of the reference's per-resource base-URI resolution,
    * /root/reference/roots.go:103-150). Absolute refs pass through.
    */
  def rebase(n: SchemaNode, url: String): SchemaNode =
    rebaseIn(n, url, url)

  /** Rebase with an explicit starting REF base: refs of an embedded-resource
    * subtree scope to the resource's URI (2020-12 bundling semantics —
    * `#/x` / `#anchor` / `sibling.json` inside a resource address INTO that
    * resource's scope, not the host document's), while `$dynamicRef` stays
    * DOCUMENT-scoped (the engine's dynamic-scope chain is
    * document-granular; see [[graft.compile.Refs.resolveDynamic]]).
    */
  private[graft] def rebaseEmbedded(n: SchemaNode, docUrl: String,
                                    resourceUri: String): SchemaNode =
    rebaseIn(n, docUrl, resourceUri)

  private def rebaseIn(n0: SchemaNode, docUrl: String,
                       base0: String): SchemaNode = {
    // a node that itself declares a resource id switches the ref base for
    // its subtree (nested resource-in-resource scoping)
    val n = n0
    val base = n.resourceId.getOrElse(base0)
    // '#...' refs anchor to the enclosing RESOURCE (= the document when no
    // embedded resource intervenes); RELATIVE URL refs (sibling.json,
    // ../common.json#/x) join against that base per RFC 3986 — real-world
    // schema sets split across files use these constantly.
    // When the join cannot work (opaque base, path escape) the ref is left
    // as-is: resolution stays LAZY, so a dead if-branch's broken ref never
    // fails eagerly (Extra-Test-Suite draft7/if-then-else.json).
    def rb(s: Option[String]): Option[String] =
      s.map { r =>
        if (r.startsWith("#")) base + r
        else Spec.tryResolveUrl(base, r).getOrElse(r)
      }
    // $dynamicRef: document-granular (empty docUrl = root spec document —
    // leave '#name' fragments addressed to the root dynamic scope)
    def rbDyn(s: Option[String]): Option[String] =
      s.map { r =>
        if (r.startsWith("#")) docUrl + r
        else if (docUrl.isEmpty) r
        else Spec.tryResolveUrl(docUrl, r).getOrElse(r)
      }
    def rs(x: SchemaNode): SchemaNode = rebaseIn(x, docUrl, base)
    def re(e: Either[Boolean, SchemaNode]): Either[Boolean, SchemaNode] = e.map(rs)
    n.copy(
      ref = rb(n.ref),
      dynRef = rbDyn(n.dynRef),
      contentSchema = n.contentSchema.map(rs),
      jsonSchema = n.jsonSchema.map(rs),
      items = n.items.map(rs),
      prefixItems = n.prefixItems.map(rs),
      contains = n.contains.map(rs),
      properties = n.properties.map { case (k, s) => (k, rs(s)) },
      propertyNames = n.propertyNames.map(rs),
      additionalProperties = n.additionalProperties.map(re),
      patternProperties = n.patternProperties.map { case (k, s) => (k, rs(s)) },
      dependentSchemas = n.dependentSchemas.map { case (k, s) => (k, rs(s)) },
      unevaluatedProperties = n.unevaluatedProperties.map(re),
      unevaluatedItems = n.unevaluatedItems.map(re),
      allOf = n.allOf.map(rs),
      anyOf = n.anyOf.map(rs),
      oneOf = n.oneOf.map(rs),
      not = n.not.map(rs),
      ifS = n.ifS.map(rs),
      thenS = n.thenS.map(rs),
      elseS = n.elseS.map(rs))
  }
}
