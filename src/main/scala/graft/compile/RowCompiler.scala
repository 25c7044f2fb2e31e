package graft.compile

import com.fasterxml.jackson.databind.JsonNode
import graft.functions.{ExactRatPredExpr, Formats}
import graft.spec.{SchemaNode, Spec, SpecError}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** One compiled row-level check: a boolean predicate (TRUE = pass) plus the
  * three coordinates every violation row carries, mirroring the reference's
  * `ValidationError{SchemaURL, InstanceLocation, ErrorKind}`
  * (/root/reference/validator.go:958-976):
  *   - keywordPath  — where in the spec the failed keyword lives
  *     (scope-chain keyword location, /root/reference/validator.go:896-909)
  *   - instancePath — where in the row the offending value lives
  *     (vloc, /root/reference/validator.go:54-55)
  *   - detail       — rendered failure message (kind/kind.go analogue)
  *
  * `pred`/`detail` are pure Catalyst `Column` trees over the input row — the
  * whole check set fuses into a single WholeStageCodegen pass.
  */
final case class Check(
    keywordPath: String,
    instancePath: String,
    pred: Column,
    detail: Column,
    // typed, statically-known keyword parameters — the reference's
    // ErrorKind (/root/reference/kind/kind.go); see [[ErrorKind]]
    kind: ErrorKind
)

/** Collects expensive subexpressions (JSON parses) that many checks share,
  * so the executor computes them ONCE per row instead of once per check.
  *
  * Catalyst's codegen-level subexpression elimination does not reach inside
  * conditional branches / higher-order-function lambdas, so without this a
  * 6-check dynamic-JSON suite parses the same string 6× per row (measured
  * 5.4× wall-time blowup at sf0.1). The binder turns each parse into a named
  * projection that [[graft.exec.Validator]] materializes in a child Project
  * before the check pass and drops afterwards; CollapseProject will not
  * re-inline it because the alias is non-cheap and multiply-referenced.
  *
  * Bindings may reference earlier bindings (applied in insertion order).
  * NEVER call [[bind]] from inside a lambda (forall/filter/transform) — the
  * bound column cannot see lambda variables; lambda-scoped probes go through
  * `predicate`, which never binds.
  */
final class Binder {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Column)]
  // memoized by expression tree: recursive compiles over the SAME value
  // ($ref/allOf/dependentSchemas re-entry) bind the type dispatch and typed
  // extractions once, not once per visiting node
  private val memo = scala.collection.mutable.HashMap
    .empty[org.apache.spark.sql.catalyst.expressions.Expression, Column]
  def bind(c: Column): Column =
    memo.getOrElseUpdate(org.apache.spark.sql.GraftColumnBridge.expression(c), {
      val name = s"__graft_bind_${buf.size}"
      buf += name -> c
      col(name)
    })
  def bindings: Seq[(String, Column)] = buf.toSeq
}

/** Engine-wide compile limits. */
object CompileLimits {
  /** Max times one `$ref`/`$dynamicRef` may inline along a single compile
    * path WITH data descent in between (recursive schemas). Beyond it the
    * compiler emits a typed cut check: any value present deeper than the
    * unrolled depth fails with [[ErrorKind.DepthExceeded]] — the
    * compile-time-inlining analogue of the reference's runtime
    * infinite-loop guard (/root/reference/validator.go:84-90), made sound
    * for bounded data instead of rejected outright. Refs that repeat with
    * NO data descent (a→a, a→b→a at the same instance position) stay
    * compile-time cycles and are rejected.
    */
  @volatile var maxRefUnroll: Int = 4

  /** Ceiling on the CORPUS-DERIVED unroll chosen by
    * [[SuiteCompiler.compileAdaptive]]: a depth-10^4 adversarial document
    * must produce a typed error (the [[maxCompileNodes]] budget or the
    * DepthExceeded cut), not a hung linear-growth compile. Real training
    * corpora sit far below this.
    */
  @volatile var maxAdaptiveUnroll: Int = 256

  // per-thread unroll override for depth-adaptive compiles — scoped with
  // [[withUnroll]], never a global mutation (concurrent compiles with
  // different corpora must not race)
  private val unrollOverride = new ThreadLocal[Int] {
    override def initialValue(): Int = 0
  }
  private[compile] def effectiveUnroll: Int = {
    val o = unrollOverride.get()
    if (o > 0) o else maxRefUnroll
  }
  private[graft] def withUnroll[T](n: Int)(f: => T): T = {
    unrollOverride.set(n)
    try f finally unrollOverride.set(0)
  }

  /** Ceiling on schema-node expansions per suite compile. Recursion unroll
    * multiplies: a schema where every one of K subschema positions re-enters
    * the root (the official 2020-12 meta-schema: K≈40) expands K^maxRefUnroll
    * nodes — millions, and the compile would effectively hang. The budget
    * turns that into a fast TYPED error (the compile-time analogue of the
    * reference's runtime infinite-loop guard, /root/reference/validator.go:
    * 84-90). Generous for real specs: the whole conformance corpus plus the
    * clip suites compile under a few thousand expansions each.
    */
  @volatile var maxCompileNodes: Int = 20000

  private val visits = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = Array(0)
  }
  private[compile] def resetVisits(): Unit = visits.get()(0) = 0
  private[compile] def tickVisit(at: => String): Unit = {
    val c = visits.get(); c(0) += 1
    if (c(0) > maxCompileNodes)
      throw graft.spec.SpecError(at,
        s"compile exceeds $maxCompileNodes schema-node expansions — " +
          s"recursive unroll (maxRefUnroll=$maxRefUnroll) over a highly " +
          "self-referential schema explodes combinatorially; lower " +
          "CompileLimits.maxRefUnroll, restructure the schema, or use the " +
          "flat meta-validation path for schema-document linting")
  }
}

/** `$ref`/`$dynamicRef` stack bookkeeping shared by the static and dynamic
  * compilers. The compile stack holds (refKey, dataDepth) pairs: the depth
  * distinguishes a true cycle (same ref, same instance position) from
  * recursive DESCENT (same ref, deeper data), which is unrolled up to
  * [[CompileLimits.maxRefUnroll]].
  */
private[compile] object Refs {
  import graft.spec.{SchemaNode, Spec, SpecError}

  /** The document a stack entry entered (None = same-document ref). */
  private def docOf(key: String): Option[String] = {
    val r = if (key.startsWith("$dynamic:")) key.stripPrefix("$dynamic:") else key
    val i = r.indexOf('#')
    if (i > 0) Some(r.take(i))
    else if (i < 0 && r.indexOf(':') > 0) Some(r) // bare-URL ref: document root
    else None
  }

  /** Resolve a `$dynamicRef` against the compile-time scope chain — the
    * outermost `$dynamicAnchor` with the fragment's name among the documents
    * entered on this compile path (root document first, then cross-document
    * refs in traversal order), per 2020-12 dynamic-scope semantics
    * (/root/reference/validator.go:779-811). If the initial target is not a
    * dynamic anchor, plain `$ref` semantics apply. Returns (target node,
    * stack key). Unresolvable names raise a typed [[SpecError]] naming the
    * anchor.
    */
  def resolveDynamic(spec: Spec, r: String, stack: List[(String, Int)],
                     at: String): (SchemaNode, String) = {
    val h = r.indexOf('#')
    if (h < 0)
      throw SpecError(at, s"$$dynamicRef must carry a '#name' fragment, got '$r'")
    val home = r.substring(0, h)
    val name = r.substring(h + 1)
    if (name.isEmpty || name.startsWith("/")) {
      // a JSON-pointer (or empty) fragment can never match a $dynamicAnchor,
      // so the $dynamicRef behaves exactly like $ref (2020-12 §8.2.3.2)
      val staticRef =
        if (home.isEmpty) { if (name.isEmpty) "#" else "#" + name } else r
      return (spec.resolve(staticRef, Nil), staticRef)
    }
    if (spec.dynAnchorsOf(home).contains(name)) {
      // stack keys may carry EMBEDDED-RESOURCE URIs (resource-scoped refs);
      // the dynamic-scope chain is document-granular, so map each to its
      // home document instead of routing it through the loader
      val docs = stack.reverse.iterator.map(_._1).flatMap(docOf)
        .map(spec.homeDocOf).toList
      val chain = ("" :: docs) :+ home
      val chosen = chain.find(d => spec.dynAnchorsOf(d).contains(name)).get
      (spec.dynAnchorTarget(chosen, name), s"$$dynamic:$chosen#$name")
    } else if (name == graft.spec.SchemaNode.RecursiveAnchorName) {
      // $recursiveRef: "#" with NO $recursiveAnchor declared in its resource:
      // 2019-09 §8.2.4.2 degrades it to a plain $ref to the resource root
      val staticRef = if (home.isEmpty) "#" else home
      (spec.resolve(staticRef, Nil), staticRef)
    } else {
      // initially-resolved target is a plain $anchor (or absent): $dynamicRef
      // behaves exactly like $ref (2020-12 §8.2.3.2)
      val staticRef = if (home.isEmpty) "#" + name else r
      (spec.resolve(staticRef, Nil), staticRef)
    }
  }
}

/** Compiles a [[SchemaNode]] applied to a typed column into [[Check]]s.
  *
  * This is the engine's analogue of the reference's validator dispatch
  * (/root/reference/validator.go:70-196) — except the dispatch happens ONCE
  * at compile time on the static Spark `DataType`, and the emitted artifact
  * is a vectorized expression tree instead of a tree-walking interpreter.
  * Keywords that can never apply to the column's static type are pruned at
  * compile time (the lazy-conversion optimization of
  * /root/reference/validator.go:516-521, taken to its static conclusion).
  *
  * NULL semantics: SQL NULL = absent value; every keyword is vacuous on NULL
  * (see [[graft.spec.SchemaNode]] scaladoc). Only `required` rejects NULL.
  */
object RowCompiler {

  private[compile] val Dec = DecimalType(38, 12)

  /** The object-keyword name algebra shared by additionalProperties /
    * unevaluatedProperties in BOTH compilers: a key is "covered" when it is
    * a listed property name or matches a patternProperties regex (via the
    * pluggable engine). One definition so static and dynamic modes cannot
    * silently diverge.
    */
  private[compile] def nameCovered(k: Column, names: Iterable[String],
      patterns: Iterable[String]): Column = {
    val inNames = names.map(k === _).reduceOption(_ || _).getOrElse(lit(false))
    val inPats = patterns.map(Formats.patternMatch(k, _))
      .reduceOption(_ || _).getOrElse(lit(false))
    inNames || inPats
  }

  /** True when `bd` is EXACTLY representable in Decimal(38,12) — the
    * precondition for the decimal-exact arms below. Out-of-range literals
    * (scale > 12, e.g. 1e-13, or > 26 integer digits) would be silently
    * ROUNDED by the cast (try_cast nulls only on overflow, not scale loss):
    * a divisor under 5e-13 rounds to zero (DIVIDE_BY_ZERO under ANSI) and a
    * bound/const compares against the wrong value — those take the
    * approximate double arm instead.
    */
  private[compile] def fitsDec(bd: BigDecimal): Boolean =
    bd.scale <= 12 && bd.precision - bd.scale <= 26

  /** Wrap a core predicate so NULL input passes and a NULL-valued core
    * (three-valued logic leak) fails closed.
    */
  private def vac(v: Column, core: Column): Column =
    when(v.isNull, lit(true)).otherwise(coalesce(core, lit(false)))

  private def jsonTypeName(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "integer"
    case FloatType | DoubleType | _: DecimalType       => "number"
    case StringType | BinaryType                       => "string"
    case BooleanType                                   => "boolean"
    case _: ArrayType                                  => "array"
    case _: StructType | _: MapType                    => "object"
    case DateType | TimestampType | TimestampNTZType   => "string"
    case _                                             => "unknown"
  }

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _              => false
  }

  /** Literal for a JSON constant, coerced for comparison against a column of
    * type `dt`. Numeric cross-type equality (2 == 2.0) follows the
    * reference's big.Rat comparison (/root/reference/util.go:322-325) via a
    * common DecimalType.
    */
  private def constEq(v: Column, dt: DataType, node: JsonNode, at: String): Column = {
    if (node.isNull) return v.isNull
    dt match {
      case _ if node.isNumber && isNumeric(dt) =>
        // exact rational equality (util.go:322-325) with provably-exact
        // native fast arms, mirroring boundCmp: an integral column only
        // ever equals a long-valued constant; a float/double column
        // compares natively when the constant ROUND-TRIPS through that
        // width's shortest decimal repr (r is injective, so r(x) == B ==
        // r(double(B)) ⟺ x == double(B)); everything else — full-expansion
        // constants, values a Decimal(38,12) cast would round onto the
        // constant, wide decimals — takes the exact arm
        val bd = BigDecimal(node.decimalValue())
        dt match {
          case ByteType | ShortType | IntegerType | LongType =>
            if (bd.isValidLong) v === lit(bd.toLong)
            else lit(false) // fractional or out-of-long-range: never equal
          case DoubleType if roundTripsDouble(bd) => v === lit(bd.toDouble)
          case FloatType if roundTripsFloat(bd) => v === lit(bd.toFloat)
          case d: DecimalType if decExact(bd, d) =>
            v === lit(bd.bigDecimal).cast(d)
          case _ =>
            coalesce(
              ExactRatPredExpr.pred(v, ExactRatPredExpr.Eq, bd.bigDecimal),
              lit(false))
        }
      case StringType if node.isTextual  => v === lit(node.asText())
      case BooleanType if node.isBoolean => v === lit(node.asBoolean())
      case at2: ArrayType if node.isArray =>
        // element-wise recursion (NOT a literal-array cast, whose
        // lit(decimalValue).cast(double) would ROUND a full-expansion
        // constant onto the instance value): each element gets the same
        // exact-rational fast/exact arms as a scalar const
        val elems = node.asScala.toSeq
        val eqs = elems.zipWithIndex.map { case (e, i) =>
          constEq(element_at(v, i + 1), at2.elementType, e, at)
        }
        (Seq(size(v) === elems.size: Column) ++ eqs).reduce(_ && _)
      case DateType | TimestampType | TimestampNTZType if node.isTextual =>
        v.cast(StringType) === lit(node.asText())
      case st: StructType if node.isObject =>
        // object const over a struct: structural deep equality with numeric
        // cross-type fidelity (/root/reference/util.go:286-329) — every
        // const key must be a (statically present) field with an equal
        // value, and every other field must be absent (NULL)
        val constKeys = node.fieldNames().asScala.toVector
        if (!constKeys.forall(st.fieldNames.contains)) lit(false)
        else {
          val eqs = constKeys.map(k =>
            constEq(v.getField(k), st(k).dataType, node.get(k), at))
          val absent = st.fields.filterNot(f => constKeys.contains(f.name))
            .map(f => v.getField(f.name).isNull).toSeq
          (eqs ++ absent).reduceOption(_ && _).getOrElse(lit(true))
        }
      case MapType(StringType, vt, _) if node.isObject =>
        val constKeys = node.fieldNames().asScala.toVector
        val eqs = constKeys.map(k =>
          array_contains(map_keys(v), k) &&
            constEq(element_at(v, k), vt, node.get(k), at))
        (Seq(size(map_keys(v)) === constKeys.size) ++ eqs).reduce(_ && _)
      case _ => lit(false) // type can never match the constant
    }
  }

  /** Pushdown-friendly numeric literal: native type when exact, decimal
    * compare otherwise (keeps parquet predicate pushdown for the common
    * integer-bound case — verified via explain/PushedFilters).
    */
  private def boundCmp(v: Column, dt: DataType, bd: BigDecimal, op: Int)(
      native: (Column, Column) => Column): Column = dt match {
    case ByteType | ShortType | IntegerType | LongType if bd.isValidLong =>
      native(v, lit(bd.toLong))
    case DoubleType if roundTripsDouble(bd) =>
      // round-tripping bound: the IEEE compare agrees with big.Rat. Both
      // engine (ExactRatPredExpr.ofDouble) and reference (fmt.Sprint,
      // validator.go:519) convert instances via the SHORTEST decimal repr
      // r(·), which is strictly monotone over doubles (each repr lies
      // uniquely inside its double's rounding interval), so when the bound
      // B satisfies r(double(B)) == B, double(B) is the exact pivot:
      // r(x) op B  ⟺  x op double(B) for op ∈ {<,≤,=,≥,>}. Strictly wider
      // than isExactDouble (dyadic only) — covers 0.08, 1e-3, every bound a
      // schema author writes — keeping the hot path native/codegen'd.
      native(v, lit(bd.toDouble))
    case FloatType if roundTripsFloat(bd) =>
      // same argument at float precision (ofFloat = float shortest repr):
      // bounds that round-trip through DOUBLE but not float — e.g. the full
      // printed expansion of a double near 0.1 — must NOT take this arm
      // (the float shortest repr can sit on the other side of such a bound
      // than the promoted IEEE value), so the gate is the float round trip
      native(v, lit(bd.toFloat))
    case d: DecimalType if decExact(bd, d) =>
      native(v, lit(bd.bigDecimal).cast(d))
    case ByteType | ShortType | IntegerType | LongType if fitsDec(bd) =>
      // fractional bound over an integral column: both Dec casts are exact
      // (≤19 integer digits always fit Decimal(38,12))
      native(v.cast(Dec), lit(bd.bigDecimal).cast(Dec))
    case _ =>
      // float/double against a non-exact-double bound (a Dec cast of the
      // VALUE would round >12-dp shortest reprs before comparing), a
      // decimal column whose type can't hold the bound, or a bound outside
      // Decimal(38,12): big.Rat-exact compare (validator.go:522-543)
      ExactRatPredExpr.pred(v, op, bd.bigDecimal)
  }

  /** Does `bd`'s exact rational value survive a value→nearest-double→
    * shortest-repr round trip? When true, native IEEE comparison against
    * `bd.toDouble` is exactly big.Rat-equivalent (see boundCmp). The repr
    * MUST be the same function the exact arm applies to instances
    * (ExactRatPredExpr.shortestDouble — true correctly-rounded shortest,
    * not Java 17's legacy toString, which emits an excess digit for ~0.3%
    * of doubles and is a different rational): gate and conversion using
    * one r(·) is what makes the monotonicity argument close. NaN never
    * reaches here (schema bounds parse from JSON numbers); ±Inf overflow of
    * huge bounds fails the value compare and falls to the exact arm.
    */
  private def roundTripsDouble(bd: BigDecimal): Boolean = {
    val d = bd.toDouble
    !java.lang.Double.isInfinite(d) &&
      graft.functions.ExactRatPredExpr.shortestDouble(d)
        .compareTo(bd.bigDecimal) == 0
  }

  private def roundTripsFloat(bd: BigDecimal): Boolean = {
    val f = bd.toFloat
    !java.lang.Float.isInfinite(f) &&
      graft.functions.ExactRatPredExpr.shortestFloat(f)
        .compareTo(bd.bigDecimal) == 0
  }

  /** Is `bd` exactly representable in DecimalType `d` (no rounding, no
    * overflow)? Trailing zeros stripped first so 2.50 fits scale 1.
    */
  private def decExact(bd: BigDecimal, d: DecimalType): Boolean = {
    val n = bd.bigDecimal.stripTrailingZeros
    n.scale <= d.scale &&
      (n.precision - n.scale) <= (d.precision - d.scale)
  }

  /** Spark type inferred from a schema node's `type` keyword — used to give
    * `contentSchema` (JSON-in-string) a from_json read schema.
    */
  def sparkTypeOf(node: SchemaNode, at: String): DataType = {
    val t = node.types.getOrElse(
      // no explicit type: infer from which keyword family is present
      if (node.properties.nonEmpty) Set("object")
      else if (node.items.nonEmpty || node.prefixItems.nonEmpty) Set("array")
      else if (node.minimum.nonEmpty || node.maximum.nonEmpty ||
        node.exclusiveMinimum.nonEmpty || node.exclusiveMaximum.nonEmpty ||
        node.multipleOf.nonEmpty) Set("number")
      else if (node.minLength.nonEmpty || node.maxLength.nonEmpty ||
        node.pattern.nonEmpty || node.format.nonEmpty) Set("string")
      else if (node.const.exists(_.isNumber) ||
        node.enumVals.exists(e => e.nonEmpty && e.forall(_.isNumber))) Set("number")
      else if (node.const.exists(_.isTextual) ||
        node.enumVals.exists(e => e.nonEmpty && e.forall(_.isTextual))) Set("string")
      else throw SpecError(at, "contentSchema subschemas need an explicit 'type'"))
    t.toSeq match {
      case Seq("integer") => LongType
      case Seq("number")  => DoubleType
      case Seq("string")  => StringType
      case Seq("boolean") => BooleanType
      case Seq("array") =>
        ArrayType(node.items.map(i => sparkTypeOf(i, at + "/items")).getOrElse(StringType))
      case Seq("object") =>
        StructType(node.properties.map { case (k, s) =>
          StructField(k, sparkTypeOf(s, s"$at/properties/$k"))
        })
      case _ => throw SpecError(at, s"cannot map type set $t to a Spark type")
    }
  }

  /** Statically-known evaluated property set for `unevaluatedProperties`
    * lowering: (evaluated keys, evaluated key patterns, allEvaluated) merged
    * over this node and its ALWAYS-applied in-place applicators (allOf,
    * `$ref`) — the reference's allPropsEvaluated precompute
    * (/root/reference/compiler.go:247-259). `not` never contributes (its
    * subschema must FAIL for the instance to be valid, so its annotations
    * are always dropped). Runtime-dependent applicators (anyOf/oneOf/
    * if-then-else/dependentSchemas) that evaluate properties make the set
    * dynamic → typed compile rejection, the documented residual limit.
    */
  /** Does this schema closure evaluate any properties? (probe shared by the
    * static precompute and the runtime-contribution walker)
    */
  private def evaluatesProps(spec: Spec, n: SchemaNode, st: List[String]): Boolean =
    n.properties.nonEmpty || n.patternProperties.nonEmpty ||
      n.additionalProperties.nonEmpty || n.unevaluatedProperties.nonEmpty ||
      // conservative: a $dynamicRef target MAY evaluate properties, and the
      // walkers must SEE such a branch so they can resolve it through the
      // compile-time scope chain instead of silently dropping its keys
      n.dynRef.nonEmpty ||
      (n.allOf ++ n.anyOf ++ n.oneOf ++ n.ifS ++ n.thenS ++ n.elseS ++
        n.dependentSchemas.map(_._2)).exists(evaluatesProps(spec, _, st)) ||
      // repeated ref on this walk path = fixpoint (its contribution was
      // already accounted at first visit); cycles are NOT an error here
      n.ref.exists(r => !st.contains(r) &&
        evaluatesProps(spec, spec.resolve(r, Nil), r :: st))

  /** Internal signal: the evaluated set depends on runtime branches — the
    * caller falls back to the per-row column-algebra lowering
    * ([[evaluatedPropsContributions]]).
    */
  private[compile] final case class RuntimeEvalSet(detail: String)
      extends RuntimeException(detail)

  private[compile] def staticEvaluatedProps(spec: Spec, node: SchemaNode, at: String,
      dynStack: List[(String, Int)] = Nil)
      : (Set[String], Vector[String], Boolean) = {
    // `st` is THIS WALK's visited-ref path only — the compiler's unroll
    // stack must NOT leak in: an ancestor unroll entry (taken at a
    // shallower data position) is not a cycle of the evaluated-set walk,
    // and a repeat on the walk path itself is a FIXPOINT (the ref's keys
    // were merged at its first visit), not an error. `dynStack` is the
    // CALLER's compile stack, used only as the dynamic-scope chain when a
    // $dynamicRef appears in the closure: resolution is the same
    // outermost-anchor-on-the-compile-time-chain rule the main compile
    // path applies ([[Refs.resolveDynamic]]), so the evaluated set it
    // contributes is exactly the set the inlined target evaluates.
    def walk(n: SchemaNode, st: List[String],
             isRoot: Boolean): (Set[String], Vector[String], Boolean) = {
      (n.anyOf ++ n.oneOf ++ n.ifS ++ n.thenS ++ n.elseS ++
        n.dependentSchemas.map(_._2)).find(evaluatesProps(spec, _, st)).foreach { d =>
        throw RuntimeEvalSet(
          "evaluated set depends on the runtime applicator at " +
            s"'${d.path.mkString("/")}'")
      }
      val parts = n.ref.filterNot(st.contains).map(r =>
        walk(spec.resolve(r, Nil), r :: st, isRoot = false)).toVector ++
        n.dynRef.toVector.flatMap { r =>
          val (tgt, key) = Refs.resolveDynamic(spec, r,
            st.map((_, 0)) ::: dynStack, at)
          if (st.contains(key)) Vector.empty
          else Vector(walk(tgt, key :: st, isRoot = false))
        } ++
        n.allOf.map(walk(_, st, isRoot = false))
      // a NESTED unevaluatedProperties (in allOf/$ref children) annotates
      // every property the closure leaves unevaluated, so the root's own
      // check sees everything evaluated — but the root must not count
      // ITSELF (that would make every check vacuous)
      (n.properties.map(_._1).toSet ++ parts.flatMap(_._1),
        n.patternProperties.map(_._1) ++ parts.flatMap(_._2),
        n.additionalProperties.nonEmpty ||
          (!isRoot && n.unevaluatedProperties.nonEmpty) ||
          parts.exists(_._3))
    }
    walk(node, Nil, isRoot = true)
  }

  /** One per-row contribution to the evaluated-property set: the keys /
    * key-patterns a branch evaluates, gated by the condition under which the
    * branch both APPLIES and VALIDATES — annotations from failed subschemas
    * are dropped, matching the reference's annotation-collection semantics
    * (/root/reference/validator.go:913-954). `unconditional` marks the
    * always-applied closure (this node, allOf, $ref), whose cond is
    * literally true.
    */
  private[compile] final case class EvalContribution(cond: Column, unconditional: Boolean,
      keys: Set[String], patterns: Vector[String], allEval: Boolean)

  /** RUNTIME evaluated-property set for `unevaluatedProperties` whose
    * closure contains runtime-dependent applicators (anyOf / oneOf /
    * if-then-else / dependentSchemas that evaluate properties): each branch
    * contributes its evaluated keys under a `when(branchValidates, …)`
    * condition, and the residual check ORs the conditions per key — pure
    * column algebra over the same branch predicates the compiler already
    * emits, no runtime recursion (closes the static-lowering residual for
    * the dominant real-world shape, see round-3 verdict / validator.go
    * annotation flow).
    */
  private[compile] def evaluatedPropsContributions(spec: Spec, node: SchemaNode,
      at: String, branchPred: SchemaNode => Column,
      keyPresent: String => Column,
      dynStack: List[(String, Int)] = Nil): Vector[EvalContribution] = {
    // `seen` is this walk's own visited-ref path (fixpoint-skip on repeat —
    // a repeated ref's keys arrive under a strictly narrower condition, so
    // the union is unchanged); `branchPred` compiles a branch's validity
    // predicate in the CALLER's compiler (typed or dynamic) against the
    // caller's real compile stack, so ref unrolling stays bounded there.
    // `dynStack` = caller's compile stack, the dynamic-scope chain for any
    // $dynamicRef in the closure (see staticEvaluatedProps).
    def walk(n: SchemaNode, seen: List[String], cond: Column,
             uncond: Boolean, isRoot: Boolean): Vector[EvalContribution] = {
      def p(ch: SchemaNode): Column = branchPred(ch)
      // only branches that actually evaluate properties contribute — the
      // rest would add empty sets and waste predicate columns
      def prEval(ch: SchemaNode): Boolean = evaluatesProps(spec, ch, seen)
      val own = EvalContribution(cond, uncond, n.properties.map(_._1).toSet,
        n.patternProperties.map(_._1),
        n.additionalProperties.nonEmpty ||
          (!isRoot && n.unevaluatedProperties.nonEmpty))
      val fromRef = n.ref.toVector.filterNot(seen.contains).flatMap { r =>
        walk(spec.resolve(r, Nil), r :: seen, cond, uncond, isRoot = false)
      } ++ n.dynRef.toVector.flatMap { r =>
        val (tgt, key) = Refs.resolveDynamic(spec, r,
          seen.map((_, 0)) ::: dynStack, at)
        if (seen.contains(key)) Vector.empty
        else walk(tgt, key :: seen, cond, uncond, isRoot = false)
      }
      val fromIf = n.ifS.toVector.flatMap { ifn =>
        val needed = prEval(ifn) || n.thenS.exists(prEval) || n.elseS.exists(prEval)
        if (!needed) Vector.empty else {
          val ifPred = p(ifn)
          (if (prEval(ifn)) walk(ifn, seen, cond && ifPred, uncond = false, isRoot = false)
           else Vector.empty) ++
            n.thenS.toVector.filter(prEval).flatMap(t =>
              walk(t, seen, cond && ifPred && p(t), uncond = false, isRoot = false)) ++
            n.elseS.toVector.filter(prEval).flatMap(e =>
              walk(e, seen, cond && !ifPred && p(e), uncond = false, isRoot = false))
        }
      }
      own +: (fromRef ++
        n.allOf.flatMap(walk(_, seen, cond, uncond, isRoot = false)) ++
        (n.anyOf ++ n.oneOf).filter(prEval).flatMap(ch =>
          walk(ch, seen, cond && p(ch), uncond = false, isRoot = false)) ++
        fromIf ++
        n.dependentSchemas.filter(kv => prEval(kv._2)).flatMap { case (k, ds) =>
          walk(ds, seen, cond && keyPresent(k) && p(ds), uncond = false, isRoot = false)
        })
    }
    walk(node, Nil, lit(true), uncond = true, isRoot = true)
  }

  /** Statically-known evaluated item prefix for `unevaluatedItems`:
    * (max prefixItems length, allEvaluated). `contains` marks matched items
    * evaluated at runtime → rejected, like runtime-dependent applicators.
    */
  private def evaluatesItems(spec: Spec, n: SchemaNode, st: List[String]): Boolean =
    n.items.nonEmpty || n.prefixItems.nonEmpty || n.contains.nonEmpty ||
      n.unevaluatedItems.nonEmpty ||
      // see evaluatesProps: dynRef branches must stay visible to the walkers
      n.dynRef.nonEmpty ||
      (n.allOf ++ n.anyOf ++ n.oneOf ++ n.ifS ++ n.thenS ++ n.elseS ++
        n.dependentSchemas.map(_._2)).exists(evaluatesItems(spec, _, st)) ||
      n.ref.exists(r => !st.contains(r) &&
        evaluatesItems(spec, spec.resolve(r, Nil), r :: st))

  private[compile] def staticEvaluatedItems(spec: Spec, node: SchemaNode, at: String,
      dynStack: List[(String, Int)] = Nil)
      : (Int, Boolean, Vector[SchemaNode]) = {
    // walk-local visited-ref path with fixpoint-skip on repeats — see
    // staticEvaluatedProps for why the compiler's unroll stack stays out
    // and what `dynStack` is ($dynamicRef scope chain).
    // `contains` in the UNCONDITIONAL closure (this node / allOf / $ref) is
    // collected: matched elements count evaluated (2020-12 annotation
    // flow), expressible as a per-element predicate; contains inside
    // runtime branches is handled by the runtime walker (per-element
    // predicate under the branch condition).
    def walk(n: SchemaNode, st: List[String],
             isRoot: Boolean): (Int, Boolean, Vector[SchemaNode]) = {
      (n.anyOf ++ n.oneOf ++ n.ifS ++ n.thenS ++ n.elseS ++
        n.dependentSchemas.map(_._2)).find(evaluatesItems(spec, _, st)).foreach { d =>
        throw RuntimeEvalSet(
          "evaluated item set depends on the runtime applicator at " +
            s"'${d.path.mkString("/")}'")
      }
      val parts = n.ref.filterNot(st.contains).map(r =>
        walk(spec.resolve(r, Nil), r :: st, isRoot = false)).toVector ++
        n.dynRef.toVector.flatMap { r =>
          val (tgt, key) = Refs.resolveDynamic(spec, r,
            st.map((_, 0)) ::: dynStack, at)
          if (st.contains(key)) Vector.empty
          else Vector(walk(tgt, key :: st, isRoot = false))
        } ++
        n.allOf.map(walk(_, st, isRoot = false))
      ((n.prefixItems.size +: parts.map(_._1)).max,
        n.items.nonEmpty ||
          (!isRoot && n.unevaluatedItems.nonEmpty) || // nested = all evaluated
          parts.exists(_._2),
        n.contains.toVector ++ parts.flatMap(_._3))
    }
    walk(node, Nil, isRoot = true)
  }

  /** RUNTIME evaluated-item prefix for `unevaluatedItems` under
    * branch-dependent applicators: each branch contributes its evaluated
    * prefix length (or all-evaluated) under the condition that it applies
    * AND validates — the items analogue of [[evaluatedPropsContributions]].
    * `contains` ANYWHERE in the closure contributes per-ELEMENT evaluation
    * (a matched element counts evaluated, 2020-12 annotation flow) under
    * its branch's condition — returned separately as (cond, unconditional,
    * contains schema) for the caller to compile per element in ITS compiler.
    */
  private[compile] def evaluatedItemsContributions(spec: Spec, node: SchemaNode,
      at: String, branchPred: SchemaNode => Column,
      keyPresent: String => Column,
      dynStack: List[(String, Int)] = Nil)
      : (Vector[(Column, Boolean, Int, Boolean)],
         Vector[(Column, Boolean, SchemaNode)]) = {
    // (cond, unconditional, prefixLen, allEval)
    // walk-local `seen` ref path with fixpoint-skip; `branchPred` compiles
    // in the caller's compiler — see evaluatedPropsContributions (also for
    // `dynStack`, the $dynamicRef scope chain)
    val containsOut = Vector.newBuilder[(Column, Boolean, SchemaNode)]
    def walk(n: SchemaNode, seen: List[String], cond: Column,
             uncond: Boolean, isRoot: Boolean): Vector[(Column, Boolean, Int, Boolean)] = {
      n.contains.foreach(cn => containsOut += ((cond, uncond, cn)))
      def p(ch: SchemaNode): Column = branchPred(ch)
      def itEval(ch: SchemaNode): Boolean = evaluatesItems(spec, ch, seen)
      val own = (cond, uncond, n.prefixItems.size,
        n.items.nonEmpty || (!isRoot && n.unevaluatedItems.nonEmpty))
      val fromRef = n.ref.toVector.filterNot(seen.contains).flatMap { r =>
        walk(spec.resolve(r, Nil), r :: seen, cond, uncond, isRoot = false)
      } ++ n.dynRef.toVector.flatMap { r =>
        val (tgt, key) = Refs.resolveDynamic(spec, r,
          seen.map((_, 0)) ::: dynStack, at)
        if (seen.contains(key)) Vector.empty
        else walk(tgt, key :: seen, cond, uncond, isRoot = false)
      }
      val fromIf = n.ifS.toVector.flatMap { ifn =>
        val needed = itEval(ifn) || n.thenS.exists(itEval) || n.elseS.exists(itEval)
        if (!needed) Vector.empty else {
          val ifPred = p(ifn)
          (if (itEval(ifn)) walk(ifn, seen, cond && ifPred, uncond = false, isRoot = false)
           else Vector.empty) ++
            n.thenS.toVector.filter(itEval).flatMap(t =>
              walk(t, seen, cond && ifPred && p(t), uncond = false, isRoot = false)) ++
            n.elseS.toVector.filter(itEval).flatMap(e =>
              walk(e, seen, cond && !ifPred && p(e), uncond = false, isRoot = false))
        }
      }
      own +: (fromRef ++
        n.allOf.flatMap(walk(_, seen, cond, uncond, isRoot = false)) ++
        (n.anyOf ++ n.oneOf).filter(itEval).flatMap(ch =>
          walk(ch, seen, cond && p(ch), uncond = false, isRoot = false)) ++
        fromIf ++
        n.dependentSchemas.filter(kv => itEval(kv._2)).flatMap { case (k, ds) =>
          walk(ds, seen, cond && keyPresent(k) && p(ds), uncond = false, isRoot = false)
        })
    }
    val contribs = walk(node, Nil, lit(true), uncond = true, isRoot = true)
    (contribs, containsOut.result())
  }

  /** boolResult mode (/root/reference/validator.go:66): the conjunction of a
    * node's checks, used by not/anyOf/oneOf/if probes — no violation structs
    * are built, so codegen short-circuits exactly like the reference's
    * error-suppressed probes.
    */
  def predicate(spec: Spec, node: SchemaNode, v: Column, dt: DataType,
                stack: List[(String, Int)] = Nil, depth: Int = 0): Column =
    compile(spec, node, v, dt, "", stack, None, depth)
      .map(_.pred).reduceOption(_ && _).getOrElse(lit(true))

  /** Compile a schema node applied to value `v` of static type `dt` at
    * instance path `instPath`. Keyword order mirrors the reference's fixed
    * evaluation order (/root/reference/validator.go:70-196). `stack` tracks
    * traversed refs as (refKey, dataDepth); `depth` counts data descents
    * (property/element navigation) — together they distinguish true ref
    * cycles from recursive descent (see [[Refs]]).
    */
  def compile(spec: Spec, node: SchemaNode, v: Column, dt: DataType,
              instPath: String, stack: List[(String, Int)] = Nil,
              binder: Option[Binder] = None, depth: Int = 0): Seq[Check] = {
    val kwBase = if (node.path.isEmpty) "" else node.path.mkString("/")
    CompileLimits.tickVisit(if (kwBase.isEmpty) "#" else kwBase)
    def kw(parts: String*): String =
      (if (kwBase.isEmpty) parts else Vector(kwBase) ++ parts).mkString("/")
    val out = Vector.newBuilder[Check]
    def add(kwPath: String, pred: Column, detail: Column,
            kind: ErrorKind): Unit =
      out += Check(kwPath, instPath, pred, detail, kind)
    def lstr(s: String): Column = lit(s)

    // boolean schema (/root/reference/validator.go:75-81)
    node.boolSchema match {
      case Some(false) =>
        add(kwBase, vac(v, lit(false)), lstr("false schema: always fails"),
          ErrorKind.FalseSchema)
        return out.result()
      case Some(true) => return Vector.empty
      case None       =>
    }

    // $ref — compile-time inlining (/root/reference/objcompiler.go:353-380).
    // Same-position repeats are cycles (rejected); recursive DESCENT unrolls
    // to CompileLimits.maxRefUnroll with a typed cut check beyond it.
    def inlineRef(r: String, key: String, kwName: String,
                  target: => SchemaNode): Unit = {
      if (stack.contains((key, depth)))
        throw SpecError(kw(kwName), s"cyclic $$ref chain: " +
          (key :: stack.map(_._1)).reverse.mkString(" -> "))
      val unroll = CompileLimits.effectiveUnroll
      if (stack.count(_._1 == key) >= unroll)
        add(kw(kwName), v.isNull,
          lstr(s"$kwName: recursive schema '$r' unrolled $unroll deep; " +
            "value present beyond the compiled depth"),
          ErrorKind.DepthExceeded(unroll))
      else
        out ++= compile(spec, target, v, dt, instPath,
          (key, depth) :: stack, binder, depth)
    }
    node.ref.foreach { r => inlineRef(r, r, "$ref", spec.resolve(r, Nil)) }
    node.dynRef.foreach { r =>
      val (target, key) = Refs.resolveDynamic(spec, r, stack, kw("$dynamicRef"))
      inlineRef(r, key, "$dynamicRef", target)
    }

    // type (/root/reference/validator.go:98-103)
    node.types.foreach { ts =>
      val s = jsonTypeName(dt)
      val ok: Option[Column] =
        if (ts.contains(s)) None
        else if (ts.contains("number") && s == "integer") None
        else if (ts.contains("integer") && s == "number")
          // zero-fraction rule, util.go:272-275. Decimal columns compare
          // against floor IN THEIR OWN type (exact, no (38,12) recast that
          // would round >12-fractional-digit values onto integers — the
          // old arm read 1.0000000000001 as an integer). Float/double use
          // pmod-1, which is EXACTLY the shortest-repr rule: IEEE fmod is
          // exact, every double >= 2^52 is integral, and an integer
          // shortest repr round-trips only to an integral double. (pmod,
          // not floor, whose LONG result overflows past 2^63.)
          Some(dt match {
            case _: DecimalType => v === floor(v)
            case _ => pmod(v.cast(DoubleType), lit(1.0)) === lit(0.0)
          })
        else Some(lit(false))
      ok.foreach { core =>
        add(kw("type"), vac(v, core),
          concat(lstr(s"type: got $s value "), v.cast(StringType),
            lstr(s", want ${ts.mkString("|")}")),
          ErrorKind.TypeMismatch(ts))
      }
    }

    // const (/root/reference/validator.go:106-113)
    node.const.foreach { c =>
      add(kw("const"), vac(v, constEq(v, dt, c, kw("const"))),
        concat(lstr("const: got "), v.cast(StringType), lstr(s", want $c")),
        ErrorKind.ConstK(c.toString))
    }

    // enum — type-compatible values only (prefilter analogue of
    // /root/reference/schema.go:226-237)
    node.enumVals.foreach { vals =>
      val eqs = vals.map(c => constEq(v, dt, c, kw("enum")))
      val core = eqs.reduceOption(_ || _).getOrElse(lit(false))
      add(kw("enum"), vac(v, core),
        concat(lstr("enum: got "), v.cast(StringType),
          lstr(s", want one of ${vals.mkString(", ")}")),
        ErrorKind.EnumK(vals.map(_.toString)))
    }

    // format (/root/reference/validator.go:136-146) — strings only, vacuous
    // on other types (format.go:43-45)
    node.format.foreach { f =>
      if (dt == StringType || dt == BinaryType) {
        Formats.get(f) match {
          case Some(fn) =>
            add(kw("format"), vac(v, fn(v)),
              concat(lstr(s"format: "), v.cast(StringType), lstr(s" is not a valid $f")),
              ErrorKind.FormatK(f))
          case None if node.formatLenient => // compat: ignored annotation
          case None =>
            throw SpecError(kw("format"), s"unknown format '$f'")
        }
      }
    }

    // number keywords (/root/reference/validator.go:513-550)
    if (isNumeric(dt)) {
      node.minimum.foreach { b =>
        add(kw("minimum"), vac(v, boundCmp(v, dt, b, ExactRatPredExpr.Ge)(_ >= _)),
          concat(lstr("minimum: got "), v.cast(StringType), lstr(s", want >= $b")),
          ErrorKind.Minimum(b))
      }
      node.maximum.foreach { b =>
        add(kw("maximum"), vac(v, boundCmp(v, dt, b, ExactRatPredExpr.Le)(_ <= _)),
          concat(lstr("maximum: got "), v.cast(StringType), lstr(s", want <= $b")),
          ErrorKind.Maximum(b))
      }
      node.exclusiveMinimum.foreach { b =>
        add(kw("exclusiveMinimum"), vac(v, boundCmp(v, dt, b, ExactRatPredExpr.Gt)(_ > _)),
          concat(lstr("exclusiveMinimum: got "), v.cast(StringType), lstr(s", want > $b")),
          ErrorKind.ExclusiveMinimum(b))
      }
      node.exclusiveMaximum.foreach { b =>
        add(kw("exclusiveMaximum"), vac(v, boundCmp(v, dt, b, ExactRatPredExpr.Lt)(_ < _)),
          concat(lstr("exclusiveMaximum: got "), v.cast(StringType), lstr(s", want < $b")),
          ErrorKind.ExclusiveMaximum(b))
      }
      // exact rational divisibility: native pmod fast arms where provably
      // exact, big.Rat-equivalent BigDecimal remainder everywhere else
      // (/root/reference/validator.go:545-549; ExactRatPredExpr has the
      // fidelity argument)
      node.multipleOf.foreach { m =>
        val decZero = lit(java.math.BigDecimal.ZERO).cast(Dec)
        val core = dt match {
          case ByteType | ShortType | IntegerType | LongType if m.isValidLong =>
            pmod(v, lit(m.toLong)) === lit(0L)
          case ByteType | ShortType | IntegerType | LongType if fitsDec(m) =>
            // fractional divisor over an integral column: both Dec casts
            // exact (≤19 integer digits always fit)
            pmod(v.cast(Dec), lit(m.bigDecimal).cast(Dec)) === decZero
          case FloatType | DoubleType if m.isValidLong =>
            // integer divisor over a float column: the common case (integral
            // value within 2^53) needs no decimal at all — IEEE fmod is
            // EXACT. Cuts the per-row cost ~3x on TPC-H-style quantity
            // columns. Non-integral or huge values take the exact-rational
            // arm: a Decimal(38,12) cast would ROUND shortest reprs with
            // >12 fractional digits (1.0000000000001 would silently PASS
            // multipleOf 1e-12 where validator.go:546 fails it).
            val dv = v.cast(DoubleType)
            when(pmod(dv, lit(1.0)) === lit(0.0) &&
                abs(dv) < lit(9.007199254740992e15),
              pmod(dv, lit(m.toDouble)) === lit(0.0))
              .otherwise(
                ExactRatPredExpr.pred(v, ExactRatPredExpr.MultipleOf, m.bigDecimal))
          case d: DecimalType
              if d.scale <= 12 && d.precision - d.scale <= 26 && fitsDec(m) =>
            // narrow-enough decimal column: the widening casts are exact
            pmod(v.cast(Dec), lit(m.bigDecimal).cast(Dec)) === decZero
          case _ =>
            // float/double with a fractional divisor, wide decimal columns,
            // divisors outside Decimal(38,12) (a cast would round — a
            // sub-5e-13 divisor rounds to ZERO, ANSI DIVIDE_BY_ZERO on
            // every row), or huge integral columns: exact rational remainder
            ExactRatPredExpr.pred(v, ExactRatPredExpr.MultipleOf, m.bigDecimal)
        }
        add(kw("multipleOf"), vac(v, core),
          concat(lstr("multipleOf: got "), v.cast(StringType), lstr(s", want multiple of $m")),
          ErrorKind.MultipleOf(m))
      }
    }

    // string keywords (/root/reference/validator.go:432-511)
    if (dt == StringType) {
      // Spark `length` counts characters — same rune semantics as
      // /root/reference/validator.go:435-445
      node.minLength.foreach { n =>
        add(kw("minLength"), vac(v, length(v) >= n),
          concat(lstr("minLength: got "), length(v).cast(StringType), lstr(s" chars, want >= $n")),
          ErrorKind.MinLength(n))
      }
      node.maxLength.foreach { n =>
        add(kw("maxLength"), vac(v, length(v) <= n),
          concat(lstr("maxLength: got "), length(v).cast(StringType), lstr(s" chars, want <= $n")),
          ErrorKind.MaxLength(n))
      }
      // regex *search* via the pluggable engine (default rlike), matching
      // /root/reference/validator.go:455-459 + the UseRegexpEngine hook
      node.pattern.foreach { p =>
        add(kw("pattern"), vac(v, Formats.patternMatch(v, p)),
          concat(lstr("pattern: "), v.cast(StringType), lstr(s" does not match '$p'")),
          ErrorKind.PatternK(p))
      }
      // contentEncoding: decodability of the encoded payload via the
      // pluggable decoder registry (/root/reference/validator.go:468-475,
      // content.go:17-24, RegisterContentEncoding compiler.go:85-90);
      // downstream media-type/schema checks run over the DECODED value,
      // mirroring the reference's decode-then-parse pipeline
      val contentValue = node.contentEncoding match {
        case Some(enc) =>
          val decode = graft.functions.Content.encoding(enc).getOrElse(
            throw SpecError(kw("contentEncoding"),
              s"unknown encoding '$enc' (registered: ${graft.functions.Content.knownEncodings.mkString(", ")})"))
          decode(v)
        case None => v
      }
      node.contentEncoding.foreach { enc =>
        add(kw("contentEncoding"), vac(v, contentValue.isNotNull),
          lstr(s"contentEncoding: value is not valid $enc"),
          ErrorKind.ContentEncodingK(enc))
      }
      // contentMediaType via the pluggable media-type registry
      // (RegisterContentMediaType, /root/reference/compiler.go:91-95); a
      // decode failure is already reported by contentEncoding, downstream
      // checks are vacuous on the null decoded value
      node.contentMediaType.foreach { mt =>
        val parseOk = graft.functions.Content.mediaType(mt).getOrElse(
          throw SpecError(kw("contentMediaType"),
            s"unknown media type '$mt' (registered: ${graft.functions.Content.knownMediaTypes.mkString(", ")})"))
        add(kw("contentMediaType"),
          vac(v, when(contentValue.isNull, lit(true))
            .otherwise(coalesce(parseOk(contentValue), lit(false)))),
          lstr(s"contentMediaType: value is not valid $mt"),
          ErrorKind.ContentMediaTypeK(mt))
      }
      // contentSchema: recursive compile over from_json
      // (/root/reference/validator.go:497-510). Per 2020-12 (and the
      // reference) it is IGNORED when contentMediaType is absent
      node.contentSchema.filter(_ => node.contentMediaType.nonEmpty).foreach { cs =>
        val st = sparkTypeOf(cs, kw("contentSchema"))
        st match {
          case _: StructType | _: ArrayType | _: MapType =>
            // surrogate canon ahead of from_json: a lone \uD800 escape
            // decodes to U+FFFD like Go, not a '?'-encoding unpaired char
            val parsed0 = from_json(
              graft.functions.SurrogateCanon.col(contentValue), st)
            // parse once per row, not once per emitted check
            val parsed = binder.map(_.bind(parsed0)).getOrElse(parsed0)
            out ++= compile(spec, cs, parsed, st, instPath + "!json", stack, binder, depth + 1)
          case _ =>
            // Spark 4's from_json refuses scalar schemas — a scalar
            // contentSchema goes through the dynamic (variant) compiler,
            // which is also the reference-faithful shape: content is
            // decoded as an arbitrary JSON value and type-dispatched at
            // runtime (validator.go:497-510), surrogate canon included
            out ++= DynamicJson.checksForJsonColumn(spec, cs, contentValue,
              instPath + "!json", binder, depth + 1)
        }
      }
      // json: DYNAMIC validation over variant (runtime type dispatch — the
      // reference's dynamically-typed instance model; see DynamicJson)
      node.jsonSchema.foreach { js =>
        out ++= DynamicJson.checksForJsonColumn(spec, js, contentValue,
          instPath + "!json", binder, depth + 1)
      }
    }
    // 'json' on a native VariantType column: dispatch straight to the
    // dynamic compiler (no parse step needed)
    if (dt == VariantType) {
      node.jsonSchema.foreach { js =>
        out ++= DynamicJson.compile(spec, js, v, instPath + "!json", stack, None, depth)
      }
    } else if (dt != StringType) {
      node.jsonSchema.foreach { _ =>
        throw SpecError(kw("json"),
          s"'json' applies to string or variant columns, got ${dt.simpleString}")
      }
    }

    // array keywords (/root/reference/validator.go:324-430)
    dt match {
      case ArrayType(et, _) =>
        node.minItems.foreach { n =>
          add(kw("minItems"), vac(v, size(v) >= n),
            concat(lstr("minItems: got "), size(v).cast(StringType), lstr(s", want >= $n")),
            ErrorKind.MinItems(n))
        }
        node.maxItems.foreach { n =>
          add(kw("maxItems"), vac(v, size(v) <= n),
            concat(lstr("maxItems: got "), size(v).cast(StringType), lstr(s", want <= $n")),
            ErrorKind.MaxItems(n))
        }
        if (node.uniqueItems) {
          // hash-based dedup — the scalable arm of
          // /root/reference/util.go:331-361
          add(kw("uniqueItems"), vac(v, size(array_distinct(v)) === size(v)),
            lstr("uniqueItems: duplicate items found"),
            ErrorKind.UniqueItemsK)
        }
        val prefixN = node.prefixItems.size
        node.prefixItems.zipWithIndex.foreach { case (ps, i) =>
          val elem = element_at(v, i + 1)
          val p = predicate(spec, ps, elem, et, stack, depth + 1)
          add(kw("prefixItems", i.toString), vac(v, size(v) <= i || coalesce(p, lit(false))),
            lstr(s"prefixItems/$i: element does not match"),
            ErrorKind.PrefixItemsK(i))
        }
        node.items.foreach { is =>
          val rest = if (prefixN == 0) v else slice(v, lit(prefixN + 1), greatest(size(v) - prefixN, lit(0)))
          val p = forall(rest, x => coalesce(predicate(spec, is, x, et, stack, depth + 1), lit(false)))
          val failed = size(filter(rest, x => !coalesce(predicate(spec, is, x, et, stack, depth + 1), lit(false))))
          add(kw("items"), vac(v, p),
            concat(lstr("items: "), failed.cast(StringType), lstr(" element(s) do not match")),
            ErrorKind.ItemsK)
        }
        node.contains.foreach { cs =>
          val cnt = size(filter(v, x => coalesce(predicate(spec, cs, x, et, stack, depth + 1), lit(false))))
          val minC = node.minContains.getOrElse(1)
          val core = node.maxContains match {
            case Some(mx) => cnt >= minC && cnt <= mx
            case None     => cnt >= minC
          }
          add(kw("contains"), vac(v, core),
            concat(lstr("contains: "), cnt.cast(StringType),
              lstr(s" matching element(s), want >= $minC" +
                node.maxContains.map(m => s" and <= $m").getOrElse(""))),
            ErrorKind.ContainsK(minC, node.maxContains))
        }
        // unevaluatedItems — static lowering: with a statically-known
        // evaluated prefix this is exactly items-after-prefix semantics
        // (/root/reference/validator.go:633-641)
        // `unevaluatedItems: true` can never fail — skip BEFORE the static
        // evaluated-set precompute, which rejects runtime-dependent
        // applicators (a no-op keyword must not make a valid spec
        // uncompilable)
        node.unevaluatedItems.filter(_ != Left(true)).foreach { ui =>
          def lowerStatic(maxPrefix: Int, containsNodes: Vector[SchemaNode]): Unit = {
            // contains-matched elements beyond the prefix count EVALUATED.
            // (When the contains keyword itself fails min/maxContains the
            // row is already invalid; treating its matches as evaluated can
            // only suppress a redundant second violation row, never flip a
            // verdict.)
            def contained(x: Column): Column = containsNodes
              .map(cn => coalesce(predicate(spec, cn, x, et, stack, depth + 1), lit(false)))
              .reduceOption(_ || _).getOrElse(lit(false))
            lazy val rest = if (maxPrefix == 0) v
              else slice(v, lit(maxPrefix + 1), greatest(size(v) - maxPrefix, lit(0)))
            ui match {
              case Left(true) =>
              case Left(false) if containsNodes.isEmpty =>
                add(kw("unevaluatedItems"), vac(v, size(v) <= maxPrefix),
                  concat(lstr("unevaluatedItems: got "), size(v).cast(StringType),
                    lstr(s" item(s), want <= $maxPrefix evaluated")),
                  ErrorKind.UnevaluatedItemsK)
              case Left(false) =>
                add(kw("unevaluatedItems"), vac(v, forall(rest, x => contained(x))),
                  lstr("unevaluatedItems: item(s) beyond the evaluated prefix " +
                    "match no contains schema"),
                  ErrorKind.UnevaluatedItemsK)
              case Right(us) =>
                val p = forall(rest, x => contained(x) ||
                  coalesce(predicate(spec, us, x, et, stack, depth + 1), lit(false)))
                add(kw("unevaluatedItems"), vac(v, p),
                  lstr("unevaluatedItems: element(s) do not match"),
                  ErrorKind.UnevaluatedItemsK)
            }
          }
          try {
            val (maxPrefix, allEval, containsNodes) =
              staticEvaluatedItems(spec, node, kw("unevaluatedItems"), stack)
            if (!allEval) lowerStatic(maxPrefix, containsNodes)
          } catch { case _: RuntimeEvalSet =>
            // RUNTIME arm: branch-dependent evaluated prefix — per-row
            // greatest of the validating branches' prefix lengths; contains
            // contributions mark individual elements evaluated under their
            // branch's condition
            val (contribs0, contains0) = evaluatedItemsContributions(spec, node,
              kw("unevaluatedItems"),
              ch => coalesce(predicate(spec, ch, v, dt, stack, depth), lit(false)),
              _ => lit(false), stack)
            // bind each branch condition ONCE per row — the prefix/allEval
            // folds below reference every cond, and without binding each
            // reference re-embeds the branch's full predicate tree
            val contribs = contribs0.map(c =>
              if (c._2) c
              else (binder.fold(c._1)(_.bind(c._1)), c._2, c._3, c._4))
            val containsC = contains0.map(c =>
              if (c._2) c else (binder.fold(c._1)(_.bind(c._1)), c._2, c._3))
            def containedRt(x: Column): Column = containsC.map { case (cond, uncond, cn) =>
              val m = coalesce(predicate(spec, cn, x, et, stack, depth + 1), lit(false))
              if (uncond) m else cond && m
            }.reduceOption(_ || _).getOrElse(lit(false))
            if (!contribs.exists(c => c._2 && c._4)) {
              val allEvalCond = contribs.filter(_._4).map(_._1)
                .reduceOption(_ || _).getOrElse(lit(false))
              val prefixCol = greatest(
                (lit(0) +: contribs.filter(_._3 > 0).map { c =>
                  if (c._2) lit(c._3)
                  else when(c._1, lit(c._3)).otherwise(lit(0))
                }): _*)
              lazy val rest = slice(v, prefixCol + 1,
                greatest(size(v) - prefixCol, lit(0)))
              ui match {
                case Left(true) =>
                case Left(false) if containsC.isEmpty =>
                  add(kw("unevaluatedItems"),
                    vac(v, coalesce(allEvalCond, lit(false)) || size(v) <= prefixCol),
                    concat(lstr("unevaluatedItems: got "), size(v).cast(StringType),
                      lstr(" item(s), more than the evaluated prefix")),
                    ErrorKind.UnevaluatedItemsK)
                case Left(false) =>
                  add(kw("unevaluatedItems"),
                    vac(v, coalesce(allEvalCond, lit(false)) ||
                      coalesce(forall(rest, x => containedRt(x)), lit(false))),
                    lstr("unevaluatedItems: item(s) beyond the evaluated prefix " +
                      "match no applicable contains schema"),
                    ErrorKind.UnevaluatedItemsK)
                case Right(us) =>
                  val p = forall(rest,
                    x => containedRt(x) ||
                      coalesce(predicate(spec, us, x, et, stack, depth + 1), lit(false)))
                  add(kw("unevaluatedItems"),
                    vac(v, coalesce(allEvalCond, lit(false)) || coalesce(p, lit(false))),
                    lstr("unevaluatedItems: element(s) do not match"),
                    ErrorKind.UnevaluatedItemsK)
              }
            }
          }
        }
      case _ =>
    }

    // object keywords (/root/reference/validator.go:198-322)
    dt match {
      case st: StructType =>
        val fields = st.fieldNames.toSet
        node.requiredProps.foreach { k =>
          val core = if (fields.contains(k)) v.getField(k).isNotNull else lit(false)
          add(kw("required"), vac(v, core), lstr(s"required: missing property '$k'"),
            ErrorKind.RequiredK(k))
        }
        node.properties.foreach { case (k, ps) =>
          if (fields.contains(k)) {
            val ft = st(k).dataType
            out ++= compile(spec, ps, v.getField(k), ft,
              if (instPath.isEmpty) k else s"$instPath/$k", stack, binder, depth + 1)
          } // absent field: subschema vacuous
        }
        // patternProperties over a STRUCT: field names are static, so each
        // regex is matched against them at compile time — through the
        // engine-paired hook (Formats.staticPatternMatch), like the uneval
        // static lowering, so a custom engine keeps struct and map columns
        // agreeing — and the paired subschema applies to matching fields
        // (absent field: vacuous, same as properties)
        node.patternProperties.foreach { case (re, ps) =>
          st.fields.filter(f => Formats.staticPatternMatch(f.name, re)).foreach { f =>
            out ++= compile(spec, ps, v.getField(f.name), f.dataType,
              if (instPath.isEmpty) f.name else s"$instPath/${f.name}", stack, binder, depth + 1)
          }
        }
        node.dependentRequired.foreach { case (k, reqs) =>
          if (fields.contains(k)) {
            val core = reqs.map(r => if (fields.contains(r)) v.getField(r).isNotNull else lit(false))
              .reduceOption(_ && _).getOrElse(lit(true))
            add(kw("dependentRequired", k), vac(v, !v.getField(k).isNotNull || core),
              lstr(s"dependentRequired: '$k' present but ${reqs.mkString(",")} missing"),
              ErrorKind.DependentRequiredK(k, reqs))
          }
        }
        // propertyNames over a STRUCT: keys are static, so each field name
        // is checked against the subschema as a literal (Catalyst constant-
        // folds it); the check fires only when the field is present
        // (/root/reference/validator.go:286-301)
        node.propertyNames.foreach { ps =>
          st.fields.foreach { f =>
            val nameOk = coalesce(
              predicate(spec, ps, lit(f.name), StringType, stack, depth + 1), lit(false))
            add(kw("propertyNames"),
              vac(v, !v.getField(f.name).isNotNull || nameOk),
              lstr(s"propertyNames: property name '${f.name}' does not match"),
              ErrorKind.PropertyNamesK(f.name))
          }
        }
        // dependentSchemas (/root/reference/validator.go:307-312): if key k
        // is present, the whole object must match the paired schema — the
        // SURVEY §2.4 `when(key.isNotNull, subPred)` gating; a statically
        // absent key can never trigger
        node.dependentSchemas.foreach { case (k, ds) =>
          if (fields.contains(k)) {
            val present = v.getField(k).isNotNull
            compile(spec, ds, v, st, instPath, stack, binder, depth).foreach { c =>
              out += c.copy(pred = !present || c.pred)
            }
          }
        }
        val nProps = st.fields.map(f => v.getField(f.name).isNotNull.cast(IntegerType))
          .reduceOption(_ + _).getOrElse(lit(0))
        node.minProperties.foreach { n =>
          add(kw("minProperties"), vac(v, nProps >= n),
            concat(lstr("minProperties: got "), nProps.cast(StringType), lstr(s", want >= $n")),
            ErrorKind.MinProperties(n))
        }
        node.maxProperties.foreach { n =>
          add(kw("maxProperties"), vac(v, nProps <= n),
            concat(lstr("maxProperties: got "), nProps.cast(StringType), lstr(s", want <= $n")),
            ErrorKind.MaxProperties(n))
        }
        // additionalProperties over a STRUCT: the field SET is closed, but a
        // PRESENT (non-null) field not covered by `properties` or a
        // `patternProperties` regex is still an additional property
        // (/root/reference/validator.go:252-266 under the NULL=absent
        // convention) — `false` requires it absent, the subschema form
        // applies to its value
        node.additionalProperties.foreach { ap =>
          val extra = st.fields.filterNot(f =>
            node.properties.exists(_._1 == f.name) ||
              node.patternProperties.exists(p =>
                Formats.staticPatternMatch(f.name, p._1)))
          ap match {
            case Left(true) =>
            case Left(false) =>
              extra.foreach { f =>
                add(kw("additionalProperties"), vac(v, v.getField(f.name).isNull),
                  lstr(s"additionalProperties: unexpected property '${f.name}'"),
                  ErrorKind.AdditionalPropertiesK)
              }
            case Right(as) =>
              extra.foreach { f =>
                out ++= compile(spec, as, v.getField(f.name), f.dataType,
                  if (instPath.isEmpty) f.name else s"$instPath/${f.name}", stack, binder, depth + 1)
              }
          }
        }
        // unevaluatedProperties — static lowering over the struct's known
        // field set when the evaluated set is compile-time-known: a
        // statically-unevaluated field must be absent (NULL) under `false`,
        // or match the subschema otherwise; `true` is a no-op and must skip
        // the precompute entirely. Runtime-dependent evaluated sets
        // (anyOf/oneOf/if-then-else/dependentSchemas branches evaluating
        // properties) fall back to per-row branch-set column algebra.
        node.unevaluatedProperties.filter(_ != Left(true)).foreach { up =>
          try {
            val (evalKeys, evalPats, allEval) =
              staticEvaluatedProps(spec, node, kw("unevaluatedProperties"), stack)
            if (!allEval) {
              // static field-name test goes through the engine-paired hook
              // (Formats.staticPatternMatch), NOT raw java.util.regex — with a
              // custom engine registered, struct and map columns must agree on
              // which fields count as evaluated
              val uneval = st.fields.filterNot(f =>
                evalKeys.contains(f.name) ||
                  evalPats.exists(Formats.staticPatternMatch(f.name, _)))
              up match {
                case Left(true) =>
                case Left(false) =>
                  uneval.foreach { f =>
                    add(kw("unevaluatedProperties"), vac(v, v.getField(f.name).isNull),
                      lstr(s"unevaluatedProperties: unexpected property '${f.name}'"),
                      ErrorKind.UnevaluatedPropertiesK)
                  }
                case Right(us) =>
                  uneval.foreach { f =>
                    out ++= compile(spec, us, v.getField(f.name), f.dataType,
                      if (instPath.isEmpty) f.name else s"$instPath/${f.name}", stack, binder, depth + 1)
                  }
              }
            }
          } catch { case _: RuntimeEvalSet =>
            val contribs0 = evaluatedPropsContributions(spec, node,
              kw("unevaluatedProperties"),
              ch => coalesce(predicate(spec, ch, v, dt, stack, depth), lit(false)),
              k => if (fields.contains(k)) v.getField(k).isNotNull else lit(false),
              stack)
            // bind branch conditions once per row: the per-field OR-chains
            // below would otherwise embed each branch predicate tree O(F)
            // times (F fields x B branches plan growth)
            val contribs = contribs0.map(c =>
              if (c.unconditional) c
              else c.copy(cond = binder.fold(c.cond)(_.bind(c.cond))))
            if (!contribs.exists(c => c.unconditional && c.allEval)) {
              st.fields.foreach { f =>
                val covering = contribs.filter(c => c.allEval ||
                  c.keys.contains(f.name) ||
                  c.patterns.exists(Formats.staticPatternMatch(f.name, _)))
                if (!covering.exists(_.unconditional)) {
                  val evald = coalesce(
                    covering.map(_.cond).reduceOption(_ || _).getOrElse(lit(false)),
                    lit(false))
                  up match {
                    case Left(true) =>
                    case Left(false) =>
                      add(kw("unevaluatedProperties"),
                        vac(v, v.getField(f.name).isNull || evald),
                        lstr(s"unevaluatedProperties: unexpected property '${f.name}'"),
                        ErrorKind.UnevaluatedPropertiesK)
                    case Right(us) =>
                      out ++= compile(spec, us, v.getField(f.name), f.dataType,
                        if (instPath.isEmpty) f.name else s"$instPath/${f.name}",
                        stack, binder, depth + 1)
                        .map(c => c.copy(pred = evald || c.pred))
                  }
                }
              }
            }
          }
        }
      case MapType(StringType, vt, _) =>
        val keys = map_keys(v)
        node.requiredProps.foreach { k =>
          add(kw("required"), vac(v, array_contains(keys, k)),
            lstr(s"required: missing property '$k'"),
            ErrorKind.RequiredK(k))
        }
        node.properties.foreach { case (k, ps) =>
          val p = predicate(spec, ps, element_at(v, k), vt, stack, depth + 1)
          add(kw("properties", k), vac(v, !array_contains(keys, k) || coalesce(p, lit(false))),
            lstr(s"properties/$k: value does not match"),
            ErrorKind.PropertiesK(k))
        }
        node.patternProperties.foreach { case (re, ps) =>
          // key matching goes through the pluggable regex engine, like
          // `pattern` (the reference's UseRegexpEngine governs both,
          // /root/reference/compiler.go:141-151)
          val sub = map_filter(v, (k, _) => Formats.patternMatch(k, re))
          val p = forall(map_values(sub), x => coalesce(predicate(spec, ps, x, vt, stack, depth + 1), lit(false)))
          add(kw("patternProperties", re), vac(v, p),
            lstr(s"patternProperties: value(s) for keys matching '$re' do not match"),
            ErrorKind.PatternPropertiesK(re))
        }
        node.propertyNames.foreach { ps =>
          val p = forall(keys, k => coalesce(predicate(spec, ps, k, StringType, stack, depth + 1), lit(false)))
          add(kw("propertyNames"), vac(v, p), lstr("propertyNames: key does not match"),
            ErrorKind.PropertyNamesK("*"))
        }
        node.dependentSchemas.foreach { case (k, ds) =>
          val present = array_contains(keys, k)
          compile(spec, ds, v, dt, instPath, stack, binder, depth).foreach { c =>
            out += c.copy(pred = !coalesce(present, lit(false)) || c.pred)
          }
        }
        node.dependentRequired.foreach { case (k, reqs) =>
          val present = array_contains(keys, k)
          val core = reqs.map(r => array_contains(keys, r))
            .reduceOption(_ && _).getOrElse(lit(true))
          add(kw("dependentRequired", k),
            vac(v, !coalesce(present, lit(false)) || coalesce(core, lit(false))),
            lstr(s"dependentRequired: '$k' present but ${reqs.mkString(",")} missing"),
            ErrorKind.DependentRequiredK(k, reqs))
        }
        // unevaluatedProperties over map columns: residual key algebra
        // against the statically-merged evaluated set (keys ∪ patterns from
        // this node + allOf/$ref closure); `true` is a no-op and skips the
        // precompute. Runtime-dependent evaluated sets fall back to per-row
        // branch-set column algebra (see evaluatedPropsContributions).
        node.unevaluatedProperties.filter(_ != Left(true)).foreach { up =>
          def lower(isEval: Column => Column): Unit = up match {
            case Left(true) =>
            case Left(false) =>
              add(kw("unevaluatedProperties"),
                vac(v, forall(keys, k => coalesce(isEval(k), lit(false)))),
                lstr("unevaluatedProperties: unexpected key(s)"),
                ErrorKind.UnevaluatedPropertiesK)
            case Right(us) =>
              val rem = map_filter(v, (k, _) => !coalesce(isEval(k), lit(false)))
              val p = forall(map_values(rem),
                x => coalesce(predicate(spec, us, x, vt, stack, depth + 1), lit(false)))
              add(kw("unevaluatedProperties"), vac(v, p),
                lstr("unevaluatedProperties: unevaluated value(s) do not match"),
                ErrorKind.UnevaluatedPropertiesK)
          }
          try {
            val (evalKeys, evalPats, allEval) =
              staticEvaluatedProps(spec, node, kw("unevaluatedProperties"), stack)
            if (!allEval) lower(k => nameCovered(k, evalKeys, evalPats))
          } catch { case _: RuntimeEvalSet =>
            val contribs0 = evaluatedPropsContributions(spec, node,
              kw("unevaluatedProperties"),
              ch => coalesce(predicate(spec, ch, v, dt, stack, depth), lit(false)),
              k => array_contains(keys, k), stack)
            val contribs = contribs0.map(c =>
              if (c.unconditional) c
              else c.copy(cond = binder.fold(c.cond)(_.bind(c.cond))))
            if (!contribs.exists(c => c.unconditional && c.allEval))
              lower { k =>
                contribs.map { c =>
                  if (c.allEval) c.cond
                  else if (c.unconditional) nameCovered(k, c.keys, c.patterns)
                  else c.cond && nameCovered(k, c.keys, c.patterns)
                }.reduceOption(_ || _).getOrElse(lit(false))
              }
          }
        }
        node.additionalProperties.foreach { ap =>
          def isKnown(k: Column): Column =
            nameCovered(k, node.properties.map(_._1), node.patternProperties.map(_._1))
          ap match {
            case Left(false) =>
              add(kw("additionalProperties"), vac(v, forall(keys, isKnown)),
                lstr("additionalProperties: unexpected key(s)"),
                ErrorKind.AdditionalPropertiesK)
            case Left(true) =>
            case Right(as) =>
              val rem = map_filter(v, (k, _) => !isKnown(k))
              val p = forall(map_values(rem), x => coalesce(predicate(spec, as, x, vt, stack, depth + 1), lit(false)))
              add(kw("additionalProperties"), vac(v, p),
                lstr("additionalProperties: value(s) do not match"),
                ErrorKind.AdditionalPropertiesK)
          }
        }
        node.minProperties.foreach { n =>
          add(kw("minProperties"), vac(v, size(keys) >= n),
            concat(lstr("minProperties: got "), size(keys).cast(StringType), lstr(s", want >= $n")),
            ErrorKind.MinProperties(n))
        }
        node.maxProperties.foreach { n =>
          add(kw("maxProperties"), vac(v, size(keys) <= n),
            concat(lstr("maxProperties: got "), size(keys).cast(StringType), lstr(s", want <= $n")),
            ErrorKind.MaxProperties(n))
        }
      case _ =>
    }

    // composition (/root/reference/validator.go:552-631)
    node.allOf.foreach { ch => out ++= compile(spec, ch, v, dt, instPath, stack, binder, depth) }
    if (node.anyOf.nonEmpty) {
      val ps = node.anyOf.map(ch => predicate(spec, ch, v, dt, stack, depth))
      add(kw("anyOf"), vac(v, ps.reduce(_ || _)), lstr("anyOf: no subschema matched"),
        ErrorKind.AnyOfK)
    }
    if (node.oneOf.nonEmpty) {
      val cnt = node.oneOf
        .map(ch => when(coalesce(predicate(spec, ch, v, dt, stack, depth), lit(false)), 1).otherwise(0))
        .reduce(_ + _)
      add(kw("oneOf"), vac(v, cnt === 1),
        concat(lstr("oneOf: "), cnt.cast(StringType), lstr(" subschemas matched, want exactly 1")),
        ErrorKind.OneOfK(node.oneOf.size))
    }
    node.not.foreach { ch =>
      add(kw("not"), vac(v, !coalesce(predicate(spec, ch, v, dt, stack, depth), lit(false))),
        lstr("not: subschema matched"),
        ErrorKind.NotK)
    }
    // if/then/else — conditional gating of the branch checks
    // (/root/reference/validator.go:622-630); a LITERAL boolean `if` prunes
    // the dead branch before compilation, so an unresolvable $ref inside it
    // is never resolved (objcompiler.go:226-237 analogue, but at OUR compile
    // time rather than Catalyst's — ref resolution happens here)
    node.ifS.foreach { ifn =>
      ifn.boolSchema match {
        case Some(true) => node.thenS.foreach { tn =>
          out ++= compile(spec, tn, v, dt, instPath, stack, binder, depth)
        }
        case Some(false) => node.elseS.foreach { en =>
          out ++= compile(spec, en, v, dt, instPath, stack, binder, depth)
        }
        case None =>
          val ifPred = coalesce(predicate(spec, ifn, v, dt, stack, depth), lit(false))
          node.thenS.foreach { tn =>
            compile(spec, tn, v, dt, instPath, stack, binder, depth).foreach { c =>
              out += c.copy(pred = !ifPred || c.pred)
            }
          }
          node.elseS.foreach { en =>
            compile(spec, en, v, dt, instPath, stack, binder, depth).foreach { c =>
              out += c.copy(pred = ifPred || c.pred)
            }
          }
      }
    }

    out.result()
  }
}
