package graft.compile

/** Typed error kinds — the engine's analogue of the reference's `ErrorKind`
  * hierarchy (/root/reference/kind/kind.go): every compiled [[Check]]
  * carries the typed, statically-known parameters of the keyword it
  * enforces, so programmatic consumers dispatch on the kind instead of
  * parsing rendered strings (the reference's LocalizedString split).
  *
  * Divergence note: the reference's kinds also carry the offending runtime
  * value (`Got`); in a vectorized engine the runtime value lives in the
  * violation ROW (the rendered `detail` column), while the kind here holds
  * the compile-time side (bounds, patterns, expected sets).
  */
sealed trait ErrorKind {
  /** The keyword this kind reports — matches the keywordPath leaf. */
  def keyword: String
}

object ErrorKind {
  // composition (kind.go:53-133)
  case object FalseSchema extends ErrorKind { val keyword = "false" }
  case object NotK extends ErrorKind { val keyword = "not" }
  case object AnyOfK extends ErrorKind { val keyword = "anyOf" }
  final case class OneOfK(subschemas: Int) extends ErrorKind { val keyword = "oneOf" }

  // type-agnostic (kind.go:136-236)
  final case class TypeMismatch(want: Set[String]) extends ErrorKind { val keyword = "type" }
  final case class EnumK(want: Seq[String]) extends ErrorKind { val keyword = "enum" }
  final case class ConstK(want: String) extends ErrorKind { val keyword = "const" }
  final case class FormatK(format: String) extends ErrorKind { val keyword = "format" }

  // numbers (kind.go:531-616)
  final case class Minimum(bound: BigDecimal) extends ErrorKind { val keyword = "minimum" }
  final case class Maximum(bound: BigDecimal) extends ErrorKind { val keyword = "maximum" }
  final case class ExclusiveMinimum(bound: BigDecimal) extends ErrorKind { val keyword = "exclusiveMinimum" }
  final case class ExclusiveMaximum(bound: BigDecimal) extends ErrorKind { val keyword = "exclusiveMaximum" }
  final case class MultipleOf(factor: BigDecimal) extends ErrorKind { val keyword = "multipleOf" }

  // strings (kind.go:445-517)
  final case class MinLength(n: Int) extends ErrorKind { val keyword = "minLength" }
  final case class MaxLength(n: Int) extends ErrorKind { val keyword = "maxLength" }
  final case class PatternK(pattern: String) extends ErrorKind { val keyword = "pattern" }
  final case class ContentEncodingK(encoding: String) extends ErrorKind { val keyword = "contentEncoding" }
  final case class ContentMediaTypeK(mediaType: String) extends ErrorKind { val keyword = "contentMediaType" }
  case object ParseError extends ErrorKind { val keyword = "!parse" }

  // arrays (kind.go:266-443)
  final case class MinItems(n: Int) extends ErrorKind { val keyword = "minItems" }
  final case class MaxItems(n: Int) extends ErrorKind { val keyword = "maxItems" }
  case object UniqueItemsK extends ErrorKind { val keyword = "uniqueItems" }
  case object ItemsK extends ErrorKind { val keyword = "items" }
  final case class PrefixItemsK(index: Int) extends ErrorKind { val keyword = "prefixItems" }
  final case class ContainsK(min: Int, max: Option[Int]) extends ErrorKind { val keyword = "contains" }
  case object UnevaluatedItemsK extends ErrorKind { val keyword = "unevaluatedItems" }

  // objects (kind.go:238-381)
  final case class MinProperties(n: Int) extends ErrorKind { val keyword = "minProperties" }
  final case class MaxProperties(n: Int) extends ErrorKind { val keyword = "maxProperties" }
  final case class RequiredK(property: String) extends ErrorKind { val keyword = "required" }
  final case class DependentRequiredK(key: String, missing: Seq[String]) extends ErrorKind { val keyword = "dependentRequired" }
  case object AdditionalPropertiesK extends ErrorKind { val keyword = "additionalProperties" }
  final case class PropertyNamesK(property: String) extends ErrorKind { val keyword = "propertyNames" }
  final case class PatternPropertiesK(pattern: String) extends ErrorKind { val keyword = "patternProperties" }
  final case class PropertiesK(key: String) extends ErrorKind { val keyword = "properties" }
  case object UnevaluatedPropertiesK extends ErrorKind { val keyword = "unevaluatedProperties" }

  // recursive-$ref unroll cut (engine-specific: the compile-time-inlining
  // analogue of the reference's runtime infinite-loop guard,
  // /root/reference/validator.go:84-90): data present beyond the compiled
  // unroll depth fails with this kind instead of validating silently
  final case class DepthExceeded(unrollDepth: Int) extends ErrorKind { val keyword = "$ref" }

  // table / engine-level constraints (no reference counterpart — north rule)
  final case class TableConstraintK(family: String) extends ErrorKind { val keyword = family }
  final case class CustomK(keyword: String) extends ErrorKind
}
