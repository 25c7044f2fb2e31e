package graft.output

import graft.compile.ErrorKind
import graft.compile.ErrorKind._

/** Locale-keyed rendering of typed [[ErrorKind]]s — the analogue of the
  * reference's `LocalizedString` split (/root/reference/kind/kind.go): the
  * violation ROW keeps the engine-rendered detail (with runtime values),
  * while programmatic consumers and the human-facing output formats can ask
  * for the constraint's message in a registered locale, rendered from the
  * kind's compile-time parameters.
  *
  * Catalogs are partial: unknown kinds (and unregistered locales) fall back
  * to English, then to the bare keyword — a partial translation never
  * crashes rendering.
  */
object Messages {

  type Catalog = PartialFunction[ErrorKind, String]

  private val english: Catalog = {
    case FalseSchema            => "false schema: always fails"
    case NotK                   => "schema matched when it must not"
    case AnyOfK                 => "no subschema matched"
    case OneOfK(n)              => s"exactly 1 of $n subschemas must match"
    case TypeMismatch(want)     => s"type must be ${want.mkString(" or ")}"
    case EnumK(want)            => s"value must be one of ${want.mkString(", ")}"
    case ConstK(want)           => s"value must be $want"
    case FormatK(f)             => s"value must be a valid $f"
    case Minimum(b)             => s"value must be >= $b"
    case Maximum(b)             => s"value must be <= $b"
    case ExclusiveMinimum(b)    => s"value must be > $b"
    case ExclusiveMaximum(b)    => s"value must be < $b"
    case MultipleOf(m)          => s"value must be a multiple of $m"
    case MinLength(n)           => s"length must be >= $n characters"
    case MaxLength(n)           => s"length must be <= $n characters"
    case PatternK(p)            => s"value must match pattern '$p'"
    case ContentEncodingK(e)    => s"value must be valid $e"
    case ContentMediaTypeK(mt)  => s"value must be valid $mt"
    case ParseError             => "value must be valid JSON"
    case MinItems(n)            => s"array must have >= $n items"
    case MaxItems(n)            => s"array must have <= $n items"
    case UniqueItemsK           => "array items must be unique"
    case ItemsK                 => "array items must match the item schema"
    case PrefixItemsK(i)        => s"item $i must match its prefix schema"
    case ContainsK(min, max)    =>
      s"array must contain >= $min matching item(s)" +
        max.map(m => s" and <= $m").getOrElse("")
    case UnevaluatedItemsK      => "array has unevaluated items"
    case MinProperties(n)       => s"object must have >= $n properties"
    case MaxProperties(n)       => s"object must have <= $n properties"
    case RequiredK(p)           => s"property '$p' is required"
    case DependentRequiredK(k, missing) =>
      s"property '$k' requires ${missing.mkString(", ")}"
    case AdditionalPropertiesK  => "object has unexpected properties"
    case PropertyNamesK(p)      => s"property name '$p' does not match"
    case PatternPropertiesK(p)  => s"values for keys matching '$p' do not match"
    case PropertiesK(k)         => s"property '$k' does not match its schema"
    case UnevaluatedPropertiesK => "object has unevaluated properties"
    case DepthExceeded(d)       =>
      s"value nests deeper than the compiled recursion depth $d"
    case TableConstraintK(f)    => s"table constraint '$f' violated"
    case CustomK(kw)            => s"constraint '$kw' violated"
  }

  @volatile private var catalogs: Map[String, Catalog] = Map("en" -> english)

  /** Register (or extend) a locale's catalog; partial catalogs compose with
    * the English fallback per kind.
    */
  def register(locale: String, catalog: Catalog): Unit = synchronized {
    val merged = catalogs.get(locale).map(catalog.orElse(_)).getOrElse(catalog)
    catalogs = catalogs + (locale -> merged)
  }

  def knownLocales: Set[String] = catalogs.keySet

  /** Render a kind's constraint message in `locale` (English fallback per
    * kind, then the bare keyword).
    */
  def render(kind: ErrorKind, locale: String = "en"): String =
    catalogs.get(locale).flatMap(_.lift(kind))
      .orElse(english.lift(kind))
      .getOrElse(kind.keyword)

  /** Localized (keyword path → message) index for a compiled suite — lets
    * output renderers translate violation rows (which carry the keyword
    * path) without re-running anything. Covers BOTH row-level checks and
    * table constraints (unique / foreignKey / drift violation rows carry
    * the constraint's shared `keywordPath`); custom families keep their
    * engine-rendered detail (their message shape is theirs to define).
    */
  def forSuite(suite: graft.compile.CompiledSuite,
               locale: String): Map[String, String] = {
    import graft.spec.{Unique, ForeignKey, Drift}
    val tbl = suite.tableConstraints.flatMap {
      case u: Unique     => Some(u.keywordPath -> render(TableConstraintK("unique"), locale))
      case fk: ForeignKey => Some(fk.keywordPath -> render(TableConstraintK("foreignKey"), locale))
      case d: Drift      => Some(d.keywordPath -> render(TableConstraintK("drift"), locale))
      case _             => None
    }
    (suite.rowChecks.map(c => c.keywordPath -> render(c.kind, locale)) ++ tbl).toMap
  }
}
