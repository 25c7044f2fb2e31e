package graft

import com.fasterxml.jackson.databind.JsonNode
import graft.compile.SuiteCompiler
import graft.exec.Validator
import graft.spec.Spec
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Batch 7: the exact-rational conformance corpus
  * (resources/conformance/exact_rationals.json — pinned against the
  * reference's big.Rat semantics, /root/reference/validator.go:516-549,
  * util.go:322-325) replayed as one oracle-checked query, q_refsuite-style:
  * each group's rows run through the real compile → annotate path (typed
  * and dynamic arms both appear in the corpus), the oracle is the corpus's
  * own expected verdicts as literal rows. A hash match means every
  * precision cliff the corpus encodes — >12-fractional-digit divisors,
  * one-ulp bound comparisons, 29-digit integers, Long.MAX divisibility —
  * verdicts exactly as the reference's rational arithmetic does.
  */
object Queries7 {

  // digit-exact: corpus specs carry >17-significant-digit constants
  private val mapper = graft.spec.Spec.jsonMapper

  private def corpus: JsonNode =
    mapper.readTree(getClass.getResourceAsStream(
      "/conformance/exact_rationals.json"))

  private def sparkType(name: String): DataType = name match {
    case "int"    => IntegerType
    case "long"   => LongType
    case "double" => DoubleType
    case "string" => StringType
    case "array_double" => ArrayType(DoubleType)
    case other => throw new IllegalArgumentException(
      s"exact_rationals corpus: unsupported column type '$other'")
  }

  private def valueOf(n: JsonNode, dt: DataType): Any =
    if (n == null || n.isNull) null
    else dt match {
      case IntegerType => n.asInt()
      case LongType    => n.asLong()
      case DoubleType  => n.asDouble()
      case StringType  => n.asText()
      case ArrayType(et, _) => n.asScala.map(valueOf(_, et)).toSeq
      case _ => throw new IllegalArgumentException(s"unsupported $dt")
    }

  /** Engine verdicts per (grp, idx) across every corpus group. Each group
    * is a handful of rows against its own spec; the frames union into one
    * result ordered (grp, idx) for the hash compare.
    */
  def qExactRationals(spark: SparkSession, dir: String): DataFrame = {
    val parts = corpus.asScala.zipWithIndex.map { case (group, gi) =>
      val schemaNode = group.get("schema")
      val fields = schemaNode.fieldNames().asScala.toSeq
        .map(f => StructField(f, sparkType(schemaNode.get(f).asText())))
      val schema = StructType(StructField("idx", IntegerType, nullable = false) +: fields)
      val rows = group.get("tests").asScala.toSeq.zipWithIndex.map { case (t, i) =>
        val rowNode = t.get("row")
        Row.fromSeq(i +: fields.map(f => valueOf(rowNode.get(f.name), f.dataType)))
      }
      val df = spark.createDataFrame(rows.asJava, schema)
      val suite = SuiteCompiler.compile(Spec.parse(group.get("spec")), df.schema)
      Validator.annotate(df, suite)
        .select(lit(gi).as("grp"), col("idx"), col("valid"))
    }
    parts.reduce(_ unionAll _).orderBy("grp", "idx")
  }

  /** Oracle: the corpus's own expected verdicts as literal rows. */
  def sqlExactRationals: String = {
    val rows = corpus.asScala.zipWithIndex.flatMap { case (group, gi) =>
      group.get("tests").asScala.zipWithIndex.map { case (t, i) =>
        s"($gi, $i, ${if (t.get("valid").asBoolean()) "TRUE" else "FALSE"})"
      }
    }
    s"""SELECT grp, idx, valid
        FROM (VALUES ${rows.mkString(",\n  ")}) AS t(grp, idx, valid)
        ORDER BY grp, idx"""
  }

  /** (query, oracle) registry for this batch. */
  def registry: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q_exact_rationals" -> ((qExactRationals _, sqlExactRationals))
  )
}
