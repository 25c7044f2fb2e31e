package graft

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.compile.SuiteCompiler
import graft.spec.{MetaSpec, Spec, SpecError}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Error-surface fuzz: randomly mutated spec documents must ALWAYS either
  * compile or fail with a typed [[SpecError]] — never a raw exception. This
  * is the reference's error contract (every malformed schema becomes a
  * structured SchemaValidationError, /root/reference/roots.go:240-248), and
  * the property the CLI's exit-2 path depends on. The meta gate must
  * likewise never throw anything but SpecError on arbitrary document shapes.
  */
class FuzzSpec extends SparkTestBase {

  private val mapper = new ObjectMapper()
  private val rnd = new scala.util.Random(42)

  graft.audio.AudioGen.registerFormats() // constraint families for base 5

  private val bases = Seq(
    """{"columns":{
         "a":{"type":"integer","minimum":0,"maximum":100,"multipleOf":5},
         "s":{"minLength":2,"pattern":"^x","format":"uuid"},
         "m":{"properties":{"k":{"enum":["p","q"]}},"required":["k"],
              "patternProperties":{"^n_":{"minimum":0}},
              "additionalProperties":false}},
        "required":["a"],
        "table":{"unique":["a"],"stats":["a"]}}""",
    """{"$defs":{"core":{"$anchor":"core","exclusiveMinimum":0}},
        "columns":{"a":{"$ref":"#core"},
                   "j":{"json":{"type":"object","properties":{"x":{"type":"number"}},
                        "items":{"minimum":1}}}},
        "row":[{"if":{"properties":{"a":{"minimum":50}}},
                "then":{"properties":{"s":{"minLength":1}}}}]}""",
    """{"columns":{"arr":{"items":[{"minimum":1}],"additionalItems":{"maximum":9},
                          "contains":{"multipleOf":2},"minItems":1},
                   "s":{"dependencies":{"a":["b"]}}}}""",
    // r4b surfaces: embedded $id resources, definitions containers,
    // $vocabulary annotations — mutations must stay typed here too
    """{"$defs":{"res":{"$id":"urn:graft:fuzz","minimum":1},
                 "lib":{"definitions":{"old":{"maximum":9}}}},
        "columns":{"a":{"allOf":[{"$ref":"#/$defs/lib/definitions/old"},
                                 {"$ref":"urn:graft:fuzz"}]},
                   "s":{"$vocabulary":{"https://example.com/v":true},
                        "minLength":1}}}""",
    // r5 surfaces: registered constraint families — shape gates and parse
    // callbacks must stay typed under arbitrary mutation too
    """{"columns":{},
        "table":{
          "audioSignal":{"bytes":"s","key":"a","srHz":"a",
                         "maxClippingRatio":0.01,"minRmsDb":-60,
                         "srConsistent":true},
          "transcriptConsistency":{"transcript":"s","key":"a","durMs":"a",
                                   "minCharsPerSec":6,"maxCharsPerSec":40,
                                   "requireNonEmptyOverMs":1000},
          "containerMagic":{"bytes":"s","key":"a","codec":"s",
            "magics":{"wav":[{"offset":0,"ascii":"RIFF"},
                             {"offset":8,"ascii":"WAVE"}]}}}}""")

  private val schema = StructType(Seq(
    StructField("a", IntegerType), StructField("s", StringType),
    StructField("m", MapType(StringType, StringType)),
    StructField("j", StringType),
    StructField("arr", ArrayType(LongType))))

  private def randomScalar() = rnd.nextInt(6) match {
    case 0 => mapper.getNodeFactory.numberNode(rnd.nextInt(200) - 50)
    case 1 => mapper.getNodeFactory.textNode(rnd.alphanumeric.take(4).mkString)
    case 2 => mapper.getNodeFactory.booleanNode(rnd.nextBoolean())
    case 3 => mapper.getNodeFactory.nullNode()
    case 4 => mapper.getNodeFactory.numberNode(-1.5)
    case _ => mapper.getNodeFactory.arrayNode()
  }

  private def mutate(json: String): String = {
    val root = mapper.readTree(json)
    val objs = scala.collection.mutable.ArrayBuffer.empty[ObjectNode]
    def walk(n: com.fasterxml.jackson.databind.JsonNode): Unit = {
      n match { case o: ObjectNode => objs += o; case _ => }
      n.elements().asScala.foreach(walk)
      if (n.isObject) n.fieldNames().asScala.toList.foreach(f => walk(n.get(f)))
    }
    walk(root)
    if (objs.nonEmpty) {
      val o = objs(rnd.nextInt(objs.size))
      val fields = o.fieldNames().asScala.toList
      rnd.nextInt(3) match {
        case 0 => o.set[ObjectNode](s"zz_${rnd.nextInt(100)}", randomScalar())
        case 1 if fields.nonEmpty =>
          o.set[ObjectNode](fields(rnd.nextInt(fields.size)), randomScalar())
        case 2 if fields.nonEmpty => o.remove(fields(rnd.nextInt(fields.size)))
        case _ => o.set[ObjectNode]("type", randomScalar())
      }
    }
    root.toString
  }

  test("665 mutated specs: typed SpecError or clean compile, never a raw crash") {
    var compiled = 0; var typedRejects = 0
    bases.foreach { base =>
      (1 to 133).foreach { _ =>
        var doc = base
        (0 until 1 + rnd.nextInt(3)).foreach(_ => doc = mutate(doc))
        try {
          val spec = Spec.fromJson(doc)
          SuiteCompiler.compile(spec, schema)
          compiled += 1
        } catch {
          case _: SpecError => typedRejects += 1
          case e: Throwable =>
            fail(s"NON-TYPED failure ${e.getClass.getSimpleName}: ${e.getMessage}\nspec: $doc")
        }
      }
    }
    // both outcomes must actually occur, or the fuzz isn't exercising much
    assert(compiled > 10, s"only $compiled compiled")
    assert(typedRejects > 10, s"only $typedRejects rejected")
  }

  test("meta gate never throws a non-SpecError on arbitrary mutants") {
    bases.foreach { base =>
      (1 to 25).foreach { _ =>
        val doc = mutate(mutate(base))
        try MetaSpec.violations(spark, doc)
        catch {
          case _: SpecError => // acceptable: e.g. a mutated meta-input
          case e: Throwable =>
            fail(s"meta gate crashed with ${e.getClass.getSimpleName}: ${e.getMessage}\nspec: $doc")
        }
      }
    }
  }
  test("no 'Max iterations' optimizer warnings on the formerly-worst workloads") {
    // round-3 verdict: 176 such WARN lines per sbt run, clustered around
    // FuzzSpec/meta validation — fixed by layered binding Projects. Guard it
    // with a live log capture around the heaviest plans.
    import org.apache.logging.log4j.LogManager
    import org.apache.logging.log4j.core.LoggerContext
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.LogEvent
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val appender = new AbstractAppender(
        "graft-maxiter-capture", null, null, true,
        org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
      override def append(e: LogEvent): Unit = {
        val m = e.getMessage.getFormattedMessage
        if (m.contains("Max iterations")) captured.add(m)
      }
    }
    appender.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val rootCfg = ctx.getConfiguration.getRootLogger
    rootCfg.addAppender(appender, org.apache.logging.log4j.Level.WARN, null)
    ctx.updateLoggers()
    try {
      // meta validation (the worst offender pre-fix) + a deep dynamic spec
      MetaSpec.violations(spark, MetaSpec.document)
      val deep = Spec.fromJson(
        """{"columns":{"j":{"json":{"type":"object","properties":{
             "a":{"type":"object","properties":{"b":{"type":"object",
               "properties":{"c":{"type":"array","items":{"type":"object",
                 "properties":{"d":{"enum":[1,2,3]},"e":{"pattern":"x"}}}}}}}}}}}}}""")
      import spark.implicits._
      val df = Seq("""{"a":{"b":{"c":[{"d":1,"e":"xx"}]}}}""").toDF("j")
      graft.exec.Validator.violations(df,
        SuiteCompiler.compile(deep, df.schema), Seq("j")).count()
    } finally {
      rootCfg.removeAppender("graft-maxiter-capture")
      ctx.updateLoggers()
      appender.stop()
    }
    assert(captured.isEmpty,
      s"optimizer hit its iteration cap: ${captured.size} warnings, first: ${captured.peek()}")
  }
}
