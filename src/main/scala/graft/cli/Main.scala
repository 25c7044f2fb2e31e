package graft.cli

import graft.audio.AudioGen
import graft.exec.{Engine, Validator}
import graft.compile.SuiteCompiler
import graft.spec.{Spec, SpecError}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** spark-submit entry point — the engine's analogue of the reference's `jv`
  * CLI (/root/reference/cmd/jv/main.go:16-218): compile a spec, validate a
  * table, print a verdict in one of several output formats, exit non-zero on
  * invalid data (1) or usage/spec errors (2) — same exit-code contract as
  * /root/reference/README.md:80.
  *
  * Usage:
  *   graft.cli.Main --spec <file|'clip-suite'> --table <parquet dir|'synth:N'>
  *     [--key col1,col2] [--output flag|basic|summary|detailed|simple|alt] [--violations-out dir]
  *     [--ref name=parquetDir]... [--master local[N]]
  */
object Main {

  def main(args: Array[String]): Unit = {
    // help exits BEFORE the SparkSession spin-up (jv -h analogue)
    if (args.contains("--help") || args.contains("-h")) {
      println(
        """usage: graft.cli.Main [MODE OPTIONS]
          |
          |Table mode (validate a parquet table against a constraint spec):
          |  --spec <file|url|clip-suite|clip-suite-deep|clip-suite-signal>
          |  --table <parquet dir|synth:N>   [--key col1,col2]
          |  [--output flag|basic|summary|detailed|simple|alt] [--limit N]
          |  [--violations-out dir] [--ref name=parquetDir]...
          |  [--ledger dir --partition-col col]  (resumable partition-wise run)
          |  [--locale tag] [--no-metaspec] [--master local[N]]
          |
          |jv mode (validate JSON instances against a bare JSON Schema):
          |  --json-schema <file|url|->  --instance <file|-> [--instance ...]
          |  [--draft 4|6|7|2019|2020] [--map url_prefix=dir]... [--quiet]
          |  [--assert-format] [--assert-content] [--no-metaspec]
          |  [--insecure] [--cacert pem-file]
          |  [--output simple|alt|flag|basic|detailed]
          |  An OFFICIAL meta-schema URL as --json-schema lints the
          |  instance files as JSON Schema documents.
          |
          |Exit codes: 0 valid, 1 violations/compile failure, 2 usage or
          |spec errors.""".stripMargin)
      return
    }
    val opts = parseArgs(args.toList, Map.empty)
    def opt(k: String): Option[String] = opts.get(k)

    val spark = SparkSession.builder()
      .master(opt("master").getOrElse("local[*]"))
      .appName("graft-validate")
      .config("spark.sql.shuffle.partitions",
        opt("shuffle-partitions").getOrElse("32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try {
      AudioGen.registerFormats()
      // --insecure / --cacert → loader-layer TLS options (jv -k / --cacert,
      // /root/reference/cmd/jv/loader.go:17-35). A missing/unreadable PEM
      // file is a usage-level error (exit 2), like the reference's
      // newLoader failure path (main.go:136-140); the PEM content itself is
      // not validated here (the reference's AppendCertsFromPEM is likewise
      // silent on malformed input).
      if (opts.contains("insecure") || opts.contains("cacert")) {
        val pem = opt("cacert").map { f =>
          try new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(f)), java.nio.charset.StandardCharsets.UTF_8)
          catch { case e: java.io.IOException =>
            System.err.println(s"error: --cacert $f: ${e.getMessage}")
            sys.exit(2)
          }
        }
        Spec.setTlsOptions(Spec.TlsOptions(
          insecureSkipVerify = opts.contains("insecure"), caCertPem = pem))
      }
      // jv-parity mode: validate standalone JSON instances against a bare
      // JSON Schema document (the reference CLI's primary UX,
      // /root/reference/cmd/jv/main.go: `jv [OPTIONS] SCHEMA [INSTANCE...]`)
      if (opts.contains("json-schema")) {
        jvMode(spark, opts)
        return
      }
      // (document, base URL for relative $ref / relative nested $id)
      val (specDoc, specBase): (com.fasterxml.jackson.databind.JsonNode, Option[String]) =
        opt("spec") match {
          case Some("clip-suite") => (Spec.documentFromJson(graft.ClipSuite.specJson), None)
          case Some("clip-suite-deep") => (Spec.documentFromJson(graft.ClipSuite.deepSpecJson), None)
          case Some("clip-suite-signal") => (Spec.documentFromJson(graft.ClipSuite.signalSpecJson), None)
          // anything URL-shaped routes through the loader registry — an
          // unregistered scheme is then a TYPED SpecError (exit 2), not a raw
          // FileNotFoundException from treating "s3://..." as a local path
          case Some(url) if url.contains("://") || (url.indexOf(':') > 0 &&
              Spec.knownSchemes.contains(url.substring(0, url.indexOf(':')))) =>
            (Spec.documentFromUrl(url), Some(url)) // scheme-routed (file://, inline+json:, custom)
          case Some(path) => (Spec.documentFromFile(path),
            Some("file://" + new java.io.File(path).getAbsolutePath)) // .json or .yaml/.yml
          case None => usage("missing --spec")
        }
      // self-hosted meta-spec gate before the typed parse (the reference
      // validates every schema against its metaschema before compiling,
      // roots.go:240-248); --no-metaspec skips it for trusted specs
      if (!opts.contains("no-metaspec")) graft.spec.MetaSpec.check(spark, specDoc)
      val parsedSpec: Spec = Spec.parse(specDoc, compat = false, specBase)
      val df: DataFrame = opt("table") match {
        case Some(t) if t.startsWith("synth:") =>
          AudioGen.clips(spark, t.stripPrefix("synth:").toLong)
        case Some(dir) => spark.read.parquet(dir)
        case None      => usage("missing --table")
      }
      val keyCols = opt("key").map(_.split(",").toSeq)
        .getOrElse(Seq(df.columns.head))
      val refs: Map[String, DataFrame] = opts.collect {
        case (k, v) if k.startsWith("ref:") => k.stripPrefix("ref:") -> v
      }.map { case (n, dir) =>
        n -> (if (dir == "builtin:ref_codecs") graft.ClipSuite.refCodecs(spark)
              else spark.read.parquet(dir))
      }

      // ledgered, resumable partition-wise run (north rule): requires a
      // Hive/Iceberg-style partitioned table dir + a partition column
      (opt("ledger"), opt("partition-col")) match {
        case (Some(ledgerDir), Some(partCol)) =>
          val tableDir = opt("table").get
          val out = opt("violations-out")
            .getOrElse(usage("--ledger needs --violations-out"))
          val r = graft.ledger.CheckpointedRun.run(spark, tableDir, partCol,
            parsedSpec, keyCols, ledgerDir, out, refs)
          val entries = graft.ledger.Ledger.read(ledgerDir)
          println(s"""{"processed":${r.processed.size},"resumed_skipped":${r.skipped.size},""" +
            s""""rows":${entries.map(_.rows).sum},"violations":${entries.map(_.violations).sum}}""")
          spark.stop()
          sys.exit(if (entries.map(_.violations).sum > 0) 1 else 0)
        case (Some(_), None) => usage("--ledger needs --partition-col")
        case _ =>
      }

      val suite = SuiteCompiler.compile(parsedSpec, df.schema)
      val mode = opt("output").getOrElse("summary")
      val invalid: Long = mode match {
        case "flag" =>
          // cheap boolResult path (/root/reference/output.go:114-122)
          val n = Validator.flag(df, suite)
            .filter(!org.apache.spark.sql.functions.col("valid")).count()
          println(s"""{"valid":${n == 0}}""")
          n
        case "basic" | "summary" | "detailed" | "simple" | "alt" =>
          val vios = Engine.allViolations(df, suite, keyCols, refs)
          val persisted = opt("violations-out") match {
            case Some(out) =>
              vios.write.mode("overwrite").parquet(out); spark.read.parquet(out)
            case None => vios
          }
          val n = persisted.count()
          val limit = opt("limit").map(_.toInt).getOrElse(20)
          // --locale: render the CONSTRAINT message from the typed kind in
          // the requested catalog (reference LocalizedString analogue);
          // default keeps the engine detail with runtime values
          val localeIdx = opt("locale")
            .map(l => graft.output.Messages.forSuite(suite, l))
          def units(df: org.apache.spark.sql.DataFrame) = {
            val us = graft.output.Output.collect(df, limit)
            localeIdx.map(graft.output.Output.localize(us, _)).getOrElse(us)
          }
          mode match {
            case "basic" =>
              // --locale applies here too: swap the engine detail for the
              // localized constraint message by keyword path
              persisted.orderBy("keyword", "instance_path").limit(limit)
                .collect()
                .foreach { r =>
                  val msg = localeIdx.flatMap(_.get(r.getString(0)))
                    .getOrElse(r.getString(2))
                  println(s"""${r.getString(0)}  ${r.getString(1)}  $msg""")
                }
              println(s"""{"valid":${n == 0},"violations":$n}""")
            case "detailed" =>
              println(graft.output.Output.detailedJson(units(persisted)))
            case "simple" =>
              print(graft.output.Output.simpleText(units(persisted), n))
            case "alt" =>
              print(graft.output.Output.altText(units(persisted), n))
            case _ =>
              println(s"""{"valid":${n == 0},"violations":$n}""")
          }
          n
        case other => usage(s"unknown --output '$other'")
      }
      spark.stop()
      if (invalid > 0) sys.exit(1)
    } catch {
      case e: SpecError =>
        System.err.println(e.getMessage)
        spark.stop()
        sys.exit(2)
    }
  }

  /** `jv SCHEMA [INSTANCE...]` parity (/root/reference/cmd/jv/main.go):
    *   --json-schema <file|url|-> --instance a.json [--instance b.json]...
    *   [--draft 4|6|7|2019|2020] [--map url_prefix=dir]... [--quiet]
    *   [--assert-format] [--assert-content]
    *   [--output simple|alt|flag|basic|detailed]
    * Output contract mirrors the reference: `schema X: ok|failed`, per
    * instance `instance Y: ok|failed` + the chosen output format for
    * failures; exit 1 on compile failure or any invalid instance, 2 on
    * usage errors. Schemas parse in reference-compat mode (open keywords);
    * `--draft` supplies the dialect when the document has no `$schema`
    * (injected as the official meta-schema URL, like jv's DefaultDraft).
    */
  private def jvMode(spark: SparkSession, opts: Map[String, String]): Unit = {
    val quiet = opts.contains("quiet")
    val outMode = opts.getOrElse("output", "simple")
    if (!Set("simple", "alt", "flag", "basic", "detailed").contains(outMode))
      usage(s"unknown --output '$outMode' for --json-schema mode")
    // --map url_prefix=dir → loader-registry mappings (jv -m analogue)
    val mappings = opts.get("map").toSeq.flatMap(_.split("\u0000")).map { m =>
      val i = m.indexOf('=')
      if (i <= 0 || i == m.length - 1) usage(s"invalid --map '$m'")
      val pre = m.substring(0, i)
      (if (pre.endsWith("/")) pre else pre + "/", m.substring(i + 1))
    }
    mappings.groupBy(_._1.takeWhile(_ != ':')).foreach { case (scheme, maps) =>
      Spec.registerLoader(scheme, { url =>
        maps.find { case (pre, _) => url.startsWith(pre) } match {
          case Some((pre, dir)) =>
            Spec.documentFromFile(
              new java.io.File(dir, url.stripPrefix(pre)).getPath)
          // re-registering http/https must not hide the bundled official
          // metaschemas — a schema with `$ref: "http://json-schema.org/
          // draft-07/schema#"` still resolves offline alongside --map
          case None if url.stripSuffix("#")
              .replaceFirst("^https?://json-schema\\.org/", "") !=
              url.stripSuffix("#") =>
            Spec.loadOfficialMeta(url)
          case None =>
            throw SpecError(url, s"no --map prefix matches this URL")
        }
      })
    }
    val schemaArg = opts.getOrElse("json-schema", usage("missing --json-schema"))
    // an OFFICIAL meta-schema as the schema = schema linting (the reference's
    // `jv https://json-schema.org/draft/2020-12/schema my-schema.json`):
    // routed through the flat position-walk validator — the recursive meta
    // cannot be compile-time inlined (see graft.spec.SchemaLint)
    if (graft.spec.SchemaLint.draftVersion(schemaArg).isDefined) {
      lintMode(spark, schemaArg, opts)
      return
    }
    val schemaDoc =
      if (schemaArg == "-")
        Spec.documentFromJson(scala.io.Source.stdin.mkString)
      else if (schemaArg.contains("://")) Spec.documentFromUrl(schemaArg)
      else Spec.documentFromFile(schemaArg) // .json or .yaml
    // --draft: dialect default when the document carries no $schema
    val draftUrl = opts.get("draft").map {
      case "4"    => "http://json-schema.org/draft-04/schema"
      case "6"    => "http://json-schema.org/draft-06/schema"
      case "7"    => "http://json-schema.org/draft-07/schema"
      case "2019" => "https://json-schema.org/draft/2019-09/schema"
      case "2020" => "https://json-schema.org/draft/2020-12/schema"
      case other  => usage(s"invalid --draft '$other' (4, 6, 7, 2019, 2020)")
    }
    val effectiveJson = schemaDoc.toString
    // address file/URL schemas by THEIR location so RELATIVE refs inside
    // them resolve against it (stdin has no addressable base and goes
    // through the inline document loader); --draft applies through the
    // dialect layer (Dialect.defaultDraftUrl — the reference's
    // DefaultDraft), never by rewriting the document, so the base survives
    val docUrl: Option[String] =
      if (schemaArg == "-") None
      else if (schemaArg.contains("://")) Some(schemaArg)
      else Some("file://" + new java.io.File(schemaArg).getAbsolutePath)
    val instSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("idx",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("j",
        org.apache.spark.sql.types.StringType)))
    // reference-CLI assertion defaults: format asserted only for draft<2019
    // (or when the meta-schema requires the format(-assertion) vocabulary),
    // content* never — each force-enabled by its flag
    // (/root/reference/cmd/jv/main.go:28-29,130-135)
    val jvAssert = Some((opts.contains("assert-format"),
      opts.contains("assert-content")))
    // META-GATE: validate the schema document against its draft's official
    // meta-schema BEFORE compiling — the reference does this for every
    // schema it compiles (/root/reference/roots.go:240-248). Dialect: the
    // document's own official $schema, else --draft, else the latest
    // (DefaultDraft). A custom (non-official) $schema skips the gate — we
    // cannot lint against a meta we don't bundle. --no-metaspec opts out.
    if (!opts.contains("no-metaspec")) {
      val docSchemaUrl = schemaDoc match {
        case o: com.fasterxml.jackson.databind.node.ObjectNode =>
          Option(o.get("$schema")).filter(_.isTextual).map(_.asText())
        case _ => None
      }
      val lintUrl = docSchemaUrl match {
        case Some(u) =>
          // official → lint with it; CUSTOM → lint through the default URL:
          // the walker resolves the root's custom meta (composed
          // $vocabulary suite, or the base draft's official meta when the
          // custom meta has none; unreachable metas keep the skip)
          Some(graft.spec.SchemaLint.draftVersion(u).map(_ => u).getOrElse(
            draftUrl.getOrElse("https://json-schema.org/draft/2020-12/schema")))
        case None =>
          Some(draftUrl.getOrElse("https://json-schema.org/draft/2020-12/schema"))
      }
      lintUrl.foreach { u =>
        val vios = graft.spec.SchemaLint.violations(spark, effectiveJson, u)
        if (vios.nonEmpty) {
          println(s"schema $schemaArg: failed")
          if (!quiet) vios.take(opts.get("limit").map(_.toInt).getOrElse(20))
            .foreach(v => println(s"${v.keyword}  ${v.path}  ${v.detail}"))
          spark.stop()
          sys.exit(1)
        }
      }
    }
    val (spec, suite) =
      try {
        val sp = docUrl match {
          case Some(u) => graft.Queries5.wrapSchemaUrl(u, jvAssert, draftUrl)
          case None    => graft.Queries5.wrapSchema(effectiveJson, jvAssert, draftUrl)
        }
        val s = SuiteCompiler.compile(sp, instSchema)
        println(s"schema $schemaArg: ok")
        (sp, s)
      } catch {
        case e: SpecError =>
          println(s"schema $schemaArg: failed")
          if (!quiet) println(e.getMessage)
          spark.stop()
          sys.exit(1)
      }
    // DEPTH-ADAPTIVE recursive validation: when the schema is recursive
    // (the compiled suite carries a $ref depth cut), each instance gets a
    // suite unrolled to ITS OWN nesting depth (memoized per depth) — the
    // reference validates recursion at any instance depth at runtime
    // (/root/reference/validator.go:767-811), and jv must match on e.g.
    // a depth-10 tree document. Non-recursive schemas keep the one suite.
    val suiteFor: String => graft.compile.CompiledSuite =
      if (!SuiteCompiler.hasDepthCut(suite)) _ => suite
      else {
        val memo = scala.collection.concurrent.TrieMap.empty[Int, graft.compile.CompiledSuite]
        text => {
          val d = math.min(graft.functions.JsonDepthExpr.maxDepth(text),
            graft.compile.CompileLimits.maxAdaptiveUnroll)
          if (d <= graft.compile.CompileLimits.maxRefUnroll) suite
          else try memo.getOrElseUpdate(d,
            SuiteCompiler.compileWithUnroll(spec, instSchema, d))
          catch {
            // a highly-branchy schema can exceed the compile-node budget at
            // this depth: fall back to the base suite, whose typed
            // DepthExceeded cut reports the instance as too deep (loud,
            // never silently valid)
            case _: SpecError => suite
          }
        }
      }
    var allValid = true
    opts.get("instance").toSeq.flatMap(_.split("\u0000")).foreach { path =>
      if (!quiet) println()
      val textOpt = readInstance(path, quiet)
      if (textOpt.isEmpty) allValid = false
      textOpt.foreach { text =>
        val df = spark.createDataFrame(
          java.util.Arrays.asList(org.apache.spark.sql.Row(0, text)), instSchema)
        val vios0 = Engine.allViolations(df, suiteFor(text), Seq("idx"), Map.empty)
        // strip the synthetic inline-document URL and the wrapper column
        // from reported coordinates so output reads like the reference's:
        // '#/properties/x/type' at '/x'
        val vios = {
          import org.apache.spark.sql.functions.regexp_replace
          import org.apache.spark.sql.functions.{col => cc}
          val urlQ = java.util.regex.Pattern.quote(
            docUrl.getOrElse(graft.Queries5.inlineUrl(effectiveJson)) + "#")
          vios0.select(
            regexp_replace(regexp_replace(cc("keyword"), urlQ, "#"),
              "^columns/j/json", "#").as("keyword"),
            regexp_replace(cc("instance_path"), "^0/j!json", "")
              .as("instance_path"),
            cc("detail"))
        }
        if (!reportInstance(path, vios, outMode,
            opts.get("limit").map(_.toInt).getOrElse(20), quiet))
          allValid = false
      }
    }
    spark.stop()
    sys.exit(if (allValid) 0 else 1)
  }

  /** Schema-document linting against an official meta-schema URL — each
    * `--instance` is a JSON Schema document validated by the flat node-walk
    * meta validator. Violations print as `<meta keyword>  <node pointer>
    * <detail>` lines.
    */
  private def lintMode(spark: SparkSession, metaUrl: String,
                       opts: Map[String, String]): Unit = {
    val quiet = opts.contains("quiet")
    // same output-format surface as jv mode (default: `basic`-style lines —
    // meta keyword, fused node+inner pointer, detail)
    val outMode = opts.getOrElse("output", "basic")
    if (!Set("simple", "alt", "flag", "basic", "detailed").contains(outMode))
      usage(s"unknown --output '$outMode' for meta-schema lint mode")
    val limit = opts.get("limit").map(_.toInt).getOrElse(20)
    println(s"schema $metaUrl: ok")
    var allValid = true
    opts.get("instance").toSeq.flatMap(_.split("\u0000")).foreach { path =>
      if (!quiet) println()
      val textOpt = readInstance(path, quiet)
      if (textOpt.isEmpty) allValid = false
      textOpt.foreach { text =>
        val vios = graft.spec.SchemaLint.violationsFrame(spark, text, metaUrl)
        if (!reportInstance(path, vios, outMode, limit, quiet))
          allValid = false
      }
    }
    spark.stop()
    sys.exit(if (allValid) 0 else 1)
  }

  /** Shared per-instance verdict + failure renderer for the jv and lint
    * loops: ONE pass over the violation frame (collect-then-count — these
    * frames are per-document and small), `--limit` honored in every mode.
    * Returns true when the instance is valid.
    */
  private def reportInstance(path: String,
                             vios: org.apache.spark.sql.DataFrame,
                             outMode: String, limit: Int,
                             quiet: Boolean): Boolean = {
    val rows = vios.orderBy("keyword", "instance_path").collect()
    if (rows.isEmpty) { println(s"instance $path: ok"); return true }
    println(s"instance $path: failed")
    if (!quiet) {
      val n = rows.length.toLong
      val units = rows.take(limit).map(r => graft.output.Output.Unit(
        r.getAs[String]("keyword"), r.getAs[String]("instance_path"),
        r.getAs[String]("detail"))).toSeq
      outMode match {
        case "flag"     => println(s"""{"valid":false}""")
        case "detailed" => println(graft.output.Output.detailedJson(units))
        case "alt"      => print(graft.output.Output.altText(units, n))
        case "simple"   => print(graft.output.Output.simpleText(units, n))
        case _ => units.foreach(u =>
          println(s"${u.keyword}  ${u.instancePath}  ${u.detail}"))
      }
    }
    false
  }

  /** Read an instance file (`-` = stdin); on failure print the reference's
    * `instance X: failed` line and return None (shared by the jv and lint
    * instance loops).
    */
  private def readInstance(path: String, quiet: Boolean): Option[String] =
    try Some(
      if (path == "-") scala.io.Source.stdin.mkString
      else { // malformed JSON is a per-row violation downstream, so only
             // unreadable files fail here
        val src = scala.io.Source.fromFile(path)
        try src.mkString finally src.close()
      })
    catch {
      case scala.util.control.NonFatal(e) =>
        println(s"instance $path: failed")
        if (!quiet) println(e.toString)
        None
    }

  private def parseArgs(args: List[String], acc: Map[String, String]): Map[String, String] =
    args match {
      case Nil => acc
      case "--no-metaspec" :: rest => // value-less flag
        parseArgs(rest, acc + ("no-metaspec" -> "true"))
      case "--quiet" :: rest => // value-less flag (jv -q)
        parseArgs(rest, acc + ("quiet" -> "true"))
      case "--assert-format" :: rest => // value-less flag (jv -f)
        parseArgs(rest, acc + ("assert-format" -> "true"))
      case "--assert-content" :: rest => // value-less flag (jv -c)
        parseArgs(rest, acc + ("assert-content" -> "true"))
      case "--insecure" :: rest => // value-less flag (jv -k)
        parseArgs(rest, acc + ("insecure" -> "true"))
      case k :: v :: rest if k == "--instance" || k == "--map" =>
        // repeatable flags accumulate (jv takes INSTANCE... and -m ...)
        val key = k.stripPrefix("--")
        parseArgs(rest, acc + (key ->
          acc.get(key).map(_ + "\u0000" + v).getOrElse(v)))
      case "--ref" :: kv :: rest if kv.contains("=") =>
        val Array(n, dir) = kv.split("=", 2)
        parseArgs(rest, acc + (s"ref:$n" -> dir))
      case flag :: value :: rest if flag.startsWith("--") =>
        parseArgs(rest, acc + (flag.stripPrefix("--") -> value))
      case other :: _ => usage(s"unexpected argument '$other'")
    }

  private def usage(msg: String): Nothing = {
    System.err.println(s"error: $msg")
    System.err.println(
      "usage: graft.cli.Main --spec <file|clip-suite> --table <parquet|synth:N> " +
        "[--key cols] [--output flag|basic|summary|detailed|simple|alt] [--violations-out dir] [--ref name=dir]")
    sys.exit(2)
  }
}
