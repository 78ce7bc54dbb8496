package graft.sources

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

import graft.operators.Selectors

/** YAML configuration loading for the three reference config surfaces:
  * `feeders.yaml` (`feeder/feeder_config.go:20-88`), `selectors.yaml`
  * (`selector/selector_engine.go:44-100`, `selector/selector_regex.go:
  * 36-79`), `backend.yaml` (`db/db_remote.go:15-28`). Field names and
  * validation messages mirror the reference so existing config files load
  * unchanged; the values bind to the Spark-side equivalents
  * ([[FeederConfig]], [[Selectors]], tag-routed sinks).
  */
object ConfigYaml {

  private def parse(yaml: String): Any = new Yaml().load[Any](yaml)

  private def asMap(v: Any): Map[String, Any] = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => k.toString -> (x: Any) }.toMap
    case _ => Map.empty
  }

  private def asList(v: Any): Seq[Any] = v match {
    case l: java.util.List[_] => l.asScala.toSeq
    case null => Seq.empty
    case other => Seq(other)
  }

  private def strList(v: Any): Seq[String] = asList(v).map(_.toString)

  // ------------------------------------------------------------ feeders

  /** Reference input_format names → [[graft.streaming.IngestPipeline]]
    * decoder keys (`feeder_config.go:121-144`); the Spark-side keys are
    * accepted as-is too. */
  private val formatAliases = Map(
    "fever_aggregate" -> "fever",
    "suricata_dns" -> "suricata")

  /** Load a `feeders.yaml` Setup. Validations mirror `LoadSetup`
    * (`feeder_config.go:40-88`): name/type/input format required,
    * duplicate names rejected, per-type required fields checked. Spool
    * directories (the Spark-side landing zone each receiver writes into)
    * derive from the feeder name the same way the reference derives AMQP
    * queue names — lowercased, spaces → underscores
    * (`feeder_config.go:101`). */
  def loadFeederSetup(yaml: String, spoolRoot: String): FeederConfig.Setup = {
    def fail(msg: String) = throw new IllegalArgumentException(msg)
    val feeders = asList(asMap(parse(yaml)).getOrElse("feeder", null)).map(asMap)
    val defs = feeders.map { f =>
      val name = f.get("name").map(_.toString).filter(_.nonEmpty)
        .getOrElse(fail("name missing"))
      val typ = f.get("type").map(_.toString).filter(_.nonEmpty)
        .getOrElse(fail("type missing"))
      val rawFormat = f.get("input_format").map(_.toString).filter(_.nonEmpty)
        .getOrElse(fail("input format missing"))
      val format = formatAliases.getOrElse(rawFormat, rawFormat)
      val spoolDir =
        s"$spoolRoot/${name.toLowerCase.replace(" ", "_")}"
      val kind = typ match {
        case "http" =>
          if (!f.contains("listen_host")) fail(s"$name: ListenHost missing")
          if (!f.contains("listen_port")) fail(s"$name: ListenPort missing")
          FeederConfig.Http
        case "socket" =>
          if (!f.contains("path")) fail(s"$name: socket Path missing")
          FeederConfig.Socket
        case "nmsg_socket" => FeederConfig.Udp
        case "amqp" =>
          if (strList(f.getOrElse("exchange", null)).isEmpty)
            fail(s"$name: Exchange missing")
          if (!f.contains("url")) fail(s"$name: URL missing")
          // the broker client (FeederConfig.startAmqpClient — the native
          // AmqpClient) consumes into the spool via Amqp.delivery; the
          // STREAM side reads that spool, i.e. a Dir feeder
          FeederConfig.Dir
        case other => fail(s"unknown feeder type: $other")
      }
      val options = Map("dir" -> spoolDir) ++
        // host/port: not in the reference's socket config (it uses a
        // unix-socket Path), but required by the TCP substitution this
        // engine maps S3 to — pass them through when present so a
        // YAML-configured socket feeder can actually start
        Seq("listen_host", "listen_port", "path", "bind_address", "mtu",
          "url", "host", "port").flatMap(k => f.get(k).map(k -> _.toString)) ++
        (if (f.contains("exchange"))
           Seq("exchange" -> strList(f("exchange")).mkString(","))
         else Nil)
      FeederConfig.Feeder(name, kind, format, options)
    }
    FeederConfig.Setup(defs)
  }

  // ---------------------------------------------------------- selectors

  /** Load a `selectors.yaml` into engine-ready selectors. `readPatterns`
    * resolves a regexp FILE reference to its patterns (the reference
    * reads one regex per line from each listed file,
    * `selector_regex.go:38-48`). `type: lua` entries run for REAL:
    * `readScript` resolves the script file and
    * [[Selectors.LuaScriptSelector]] interprets it per observation
    * ([[Selectors.LuaProcess]]/MiniLua — the reference's gopher-lua
    * `process(o)` contract, `selector_lua.go:29-162`); a `hooks` entry
    * registered under the script name takes precedence, for scripts
    * needing features outside the supported Lua subset. */
  def loadSelectors(
      yaml: String,
      readPatterns: String => Seq[String],
      hooks: Map[String, Selectors.HookSelector] = Map.empty,
      readScript: String => Option[String] = _ => None
  ): Seq[Selectors.Selector] = {
    def fail(msg: String) = throw new IllegalArgumentException(msg)
    asList(asMap(parse(yaml)).getOrElse("selectors", null)).map(asMap).map { s =>
      val tags = strList(s.getOrElse("tags", null))
      val ingests = strList(s.getOrElse("ingest", null))
      s.getOrElse("type", fail("selector type missing")).toString match {
        case "regex" =>
          val patterns = strList(s.getOrElse("regexp", null))
            .flatMap(readPatterns)
          if (patterns.isEmpty) fail("regexp missing")
          Selectors.RegexSelector(patterns, tags, ingests,
            filterMode = s.get("mode").exists(_.toString == "filter"))
        case "lua" =>
          val script = s.getOrElse("script", fail("script missing")).toString
          hooks.get(script)
            .map(_.copy(tags = tags, ingests = ingests))
            .orElse(readScript(script)
              .map(src => Selectors.LuaScriptSelector(src, ingests)))
            .getOrElse(fail(
              s"lua script '$script' not resolvable (no file, no hook)"))
        case other => fail(s"unknown selector type: $other")
      }
    }
  }

  /** Default script resolver for [[loadSelectors]]'s lua entries: read
    * the named file under `baseDir` (Hadoop FS — local/hdfs/s3a),
    * `None` when absent so a registered hook can take over. */
  def scriptFromFiles(spark: org.apache.spark.sql.SparkSession,
      baseDir: String): String => Option[String] = { name =>
    val p = new org.apache.hadoop.fs.Path(baseDir, name)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
    }
  }

  /** Default pattern resolver for [[loadSelectors]]: one regex per line
    * from the named file (resolved against `baseDir`), blank lines and
    * `#` comments skipped — the reference's regexp-file contract
    * (`selector_regex.go:38-48`), read through Hadoop FS so configs work
    * from hdfs/s3a as well as local paths. */
  def patternsFromFiles(spark: org.apache.spark.sql.SparkSession,
      baseDir: String): String => Seq[String] = { name =>
    val p = new org.apache.hadoop.fs.Path(baseDir, name)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = f.open(p)
    val content =
      try new String(in.readAllBytes(), "UTF-8")
      finally in.close()
    content.split("\n").toSeq.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
  }

  // ----------------------------------------------------------- backends

  /** One entry of `backend.yaml` (`db/db_remote.go:15-19`): a named sink
    * receiving observations that carry ANY of its tags (all observations
    * when tagless). `host` identified a remote balboa backend; here it is
    * carried as opaque deployment metadata — the Spark binding maps each
    * backend to a store path. */
  final case class BackendRef(name: String, host: String, tags: Seq[String])

  def loadBackends(yaml: String): Seq[BackendRef] =
    asList(parse(yaml)).map(asMap).map { b =>
      BackendRef(
        b.getOrElse("name",
          throw new IllegalArgumentException("backend name missing")).toString,
        b.getOrElse("host", "").toString,
        strList(b.getOrElse("tags", null)))
    }
}
