package graft.spec

import org.json4s._
import org.json4s.jackson.JsonMethods

import java.nio.file.{Files, Path, Paths}
import scala.collection.immutable.ListMap

/** Config discovery with the reference's precedence (`gasket.load`,
  * `/root/reference/index.js:214-256`, SURVEY §1.2):
  *
  *   1. an explicit config file (the CLI's `-c <file>`, bin.js:71) is used
  *      as-is; a directory falls through (EISDIR parity, index.js:242-245);
  *   2. `gasket.json` in the cwd — top-level keys are pipeline names;
  *   3. `package.json` in the cwd — pipelines under the `"gasket"` key
  *      (index.js:220: any file not named gasket.json is unwrapped via
  *      `pipelines.gasket || {}`);
  *   4. JSON parse errors abort rather than falling through
  *      (index.js:244,248).
  */
object ConfigLoader {

  final case class LoadedConfig(spec: PipelineSpec, configDir: Path)

  def load(cwd: String = ".", explicitFile: Option[String] = None): LoadedConfig = {
    val base = Paths.get(cwd)
    def read(p: Path, unwrapGasketKey: Boolean): Option[LoadedConfig] =
      if (Files.isRegularFile(p))
        // parse errors deliberately propagate (index.js:244,248)
        Some(LoadedConfig(
          parse(Files.readString(p), unwrapGasketKey),
          Option(p.toAbsolutePath.getParent).getOrElse(base)))
      else None

    // explicit -c semantics: a DIRECTORY falls through (the reference's
    // EISDIR parity, index.js:242-245) but a MISSING file is an error —
    // silently falling back would let e.g. `rm -c typo.json` mutate a
    // config the user never targeted.
    explicitFile.foreach { f =>
      val p = base.resolve(f)
      if (!Files.exists(p))
        throw new java.io.FileNotFoundException(s"Config file not found: $p")
    }
    explicitFile.flatMap(f => read(base.resolve(f), unwrapGasketKey = false))
      .orElse(read(base.resolve("gasket.json"), unwrapGasketKey = false))
      .orElse(read(base.resolve("package.json"), unwrapGasketKey = true))
      .getOrElse(throw new java.io.FileNotFoundException(
        s"No gasket.json or package.json with a gasket key under $cwd"))
  }

  /** Parse a config document. `unwrapGasketKey=true` reads the `"gasket"`
    * sub-object (package.json form); a bare top-level array is sugar for
    * `{"main": [...]}` (index.js:117-120).
    */
  def parse(jsonText: String, unwrapGasketKey: Boolean = false): PipelineSpec = {
    val root = JsonMethods.parse(jsonText) match {
      case JArray(stages) => JObject("main" -> JArray(stages))
      case other          => other
    }
    val pipelinesJson = if (unwrapGasketKey) root \ "gasket" else root
    pipelinesJson match {
      case JObject(fields) =>
        PipelineSpec(ListMap(fields.collect {
          case (name, JArray(stages)) => name -> stages.map(parseStage)
        }: _*))
      case JNothing => PipelineSpec.empty
      case _ => throw new IllegalArgumentException(
        "Pipeline config must be an object of {name: [stage, ...]}")
    }
  }

  /** Stage forms (readme.md:83-111 + `gasket add` plain strings,
    * bin.js:100): string → command stage; {command} / {module} objects with
    * optional "type" and "json" keys.
    */
  private def parseStage(j: JValue): Stage = j match {
    case JString(cmd) => Stage.Command(cmd)
    case obj: JObject =>
      val segType = obj \ "type" match {
        case JString(t) => SegType.parse(t)
        case _          => SegType.Pipe
      }
      val json = obj \ "json" match {
        case JBool(b) => b
        case _        => false
      }
      (obj \ "command", obj \ "module") match {
        case (JString(c), _) => Stage.Command(c, segType, json)
        case (_, JString(m)) => Stage.Module(m, segType, json)
        case _ => throw new IllegalArgumentException(
          s"Not a valid pipeline stage: ${JsonMethods.compact(JsonMethods.render(obj))} " +
            "(reference throws the same way, index.js:88)")
      }
    case other => throw new IllegalArgumentException(
      s"Not a valid pipeline stage: ${JsonMethods.compact(JsonMethods.render(other))}")
  }
}
