package graft.cli

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.engine.{Engine, RunOptions}
import graft.spec.{ConfigLoader, PipelineSpec}
import graft.sources.Sources
import graft.stages.CommandStage

/** CLI — the `bin.js` verb surface (SURVEY §2.1 CLI table):
  *
  *   run [pipes…]     run pipelines sequentially, print to stdout (bin.js:132-155)
  *   pipe [pipes…]    stdin → pipeline₁ → … → stdout (bin.js:157-184)
  *   exec <cmd>       stdin → ad-hoc command → stdout (bin.js:79-84)
  *   add <pipe> <cmd> append a plain-string stage + persist (bin.js:94-103)
  *   rm <pipe>        delete pipeline + persist (bin.js:122-130)
  *   ls               list pipeline names (bin.js:73-77)
  *   show <pipe>      shell-style pretty print (bin.js:105-120)
  *   version          engine version
  *
  * Options: `-c <file>` explicit config, `--cwd <dir>` working directory.
  * stdout EPIPE is tolerated so `run x | head` doesn't crash (bin.js:12-14).
  */
object Main {

  final case class Args(
      verb: String,
      positional: Seq[String],
      cwd: String = ".",
      config: Option[String] = None)

  def parseArgs(argv: Array[String]): Args = {
    var cwd = "."
    var config: Option[String] = None
    val pos = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < argv.length) {
      argv(i) match {
        case f @ ("-c" | "--config" | "--cwd") =>
          if (i + 1 >= argv.length)
            throw new IllegalArgumentException(s"$f requires a value")
          if (f == "--cwd") cwd = argv(i + 1) else config = Some(argv(i + 1))
          i += 2
        case other => pos += other; i += 1
      }
    }
    Args(pos.headOption.getOrElse("help"), pos.drop(1).toSeq, cwd, config)
  }

  def main(argv: Array[String]): Unit = run(argv, () => session())

  /** Testable entry: verbs that need Spark take a session factory so pure
    * config verbs (ls/show/add/rm) run without one.
    */
  def run(argv: Array[String], mkSession: () => SparkSession): Unit = {
    val args = try parseArgs(argv) catch {
      case e: IllegalArgumentException =>
        Console.err.println(e.getMessage)
        Console.err.println(
          "usage: graft <ls|show|add|rm|run|pipe|exec|version> [args] [-c file] [--cwd dir]")
        return
    }
    args.verb match {
      case "ls" =>
        loadEngine(args).list.foreach(printSafe)
      case "show" =>
        val engine = loadEngine(args)
        args.positional.foreach(n => engine.spec.show(n).foreach(printSafe))
      case "add" =>
        val loaded = ConfigLoader.load(args.cwd, args.config)
        save(args, loaded.spec.add(args.positional.head, args.positional.drop(1).mkString(" ")))
      case "rm" =>
        val loaded = ConfigLoader.load(args.cwd, args.config)
        save(args, loaded.spec.rm(args.positional.head))
      case "run" =>
        // pipelines run sequentially in argument order (default: main),
        // output printed to stdout (bin.js:138-153); missing names error
        // except the default 'main' which is silent (bin.js:142-145)
        val engine = loadEngine(args)
        val spark = mkSession()
        val names = if (args.positional.nonEmpty) args.positional else Seq("main")
        names.foreach { n =>
          engine.pipe(n, spark) match {
            case Some(df) => Sources.printLines(df, Int.MaxValue)
            case None if n == "main" => ()
            case None => Console.err.println(s"Could not find pipe: $n")
          }
        }
      case "pipe" =>
        // stdin → chained pipelines → stdout. Batch form: stdin is read
        // to end; the unbounded form is Sources.linesStream + the same
        // pipeline chain as a StreamingQuery.
        val engine = loadEngine(args)
        val spark = mkSession()
        import spark.implicits._
        val stdin = scala.io.Source.stdin.getLines().toSeq.toDF(CommandStage.ValueCol)
        // default to 'main' and skip missing names with a stderr note
        // (silent for 'main'), as the reference does (bin.js:158-175)
        val names = if (args.positional.nonEmpty) args.positional else Seq("main")
        var applied = 0
        val out = names.foldLeft(stdin) { (df, n) =>
          engine.pipe(n, spark, Some(df)) match {
            case Some(next) => applied += 1; next
            case None =>
              if (n != "main") Console.err.println(s"$n does not exist")
              df
          }
        }
        // zero resolved pipelines → no output (bin.js:174 `if
        // (!streams.length) return` — stdin is NOT echoed through)
        if (applied > 0) Sources.printLines(out, Int.MaxValue)
      case "exec" =>
        val spark = mkSession()
        import spark.implicits._
        val stdin = scala.io.Source.stdin.getLines().toSeq.toDF(CommandStage.ValueCol)
        val out = new Engine(PipelineSpec.empty)
          .exec(args.positional.mkString(" "), stdin, RunOptions(partitions = Some(1)))
        Sources.printLines(out, Int.MaxValue)
      case "version" => printSafe("graft 0.1.0")
      case _ =>
        printSafe("usage: graft <ls|show|add|rm|run|pipe|exec|version> [args] [-c file] [--cwd dir]")
    }
  }

  private def loadEngine(args: Args): Engine =
    Engine.load(args.cwd, args.config)

  /** Persist parity (`save`, bin.js:26-46): write gasket.json directly, or
    * rewrite package.json's "gasket" key when that's where config lives.
    */
  private def save(args: Args, spec: PipelineSpec): Unit = {
    val dir = Paths.get(args.cwd)
    val explicit = args.config.map(dir.resolve)
    val gasketJson = dir.resolve("gasket.json")
    val packageJson = dir.resolve("package.json")
    val target = explicit.getOrElse(
      if (Files.exists(gasketJson) || !Files.exists(packageJson)) gasketJson
      else packageJson)
    if (target.getFileName.toString == "package.json") {
      val root = JsonMethods.parse(Files.readString(target)).asInstanceOf[JObject]
      val updated = JObject(root.obj.filterNot(_._1 == "gasket") :+
        ("gasket" -> JsonMethods.parse(spec.toJson)))
      Files.writeString(target, JsonMethods.pretty(JsonMethods.render(updated)))
    } else {
      Files.writeString(target, spec.toJson)
    }
  }

  /** EPIPE-tolerant print (bin.js:12-14). */
  private def printSafe(s: String): Unit =
    try println(s) catch { case _: java.io.IOException => () }

  private def session(): SparkSession =
    SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
}
