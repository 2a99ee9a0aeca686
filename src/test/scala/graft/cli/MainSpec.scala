package graft.cli

import java.io.ByteArrayOutputStream
import java.nio.file.Files

import graft.SparkSpec

class MainSpec extends SparkSpec {

  private def withDir(cfg: String)(f: String => Unit): Unit = {
    val d = Files.createTempDirectory("graft-cli")
    Files.writeString(d.resolve("gasket.json"), cfg)
    f(d.toString)
  }

  private def capture(body: => Unit): String = {
    val out = new ByteArrayOutputStream()
    Console.withOut(out)(body)
    out.toString
  }

  test("ls / show verbs") {
    withDir("""{"a": ["echo hi"], "b": ["cat -"]}""") { cwd =>
      val ls = capture(Main.run(Array("ls", "--cwd", cwd), () => spark))
      assert(ls.trim.split("\n").toSeq == Seq("a", "b"))
      val show = capture(Main.run(Array("show", "a", "--cwd", cwd), () => spark))
      assert(show.trim == "echo hi")
    }
  }

  test("add + rm persist to gasket.json (bin.js:26-46,94-130)") {
    withDir("""{"main": ["cat -"]}""") { cwd =>
      Main.run(Array("add", "build", "make", "install", "--cwd", cwd), () => spark)
      val ls = capture(Main.run(Array("ls", "--cwd", cwd), () => spark))
      assert(ls.contains("build"))
      val show = capture(Main.run(Array("show", "build", "--cwd", cwd), () => spark))
      assert(show.trim == "make install")
      Main.run(Array("rm", "build", "--cwd", cwd), () => spark)
      val ls2 = capture(Main.run(Array("ls", "--cwd", cwd), () => spark))
      assert(!ls2.contains("build"))
    }
  }

  test("add persists under package.json's gasket key when that is the config source") {
    val d = Files.createTempDirectory("graft-cli-pkg")
    Files.writeString(d.resolve("package.json"),
      """{"name": "x", "gasket": {"main": ["cat -"]}}""")
    Main.run(Array("add", "extra", "echo", "hi", "--cwd", d.toString), () => spark)
    val pkg = Files.readString(d.resolve("package.json"))
    assert(pkg.contains("\"extra\""))
    assert(pkg.contains("\"name\"")) // other keys preserved
    val ls = capture(Main.run(Array("ls", "--cwd", d.toString), () => spark))
    assert(ls.contains("extra") && ls.contains("main"))
  }

  test("run prints pipeline output to stdout (bin.js:132-155)") {
    withDir("""{"greet": ["echo hello world"]}""") { cwd =>
      val out = capture(Main.run(Array("run", "greet", "--cwd", cwd), () => spark))
      assert(out.trim == "hello world")
    }
  }

  test("a trailing flag without a value prints usage instead of crashing") {
    val err = new ByteArrayOutputStream()
    Console.withErr(err) {
      Main.run(Array("ls", "-c"), () => spark)
    }
    assert(err.toString.contains("-c requires a value"))
    // parse failure prints the FULL help text — the single usage surface,
    // so new verbs/options can't drift out of the error path
    assert(err.toString.contains("Usage: graft"))
    assert(err.toString.contains("completion"))
    assert(err.toString.contains("--stream"))
  }

  test("pipe reads stdin through the pipeline (bin.js:157-184)") {
    withDir("""{"main": ["tr a-z A-Z"]}""") { cwd =>
      val out = capture {
        Console.withIn(new java.io.StringReader("hello\nworld\n")) {
          Main.run(Array("pipe", "--cwd", cwd), () => spark)
        }
      }
      assert(out.trim.split("\n").toSeq == Seq("HELLO", "WORLD"))
    }
  }

  test("pipe with EMPTY stdin still spawns an echo-headed pipeline (pipe.end(), index.js:54)") {
    withDir("""{"main": ["echo spawned"]}""") { cwd =>
      val out = capture {
        Console.withIn(new java.io.StringReader("")) {
          Main.run(Array("pipe", "--cwd", cwd), () => spark)
        }
      }
      assert(out.trim == "spawned")
    }
  }

  test("exec runs an ad-hoc command over stdin (bin.js:79-84)") {
    val out = capture {
      Console.withIn(new java.io.StringReader("abc\n")) {
        Main.run(Array("exec", "rev"), () => spark)
      }
    }
    assert(out.trim == "cba")
  }

  test("pipe --stream follows a growing directory incrementally") {
    withDir("""{"main": [{"module": "uppercase"}]}""") { cwd =>
      // module stage: command stages are batch-only; the module registry's
      // uppercase is the streaming-safe flagship transform
      val streamDir = Files.createTempDirectory("graft-stream")
      val collected = scala.collection.mutable.ArrayBuffer[String]()
      val engine = graft.engine.Engine.load(cwd)
      val q = Main.pipeStream(engine, spark, streamDir.toString, Seq("main"),
        batch => collected ++= batch.collect().map(_.getString(0))).get
      try {
        Files.writeString(streamDir.resolve("a.txt"), "first\n")
        q.processAllAvailable()
        assert(collected.toSeq == Seq("FIRST"))
        Files.writeString(streamDir.resolve("b.txt"), "second\n")
        q.processAllAvailable()
        assert(collected.sorted.toSeq == Seq("FIRST", "SECOND"))
      } finally q.stop()
    }
  }

  test("pipe --stream with no resolvable pipeline returns no query (bin.js:174)") {
    withDir("""{"x": ["cat -"]}""") { cwd =>
      val streamDir = Files.createTempDirectory("graft-stream-none")
      val engine = graft.engine.Engine.load(cwd)
      assert(Main.pipeStream(engine, spark, streamDir.toString, Seq("main"), _ => ()).isEmpty)
    }
  }

  test("help and completion verbs print the full surface") {
    val help = capture(Main.run(Array("help"), () => spark))
    Seq("run", "pipe", "exec", "add", "rm", "ls", "show", "--stream", "completion")
      .foreach(v => assert(help.contains(v), s"help is missing $v"))
    val comp = capture(Main.run(Array("completion"), () => spark))
    assert(comp.contains("complete -F") && comp.contains("graft ls"))
  }

  test("run of missing non-main name errors to stderr, missing main is silent") {
    withDir("""{"x": ["echo hi"]}""") { cwd =>
      val err = new ByteArrayOutputStream()
      Console.withErr(err) {
        capture(Main.run(Array("run", "--cwd", cwd), () => spark)) // default main: silent
      }
      assert(err.toString.isEmpty)
      Console.withErr(err) {
        capture(Main.run(Array("run", "nope", "--cwd", cwd), () => spark))
      }
      assert(err.toString.contains("Could not find pipe: nope"))
    }
  }
}
