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
    assert(err.toString.contains("usage:"))
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
