package graft.spec

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Config discovery + parsing parity (SURVEY §1.2, index.js:214-256). */
class ConfigLoaderSpec extends AnyFunSuite {

  private def tmpDir() = Files.createTempDirectory("graft-cfg").toFile

  test("bare array is sugar for {main: [...]} (index.js:117-120)") {
    val spec = ConfigLoader.parse("""["echo a", "echo b"]""")
    assert(spec.list == Seq("main"))
    assert(spec.pipelines("main") == Seq(Stage.Command("echo a"), Stage.Command("echo b")))
  }

  test("stage forms: string / command / module with type and json (readme.md:83-111)") {
    val spec = ConfigLoader.parse(
      """{"p": ["cat -",
        |       {"command": "sort", "type": "run"},
        |       {"module": "transform-uppercase", "json": true},
        |       {"module": "m2", "type": "fork"}]}""".stripMargin)
    assert(spec.pipelines("p") == Seq(
      Stage.Command("cat -"),
      Stage.Command("sort", SegType.Run),
      Stage.Module("transform-uppercase", SegType.Pipe, json = true),
      Stage.Module("m2", SegType.Fork)))
  }

  test("unknown stage type throws (index.js:160)") {
    intercept[IllegalArgumentException] {
      ConfigLoader.parse("""{"p": [{"command": "x", "type": "zigzag"}]}""")
    }
  }

  test("invalid stage shape throws (index.js:88)") {
    intercept[IllegalArgumentException] {
      ConfigLoader.parse("""{"p": [{"neither": true}]}""")
    }
  }

  test("gasket.json wins over package.json; package.json uses the gasket key (index.js:246-250)") {
    val d = tmpDir()
    Files.writeString(d.toPath.resolve("gasket.json"), """{"from_gasket": ["cat -"]}""")
    Files.writeString(d.toPath.resolve("package.json"),
      """{"name": "x", "gasket": {"from_pkg": ["cat -"]}}""")
    assert(ConfigLoader.load(d.toString).spec.list == Seq("from_gasket"))
    Files.delete(d.toPath.resolve("gasket.json"))
    assert(ConfigLoader.load(d.toString).spec.list == Seq("from_pkg"))
  }

  test("explicit config file is used as-is (-c, bin.js:71)") {
    val d = tmpDir()
    Files.writeString(d.toPath.resolve("custom.json"), """{"custom": ["cat -"]}""")
    Files.writeString(d.toPath.resolve("gasket.json"), """{"ignored": ["cat -"]}""")
    val loaded = ConfigLoader.load(d.toString, explicitFile = Some("custom.json"))
    assert(loaded.spec.list == Seq("custom"))
  }

  test("a missing explicit -c file errors instead of silently falling back") {
    val d = tmpDir()
    Files.writeString(d.toPath.resolve("gasket.json"), """{"real": ["cat -"]}""")
    intercept[java.io.FileNotFoundException] {
      ConfigLoader.load(d.toString, explicitFile = Some("typo.json"))
    }
  }

  test("JSON parse errors abort rather than falling through (index.js:244,248)") {
    val d = tmpDir()
    Files.writeString(d.toPath.resolve("gasket.json"), """{not json""")
    intercept[Exception] { ConfigLoader.load(d.toString) }
  }

  test("spec mutation: add/rm/show parity (bin.js:94-130)") {
    val spec0 = PipelineSpec.empty.add("build", "make").add("build", "make install")
    assert(spec0.show("build").contains("make | make install"))
    assert(spec0.rm("build").list.isEmpty)
    // add writes the plain-string form; toJson keeps it a string
    assert(spec0.toJson.contains("\"make\""))
    assert(ConfigLoader.parse(spec0.toJson) == spec0)
  }
}
