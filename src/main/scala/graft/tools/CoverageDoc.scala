package graft.tools

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Regenerates the certification block of COVERAGE.md from live
  * artifacts — catalog sizes from `graft.ops.Catalog`, test/suite counts
  * from sbt's JUnit XML reports — so the header can never hand-drift
  * from the tree again (round 8 shipped 542/46 while the tree ran
  * 543/45). Run AFTER a full `sbt test` (per-suite reports are refreshed
  * by the last run that touched them). CatalogSpec asserts the generated
  * query counts match the catalog.
  *
  * Usage: runMain graft.tools.CoverageDoc [benchLine]
  *   benchLine: optional free-text bench summary to embed verbatim
  *   (e.g. "bench 79.0 s / 231 queries / zero failures").
  */
object CoverageDoc {
  val Begin = "<!-- BEGIN GENERATED CERTIFICATION (graft.tools.CoverageDoc) -->"
  val End = "<!-- END GENERATED CERTIFICATION -->"

  /** (tests, suites) from the JUnit XMLs, counting ONLY reports whose
    * suite class still exists on the classpath: target/test-reports is
    * append-only across renames/deletions, and counting orphaned XMLs
    * is exactly the round-15 drift (banner 1032/104 vs a live-run
    * 1025/97). Exposed for the spec that pins the stale-report filter.
    */
  def countReports(dir: java.nio.file.Path = Paths.get("target/test-reports"))
      : (Int, Int) = {
    val reports = Option(dir)
      .filter(Files.isDirectory(_))
      .map(d => Files.list(d).iterator().asScala
        .filter(_.toString.endsWith(".xml")).toList)
      .getOrElse(Nil)
    require(reports.nonEmpty,
      s"no $dir/*.xml — run a full `sbt test` first")
    val live = reports.flatMap { p =>
      val root = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        .newDocumentBuilder().parse(p.toFile).getDocumentElement
      val suite = root.getAttribute("name")
      // the main runs on the Compile classpath, so resolve suites via
      // the compiled test-classes tree (zinc deletes class files whose
      // source went away), falling back to the context classloader
      val asPath = Paths.get("target/scala-2.13/test-classes",
        suite.replace('.', '/') + ".class")
      val exists = Files.isRegularFile(asPath) ||
        (try { Class.forName(suite, false, getClass.getClassLoader); true }
        catch { case _: Throwable => false })
      if (exists) Some(root.getAttribute("tests").toInt) else None
    }
    require(live.nonEmpty, "every report XML is orphaned — stale target dir?")
    (live.sum, live.size)
  }

  def certBlock(benchLine: Option[String]): String = {
    val declared = graft.ops.Catalog.all.size
    val oracle = graft.ops.Catalog.oracleSql.size
    val rowsOnly = declared - oracle
    val (tests, suites) = countReports()
    val bench = benchLine.map(b => s"; $b").getOrElse("")
    s"""Certified state (generated from the tree, not hand-synced):
       |**$declared declared queries** — $oracle DuckDB-oracle-checked,
       |$rowsOnly rows-only (model-defined / approximate semantics, each
       |with a documented oracle-checked anchor); **$tests unit tests
       |green across $suites spec files**$bench.""".stripMargin
  }

  def main(args: Array[String]): Unit = {
    val path = Paths.get("COVERAGE.md")
    val doc = Files.readString(path)
    val bi = doc.indexOf(Begin)
    val ei = doc.indexOf(End)
    require(bi >= 0 && ei > bi, s"COVERAGE.md is missing the $Begin/$End markers")
    val updated = doc.substring(0, bi + Begin.length) + "\n" +
      certBlock(args.headOption.filter(_.nonEmpty)) + "\n" +
      doc.substring(ei)
    Files.writeString(path, updated)
    println(s"wrote COVERAGE.md certification block " +
      s"(${graft.ops.Catalog.all.size} queries)")
  }
}
