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

  def certBlock(benchLine: Option[String]): String = {
    val declared = graft.ops.Catalog.all.size
    val oracle = graft.ops.Catalog.oracleSql.size
    val rowsOnly = declared - oracle
    val reports = Option(Paths.get("target/test-reports"))
      .filter(Files.isDirectory(_))
      .map(dir => Files.list(dir).iterator().asScala
        .filter(_.toString.endsWith(".xml")).toList)
      .getOrElse(Nil)
    require(reports.nonEmpty,
      "no target/test-reports/*.xml — run a full `sbt test` first")
    val tests = reports.map { p =>
      val root = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        .newDocumentBuilder().parse(p.toFile).getDocumentElement
      root.getAttribute("tests").toInt
    }.sum
    val bench = benchLine.map(b => s"; $b").getOrElse("")
    s"""Certified state (generated from the tree, not hand-synced):
       |**$declared declared queries** — $oracle DuckDB-oracle-checked,
       |$rowsOnly rows-only (model-defined / approximate semantics, each
       |with a documented oracle-checked anchor); **$tests unit tests
       |green across ${reports.size} spec files**$bench.""".stripMargin
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
