package graft.queries

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Drift guard for the README query index (VERDICT r6 item 6): the index
  * is GENERATED from the catalog (tools/gen_query_index.py); this spec
  * fails the build whenever the committed README and the compiled
  * catalog diverge — a new query without a regenerated index, a renamed
  * query, or a row for a query that no longer exists.
  */
class ReadmeIndexSpec extends AnyFunSuite {

  private def readmeQueries: Set[String] = {
    val lines = Files.readAllLines(Paths.get("README.md")).asScala
    val begin = lines.indexWhere(_.contains("QUERY-INDEX:BEGIN"))
    val end = lines.indexWhere(_.contains("QUERY-INDEX:END"))
    assert(begin >= 0 && end > begin, "README must carry the QUERY-INDEX markers")
    lines.slice(begin, end)
      .filter(_.startsWith("| `"))
      .map(_.split("`")(1))
      .toSet
  }

  test("README query index lists exactly the compiled catalog") {
    val indexed = readmeQueries
    val catalog = SparkEntry.queries.keySet
    val notIndexed = catalog -- indexed
    val stale = indexed -- catalog
    assert(notIndexed.isEmpty,
      s"catalog queries missing from README (run tools/gen_query_index.py): $notIndexed")
    assert(stale.isEmpty,
      s"README rows without a catalog query (run tools/gen_query_index.py): $stale")
  }

  test("every catalog query has an oracle or a documented rows-only row") {
    // The driver records a weaker rows-only check for entries without
    // oracle SQL; the index annotates which is which, so rows-only must
    // stay a deliberate, visible choice rather than a forgotten oracle.
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val lines = Files.readAllLines(Paths.get("README.md")).asScala
    val rowsOnlyRows = lines.filter(l => l.startsWith("| `") && l.contains("rows-only"))
      .map(_.split("`")(1)).toSet
    assert(noOracle == rowsOnlyRows,
      s"rows-only annotation drift: catalog=$noOracle readme=$rowsOnlyRows")
  }
}
