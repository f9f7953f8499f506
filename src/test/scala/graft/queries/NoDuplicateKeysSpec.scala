package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The catalog is a `++` of per-batch maps, so a repeated query name
  * silently REPLACES an earlier entry — an entire previously-green query
  * can vanish from the catalog without any test noticing (it nearly
  * happened: a new q_ewma shadowed Pipeline7's, and new q_funnel/q_scd2
  * were themselves shadowed by Extensions'). Pin uniqueness across every
  * batch, for queries and oracles alike.
  */
class NoDuplicateKeysSpec extends AnyFunSuite {

  private val queryMaps: Seq[(String, Map[String, _])] = Seq(
    "Parity" -> Parity.queries, "Relational" -> Relational.queries,
    "Relational2" -> Relational2.queries, "Relational3" -> Relational3.queries,
    "Relational4" -> Relational4.queries, "Pipeline" -> Pipeline.queries,
    "Pipeline2" -> Pipeline2.queries, "Pipeline3" -> Pipeline3.queries,
    "Pipeline4" -> Pipeline4.queries, "Pipeline5" -> Pipeline5.queries,
    "Pipeline6" -> Pipeline6.queries, "Pipeline7" -> Pipeline7.queries,
    "Pipeline8" -> Pipeline8.queries, "Pipeline9" -> Pipeline9.queries,
    "Pipeline10" -> Pipeline10.queries, "Pipeline11" -> Pipeline11.queries,
    "Pipeline12" -> Pipeline12.queries, "Pipeline13" -> Pipeline13.queries,
    "Pipeline14" -> Pipeline14.queries, "Pipeline15" -> Pipeline15.queries,
    "Pipeline16" -> Pipeline16.queries, "Pipeline17" -> Pipeline17.queries,
    "Pipeline18" -> Pipeline18.queries, "Pipeline19" -> Pipeline19.queries,
    "Pipeline20" -> Pipeline20.queries, "Pipeline21" -> Pipeline21.queries,
    "Pipeline22" -> Pipeline22.queries,
    "Extensions" -> Extensions.queries)

  private val oracleMaps: Seq[(String, Map[String, _])] = Seq(
    "Parity" -> Parity.oracle, "Relational" -> Relational.oracle,
    "Relational2" -> Relational2.oracle, "Relational3" -> Relational3.oracle,
    "Relational4" -> Relational4.oracle, "Pipeline" -> Pipeline.oracle,
    "Pipeline2" -> Pipeline2.oracle, "Pipeline3" -> Pipeline3.oracle,
    "Pipeline4" -> Pipeline4.oracle, "Pipeline5" -> Pipeline5.oracle,
    "Pipeline6" -> Pipeline6.oracle, "Pipeline7" -> Pipeline7.oracle,
    "Pipeline8" -> Pipeline8.oracle, "Pipeline9" -> Pipeline9.oracle,
    "Pipeline10" -> Pipeline10.oracle, "Pipeline11" -> Pipeline11.oracle,
    "Pipeline12" -> Pipeline12.oracle, "Pipeline13" -> Pipeline13.oracle,
    "Pipeline14" -> Pipeline14.oracle, "Pipeline15" -> Pipeline15.oracle,
    "Pipeline16" -> Pipeline16.oracle, "Pipeline17" -> Pipeline17.oracle,
    "Pipeline18" -> Pipeline18.oracle, "Pipeline19" -> Pipeline19.oracle,
    "Pipeline20" -> Pipeline20.oracle, "Pipeline21" -> Pipeline21.oracle,
    "Pipeline22" -> Pipeline22.oracle,
    "Extensions" -> Extensions.oracle)

  private def dupes(maps: Seq[(String, Map[String, _])]): Seq[String] =
    maps.flatMap { case (mod, m) => m.keys.map(_ -> mod) }
      .groupBy(_._1).filter(_._2.size > 1)
      .map { case (k, owners) => s"$k in ${owners.map(_._2).mkString(", ")}" }
      .toSeq.sorted

  test("no query name is declared by two batches") {
    assert(dupes(queryMaps).isEmpty,
      "duplicate query keys (later batch silently wins):\n" +
        dupes(queryMaps).mkString("\n"))
  }

  test("no oracle name is declared by two batches") {
    assert(dupes(oracleMaps).isEmpty,
      "duplicate oracle keys:\n" + dupes(oracleMaps).mkString("\n"))
  }

  test("every query has an oracle and every oracle a query") {
    val q = queryMaps.flatMap(_._2.keys).toSet
    val o = oracleMaps.flatMap(_._2.keys).toSet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }
}
