package graft

/** The driver's exact integration surface: flagship entry returns rows,
  * every oracle belongs to a declared query, and query names are unique
  * (duplicates would silently collapse in the `queries` map).
  */
class DriverContractSpec extends SparkSpecBase {

  test("entry() runs the flagship query and returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; names are collision-free") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct)}")
    assert(qs.size == names.size)
  }

  test("headline bench queries exist and are oracle-checked or rows-only by design") {
    val headline = Registry.all.filter(_.headline).map(_.name)
    assert(headline.nonEmpty)
    assert(headline.toSet.subsetOf(SparkEntry.queries.keySet))
  }

  // Round-8 lesson: raw DECIMAL output is not hash-portable across the
  // gate's readers (emb_whiten_stats: rows+schema matched, hash did not —
  // decimal renderings differ where float64 comparison collapses them).
  // Decimals are the right ACCUMULATOR type (exact, order-independent);
  // they must be cast to long/double/string before reaching a gated SELECT.
  test("no oracle-gated query emits a raw DECIMAL column") {
    import org.apache.spark.sql.types.DecimalType
    val offenders = Registry.all.filter(_.oracle.isDefined).flatMap { q =>
      val schema = SparkEntry.queries(q.name)(spark, sf0001).schema
      schema.fields.collect { case f if f.dataType.isInstanceOf[DecimalType] =>
        s"${q.name}.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      s"gated queries exposing hash-unportable DECIMAL columns: ${offenders.mkString(", ")}")
  }
}
