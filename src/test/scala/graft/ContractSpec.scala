package graft

import org.apache.spark.sql.types.{ArrayType, DecimalType, MapType, StructType}

/** Contract-surface hygiene: every SparkEntry entry must analyze cleanly
  * and produce a driver-hashable shape. This is the engine-side mirror of
  * dev/compare.py's type gate — it catches the r2 failure class (nested
  * output columns crash the driver's pandas sorter; exotic numerics hash
  * dtype-sensitively) at `sbt test` time, without DuckDB. Schema access
  * triggers analysis only, so the whole contract checks in seconds. */
class ContractSpec extends SparkSpec {

  test("queries and oracles are consistently registered") {
    val qs = SparkEntry.queries
    val oracles = SparkEntry.oracleSql
    assert(qs.nonEmpty && oracles.nonEmpty)
    assert(oracles.keySet.subsetOf(qs.keySet),
      s"oracles without queries: ${oracles.keySet.diff(qs.keySet)}")
    // rows-only entries are the documented exceptions, not the norm
    val rowsOnly = qs.keySet.diff(oracles.keySet)
    assert(rowsOnly.size <= 5, s"rows-only entries grew: $rowsOnly")
  }

  test("every contract query analyzes and every oracled output is flat " +
    "(no nested columns, no decimals — the driver-hashable shape)") {
    val oracles = SparkEntry.oracleSql
    SparkEntry.queries.foreach { case (name, fn) =>
      val schema = fn(spark, sfDir).schema // analysis only, no execution
      assert(schema.fieldNames.toSeq.distinct.length == schema.fieldNames.length,
        s"$name: duplicate output column names ${schema.fieldNames.mkString(",")}")
      if (oracles.contains(name)) {
        schema.fields.foreach { f =>
          val nested = f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] || f.dataType.isInstanceOf[StructType]
          assert(!nested,
            s"$name.${f.name}: ${f.dataType.simpleString} is unhashable in the " +
              "driver's pandas sorter — serialize it (q73's array_join pattern)")
          assert(!f.dataType.isInstanceOf[DecimalType],
            s"$name.${f.name}: decimal output hashes dtype-sensitively — " +
              "cast to DOUBLE/BIGINT at the output (Decimals.dsum pattern)")
        }
      }
    }
  }

  test("the flagship entry returns rows") {
    assert(SparkEntry.entry(spark).limit(1).count() == 1)
  }
}
