package graft

import org.apache.spark.sql.types._

/** Output-dtype hygiene over the ENTIRE registry (r9 verdict task 3).
  *
  * Both r9 red rows were value-identical to DuckDB and failed only on
  * engine type promotion the cell values cannot reveal: a bare SQL
  * decimal literal typing a Spark column DECIMAL(2,2)
  * (q_heavy_values_approx), and DuckDB promoting `85 * sum(...)` to
  * HUGEINT against Spark's BIGINT (q_pagerank_copurchase). The driver's
  * compare hashes parquet dtypes, so promotion divergence is a red row
  * even when every cell matches.
  *
  * This spec kills the class at `sbt test` time: every registry output
  * schema — recursively through arrays/structs/maps — must be free of
  * DecimalType, and every atomic numeric must be INT/BIGINT/DOUBLE (the
  * convention all queries follow; FLOAT never leaves an operator because
  * parquet FLOAT round-trips differently through DuckDB). Oracle
  * templates carry the matching rule: explicit CAST on any literal- or
  * product-derived numeric.
  */
class DtypeHygieneSpec extends SparkTestBase {

  private val allowedAtomicNumerics: Set[DataType] =
    Set(IntegerType, LongType, DoubleType)

  /** All atomic types reachable from a type, with a path for messages. */
  private def atomicLeaves(dt: DataType, path: String): Seq[(String, DataType)] =
    dt match {
      case s: StructType =>
        s.fields.toSeq.flatMap(f => atomicLeaves(f.dataType, s"$path.${f.name}"))
      case a: ArrayType => atomicLeaves(a.elementType, s"$path[]")
      case m: MapType =>
        atomicLeaves(m.keyType, s"$path<key>") ++
          atomicLeaves(m.valueType, s"$path<value>")
      case other => Seq(path -> other)
    }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"output dtypes are driver-hash-safe: $name") {
      val schema = SparkEntry.queries(name)(spark, Sf).schema
      val leaves = schema.fields.toSeq
        .flatMap(f => atomicLeaves(f.dataType, f.name))
      val decimals = leaves.collect { case (p, _: DecimalType) => p }
      assert(decimals.isEmpty,
        s"DecimalType in output (driver hash diverges from DuckDB): " +
          decimals.mkString(", "))
      val badNumerics = leaves.collect {
        case (p, t: NumericType) if !allowedAtomicNumerics.contains(t) =>
          s"$p: ${t.simpleString}"
      }
      assert(badNumerics.isEmpty,
        s"non-INT/BIGINT/DOUBLE numeric in output: ${badNumerics.mkString(", ")}")
    }
  }
}
