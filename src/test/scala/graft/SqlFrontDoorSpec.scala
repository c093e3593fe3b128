package graft

import graft.sources.Tables
import graft.sql.SqlFrontDoor

/** The SQL front door's contract, generated over the ENTIRE registry: every
  * SparkEntry query either has a spark.sql-runnable statement whose result
  * equals the DataFrame operator's (schema names+types and multiset of
  * rows), or carries an explicit exemption. One generated test per query so
  * a single regression names its query instead of failing a monolith.
  */
class SqlFrontDoorSpec extends SparkTestBase {

  test("front door covers the whole registry (sql xor exemption)") {
    val names = SparkEntry.queries.keySet
    val covered = names.filter(n => SqlFrontDoor.sql(n).isDefined)
    val exempt = SqlFrontDoor.exemptions.keySet
    assert((covered ++ exempt) == names,
      s"uncovered: ${(names -- covered -- exempt).toSeq.sorted.mkString(", ")}")
    assert((covered & exempt).isEmpty,
      "a query must not be both runnable and exempt")
    // twins/portable must not name queries that left the registry
    assert((SqlFrontDoor.twins.keySet -- names).isEmpty)
    assert((SqlFrontDoor.portable -- names).isEmpty)
    // a twin overriding a portable entry would hide oracle drift
    assert((SqlFrontDoor.twins.keySet & SqlFrontDoor.portable).isEmpty)
  }

  /** Row multiset as sorted canonical strings — array/binary cells render
    * element-wise, so equality is structural. One execution per side
    * (exceptAll would re-execute both plans per direction).
    */
  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map {
      case a: Array[_] => a.mkString("[", ",", "]")
      case s: scala.collection.Seq[_] => s.mkString("[", ",", "]")
      case x => String.valueOf(x)
    }.mkString("")).toSeq.sorted

  for (name <- SparkEntry.queries.keys.toSeq.sorted
       if !SqlFrontDoor.exemptions.contains(name)) {
    test(s"sql twin equals operator: $name") {
      Tables.registerAll(spark, Sf)
      val viaSql = spark.sql(SqlFrontDoor.sql(name).get)
      val viaDf = SparkEntry.queries(name)(spark, Sf)
      assert(viaSql.schema.map(f => (f.name, f.dataType)) ==
        viaDf.schema.map(f => (f.name, f.dataType)),
        s"schema differs:\n sql: ${viaSql.schema.treeString}\n df: ${viaDf.schema.treeString}")
      val (s1, s2) = (canon(viaSql), canon(viaDf))
      assert(s1.size == s2.size, s"row counts differ: sql=${s1.size} df=${s2.size}")
      assert(s1 == s2, {
        val firstDiff = s1.zip(s2).indexWhere { case (a, b) => a != b }
        s"result multisets differ (first diff at sorted row $firstDiff):" +
          s"\n sql: ${s1.lift(firstDiff)}\n df:  ${s2.lift(firstDiff)}"
      })
    }
  }
}
