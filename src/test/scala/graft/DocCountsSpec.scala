package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sql.SqlFrontDoor

/** The public contract docs (README.md, COVERAGE.md) state registry and
  * SQL-front-door counts; this spec derives the real numbers from the
  * code so the docs can never silently drift again (the r5/r6 advice
  * flagged exactly that — three different twin counts across two files).
  * No SparkSession needed: the counts are plain collection sizes.
  */
class DocCountsSpec extends AnyFunSuite {

  private def read(name: String): String = {
    val src = scala.io.Source.fromFile(name, "UTF-8")
    try src.mkString finally src.close()
  }

  test("front-door partition is consistent and total") {
    val twins = SqlFrontDoor.twins.keySet
    val aliases = SqlFrontDoor.incrementalTwins.keySet
    val portable = SqlFrontDoor.portable
    assert(SqlFrontDoor.exemptions.isEmpty)
    assert((twins intersect portable).isEmpty)
    assert((aliases intersect twins).isEmpty)
    assert((aliases intersect portable).isEmpty)
    assert((twins union aliases union portable) === SparkEntry.queries.keySet)
  }

  test("no duplicate registry keys in the source map literals") {
    // A Map literal with a repeated key silently keeps the last entry —
    // a new query accidentally reusing an existing name would override
    // the old operator without any compile- or runtime signal. Each name
    // must appear exactly twice in SparkEntry (queries + oracleSql) and
    // at most once in SqlFrontDoor (twin XOR portable pass-through).
    val key = """"(q_[a-z0-9_]+)" ->""".r
    val entry = key.findAllMatchIn(read("src/main/scala/graft/SparkEntry.scala"))
      .map(_.group(1)).toSeq
    val dupEntry = entry.groupBy(identity).filter(_._2.size != 2).keys
    assert(dupEntry.isEmpty, s"names not appearing exactly twice in SparkEntry: $dupEntry")
    val door = key.findAllMatchIn(read("src/main/scala/graft/sql/SqlFrontDoor.scala"))
      .map(_.group(1)).toSeq
    val dupDoor = door.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupDoor.isEmpty, s"names appearing more than once in SqlFrontDoor: $dupDoor")
  }

  test("README.md states the derived counts") {
    val readme = read("README.md")
    assert(readme.contains(s"${SparkEntry.queries.size} named queries"),
      s"README must say '${SparkEntry.queries.size} named queries'")
    assert(readme.contains(s"${SqlFrontDoor.portable.size} portable"),
      s"README must say '${SqlFrontDoor.portable.size} portable'")
    assert(readme.contains(s"${SqlFrontDoor.twins.size} hand-written"),
      s"README must say '${SqlFrontDoor.twins.size} hand-written'")
    assert(readme.contains(
      s"${SqlFrontDoor.incrementalTwins.size} incremental aliases"),
      s"README must say '${SqlFrontDoor.incrementalTwins.size} incremental aliases'")
  }

  test("COVERAGE.md states the derived counts") {
    val coverage = read("COVERAGE.md")
    assert(coverage.contains(s"${SqlFrontDoor.portable.size} portable"),
      s"COVERAGE must say '${SqlFrontDoor.portable.size} portable'")
    assert(coverage.contains(s"${SqlFrontDoor.twins.size} hand-written"),
      s"COVERAGE must say '${SqlFrontDoor.twins.size} hand-written'")
    assert(coverage.contains(
      s"${SqlFrontDoor.incrementalTwins.size} incremental aliases"),
      s"COVERAGE must say '${SqlFrontDoor.incrementalTwins.size} incremental aliases'")
  }
}
