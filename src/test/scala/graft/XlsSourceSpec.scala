package graft

import java.sql.Timestamp

import graft.sources.XlsSource

class XlsSourceSpec extends SparkTestBase {
  private val sample = "/root/reference/data/traffic_spreadsheet.xls"

  test("decodes the reference sample: 287 rows, 5-min grid, known stats") {
    assume(new java.io.File(sample).exists())
    val df = XlsSource.read(spark, sample)
    assert(df.columns.toSeq == Seq("time", "traffic"))
    assert(df.schema("time").dataType.typeName == "timestamp")
    assert(df.schema("traffic").dataType.typeName == "double")
    val rows = df.orderBy("time").collect()
    assert(rows.length == 287)
    assert(rows.head.getTimestamp(0) == Timestamp.valueOf("2021-05-23 00:00:00"))
    assert(rows.last.getTimestamp(0) == Timestamp.valueOf("2021-05-23 23:50:00"))
    // 5-minute grid
    val times = rows.map(_.getTimestamp(0).getTime)
    assert(times.sliding(2).forall { case Array(a, b) => b - a == 300000L })
    // value stats from byte-level ground truth (SURVEY §1.4)
    val traffic = rows.map(_.getDouble(1))
    assert(math.abs(traffic.min - 4.0498) < 1e-3)
    assert(math.abs(traffic.max - 9.3624) < 1e-3)
    assert(math.abs(traffic.sum / traffic.length - 6.95334) < 1e-4)
  }

  test("rejects a non-XLS file") {
    intercept[Exception](XlsSource.read(spark, "/root/repo/build.sbt"))
  }

  test("missing file raises ExtractError with the path") {
    val e = intercept[ExtractError](XlsSource.read(spark, "/tmp/nope.xls"))
    assert(e.getMessage.contains("/tmp/nope.xls"))
  }
}
