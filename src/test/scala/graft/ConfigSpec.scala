package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.{EtlConfig, WriteDisposition}

class ConfigSpec extends AnyFunSuite {
  private val full = Map(
    "PROJECT_ID" -> "p", "GCS_BUCKET" -> "file:///tmp/b/",
    "BQ_DATASET" -> "d", "BQ_TABLE" -> "t")

  test("loads valid config with derived URIs (reference config.py:24-31)") {
    val c = EtlConfig.fromMap(full)
    assert(c.inputUri == "file:///tmp/b/raw_data/traffic_spreadsheet.xls")
    assert(c.tableId == "p.d.t")
    assert(c.writeDisposition == WriteDisposition.Append)
  }

  test("collects ALL missing keys in one error (reference config.py:41-46)") {
    val e = intercept[ConfigError](EtlConfig.fromMap(Map("PROJECT_ID" -> "p")))
    assert(e.getMessage.contains("GCS_BUCKET"))
    assert(e.getMessage.contains("BQ_DATASET"))
    assert(e.getMessage.contains("BQ_TABLE"))
  }

  test("blank values count as missing") {
    val e = intercept[ConfigError](EtlConfig.fromMap(full + ("BQ_TABLE" -> "  ")))
    assert(e.getMessage.contains("BQ_TABLE"))
  }

  test("disposition enum validated (reference config.py:47-54)") {
    assert(EtlConfig.fromMap(full + ("BQ_WRITE_DISPOSITION" -> "truncate"))
      .writeDisposition == WriteDisposition.Truncate)
    assert(EtlConfig.fromMap(full + ("BQ_WRITE_DISPOSITION" -> "Append"))
      .writeDisposition == WriteDisposition.Append)
    val e = intercept[ConfigError](
      EtlConfig.fromMap(full + ("BQ_WRITE_DISPOSITION" -> "replace")))
    assert(e.getMessage.contains("replace"))
  }
}
