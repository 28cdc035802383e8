package graft

import org.apache.spark.sql.types._

/** Testdata canary: asserts that `Tables.t` yields the engine-facing
  * schema for every table at sf0.001, so a driver-side testdata
  * regeneration that changes an on-disk encoding fails HERE with one
  * named, readable assertion instead of dozens of analysis errors
  * scattered across the downstream suites. (Round 11 lost 49 queries
  * and 63 tests to exactly that: events.ts silently moved from int64
  * TIMESTAMP(NANOS) to timestamp[us].)
  *
  * If this spec fails after a data refresh, fix the loader dispatch in
  * Tables.t — the engine must read whatever layout the driver ships.
  */
class TestdataSchemaSpec extends SparkSuite {

  private def fieldType(table: String, field: String): DataType =
    Tables.t(spark, Sf, table).schema(field).dataType

  test("events.ts loads as TimestampType regardless of on-disk encoding") {
    assert(fieldType("events", "ts") == TimestampType,
      "Tables.t must normalize events.ts to the session TimestampType; " +
        "the on-disk encoding has changed across testdata generations " +
        "(int64 ns vs timestamp[us]) — update the dispatch in Tables.t")
  }

  test("events core columns keep their engine-facing types") {
    assert(fieldType("events", "event_id") == LongType)
    assert(fieldType("events", "user_id") == LongType)
    assert(fieldType("events", "event_type") == StringType)
    assert(fieldType("events", "value") == DoubleType)
    assert(fieldType("events", "props") == StringType,
      "events.props is the raw JSON payload column; JSON kernels depend on it")
  }

  test("documents and embeddings keep their engine-facing types") {
    assert(fieldType("documents", "doc_id") == LongType)
    assert(fieldType("documents", "text") == StringType)
    assert(fieldType("documents", "lang") == StringType)
    assert(fieldType("documents", "source") == StringType)
    assert(fieldType("embeddings", "embedding").asInstanceOf[ArrayType]
      .elementType == FloatType,
      "vector kernels assume Array[Float] embeddings")
    assert(fieldType("embeddings", "label") == IntegerType)
  }

  test("every table loads and is non-empty at sf0.001") {
    Tables.names.foreach { n =>
      assert(Tables.t(spark, Sf, n).limit(1).count() == 1L, s"table $n is empty")
    }
  }
}
