package graft.sources

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

/** Schema contract between the driver-regenerated testdata and the engine's
  * read sites. The round-8 regeneration silently moved `events.ts` from
  * TIMESTAMP(NANOS) parquet to TIMESTAMP(MICROS) and broke four queries at
  * analysis time; this spec makes the NEXT drift fail with a named
  * assertion on the exact table/column instead of downstream
  * AnalysisExceptions. It pins (a) the raw physical columns each table must
  * carry and (b) the engine-facing contract after the normalizing reader
  * (`SparkEntry.eventsNanos`): ts is ALWAYS nanos-since-epoch LONG.
  */
class TestdataContractSpec extends AnyFunSuite with SparkTestHarness {

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(d).exists())

  // Engine-assumed columns per table (name -> required dtype, or None when
  // only presence matters). Schema-only reads: parquet footers, no data.
  private val contracts: Map[String, Map[String, Option[DataType]]] = Map(
    "region"   -> Map("r_regionkey" -> None, "r_name" -> Some(StringType)),
    "nation"   -> Map("n_nationkey" -> None, "n_regionkey" -> None,
                      "n_name" -> Some(StringType)),
    "customer" -> Map("c_custkey" -> None, "c_nationkey" -> None,
                      "c_acctbal" -> Some(DoubleType), "c_mktsegment" -> Some(StringType)),
    "supplier" -> Map("s_suppkey" -> None, "s_nationkey" -> None),
    "part"     -> Map("p_partkey" -> None, "p_retailprice" -> Some(DoubleType)),
    "orders"   -> Map("o_orderkey" -> None, "o_custkey" -> None,
                      "o_totalprice" -> Some(DoubleType), "o_orderstatus" -> Some(StringType)),
    "lineitem" -> Map("l_orderkey" -> None, "l_partkey" -> None, "l_suppkey" -> None,
                      "l_quantity" -> Some(DoubleType), "l_extendedprice" -> Some(DoubleType),
                      "l_discount" -> Some(DoubleType), "l_returnflag" -> Some(StringType),
                      "l_linestatus" -> Some(StringType)),
    "events"   -> Map("event_id" -> Some(LongType), "ts" -> None,
                      "user_id" -> Some(LongType), "event_type" -> Some(StringType),
                      "value" -> Some(DoubleType), "props" -> Some(StringType)),
    "documents" -> Map("doc_id" -> Some(LongType), "text" -> Some(StringType)),
    "embeddings" -> Map("vec_id" -> Some(LongType),
                        "embedding" -> Some(ArrayType(FloatType, containsNull = true)),
                        "label" -> None)
  )

  test("every testdata table carries the engine-assumed columns and dtypes") {
    assert(sfDirs.nonEmpty, "no /root/testdata/sf* directories present")
    for (dir <- sfDirs; (table, cols) <- contracts.toSeq.sortBy(_._1)) {
      val path = s"$dir/$table.parquet"
      assert(new java.io.File(path).exists(), s"$path missing")
      val schema = spark.read.parquet(path).schema
      for ((colName, dtype) <- cols) {
        val field = schema.fields.find(_.name == colName)
        assert(field.isDefined, s"$dir/$table: column `$colName` absent " +
          s"(driver testdata drifted; present: ${schema.fieldNames.mkString(",")})")
        dtype.foreach { dt =>
          // Array element nullability is writer-dependent; compare erased.
          def erase(t: DataType): DataType = t match {
            case ArrayType(e, _) => ArrayType(erase(e), containsNull = true)
            case other => other
          }
          assert(erase(field.get.dataType) == erase(dt),
            s"$dir/$table.`$colName`: expected $dt, testdata now has ${field.get.dataType}")
        }
      }
    }
  }

  test("events.ts physical dtype is one the normalizing reader handles") {
    for (dir <- sfDirs) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val dt = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
      assert(Set[DataType](LongType, TimestampType, TimestampNTZType).contains(dt),
        s"$dir/events.ts is $dt — extend SparkEntry.normalizeEventTs before " +
          "any query touches it")
    }
  }

  test("eventsNanos delivers the engine contract: ts = nanos-since-epoch LONG") {
    for (dir <- sfDirs) {
      val ev = graft.SparkEntry.eventsNanos(spark, dir)
      assert(ev.schema("ts").dataType == LongType,
        s"$dir: normalized events.ts is ${ev.schema("ts").dataType}, expected LongType")
    }
    // Value-level pin at the smallest SF: the normalized nanos floor-divided
    // to seconds must equal DuckDB's epoch_ns(ts)//1e9 convention — i.e. the
    // stored micros verbatim, no session-timezone shift. 2024-01-01 data:
    // every second must be in [2024-01-01, 2024-12-31] UTC.
    val sf = sfDirs.head
    val bounds = graft.SparkEntry.eventsNanos(spark, sf)
      .selectExpr("min(ts div 1000000000) AS lo", "max(ts div 1000000000) AS hi")
      .head()
    val lo = bounds.getLong(0); val hi = bounds.getLong(1)
    assert(lo >= 1704067200L && hi < 1735689600L,
      s"normalized epoch-second range [$lo,$hi] outside 2024 UTC — " +
        "timezone leaked into the ts normalization")
  }
}
