package graft

import graft.ts.{TsTable, TypeMap}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.nio.file.Files
import java.sql.Timestamp

/** PyTables → Spark type mapping (SURVEY §1.3): declaration names resolve,
  * unsigned types widen losslessly, and a schema built from a reference-
  * style description drives a real TsTable round-trip. */
class TypeMapSpec extends SparkSpec {

  test("scalar declaration names map per the SURVEY §1.3 table") {
    assert(TypeMap.sparkTypeFor("Int8Col") == ByteType)
    assert(TypeMap.sparkTypeFor("Int16Col") == ShortType)
    assert(TypeMap.sparkTypeFor("Int32Col") == IntegerType)
    assert(TypeMap.sparkTypeFor("Int64Col") == LongType)
    assert(TypeMap.sparkTypeFor("UInt32Col") == LongType)
    assert(TypeMap.sparkTypeFor("UInt64Col") == DecimalType(20, 0))
    assert(TypeMap.sparkTypeFor("Float32Col") == FloatType)
    assert(TypeMap.sparkTypeFor("Float64Col") == DoubleType)
    assert(TypeMap.sparkTypeFor("BoolCol") == BooleanType)
    assert(TypeMap.sparkTypeFor("StringCol") == StringType)
    assert(TypeMap.sparkTypeFor("timestamp") == TimestampType)
    // case/suffix-insensitive — including all-caps/mixed-case suffixes
    // (round-3 advice: the suffix strip must come AFTER lowercasing)
    assert(TypeMap.sparkTypeFor("int64") == LongType)
    assert(TypeMap.sparkTypeFor("INT64COL") == LongType)
    assert(TypeMap.sparkTypeFor("Int64COL") == LongType)
    assert(TypeMap.sparkTypeFor(" uint64col ") == DecimalType(20, 0))
    intercept[IllegalArgumentException] { TypeMap.sparkTypeFor("ComplexCol") }
  }

  test("a reference-style description builds a schema that round-trips a TsTable") {
    // the README's PriceUpdate(IsDescription) shape: timestamp + price
    val schema = TypeMap.schemaFor(Seq(
      "ts" -> "timestamp", "price" -> "Float64Col", "qty" -> "UInt32Col"))
    assert(schema == StructType(Seq(
      StructField("ts", TimestampType), StructField("price", DoubleType),
      StructField("qty", LongType))))
    val dir = Files.createTempDirectory("typemap_spec").toString
    val tab = TsTable.create(spark, dir, schema)
    val rows = Seq(
      Row(Timestamp.valueOf("2024-03-01 10:00:00"), 101.25, 7L),
      Row(Timestamp.valueOf("2024-03-01 11:00:00"), 101.50, 9L))
    tab.append(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema))
    val got = TsTable.open(spark, dir)
    // names/types round-trip; the descriptor additionally carries the
    // parquet field ids create() stamps (the renameColumn substrate)
    assert(got.schema.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq)
    assert(got.toDF.count() == 2)
  }
}
