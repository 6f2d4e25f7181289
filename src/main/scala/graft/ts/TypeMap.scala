package graft.ts

import org.apache.spark.sql.types._

/** PyTables → Spark type mapping (SURVEY.md §1.3): the declaration surface
  * a reference user brings when porting an `IsDescription` schema to
  * `TsTable.create`. The reference pins rows to fixed-width C-struct
  * columns ([pub: tstables/tstable.py — PyTables IsDescription]); Spark has
  * no unsigned integers, so unsigned widths widen to the next signed type
  * that holds every value (UInt64 → Decimal(20,0), the only exact container).
  *
  * `StringCol(N)` drops the fixed-width-bytes semantics (Spark strings are
  * variable-length UTF-8); callers who need raw fixed-width bytes should
  * declare `binary` instead — both mappings are provided.
  */
object TypeMap {

  /** Spark type for a PyTables column declaration name, e.g. "Int64Col",
    * "UInt32Col", "Float64Col", "BoolCol", "StringCol". Accepts the
    * class-style names with or without the "Col" suffix, case-insensitive. */
  def sparkTypeFor(pyTablesType: String): DataType =
    pyTablesType.trim.toLowerCase.stripSuffix("col") match {
      case "int8"                => ByteType
      case "int16"               => ShortType
      case "int32"               => IntegerType
      case "int64" | "time64"    => LongType
      case "uint8"               => ShortType          // widen: no unsigned in Spark
      case "uint16"              => IntegerType
      case "uint32"              => LongType
      case "uint64"              => DecimalType(20, 0) // only exact signed container
      case "float32"             => FloatType
      case "float64"             => DoubleType
      case "bool"                => BooleanType
      case "string"              => StringType         // fixed-width → variable UTF-8
      case "bytes" | "binary"    => BinaryType
      case "timestamp"           => TimestampType      // reference: int64 ms UTC
      case other =>
        throw new IllegalArgumentException(
          s"unsupported PyTables type '$other' (reference supports fixed-width " +
            "scalar columns only; nested/array/map types are engine extensions " +
            "declared directly as Spark DataTypes)")
    }

  /** Build a Spark schema from (name, pyTablesType) pairs — the shape of an
    * IsDescription class body. The reference pins the first column to the
    * int64-ms timestamp; here any column may be the ts column as long as it
    * maps to TimestampType (TsTable.create re-validates). */
  def schemaFor(columns: Seq[(String, String)]): StructType =
    StructType(columns.map { case (name, t) =>
      StructField(name, sparkTypeFor(t), nullable = true)
    })
}
