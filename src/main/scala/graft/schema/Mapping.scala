package graft.schema

import org.apache.spark.sql.types._

/** Field-type → Spark-type mapping: the `column_from_field` equivalent
  * (sql-builder/src/main.rs:84-101), the semantic heart of the reference's
  * ETL. Total over all 28 `FieldType`s (property-tested).
  *
  * Constraint bits the reference encodes as column-type combinators
  * (sql/types.rs:149-175 — `.nullable().unique().primary()`) map to
  * `StructField.nullable` + `Metadata`, since Spark schemas have no
  * DDL-level unique/PK/FK enforcement. The DDL generator (Ddl.scala) reads
  * them back out when emitting CREATE TABLE.
  */
object Mapping {

  /** Metadata keys carried on mapped StructFields. */
  object K {
    val Primary = "graft.primary"     // Id → primary key (main.rs:90)
    val Unique = "graft.unique"       // describe `unique` (main.rs:72)
    val Custom = "graft.custom"
    val Encrypted = "graft.encrypted"
    val Length = "graft.length"       // varchar length (main.rs:99)
    val Precision = "graft.precision"
    val Scale = "graft.scale"
    val FkTable = "graft.fk.table"    // Reference → FK (main.rs:89)
    val FkKeys = "graft.fk.keys"
    val Json = "graft.json"           // AnyType → jsonb (main.rs:91)
    val SfType = "graft.sf.type"      // original wire type, for round-trip
    val Default = "graft.default"     // rendered DEFAULT value (pg.rs:44-47)
  }

  import FieldType._

  /** The type mapping of main.rs:84-101, transposed to Spark `DataType`
    * (decision table in SURVEY §1.2d):
    *  - MultiPicklist → array(varchar) (main.rs:88) → ArrayType(String)
    *  - Reference → FK varchar (main.rs:89) → String + FK metadata
    *  - Id → primary varchar (main.rs:90) → String + primary metadata
    *  - AnyType → jsonb (main.rs:91) → String + json metadata
    *  - Boolean/Date/DateTime/Double/Int/Long → native (main.rs:92-98)
    *  - Time → Spark has no time-of-day type → String (ISO-8601, lossless)
    *  - everything else → varchar(length) (main.rs:99) → String
    */
  def dataTypeOf(t: FieldType): DataType = t match {
    case MultiPicklist => ArrayType(StringType, containsNull = false)
    case Boolean => BooleanType
    case Date => DateType
    case DateTime => TimestampType
    case Double => DoubleType
    case Int => IntegerType
    case Long => LongType
    case Byte => ByteType
    case _ => StringType // Id, Reference, AnyType, Time, String, Email, ...
  }

  /** Fidelity-improving variant: the reference flattens Currency/Percent
    * to sized varchar and DISCARDS their describe precision/scale
    * (main.rs:99) — with `decimalMode = true`, numeric money-like fields
    * with declared precision map to DecimalType(precision, scale)
    * instead, making downstream aggregation exact. Default stays
    * reference-faithful.
    */
  def dataTypeOf(f: SfField, decimalMode: Boolean): DataType =
    f.fieldType match {
      case Currency | Percent if decimalMode && f.precision > 0 =>
        DecimalType(f.precision min DecimalType.MAX_PRECISION,
          f.scale max 0)
      case t => dataTypeOf(t)
    }

  /** Map one describe field to a StructField, applying nullability and
    * uniqueness from describe metadata exactly as main.rs:70-72 does.
    */
  def fieldToStructField(f: SfField): StructField = {
    val b = new MetadataBuilder()
    b.putString(K.SfType, f.fieldType.wireName)
    if (f.fieldType == Id) b.putBoolean(K.Primary, value = true)
    if (f.unique) b.putBoolean(K.Unique, value = true)
    if (f.custom) b.putBoolean(K.Custom, value = true)
    if (f.encrypted) b.putBoolean(K.Encrypted, value = true)
    if (f.length > 0) b.putLong(K.Length, f.length.toLong)
    if (f.precision > 0) b.putLong(K.Precision, f.precision.toLong)
    if (f.scale > 0) b.putLong(K.Scale, f.scale.toLong)
    if (f.fieldType == Reference)
      f.relationshipName.foreach { rel =>
        b.putString(K.FkTable, rel)
        b.putStringArray(K.FkKeys, Array("Id")) // foreign(rel,["Id"]), main.rs:89
      }
    if (f.fieldType == AnyType) b.putBoolean(K.Json, value = true)
    // Id is never nullable regardless of describe (it's the PK); others
    // follow `nillable` (main.rs:70).
    val nullable = f.fieldType != Id && f.nillable
    StructField(f.name, dataTypeOf(f.fieldType), nullable, b.build())
  }

  /** Describe envelope → frozen Spark schema, in describe order (fixing the
    * reference's HashMap nondeterminism, sql/table.rs:11,39-49).
    */
  def describeToStructType(d: DescribeResponse): StructType =
    StructType(d.fields.map(fieldToStructField))

  def describeToStructType(json: String): StructType =
    describeToStructType(DescribeResponse.parse(json))
}
