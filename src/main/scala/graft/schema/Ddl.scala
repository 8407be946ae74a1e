package graft.schema

import org.apache.spark.sql.types._

/** Dialect-pluggable DDL generation: the reference's `SqlGenerator` trait
  * (sql-builder/src/sql/mod.rs:9-12 — `create_table`/`create_column`) with
  * its one shipped instance (`Pg`, sql/generators/pg.rs:6), re-expressed as
  * a plain Scala typeclass over `StructType`. No Catalyst involvement — DDL
  * emission is pure string work, exactly as in the reference.
  *
  * Determinism fix: the reference iterates a `HashMap` (sql/table.rs:11,
  * 39-49) so its column order is nondeterministic run-to-run; we emit in
  * schema (describe) order, which makes golden-file testing possible.
  */
trait SqlGenerator {
  def createTable(table: String, schema: StructType): String
  def createColumn(field: StructField): String
}

object Ddl {

  /** Render `schema` as CREATE TABLE DDL in dialect `G`. */
  def generate[G <: SqlGenerator](table: String, schema: StructType)(
      implicit g: G): String =
    g.createTable(table, schema)

  /** Postgres dialect (pg.rs:8-86): quoted identifiers, `{inner}[]` array
    * recursion (pg.rs:67), NOT NULL / UNIQUE / PRIMARY KEY clauses
    * (pg.rs:48-57), DEFAULT rendering (pg.rs:44-47).
    */
  implicit object Pg extends SqlGenerator {

    def typeName(dt: DataType, md: Metadata): String = dt match {
      case StringType if md.contains(Mapping.K.Json) => "jsonb"
      // SF Time rides as StringType in Spark (no time-of-day type) but the
      // DDL must still say TIME (pg.rs stringify: Time → "TIME") — the
      // wire type carried in metadata disambiguates it from plain strings
      case StringType if md.contains(Mapping.K.SfType) &&
          md.getString(Mapping.K.SfType) == FieldType.Time.wireName => "time"
      case StringType if md.contains(Mapping.K.Length) =>
        s"varchar(${md.getLong(Mapping.K.Length)})"
      case StringType => "text"
      case BooleanType => "boolean"
      case ByteType => "smallint"
      case IntegerType => "int"
      case LongType => "bigint"
      case FloatType => "real"
      case DoubleType => "double precision"
      case DateType => "date"
      case TimestampType => "timestamp"
      case d: DecimalType => s"numeric(${d.precision},${d.scale})"
      // nested arrays recurse to arbitrary depth, `{}[]` style (pg.rs:67)
      case ArrayType(inner, _) => s"${typeName(inner, Metadata.empty)}[]"
      case other =>
        throw new IllegalArgumentException(s"no pg mapping for $other")
    }

    def createColumn(f: StructField): String = {
      val parts = Seq.newBuilder[String]
      parts += s""""${f.name}""""
      parts += typeName(f.dataType, f.metadata)
      if (f.metadata.contains(Mapping.K.Primary)) parts += "PRIMARY KEY"
      // DEFAULT sits between PRIMARY KEY and NOT NULL, always
      // single-quoted, matching pg.rs:44-47's clause order and quoting
      if (f.metadata.contains(Mapping.K.Default))
        parts += s"DEFAULT '${f.metadata.getString(Mapping.K.Default)}'"
      if (!f.metadata.contains(Mapping.K.Primary)) {
        if (!f.nullable) parts += "NOT NULL"
        if (f.metadata.contains(Mapping.K.Unique)) parts += "UNIQUE"
      }
      if (f.metadata.contains(Mapping.K.FkTable)) {
        val t = f.metadata.getString(Mapping.K.FkTable)
        val ks = f.metadata.getStringArray(Mapping.K.FkKeys)
          .map(k => s""""$k"""").mkString(", ")
        parts += s"""REFERENCES "$t" ($ks)"""
      }
      parts.result().mkString(" ")
    }

    def createTable(table: String, schema: StructType): String = {
      val cols = schema.fields.map(f => s"  ${createColumn(f)}")
      s"""CREATE TABLE IF NOT EXISTS "$table" (\n${cols.mkString(",\n")}\n);"""
    }
  }

  /** MySQL dialect — the SECOND instance, proving the typeclass is
    * genuinely dialect-pluggable (the reference ships the trait with one
    * impl and the promise of more, sql/mod.rs:9-12). Divergences the
    * typeclass absorbs: backtick quoting; no native arrays (arbitrary-
    * depth `{}[]` recursion collapses to a JSON column — the standard
    * MySQL answer); `json` not `jsonb`; DATETIME(6) for µs timestamps;
    * keyed string columns must be length-bounded (TEXT can't be a
    * PRIMARY KEY/UNIQUE key), so bare keyed strings become varchar(255);
    * declared lengths are capped (utf8mb4 varchar tops out at 16383
    * chars and the row itself at 65535 bytes, so an uncapped
    * varchar(32000) fails CREATE TABLE outright on stock MySQL 8 —
    * over-limit non-keyed columns collapse to TEXT, keyed ones to
    * varchar(min(N, 768)) so they stay indexable under the InnoDB
    * 3072-byte index cap); FK constraints are
    * emitted table-level (MySQL parses inline column `REFERENCES` but
    * silently ignores it — only a `FOREIGN KEY (...) REFERENCES ...`
    * table clause creates a real constraint).
    */
  /** DuckDB dialect — the THIRD instance, and the one that closes the
    * loop with this repo's own correctness rig: DDL generated here is
    * executable by the same DuckDB that replays every oracle (the
    * golden output is execution-validated there, not just
    * string-compared). Divergences the typeclass absorbs:
    * double-quoted identifiers and native `INNER[]` array recursion
    * (Pg-style); `json` (extension type — no jsonb variant); DuckDB
    * parses but does NOT enforce VARCHAR lengths, so declared lengths
    * are emitted for documentation value only; TIMESTAMP is natively
    * microsecond; inline column `REFERENCES` creates a real FK (unlike
    * MySQL's silent ignore). */
  implicit object DuckDb extends SqlGenerator {

    def typeName(dt: DataType, md: Metadata): String = dt match {
      case StringType if md.contains(Mapping.K.Json) => "json"
      case StringType if md.contains(Mapping.K.SfType) &&
          md.getString(Mapping.K.SfType) == FieldType.Time.wireName =>
        "time"
      case StringType if md.contains(Mapping.K.Length) =>
        s"varchar(${md.getLong(Mapping.K.Length)})"
      case StringType => "varchar"
      case BooleanType => "boolean"
      case ByteType => "tinyint"
      case IntegerType => "integer"
      case LongType => "bigint"
      case FloatType => "real"
      case DoubleType => "double"
      case DateType => "date"
      case TimestampType => "timestamp"
      case d: DecimalType => s"decimal(${d.precision},${d.scale})"
      case ArrayType(inner, _) => s"${typeName(inner, Metadata.empty)}[]"
      case other =>
        throw new IllegalArgumentException(s"no duckdb mapping for $other")
    }

    def createColumn(f: StructField): String = {
      val parts = Seq.newBuilder[String]
      parts += s""""${f.name}""""
      parts += typeName(f.dataType, f.metadata)
      if (f.metadata.contains(Mapping.K.Primary)) parts += "PRIMARY KEY"
      if (f.metadata.contains(Mapping.K.Default))
        parts += s"DEFAULT '${f.metadata.getString(Mapping.K.Default)}'"
      if (!f.metadata.contains(Mapping.K.Primary)) {
        if (!f.nullable) parts += "NOT NULL"
        if (f.metadata.contains(Mapping.K.Unique)) parts += "UNIQUE"
      }
      if (f.metadata.contains(Mapping.K.FkTable)) {
        val t = f.metadata.getString(Mapping.K.FkTable)
        val ks = f.metadata.getStringArray(Mapping.K.FkKeys)
          .map(k => s""""$k"""").mkString(", ")
        parts += s"""REFERENCES "$t" ($ks)"""
      }
      parts.result().mkString(" ")
    }

    def createTable(table: String, schema: StructType): String = {
      val cols = schema.fields.map(f => s"  ${createColumn(f)}")
      s"""CREATE TABLE IF NOT EXISTS "$table" (\n${cols.mkString(",\n")}\n);"""
    }
  }

  implicit object MySql extends SqlGenerator {

    /** utf8mb4 varchar limit in CHARACTERS (65535-byte row / 4 bytes). */
    private val MaxVarchar = 16383L
    /** Largest safely-indexable key prefix in CHARACTERS: InnoDB caps an
      * index key at 3072 bytes (DYNAMIC row format), utf8mb4 reserves 4
      * bytes per char → 3072 / 4 = 768. Capping lower (the legacy 255)
      * would silently shrink valid declared lengths of 256-768 and make
      * strict-mode inserts of in-range source values fail. */
    private val MaxKeyChars = 768L

    def typeName(dt: DataType, md: Metadata): String = dt match {
      case StringType if md.contains(Mapping.K.Json) => "json"
      case StringType if md.contains(Mapping.K.SfType) &&
          md.getString(Mapping.K.SfType) == FieldType.Time.wireName => "time"
      case StringType if md.contains(Mapping.K.Length) =>
        val n = md.getLong(Mapping.K.Length)
        val keyed = md.contains(Mapping.K.Primary) ||
          md.contains(Mapping.K.Unique)
        if (keyed) s"varchar(${math.min(n, MaxKeyChars)})"
        else if (n > MaxVarchar) "text"
        else s"varchar($n)"
      case StringType if md.contains(Mapping.K.Primary) ||
          md.contains(Mapping.K.Unique) => "varchar(255)"
      case StringType => "text"
      case BooleanType => "tinyint(1)"
      case ByteType => "tinyint"
      case IntegerType => "int"
      case LongType => "bigint"
      case FloatType => "float"
      case DoubleType => "double"
      case DateType => "date"
      case TimestampType => "datetime(6)"
      case d: DecimalType => s"decimal(${d.precision},${d.scale})"
      case ArrayType(_, _) => "json"
      case other =>
        throw new IllegalArgumentException(s"no mysql mapping for $other")
    }

    def createColumn(f: StructField): String = {
      val parts = Seq.newBuilder[String]
      parts += s"`${f.name}`"
      parts += typeName(f.dataType, f.metadata)
      if (f.metadata.contains(Mapping.K.Primary)) parts += "PRIMARY KEY"
      if (f.metadata.contains(Mapping.K.Default))
        parts += s"DEFAULT '${f.metadata.getString(Mapping.K.Default)}'"
      if (!f.metadata.contains(Mapping.K.Primary)) {
        if (!f.nullable) parts += "NOT NULL"
        if (f.metadata.contains(Mapping.K.Unique)) parts += "UNIQUE"
      }
      parts.result().mkString(" ")
    }

    def createTable(table: String, schema: StructType): String = {
      val cols = schema.fields.map(f => s"  ${createColumn(f)}")
      // FK constraints go table-level: MySQL accepts inline column
      // `REFERENCES` syntactically but creates NO foreign key from it
      val fks = schema.fields.collect {
        case f if f.metadata.contains(Mapping.K.FkTable) =>
          val t = f.metadata.getString(Mapping.K.FkTable)
          val ks = f.metadata.getStringArray(Mapping.K.FkKeys)
            .map(k => s"`$k`").mkString(", ")
          s"  FOREIGN KEY (`${f.name}`) REFERENCES `$t` ($ks)"
      }
      s"CREATE TABLE IF NOT EXISTS `$table` (\n" +
        s"${(cols ++ fks).mkString(",\n")}\n);"
    }
  }
}
