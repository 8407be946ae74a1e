package graft.schema

import org.apache.spark.sql.types._

/** Typed column-default domain — the reference's `WrappedDefault`
  * (sql-builder/src/sql/types.rs:47-60: Text/Integer/BigInt/Float/Double/
  * Boolean/Date/DateTime/Custom), as a Scala ADT that additionally TYPE-
  * CHECKS the default against the column it is attached to (the reference
  * accepts any default on any column and lets Postgres reject it at DDL
  * time; here the mismatch fails fast at schema-build time).
  *
  * `render` is the value as it appears inside the DDL's `DEFAULT '<v>'`
  * quoting (pg.rs:44-47 renders every default single-quoted, including
  * numerics — Postgres coerces; we reproduce that shape for fidelity).
  */
sealed abstract class SqlDefault(val render: String) {
  /** Spark types this default may legally attach to. */
  def admits(dt: DataType): Boolean
}

object SqlDefault {
  final case class Text(v: String) extends SqlDefault(v) {
    def admits(dt: DataType): Boolean = dt == StringType
  }
  final case class Num(v: Long) extends SqlDefault(v.toString) {
    def admits(dt: DataType): Boolean = dt match {
      case ByteType | IntegerType | LongType => true
      case _: DecimalType => true
      case _ => false
    }
  }
  final case class Big(v: BigInt) extends SqlDefault(v.toString) {
    def admits(dt: DataType): Boolean = dt match {
      case LongType => v.isValidLong
      case _: DecimalType => true
      case _ => false
    }
  }
  final case class Fl(v: Float) extends SqlDefault(v.toString) {
    def admits(dt: DataType): Boolean =
      dt == FloatType || dt == DoubleType
  }
  final case class Dbl(v: Double) extends SqlDefault(v.toString) {
    def admits(dt: DataType): Boolean = dt == DoubleType
  }
  final case class Bool(v: Boolean) extends SqlDefault(v.toString) {
    def admits(dt: DataType): Boolean = dt == BooleanType
  }
  final case class DateV(v: java.time.LocalDate)
      extends SqlDefault(v.toString) {
    def admits(dt: DataType): Boolean = dt == DateType
  }
  final case class DateTimeV(v: java.time.Instant)
      extends SqlDefault(v.toString) {
    def admits(dt: DataType): Boolean = dt == TimestampType
  }
  /** Raw SQL escape hatch (types.rs Custom) — admits anything; the text
    * is the caller's responsibility, exactly as in the reference. */
  final case class Custom(sql: String) extends SqlDefault(sql) {
    def admits(dt: DataType): Boolean = true
  }

  /** Attach a default to a field, type-checked. The rendered value rides
    * the field's metadata under `Mapping.K.Default`, where the DDL
    * generator picks it up (pg.rs:44-47) and `Load.applyDefaults` can
    * replay it load-side.
    */
  def attach(f: StructField, d: SqlDefault): StructField = {
    require(d.admits(f.dataType),
      s"default $d does not admit column '${f.name}' of ${f.dataType}")
    val md = new MetadataBuilder().withMetadata(f.metadata)
      .putString(Mapping.K.Default, d.render).build()
    f.copy(metadata = md)
  }

  /** Attach defaults across a schema by column name (unknown names are an
    * error — a silently dropped default is a data bug waiting to load). */
  def attachAll(schema: StructType,
      defaults: Map[String, SqlDefault]): StructType = {
    val unknown = defaults.keySet -- schema.fieldNames.toSet
    require(unknown.isEmpty, s"defaults for unknown columns: $unknown")
    StructType(schema.fields.map(f =>
      defaults.get(f.name).map(attach(f, _)).getOrElse(f)))
  }
}
