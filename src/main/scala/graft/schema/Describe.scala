package graft.schema

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Wire-schema model for SObject introspection.
  *
  * Mirrors the reference's describe surface: the 28-variant field-type
  * enumeration (oxidized-force/src/response.rs:100-143), the per-column
  * metadata record (response.rs:65-85), and the describe envelope
  * (response.rs:145-154) — re-expressed as a Scala ADT + json4s codec
  * instead of serde derives. Field names follow the public Salesforce
  * describe wire format (camelCase keys, lower-camel type names).
  */
sealed abstract class FieldType(val wireName: String)

object FieldType {
  case object Id extends FieldType("id")
  case object Base64 extends FieldType("base64")
  case object Boolean extends FieldType("boolean")
  case object Byte extends FieldType("byte")
  case object Date extends FieldType("date")
  case object Double extends FieldType("double")
  case object Int extends FieldType("int")
  case object Long extends FieldType("long")
  case object String extends FieldType("string")
  case object Time extends FieldType("time")
  case object Address extends FieldType("address")
  case object AnyType extends FieldType("anyType")
  case object Calculated extends FieldType("calculated")
  case object Currency extends FieldType("currency")
  case object Email extends FieldType("email")
  case object JunctionIdList extends FieldType("junctionIdList")
  case object Location extends FieldType("location")
  case object Percent extends FieldType("percent")
  case object Phone extends FieldType("phone")
  case object Picklist extends FieldType("picklist")
  case object Reference extends FieldType("reference")
  case object Url extends FieldType("url")
  case object TextArea extends FieldType("textarea")
  case object DateTime extends FieldType("datetime")
  case object ComboBox extends FieldType("combobox")
  case object EncryptedString extends FieldType("encryptedstring")
  case object MasterRecord extends FieldType("masterrecord")
  case object MultiPicklist extends FieldType("multipicklist")

  /** All 28 variants (response.rs:100-143). */
  val all: Seq[FieldType] = Seq(
    Id, Base64, Boolean, Byte, Date, Double, Int, Long, String, Time,
    Address, AnyType, Calculated, Currency, Email, JunctionIdList, Location,
    Percent, Phone, Picklist, Reference, Url, TextArea, DateTime, ComboBox,
    EncryptedString, MasterRecord, MultiPicklist)

  private val byName: Map[String, FieldType] =
    all.map(t => t.wireName.toLowerCase -> t).toMap

  def fromWire(s: String): FieldType =
    byName.getOrElse(s.toLowerCase,
      throw new IllegalArgumentException(s"unknown field type: $s"))
}

/** Per-column describe metadata (response.rs:65-85). `nillable` drives
  * nullability, `unique` the unique constraint, `relationshipName` the FK
  * target for `Reference` fields (sql-builder/src/main.rs:69-74,89).
  */
final case class SfField(
    name: String,
    fieldType: FieldType,
    length: Int = 0,
    precision: Int = 0,
    scale: Int = 0,
    custom: Boolean = false,
    encrypted: Boolean = false,
    updateable: Boolean = true,
    nillable: Boolean = true,
    unique: Boolean = false,
    relationshipName: Option[String] = None)

/** Describe envelope (response.rs:145-154). */
final case class DescribeResponse(name: String, fields: Seq[SfField]) {
  /** Explicit field list for SELECT building (response.rs:147-153). */
  def fieldNames: Seq[String] = fields.map(_.name)
}

object DescribeResponse {

  /** Parse a describe JSON document (the `GET /sobjects/{name}/describe`
    * response shape, client.rs:208-212). Unknown keys are ignored; only the
    * keys the reference consumes are modeled. Field order is preserved —
    * unlike the reference's HashMap-backed table (sql/table.rs:11), whose
    * DDL column order is nondeterministic; we treat describe order as
    * canonical schema order.
    */
  def parse(json: String): DescribeResponse = {
    val root = JsonMethods.parse(json)
    def str(v: JValue, key: String): Option[String] =
      v \ key match { case JString(s) => Some(s); case _ => None }
    def int(v: JValue, key: String): Int =
      v \ key match { case JInt(i) => i.toInt; case JLong(l) => l.toInt
        case JDouble(d) => d.toInt; case _ => 0 }
    def bool(v: JValue, key: String, default: Boolean): Boolean =
      v \ key match { case JBool(b) => b; case _ => default }
    val name = str(root, "name").getOrElse(
      throw new IllegalArgumentException("describe JSON missing 'name'"))
    val fields = (root \ "fields") match {
      case JArray(fs) => fs.map { f =>
        SfField(
          name = str(f, "name").getOrElse(
            throw new IllegalArgumentException("field missing 'name'")),
          fieldType = FieldType.fromWire(str(f, "type").getOrElse("string")),
          length = int(f, "length"),
          precision = int(f, "precision"),
          scale = int(f, "scale"),
          custom = bool(f, "custom", default = false),
          encrypted = bool(f, "encrypted", default = false),
          updateable = bool(f, "updateable", default = true),
          nillable = bool(f, "nillable", default = true),
          unique = bool(f, "unique", default = false),
          relationshipName = str(f, "relationshipName"))
      }
      case _ => Nil
    }
    DescribeResponse(name, fields)
  }
}
