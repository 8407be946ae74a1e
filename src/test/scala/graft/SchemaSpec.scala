package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.schema._

/** Schema-layer tests, mirroring the reference's canned-fixture style
  * (mock_describe_response, oxidized-force/src/client.rs:485-495) plus the
  * golden-DDL and totality tests the reference lacks (sql-builder has zero
  * tests; its HashMap column order made goldens impossible — ours is
  * describe-ordered and deterministic).
  */
class SchemaSpec extends AnyFunSuite {

  // The reference's describe fixture shape (client.rs:485-495), widened to
  // cover every interesting mapping branch.
  val describeJson: String =
    """{
      "name": "Case",
      "fields": [
        {"name": "Id", "type": "id", "length": 18, "nillable": false,
         "unique": false, "updateable": false},
        {"name": "AccountId", "type": "reference", "length": 18,
         "nillable": true, "relationshipName": "Account"},
        {"name": "Description", "type": "textarea", "length": 32000,
         "nillable": true},
        {"name": "Tags__c", "type": "multipicklist", "length": 4099,
         "custom": true},
        {"name": "Payload__c", "type": "anyType", "custom": true},
        {"name": "IsEscalated", "type": "boolean", "nillable": false},
        {"name": "CreatedDate", "type": "datetime", "nillable": false},
        {"name": "DueDate", "type": "date"},
        {"name": "SlaTime", "type": "time"},
        {"name": "Amount", "type": "double", "precision": 18, "scale": 2},
        {"name": "CaseNumber", "type": "string", "length": 30,
         "nillable": false, "unique": true},
        {"name": "Votes", "type": "int"}
      ]
    }"""

  test("describe JSON parses with field order preserved") {
    val d = DescribeResponse.parse(describeJson)
    assert(d.name == "Case")
    assert(d.fieldNames == Seq("Id", "AccountId", "Description", "Tags__c",
      "Payload__c", "IsEscalated", "CreatedDate", "DueDate", "SlaTime",
      "Amount", "CaseNumber", "Votes"))
    assert(d.fields(1).relationshipName.contains("Account"))
    assert(d.fields(3).custom)
    assert(!d.fields(0).nillable)
  }

  test("column_from_field mapping (main.rs:84-101) → Spark types") {
    val st = Mapping.describeToStructType(describeJson)
    val byName = st.fields.map(f => f.name -> f).toMap
    assert(byName("Id").dataType == StringType)
    assert(!byName("Id").nullable)
    assert(byName("Id").metadata.getBoolean(Mapping.K.Primary))
    assert(byName("AccountId").metadata.getString(Mapping.K.FkTable) ==
      "Account")
    assert(byName("AccountId").metadata.getStringArray(Mapping.K.FkKeys)
      .toSeq == Seq("Id"))
    assert(byName("Tags__c").dataType ==
      ArrayType(StringType, containsNull = false))
    assert(byName("Payload__c").metadata.getBoolean(Mapping.K.Json))
    assert(byName("IsEscalated").dataType == BooleanType)
    assert(byName("CreatedDate").dataType == TimestampType)
    assert(byName("DueDate").dataType == DateType)
    assert(byName("SlaTime").dataType == StringType) // no time-of-day type
    assert(byName("Amount").dataType == DoubleType)
    assert(byName("Votes").dataType == IntegerType)
    assert(byName("CaseNumber").metadata.getBoolean(Mapping.K.Unique))
    assert(byName("CaseNumber").metadata.getLong(Mapping.K.Length) == 30L)
  }

  test("mapping is total over all 28 FieldTypes and nillable is honored") {
    assert(FieldType.all.size == 28)
    // exhaustive over the full 28×2 domain (stronger than sampling)
    for (ft <- FieldType.all; nillable <- Seq(true, false)) {
      val sf = Mapping.fieldToStructField(
        SfField("f", ft, length = 10, nillable = nillable))
      assert(sf.dataType != null)
      // Id is a PK and never nullable; everything else follows nillable
      if (ft == FieldType.Id) assert(!sf.nullable)
      else assert(sf.nullable == nillable, s"$ft nillable=$nillable")
    }
  }

  test("wire-name round trip for all FieldTypes, case-insensitively") {
    FieldType.all.foreach { ft =>
      assert(FieldType.fromWire(ft.wireName) == ft)
      assert(FieldType.fromWire(ft.wireName.toUpperCase) == ft)
    }
    assertThrows[IllegalArgumentException](FieldType.fromWire("nope"))
  }

  // Note Tags__c: MultiPicklist maps to array(varchar(None)) — the element
  // type is UNSIZED in the reference (main.rs:88); the field's wire length
  // applies to the undecoded "a;b;c" string, not the elements. Unsized
  // varchar renders as text.
  test("golden Pg DDL (pg.rs:8-57 semantics, deterministic column order)") {
    val ddl = Ddl.generate("Case", Mapping.describeToStructType(describeJson))(
      Ddl.Pg)
    val expected =
      """CREATE TABLE IF NOT EXISTS "Case" (
        |  "Id" varchar(18) PRIMARY KEY,
        |  "AccountId" varchar(18) REFERENCES "Account" ("Id"),
        |  "Description" varchar(32000),
        |  "Tags__c" text[],
        |  "Payload__c" jsonb,
        |  "IsEscalated" boolean NOT NULL,
        |  "CreatedDate" timestamp NOT NULL,
        |  "DueDate" date,
        |  "SlaTime" time,
        |  "Amount" double precision,
        |  "CaseNumber" varchar(30) NOT NULL UNIQUE,
        |  "Votes" int
        |);""".stripMargin
    assert(ddl == expected)
  }

  test("golden MySQL DDL: second dialect through the same typeclass") {
    // same describe fixture, different SqlGenerator instance — the
    // divergences (backticks, arrays→json, jsonb→json, datetime(6),
    // tinyint(1), varchar length caps, table-level FOREIGN KEY) live
    // entirely in the instance, as the reference's pluggable-generator
    // design intends (sql/mod.rs:9-12)
    val ddl = Ddl.generate("Case",
      Mapping.describeToStructType(describeJson))(Ddl.MySql)
    val expected =
      """CREATE TABLE IF NOT EXISTS `Case` (
        |  `Id` varchar(18) PRIMARY KEY,
        |  `AccountId` varchar(18),
        |  `Description` text,
        |  `Tags__c` json,
        |  `Payload__c` json,
        |  `IsEscalated` tinyint(1) NOT NULL,
        |  `CreatedDate` datetime(6) NOT NULL,
        |  `DueDate` date,
        |  `SlaTime` time,
        |  `Amount` double,
        |  `CaseNumber` varchar(30) NOT NULL UNIQUE,
        |  `Votes` int,
        |  FOREIGN KEY (`AccountId`) REFERENCES `Account` (`Id`)
        |);""".stripMargin
    assert(ddl == expected)
  }

  test("golden DuckDB DDL: the oracle engine's own dialect, third " +
      "instance through the same typeclass") {
    // execution-validated: this exact string runs green under the
    // DuckDB that replays every oracle (varchar lengths parsed-not-
    // enforced, json extension type, native arrays, inline FK)
    val ddl = Ddl.generate("Case",
      Mapping.describeToStructType(describeJson))(Ddl.DuckDb)
    val expected =
      """CREATE TABLE IF NOT EXISTS "Case" (
        |  "Id" varchar(18) PRIMARY KEY,
        |  "AccountId" varchar(18) REFERENCES "Account" ("Id"),
        |  "Description" varchar(32000),
        |  "Tags__c" varchar[],
        |  "Payload__c" json,
        |  "IsEscalated" boolean NOT NULL,
        |  "CreatedDate" timestamp NOT NULL,
        |  "DueDate" date,
        |  "SlaTime" time,
        |  "Amount" double,
        |  "CaseNumber" varchar(30) NOT NULL UNIQUE,
        |  "Votes" integer
        |);""".stripMargin
    assert(ddl == expected)
  }

  test("MySQL length caps: over-limit strings collapse safely") {
    // non-keyed 32000-char column would exceed both the utf8mb4 varchar
    // limit (16383 chars) and the 65535-byte row — must become TEXT
    val huge = StructField("Description", StringType, nullable = true,
      new MetadataBuilder().putLong(Mapping.K.Length, 32000L).build())
    assert(Ddl.MySql.typeName(huge.dataType, huge.metadata) == "text")
    // keyed columns can't be TEXT (not indexable) — cap to varchar(768),
    // the utf8mb4 char count that fits the InnoDB 3072-byte index limit
    val keyedHuge = StructField("Code", StringType, nullable = false,
      new MetadataBuilder().putLong(Mapping.K.Length, 32000L)
        .putBoolean(Mapping.K.Unique, true).build())
    assert(Ddl.MySql.typeName(keyedHuge.dataType, keyedHuge.metadata) ==
      "varchar(768)")
    // declared lengths in (255, 768] are NOT shrunk for keyed columns —
    // they are both valid varchars and fully indexable
    val keyedMid = new MetadataBuilder().putLong(Mapping.K.Length, 400L)
      .putBoolean(Mapping.K.Primary, true).build()
    assert(Ddl.MySql.typeName(StringType, keyedMid) == "varchar(400)")
    // in-range lengths pass through untouched, keyed or not
    val ok = new MetadataBuilder().putLong(Mapping.K.Length, 16383L).build()
    assert(Ddl.MySql.typeName(StringType, ok) == "varchar(16383)")
  }

  test("nested array DDL recurses {}[] style (pg.rs:67)") {
    val st = StructType(Seq(StructField("deep",
      ArrayType(ArrayType(IntegerType)), nullable = true)))
    val ddl = Ddl.Pg.createColumn(st.fields(0))
    assert(ddl == "\"deep\" int[][]")
  }

  test("DEFAULT renders single-quoted between PK and NOT NULL (pg.rs:44-47)") {
    val base = Mapping.describeToStructType(describeJson)
    val withDefaults = SqlDefault.attachAll(base, Map(
      "Votes" -> SqlDefault.Num(0),
      "IsEscalated" -> SqlDefault.Bool(false),
      "Description" -> SqlDefault.Text("n/a")))
    val byName = withDefaults.fields.map(f => f.name -> f).toMap
    assert(Ddl.Pg.createColumn(byName("Votes")) ==
      """"Votes" int DEFAULT '0'""")
    // DEFAULT precedes NOT NULL, reference clause order
    assert(Ddl.Pg.createColumn(byName("IsEscalated")) ==
      """"IsEscalated" boolean DEFAULT 'false' NOT NULL""")
    assert(Ddl.Pg.createColumn(byName("Description")) ==
      """"Description" varchar(32000) DEFAULT 'n/a'""")
  }

  test("SqlDefault type-checks against the column (unlike WrappedDefault)") {
    val votes = StructField("Votes", IntegerType)
    assertThrows[IllegalArgumentException](
      SqlDefault.attach(votes, SqlDefault.Text("zero")))
    assertThrows[IllegalArgumentException](
      SqlDefault.attach(StructField("b", BooleanType), SqlDefault.Num(1)))
    // Custom is the deliberate escape hatch — admits anything
    val c = SqlDefault.attach(votes, SqlDefault.Custom("nextval('seq')"))
    assert(c.metadata.getString(Mapping.K.Default) == "nextval('seq')")
    // unknown column names are an error, not a silent no-op
    assertThrows[IllegalArgumentException](
      SqlDefault.attachAll(StructType(Seq(votes)),
        Map("Nope" -> SqlDefault.Num(1))))
  }

  test("flagship CLI: describe file → DDL file end-to-end (main.rs:50-82)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cli")
    val in = dir.resolve("case.json")
    val out = dir.resolve("case.sql")
    java.nio.file.Files.writeString(in, describeJson)
    SqlBuilderCli.main(Array("--in", in.toString, "--out", out.toString))
    val ddl = java.nio.file.Files.readString(out)
    assert(ddl.startsWith("""CREATE TABLE IF NOT EXISTS "Case" ("""))
    assert(ddl.contains(""""Id" varchar(18) PRIMARY KEY"""))
    assert(ddl.contains(""""SlaTime" time"""))
    // --table override mirrors Table::new(args.name)
    SqlBuilderCli.main(Array("--in", in.toString, "--out", out.toString,
      "--table", "case_v2"))
    assert(java.nio.file.Files.readString(out)
      .startsWith("""CREATE TABLE IF NOT EXISTS "case_v2" ("""))
    // malformed usage yields the usage string, not a stack dive
    assertThrows[IllegalArgumentException](
      SqlBuilderCli.parseArgs(Array("--in", in.toString)))
    assertThrows[IllegalArgumentException](
      SqlBuilderCli.parseArgs(Array("--frobnicate")))
    // --dialect mysql routes through the second SqlGenerator instance
    SqlBuilderCli.main(Array("--in", in.toString, "--out", out.toString,
      "--dialect", "mysql"))
    val my = java.nio.file.Files.readString(out)
    assert(my.startsWith("CREATE TABLE IF NOT EXISTS `Case` ("))
    assert(my.contains("`Tags__c` json"))
    assert(my.contains("`CreatedDate` datetime(6) NOT NULL"))
    assertThrows[IllegalArgumentException](
      SqlBuilderCli.parseArgs(Array("--in", in.toString, "--out",
        out.toString, "--dialect", "oracle")))
  }

  test("CLI --object mode: DDL from the engine's own table registry") {
    // live-pipeline parity (main.rs runs describe → generate in one
    // binary): --object introspects etl.Tables.schemas — the SAME frozen
    // StructTypes every scan reads with — so the DDL cannot drift from
    // what the engine loads
    val dir = java.nio.file.Files.createTempDirectory("graft-cli-obj")
    val out = dir.resolve("customer.sql")
    SqlBuilderCli.main(Array("--object", "customer", "--out",
      out.toString))
    val ddl = java.nio.file.Files.readString(out)
    assert(ddl.startsWith("""CREATE TABLE IF NOT EXISTS "customer" ("""))
    assert(ddl.contains(""""c_custkey" bigint"""))
    assert(ddl.contains(""""c_acctbal" double precision"""))
    // every registered table generates in both dialects without error
    etl.Tables.schemas.keys.foreach { t =>
      assert(SqlBuilderCli.runObject(t, None, "pg")
        .startsWith("CREATE TABLE"))
      assert(SqlBuilderCli.runObject(t, None, "mysql")
        .startsWith("CREATE TABLE"))
    }
    // unknown object is a clear error listing the registry
    val e = intercept[IllegalArgumentException](
      SqlBuilderCli.runObject("nope", None))
    assert(e.getMessage.contains("customer"))
    // --in and --object are mutually exclusive; --decimal-mode is
    // describe-file-only
    assertThrows[IllegalArgumentException](SqlBuilderCli.parseArgs(
      Array("--in", "x.json", "--object", "customer", "--out", "y.sql")))
    assertThrows[IllegalArgumentException](SqlBuilderCli.parseArgs(
      Array("--object", "customer", "--out", "y.sql", "--decimal-mode")))
  }

  test("decimal-mode CLI maps Currency/Percent to DECIMAL(p,s)") {
    val json =
      """{"name": "Opp", "fields": [
        {"name": "Id", "type": "id", "length": 18, "nillable": false},
        {"name": "Amount", "type": "currency", "precision": 18, "scale": 2},
        {"name": "Margin", "type": "percent", "precision": 5, "scale": 2}
      ]}"""
    val faithful = SqlBuilderCli.run(json, None, decimalMode = false)
    assert(faithful.contains(""""Amount" text""") ||
      faithful.contains(""""Amount" varchar"""))
    val decimal = SqlBuilderCli.run(json, None, decimalMode = true)
    assert(decimal.contains(""""Amount" numeric(18,2)"""))
    assert(decimal.contains(""""Margin" numeric(5,2)"""))
  }
}
