package graft

import java.nio.file.{Files, Paths}
import graft.schema.{Ddl, Mapping}

/** Flagship CLI: describe JSON → frozen schema → CREATE TABLE DDL → file —
  * the reference's headline executable pipeline (sql-builder/src/main.rs:
  * 50-82: describe → Table → `table.generate::<Pg>()` → output file),
  * minus the live HTTP login/describe step: the describe document arrives
  * as a file (the REST-scan layer in `etl.Tables` covers the live-source
  * side separately), which also makes the pipeline reproducible and
  * testable offline.
  *
  * Usage:
  *   SqlBuilderCli --in describe.json --out table.sql
  *   SqlBuilderCli --object NAME --out table.sql
  *     [--table NAME]      override the table name (default: describe name,
  *                         like main.rs:63 `Table::new(args.name)`)
  *     [--decimal-mode]    map Currency/Percent to DECIMAL(p,s) instead of
  *                         the reference-faithful sized varchar
  *                         (describe-file mode only)
  *     [--dialect pg|mysql|duckdb] target dialect (default pg) — selects the
  *                         SqlGenerator instance, like `generate::<Pg>()`
  *
  * `--object NAME` is the live-pipeline parity mode (main.rs:50-82 runs
  * login → describe → generate in one binary): it introspects the named
  * table's schema from the SOURCE LAYER itself — `etl.Tables.schemas`,
  * the same frozen StructTypes every scan in the engine reads with —
  * instead of a describe file, so the emitted DDL can never drift from
  * what the engine actually loads.
  *
  * Pure driver-side string work — no SparkSession is started (DDL
  * generation never touches data, exactly as in the reference).
  */
object SqlBuilderCli {

  final case class Opts(in: String, out: String, table: Option[String],
      decimalMode: Boolean, dialect: String = "pg",
      obj: Option[String] = None)

  def parseArgs(args: Array[String]): Opts = {
    def loop(rest: List[String], o: Opts): Opts = rest match {
      case "--in" :: v :: t => loop(t, o.copy(in = v))
      case "--object" :: v :: t => loop(t, o.copy(obj = Some(v)))
      case "--out" :: v :: t => loop(t, o.copy(out = v))
      case "--table" :: v :: t => loop(t, o.copy(table = Some(v)))
      case "--decimal-mode" :: t => loop(t, o.copy(decimalMode = true))
      case "--dialect" :: v :: t => loop(t, o.copy(dialect = v))
      case Nil => o
      case other :: _ =>
        throw new IllegalArgumentException(s"unknown argument: $other")
    }
    val o = loop(args.toList, Opts("", "", None, decimalMode = false))
    require((o.in.nonEmpty ^ o.obj.nonEmpty) && o.out.nonEmpty,
      "usage: SqlBuilderCli (--in describe.json | --object NAME)" +
        " --out table.sql [--table NAME] [--decimal-mode]" +
        " [--dialect pg|mysql|duckdb]")
    require(o.obj.isEmpty || !o.decimalMode,
      "--decimal-mode applies to describe-file mode only: --object" +
        " schemas are already typed")
    require(Set("pg", "mysql", "duckdb")(o.dialect),
      s"unknown dialect ${o.dialect}: expected pg, mysql or duckdb")
    o
  }

  /** The live-pipeline mode as a pure function: source-layer schema →
    * DDL (the reference's describe-to-generate path with the describe
    * served by the engine's own frozen table registry).
    */
  def runObject(name: String, tableOverride: Option[String],
      dialect: String = "pg"): String = {
    val schema = etl.Tables.schemas.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown object $name: expected one of " +
          etl.Tables.schemas.keys.toSeq.sorted.mkString(", ")))
    val g: graft.schema.SqlGenerator =
      if (dialect == "mysql") Ddl.MySql
      else if (dialect == "duckdb") Ddl.DuckDb else Ddl.Pg
    g.createTable(tableOverride.getOrElse(name), schema)
  }

  /** The pipeline as a pure function (main.rs:50-82), for tests. */
  def run(describeJson: String, tableOverride: Option[String],
      decimalMode: Boolean, dialect: String = "pg"): String = {
    val d = graft.schema.DescribeResponse.parse(describeJson)
    val schema =
      if (!decimalMode) Mapping.describeToStructType(d)
      else org.apache.spark.sql.types.StructType(d.fields.map { f =>
        val base = Mapping.fieldToStructField(f)
        base.copy(dataType = Mapping.dataTypeOf(f, decimalMode = true))
      })
    val g: graft.schema.SqlGenerator =
      if (dialect == "mysql") Ddl.MySql
      else if (dialect == "duckdb") Ddl.DuckDb else Ddl.Pg
    g.createTable(tableOverride.getOrElse(d.name), schema)
  }

  def main(args: Array[String]): Unit = {
    val o = parseArgs(args)
    val ddl = o.obj match {
      case Some(name) => runObject(name, o.table, o.dialect)
      case None =>
        val json = Files.readString(Paths.get(o.in))
        run(json, o.table, o.decimalMode, o.dialect)
    }
    Files.writeString(Paths.get(o.out), ddl + "\n")
    System.err.println(s"[sql-builder] wrote ${o.out}")
  }
}
