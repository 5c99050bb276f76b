package graft.functions

import org.apache.spark.sql.types._

/** MySQL column-type string → Spark `StructField` (SURVEY §1.3).
  *
  * Re-expresses the reference's declared sink-DDL mapping
  * (`TransferToCkTypeByColumnType`, reference README.md:165-266) with
  * Spark-native types: unsigned ints promote one width (uint64 →
  * DecimalType(20,0) — no native unsigned long), DATETIME(n) → µs
  * timestamps (covers n ≤ 6), DECIMAL(M,D) native to 38 digits (the
  * reference's M>18 escape-to-string is a driver limit Spark doesn't
  * have — documented deviation), ENUM/SET/BIT/JSON keep their binlog
  * wire type plus metadata so [[graft.operators.Envelope]] applies the
  * value normalization ([[TypeNorm]]) at projection time.
  */
object TypeMapper {

  val MysqlTypeKey = "mysqlType"
  val EnumValuesKey = "enumValues"
  val SetValuesKey = "setValues"
  /** Declared fractional-seconds precision of a DATETIME/TIMESTAMP
    * column — present only when the type expression carried it
    * explicitly (`datetime(6)`); drives the exact millis-vs-micros
    * wire decode in [[TypeNorm.mysqlDateTime]]. */
  val FspKey = "datetimeFsp"

  private val Paren = """([a-z0-9 ]+?)\s*\(([^)]*)\)\s*(unsigned)?""".r

  /** Parse one MySQL type declaration, e.g. `int(10) unsigned`,
    * `enum('a','b')`, `decimal(12,4)`, `varchar(256)`. */
  def toField(name: String, mysqlType: String,
      nullable: Boolean = true): StructField = {
    val norm = mysqlType.trim.toLowerCase
    val (base, args, unsigned) = norm match {
      case Paren(b, a, u) => (b.trim, a, u != null)
      case _ =>
        val u = norm.endsWith(" unsigned")
        (norm.stripSuffix(" unsigned").trim, "", u)
    }
    def meta(kind: String, values: Seq[String] = Seq.empty): Metadata = {
      val b = new MetadataBuilder().putString(MysqlTypeKey, kind)
      if (kind == "enum") b.putStringArray(EnumValuesKey, values.toArray)
      if (kind == "set") b.putStringArray(SetValuesKey, values.toArray)
      b.build()
    }
    def quoted(s: String): Seq[String] =
      """'((?:[^']|'')*)'""".r.findAllMatchIn(s)
        .map(_.group(1).replace("''", "'")).toSeq

    val (dt, metadata) = base match {
      case "tinyint" | "bool" | "boolean" =>
        (if (unsigned) ShortType else ByteType, Metadata.empty)
      case "smallint" =>
        (if (unsigned) IntegerType else ShortType, Metadata.empty)
      case "mediumint" => (IntegerType, Metadata.empty)
      case "int" | "integer" =>
        (if (unsigned) LongType else IntegerType, Metadata.empty)
      case "bigint" =>
        if (unsigned) (DecimalType(20, 0), meta("decimal"))
        else (LongType, Metadata.empty)
      case "year" => (ShortType, Metadata.empty)
      case "float" => (FloatType, Metadata.empty)
      case "double" | "real" => (DoubleType, Metadata.empty)
      case "decimal" | "numeric" =>
        val parts = args.split(",").map(_.trim).filter(_.nonEmpty)
        val (m, d) =
          if (parts.length >= 2) (parts(0).toInt, parts(1).toInt)
          else if (parts.length == 1) (parts(0).toInt, 0)
          else (18, 2) // bare DECIMAL -> Decimal(18,2) (README.md:233-258)
        // the decimal marker routes envelope values through the
        // Debezium precise-mode decode ([[TypeNorm.connectDecimal]])
        (DecimalType(math.min(m, 38), math.min(d, 37)), meta("decimal"))
      case "date" => (DateType, meta("date"))
      case "datetime" | "timestamp" =>
        // declared fsp (datetime(6)) pins the Debezium long encoding
        // (fsp<=3 millis, >3 micros); a bare name stays fsp-unknown —
        // it may be a typeName-only schema source whose true fsp is
        // hidden, so the decoder falls back to its magnitude heuristic
        val b = new MetadataBuilder().putString(MysqlTypeKey, "datetime")
        scala.util.Try(args.trim.toInt).toOption
          .foreach(n => b.putLong(FspKey, n.toLong))
        (TimestampType, b.build())
      case "time" => (StringType, Metadata.empty)
      case "enum" => (StringType, meta("enum", quoted(args)))
      case "set" => (StringType, meta("set", quoted(args)))
      case "bit" => (LongType, meta("bit"))
      case "json" => (StringType, meta("json"))
      case "char" | "varchar" | "tinytext" | "text" | "mediumtext" |
          "longtext" => (StringType, Metadata.empty)
      case "binary" | "varbinary" | "tinyblob" | "blob" | "mediumblob" |
          "longblob" => (BinaryType, Metadata.empty)
      case _ => (StringType, Metadata.empty) // fallback (README.md:166)
    }
    StructField(name, dt, nullable, metadata)
  }

  /** Build a full schema from (name, mysqlType) pairs. */
  def schemaOf(cols: (String, String)*): StructType =
    StructType(cols.map { case (n, t) => toField(n, t) })
}
