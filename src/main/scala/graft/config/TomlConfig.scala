package graft.config

/** Minimal TOML-subset parser for the reference's config file shape
  * (reference: etc/river.toml, parsed by river/config.go:53-73) — the
  * user-facing interface a reference deployment would port over:
  *
  * {{{
  * bulk_size = 64
  * flush_bulk_time = "1ms"      # Go time.ParseDuration syntax
  * skip_no_pk_table = false
  *
  * [[rule]]
  * source_schema = "mydb"       # reference key names (river/rule.go:10-16);
  * source_table = "mytable"     # schema/table/ck_schema/ck_table accepted
  * sink_schema = "sinkdb"       # as aliases
  * sink_table = "sinktable"
  * filter = ["col_a", "col_b"]
  * id = ["col_a"]
  *   [rule.field]
  *   col_a = "renamed,list"
  * }}}
  *
  * Supports exactly what the reference's config uses: top-level scalar
  * keys, `[[rule]]` array-of-table blocks, `[rule.field]` sub-tables,
  * string/int/bool scalars, and arrays of strings. No external
  * dependency (the environment is zero-egress), no general TOML.
  */
object TomlConfig {

  def parse(text: String): SyncConfig = {
    var top = Map.empty[String, String]
    var rules = Vector.empty[Rule]
    // section: Top = top-level keys, Rule = inside [[rule]],
    // Field = inside [rule.field], Other = ignored foreign section
    object S extends Enumeration { val Top, InRule, InField, Other = Value }
    var sec = S.Top

    def setRule(f: Rule => Rule): Unit =
      rules = rules.init :+ f(rules.last)

    text.linesIterator
      .map(stripComment)
      .map(_.trim)
      .filter(_.nonEmpty)
      .foreach {
        case "[[rule]]" =>
          rules :+= Rule("", "", "", "")
          sec = S.InRule
        case "[rule.field]" if sec == S.InRule || sec == S.InField =>
          sec = S.InField
        case line if line.startsWith("[") =>
          // foreign section ([[source]], [master] …): the reference
          // tolerates these; their keys must NOT leak into the top map
          sec = S.Other
        case line =>
          val (k, v) = splitKv(line)
          sec match {
            case S.InField =>
              setRule(r => r.copy(
                fieldMapping = r.fieldMapping + (k -> str(v))))
            case S.InRule =>
              k match {
                // canonical names from the reference (river/rule.go:10-16)
                case "source_schema" | "schema" =>
                  setRule(_.copy(sourceSchema = str(v)))
                case "source_table" | "table" =>
                  setRule(_.copy(sourceTable = str(v)))
                case "sink_schema" | "ck_schema" =>
                  setRule(_.copy(sinkSchema = str(v)))
                case "sink_table" | "ck_table" =>
                  setRule(_.copy(sinkTable = str(v)))
                case "filter" => setRule(_.copy(filter = strArray(v)))
                case "id" => setRule(_.copy(pkColumns = strArray(v)))
                case _ => // tolerated unknown rule key
              }
            case S.Top => top += (k -> str(v))
            case S.Other => // ignored foreign-section key
          }
      }

    rules.zipWithIndex.foreach { case (r, i) =>
      require(r.sourceSchema.nonEmpty && r.sourceTable.nonEmpty,
        s"[[rule]] #${i + 1} has no source_schema/source_table " +
          "(or schema/table) — events would never route to it")
    }

    SyncConfig(
      rules = rules,
      ignoreUpdates = top.get("skip_update").map(bool).getOrElse(true),
      ignoreDeletes = top.get("skip_delete").map(bool).getOrElse(true),
      skipNoPkTable = top.get("skip_no_pk_table").exists(bool),
      bulkSize = top.get("bulk_size").map(_.trim.toInt).getOrElse(128),
      flushIntervalMs =
        top.get("flush_bulk_time").map(durationMs).getOrElse(200L))
  }

  /** Go `time.ParseDuration` subset (reference river/config.go:74-88
    * parses flush_bulk_time = "1ms"): optional ns/us/ms/s/m/h suffix;
    * a bare number is taken as milliseconds. Positive sub-millisecond
    * values round up to 1ms; an explicit 0 stays 0 (the engine's
    * AvailableNow / drain-and-stop sentinel).
    */
  private[config] def durationMs(v: String): Long = {
    val t = str(v).trim
    val m = "^([0-9]+(?:\\.[0-9]+)?)(ns|us|ms|s|m|h)?$".r
    t match {
      case m(num, suffix) =>
        val n = num.toDouble
        val ms = suffix match {
          case "ns" => n / 1e6
          case "us" => n / 1e3
          case "s" => n * 1e3
          case "m" => n * 60e3
          case "h" => n * 3600e3
          case _ => n // "ms" or bare number
        }
        if (n == 0) 0L else math.max(1L, math.ceil(ms).toLong)
      case _ =>
        throw new IllegalArgumentException(s"bad duration: $v")
    }
  }

  private def stripComment(line: String): String = {
    // a # outside quotes starts a comment
    var inStr = false
    val out = new StringBuilder
    for (c <- line) {
      if (c == '"') inStr = !inStr
      if (c == '#' && !inStr) return out.toString
      out += c
    }
    out.toString
  }

  private def splitKv(line: String): (String, String) = {
    val i = line.indexOf('=')
    require(i > 0, s"not a key = value line: $line")
    (line.take(i).trim, line.drop(i + 1).trim)
  }

  private def str(v: String): String = {
    val t = v.trim
    if (t.startsWith("\"") && t.endsWith("\"") && t.length >= 2) {
      t.substring(1, t.length - 1)
    } else t
  }

  private def strArray(v: String): Seq[String] = {
    val t = v.trim
    require(t.startsWith("[") && t.endsWith("]"), s"not an array: $v")
    t.substring(1, t.length - 1).split(",").map(_.trim)
      .filter(_.nonEmpty).map(str).toSeq
  }

  // unquote first: `skip_update = "true"` (quoted, legal TOML-ish) must
  // parse as true, not silently as false
  private def bool(v: String): Boolean = str(v).trim == "true"
}
