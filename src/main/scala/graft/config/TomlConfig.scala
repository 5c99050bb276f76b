package graft.config

/** Minimal TOML-subset parser for the reference's config file shape
  * (reference: etc/river.toml, parsed by river/config.go:53-73) — the
  * user-facing interface a reference deployment would port over:
  *
  * {{{
  * bulk_size = 128
  * flush_bulk_time = 200
  * skip_no_pk_table = false
  *
  * [[rule]]
  * schema = "mydb"
  * table = "mytable"
  * ck_schema = "sinkdb"
  * ck_table = "sinktable"
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
    var inRule = false
    var inField = false

    def setRule(f: Rule => Rule): Unit =
      rules = rules.init :+ f(rules.last)

    text.linesIterator
      .map(stripComment)
      .map(_.trim)
      .filter(_.nonEmpty)
      .foreach {
        case "[[rule]]" =>
          rules :+= Rule("", "", "", "")
          inRule = true; inField = false
        case "[rule.field]" if inRule =>
          inField = true
        case line if line.startsWith("[") =>
          // unknown section: ignore its keys (reference tolerates extra
          // sections like [[source]] / master config we don't need)
          inRule = false; inField = false
        case line =>
          val (k, v) = splitKv(line)
          if (inField) {
            setRule(r => r.copy(
              fieldMapping = r.fieldMapping + (k -> str(v))))
          } else if (inRule) {
            k match {
              case "schema" => setRule(_.copy(sourceSchema = str(v)))
              case "table" => setRule(_.copy(sourceTable = str(v)))
              case "ck_schema" => setRule(_.copy(sinkSchema = str(v)))
              case "ck_table" => setRule(_.copy(sinkTable = str(v)))
              case "filter" => setRule(_.copy(filter = strArray(v)))
              case "id" => setRule(_.copy(pkColumns = strArray(v)))
              case _ => // tolerated unknown rule key
            }
          } else top += (k -> v)
      }

    SyncConfig(
      rules = rules,
      ignoreUpdates = top.get("skip_update").exists(bool),
      ignoreDeletes = top.get("skip_delete").exists(bool),
      skipNoPkTable = top.get("skip_no_pk_table").exists(bool),
      bulkSize = top.get("bulk_size").map(_.trim.toInt).getOrElse(128),
      flushIntervalMs =
        top.get("flush_bulk_time").map(_.trim.toLong).getOrElse(200L))
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

  private def bool(v: String): Boolean = v.trim == "true"
}
