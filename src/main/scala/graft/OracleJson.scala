package graft

import java.nio.file.{Files, Paths}

/** Renders SparkEntry.oracleSql as the oracle_sql.json the driver (and
  * tools/oracle_lint.py) consume. Shared by Verify (full dump alongside
  * parquet results) and OracleDump (Spark-free dump for the pre-commit
  * type lint).
  */
object OracleJson {
  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def render(m: Map[String, String]): String =
    m.map { case (k, v) => s"${quote(k)}: ${quote(v)}" }.mkString("{", ",", "}")

  def writeTo(path: String): Unit =
    Files.writeString(Paths.get(path), render(SparkEntry.oracleSql))
}

/** Dumps oracle_sql.json WITHOUT starting Spark — `SparkEntry.oracleSql`
  * is a plain Map, so the oracle type lint (tools/oracle_lint.py) can run
  * in seconds as a pre-commit check:
  *   sbt "runMain graft.OracleDump /tmp/oracle_sql.json"
  *   python3 tools/oracle_lint.py /tmp/oracle_sql.json
  */
object OracleDump {
  def main(args: Array[String]): Unit =
    OracleJson.writeTo(args.headOption.getOrElse("/tmp/oracle_sql.json"))
}
