package graft
import java.nio.file.{Files, Paths}
/** Subset-debugging helper: write SparkEntry.oracleSql (optionally
  * filtered to the named queries) as oracle_sql.json to the given dir,
  * so tools/check.py can gate a subset Verify dump without a full run.
  */
object DumpOracles {
  def main(args: Array[String]): Unit = {
    val (outDir, only) = (args.head, args.tail.toSet)
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    new java.io.File(outDir).mkdirs()
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json): Unit
  }
}
