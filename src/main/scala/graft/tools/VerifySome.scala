package graft.tools

import java.nio.file.{Files, Paths}

import graft.{GraftSession, Registry}

/** Targeted Verify: dump only the NAMED registry queries (plus their oracle
  * SQL) in the exact shape tools/check.py consumes — fast iteration on one
  * or two queries without re-running the full 60+ query dump. Usage:
  *   runMain graft.tools.VerifySome <sfDir> <outDir> <name> [name...]
  */
object VerifySome {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, names) = (args(0), args(1), args.drop(2).toSeq)
    val spark = GraftSession.get("verify-some")
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val qs = names.map(n => Registry.byName.getOrElse(n,
      sys.error(s"unknown query $n (known: ${Registry.byName.keys.toSeq.sorted.mkString(", ")})")))
    qs.foreach { q =>
      q.build(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/${q.name}")
      spark.catalog.clearCache()
    }
    def esc(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = qs.flatMap(q => q.oracle.map(o => s"${esc(q.name)}: ${esc(o)}"))
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/queries.json"),
      names.sorted.map(esc).mkString("[", ",", "]"))
    spark.stop()
  }
}
