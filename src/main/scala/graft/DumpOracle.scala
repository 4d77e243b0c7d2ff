package graft

/** Dumps SparkEntry.oracleSql as deterministic `key<TAB>sha256(sql)`
  * lines (plus a whole-map digest) — the refactor-safety harness for
  * moving oracle SQL between files: run before and after, diff the
  * output. No Spark session involved. */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_dump.txt")
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
    val lines = SparkEntry.oracleSql.toSeq.sortBy(_._1).map { case (k, v) =>
      s"$k\t${hex(md.digest(v.getBytes("UTF-8")))}"
    }
    val all = hex(md.digest(lines.mkString("\n").getBytes("UTF-8")))
    val w = new java.io.PrintWriter(out)
    try { lines.foreach(w.println); w.println(s"TOTAL\t$all") }
    finally w.close()
    println(s"oracle entries: ${lines.size}  digest: $all")
  }
}
