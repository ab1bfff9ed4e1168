package graft.meta

/** Forked-JVM probe for `JdbcMetaRepoSpec`: attempts to boot an embedded
  * Derby database from a SECOND process and prints the SQLState chain.
  * Embedded Derby locks the database directory to one JVM (`db.lck`), so
  * against a directory another process has booted this must fail with
  * XJ040 (boot failure) caused by XSDB6 (already booted) — the
  * documented reason multi-process repo sharing needs a server-mode
  * database. */
object XsdbProbe {
  def main(args: Array[String]): Unit = {
    try {
      val c = java.sql.DriverManager.getConnection("jdbc:derby:" + args(0))
      c.close()
      println("CONNECTED")
    } catch {
      case e: Throwable =>
        val states = Iterator.iterate[Throwable](e)(_.getCause)
          .takeWhile(_ != null).take(10)
          .collect { case s: java.sql.SQLException => s.getSQLState }
          .filter(_ != null)
        println("SQLSTATES:" + states.mkString(","))
    }
  }
}
