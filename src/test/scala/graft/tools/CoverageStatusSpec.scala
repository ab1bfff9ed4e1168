package graft.tools

import java.io.File
import org.scalatest.funsuite.AnyFunSuite

/** Staleness gate for COVERAGE.md's generated driver-gate status block.
  *
  * The block is regenerated from the newest `CORRECTNESS_r*.json` by
  * `tools/coverage_status.py`; rounds 11→12 showed it is structurally one
  * round stale when regenerated only at round CLOSE (the driver's artifact
  * for round N lands after the builder's round-N session ends). The ritual
  * fix is to regenerate at round START; this spec makes a lapse loud: it
  * fails if the cited artifact is not the newest one present, or if the
  * cited query count disagrees with that artifact's actual content.
  */
class CoverageStatusSpec extends AnyFunSuite {

  private def readRepoFile(name: String): String = {
    // Tests run with cwd = repo root under sbt. Read as UTF-8 explicitly —
    // the JVM default charset may differ and the docs contain en-dashes.
    val f = new File(name)
    assert(f.exists(), s"$name not found (cwd=${new File(".").getAbsolutePath})")
    new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  test("COVERAGE.md status block cites the newest CORRECTNESS artifact") {
    val md = readRepoFile("COVERAGE.md")
    val arts = new File(".").listFiles()
      .filter(f => f.getName.matches("CORRECTNESS_r\\d+\\.json"))
      .map(_.getName).sorted
    assert(arts.nonEmpty, "no CORRECTNESS_r*.json artifacts present")
    val newest = arts.last
    val cited = "CORRECTNESS_r\\d+\\.json".r.findFirstIn(md)
    assert(cited.contains(newest),
      s"COVERAGE.md STATUS is stale: it cites ${cited.getOrElse("nothing")} " +
        s"but the newest artifact is $newest (artifact newer than STATUS — " +
        "expected at every round boundary, the driver's artifact lands after " +
        "the builder's last commit). Fix: run `python3 tools/coverage_status.py` " +
        "and commit COVERAGE.md (the round-open ritual, documented in " +
        "COVERAGE.md's header)")
  }

  test("cited query count matches the artifact's content") {
    val md = readRepoFile("COVERAGE.md")
    val citedCount = "\\*\\*(\\d+) queries recorded".r
      .findFirstMatchIn(md).map(_.group(1).toInt)
    assert(citedCount.nonEmpty, "status block missing 'N queries recorded'")
    val newest = new File(".").listFiles()
      .filter(f => f.getName.matches("CORRECTNESS_r\\d+\\.json"))
      .map(_.getName).sorted.last
    // Count top-level keys without a JSON lib: each query entry is a
    // top-level `"qNN_name": {` pair; values are flat objects.
    val json = readRepoFile(newest)
    val actual = "\"(q[0-9]+[a-z0-9_]*)\"\\s*:\\s*\\{".r
      .findAllMatchIn(json).map(_.group(1)).toSet.size
    assert(citedCount.contains(actual),
      s"status block cites ${citedCount.get} queries but $newest has $actual")
  }
}
