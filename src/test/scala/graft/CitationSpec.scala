package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Pins every reference citation in main source to a file that actually
  * exists in `/root/reference/` — and, when the citation carries a line
  * anchor, to a line the file actually has.
  *
  * Round 17 removed the last *phantom* citations by hand (scaladoc that
  * cited `dags/spark_job_2.py` / `spark_job_3.py`, files that do not exist
  * in the reference); the round-17 verdict asked for a spec so a phantom
  * can't re-enter unnoticed. Citation forms covered (the full set in use):
  *
  *   - `dags/<name>.py[:N[-M]]` and `datawarehouse/<name>.sql[:N[-M]]`
  *   - `README.md:N[-M]`, `docker-compose.yaml:N[-M]`, `Dockerfile:N[-M]`
  *     — bare-name citations with a line anchor are read as the REFERENCE
  *     repo's top-level file (the only way main-source scaladoc uses them);
  *     without an anchor a bare `README.md` is ambiguous with our own and
  *     is not checked.
  *
  * The whole file text is scanned, not just scaladoc — a phantom in an
  * inline comment misleads a reader just as much. Skipped (canceled) when
  * `/root/reference` is absent, so the suite still runs on hosts without
  * the read-only reference mount.
  */
class CitationSpec extends AnyFunSuite {

  private val referenceRoot = Paths.get("/root/reference")
  private val mainSrc = Paths.get("src/main/scala")

  /** dags/x.py, datawarehouse/x.sql — path is unambiguous on its own. */
  private val pathCite =
    """(dags|datawarehouse)/([A-Za-z0-9_.-]+\.(?:py|sql))(:[0-9]+(?:-[0-9]+)?)?""".r

  /** Top-level reference files cited by bare name — only with a line
    * anchor (an anchored bare name is how the scaladoc cites them; an
    * unanchored one could be this repo's own README).
    */
  private val topLevelCite =
    """(README\.md|docker-compose\.yaml|Dockerfile)(:[0-9]+(?:-[0-9]+)?)""".r

  private def mainScalaFiles: Seq[Path] =
    Files.walk(mainSrc).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .toSeq.sortBy(_.toString)

  test("every cited reference file exists and every cited line anchor " +
      "is within the file") {
    assume(Files.isDirectory(referenceRoot),
      "/root/reference not mounted on this host")
    val counts = scala.collection.mutable.Map.empty[Path, Long]
    def lineCount(p: Path): Long =
      counts.getOrElseUpdate(p, Files.lines(p).count())

    val problems = scala.collection.mutable.ListBuffer.empty[String]
    for (src <- mainScalaFiles) {
      val text = Files.readString(src)
      val cites =
        pathCite.findAllMatchIn(text).map(m =>
          (s"${m.group(1)}/${m.group(2)}", Option(m.group(3)))) ++
        topLevelCite.findAllMatchIn(text).map(m =>
          (m.group(1), Option(m.group(2))))
      for ((rel, anchor) <- cites) {
        val target = referenceRoot.resolve(rel)
        if (!Files.isRegularFile(target))
          problems += s"$src cites $rel — no such file in the reference"
        else anchor.foreach { a =>
          // ":51-56" / ":22" -> the largest line number mentioned
          val maxLine = a.drop(1).split('-').map(_.toLong).max
          val n = lineCount(target)
          if (maxLine > n)
            problems += s"$src cites $rel$a but the file has only $n lines"
        }
      }
    }
    assert(problems.isEmpty,
      "phantom reference citations (fix the scaladoc or the regexes " +
        "above):\n  " + problems.mkString("\n  "))
  }

  test("the corpus of citations is non-trivial (the scan itself works)") {
    assume(Files.isDirectory(referenceRoot),
      "/root/reference not mounted on this host")
    val total = mainScalaFiles.map { src =>
      val text = Files.readString(src)
      pathCite.findAllMatchIn(text).size +
        topLevelCite.findAllMatchIn(text).size
    }.sum
    // ~25 citations exist today; a scan that suddenly finds none means a
    // regex or path regression in THIS spec, not a cleaned-up codebase
    assert(total >= 10, s"only $total citations matched — the spec's scan " +
      "is broken (regex or src path), not the codebase")
  }

  test("a phantom citation IS caught (fixture self-check)") {
    // the invariant the spec exists for: a cite of a nonexistent dag file
    // must match the extraction regex and fail the existence check
    val phantom = "dags/spark_job_2.py:10-20"
    val m = pathCite.findFirstMatchIn(phantom)
    assert(m.isDefined, "extraction regex must match the known phantom form")
    val rel = s"${m.get.group(1)}/${m.get.group(2)}"
    assert(!Files.isRegularFile(referenceRoot.resolve(rel)),
      "fixture expects spark_job_2.py to NOT exist in the reference")
  }
}
