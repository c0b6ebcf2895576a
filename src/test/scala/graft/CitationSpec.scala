package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import scala.util.Using

/** Pins every reference citation in this repo's Scala sources to a file
  * that actually exists in `/root/reference/` — and, when the citation
  * carries a line anchor, to a line the file actually has.
  *
  * Round 17 removed the last *phantom* citations by hand (scaladoc that
  * cited `dags/spark_job_2.py` / `spark_job_3.py`, files that do not exist
  * in the reference); the round-17 verdict asked for a spec so a phantom
  * can't re-enter unnoticed; round 19 extended the scan from `src/main`
  * to `src/test` as well (a phantom in a test's scaladoc misleads a
  * reader just as much) and widened the citation forms. Forms covered
  * (the full set in use):
  *
  *   - `dags/<name>.py[:N[-M]]` and `datawarehouse/<name>.sql[:N[-M]]`
  *   - bare `<name>.py:N[-M]` / `<name>.sql:N[-M]` — an ANCHORED bare
  *     name is how most scaladoc cites a dag or warehouse file
  *     (`spark_job_1.py:28`); `.py` resolves against `dags/`, `.sql`
  *     against `datawarehouse/`. Names that are files in this repo's
  *     `tools/` dir are repo-local tooling cites (`merge_bench.py:166`),
  *     validated against `tools/<name>` instead of the reference (round
  *     20, ADVICE r19 — previously they were skipped unvalidated, so a
  *     stale anchor could rot silently).
  *   - `README.md:N[-M]`, `docker-compose.yaml:N[-M]`, `Dockerfile:N[-M]`
  *     — bare-name citations with a line anchor are read as the REFERENCE
  *     repo's top-level file (the only way scaladoc uses them); without
  *     an anchor a bare `README.md` is ambiguous with our own and is not
  *     checked.
  *
  * The whole file text is scanned, not just scaladoc — a phantom in an
  * inline comment misleads a reader just as much. This spec's own source
  * file is excluded: it deliberately contains a phantom fixture (the
  * self-check test below) and regex-doc examples. Skipped (canceled)
  * when `/root/reference` is absent, so the suite still runs on hosts
  * without the read-only reference mount.
  */
class CitationSpec extends AnyFunSuite {

  private val referenceRoot = Paths.get("/root/reference")
  private val srcRoots = Seq(Paths.get("src/main/scala"),
    Paths.get("src/test/scala"))
  private val toolsDir = Paths.get("tools")

  /** dags/x.py, datawarehouse/x.sql — path is unambiguous on its own.
    * Leading boundary guard as in bareCite (ADVICE r19): `mydags/x.py:1`
    * or `old-datawarehouse/q.sql:5` embed the directory name as a
    * substring but cite something else entirely — matching them would
    * check a never-made citation against the reference and fail the
    * suite (or misattribute the cite) for unrelated text.
    */
  private val pathCite =
    """(?<![/A-Za-z0-9_.-])(dags|datawarehouse)/([A-Za-z0-9_.-]+\.(?:py|sql))(:[0-9]+(?:-[0-9]+)?)?""".r

  /** Bare anchored dag / warehouse-sql cite: `spark_job_1.py:28`. The
    * leading guard keeps `dags/x.py:1` matching pathCite only (no double
    * count). `.py` stems may be dotted (a phantom `etl.v2.py:40` must
    * still be caught — prose module paths never end in a literal `.py`);
    * `.sql` stems stay dot-free because a dotted-`.sql` token IS a JVM
    * package path (`org.apache.spark.sql:12` would misfire), and the
    * reference's three warehouse files are dot-free anyway.
    */
  private val bareCite =
    """(?<![/A-Za-z0-9_.-])(?:([A-Za-z0-9_.-]+\.(py))|([A-Za-z0-9_-]+\.(sql)))(:[0-9]+(?:-[0-9]+)?)""".r

  /** Top-level reference files cited by bare name — only with a line
    * anchor (an anchored bare name is how the scaladoc cites them; an
    * unanchored one could be this repo's own README). Leading guard as
    * in bareCite: `myDockerfile:3` or a path-prefixed spelling must not
    * be misattributed to the reference's top-level file.
    */
  private val topLevelCite =
    """(?<![/A-Za-z0-9_.-])(README\.md|docker-compose\.yaml|Dockerfile)(:[0-9]+(?:-[0-9]+)?)""".r

  /** Repo-local tooling scripts — a bare anchored cite of one of these is
    * a reference to OUR tools/, not to the reference repo.
    */
  private lazy val toolNames: Set[String] =
    if (!Files.isDirectory(toolsDir)) Set.empty
    else Using.resource(Files.list(toolsDir)) {
      _.iterator().asScala.map(_.getFileName.toString).toSet
    }

  private def scalaFiles: Seq[Path] =
    srcRoots.flatMap { root =>
      Using.resource(Files.walk(root)) {
        _.iterator().asScala
          .filter(p => p.toString.endsWith(".scala"))
          // this spec holds the deliberate phantom fixture + regex examples
          .filterNot(_.getFileName.toString == "CitationSpec.scala")
          .toSeq
      }
    }.sortBy(_.toString)

  /** All (reference-relative path, optional ":N[-M]" anchor) cites. */
  private def citesIn(text: String): Seq[(String, Option[String])] = {
    val prefixed = pathCite.findAllMatchIn(text).map(m =>
      (s"${m.group(1)}/${m.group(2)}", Option(m.group(3)))).toSeq
    val bare = bareCites(text).collect {
      case (name, ext, anchor) if !toolNames.contains(name) =>
        val dir = if (ext == "py") "dags" else "datawarehouse"
        (s"$dir/$name", anchor)
    }
    val top = topLevelCite.findAllMatchIn(text).map(m =>
      (m.group(1), Option(m.group(2)))).toSeq
    prefixed ++ bare ++ top
  }

  private def bareCites(text: String): Seq[(String, String, Option[String])] =
    bareCite.findAllMatchIn(text).map { m =>
      // group 1/2 = dotted-ok .py branch, group 3/4 = dot-free .sql branch
      val (name, ext) =
        if (m.group(1) != null) (m.group(1), m.group(2))
        else (m.group(3), m.group(4))
      (name, ext, Option(m.group(5)))
    }.toSeq

  /** Bare anchored cites of this repo's own `tools/` scripts
    * (`merge_bench.py:166`). Through round 19 these were dropped
    * unvalidated, so a stale or phantom anchor in scaladoc could rot
    * silently (ADVICE r19); now they resolve against `tools/<name>` and
    * their line anchors are checked there, mirroring the reference check.
    */
  private def toolCitesIn(text: String): Seq[(String, Option[String])] =
    bareCites(text).collect {
      case (name, _, anchor) if toolNames.contains(name) => (name, anchor)
    }

  test("every cited reference file exists and every cited line anchor " +
      "is within the file") {
    assume(Files.isDirectory(referenceRoot),
      "/root/reference not mounted on this host")
    val counts = scala.collection.mutable.Map.empty[Path, Long]
    def lineCount(p: Path): Long =
      counts.getOrElseUpdate(p, Using.resource(Files.lines(p))(_.count()))

    val problems = scala.collection.mutable.ListBuffer.empty[String]
    def checkAnchor(src: Path, label: String, target: Path,
        anchor: Option[String]): Unit =
      anchor.foreach { a =>
        // ":51-56" / ":22" -> the largest line number mentioned
        val maxLine = a.drop(1).split('-').map(_.toLong).max
        val n = lineCount(target)
        if (maxLine > n)
          problems += s"$src cites $label$a but the file has only $n lines"
      }
    for (src <- scalaFiles) {
      val text = Files.readString(src)
      for ((rel, anchor) <- citesIn(text)) {
        val target = referenceRoot.resolve(rel)
        if (!Files.isRegularFile(target))
          problems += s"$src cites $rel — no such file in the reference"
        else checkAnchor(src, rel, target, anchor)
      }
      // repo-local tooling cites: same line-anchor validation against
      // tools/<name> (the file exists by construction — toolNames is the
      // tools/ directory listing)
      for ((name, anchor) <- toolCitesIn(text))
        checkAnchor(src, s"tools/$name", toolsDir.resolve(name), anchor)
    }
    assert(problems.isEmpty,
      "phantom reference citations (fix the scaladoc or the regexes " +
        "above):\n  " + problems.mkString("\n  "))
  }

  test("the corpus of citations is non-trivial (the scan itself works)") {
    assume(Files.isDirectory(referenceRoot),
      "/root/reference not mounted on this host")
    val total = scalaFiles.map(src => citesIn(Files.readString(src)).size).sum
    // ~90 citations exist today (main+test, prefixed+bare+top-level); a
    // scan that suddenly finds almost none means a regex or path
    // regression in THIS spec, not a cleaned-up codebase
    assert(total >= 40, s"only $total citations matched — the spec's scan " +
      "is broken (regex or src path), not the codebase")
  }

  test("a phantom citation IS caught (fixture self-check)") {
    // the invariant the spec exists for: a cite of a nonexistent dag file
    // must match the extraction regexes and fail the existence check —
    // in BOTH the prefixed form and the bare anchored form
    val prefixedPhantom = "dags/spark_job_2.py:10-20"
    val m = pathCite.findFirstMatchIn(prefixedPhantom)
    assert(m.isDefined, "pathCite must match the known phantom form")
    val rel = s"${m.get.group(1)}/${m.get.group(2)}"
    assert(!Files.isRegularFile(referenceRoot.resolve(rel)),
      "fixture expects spark_job_2.py to NOT exist in the reference")

    val barePhantom = "see spark_job_3.py:5 for details"
    val cites = citesIn(barePhantom)
    assert(cites == Seq(("dags/spark_job_3.py", Some(":5"))),
      s"bare anchored phantom must extract as a dags/ cite, got $cites")

    // dotted .py stems must not evade extraction (r19 self-review)
    val dotted = citesIn("per etl.v2.py:40 the batch is keyed")
    assert(dotted == Seq(("dags/etl.v2.py", Some(":40"))),
      s"dotted bare .py phantom must extract, got $dotted")
  }

  test("bare cites skip repo-local tooling and dotted module paths") {
    assert(citesIn("validated in merge_bench.py:166 and the spec").isEmpty,
      "a tools/ script cite is repo-local, not a reference cite")
    assert(citesIn("import org.apache.spark.sql:12 nonsense").isEmpty,
      "dotted package paths must not match the .sql bare-cite branch")
    assert(citesIn("dags/spark_job_1.py:28").size == 1,
      "a prefixed cite must match exactly once (no bare double-count)")
  }

  test("tool cites are validated against tools/, not dropped (r19 advice)") {
    // extraction: a tools/ cite routes to toolCitesIn, never to citesIn
    assert(toolCitesIn("validated in merge_bench.py:166 and the spec") ==
      Seq(("merge_bench.py", Some(":166"))),
      "a tools/ script cite must extract for LOCAL validation")
    assert(toolCitesIn("see spark_job_1.py:28").isEmpty,
      "a reference cite must not leak into the tool-cite channel")
    // validation: a phantom line anchor on a real tools/ file IS caught —
    // the check the r19 advice asked for (previously skipped entirely)
    val tool = toolsDir.resolve("merge_bench.py")
    assume(Files.isRegularFile(tool), "tools/merge_bench.py missing")
    val lines = Using.resource(Files.lines(tool))(_.count())
    assert(lines < 9999, "fixture expects merge_bench.py < 9999 lines")
    val phantom = toolCitesIn("per merge_bench.py:9999 the merge dedups")
    assert(phantom == Seq(("merge_bench.py", Some(":9999"))) &&
      9999L > lines,
      "a stale tools/ anchor must extract and exceed the file's length " +
        "so the main test reports it")
  }

  test("pathCite requires a clean leading boundary (r19 advice)") {
    assert(citesIn("staged under mydags/x.py:1 in the harness").isEmpty,
      "an embedded 'dags/' substring is not a reference cite")
    assert(citesIn("kept in old-datawarehouse/q.sql:5 for posterity").isEmpty,
      "an embedded 'datawarehouse/' substring is not a reference cite")
    assert(citesIn("(dags/spark_job_1.py:28)") ==
      Seq(("dags/spark_job_1.py", Some(":28"))),
      "a genuinely prefixed cite after punctuation must still extract")
  }

  test("top-level cites require a clean leading boundary (r19 self-review)") {
    assert(citesIn("staged via myDockerfile:120 in the harness").isEmpty,
      "a suffix like myDockerfile must not be read as the reference's " +
        "Dockerfile")
    assert(citesIn("see tools/Dockerfile:3 for the image").isEmpty,
      "a path-prefixed spelling is not the reference's top-level file")
    assert(citesIn("compare docker-compose.yaml:256-266") ==
      Seq(("docker-compose.yaml", Some(":256-266"))),
      "a genuinely bare anchored top-level cite must still extract")
  }
}
