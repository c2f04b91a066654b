package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Doc-drift guard (round-10 verdict #5: the README's operator count was
  * stale the moment two late operators landed). The counts a reader
  * checks first — README.md and SURVEY.md's closing inventory — are
  * asserted against the registry itself, so the docs cannot drift again
  * without failing the build. Pure file+registry checks, no Spark. */
class InventorySpec extends AnyFunSuite {

  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")

  private val declared = SparkEntry.declared
  private val nDeclared = declared.size
  private val nOracle = declared.count(_.oracle.isDefined)

  test("declared registry is duplicate-free and every entry pairs a name with a plan") {
    val names = declared.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate names: ${names.diff(names.distinct).distinct.mkString(",")}")
    assert(SparkEntry.queries.size == nDeclared)
    assert(SparkEntry.oracleSql.size == nOracle)
  }

  test("README.md operator counts match the registry") {
    val readme = read("README.md")
    assert(readme.contains(s"$nDeclared declared operators"),
      s"README must state '$nDeclared declared operators'")
    assert(readme.contains(s"$nOracle oracle-verified"),
      s"README must state '$nOracle oracle-verified'")
  }

  test("SURVEY.md closing inventory matches the registry") {
    val survey = read("SURVEY.md")
    assert(survey.contains(s"$nDeclared batch operators"),
      s"SURVEY closing inventory must state '$nDeclared batch operators'")
    assert(survey.contains(s"$nOracle oracle-verified"),
      s"SURVEY closing inventory must state '$nOracle oracle-verified'")
  }

  // ---- §2E ledger file:line validation (round-12 verdict #7) ----
  // The ledger's site convention: the line of the `Q(` / `Q.noOracle(`
  // call whose first string-literal argument is the key. Re-derive that
  // mapping from source here and assert the SURVEY table IS it — same
  // logic as scripts/gen_ledger.py, which rewrites the table on drift.

  private def trueSites: Map[String, String] = {
    val src = java.nio.file.Paths.get("src/main/scala/graft")
    val decl = """\bQ(?:\.noOracle)?\(\s*\n?\s*"(q_[a-z0-9_]+)"""".r
    val files = java.nio.file.Files.walk(src).iterator().asScala
      .filter(_.toString.endsWith(".scala")).toSeq.sortBy(_.toString)
    files.flatMap { p =>
      val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      decl.findAllMatchIn(text).map { m =>
        val line = text.substring(0, m.start).count(_ == '\n') + 1
        m.group(1) -> s"${src.relativize(p).toString.replace('\\', '/')}:$line"
      }
    }.toMap
  }

  private def ledgerSites: Map[String, String] = {
    val survey = read("SURVEY.md")
    val start = survey.indexOf("| batch key | site | batch key | site |")
    assert(start >= 0, "SURVEY.md ledger table header not found")
    val rows = survey.substring(start).linesIterator
      .takeWhile(_.startsWith("|")).toSeq.drop(2)
    val cell = """(q_[a-z0-9_]+) \| `([^`]+)`""".r
    rows.flatMap(r => cell.findAllMatchIn(r).map(m => m.group(1) -> m.group(2))).toMap
  }

  test("SURVEY.md ledger lists every declared batch key exactly once") {
    val ledger = ledgerSites.keySet
    val reg = declared.map(_.name).toSet
    assert(ledger == reg,
      s"ledger missing: ${(reg -- ledger).toSeq.sorted.mkString(",")}; " +
        s"stale extras: ${(ledger -- reg).toSeq.sorted.mkString(",")} " +
        "(run scripts/gen_ledger.py --write)")
  }

  test("every SURVEY.md ledger file:line resolves to that operator's Q declaration") {
    val truth = trueSites
    assert(truth.keySet == declared.map(_.name).toSet,
      "site scan out of sync with registry — a Q declaration pattern changed")
    val stale = ledgerSites.collect {
      case (k, site) if truth.get(k).exists(_ != site) => s"$k: $site -> ${truth(k)}"
    }
    assert(stale.isEmpty,
      s"stale ledger sites (run scripts/gen_ledger.py --write): ${stale.mkString("; ")}")
  }

  // ---- streaming ledger validation (round-16 verdict #2) ----
  // The streaming table was the hand-maintained half of the ledger and
  // had drifted (stale file:line refs, rows with no line). It is now
  // GENERATED from streaming/StreamInventory.scala by gen_ledger.py;
  // here the same resolution runs in Scala: every pipeline's `member`
  // must resolve to exactly one top-level declaration in its `file`,
  // and the SURVEY table must carry exactly that file:line.

  private def streamTrueSites: Map[String, String] = {
    graft.streaming.StreamInventory.pipelines.map { e =>
      val text = read(s"src/main/scala/graft/${e.file}")
      // mirrors gen_ledger.py resolve_member exactly: top-level
      // indentation only (0-2 spaces), optional visibility modifiers —
      // nested same-named shadows can't win, modifier changes stay loud
      val pat = ("""(?m)^ {0,2}(?:(?:private|protected)(?:\[\w+\])?\s+)?""" +
        """(?:final\s+)?(?:def|class|object|val)\s+""" +
        java.util.regex.Pattern.quote(e.member) + """\b""").r
      val hits = pat.findAllMatchIn(text)
        .map(m => text.substring(0, m.start).count(_ == '\n') + 1).toSeq
      assert(hits.size == 1,
        s"${e.key}: member ${e.member} resolves to ${hits.size} " +
          s"declarations in ${e.file} (need exactly 1)")
      e.key -> s"${e.file}:${hits.head}"
    }.toMap
  }

  private def streamLedgerSites: Map[String, String] = {
    val survey = read("SURVEY.md")
    val start = survey.indexOf("| pipeline | site | what |")
    assert(start >= 0, "SURVEY.md streaming table header not found")
    val rows = survey.substring(start).linesIterator
      .takeWhile(_.startsWith("|")).toSeq.drop(2)
    val cell = """\| (s_[a-z0-9_]+) \| `([^`]+)`""".r
    rows.flatMap(r => cell.findFirstMatchIn(r).map(m => m.group(1) -> m.group(2)))
      .toMap
  }

  test("SURVEY.md streaming table lists every StreamInventory pipeline exactly once") {
    val ledger = streamLedgerSites.keySet
    val reg = graft.streaming.StreamInventory.pipelines.map(_.key)
    assert(reg.distinct.size == reg.size, "StreamInventory has duplicate keys")
    assert(ledger == reg.toSet,
      s"streaming ledger missing: ${(reg.toSet -- ledger).toSeq.sorted.mkString(",")}; " +
        s"stale extras: ${(ledger -- reg.toSet).toSeq.sorted.mkString(",")} " +
        "(run scripts/gen_ledger.py --write)")
  }

  test("every SURVEY.md streaming site resolves to its pipeline's named declaration") {
    val truth = streamTrueSites
    val stale = streamLedgerSites.collect {
      case (k, site) if truth.get(k).exists(_ != site) => s"$k: $site -> ${truth(k)}"
    }
    assert(stale.isEmpty,
      s"stale streaming sites (run scripts/gen_ledger.py --write): ${stale.mkString("; ")}")
  }

  test("SURVEY.md closing inventory states the streaming pipeline count") {
    val n = graft.streaming.StreamInventory.pipelines.size
    assert(read("SURVEY.md").contains(s"$n streaming pipelines"),
      s"SURVEY closing inventory must state '$n streaming pipelines'")
  }

  // ---- spec-count + verify-skill drift guard (round-15 verdict #8) ----
  // The stale-count class recurred every round (README 393→402→406, each
  // fixed by hand after advice). Every spec in this tree is registered
  // statically — one `test(` call at the start of a line per spec, never
  // inside a loop — so the suite count is derivable from source: this
  // count has matched `sbt test`'s reported total exactly at every
  // close since the convention started. If someone ever registers tests
  // in a loop, the derived count diverges from the runner's and THIS
  // test's message says where the convention broke.

  private def specCount: Int = {
    val root = java.nio.file.Paths.get("src/test/scala")
    val decl = """(?m)^\s*test\(""".r
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .map(p => decl.findAllMatchIn(read(p.toString)).size)
      .sum
  }

  test("README.md and the verify skill state the registered spec count") {
    val n = specCount
    assert(read("README.md").contains(s"# $n specs"),
      s"README must state '# $n specs' (statically registered test() calls)")
    assert(read(".claude/skills/verify/SKILL.md").contains(s"`sbt test` = $n specs"),
      s"verify SKILL.md must state '`sbt test` = $n specs'")
  }

  test("the verify skill's oracle-gate expect line matches the registry") {
    val skill = read(".claude/skills/verify/SKILL.md")
    assert(skill.contains(s"== $nDeclared pass / 0 fail =="),
      s"verify SKILL.md must expect '== $nDeclared pass / 0 fail =='")
    assert(skill.contains(
      s"($nOracle hash-compared + ${nDeclared - nOracle} no-oracle rows-only)"),
      s"verify SKILL.md must state '($nOracle hash-compared + " +
        s"${nDeclared - nOracle} no-oracle rows-only)'")
  }
}
