package graft

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** BASELINE.md's per-query pin tables are the denominator of every
  * round's bench-ratio sweep. r13 shipped two pins as PROSE ("pinned
  * at 3.61 / 10.41" in a bullet), which the ratio tooling could not
  * see — an escape the r14 hygiene pass fixed by promoting them to
  * table rows. This spec makes that class of drift structurally
  * impossible (r14 verdict task 8): every registered gate must own
  * EXACTLY ONE pin row across all of BASELINE.md's pin tables, and no
  * pin row may outlive its gate. Re-pins therefore must EDIT the
  * existing row in place (adjudication history stays in prose; the
  * effective number lives in exactly one machine-readable cell).
  */
class BaselinePinSpec extends AnyFunSuite {

  // `| name | 1.23 |` — a pin row: bare query name cell + numeric cell.
  // Prose tables elsewhere in the file (e.g. SURVEY-style inventories)
  // use backticked names or non-numeric columns and don't match.
  private val PinRow = """^\|\s*([a-z0-9_]+)\s*\|\s*([0-9]+(?:\.[0-9]+)?)\s*\|\s*$""".r

  private lazy val pinRows: Seq[(String, Double, Int)] = java.nio.file.Files
    .readAllLines(java.nio.file.Paths.get("BASELINE.md")).asScala
    .zipWithIndex.flatMap { case (l, i) =>
      PinRow.findFirstMatchIn(l).map(m =>
        (m.group(1), m.group(2).toDouble, i + 1))
    }.toSeq

  test("every registered gate has exactly one BASELINE.md pin row") {
    val counts = pinRows.groupBy(_._1).view.mapValues(_.size).toMap
    val registered = SparkEntry.queries.keySet
    val missing = registered.filter(n => counts.getOrElse(n, 0) == 0)
    assert(missing.isEmpty,
      s"gates with NO pin row (new gate landed without a pin): " +
        s"${missing.toSeq.sorted}")
    val dup = counts.filter { case (n, c) => registered(n) && c > 1 }
    assert(dup.isEmpty,
      s"gates with MULTIPLE pin rows (re-pin must edit in place): $dup")
  }

  test("no pin row without a registered gate") {
    val registered = SparkEntry.queries.keySet
    val orphans = pinRows.filterNot(r => registered(r._1))
    assert(orphans.isEmpty,
      s"pin rows for unregistered gates (removed gate left a row): " +
        s"${orphans.map(r => s"${r._1}@L${r._3}")}")
  }

  test("pins are positive and plausibly seconds-scale") {
    // a zero/negative or kilo-second pin is a typo, not a measurement
    pinRows.foreach { case (n, v, ln) =>
      assert(v > 0.0 && v < 600.0, s"implausible pin $v for $n at L$ln")
    }
  }
}
