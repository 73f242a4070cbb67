package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The built-once index population is a measured, registered fact
  * (the EVENTS.md/EventsSpec discipline, reapplied per VERDICT r10
  * item 1):
  *  - every `IndexCache.key("<prefix>", …)` call site in main sources
  *    has a registry row, and every registry row has a call site — an
  *    unregistered cache (or a ledger row for a deleted cache) fails
  *    the build;
  *  - INDEXES.md (the generated ledger) carries exactly the registry's
  *    rows — build numbers vary per machine, the ROW SET may not.
  */
class IndexRegistrySpec extends AnyFunSuite {

  private val keyShape = """IndexCache\.key\("([a-z0-9-]+)"""".r

  private def callSitePrefixes: Set[String] = {
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    java.nio.file.Files.walk(root).iterator().forEachRemaining { f =>
      if (f.toString.endsWith(".scala") &&
          f.getFileName.toString != "IndexCache.scala")
        java.nio.file.Files.readAllLines(f).forEach { line =>
          val t = line.trim
          if (!t.startsWith("//") && !t.startsWith("*") && !t.startsWith("/*"))
            keyShape.findAllMatchIn(line).foreach(m => buf += m.group(1))
        }
    }
    buf.toSet
  }

  test("cache call sites == registry rows") {
    val sites = callSitePrefixes
    val registered = IndexRegistry.prefixes
    val unregistered = sites -- registered
    val phantom = registered -- sites
    assert(unregistered.isEmpty,
      s"index caches without a registry row: ${unregistered.toSeq.sorted}")
    assert(phantom.isEmpty,
      s"registry rows without a cache call site: ${phantom.toSeq.sorted}")
  }

  test("INDEXES.md rows == registry rows") {
    val path = java.nio.file.Paths.get("INDEXES.md")
    assert(java.nio.file.Files.exists(path),
      "INDEXES.md missing — run `sbt \"runMain graft.tools.IndexesMd\"`")
    val rowShape = """^\| `([a-z0-9-]+)` \|""".r
    val rows = scala.jdk.CollectionConverters
      .ListHasAsScala(java.nio.file.Files.readAllLines(path)).asScala
      .flatMap(l => rowShape.findFirstMatchIn(l).map(_.group(1)))
      .toSet
    val missing = IndexRegistry.prefixes -- rows
    val stale = rows -- IndexRegistry.prefixes
    assert(missing.isEmpty,
      s"registry rows missing from INDEXES.md (regenerate): ${missing.toSeq.sorted}")
    assert(stale.isEmpty,
      s"INDEXES.md rows not in the registry (regenerate): ${stale.toSeq.sorted}")
  }

  test("INDEXES.md build-cost cells are fully populated (no — holes)") {
    // VERDICT r11 item 3: the ledger artifact must not ship unmeasured
    // scale cells — a failed in-session build gets a clean-session
    // re-measure (IndexesMd patch mode), not a dash the notes fill
    val path = java.nio.file.Paths.get("INDEXES.md")
    assume(java.nio.file.Files.exists(path))
    val rowShape = """^\| `([a-z0-9-]+)` \| [^|]+ \| ([^|]+) \|""".r
    val holes = scala.jdk.CollectionConverters
      .ListHasAsScala(java.nio.file.Files.readAllLines(path)).asScala
      .flatMap(l => rowShape.findFirstMatchIn(l).map(m => m.group(1) -> m.group(2)))
      .collect { case (p, costs) if costs.contains("—") => p }
    assert(holes.isEmpty,
      s"INDEXES.md has unmeasured build cells (IndexesMd patch mode): ${holes.toSeq.sorted}")
  }

  test("INDEXES.md consumer ids reference live queries") {
    val path = java.nio.file.Paths.get("INDEXES.md")
    assume(java.nio.file.Files.exists(path))
    val live = graft.SparkEntry.allQueries.map(_.name.takeWhile(_ != '_')).toSet
    val consumerCell = """\| [^|]+ \| [^|]+ \| [^|]+ \| \d+: ([^|]+) \|""".r
    val stale = scala.jdk.CollectionConverters
      .ListHasAsScala(java.nio.file.Files.readAllLines(path)).asScala
      .flatMap(l => consumerCell.findFirstMatchIn(l).map(_.group(1)))
      .flatMap(_.split(",").map(_.trim))
      .filterNot(live)
    assert(stale.isEmpty,
      s"INDEXES.md names consumers that no longer exist (regenerate): ${stale.distinct}")
  }

  test("registry hygiene: unique prefixes, named maintenance, real sites") {
    assert(IndexRegistry.all.map(_.prefix).distinct.size == IndexRegistry.all.size)
    IndexRegistry.all.foreach { d =>
      assert(d.maintenance.nonEmpty && d.description.nonEmpty && d.site.nonEmpty,
        s"registry row ${d.prefix} has empty metadata")
    }
  }

  test("ledger instrumentation: timedBuild attributes nested builds to the child") {
    IndexCache.resetLedger()
    IndexCache.timedBuild("outer|s|d") {
      Thread.sleep(30)
      IndexCache.timedBuild("inner|s|d")(Thread.sleep(60))
      Thread.sleep(10)
    }
    val b = IndexCache.buildsByPrefix
    assert(b("inner") >= 0.055, s"inner build under-recorded: $b")
    // outer's OWN time excludes the nested 60ms child
    assert(b("outer") < b("inner"), s"nested build double-billed: $b")
    IndexCache.resetLedger()
  }

  test("ledger instrumentation: consumer attribution via thread label") {
    IndexCache.resetLedger()
    IndexCache.currentConsumer.set("qXX_test")
    try IndexCache.noteAccess("outer|s|d")
    finally IndexCache.currentConsumer.remove()
    IndexCache.noteAccess("outer|s|d") // unlabeled -> not attributed
    assert(IndexCache.consumersByPrefix("outer") == Set("qXX_test"))
    IndexCache.resetLedger()
  }
}
