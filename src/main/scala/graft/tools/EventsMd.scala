package graft.tools

/** Regenerates EVENTS.md from the code-backed coverage table
  * (graft.run.Events.table). EventsSpec asserts the file matches, so
  * run this after any table change: `sbt "runMain graft.tools.EventsMd"`.
  */
object EventsMd {
  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get(
      args.headOption.getOrElse("EVENTS.md"))
    java.nio.file.Files.writeString(out, graft.run.Events.markdown)
    println(s"wrote $out (${graft.run.Events.table.size} codes, " +
      s"${graft.run.Events.emittedCodes.size} emitted)")
  }
}
