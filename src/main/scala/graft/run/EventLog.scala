package graft.run

/** Structured event log — the subset of the reference's typed event
  * system (`core/dbt/events/types.py`, proto-backed `--log-format
  * json`) that CI/observability tooling actually consumes: one JSON
  * line per node start/finish/error and per invocation start/end, with
  * timing and status. Text mode keeps the human one-liners.
  *
  * A process-global sink keeps the call sites one-liners; tests swap
  * `sink` to capture and parse lines back. Thread-safe: events come
  * from the scheduler's worker pool, and a line is built fully before
  * the single `sink` call.
  */
object EventLog {

  @volatile var format: String = "text" // text | json
  @volatile var sink: String => Unit = s => System.err.println(s)
  /** Default "warn" keeps library embedding quiet (the gate/bench run
    * hundreds of engine flows); the CLI raises to "info" so a real
    * invocation streams per-node lines like the reference. */
  @volatile var minLevel: String = "warn" // debug | info | warn | error

  /** Reference file channel (`logs/dbt.log`): always-JSON, always
    * debug-level, independent of the console sink/level — `tail -f`
    * plus console quiet is the normal operating mode. Enabled by the
    * CLI via [[openLogFile]]; None for library embedding. */
  @volatile private var fileSink: Option[java.io.PrintWriter] = None
  /** Guards open/close/write of the file channel as a unit. A lock on
    * the writer itself would not do: closeLogFile swaps the writer, so
    * an emit that captured the old instance could write into a closed
    * stream (PrintWriter swallows the IOException → silent drop near
    * exit, e.g. from the CLI shutdown hook). */
  private val fileLock = new Object

  def openLogFile(path: java.nio.file.Path): Unit = fileLock.synchronized {
    fileSink.foreach { w => w.flush(); w.close() }
    java.nio.file.Files.createDirectories(path.getParent)
    fileSink = Some(new java.io.PrintWriter(java.nio.file.Files.newBufferedWriter(
      path, java.nio.charset.StandardCharsets.UTF_8,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)))
  }

  def closeLogFile(): Unit = fileLock.synchronized {
    fileSink.foreach { w => w.flush(); w.close() }
    fileSink = None
  }

  private val levels = Map("debug" -> 0, "info" -> 1, "warn" -> 2, "error" -> 3)

  def emit(event: String, level: String, fields: (String, Any)*): Unit = {
    val toConsole = levels.getOrElse(level, 1) >= levels.getOrElse(minLevel, 1)
    if (!toConsole && fileSink.isEmpty) return
    val ts = java.time.Instant.now().toString
    lazy val jsonLine = {
      val all = Seq("event" -> event, "ts" -> ts, "level" -> level) ++ fields
      // secret env var values never reach a log line (reference
      // dbt_common scrub_secrets applied to every event message)
      graft.render.Secrets.scrub(
        all.map { case (k, v) => s"${q(k)}: ${jval(v)}" }.mkString("{", ", ", "}"))
    }
    // Re-read fileSink under fileLock so a concurrent closeLogFile can
    // never close the writer between capture and write.
    fileLock.synchronized {
      fileSink.foreach { w => w.println(jsonLine); w.flush() }
    }
    if (toConsole) {
      if (format == "json") sink(jsonLine)
      else {
        val kv = fields.map { case (k, v) => s"$k=${String.valueOf(v)}" }.mkString(" ")
        sink(graft.render.Secrets.scrub(s"$ts [$level] $event $kv"))
      }
    }
  }

  def info(event: String, fields: (String, Any)*): Unit = emit(event, "info", fields: _*)
  def warn(event: String, fields: (String, Any)*): Unit = emit(event, "warn", fields: _*)
  def error(event: String, fields: (String, Any)*): Unit = emit(event, "error", fields: _*)

  private def jval(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case n: Double => if (n.isNaN || n.isInfinite) q(n.toString) else n.toString
    case n: Float => jval(n.toDouble)
    case other => q(String.valueOf(other))
  }

  /** JSON string escape (all control chars — same contract as
    * Verify's). */
  private def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
