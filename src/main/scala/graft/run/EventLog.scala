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

  private val levels = Map("debug" -> 0, "info" -> 1, "warn" -> 2, "error" -> 3)

  def emit(event: String, level: String, fields: (String, Any)*): Unit = {
    if (levels.getOrElse(level, 1) < levels.getOrElse(minLevel, 1)) return
    val ts = java.time.Instant.now().toString
    if (format == "json") {
      val all = Seq("event" -> event, "ts" -> ts, "level" -> level) ++ fields
      sink(all.map { case (k, v) => s"${q(k)}: ${jval(v)}" }
        .mkString("{", ", ", "}"))
    } else {
      val kv = fields.map { case (k, v) => s"$k=${String.valueOf(v)}" }.mkString(" ")
      sink(s"$ts [$level] $event $kv")
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
