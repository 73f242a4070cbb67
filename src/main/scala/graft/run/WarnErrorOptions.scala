package graft.run

/** `--warn-error-options` (reference
  * `core/dbt/cli/option_types.py:46-66` WarnErrorOptionsType over
  * dbt_common's WarnErrorOptions; applied by `warn_or_error` and by
  * the task layer, e.g. `core/dbt/task/test.py:279-281` promoting
  * warn-severity test results when the options include
  * `LogTestResult`): a YAML/JSON dict with
  *
  *   - `include`: `"all"` / `"*"` or a list of reference EVENT CLASS
  *     names to promote from warning to error (`error` is an exclusive
  *     alias, option_types.py:52-55);
  *   - `exclude`: names exempted from an `include: all` (`warn` is an
  *     exclusive alias, :56-59);
  *   - `silence`: names suppressed entirely — no warning, no error.
  *
  * Precedence per name: silence > exclude > include — exactly
  * dbt_common's WarnErrorOptions.includes(). Member names are
  * validated against this engine's reference-event table
  * ([[Events.table]], the analog of the reference's ALL_EVENT_NAMES
  * validation). `--warn-error` remains the blanket `include: all`; the
  * two flags are mutually exclusive on the CLI like the reference's.
  */
final case class WarnErrorOptions(
    includeAll: Boolean = false,
    include: Set[String] = Set.empty,
    exclude: Set[String] = Set.empty,
    silence: Set[String] = Set.empty) {

  /** Should a warning of this event class be PROMOTED to an error? */
  def includes(name: String): Boolean =
    !silence.contains(name) && !exclude.contains(name) &&
      (includeAll || include.contains(name))

  /** Should it be suppressed entirely? */
  def silenced(name: String): Boolean = silence.contains(name)

  def isEmpty: Boolean =
    !includeAll && include.isEmpty && exclude.isEmpty && silence.isEmpty
}

object WarnErrorOptions {
  val Empty: WarnErrorOptions = WarnErrorOptions()

  /** Parse the CLI string (YAML dict, reference YAML ParamType).
    * `{"include": "all", "exclude": ["NoNodesForSelectionCriteria"]}`.
    * Unknown event names and include+error / exclude+warn collisions
    * are hard usage errors, mirroring the reference's validation.
    */
  def parse(s: String): WarnErrorOptions = {
    import scala.jdk.CollectionConverters._
    val doc = Option(new org.yaml.snakeyaml.Yaml()
      .load[Any](s)) match {
      case Some(m: java.util.Map[_, _]) =>
        m.asScala.map { case (k, v) => String.valueOf(k) -> (v: Any) }.toMap
      case None => Map.empty[String, Any]
      case Some(other) => throw new IllegalArgumentException(
        s"The value of `warn_error_options` must be a YAML dict, got: $other")
    }
    def names(v: Any, key: String): (Boolean, Set[String]) = v match {
      case s: String if s == "all" || s == "*" => (true, Set.empty)
      case s: String => (false, Set(s))
      case l: java.util.List[_] =>
        (false, l.asScala.map(String.valueOf(_)).toSet)
      case null => (false, Set.empty)
      case other => throw new IllegalArgumentException(
        s"warn_error_options.$key must be 'all' or a list of event names, got: $other")
    }
    // `error`/`warn` are exclusive aliases of include/exclude
    // (reference exclusive_primary_alt_value_setting)
    def merged(primary: String, alt: String): Any = {
      (doc.get(primary), doc.get(alt)) match {
        case (Some(p), Some(a)) if p != null && a != null =>
          throw new IllegalArgumentException(
            s"Only `$primary` or `$alt` can be specified in `warn_error_options`, not both")
        case (Some(p), _) if p != null => p
        case (_, Some(a)) => a
        case _ => null
      }
    }
    val (incAll, inc) = names(merged("include", "error"), "include")
    val (exAll, exc) = names(merged("exclude", "warn"), "exclude")
    val (silAll, sil) = names(doc.getOrElse("silence", null), "silence")
    if (exAll || silAll) throw new IllegalArgumentException(
      "warn_error_options: only `include` accepts 'all'")
    val known = Events.table.map(_.name).toSet
    val unknown = (inc ++ exc ++ sil).filterNot(known)
    if (unknown.nonEmpty) throw new IllegalArgumentException(
      s"warn_error_options: unknown event name(s): ${unknown.toSeq.sorted.mkString(", ")}" +
        " (valid names are the reference event class names, see EVENTS.md)")
    WarnErrorOptions(incAll, inc, exc, sil)
  }

  /** Route one warning through the options (reference warn_or_error):
    * silenced → nothing; included → the supplied error; otherwise the
    * plain warn event. `name` is the reference event class name,
    * `event`/`code` this engine's line identity.
    */
  def warnOrError(opts: WarnErrorOptions, name: String, event: String,
      code: String, msg: String): Unit =
    if (opts.silenced(name)) ()
    else if (opts.includes(name))
      throw new IllegalArgumentException(
        s"$msg (warning promoted to error by warn_error_options include: $name)")
    else EventLog.warn(event, "code" -> code, "msg" -> msg)
}
