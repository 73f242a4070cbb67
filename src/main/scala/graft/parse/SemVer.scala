package graft.parse

/** Semantic-version parsing and range resolution for the package
  * manager (reference `core/dbt/semver.py`): specifiers carry an
  * optional matcher (`=`, `>=`, `<=`, `>`, `<`; bare versions pin
  * exactly), prereleases order below their release
  * (`1.0.0-rc.1 < 1.0.0`) with dot-separated identifiers compared
  * numerically when numeric and numeric < alphanumeric, ranges reduce
  * by intersection (`reduce_versions`), prereleases are excluded from
  * the installable set unless requested or explicitly pinned
  * (`filter_installable`), and resolution picks the highest installable
  * version inside the reduced range (`resolve_to_specific_version`).
  */
object SemVer {

  final case class Version(major: Int, minor: Int, patch: Int,
      prerelease: Option[String]) extends Ordered[Version] {
    def compare(that: Version): Int = {
      val n = Ordering[(Int, Int, Int)].compare(
        (major, minor, patch), (that.major, that.minor, that.patch))
      if (n != 0) n
      else (prerelease, that.prerelease) match {
        case (None, None) => 0
        case (None, Some(_)) => 1   // release > its prereleases
        case (Some(_), None) => -1
        case (Some(a), Some(b)) => comparePrerelease(a, b)
      }
    }
    override def toString: String =
      s"$major.$minor.$patch${prerelease.map("-" + _).getOrElse("")}"
  }

  private def comparePrerelease(a: String, b: String): Int = {
    val as = a.split('.'); val bs = b.split('.')
    as.zip(bs).foreach { case (x, y) =>
      val xn = x.forall(_.isDigit); val yn = y.forall(_.isDigit)
      val c =
        if (xn && yn) java.lang.Long.compare(x.toLong, y.toLong)
        else if (xn) -1 // numeric identifiers sort below alphanumeric
        else if (yn) 1
        else x.compareTo(y)
      if (c != 0) return c
    }
    Integer.compare(as.length, bs.length) // longer prerelease is higher
  }

  /** matcher ∈ {=, >=, <=, >, <}; a bare version string pins `=`. */
  final case class Specifier(matcher: String, version: Version) {
    def satisfiedBy(v: Version): Boolean = {
      val c = v.compare(version)
      matcher match {
        case "="  => c == 0
        case ">=" => c >= 0
        case "<=" => c <= 0
        case ">"  => c > 0
        case "<"  => c < 0
      }
    }
    override def toString: String = s"$matcher$version"
  }

  private val VersionRe =
    """^\s*(\d+)\.(\d+)\.(\d+)(?:-([0-9A-Za-z.-]+))?(?:\+[0-9A-Za-z.-]+)?\s*$""".r

  def parseVersion(s: String): Version = s match {
    case VersionRe(ma, mi, pa, pre) =>
      Version(ma.toInt, mi.toInt, pa.toInt, Option(pre))
    case _ => throw new IllegalArgumentException(
      s"graft deps: bad semantic version '$s'")
  }

  def parseSpecifier(s: String): Specifier = {
    val t = s.trim
    val matcher = Seq(">=", "<=", ">", "<", "=").find(t.startsWith).getOrElse("=")
    Specifier(matcher, parseVersion(t.stripPrefix(matcher)))
  }

  /** reduce_versions: detect provably-disjoint specifier sets before
    * looking at availability, so "no such version" and "these ranges
    * can never intersect" stay distinct errors (reference
    * VersionsNotCompatibleError).
    */
  def checkCompatible(specs: Seq[Specifier]): Option[String] = {
    val lowers = specs.filter(s => s.matcher == ">=" || s.matcher == ">")
    val uppers = specs.filter(s => s.matcher == "<=" || s.matcher == "<")
    val exacts = specs.filter(_.matcher == "=")
    val exactConflict = exacts.map(_.version).distinct.size > 1
    val pinOutOfRange = exacts.exists(e => specs.exists(!_.satisfiedBy(e.version)))
    val crossed = (for (lo <- lowers; hi <- uppers) yield {
      val c = lo.version.compare(hi.version)
      c > 0 || (c == 0 && (lo.matcher == ">" || hi.matcher == "<"))
    }).exists(identity)
    if (exactConflict || pinOutOfRange || crossed)
      Some(s"version specifiers are not compatible: ${specs.mkString(", ")}")
    else None
  }

  /** filter_installable + resolve_to_specific_version: highest
    * available version satisfying every specifier; prereleases only
    * participate when asked for (flag or an explicitly-prerelease pin).
    */
  def resolve(specs: Seq[Specifier], available: Seq[Version],
      installPrerelease: Boolean): Either[String, Version] = {
    checkCompatible(specs) match {
      case Some(err) => Left(err)
      case None =>
        val allowPre = installPrerelease || specs.exists(_.version.prerelease.isDefined)
        val installable = available.filter(v => allowPre || v.prerelease.isEmpty)
        installable.filter(v => specs.forall(_.satisfiedBy(v))).sorted.lastOption
          .toRight(s"no installable version satisfies [${specs.mkString(", ")}]; " +
            s"available: ${installable.sorted.mkString(", ")}")
    }
  }
}
