package graft.parse

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** `graft deps` — the package manager (A32; reference `core/dbt/deps/`,
  * task driver `core/dbt/task/deps.py:90-277`).
  *
  * Three source kinds:
  *   - `local:` — a directory, copied in place (`deps/local.py`).
  *   - `tarball:` — a `.tar.gz`/`.tar` (minimal ustar reader below;
  *     `deps/tarball.py`).
  *   - `package:` + `version:` — hub-style registry packages
  *     (`deps/registry.py` + `clients/registry.py`), resolved with real
  *     semver ranges ([[SemVer]]; reference `core/dbt/semver.py`).
  *     The hub is addressed through dbt's documented override,
  *     `DBT_PACKAGE_HUB_URL`; in this zero-egress build it must point
  *     at a LOCAL registry mirror — a directory laid out as
  *     `<hub>/<org>/<name>/<version>.tar.gz` — and http(s) hubs are
  *     refused with an egress explanation. `git:` likewise.
  *
  * Resolution is transitive with range merging (`deps/resolver.py`
  * `resolve_packages`): each round incorporates newly-discovered
  * `packages.yml` entries (a hub package's own dependencies come from
  * its extracted tree), hub ranges for the same package intersect
  * across dependents, and the final pass re-resolves every hub package
  * against its fully-merged specifier set. Disjoint ranges and
  * duplicate project names (including a dependency shadowing the root
  * project) are hard errors.
  *
  * Install copies each package into `<project>/dbt_packages/<name>/`
  * (the reference's packages-install-path) and writes
  * `package-lock.yml` with the resolved name/source/version per entry
  * plus an md5 over the installed file tree, so a re-run can detect
  * drift. ProjectLoader then loads each directory under `dbt_packages`
  * as a sub-project whose nodes/macros carry that package's name.
  */
object Deps {

  final case class PackageSpec(kind: String, location: String, name: Option[String],
      versions: Seq[String] = Nil, installPrerelease: Boolean = false)
  final case class Installed(name: String, kind: String, location: String,
      checksum: String, version: Option[String] = None)

  def parsePackagesYml(projectDir: Path): Seq[PackageSpec] = {
    val f = Seq("packages.yml", "dependencies.yml").map(projectDir.resolve)
      .find(Files.exists(_))
    f match {
      case None => Nil
      case Some(p) =>
        val yaml = new org.yaml.snakeyaml.Yaml()
        Option(yaml.load[java.util.Map[String, Any]](Files.readString(p)))
          .map(_.asScala.toMap).getOrElse(Map.empty)
          .get("packages") match {
          case Some(l: java.util.List[_]) => l.asScala.toSeq.map {
            case m: java.util.Map[_, _] =>
              val raw = m.asScala.map { case (k, v) => k.toString -> v }.toMap
              // packages.yml scalars render like profiles.yml —
              // the OTHER legal location for DBT_ENV_SECRET_* vars
              // (reference PackageRenderer, config/renderer.py)
              val mm = raw.map { case (k, v) =>
                k -> graft.render.Secrets.renderConfigValue(String.valueOf(v)) }
              val name = mm.get("name")
              if (mm.contains("local")) PackageSpec("local", mm("local"), name)
              else if (mm.contains("tarball")) PackageSpec("tarball", mm("tarball"), name)
              else if (mm.contains("package")) {
                val versions = raw.get("version") match {
                  case Some(l: java.util.List[_]) => l.asScala.toSeq.map(String.valueOf(_))
                  case Some(v) => Seq(String.valueOf(v))
                  case None => throw new IllegalArgumentException(
                    s"graft deps: hub package ${mm("package")} needs a version")
                }
                val pre = raw.get("install-prerelease").orElse(raw.get("install_prerelease"))
                  .exists(v => String.valueOf(v).toBoolean)
                PackageSpec("hub", mm("package"), name, versions, pre)
              }
              else if (mm.contains("git"))
                throw new IllegalArgumentException(
                  s"graft deps: git packages need network egress and are " +
                    s"not supported; vendor the package as local: or tarball: " +
                    s"(entry: $mm)")
              else throw new IllegalArgumentException(s"graft deps: bad entry $mm")
            case other =>
              throw new IllegalArgumentException(s"graft deps: bad entry $other")
          }
          case _ => Nil
        }
    }
  }

  /** Hub root: DBT_PACKAGE_HUB_URL pointing at a local mirror directory
    * (`file://` or a plain path). Remote hubs are refused — no egress.
    */
  private def hubRoot(hubUrl: Option[String]): Path = hubUrl match {
    case None => throw new IllegalArgumentException(
      "graft deps: hub packages need network egress and are not " +
        "supported against the public hub; point DBT_PACKAGE_HUB_URL at " +
        "a local registry mirror (<hub>/<org>/<pkg>/<version>.tar.gz) " +
        "or vendor the package as local: or tarball:")
    case Some(u) if u.startsWith("http://") || u.startsWith("https://") =>
      throw new IllegalArgumentException(
        s"graft deps: remote hub '$u' needs network egress; use a local " +
          s"registry mirror path in DBT_PACKAGE_HUB_URL")
    case Some(u) =>
      val p = Paths.get(u.stripPrefix("file://"))
      require(Files.isDirectory(p), s"graft deps: hub registry not found: $p")
      p
  }

  /** Versions present in the mirror for `org/name` = tarball filenames. */
  private def hubVersions(hub: Path, pkg: String): Seq[SemVer.Version] = {
    val dir = hub.resolve(pkg)
    require(Files.isDirectory(dir), s"graft deps: package $pkg not in registry $hub")
    Files.list(dir).iterator().asScala.toSeq
      .map(_.getFileName.toString)
      .filter(f => f.endsWith(".tar.gz") || f.endsWith(".tgz") || f.endsWith(".tar"))
      .map(f => SemVer.parseVersion(stripTarExt(f)))
  }

  /** Resolve + install every packages.yml entry (transitively); returns
    * the installed set and writes package-lock.yml.
    */
  def install(projectDir: String,
      hubUrl: Option[String] = sys.env.get("DBT_PACKAGE_HUB_URL")): Seq[Installed] = {
    val root = Paths.get(projectDir)
    val rootSpecs = parsePackagesYml(root)
    if (rootSpecs.isEmpty) {
      graft.run.EventLog.info("deps_no_packages_found", "code" -> "M013",
        "msg" -> "Warning: No packages were found in packages.yml")
      return Nil
    }
    val rootName = projectName(root).getOrElse(root.getFileName.toString)

    // staged source trees awaiting install: insertion-ordered, deduped
    final case class Staged(kind: String, location: String, srcDir: Path,
        name: String, version: Option[String])
    val fixed = mutable.LinkedHashMap[String, Staged]() // local+tarball by canonical path
    val hubSpecs = mutable.LinkedHashMap[String, (Vector[SemVer.Specifier], Boolean)]()
    val hubStage = mutable.HashMap[String, (SemVer.Version, Path)]() // pkg -> fetched
    val tmpDirs = mutable.Buffer[Path]()

    def stageTarball(tar: Path): Path = {
      val tmp = Files.createTempDirectory("graft_pkg")
      tmpDirs += tmp
      untarGz(tar, tmp)
      // a tarball may wrap the project in one top-level directory
      Files.list(tmp).iterator().asScala.toSeq match {
        case Seq(only) if Files.isDirectory(only) &&
          !Files.exists(tmp.resolve("dbt_project.yml")) => only
        case _ => tmp
      }
    }

    def resolveHub(pkg: String): SemVer.Version = {
      val (specs, pre) = hubSpecs(pkg)
      val hub = hubRoot(hubUrl)
      SemVer.resolve(specs, hubVersions(hub, pkg), pre) match {
        case Right(v) => v
        case Left(err) => throw new IllegalArgumentException(
          s"graft deps: package $pkg: $err")
      }
    }

    def fetchHub(pkg: String, v: SemVer.Version): Path = {
      val hub = hubRoot(hubUrl)
      val tar = Seq(s"$v.tar.gz", s"$v.tgz", s"$v.tar").map(hub.resolve(pkg).resolve(_))
        .find(Files.isRegularFile(_))
        .getOrElse(throw new IllegalArgumentException(
          s"graft deps: registry lists no tarball for $pkg@$v"))
      stageTarball(tar)
    }

    try {
      // ---- resolution rounds (reference resolver.py resolve_packages)
      var pending: Seq[(Path, PackageSpec)] = rootSpecs.map(root -> _)
      while (pending.nonEmpty) {
        val next = mutable.Buffer[(Path, PackageSpec)]()
        pending.foreach { case (base, spec) =>
          spec.kind match {
            case "local" =>
              val src = base.resolve(spec.location).normalize()
              val key = s"local:$src"
              if (fixed.contains(key))
                graft.run.EventLog.info("deps_found_duplicate_package",
                  "code" -> "M033", "package" -> spec.location)
              if (!fixed.contains(key)) {
                require(Files.isDirectory(src),
                  s"graft deps: local package not found: $src")
                val name = spec.name.getOrElse(projectName(src).getOrElse(
                  src.getFileName.toString))
                fixed(key) = Staged("local", spec.location, src, name, None)
                next ++= parsePackagesYml(src).map(src -> _)
              }
            case "tarball" =>
              val tar = base.resolve(spec.location).normalize()
              val key = s"tarball:$tar"
              if (!fixed.contains(key)) {
                require(Files.isRegularFile(tar),
                  s"graft deps: tarball not found: $tar")
                val inner = stageTarball(tar)
                val name = spec.name.getOrElse(projectName(inner).getOrElse(
                  stripTarExt(tar.getFileName.toString)))
                fixed(key) = Staged("tarball", spec.location, inner, name, None)
                next ++= parsePackagesYml(inner).map(inner -> _)
              }
            case "hub" =>
              val pkg = spec.location
              val specifiers = spec.versions.map(SemVer.parseSpecifier)
              val (prev, prevPre) = hubSpecs.getOrElse(pkg, (Vector.empty, false))
              hubSpecs(pkg) = (prev ++ specifiers, prevPre || spec.installPrerelease)
              val v = resolveHub(pkg)
              // fetch metadata for the currently-chosen version; if a
              // later round narrows the range, the final pass re-fetches
              if (!hubStage.get(pkg).exists(_._1 == v)) {
                val dir = fetchHub(pkg, v)
                hubStage(pkg) = (v, dir)
                next ++= parsePackagesYml(dir).map(dir -> _)
              }
          }
        }
        pending = next.toSeq
      }

      // ---- final hub resolution against fully-merged ranges
      val hubFinal = hubSpecs.keys.toSeq.map { pkg =>
        val v = resolveHub(pkg)
        val dir = hubStage.get(pkg) match {
          case Some((sv, d)) if sv == v => d
          case _ => fetchHub(pkg, v)
        }
        val name = projectName(dir).getOrElse(pkg.split('/').last)
        Staged("hub", pkg, dir, name, Some(v.toString))
      }

      // ---- install phase
      val staged = fixed.values.toSeq ++ hubFinal
      val dup = staged.groupBy(_.name).filter(_._2.size > 1).keys
      require(dup.isEmpty,
        s"graft deps: duplicate package name(s): ${dup.mkString(", ")}")
      require(!staged.exists(_.name == rootName),
        s"graft deps: package name collides with the root project: $rootName")

      val installRoot = root.resolve("dbt_packages")
      graft.run.EventLog.emit("deps_set_download_directory", "debug",
        "code" -> "M028", "path" -> installRoot.toString)
      Files.createDirectories(installRoot)
      // M016/M017/M019: for hub packages the mirror knows every
      // available version — report chosen-vs-newest per package and a
      // summary when any update exists (reference deps.py:136-148)
      val updatesAvailable = hubFinal.flatMap { s =>
        val newest = hubVersions(hubRoot(hubUrl), s.location).max
        val chosen = SemVer.parseVersion(s.version.get)
        if (newest > chosen) {
          graft.run.EventLog.info("deps_update_available", "code" -> "M016",
            "package" -> s.location, "version_latest" -> newest.toString)
          Some(s.location)
        } else {
          graft.run.EventLog.info("deps_up_to_date", "code" -> "M017",
            "package" -> s.location)
          None
        }
      }
      if (updatesAvailable.nonEmpty)
        graft.run.EventLog.info("deps_notify_updates_available", "code" -> "M019",
          "packages" -> updatesAvailable.mkString(", "))
      val installed = staged.map { s =>
        graft.run.EventLog.info("deps_start_package_install", "code" -> "M014",
          "package_name" -> s.name)
        val dest = installRoot.resolve(s.name)
        rmTree(dest)
        copyTree(s.srcDir, dest)
        graft.run.EventLog.info("deps_install_info", "code" -> "M015",
          "version_name" -> s.version.getOrElse(s.kind))
        Installed(s.name, s.kind, s.location, treeChecksum(dest), s.version)
      }
      graft.run.EventLog.info("deps_lock_updating", "code" -> "M031",
        "lock_filepath" -> root.resolve("package-lock.yml").toString)
      writeLockfile(root, installed)
      installed
    } finally tmpDirs.foreach(rmTree)
  }

  /** Installed package directories (deps must have run; empty if none). */
  def installedPackageDirs(projectDir: Path): Seq[(String, Path)] = {
    val installRoot = projectDir.resolve("dbt_packages")
    if (!Files.isDirectory(installRoot)) Nil
    else Files.list(installRoot).iterator().asScala.toSeq
      .filter(Files.isDirectory(_))
      .map(p => p.getFileName.toString -> p)
      .sortBy(_._1)
  }

  private def projectName(dir: Path): Option[String] = {
    val f = dir.resolve("dbt_project.yml")
    if (!Files.exists(f)) None
    else {
      val yaml = new org.yaml.snakeyaml.Yaml()
      Option(yaml.load[java.util.Map[String, Any]](Files.readString(f)))
        .flatMap(m => Option(m.get("name")).map(_.toString))
    }
  }

  private def stripTarExt(fn: String): String =
    fn.replaceAll("\\.(tar\\.gz|tgz|tar)$", "")

  private def writeLockfile(root: Path, installed: Seq[Installed]): Unit = {
    val body = installed.map { p =>
      val ver = p.version.map(v => s"\n    version: $v").getOrElse("")
      s"""  - name: ${p.name}
         |    source: ${p.kind}
         |    location: ${p.location}$ver
         |    checksum: ${p.checksum}""".stripMargin
    }.mkString("\n")
    Files.writeString(root.resolve("package-lock.yml"), s"packages:\n$body\n")
  }

  // ------------------------------------------------------------ fs utils

  private def rmTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))

  private def copyTree(src: Path, dest: Path): Unit =
    Files.walk(src).iterator().asScala.foreach { s =>
      val d = dest.resolve(src.relativize(s).toString)
      if (Files.isDirectory(s)) Files.createDirectories(d)
      else {
        Files.createDirectories(d.getParent)
        Files.copy(s, d, StandardCopyOption.REPLACE_EXISTING)
      }
    }

  /** Deterministic md5 over relative paths + file bytes. */
  private def treeChecksum(dir: Path): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Files.walk(dir).iterator().asScala.toSeq
      .filter(Files.isRegularFile(_)).sortBy(_.toString)
      .foreach { f =>
        md.update(dir.relativize(f).toString.getBytes("UTF-8"))
        md.update(Files.readAllBytes(f))
      }
    md.digest().map("%02x".format(_)).mkString
  }

  // --------------------------------------------------------- tar reader

  /** Minimal ustar extractor (tar / tar.gz): 512-byte headers — name at
    * 0 (100 bytes), size at 124 (octal), typeflag at 156, ustar prefix
    * at 345 (155 bytes); file data rounded up to 512. Enough for
    * tarballs produced by `tar czf` over a project directory; no
    * symlinks/hardlinks (skipped), no pax extended headers.
    */
  private[parse] def untarGz(tar: Path, dest: Path): Unit = {
    val rawIn = Files.newInputStream(tar)
    val in: java.io.InputStream =
      if (tar.toString.endsWith(".tar")) new java.io.BufferedInputStream(rawIn)
      else new java.util.zip.GZIPInputStream(rawIn)
    try {
      val header = new Array[Byte](512)
      def readFully(buf: Array[Byte], len: Int): Int = {
        var off = 0
        while (off < len) {
          val n = in.read(buf, off, len - off)
          if (n < 0) return off
          off += n
        }
        off
      }
      var done = false
      while (!done) {
        val n = readFully(header, 512)
        if (n < 512 || header.forall(_ == 0)) done = true
        else {
          def str(off: Int, len: Int): String = {
            val end = (off until off + len).find(header(_) == 0).getOrElse(off + len)
            new String(header, off, end - off, "UTF-8")
          }
          val prefix = str(345, 155)
          val name0 = str(0, 100)
          val name = (if (prefix.nonEmpty) s"$prefix/$name0" else name0)
            .stripPrefix("./")
          val size = java.lang.Long.parseLong(str(124, 12).trim, 8)
          val typeflag = header(156).toChar
          val target = dest.resolve(name).normalize()
          require(target.startsWith(dest), s"graft deps: tar path escape: $name")
          if (typeflag == '5' || name.endsWith("/")) Files.createDirectories(target)
          else if (typeflag == '0' || typeflag == 0.toChar) {
            Files.createDirectories(target.getParent)
            val buf = new Array[Byte](65536)
            val out = Files.newOutputStream(target)
            try {
              var left = size
              while (left > 0) {
                val r = in.read(buf, 0, math.min(buf.length, left).toInt)
                require(r > 0, "graft deps: truncated tar")
                out.write(buf, 0, r)
                left -= r
              }
            } finally out.close()
          } else {
            // skip link/pax/other entries' data
            var left = size
            val buf = new Array[Byte](65536)
            while (left > 0) {
              val r = in.read(buf, 0, math.min(buf.length, left).toInt)
              require(r > 0, "graft deps: truncated tar")
              left -= r
            }
          }
          val pad = (512 - (size % 512)) % 512
          if (pad > 0) { val skip = new Array[Byte](pad.toInt); readFully(skip, pad.toInt); () }
        }
      }
    } finally in.close()
  }
}
