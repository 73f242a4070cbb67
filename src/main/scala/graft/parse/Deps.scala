package graft.parse

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** `graft deps` — the package manager's local + tarball half (A32;
  * reference `core/dbt/deps/local.py` + `core/dbt/deps/tarball.py`,
  * task driver `core/dbt/task/deps.py:90-277`). Hub/git sources need
  * network egress and stay out of scope (`core/dbt/deps/registry.py`);
  * local and tarball are the two sources a hermetic build can use, and
  * they exercise the same install/namespace/lockfile machinery.
  *
  * `packages.yml`:
  * {{{
  * packages:
  *   - local: ../my_pkg
  *   - tarball: /abs/or/relative/pkg.tar.gz
  *     name: forced_name        # optional; default = the package's own
  * }}}
  *
  * Install copies each package into `<project>/dbt_packages/<name>/`
  * (the reference's packages-install-path) and writes
  * `package-lock.yml` with the resolved name/source per entry plus an
  * md5 over the installed file tree, so a re-run can detect drift.
  * ProjectLoader then loads each directory under `dbt_packages` as a
  * sub-project whose nodes/macros carry that package's name.
  */
object Deps {

  final case class PackageSpec(kind: String, location: String, name: Option[String])
  final case class Installed(name: String, kind: String, location: String,
      checksum: String)

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
              val mm = m.asScala.map { case (k, v) => k.toString -> String.valueOf(v) }
              val name = mm.get("name")
              if (mm.contains("local")) PackageSpec("local", mm("local"), name)
              else if (mm.contains("tarball")) PackageSpec("tarball", mm("tarball"), name)
              else if (mm.contains("package") || mm.contains("git"))
                throw new IllegalArgumentException(
                  s"graft deps: hub/git packages need network egress and are " +
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

  /** Resolve + install every packages.yml entry; returns the installed
    * set and writes package-lock.yml.
    */
  def install(projectDir: String): Seq[Installed] = {
    val root = Paths.get(projectDir)
    val specs = parsePackagesYml(root)
    if (specs.isEmpty) return Nil
    val installRoot = root.resolve("dbt_packages")
    Files.createDirectories(installRoot)
    val installed = specs.map {
      case PackageSpec("local", loc, nameOpt) =>
        val src = root.resolve(loc).normalize()
        require(Files.isDirectory(src), s"graft deps: local package not found: $src")
        val name = nameOpt.getOrElse(projectName(src).getOrElse(
          src.getFileName.toString))
        val dest = installRoot.resolve(name)
        rmTree(dest)
        copyTree(src, dest)
        Installed(name, "local", loc, treeChecksum(dest))
      case PackageSpec("tarball", loc, nameOpt) =>
        val tar = root.resolve(loc).normalize()
        require(Files.isRegularFile(tar), s"graft deps: tarball not found: $tar")
        val tmp = Files.createTempDirectory("graft_pkg")
        try {
          untarGz(tar, tmp)
          // a tarball may wrap the project in one top-level directory
          val inner = Files.list(tmp).iterator().asScala.toSeq match {
            case Seq(only) if Files.isDirectory(only) &&
              !Files.exists(tmp.resolve("dbt_project.yml")) => only
            case _ => tmp
          }
          val name = nameOpt.getOrElse(projectName(inner).getOrElse(
            stripTarExt(tar.getFileName.toString)))
          val dest = installRoot.resolve(name)
          rmTree(dest)
          copyTree(inner, dest)
          Installed(name, "tarball", loc, treeChecksum(dest))
        } finally rmTree(tmp)
      case PackageSpec(other, _, _) =>
        throw new IllegalArgumentException(s"graft deps: unknown source kind $other")
    }
    // duplicate install names would silently shadow each other
    val dup = installed.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"graft deps: duplicate package name(s): ${dup.mkString(", ")}")
    writeLockfile(root, installed)
    installed
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
    val body = installed.map(p =>
      s"""  - name: ${p.name}
         |    source: ${p.kind}
         |    location: ${p.location}
         |    checksum: ${p.checksum}""".stripMargin).mkString("\n")
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
