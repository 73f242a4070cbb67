package graft.core

/** Content checksums for artifact-based `--state` comparison
  * (VERDICT r10 item 3; reference `state_checks`,
  * `core/dbt/graph/selector_methods.py:609-788`, which diffs SAVED
  * manifests via per-node checksums — `checksum` field in
  * `core/dbt/contracts/graph/nodes.py`).
  *
  * One hash per comparison dimension, computed identically at artifact
  * WRITE time (Artifacts.writeManifest embeds them as
  * `state_checksums`) and at SELECT time from the freshly-parsed node
  * — so `state:modified` and every submethod can run from a saved
  * `manifest.json` alone, no comparison-project re-parse:
  *
  *  - body        — raw definition text (same_body)
  *  - config      — full NodeConfig surface (modified.configs)
  *  - content     — body + config (+ snapshot strategy/unique_key;
  *                  seeds compare csv only) — reference same_contents
  *  - relation    — database/schema/alias (same_database_representation)
  *  - desc / coldesc — node + column descriptions; the persisted-
  *                  descriptions check gates each on the NEW node's
  *                  persist_docs, so the two hash separately
  *  - contract    — enforcement flag + (column name, data type) surface
  */
object StateHash {

  /** Version of the rendering scheme below, embedded in the manifest as
    * `state_checksums_format`: saved artifacts from a different scheme
    * must not silently compare (format 1 joined components with
    * unescaped delimiters, so distinct values could render — and hash —
    * identically; format 2 left null vs the literal leaf "~" and
    * Map() vs Set() ambiguous; format 3 rendered products by bare
    * `productPrefix`, which is NOT always an identifier — List's cons
    * class is named `::`, whose prefix begins with ':', the leaf
    * discriminator, so a string leaf could forge a List structure
    * (ADVICE r12) — and keyed products on the simple name, so two
    * same-named case classes from different packages collided. Format
    * 4 length-prefixes a fully-qualified class name behind its own '!'
    * discriminator and normalizes every Seq-like (List/Vector/ArraySeq/
    * Array) through one '[' branch BEFORE the Product case. Bump on
    * ANY change to stable()/lp()/contentOf. */
  val Format = "4"

  def sha(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Length-prefix — makes every embedded component self-delimiting, so
    * leaf content can never forge structure (Map("a" -> "b,c=d") vs
    * Map("a" -> "b", "c" -> "d") must hash differently). */
  private def lp(s: String): String = s.length + ":" + s

  /** Deterministic AND injective rendering (Maps/Sets sorted; case
    * classes by field) — case-class toString leaks HashMap iteration
    * order, and naive join delimiters collide with leaf content. Every
    * component is length-prefixed at its embedding site, and every
    * VARIANT carries a distinct discriminator as its first character:
    * '~' null, '{' map, '<' set, '[' sequence, '!' product, ':' leaf.
    * The product's fully-qualified class name follows '!' LENGTH-
    * PREFIXED, so a symbolic or delimiter-bearing class name can never
    * escape into structure (format 3's bare `productPrefix` let the
    * string leaf ":(1:~,5:Nil())" forge `List(null)` because `::`
    * starts with the leaf discriminator), and two same-named case
    * classes from different packages render distinctly. Sequences
    * (Iterable AND Array) are normalized through the '[' branch BEFORE
    * the Product case, so equal-content List/Vector/ArraySeq hash
    * identically — a collection-type change in node construction is
    * not a modification. */
  def stable(v: Any): String = v match {
    case null => "~"
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => lp(stable(k)) + "=" + lp(stable(x)) }
        .sorted.mkString("{", ",", "}")
    case s: scala.collection.Set[_] =>
      s.toSeq.map(x => lp(stable(x))).sorted.mkString("<", ",", ">")
    case i: Iterable[_] => i.map(x => lp(stable(x))).mkString("[", ",", "]")
    case a: Array[_] =>
      // Array.toString is identity-hash garbage — render as a sequence
      a.iterator.map(x => lp(stable(x))).mkString("[", ",", "]")
    case p: Product =>
      "!" + lp(p.getClass.getName) +
        p.productIterator.map(x => lp(stable(x))).mkString("(", ",", ")")
    case other => ":" + String.valueOf(other)
  }

  /** The per-node checksum record embedded in (and read back from) the
    * manifest artifact. `contractEnforced` rides along because the
    * contract check is conditional on BOTH sides' flags, not hashable
    * into one value. */
  final case class Checksums(
      body: String,
      config: String,
      content: String,
      relation: String,
      desc: String,
      coldesc: String,
      contractEnforced: Boolean,
      contract: String)

  def bodyOf(n: Node): String = n match {
    case m: ModelNode => m.rawSql
    case p: PythonModelNode => p.code
    case s: SnapshotNode => s.rawSql
    case t: TestNode => t.rawSql
    case s: SeedNode => s.csv
    case other => stable(other)
  }

  def contentOf(n: Node): String = n match {
    case m: ModelNode => lp(m.rawSql) + lp(stable(m.config))
    case p: PythonModelNode => lp(p.code) + lp(stable(p.config))
    case s: SnapshotNode =>
      lp(s.rawSql) + lp(stable(s.config)) +
        lp(stable(s.strategy)) + lp(stable(s.uniqueKey))
    case t: TestNode => lp(t.rawSql) + lp(stable(t.config))
    case s: SeedNode => s.csv // reference same() for seeds: csv only
    case other => stable(other)
  }

  def descOf(n: Node): String = n match {
    case m: ModelNode => m.description
    case _ => ""
  }

  def coldescOf(n: Node): String = n match {
    case m: ModelNode =>
      stable(m.columns.map(c => c.name -> c.description).toMap)
    case _ => ""
  }

  def contractOf(n: Node): String = n match {
    case m: ModelNode => stable(m.columns.map(c => (c.name, c.dataType)))
    case _ => ""
  }

  def of(n: Node): Checksums = Checksums(
    body = sha(bodyOf(n)),
    config = sha(stable(n.config)),
    content = sha(contentOf(n)),
    relation = sha(stable((n.config.database, n.config.schema, n.config.alias))),
    desc = sha(descOf(n)),
    coldesc = sha(coldescOf(n)),
    contractEnforced = n.config.contractEnforced,
    contract = sha(contractOf(n)))
}
