package graft.parse

import java.io.{DataInputStream, DataOutputStream, IOException}

/** Data-only codec for the partial-parse state file (format v3 —
  * VERDICT r10 item 6; reference parity: the reference saves its
  * manifest state as msgpack, `core/dbt/parser/manifest.py`, which is
  * data-only by construction).
  *
  * v2 used Java serialization behind a JEP-290 filter — that FILTERS
  * the gadget-chain class of attack from a state file planted inside a
  * cloned project; this codec REMOVES it: the stream can only name
  * classes in a closed whitelist of the engine's own pure-data case
  * classes (plus tuples), every value decodes through typed tags, and
  * instantiation happens via the case class's public constructor with
  * decoded-data arguments — there is no ObjectInputStream, no readObject
  * side channel, no class initialization beyond the whitelist.
  *
  * Robustness contract (inherited from v2): ANY decode anomaly —
  * unknown class, bad tag, truncation, depth/size bound — throws, and
  * PartialParse.readState degrades to a cold parse. An unencodable
  * value at WRITE time (a non-data object reaching the parse cache)
  * likewise throws and the state is simply not saved.
  */
private[parse] object StateCodec {

  /** File magic + codec version; bumped with PartialParse.Format. */
  val Magic: Int = 0x47465435 // "GFT5" (SchemaOut grew seed/snapshot patches)

  /** The closed instantiation universe: every case class that can
    * appear in a cached parse result. Unlisted names fail decode. */
  private val allowed: Map[String, Class[_]] = Seq[Class[_]](
    classOf[PartialParse.State],
    classOf[PartialParse.CachedFile],
    classOf[ProjectLoader.SchemaOut],
    classOf[ProjectLoader.SourcePatch],
    classOf[graft.core.NodeConfig],
    classOf[graft.core.ColumnInfo],
    classOf[graft.core.GenericTestRef],
    classOf[graft.core.ModelNode],
    classOf[graft.core.PythonModelNode],
    classOf[graft.core.SourceNode],
    classOf[graft.core.SeedNode],
    classOf[graft.core.SnapshotNode],
    classOf[graft.core.TimestampStrategy],
    classOf[graft.core.CheckStrategy],
    classOf[graft.core.CustomStrategy],
    classOf[graft.core.ResolvedCustomStrategy],
    classOf[graft.core.TestNode],
    classOf[graft.core.UnitTestNode],
    classOf[graft.core.DictRows],
    classOf[graft.core.CsvRows],
    classOf[graft.core.SqlRows],
    classOf[graft.core.ExposureNode],
    classOf[graft.core.MetricNode],
    classOf[graft.core.SemanticModelNode],
    classOf[graft.core.SavedQueryNode],
    classOf[graft.core.GroupNode],
    classOf[graft.render.Template.MacroDef],
    classOf[Tuple2[_, _]],
    classOf[Tuple3[_, _, _]],
    classOf[Tuple4[_, _, _, _]],
    classOf[Tuple5[_, _, _, _, _]]
  ).map(c => c.getName -> c).toMap

  private val MaxDepth = 128
  private val MaxLen = 1 << 24 // 16M elements/chars: far above any real project

  /** Primitive-specialized tuples get runtime classes like
    * `scala.Tuple2$mcII$sp` — same constructor surface, so encode them
    * under the erased name (a plain `(1, 2)` entering the parse cache
    * must not silently disable warm partial parse forever). */
  private def className(p: Product): String = {
    val n = p.getClass.getName
    if (n.startsWith("scala.Tuple") && n.endsWith("$sp"))
      n.substring(0, n.indexOf("$mc")) else n
  }

  def write(out: DataOutputStream, v: Any): Unit = v match {
    case null => out.writeByte('N')
    case s: String => out.writeByte('S'); writeStr(out, s)
    case b: java.lang.Boolean => out.writeByte('B'); out.writeBoolean(b)
    case i: java.lang.Integer => out.writeByte('I'); out.writeInt(i)
    case l: java.lang.Long => out.writeByte('J'); out.writeLong(l)
    case d: java.lang.Double => out.writeByte('D'); out.writeDouble(d)
    case f: java.lang.Float => out.writeByte('F'); out.writeFloat(f)
    case h: java.lang.Short => out.writeByte('H'); out.writeShort(h.toInt)
    case y: java.lang.Byte => out.writeByte('Y'); out.writeByte(y.toInt)
    case c: java.lang.Character => out.writeByte('C'); out.writeChar(c.charValue())
    case None => out.writeByte('n')
    case Some(x) => out.writeByte('o'); write(out, x)
    case m: scala.collection.Map[_, _] =>
      out.writeByte('M'); out.writeInt(m.size)
      m.foreach { case (k, x) => write(out, k); write(out, x) }
    case s: scala.collection.Set[_] =>
      out.writeByte('T'); out.writeInt(s.size); s.foreach(write(out, _))
    case xs: scala.collection.Iterable[_] =>
      out.writeByte('L'); out.writeInt(xs.size); xs.foreach(write(out, _))
    case p: Product if allowed.contains(className(p)) =>
      out.writeByte('P')
      writeStr(out, className(p))
      out.writeInt(p.productArity)
      p.productIterator.foreach(write(out, _))
    case other =>
      // a non-data object reached the parse cache: refuse to encode —
      // writeState drops the state and the next run cold-parses
      throw new IOException(s"unencodable parse-cache value: ${other.getClass}")
  }

  private def writeStr(out: DataOutputStream, s: String): Unit = {
    // not writeUTF: cached file contents (seed CSVs, model SQL) can
    // exceed the 64 KB modified-UTF limit
    val bytes = s.getBytes("UTF-8")
    out.writeInt(bytes.length)
    out.write(bytes)
  }

  def read(in: DataInputStream): Any = read(in, 0)

  private def read(in: DataInputStream, depth: Int): Any = {
    if (depth > MaxDepth) throw new IOException("state depth bound exceeded")
    (in.readByte(): @annotation.switch) match {
      case 'N' => null
      case 'S' => readStr(in)
      case 'B' => java.lang.Boolean.valueOf(in.readBoolean())
      case 'I' => java.lang.Integer.valueOf(in.readInt())
      case 'J' => java.lang.Long.valueOf(in.readLong())
      case 'D' => java.lang.Double.valueOf(in.readDouble())
      case 'F' => java.lang.Float.valueOf(in.readFloat())
      case 'H' => java.lang.Short.valueOf(in.readShort())
      case 'Y' => java.lang.Byte.valueOf(in.readByte())
      case 'C' => java.lang.Character.valueOf(in.readChar())
      case 'n' => None
      case 'o' => Some(read(in, depth + 1))
      case 'M' =>
        val n = boundedLen(in.readInt())
        val b = Map.newBuilder[Any, Any]
        var i = 0
        while (i < n) { b += (read(in, depth + 1) -> read(in, depth + 1)); i += 1 }
        b.result()
      case 'T' =>
        val n = boundedLen(in.readInt())
        val b = Set.newBuilder[Any]
        var i = 0
        while (i < n) { b += read(in, depth + 1); i += 1 }
        b.result()
      case 'L' =>
        val n = boundedLen(in.readInt())
        val b = List.newBuilder[Any]
        var i = 0
        while (i < n) { b += read(in, depth + 1); i += 1 }
        b.result()
      case 'P' =>
        val name = readStr(in)
        val cls = allowed.getOrElse(name,
          throw new IOException(s"state names unlisted class: $name"))
        val arity = in.readInt()
        if (arity < 0 || arity > 64) throw new IOException("bad arity")
        val args = new Array[AnyRef](arity)
        var i = 0
        while (i < arity) { args(i) = read(in, depth + 1).asInstanceOf[AnyRef]; i += 1 }
        construct(cls, args)
      case t => throw new IOException(s"bad state tag: $t")
    }
  }

  private def boundedLen(n: Int): Int =
    if (n < 0 || n > MaxLen) throw new IOException(s"state length bound: $n") else n

  private def readStr(in: DataInputStream): String = {
    val n = boundedLen(in.readInt())
    val bytes = new Array[Byte](n)
    in.readFully(bytes)
    new String(bytes, "UTF-8")
  }

  /** Instantiate a whitelisted case class via its public constructor
    * whose parameter count matches — pure data in, no init side
    * channels. A type mismatch (corrupted stream) throws and readState
    * degrades to a cold parse. */
  private def construct(cls: Class[_], args: Array[AnyRef]): AnyRef = {
    val ctor = cls.getConstructors.find(_.getParameterCount == args.length)
      .getOrElse(throw new IOException(
        s"no ${args.length}-arg constructor on ${cls.getName}"))
    ctor.newInstance(args: _*).asInstanceOf[AnyRef]
  }
}
