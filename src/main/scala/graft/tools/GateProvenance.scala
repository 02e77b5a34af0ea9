package graft.tools

import java.io.File
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import scala.collection.immutable.SortedMap

/** Gate-provenance manifest (round-14 verdict item 3): the sf100
  * correctness evidence is spread across several rounds and data
  * generations, and nothing asserted that a query's ENGINE CODE hadn't
  * changed since its gate ran. This object is both the generator of
  * `tools/gates/provenance.json` and the hash library the
  * `RegistryMetaSpec` freshness test shares, so the two can't diverge.
  *
  * Per gated name the manifest records:
  *   - `wave`   — which tools/gates/sf100_wave*.txt list gated it;
  *   - `sha`    — repo HEAD when the entry was (re)generated;
  *   - `block_md5` — md5 of the name's marker blocks in
  *     SparkEntry.scala (its `queries` lambda AND its `oracleSql`
  *     spelling — the regions between its `"name" ->` markers and the
  *     next registry marker, concatenated in file order);
  *   - `deps`   — md5 per referenced engine source file, resolved by
  *     scanning the blocks for `Object.` tokens against the repo's
  *     object/class → file index (direct references only; transitive
  *     callees are covered by their own direct users, and a note field
  *     documents method-level rewrites adjudicated by differential
  *     specs instead of full re-gates);
  *   - `note`   — optional human adjudication (e.g. output-identical
  *     rewrite pinned by a differential spec + spot re-gate).
  *
  * The meta-test recomputes block/dep hashes from the CURRENT tree and
  * fails on any mismatch — the protocol is then: re-gate the name at
  * sf100 (or pin output-identity with a differential spec and spot
  * re-gate the family), and regenerate its entry with
  * `sbt "runMain graft.tools.GateProvenance refresh <name>... [--note text]"`.
  */
object GateProvenance {

  val ManifestPath = "tools/gates/provenance.json"

  private def md5(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def read(path: String): String =
    new String(Files.readAllBytes(Paths.get(path)), "UTF-8")

  /** Names per wave, in wave order (sf100_wave*.txt only — the same
    * convention RegistryMetaSpec uses for gate placement).
    */
  def waveLists(): SortedMap[String, Seq[String]] = {
    val files = new File("tools/gates").listFiles()
      .filter(f => f.getName.startsWith("sf100_wave") && f.getName.endsWith(".txt"))
      .sortBy(_.getName)
    SortedMap(files.map { f =>
      f.getName.stripSuffix(".txt") ->
        read(f.getPath).linesIterator.map(_.trim)
          .filter(l => l.nonEmpty && !l.startsWith("#")).toSeq
    }.toIndexedSeq: _*)
  }

  /** All `"name" ->` marker blocks of SparkEntry.scala for the given
    * registry names: for each name, the concatenation (file order) of
    * every region from its marker to the next registry marker or EOF.
    * Dead simple on purpose — the generator and the freshness test must
    * compute the identical hash.
    */
  def blocks(source: String, names: Set[String]): Map[String, String] = {
    val marker = """"([a-z0-9_]+)"\s*->""".r
    val hits = marker.findAllMatchIn(source)
      .filter(m => names(m.group(1)))
      .map(m => (m.group(1), m.start)).toVector
    val bounds = hits.map(_._2) :+ source.length
    hits.zipWithIndex.groupMapReduce(_._1._1)(
      { case ((_, s), i) => source.substring(s, bounds(i + 1)) })(_ + _)
  }

  /** object/class name → source path index over src/main/scala/graft. */
  def objectIndex(): Map[String, String] = {
    val decl = """(?m)^\s*(?:object|class|case class|trait)\s+(\w+)""".r
    def walk(dir: File): Seq[File] = {
      val fs = dir.listFiles()
      fs.filter(_.isFile).toSeq.filter(_.getName.endsWith(".scala")) ++
        fs.filter(_.isDirectory).flatMap(walk)
    }
    walk(new File("src/main/scala/graft"))
      .flatMap { f =>
        decl.findAllMatchIn(read(f.getPath)).map(_.group(1) -> f.getPath)
      }
      .groupBy(_._1).view.mapValues(_.head._2).toMap
  }

  /** Engine source files a block references directly (`Object.` tokens
    * resolved against the index), excluding SparkEntry itself (covered
    * by block_md5).
    */
  def blockDeps(block: String, index: Map[String, String]): Seq[String] = {
    val ref = """\b([A-Z][A-Za-z0-9_]*)\s*\.""".r
    ref.findAllMatchIn(block).map(_.group(1)).toSet
      .flatMap((n: String) => index.get(n))
      .filter(p => !p.endsWith("SparkEntry.scala"))
      .toSeq.sorted
  }

  case class Entry(wave: String, sha: String, blockMd5: String,
      deps: SortedMap[String, String], note: String)

  /** Compute a fresh entry for `name` from the current tree.
    * `allBlocks` MUST come from [[blocks]] over the FULL registry name
    * set — block boundaries are the neighbouring registry markers, so a
    * partial name set would smear unrelated queries into the hash.
    */
  def compute(name: String, wave: String, sha: String, note: String,
      allBlocks: Map[String, String], index: Map[String, String]): Entry = {
    val block = allBlocks.getOrElse(name,
      sys.error(s"no SparkEntry marker block found for '$name'"))
    val deps = SortedMap(
      blockDeps(block, index).map(p => p -> md5(read(p))): _*)
    Entry(wave, sha, md5(block), deps, note)
  }

  // --- manifest (de)serialization: flat, diff-friendly JSON ------------

  def render(entries: SortedMap[String, Entry]): String = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val body = entries.map { case (n, e) =>
      val deps = e.deps.map { case (p, h) => s""""${esc(p)}": "$h"""" }
        .mkString("{", ", ", "}")
      s"""  "$n": {"wave": "${e.wave}", "sha": "${e.sha}", """ +
        s""""block_md5": "${e.blockMd5}", "deps": $deps, """ +
        s""""note": "${esc(e.note)}"}"""
    }.mkString(",\n")
    s"{\n$body\n}\n"
  }

  def parse(json: String): SortedMap[String, Entry] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val m = JsonMethods.parse(json).asInstanceOf[JObject]
    SortedMap(m.obj.map { case (name, v) =>
      val o = v.asInstanceOf[JObject].obj.toMap
      def str(k: String) = o(k).asInstanceOf[JString].s
      val deps = SortedMap(o("deps").asInstanceOf[JObject].obj
        .map { case (p, h) => p -> h.asInstanceOf[JString].s }: _*)
      name -> Entry(str("wave"), str("sha"), str("block_md5"), deps,
        str("note"))
    }: _*)
  }

  def load(): SortedMap[String, Entry] =
    if (new File(ManifestPath).exists()) parse(read(ManifestPath))
    else SortedMap.empty

  private def headSha(): String = {
    val p = new ProcessBuilder("git", "rev-parse", "HEAD").start()
    val sha = scala.io.Source.fromInputStream(p.getInputStream).mkString.trim
    p.waitFor()
    if (sha.matches("[0-9a-f]{40}")) sha else "unknown"
  }

  /** `runMain graft.tools.GateProvenance init` — full (re)generation:
    * every wave-listed name hashed from the current tree, preserving
    * existing sha/note for names whose hashes are unchanged.
    * `runMain graft.tools.GateProvenance refresh <name>... [--note t]` —
    * recompute just those names (new sha, new hashes, given note).
    */
  def main(args: Array[String]): Unit = {
    val source = read("src/main/scala/graft/SparkEntry.scala")
    val index = objectIndex()
    val sha = headSha()
    val waves = waveLists()
    val nameToWave = waves.flatMap { case (w, ns) => ns.map(_ -> w) }
    val allBlocks = blocks(source, graft.SparkEntry.queries.keySet)
    val existing = load()
    val updated: SortedMap[String, Entry] = args.toList match {
      case "init" :: Nil =>
        SortedMap(nameToWave.toSeq.map { case (n, w) =>
          val fresh = compute(n, w, sha, "", allBlocks, index)
          n -> (existing.get(n) match {
            // unchanged code keeps its recorded sha + note (older gate)
            case Some(old) if old.blockMd5 == fresh.blockMd5 &&
              old.deps == fresh.deps => old.copy(wave = w)
            case _ => fresh
          })
        }: _*)
      case "refresh" :: rest if rest.nonEmpty =>
        val (noteParts, names) = rest.span(_ != "--note") match {
          case (ns, "--note" :: t) => (t, ns)
          case (ns, _) => (Nil, ns)
        }
        val note = noteParts.mkString(" ")
        val bad = names.filterNot(nameToWave.contains)
        require(bad.isEmpty, s"not wave-listed: $bad")
        existing ++ names.map { n =>
          n -> compute(n, nameToWave(n), sha, note, allBlocks, index)
        }
      case other =>
        sys.error(s"usage: GateProvenance init | refresh <name>... " +
          s"[--note text]  (got: $other)")
    }
    Files.write(Paths.get(ManifestPath), render(updated).getBytes("UTF-8"))
    println(s"wrote ${updated.size} entries to $ManifestPath at $sha")
  }
}
