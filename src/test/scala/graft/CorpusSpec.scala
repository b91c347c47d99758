package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.generate.Sinks

/** Full-corpus parity: the reference's actual deliverable is the shipped
  * `Datasets/` tree — 4,320 CSVs across 18 hand-arranged family layouts
  * (a1.py:242-243, d1.py:267-271, d3c.py:418-420; the tree itself, not the
  * scripts' flat `output*` dirs, is what a user consumes). These tests pin:
  *
  *  1. the engine's path grammar enumerates EXACTLY the shipped tree
  *     (set equality over all 4,320 relative paths — no extra, no missing);
  *  2. one wholesale `writeFullCorpus` run materializes exactly those files,
  *     with byte-identical header lines, the shipped row counts, and the
  *     shipped empty-cell encoding for masked values.
  *
  * Cell VALUES are statistically — not bitwise — equivalent by design
  * (SURVEY §6.2-3: NumPy MT19937 parity is a non-goal), so content parity
  * is asserted structurally.
  */
class CorpusSpec extends AnyFunSuite {

  private val refRoot = Paths.get("/root/reference/Datasets")

  private def listFiles(root: Path, ext: String): Set[String] = {
    val s = Files.walk(root)
    try s.iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(ext))
      .map(p => root.relativize(p).toString)
      .toSet
    finally s.close()
  }

  private def listCsvs(root: Path): Set[String] = listFiles(root, ".csv")

  test("path grammar enumerates the shipped 4,320-file tree exactly") {
    val shipped = listCsvs(refRoot)
    val manifest = Sinks.corpusManifest(Grid.all())
    assert(manifest.size == manifest.toSet.size, {
      val dups = manifest.groupBy(identity).filter(_._2.size > 1).keys.take(5)
      s"grammar collision: ${dups.mkString(", ")}"
    })
    val mine = manifest.toSet
    val missing = shipped -- mine
    val extra = mine -- shipped
    assert(missing.isEmpty && extra.isEmpty,
      s"missing(${missing.size}): ${missing.take(5).mkString(", ")}\n" +
        s"extra(${extra.size}): ${extra.take(5).mkString(", ")}")
    assert(shipped.size == 4320 && mine.size == 4320)
  }

  test("txt corpus: manifest matches the 1,404 shipped files; structure bytes identical") {
    val shipped = listFiles(refRoot, ".txt")
    val cfgs = Grid.all()
    val manifest = Sinks.txtManifest(cfgs)
    assert(manifest.toSet == shipped && manifest.size == 1404,
      s"manifest ${manifest.size} vs shipped ${shipped.size}; " +
        s"missing=${(shipped -- manifest.toSet).take(3)} extra=${(manifest.toSet -- shipped).take(3)}")
    // every structure file is a pure catalog function — BYTE parity; the
    // D2C statistics values are RNG-dependent, so those pin the line grammar
    var structOk = 0
    for (c <- cfgs; rel <- Sinks.txtPaths(c)) {
      val ref = new String(Files.readAllBytes(refRoot.resolve(rel)), "UTF-8")
      if (rel.endsWith("_statistics.txt")) {
        val mine = Sinks.statisticsTxt(c, Kernel.generate(c).mask)
        val (a, b) = (mine.linesIterator.toVector, ref.linesIterator.toVector)
        assert(a.size == b.size, s"$rel line count ${a.size} vs ${b.size}")
        a.zip(b).foreach { case (m, r) =>
          // same labels/punctuation; only the numeric fields may differ
          assert(m.replaceAll("[0-9.]+", "#") == r.replaceAll("[0-9.]+", "#"),
            s"$rel grammar: '$m' vs '$r'")
        }
      } else {
        assert(Sinks.structureTxt(c) == ref, s"$rel bytes differ")
        structOk += 1
      }
    }
    assert(structOk == 1188)
  }

  test("wholesale corpus write: layout, headers, row counts, NaN encoding") {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val out = Files.createTempDirectory("corpus_full")
    try {
      Sinks.writeFullCorpus(spark, out.toString)
      val written = listCsvs(out)
      val shipped = listCsvs(refRoot)
      val missing = shipped -- written
      val extra = written -- shipped
      assert(missing.isEmpty && extra.isEmpty,
        s"missing(${missing.size}): ${missing.take(5).mkString(", ")}\n" +
          s"extra(${extra.size}): ${extra.take(5).mkString(", ")}")
      // the txt sidecars ride the same sweep
      assert(listFiles(out, ".txt") == listFiles(refRoot, ".txt"))

      // structural diff of EVERY file against its shipped counterpart:
      // byte-identical header line, identical line count (n rows + header),
      // and for D-family missing views the shipped empty-cell encoding
      var maskedCells = 0L
      for (rel <- written) {
        val mine = out.resolve(rel)
        val ref = refRoot.resolve(rel)
        val myLines = Files.readAllLines(mine)
        val refHeader = {
          val r = Files.newBufferedReader(ref)
          try r.readLine() finally r.close()
        }
        assert(myLines.get(0) == refHeader,
          s"$rel header: '${myLines.get(0)}' vs shipped '$refHeader'")
        val refCount = {
          val s = Files.lines(ref)
          try s.count() finally s.close()
        }
        assert(myLines.size().toLong == refCount,
          s"$rel rows: ${myLines.size()} vs shipped $refCount")
        if (rel.endsWith("_missing.csv"))
          maskedCells += myLines.asScala.drop(1).map(l =>
            l.split(",", -1).count(_.isEmpty)).sum
      }
      // the masked views must actually encode missing cells the shipped way
      // (empty string between commas) — a formatter regression to "NaN"
      // text would zero this
      assert(maskedCells > 100000L, s"masked empty cells: $maskedCells")
    } finally {
      scala.reflect.io.Directory(out.toFile).deleteRecursively()
      ()
    }
  }
}
