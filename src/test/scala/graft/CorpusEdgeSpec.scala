package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case corpora through the full index CLI: empty documents,
  * punctuation-only documents, repeated words, and numeric junk must
  * produce exactly the reference's semantics (all 26 letter files, empty
  * where no words, df-ordered rows).
  */
class CorpusEdgeSpec extends AnyFunSuite with SparkTestBase {

  test("degenerate documents index correctly") {
    val base = Files.createTempDirectory("graft-edge").toString
    val docs = Seq(
      "d1.txt" -> "apple apple APPLE banana",
      "d2.txt" -> "!!! ??? ... 123 456",   // no letters at all
      "d3.txt" -> "",                       // empty file
      "d4.txt" -> "a1pple z9z")             // digits stripped inside tokens
    docs.foreach { case (name, text) =>
      Files.writeString(Paths.get(base, name), text)
    }
    Files.writeString(
      Paths.get(base, "manifest.txt"),
      s"${docs.size}\n" + docs.map(_._1).mkString("\n"))
    val out = Files.createTempDirectory("graft-edge-out").toString
    IndexJob.run(spark, s"$base/manifest.txt", base, out)

    def read(l: Char): String =
      new String(Files.readAllBytes(Paths.get(out, s"$l.txt")), "UTF-8").trim
    // apple appears in docs 1 and 4 (a1pple -> apple); zz only in doc 4
    assert(read('a') == "apple:[1 4]")
    assert(read('b') == "banana:[1]")
    assert(read('z') == "zz:[4]")
    // every other letter file exists and is empty
    ('a' to 'z').filterNot("abz".contains(_)).foreach { l =>
      assert(read(l).isEmpty, s"$l.txt should be empty")
    }
  }
}
