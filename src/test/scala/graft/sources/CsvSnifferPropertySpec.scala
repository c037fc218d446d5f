package graft.sources

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Randomized sniffer invariants: for ANY well-formed CSV in a
  * candidate dialect — random field counts, random field content
  * including the OTHER separators inside quoted fields — the sniffer
  * must recover the true separator. Raw Gen sampling, fixed seeds. */
class CsvSnifferPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default.withSize(30),
      org.scalacheck.rng.Seed(seed)).get

  private val seps = Seq(';', ',', '\t', '|')

  private def genCsv(sep: Char): Gen[String] = {
    val plain = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    // a quoted field may contain ANY candidate separator — the
    // sniffer must not count those
    val quoted = for {
      a <- plain
      s <- Gen.oneOf(seps)
      b <- plain
    } yield s""""$a$s$b""""
    val field = Gen.frequency(3 -> plain, 1 -> quoted)
    for {
      nCols <- Gen.choose(2, 6)
      nRows <- Gen.choose(1, 8)
      rows <- Gen.listOfN(nRows + 1, Gen.listOfN(nCols, field))
    } yield rows.map(_.mkString(sep.toString)).mkString("\n") + "\n"
  }

  test("sniffer recovers the true separator for random well-formed " +
      "CSVs with adversarial quoted fields") {
    var checked = 0
    for (sep <- seps; rep <- 0 until 12) {
      val csv = sample(genCsv(sep), seed = sep.toLong * 1000 + rep)
      val got = CsvIngest.sniffSep(csv)
      // a file whose quoted fields hide other separators must still
      // sniff to the REAL one... unless a tie is genuinely present
      // (every line containing exactly-equal counts of another
      // candidate outside quotes is impossible by construction here:
      // unquoted fields are alphanumeric)
      assert(got == sep.toString,
        s"sep '$sep' rep $rep sniffed as '$got' for:\n${csv.take(300)}")
      checked += 1
    }
    assert(checked == seps.size * 12)
  }

  test("truncated samples never score the cut final fragment") {
    for (sep <- seps; rep <- 0 until 6) {
      val csv = sample(genCsv(sep), seed = 7000 + sep.toLong * 100 + rep)
      // cut mid-way through the final line to simulate a head sample
      val cut = csv.stripSuffix("\n")
      val truncated = cut.take(cut.length - cut.length / 4)
      val got = CsvIngest.sniffSep(truncated, truncated = true)
      assert(got == sep.toString,
        s"sep '$sep' rep $rep (truncated) sniffed as '$got'")
    }
  }
}
