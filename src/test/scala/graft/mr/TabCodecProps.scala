package graft.mr

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the reference wire contract (SURVEY.md §5 item
  * 2): first-tab split, round-trips, silent-drop rules.
  */
object TabCodecProps extends Properties("TabCodec") {

  private val noTab: Gen[String] =
    Gen.listOf(Gen.asciiPrintableChar.suchThat(_ != '\t')).map(_.mkString)

  property("encode/decode round-trips any key and tab-bearing value") =
    forAll(noTab, Gen.asciiPrintableStr) { (key, value) =>
      TabCodec.decode(TabCodec.encode(key, value)) == Some((key, value))
    }

  property("decode splits at the FIRST tab only") =
    forAll(noTab, Gen.asciiPrintableStr) { (key, value) =>
      TabCodec.decode(key + "\t" + value) == Some((key, value))
    }

  property("lines without a tab are dropped") =
    forAll(noTab) { line => TabCodec.decode(line).isEmpty }

  property("stollPrefix parses any Long rendered as text, ignoring junk suffix") =
    forAll { (n: Long, suffix: String) =>
      // avoid suffix starting with a digit (would extend the number)
      val s = n.toString + suffix.dropWhile(_.isDigit)
      n == Long.MinValue || MapReduceJob.stollPrefix(s) == Some(n)
    }

  property("tokenizeMap output never contains empty words and is lowercase") =
    forAll(Gen.asciiPrintableStr) { line =>
      MapReduceJob.tokenizeMap(line).forall { case (w, v) =>
        w.nonEmpty && w == w.toLowerCase && v == "1"
      }
    }
}
