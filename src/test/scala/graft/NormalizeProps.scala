package graft

import java.text.Normalizer

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.NormalizeText

/** Property-based checks of the NFC normalization kernel — pure JVM,
  * no Spark jobs per sample. Generators bias toward the hard cases:
  * combining marks (decomposed sequences), precomposed Latin-1
  * letters, and plain ASCII (the fast path).
  */
object NormalizeProps extends Properties("normalize") {

  private val combining: Gen[Char] =
    Gen.oneOf('̀', '́', '̈', '̧') // grave/acute/diaeresis/cedilla
  private val precomposed: Gen[Char] =
    Gen.oneOf('é', 'è', 'ï', 'ç', 'ü')
  private val genChar: Gen[Char] =
    Gen.frequency(6 -> Gen.alphaNumChar, 1 -> combining,
      1 -> precomposed, 1 -> Gen.const(' '))
  private val genText: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, genChar).map(_.mkString))

  private def nfc(s: String): String =
    NormalizeText.normalize(UTF8String.fromString(s), Normalizer.Form.NFC)
      .toString

  property("equals java.text.Normalizer NFC") = forAll(genText) { s =>
    nfc(s) == Normalizer.normalize(s, Normalizer.Form.NFC)
  }

  property("idempotent") = forAll(genText) { s =>
    val once = nfc(s)
    nfc(once) == once
  }

  property("output is NFC-normal") = forAll(genText) { s =>
    Normalizer.isNormalized(nfc(s), Normalizer.Form.NFC)
  }

  property("already-normal input returns the INPUT object (no copy)") =
    forAll(Gen.alphaNumStr) { s =>
      val u = UTF8String.fromString(s)
      NormalizeText.normalize(u, Normalizer.Form.NFC) eq u
    }

  property("canonical equivalence collapses to one representation") =
    forAll(genText) { s =>
      // the dedup guarantee: NFD(s) and s normalize to the same bytes
      nfc(Normalizer.normalize(s, Normalizer.Form.NFD)) == nfc(s)
    }
}
