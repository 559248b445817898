package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.DecodeHtmlEntities.decode

/** Property-based checks (ScalaCheck) of the single-pass HTML entity
  * decoder — pure-JVM, no Spark jobs per sample. The oracle is the
  * CONSTRUCTION: inputs are built segment-by-segment from pieces whose
  * decode is known (literals that cannot form entities, valid entities
  * in every encoding, and each verbatim-guard shape), so the expected
  * output is assembled independently of the decoder under test.
  */
object HtmlDecodeProps extends Properties("htmldecode") {

  // literal alphabet that can never FORM an entity: no '&'
  private val genSafeLiteral: Gen[String] =
    Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n,
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '.', ',', ';', '#',
        'x', '<', '>'))).map(_.mkString))

  // a stray ampersand that can never START an entity: '&' followed by
  // a char that is neither '#' nor the head of a known name
  private val genStrayAmp: Gen[String] =
    Gen.oneOf("& ", "&-", "&z", "&&", "&", "&LT;", "&Quot;")

  // valid Unicode scalar outside the surrogate range, incl. astral
  private val genScalar: Gen[Int] = Gen.frequency(
    6 -> Gen.chooseNum(1, 0xD7FF),
    2 -> Gen.chooseNum(0xE000, 0xFFFF),
    2 -> Gen.chooseNum(0x10000, 0x10FFFF))

  // (input segment, expected decoded segment)
  private val genValidEntity: Gen[(String, String)] = for {
    cp <- genScalar
    hex <- Gen.oneOf(true, false)
    upper <- Gen.oneOf(true, false)
  } yield {
    val body =
      if (!hex) cp.toString
      else "x" + (if (upper) cp.toHexString.toUpperCase else cp.toHexString)
    (s"&#$body;", new String(Character.toChars(cp)))
  }

  private val genNamedEntity: Gen[(String, String)] = Gen.oneOf(
    ("&quot;", "\""), ("&apos;", "'"), ("&lt;", "<"), ("&gt;", ">"),
    ("&amp;", "&"))

  // every verbatim-guard shape: malformed digits, empty run, missing
  // ';', uppercase X (oracle-regex parity), surrogates, beyond-Unicode,
  // past the digit caps, unknown names
  private val genVerbatim: Gen[String] = Gen.oneOf(
    Gen.const("&#xZZ;"), Gen.const("&#;"), Gen.const("&#x;"),
    Gen.const("&#x41"), Gen.const("&#X41;"), Gen.const("&unknown;"),
    Gen.const("&#12345678;"), Gen.const("&#x1234567;"),
    Gen.chooseNum(0xD800, 0xDFFF).map(cp => s"&#$cp;"),
    Gen.chooseNum(0x110000, 9999999).map(cp => s"&#$cp;"))

  private val genSegment: Gen[(String, String)] = Gen.frequency(
    4 -> genSafeLiteral.map(s => (s, s)),
    1 -> genStrayAmp.map(s => (s, s)),
    3 -> genValidEntity,
    1 -> genNamedEntity,
    2 -> genVerbatim.map(s => (s, s)))

  // segments join on '|' — a char that can appear in no entity syntax —
  // so a hazard segment (a bare '&', a cap-guarded "&#x41") can never
  // FORM an entity across a boundary with the next segment's text
  property("decode(concat segments) == concat decoded segments") =
    forAll(Gen.listOf(genSegment)) { segs =>
      decode(segs.map(_._1).mkString("|")) == segs.map(_._2).mkString("|")
    }

  property("entity-free text is a fixed point") =
    forAll(genSafeLiteral)(s => decode(s) == s)

  property("every valid scalar round-trips through both encodings") =
    forAll(genScalar) { cp =>
      val c = new String(Character.toChars(cp))
      decode(s"&#$cp;") == c && decode(s"&#x${cp.toHexString};") == c
    }
}
