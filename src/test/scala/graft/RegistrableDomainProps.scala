package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.RegistrableDomain
import graft.queries.WebCuration

/** Property-based checks (ScalaCheck) of the PSL fold — pure-JVM, no
  * Spark jobs per sample. The oracle is [[pslRef]], an independent
  * direct transcription of the PSL algorithm (collect ALL matching
  * rules, exception prevails, else most labels, registrable = suffix
  * + one label) — structured nothing like the production fold's
  * right-to-left capped candidate walk, so agreement pins the
  * semantics, not the implementation.
  */
object RegistrableDomainProps extends Properties("psl") {

  private val rules = WebCuration.PslRules
  private val table = RegistrableDomain.compile(rules)

  /** Reference PSL algorithm, straight from the spec. */
  private def pslRef(host: String): String = {
    val labels = host.split('.').toList
    def tails(l: List[String]): List[List[String]] =
      if (l.isEmpty) Nil else l :: tails(l.tail)
    // rule match per PSL: the rule's labels equal the host's trailing
    // labels; '*' matches exactly one label
    def matches(rule: List[String], tail: List[String]): Boolean =
      rule.length == tail.length &&
        rule.zip(tail).forall { case (r, t) => r == "*" || r == t }
    val parsed = rules.map { r =>
      if (r.startsWith("!")) ("exc", r.drop(1).split('.').toList)
      else if (r.startsWith("*.")) ("wild", "*" :: r.drop(2).split('.').toList)
      else ("lit", r.split('.').toList)
    }
    val hits = for {
      (kind, rl) <- parsed
      t <- tails(labels)
      if matches(rl, t)
    } yield (kind, rl)
    val exc = hits.collectFirst { case ("exc", rl) => rl }
    val suffixLen = exc match {
      // exception rule: the public suffix is the rule MINUS its
      // leading label
      case Some(rl) => rl.length - 1
      case None if hits.nonEmpty => hits.map(_._2.length).max
      case None => 1 // unknown TLD: pre-PSL 1-label-suffix heuristic
    }
    // registrable = suffix + one label; a bare suffix folds to itself
    val keep = math.min(labels.length, suffixLen + 1)
    labels.takeRight(keep).mkString(".")
  }

  // labels drawn from suffix parts (so multi-label rules actually
  // fire) plus arbitrary filler
  private val genLabel: Gen[String] = Gen.frequency(
    3 -> Gen.oneOf("com", "org", "uk", "co", "jp", "ck", "www", "io",
      "github", "au", "k12", "ak", "us", "ne", "nz"),
    2 -> Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString)))

  private val genHost: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, genLabel).map(_.mkString(".")))

  property("fold == the PSL reference algorithm on random hosts") =
    forAll(genHost) { h => RegistrableDomain.fold(table, h) == pslRef(h) }

  property("the registrable domain is always a suffix of the host") =
    forAll(genHost) { h =>
      val d = RegistrableDomain.fold(table, h)
      h == d || h.endsWith("." + d)
    }

  property("idempotence: folding a registrable domain is a no-op") =
    forAll(genHost) { h =>
      val d = RegistrableDomain.fold(table, h)
      RegistrableDomain.fold(table, d) == d
    }

  // real-crawl normalization: case and the FQDN trailing dot must not
  // change the verdict (a case-sensitive fold would silently miss the
  // PSL on 'Example.CO.UK' and fall back to last-two-labels)
  private val genMixedCase: Gen[String] = genHost.flatMap { h =>
    Gen.listOfN(h.length, Gen.oneOf(true, false)).map { flips =>
      h.zip(flips).map { case (c, f) => if (f) c.toUpper else c }.mkString
    }
  }

  property("case-insensitive: fold(mixed-case h) == fold(h)") =
    forAll(genMixedCase) { h =>
      RegistrableDomain.fold(table, h) ==
        RegistrableDomain.fold(table, h.toLowerCase)
    }

  property("FQDN trailing dot is stripped: fold(h + '.') == fold(h)") =
    forAll(genHost) { h =>
      RegistrableDomain.fold(table, h + ".") ==
        RegistrableDomain.fold(table, h)
    }
}
