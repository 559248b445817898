package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.WebCuration

/** Semantic pins for the web-curation gate (the DuckDB oracle owns
  * value-level correctness; these pin what a hash compare can't): the
  * parse chain on a known URL, blocklist accounting, the cap binding
  * on the hot domain, and the two-level top-k's exact equivalence to
  * the naive single-window rank.
  */
class WebCurationSpec extends SparkSpec {

  private def run(name: String, dir: String = sf001) =
    SparkEntry.queries(name)(spark, dir)

  test("parse chain: scheme/subdomain/port/query handled; registrable domain folds the suffix") {
    // doc_id 0: http + www. + hub + .co.uk + :8080 + ?ref=r0 — every
    // synthesized URL feature at once
    val u = WebCuration.withDomain(spark, sf001)
      .filter(col("doc_id") === 0).collect()(0)
    assert(u.getAs[String]("url") === "http://www.hub.co.uk:8080/p/0?ref=r0")
    assert(u.getAs[String]("host") === "www.hub.co.uk", "port must be stripped")
    assert(u.getAs[String]("domain") === "hub.co.uk",
      "www. must fold into the multi-label registrable domain")
    // a plain two-label host (doc_id 9: no subdomain, non-hub site,
    // plain .com — the first doc_id hitting none of the special tlds)
    val v = WebCuration.withDomain(spark, sf001)
      .filter(col("doc_id") === 9).collect()(0)
    assert(v.getAs[String]("host").endsWith("-0.com"))
    assert(v.getAs[String]("domain") === v.getAs[String]("host"),
      "bare site.tld is its own registrable domain")
    // doc_id 3 (%17 == 3): a host under the wildcard-ruled `*.ck`
    // suffix — the CORPUS path must fold it per the full PSL grammar
    // (shop-1.ck is the public suffix, site + suffix registers whole),
    // not the last-two-labels fallback a literal-only table would take
    val w = WebCuration.withDomain(spark, sf001)
      .filter(col("doc_id") === 3).collect()(0)
    assert(w.getAs[String]("host").endsWith(".shop-1.ck"))
    assert(w.getAs[String]("domain") === w.getAs[String]("host"),
      "site.shop-1.ck = wildcard suffix + one label: registers whole")
    // doc_id 24 (%19 == 5, %4 == 0): hub site under the !www.ck
    // exception — everything under www.ck folds to www.ck itself
    val x = WebCuration.withDomain(spark, sf001)
      .filter(col("doc_id") === 24).collect()(0)
    assert(x.getAs[String]("host").endsWith("hub.www.ck"))
    assert(x.getAs[String]("domain") === "www.ck",
      "!www.ck exception: the exception string is the registrable unit")
  }

  test("RegistrableDomain: longest-suffix PSL fold on hosts the fixture never produces") {
    import graft.functions.RegistrableDomain
    val t = RegistrableDomain.compile(WebCuration.PublicSuffixes)
    def f(h: String) = RegistrableDomain.fold(t, h)
    assert(f("www.hub.com") === "hub.com")
    assert(f("cdn.src2-0.co.uk") === "src2-0.co.uk")
    assert(f("a.b.example.com.au") === "example.com.au",
      "multi-label country suffix must fold under any subdomain depth")
    assert(f("x.co.jp") === "x.co.jp")
    assert(f("user.github.io") === "user.github.io",
      "private-registry suffix: the user site IS the registrable unit")
    assert(f("deep.sub.user.github.io") === "user.github.io")
    assert(f("district.k12.ak.us") === "district.k12.ak.us",
      "3-label suffix beats its own 1-label tail (longest match)")
    assert(f("plain.k12.example.com") === "example.com",
      "a k12 label under an unrelated parent is just a subdomain")
    assert(f("github.io") === "github.io", "bare public suffix folds to itself")
    assert(f("a.b.unknown-tld") === "b.unknown-tld",
      "unknown TLD falls back to the last-two-labels heuristic")
    assert(f("localhost") === "localhost")
    // the FULL grammar (wildcard + exception — the real .ck entries)
    val tw = RegistrableDomain.compile(WebCuration.PslRules)
    def g(h: String) = RegistrableDomain.fold(tw, h)
    assert(g("shop-3.ck") === "shop-3.ck",
      "*.ck: any single label under ck is a BARE public suffix")
    assert(g("a1.shop-3.ck") === "a1.shop-3.ck",
      "*.ck: suffix + one label is the registrable unit")
    assert(g("deep.a1.shop-3.ck") === "a1.shop-3.ck")
    assert(g("www.ck") === "www.ck",
      "!www.ck prevails over *.ck: www.ck is registrable")
    assert(g("x2.www.ck") === "www.ck",
      "under the exception, the exception string is the registrable unit")
    assert(g("www.hub.com") === "hub.com",
      "literal entries behave identically under the full table")
  }

  test("psl_domain_fold: the broadcast-join path agrees with the codegen'd scalar on every host") {
    val rows = run("psl_domain_fold").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(4),
      s"join/scalar disagree on host ${r.getString(0)}"))
    // every fixture host ends in a known suffix — no fallback rows
    assert(rows.forall(_.getString(2) !== "none"))
    // and doc counts conserve against the host census
    val n = WebCuration.withDomain(spark, sf001).count()
    assert(rows.map(_.getLong(3)).sum === n)
  }

  test("robots_gate: longest-prefix semantics replayed independently per URL; counts conserve") {
    val rows = run("robots_gate").collect()
    val urls = WebCuration.withDomain(spark, sf001)
      .select(col("doc_id"), col("domain")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.map(_.getLong(1)).sum === urls.length.toLong,
      "every URL must receive a verdict (the '/' rule matches all)")
    // independent JVM replay of the rule synthesis + longest-prefix rule
    def rulesOf(d: String): Seq[(String, String)] = {
      val b = Seq.newBuilder[(String, String)]
      b += (("/", "allow"))
      if (d.length % 3 == 0) b += (("/p/1", "disallow"))
      if (d.length % 3 == 0 && d.length % 2 == 0) b += (("/p/12", "allow"))
      if (d.length % 5 == 2) b += (("/p/", "disallow"))
      b.result()
    }
    val expect = urls.groupBy(_._2).map { case (d, ds) =>
      val rs = rulesOf(d)
      val verdicts = ds.map { case (id, _) =>
        val path = s"/p/$id"
        rs.filter(r => path.startsWith(r._1))
          .maxBy(r => r._1.length * 2 + (if (r._2 == "allow") 1 else 0))._2
      }
      d -> (verdicts.count(_ == "allow").toLong,
        verdicts.count(_ == "disallow").toLong)
    }
    rows.foreach { r =>
      val (a, bN) = expect(r.getString(0))
      assert(r.getLong(2) === a && r.getLong(3) === bN,
        s"robots verdicts diverge for ${r.getString(0)}")
    }
    // the fixture must actually exercise all three rule shapes: some
    // domain fully blocked, some with the nested /p/12 re-allow firing
    assert(rows.exists(r => r.getLong(3) === r.getLong(1) && r.getLong(1) > 0),
      "no fully-blocked domain — the /p/ rule never fired")
    val nested = urls.filter { case (id, d) =>
      d.length % 3 == 0 && d.length % 2 == 0 && s"$id".startsWith("12")
    }
    assert(nested.nonEmpty, "no URL exercises the nested /p/12 re-allow")
  }

  test("url_host_parse census: doc counts conserve; http/query flags match the url") {
    val rows = run("url_host_parse").collect()
    val total = spark.read.parquet(s"$sf001/documents.parquet").count()
    assert(rows.map(_.getLong(2)).sum === total, "census must cover every doc")
    assert(rows.forall(r => r.getLong(3) <= r.getLong(2) &&
      r.getLong(4) <= r.getLong(2)))
    // every host folds into a domain that suffixes it
    assert(rows.forall(r => r.getString(0).endsWith(r.getString(1))))
  }

  test("blocklist gate: blocked count equals the census of blocklisted domains; hot hub.org drops") {
    val docs = WebCuration.withDomain(spark, sf001)
    val expectBlocked = docs
      .filter(col("domain").isin(WebCuration.Blocklist: _*)).count()
    assert(expectBlocked > 0, "fixture must actually block something")
    val rows = run("domain_blocklist_gate").collect()
    assert(rows.map(_.getLong(3)).sum === expectBlocked)
    assert(rows.map(_.getLong(1)).sum ===
      rows.map(_.getLong(2)).sum + expectBlocked, "in = kept + blocked")
  }

  test("canonUrl folds exactly the superficial differences — and nothing semantic") {
    import spark.implicits._
    val got = Seq(
      // every fold at once: case, www., default port, slash, tracking
      "HTTPS://WWW.Hub.COM:443/p/9/?utm_source=m",
      // the same URL already canonical: identity
      "https://hub.com/p/9",
      // :8080 is NOT a default port — must survive (and ':80$' must
      // not eat the tail of ':8080')
      "http://hub.com:8080/p/1",
      // a second www label is semantic: only ONE leading www. folds
      "https://www.www.hub.com/p/2",
      // a non-tracking query survives; a tracking-only one does not
      "https://hub.com/p/3?page=2",
      "https://hub.com/p/3?ref=r1",
      // scheme-mismatched default port is semantic: :443 on http stays
      "http://hub.com:443/p/4")
      .toDF("url").select(WebCuration.canonUrl(col("url")).as("c"))
      .as[String].collect()
    assert(got(0) === "https://hub.com/p/9")
    assert(got(1) === "https://hub.com/p/9")
    assert(got(2) === "http://hub.com:8080/p/1")
    assert(got(3) === "https://www.hub.com/p/2")
    assert(got(4) === "https://hub.com/p/3?page=2")
    assert(got(5) === "https://hub.com/p/3")
    assert(got(6) === "http://hub.com:443/p/4")
  }

  test("canonUrl is idempotent and order-stable over 300 generated URLs (one Spark pass)") {
    import spark.implicits._
    // seeded generator spanning the whole input grammar: mixed-case
    // schemes, 1-3 host labels (optionally www-prefixed — but never
    // www.www, where the documented fold-ONE rule is legitimately
    // non-idempotent), default/semantic/absent ports, 0-2 path
    // segments with optional trailing slash, tracking / semantic /
    // mixed-case-key queries
    val rnd = new scala.util.Random(97)
    def mixCase(s: String) =
      s.map(c => if (rnd.nextBoolean()) c.toUpper else c)
    val urls = (1 to 300).map { i =>
      val scheme = mixCase(Seq("http", "https", "ftp")(rnd.nextInt(3)))
      val labels = (1 to 1 + rnd.nextInt(2))
        .map(_ => Seq("alpha", "beta", "gx7", "hub")(rnd.nextInt(4)))
      val host0 = (if (rnd.nextBoolean()) Seq("www") else Nil) ++
        labels :+ Seq("com", "org", "co", "uk")(rnd.nextInt(4))
      val host = mixCase(host0.mkString("."))
      val port = Seq("", ":80", ":443", ":8080", ":8443")(rnd.nextInt(5))
      val segs = (1 to rnd.nextInt(3)).map(_ => s"p$i")
      val path = (if (segs.isEmpty) "" else segs.mkString("/", "/", "")) +
        (if (rnd.nextBoolean()) "/" else "")
      val query = Seq("", "?ref=r1", "?utm_campaign=x", "?page=2",
        "?q=a&page=2")(rnd.nextInt(5))
      s"$scheme://$host$port$path$query"
    }
    val rows = urls.toDF("url")
      .select(col("url"), WebCuration.canonUrl(col("url")).as("c1"))
      .select(col("url"), col("c1"), WebCuration.canonUrl(col("c1")).as("c2"))
      .as[(String, String, String)].collect()
    rows.foreach { case (u, c1, c2) =>
      assert(c1 === c2, s"canon not idempotent on $u: $c1 -> $c2")
      // folds only lowered/stripped material: canonical is never longer
      assert(c1.length <= u.length, s"canon grew $u -> $c1")
      val hostPart = c1.drop(c1.indexOf("://") + 3).takeWhile(c => c != '/' && c != '?')
      assert(!hostPart.startsWith("www."), s"www survived in $c1")
      assert(hostPart == hostPart.toLowerCase, s"case survived in $c1")
      // default ports stripped iff they match the scheme; others kept
      val scheme = c1.takeWhile(_ != ':')
      if (scheme == "http") assert(!hostPart.endsWith(":80"), c1)
      if (scheme == "https") assert(!hostPart.endsWith(":443"), c1)
      if (u.contains(":8080")) assert(hostPart.endsWith(":8080"), c1)
      // tracking-only queries die; semantic ones survive verbatim
      if (u.endsWith("?page=2")) assert(c1.endsWith("?page=2"), c1)
      if (u.endsWith("?q=a&page=2")) assert(c1.endsWith("?q=a&page=2"), c1)
      if (u.toLowerCase.endsWith("?ref=r1") ||
          u.toLowerCase.endsWith("?utm_campaign=x"))
        assert(!c1.contains("?"), s"tracking query survived in $c1")
    }
  }

  test("url_canonicalize census: mirrors pair exactly, nothing else merges") {
    val rows = run("url_canonicalize").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val total = spark.read.parquet(s"$sf001/documents.parquet").count()
    val mirrored = spark.read.parquet(s"$sf001/documents.parquet")
      .filter(col("doc_id") % 3 === 0).count()
    // exactly two group sizes: unmirrored singletons and (url, mirror)
    // pairs — a canonicalization defect would split a pair (extra
    // singletons) or merge strangers (a size > 2 appears)
    assert(rows.keySet === Set(1L, 2L), s"unexpected group sizes: $rows")
    assert(rows(2L) === ((mirrored, 2 * mirrored)))
    assert(rows(1L) === ((total - mirrored, total - mirrored)))
  }

  test("domain_quality_profile: counts conserve and blocked flags match the blocklist") {
    val rows = run("domain_quality_profile").collect()
    val total = spark.read.parquet(s"$sf001/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum === total)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "quality docs exceed docs")
      assert(math.abs(r.getDouble(4) -
        r.getLong(3).toDouble / r.getLong(1)) < 1e-6)
      assert(r.getBoolean(6) ===
        WebCuration.Blocklist.contains(r.getString(0)))
    }
    assert(rows.exists(_.getBoolean(6)) && rows.exists(!_.getBoolean(6)))
    // full-PSL grammar reaches the profile: wildcard-suffix domains
    // appear FOLDED (site.shop-N.ck, never the bare suffix shop-N.ck a
    // literal-only table would emit), and the !www.ck exception
    // collapses all hosts under it into the single www.ck domain
    val domains = rows.map(_.getString(0)).toSet
    assert(domains.exists(_.matches("^[a-z0-9-]+\\.shop-[01]\\.ck$")),
      s"no wildcard-folded *.ck domain in the profile: $domains")
    assert(!domains.exists(_.matches("^shop-[01]\\.ck$")),
      "a bare wildcard public suffix leaked through as a domain")
    assert(domains.contains("www.ck"),
      "the !www.ck exception domain is missing from the profile")
    // and the wildcard-suffix blocklist entry actually gates
    assert(rows.exists(r => r.getString(0) === "hub.shop-0.ck" &&
      r.getBoolean(6)), "hub.shop-0.ck must be present and blocked")
  }

  test("domain_caps: the hot domain is capped at 4; two-level == naive single-window rank") {
    val rows = run("domain_caps").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // the hot hub accumulates far more than the cap and gets clipped
    val (hubIn, hubKept, _) = rows("hub.com")
    assert(hubIn > 20, s"hub.com should be hot, saw $hubIn docs")
    assert(hubKept === 4L, "cap must bind on the hot domain")
    assert(rows.values.forall { case (in, kept, _) =>
      kept === math.min(in, 4L) })
    // exact equivalence to the naive rank (no salt buckets): the
    // two-level pass may never change WHICH docs survive
    val naive = WebCuration.withDomain(spark, sf001)
      .withColumn("rnk", row_number().over(Window.partitionBy("domain")
        .orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("rnk") <= 4)
      .groupBy("domain")
      .agg(count(lit(1)).as("docs_kept"), sum("n_chars").as("chars_kept"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { case (d, (_, kept, chars)) =>
      assert(naive(d) === ((kept, chars)),
        s"$d: two-level kept set diverges from the naive rank")
    }
    // the cap keys on the FULL-grammar fold: wildcard-suffix sites are
    // capped as site.shop-N.ck units, and the www.ck exception domain
    // (pooling every host under it) is subject to the same cap
    assert(rows.keys.exists(_.matches("^[a-z0-9-]+\\.shop-[01]\\.ck$")),
      "no wildcard-folded *.ck domain reached the cap stage")
    val (wIn, wKept, _) = rows("www.ck")
    assert(wKept === math.min(wIn, 4L), "cap must bind on www.ck too")
  }
}
