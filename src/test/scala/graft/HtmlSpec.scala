package graft

import org.apache.spark.sql.functions._

import graft.queries.Html

/** Semantic pins for the HTML extraction family (the DuckDB oracle
  * owns value-level correctness; these pin what a hash compare
  * can't): the synthesized page's structure on a known doc, exact
  * text recovery on EVERY page, entity-decode ordering (the cascade
  * bug), link accounting conservation, and the boilerplate
  * classification's provable stability on this page inventory.
  */
class HtmlSpec extends SparkSpec {

  private def run(name: String, dir: String = sf001) =
    SparkEntry.queries(name)(spark, dir)

  private lazy val nDocs =
    spark.read.parquet(s"$sf001/documents.parquet").count()

  test("synthesized page: structure, links, and visible text for doc 0") {
    val row = Html.withHtml(spark, sf001)
      .filter(col("doc_id") === 0)
      .select(col("html"), Html.visibleText(col("html")).as("vis"),
        col("text"), col("domain"))
      .collect()(0)
    val html = row.getString(0)
    val words = row.getString(2).split(" ")
    assert(row.getString(3) === "hub.co.uk") // WebCurationSpec's pin
    val lines = html.split("\n")
    assert(lines.length === 7)
    assert(lines(0) === "<html><head><title>Doc 0</title></head><body>")
    assert(lines(1).contains("<a href=\"https://hub.com/\">home</a>"))
    assert(lines(1).contains("<a href=\"https://hub.co.uk/\">self</a>"))
    assert(lines(2) === s"<h1>${words.take(3).mkString(" ")}</h1>")
    assert(lines(3).startsWith(s"<p>&quot;${words(3)}&quot;&#39;s &amp; "))
    // doc 0: tgt = 7 -> site-(7%7=0), 7%5!=0 -> .com
    assert(lines(4).contains("<a href=\"https://site-0.com/p/7\">more</a>"))
    assert(lines(6) === "</body></html>")
    // extraction inverts synthesis exactly
    val n = words.length
    val mid = 4 + (n - 4) / 2
    val expected = s"Doc 0 home self ${words.take(3).mkString(" ")} " +
      s""""${words(3)}"'s & ${words.slice(4, mid).mkString(" ")} """ +
      s"${words.slice(mid, n).mkString(" ")} more about end"
    assert(row.getString(1) === expected)
  }

  test("entity decode: &amp; decodes LAST so encoded entities do not cascade") {
    import spark.implicits._
    val got = Seq(
      "<p>&amp;quot;</p>",      // displayed literal "&quot;" — must NOT
                                // cascade into a real double quote
      "<p>&quot;x&quot;&#39;s &amp; y &lt;tag&gt;</p>")
      .toDF("h").select(Html.visibleText(col("h")).as("v"))
      .as[String].collect()
    assert(got(0) === "&quot;")
    assert(got(1) === "\"x\"'s & y <tag>")
  }

  test("DecodeHtmlEntities: full-Unicode numeric decode; every guard leaves input verbatim") {
    import graft.functions.DecodeHtmlEntities.decode
    assert(decode("a&#72;b") === "aHb")
    assert(decode("&#x41;x&#x6c34;") === "Ax水") // hex, incl. CJK
    // the reason the native expression exists: Spark's chr is mod-256,
    // which would turn &#8217; (0x2019) into 0x19 garbage
    assert(decode("&#8217;") === "’")
    assert(decode("&#128512;") ===
      new String(Character.toChars(128512)), "astral plane (surrogate pair)")
    // single-pass, no rescan: a decoded '&' can never seed a cascade
    assert(decode("&amp;quot;") === "&quot;")
    assert(decode("&#38;quot;") === "&quot;")
    assert(decode("&apos;") === "'")
    // verbatim guards — each mirrored bit-for-bit by the DuckDB twin
    assert(decode("&#xZZ;") === "&#xZZ;") // malformed hex
    assert(decode("&#;") === "&#;") // empty digit run
    assert(decode("&#x41") === "&#x41") // missing ';'
    assert(decode("&#55296;") === "&#55296;") // surrogate code point
    assert(decode("&#1114112;") === "&#1114112;") // beyond Unicode
    assert(decode("&#12345678;") === "&#12345678;") // digit-cap (8 > 7)
    assert(decode("&#X41;") === "&#X41;") // uppercase X: oracle-regex parity
    assert(decode("&unknown;") === "&unknown;")
    assert(decode("fish & chips & more") === "fish & chips & more")
    assert(decode("") === "")
  }

  test("visibleText drops script/style CONTENT and comments — not just their tags") {
    import spark.implicits._
    val page = "<p>A</p>\n<script>\nif (a < b) { x(\"&#88;\"); }\n</script>\n" +
      "<style>p>q{r:1}</style>\n<!-- hidden <b>no</b> -->\n<p>B &#x41;</p>"
    val got = Seq(page).toDF("h")
      .select(Html.visibleText(col("h")).as("v")).as[String].collect()(0)
    // script body (with its '<' and its entity), style body (with its
    // '>' selector), and the comment's markup must ALL vanish; the
    // real paragraph's hex entity must decode
    assert(got === "A B A")
  }

  test("html_text_extract_hostile: every hostile page round-trips exactly") {
    val rows = run("html_text_extract_hostile").collect()
    assert(rows.map(_.getLong(1)).sum === nDocs)
    rows.foreach { r =>
      assert(r.getLong(2) === r.getLong(1),
        s"source ${r.getString(0)}: hostile extraction must be exact on every page")
    }
  }

  test("crawl_frontier_polite: discount law replayed per domain; robots evidence only for visited") {
    val rows = run("crawl_frontier_polite").collect()
    val robots = run("robots_gate").collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    val frontier = run("crawl_frontier").collect()
      .map(r => (r.getString(0), (r.getBoolean(2), r.getLong(7)))).toMap
    assert(rows.length === frontier.size, "one polite row per frontier row")
    rows.foreach { r =>
      val d = r.getString(0)
      val (visited, budget) = frontier(d)
      val rate = r.getDouble(5)
      assert(r.getLong(4) === budget, s"$d: base budget must match crawl_frontier")
      if (!visited)
        assert(rate === 0.0, s"$d: never crawled -> no robots evidence")
      else
        assert(rate === robots(d), s"$d: robots rate must match robots_gate")
      assert(r.getLong(6) ===
        math.floor(budget * (1.0 - rate) + 0.5).toLong,
        s"$d: polite budget violates the discount law")
      assert(r.getLong(6) <= budget)
    }
    // the discount must actually bite somewhere, and fully-blocked
    // domains must zero out
    assert(rows.exists(r => r.getLong(6) < r.getLong(4)))
    assert(rows.filter(_.getDouble(5) === 1.0)
      .forall(_.getLong(6) === 0L))
  }

  test("html_text_extract: every page round-trips exactly; census conserves docs") {
    val rows = run("html_text_extract").collect()
    assert(rows.map(_.getLong(1)).sum === nDocs)
    rows.foreach { r =>
      assert(r.getLong(2) === r.getLong(1),
        s"source ${r.getString(0)}: extraction must be exact on every page")
    }
  }

  test("html_outlinks: 4 links per page, conserved; hub.com collects nav+footer") {
    val rows = run("html_outlinks").collect()
    assert(rows.map(_.getLong(2)).sum === 4L * nDocs, "4 hrefs per page")
    val toHub = rows.filter(_.getString(1) == "hub.com").map(_.getLong(2)).sum
    assert(toHub >= 2L * nDocs,
      "every page links hub.com at least twice (nav home + footer about)")
    // per-edge distinct-doc count never exceeds its link count
    assert(rows.forall(r => r.getLong(3) <= r.getLong(2)))
  }

  test("host_link_rank: link conservation, the 0.15 floor, hub.com is the top host") {
    val rows = run("host_link_rank").collect()
    assert(rows.map(_.getLong(2)).sum === rows.map(_.getLong(3)).sum,
      "every link has one source and one target")
    assert(rows.map(_.getLong(2)).sum === 4L * nDocs)
    assert(rows.forall(_.getDouble(1) >= 0.15),
      "the damping floor is every node's minimum")
    val top = rows.maxBy(_.getDouble(1))
    assert(top.getString(0) === "hub.com",
      "the hub collects >= half of all links and must rank first")
  }

  test("boilerplate_blocks: exactly {nav,footer}=boiler, {h1,p}=content, counts per page") {
    val rows = run("boilerplate_blocks").collect()
    val cells = rows.map(r => (r.getString(0), r.getBoolean(1))).toSet
    assert(cells === Set(("nav", false), ("footer", false),
      ("h1", true), ("p", true)))
    val byTag = rows.map(r => r.getString(0) -> r).toMap
    assert(byTag("nav").getLong(2) === nDocs)
    assert(byTag("footer").getLong(2) === nDocs)
    assert(byTag("h1").getLong(2) === nDocs)
    assert(byTag("p").getLong(2) === 2L * nDocs)
    // content rows carry anchor text only from the one <p> link;
    // boiler rows are anchor-dominated by construction
    assert(byTag("h1").getLong(4) === 0L)
    assert(byTag("p").getLong(4) === 4L * nDocs, "'more' is 4 chars per page")
    assert(byTag("nav").getLong(4) === 8L * nDocs, "'home'+'self'")
    assert(byTag("footer").getLong(4) === 5L * nDocs, "'about'")
  }

  test("crawl_frontier: explore/exploit seam, blocklist zeroing, budget bounds") {
    val rows = run("crawl_frontier").collect()
    val rank = run("host_link_rank").collect()
    val prof = run("domain_quality_profile").collect()
    // one frontier row per link-graph node; visited == profiled
    assert(rows.length === rank.length)
    assert(rows.count(_.getBoolean(2)) === prof.length,
      "visited rows must be exactly the profiled domains")
    val unvisited = rows.filter(!_.getBoolean(2))
    assert(unvisited.nonEmpty,
      "the fixture must discover domains it never crawled (cross-links)")
    unvisited.foreach { r =>
      assert(r.getLong(3) === 0L)
      assert(r.getDouble(4) === 0.5,
        "never-crawled domains get the Laplace (0+1)/(0+2) prior")
    }
    rows.foreach { r =>
      val budget = r.getLong(7)
      if (r.getBoolean(5)) assert(budget === 0L, "blocked ⇒ zero budget")
      else assert(budget >= 1L && budget <= 8L)
      // priority == floor(rank_nanos * smoothed quality)
      val nanos = math.round(r.getDouble(1) * 1e9)
      val expect = math.floor(nanos.toDouble * (r.getDouble(4))).toLong
      // quality_rate = (nq+1)/(nd+2) is the exact multiplier
      assert(math.abs(r.getLong(6) - expect) <= 1L,
        s"priority drifted from rank x smoothed quality: $r")
    }
    // the frontier is priority-ordered
    val ps = rows.map(_.getLong(6))
    assert(ps.zip(ps.tail).forall { case (a, b) => a >= b })
  }
}
