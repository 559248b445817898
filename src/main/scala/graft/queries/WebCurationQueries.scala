package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Domain/URL-level WEB-CURATION gate — the standard web-corpus stage
  * (C4, RefinedWeb, Gopher/MassiveWeb) between raw crawl and text
  * cleaning: extract each document's host from its URL, reduce the
  * host to its REGISTRABLE domain (public-suffix aware), drop
  * documents from blocklisted domains, and cap how many documents any
  * single domain may contribute (hot hubs otherwise dominate the
  * corpus).
  *
  * The driver's `documents` table carries no URL column, so the suite
  * derives one DETERMINISTICALLY from (doc_id, source) — the same
  * expression verbatim in Spark and in the DuckDB oracle — with the
  * variation a real crawl shows: both schemes, www/cdn/m subdomains,
  * multi-label public suffixes (`co.uk`), explicit ports, query
  * strings, and one deliberately HOT hub domain holding ~25% of the
  * corpus (the skew case the capping machinery exists for).
  *
  * SCALE SHAPES (each asserted by PlanShapeSpec):
  *  - host/domain extraction is a narrow per-row projection fused
  *    into the scan — nothing shuffles a URL string except the
  *    dimension-bounded host census itself;
  *  - the blocklist gate is a BROADCAST LEFT ANTI join against a
  *    dimension-sized blocklist (the reference's GlobalKTable
  *    leftJoin-as-anti-join shape — Moderation.scala — at corpus
  *    scale; a 100 TB run broadcasts the blocklist to every executor
  *    and never shuffles the corpus);
  *  - per-domain caps run the TWO-LEVEL top-k (TextQueries
  *    token_burstiness machinery applied per key): rank inside
  *    (domain, salt-bucket) first — 16-way parallel even when one
  *    domain holds a quarter of the corpus — then rank the <= 16·K
  *    bucket winners per domain. No single-partition window anywhere.
  *
  * The registrable-domain step runs against a real public-suffix
  * DIMENSION with the FULL PSL grammar ([[WebCuration.PslRules]]: a
  * representative Mozilla-PSL literal subset incl. `com.au`, `co.jp`,
  * `github.io`, `k12.ak.us`, PLUS the wildcard `*.ck` and exception
  * `!www.ck` rules): the corpus path folds it through the codegen'd
  * [[graft.functions.RegistrableDomain]] scalar (the rule table ships
  * inside the plan, one copy per executor — broadcast semantics with
  * zero join in the corpus path), and `psl_domain_fold` proves the
  * broadcast-JOIN formulation of the same fold equal on the
  * distinct-host census. The full ~9k-entry PSL is a data-file swap;
  * every shape stays fixed.
  */
object WebCuration {

  /** Deterministic synthetic URL from (doc_id, source) — Spark side.
    * ~25% of docs land on the hot `hub.*` site (doc_id % 4 == 0).
    */
  private[graft] def urlCol: Column = {
    def d(m: Int) = pmod(col("doc_id"), lit(m))
    val scheme = when(d(7) === 0, lit("http")).otherwise(lit("https"))
    val sub = when(d(5) === 0, lit("www."))
      .when(d(5) === 1, lit("cdn."))
      .when(d(5) === 2, lit("m."))
      .otherwise(lit(""))
    val site = when(d(4) === 0, lit("hub"))
      .otherwise(concat(col("source"), lit("-"), d(3).cast("string")))
    // the suffix mix exercises every PSL rule KIND the corpus fold
    // handles: multi-label literal (co.uk), wildcard-ruled (`*.ck`
    // makes shop-N.ck a public suffix, so hub.shop-N.ck is the
    // registrable domain — a literal-only table would mis-fold it to
    // shop-N.ck), and the exception (`!www.ck` registers whole)
    val tld = when(d(11) === 0, lit("co.uk"))
      .when(d(17) === 3, concat(lit("shop-"), d(2).cast("string"), lit(".ck")))
      .when(d(19) === 5, lit("www.ck"))
      .when(d(3) === 1, lit("org"))
      .otherwise(lit("com"))
    val port = when(d(13) === 0, lit(":8080")).otherwise(lit(""))
    val qs = when(d(6) === 0, concat(lit("?ref=r"), d(2).cast("string")))
      .otherwise(lit(""))
    concat(scheme, lit("://"), sub, site, lit("."), tld, port,
      lit("/p/"), col("doc_id").cast("string"), qs)
  }

  /** The same URL, DuckDB-side (column names doc_id/source in scope). */
  private[graft] val duckUrl: String =
    """(CASE WHEN doc_id % 7 = 0 THEN 'http' ELSE 'https' END) || '://' ||
      |(CASE WHEN doc_id % 5 = 0 THEN 'www.' WHEN doc_id % 5 = 1 THEN 'cdn.'
      |      WHEN doc_id % 5 = 2 THEN 'm.' ELSE '' END) ||
      |(CASE WHEN doc_id % 4 = 0 THEN 'hub'
      |      ELSE source || '-' || CAST(doc_id % 3 AS VARCHAR) END) || '.' ||
      |(CASE WHEN doc_id % 11 = 0 THEN 'co.uk'
      |      WHEN doc_id % 17 = 3 THEN 'shop-' || CAST(doc_id % 2 AS VARCHAR) || '.ck'
      |      WHEN doc_id % 19 = 5 THEN 'www.ck'
      |      WHEN doc_id % 3 = 1 THEN 'org' ELSE 'com' END) ||
      |(CASE WHEN doc_id % 13 = 0 THEN ':8080' ELSE '' END) ||
      |'/p/' || CAST(doc_id AS VARCHAR) ||
      |(CASE WHEN doc_id % 6 = 0 THEN '?ref=r' || CAST(doc_id % 2 AS VARCHAR)
      |      ELSE '' END)""".stripMargin.replace('\n', ' ')

  /** Hostname from a URL — Spark's codegen'd built-in (strips scheme,
    * userinfo, port, path, query).
    */
  private[graft] def hostCol(url: Column): Column = parse_url(url, lit("HOST"))

  /** DuckDB equivalent of [[hostCol]] for the URL shapes above. */
  private[graft] def duckHost(url: String): String =
    s"regexp_extract($url, '^[a-z]+://([^/:?#]+)', 1)"

  /** The LITERAL public-suffix entries — a representative Mozilla-PSL
    * subset (ICANN TLDs, multi-label country suffixes,
    * private-registry suffixes like `github.io`/`k12.ak.us`; the full
    * ~9k-entry PSL is a data-file swap, same shapes). The corpus path
    * folds the FULL grammar ([[PslRules]] = these + wildcard +
    * exception rules) through the plan-carried codegen'd
    * [[graft.functions.RegistrableDomain]] scalar — zero joins;
    * `psl_domain_fold` runs the broadcast-JOIN formulation of the
    * same fold on the distinct-host census; the DuckDB oracle gets
    * the rule table as a VALUES list ([[duckPslKindValues]]).
    */
  private[graft] val PublicSuffixes: Seq[String] = Seq(
    "com", "org", "net", "io", "de", "fr", "jp", "au", "uk", "nz",
    "co.uk", "org.uk", "ac.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "co.nz", "github.io", "k12.ak.us")

  /** The FULL-grammar rule set: the literal dimension above plus the
    * PSL's other two rule kinds — a wildcard (`*.ck`: any single
    * label under the parent is a public suffix) and its exception
    * (`!www.ck`: registrable despite the wildcard) — the real
    * Mozilla-PSL entries for .ck. This IS the corpus-path table
    * ([[domainCol]] feeds it to the codegen'd scalar fold), so a real
    * host under a wildcard-ruled TLD folds per the PSL algorithm in
    * every gate downstream (`domain_caps`, `domain_blocklist_gate`,
    * reputation, the funnel); `psl_wildcard_fold` additionally
    * oracle-checks the grammar against an independent rule-kind-by-
    * rule-kind SQL implementation.
    */
  private[graft] val PslRules: Seq[String] =
    PublicSuffixes ++ Seq("*.ck", "!www.ck")

  /** (rule, effective-suffix, kind) triples of [[PslRules]] as a
    * DuckDB VALUES list — `suf` is the matchable suffix text (wildcard
    * parent for `*.x`, the rule body for `!x`), `kind` drives the
    * PSL algorithm's precedence (exception prevails, then longest
    * EFFECTIVE suffix — a wildcard's effective depth is its parent's
    * labels + 1 for the matched label).
    */
  private[graft] def duckPslKindValues: String =
    PslRules.map {
      case r if r.startsWith("*.") => s"('$r', '${r.drop(2)}', 'wild')"
      case r if r.startsWith("!")  => s"('$r', '${r.drop(1)}', 'exc')"
      case r                       => s"('$r', '$r', 'exact')"
    }.mkString("(VALUES ", ", ", ")")

  /** Registrable domain under the FULL PSL grammar ([[PslRules]]):
    * exception rules prevail, then the longest effective suffix among
    * literal/wildcard matches, plus one label (bare suffix → itself;
    * unknown TLD → last-two-labels heuristic) — the codegen'd scalar
    * fold, so extraction stays fused into the scan projection with no
    * join in the corpus path.
    */
  private[graft] def domainCol(host: Column): Column =
    graft.functions.RegistrableDomain(host, PslRules)

  /** DuckDB equivalent of [[domainCol]] (expects a host EXPRESSION —
    * evaluate it in a prior CTE so it is a plain column name here):
    * the PSL algorithm as a correlated scalar subquery over the
    * rule-kind VALUES dimension — exception rules first, then longest
    * effective suffix (wildcard depth = parent + 1), with the same
    * bare-suffix and unknown-TLD branches as the fold. The rule-text
    * tiebreak is for determinism only: same-depth non-exception
    * matches produce the same domain.
    */
  private[graft] def duckDomain(host: String): String = {
    val nlHost = s"len(string_split($host, '.'))"
    val ns = "(CASE WHEN p.kind = 'wild' THEN len(string_split(p.suf, '.')) + 1" +
      " ELSE len(string_split(p.suf, '.')) END)"
    s"""COALESCE(
       | (SELECT CASE
       |    WHEN p.kind = 'exc' THEN array_to_string(string_split($host, '.')[$nlHost - $ns + 1 :], '.')
       |    WHEN $nlHost = $ns THEN $host
       |    ELSE array_to_string(string_split($host, '.')[$nlHost - $ns :], '.') END
       |  FROM $duckPslKindValues p(rule, suf, kind)
       |  WHERE CASE WHEN p.kind = 'wild'
       |    THEN $host LIKE ('%.' || p.suf) AND $nlHost >= len(string_split(p.suf, '.')) + 1
       |    ELSE $host = p.suf OR $host LIKE ('%.' || p.suf) END
       |  ORDER BY (CASE WHEN p.kind = 'exc' THEN 1 ELSE 0 END) DESC, $ns DESC, p.rule
       |  LIMIT 1),
       | CASE WHEN $nlHost <= 2 THEN $host
       |  ELSE array_to_string(string_split($host, '.')[$nlHost - 1 :], '.') END)""".stripMargin
      .replace('\n', ' ')
  }

  /** The blocklisted registrable domains — the dimension the gate
    * broadcasts. Includes the hot hub's .org variant, one domain per
    * suffix shape, and one entry matching nothing (a blocklist is
    * curated against the open web, not against this corpus).
    */
  private[graft] val Blocklist: Seq[String] =
    Seq("hub.org", "src1-0.com", "src4-2.com", "src7-1.org",
      "src2-0.co.uk", "hub.shop-0.ck", "nothere-9.com")

  private[graft] def duckBlocklist: String =
    Blocklist.map(d => s"'$d'").mkString("(", ", ", ")")

  /** URL canonicalization — the normalize-before-dedup step every web
    * pipeline runs (lowercase scheme+host, strip a default port for
    * the scheme, fold one leading `www.`, drop the trailing slash,
    * drop tracking-only query strings) — Spark side. Each step is a
    * plain string expression so the whole canon stays inside
    * whole-stage codegen; the DuckDB twin below uses the same
    * regexes verbatim.
    */
  private[graft] def canonUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val hostport = lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1))
    val path = regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    val query = regexp_extract(url, "\\?(.*)$", 1)
    val noPort = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val noWww = regexp_replace(noPort, "^www\\.", "")
    val noSlash = regexp_replace(path, "/$", "")
    val keptQ = when(query === "" ||
        query.rlike("^(ref|utm_[a-z0-9_]+)=[^&]*$"), lit(""))
      .otherwise(concat(lit("?"), query))
    concat(scheme, lit("://"), noWww, noSlash, keptQ)
  }

  /** DuckDB twin of [[canonUrl]] (expects a plain `url` column name). */
  private[graft] def duckCanon(url: String): String =
    s"""(lower(regexp_extract($url, '^([A-Za-z]+)://', 1)) || '://' ||
       | regexp_replace(
       |   CASE WHEN lower(regexp_extract($url, '^([A-Za-z]+)://', 1)) = 'http'
       |     THEN regexp_replace(lower(regexp_extract($url, '^[A-Za-z]+://([^/?#]+)', 1)), ':80$$', '')
       |   WHEN lower(regexp_extract($url, '^([A-Za-z]+)://', 1)) = 'https'
       |     THEN regexp_replace(lower(regexp_extract($url, '^[A-Za-z]+://([^/?#]+)', 1)), ':443$$', '')
       |   ELSE lower(regexp_extract($url, '^[A-Za-z]+://([^/?#]+)', 1)) END,
       |   '^www\\.', '') ||
       | regexp_replace(regexp_extract($url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1), '/$$', '') ||
       | CASE WHEN regexp_extract($url, '\\?(.*)$$', 1) = ''
       |     OR regexp_matches(regexp_extract($url, '\\?(.*)$$', 1), '^(ref|utm_[a-z0-9_]+)=[^&]*$$')
       |   THEN '' ELSE '?' || regexp_extract($url, '\\?(.*)$$', 1) END)""".stripMargin
      .replace('\n', ' ')

  /** Superficially-different MIRROR of a document's URL (docs with
    * doc_id % 3 == 0 get one): uppercased scheme+host, a `www.`
    * prefix when the host lacks one, the scheme's default port when
    * the original carried none, a trailing slash, and a tracking
    * query — every difference [[canonUrl]] must fold. Canonical
    * equality of (url, mirror) pairs is what url_canonicalize's dup
    * census pins.
    */
  private[graft] def mirrorUrl: Column = {
    def d(m: Int) = pmod(col("doc_id"), lit(m))
    val scheme = when(d(7) === 0, lit("HTTP")).otherwise(lit("HTTPS"))
    val hostM = when(col("host").startsWith("www."), upper(col("host")))
      .otherwise(concat(lit("WWW."), upper(col("host"))))
    val portM = when(d(13) === 0, lit(":8080"))
      .otherwise(when(d(7) === 0, lit(":80")).otherwise(lit(":443")))
    concat(scheme, lit("://"), hostM, portM,
      lit("/p/"), col("doc_id").cast("string"), lit("/?utm_source=m"))
  }

  /** DuckDB twin of [[mirrorUrl]] (expects doc_id and host columns). */
  private[graft] val duckMirror: String =
    """((CASE WHEN doc_id % 7 = 0 THEN 'HTTP' ELSE 'HTTPS' END) || '://' ||
      | (CASE WHEN host LIKE 'www.%' THEN upper(host)
      |       ELSE 'WWW.' || upper(host) END) ||
      | (CASE WHEN doc_id % 13 = 0 THEN ':8080'
      |       WHEN doc_id % 7 = 0 THEN ':80' ELSE ':443' END) ||
      | '/p/' || CAST(doc_id AS VARCHAR) || '/?utm_source=m')""".stripMargin
      .replace('\n', ' ')

  /** Per-domain robots-verdict census (domain, n_urls, n_allowed,
    * n_blocked) — the robots_gate machinery, shared with
    * crawl_frontier_polite. See robots_gate's header for the rule
    * synthesis and the RFC 9309 longest-prefix semantics.
    */
  private[graft] def robotsCensus(s: org.apache.spark.sql.SparkSession,
                                  dir: String): org.apache.spark.sql.DataFrame = {
    val u = withDomain(s, dir)
    val up = u.select(col("doc_id"), col("domain"),
      parse_url(col("url"), lit("PATH")).as("path"))
    val dl = length(col("domain"))
    val rules = u.select("domain").distinct()
      .select(col("domain"), explode(array(
        struct(lit("/").as("prefix"), lit("allow").as("kind")),
        struct(lit("/p/1").as("prefix"), lit("disallow").as("kind")),
        struct(lit("/p/12").as("prefix"), lit("allow").as("kind")),
        struct(lit("/p/").as("prefix"), lit("disallow").as("kind"))))
        .as("r"))
      .select(col("domain"), col("r.prefix").as("prefix"),
        col("r.kind").as("kind"))
      .filter(
        col("prefix") === "/" ||
        (col("prefix") === "/p/1" && dl % 3 === 0) ||
        (col("prefix") === "/p/12" && dl % 3 === 0 && dl % 2 === 0) ||
        (col("prefix") === "/p/" && dl % 5 === 2))
    up.join(broadcast(rules), Seq("domain"))
      .filter(col("path").startsWith(col("prefix")))
      .groupBy("doc_id", "domain")
      .agg(expr("max_by(kind, length(prefix) * 2 + " +
        "CASE WHEN kind = 'allow' THEN 1 ELSE 0 END)").as("verdict"))
      .groupBy("domain")
      .agg(count(lit(1)).cast("long").as("n_urls"),
        sum(when(col("verdict") === "allow", 1).otherwise(0))
          .cast("long").as("n_allowed"),
        sum(when(col("verdict") === "disallow", 1).otherwise(0))
          .cast("long").as("n_blocked"))
  }

  /** DuckDB twin of [[robotsCensus]] — CTE chain ending in `rb`
    * (domain, n_urls, n_allowed, n_blocked); names chosen not to
    * collide with the HTML/frontier chains so the two compose in one
    * WITH (crawl_frontier_polite).
    */
  private[graft] val duckRobots: String = {
    val dl = "length(domain)"
    s"""rw AS (SELECT doc_id, source, $duckUrl AS url FROM documents),
       |rh AS (SELECT doc_id, url, ${duckHost("url")} AS host FROM rw),
       |ru AS (SELECT doc_id, url, ${duckDomain("host")} AS domain FROM rh),
       |rup AS (SELECT doc_id, domain,
       |    regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path FROM ru),
       |rdoms AS (SELECT DISTINCT domain FROM ru),
       |rrr AS (SELECT domain, '/' AS prefix, 'allow' AS kind FROM rdoms
       |  UNION ALL SELECT domain, '/p/1', 'disallow' FROM rdoms WHERE $dl % 3 = 0
       |  UNION ALL SELECT domain, '/p/12', 'allow' FROM rdoms
       |    WHERE $dl % 3 = 0 AND $dl % 2 = 0
       |  UNION ALL SELECT domain, '/p/', 'disallow' FROM rdoms WHERE $dl % 5 = 2),
       |rm AS (SELECT rup.doc_id, rup.domain,
       |    arg_max(rrr.kind,
       |      length(rrr.prefix) * 2 + CASE WHEN rrr.kind = 'allow' THEN 1 ELSE 0 END) AS verdict
       |  FROM rup JOIN rrr ON rup.domain = rrr.domain
       |    AND starts_with(rup.path, rrr.prefix)
       |  GROUP BY 1, 2),
       |rb AS (SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_urls,
       |    CAST(SUM(CASE WHEN verdict = 'allow' THEN 1 ELSE 0 END) AS BIGINT) AS n_allowed,
       |    CAST(SUM(CASE WHEN verdict = 'disallow' THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked
       |  FROM rm GROUP BY domain)""".stripMargin
  }

  /** docs frame with url/host/domain attached — the shared scan-stage
    * projection every web-curation query starts from.
    */
  private[graft] def withDomain(s: org.apache.spark.sql.SparkSession,
                                dir: String): org.apache.spark.sql.DataFrame = {
    val host = hostCol(col("url"))
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"), urlCol.as("url"))
      .withColumn("host", host)
      .withColumn("domain", domainCol(col("host")))
  }

  /** Shared DuckDB CTE producing the same frame (named `u`). */
  private[graft] val duckWithDomain: String =
    s"""w AS (SELECT doc_id, source, n_chars, $duckUrl AS url FROM documents),
       |h AS (SELECT doc_id, source, n_chars, url,
       |    ${duckHost("url")} AS host FROM w),
       |u AS (SELECT doc_id, source, n_chars, url, host,
       |    ${duckDomain("host")} AS domain FROM h)""".stripMargin

  /** Shared DuckDB CTE chain ending in `fd` (doc_id, lang, n_tokens,
    * q, domain) — the DuckDB twin of [[SelectionQueries
    * .curationProfiles]] + the Gopher-quality conjunction, used by
    * domain_quality_profile and crawl_frontier.
    */
  private[graft] val duckProfiles: String =
    s"""d AS (SELECT doc_id, lang, source, string_split(text, ' ') AS a,
       |    length(text) AS nch FROM documents),
       |f AS (SELECT doc_id, lang, source, len(a) AS n_tokens,
       |    (nch - (len(a) - 1)) * 1.0 / len(a) AS mwl,
       |    len(list_filter(a, t -> t = 'the')) + len(list_filter(a, t -> t = 'a')) AS stop_hits,
       |    list_max(list_transform(list_distinct(a), w -> len(list_filter(a, t -> t = w)))) * 1.0 / len(a) AS topf
       |  FROM d),
       |fh AS (SELECT *, ${duckHost(s"($duckUrl)")} AS host FROM f),
       |fd AS (SELECT doc_id, lang, source, n_tokens,
       |    (n_tokens BETWEEN 20 AND 90) AND mwl >= 4.0
       |      AND stop_hits >= 2 AND topf <= 0.125 AS q,
       |    ${duckDomain("host")} AS domain FROM fh)""".stripMargin
}

object WebCurationQueries {
  import WebCuration._

  def all: Seq[Q] = Seq(

    // URL PARSING census — pins the host/registrable-domain extraction
    // chain cross-engine before anything gates on it: per host, the
    // registrable domain it folds into, how many docs, how many over
    // plain http, how many carrying a query string. Output is
    // dimension-bounded (the host space is a fixed formula over
    // subdomain x site x suffix, NOT corpus-sized), so the census
    // aggregate is the only exchange.
    Q("url_host_parse",
      s"""WITH $duckWithDomain
         |SELECT host, domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN url LIKE 'http://%' THEN 1 ELSE 0 END) AS BIGINT) AS n_http,
         |  CAST(SUM(CASE WHEN contains(url, '?') THEN 1 ELSE 0 END) AS BIGINT) AS n_query
         |FROM u GROUP BY host, domain ORDER BY host""".stripMargin) { (s, dir) =>
      withDomain(s, dir)
        .groupBy("host", "domain")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(when(parse_url(col("url"), lit("PROTOCOL")) === "http", 1)
            .otherwise(0)).cast("long").as("n_http"),
          sum(when(parse_url(col("url"), lit("QUERY")).isNotNull, 1)
            .otherwise(0)).cast("long").as("n_query"))
        .orderBy("host")
    },

    // DOMAIN BLOCKLIST GATE — the J1 anti-join shape at corpus scale:
    // survivors = documents LEFT ANTI (broadcast) blocklist on the
    // registrable domain; reported as the per-source in/kept/blocked
    // census a curation run is audited by. The corpus never shuffles:
    // the anti-join is broadcast, and the two source censuses are
    // 10-row dimension aggregates.
    Q("domain_blocklist_gate",
      s"""WITH $duckWithDomain,
         |k AS (SELECT * FROM u WHERE domain NOT IN $duckBlocklist),
         |i AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS docs_in FROM u GROUP BY 1),
         |g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS docs_kept,
         |    CAST(SUM(n_chars) AS BIGINT) AS chars_kept FROM k GROUP BY 1)
         |SELECT i.source, docs_in,
         |  CAST(COALESCE(docs_kept, 0) AS BIGINT) AS docs_kept,
         |  CAST(docs_in - COALESCE(docs_kept, 0) AS BIGINT) AS docs_blocked,
         |  CAST(COALESCE(chars_kept, 0) AS BIGINT) AS chars_kept
         |FROM i LEFT JOIN g USING (source) ORDER BY source""".stripMargin) { (s, dir) =>
      import s.implicits._
      val docs = withDomain(s, dir)
      val bl = Blocklist.toDF("domain")
      val kept = docs.join(broadcast(bl), Seq("domain"), "left_anti")
      val inC = docs.groupBy("source")
        .agg(count(lit(1)).cast("long").as("docs_in"))
      val keptC = kept.groupBy("source")
        .agg(count(lit(1)).cast("long").as("docs_kept"),
          sum("n_chars").cast("long").as("chars_kept"))
      inC.join(broadcast(keptC), Seq("source"), "left")
        .select(col("source"), col("docs_in"),
          coalesce(col("docs_kept"), lit(0L)).as("docs_kept"),
          (col("docs_in") - coalesce(col("docs_kept"), lit(0L)))
            .cast("long").as("docs_blocked"),
          coalesce(col("chars_kept"), lit(0L)).as("chars_kept"))
        .orderBy("source")
    },

    // PER-DOMAIN DOCUMENT CAPS — RefinedWeb/C4's hot-host guard: keep
    // at most K=4 documents per registrable domain, best-first
    // (n_chars DESC as the quality proxy, doc_id tiebreak). The rank
    // runs as a TWO-LEVEL top-k per key: level 1 ranks inside
    // (domain, salt-bucket-of-16) — so the hot hub domain's quarter
    // of the corpus is ranked 16-way parallel — and only the <= 16·K
    // bucket winners reach the level-2 per-domain rank. top-K of a
    // domain == top-K of the union of its per-bucket top-Ks, so the
    // salt never changes the answer (bucket ids stay oracle-invisible
    // and use Spark's native hash).
    Q("domain_caps",
      s"""WITH $duckWithDomain,
         |r AS (SELECT domain, n_chars, row_number() OVER (
         |    PARTITION BY domain ORDER BY n_chars DESC, doc_id) AS rnk FROM u)
         |SELECT domain, CAST(COUNT(*) AS BIGINT) AS docs_in,
         |  CAST(SUM(CASE WHEN rnk <= 4 THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
         |  CAST(SUM(CASE WHEN rnk <= 4 THEN n_chars ELSE 0 END) AS BIGINT) AS chars_kept
         |FROM r GROUP BY domain ORDER BY domain""".stripMargin) { (s, dir) =>
      val docs = withDomain(s, dir)
      val byQuality = Seq(col("n_chars").desc, col("doc_id"))
      val kept = docs
        .withColumn("bkt", pmod(hash(col("doc_id")), lit(16)))
        .withColumn("brnk", row_number().over(
          Window.partitionBy("domain", "bkt").orderBy(byQuality: _*)))
        .filter(col("brnk") <= 4)
        .withColumn("rnk", row_number().over(
          Window.partitionBy("domain").orderBy(byQuality: _*)))
        .filter(col("rnk") <= 4)
      val inC = docs.groupBy("domain")
        .agg(count(lit(1)).cast("long").as("docs_in"))
      val keptC = kept.groupBy("domain")
        .agg(count(lit(1)).cast("long").as("docs_kept"),
          sum("n_chars").cast("long").as("chars_kept"))
      // every domain keeps >= 1 doc (K >= 1), so the join is inner;
      // both sides are dimension-bounded domain censuses
      inC.join(broadcast(keptC), Seq("domain")).orderBy("domain")
    },

    // URL CANONICALIZATION + URL-LEVEL DEDUP CENSUS — the normalize
    // step that runs BEFORE content dedup in a web pipeline: fold
    // case, default ports, a leading www., trailing slashes, and
    // tracking-only query strings, then group by the canonical form.
    // Every third document gets a MIRROR URL differing in all five
    // superficial ways at once ([[WebCuration.mirrorUrl]]), so the
    // expected canonical-group census is exactly {size 1: docs
    // without a mirror, size 2: (url, mirror) pairs} — any
    // canonicalization defect splits a pair (or, worse, merges
    // strangers) and flips the hash. SCALE: canon is a per-row
    // codegen'd string fold; the only corpus-sized exchange is the
    // canonical-key aggregate — the same key a production URL dedup
    // shuffles on; the census-of-sizes rollup is bounded by the
    // largest group (2 here).
    Q("url_canonicalize", {
      val canon = WebCuration.duckCanon("url")
      s"""WITH ${WebCuration.duckWithDomain},
         |m AS (SELECT doc_id, ${WebCuration.duckMirror} AS url FROM u
         |  WHERE doc_id % 3 = 0),
         |alls AS (SELECT doc_id, url FROM u UNION ALL SELECT doc_id, url FROM m),
         |c AS (SELECT $canon AS curl FROM alls),
         |g AS (SELECT curl, CAST(COUNT(*) AS BIGINT) AS sz FROM c GROUP BY 1)
         |SELECT sz AS group_size, CAST(COUNT(*) AS BIGINT) AS n_groups,
         |  CAST(sz * COUNT(*) AS BIGINT) AS n_urls
         |FROM g GROUP BY sz ORDER BY sz""".stripMargin
    }) { (s, dir) =>
      val u = withDomain(s, dir)
      val alls = u.select(col("doc_id"), col("url"))
        .unionByName(u.filter(pmod(col("doc_id"), lit(3)) === 0)
          .select(col("doc_id"), mirrorUrl.as("url")))
      val g = alls.select(canonUrl(col("url")).as("curl"))
        .groupBy("curl").agg(count(lit(1)).cast("long").as("sz"))
      g.groupBy(col("sz").as("group_size"))
        .agg(count(lit(1)).cast("long").as("n_groups"))
        .select(col("group_size"), col("n_groups"),
          (col("group_size") * col("n_groups")).cast("long").as("n_urls"))
        .orderBy("group_size")
    },

    // PER-DOMAIN QUALITY PROFILE — the reputation table a curator
    // ships next to the blocklist: per registrable domain, document
    // count, Gopher-quality pass rate inputs (the funnel's exact
    // stage-2 conjunction, minus the dedup flag), token volume, mean
    // document length, language diversity, and whether the domain is
    // currently blocklisted. At 100 TB this is ONE hash aggregate on
    // the domain key over scan-fused per-doc stats ([[SelectionQueries
    // .curationProfiles]] reused verbatim — the text is parsed once,
    // the aggregate sees integers), and the output is bounded by the
    // domain population. The census that DECIDES the next round's
    // blocklist and caps.
    Q("domain_quality_profile", {
      s"""WITH ${WebCuration.duckProfiles}
         |SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
         |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         |  round(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 6) AS mean_tokens,
         |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         |  domain IN ${WebCuration.duckBlocklist} AS blocked
         |FROM fd GROUP BY domain ORDER BY domain""".stripMargin
    }) { (s, dir) =>
      val profiles = SelectionQueries.curationProfiles(
        Tables.parallelize(Tables.load(s, dir, "documents")
          .select("doc_id", "lang", "source", "text")))
      val q = SelectionQueries.gopherQuality
      profiles
        .groupBy("domain")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(when(q, 1).otherwise(0)).cast("long").as("n_quality"),
          sum(col("n_tokens")).cast("long").as("n_tokens"),
          countDistinct(col("lang")).cast("long").as("n_langs"))
        .select(col("domain"), col("n_docs"), col("n_quality"),
          col("n_tokens"),
          round(col("n_tokens").cast("double") / col("n_docs"), 6)
            .as("mean_tokens"),
          col("n_langs"),
          col("domain").isin(Blocklist: _*).as("blocked"))
        .orderBy("domain")
    },

    // PSL FOLD AS A BROADCAST JOIN — the join formulation of the
    // registrable-domain rule, run where a join is the right shape:
    // the DISTINCT-HOST census (formula-bounded), not the corpus.
    // Each host explodes its trailing-label candidates (bounded by
    // the dimension's max label depth), broadcast-joins the
    // public-suffix dim, keeps the LONGEST hit per host, and applies
    // the same bare-suffix / unknown-TLD branches as the scalar fold;
    // `agrees` pins the join path equal to the codegen'd scalar path
    // ([[graft.functions.RegistrableDomain]]) on every host. At
    // 100 TB this census join materializes the host -> domain mapping
    // once; the corpus path stays the zero-join scalar.
    Q("psl_domain_fold", {
      val nlH = "len(string_split(h.host, '.'))"
      s"""WITH $duckWithDomain,
         |hosts AS (SELECT host, max(domain) AS scalar_domain,
         |    CAST(COUNT(*) AS BIGINT) AS n_docs FROM u GROUP BY host),
         |psl AS (SELECT * FROM $duckPslKindValues p(rule, suf, kind)),
         |cand AS (SELECT h.host, p.rule, p.kind,
         |    CASE WHEN p.kind = 'wild' THEN len(string_split(p.suf, '.')) + 1
         |      ELSE len(string_split(p.suf, '.')) END AS k
         |  FROM hosts h JOIN psl p ON
         |    CASE WHEN p.kind = 'wild'
         |      THEN h.host LIKE ('%.' || p.suf)
         |        AND $nlH >= len(string_split(p.suf, '.')) + 1
         |      ELSE h.host = p.suf OR h.host LIKE ('%.' || p.suf) END),
         |best AS (SELECT host, rule, kind, k, row_number() OVER (
         |    PARTITION BY host ORDER BY
         |      CASE WHEN kind = 'exc' THEN 1 ELSE 0 END DESC, k DESC, rule) AS rnk
         |  FROM cand),
         |j AS (SELECT h.host, h.n_docs, h.scalar_domain,
         |    COALESCE(b.rule, 'none') AS matched_rule,
         |    CASE WHEN b.rule IS NULL THEN
         |        (CASE WHEN $nlH <= 2 THEN h.host
         |         ELSE array_to_string(string_split(h.host, '.')[$nlH - 1 :], '.') END)
         |      WHEN b.kind = 'exc'
         |        THEN array_to_string(string_split(h.host, '.')[$nlH - b.k + 1 :], '.')
         |      WHEN b.k = $nlH THEN h.host
         |      ELSE array_to_string(string_split(h.host, '.')[$nlH - b.k :], '.') END AS domain
         |  FROM hosts h LEFT JOIN (SELECT * FROM best WHERE rnk = 1) b USING (host))
         |SELECT host, domain, matched_rule, n_docs,
         |  domain = scalar_domain AS agrees
         |FROM j ORDER BY host""".stripMargin
    }) { (s, dir) =>
      import s.implicits._
      // effective depth of each rule: a wildcard's matched suffix is
      // its parent's labels + the matched label; the sigils carry the
      // right dot counts, so one formula covers all three kinds
      val maxL = PslRules.map(_.count(_ == '.') + 1).max
      val hosts = withDomain(s, dir)
        .groupBy("host")
        .agg(max(col("domain")).as("scalar_domain"),
          count(lit(1)).cast("long").as("n_docs"))
      val labels = split(col("host"), "\\.")
      val cand = hosts
        .select(col("host"), labels.as("ls"), size(labels).as("nl"))
        .select(col("host"), col("ls"), col("nl"),
          explode(sequence(lit(1), least(lit(maxL), col("nl")))).as("k"))
        .select(col("host"), col("nl"), col("k"),
          concat_ws(".", slice(col("ls"), -col("k"), col("k"))).as("cand"),
          // the candidate minus its leading label — what a wildcard
          // rule's parent must equal (label-aligned by construction)
          when(col("k") >= 2, concat_ws(".",
            slice(col("ls"), -(col("k") - lit(1)), col("k") - lit(1))))
            .as("candparent"))
      val rules = PslRules.map {
        case r if r.startsWith("*.") => (r, r.drop(2), "wild")
        case r if r.startsWith("!")  => (r, r.drop(1), "exc")
        case r                       => (r, r, "exact")
      }.toDF("rule", "suf", "kind")
        // a literal/exception rule matches the candidate itself; a
        // wildcard rule matches the candidate's PARENT — fold both
        // into one (text, class) equi-join key so the rule probe
        // stays a broadcast HASH join (an OR-of-conjunctions
        // condition would force a nested-loop join)
        .withColumn("cls",
          when(col("kind") === "wild", lit("wild")).otherwise(lit("lit")))
      val probes = cand.select(col("host"), col("k"),
          explode(array(
            struct(col("cand").as("key"), lit("lit").as("cls")),
            struct(col("candparent").as("key"), lit("wild").as("cls"))))
            .as("p"))
        .select(col("host"), col("k"),
          col("p.key").as("key"), col("p.cls").as("pcls"))
        .filter(col("key").isNotNull)
      val best = probes
        .join(broadcast(rules),
          col("key") === col("suf") && col("pcls") === col("cls"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("host").orderBy(
            when(col("kind") === "exc", 1).otherwise(0).desc,
            col("k").desc, col("rule"))))
        .filter(col("rnk") === 1)
        .select(col("host"), col("rule"), col("kind"), col("k"))
      val relabels = split(col("host"), "\\.")
      hosts.join(broadcast(best), Seq("host"), "left")
        .select(col("host"), col("n_docs"), col("scalar_domain"),
          coalesce(col("rule"), lit("none")).as("matched_rule"),
          when(col("rule").isNull,
            when(size(relabels) <= 2, col("host"))
              .otherwise(concat_ws(".", slice(relabels, -2, 2))))
            // an exception rule's match IS the registrable domain
            .when(col("kind") === "exc",
              concat_ws(".", slice(relabels, -col("k"), col("k"))))
            .when(col("k") === size(relabels), col("host"))
            .otherwise(concat_ws(".",
              slice(relabels, -(col("k") + lit(1)), col("k") + lit(1))))
            .as("domain"))
        .select(col("host"), col("domain"), col("matched_rule"),
          col("n_docs"), (col("domain") === col("scalar_domain")).as("agrees"))
        .orderBy("host")
    },

    // PSL WILDCARD + EXCEPTION FOLD — the two rule kinds the literal
    // dimension can't express, on hosts synthesized to exercise them:
    // `*.ck` makes ANY single label under .ck a public suffix (so
    // `shop-N.ck` is a BARE suffix folding to itself, and
    // `aM.shop-N.ck` — suffix + one label — registers whole), while `!www.ck`
    // prevails over the wildcard (so `www.ck` and anything under it
    // registers as `www.ck`) — the real Mozilla-PSL entries for .ck.
    // The Spark side is the same codegen'd scalar fold the corpus
    // path uses (one table, full grammar); the DuckDB twin implements
    // the PSL ALGORITHM independently — exception rules prevail, then
    // the longest effective suffix among literal/wildcard matches —
    // so the oracle checks the semantics, not the implementation.
    // SCALE: the fold runs on the synthesized DISTINCT-host census
    // (formula-bounded); corpus-shaped inputs never appear.
    Q("psl_wildcard_fold", {
      val kinds = PslRules.map {
        case r if r.startsWith("*.") => s"('${r.drop(2)}', 'wild')"
        case r if r.startsWith("!") => s"('${r.drop(1)}', 'exc')"
        case r => s"('$r', 'exact')"
      }.mkString("(VALUES ", ", ", ")")
      s"""WITH hs0 AS (SELECT DISTINCT
         |    CASE doc_id % 5
         |      WHEN 0 THEN 'www.ck'
         |      WHEN 1 THEN 'shop-' || CAST(doc_id % 7 AS VARCHAR) || '.ck'
         |      WHEN 2 THEN 'a' || CAST(doc_id % 3 AS VARCHAR) || '.shop-'
         |        || CAST(doc_id % 7 AS VARCHAR) || '.ck'
         |      WHEN 3 THEN 'x' || CAST(doc_id % 4 AS VARCHAR) || '.www.ck'
         |      ELSE 'cdn.site-' || CAST(doc_id % 6 AS VARCHAR) || '.com'
         |    END AS host FROM documents),
         |rules AS (SELECT * FROM $kinds r(suf, kind)),
         |cand AS (SELECT h.host, r.kind,
         |    CASE WHEN r.kind = 'wild'
         |      THEN len(string_split(r.suf, '.')) + 1
         |      ELSE len(string_split(r.suf, '.')) END AS ns
         |  FROM hs0 h JOIN rules r ON
         |    CASE WHEN r.kind = 'wild'
         |      THEN h.host LIKE ('%.' || r.suf)
         |        AND len(string_split(h.host, '.')) >= len(string_split(r.suf, '.')) + 1
         |      ELSE h.host = r.suf OR h.host LIKE ('%.' || r.suf) END),
         |best AS (SELECT host, kind, ns, row_number() OVER (
         |    PARTITION BY host ORDER BY
         |      CASE WHEN kind = 'exc' THEN 1 ELSE 0 END DESC, ns DESC, kind) AS rn
         |  FROM cand),
         |j AS (SELECT h.host, b.kind, b.ns,
         |    len(string_split(h.host, '.')) AS nl FROM hs0 h
         |  LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (host))
         |SELECT host,
         |  CASE WHEN kind IS NULL THEN
         |      (CASE WHEN nl <= 2 THEN host
         |       ELSE array_to_string(string_split(host, '.')[nl - 1 :], '.') END)
         |    WHEN kind = 'exc'
         |      THEN array_to_string(string_split(host, '.')[nl - ns + 1 :], '.')
         |    WHEN nl = ns THEN host
         |    ELSE array_to_string(string_split(host, '.')[nl - ns :], '.') END AS domain,
         |  COALESCE(kind, 'fallback') AS rule_kind
         |FROM j ORDER BY host""".stripMargin
    }) { (s, dir) =>
      val d = (m: Int) => pmod(col("doc_id"), lit(m))
      val host = when(d(5) === 0, lit("www.ck"))
        .when(d(5) === 1, concat(lit("shop-"), d(7).cast("string"), lit(".ck")))
        .when(d(5) === 2, concat(lit("a"), d(3).cast("string"), lit(".shop-"),
          d(7).cast("string"), lit(".ck")))
        .when(d(5) === 3, concat(lit("x"), d(4).cast("string"), lit(".www.ck")))
        .otherwise(concat(lit("cdn.site-"), d(6).cast("string"), lit(".com")))
      val hs = Tables.load(s, dir, "documents")
        .select(host.as("host")).distinct()
      // rule_kind re-derived from the fold result — an independent
      // classification both engines compute from their own fold
      val folded = hs.select(col("host"),
        graft.functions.RegistrableDomain(col("host"), PslRules).as("domain"))
      folded.select(col("host"), col("domain"),
          // label-aligned exception test: endsWith("www.ck") would
          // mislabel a host like `xwww.ck` (a wildcard bare suffix,
          // NOT under the exception rule) as 'exc'
          when(col("host") === "www.ck" ||
            col("host").endsWith(".www.ck") || col("domain") === "www.ck",
            lit("exc"))
            .when(col("domain").endsWith(".ck"), lit("wild"))
            .otherwise(lit("exact")).as("rule_kind"))
        .orderBy("host")
    },

    // ROBOTS GATE — the crawl-politeness stage between the frontier
    // and the fetcher: evaluate each URL against its domain's
    // robots.txt rule set with the REAL semantics (longest matching
    // path prefix wins; on a length tie, allow beats disallow — the
    // Google/RFC 9309 rule). The corpus carries no robots files, so
    // each domain's rule set is synthesized DETERMINISTICALLY from
    // the domain string (same formulas verbatim in DuckDB): every
    // domain allows "/", domains with length % 3 == 0 disallow
    // "/p/1" (and those also even-length re-allow "/p/12" — the
    // nested exception real robots files are full of), domains with
    // length % 5 == 2 disallow "/p/" wholesale. So one URL can match
    // up to four rules of different lengths and the verdict is
    // genuinely the longest-prefix winner. SCALE SHAPES: the rule
    // set is built FROM the dimension-bounded distinct-domain census
    // (<= 4 rules/domain) and BROADCAST — the corpus never shuffles
    // to be gated; the per-URL winner is max_by(kind, 2*len + isAllow)
    // — a hash AGGREGATE with map-side combine, not a window; the
    // output census is domain-bounded.
    Q("robots_gate",
      s"""WITH $duckRobots
         |SELECT domain, n_urls, n_allowed, n_blocked,
         |  CAST(n_blocked AS DOUBLE) / n_urls AS blocked_rate
         |FROM rb ORDER BY domain""".stripMargin) { (s, dir) =>
      robotsCensus(s, dir)
        .select(col("domain"), col("n_urls"), col("n_allowed"),
          col("n_blocked"),
          (col("n_blocked").cast("double") / col("n_urls"))
            .as("blocked_rate"))
        .orderBy("domain")
    })
}
