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
    // a plain two-label host
    val v = WebCuration.withDomain(spark, sf001)
      .filter(col("doc_id") === 3).collect()(0)
    assert(v.getAs[String]("host").endsWith("-0.com"))
    assert(v.getAs[String]("domain") === v.getAs[String]("host"),
      "bare site.tld is its own registrable domain")
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
  }
}
