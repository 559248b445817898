package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the curation-pass queries added in round 7:
  * Gopher rule filter, PII redaction, packing-efficiency audit, and
  * the trigram stupid-backoff scorer. Value-level corpus checks live
  * in the DuckDB oracle gate; these pin the properties the oracle's
  * hash compare can't express (discriminativeness, negative cases,
  * cross-query consistency, backoff actually firing).
  */
class CurationSpec extends SparkSpec {

  private def run(name: String, dir: String = sf0001) =
    SparkEntry.queries(name)(spark, dir)

  test("gopher_rules: every rule is discriminative and keep is the conjunction") {
    val rows = run("gopher_rules", sf001)
      .select("r_len", "r_word_len", "r_stop", "r_rep", "keep").collect()
    // each rule must reject at least one doc and accept at least one —
    // a rule that never fires (or always fires) is a dead threshold
    Seq(0, 1, 2, 3).foreach { i =>
      assert(rows.exists(r => !r.getBoolean(i)), s"rule #$i never rejects")
      assert(rows.exists(r => r.getBoolean(i)), s"rule #$i never accepts")
    }
    assert(rows.forall(r =>
      r.getBoolean(4) === (r.getBoolean(0) && r.getBoolean(1) &&
        r.getBoolean(2) && r.getBoolean(3))))
    // the filter keeps a meaningful middle: neither empty nor everything
    val kept = rows.count(_.getBoolean(4))
    assert(kept > 0 && kept < rows.length)
  }

  test("pii_redact: injected docs detect exactly one of each class, clean docs none") {
    val rows = run("pii_redact").collect()
    rows.foreach { r =>
      val (id, em, ph, ip, has) = (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getBoolean(4))
      if (id % 3 == 0) {
        assert(em == 0 && ph == 0 && ip == 0 && !has, s"clean doc $id flagged")
      } else {
        assert(em == 1 && ph == 1 && ip == 1 && has, s"doc $id: $em/$ph/$ip")
      }
    }
    assert(rows.exists(_.getLong(0) % 3 == 0) && rows.exists(_.getLong(0) % 3 != 0))
  }

  test("pii_redact: redaction masks every match and nothing else") {
    // re-derive the redacted TEXT (the query ships only its md5) on a
    // hand fixture through the same expression chain the query uses
    import spark.implicits._
    val email = "[a-z0-9._]+@[a-z.]+"
    val phone = "555-[0-9]{4}"
    val ip = "10\\.[0-9]{1,3}\\.0\\.[0-9]{1,3}"
    val out = Seq(
      "mail me at bob.smith@corp.example now",
      "call 555-0199 or 555-1234",
      "host 10.7.0.201 is fine, 11.7.0.201 is not pii",
      "no pii here").toDF("t")
      .select(regexp_replace(regexp_replace(regexp_replace(col("t"),
        email, "<EMAIL>"), phone, "<PHONE>"), ip, "<IP>").as("red"))
      .as[String].collect()
    assert(out(0) === "mail me at <EMAIL> now")
    assert(out(1) === "call <PHONE> or <PHONE>")
    assert(out(2) === "host <IP> is fine, 11.7.0.201 is not pii")
    assert(out(3) === "no pii here")
  }

  test("pack_efficiency agrees with pack_sequences: same bins, same doc census") {
    val eff = run("pack_efficiency", sf001)
    val packs = run("pack_sequences", sf001)
    val effTot = eff.agg(sum("n_seqs"), sum("n_docs")).head()
    val packTot = packs.agg(
      countDistinct(col("shard"), col("seq_id")), count(lit(1))).head()
    assert(effTot.getLong(0) === packTot.getLong(0), "bin counts disagree")
    assert(effTot.getLong(1) === packTot.getLong(1), "doc counts disagree")
    // fill sanity: averages live in (0, max/budget]; overflow only
    // counts bins a straddling doc pushed past the budget
    eff.collect().foreach { r =>
      val avg = r.getDouble(5)
      assert(avg > 0.0 && avg <= r.getLong(4).toDouble / 2048.0 + 1e-9)
    }
  }

  test("trigram_backoff: train docs never back off, some held-out docs do") {
    val rows = run("trigram_backoff", sf001)
      .select("doc_id", "n_trigrams", "n_backoff", "logprob").collect()
    rows.foreach { r =>
      val (id, n, bo, lp) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))
      assert(n > 0 && bo >= 0 && bo <= n)
      // every trigram of an even (train) doc is in the train counts by
      // construction — the trigram path must always hit
      if (id % 2 == 0) assert(bo == 0, s"train doc $id backed off")
      assert(lp < 0.0, s"doc $id: log-prob must be negative, got $lp")
    }
    // the held-out half must actually exercise the backoff path,
    // otherwise the CASE's lower orders are dead code
    assert(rows.exists(r => r.getLong(0) % 2 == 1 && r.getLong(2) > 0),
      "no held-out doc ever backed off — backoff path untested")
  }
}
