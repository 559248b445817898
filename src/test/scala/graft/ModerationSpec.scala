package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Moderation
import graft.ops.Moderation.Message

/** Golden-fixture parity with the reference (FIXTURES.md §A; reference
  * README.md:24-55, logs/application.log:56-61) plus the edge cases the
  * reference leaves untested (FIXTURES.md §A.4).
  */
class ModerationSpec extends SparkSpec {
  import spark.implicits._

  // Reference golden fixture (KafkaStreamApp.java:53-54,237-240)
  val goldenWords: DataFrame = Seq(
    ("Политика", "ban"), ("1C", "ban"), ("Алкоголь", "ban")
  ).toDF("word", "value")

  val goldenBlocked: DataFrame = Seq(
    "login1:login2", "login1:login3", "login2:login4"
  ).toDF("bk")

  val goldenMessages: DataFrame = Seq(
    Message("login4", "Java", "login1"),
    Message("login2", "Spring", "login1"),
    Message("login3", "1С", "login1"), // Cyrillic С — homoglyph of Latin C
    Message("login5", "Политика React", "login1")
  ).toDF()

  def runPipeline(singlePass: Boolean): Seq[(String, String, String)] = {
    val words = Moderation.activeBanWords(goldenWords, "word", "value")
    Moderation.pipeline(goldenMessages, goldenBlocked, words, singlePass)
      .select("sender", "text", "receiver")
      .as[(String, String, String)].collect().sortBy(_._1).toSeq
  }

  test("golden output matches reference README.md:53-54 (fold path)") {
    assert(runPipeline(singlePass = false) === Seq(
      ("login4", "Java", "login1"),
      ("login5", "******** React", "login1")))
  }

  test("golden output matches reference (single-pass CensorText path)") {
    // The golden vocab has a Cyrillic 'а' suffix-prefix overlap
    // (Политика/Алкоголь), so pipeline(singlePass = true) correctly
    // falls back to the fold; exercise the CensorText expression
    // directly — on the fixture (no overlapping occurrences) the
    // longest-first single pass agrees with the reference output.
    assert(!Moderation.singlePassEquivalent(
      Moderation.activeBanWords(goldenWords, "word", "value")))
    assert(runPipeline(singlePass = true) === Seq(
      ("login4", "Java", "login1"),
      ("login5", "******** React", "login1")))
    val words = Moderation.activeBanWords(goldenWords, "word", "value")
    val direct = Moderation.dropBlocked(goldenMessages, goldenBlocked)
      .withColumn("text", graft.functions.CensorText(col("text"), words))
      .select("sender", "text", "receiver")
      .as[(String, String, String)].collect().sortBy(_._1).toSeq
    assert(direct === Seq(
      ("login4", "Java", "login1"),
      ("login5", "******** React", "login1")))
  }

  test("blocked pair is directional: receiver:sender, not sender:receiver") {
    // login1:login2 is blocked => login2->login1 dropped, but the
    // reverse direction login1->login2 must PASS.
    val reverse = Seq(Message("login1", "hello", "login2")).toDF()
    val out = Moderation.dropBlocked(reverse, goldenBlocked).count()
    assert(out === 1)
    val forward = Seq(Message("login2", "hello", "login1")).toDF()
    assert(Moderation.dropBlocked(forward, goldenBlocked).count() === 0)
  }

  test("censor is ASCII-case-insensitive and masks with word-length asterisks") {
    // Java `(?i)` without UNICODE_CASE folds ASCII only — mixed-case
    // ASCII masks, mixed-case Cyrillic does NOT (reference parity:
    // MessageFilterProcessor.java:38 uses plain "(?i)" + replaceAll).
    val out = Seq(Message("a", "jAvA and Java; пОлИтИкА и Политика", "b")).toDF()
      .select(Moderation.censorFold($"text", Seq("java", "Политика")).as("t"))
      .as[String].head()
    assert(out === "**** and ****; пОлИтИкА и ********")
  }

  test("regex metacharacters in words are literal (Pattern.quote)") {
    for (single <- Seq(false, true)) {
      val censor =
        if (single) Moderation.censorSinglePass($"text", Seq("C++", "a.b"))
        else Moderation.censorFold($"text", Seq("C++", "a.b"))
      val out = Seq(("I like C++ and aXb and a.b", 1)).toDF("text", "i")
        .select(censor.as("t")).as[String].head()
      // "a.b" must NOT match "aXb" (dot is literal); "C++" masked as 3 chars
      assert(out === "I like *** and aXb and ***", s"singlePass=$single")
    }
  }

  test("oracle duckCensor quotes regex metachars to match the literal engine") {
    // The engine side Pattern.quotes every ban word (test above); the
    // DuckDB oracle SQL must match literally too, or a metachar word
    // would silently diverge the ORACLE rather than the engine.
    val sql = graft.queries.CoreQueries.duckCensor("text", Seq("C++", "a.b", "it's"))
    assert(sql.contains("'C\\+\\+'"), sql)   // + escaped for RE2
    assert(sql.contains("'a\\.b'"), sql)     // dot literal, not any-char
    assert(sql.contains("'it''s'"), sql)     // SQL quote doubled
    // plain alphanumeric words pass through unescaped (byte-identical
    // oracle SQL for the shipped banWords vocabulary)
    assert(graft.queries.CoreQueries.duckCensor("t", Seq("spark"))
      === "regexp_replace(t, 'spark', '*****', 'gi')")
  }

  test("Cyrillic/Latin homoglyphs do not cross-match (ASCII (?i) semantics)") {
    val out = Seq(Message("a", "1С", "b")).toDF() // Cyrillic С
      .select(Moderation.censorFold($"text", Seq("1C")).as("t")) // Latin C
      .as[String].head()
    assert(out === "1С")
  }

  test("null text passes through unchanged (U5)") {
    val out = Seq(Message("a", null, "b")).toDF()
      .select(Moderation.censorFold($"text", Seq("x")).as("t"))
      .as[String].collect()
    assert(out === Array(null))
  }

  test("only value == \"ban\" words are active (U3)") {
    val words = Seq(("Политика", "ban"), ("Java", "warn"), ("Spring", null))
      .toDF("word", "value")
    assert(Moderation.activeBanWords(words, "word", "value") === Seq("Политика"))
  }

  test("substring matching, no word boundaries (README.md:54)") {
    val out = Seq(Message("a", "Политика React", "b")).toDF()
      .select(Moderation.censorFold($"text", Seq("Политика")).as("t"))
      .as[String].head()
    assert(out === "******** React")
  }

  test("latestPerKey compacts a changelog and drops tombstones") {
    val changelog = Seq(
      ("k1", 1L, "v1"), ("k1", 2L, "v2"),
      ("k2", 1L, "v1"), ("k2", 2L, null),
      ("k3", 5L, "only")
    ).toDF("key", "offset", "value")
    val out = Moderation.latestPerKey(changelog, "key", "offset", "value")
      .select("key", "value").as[(String, String)].collect().sortBy(_._1)
    assert(out === Array(("k1", "v2"), ("k3", "only")))
  }

  test("empty word list censor is identity") {
    for (single <- Seq(false, true)) {
      val censor =
        if (single) Moderation.censorSinglePass($"text", Nil)
        else Moderation.censorFold($"text", Nil)
      val out = Seq(("unchanged", 1)).toDF("text", "i")
        .select(censor.as("t")).as[String].head()
      assert(out === "unchanged")
    }
  }

  test("censorSinglePass rejects vocabularies where fold and single-pass diverge") {
    // substring pair: fold(["b","ab"]) on "ab" -> "a*", single-pass -> "**"
    assert(!Moderation.singlePassEquivalent(Seq("b", "ab")))
    intercept[IllegalArgumentException] {
      Moderation.censorSinglePass($"text", Seq("b", "ab"))
    }
    // suffix-prefix overlap: fold(["bc","ab"]) on "abc" -> "a**",
    // single-pass (leftmost match wins) -> "**c"
    assert(!Moderation.singlePassEquivalent(Seq("bc", "ab")))
    intercept[IllegalArgumentException] {
      Moderation.censorSinglePass($"text", Seq("bc", "ab"))
    }
    // case-insensitive like the censor itself
    assert(!Moderation.singlePassEquivalent(Seq("AB", "b")))
    // the fixture vocab is safe
    assert(Moderation.singlePassEquivalent(CoreWords.words))
    // divergence witness: fold really does differ from what a
    // single pass would produce, which is why the guard exists
    val folded = Seq(("ab", 1)).toDF("text", "i")
      .select(Moderation.censorFold($"text", Seq("b", "ab")).as("t"))
      .as[String].head()
    assert(folded === "a*")
  }

  test("null receiver/sender yields a NULL blocked key that never matches") {
    // null-propagating concat (SQL || semantics): a message with a null
    // field can never be dropped by the anti-join, and a blocked entry
    // with a null field can never drop anyone. A sender containing ':'
    // must not collide with a collapsed key (the concat_ws trap).
    val msgs = Seq(
      Message("s1", "keep: null receiver", null),
      Message(null, "keep: null sender", "r1"),
      Message("x:s", "keep: colon sender, no such pair", "r2"),
      Message("s2", "drop: blocked pair", "r2")
    ).toDF()
    val blocked = Seq("r2:s2", null, "x:s").toDF("bk")
    val out = Moderation.dropBlocked(msgs, blocked)
      .select("text").as[String].collect().sorted
    assert(out === Array("keep: colon sender, no such pair",
      "keep: null receiver", "keep: null sender"))
  }

  test("overlapping-occurrence words: fold and single-pass agree on fixture vocab") {
    val words = CoreWords.words
    val df = Tables.load(spark, sf0001, "documents")
    val diff = df.select(
        Moderation.censorFold($"text", words).as("a"),
        Moderation.censorSinglePass($"text", words).as("b"))
      .filter($"a" =!= $"b").count()
    assert(diff === 0)
  }
}

object CoreWords { val words = graft.queries.CoreQueries.banWords }
