package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming text classification — the streaming twin of
  * `lang_id_nb` (add-one multinomial Naive Bayes).
  *
  * The production deployment splits NB the same way DSIR splits
  * ([[StreamSelect]]): TRAIN (batch, rare) derives the model — class
  * priors, per-class smoothed token log-likelihoods, and the
  * unseen-token default, all in 1e-6 integer units; SCORE (streaming,
  * forever) folds each arriving document against the broadcast model
  * maps. Scoring is STATELESS row-local math — no watermark, no state
  * store, no shuffle — and the integer units make streaming==batch
  * parity bit-exact (pinned in StreamingSpec against the
  * DECIMAL(20,6) sums of the batch query).
  *
  * The model is vocabulary-bounded by contract (the same
  * broadcast-a-dimension contract as the moderation word list and the
  * DSIR λ table), so `trainNb`'s collect is bounded, and the per-class
  * score maps ride into the stream as constant-folded map literals.
  */
object StreamClassify {

  /** Trained NB model in 1e-6 integer log-units. `classes` is sorted
    * ascending — the argmax tie-break order (matches the batch
    * query's `ORDER BY logpost DESC, cand` rule).
    */
  final case class NbModel(
      classes: Seq[String],
      priorU: Map[String, Long],
      termU: Map[String, Map[String, Long]],
      defaultU: Map[String, Long])

  /** Round to 6 dp (HALF_UP — Spark's `round` rule) then scale to
    * exact 1e-6 integer units.
    */
  private def u6(x: Double): Long =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.movePointRight(6).longValueExact()

  /** Train on (lang, text) rows — the batch-side, rare step. The
    * count tables are vocabulary-bounded, so the collect is the same
    * contract-bounded dimension pull as `lamTable`.
    */
  def trainNb(train: DataFrame): NbModel = {
    val counts = train
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val tot = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val v = counts.keys.map(_._2).toSet.size.toLong
    val pri = train.groupBy("lang").agg(count(lit(1)).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ndocs = pri.values.sum
    val classes = tot.keys.toSeq.sorted
    // fail loudly here rather than as an opaque scoreCols.last crash
    // in classified() — an empty training frame is a caller bug
    require(classes.nonEmpty, "NB training set is empty: no (lang, text) rows")
    NbModel(
      classes,
      classes.map(cl => cl -> u6(math.log(pri(cl).toDouble / ndocs))).toMap,
      classes.map { cl =>
        cl -> counts.collect { case ((`cl`, tok), c) =>
          tok -> u6(math.log((c + 1.0) / (tot(cl) + v)))
        }.toMap
      }.toMap,
      classes.map(cl => cl -> u6(math.log(1.0 / (tot(cl) + v)))).toMap)
  }

  /** Per-class score: prior + Σ_tokens term[tok] (default for unseen)
    * — one constant-folded map literal per class, row-local fold.
    */
  def scoreU(text: Column, model: NbModel, cl: String): Column = {
    val terms = model.termU(cl)
    val m = map(terms.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    aggregate(
      split(text, " "),
      lit(model.priorU(cl)),
      (acc, tok) => acc + coalesce(element_at(m, tok), lit(model.defaultU(cl))))
  }

  /** (doc_id, lang, pred_lang, logpost_u) for every arriving document
    * — same plan on a batch or streaming frame. Argmax ties break to
    * the SMALLEST class name (classes are sorted; `>=` keeps the
    * earlier class), matching the batch query exactly.
    */
  def classified(docs: DataFrame, model: NbModel): DataFrame = {
    val scored = docs.select(
      Seq(col("doc_id"), col("lang"), col("text")) ++
        model.classes.map(cl => scoreU(col("text"), model, cl).as(s"s_$cl")): _*)
    val scoreCols = model.classes.map(cl => cl -> col(s"s_$cl"))
    val pred = graft.ops.TextAnalysis.predictedLang(scoreCols)
    scored
      .withColumn("pred_lang", pred)
      .withColumn("logpost_u", greatest(scoreCols.map(_._2): _*))
      .select("doc_id", "lang", "pred_lang", "logpost_u")
  }
}
