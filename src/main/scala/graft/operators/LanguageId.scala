package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Character-n-gram language identification (heuristic, dictionary-free):
  * each language has a profile of distinctive trigrams; a document's
  * score per language is the total number of characters matched by that
  * profile's trigrams, and the prediction is the argmax (ties resolve in
  * fixed language order).
  *
  * The scoring primitive is `length(text) - length(replace(text, tri))`,
  * which counts occurrences × 3 — identical semantics in Spark and
  * DuckDB, fully codegen'd, no UDF and no explode/join, so the operator
  * is a narrow map over the corpus (scales linearly, shuffle-free).
  *
  * Profiles are small public linguistic trivia; real deployments swap in
  * learned profiles (the operator shape is unchanged).
  */
object LanguageId {

  val Profiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "sch", "und", "ein", "ich"),
    "en" -> Seq("the", "ing", "ion", "and", "ent"),
    "es" -> Seq("que", "los", "ada", "nte", "cio"),
    "fr" -> Seq("les", "que", "eur", "ent", "ais"),
    // single han characters: script detection through the same
    // replace primitive (an EMPTY profile scored 0 and could never win
    // the argmax — every zh doc fell to the tie-break language, caught
    // by the accuracy fixture in PipelineOpsSpec)
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Matched-character score for one language profile (dialect-shared
    * SQL: length/replace behave identically in Spark and DuckDB).
    */
  def scoreExpr(profile: Seq[String]): String =
    if (profile.isEmpty) "0"
    else profile.map(t => s"(length(text) - length(replace(text, '$t', '')))").mkString(" + ")

  /** Argmax CASE over named score columns (first max wins → fixed
    * language order breaks ties identically everywhere).
    */
  def predExpr: String = {
    val all = Profiles.map { case (l, _) => s"score_$l" }.mkString(", ")
    Profiles
      .map { case (l, _) => s"WHEN score_$l >= greatest($all) THEN '$l'" }
      .mkString("CASE ", " ", " END")
  }

  /** (doc_id, pred, lang): predicted vs labeled language. */
  def predict(docs: DataFrame): DataFrame = {
    val scored = Profiles.foldLeft(docs) { case (df, (l, p)) =>
      df.withColumn(s"score_$l", expr(scoreExpr(p)))
    }
    scored
      .withColumn("pred", expr(predExpr))
      .select(col("doc_id"), col("pred"), col("lang"))
      .orderBy(col("doc_id"))
  }

  def predictSql: String = {
    val scores = Profiles
      .map { case (l, p) => s"${scoreExpr(p)} AS score_$l" }
      .mkString(",\n  ")
    s"""WITH s AS (SELECT doc_id, lang,\n  $scores\nFROM documents)
       |SELECT doc_id, $predExpr AS pred, lang FROM s ORDER BY doc_id""".stripMargin
  }
}
