package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{graft => bridge}

import graft.functions.HtmlExtract

/** HTML → main-text extraction (see [[graft.functions.HtmlExtract]] for
  * the rule set) plus the deterministic synthetic HTML wrap that makes
  * the surface testable against the driver's `documents` table, which
  * carries ALREADY-CLEAN text — real pretraining pipelines start one
  * step earlier, at crawled HTML.
  *
  * No reference counterpart (the reference has no text surface);
  * extended LLM-pipeline scope.
  *
  * Scale design: the wrap is a map-only generator (test harness side —
  * HOFs acceptable there); the EXTRACTOR is the corpus-scan hot path
  * and runs as one single-pass native kernel per row inside whole-stage
  * codegen — no regexp_replace chain (each pass re-walks and
  * re-allocates the document), no UDF, no per-block HOF interpretation.
  * At 100 TB the query is scan + kernel + nothing: no shuffle, no
  * driver materialization; filters/pruning on sibling metadata columns
  * still push into the parquet scan untouched.
  */
object TextExtract {

  /** Deterministic HTML wrap of a clean-text corpus: title + style +
    * script (droppable head matter), an all-link nav bar and footer
    * (boilerplate the link-density rule must drop), and the text cut
    * into ≤25-word `<p>` paragraphs, cycling three shapes by paragraph
    * index k mod 3 — plain / inline `<b>` markup with `&amp;` and a
    * trailing `&nbsp;` / a leading `<a>` citation link (low density,
    * must be KEPT). Pure built-in string/array functions so the DuckDB
    * oracle reproduces the bytes exactly.
    */
  def syntheticHtml(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol).cast("string")
    val words = split(col(textCol), " ")
    val nParas = ceil(size(words) / lit(25.0)).cast("long")
    def para(k: Column): Column = array_join(slice(words, k * 25 + 1, lit(25)), " ")
    def paraHtml(k: Column): Column = {
      val p = para(k)
      val w1 = element_at(split(p, " "), 1)
      val rest = p.substr(length(w1) + 2, lit(1000000))
      when(pmod(k, lit(3L)) === 0, p)
        .when(pmod(k, lit(3L)) === 1,
          concat(lit("<b>"), w1, lit("</b> &amp; "), rest, lit("&nbsp;")))
        .otherwise(
          concat(lit("<a href=\"/ref\">"), w1, lit("</a>"),
            when(length(rest) > 0, concat(lit(" "), rest)).otherwise(lit(""))))
    }
    val paras = array_join(
      transform(sequence(lit(0L), nParas - 1),
        k => concat(lit("<p>"), paraHtml(k), lit("</p>"))), "")
    df.select(col(idCol),
      concat(
        lit("<html><head><title>Doc "), id, lit("</title>"),
        lit("<style>body { color: #fff; }</style>"),
        lit("<script>var x = "), id, lit("; if (x < 2) { x = x + 1; }</script>"),
        lit("</head><body>"),
        lit("<div class=\"nav\"><a href=\"/home\">home</a> " +
          "<a href=\"/about\">about</a> <a href=\"/s?id="), id,
        lit("\">source</a></div>"),
        paras,
        lit("<div class=\"footer\"><a href=\"/next\">next page</a></div>"),
        lit("</body></html>")).as("html"))
  }

  /** Run the extractor: input columns + `clean`, `kept_blocks`,
    * `dropped_blocks` (dropped = non-empty blocks discarded by the
    * link-density rule).
    */
  def extract(df: DataFrame, htmlCol: String): DataFrame = {
    val x = bridge.column(HtmlExtract(bridge.expression(col(htmlCol))))
    df.withColumn("__x", x)
      .select((df.columns.filterNot(_ == htmlCol).map(col) ++ Seq(
        col("__x.clean").as("clean"),
        col("__x.kept_blocks").as("kept_blocks"),
        col("__x.dropped_blocks").as("dropped_blocks"))): _*)
  }
}
