package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** HTML main-content extraction — the boilerplate-removal stage every
  * web-corpus pretraining pipeline runs between the crawl and text
  * curation (the simplified text-density / link-density family of
  * Boilerpipe and Arc90 readability: block-level segmentation, tag
  * strip, then keep blocks that are long enough AND not link-dominated).
  *
  * The corpus stores plain text, so each document is first wrapped in a
  * deterministic HTML page — nav bar, an ad block on even doc_ids, the
  * article as `<p>` paragraphs of ≤25 tokens (every 3rd doc carries an
  * inline `see also` link inside its first paragraph), a related-links
  * list, and a footer — constructed IDENTICALLY in both engines so the
  * oracle checks the extractor, not the generator. The fixture is
  * adversarial by design: the footer and ad pass the length floor but
  * fail the link-density test (density is load-bearing, not just
  * length), the nav fails both, and the inline-link paragraph must
  * SURVIVE (tolerance below the 1/3 density cut), so every branch of
  * the classifier is exercised and `HtmlExtractSpec` can assert the
  * recovered main text equals the original article.
  *
  * Classifier, per newline-delimited block: strip tags
  * (`<[^>]*>` → space), collapse runs of spaces, trim; link text =
  * concatenated `<a ...>…</a>` anchor contents. Keep iff
  * `len(text) ≥ 25` and `3·len(linktext) < len(text)`.
  *
  * Scale shape: one narrow scan → per-row string projection → explode
  * (≤ ~8 blocks/doc, bounded fan-out) → one groupBy(doc_id) whose
  * combiner is the sorted-struct collect the engine's other per-doc
  * rollups use. No joins, no windows, nothing corpus-squared; at 100 TB
  * this is scan-bound, which is the best an extraction pass can be. */
object HtmlExtract {

  def all: Seq[QueryDef] = Seq(extractMain)

  private val SeeAlso = """ <a href="/ref">see also</a>"""

  /** Deterministic page wrapper (Spark side). */
  private def htmlCol: Column = {
    val t = split(col("text"), " ")
    val np = ceil(size(t).cast("double") / 25.0).cast("int")
    val paras = transform(sequence(lit(0), np - 1), i =>
      concat(lit("<p>"),
        concat_ws(" ", slice(t, i * 25 + 1, lit(25))),
        when(i === 0 && col("doc_id") % 3 === 0, lit(SeeAlso))
          .otherwise(lit("")),
        lit("</p>")))
    val nav = lit("""<div class="nav"><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></div>""")
    val ad = when(col("doc_id") % 2 === 0,
      lit("""<div class="ad"><a href="?ref=ad">Subscribe to our newsletter today</a></div>"""))
      .otherwise(lit(null).cast("string"))
    val related = concat(lit("""<ul><li><a href="/p/"""),
      (col("doc_id") % 7).cast("string"),
      lit("""">Related story """), (col("doc_id") % 7).cast("string"),
      lit("""</a></li><li><a href="/p/"""), (col("doc_id") % 5).cast("string"),
      lit("""">More breaking news today</a></li></ul>"""))
    val footer = lit("""<div class="footer"><a href="/tos">Terms of Service</a> <a href="/privacy">Privacy Policy</a> All rights reserved</div>""")
    concat_ws("\n", nav, ad, array_join(paras, "\n"), related, footer)
  }

  /** The same wrapper in DuckDB SQL. */
  private val htmlSql = """
      concat_ws(chr(10),
        '<div class="nav"><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></div>',
        CASE WHEN doc_id % 2 = 0
          THEN '<div class="ad"><a href="?ref=ad">Subscribe to our newsletter today</a></div>'
          ELSE NULL END,
        array_to_string(list_transform(
          range(0, CAST(ceil(len(t) / 25.0) AS INT)),
          i -> '<p>' || array_to_string(t[i*25+1 : i*25+25], ' ') ||
            (CASE WHEN i = 0 AND doc_id % 3 = 0
              THEN ' <a href="/ref">see also</a>' ELSE '' END) || '</p>'),
          chr(10)),
        '<ul><li><a href="/p/' || CAST(doc_id % 7 AS VARCHAR) ||
          '">Related story ' || CAST(doc_id % 7 AS VARCHAR) ||
          '</a></li><li><a href="/p/' || CAST(doc_id % 5 AS VARCHAR) ||
          '">More breaking news today</a></li></ul>',
        '<div class="footer"><a href="/tos">Terms of Service</a> <a href="/privacy">Privacy Policy</a> All rights reserved</div>')"""

  /** Block classifier thresholds. */
  val MinBlockChars = 25
  val LinkDensityDen = 3 // keep iff 3·linkchars < textchars

  /** Core over an arbitrary `(doc_id, html)` frame — what the spec's
    * hand-built fixtures drive directly. */
  def extractMainOf(pages: DataFrame): DataFrame = {
    val blocks = pages
      .select(col("doc_id"), posexplode(split(col("html"), "\n")))
      .toDF("doc_id", "bpos", "block")
      .withColumn("txt", trim(regexp_replace(
        regexp_replace(col("block"), "<[^>]*>", " "), " +", " ")))
      .withColumn("linkchars", length(array_join(
        expr("regexp_extract_all(block, '<a [^>]*>([^<]*)</a>', 1)"), "")))
      .withColumn("keep", length(col("txt")) >= MinBlockChars &&
        lit(LinkDensityDen) * col("linkchars") < length(col("txt")))
    blocks
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("keep").cast("long")).as("n_kept"),
        sort_array(collect_list(struct(
          col("bpos").as("p"), col("keep").as("k"), col("txt").as("t"))))
          .as("bs"))
      .select(col("doc_id"), col("n_blocks"), col("n_kept"),
        array_join(expr("transform(filter(bs, x -> x.k), x -> x.t)"), " ")
          .as("main_text"))
      .withColumn("main_chars", length(col("main_text")).cast("long"))
      .select(col("doc_id"), col("n_blocks"), col("n_kept"),
        col("main_chars"), col("main_text"))
      .orderBy(col("doc_id"))
  }

  val extractMain = QueryDef("text_extract_main",
    (s, d) => extractMainOf(
      Tables.documents(s, d).select(col("doc_id"), htmlCol.as("html"))),
    Some(s"""WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      pages AS (SELECT doc_id, ($htmlSql) AS html FROM toks),
      blocks AS (SELECT doc_id, i - 1 AS bpos, b[i] AS block
        FROM (SELECT doc_id, string_split(html, chr(10)) AS b,
            unnest(range(1, len(string_split(html, chr(10))) + 1)) AS i
          FROM pages)),
      cls AS (SELECT doc_id, bpos,
          trim(regexp_replace(regexp_replace(block, '<[^>]*>', ' ', 'g'),
            ' +', ' ', 'g')) AS txt,
          length(COALESCE(array_to_string(regexp_extract_all(block,
            '<a [^>]*>([^<]*)</a>', 1), ''), '')) AS linkchars
        FROM blocks),
      kept AS (SELECT doc_id, bpos, txt,
          (length(txt) >= 25 AND 3 * linkchars < length(txt)) AS keep
        FROM cls)
      SELECT doc_id, COUNT(*) AS n_blocks,
        CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        CAST(COALESCE(length(string_agg(CASE WHEN keep THEN txt END, ' '
          ORDER BY bpos)), 0) AS BIGINT) AS main_chars,
        COALESCE(string_agg(CASE WHEN keep THEN txt END, ' '
          ORDER BY bpos), '') AS main_text
      FROM kept GROUP BY doc_id ORDER BY doc_id"""))
}
