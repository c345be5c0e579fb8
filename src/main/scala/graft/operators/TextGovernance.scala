package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.tokens
import TextPipeline.{md5Hash60, hex60Sql}

/** Data-governance operators a training-data pipeline runs before a corpus
  * ships: PII detection/redaction, vocabulary construction, and benchmark
  * decontamination. All pure DataFrame plans — per-row regex/codegen work
  * plus standard aggregations/joins, so each distributes unchanged at 100 TB.
  */
object TextGovernance {

  private def docs(spark: SparkSession, dir: String): DataFrame = {
    Tables.ensure(spark, dir)
    spark.table("documents")
  }

  // Identical RE2/Java-compatible patterns on both engines.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\+1-555-[0-9]+"

  val ops: Seq[Op] = Seq(

    // HTML extraction — the FIRST stage of every web-crawl pipeline: strip
    // markup, decode entities, collapse whitespace. The fixture has no HTML,
    // so the op wraps each doc in a deterministic tag structure BOTH engines
    // can rebuild, runs the real extraction chain (three chained codegen
    // regex/replace projections — the text_pii_redact shape, one scan, no
    // shuffle beyond the final sort), and value-checks the round trip:
    // extracted text must equal the original, per row, with the tag count
    // reported. A real crawl swaps the synthetic wrapper for the raw HTML
    // column; the extraction chain is unchanged.
    Op("text_html_extract",
      "WITH h AS (SELECT doc_id, '<html><body><p class=\"doc\">' || " +
      "REPLACE(text, ' ', '&nbsp;') || '</p><br/></body></html>' AS html, text FROM documents), " +
      "x AS (SELECT doc_id, text, CAST(LEN(REGEXP_EXTRACT_ALL(html, '<[^>]*>')) AS INTEGER) AS n_tags, " +
      "REPLACE(REGEXP_REPLACE(html, '<[^>]*>', '', 'g'), '&nbsp;', ' ') AS extracted FROM h) " +
      "SELECT doc_id, n_tags, (extracted = text) AS round_trip, " +
      "CAST(LENGTH(extracted) AS INTEGER) AS n_chars_out " +
      "FROM x ORDER BY doc_id") { (s, d) =>
      val html = concat(lit("<html><body><p class=\"doc\">"),
        regexp_replace(col("text"), " ", "&nbsp;"), lit("</p><br/></body></html>"))
      docs(s, d)
        .select(col("doc_id"), col("text"), html.as("html"))
        .select(col("doc_id"), col("text"),
          size(expr("regexp_extract_all(html, '<[^>]*>', 0)")).as("n_tags"),
          regexp_replace(regexp_replace(col("html"), "<[^>]*>", ""),
            "&nbsp;", " ").as("extracted"))
        .select(col("doc_id"), col("n_tags"),
          (col("extracted") === col("text")).as("round_trip"),
          length(col("extracted")).as("n_chars_out"))
        .orderBy("doc_id")
    },
    // PII detect + redact. The fixture corpus is synthetic (no PII), so the
    // op plants deterministic contact strings first — the same construction
    // on both engines — then counts and strips them. Redaction is two
    // chained regexp_replace projections: pure codegen, no UDF.
    Op("text_pii_redact",
      "WITH t AS (SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR) || " +
      "'@example.com or call +1-555-' || CAST(doc_id % 10000 AS VARCHAR) AS t FROM documents) " +
      s"SELECT doc_id, CAST(LEN(REGEXP_EXTRACT_ALL(t, '$EmailRe')) AS INTEGER) AS emails, " +
      s"CAST(LEN(REGEXP_EXTRACT_ALL(t, '$PhoneRe')) AS INTEGER) AS phones, " +
      s"CAST(LENGTH(REGEXP_REPLACE(REGEXP_REPLACE(t, '$EmailRe', '[EMAIL]', 'g'), '$PhoneRe', '[PHONE]', 'g')) AS INTEGER) AS redacted_len " +
      "FROM t ORDER BY doc_id") { (s, d) =>
      val t = concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or call +1-555-"), (col("doc_id") % 10000).cast("string"))
      docs(s, d).select(col("doc_id"), t.as("t"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("t"), lit(EmailRe), lit(0))).as("emails"),
          size(regexp_extract_all(col("t"), lit(PhoneRe), lit(0))).as("phones"),
          length(regexp_replace(regexp_replace(col("t"), EmailRe, "[EMAIL]"),
            PhoneRe, "[PHONE]")).as("redacted_len"))
        .orderBy("doc_id")
    },

    // Corpus vocabulary: top-50 tokens by document frequency (then term
    // frequency, then token — fully deterministic). Two hash aggregations;
    // the distinct-per-doc dedup is map-side partial, standard at any scale.
    Op("text_vocab",
      "WITH tok AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents) " +
      "SELECT tok, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS tf FROM tok " +
      "GROUP BY tok ORDER BY df DESC, tf DESC, tok LIMIT 50") { (s, d) =>
      docs(s, d).select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy("tok")
        .agg(countDistinct("doc_id").as("df"), count(lit(1)).as("tf"))
        .orderBy(col("df").desc, col("tf").desc, col("tok")).limit(50)
    },

    // Benchmark decontamination: flag training docs sharing >=10% of their
    // distinct trigrams with a held-out eval slice (doc_id % 20 == 0 here).
    // The eval gram set is tiny relative to the corpus -> broadcast semi
    // join; one shuffle on doc_id for the per-doc counts. This is the
    // standard n-gram-overlap contamination check at cluster scale.
    Op("text_contamination",
      "WITH w AS (SELECT doc_id, STRING_SPLIT(text,' ') AS words FROM documents), " +
      "gs AS (SELECT DISTINCT doc_id, UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, CAST(LEN(words) AS INTEGER)-2), " +
      "i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS gram FROM w), " +
      s"g AS (SELECT doc_id, ${hex60Sql("gram")} AS g FROM gs), " +
      "ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 20 = 0), " +
      "tr AS (SELECT doc_id, g FROM g WHERE doc_id % 20 <> 0), " +
      "sh AS (SELECT doc_id, COUNT(*) AS shared FROM tr WHERE g IN (SELECT g FROM ev) GROUP BY doc_id), " +
      "tot AS (SELECT doc_id, COUNT(*) AS total FROM tr GROUP BY doc_id) " +
      "SELECT t.doc_id, CAST(COALESCE(s.shared, 0) AS BIGINT) AS shared, t.total, " +
      "ROUND(CAST(COALESCE(s.shared, 0) AS DOUBLE)/t.total, 4) AS rate " +
      "FROM tot t LEFT JOIN sh s ON s.doc_id = t.doc_id " +
      "WHERE CAST(COALESCE(s.shared, 0) AS DOUBLE)/t.total >= 0.1 ORDER BY t.doc_id") { (s, d) =>
      val g = TextPipeline.triRows(docs(s, d))
        .select(col("doc_id"),
          md5Hash60(concat_ws(" ", col("w"), col("w1"), col("w2"))).as("g"))
        .dropDuplicates("doc_id", "g")
      val evalGrams = g.filter(col("doc_id") % 20 === 0).select("g").distinct()
      val train = g.filter(col("doc_id") % 20 =!= 0)
      val shared = train.join(broadcast(evalGrams), Seq("g"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("shared"))
      val total = train.groupBy("doc_id").agg(count(lit(1)).as("total"))
      val rate = col("shared").cast("double") / col("total")
      total.join(shared, Seq("doc_id"), "left").na.fill(0L, Seq("shared"))
        .filter(rate >= 0.1)
        .select(col("doc_id"), col("shared"), col("total"), round(rate, 4).as("rate"))
        .orderBy("doc_id")
    }
  )
}
