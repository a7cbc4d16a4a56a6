package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Scalar/parse pack — q03–q07 (SURVEY.md §2.3, operators P1–P11/P13).
  *
  * The reference's per-case transform logic re-expressed over the driver
  * testdata: inputs are CONSTRUCTED deterministically from table columns
  * (the testdata has no Japanese HTML), then run through the real operators
  * in [[graft.ops.TextOps]]; the DuckDB oracle applies the identical
  * construction and either the same transformation chain or the closed-form
  * expected result. Every query is a pure narrow projection — no shuffle
  * except the oracle-mandated final sort.
  */
object PackScalar {

  /** q03 — P1 regex case-id + P8 basename/splitext + P10 URL detector. */
  private val q03 = Q(
    "q03_regex_id",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val url = concat(
        lit("https://example.org/cf/C"),
        lpad(col("doc_id").cast("string"), 5, "0"), lit(".html"))
      val path = concat(
        col("source"), lit("/doc_"), col("doc_id").cast("string"),
        lit(".json"))
      val line = when(
        col("doc_id") % 2 === 0,
        concat(lit("see https://example.org/p/"), col("doc_id").cast("string"),
          lit(" end"))).otherwise(col("text"))
      docs.select(
        col("doc_id"),
        TextOps.caseId(url).as("case_id"),
        TextOps.basename(path).as("fname"),
        TextOps.stripExt(TextOps.basename(path)).as("stem"),
        coalesce(TextOps.nullIfEmpty(TextOps.firstUrl(line)), lit("NONE"))
          .as("link"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
        regexp_extract('https://example.org/cf/C' || lpad(cast(doc_id AS VARCHAR), 5, '0') || '.html', '/cf/(\w+)\.html', 1) AS case_id,
        regexp_extract(source || '/doc_' || cast(doc_id AS VARCHAR) || '.json', '([^/]+)$', 1) AS fname,
        regexp_replace(regexp_extract(source || '/doc_' || cast(doc_id AS VARCHAR) || '.json', '([^/]+)$', 1), '\.[^.]*$', '') AS stem,
        coalesce(nullif(regexp_extract(CASE WHEN doc_id % 2 = 0 THEN 'see https://example.org/p/' || cast(doc_id AS VARCHAR) || ' end' ELSE text END, '(https?://\S+)', 1), ''), 'NONE') AS link
      FROM documents ORDER BY doc_id
    """),
    doc = "P1/P8/P10: regex extract, basename, splitext, URL detect")

  /** q04 — P2 date normalize w/ raw passthrough + P13 date_format parity. */
  private val q04 = Q(
    "q04_date_norm",
    (s, d) => {
      val ev = Tables.events(s, d)
      val y = year(col("ts")).cast("string")
      val m = month(col("ts")).cast("string")
      val dd = dayofmonth(col("ts")).cast("string")
      // the %6 variant embeds the date mid-text: search (re.search parity)
      // must still normalize it — an anchored match would pass it through
      val raw = when(col("event_id") % 3 === 0,
        concat(
          when(col("event_id") % 6 === 0, lit("発生は")).otherwise(lit("")),
          y, lit("年"), m, lit("月"), dd, lit("日"),
          when(col("event_id") % 6 === 0, lit("頃")).otherwise(lit(""))))
        .when(col("event_id") % 3 === 1, concat(lit("R6."), m, lit("."), dd))
        .otherwise(lit("不明"))
      ev.select(
        col("event_id"),
        raw.as("raw"),
        TextOps.dateNorm(raw).as("norm"),
        Det.dstr(col("ts")).as("day"))
        .orderBy("event_id")
    },
    Some("""
      WITH t AS (SELECT event_id, cast(ts AS TIMESTAMP) AS tsu FROM events),
      r AS (
        SELECT event_id, tsu,
          CASE WHEN event_id % 3 = 0 THEN (CASE WHEN event_id % 6 = 0 THEN '発生は' ELSE '' END) || cast(year(tsu) AS VARCHAR) || '年' || cast(month(tsu) AS VARCHAR) || '月' || cast(day(tsu) AS VARCHAR) || '日' || (CASE WHEN event_id % 6 = 0 THEN '頃' ELSE '' END)
               WHEN event_id % 3 = 1 THEN 'R6.' || cast(month(tsu) AS VARCHAR) || '.' || cast(day(tsu) AS VARCHAR)
               ELSE '不明' END AS raw
        FROM t)
      SELECT event_id, raw,
        CASE WHEN regexp_matches(raw, '(\d{4})年(\d{1,2})月(\d{1,2})日')
             THEN regexp_extract(raw, '(\d{4})年(\d{1,2})月(\d{1,2})日', 1) || '-' || lpad(regexp_extract(raw, '(\d{4})年(\d{1,2})月(\d{1,2})日', 2), 2, '0') || '-' || lpad(regexp_extract(raw, '(\d{4})年(\d{1,2})月(\d{1,2})日', 3), 2, '0')
             ELSE raw END AS norm,
        strftime(tsu, '%Y-%m-%d') AS day
      FROM r ORDER BY event_id
    """),
    doc = "P2/P13: Japanese-date normalize with passthrough, date_format")

  /** q05 — P3 first-int parse (default 0) + P11 scale-to-fit math. */
  private val q05 = Q(
    "q05_parse_int",
    (s, d) => {
      val ev = Tables.events(s, d)
      val src = when(col("event_id") % 5 === 0, lit("no digits here"))
        .otherwise(col("props"))
      val k = TextOps.firstInt(src)
      val w = col("value") + lit(1.0)
      val h = (k + lit(1)).cast("double")
      val ratio = TextOps.fitRatio(w, h, 640.0, 480.0)
      ev.select(
        col("event_id"),
        k.as("k"),
        round(w * ratio, 4).as("fit_w"),
        round(h * ratio, 4).as("fit_h"))
        .orderBy("event_id")
    },
    Some("""
      WITH t AS (
        SELECT event_id, value,
          coalesce(cast(nullif(regexp_extract(CASE WHEN event_id % 5 = 0 THEN 'no digits here' ELSE props END, '(\d+)', 1), '') AS INTEGER), 0) AS k
        FROM events),
      u AS (SELECT event_id, k, value + 1.0 AS w, cast(k + 1 AS DOUBLE) AS h FROM t),
      v AS (SELECT event_id, k, w, h, least(640.0 / w, 480.0 / h) AS ratio FROM u)
      SELECT event_id, k, round(w * ratio, 4) AS fit_w, round(h * ratio, 4) AS fit_h
      FROM v ORDER BY event_id
    """),
    doc = "P3/P11: first-int default 0, scale-to-fit math")

  /** q06 — P4 br→newline + P5 paragraph regroup + P6 split-trim-dropempty. */
  private val q06 = Q(
    "q06_split_trim",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val html = concat(
        lit("  first<br>second line<br> <br>"),
        substring(col("text"), 1, 15),
        lit("<br>\u00a0x<br><br><br> tail  "))
      val txt = TextOps.brToNewline(html)
      docs.select(
        col("doc_id"),
        TextOps.paragraphs(txt).as("para"),
        TextOps.splitTrimJoin(txt, "|").as("items"))
        .orderBy("doc_id")
    },
    Some("""
      WITH h AS (
        SELECT doc_id, '  first<br>second line<br> <br>' || substr(text, 1, 15) || '<br>' || chr(160) || 'x<br><br><br> tail  ' AS html
        FROM documents),
      n AS (SELECT doc_id, regexp_replace(html, '<br\s*/?>', chr(10), 'g') AS txt FROM h),
      tl AS (
        SELECT doc_id,
          regexp_replace(regexp_replace(txt, '[ \t\x{00A0}]*\n[ \t\x{00A0}]*', chr(10), 'g'), '^\s+|\s+$', '', 'g') AS t1,
          regexp_replace(regexp_replace(regexp_replace(txt, chr(160), ' ', 'g'), '[ \t\x{00A0}]*\n[ \t\x{00A0}]*', chr(10), 'g'), '^\s+|\s+$', '', 'g') AS t2
        FROM n)
      SELECT doc_id,
        regexp_replace(t1, '\n{2,}', chr(10) || chr(10), 'g') AS para,
        replace(regexp_replace(t2, '\n+', chr(10), 'g'), chr(10), '|') AS items
      FROM tl ORDER BY doc_id
    """),
    doc = "P4/P5/P6: br→newline, paragraph regroup, split-trim-dropempty")

  /** q07 — P7 knowledge-list parser: the three reference formats,
    * constructed per row from the first three words of `text`; the oracle
    * states the closed-form expected parse.
    */
  private val q07 = Q(
    "q07_list_parse",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val w1 = element_at(split(col("text"), " "), 1)
      val w2 = element_at(split(col("text"), " "), 2)
      val w3 = element_at(split(col("text"), " "), 3)
      val kt = when(col("doc_id") % 3 === 0,
        concat(lit("junk\n・"), w1, lit("\n"), w2, lit("\n\n・"), w3))
        .when(col("doc_id") % 3 === 1,
          concat(lit("intro\n１．"), w1, lit("\n"), w2, lit("\n2."), w3,
            lit("\n３．end")))
        .otherwise(concat(w1, lit(" "), w2, lit(".")))
      val items = TextOps.knowledgeParse(kt)
      docs.select(
        col("doc_id"),
        array_join(items, "|").as("items"),
        size(items).as("n_items"))
        .orderBy("doc_id")
    },
    Some("""
      WITH w AS (
        SELECT doc_id,
          split_part(text, ' ', 1) AS w1,
          split_part(text, ' ', 2) AS w2,
          split_part(text, ' ', 3) AS w3
        FROM documents)
      SELECT doc_id,
        CASE cast(doc_id % 3 AS INTEGER)
          WHEN 0 THEN w1 || w2 || '|' || w3
          WHEN 1 THEN w1 || w2 || '|' || w3 || '|end'
          ELSE w1 || ' ' || w2 || '.' END AS items,
        CASE cast(doc_id % 3 AS INTEGER) WHEN 0 THEN 2 WHEN 1 THEN 3 ELSE 1 END AS n_items
      FROM w ORDER BY doc_id
    """),
    doc = "P7: 3-format knowledge-list fold (bullet/numbered/fallback)")

  val all: Seq[Q] = Seq(q03, q04, q05, q06, q07)
}
