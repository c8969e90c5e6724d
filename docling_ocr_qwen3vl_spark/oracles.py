"""DuckDB oracle SQL — independent derivations of each query's result.

The driver registers the sf parquet files as views named
``region nation customer supplier part orders lineitem events documents
embeddings`` and runs these strings side-by-side with ``queries.py``.

These oracles do NOT re-run the engine: where the Spark side parses payloads
through the real UDF path, the oracle enumerates the expected output
directly from the base tables (the synthetic corpus is a pure function of
(doc_id, text), see sources/synthetic.py), which makes the comparison an
actual end-to-end check rather than a tautology.
"""

# Shared fragment: whitespace-token array per document (>=10 words per doc).
_WORDS_CTE = r"""
docs AS (
  SELECT doc_id AS doc_num,
         CAST(doc_id AS VARCHAR) AS doc_id,
         text,
         n_chars,
         list_filter(regexp_split_to_array(trim(text), '\s+'), w -> w != '') AS ws
  FROM documents
)
"""

# html grammar variant (doc_num % 16, sources/synthetic.py:_html_payload):
# the slot-1 body TEXT gains a deterministic suffix for the style-leak
# (v=8) and charref (v=15) variants; tags/types/bboxes vary but span
# kind/order stay identical across variants (the img is always the 3rd
# kept element).  v<12 = flat fast-path grammar (the representative mix).
_HTML_BODY_SUFFIX = (
    "(CASE doc_num % 16 WHEN 8 THEN ' p{margin:0}' "
    "WHEN 15 THEN ' & co' ELSE '' END)"
)

# Flagship: the expected span stream, slot-enumerated.
# Page kinds cycle (doc+page)%4: 0 html, 1 plain, 2 layout, 3 table.
#  html slots  : 0 h1=W(1,2) text | 1 body=W(3,8)+variant-suffix text
#                | 2 img media | 3 p=W(9,10) text
#  plain slots : 0 W(1,4) | 1 W(5,8) | 2 W(9,10)  (all text)
#  layout slots: 0 picture media | 1 table media   (title/text clusters carry no text)
#  table slots : 0 media unless doc_num % 11 == 0 (rows=0 -> null table)
EXTRACT_SPANS_SQL = (
    "WITH "
    + _WORDS_CTE
    + r""",
pages AS (
  SELECT doc_id, doc_num, ws,
         unnest(generate_series(0, CAST(doc_num % 3 AS BIGINT))) AS page_no
  FROM docs
),
slots AS (
  SELECT p.*, ((doc_num + page_no) % 4) AS kind_idx, s.slot_no
  FROM pages p
  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS slot_no) s
),
raw_elems AS (
  SELECT doc_id, doc_num, page_no, slot_no,
    CASE
      WHEN kind_idx = 0 THEN (CASE WHEN slot_no = 2 THEN 'media_ref' ELSE 'text' END)
      WHEN kind_idx = 1 THEN (CASE WHEN slot_no <= 2 THEN 'text' END)
      WHEN kind_idx = 2 THEN (CASE WHEN slot_no <= 1 THEN 'media_ref' END)
      ELSE (CASE WHEN slot_no = 0 AND doc_num % 11 <> 0 THEN 'media_ref' END)
    END AS kind,
    CASE
      WHEN kind_idx = 0 THEN (CASE slot_no
        WHEN 0 THEN array_to_string(ws[1:2], ' ')
        WHEN 1 THEN array_to_string(ws[3:8], ' ') || """ + _HTML_BODY_SUFFIX + r"""
        WHEN 3 THEN array_to_string(ws[9:10], ' ')
        ELSE '' END)
      WHEN kind_idx = 1 THEN (CASE slot_no
        WHEN 0 THEN array_to_string(ws[1:4], ' ')
        WHEN 1 THEN array_to_string(ws[5:8], ' ')
        WHEN 2 THEN array_to_string(ws[9:10], ' ')
        ELSE '' END)
      ELSE ''
    END AS text
  FROM slots
),
elems AS (
  SELECT *,
    CAST(row_number() OVER (PARTITION BY doc_id, page_no ORDER BY slot_no) - 1 AS INTEGER) AS seq,
    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY page_no, slot_no) - 1 AS INTEGER) AS "offset"
  FROM raw_elems
  WHERE kind IS NOT NULL
)
SELECT doc_id, "offset", kind, text,
  CASE WHEN kind = 'media_ref'
       THEN 'media://' || doc_id || '/' || page_no || '/' || seq
       ELSE '' END AS media_ref
FROM elems
"""
)

# q_text_cleanup: T2 strip-tags (independent regex derivation), M4 think
# strip (the oracle knows the stripped form is exactly the original text),
# M10 repo-id normalization (enumerated arithmetically)
TEXT_CLEANUP_SQL = r"""
SELECT doc_id,
  regexp_replace(
    regexp_replace(regexp_replace(
      '<div data-bbox="0 0 10 10">' || text || '</div><style>p{margin:0}</style>',
      '<[^>]+>', ' ', 'g'), '^\s+|\s+$', '', 'g'),
    '\s+', ' ', 'g') AS clean_text,
  text AS out_text,
  'owner' || CAST(doc_id % 7 AS VARCHAR)
    || CASE WHEN doc_id % 3 = 0 THEN '--extra' ELSE '' END
    || '/repo' || CAST(doc_id % 5 AS VARCHAR) AS repo_id
FROM documents
"""

JSON_REPAIR_EXPRS_SQL = """
SELECT doc_id,
  '{"y1":' || CAST(n_chars % 997 AS VARCHAR) || ',"x2":5}' AS fixed_key,
  '[{"a":' || CAST(n_chars % 31 AS VARCHAR) || '}]' AS fixed_commas,
  '{"v":' || CAST(n_chars % 113 AS VARCHAR) || '}' AS block
FROM documents
"""

PARAGRAPH_CELLS_SQL = (
    "WITH "
    + _WORDS_CTE
    + r""",
paras AS (
  SELECT doc_id, doc_num, s.slot_no AS seq,
    CASE WHEN doc_num % 4 = 0 THEN
      (CASE s.slot_no
        WHEN 0 THEN array_to_string(ws[1:2], ' ')
        WHEN 1 THEN array_to_string(ws[3:4], ' ')
        WHEN 2 THEN array_to_string(ws[5:6], ' ') END)
    ELSE
      (CASE s.slot_no
        WHEN 0 THEN array_to_string(ws[1:4], ' ')
        WHEN 1 THEN array_to_string(ws[5:8], ' ') || chr(10) || array_to_string(ws[9:10], ' ')
        END)
    END AS paragraph
  FROM docs
  CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS slot_no) s
),
kept AS (SELECT * FROM paras WHERE paragraph IS NOT NULL),
sized AS (
  SELECT *, CAST(count(*) OVER (PARTITION BY doc_id) AS DOUBLE) AS n FROM kept
)
SELECT CAST(doc_num AS BIGINT) AS doc_id,
  CAST(seq AS INTEGER) AS idx,
  paragraph AS cell_text,
  round(CAST(doc_num % 3 AS DOUBLE) * 10.0, 6) AS l,
  round(20.0 + seq * (300.0 / n), 6) AS t,
  round(CAST(doc_num % 3 AS DOUBLE) * 10.0 + 600.0, 6) AS r,
  round(20.0 + (seq + 1) * (300.0 / n), 6) AS b
FROM sized
"""
)

BBOX_RESCALE_SQL = """
WITH base AS (
  SELECT doc_id,
    CAST(doc_id * 37 % 500 AS DOUBLE) AS x1,
    CAST(doc_id * 53 % 500 AS DOUBLE) AS y1,
    1000.0 + CAST(doc_id % 3 AS DOUBLE) * 240.0 AS width
  FROM documents
)
SELECT doc_id,
  round(x1 / 1000.0 * width, 6) AS l,
  round(y1 / 1000.0 * 1400.0, 6) AS t,
  round((x1 + 100.0 + CAST(doc_id % 7 AS DOUBLE) * 20.0) / 1000.0 * width, 6) AS r,
  round((y1 + 80.0) / 1000.0 * 1400.0, 6) AS b
FROM base
"""

OTSL_SKELETON_SQL = """
WITH base AS (
  SELECT doc_id,
    CAST(doc_id % 3 + 1 AS INTEGER) AS n_rows,
    CAST(doc_id % 2 + 2 AS INTEGER) AS n_cols,
    'cell' || repeat(' l cell', CAST(doc_id % 2 + 1 AS INTEGER)) AS row_str
  FROM documents
)
SELECT doc_id, n_rows, n_cols,
  row_str || repeat(' nl ' || row_str, n_rows - 1) AS otsl
FROM base
"""

READING_ORDER_SQL = """
WITH elems AS (
  SELECT doc_id, s.slot_no,
    CAST((doc_id + s.slot_no * 37) % 50 AS DOUBLE) * 17.0 AS t,
    CAST((doc_id + s.slot_no * 61) % 40 AS DOUBLE) * 20.0 AS l
  FROM documents
  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS slot_no) s
)
SELECT doc_id,
  CAST(slot_no AS INTEGER) AS slot_no,
  round(t, 6) AS t,
  round(l, 6) AS l,
  CAST(row_number() OVER (
    PARTITION BY doc_id ORDER BY floor(t / 24.0), l, slot_no) - 1 AS INTEGER) AS rank
FROM elems
"""

CONFIDENCE_AGG_SQL = """
WITH clusters AS (
  SELECT doc_id,
    CAST((doc_id + s.cluster_id * 3) % 10 AS DOUBLE) / 10.0 AS confidence
  FROM documents
  CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS cluster_id) s
)
SELECT doc_id, round(avg(confidence), 6) AS layout_score
FROM clusters GROUP BY doc_id
"""

DOC_FINGERPRINTS_SQL = (
    "WITH " + _WORDS_CTE + r"""
SELECT CAST(doc_num AS BIGINT) AS doc_id,
  md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
  list_reduce(
    list_transform(ws, w -> (('0x' || substr(md5(w), 1, 15))::BIGINT) % 2147483647),
    (acc, h) -> (acc * 1000003 + h) % 2147483647) AS rolling_fp
FROM docs
"""
)

DEDUP_EXACT_SQL = r"""
SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
  min(doc_id) AS keeper,
  CAST(count(*) AS BIGINT) AS n_dups
FROM documents GROUP BY 1
"""

DOC_STATS_SQL = (
    "WITH " + _WORDS_CTE + r"""
SELECT CAST(doc_num AS BIGINT) AS doc_id,
  CAST(len(ws) AS INTEGER) AS n_tokens,
  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]')) AS INTEGER)
    AS n_bpe_tokens,
  round(CAST(list_sum(list_transform(ws, w -> len(w))) AS DOUBLE)
        / CAST(len(ws) AS DOUBLE), 6) AS mean_token_len,
  round(CAST(len(list_filter(ws,
        w -> w IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
        / CAST(len(ws) AS DOUBLE), 6) AS stopword_ratio
FROM docs
"""
)

# Gopher-style rule gate (word count / mean word length / symbol ratio /
# ellipsis-line ratio); '/' on integers is double division in BOTH engines
QUALITY_FILTER_RULES_SQL = (
    "WITH " + _WORDS_CTE + r""",
m AS (
  SELECT CAST(doc_num AS BIGINT) AS doc_id,
    CAST(len(ws) AS DOUBLE) AS n,
    CAST(list_sum(list_transform(ws, w -> len(w))) AS DOUBLE)
      / CAST(len(ws) AS DOUBLE) AS mean_len,
    (strlen(text) - strlen(replace(text, '#', ''))
     + (strlen(text) - strlen(replace(text, '...', ''))) / 3)
      / CAST(len(ws) AS DOUBLE) AS symbol_ratio,
    CAST(len(list_filter(string_split(text, chr(10)),
                         ln -> regexp_matches(ln, '\.\.\.$'))) AS DOUBLE)
      / CAST(len(string_split(text, chr(10))) AS DOUBLE) AS ell_ratio,
    CAST(len(string_split(text, chr(10)))
         - len(list_distinct(string_split(text, chr(10)))) AS DOUBLE)
      / CAST(len(string_split(text, chr(10))) AS DOUBLE) AS dup_line_fraction,
    CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]'))) AS DOUBLE)
      / CAST(len(ws) AS DOUBLE) AS alpha_ratio,
    list_transform(range(1, greatest(len(ws) - 1, 1) + 1),
                   i -> array_to_string(ws[i:i+1], ' ')) AS grams
  FROM docs
),
g AS (SELECT doc_id, unnest(grams) AS gram FROM m),
t AS (
  SELECT doc_id, CAST(max(cnt) AS DOUBLE) AS top_cnt
  FROM (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram)
  GROUP BY doc_id
),
m2 AS (
  SELECT m.*, t.top_cnt / CAST(len(m.grams) AS DOUBLE) AS top_gram_fraction
  FROM m JOIN t USING (doc_id)
)
SELECT doc_id,
  (n >= 5 AND n <= 100000) AS ok_word_count,
  (mean_len >= 2.0 AND mean_len <= 12.0) AS ok_mean_word_len,
  (symbol_ratio <= 0.1) AS ok_symbol_ratio,
  (ell_ratio <= 0.3) AS ok_ellipsis_lines,
  (dup_line_fraction <= 0.3) AS ok_dup_lines,
  (alpha_ratio >= 0.8) AS ok_alpha_words,
  (n < 5 OR top_gram_fraction <= 0.2) AS ok_top_2gram,
  ((n >= 5 AND n <= 100000) AND (mean_len >= 2.0 AND mean_len <= 12.0)
   AND symbol_ratio <= 0.1 AND ell_ratio <= 0.3
   AND dup_line_fraction <= 0.3 AND alpha_ratio >= 0.8
   AND (n < 5 OR top_gram_fraction <= 0.2)) AS keep
FROM m2
"""
)

EVENTS_SESSIONS_SQL = """
WITH o AS (
  SELECT user_id, event_id, ts,
    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
    lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w AS prev_sec
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id,
  CAST(sum(CASE WHEN prev_sec IS NOT NULL AND sec - prev_sec > 1800
                THEN 1 ELSE 0 END)
       OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER)
    AS session_id
FROM o
"""

# overlapping 4-word chunks at stride 3; DuckDB list slices clamp at the
# end exactly like Spark's slice().  The 0..63 chunk-id series bounds the
# enumeration at 193-word docs — the driver corpus caps at 99 words
# (checked); widen the series alongside any corpus change
DOC_CHUNKS_SQL = (
    "WITH " + _WORDS_CTE + """,
c AS (
  SELECT CAST(doc_num AS BIGINT) AS doc_id, ws, len(ws) AS n,
         s.i AS chunk_id
  FROM docs
  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) s
  WHERE s.i <= (len(ws) - 1) // 3
)
SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
  array_to_string(ws[chunk_id * 3 + 1 : chunk_id * 3 + 4], ' ') AS chunk_text,
  CAST(len(ws[chunk_id * 3 + 1 : chunk_id * 3 + 4]) AS INTEGER) AS n_chunk_words
FROM c
"""
)

# global concat-and-chop packing: ONE plain cumsum here (the oracle need
# not scale); the engine computes the same values with a two-level prefix
PACK_SEQUENCES_SQL = (
    "WITH " + _WORDS_CTE + """,
t AS (SELECT CAST(doc_num AS BIGINT) AS doc_id,
             CAST(len(ws) AS BIGINT) AS n_tokens FROM docs),
c AS (
  SELECT doc_id, n_tokens,
    COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
  FROM t
)
SELECT doc_id, n_tokens,
  CAST(cb // 64 AS BIGINT) AS pack_id,
  CAST(cb % 64 AS INTEGER) AS pack_offset,
  (n_tokens > 0 AND (cb // 64) <> ((cb + n_tokens - 1) // 64)) AS spans_boundary
FROM c
"""
)

PII_MASK_SQL = r"""
SELECT doc_id,
  regexp_replace(
    regexp_replace(
      regexp_replace(
        text || ' contact: user' || CAST(doc_id % 50 AS VARCHAR)
             || '@example.com via https://ex.org/p?id='
             || CAST(doc_id % 97 AS VARCHAR)
             || ' or call 5551234' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0'),
        'https?://[^\s]+', '<URL>', 'g'),
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '\d{7,}', '<NUM>', 'g') AS masked
FROM documents
"""

DECONTAMINATE_SQL = (
    "WITH " + _WORDS_CTE + """,
sh AS (
  SELECT doc_num, unnest(list_distinct(
    CASE WHEN len(ws) >= 3 THEN list_transform(range(1, len(ws) - 1),
      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
    ELSE [array_to_string(ws, ' ')] END)) AS s FROM docs
),
hashed AS (
  SELECT doc_num, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM sh
),
eval_sh AS (SELECT DISTINCT h FROM hashed WHERE doc_num % 17 = 0),
train_sh AS (
  SELECT DISTINCT doc_num, h FROM hashed WHERE doc_num % 17 <> 0
)
SELECT CAST(doc_num AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_contaminated_ngrams
FROM train_sh JOIN eval_sh USING (h)
GROUP BY doc_num
"""
)

SAMPLE_STRATIFIED_SQL = """
SELECT doc_id, lang FROM documents
WHERE ('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100
      < (CASE lang WHEN 'en' THEN 50 WHEN 'es' THEN 25 ELSE 10 END)
"""

LANG_ID_SQL = (
    "WITH " + _WORDS_CTE + r""",
hits AS (
  SELECT CAST(doc_num AS BIGINT) AS doc_id,
    CAST(len(list_filter(ws, w -> w IN ('the','and','of','to','a'))) AS INTEGER) AS en_hits,
    CAST(len(list_filter(ws, w -> w IN ('el','la','de','que','y'))) AS INTEGER) AS es_hits,
    CAST(len(list_filter(ws, w -> w IN ('der','die','das','und','ist'))) AS INTEGER) AS de_hits
  FROM docs
)
SELECT doc_id, en_hits, es_hits, de_hits,
  CASE WHEN en_hits >= es_hits AND en_hits >= de_hits THEN 'en'
       WHEN es_hits >= de_hits THEN 'es'
       ELSE 'de' END AS predicted_lang
FROM hits
"""
)

KNN_BRUTEFORCE_SQL = """
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
),
scored AS (
  SELECT e.vec_id,
    list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
      / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
         * sqrt(list_dot_product(q.qv, q.qv))) AS sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> 0
),
ranked AS (
  SELECT vec_id, sim,
    CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS INTEGER) AS rank
  FROM scored
)
SELECT vec_id, round(sim, 6) AS cosine, rank
FROM ranked WHERE rank <= 20
"""

# Shared fragment: synthetic pages with kind index (see sources/synthetic.py).
_PAGES_CTE = r"""
pages AS (
  SELECT doc_id, doc_num, ws,
         unnest(generate_series(0, CAST(doc_num % 3 AS BIGINT))) AS page_no
  FROM docs
),
kinds AS (
  SELECT *, ((doc_num + page_no) % 4) AS kind_idx,
         1000.0 + CAST(doc_num % 3 AS DOUBLE) * 240.0 AS pw,
         1400.0 + CAST(page_no % 2 AS DOUBLE) * 100.0 AS ph
  FROM pages
)
"""

# grammar variants (doc_num % 16): v=12 emits the nested li instead of the
# body p; v=14's UPPERCASE h1 carries a malformed 3-int bbox -> NULL bbox;
# v=8/v=15 suffix the body text (style leak / charref)
HTML_ELEMENTS_SQL = (
    "WITH " + _WORDS_CTE + "," + _PAGES_CTE + r""",
els AS (
  SELECT doc_id, doc_num, CAST(page_no AS INTEGER) AS page_no, s.slot_no AS seq,
    CASE WHEN s.slot_no = 0 THEN 'h1'
         WHEN s.slot_no = 1 AND doc_num % 16 = 12 THEN 'li'
         ELSE 'p' END AS tag,
    CASE WHEN s.slot_no = 0 THEN 'heading'
         WHEN s.slot_no = 1 AND doc_num % 16 = 12 THEN 'list_item'
         ELSE 'paragraph' END AS element_type,
    CASE s.slot_no
      WHEN 0 THEN array_to_string(ws[1:2], ' ')
      WHEN 1 THEN array_to_string(ws[3:8], ' ') || """ + _HTML_BODY_SUFFIX + r"""
      ELSE array_to_string(ws[9:10], ' ') END AS text,
    CASE WHEN s.slot_no = 0 AND doc_num % 16 = 14 THEN NULL ELSE 100 END AS x1,
    CASE WHEN s.slot_no = 0 AND doc_num % 16 = 14 THEN NULL
         WHEN s.slot_no = 0 THEN 40 WHEN s.slot_no = 1 THEN 120
         ELSE 820 END AS y1,
    CASE WHEN s.slot_no = 0 AND doc_num % 16 = 14 THEN NULL ELSE 900 END AS x2,
    CASE WHEN s.slot_no = 0 AND doc_num % 16 = 14 THEN NULL
         WHEN s.slot_no = 0 THEN 90 WHEN s.slot_no = 1 THEN 400
         ELSE 980 END AS y2
  FROM kinds
  CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS slot_no) s
  WHERE kind_idx = 0
)
SELECT doc_id, page_no, CAST(seq AS INTEGER) AS seq, tag, element_type, text,
       CAST(x1 AS INTEGER) AS x1, CAST(y1 AS INTEGER) AS y1,
       CAST(x2 AS INTEGER) AS x2, CAST(y2 AS INTEGER) AS y2
FROM els
"""
)

# v=14's heading has NO bbox -> full-region fallback cell (0,0,pw,ph)
ELEMENT_CELLS_SQL = (
    "WITH " + _WORDS_CTE + "," + _PAGES_CTE + r""",
els AS (
  SELECT doc_id, doc_num, CAST(page_no AS INTEGER) AS page_no,
    s.slot_no AS seq, pw, ph,
    (s.slot_no = 0 AND doc_num % 16 = 14) AS no_bbox,
    CASE s.slot_no
      WHEN 0 THEN array_to_string(ws[1:2], ' ')
      WHEN 1 THEN array_to_string(ws[3:8], ' ') || """ + _HTML_BODY_SUFFIX + r"""
      ELSE array_to_string(ws[9:10], ' ') END AS text,
    100 AS x1,
    CASE s.slot_no WHEN 0 THEN 40 WHEN 1 THEN 120 ELSE 820 END AS y1,
    900 AS x2,
    CASE s.slot_no WHEN 0 THEN 90 WHEN 1 THEN 400 ELSE 980 END AS y2
  FROM kinds
  CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS slot_no) s
  WHERE kind_idx = 0
)
SELECT doc_id, page_no, CAST(seq AS INTEGER) AS cell_index, text AS cell_text,
  round(CASE WHEN no_bbox THEN 0.0 ELSE x1 * pw / 1000.0 END, 6) AS l,
  round(CASE WHEN no_bbox THEN 0.0 ELSE y1 * ph / 1000.0 END, 6) AS t,
  round(CASE WHEN no_bbox THEN pw ELSE x2 * pw / 1000.0 END, 6) AS r,
  round(CASE WHEN no_bbox THEN ph ELSE y2 * ph / 1000.0 END, 6) AS b
FROM els
"""
)

LAYOUT_CLUSTERS_SQL = (
    "WITH " + _WORDS_CTE + "," + _PAGES_CTE + r""",
cl AS (
  SELECT doc_id, CAST(page_no AS INTEGER) AS page_no, s.slot_no AS cluster_id,
    pw, ph,
    CASE s.slot_no WHEN 0 THEN 'title' WHEN 1 THEN 'text'
                   WHEN 2 THEN 'picture' ELSE 'table' END AS label,
    CASE s.slot_no WHEN 2 THEN 100 ELSE 100 END AS x1,
    CASE s.slot_no WHEN 0 THEN 40
                   WHEN 1 THEN 120 + CAST(doc_num % 7 AS INTEGER) * 10
                   WHEN 2 THEN 420 ELSE 820 END AS y1,
    CASE s.slot_no WHEN 2 THEN 500 ELSE 900 END AS x2,
    CASE s.slot_no WHEN 0 THEN 90 WHEN 1 THEN 400 WHEN 2 THEN 800 ELSE 980 END AS y2
  FROM kinds
  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS slot_no) s
  WHERE kind_idx = 2
)
SELECT doc_id, page_no, CAST(cluster_id AS INTEGER) AS cluster_id, label,
  CAST(0.9 AS DOUBLE) AS confidence,
  round(x1 / 1000.0 * pw, 6) AS l,
  round(y1 / 1000.0 * ph, 6) AS t,
  round(x2 / 1000.0 * pw, 6) AS r,
  round(y2 / 1000.0 * ph, 6) AS b
FROM cl
"""
)

TABLE_CELLS_SQL = (
    "WITH " + _WORDS_CTE + "," + _PAGES_CTE + r""",
tbl AS (
  SELECT doc_id, CAST(page_no AS INTEGER) AS page_no, ws,
    CAST(doc_num % 3 + 1 AS INTEGER) AS n_rows,
    CAST(page_no % 2 + 2 AS INTEGER) AS n_cols
  FROM kinds
  WHERE kind_idx = 3 AND doc_num % 11 <> 0
),
named AS (
  SELECT *, 'cell' || repeat(' l cell', n_cols - 1) AS row_str FROM tbl
)
SELECT doc_id, page_no, n_rows, n_cols,
  row_str || repeat(' nl ' || row_str, n_rows - 1) AS otsl,
  CAST(0 AS INTEGER) AS cell_row,
  CAST(s.c AS INTEGER) AS cell_col,
  CAST(1 AS INTEGER) AS row_span,
  CAST(1 AS INTEGER) AS col_span,
  CAST(1 AS INTEGER) AS end_row,
  CAST(s.c + 1 AS INTEGER) AS end_col,
  (CASE s.c WHEN 0 THEN ws[1] ELSE ws[2] END) AS cell_text,
  (s.c = 0) AS col_header,
  CAST(CASE s.c WHEN 0 THEN 0.0 ELSE 500.0 END AS DOUBLE) AS cx1,
  CAST(0.0 AS DOUBLE) AS cy1,
  CAST(CASE s.c WHEN 0 THEN 500.0 ELSE 1000.0 END AS DOUBLE) AS cx2,
  CAST(100.0 AS DOUBLE) AS cy2
FROM named
CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS c) s
"""
)

PICTURE_CLASSIFY_SQL = """
WITH base AS (SELECT doc_id, doc_id % 3 AS m FROM documents)
SELECT doc_id, 'chart' AS class_name, CAST(0.8 AS DOUBLE) AS confidence FROM base WHERE m = 0
UNION ALL
SELECT doc_id, 'other', CAST(0.2 AS DOUBLE) FROM base WHERE m = 0
UNION ALL
SELECT doc_id, 'logo', CAST(0.5 AS DOUBLE) FROM base WHERE m = 1
"""

CODE_FORMULA_ENRICH_SQL = (
    "WITH " + _WORDS_CTE + r"""
SELECT CAST(doc_num AS BIGINT) AS doc_id,
  CASE WHEN doc_num % 4 = 2 THEN 'formula' ELSE 'code' END AS elem_kind,
  CASE doc_num % 4
    WHEN 0 THEN 'print(' || CAST(n_chars % 97 AS VARCHAR) || ')'
    WHEN 1 THEN 'x'
    WHEN 2 THEN 'E=mc^2'
    ELSE array_to_string(ws[1:2], ' ') END AS out_text,
  CASE doc_num % 4
    WHEN 0 THEN 'python'
    WHEN 1 THEN 'unknown'
    ELSE NULL END AS language
FROM docs
"""
)

CLUSTER_ASSIGN_SQL = """
WITH base AS (SELECT doc_id FROM documents),
cells AS (
  SELECT doc_id, s.cell_index,
    CASE s.cell_index WHEN 0 THEN 'in-c0' WHEN 1 THEN 'in-c1'
                      WHEN 2 THEN 'orphan' ELSE 'overlap' END AS cell_text
  FROM base CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS cell_index) s
)
SELECT doc_id, CAST(cell_index AS INTEGER) AS cell_index, cell_text,
  CAST(CASE cell_index WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN -3 ELSE 0 END AS INTEGER) AS cluster_id,
  CASE cell_index WHEN 1 THEN 'table' ELSE 'text' END AS label,
  (cell_index = 2) AS is_orphan
FROM cells
"""

# IoU(shift d, both axes) = (100-d)^2 / (20000-(100-d)^2): d=0 -> 1.0,
# d=4 -> 0.855 (dropped at 0.8), d=8 -> 0.734 (kept) — hence doc_id%7 <= 1
CELL_DEDUPE_SQL = """
WITH base AS (
  SELECT doc_id, CAST(doc_id % 7 AS DOUBLE) * 4.0 AS d FROM documents
),
cells AS (
  SELECT doc_id, s.ci, d
  FROM base CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS ci) s
  WHERE NOT (s.ci = 1 AND doc_id % 7 <= 1)
)
SELECT doc_id, CAST(ci AS INTEGER) AS cell_index,
  CASE ci WHEN 0 THEN 'base' WHEN 1 THEN 'dup'
          WHEN 2 THEN 'right' ELSE 'partial' END AS cell_text,
  round(CASE ci WHEN 0 THEN 0.0 WHEN 1 THEN d WHEN 2 THEN 200.0 ELSE 250.0 END, 6) AS l,
  round(CASE ci WHEN 1 THEN d ELSE 0.0 END, 6) AS t,
  round(CASE ci WHEN 0 THEN 100.0 WHEN 1 THEN d + 100.0
                WHEN 2 THEN 300.0 ELSE 350.0 END, 6) AS r,
  round(CASE ci WHEN 1 THEN d + 100.0 ELSE 100.0 END, 6) AS b
FROM cells
"""

CHECKPOINT_RESUME_SQL = """
WITH g AS (
  SELECT doc_id,
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS INTEGER) AS group_id
  FROM documents
)
SELECT doc_id, group_id FROM g WHERE group_id NOT IN (0, 1)
"""

# --------------------------------------- training-data pipeline (batch 3)
# md5-derived 60-bit hash — identical to operators.dedup.portable_hash64
def _hx(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


# word-3-gram shingles over the ws array.  The short-doc branch mirrors the
# engine's word_shingles exactly (one SHORTER shingle when < 3 words; a ''
# shingle for empty docs) so the oracles stay valid on ANY corpus, not just
# the >= 10-word driver tables.
_SHINGLES = (
    "(CASE WHEN len(ws) >= 3 THEN list_transform(range(1, len(ws) - 1), "
    "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) "
    "ELSE [array_to_string(ws, ' ')] END)"
)

# originals + planted near-duplicates (doc_id + 1,000,000, ' zz qq' appended)
_MUTANT_DOCS_CTE = r"""
docs AS (
  SELECT doc_id AS doc_num, text, lang,
         list_filter(regexp_split_to_array(trim(text), '\s+'), w -> w != '') AS ws
  FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text || ' zz qq', lang,
         list_filter(regexp_split_to_array(trim(text || ' zz qq'), '\s+'), w -> w != '')
  FROM documents
)
"""

_H_EXPRS = ",\n    ".join(
    f"list_min(list_transform(sh, s -> {_hx(f_expr)})) AS h{j}"
    for j, f_expr in ((j, f"s || '#{j}'") for j in range(8))
)

_MINHASH_CORE = r"""
sh AS (SELECT doc_num, {shingles} AS sh FROM docs),
sigs AS (
  SELECT doc_num AS doc_id,
    {h_exprs}
  FROM sh
),
banded AS (
  SELECT *,
    md5(CAST(h0 AS VARCHAR) || ',' || CAST(h1 AS VARCHAR) || ',' ||
        CAST(h2 AS VARCHAR) || ',' || CAST(h3 AS VARCHAR)) AS band0,
    md5(CAST(h4 AS VARCHAR) || ',' || CAST(h5 AS VARCHAR) || ',' ||
        CAST(h6 AS VARCHAR) || ',' || CAST(h7 AS VARCHAR)) AS band1
  FROM sigs
)
""".format(shingles=_SHINGLES, h_exprs=_H_EXPRS)

# _WORDS_CTE already exposes (doc_num, ws), which is all _MINHASH_CORE needs
MINHASH_SIGNATURE_SQL = (
    "WITH " + _WORDS_CTE + "," + _MINHASH_CORE + """
SELECT CAST(doc_id AS BIGINT) AS doc_id, h0, h1, h2, h3, h4, h5, h6, h7,
       band0, band1
FROM banded
"""
)

LSH_DUP_PAIRS_SQL = (
    "WITH " + _MUTANT_DOCS_CTE + "," + _MINHASH_CORE + """
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM (
  SELECT a.doc_id, b.doc_id AS b_doc
  FROM banded a JOIN banded b ON a.band0 = b.band0
  UNION ALL
  SELECT a.doc_id, b.doc_id
  FROM banded a JOIN banded b ON a.band1 = b.band1
) pr(doc_id, b_doc)
JOIN banded a ON a.doc_id = pr.doc_id
JOIN banded b ON b.doc_id = pr.b_doc
WHERE pr.doc_id < pr.b_doc
"""
)

# fast multiply-shift MinHash (operators/dedup.py minhash_signature_fast):
# salt_j = ((j*MULT + ADD) % 2^64) % 2^60; lane = ((h XOR salt_j) * MULT
# % 2^64) >> 4.  numpy wraps uint64 natively; HUGEINT % 2^64 replicates it.
_FAST_SALT = (
    "CAST(((CAST(j AS HUGEINT) * 11400714819323198485 + 15112296128964570371)"
    " % 18446744073709551616) % 1152921504606846976 AS BIGINT)"
)
_FAST_LANE = (
    "CAST(((CAST(xor(h, " + _FAST_SALT + ") AS HUGEINT) * 11400714819323198485)"
    " % 18446744073709551616) // 16 AS BIGINT)"
)

MINHASH_FAST_SQL = (
    "WITH " + _WORDS_CTE + """,
hs AS (SELECT doc_num, list_transform(""" + _SHINGLES + ", s -> " + _hx("s") + """) AS hs FROM docs),
sigs AS (
  SELECT doc_num AS doc_id,
    list_transform(range(0, 64), j ->
      list_min(list_transform(hs, h -> """ + _FAST_LANE + """))) AS sig
  FROM hs
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  array_to_string(sig, ',') AS sig,
"""
    + ",\n".join(
        f"  md5(array_to_string(sig[{b * 8 + 1}:{(b + 1) * 8}], ',')) AS band{b}"
        for b in range(8)
    )
    + """
FROM sigs
"""
)

# fast-kernel (k=64/8-band) banded candidate pairs over the mutant corpus
_FAST_BANDED_CORE = (
    """
hs AS (SELECT doc_num, list_transform(""" + _SHINGLES + ", s -> " + _hx("s") + """) AS hs FROM docs),
fsig AS (
  SELECT doc_num AS doc_id,
    list_transform(range(0, 64), j ->
      list_min(list_transform(hs, h -> """ + _FAST_LANE + """))) AS sig
  FROM hs
),
fbanded AS (
  SELECT doc_id,
"""
    + ",\n".join(
        f"    md5(array_to_string(sig[{b * 8 + 1}:{(b + 1) * 8}], ',')) AS band{b}"
        for b in range(8)
    )
    + """
  FROM fsig
)
"""
)

LSH_DUP_PAIRS_FAST_SQL = (
    "WITH " + _MUTANT_DOCS_CTE + "," + _FAST_BANDED_CORE + """
SELECT DISTINCT da AS doc_a, db AS doc_b
FROM (
"""
    + "\n  UNION ALL\n".join(
        f"  SELECT a.doc_id AS da, b.doc_id AS db FROM fbanded a "
        f"JOIN fbanded b ON a.band{b} = b.band{b}"
        for b in range(8)
    )
    + """
) t
WHERE da < db
"""
)

# fast-kernel components: same recursive-CTE fixpoint over the k=64/8-band
# pair graph (the config-wired near_duplicate_components sweep)
DUP_COMPONENTS_FAST_SQL = (
    "WITH RECURSIVE " + _MUTANT_DOCS_CTE + "," + _FAST_BANDED_CORE + """,
prs AS (
  SELECT DISTINCT da AS doc_a, db AS doc_b
  FROM (
"""
    + "\n  UNION ALL\n".join(
        f"  SELECT a.doc_id AS da, b.doc_id AS db FROM fbanded a "
        f"JOIN fbanded b ON a.band{b} = b.band{b}"
        for b in range(8)
    )
    + """
) t
  WHERE da < db
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM prs
  UNION ALL
  SELECT doc_b, doc_a FROM prs
),
lbl(id, l) AS (
  SELECT doc_num, doc_num FROM docs
  UNION
  SELECT e.dst, lbl.l FROM lbl JOIN edges e ON e.src = lbl.id
)
SELECT CAST(id AS BIGINT) AS doc_id, CAST(min(l) AS BIGINT) AS component
FROM lbl GROUP BY id
"""
)

# connected components over the LSH pair graph: the recursive CTE floods
# every reachable label through the (bidirectional) edges; min per node ==
# the lattice fixpoint the Spark min-label propagation converges to
DUP_COMPONENTS_SQL = (
    "WITH RECURSIVE " + _MUTANT_DOCS_CTE + "," + _MINHASH_CORE + """,
prs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM (
    SELECT a.doc_id, b.doc_id AS b_doc
    FROM banded a JOIN banded b ON a.band0 = b.band0
    UNION ALL
    SELECT a.doc_id, b.doc_id
    FROM banded a JOIN banded b ON a.band1 = b.band1
  ) pr(doc_id, b_doc)
  JOIN banded a ON a.doc_id = pr.doc_id
  JOIN banded b ON b.doc_id = pr.b_doc
  WHERE pr.doc_id < pr.b_doc
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM prs
  UNION ALL
  SELECT doc_b, doc_a FROM prs
),
lbl(id, l) AS (
  SELECT doc_num, doc_num FROM docs
  UNION
  SELECT e.dst, lbl.l FROM lbl JOIN edges e ON e.src = lbl.id
)
SELECT CAST(id AS BIGINT) AS doc_id, CAST(min(l) AS BIGINT) AS component
FROM lbl GROUP BY id
"""
)

# survivors = component representatives (id == component min)
DEDUP_SURVIVORS_SQL = DUP_COMPONENTS_SQL.replace(
    """SELECT CAST(id AS BIGINT) AS doc_id, CAST(min(l) AS BIGINT) AS component
FROM lbl GROUP BY id""",
    """SELECT CAST(id AS BIGINT) AS doc_id
FROM lbl GROUP BY id HAVING min(l) = id""",
)

# streaming incremental dedup replayed as four deterministic micro-batches
# (streaming/incremental_dedup.py semantics, declaratively): batch =
# (doc_id + 1 for mutants, doc_id for originals) % 4 — the +1 shifts every
# mutant (doc_id >= 1,000,000, offset itself ≡ 0 mod 4) one batch past its
# original (wrapping to batch 0, i.e. BEFORE it, for doc_id % 4 == 3), so
# planted near-dup pairs always span micro-batches; per batch,
# in-batch components over
# the fast-kernel banded pair graph RESTRICTED to same-batch edges; then a
# component whose ANY member shares a band key with ANY earlier-batch doc
# (accepted OR dropped — the store keeps every seen doc's keys) is
# contaminated and its representative drops too.  Survivors = uncontaminated
# in-batch representatives.  The engine side compacts the store mid-replay
# (compact_every=2); this oracle is deliberately LAYOUT-INDEPENDENT —
# contamination is defined over earlier-batch keys, however stored — so the
# hash check also gates compaction's key-preservation.
STREAMING_DEDUP_SURVIVORS_SQL = (
    "WITH RECURSIVE " + _MUTANT_DOCS_CTE + "," + _FAST_BANDED_CORE + """,
fb AS (SELECT fbanded.*,
       (doc_id + CASE WHEN doc_id >= 1000000 THEN 1 ELSE 0 END) % 4 AS batch
  FROM fbanded),
keys AS (
  SELECT DISTINCT doc_id, batch, band_key FROM (
"""
    + "\n    UNION ALL\n".join(
        f"    SELECT doc_id, batch, '{b}:' || band{b} AS band_key FROM fb"
        for b in range(8)
    )
    + """
  ) t
),
prs AS (
  SELECT DISTINCT k1.doc_id AS doc_a, k2.doc_id AS doc_b
  FROM keys k1 JOIN keys k2
    ON k1.band_key = k2.band_key AND k1.batch = k2.batch
   AND k1.doc_id < k2.doc_id
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM prs
  UNION ALL
  SELECT doc_b, doc_a FROM prs
),
lbl(id, l) AS (
  SELECT doc_num, doc_num FROM docs
  UNION
  SELECT e.dst, lbl.l FROM lbl JOIN edges e ON e.src = lbl.id
),
comp AS (SELECT id, min(l) AS component FROM lbl GROUP BY id),
contaminated AS (
  SELECT DISTINCT c.component
  FROM keys k
  JOIN keys p ON p.band_key = k.band_key AND p.batch < k.batch
  JOIN comp c ON c.id = k.doc_id
)
SELECT CAST(id AS BIGINT) AS doc_id
FROM comp
WHERE id = component
  AND component NOT IN (SELECT component FROM contaminated)
"""
)

# merged registry row: the batch pipeline survivors next to the streaming
# availableNow replay survivors, under a mode key; the embedding-stream
# arm is appended below once the shared plane-projection helpers exist
DEDUP_SURVIVORS_BOTH_SQL = (
    "SELECT doc_id, 'batch' AS mode FROM (\n"
    + DEDUP_SURVIVORS_SQL
    + ")\nUNION ALL\nSELECT doc_id, 'streaming' AS mode FROM (\n"
    + STREAMING_DEDUP_SURVIVORS_SQL
    + ")"
)

# merged registry rows: both kernels unioned under a kernel key (DuckDB
# allows WITH RECURSIVE inside a derived table)
LSH_DUP_PAIRS_BOTH_SQL = (
    "SELECT doc_a, doc_b, 'md5_k8' AS kernel FROM (\n"
    + LSH_DUP_PAIRS_SQL
    + ")\nUNION ALL\nSELECT doc_a, doc_b, 'fast_k64' AS kernel FROM (\n"
    + LSH_DUP_PAIRS_FAST_SQL
    + ")"
)

DUP_COMPONENTS_BOTH_SQL = (
    "SELECT doc_id, component, 'md5_k8' AS kernel FROM (\n"
    + DUP_COMPONENTS_SQL
    + ")\nUNION ALL\nSELECT doc_id, component, 'fast_k64' AS kernel FROM (\n"
    + DUP_COMPONENTS_FAST_SQL
    + ")"
)

_SIMHASH_CORE = (
    """
hs AS (SELECT doc_num AS doc_id, list_transform("""
    + _SHINGLES
    + """, s -> """
    + _hx("s")
    + """) AS hs FROM docs),
sims AS (
  SELECT doc_id,
    CAST(list_sum(list_transform(range(0, 60), b ->
      CASE WHEN len(list_filter(hs, h -> ((h >> b) & 1) = 1)) * 2 > len(hs)
           THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)) AS BIGINT)
      AS simhash
  FROM hs
)
"""
)

SIMHASH_SQL = (
    "WITH " + _WORDS_CTE + "," + _SIMHASH_CORE + """
SELECT CAST(doc_id AS BIGINT) AS doc_id, simhash FROM sims
"""
)

# pigeonhole banding: 10 disjoint 6-bit blocks of the 60-bit signature;
# any pair with hamming <= 8 agrees on >= 2 whole blocks, so the union of
# per-block equi-joins has guaranteed recall (matches operators/dedup.py)
SIMHASH_PAIRS_SQL = (
    "WITH " + _MUTANT_DOCS_CTE + "," + _SIMHASH_CORE + """,
blocks AS (
  SELECT doc_id, simhash, b.bid, (simhash >> (6 * b.bid)) & 63 AS bval
  FROM sims CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bid) b
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM blocks a JOIN blocks b ON a.bid = b.bid AND a.bval = b.bval
WHERE a.doc_id < b.doc_id
  AND bit_count(xor(a.simhash, b.simhash)) <= 8
"""
)

NGRAM_JACCARD_SQL = (
    "WITH " + _MUTANT_DOCS_CTE + ",\n"
    + "shd AS (SELECT doc_num AS doc_id, lang, list_distinct(" + _SHINGLES + ") AS sh FROM docs)"
    + """
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE),
        6) AS jaccard
FROM shd a JOIN shd b ON a.lang = b.lang
WHERE a.doc_id < b.doc_id
  AND round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE),
        6) >= 0.5
"""
)

# integer-derived hyperplanes, identical to operators.similarity._plane_weight
def _proj(j: int, vec: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({vec}) + 1), "
        f"k -> {vec}[k] * CAST((({j} * 2654435761 + (k - 1) * 40503) % 1000 - 500) AS DOUBLE)))"
    )


def _bucket(vec: str) -> str:
    return " || ".join(
        f"(CASE WHEN {_proj(j, vec)} >= 0 THEN '1' ELSE '0' END)" for j in range(8)
    )


# EMBEDDING streaming incremental dedup, declaratively (the
# streaming/incremental_dedup.py embedding path replayed as four
# micro-batches): the planted corpus is q_embedding_near_dup's (originals
# + exact copies at vec_id + 100,000); batch = (vec_id + 1 for copies) % 4
# (the copy offset is ≡ 0 mod 4 — same trap and same fix as the text
# replay); band keys are 4 x 8-plane sign patterns over the shared
# deterministic plane grid (band 0 IS the batch embedding_near_dup
# bucket); in-batch candidate pairs (same-batch key collisions) are
# verified with TRUE cosine >= 0.95 before forming components (the batch
# holds its vectors); cross-batch key collisions contaminate the whole
# component UNVERIFIED (the store keeps keys, never vectors).  Gate-corpus
# safety of the float verify was measured: no candidate cosine within
# 1e-6 of the threshold at sf0.001/sf0.01, so summation-order ulps cannot
# flip a pair.
# Two band geometries, one grid (incremental_dedup.EMBEDDING_N_PLANES /
# EMBEDDING_CAND_PLANES): 32-plane bands for the STORE (the wide key
# space that keeps the unverified cross-batch drop sound — see the
# engine module's saturation note) and 8-plane bands for the IN-BATCH
# candidates (narrow = high candidate recall at the threshold; false
# collisions are cosine-verified away)
def _eband_pattern(b: int, vec: str, planes: int = 32) -> str:
    return "'e" + str(b) + ":' || " + " || ".join(
        f"(CASE WHEN {_proj(b * planes + j, vec)} >= 0 THEN '1' ELSE '0' END)"
        for j in range(planes)
    )


EMBEDDING_STREAMING_SURVIVORS_SQL = (
    "WITH RECURSIVE eb AS (\n"
    "  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings\n"
    "  UNION ALL\n"
    "  SELECT vec_id + 100000, CAST(embedding AS DOUBLE[]) FROM embeddings\n"
    "),\n"
    "fb AS (SELECT vec_id, v,\n"
    "  (vec_id + CASE WHEN vec_id >= 100000 THEN 1 ELSE 0 END) % 4 AS batch\n"
    "  FROM eb),\n"
    "ekeys AS (\n"
    "  SELECT DISTINCT vec_id, batch, band_key FROM (\n"
    + "\n    UNION ALL\n".join(
        f"    SELECT vec_id, batch, {_eband_pattern(b, 'v')} AS band_key FROM fb"
        for b in range(4)
    )
    + "\n  ) t\n"
    "),\n"
    "ckeys AS (\n"
    "  SELECT DISTINCT vec_id, batch, band_key FROM (\n"
    + "\n    UNION ALL\n".join(
        f"    SELECT vec_id, batch, {_eband_pattern(b, 'v', planes=8)} AS band_key FROM fb"
        for b in range(4)
    )
    + "\n  ) t\n"
    "),\n"
    "cand AS (\n"
    "  SELECT DISTINCT k1.vec_id AS va, k2.vec_id AS vb\n"
    "  FROM ckeys k1 JOIN ckeys k2\n"
    "    ON k1.band_key = k2.band_key AND k1.batch = k2.batch\n"
    "   AND k1.vec_id < k2.vec_id\n"
    "),\n"
    "prs AS (\n"
    "  SELECT va AS doc_a, vb AS doc_b\n"
    "  FROM cand JOIN fb a ON a.vec_id = cand.va JOIN fb b ON b.vec_id = cand.vb\n"
    "  WHERE list_sum(list_transform(range(1, len(a.v)+1), k -> a.v[k]*b.v[k]))\n"
    "    / (sqrt(list_sum(list_transform(range(1, len(a.v)+1), k -> a.v[k]*a.v[k])))\n"
    "     * sqrt(list_sum(list_transform(range(1, len(b.v)+1), k -> b.v[k]*b.v[k]))))\n"
    "    >= 0.95\n"
    "),\n"
    "edges AS (\n"
    "  SELECT doc_a AS src, doc_b AS dst FROM prs\n"
    "  UNION ALL\n"
    "  SELECT doc_b, doc_a FROM prs\n"
    "),\n"
    "lbl(id, l) AS (\n"
    "  SELECT vec_id, vec_id FROM eb\n"
    "  UNION\n"
    "  SELECT e.dst, lbl.l FROM lbl JOIN edges e ON e.src = lbl.id\n"
    "),\n"
    "comp AS (SELECT id, min(l) AS component FROM lbl GROUP BY id),\n"
    "contaminated AS (\n"
    "  SELECT DISTINCT c.component\n"
    "  FROM ekeys k\n"
    "  JOIN ekeys p ON p.band_key = k.band_key AND p.batch < k.batch\n"
    "  JOIN comp c ON c.id = k.vec_id\n"
    ")\n"
    "SELECT CAST(id AS BIGINT) AS doc_id\n"
    "FROM comp\n"
    "WHERE id = component\n"
    "  AND component NOT IN (SELECT component FROM contaminated)\n"
)

# append the embedding-stream arm to the dedup_survivors registry row
DEDUP_SURVIVORS_BOTH_SQL = (
    DEDUP_SURVIVORS_BOTH_SQL
    + "\nUNION ALL\nSELECT doc_id, 'embedding_streaming' AS mode FROM (\n"
    + EMBEDDING_STREAMING_SURVIVORS_SQL
    + ")"
)



# PQ codebook twin of operators/similarity.py::_pq_centroid_weight /
# _pq_sub_dist2: same integer grid, same ascending-dimension accumulation
# order, same first-match (lowest-id) argmin via list_position
_PQ_SUB_DIM = 8  # 64-dim embeddings / PQ_M=8 subspaces


def _pq_sub_dist2_sql(s: int, j: int) -> str:
    base = s * _PQ_SUB_DIM
    c = (
        f"(CAST((({s * 48271 + j * 69621}::BIGINT + (k - 1)::BIGINT * 16807)"
        f" % 1000 - 500) AS DOUBLE) / 1000.0)"
    )
    return (
        f"list_sum(list_transform(range(1, {_PQ_SUB_DIM + 1}), "
        f"k -> (v[{base} + k] - {c}) * (v[{base} + k] - {c})))"
    )


def _ann_features_core() -> str:
    ds_cols = ",\n  ".join(
        "["
        + ", ".join(_pq_sub_dist2_sql(s, j) for j in range(16))
        + f"] AS ds{s}"
        for s in range(8)
    )
    codes = ", ".join(
        f"CAST(list_position(ds{s}, list_min(ds{s})) - 1 AS VARCHAR)"
        for s in range(8)
    )
    err = " + ".join(f"list_min(ds{s})" for s in range(8))
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
d AS (SELECT vec_id, {_bucket('v')} AS bucket,
  {ds_cols}
  FROM e)
SELECT vec_id, bucket, concat_ws('-', {codes}) AS pq_code,
  CAST(round({err}, 6) AS DOUBLE) AS recon_err
FROM d
"""


# both kernel arms against the SAME declarative SQL (knn_batch precedent):
# the numpy bucket/PQ kernels claim to reproduce the expression semantics
# exactly, so their oracle IS the expression oracle
ANN_LSH_BUCKETS_SQL = (
    "SELECT vec_id, bucket, pq_code, recon_err, 'expr' AS kernel FROM (\n"
    + _ann_features_core()
    + ")\nUNION ALL\nSELECT vec_id, bucket, pq_code, recon_err, 'fast' AS kernel FROM (\n"
    + _ann_features_core()
    + ")"
)

EMBEDDING_NEAR_DUP_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, CAST(embedding AS DOUBLE[]) FROM embeddings
),
b AS (SELECT vec_id, v, {_bucket('v')} AS bucket FROM e),
pairs AS (
  SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
    round(
      list_sum(list_transform(range(1, len(a.v) + 1), k -> a.v[k] * b2.v[k]))
      / (sqrt(list_sum(list_transform(range(1, len(a.v) + 1), k -> a.v[k] * a.v[k])))
         * sqrt(list_sum(list_transform(range(1, len(b2.v) + 1), k -> b2.v[k] * b2.v[k])))),
      6) AS cosine
  FROM b a JOIN b b2 ON a.bucket = b2.bucket
  WHERE a.vec_id < b2.vec_id
)
SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine >= 0.95
"""

MEDIA_FEATURES_SQL = """
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
  CAST(strlen(text) AS BIGINT) AS n_bytes,
  md5(text) AS sha,
  CAST(NULL AS INTEGER) AS width,
  CAST(NULL AS INTEGER) AS height,
  CAST(ascii(substr(text, 1, 1)) + 1 AS INTEGER) AS fake_width,
  CAST(ascii(substr(text, 2, 1)) + 1 AS INTEGER) AS fake_height,
  CASE WHEN doc_id % 3 = 0 THEN 'desc:' || md5(text) END AS description
FROM documents
"""

# q_media_decode_resize: the engine PARSES real headers; the oracle
# enumerates the dimensions arithmetically (29-byte PNG header for even
# docs, 41-byte JPEG with APP0+SOF0 for odd — an actual end-to-end decode
# check) and re-derives the fit-into-224 resize plan from them
MEDIA_DECODE_RESIZE_SQL = """
WITH dims AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
    CAST(doc_id % 1920 + 16 AS INTEGER) AS width,
    CAST(doc_id % 1080 + 16 AS INTEGER) AS height,
    CAST(CASE WHEN doc_id % 2 = 0 THEN 29 ELSE 41 END AS BIGINT) AS n_bytes
  FROM documents
),
s AS (SELECT *, least(224.0 / width, 224.0 / height, 1.0) AS scale FROM dims)
SELECT doc_id, n_bytes, width, height,
  CAST(greatest(1, floor(width * scale)) AS INTEGER) AS out_w,
  CAST(greatest(1, floor(height * scale)) AS INTEGER) AS out_h
FROM s
"""

ELEMENTS_TO_TEXT_SQL = (
    "WITH " + _WORDS_CTE + """
SELECT CAST(doc_num AS BIGINT) AS doc_id,
  array_to_string(ws[1:2], ' ') || chr(10) || chr(10) ||
  array_to_string(ws[3:8], ' ') || chr(10) || chr(10) ||
  array_to_string(ws[9:10], ' ') AS plain_text
FROM docs
"""
)

OCR_RECT_FILTER_SQL = """
WITH rects AS (
  SELECT doc_id, s.rect_seq,
    CAST(doc_id % 100 AS DOUBLE) AS l,
    CAST(doc_id % 50 AS DOUBLE) AS t
  FROM documents
  CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS rect_seq) s
  WHERE s.rect_seq <> 1 AND NOT (s.rect_seq = 2 AND doc_id % 3 = 0)
)
SELECT doc_id, CAST(rect_seq AS INTEGER) AS rect_seq,
  l, t, l + 200.0 AS r, t + 100.0 AS b
FROM rects
"""

TABLE_CLUSTER_FILTER_SQL = (
    "WITH " + _WORDS_CTE + "," + _PAGES_CTE + """
SELECT doc_id, CAST(page_no AS INTEGER) AS page_no,
  CAST(3 AS INTEGER) AS cluster_id,
  round(100 / 1000.0 * pw, 6) AS l,
  round(820 / 1000.0 * ph, 6) AS t,
  round(900 / 1000.0 * pw, 6) AS r,
  round(980 / 1000.0 * ph, 6) AS b
FROM kinds WHERE kind_idx = 2
"""
)

# --------------------------------------------- relational demos (batch 4)




# batch twin of the streaming watermarked windowed agg: Spark's
# window("ts", "1 hour").start on a UTC session == date_trunc('hour', ts)
WINDOWED_EVENT_COUNTS_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""

USER_RUNNING_TOTALS_SQL = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_value
FROM events GROUP BY user_id
"""






def _centroid(j: int, kexpr: str) -> str:
    return (
        f"(CAST((({j}::BIGINT * 1103515245 + {kexpr}::BIGINT * 12345) % 1000 - 500) AS DOUBLE) / 1000.0)"
    )


def _dist2(j: int, vec: str) -> str:
    c = _centroid(j, "(k - 1)")
    return (
        f"list_sum(list_transform(range(1, len({vec}) + 1), "
        f"k -> ({vec}[k] - {c}) * ({vec}[k] - {c})))"
    )


IVF_CELLS_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
d AS (SELECT vec_id, [{", ".join(_dist2(j, "v") for j in range(8))}] AS dists FROM e)
SELECT vec_id, CAST(list_position(dists, list_min(dists)) - 1 AS INTEGER) AS cell
FROM d
"""


# batched ANN oracle, generated for both probe depths: rn <= 1 ranking is
# the same argmin-with-lowest-cell-tie-break the Spark side's
# array_position / array_sort uses
def _knn_batch_sql(n_probe: int) -> str:
    dists = ", ".join(_dist2(j, "v") for j in range(8))
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
d AS (SELECT vec_id, v, [{dists}] AS dists FROM e),
cells AS (
  SELECT vec_id, v, CAST(list_position(dists, list_min(dists)) - 1 AS INTEGER) AS cell
  FROM d
),
qc AS (
  SELECT vec_id, v, s.j AS cell, dists[s.j + 1] AS dist
  FROM d CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS j) s
  WHERE vec_id < 10
),
q AS (
  SELECT vec_id AS q_id, v AS qv, cell FROM (
    SELECT vec_id, v, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
    FROM qc) WHERE rn <= {n_probe}
),
c AS (SELECT vec_id AS n_id, v AS cv, cell FROM cells WHERE vec_id >= 10),
scored AS (
  SELECT q_id, n_id,
    list_dot_product(cv, qv)
      / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv))) AS sim
  FROM c JOIN q USING (cell)
),
ranked AS (
  SELECT q_id, n_id, sim,
    CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS INTEGER) AS rank
  FROM scored
)
SELECT q_id, n_id, round(sim, 6) AS cosine, rank FROM ranked WHERE rank <= 3
"""


# PQ-ADC search twin of operators/similarity.py::pq_adc_topk: candidates
# ranked by the sum of per-subspace distance-table entries at their codes
# (ascending, n_id tie-break), true cosine reported for the k winners.
# The d CTE's per-vector distance arrays serve BOTH roles — a corpus
# vector's argmin over ds{s} is its code, a query vector's ds{s} IS its
# ADC distance table.
def _pq_adc_sql() -> str:
    ds_cols = ",\n  ".join(
        "["
        + ", ".join(_pq_sub_dist2_sql(s, j) for j in range(16))
        + f"] AS ds{s}"
        for s in range(8)
    )
    code_cols = ",\n    ".join(
        f"CAST(list_position(ds{s}, list_min(ds{s})) - 1 AS INTEGER) AS c{s}"
        for s in range(8)
    )
    adc = " + ".join(f"q.ds{s}[cd.c{s} + 1]" for s in range(8))
    q_ds = ", ".join(f"ds{s}" for s in range(8))
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
d AS (SELECT vec_id, v,
  {ds_cols}
  FROM e),
cd AS (
  SELECT vec_id AS n_id, v AS cv,
    {code_cols}
  FROM d WHERE vec_id >= 10
),
q AS (SELECT vec_id AS q_id, v AS qv, {q_ds} FROM d WHERE vec_id < 10),
scored AS (
  SELECT q.q_id, cd.n_id, cd.cv, q.qv, {adc} AS adc
  FROM cd CROSS JOIN q
),
ranked AS (
  SELECT q_id, n_id, cv, qv,
    CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS INTEGER) AS rank
  FROM scored
)
SELECT q_id, n_id,
  round(list_dot_product(cv, qv)
    / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv))), 6) AS cosine,
  rank
FROM ranked WHERE rank <= 3
"""


# IVF-PQ twin of operators/similarity.py::ivf_pq_topk: the composed
# stack — IVF cell routing (same centroid grid / probe ranking as
# _knn_batch_sql) restricts the candidate set, ADC over the PQ distance
# tables (same codebook / fold order as _pq_adc_sql) ranks it, the k
# winners re-rank by true cosine.  A corpus vector has exactly ONE cell
# and a query probes n_probe DISTINCT cells, so the cell join yields each
# (q_id, n_id) candidate at most once.
def _ivf_pq_sql(n_probe: int) -> str:
    ivf_dists = ", ".join(_dist2(j, "v") for j in range(8))
    ds_cols = ",\n  ".join(
        "["
        + ", ".join(_pq_sub_dist2_sql(s, j) for j in range(16))
        + f"] AS ds{s}"
        for s in range(8)
    )
    code_cols = ",\n    ".join(
        f"CAST(list_position(ds{s}, list_min(ds{s})) - 1 AS INTEGER) AS c{s}"
        for s in range(8)
    )
    adc = " + ".join(f"q.ds{s}[cd.c{s} + 1]" for s in range(8))
    q_ds = ", ".join(f"d.ds{s}" for s in range(8))
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ivfd AS (SELECT vec_id, [{ivf_dists}] AS dists FROM e),
d AS (SELECT vec_id, v,
  {ds_cols}
  FROM e),
cd AS (
  SELECT d.vec_id AS n_id, v AS cv,
    CAST(list_position(dists, list_min(dists)) - 1 AS INTEGER) AS cell,
    {code_cols}
  FROM d JOIN ivfd USING (vec_id) WHERE vec_id >= 10
),
qc AS (
  SELECT vec_id, s.j AS cell, dists[s.j + 1] AS dist
  FROM ivfd CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS j) s
  WHERE vec_id < 10
),
qp AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
    FROM qc) WHERE rn <= {n_probe}
),
q AS (
  SELECT d.vec_id AS q_id, v AS qv, qp.cell, {q_ds}
  FROM d JOIN qp USING (vec_id)
),
scored AS (
  SELECT q.q_id, cd.n_id, cd.cv, q.qv, {adc} AS adc
  FROM cd JOIN q USING (cell)
),
ranked AS (
  SELECT q_id, n_id, cv, qv,
    CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS INTEGER) AS rank
  FROM scored
)
SELECT q_id, n_id,
  round(list_dot_product(cv, qv)
    / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv))), 6) AS cosine,
  rank
FROM ranked WHERE rank <= 3
"""


# the 'fast' arm reuses the n_probe=2 SQL verbatim for the same reason
# knn_batch's does: the cogroup gather kernel claims exact reproduction of
# the declarative semantics (same cells, codes, adc sums, tie-order).
# the IVF-PQ arms join KNN_BATCH_SQL below under their own
# (n_probe, kernel) keys; 'ivf_pq_fast' reuses the n_probe=2 SQL verbatim
# because the composed cogroup kernel claims exact reproduction of the
# declarative semantics (same cells, codes, adc sums, tie-order).


# all arms unioned under (n_probe, kernel) keys (matches q_knn_batch).
# The 'fast' arm deliberately reuses the n_probe=2 SQL verbatim: the
# numpy cogroup-matmul kernel claims to reproduce the declarative
# expression semantics exactly (same cells, same top-k, same
# (sim desc, n_id) tie-order, same 6dp-rounded cosines), so its oracle IS
# the expression oracle.  The 'pq_adc' arm (n_probe=0: full code scan, no
# cell pruning) checks the PQ search path end-to-end — codes, distance
# tables, ADC ranking, true-cosine re-rank fetch.
KNN_BATCH_SQL = (
    "SELECT q_id, n_id, cosine, rank, 1 AS n_probe, 'expr' AS kernel FROM (\n"
    + _knn_batch_sql(1)
    + ")\nUNION ALL\nSELECT q_id, n_id, cosine, rank, 2 AS n_probe, 'expr' AS kernel FROM (\n"
    + _knn_batch_sql(2)
    + ")\nUNION ALL\nSELECT q_id, n_id, cosine, rank, 2 AS n_probe, 'fast' AS kernel FROM (\n"
    + _knn_batch_sql(2)
    + ")\nUNION ALL\nSELECT q_id, n_id, cosine, rank, 0 AS n_probe, 'pq_adc' AS kernel FROM (\n"
    + _pq_adc_sql()
    + ")\nUNION ALL\nSELECT q_id, n_id, cosine, rank, 0 AS n_probe, 'pq_adc_fast' AS kernel FROM (\n"
    + _pq_adc_sql()
    + ")\nUNION ALL\nSELECT q_id, n_id, cosine, rank, 1 AS n_probe, 'ivf_pq' AS kernel FROM (\n"
    + _ivf_pq_sql(1)
    + ")\nUNION ALL\nSELECT q_id, n_id, cosine, rank, 2 AS n_probe, 'ivf_pq' AS kernel FROM (\n"
    + _ivf_pq_sql(2)
    + ")\nUNION ALL\nSELECT q_id, n_id, cosine, rank, 2 AS n_probe, 'ivf_pq_fast' AS kernel FROM (\n"
    + _ivf_pq_sql(2)
    + ")"
)

# frame sampling: videos are doc_id%3==2.  The blob is utf-8 of the text
# and the driver corpus is pure ASCII (verified: octet_length(encode(text))
# == length(text) for every row), so VARCHAR substring/md5 equal the
# byte-level ops this DuckDB build lacks for BLOB.
FRAME_SAMPLE_SQL = """
WITH v AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text AS t, strlen(text) AS n
  FROM documents WHERE doc_id % 3 = 2
),
f AS (
  SELECT doc_id, t, n, s.i
  FROM v CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) s
)
SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
  round(i * (n / 1000.0) / 4, 6) AS frame_ts,
  md5(substring(t, CAST((i * n) // 4 AS INTEGER) + 1, 16)) AS frame_sha
FROM f
"""




def _kmeans_sql(n_cells: int = 8, dim: int = 64, iterations: int = 2) -> str:
    """k-means-refined IVF, re-derived independently: integer-quantized
    vectors make per-cell sums exact, so the Lloyd iterations are
    bit-reproducible (see operators/similarity.py::kmeans_refined_cells)."""
    parts = [f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id,
        list_transform(v, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS vq
      FROM e),
c0 AS (SELECT j.j, g.k,
        CAST((((j.j * 1103515245 + (g.k - 1) * 12345) % 1000) - 500) * 1000.0
             AS DOUBLE) AS c
       FROM (SELECT unnest(generate_series(0, {n_cells - 1})) AS j) j
       CROSS JOIN (SELECT unnest(generate_series(1, {dim})) AS k) g),
c0v AS (SELECT j, list(c ORDER BY k) AS cv FROM c0 GROUP BY j)"""]
    for i in range(iterations):
        parts.append(f""",
d{i} AS (
  SELECT q.vec_id, c.j,
    list_sum(list_transform(range(1, {dim + 1}),
      k -> (CAST(q.vq[k] AS DOUBLE) - c.cv[k])
         * (CAST(q.vq[k] AS DOUBLE) - c.cv[k]))) AS dist
  FROM q CROSS JOIN c{i}v c
),
a{i} AS (
  SELECT vec_id, j AS cell FROM (
    SELECT vec_id, j,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rn
    FROM d{i}) WHERE rn = 1
),
sums{i} AS (
  SELECT a.cell, g.k, sum(q.vq[g.k]) AS s, count(*) AS cnt
  FROM a{i} a JOIN q USING (vec_id)
  CROSS JOIN (SELECT unnest(generate_series(1, {dim})) AS k) g
  GROUP BY a.cell, g.k
),
c{i + 1} AS (
  SELECT p.j, p.k, COALESCE(CAST(s.s AS DOUBLE) / s.cnt, p.c) AS c
  FROM c{i} p LEFT JOIN sums{i} s ON s.cell = p.j AND s.k = p.k
),
c{i + 1}v AS (SELECT j, list(c ORDER BY k) AS cv FROM c{i + 1} GROUP BY j)""")
    n = iterations
    parts.append(f""",
dfin AS (
  SELECT q.vec_id, c.j,
    list_sum(list_transform(range(1, {dim + 1}),
      k -> (CAST(q.vq[k] AS DOUBLE) - c.cv[k])
         * (CAST(q.vq[k] AS DOUBLE) - c.cv[k]))) AS dist
  FROM q CROSS JOIN c{n}v c
)
SELECT vec_id, CAST(j AS INTEGER) AS cell FROM (
  SELECT vec_id, j,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rn
  FROM dfin) WHERE rn = 1
""")
    return "".join(parts)


# coarse (grid) and refined (2 Lloyd iterations) cells joined per vector
IVF_KMEANS_SQL = (
    "SELECT a.vec_id, a.cell AS cell_init, b.cell AS cell_refined FROM (\n"
    + IVF_CELLS_SQL
    + ") a JOIN (\n"
    + _kmeans_sql()
    + ") b ON a.vec_id = b.vec_id"
)


# input_hint ingestion path: per doc 8 output spans —
#  0-2 text (plain paragraphs W14/W58/W910), 3 media passthrough (ext://),
#  4-7 html (h1 W12, p W38, minted img media://doc/2/2, p W910)
EXTRACT_FROM_INTERLEAVED_SQL = (
    "WITH " + _WORDS_CTE + """,
slots AS (
  SELECT doc_id, doc_num, ws, s.slot_no
  FROM docs CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS slot_no) s
)
SELECT doc_id,
  CAST(slot_no AS INTEGER) AS "offset",
  CASE WHEN slot_no IN (3, 6) THEN 'media_ref' ELSE 'text' END AS kind,
  CASE slot_no
    WHEN 0 THEN array_to_string(ws[1:4], ' ')
    WHEN 1 THEN array_to_string(ws[5:8], ' ')
    WHEN 2 THEN array_to_string(ws[9:10], ' ')
    WHEN 4 THEN array_to_string(ws[1:2], ' ')
    WHEN 5 THEN array_to_string(ws[3:8], ' ') || """ + _HTML_BODY_SUFFIX + """
    WHEN 7 THEN array_to_string(ws[9:10], ' ')
    ELSE '' END AS text,
  CASE slot_no
    WHEN 3 THEN 'ext://' || doc_id || '/0'
    WHEN 6 THEN 'media://' || doc_id || '/2/2'
    ELSE '' END AS media_ref
FROM slots
"""
)

ORACLES = {
    "extract_interleaved_spans": EXTRACT_SPANS_SQL,
    "extract_from_interleaved": EXTRACT_FROM_INTERLEAVED_SQL,
    "text_cleanup": TEXT_CLEANUP_SQL,
    "json_repair_exprs": JSON_REPAIR_EXPRS_SQL,
    "html_elements": HTML_ELEMENTS_SQL,
    "elements_to_text": ELEMENTS_TO_TEXT_SQL,
    "paragraph_cells": PARAGRAPH_CELLS_SQL,
    "bbox_rescale": BBOX_RESCALE_SQL,
    "otsl_skeleton": OTSL_SKELETON_SQL,
    "reading_order": READING_ORDER_SQL,
    "confidence_agg": CONFIDENCE_AGG_SQL,
    "element_cells": ELEMENT_CELLS_SQL,
    "layout_clusters": LAYOUT_CLUSTERS_SQL,
    "table_cells": TABLE_CELLS_SQL,
    "picture_classify": PICTURE_CLASSIFY_SQL,
    "code_formula_enrich": CODE_FORMULA_ENRICH_SQL,
    "cluster_assign": CLUSTER_ASSIGN_SQL,
    "cell_dedupe": CELL_DEDUPE_SQL,
    "ocr_rect_filter": OCR_RECT_FILTER_SQL,
    "table_cluster_filter": TABLE_CLUSTER_FILTER_SQL,
    "checkpoint_resume": CHECKPOINT_RESUME_SQL,
    "doc_stats": DOC_STATS_SQL,
    "doc_fingerprints": DOC_FINGERPRINTS_SQL,
    "lang_id": LANG_ID_SQL,
    "quality_filter_rules": QUALITY_FILTER_RULES_SQL,
    "pii_mask": PII_MASK_SQL,
    "sample_stratified": SAMPLE_STRATIFIED_SQL,
    "doc_chunks": DOC_CHUNKS_SQL,
    "pack_sequences": PACK_SEQUENCES_SQL,
    "decontaminate": DECONTAMINATE_SQL,
    "dedup_exact": DEDUP_EXACT_SQL,
    "minhash_signature": MINHASH_SIGNATURE_SQL,
    "minhash_fast": MINHASH_FAST_SQL,
    "lsh_dup_pairs": LSH_DUP_PAIRS_BOTH_SQL,
    "simhash": SIMHASH_SQL,
    "simhash_pairs": SIMHASH_PAIRS_SQL,
    "ngram_jaccard": NGRAM_JACCARD_SQL,
    "dup_components": DUP_COMPONENTS_BOTH_SQL,
    "dedup_survivors": DEDUP_SURVIVORS_BOTH_SQL,
    "ann_lsh_buckets": ANN_LSH_BUCKETS_SQL,
    "embedding_near_dup": EMBEDDING_NEAR_DUP_SQL,
    "knn_bruteforce": KNN_BRUTEFORCE_SQL,
    "knn_batch": KNN_BATCH_SQL,
    "ivf_kmeans": IVF_KMEANS_SQL,
    "media_features": MEDIA_FEATURES_SQL,
    "media_decode_resize": MEDIA_DECODE_RESIZE_SQL,
    "frame_sample": FRAME_SAMPLE_SQL,
    "events_sessions": EVENTS_SESSIONS_SQL,
    "windowed_event_counts": WINDOWED_EVENT_COUNTS_SQL,
    "user_running_totals": USER_RUNNING_TOTALS_SQL,
}
