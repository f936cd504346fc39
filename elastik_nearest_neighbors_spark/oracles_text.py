"""DuckDB oracle SQL for dedup + text-analysis operators.

Mirrors operators/dedup.py and operators/textops.py expression-for-expression
(see functions/text.py for the cross-engine hashing contract). Where the
Spark side uses a lossless optimization (prefix filter, band blocking) the
oracle uses the equivalent brute-force formulation — same result set.
"""

from __future__ import annotations

from .constants import (
    LANG_MARKERS,
    MAX_BUCKET,
    MERSENNE_P,
    MINHASH_A,
    MINHASH_B,
    MINHASH_BAND_ROWS,
    MINHASH_JACCARD_TAU,
    MINHASH_K,
    NGRAM_JACCARD_TAU,
    NGRAM_N,
    SIMHASH_BAND_BITS,
    SIMHASH_BANDS,
    SIMHASH_BITS,
    SIMHASH_MAX_HAMMING,
    STOPWORDS_EN,
    TOKEN_REGEX,
)

H60 = "('0x' || substr(md5({x}), 1, 15))::BIGINT"


def _h60(x: str) -> str:
    return H60.format(x=x)


def _band_cand_cte(bands_sql: str) -> str:
    """bands → capped candidate pairs: exact mirror of
    functions/blocking.capped_bucket_pairs (drop bands with more than
    MAX_BUCKET members BEFORE the pair self-join)."""
    return f"""bands AS (
{bands_sql}
), bsz AS (
  SELECT band, bval, COUNT(*) AS n FROM bands GROUP BY 1, 2
), kept AS (
  SELECT b.doc_id, b.band, b.bval
  FROM bands b JOIN bsz s ON s.band = b.band AND s.bval = b.bval
  WHERE s.n <= {MAX_BUCKET}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kept a JOIN kept b ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
)"""


def dedup_exact(sf_dir: str) -> str:
    return """
SELECT md5(text) AS content_md5, MIN(doc_id) AS canonical_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents GROUP BY 1
"""


def streaming_dedup_state(sf_dir: str) -> str:
    """Batch-twin oracle for the streaming emit-once dedup: after the stream
    drains, the emitted set is one (content_md5, canonical = min doc_id) row
    per distinct content hash — dedup_exact minus the copy count the
    streaming output doesn't carry."""
    return """
SELECT md5(text) AS content_md5, MIN(doc_id) AS canonical_id
FROM documents GROUP BY 1
"""


SHINGLES_CTE = """
shingles AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) r
  WHERE len(t) >= 3
), sh AS (
  SELECT doc_id, {h} AS h FROM shingles
)""".format(h=_h60("s"))


def _mh_cols() -> str:
    return ",\n  ".join(
        f"MIN(({MINHASH_A[j]} * (h % {MERSENNE_P}) + {MINHASH_B[j]}) % {MERSENNE_P}) AS mh_{j}"
        for j in range(MINHASH_K)
    )


def minhash_signatures(sf_dir: str) -> str:
    return f"""
WITH {SHINGLES_CTE}
SELECT doc_id,
  {_mh_cols()}
FROM sh GROUP BY doc_id
"""


# char-tokenizer twin of SHINGLES_CTE: every non-space character is a token
# (functions/text._TOKENIZERS['char']), 3-shingles joined by one space —
# mirrors word_shingles over the char token array. DuckDB string_split with
# an empty delimiter yields per-character lists exactly like Spark's
# F.split(text, '') (verified r7).
SHINGLES_CHAR_CTE = """
shingles AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
  FROM (SELECT doc_id, list_filter(string_split(text, ''), x -> x != ' ') AS t
        FROM documents),
       LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) r
  WHERE len(t) >= 3
), sh AS (
  SELECT doc_id, {h} AS h FROM shingles
)""".format(h=_h60("s"))


def minhash_signatures_char(sf_dir: str) -> str:
    return f"""
WITH {SHINGLES_CHAR_CTE}
SELECT doc_id,
  {_mh_cols()}
FROM sh GROUP BY doc_id
"""


def dedup_minhash_lsh(sf_dir: str) -> str:
    n_bands = MINHASH_K // MINHASH_BAND_ROWS
    band_selects = []
    for bi in range(n_bands):
        cols = [f"mh_{bi * MINHASH_BAND_ROWS + r}" for r in range(MINHASH_BAND_ROWS)]
        concat = " || '_' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        band_selects.append(f"SELECT doc_id, {bi} AS band, {concat} AS bval FROM sig")
    bands = "\nUNION ALL\n".join(band_selects)
    return f"""
WITH {SHINGLES_CTE}, sig AS (
  SELECT doc_id, {_mh_cols()} FROM sh GROUP BY doc_id
), {_band_cand_cte(bands)}, ds AS (
  SELECT DISTINCT doc_id, h AS g FROM sh
), sz AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM ds GROUP BY 1
), inter AS (
  SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS i
  FROM cand c JOIN ds a ON a.doc_id = c.doc_a JOIN ds b ON b.doc_id = c.doc_b AND a.g = b.g
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, round(i.i / (sa.n + sb.n - i.i), 6) AS jaccard
FROM inter i JOIN sz sa ON sa.doc_id = i.doc_a JOIN sz sb ON sb.doc_id = i.doc_b
WHERE round(i.i / (sa.n + sb.n - i.i), 6) >= {MINHASH_JACCARD_TAU}
"""


def dedup_incremental(sf_dir: str) -> str:
    # bipartite band join (new batch × old corpus), uncapped — exact mirror
    # of operators/dedup.dedup_incremental
    from .constants import INCR_MOD

    n_bands = MINHASH_K // MINHASH_BAND_ROWS
    band_selects = []
    for bi in range(n_bands):
        cols = [f"mh_{bi * MINHASH_BAND_ROWS + r}" for r in range(MINHASH_BAND_ROWS)]
        concat = " || '_' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        band_selects.append(f"SELECT doc_id, {bi} AS band, {concat} AS bval FROM sig")
    bands = "\nUNION ALL\n".join(band_selects)
    return f"""
WITH {SHINGLES_CTE}, sig AS (
  SELECT doc_id, {_mh_cols()} FROM sh GROUP BY doc_id
), bands AS (
{bands}
), cand AS (
  SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
  FROM bands n JOIN bands o ON n.band = o.band AND n.bval = o.bval
  WHERE n.doc_id % {INCR_MOD} = 0 AND o.doc_id % {INCR_MOD} <> 0
), ds AS (
  SELECT DISTINCT doc_id, h AS g FROM sh
), sz AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM ds GROUP BY 1
), inter AS (
  SELECT c.new_id, c.old_id, CAST(COUNT(*) AS BIGINT) AS i
  FROM cand c JOIN ds a ON a.doc_id = c.new_id JOIN ds b ON b.doc_id = c.old_id AND a.g = b.g
  GROUP BY 1, 2
)
SELECT i.new_id, i.old_id, round(i.i / (sa.n + sb.n - i.i), 6) AS jaccard
FROM inter i JOIN sz sa ON sa.doc_id = i.new_id JOIN sz sb ON sb.doc_id = i.old_id
WHERE round(i.i / (sa.n + sb.n - i.i), 6) >= {MINHASH_JACCARD_TAU}
"""


def _simhash_cte() -> str:
    """64-bit simhash as 4×16-bit band values — exact mirror of
    operators/dedup._simhash_bands (token bits 0-59 from md5 hex chars 1-15,
    bits 60-63 from char 16)."""
    sums = ",\n    ".join(
        "SUM(CASE WHEN (({src} >> {off}) & 1) = 1 THEN 1 ELSE -1 END) AS s_{i}".format(
            src="hlo" if i < 60 else "hhi", off=i if i < 60 else i - 60, i=i
        )
        for i in range(SIMHASH_BITS)
    )
    band_cols = ", ".join(
        "CAST("
        + " + ".join(
            f"(CASE WHEN s_{b * SIMHASH_BAND_BITS + j} > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(SIMHASH_BAND_BITS)
        )
        + f" AS INT) AS sb_{b}"
        for b in range(SIMHASH_BANDS)
    )
    return f"""
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
), th AS (
  SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS hlo,
                 ('0x' || substr(md5(t), 16, 1))::BIGINT AS hhi
  FROM tok
), sums AS (
  SELECT doc_id,
    {sums}
  FROM th GROUP BY doc_id
), sims AS (
  SELECT doc_id, {band_cols} FROM sums
)"""


def dedup_simhash(sf_dir: str) -> str:
    # mirrors the Spark band blocking exactly, INCLUDING the MAX_BUCKET hot
    # band cap (blocking alone is lossless by pigeonhole; the cap is the one
    # documented approximation, so the oracle must replicate it)
    bands_sql = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, sb_{b} AS bval FROM sims"
        for b in range(SIMHASH_BANDS)
    )
    ham = " + ".join(
        f"bit_count(xor(sa.sb_{b}, sb.sb_{b}))" for b in range(SIMHASH_BANDS)
    )
    return f"""
WITH {_simhash_cte()}, {_band_cand_cte(bands_sql)}
SELECT c.doc_a, c.doc_b, CAST({ham} AS INT) AS hamming
FROM cand c JOIN sims sa ON sa.doc_id = c.doc_a JOIN sims sb ON sb.doc_id = c.doc_b
WHERE {ham} <= {SIMHASH_MAX_HAMMING}
"""


def ngram_jaccard_join(sf_dir: str) -> str:
    # brute force — prefix/length filtering on the Spark side is lossless
    return f"""
WITH grams AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       LATERAL (SELECT unnest(range(1, len(t) - 2)) AS i) r
  WHERE len(t) >= {NGRAM_N}
), sz AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM grams GROUP BY 1
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS i
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, round(i.i / (sa.n + sb.n - i.i), 6) AS jaccard
FROM inter i JOIN sz sa ON sa.doc_id = i.doc_a JOIN sz sb ON sb.doc_id = i.doc_b
WHERE round(i.i / (sa.n + sb.n - i.i), 6) >= {NGRAM_JACCARD_TAU}
"""


def containment_join(sf_dir: str) -> str:
    # brute force — the Spark side's probe-prefix/length filters are lossless
    from .constants import CONTAIN_TAU

    return f"""
WITH grams AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       LATERAL (SELECT unnest(range(1, len(t) - 2)) AS i) r
  WHERE len(t) >= {NGRAM_N}
), sz AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM grams GROUP BY 1
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS i
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, round(i.i / sa.n, 6) AS containment
FROM inter i JOIN sz sa ON sa.doc_id = i.doc_a
WHERE round(i.i / sa.n, 6) >= {CONTAIN_TAU}
"""


# ---- text analysis ----------------------------------------------------------


def _score(words: list[str]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(string_split(text, ' '), t -> t IN ({lst})))"


def lang_id(sf_dir: str) -> str:
    scores = {lang: _score(words) for lang, words in LANG_MARKERS}
    greatest = "greatest(" + ", ".join(scores.values()) + ")"
    case = "CASE " + " ".join(
        f"WHEN {scores[lang]} = {greatest} THEN '{lang}'" for lang, _ in LANG_MARKERS
    ) + " END"
    return f"""
SELECT doc_id, {case} AS lang_pred, CAST({greatest} AS INT) AS best_score
FROM documents
"""


def quality_score(sf_dir: str) -> str:
    stop = _score(STOPWORDS_EN)
    n_tok = "len(string_split(text, ' '))"
    punct = f"len(regexp_extract_all(text, '[^a-z0-9 ]'))"
    tok_len_sum = "list_sum(list_transform(string_split(text, ' '), t -> length(t)))"
    return f"""
SELECT doc_id,
  CAST({n_tok} AS INT) AS n_tokens,
  round({stop} / {n_tok}, 6) AS stop_ratio,
  round({punct} / length(text), 6) AS punct_ratio,
  round({tok_len_sum} / {n_tok}, 6) AS mean_tok_len,
  round(0.4 * round({stop} / {n_tok}, 6)
      + 0.3 * least(1.0, {n_tok} / 100.0)
      + 0.3 * (1.0 - round({punct} / length(text), 6)), 6) AS quality
FROM documents
"""


def token_count(sf_dir: str) -> str:
    return f"""
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
  CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS INT) AS re_tokens,
  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS uniq_tokens
FROM documents
"""


def doc_fingerprint(sf_dir: str) -> str:
    h = _h60("t")
    return f"""
SELECT doc_id,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(string_split(text, ' '), t -> {h} % 1000000007)),
    (acc, h) -> (acc * 131 + h) % {MERSENNE_P}
  ) AS fingerprint
FROM documents
"""


def doc_chunk(sf_dir: str) -> str:
    from .constants import CHUNK_STRIDE, CHUNK_TOKENS

    return f"""
SELECT doc_id,
       CAST(s // {CHUNK_STRIDE} AS INT) AS chunk_id,
       array_to_string(t[s + 1 : s + {CHUNK_TOKENS}], ' ') AS chunk_text,
       CAST(len(t[s + 1 : s + {CHUNK_TOKENS}]) AS INT) AS n_tokens
FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
     LATERAL (SELECT unnest(range(0, len(t), {CHUNK_STRIDE})) AS s) r
"""


def dedup_minhash_canonical(sf_dir: str) -> str:
    pairs = dedup_minhash_lsh(sf_dir)
    return f"""
WITH near AS ({pairs}),
sym AS (
  SELECT doc_a AS doc_id, doc_b AS other FROM near
  UNION ALL
  SELECT doc_b AS doc_id, doc_a AS other FROM near
  UNION ALL
  SELECT doc_id, doc_id AS other FROM documents
)
SELECT doc_id, MIN(other) AS canonical_id, CAST(COUNT(*) - 1 AS BIGINT) AS n_dups
FROM sym GROUP BY doc_id
"""


def dup_clusters(sf_dir: str) -> str:
    """Transitive closure of the near-dup graph via WITH RECURSIVE — the
    declarative twin of the Spark label-propagation loop. cluster_id =
    min doc_id reachable (including self)."""
    pairs = dedup_minhash_lsh(sf_dir)
    return f"""
WITH RECURSIVE pairs AS ({pairs}),
edges AS (
  SELECT doc_a, doc_b FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach(doc_id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.doc_a, reach.r
  FROM reach JOIN edges e ON e.doc_b = reach.doc_id
)
SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id
"""


def corpus_clean(sf_dir: str) -> str:
    from .constants import CORPUS_LANG, CORPUS_QUALITY_TAU

    q = quality_score(sf_dir)
    l = lang_id(sf_dir)
    return f"""
WITH q AS ({q}),
l AS ({l}),
keep AS (
  SELECT doc_id FROM (
    SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
    FROM documents)
  WHERE doc_id = canonical_id
)
SELECT q.doc_id, l.lang_pred, q.quality, q.n_tokens
FROM keep
JOIN q ON q.doc_id = keep.doc_id
JOIN l ON l.doc_id = keep.doc_id
WHERE l.lang_pred = '{CORPUS_LANG}' AND q.quality >= {CORPUS_QUALITY_TAU}
"""


def idf_scores(sf_dir: str) -> str:
    return """
WITH tok AS (
  SELECT unnest(list_distinct(string_split(text, ' '))) AS token FROM documents
), n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
       round(ln(CAST((SELECT n_docs FROM n) AS DOUBLE) / COUNT(*)), 6) AS idf
FROM tok GROUP BY token
"""


def pii_scrub(sf_dir: str) -> str:
    from .constants import PII_EMAIL_RE, PII_LONGNUM_RE, PII_REDACTION

    # DuckDB needs the global flag to replace every match (Spark's
    # regexp_replace is global by default)
    return f"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS INT) AS n_emails,
  CAST(len(regexp_extract_all(text, '{PII_LONGNUM_RE}')) AS INT) AS n_longnums,
  md5(regexp_replace(
        regexp_replace(text, '{PII_EMAIL_RE}', '{PII_REDACTION}', 'g'),
        '{PII_LONGNUM_RE}', '{PII_REDACTION}', 'g')) AS scrubbed_md5
FROM documents
"""


def corpus_sample(sf_dir: str) -> str:
    from .constants import SAMPLE_BUCKETS, SAMPLE_KEEP

    h = _h60("text")
    return f"""
SELECT doc_id, CAST({h} % {SAMPLE_BUCKETS} AS INT) AS sample_bucket
FROM documents
WHERE {h} % {SAMPLE_BUCKETS} < {SAMPLE_KEEP}
"""


def token_histogram(sf_dir: str) -> str:
    return """
WITH tok AS (
  SELECT unnest(list_distinct(string_split(text, ' '))) AS token FROM documents
), dfreq AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tok GROUP BY token
)
SELECT df, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM dfreq GROUP BY df
"""


def source_mix(sf_dir: str) -> str:
    """Equal-share source re-weighting (operators/textops.source_mix mirror):
    rate_ppm from pure IEEE floor arithmetic, keep by content-hash mod."""
    return f"""
WITH counts AS (SELECT source, COUNT(*) AS n_s FROM documents GROUP BY 1),
tot AS (SELECT COUNT(*) AS total, COUNT(DISTINCT source) AS nsrc FROM documents),
rates AS (
  SELECT source,
         LEAST(1000000, CAST(FLOOR(total * 1000000.0 / (nsrc * n_s)) AS BIGINT)) AS rate_ppm
  FROM counts, tot
)
SELECT d.doc_id, d.source, r.rate_ppm
FROM documents d JOIN rates r USING (source)
WHERE ({_h60("d.text")}) % 1000000 < r.rate_ppm
"""


def doc_repetition(sf_dir: str) -> str:
    from .constants import REP_NGRAM

    gram = " || ' ' || ".join(f"t[i+{k}]" for k in range(REP_NGRAM))
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n_tok,
         len(list_distinct(string_split(text, ' '))) AS u_tok
  FROM documents WHERE len(string_split(text, ' ')) >= {REP_NGRAM}
), grams AS (
  SELECT doc_id, n_tok, u_tok, {gram} AS g
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - {REP_NGRAM - 2})) AS i) r
), per_gram AS (
  SELECT doc_id, n_tok, u_tok, g, COUNT(*) AS c FROM grams GROUP BY 1, 2, 3, 4
)
SELECT doc_id,
       CAST(SUM(c) AS INT) AS n_bigrams,
       round(1.0 - COUNT(*) / CAST(SUM(c) AS DOUBLE), 6) AS dup_bigram_ratio,
       round(MAX(c) / CAST(SUM(c) AS DOUBLE), 6) AS top_bigram_share,
       round(1.0 - u_tok / CAST(n_tok AS DOUBLE), 6) AS dup_token_ratio
FROM per_gram GROUP BY doc_id, n_tok, u_tok
"""


def corpus_curate_full(sf_dir: str) -> str:
    """The full funnel (operators/textops.corpus_curate_full mirror):
    dedup → lang → quality → repetition gate → decontamination → source cap."""
    from .constants import (
        CORPUS_LANG,
        CORPUS_QUALITY_TAU,
        CURATE_REP_MAX,
        DECONTAM_MOD,
        DECONTAM_N,
        REP_NGRAM,
        SOURCE_CAP,
    )

    q = quality_score(sf_dir)
    l = lang_id(sf_dir)
    gram2 = " || ' ' || ".join(f"t[i+{k}]" for k in range(REP_NGRAM))
    gram4 = " || ' ' || ".join(f"t[i+{k}]" for k in range(DECONTAM_N))
    return f"""
WITH q AS ({q}),
l AS ({l}),
keep AS (
  SELECT doc_id FROM (
    SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
    FROM documents)
  WHERE doc_id = canonical_id
),
surv AS (
  SELECT q.doc_id, d.source, d.text, q.quality, q.n_tokens
  FROM keep
  JOIN q ON q.doc_id = keep.doc_id
  JOIN l ON l.doc_id = keep.doc_id
  JOIN documents d ON d.doc_id = keep.doc_id
  WHERE l.lang_pred = '{CORPUS_LANG}' AND q.quality >= {CORPUS_QUALITY_TAU}
),
per_gram AS (
  SELECT doc_id, g, COUNT(*) AS c FROM (
    SELECT doc_id, {gram2} AS g
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM surv),
         LATERAL (SELECT unnest(range(1, len(t) - {REP_NGRAM - 2})) AS i) r
    WHERE len(t) >= {REP_NGRAM})
  GROUP BY 1, 2
),
rep_bad AS (
  SELECT doc_id FROM (
    SELECT doc_id, SUM(c) AS ng, COUNT(*) AS dg FROM per_gram GROUP BY 1)
  WHERE round(1.0 - dg / CAST(ng AS DOUBLE), 6) > {CURATE_REP_MAX}
),
bench AS (
  SELECT DISTINCT {gram4} AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE doc_id % {DECONTAM_MOD} = 0),
       LATERAL (SELECT unnest(range(1, len(t) - {DECONTAM_N - 2})) AS i) r
  WHERE len(t) >= {DECONTAM_N}
),
contam AS (
  SELECT DISTINCT doc_id FROM (
    SELECT DISTINCT doc_id, {gram4} AS g
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM surv),
         LATERAL (SELECT unnest(range(1, len(t) - {DECONTAM_N - 2})) AS i) r
    WHERE len(t) >= {DECONTAM_N}) sg
  JOIN bench USING (g)
),
kept AS (
  SELECT * FROM surv
  WHERE doc_id % {DECONTAM_MOD} <> 0
    AND doc_id NOT IN (SELECT doc_id FROM rep_bad)
    AND doc_id NOT IN (SELECT doc_id FROM contam)
)
SELECT doc_id, source, quality, n_tokens, rk FROM (
  SELECT doc_id, source, quality, n_tokens,
         CAST(row_number() OVER (PARTITION BY source
              ORDER BY n_tokens DESC, doc_id ASC) AS INT) AS rk
  FROM kept)
WHERE rk <= {SOURCE_CAP}
"""


def decontaminate(sf_dir: str) -> str:
    from .constants import DECONTAM_MOD, DECONTAM_N

    gram = " || ' ' || ".join(f"t[i+{k}]" for k in range(DECONTAM_N))
    return f"""
WITH grams AS (
  SELECT DISTINCT doc_id, {gram} AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       LATERAL (SELECT unnest(range(1, len(t) - {DECONTAM_N - 2})) AS i) r
  WHERE len(t) >= {DECONTAM_N}
), bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % {DECONTAM_MOD} = 0
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_grams
FROM grams JOIN bench USING (g)
WHERE doc_id % {DECONTAM_MOD} <> 0
GROUP BY doc_id
"""


def multimodal_featurize(sf_dir: str) -> str:
    """REAL-decode twin of operators/multimodal.multimodal_featurize: the
    Spark side synthesizes a 24-bit BMP per doc (pixel[k, c] = (doc_id·A +
    k·B + c·C) mod 256) and decodes it back with the struct/numpy BMP
    parser; this oracle regenerates the identical pixels from the shared
    integer formula and recomputes the 8 features. Bit-exact: every feature
    is an exact integer sum (≪ 2^53) followed by one or two correctly-
    rounded IEEE ops (divide, sqrt). decoded is literal TRUE — the hash
    gate fails if any Spark row fell back to the digest stub."""
    from .operators.multimodal import (
        IMG_A,
        IMG_B,
        IMG_C,
        IMG_H,
        IMG_W,
        _bmp_stride,
    )

    n_px = IMG_W * IMG_H
    n_bytes = 54 + _bmp_stride(IMG_W) * IMG_H  # headers + padded pixel rows
    return f"""
WITH px AS (
  SELECT d.doc_id, c.c,
         (d.doc_id * {IMG_A} + k.k * {IMG_B} + c.c * {IMG_C}) % 256 AS v
  FROM documents d,
       LATERAL (SELECT unnest(range(0, {n_px})) AS k) k,
       LATERAL (SELECT unnest(range(0, 3)) AS c) c
),
byc AS (
  SELECT doc_id, c, SUM(v) AS s, SUM(v * v) AS s2 FROM px GROUP BY doc_id, c
),
tot AS (
  SELECT doc_id, SUM(v) AS s, MAX(v) AS mx FROM px GROUP BY doc_id
),
feats AS (
  SELECT doc_id, CAST(c AS INT) AS feat_idx,
         CAST(s AS DOUBLE) / {n_px}.0 AS feature FROM byc
  UNION ALL
  SELECT doc_id, CAST(c + 3 AS INT),
         sqrt(CAST(s2 AS DOUBLE) / {n_px}.0) FROM byc
  UNION ALL
  SELECT doc_id, 6, CAST(s AS DOUBLE) / {3 * n_px}.0 FROM tot
  UNION ALL
  SELECT doc_id, 7, CAST(mx AS DOUBLE) / 255.0 FROM tot
)
SELECT doc_id, CAST({n_bytes} AS INT) AS n_bytes, 'image/bmp' AS mime,
       feat_idx, feature, TRUE AS decoded
FROM feats
"""


def multimodal_audio_stats(sf_dir: str) -> str:
    """REAL-decode twin of operators/multimodal.multimodal_audio_stats: the
    Spark side synthesizes a PCM16 WAV per doc (sample[k] = ((doc_id·A +
    k·B) mod 2^16) − 2^15) and decodes it back with the struct/numpy RIFF
    parser; this oracle regenerates the identical samples from the shared
    integer formula and recomputes windowed RMS. Bit-exact: the squared sum
    is an exact int64, and /n then sqrt are single correctly-rounded IEEE
    ops in both engines. decoded is literal TRUE — the hash gate fails if
    any Spark row fell back to the digest stub."""
    from .operators.multimodal import (
        AUDIO_WINDOWS,
        WAV_A,
        WAV_B,
        WAV_SAMPLES,
    )

    per_win = WAV_SAMPLES // AUDIO_WINDOWS
    n_bytes = 44 + 2 * WAV_SAMPLES  # RIFF+fmt+data headers + PCM16 payload
    return f"""
WITH ks AS (SELECT unnest(range(0, {WAV_SAMPLES})) AS k),
s AS (
  SELECT d.doc_id,
         ks.k // {per_win} AS window_idx,
         ((d.doc_id * {WAV_A} + ks.k * {WAV_B}) % 65536) - 32768 AS x
  FROM documents d, ks
)
SELECT doc_id,
       CAST({n_bytes} AS INT) AS n_bytes,
       CAST(window_idx AS INT) AS window_idx,
       sqrt(CAST(SUM(x * x) AS DOUBLE) / {per_win}) AS rms,
       TRUE AS decoded
FROM s
GROUP BY doc_id, window_idx
"""


def multimodal_framesample(sf_dir: str) -> str:
    """REAL-decode twin of operators/multimodal.multimodal_framesample: the
    Spark side synthesizes an RVID container of VID_FRAMES BMP frames per
    doc (frame f pixel[k, c] = (doc_id·IMG_A + f·VID_D + k·IMG_B + c·IMG_C)
    mod 256), decodes it back, and samples N_FRAMES evenly spaced frames;
    this oracle regenerates the sampled frames' pixels from the shared
    integer formula and recomputes mean/RMS. Bit-exact: exact integer sums
    followed by single correctly-rounded IEEE ops. decoded is literal TRUE
    — the hash gate fails if any Spark row fell back to the digest stub."""
    from .operators.multimodal import (
        IMG_A,
        IMG_B,
        IMG_C,
        N_FRAMES,
        VID_D,
        VID_FRAMES,
        VID_H,
        VID_W,
    )

    step = max(VID_FRAMES // N_FRAMES, 1)
    n_px = VID_W * VID_H
    n_vals = 3 * n_px
    return f"""
WITH px AS (
  SELECT d.doc_id, f.i,
         (d.doc_id * {IMG_A} + (f.i * {step}) * {VID_D}
          + k.k * {IMG_B} + c.c * {IMG_C}) % 256 AS v
  FROM documents d,
       LATERAL (SELECT unnest(range(0, {N_FRAMES})) AS i) f,
       LATERAL (SELECT unnest(range(0, {n_px})) AS k) k,
       LATERAL (SELECT unnest(range(0, 3)) AS c) c
)
SELECT doc_id, CAST(i AS INT) AS frame_idx, CAST(i * {step} AS INT) AS src_frame,
       CAST({VID_W} AS INT) AS frame_w, CAST({VID_H} AS INT) AS frame_h,
       CAST(SUM(v) AS DOUBLE) / {n_vals}.0 AS frame_mean,
       sqrt(CAST(SUM(v * v) AS DOUBLE) / {n_vals}.0) AS frame_rms,
       TRUE AS decoded
FROM px GROUP BY doc_id, i
"""


def minhash_est_jaccard(sf_dir: str) -> str:
    n_bands = MINHASH_K // MINHASH_BAND_ROWS
    band_selects = []
    for bi in range(n_bands):
        cols = [f"mh_{bi * MINHASH_BAND_ROWS + r}" for r in range(MINHASH_BAND_ROWS)]
        concat = " || '_' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        band_selects.append(f"SELECT doc_id, {bi} AS band, {concat} AS bval FROM sig")
    bands = "\nUNION ALL\n".join(band_selects)
    agree = " + ".join(
        f"(CASE WHEN sa.mh_{j} = sb.mh_{j} THEN 1 ELSE 0 END)" for j in range(MINHASH_K)
    )
    return f"""
WITH {SHINGLES_CTE}, sig AS (
  SELECT doc_id, {_mh_cols()} FROM sh GROUP BY doc_id
), {_band_cand_cte(bands)}
SELECT c.doc_a, c.doc_b, round(({agree}) / {float(MINHASH_K)}, 6) AS est_jaccard
FROM cand c JOIN sig sa ON sa.doc_id = c.doc_a JOIN sig sb ON sb.doc_id = c.doc_b
"""


def corpus_to_sequences(sf_dir: str) -> str:
    from .constants import PACK_LEN, PACK_SHARDS

    clean = corpus_clean(sf_dir)
    return f"""
WITH clean AS ({clean}),
base AS (
  SELECT doc_id, CAST(doc_id % {PACK_SHARDS} AS INT) AS shard,
         CAST(n_tokens AS BIGINT) AS n_tokens
  FROM clean
), cum AS (
  SELECT doc_id, shard, n_tokens,
    COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
  FROM base
)
SELECT doc_id, shard, n_tokens,
  CAST(c // {PACK_LEN} AS INT) AS seq_first,
  CAST(c % {PACK_LEN} AS INT) AS seq_offset
FROM cum
"""


def seq_pack(sf_dir: str) -> str:
    from .constants import PACK_LEN, PACK_SHARDS

    return f"""
WITH base AS (
  SELECT doc_id, CAST(doc_id % {PACK_SHARDS} AS INT) AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), cum AS (
  SELECT doc_id, shard, n_tokens,
    COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
  FROM base
)
SELECT doc_id, shard, n_tokens,
  CAST(c // {PACK_LEN} AS INT) AS seq_first,
  CAST((c + n_tokens - 1) // {PACK_LEN} AS INT) AS seq_last,
  CAST(c % {PACK_LEN} AS INT) AS seq_offset
FROM cum
"""


def source_cap(sf_dir: str) -> str:
    from .constants import SOURCE_CAP

    return f"""
WITH ranked AS (
  SELECT doc_id, source, n_chars,
    CAST(row_number() OVER (PARTITION BY source
      ORDER BY n_chars DESC, doc_id ASC) AS INT) AS rk
  FROM documents
)
SELECT doc_id, source, n_chars, rk FROM ranked WHERE rk <= {SOURCE_CAP}
"""


def quality_quantile(sf_dir: str) -> str:
    from .constants import QUALITY_PCT

    stop = _score(STOPWORDS_EN)
    n_tok = "len(string_split(text, ' '))"
    punct = "len(regexp_extract_all(text, '[^a-z0-9 ]'))"
    quality = (
        f"round(0.4 * round({stop} / {n_tok}, 6)"
        f" + 0.3 * least(1.0, {n_tok} / 100.0)"
        f" + 0.3 * (1.0 - round({punct} / length(text), 6)), 6)"
    )
    return f"""
WITH scored AS (
  SELECT doc_id, lang, {quality} AS quality FROM documents
), ranked AS (
  SELECT doc_id, lang, quality,
    round(percent_rank() OVER (PARTITION BY lang
      ORDER BY quality, doc_id), 6) AS pr
  FROM scored
)
SELECT doc_id, lang, quality, pr FROM ranked WHERE pr >= {QUALITY_PCT}
"""


def stratified_sample(sf_dir: str) -> str:
    from .constants import STRATA_QUOTA

    return f"""
WITH ranked AS (
  SELECT doc_id, lang,
    CAST(row_number() OVER (PARTITION BY lang
      ORDER BY md5(text), doc_id ASC) AS INT) AS pick_rank
  FROM documents
)
SELECT doc_id, lang, pick_rank FROM ranked WHERE pick_rank <= {STRATA_QUOTA}
"""


def doc_logprob(sf_dir: str) -> str:
    from .constants import DEC, LM_ROUND

    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), total AS (SELECT COUNT(*) AS n FROM tok),
vocab AS (
  SELECT token,
    round(-ln(COUNT(*) / CAST((SELECT n FROM total) AS DOUBLE)), {LM_ROUND}) AS nll
  FROM tok GROUP BY token
)
SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
  round(CAST(SUM(CAST(v.nll AS {DEC})) AS DOUBLE) / COUNT(*), {LM_ROUND}) AS avg_nll
FROM tok t JOIN vocab v ON t.token = v.token
GROUP BY t.doc_id
"""


def lang_confusion(sf_dir: str) -> str:
    scores = {lang: _score(words) for lang, words in LANG_MARKERS}
    greatest = "greatest(" + ", ".join(scores.values()) + ")"
    case = "CASE " + " ".join(
        f"WHEN {scores[lang]} = {greatest} THEN '{lang}'" for lang, _ in LANG_MARKERS
    ) + " END"
    return f"""
SELECT lang AS lang_true, {case} AS lang_pred,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1, 2
"""


def bm25_core(tok_expr: str = "string_split(text, ' ')") -> str:
    """CTE chain ending in `bm(query_id, doc_id, score)` — the top-k BM25
    rank list (operators/search.bm25_scores mirror). Shared by the search
    entry and the hybrid-RRF fusion oracle. Float discipline: idf and
    per-term scores round to 6 before the decimal sum; avgdl is the IEEE
    double division of two exact integers; expression association matches
    the Spark side term-for-term. `tok_expr` swaps the tokenizer (the char
    twin passes the non-space character split, mirroring
    functions/text._TOKENIZERS['char'])."""
    from .constants import ANN_K2, BM25_B, BM25_K1, N_QUERIES

    return f"""post AS (
  SELECT doc_id, unnest({tok_expr}) AS token FROM documents
), tfs AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM post GROUP BY 1, 2
), dl AS (
  SELECT doc_id, SUM(tf) AS dl FROM tfs GROUP BY 1
), st AS (
  SELECT CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS n_docs,
         CAST((SELECT SUM(dl) FROM dl) AS DOUBLE)
           / CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS avgdl
), idf AS (
  SELECT token,
         round(ln(1.0 + ((SELECT n_docs FROM st) - COUNT(*) + 0.5)
                        / (COUNT(*) + 0.5)), 6) AS idf
  FROM tfs GROUP BY token
), qterms AS (
  SELECT DISTINCT doc_id AS query_id, token FROM tfs WHERE doc_id < {N_QUERIES}
), ts AS (
  SELECT q.query_id, p.doc_id,
         CAST(round(i.idf * (p.tf / (p.tf + {BM25_K1} * ({1.0 - BM25_B!r}
           + {BM25_B} * d.dl / (SELECT avgdl FROM st)))), 6)
           AS DECIMAL(18,6)) AS ts
  FROM tfs p
  JOIN qterms q ON q.token = p.token AND p.doc_id <> q.query_id
  JOIN dl d ON d.doc_id = p.doc_id
  JOIN idf i ON i.token = p.token
), bm AS (
  SELECT query_id, doc_id, score FROM (
    SELECT query_id, doc_id, CAST(SUM(ts) AS DOUBLE) AS score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY CAST(SUM(ts) AS DOUBLE) DESC, doc_id) AS rn
    FROM ts GROUP BY query_id, doc_id)
  WHERE rn <= {ANN_K2}
)"""


def bm25_doc_search(sf_dir: str) -> str:
    return f"""
WITH {bm25_core()}
SELECT query_id, doc_id, score FROM bm
"""


def bm25_doc_search_char(sf_dir: str) -> str:
    """Char-tokenizer twin (operators/search.bm25_doc_search_char): every
    non-space character is a token — same split DuckDB expression the
    minhash char twin uses (SHINGLES_CHAR_CTE), same BM25 chain."""
    return f"""
WITH {bm25_core("list_filter(string_split(text, ''), x -> x != ' ')")}
SELECT query_id, doc_id, score FROM bm
"""


def phrase_match(sf_dir: str) -> str:
    """ES match_phrase mirror (operators/search.phrase_match): first
    PHRASE_LEN tokens of each query doc, space-delimited substring test on
    the padded text."""
    from .constants import N_QUERIES, PHRASE_LEN

    return f"""
WITH probes AS (
  SELECT doc_id AS query_id,
         array_to_string(string_split(text, ' ')[1:{PHRASE_LEN}], ' ') AS phrase
  FROM documents WHERE doc_id < {N_QUERIES}
)
SELECT p.query_id, d.doc_id
FROM documents d JOIN probes p
  ON contains(' ' || d.text || ' ', ' ' || p.phrase || ' ')
WHERE d.doc_id <> p.query_id
"""


def boilerplate_scrub(sf_dir: str) -> str:
    from .constants import BOILER_MIN_FREQ, SEG_TOKENS

    return f"""
WITH segs AS (
  SELECT doc_id, CAST(s // {SEG_TOKENS} AS INT) AS seg_id,
         array_to_string(t[s + 1 : s + {SEG_TOKENS}], ' ') AS seg
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       LATERAL (SELECT unnest(range(0, len(t), {SEG_TOKENS})) AS s) r
), boiler AS (
  SELECT seg FROM segs GROUP BY seg HAVING COUNT(*) >= {BOILER_MIN_FREQ}
), kept AS (
  SELECT * FROM segs WHERE seg NOT IN (SELECT seg FROM boiler)
), agg AS (
  SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_id) AS clean_text,
         CAST(COUNT(*) AS BIGINT) AS n_kept
  FROM kept GROUP BY doc_id
), tot AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_seg FROM segs GROUP BY doc_id
)
SELECT t.doc_id,
       coalesce(a.clean_text, '') AS clean_text,
       coalesce(a.n_kept, 0) AS n_kept,
       t.n_seg - coalesce(a.n_kept, 0) AS n_removed
FROM tot t LEFT JOIN agg a ON a.doc_id = t.doc_id
"""


def dedup_report(sf_dir: str) -> str:
    canon = dedup_minhash_canonical(sf_dir)
    return f"""
WITH canon AS ({canon}),
d0 AS (
  SELECT doc_id, source, md5(text) AS h,
         len(string_split(text, ' ')) AS n_tok
  FROM documents
),
d AS (
  SELECT *, (doc_id <> MIN(doc_id) OVER (PARTITION BY source, h)) AS is_exact_dup
  FROM d0
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) - COUNT(DISTINCT d.h) AS BIGINT) AS exact_dup_docs,
       CAST(SUM(CASE WHEN c.canonical_id <> d.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS near_dup_docs,
       CAST(SUM(CASE WHEN c.canonical_id <> d.doc_id AND NOT d.is_exact_dup
                THEN 1 ELSE 0 END) AS BIGINT) AS near_only_dup_docs,
       CAST(SUM(d.n_tok) AS BIGINT) AS tokens_total,
       round(CAST(SUM(CASE WHEN c.canonical_id <> d.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 4) AS near_dup_ratio
FROM d JOIN canon c ON c.doc_id = d.doc_id
GROUP BY d.source
"""


def _dup_span_cte() -> str:
    """Shared CTE chain for the Lee-et-al span dedup twins: stride-1
    W-token windows → corpus-frequency filter → gaps-and-islands merge
    into maximal (doc_id, span_start, span_len) spans."""
    from .constants import DUPSPAN_MIN_FREQ, DUPSPAN_W

    w = DUPSPAN_W
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
w AS (
  SELECT doc_id, CAST(s AS INT) AS pos,
         array_to_string(t[s + 1 : s + {w}], ' ') AS win
  FROM t, LATERAL (SELECT unnest(range(0, greatest(len(t) - {w} + 1, 0))) AS s) r
), d AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY win) AS n FROM w
  ) WHERE n >= {DUPSPAN_MIN_FREQ}
), isl AS (
  SELECT doc_id, pos,
         CASE WHEN max(pos) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + {w} >= pos
              THEN 0 ELSE 1 END AS new_span
  FROM d
), g AS (
  SELECT doc_id, pos,
         SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
  FROM isl
), sp AS (
  SELECT doc_id, MIN(pos) AS span_start,
         MAX(pos) + {w} - MIN(pos) AS span_len
  FROM g GROUP BY doc_id, span_id
)"""


def dup_spans(sf_dir: str) -> str:
    return (
        _dup_span_cte()
        + """
SELECT sp.doc_id, sp.span_start, sp.span_len,
       array_to_string(t.t[sp.span_start + 1 : sp.span_start + sp.span_len], ' ')
         AS span_text
FROM sp JOIN t ON t.doc_id = sp.doc_id
"""
    )


def dup_span_scrub(sf_dir: str) -> str:
    return (
        _dup_span_cte()
        + """
, kept AS (
  SELECT t.doc_id, tok.i, t.t[tok.i + 1] AS tk
  FROM t, LATERAL (SELECT unnest(range(0, len(t.t))) AS i) tok
  WHERE NOT EXISTS (
    SELECT 1 FROM sp
    WHERE sp.doc_id = t.doc_id
      AND tok.i >= sp.span_start
      AND tok.i < sp.span_start + sp.span_len)
), agg AS (
  SELECT doc_id, string_agg(tk, ' ' ORDER BY i) AS clean_text,
         CAST(COUNT(*) AS BIGINT) AS n_tokens_kept
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       coalesce(a.clean_text, '') AS clean_text,
       coalesce(a.n_tokens_kept, 0) AS n_tokens_kept,
       CAST(len(t.t) AS BIGINT) - coalesce(a.n_tokens_kept, 0) AS n_tokens_removed
FROM t LEFT JOIN agg a ON a.doc_id = t.doc_id
"""
    )
