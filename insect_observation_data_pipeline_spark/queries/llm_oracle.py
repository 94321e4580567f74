"""DuckDB oracles for the LLM-pipeline queries.

The md5-hex-based hashing in the dedup operators is deliberately
engine-portable, so even MinHash signatures and SimHash bits reproduce
bit-for-bit here. DuckDB quirks handled: regexp_replace needs the 'g'
flag (Spark replaces all matches by default); len()/instr()/row_number()
return BIGINT (cast to INTEGER where Spark yields int); integer division
is ``//``.
"""

from __future__ import annotations

_NORM_TEXT = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"

_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"

_SHINGLES_CTE = f"""
    toks AS (
        SELECT doc_id, {_TOKS} AS tk FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(
                   generate_series(1, greatest(len(tk) - 2, 0)),
                   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle
        FROM toks
    )
"""

_JACCARD_CTE = f"""
    {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM sh a JOIN sh b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    jac AS (
        SELECT i.doc_a, i.doc_b,
               ((floor(abs(i.n_inter / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE)) * 10000.0 + 0.5) / 10000.0) * (CASE WHEN (i.n_inter / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE)) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS jaccard
        FROM inter i
        JOIN sizes sa ON i.doc_a = sa.doc_id
        JOIN sizes sb ON i.doc_b = sb.doc_id
    )
"""


def _simhash_sums() -> str:
    terms = []
    for b in range(16):
        k = b // 4
        div = 2 ** (b % 4)
        digit = f"(instr('0123456789abcdef', substr(h4, {k + 1}, 1)) - 1)"
        terms.append(
            f"sum(CASE WHEN ({digit} // {div}) % 2 = 1 THEN 1 ELSE -1 END) AS s{b}"
        )
    return ",\n               ".join(terms)


def _simhash_value() -> str:
    return " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {2 ** b} ELSE 0 END)" for b in range(16)
    )


_MINHASH_SIGS = ",\n               ".join(
    f"min(md5('{j}:' || shingle)) AS m{j}" for j in range(8)
)

_BANDS_UNION = "\n        UNION ALL\n".join(
    f"        SELECT doc_id, {b} AS band_idx, "
    f"md5(m{2 * b} || '|' || m{2 * b + 1}) AS band_hash FROM sigs"
    for b in range(4)
)

LLM_ORACLE: dict[str, str] = {
    "x1_dedup_exact": f"""
        -- NULL text matches nothing: singleton keepers, in lockstep
        -- with exact_groups (round-14 review) — one scan, one
        -- aggregate; the second group key is non-NULL only for
        -- missing-text docs, giving them per-doc groups
        SELECT fp, min(doc_id) AS keeper_id, count(*) AS n_docs
        FROM (
            SELECT doc_id, md5({_NORM_TEXT}) AS fp FROM documents
        )
        GROUP BY fp, CASE WHEN fp IS NULL THEN doc_id END
    """,
    "x3_text_quality": f"""
        WITH base AS (
            SELECT doc_id, lang, text, {_TOKS} AS tk FROM documents
        ), m AS (
            SELECT doc_id, lang, text, tk,
                   CAST(len(tk) AS INTEGER) AS n_tokens,
                   -- NULLIF denominators mirror the engine's zero-token
                   -- guard (round-12: empty docs must yield NULL ratios,
                   -- not DIVIDE_BY_ZERO under Spark ANSI / inf here)
                   CAST(NULLIF(len(tk), 0) AS DOUBLE) AS nd,
                   CAST(list_sum(list_transform(tk, t -> len(t))) AS DOUBLE) AS sum_len,
                   CAST(len(list_filter(tk, t -> list_contains(
                       ['the','a','of','and','to','in'], t))) AS DOUBLE) AS stop_cnt,
                   CAST(len(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
                        AS DOUBLE) / NULLIF(len(text), 0) AS alnum_raw,
                   -- markers count on LOWERCASED tokens, as lang_id
                   -- tokenizes lower(text) (round-12: sentence-initial
                   -- 'The'/'Le'/'El'/'Der' must count)
                   len(list_filter(tk, t -> list_contains(
                       ['the','a','of','and'], lower(t)))) AS s_en,
                   len(list_filter(tk, t -> list_contains(
                       ['und','der','die','das'], lower(t)))) AS s_de,
                   len(list_filter(tk, t -> list_contains(
                       ['le','la','les','et'], lower(t)))) AS s_fr,
                   len(list_filter(tk, t -> list_contains(
                       ['el','los','las','una'], lower(t)))) AS s_es
            FROM base
        ), p AS (
            SELECT *,
                   CASE
                     WHEN s_en > 0 AND s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                     WHEN s_de > 0 AND s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                     WHEN s_fr > 0 AND s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                     WHEN s_es > 0 AND s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
                     ELSE 'und'
                   END AS pred_lang
            FROM m
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(lower(text),
                    '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INTEGER) AS n_bpe_tokens,
               n_tokens,
               ((floor(abs(sum_len / nd) * 100.0 + 0.5) / 100.0) * (CASE WHEN (sum_len / nd) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS avg_token_len,
               ((floor(abs(stop_cnt / nd) * 1000.0 + 0.5) / 1000.0) * (CASE WHEN (stop_cnt / nd) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS stopword_ratio,
               ((floor(abs(alnum_raw) * 1000.0 + 0.5) / 1000.0) * (CASE WHEN (alnum_raw) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS alnum_ratio,
               ((floor(abs(least(nd / 100.0, 1.0) * 0.5 + ((floor(abs(stop_cnt / nd) * 1000.0 + 0.5) / 1000.0) * (CASE WHEN (stop_cnt / nd) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) * 0.3 + ((floor(abs(alnum_raw) * 1000.0 + 0.5) / 1000.0) * (CASE WHEN (alnum_raw) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) * 0.2) * 10000.0 + 0.5) / 10000.0) * (CASE WHEN (least(nd / 100.0, 1.0) * 0.5 + ((floor(abs(stop_cnt / nd) * 1000.0 + 0.5) / 1000.0) * (CASE WHEN (stop_cnt / nd) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) * 0.3 + ((floor(abs(alnum_raw) * 1000.0 + 0.5) / 1000.0) * (CASE WHEN (alnum_raw) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) * 0.2) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS quality_score,
               pred_lang,
               lang,
               (pred_lang = lang) AS is_correct
        FROM p
    """,
    "x5_fingerprint": f"""
        SELECT doc_id,
               md5({_NORM_TEXT}) AS fp128,
               -- 15 hex chars = 60 bits, mirrors textstats.fingerprint64
               ('0x' || substr(md5({_NORM_TEXT}), 1, 15))::BIGINT AS fp64
        FROM documents
    """,
    "x6_ngram_jaccard": f"""
        WITH {_JACCARD_CTE}
        SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.2
    """,
    "x27_jaccard_maxdf": f"""
        WITH {_SHINGLES_CTE},
        dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
        jsh AS (
            SELECT s.doc_id, s.shingle
            FROM sh s JOIN dfreq d ON s.shingle = d.shingle AND d.df <= 2
        ),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
            FROM jsh a JOIN jsh b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT i.doc_a, i.doc_b,
               ((floor(abs(i.n_inter / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE)) * 10000.0 + 0.5) / 10000.0) * (CASE WHEN (i.n_inter / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE)) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS jaccard
        FROM inter i
        JOIN sizes sa ON i.doc_a = sa.doc_id
        JOIN sizes sb ON i.doc_b = sb.doc_id
        WHERE ((floor(abs(i.n_inter / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE)) * 10000.0 + 0.5) / 10000.0) * (CASE WHEN (i.n_inter / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE)) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) >= 0.2
    """,
    "x32_containment": f"""
        WITH {_SHINGLES_CTE},
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
            FROM sh a JOIN sh b
              ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
            GROUP BY 1, 2
        )
        SELECT i.doc_a, i.doc_b,
               ((floor(abs(i.n_inter / CAST(sa.n_sh AS DOUBLE)) * 10000.0 + 0.5) / 10000.0) * (CASE WHEN (i.n_inter / CAST(sa.n_sh AS DOUBLE)) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS containment
        FROM inter i
        JOIN sizes sa ON i.doc_a = sa.doc_id
        WHERE ((floor(abs(i.n_inter / CAST(sa.n_sh AS DOUBLE)) * 10000.0 + 0.5) / 10000.0) * (CASE WHEN (i.n_inter / CAST(sa.n_sh AS DOUBLE)) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) >= 0.6
    """,
    "x31_corpus_summary": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len({_TOKS})) AS BIGINT) AS total_tokens,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(count(DISTINCT md5({_NORM_TEXT})) AS BIGINT) AS n_unique_docs,
               CAST(count(*) - count(DISTINCT md5({_NORM_TEXT})) AS BIGINT) AS n_exact_dup_docs,
               CAST(min(len({_TOKS})) AS INTEGER) AS min_tokens,
               CAST(max(len({_TOKS})) AS INTEGER) AS max_tokens
        FROM documents
    """,
    "x29_incremental_dedup": f"""
        WITH {_SHINGLES_CTE},
        sigs AS (
            SELECT doc_id,
               {_MINHASH_SIGS}
            FROM sh GROUP BY doc_id
        ),
        bands AS (
{_BANDS_UNION}
        ),
        exact AS (
            SELECT DISTINCT b.doc_id
            FROM documents b
            WHERE b.doc_id % 10 = 0 AND EXISTS (
                SELECT 1 FROM documents c
                WHERE c.doc_id % 10 <> 0
                  AND md5({_NORM_TEXT.replace('text', 'c.text')}) =
                      md5({_NORM_TEXT.replace('text', 'b.text')})
            )
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS b_id, b.doc_id AS c_id
            FROM bands a JOIN bands b
              ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
            WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
        ),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (
            SELECT c.b_id, c.c_id, count(*) AS n_inter
            FROM cand c
            JOIN sh sa ON sa.doc_id = c.b_id
            JOIN sh sb ON sb.doc_id = c.c_id AND sb.shingle = sa.shingle
            GROUP BY 1, 2
        ),
        near AS (
            SELECT DISTINCT i.b_id AS doc_id
            FROM inter i
            JOIN sizes sa ON i.b_id = sa.doc_id
            JOIN sizes sb ON i.c_id = sb.doc_id
            WHERE ((floor(abs(i.n_inter / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE)) * 10000.0 + 0.5) / 10000.0) * (CASE WHEN (i.n_inter / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE)) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) >= 0.2
        )
        SELECT d.doc_id,
               (e.doc_id IS NULL AND n.doc_id IS NULL) AS keep,
               CASE WHEN e.doc_id IS NOT NULL THEN 'exact'
                    WHEN n.doc_id IS NOT NULL THEN 'near_dup'
                    ELSE 'kept' END AS reason
        FROM documents d
        LEFT JOIN exact e ON d.doc_id = e.doc_id
        LEFT JOIN near n ON d.doc_id = n.doc_id
        WHERE d.doc_id % 10 = 0
    """,
    "x28_quantize_int8": """
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        s AS (
            SELECT vec_id, e,
                   CASE WHEN list_aggregate(list_transform(e, x -> abs(x)), 'max') = 0
                        THEN 1.0
                        ELSE list_aggregate(list_transform(e, x -> abs(x)), 'max')
                   END AS sc
            FROM v
        ),
        q AS (
            SELECT vec_id, sc, len(e) AS nd,
                   list_transform(
                       generate_series(1, len(e)),
                       i -> CAST(((floor(abs(e[i] / sc * 127.0) * 1.0 + 0.5) / 1.0) * (CASE WHEN (e[i] / sc * 127.0) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS BIGINT)
                   ) AS qq
            FROM s
        )
        SELECT vec_id,
               ((floor(abs(sc) * 1000000.0 + 0.5) / 1000000.0) * (CASE WHEN sc < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS scale_q,
               CAST(nd AS INTEGER) AS n_dims,
               CAST(list_sum(list_transform(qq, x -> abs(x))) AS BIGINT) AS q_l1,
               CAST(list_sum(list_transform(generate_series(1, nd), i -> qq[i] * i)) AS BIGINT) AS q_checksum
        FROM q
    """,
    "x7_minhash_lsh": f"""
        WITH {_JACCARD_CTE},
        sigs AS (
            SELECT doc_id,
               {_MINHASH_SIGS}
            FROM sh GROUP BY doc_id
        ),
        bands AS (
{_BANDS_UNION}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id
        )
        SELECT c.doc_a, c.doc_b, coalesce(j.jaccard, 0.0) AS jaccard
        FROM cand c LEFT JOIN jac j
          ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
        WHERE coalesce(j.jaccard, 0.0) >= 0.2
    """,
    "x8_simhash": f"""
        WITH tok AS (
            SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
        ), h AS (
            SELECT doc_id, substr(md5(tok), 1, 4) AS h4 FROM tok
        ), b AS (
            SELECT doc_id,
               {_simhash_sums()}
            FROM h GROUP BY doc_id
        )
        SELECT doc_id, CAST({_simhash_value()} AS INTEGER) AS simhash FROM b
    """,
    "x9_ann_bruteforce": """
        WITH q AS (
            SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
            FROM embeddings WHERE vec_id < 5
        ), c AS (
            SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
            FROM embeddings WHERE vec_id >= 5
        ), scored AS (
            SELECT query_id, neighbor_id,
                   ((floor(abs(list_cosine_similarity(qv, cv)) * 10000.0 + 0.5) / 10000.0) * (CASE WHEN (list_cosine_similarity(qv, cv)) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS cosine_sim
            FROM q, c
        ), r AS (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
            ) AS rn
            FROM scored
        )
        SELECT query_id, neighbor_id, cosine_sim, CAST(rn AS INTEGER) AS rank
        FROM r WHERE rn <= 5
    """,
    "x10_ann_ivf": """
        WITH dims AS (
            SELECT e.label AS cell, t.i AS i,
                   CAST(e.embedding[t.i] AS DOUBLE) AS v
            FROM embeddings e, generate_series(1, 64) t(i)
            WHERE e.vec_id >= 5
        ), per_dim AS (
            -- centroid components snapped at 1e-6, mirroring
            -- ivf_topk's centroid_digits (round-12: raw float means
            -- are fold-order-dependent; both engines must route on
            -- the same snapped centroids)
            SELECT cell, i,
                   ((floor(abs(avg(v)) * 1000000.0 + 0.5) / 1000000.0)
                    * (CASE WHEN (avg(v)) < 0 THEN -1.0 ELSE 1.0 END)
                    + 0.0) AS av
            FROM dims GROUP BY cell, i
        ), cent AS (
            SELECT cell, list(av ORDER BY i) AS centroid FROM per_dim GROUP BY cell
        ), q AS (
            SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
            FROM embeddings WHERE vec_id < 5
        ), routed AS (
            SELECT query_id, qv, cell,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY ((floor(abs(list_cosine_similarity(qv, centroid)) * 10000.0 + 0.5) / 10000.0) * (CASE WHEN (list_cosine_similarity(qv, centroid)) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) DESC,
                                cell
                   ) AS rn
            FROM q, cent
        ), sel AS (
            SELECT query_id, qv, cell FROM routed WHERE rn = 1
        ), scored AS (
            SELECT s.query_id, e.vec_id AS neighbor_id,
                   ((floor(abs(list_cosine_similarity(s.qv, e.embedding::DOUBLE[])) * 10000.0 + 0.5) / 10000.0) * (CASE WHEN (list_cosine_similarity(s.qv, e.embedding::DOUBLE[])) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS cosine_sim
            FROM sel s JOIN embeddings e
              ON e.label = s.cell AND e.vec_id >= 5
        ), r AS (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
            ) AS rn
            FROM scored
        )
        SELECT query_id, neighbor_id, cosine_sim, CAST(rn AS INTEGER) AS rank
        FROM r WHERE rn <= 3
    """,
    "m1_binary_meta": """
        SELECT doc_id,
               CAST(octet_length(text::BLOB) AS INTEGER) AS n_bytes,
               sha256(text) AS sha_hex
        FROM documents
    """,
    "e8_window_census": """
        SELECT 'tumbling_1h' AS win_kind,
               date_trunc('hour', ts) AS window_start, event_type,
               count(*) AS n_events,
               ((floor(abs(sum(value)) * 100.0 + 0.5) / 100.0) * (CASE WHEN (sum(value)) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS sum_value
        FROM events
        GROUP BY 2, 3
        UNION ALL
        SELECT 'sliding_1h_30m' AS win_kind,
               window_start, event_type,
               count(*) AS n_events,
               ((floor(abs(sum(value)) * 100.0 + 0.5) / 100.0) * (CASE WHEN (sum(value)) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS sum_value
        FROM (
            SELECT event_type, value,
                   unnest([time_bucket(INTERVAL '30 minutes', ts),
                           time_bucket(INTERVAL '30 minutes', ts)
                               - INTERVAL '30 minutes']) AS window_start
            FROM events
        ) b
        GROUP BY 2, 3
    """,
    "e2_sessionization": """
        WITH g AS (
            SELECT user_id,
                   epoch_us(ts) - epoch_us(lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   )) AS gap_us
            FROM events
        )
        SELECT user_id,
               count(*) AS n_events,
               CAST(1 + sum(CASE WHEN gap_us > 600000000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_sessions
        FROM g
        GROUP BY user_id
        ORDER BY user_id
    """,
    "x11_dedup_embedding": """
        WITH e AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
        ), scored AS (
            SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                   ((floor(abs(list_cosine_similarity(a.v, b.v)) * 10000.0 + 0.5) / 10000.0) * (CASE WHEN (list_cosine_similarity(a.v, b.v)) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS cosine_sim
            FROM e a JOIN e b
              ON a.label = b.label AND a.vec_id < b.vec_id
        )
        SELECT a_id, b_id, cosine_sim FROM scored WHERE cosine_sim >= 0.35
    """,
}


def _lsh_oracle_sql(
    planes: int = 4, dims: int = 64, k: int = 3, probe_bits: int = 0
) -> str:
    """Build the x12/x13 oracle with the SAME deterministic hyperplanes
    the Spark side derives (md5-parity ±1), embedded as list literals.
    ``probe_bits`` mirrors the Spark multi-probe: the query side fans
    out over every bucket within that Hamming distance (each probe
    expression is the sign concat with that bit subset inverted); a
    candidate lives in one bucket so probes never duplicate a pair."""
    from itertools import combinations

    from insect_observation_data_pipeline_spark.llm.similarity import hyperplanes

    hp = hyperplanes(planes, dims)
    lits = [
        "[" + ",".join(f"{x:.1f}" for x in h) + "]::DOUBLE[]" for h in hp
    ]

    def bucket_expr(flipped: frozenset) -> str:
        parts = []
        for idx, lit in enumerate(lits):
            one, zero = ("0", "1") if idx in flipped else ("1", "0")
            parts.append(
                f"(CASE WHEN list_dot_product(v, {lit}) > 0"
                f" THEN '{one}' ELSE '{zero}' END)"
            )
        return " || ".join(parts)

    masks = [frozenset()]
    for r in range(1, probe_bits + 1):
        masks += [frozenset(c) for c in combinations(range(planes), r)]
    if probe_bits:
        q_bucket = f"unnest([{', '.join(bucket_expr(m) for m in masks)}])"
    else:
        q_bucket = bucket_expr(frozenset())

    cos = "list_cosine_similarity(q.v, c.v)"
    rounded = (
        f"((floor(abs({cos}) * 10000.0 + 0.5) / 10000.0) * "
        f"(CASE WHEN ({cos}) < 0 THEN -1.0 ELSE 1.0 END) + 0.0)"
    )
    return f"""
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), q AS (
            SELECT vec_id AS query_id, v, {q_bucket} AS bucket
            FROM e WHERE vec_id < 5
        ), c AS (
            SELECT vec_id AS neighbor_id, v, {bucket_expr(frozenset())} AS bucket
            FROM e WHERE vec_id >= 5
        ), scored AS (
            SELECT q.query_id, c.neighbor_id, {rounded} AS cosine_sim
            FROM q JOIN c USING (bucket)
        ), r AS (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
            ) AS rn
            FROM scored
        )
        SELECT query_id, neighbor_id, cosine_sim, CAST(rn AS INTEGER) AS rank
        FROM r WHERE rn <= {k}
    """


LLM_ORACLE["x12_ann_lsh"] = _lsh_oracle_sql()
LLM_ORACLE["x13_ann_lsh_multiprobe"] = _lsh_oracle_sql(probe_bits=3)

# single spelling of the sign-stable rounding SQL (round-12 review: two
# more hand-maintained copies of the one formula the hash-parity scheme
# depends on lived here and in the sibling oracle module; an edit to one
# would desynchronize stable_round from one oracle but not the other) —
# byte-identical output to the deleted local twin for every digits used
from insect_observation_data_pipeline_spark.functions.numeric import sround_sql as _sr  # noqa: E501


# --- curation operators (x14-x16) + dup clustering (h1) -------------------

LLM_ORACLE["x14_stratified_sample"] = """
    SELECT doc_id, lang, source
    FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
          < (CASE WHEN lang = 'en' THEN 25 ELSE 100 END)
"""

LLM_ORACLE["x15_pack_sequences"] = f"""
    WITH t AS (
        SELECT doc_id, lang,
               CAST(len({_TOKS}) AS INTEGER) AS n_tokens
        FROM documents
    ), c AS (
        SELECT doc_id, lang, n_tokens,
               CAST(sum(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING
               ) - n_tokens AS BIGINT) AS pack_offset
        FROM t
    )
    SELECT doc_id, lang, n_tokens, pack_offset,
           CAST(floor(pack_offset / 2048.0) AS BIGINT) AS pack_id
    FROM c
"""

_P_URL = r"https?://[^\s]+"
_P_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_P_NUM = r"[0-9]{4,}"

LLM_ORACLE["x16_scrub_pii"] = f"""
    WITH s1 AS (
        SELECT doc_id, text AS t0,
               regexp_replace(text, '{_P_URL}', '<URL>', 'g') AS t1
        FROM documents
    ), s2 AS (
        SELECT doc_id, t0, t1,
               regexp_replace(t1, '{_P_EMAIL}', '<EMAIL>', 'g') AS t2
        FROM s1
    )
    SELECT doc_id,
           regexp_replace(t2, '{_P_NUM}', '<NUM>', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(t0, '{_P_URL}'))
              + len(regexp_extract_all(t1, '{_P_EMAIL}'))
              + len(regexp_extract_all(t2, '{_P_NUM}')) AS INTEGER)
               AS n_redactions
    FROM s2
"""

_TFIDF = "tf.tf * n.n_docs / CAST(dft.df AS DOUBLE)"

LLM_ORACLE["x17_tfidf_top_terms"] = f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split(lower(text), ' '),
                                  x -> x <> '')) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
    ), dft AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1
    ), n AS (
        SELECT count(DISTINCT doc_id) AS n_docs FROM documents
    ), scored AS (
        SELECT tf.doc_id, tf.term, {_sr(_TFIDF, 4)} AS tfidf
        FROM tf JOIN dft ON tf.term = dft.term CROSS JOIN n
    ), r AS (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, term
        ) AS rn
        FROM scored
    )
    SELECT doc_id, term, tfidf, CAST(rn AS INTEGER) AS rank
    FROM r WHERE rn <= 3
"""

LLM_ORACLE["x18_quality_filter"] = f"""
    WITH q AS ({{x3}}
    ), s AS (
        SELECT q.doc_id, d.lang, q.quality_score,
               percent_rank() OVER (
                   PARTITION BY d.lang ORDER BY q.quality_score
               ) AS pr
        FROM q JOIN documents d ON q.doc_id = d.doc_id
    )
    SELECT doc_id, lang, quality_score, {_sr("pr", 4)} AS pct_rank
    FROM s WHERE pr >= 0.5
""".format(x3=LLM_ORACLE["x3_text_quality"])

# The sliding half of e8_window_census: an event at t lands in the two
# 30-min-aligned window starts {bucket30(t), bucket30(t) - 30min} for a
# 1 h window sliding by 30 min (time_bucket's origin is 30-min aligned,
# matching Spark's epoch-aligned window()).

_TOKS_LOWER = "list_filter(string_split(lower(text), ' '), x -> x <> '')"

LLM_ORACLE["x19_bigram_topk"] = f"""
    WITH t AS (
        SELECT {_TOKS_LOWER} AS tk FROM documents
    ), b AS (
        SELECT unnest(list_transform(
                   generate_series(1, greatest(len(tk) - 1, 0)),
                   i -> tk[i] || ' ' || tk[i+1])) AS bigram
        FROM t
    )
    SELECT bigram, count(*) AS n
    FROM b GROUP BY 1
    ORDER BY n DESC, bigram
    LIMIT 20
"""

LLM_ORACLE["x20_chunk_documents"] = f"""
    WITH t AS (
        SELECT doc_id, {_TOKS} AS tk FROM documents
    ), s AS (
        SELECT doc_id, tk,
               unnest(generate_series(1, greatest(len(tk), 1), 40)) AS s
        FROM t
    )
    SELECT doc_id,
           CAST((s - 1) // 40 AS INTEGER) AS chunk_idx,
           array_to_string(tk[s : s + 49], ' ') AS chunk_text,
           CAST(len(tk[s : s + 49]) AS INTEGER) AS n_chunk_tokens
    FROM s
    -- lockstep with the Spark side (round-14 review): drop a trailing
    -- start whose window adds no new tokens (strict subset of the
    -- previous chunk); 9 = size - stride - 1
    WHERE s = 1 OR s + 9 < len(tk)
"""

LLM_ORACLE["x21_decontaminate"] = f"""
    WITH {_SHINGLES_CTE},
    ev AS (
        SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0
    )
    SELECT sh.doc_id, count(*) AS n_overlap
    FROM sh JOIN ev USING (shingle)
    WHERE sh.doc_id % 50 != 0
    GROUP BY sh.doc_id
    HAVING count(*) >= 2
"""

LLM_ORACLE["e4_json_props_rollup"] = """
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
               AS sum_k,
           CAST(max(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER)
               AS max_k
    FROM events GROUP BY 1
"""

LLM_ORACLE["m2_media_features"] = """
    SELECT doc_id,
           CAST(octet_length(text::BLOB) AS INTEGER) AS n_bytes,
           sha256(text) AS sha_hex,
           'fake' AS feature_kind
    FROM documents
"""

# Transitive closure of the x7 near-dup pairs as a recursive CTE:
# reach(node, r) enumerates every (node, reachable id) pair over the
# symmetrized edge set (UNION dedups, so it terminates); the component
# id is the min reachable id — same fixpoint the Spark min-label
# propagation converges to.
LLM_ORACLE["h1_dup_clusters"] = f"""
    WITH RECURSIVE pairs AS (
        SELECT doc_a, doc_b FROM ({LLM_ORACLE["x7_minhash_lsh"]})
    ), edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL
        SELECT doc_b AS u, doc_a AS v FROM pairs
    ), nodes AS (
        SELECT DISTINCT u AS node FROM edges
    ), reach AS (
        SELECT node, node AS r FROM nodes
        UNION
        SELECT e.v AS node, reach.r AS r
        FROM reach JOIN edges e ON e.u = reach.node
    )
    SELECT node AS doc_id, CAST(min(r) AS BIGINT) AS component_id
    FROM reach GROUP BY node
"""

# --- round-3 curation additions (x22-x24, h2) -----------------------------

LLM_ORACLE["x22_repetition_signals"] = f"""
    WITH tok AS (
        SELECT doc_id,
               unnest(list_filter(string_split(lower(text), ' '),
                                  x -> x <> '')) AS tok
        FROM documents
    ), tc AS (
        SELECT doc_id, tok, count(*) AS n FROM tok GROUP BY 1, 2
    ), agg AS (
        SELECT doc_id,
               CAST(sum(n) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(max(n) AS BIGINT) AS top_token_n
        FROM tc GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_distinct, top_token_n,
           {_sr("n_distinct / CAST(n_tokens AS DOUBLE)", 4)} AS distinct_frac,
           {_sr("top_token_n / CAST(n_tokens AS DOUBLE)", 4)} AS top_frac
    FROM agg
"""

LLM_ORACLE["x23_temperature_mix"] = f"""
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    m AS (SELECT max(n) AS n_max FROM c),
    r AS (
        SELECT lang,
               greatest(1, CAST(
                   {_sr("100.0 * sqrt(n / CAST(n_max AS DOUBLE))", 0)}
               AS INTEGER)) AS rate_pct
        FROM c, m
    )
    SELECT d.doc_id, d.lang, r.rate_pct
    FROM documents d JOIN r USING (lang)
    WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
          < r.rate_pct
"""

# Centroid = element-wise mean rounded to 1e-6 (matches the Spark side's
# engine-stability rounding); per-row cosine then rounded to 1e-4.
LLM_ORACLE["x24_centroid_outliers"] = f"""
    WITH ex0 AS (
        SELECT vec_id, label,
               unnest(list_zip(embedding,
                               generate_series(1, len(embedding)))) AS z
        FROM embeddings
    ), ex AS (
        SELECT vec_id, label, z[2] AS i, z[1]::DOUBLE AS v FROM ex0
    ), cent AS (
        SELECT label, i, {_sr("avg(v)", 6)} AS c
        FROM ex GROUP BY label, i
    ), cv AS (
        SELECT label, list(c ORDER BY i) AS cvec FROM cent GROUP BY label
    )
    SELECT e.vec_id, e.label,
           {_sr("list_cosine_similarity(e.embedding::DOUBLE[], cv.cvec)", 4)}
               AS centroid_sim
    FROM embeddings e JOIN cv USING (label)
"""

LLM_ORACLE["h2_cluster_keep"] = f"""
    WITH comp AS ({{h1}}),
    q AS (SELECT doc_id, quality_score FROM ({{x3}})),
    j AS (
        SELECT comp.component_id, comp.doc_id, q.quality_score
        FROM comp JOIN q USING (doc_id)
    ), r AS (
        SELECT *,
               row_number() OVER (
                   PARTITION BY component_id
                   ORDER BY quality_score DESC, doc_id ASC
               ) AS rn,
               count(*) OVER (PARTITION BY component_id) AS n_members
        FROM j
    )
    SELECT component_id, doc_id AS keep_doc_id,
           CAST(n_members AS BIGINT) AS n_members,
           quality_score AS best_score
    FROM r WHERE rn = 1
""".format(
    h1=LLM_ORACLE["h1_dup_clusters"], x3=LLM_ORACLE["x3_text_quality"]
)

LLM_ORACLE["x25_token_prob_score"] = f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split(lower(text), ' '),
                                  x -> x <> '')) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, count(*) AS n FROM toks GROUP BY 1, 2
    ), ctf AS (
        SELECT term, CAST(sum(n) AS BIGINT) AS ctf FROM tf GROUP BY term
    ), tot AS (
        SELECT CAST(sum(ctf) AS BIGINT) AS corpus_total FROM ctf
    ), agg AS (
        SELECT tf.doc_id,
               CAST(sum(tf.n) AS BIGINT) AS n_tokens,
               CAST(sum(tf.n * ctf.ctf) AS BIGINT) AS mass,
               any_value(tot.corpus_total) AS corpus_total
        FROM tf JOIN ctf USING (term) CROSS JOIN tot
        GROUP BY tf.doc_id
    )
    SELECT doc_id, n_tokens,
           {_sr("1000000.0 * mass / CAST(n_tokens * corpus_total AS DOUBLE)", 4)}
               AS mean_tok_ppm
    FROM agg
"""

# x26 = the x10 IVF oracle with the cell-probe widened from the single
# nearest centroid to the 4 nearest (the only semantic difference).
assert LLM_ORACLE["x10_ann_ivf"].count("WHERE rn = 1") == 1
LLM_ORACLE["x26_ann_ivf_probe4"] = LLM_ORACLE["x10_ann_ivf"].replace(
    "WHERE rn = 1", "WHERE rn <= 4"
)

LLM_ORACLE["x30_ann_ivf_kmeans"] = """
    -- PINNED oracle: x30's Lloyd's-trained IVF is an iterative float
    -- algorithm no single SQL query expresses, but its output IS
    -- deterministic: centroids are snapped at 1e-6 (round_centroids)
    -- before assignment, making the result stable across engines,
    -- partitionings and reruns (asserted under repartition(3)/(7) in
    -- tests/test_llm.py::test_x30_stable_under_repartitioning). These
    -- literal rows are that verified sf0.01 output; any drift in the
    -- trainer, the rounding, or the IVF probe path breaks the hash.
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           CAST(cosine_sim AS DOUBLE) AS cosine_sim,
           CAST(rank AS INTEGER) AS rank
    FROM (VALUES
        (0, 365, 0.37, 1),
        (0, 387, 0.3311, 2),
        (0, 423, 0.2969, 3),
        (1, 386, 0.3715, 1),
        (1, 195, 0.3227, 2),
        (1, 402, 0.2923, 3),
        (2, 117, 0.3181, 1),
        (2, 450, 0.2663, 2),
        (2, 145, 0.2635, 3),
        (3, 149, 0.3299, 1),
        (3, 343, 0.3085, 2),
        (3, 231, 0.2988, 3),
        (4, 280, 0.2798, 1),
        (4, 249, 0.2796, 2),
        (4, 89, 0.266, 3)
    ) AS t(query_id, neighbor_id, cosine_sim, rank)
"""

LLM_ORACLE["h3_containment_keep"] = f"""
    -- keep/drop over directed containment (the x32 pair set): doc_a
    -- drops when containment(a in b) >= 0.6 and b is strictly larger
    -- (shingle count), ties to the smaller doc_id — pairwise rule,
    -- exactly the Spark containment_keep policy.
    WITH {{shingles}},
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM sh a JOIN sh b
          ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
        GROUP BY 1, 2
    ),
    losers AS (
        SELECT DISTINCT i.doc_a AS doc_id
        FROM inter i
        JOIN sizes sa ON i.doc_a = sa.doc_id
        JOIN sizes sb ON i.doc_b = sb.doc_id
        WHERE {{score}} >= 0.6
          AND (sb.n_sh > sa.n_sh
               OR (sb.n_sh = sa.n_sh AND i.doc_b < i.doc_a))
    )
    SELECT d.doc_id,
           l.doc_id IS NULL AS keep,
           CASE WHEN l.doc_id IS NULL THEN 'kept' ELSE 'contained' END AS reason
    FROM documents d LEFT JOIN losers l ON d.doc_id = l.doc_id
""".format(
    shingles=_SHINGLES_CTE,
    score=_sr("i.n_inter / CAST(sa.n_sh AS DOUBLE)", 4),
)

LLM_ORACLE["x33_semdedup_keep"] = f"""
    -- embedding-path keep/drop: larger id of every within-cell cosine
    -- near-dup pair (>= 0.35, the x11 pair set) drops
    WITH e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ), losers AS (
        SELECT DISTINCT b.vec_id
        FROM e a JOIN e b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE {_sr('list_cosine_similarity(a.v, b.v)', 4)} >= 0.35
    )
    SELECT e.vec_id,
           l.vec_id IS NULL AS keep,
           CASE WHEN l.vec_id IS NULL THEN 'kept'
                ELSE 'near_embedding' END AS reason
    FROM e LEFT JOIN losers l ON e.vec_id = l.vec_id
"""

LLM_ORACLE["f_tokens_percentile"] = f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           {_sr('quantile_cont(n_toks, 0.5)', 4)} AS p50_tokens,
           {_sr('quantile_cont(n_toks, 0.9)', 4)} AS p90_tokens,
           {_sr('avg(n_toks)', 4)} AS mean_tokens
    FROM (SELECT lang, CAST(len({_TOKS}) AS DOUBLE) AS n_toks FROM documents)
    GROUP BY lang
"""

LLM_ORACLE["e5_session_window_stats"] = """
    -- gaps-and-islands replay of Spark's session_window(ts, 10 min):
    -- a new session starts when the gap to the previous event is
    -- STRICTLY more than 10 min — Spark merges sessions while
    -- new_start <= current_end, so an exactly-gap-later event stays in
    -- the running session (pinned by
    -- tests/test_llm.py::test_session_boundary_exact_gap_agreement);
    -- session_end = last event + gap
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 10 MINUTE
                         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM events
    ), islands AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess
        FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 10 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM islands
    GROUP BY user_id, sess
"""

LLM_ORACLE["x34_tf_cosine_pairs"] = f"""
    -- sparse tf-vector cosine: integer dot and squared norms (exact,
    -- order-independent), floats only at the final sqrt/divide
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split(lower(text), ' '),
                                  x -> x <> '')) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
    ), norms AS (
        SELECT doc_id, sum(tf * tf) AS sq FROM tf GROUP BY doc_id
    ), dots AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               sum(a.tf * b.tf) AS dot
        FROM tf a JOIN tf b
          ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           {_sr('d.dot / (sqrt(CAST(na.sq AS DOUBLE)) * sqrt(CAST(nb.sq AS DOUBLE)))', 4)} AS cosine_tf
    FROM dots d
    JOIN norms na ON d.doc_a = na.doc_id
    JOIN norms nb ON d.doc_b = nb.doc_id
    WHERE {_sr('d.dot / (sqrt(CAST(na.sq AS DOUBLE)) * sqrt(CAST(nb.sq AS DOUBLE)))', 4)} >= 0.85
"""

LLM_ORACLE["x34b_tf_cosine_candidates"] = f"""
    -- guarded sparse cosine over customer purchase baskets: candidates
    -- only through rare parts (df <= 20), each verified with the FULL
    -- integer dot product — exact scores, bounded fan-out
    WITH tf AS (
        SELECT o.o_custkey AS doc_id, l.l_partkey AS term, count(*) AS tf
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ), norms AS (
        SELECT doc_id, sum(tf * tf) AS sq FROM tf GROUP BY doc_id
    ), dft AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term
    ), rare AS (
        SELECT tf.doc_id, tf.term
        FROM tf JOIN dft USING (term) WHERE dft.df <= 20
    ), cands AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM rare a JOIN rare b
          ON a.term = b.term AND a.doc_id < b.doc_id
    ), dots AS (
        SELECT c.doc_a, c.doc_b, sum(ta.tf * tb.tf) AS dot
        FROM cands c
        JOIN tf ta ON ta.doc_id = c.doc_a
        JOIN tf tb ON tb.doc_id = c.doc_b AND tb.term = ta.term
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           {_sr('d.dot / (sqrt(CAST(na.sq AS DOUBLE)) * sqrt(CAST(nb.sq AS DOUBLE)))', 4)} AS cosine_tf
    FROM dots d
    JOIN norms na ON d.doc_a = na.doc_id
    JOIN norms nb ON d.doc_b = nb.doc_id
    WHERE {_sr('d.dot / (sqrt(CAST(na.sq AS DOUBLE)) * sqrt(CAST(nb.sq AS DOUBLE)))', 4)} >= 0.1
"""

LLM_ORACLE["h3b_containment_keep_maxdf"] = f"""
    -- guarded containment keep/drop: stop-shingles (df > 4) are cut
    -- from the pair JOIN only; |A| stays exact, so scores are a lower
    -- bound of h3's — fewer drops, zero false drops
    WITH {{shingles}},
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
    jsh AS (
        SELECT s.doc_id, s.shingle
        FROM sh s JOIN dfreq d ON s.shingle = d.shingle AND d.df <= 4
    ),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM jsh a JOIN jsh b
          ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
        GROUP BY 1, 2
    ),
    losers AS (
        SELECT DISTINCT i.doc_a AS doc_id
        FROM inter i
        JOIN sizes sa ON i.doc_a = sa.doc_id
        JOIN sizes sb ON i.doc_b = sb.doc_id
        WHERE {{score}} >= 0.6
          AND (sb.n_sh > sa.n_sh
               OR (sb.n_sh = sa.n_sh AND i.doc_b < i.doc_a))
    )
    SELECT d.doc_id,
           l.doc_id IS NULL AS keep,
           CASE WHEN l.doc_id IS NULL THEN 'kept' ELSE 'contained' END AS reason
    FROM documents d LEFT JOIN losers l ON d.doc_id = l.doc_id
""".format(
    shingles=_SHINGLES_CTE,
    score=_sr("i.n_inter / CAST(sa.n_sh AS DOUBLE)", 4),
)

LLM_ORACLE["x35_training_order"] = """
    -- content-addressed shard + salted-md5 within-shard order: the
    -- reproducible corpus shuffle (position depends only on ids)
    SELECT doc_id, shard,
           CAST(row_number() OVER (
               PARTITION BY shard
               ORDER BY md5('ord:' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS INTEGER) AS pos
    FROM (
        SELECT doc_id,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8
                    AS INTEGER) AS shard
        FROM documents
    )
"""


LLM_ORACLE["x39_cm_heavy_hitters"] = """
    -- count-min frequency audit: rebuild the identical 3x1024
    -- md5-bucketed sketch and read back estimates for the exact top-15
    WITH toks AS (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
            AS term
        FROM documents
    ),
    tf AS (SELECT term, count(*) AS exact_cnt FROM toks GROUP BY 1),
    tot AS (SELECT sum(exact_cnt) AS n_total FROM tf),
    rows_ AS (SELECT unnest([0, 1, 2]) AS cm_row),
    tb AS (
        SELECT cm_row, term, exact_cnt,
               ('0x' || substr(md5(cm_row::VARCHAR || ':' || term), 1, 8))::BIGINT
                   % 1024 AS bucket
        FROM tf CROSS JOIN rows_
    ),
    wts AS (
        SELECT cm_row, bucket, sum(exact_cnt) AS weight
        FROM tb GROUP BY 1, 2
    ),
    top AS (
        SELECT term, exact_cnt FROM tf
        ORDER BY exact_cnt DESC, term LIMIT 15
    ),
    est AS (
        SELECT t.term, t.exact_cnt, min(w.weight) AS cm_est
        FROM top t
        JOIN tb b ON b.term = t.term
        JOIN wts w ON w.cm_row = b.cm_row AND w.bucket = b.bucket
        GROUP BY 1, 2
    )
    SELECT e.term,
           CAST(e.exact_cnt AS BIGINT) AS exact_cnt,
           CAST(e.cm_est AS BIGINT) AS cm_est,
           CAST(e.cm_est - e.exact_cnt AS BIGINT) AS overest,
           (e.cm_est >= e.exact_cnt
            AND (e.cm_est - e.exact_cnt) * 100 <= t.n_total) AS cm_ok
    FROM est e CROSS JOIN tot t
"""


LLM_ORACLE["x38_source_overlap"] = f"""
    -- cross-source contamination matrix on the (source, shingle)
    -- DISTINCT grain; max_df=10 stop-shingle cut on the pair join
    -- (shared counts are a lower bound, set sizes exact)
    WITH {_SHINGLES_CTE},
    gsh AS (
        SELECT DISTINCT d.source AS grp, s.shingle
        FROM sh s JOIN documents d USING (doc_id)
    ),
    sizes AS (SELECT grp, count(*) AS n_sh FROM gsh GROUP BY 1),
    dfreq AS (SELECT shingle, count(*) AS df FROM gsh GROUP BY 1),
    joinable AS (
        SELECT g.grp, g.shingle
        FROM gsh g JOIN dfreq f USING (shingle) WHERE f.df <= 10
    ),
    shared AS (
        SELECT a.grp AS source_a, b.grp AS source_b, count(*) AS shared_shingles
        FROM joinable a
        JOIN joinable b ON a.shingle = b.shingle AND a.grp < b.grp
        GROUP BY 1, 2
    )
    SELECT s.source_a, s.source_b,
           CAST(s.shared_shingles AS BIGINT) AS shared_shingles,
           {_sr('s.shared_shingles / CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE)', 4)}
               AS overlap
    FROM shared s
    JOIN sizes sa ON s.source_a = sa.grp
    JOIN sizes sb ON s.source_b = sb.grp
"""


LLM_ORACLE["x37_dup_shingle_coverage"] = f"""
    -- cross-document duplicated-shingle coverage: fraction of each
    -- doc's distinct 3-grams that appear in >= 2 docs total
    WITH {_SHINGLES_CTE},
    dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1)
    SELECT s.doc_id,
           CAST(count(*) AS INTEGER) AS n_shingles,
           CAST(sum(CASE WHEN d.df > 1 THEN 1 ELSE 0 END) AS INTEGER)
               AS n_dup_shingles,
           {_sr('sum(CASE WHEN d.df > 1 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)', 4)}
               AS dup_coverage
    FROM sh s JOIN dfreq d ON s.shingle = d.shingle
    GROUP BY s.doc_id
"""


LLM_ORACLE["e6_funnel_steps"] = """
    -- the 3-join cascade form of the funnel (first view -> first click
    -- strictly after it -> first purchase strictly after that); the
    -- Spark side computes the same cascade in one shuffle via running
    -- window minimums over the per-user event sort
    WITH t1 AS (
        SELECT user_id, min(ts) AS ts_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), t2 AS (
        SELECT e.user_id, min(e.ts) AS ts_click
        FROM events e JOIN t1 ON e.user_id = t1.user_id
        WHERE e.event_type = 'click' AND e.ts > t1.ts_view
        GROUP BY e.user_id
    ), t3 AS (
        SELECT e.user_id, min(e.ts) AS ts_purchase
        FROM events e JOIN t2 ON e.user_id = t2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > t2.ts_click
        GROUP BY e.user_id
    )
    SELECT t1.user_id, t1.ts_view, t2.ts_click, t3.ts_purchase,
           CAST(1 + (t2.user_id IS NOT NULL)::int
                  + (t3.user_id IS NOT NULL)::int AS INTEGER) AS funnel_depth
    FROM t1
    LEFT JOIN t2 ON t1.user_id = t2.user_id
    LEFT JOIN t3 ON t1.user_id = t3.user_id
"""


def _hll_oracle_sql() -> str:
    """x40: rebuild the identical 256-register md5 HLL and its readback.

    The bucket/rho/est fragments come from functions/approx.py hll_sql
    — the single spelling of the SQL twin (round-11 dedup; literals
    repr round-trip to the same doubles); everything upstream of the
    single add+divide (+ ln on the linear-counting branch) is integer-
    exact, so both engines feed identical doubles into identical
    expressions.
    """
    from insect_observation_data_pipeline_spark.functions.approx import hll_sql

    frag = hll_sql("term")
    est = frag["est"]
    return f"""
    -- deterministic HLL distinct-shingle audit per source (x40)
    WITH toked AS (
        SELECT source, {_TOKS} AS tk FROM documents
    ),
    toks AS (
        SELECT source,
               unnest(list_transform(
                   generate_series(1, greatest(len(tk) - 2, 0)),
                   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS term
        FROM toked
    ),
    hb AS (
        SELECT source,
               {frag["bucket"]} AS bucket,
               {frag["rho"]} AS rho
        FROM toks
    ),
    regs AS (SELECT source, bucket, max(rho) AS max_rho FROM hb GROUP BY 1, 2),
    per AS (
        SELECT source, count(*) AS regs_used,
               sum(CAST(power(2, 53 - max_rho) AS BIGINT)) AS sum_scaled
        FROM regs GROUP BY 1
    ),
    exact AS (SELECT source, count(DISTINCT term) AS n_exact FROM toks GROUP BY 1),
    readback AS (
        SELECT p.source, e.n_exact, p.regs_used, p.sum_scaled,
               {est} AS est
        FROM per p JOIN exact e USING (source)
    )
    SELECT source,
           CAST(n_exact AS BIGINT) AS n_exact,
           CAST(regs_used AS BIGINT) AS regs_used,
           CAST(sum_scaled AS BIGINT) AS sum_scaled,
           ((floor(abs(est) * 100.0 + 0.5) / 100.0)
            * (CASE WHEN (est) < 0 THEN -1.0 ELSE 1.0 END) + 0.0) AS hll_est,
           (abs(est - n_exact) <= 0.2 * n_exact) AS hll_ok
    FROM readback
"""


LLM_ORACLE["x40_hll_distinct"] = _hll_oracle_sql()


LLM_ORACLE["x41_bloom_decontaminate"] = f"""
    -- Bloom-filter decontamination (x41): light k=3 salted md5 bits in
    -- an m=8192 slot array from the held-out shingle set, probe the
    -- training shingles, and pin the exact overlap alongside
    WITH {_SHINGLES_CTE},
    tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 50 <> 0),
    ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
    salts AS (SELECT unnest([0, 1, 2]) AS salt),
    bits AS (
        SELECT DISTINCT
               ('0x' || substr(md5(s.salt::VARCHAR || ':' || e.shingle), 1, 8))::BIGINT
                   % 8192 AS pos
        FROM ev e CROSS JOIN salts s
    ),
    probe AS (
        SELECT t.doc_id, t.shingle,
               ('0x' || substr(md5(s.salt::VARCHAR || ':' || t.shingle), 1, 8))::BIGINT
                   % 8192 AS pos
        FROM tr t CROSS JOIN salts s
    ),
    hits AS (
        SELECT p.doc_id, p.shingle
        FROM probe p JOIN bits b ON p.pos = b.pos
        GROUP BY 1, 2 HAVING count(*) = 3
    ),
    nb AS (SELECT doc_id, count(*) AS n_bloom FROM hits GROUP BY 1),
    nt AS (
        SELECT t.doc_id, count(*) AS n_true
        FROM tr t JOIN ev e ON t.shingle = e.shingle GROUP BY 1
    ),
    ns AS (SELECT doc_id, count(*) AS n_shingles FROM tr GROUP BY 1)
    SELECT nb.doc_id,
           CAST(ns.n_shingles AS BIGINT) AS n_shingles,
           CAST(nb.n_bloom AS BIGINT) AS n_bloom,
           CAST(coalesce(nt.n_true, 0) AS BIGINT) AS n_true,
           CAST(nb.n_bloom - coalesce(nt.n_true, 0) AS BIGINT) AS n_fp
    FROM nb
    LEFT JOIN nt ON nb.doc_id = nt.doc_id
    JOIN ns ON nb.doc_id = ns.doc_id
    WHERE nb.n_bloom >= 2
"""


LLM_ORACLE["x42_segment_dedup"] = f"""
    -- Segment-level exact dedup (x42): non-overlapping 8-word windows,
    -- strip every segment text occurring in >= 2 distinct documents,
    -- reassemble the survivors in original order
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS tk FROM documents
    ),
    idx AS (
        SELECT doc_id, tk,
               unnest(generate_series(
                   0, CAST(ceil(len(tk) / 8.0) AS BIGINT) - 1)) AS pos
        FROM toks
    ),
    segs AS (
        SELECT doc_id, pos,
               array_to_string(list_slice(tk, pos * 8 + 1, pos * 8 + 8), ' ')
                   AS seg
        FROM idx
    ),
    dup AS (
        SELECT seg FROM segs GROUP BY seg
        HAVING count(DISTINCT doc_id) >= 2
    ),
    marked AS (
        SELECT s.doc_id, s.pos, s.seg, d.seg IS NOT NULL AS is_dup
        FROM segs s LEFT JOIN dup d ON s.seg = d.seg
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(count(CASE WHEN is_dup THEN 1 END) AS BIGINT)
               AS n_dup_segments,
           CAST(coalesce(sum(len(string_split(seg, ' ')))
               FILTER (WHERE NOT is_dup), 0) AS BIGINT) AS kept_words,
           coalesce(string_agg(seg, ' ' ORDER BY pos)
               FILTER (WHERE NOT is_dup), '') AS kept_text
    FROM marked
    GROUP BY doc_id
    ORDER BY doc_id
"""


LLM_ORACLE["x43_bpe_vocab"] = """
    -- Pinned merge table for the distributed BPE trainer at sf0.01
    -- (the x30 VALUES precedent: a 12-deep iterative argmax has no
    -- closed SQL form). The values were produced by the SEQUENTIAL
    -- reference trainer semantics the Spark operator is pinned to in
    -- tests/test_llm.py (exact match + repartitioning invariance);
    -- determinism is integer counts + lexicographic tie-break.
    SELECT CAST(rank AS INTEGER) AS rank, pair_a, pair_b, merged,
           CAST(pair_count AS BIGINT) AS pair_count
    FROM (VALUES
        (1, 'e', 'r', 'er', 4568),
        (2, 'e', '</w>', 'e</w>', 4473),
        (3, 'n', '</w>', 'n</w>', 2834),
        (4, 'er', '</w>', 'er</w>', 2779),
        (5, 'o', 'w', 'ow', 2747),
        (6, 'ow', '</w>', 'ow</w>', 2747),
        (7, 'o', 'r', 'or', 2696),
        (8, 's', 't', 'st', 2676),
        (9, 'h', '</w>', 'h</w>', 1884),
        (10, 'a', 't', 'at', 1845),
        (11, 'l', 'u', 'lu', 1831),
        (12, 'i', 'n', 'in', 1796)
    ) AS t(rank, pair_a, pair_b, merged, pair_count)
"""


LLM_ORACLE["h5_triangle_count"] = """
    -- Triangle counts + clustering coefficient (h5) over the repeat
    -- co-purchase part graph (pair-instance support >= 2). The Spark
    -- side enumerates via degree orientation; the count is a pure
    -- integer function of the edge set, so the simple a<b<c replay
    -- here must agree exactly.
    WITH e AS (
        SELECT least(l1.l_partkey, l2.l_partkey) AS a,
               greatest(l1.l_partkey, l2.l_partkey) AS b
        FROM lineitem l1
        JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey
         AND l1.l_partkey < l2.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= 2
    ),
    deg AS (
        SELECT node, count(*) AS degree FROM (
            SELECT a AS node FROM e UNION ALL SELECT b FROM e
        ) GROUP BY 1
    ),
    tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1
        JOIN e e2 ON e1.b = e2.a
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    pn AS (
        SELECT node, count(*) AS n_triangles FROM (
            SELECT x AS node FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri
        ) GROUP BY 1
    )
    SELECT d.node,
           CAST(d.degree AS BIGINT) AS degree,
           CAST(coalesce(pn.n_triangles, 0) AS BIGINT) AS n_triangles,
           CASE WHEN d.degree >= 2 THEN
               ((floor(abs(2.0 * coalesce(pn.n_triangles, 0)
                   / (d.degree * (d.degree - 1))) * 1000000.0 + 0.5)
                 / 1000000.0)
                * (CASE WHEN (2.0 * coalesce(pn.n_triangles, 0)
                   / (d.degree * (d.degree - 1))) < 0
                   THEN -1.0 ELSE 1.0 END) + 0.0)
           ELSE 0.0 END AS clustering
    FROM deg d
    LEFT JOIN pn ON d.node = pn.node
    ORDER BY d.node
"""


def _pagerank_oracle_sql(*, damping: float = 0.85, iterations: int = 8) -> str:
    """h4: replay the fixed-iteration weighted PageRank as unrolled CTEs.

    Float literals are the repr() of the SAME Python doubles the Spark
    operator uses (teleport = 1.0 - damping computed once), so both
    engines evaluate the identical expression tree; only summation
    order differs (~1e-15), absorbed by the 6-digit stable round.
    """
    tp = repr(1.0 - damping)
    d = repr(damping)
    parts = [
        """edges AS MATERIALIZED (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
               count(*) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
    ),
    nodes AS (
        SELECT DISTINCT node FROM (
            SELECT src AS node FROM edges
            UNION ALL SELECT dst FROM edges
        )
    ),
    nn AS (SELECT count(*) AS n FROM nodes),
    outw AS (SELECT src, sum(w) AS w_out FROM edges GROUP BY 1),
    ep AS MATERIALIZED (
        SELECT e.src, e.dst, e.w / CAST(o.w_out AS DOUBLE) AS p
        FROM edges e JOIN outw o ON e.src = o.src
    ),
    r0 AS MATERIALIZED (SELECT node, 1.0 / n AS rank FROM nodes CROSS JOIN nn)"""
    ]
    for i in range(1, iterations + 1):
        parts.append(f"""d{i - 1} AS MATERIALIZED (
        SELECT coalesce(sum(r.rank), 0.0) AS dm
        FROM r{i - 1} r LEFT JOIN outw o ON r.node = o.src
        WHERE o.src IS NULL
    ),
    c{i - 1} AS MATERIALIZED (
        SELECT ep.dst, sum(r.rank * ep.p) AS c
        FROM r{i - 1} r JOIN ep ON r.node = ep.src
        GROUP BY 1
    ),
    r{i} AS MATERIALIZED (
        SELECT n.node,
               {tp} / nn.n + {d} * (coalesce(c.c, 0.0) + dd.dm / nn.n) AS rank
        FROM nodes n
        CROSS JOIN nn
        CROSS JOIN d{i - 1} dd
        LEFT JOIN c{i - 1} c ON n.node = c.dst
    )""")
    final = f"""
    SELECT na.n_name AS nation,
           ((floor(abs(r.rank) * 1000000.0 + 0.5) / 1000000.0)
            * (CASE WHEN (r.rank) < 0 THEN -1.0 ELSE 1.0 END) + 0.0)
               AS pagerank
    FROM r{iterations} r JOIN nation na ON r.node = na.n_nationkey
"""
    return "    WITH " + ",\n    ".join(parts) + final


LLM_ORACLE["h4_pagerank_trade"] = _pagerank_oracle_sql()


LLM_ORACLE["x44_bigram_lm_score"] = f"""
    -- Bigram-LM fluency (x44): add-0.5-smoothed bigram model trained
    -- on the corpus itself; score = mean -ln p(v|u) over each doc's
    -- bigrams. Context count c(u) = sum_v c(u,v) and vocabulary V =
    -- distinct tokens in bigram positions, both derived from the
    -- bigram relation (model probabilities sum to 1 per context).
    -- ln() is the one libm call (pagerank float precedent); all its
    -- inputs are exact BIGINT count ratios.
    WITH tk AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
        FROM documents
    ), bgidx AS (
        SELECT doc_id, t,
               unnest(generate_series(1, len(t) - 1)) AS i
        FROM tk WHERE len(t) >= 2
    ), bg AS (
        SELECT doc_id, t[i] AS u, t[i + 1] AS v FROM bgidx
    ), dbg AS (
        SELECT doc_id, u, v, count(*) AS m FROM bg GROUP BY 1, 2, 3
    ), cbg AS (
        SELECT u, v, sum(m) AS cuv FROM dbg GROUP BY 1, 2
    ), cu AS (
        SELECT u, sum(cuv) AS cu FROM cbg GROUP BY 1
    ), vv AS (
        SELECT count(DISTINCT tok) AS vsize
        FROM (SELECT u AS tok FROM cbg UNION SELECT v FROM cbg)
    ), p AS (
        SELECT cbg.u, cbg.v,
               (cuv + 0.5) / CAST(cu + 0.5 * vsize AS DOUBLE) AS p
        FROM cbg JOIN cu USING (u) CROSS JOIN vv
    ), sc AS (
        SELECT dbg.doc_id,
               CAST(sum(m) AS BIGINT) AS n_bigrams,
               sum(m * -ln(p)) / sum(m) AS nll
        FROM dbg JOIN p ON dbg.u = p.u AND dbg.v = p.v
        GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           {_sr("nll", 6)} AS avg_nll
    FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
"""


LLM_ORACLE["x45_bm25_topk"] = f"""
    -- BM25 top-10 per probe query (x45), Lucene-style idf. Same
    -- arithmetic shape as the Spark operator: every ln()/ratio input
    -- is an exact BIGINT count; ranking is on the ROUNDED score with
    -- doc_id tie-break (cross-engine k-boundary stability).
    WITH probes(query_id, query_text) AS (
        VALUES ('q1', 'fast hash join'),
               ('q2', 'window agg merge'),
               ('q3', 'stream batch data')
    ), tf AS (
        SELECT doc_id, unnest(list_filter(
                   string_split(lower(text), ' '), x -> x <> '')) AS term
        FROM documents
    ), tfa AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM tf GROUP BY 1, 2
    ), dl AS (
        SELECT doc_id, sum(tf) AS dl FROM tfa GROUP BY 1
    ), dft AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfa GROUP BY 1
    ), stats AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
               (SELECT sum(tf) FROM tfa) AS total_tokens
    ), qt AS (
        SELECT DISTINCT query_id, unnest(list_filter(
                   string_split(lower(query_text), ' '), x -> x <> '')) AS term
        FROM probes
    ), scored AS (
        SELECT qt.query_id, tfa.doc_id,
               {_sr(
                   "sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))"
                   " * (tf * 2.2)"
                   " / (tf + 1.2 * (0.25 + 0.75 * dl"
                   "    / (total_tokens / CAST(n_docs AS DOUBLE)))))",
                   4,
               )} AS score
        FROM tfa
        JOIN qt USING (term)
        JOIN dft USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN stats
        GROUP BY 1, 2
    ), ranked AS (
        SELECT query_id, doc_id, score,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY score DESC, doc_id ASC
               ) AS INTEGER) AS rank
        FROM scored
    )
    SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= 10
"""


LLM_ORACLE["x46_hybrid_rrf"] = f"""
    -- Hybrid RRF (x46): BM25 query-by-document (held-out docs < 5 as
    -- queries, corpus = docs >= 5) fused with exact cosine over the
    -- doc-aligned embeddings (same held-out split as x9), both at
    -- depth 50, RRF c=60, top-10. Rank parity with the Spark side:
    -- each system ranks on its ROUNDED score with id tie-break, and
    -- the fused ordering on the rounded RRF sum.
    WITH corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id >= 5
    ), probes AS (
        SELECT doc_id AS query_id, text AS query_text
        FROM documents WHERE doc_id < 5
    ), tf AS (
        SELECT doc_id, unnest(list_filter(
                   string_split(lower(text), ' '), x -> x <> '')) AS term
        FROM corpus
    ), tfa AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM tf GROUP BY 1, 2
    ), dl AS (
        SELECT doc_id, sum(tf) AS dl FROM tfa GROUP BY 1
    ), dft AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfa GROUP BY 1
    ), stats AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM corpus) AS n_docs,
               (SELECT sum(tf) FROM tfa) AS total_tokens
    ), qt AS (
        SELECT DISTINCT query_id, unnest(list_filter(
                   string_split(lower(query_text), ' '), x -> x <> '')) AS term
        FROM probes
    ), lex_scored AS (
        SELECT qt.query_id, tfa.doc_id,
               {_sr(
                   "sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))"
                   " * (tf * 2.2)"
                   " / (tf + 1.2 * (0.25 + 0.75 * dl"
                   "    / (total_tokens / CAST(n_docs AS DOUBLE)))))",
                   4,
               )} AS score
        FROM tfa
        JOIN qt USING (term)
        JOIN dft USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN stats
        GROUP BY 1, 2
    ), lex AS (
        SELECT query_id, doc_id,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY score DESC, doc_id ASC
               ) AS rank
        FROM lex_scored
        QUALIFY rank <= 50
    ), qv AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 5
    ), cv AS (
        SELECT vec_id AS doc_id, embedding::DOUBLE[] AS cv
        FROM embeddings WHERE vec_id >= 5
    ), dense_scored AS (
        SELECT query_id, doc_id,
               {_sr("list_cosine_similarity(qv, cv)", 4)} AS cosine_sim
        FROM qv, cv
    ), dense AS (
        SELECT query_id, doc_id,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine_sim DESC, doc_id ASC
               ) AS rank
        FROM dense_scored
        QUALIFY rank <= 50
    ), contribs AS (
        SELECT query_id, doc_id, 1.0 / (60.0 + rank) AS contrib FROM lex
        UNION ALL
        SELECT query_id, doc_id, 1.0 / (60.0 + rank) AS contrib FROM dense
    ), fused AS (
        SELECT query_id, doc_id,
               {_sr("sum(contrib)", 6)} AS rrf_score,
               CAST(count(*) AS INTEGER) AS n_systems
        FROM contribs GROUP BY 1, 2
    )
    SELECT query_id,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC
           ) AS INTEGER) AS rank,
           doc_id, rrf_score, n_systems
    FROM fused
    QUALIFY rank <= 10
"""


LLM_ORACLE["x47_bpe_tokenize"] = """
    -- Pinned top-20 post-encode symbol histogram at sf0.01, rounds=6
    -- (the x43/x30 precedent: greedy merge folds have no closed SQL
    -- form). Values derived round 9 from an INDEPENDENT sequential
    -- python trainer+encoder (pure-python Counter over the word-type
    -- histogram, duckdb-read corpus — no Spark involved); the encode
    -- path is additionally pinned on a hand corpus in tests/test_llm.py.
    SELECT symbol, CAST(n AS BIGINT) AS n
    FROM (VALUES
        ('</w>', 14332), ('a', 12650), ('t', 9864), ('s', 8157),
        ('l', 7356), ('r', 7163), ('o', 6406), ('c', 4653),
        ('m', 4602), ('i', 4569), ('u', 4540), ('g', 4474),
        ('e</w>', 4473), ('h', 3671), ('n</w>', 2834), ('er</w>', 2779),
        ('ow</w>', 2747), ('d', 2732), ('b', 2721), ('e', 2696)
    ) AS t(symbol, n)
"""


LLM_ORACLE["e25_session_census"] = f"""
    -- union of the e2 (per-user) and e5 (per-session) oracles verbatim,
    -- NULL-padded to the census schema — mirrors the Spark census
    -- calling both component functions verbatim
    WITH per_user AS ({LLM_ORACLE["e2_sessionization"]}),
    per_session AS ({LLM_ORACLE["e5_session_window_stats"]})
    SELECT 'per_user' AS grain, user_id,
           CAST(NULL AS TIMESTAMP) AS session_start,
           CAST(NULL AS TIMESTAMP) AS session_end,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(n_sessions AS BIGINT) AS n_sessions
    FROM per_user
    UNION ALL
    SELECT 'per_session' AS grain, user_id, session_start, session_end,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(NULL AS BIGINT) AS n_sessions
    FROM per_session
"""


LLM_ORACLE["e9_path_trigrams"] = """
    -- within-DAY event-type trigram paths (journey boundary = calendar
    -- day; see the Spark docstring for why 10-min sessions are
    -- degenerate at this density), trigram rows cut when either led
    -- row crosses the day edge, deterministic (count desc, path asc)
    -- top-20 boundary
    WITH t AS (
        SELECT user_id, event_id, event_type, ts,
               CAST(ts AS DATE) AS d
        FROM events
    ), tri AS (
        SELECT event_type || '>'
                   || lead(event_type, 1) OVER w || '>'
                   || lead(event_type, 2) OVER w AS path,
               d AS d0,
               lead(d, 1) OVER w AS d1,
               lead(d, 2) OVER w AS d2
        FROM t
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_paths
    FROM tri
    WHERE d1 = d0 AND d2 = d0
    GROUP BY path
    ORDER BY n_paths DESC, path ASC
    LIMIT 20
"""


LLM_ORACLE["x48_histogram_quantiles"] = f"""
    -- fixed-width-8 histogram quantile readback: pure integer rank
    -- arithmetic ((p*total+99)//100) and upper-bin-edge estimates, so
    -- both engines reproduce the sketch readback bit-identically
    WITH v AS (
        SELECT lang, CAST(len({_TOKS}) AS BIGINT) AS n_toks FROM documents
    ), h AS (
        SELECT lang, n_toks // 8 AS bin, count(*) AS cnt
        FROM v GROUP BY 1, 2
    ), c AS (
        SELECT lang, bin, cnt,
               sum(cnt) OVER (PARTITION BY lang ORDER BY bin
                              ROWS UNBOUNDED PRECEDING) AS cum,
               sum(cnt) OVER (PARTITION BY lang) AS total
        FROM h
    )
    SELECT lang,
           CAST(max(total) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_bins,
           CAST(min(CASE WHEN cum >= (50 * total + 99) // 100
                         THEN (bin + 1) * 8 END) AS BIGINT) AS p50_hi,
           CAST(min(CASE WHEN cum >= (90 * total + 99) // 100
                         THEN (bin + 1) * 8 END) AS BIGINT) AS p90_hi,
           CAST(min(CASE WHEN cum >= (99 * total + 99) // 100
                         THEN (bin + 1) * 8 END) AS BIGINT) AS p99_hi
    FROM c
    GROUP BY lang
"""


LLM_ORACLE["x49_unicode_census"] = """
    -- NFC via DuckDB's own UAX#15 implementation (nfc_normalize) — an
    -- INDEPENDENT normalizer from the Spark side's stdlib unicodedata
    -- check; bytes-vs-chars via strlen/length (exact non-ASCII test,
    -- no regex). NULL texts count in n_docs, in no change flag.
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COALESCE(SUM(CASE WHEN nfc_normalize(text) <> text
                                  THEN 1 END), 0) AS BIGINT) AS n_nfc_changed,
           CAST(COALESCE(SUM(CASE WHEN lower(text) <> text
                                  THEN 1 END), 0) AS BIGINT) AS n_casefold_changed,
           CAST(COALESCE(SUM(CASE WHEN strlen(text) <> length(text)
                                  THEN 1 END), 0) AS BIGINT) AS n_nonascii,
           CAST(COALESCE(SUM(length(text)), 0) AS BIGINT) AS sum_chars,
           CAST(COALESCE(SUM(strlen(text)), 0) AS BIGINT) AS sum_bytes
    FROM documents
    GROUP BY lang
    ORDER BY lang
"""


LLM_ORACLE["x50_langid_confusion"] = """
    -- corpus-grain rollup of the x3 oracle's pred_lang column verbatim
    -- (the e25 composition precedent): the confusion matrix of the
    -- marker-word language-ID heuristic against the labeled lang.
    SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM ({x3})
    GROUP BY lang, pred_lang
    ORDER BY lang, pred_lang
""".format(x3=LLM_ORACLE["x3_text_quality"])


LLM_ORACLE["x51_mixture_plan"] = f"""
    -- integer isqrt weights (floor(sqrt) + borderline correction),
    -- integer DIV shares over exact sums; the single float column
    -- (epochs) is one division of identical exact integers rounded
    -- with the shared stable-round formula.
    WITH per AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tokens
        FROM documents
        GROUP BY source
    ), w AS (
        SELECT *,
               CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)
               - CASE WHEN CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)
                           * CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)
                           > n_tokens THEN 1 ELSE 0 END AS weight
        FROM per
    ), t AS (
        SELECT CAST(SUM(weight) AS BIGINT) AS wsum FROM w
    )
    SELECT source, n_docs, n_tokens, weight,
           CAST((1000000 * weight) // wsum AS BIGINT) AS share_ppm,
           CAST((1000000 * weight) // wsum AS BIGINT) AS planned_tokens,
           ((floor(abs(((1000000 * weight) // wsum) / CAST(n_tokens AS DOUBLE)) * 10000.0 + 0.5) / 10000.0)
            * (CASE WHEN (((1000000 * weight) // wsum) / CAST(n_tokens AS DOUBLE)) < 0 THEN -1.0 ELSE 1.0 END)
            + 0.0) AS epochs
    FROM w, t
    ORDER BY source
"""


LLM_ORACLE["x52_repeated_spans"] = f"""
    -- cross-document exact repeated spans (x52): overlapping 8-token
    -- anchors, cross-doc df >= 2 flags an anchor, per-doc interval
    -- merge of the anchor coverage [pos, pos+7] yields maximal
    -- repeated regions kept at >= 16 tokens. Joins on the raw anchor
    -- TEXT (the Spark side groups the 128-bit md5 of the same text;
    -- identical up to md5 collisions, ~2^-60 at this scale)
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS tk FROM documents
    ),
    anch0 AS (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, greatest(len(tk) - 7, 0)),
                   i -> {{'pos': i - 1,
                         'anchor': array_to_string(tk[i : i + 7], ' ')}})) AS u
        FROM toks
    ),
    anchors AS (
        SELECT doc_id, u.pos AS pos, u.anchor AS anchor FROM anch0
    ),
    flagged AS (
        SELECT anchor FROM anchors GROUP BY anchor
        HAVING count(DISTINCT doc_id) >= 2
    ),
    hits AS (
        SELECT a.doc_id, a.pos, a.pos + 7 AS e
        FROM anchors a WHERE a.anchor IN (SELECT anchor FROM flagged)
    ),
    m AS (
        SELECT doc_id, pos, e,
               max(e) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS prev_e
        FROM hits
    ),
    isl AS (
        SELECT doc_id, pos, e,
               sum(CASE WHEN prev_e IS NULL OR pos > prev_e + 1
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM m
    ),
    spans AS (
        SELECT doc_id, min(pos) AS s, max(e) AS e2
        FROM isl GROUP BY doc_id, island
    )
    SELECT doc_id,
           CAST(s AS INTEGER) AS span_start,
           CAST(e2 AS INTEGER) AS span_end,
           CAST(e2 - s + 1 AS INTEGER) AS span_words
    FROM spans WHERE e2 - s + 1 >= 16
"""


# e26 composes e6's funnel cascade and the core e7 cohort matrix
# VERBATIM (the e25 census precedent) under a grain discriminator.
from insect_observation_data_pipeline_spark.queries.oracle import (  # noqa: E402
    ORACLE as _CORE_ORACLE,
)

LLM_ORACLE["e26_event_census"] = f"""
    WITH funnel AS ({LLM_ORACLE['e6_funnel_steps']}),
    cohort AS ({_CORE_ORACLE['e7_cohort_retention']})
    SELECT 'funnel' AS grain,
           CAST(user_id AS BIGINT) AS user_id,
           ts_view, ts_click, ts_purchase, funnel_depth,
           CAST(NULL AS DATE) AS cohort_week,
           CAST(NULL AS INTEGER) AS week_n,
           CAST(NULL AS BIGINT) AS n_users
    FROM funnel
    UNION ALL
    SELECT 'cohort',
           CAST(NULL AS BIGINT),
           NULL, NULL, NULL,
           CAST(NULL AS INTEGER),
           cohort_week, week_n, n_users
    FROM cohort
"""


# x53 composes x22's repetition signals and x25's fluency score
# VERBATIM (the e25/e26 census precedent) under a signal discriminator.
LLM_ORACLE["x53_doc_signal_census"] = f"""
    WITH rep AS ({LLM_ORACLE['x22_repetition_signals']}),
    prob AS ({LLM_ORACLE['x25_token_prob_score']})
    SELECT 'repetition' AS signal, doc_id, n_tokens,
           n_distinct, top_token_n, distinct_frac, top_frac,
           CAST(NULL AS DOUBLE) AS mean_tok_ppm
    FROM rep
    UNION ALL
    SELECT 'fluency', doc_id, n_tokens,
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           mean_tok_ppm
    FROM prob
"""
