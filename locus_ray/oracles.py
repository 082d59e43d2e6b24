"""Generated DuckDB oracle SQL for the queries whose round-1 gate was
rows-only (VERDICT.md "Next round" #1).

Every builder here returns a self-contained ANSI-SQL string over the
driver's pre-registered parquet views (plus DuckDB's ``range`` /
``generate_series`` for the synthetic-corpus queries).  Constants that
both sides share (polygon vertices, hyperplanes, hash parameters) are
embedded as exact float64 / int64 literals via :func:`derive.F` so the
SQL recomputes the result independently of the Ray engine's numpy path
— same discipline as :mod:`locus_ray.derive`.

Integer-hash parity: the engine's token hash is byte-level FNV-1a
(:func:`locus_ray.stages.text.hash_token`); the SQL mirrors it with a
``list_reduce`` over character code points, which is identical for
ASCII corpora (the testdata generator emits pure-ASCII text; verified
in tools/check_correctness runs).  All mod-2^64 arithmetic runs in
HUGEINT with an explicit ``% 2^64``.
"""

from __future__ import annotations

import numpy as np

from . import derive
from .config import DEFAULT_CELL_RES, SQUARE_SIZE

RES = DEFAULT_CELL_RES
_SHIFT_DIV = 1 << (16 - RES)
_AXIS = 1 << RES

_FNV_SEED = 1469598103934665603
_FNV_PRIME = 1099511628211
_M64 = 1 << 64


def _sql_grid_expr(x: str, y: str) -> tuple[str, str]:
    """16-bit grid coords of float exprs (mirrors cells.grid_coords)."""
    F = derive.F
    ix = (f"LEAST(GREATEST(CAST(FLOOR((({x} - ({F(-180.0)})) / 360.0e0) * "
          f"{F(SQUARE_SIZE)}) AS BIGINT), 0), 65535)")
    iy = (f"LEAST(GREATEST(CAST(FLOOR((({y} - ({F(-90.0)})) / 180.0e0) * "
          f"{F(SQUARE_SIZE)}) AS BIGINT), 0), 65535)")
    return ix, iy


def fnv_sql(expr: str) -> str:
    """Byte-level FNV-1a of a VARCHAR expression (ASCII assumption:
    code point == byte).  Returns a HUGEINT in [0, 2^64)."""
    return (
        f"list_reduce(list_prepend(CAST({_FNV_SEED} AS HUGEINT), "
        f"list_transform(range(1, length({expr}) + 1), "
        f"i -> CAST(ord(substr({expr}, CAST(i AS INT), 1)) AS HUGEINT))), "
        f"(acc, c) -> (xor(acc, c) * {_FNV_PRIME}) % {_M64})"
    )


def u64_to_i64(expr: str) -> str:
    """HUGEINT in [0, 2^64) -> signed int64 (two's complement view,
    matching numpy's ``uint64.astype(int64)``)."""
    return (f"CAST(CASE WHEN ({expr}) >= {1 << 63} THEN ({expr}) - {_M64} "
            f"ELSE ({expr}) END AS BIGINT)")


_u64_to_i64 = u64_to_i64  # internal alias (pre-public-API name)


# ---------------------------------------------------------------------------
# hilbert_rank — classic xy2d as a recursive CTE (independent of the
# engine's branchless formulation in locus_ray/hilbert.py)
# ---------------------------------------------------------------------------

def hilbert_rank_sql(grid_cte: str) -> str:
    """``grid_cte`` must yield (doc_id, ix, iy)."""
    return f"""
    WITH RECURSIVE g AS ({grid_cte}),
    h(doc_id, x, y, rnk, step) AS (
      SELECT doc_id, ix, iy, CAST(0 AS BIGINT), CAST(32768 AS BIGINT) FROM g
      UNION ALL
      SELECT doc_id,
        CASE WHEN (y & step) = 0
             THEN CASE WHEN (x & step) > 0 THEN 65535 - y ELSE y END
             ELSE x END,
        CASE WHEN (y & step) = 0
             THEN CASE WHEN (x & step) > 0 THEN 65535 - x ELSE x END
             ELSE y END,
        rnk + step * step *
          CASE WHEN (x & step) > 0
               THEN CASE WHEN (y & step) > 0 THEN 2 ELSE 3 END
               ELSE CASE WHEN (y & step) > 0 THEN 1 ELSE 0 END END,
        step // 2
      FROM h WHERE step > 0
    )
    SELECT doc_id, rnk AS hilbert_key FROM h WHERE step = 0
    """


# ---------------------------------------------------------------------------
# pip_docs — per-polygon crossing-number CASE chains (ROADMAP #9)
# ---------------------------------------------------------------------------

def pip_docs_sql(docs_cte: str, polygons: list[dict]) -> str:
    """Crossing-number containment per polygon, closed boundary —
    mirrors kernels.points_in_polygon op-for-op (same float sequence:
    x_int = x1 + (py - y1) / (y2 - y1) * (x2 - x1))."""
    F = derive.F
    selects = []
    for p in polygons:
        rx, ry = p["ring_x"], p["ring_y"]
        n = len(rx)
        cross_terms = []
        edge_terms = []
        for i in range(n):
            x1, y1 = F(rx[i]), F(ry[i])
            x2, y2 = F(rx[(i + 1) % n]), F(ry[(i + 1) % n])
            cond = f"(({y1} > d.y) <> ({y2} > d.y))"
            x_int = f"({x1} + (d.y - {y1}) / ({y2} - {y1}) * ({x2} - {x1}))"
            cross_terms.append(
                f"CASE WHEN {cond} AND d.x < {x_int} THEN 1 ELSE 0 END"
            )
            cr = f"(({x2} - {x1}) * (d.y - {y1}) - ({y2} - {y1}) * (d.x - {x1}))"
            edge_terms.append(
                f"({cr} = 0.0e0 AND LEAST({x1}, {x2}) <= d.x AND d.x <= GREATEST({x1}, {x2})"
                f" AND LEAST({y1}, {y2}) <= d.y AND d.y <= GREATEST({y1}, {y2}))"
            )
        inside = f"(({' + '.join(cross_terms)}) % 2 = 1)"
        on_edge = " OR ".join(edge_terms)
        selects.append(
            f"SELECT d.doc_id, CAST({p['polygon_id']} AS BIGINT) AS polygon_id "
            f"FROM d WHERE ({inside} OR ({on_edge})) "
            f"AND {p['polygon_id']} IN (SELECT n_nationkey FROM nation)"
        )
    body = "\nUNION ALL\n".join(selects)
    return f"WITH d AS ({docs_cte})\n{body}"


# ---------------------------------------------------------------------------
# lang_id — stopword-profile vote (mirrors text.LangIdActor)
# ---------------------------------------------------------------------------

def _lang_fragments(profiles: dict[str, set[str]]) -> tuple[str, str]:
    """(count column exprs over a ``toks`` list column, lang CASE)."""
    langs = sorted(k for k, v in profiles.items() if v)
    counts = []
    for lang in langs:
        words = ", ".join(f"'{w}'" for w in sorted(profiles[lang]))
        counts.append(
            f"length(list_filter(toks, t -> t IN ({words}))) AS n_{lang}"
        )
    g = "GREATEST(" + ", ".join(f"n_{lang}" for lang in langs) + ")"
    case = "CASE WHEN " + g + " = 0 THEN 'unknown' "
    # first language (alphabetical) reaching the max wins — identical to
    # the engine's `n > best_n` scan over sorted profiles
    for lang in langs:
        case += f"WHEN n_{lang} = {g} THEN '{lang}' "
    case += "END"
    return ", ".join(counts), case


def lang_id_sql(profiles: dict[str, set[str]]) -> str:
    counts, case = _lang_fragments(profiles)
    return f"""
    WITH t AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
      FROM documents
    ),
    c AS (SELECT doc_id, {counts} FROM t)
    SELECT doc_id, {case} AS lang_pred FROM c
    """


def corpus_clean_sql(profiles: dict[str, set[str]]) -> str:
    """Mirrors the composite cleaning pipeline: exact-dedup survivors
    (MIN doc_id per FNV content hash — the engine's vectorized
    ``dedup.content_hash``; ASCII corpus assumption as everywhere)
    with n_tokens >= 5, distinct-token ratio >= 0.3 and stopword-vote
    language 'en'."""
    counts, case = _lang_fragments(profiles)
    return f"""
    WITH hd AS (SELECT doc_id, text, {fnv_sql('text')} AS ch
                FROM documents),
    k AS (SELECT ch, MIN(doc_id) AS keep_id FROM hd GROUP BY 1),
    j AS (SELECT hd.doc_id, hd.text FROM hd
          JOIN k ON hd.ch = k.ch AND hd.doc_id = k.keep_id),
    t AS (SELECT doc_id,
                 CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                 CAST(length(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
                 regexp_extract_all(lower(text), '[a-z]+') AS toks
          FROM j),
    c AS (SELECT doc_id, n_tokens, n_distinct, {counts} FROM t),
    v AS (SELECT doc_id, n_tokens, n_distinct, {case} AS lang_pred FROM c)
    SELECT doc_id, n_tokens, lang_pred FROM v
    WHERE n_tokens >= 5
      AND CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) >= {derive.F(0.3)}
      AND lang_pred = 'en'
    """


# ---------------------------------------------------------------------------
# flagship_spans — synthetic corpus kNN join, fully derived in SQL
# ---------------------------------------------------------------------------

def _doc_id_sql(expr: str) -> str:
    """``'doc-' || <padded id>`` mirroring synth._pad10: zero-pad to 10
    digits WITHOUT truncating longer ids (plain lpad(_, 10, _) chops an
    11+-digit id to 10 chars, colliding doc_id strings at 1e10+ docs)."""
    v = f"CAST({expr} AS VARCHAR)"
    return (f"'doc-' || CASE WHEN length({v}) >= 10 THEN {v} "
            f"ELSE lpad({v}, 10, '0') END")


def flagship_spans_sql(n_docs: int, k: int) -> str:
    F = derive.F
    m = F(1000003)
    # doc_xy on raw integer ids (derive.doc_xy, id domain 0..n-1;
    # mod-first multiply — see derive.doc_xy)
    x = (f"CASE WHEN id % 5 = 0 "
         f"THEN {F(derive.HOT_X)} + (((((id % 1000003) * 2654435761) % 1000003) / {m}) * 4.0e0 - 2.0e0) "
         f"ELSE ((((id % 1000003) * 2654435761) % 1000003) / {m}) * 360.0e0 - 180.0e0 END")
    y = (f"CASE WHEN id % 5 = 0 "
         f"THEN {F(derive.HOT_Y)} + (((((id % 1000003) * 40503 + 12345) % 1000003) / {m}) * 2.0e0 - 1.0e0) "
         f"ELSE ((((id % 1000003) * 40503 + 12345) % 1000003) / {m}) * 180.0e0 - 90.0e0 END")
    ix, iy = _sql_grid_expr("x", "y")
    box_d2 = (
        "GREATEST(z.min_x - d.x, d.x - z.max_x, 0.0) * GREATEST(z.min_x - d.x, d.x - z.max_x, 0.0)"
        " + GREATEST(z.min_y - d.y, d.y - z.max_y, 0.0) * GREATEST(z.min_y - d.y, d.y - z.max_y, 0.0)"
    )
    return f"""
    WITH ids AS (SELECT unnest(generate_series(0, {n_docs - 1})) AS id),
    pts AS (SELECT id, {x} AS x, {y} AS y FROM ids),
    d AS (SELECT id, x, y,
          ({ix} // {_SHIFT_DIV}) * {_AXIS} + ({iy} // {_SHIFT_DIV}) AS cell_id
          FROM pts),
    z AS ({derive.sql_zones()}),
    scored AS (SELECT d.id, d.cell_id, z.zone_id, {box_d2} AS d2
               FROM d CROSS JOIN z),
    ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, zone_id) AS rnk
               FROM scored)
    SELECT {_doc_id_sql('id')} AS doc_id,
           cell_id, zone_id, rnk, d2, d2 = 0.0e0 AS in_zone
    FROM ranked WHERE rnk <= {k}
    """


def _span_cte(n_docs: int) -> str:
    """Re-derive the synthetic interleaved span stream in SQL
    (sources/synth.spans_for bit-for-bit): one row per (doc id, span
    local index) with the span's kind code and text length."""
    vocab = ("the quick spatial index tile shard merge stream corpus span "
             "media query nearest join cell hilbert range batch arrow "
             "vector").split()
    voc = "[" + ", ".join(f"'{w}'" for w in vocab) + "]"
    nv = len(vocab)
    return f"""
    ids AS (SELECT unnest(generate_series(0, {n_docs - 1})) AS id),
    s AS (SELECT id,
                 unnest(generate_series(0, CAST(((id % 8) * 2654435761) % 8 AS INT))) AS local
          FROM ids),
    sp AS (SELECT id, local, (id * 7 + local * 3) % 4 AS kc,
                  CASE WHEN (id * 7 + local * 3) % 4 = 0 THEN
                    {voc}[CAST((id * 13 + local * 5) % {nv} AS INT) + 1]
                    || ' ' ||
                    {voc}[CAST((id * 17 + local * 11) % {nv} AS INT) + 1]
                  ELSE '' END AS text
           FROM s)
    """


def span_stats_sql(n_docs: int) -> str:
    """Per-doc interleaved-structure stats (mirrors entry._q_span_stats)."""
    return f"""
    WITH {_span_cte(n_docs)}
    SELECT id AS doc_key,
           COUNT(*) AS n_spans,
           CAST(SUM(CASE WHEN kc = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_text,
           CAST(SUM(length(text)) AS BIGINT) AS text_chars
    FROM sp GROUP BY id
    """


def span_texts_sql(n_docs: int) -> str:
    """Flat text-span stream with in-doc positions (entry._q_span_texts)."""
    return f"""
    WITH {_span_cte(n_docs)}
    SELECT id AS doc_key, local AS span_pos, text
    FROM sp WHERE kc = 0
    """


def span_dedup_sql(n_docs: int) -> str:
    """Exact text-span dedup with smallest-(doc, pos) owner (mirrors
    entry._q_span_dedup: owner key = doc_key * 2^20 + span_pos)."""
    return f"""
    WITH {_span_cte(n_docs)}
    SELECT text,
           CAST(o // 1048576 AS BIGINT) AS owner_doc,
           CAST(o % 1048576 AS BIGINT) AS owner_pos,
           n_copies
    FROM (SELECT text, MIN(id * 1048576 + local) AS o,
                 CAST(COUNT(*) AS BIGINT) AS n_copies
          FROM sp WHERE kc = 0 GROUP BY text)
    """


# ---------------------------------------------------------------------------
# tile_index_stats — packed-R-tree structural metrics from group size
# ---------------------------------------------------------------------------

def tile_index_stats_sql(res: int = 4, max_children: int = 16) -> str:
    """Height of a bottom-up packed tree over n leaves equals the number
    of ceil(n/mc) applications until one node remains (min 1), plus the
    leaf level — mirrors PackedRTree's pack loop (index/rtree.py:111-140)."""
    shift_div = 1 << (16 - res)
    axis = 1 << res
    ix, iy = _sql_grid_expr("(z.min_x + z.max_x) / 2.0e0", "(z.min_y + z.max_y) / 2.0e0")
    return f"""
    WITH RECURSIVE z AS ({derive.sql_zones()}),
    t AS (SELECT ({ix} // {shift_div}) * {axis} + ({iy} // {shift_div}) AS tile FROM z),
    c AS (SELECT tile, COUNT(*) AS n_zones FROM t GROUP BY tile),
    h(tile, m, lv) AS (
      SELECT tile, n_zones, CAST(1 AS BIGINT) FROM c
      UNION ALL
      SELECT tile, CAST(CEIL(m / {max_children}.0) AS BIGINT), lv + 1
      FROM h WHERE m > 1 OR lv = 1
    )
    SELECT c.tile, c.n_zones, mx.height, TRUE AS valid
    FROM c JOIN (SELECT tile, MAX(lv) AS height FROM h GROUP BY tile) mx
      ON c.tile = mx.tile
    """


# ---------------------------------------------------------------------------
# simhash / fingerprint / minhash — token-sketch oracles
# ---------------------------------------------------------------------------

def _powers_of_two_lists() -> tuple[str, str]:
    bits = ", ".join(str(b) for b in range(64))
    pows = ", ".join(f"CAST({1 << b} AS HUGEINT)" for b in range(64))
    return bits, pows


def simhash_sql() -> str:
    bits, pows = _powers_of_two_lists()
    return f"""
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    th AS (SELECT doc_id, {fnv_sql('tok')} AS h FROM t),
    bits AS (SELECT unnest([{bits}]) AS b, unnest([{pows}]) AS p2),
    v AS (SELECT doc_id, b, p2,
          SUM(CASE WHEN (h // p2) % 2 = 1 THEN 1 ELSE -1 END) AS vote
          FROM th CROSS JOIN bits GROUP BY doc_id, b, p2),
    s AS (SELECT doc_id,
          SUM(CASE WHEN vote > 0 THEN p2 ELSE CAST(0 AS HUGEINT) END) AS u
          FROM v GROUP BY doc_id)
    SELECT doc_id, {_u64_to_i64('u')} AS simhash FROM s
    """


def fingerprint_sql(window: int = 8) -> str:
    fold = f"(a, b) -> (a * {_FNV_PRIME} + b) % {_M64}"
    return f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    t AS (SELECT doc_id, length(l) AS n, unnest(l) AS tok,
          unnest(range(1, length(l) + 1)) AS pos FROM d),
    th AS (SELECT doc_id, n, pos, {fnv_sql('tok')} AS h FROM t),
    w AS (SELECT doc_id, n, pos,
          SUM(h) OVER win % {_M64} AS gram,
          COUNT(*) OVER win AS cnt
          FROM th WHERE n >= {window}
          WINDOW win AS (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING)),
    bigf AS (SELECT doc_id, MIN(gram) AS g FROM w WHERE cnt = {window}
             GROUP BY doc_id),
    smallf AS (SELECT doc_id,
               list_reduce(list_prepend(CAST({_FNV_SEED} AS HUGEINT),
                                        list(h ORDER BY pos)), {fold}) AS g
               FROM th WHERE n < {window} GROUP BY doc_id),
    u AS (SELECT doc_id, g FROM bigf UNION ALL SELECT doc_id, g FROM smallf)
    SELECT doc_id, {_u64_to_i64('g')} AS fingerprint FROM u
    """


def simhash_dup_pairs_sql(max_hamming: int = 3) -> str:
    """Mirrors dedup.simhash_dup_pairs: 4 x 16-bit block buckets over
    the simhash (recomputed via simhash_sql's pipeline), MIN-doc star
    linking, distinct pairs, exact xor-popcount Hamming verify."""
    bits, pows = _powers_of_two_lists()
    base = f"""
    t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    th AS (SELECT doc_id, {fnv_sql('tok')} AS h FROM t),
    bits AS (SELECT unnest([{bits}]) AS b, unnest([{pows}]) AS p2),
    v AS (SELECT doc_id, b, p2,
          SUM(CASE WHEN (h // p2) % 2 = 1 THEN 1 ELSE -1 END) AS vote
          FROM th CROSS JOIN bits GROUP BY doc_id, b, p2),
    s AS (SELECT doc_id,
          SUM(CASE WHEN vote > 0 THEN p2 ELSE CAST(0 AS HUGEINT) END) AS u
          FROM v GROUP BY doc_id),
    sig AS (SELECT doc_id, u, {_u64_to_i64('u')} AS sh FROM s),
    e AS (SELECT doc_id, sh,
                 unnest([0, 1, 2, 3]) AS block_id,
                 CAST((u // unnest([CAST(1 AS HUGEINT), CAST({1 << 16} AS HUGEINT),
                                    CAST({1 << 32} AS HUGEINT), CAST({1 << 48} AS HUGEINT)]))
                      % 65536 AS BIGINT) AS block_val
          FROM sig)"""
    return f"""
    WITH {base},
    reps AS (SELECT block_id, block_val, MIN(doc_id) AS doc_a
             FROM e GROUP BY block_id, block_val),
    pairs AS (SELECT DISTINCT r.doc_a, m.doc_id AS doc_b
              FROM e m JOIN reps r
                ON m.block_id = r.block_id AND m.block_val = r.block_val
              WHERE m.doc_id > r.doc_a),
    h AS (SELECT p.doc_a, p.doc_b,
          CAST(bit_count(xor(sa.sh, sb.sh)) AS BIGINT) AS hamming
          FROM pairs p
          JOIN sig sa ON sa.doc_id = p.doc_a
          JOIN sig sb ON sb.doc_id = p.doc_b)
    SELECT doc_a, doc_b, hamming FROM h WHERE hamming <= {max_hamming}
    """


def _minhash_ctes(a: np.ndarray, b: np.ndarray, num_perm: int,
                  bands: int, shingle_k: int) -> str:
    """Shared CTE chain of the LSH star-linking pipeline: token FNV ->
    k-shingle fold (``shing``) -> permutation mins -> band hashes ->
    bucket representative (MIN doc_id) -> distinct (rep, member)
    ``pairs`` -> exact signature-equality fraction ``est``.  Mirrors
    stages/dedup.minhash_lsh_pairs including every mod-2^64 wrap;
    consumed by minhash_pairs_sql and ngram_jaccard_sql."""
    assert shingle_k == 3, "SQL shingle chain generated for k=3"
    P, M = _FNV_PRIME, _M64
    m61 = (1 << 61) - 1
    rows_per_band = num_perm // bands
    js = ", ".join(str(j) for j in range(num_perm))
    avals = ", ".join(str(int(x)) for x in a[:num_perm])
    bvals = ", ".join(str(int(x)) for x in b[:num_perm])
    fold = f"(x, y) -> (x * {P} + y) % {M}"
    sh_expr = (f"((((((h * {P}) % {M}) + h1) % {M}) * {P} % {M}) + h2) % {M}")
    return f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    t AS (SELECT doc_id, length(l) AS n, unnest(l) AS tok,
          unnest(range(1, length(l) + 1)) AS pos FROM d),
    th AS (SELECT doc_id, n, pos, {fnv_sql('tok')} AS h FROM t),
    sb AS (SELECT doc_id, {sh_expr} AS sh
           FROM (SELECT doc_id, pos, h,
                 LEAD(h, 1) OVER win AS h1, LEAD(h, 2) OVER win AS h2
                 FROM th WHERE n >= {shingle_k}
                 WINDOW win AS (PARTITION BY doc_id ORDER BY pos))
           WHERE h2 IS NOT NULL),
    ss AS (SELECT doc_id,
           list_reduce(list_prepend(CAST({_FNV_SEED} AS HUGEINT),
                                    list(h ORDER BY pos)), {fold}) AS sh
           FROM th WHERE n < {shingle_k} GROUP BY doc_id),
    shing AS (SELECT doc_id, sh FROM sb UNION ALL SELECT doc_id, sh FROM ss),
    perms AS (SELECT unnest([{js}]) AS j,
                     unnest([{avals}]) AS pa, unnest([{bvals}]) AS pb),
    mins AS (SELECT doc_id, j,
             MIN((((sh * pa) % {M} + pb) % {M}) % {m61}) AS mv
             FROM shing CROSS JOIN perms GROUP BY doc_id, j),
    bandh AS (SELECT doc_id, j // {rows_per_band} AS band_id,
              list_reduce(list_prepend(CAST(0 AS HUGEINT),
                                       list(mv ORDER BY j)), {fold}) AS bh
              FROM mins GROUP BY doc_id, j // {rows_per_band}),
    reps AS (SELECT band_id, bh, MIN(doc_id) AS doc_a
             FROM bandh GROUP BY band_id, bh),
    pairs AS (SELECT DISTINCT r.doc_a, m.doc_id AS doc_b
              FROM bandh m JOIN reps r
                ON m.band_id = r.band_id AND m.bh = r.bh
              WHERE m.doc_id > r.doc_a),
    sigs AS (SELECT doc_id, list(mv ORDER BY j) AS s FROM mins GROUP BY doc_id),
    est AS (SELECT p.doc_a, p.doc_b,
            length(list_filter(range(1, {num_perm + 1}),
                   i -> sa.s[CAST(i AS INT)] = sb.s[CAST(i AS INT)]))
              / {float(num_perm)}e0 AS est_jaccard
            FROM pairs p
            JOIN sigs sa ON sa.doc_id = p.doc_a
            JOIN sigs sb ON sb.doc_id = p.doc_b)
    """


def minhash_pairs_sql(a: np.ndarray, b: np.ndarray, num_perm: int = 64,
                      bands: int = 16, shingle_k: int = 3,
                      threshold: float = 0.5) -> str:
    """LSH near-dup pairs: the shared CTE chain filtered at the
    signature-estimate threshold (stages/dedup.minhash_lsh_pairs)."""
    return f"""
    {_minhash_ctes(a, b, num_perm, bands, shingle_k)}
    SELECT doc_a, doc_b, est_jaccard FROM est
    WHERE est_jaccard >= {derive.F(threshold)}
    """


def ngram_jaccard_sql(a: np.ndarray, b: np.ndarray, num_perm: int = 64,
                      bands: int = 16, shingle_k: int = 3,
                      threshold: float = 0.5) -> str:
    """Exact n-gram Jaccard over the LSH candidate pairs — the SQL twin
    of stages/dedup.ngram_jaccard_pairs fed by minhash_lsh_pairs.

    Set semantics on the SAME fold-hashed shingles the minhash chain
    derives (``shing``; HUGEINT in [0, 2^64) vs the engine's int64
    view — a bijection, so DISTINCT/equality agree).  The division is
    one IEEE op on integer-exact operands, matching numpy's
    ``inter / np.maximum(1, na + nb - inter)`` bit for bit."""
    return f"""
    {_minhash_ctes(a, b, num_perm, bands, shingle_k)},
    cand AS (SELECT doc_a, doc_b FROM est
             WHERE est_jaccard >= {derive.F(threshold)}),
    uniq AS (SELECT DISTINCT doc_id, sh FROM shing),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM uniq GROUP BY doc_id),
    ix AS (SELECT c.doc_a, c.doc_b, COUNT(ub.sh) AS i
           FROM cand c
           LEFT JOIN uniq ua ON ua.doc_id = c.doc_a
           LEFT JOIN uniq ub ON ub.doc_id = c.doc_b AND ub.sh = ua.sh
           GROUP BY c.doc_a, c.doc_b)
    SELECT x.doc_a, x.doc_b,
           CAST(x.i AS DOUBLE)
             / CAST(greatest(1, sa.n + sb.n - x.i) AS DOUBLE) AS jaccard
    FROM ix x
    JOIN sz sa ON sa.doc_id = x.doc_a
    JOIN sz sb ON sb.doc_id = x.doc_b
    """


# ---------------------------------------------------------------------------
# embed_dup_pairs — exact all-pairs cosine threshold
# ---------------------------------------------------------------------------

def embed_dup_pairs_sql(threshold: float) -> str:
    return f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= {derive.F(threshold)}
    """


def embed_dup_components_sql(threshold: float) -> str:
    """Connected components over the exact near-dup pairs: recursive
    label reachability, component = MIN reachable id (mirrors
    dedup.connected_components' min-label fixed point)."""
    return f"""
    WITH RECURSIVE p AS (
      SELECT a.vec_id AS va, b.vec_id AS vb
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.embedding, b.embedding) >= {derive.F(threshold)}
    ),
    e AS (SELECT va AS a, vb AS b FROM p UNION ALL SELECT vb, va FROM p),
    cc(node, lab) AS (
      SELECT DISTINCT a, a FROM e
      UNION
      SELECT e.b, cc.lab FROM cc JOIN e ON e.a = cc.node
    )
    SELECT node AS vec_id, MIN(lab) AS component FROM cc GROUP BY node
    """


def ann_ivf_sql(query_ids: list[int], k: int, dim: int = 64,
                n_list: int = 16, n_probe: int = 2, iters: int = 3) -> str:
    """Replicates ann.ivf_topk bit-for-bit: integer quantization
    (floor(e*2^20 + 0.5) + 2^21), init centroids = the n_list smallest
    vec_ids' vectors, ``iters`` Lloyd rounds in exact int arithmetic
    (truncating integer mean, which equals numpy's floor-div on these
    all-positive values), n_probe list probe, cosine top-k over
    members."""
    scale = 1 << 20
    off = 1 << 21

    def d2(e: str, c: str) -> str:
        return (f"list_reduce(list_transform(range(1, {dim + 1}), "
                f"i -> ({e}[CAST(i AS INT)] - {c}[CAST(i AS INT)])"
                f" * ({e}[CAST(i AS INT)] - {c}[CAST(i AS INT)])), "
                f"(x, y) -> x + y)")

    quant = (f"list_transform(embedding, v -> "
             f"CAST(floor(CAST(v AS DOUBLE) * {float(scale)}e0 + 0.5e0) AS BIGINT)"
             f" + {off})")
    parts = [f"""
    eint AS (SELECT vec_id, {quant} AS ei FROM embeddings),
    dims AS (SELECT CAST(unnest(range(1, {dim + 1})) AS INT) AS i),
    c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, ei AS cv
           FROM eint ORDER BY vec_id LIMIT {n_list})"""]
    prev = "c0"
    for t in range(1, iters + 1):
        parts.append(f"""
    a{t} AS (SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {d2('e.ei', 'c.cv')}, c.cid) AS rn
        FROM eint e CROSS JOIN {prev} c) WHERE rn = 1),
    s{t} AS (SELECT a.cid, dims.i,
                    CAST(SUM(e.ei[dims.i]) // COUNT(*) AS BIGINT) AS sv
             FROM a{t} a JOIN eint e USING (vec_id) CROSS JOIN dims
             GROUP BY a.cid, dims.i),
    m{t} AS (SELECT cid, list(sv ORDER BY i) AS cv FROM s{t} GROUP BY cid),
    c{t} AS (SELECT p.cid, COALESCE(m.cv, p.cv) AS cv
             FROM {prev} p LEFT JOIN m{t} m USING (cid))""")
        prev = f"c{t}"
    ids = ", ".join(map(str, query_ids))
    parts.append(f"""
    afin AS (SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {d2('e.ei', 'c.cv')}, c.cid) AS rn
        FROM eint e CROSS JOIN {prev} c) WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, embedding AS qe, {quant} AS qi
          FROM embeddings WHERE vec_id IN ({ids})),
    pr AS (SELECT query_id, cid FROM (
        SELECT q.query_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                                  ORDER BY {d2('q.qi', 'c.cv')}, c.cid) AS rn
        FROM q CROSS JOIN {prev} c) WHERE rn <= {n_probe}),
    cand AS (SELECT pr.query_id, a.vec_id,
                    list_cosine_similarity(e.embedding, q.qe) AS cs
             FROM afin a JOIN pr ON a.cid = pr.cid
             JOIN q ON q.query_id = pr.query_id
             JOIN embeddings e ON e.vec_id = a.vec_id),
    r AS (SELECT query_id, vec_id,
          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cs DESC, vec_id) AS rnk
          FROM cand)""")
    return ("WITH " + ",".join(parts)
            + f"\n    SELECT query_id, vec_id, rnk FROM r WHERE rnk <= {k}")


# ---------------------------------------------------------------------------
# ann_lsh — hyperplane-bucket prefilter + cosine top-k
# ---------------------------------------------------------------------------

def ann_lsh_sql(query_ids: list[int], k: int, dim: int = 64,
                n_planes: int = 8, seed: int = 17) -> str:
    """Replicates ann.lsh_bucketed_topk: sign-pattern buckets from the
    seeded hyperplane matrix (embedded as exact float64 literals),
    Hamming-1 multiprobe around the query buckets, cosine top-k over
    the candidate rows.  Sign decisions sit far from zero relative to
    float summation-order noise, so the numpy and SQL bucket ids agree."""
    F = derive.F
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))

    def bits_expr(col: str) -> str:
        terms = []
        for j in range(n_planes):
            dot = " + ".join(f"{col}[{i + 1}] * {F(planes[i, j])}"
                             for i in range(dim))
            terms.append(f"CASE WHEN ({dot}) > 0 THEN {1 << j} ELSE 0 END")
        return "(" + " + ".join(terms) + ")"

    ids = ", ".join(map(str, query_ids))
    return f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
               WHERE vec_id IN ({ids})),
    qb AS (SELECT query_id, qe, {bits_expr('qe')} AS b FROM q),
    flips AS (SELECT unnest(generate_series(0, {n_planes - 1})) AS i),
    probes AS (SELECT DISTINCT pb FROM (
        SELECT b AS pb FROM qb
        UNION ALL
        SELECT xor(b, 1 << i) AS pb FROM qb CROSS JOIN flips)),
    cand AS (SELECT vec_id, embedding FROM embeddings
             WHERE {bits_expr('embedding')} IN (SELECT pb FROM probes)),
    s AS (SELECT q.query_id, c.vec_id,
          list_cosine_similarity(c.embedding, q.qe) AS cs
          FROM cand c CROSS JOIN q),
    r AS (SELECT query_id, vec_id,
          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cs DESC, vec_id) AS rnk
          FROM s)
    SELECT query_id, vec_id, rnk FROM r WHERE rnk <= {k}
    """


def embed_dup_pairs_lsh_sql(threshold: float, n_tables: int = 4,
                            n_planes: int = 8, seed: int = 29,
                            dim: int = 64) -> str:
    """Mirrors ann.lsh_dup_pairs: per-table sign-pattern buckets from
    the seeded hyperplanes (exact float64 literals), MIN-id bucket
    representative, distinct star pairs, exact-cosine verification."""
    F = derive.F
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_tables * n_planes))

    def bucket_expr(t: int) -> str:
        terms = []
        for j in range(n_planes):
            col = t * n_planes + j
            dot = " + ".join(f"embedding[{i + 1}] * {F(planes[i, col])}"
                             for i in range(dim))
            terms.append(f"CASE WHEN ({dot}) > 0 THEN {1 << j} ELSE 0 END")
        return "(" + " + ".join(terms) + ")"

    selects = "\nUNION ALL\n".join(
        f"SELECT vec_id, {t} AS tbl, {bucket_expr(t)} AS bkt FROM embeddings"
        for t in range(n_tables)
    )
    return f"""
    WITH e AS ({selects}),
    reps AS (SELECT tbl, bkt, MIN(vec_id) AS vec_a FROM e GROUP BY tbl, bkt),
    pairs AS (SELECT DISTINCT r.vec_a, m.vec_id AS vec_b
              FROM e m JOIN reps r ON m.tbl = r.tbl AND m.bkt = r.bkt
              WHERE m.vec_id > r.vec_a)
    SELECT p.vec_a, p.vec_b
    FROM pairs p
    JOIN embeddings a ON a.vec_id = p.vec_a
    JOIN embeddings b ON b.vec_id = p.vec_b
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= {derive.F(threshold)}
    """


# ---------------------------------------------------------------------------
# media_features — synthetic interleaved spans + sha256-derived features
# ---------------------------------------------------------------------------

def _synth_spans_cte(n_docs: int) -> str:
    """(parent, local, n_spans, kind_code, kind, media_ref) for every
    span of the deterministic corpus (mirrors sources/synth.spans_for)."""
    return f"""
    ids AS (SELECT unnest(generate_series(0, {n_docs - 1})) AS parent),
    ns AS (SELECT parent, 1 + ((parent % 8) * 2654435761) % 8 AS n_spans FROM ids),
    sp AS (SELECT parent, n_spans, unnest(generate_series(0, CAST(n_spans AS INT) - 1)) AS lcl
           FROM ns),
    spans AS (
      SELECT parent, lcl, n_spans,
             (parent * 7 + lcl * 3) % 4 AS kind_code,
             CASE (parent * 7 + lcl * 3) % 4
               WHEN 0 THEN 'text' WHEN 1 THEN 'image'
               WHEN 2 THEN 'audio' ELSE 'table' END AS kind,
             'media://' ||
             CASE (parent * 7 + lcl * 3) % 4
               WHEN 0 THEN 'text' WHEN 1 THEN 'image'
               WHEN 2 THEN 'audio' ELSE 'table' END ||
             '/' || CAST(parent * 31 + lcl AS VARCHAR) AS media_ref
      FROM sp
    )"""


def _hex_byte(col: str, i: int) -> str:
    """Value of byte ``i`` (0-based) of a lowercase hex digest column."""
    hi = f"(strpos('0123456789abcdef', substr({col}, {2 * i + 1}, 1)) - 1)"
    lo = f"(strpos('0123456789abcdef', substr({col}, {2 * i + 2}, 1)) - 1)"
    return f"({hi} * 16 + {lo})"


def media_resize_sql(n_docs: int, width: int = 224, height: int = 224) -> str:
    """Mirrors multimodal.MediaTransformActor op='resize': image spans
    only; payload_hash = first 8 digest bytes = first 16 hex chars."""
    return f"""
    WITH {_synth_spans_cte(n_docs)}
    SELECT {_doc_id_sql('parent')} AS doc_id,
           lcl AS span_idx, media_ref,
           CAST({width} AS BIGINT) AS width, CAST({height} AS BIGINT) AS height,
           substr(sha256(media_ref), 1, 16) AS payload_hash
    FROM spans WHERE kind = 'image'
    """


def media_frames_sql(n_docs: int, stride: int = 10) -> str:
    """Mirrors op='frame_sample': audio/table spans, fake frame count
    1 + digest[0] % 64, every ``stride``-th frame index."""
    byte0 = _hex_byte("sha256(media_ref)", 0)
    return f"""
    WITH {_synth_spans_cte(n_docs)},
    m AS (SELECT {_doc_id_sql('parent')} AS doc_id,
                 lcl AS span_idx, media_ref,
                 1 + {byte0} % 64 AS n_frames
          FROM spans WHERE kind IN ('audio', 'table'))
    SELECT doc_id, span_idx, media_ref,
           unnest(generate_series(0, CAST(n_frames - 1 AS BIGINT), {stride})) AS frame_idx
    FROM m
    """


def media_features_sql(n_docs: int, dim: int = 16) -> str:
    """Per-media-span feature vector: sha256(media_ref) digest repeated
    to dim*8 bytes, read as little-endian uint64s, >> 11, / 2^53 —
    mirrors multimodal.MediaFeatureActor._decode_one bit-for-bit (the
    >>11 keeps values < 2^53 so the int->double cast is exact)."""
    feat_cols = []
    for j in range(dim):
        terms = [
            f"CAST({_hex_byte('hx', (j * 8 + t) % 32)} AS HUGEINT) * {1 << (8 * t)}"
            for t in range(8)
        ]
        val = "(" + " + ".join(terms) + ")"
        feat_cols.append(
            f"CAST(({val} // 2048) AS DOUBLE) / 9.007199254740992e15 AS f{j:02d}"
        )
    return f"""
    WITH {_synth_spans_cte(n_docs)},
    media AS (
      SELECT {_doc_id_sql('parent')} AS doc_id,
             lcl AS span_idx, kind, media_ref, sha256(media_ref) AS hx
      FROM spans WHERE kind_code <> 0
    )
    SELECT doc_id, span_idx, kind, media_ref, {', '.join(feat_cols)}
    FROM media
    """
