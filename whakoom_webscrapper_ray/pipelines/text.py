"""Text-analysis operators over the ``documents`` table.

Large-scale training-data pipeline stages: token counting, quality
scoring, language ID, document fingerprinting.  All are single-pass
``map_batches`` transforms (no shuffle) — at 100 TB each is perfectly
data-parallel and streams block-by-block with backpressure.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .common import read, two_phase_agg

# Fixed analysis vocabulary (mirrors classic stopword-ratio quality
# heuristics; the list is part of the operator contract and appears
# verbatim in the oracle SQL).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def _token_profile(batch: pa.Table) -> dict[str, np.ndarray]:
    """Vectorized per-doc token statistics over the flattened stream.

    One Arrow split + one ``dictionary_encode`` + one ``np.unique`` over
    a combined (doc, token-code) key for the whole batch (shared by
    token_stats and quality_score): n_tokens, n_chars, n_unique, n_stop,
    max_rep — no per-row Python loop, no Python-object materialization.
    """
    words = pc.split_pattern(batch["text"], " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = pc.list_flatten(words)
    parent = pc.list_parent_indices(words).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    n_tokens = pc.list_value_length(words).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    n_chars = pc.utf8_length(batch["text"]).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    n_rows = batch.num_rows

    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_vocab = max(len(enc.dictionary), 1)
    # (doc, token) pair counts via one sort-based unique on a fused key
    uk, counts = np.unique(parent * n_vocab + codes, return_counts=True)
    doc_of = uk // n_vocab
    n_unique = np.bincount(doc_of, minlength=n_rows).astype(np.int64)
    max_rep = np.zeros(n_rows, dtype=np.int64)
    np.maximum.at(max_rep, doc_of, counts)

    is_stop = pc.is_in(
        flat, value_set=pa.array(STOPWORDS, pa.string())
    ).to_numpy(zero_copy_only=False)
    n_stop = np.zeros(n_rows, dtype=np.int64)
    np.add.at(n_stop, parent[is_stop], 1)

    return {
        "n_tokens": n_tokens,
        "n_chars": n_chars,
        "n_unique": n_unique,
        "n_stop": n_stop,
        "max_rep": max_rep,
    }


def _token_stats_batch(batch: pa.Table) -> pa.Table:
    prof = _token_profile(batch)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pa.array(prof["n_chars"], pa.int64()),
            "n_tokens": pa.array(prof["n_tokens"], pa.int64()),
            "n_unique_tokens": pa.array(prof["n_unique"], pa.int64()),
            "n_stopwords": pa.array(prof["n_stop"], pa.int64()),
        }
    )


def token_stats(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_chars, n_tokens, n_unique_tokens, n_stopwords).

    The quality-scoring + token-counting stage: integer counts only so
    the oracle comparison is exact (ratios are trivially derivable
    downstream).
    """
    return read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        _token_stats_batch, batch_format="pyarrow"
    )


# BPE-ish pre-tokenizer pattern (GPT-2 style, RE2-compatible: the
# original's \\s+(?!\\S) lookahead is dropped — RE2 has no lookarounds;
# Arrow's count_substring_regex and DuckDB's regexp_extract_all BOTH
# run RE2, so the oracle comparison is engine-exact, not approximate).
BPE_PATTERN = (
    r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def _bpe_count_batch(batch: pa.Table) -> pa.Table:
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_bpe_tokens": pc.cast(
                pc.count_substring_regex(batch["text"], BPE_PATTERN),
                pa.int64(),
            ),
        }
    )


def bpe_token_count(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_bpe_tokens): token counting under a BPE-ish
    pre-tokenizer regex — the training-cost estimator a corpus pipeline
    runs next to whitespace token_stats.  One vectorized RE2 pass per
    batch (count_substring_regex), no per-row Python, no shuffle."""
    return read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        _bpe_count_batch, batch_format="pyarrow"
    )


ORACLE_BPE_TOKEN_COUNT = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{BPE_PATTERN.replace("'", "''")}'))
            AS BIGINT) AS n_bpe_tokens
FROM documents
"""


ORACLE_TOKEN_STATS = f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
           AS n_unique_tokens,
       CAST(len(list_filter(string_split(text, ' '),
            x -> list_contains({list(STOPWORDS)}, x))) AS BIGINT)
           AS n_stopwords
FROM documents
"""


# -------------------------------------------------------- quality score
def _quality_batch(batch: pa.Table) -> pa.Table:
    """Vectorized quality heuristics over the flattened token stream.

    All outputs are exact integers (pct = floor(100·num/den)) so the
    DuckDB oracle compares bit-for-bit — no float tolerance games.
    """
    prof = _token_profile(batch)
    n_tokens = prof["n_tokens"]
    n_chars = prof["n_chars"]
    n_unique = prof["n_unique"]
    n_stop = prof["n_stop"]
    max_rep = prof["max_rep"]

    den = np.maximum(n_tokens, 1)
    stop_pct = 100 * n_stop // den
    uniq_pct = 100 * n_unique // den
    rep_pct = 100 * max_rep // den
    # letters only: tokens are single-space-joined, so spaces = n_tokens-1
    letters = n_chars - np.maximum(n_tokens - 1, 0)
    mean_len_x100 = 100 * letters // den
    ok = (
        (n_tokens >= 5)
        & (stop_pct <= 60)
        & (uniq_pct >= 20)
        & (rep_pct <= 40)
        & (mean_len_x100 >= 200)
        & (mean_len_x100 <= 1200)
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "stop_pct": pa.array(stop_pct, pa.int64()),
            "uniq_pct": pa.array(uniq_pct, pa.int64()),
            "rep_pct": pa.array(rep_pct, pa.int64()),
            "mean_len_x100": pa.array(mean_len_x100, pa.int64()),
            "quality_ok": pa.array(ok, pa.bool_()),
        }
    )


def quality_score(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_tokens, stop_pct, uniq_pct, rep_pct, mean_len_x100,
    quality_ok) — the quality-scoring stage of a training-data pipeline
    (stopword ratio, lexical diversity, repetition, mean token length),
    single-pass map_batches, no shuffle."""
    return read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        _quality_batch, batch_format="pyarrow"
    )


ORACLE_QUALITY_SCORE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents
),
per AS (
  SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2
),
agg AS (
  SELECT doc_id,
         sum(c) AS n_tokens,
         count(*) AS n_unique,
         max(c) AS max_rep,
         coalesce(sum(c) FILTER (
             WHERE list_contains({list(STOPWORDS)}, tok)), 0) AS n_stop
  FROM per GROUP BY 1
),
base AS (
  SELECT d.doc_id,
         CAST(a.n_tokens AS BIGINT) AS n_tokens,
         CAST(100 * a.n_stop // a.n_tokens AS BIGINT) AS stop_pct,
         CAST(100 * a.n_unique // a.n_tokens AS BIGINT) AS uniq_pct,
         CAST(100 * a.max_rep // a.n_tokens AS BIGINT) AS rep_pct,
         CAST(100 * (length(d.text) - greatest(a.n_tokens - 1, 0))
             // a.n_tokens AS BIGINT) AS mean_len_x100
  FROM documents d JOIN agg a USING (doc_id)
)
SELECT doc_id, n_tokens, stop_pct, uniq_pct, rep_pct, mean_len_x100,
       (n_tokens >= 5 AND stop_pct <= 60 AND uniq_pct >= 20
        AND rep_pct <= 40 AND mean_len_x100 BETWEEN 200 AND 1200)
           AS quality_ok
FROM base
"""


# --------------------------------------------------------------- langid
class LangIdModel:
    """Character-n-gram language classifier (actor-pool stage).

    The per-language trigram profiles are "the model": built once per
    actor in ``__init__`` (the expensive-setup pattern, reference
    publications.py:31-40 builds Selenium once per spider), applied
    vectorized per batch in ``__call__``.  Profiles come from a fixed
    public-knowledge seed-word list per language — no training data.
    """

    SEEDS = {
        "en": "the and of to in is it for with that this from table row "
              "fast slow key value part small query data join scan",
        "es": "el la de que y en un ser se no con para por como su al lo "
              "datos tabla fila clave valor consulta rapido lento",
        "fr": "le la de et un être que pour dans ce il qui ne sur se pas "
              "plus par je avec tout faire son mettre autre données",
        "de": "der die und in den von zu das mit sich des auf für ist im "
              "dem nicht ein als auch es an werden aus er daten",
        "zh": "de shi bu le ren wo zai you ta zhe zhong da lai shang guo "
              "dao shuo he yao jiu chu hui ye ni sheng shu ju biao",
    }

    def __init__(self) -> None:
        self.langs = sorted(self.SEEDS)
        profiles: list[set[str]] = []
        for lang in self.langs:
            grams: set[str] = set()
            for w in self.SEEDS[lang].split():
                padded = f" {w} "
                grams.update(
                    padded[i:i + 3] for i in range(len(padded) - 2)
                )
            profiles.append(grams)
        self.profiles = profiles
        # Flatten profiles to a sorted uint32 byte-trigram code table plus
        # a (code, lang) 0/1 membership matrix — the batch path scores via
        # searchsorted + one np.add.at, no per-row set intersection.
        # Trigram semantics are UTF-8 *bytes*; identical to the char-based
        # definition for ASCII text (all seeds and fixtures are ASCII).
        code_of: dict[int, np.ndarray] = {}
        for li, grams in enumerate(profiles):
            for g in grams:
                b = g.encode("utf-8")
                if len(b) != 3:  # non-ASCII seed gram: skip byte path
                    continue
                c = (b[0] << 16) | (b[1] << 8) | b[2]
                code_of.setdefault(c, np.zeros(len(self.langs), np.int64))
                code_of[c][li] = 1
        self.codes = np.array(sorted(code_of), dtype=np.uint32)
        self.member = np.stack(
            [code_of[c] for c in self.codes]
        ) if len(code_of) else np.zeros((0, len(self.langs)), np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # " " || text || " " then every space doubled — word-boundary
        # grams like " wo" / "rd " survive while cross-word grams don't.
        padded = pc.replace_substring(
            pc.binary_join_element_wise(
                pa.scalar(" "), batch["text"], pa.scalar(" "), ""
            ),
            pattern=" ", replacement="  ",
        )
        arr = pc.cast(padded, pa.large_utf8())
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
            arr.offset: arr.offset + len(arr) + 1
        ]
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        n = len(arr)

        lens = np.diff(offs)
        tl = np.maximum(lens - 2, 0)  # trigrams per doc
        tot = int(tl.sum())
        parent = np.repeat(np.arange(n, dtype=np.int64), tl)
        within = np.arange(tot, dtype=np.int64) - np.repeat(
            np.cumsum(tl) - tl, tl
        )
        pos = offs[:-1][parent] + within
        c = data.astype(np.uint32)
        tri_all = (
            (c[:-2] << np.uint32(16)) | (c[1:-1] << np.uint32(8)) | c[2:]
        ) if data.size >= 3 else np.empty(0, np.uint32)
        tri = tri_all[pos]

        # distinct (doc, gram) pairs, then profile-membership scoring
        uk = np.unique(parent * np.int64(1 << 24) + tri)
        doc_of = (uk >> np.int64(24)).astype(np.int64)
        gram = (uk & np.int64((1 << 24) - 1)).astype(np.uint32)
        idx = np.searchsorted(self.codes, gram)
        idx_c = np.minimum(idx, max(len(self.codes) - 1, 0))
        hit = (self.codes[idx_c] == gram) if len(self.codes) else \
            np.zeros(len(gram), dtype=bool)
        scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        np.add.at(scores, doc_of[hit], self.member[idx_c[hit]])
        preds = np.asarray(self.langs, dtype=object)[
            np.argmax(scores, axis=1)
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pa.array(preds, pa.string()),
                "lang": batch["lang"],
            }
        )


def _langid_batch(batch: pa.Table) -> pa.Table:
    # plain task + per-worker memoized model: profile construction is
    # microseconds, so an actor pool would only add startup latency.
    # A REAL model load (fasttext etc.) would warrant the pool —
    # multimodal.py keeps that pattern where it is earned.
    model = _WORKER_MEMO.get("langid")
    if model is None:
        model = _WORKER_MEMO["langid"] = LangIdModel()
    return model(batch)


_WORKER_MEMO: dict = {}


def langid(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, pred_lang, lang) — n-gram language ID."""
    return read(sf_dir, "documents", columns=["doc_id", "text", "lang"]
                ).map_batches(_langid_batch, batch_format="pyarrow")


def langid_oracle_sql() -> str:
    """DuckDB SQL reproducing the trigram-profile classifier exactly.

    Expressible because the "model" is a fixed gram→lang membership table
    (inlined as VALUES) and the score is COUNT(DISTINCT matching grams);
    char-based substr equals the byte-trigram batch path on ASCII text.
    Ties and zero-score docs resolve to the alphabetically first language,
    matching ``np.argmax`` over the sorted lang axis.
    """
    m = LangIdModel()
    rows = ", ".join(
        f"('{lang}', '{g}')"
        for lang, grams in zip(m.langs, m.profiles)
        for g in sorted(grams)
    )
    first_lang = m.langs[0]
    return f"""
WITH profile(lang, g) AS (VALUES {rows}),
padded AS (
  SELECT doc_id, replace(' ' || text || ' ', ' ', '  ') AS p
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, substr(p, CAST(i AS INT), 3) AS g
  FROM (
    SELECT doc_id, p, unnest(range(1, length(p) - 1)) AS i FROM padded
  )
),
scores AS (
  SELECT gr.doc_id, pr.lang, count(*) AS s
  FROM grams gr JOIN profile pr ON gr.g = pr.g
  GROUP BY 1, 2
),
best AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY s DESC, lang ASC) AS rn
  FROM scores
)
SELECT d.doc_id,
       coalesce(b.lang, '{first_lang}') AS pred_lang,
       d.lang
FROM documents d
LEFT JOIN (SELECT doc_id, lang FROM best WHERE rn = 1) b USING (doc_id)
"""


# --------------------------------------------------------- fingerprint
FP_BASE = np.uint64(1099511628211)
FP_SEED = np.uint64(14695981039346656037)
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def token_hashes(ws: list[str] | np.ndarray) -> np.ndarray:
    """Vectorized uint64 token hashes, deterministic across processes.

    ``pandas.util.hash_array`` (SipHash-1-3 with a fixed key) hashes the
    whole array in C — replacing a per-character Python FNV loop that
    dominated every hashing operator's profile.
    """
    import pandas as pd

    arr = np.asarray(ws, dtype=object)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(arr).astype(np.uint64)


def _split_flat(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """text column → (flat token hashes, doc start offsets, doc lengths)."""
    words = pc.split_pattern(batch["text"], " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
    offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    th = token_hashes(flat)
    return th, offs[:-1], np.diff(offs)


# token-level polynomial hash (fingerprints only): unlike the SipHash
# token_hashes above, this recurrence is reproducible in ANSI SQL
# (Horner over character codes), giving the fingerprint pipeline an
# exact DuckDB oracle.  Still fully vectorized: one pass over the raw
# byte buffer, no per-token Python.
TOK_BASE = np.uint64(1000003)
TOK_SEED = np.uint64(1469598103934665603)


def mix64(h: np.ndarray) -> np.ndarray:
    """Murmur3 fmix64 avalanche (public domain finisher): bijective on
    uint64, fixes the char-poly hash's weak low bits (bit b of a
    polynomial hash depends only on input bits ≤ b), and — unlike
    SipHash — is exactly reproducible in SQL (xor + shift + mod-2**64
    multiply)."""
    with np.errstate(over="ignore"):
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(0xFF51AFD7ED558CCD)
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(0xC4CEB9FE1A85EC53)
        h = h ^ (h >> np.uint64(33))
    return h


def fmix64_docid_ctes(seed: int, prefix: str = "mix") -> tuple[str, str]:
    """CTE chain computing ``h = fmix64(doc_id XOR seed)`` (UBIGINT) for
    every documents row — the SQL twin of ``mix64(ids ^ seed)``,
    verified bit-exact against numpy.  xor/shift run on UBIGINT; the
    two mod-2**64 multiplies split each factor at 2**32 so every
    HUGEINT partial product stays below 2**64 (same construction as
    dedup.simhash_oracle_sql).  Returns ``(ctes, final_name)``; the
    final CTE has columns ``(doc_id, h)``.
    """
    m = "18446744073709551616::HUGEINT"  # 2**64

    def mulmod(c: int) -> str:
        lo, hi = c % (1 << 32), c >> 32
        return (
            f"((h % 4294967296) * {lo}::HUGEINT"
            f" + (((h % 4294967296) * {hi}::HUGEINT"
            f"     + (h // 4294967296) * {lo}::HUGEINT) % 4294967296)"
            f"   * 4294967296::HUGEINT) % {m}"
        )

    p = prefix
    ctes = f"""{p}0 AS (
    SELECT doc_id,
           xor(CAST(doc_id AS UBIGINT), {seed}::UBIGINT) AS h
    FROM documents
),
{p}1 AS (SELECT doc_id, CAST(xor(h, h >> 33) AS HUGEINT) AS h FROM {p}0),
{p}2 AS (SELECT doc_id, {mulmod(0xFF51AFD7ED558CCD)} AS h FROM {p}1),
{p}3 AS (SELECT doc_id,
                CAST(xor(CAST(h AS UBIGINT), CAST(h AS UBIGINT) >> 33)
                     AS HUGEINT) AS h
         FROM {p}2),
{p}4 AS (SELECT doc_id, {mulmod(0xC4CEB9FE1A85EC53)} AS h FROM {p}3),
{p}5 AS (SELECT doc_id,
                xor(CAST(h AS UBIGINT), CAST(h AS UBIGINT) >> 33) AS h
         FROM {p}4)"""
    return ctes, f"{p}5"


def char_poly_hashes(flat: pa.Array) -> np.ndarray:
    """Per-token Horner hash over raw bytes, mod 2**64.

    th = TOK_SEED·B^L + Σ byte[j]·B^(L-1-j) — i.e. ``h = TOK_SEED;
    for c in token: h = h*B + c``.  Evaluated for the whole batch from
    the Arrow string buffers: token bytes are contiguous in flattening
    order, so one power-table multiply + cumsum-difference computes
    every token's hash with zero gathers and zero row loops.  (Exact
    for ASCII ↔ SQL ``unicode(ch)``; multi-byte UTF-8 hashes bytewise
    here vs per-codepoint in SQL — the synth corpora are ASCII.)
    """
    n = len(flat)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    bufs = flat.buffers()
    # large_string carries int64 offsets (flattened token bytes can
    # exceed 2 GiB per batch) — reading them as int32 would silently
    # misparse, producing wrong fingerprints instead of an error
    off_dt = (np.int64 if pa.types.is_large_string(flat.type)
              else np.int32)
    offs = np.frombuffer(bufs[1], dtype=off_dt)[
        flat.offset:flat.offset + n + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None else np.empty(0, dtype=np.uint8)
    )
    lens = np.diff(offs)
    seg = data[offs[0]:offs[-1]].astype(np.uint64)
    with np.errstate(over="ignore"):
        max_len = int(lens.max()) if lens.size else 0
        pows = np.empty(max_len + 1, dtype=np.uint64)
        pows[0] = np.uint64(1)
        if max_len:
            np.multiply.accumulate(
                np.full(max_len, TOK_BASE, dtype=np.uint64), out=pows[1:]
            )
        bounds = np.r_[0, np.cumsum(lens)]
        within = np.arange(seg.size, dtype=np.int64) - np.repeat(
            bounds[:-1], lens
        )
        exp = np.repeat(lens, lens) - 1 - within
        # group sums via cumsum difference: uint64 wraparound IS the
        # mod-2^64 arithmetic, and empty tokens fall out naturally.
        cs = np.zeros(seg.size + 1, dtype=np.uint64)
        np.cumsum(seg * pows[exp], dtype=np.uint64, out=cs[1:])
        th = cs[bounds[1:]] - cs[bounds[:-1]]
        th = th + TOK_SEED * pows[lens]
    return th


def _fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Rolling polynomial hash over token hashes (Karp–Rabin style).

    h = SEED·Bⁿ + Σ th[i]·B^(n-1-i) (mod 2⁶⁴) — evaluated for the whole
    batch with one power table + one ``np.add.reduceat``, no row loop.
    Token hashes are :func:`char_poly_hashes` (not SipHash) so the
    whole fingerprint is reproducible by the DuckDB oracle.
    """
    words = pc.split_pattern(batch["text"], " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    th = char_poly_hashes(pc.list_flatten(words))
    starts, lens = offs[:-1], np.diff(offs)
    max_len = int(lens.max()) if lens.size else 0
    with np.errstate(over="ignore"):
        pows = np.empty(max_len + 1, dtype=np.uint64)
        pows[0] = np.uint64(1)
        np.multiply.accumulate(
            np.full(max_len, FP_BASE, dtype=np.uint64), out=pows[1:]
        )
        pos = np.arange(th.size, dtype=np.int64) - np.repeat(starts, lens)
        exp = np.repeat(lens, lens) - 1 - pos
        contrib = th * pows[exp]
        fps = np.add.reduceat(contrib, starts) if th.size else np.empty(
            0, dtype=np.uint64
        )
        fps = fps + FP_SEED * pows[lens]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(fps.view(np.int64), pa.int64()),
        }
    )


def fingerprints(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, fingerprint) — order-sensitive rolling document hash."""
    return read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        _fingerprint_batch, batch_format="pyarrow"
    )


def fingerprints_oracle_sql() -> str:
    """DuckDB SQL reproducing the rolling fingerprint bit-exactly.

    Both levels are Horner recurrences mod 2**64: token hash =
    ``h = TOK_SEED; h = h*TOK_BASE + byte`` over characters (ASCII ↔
    ``unicode(ch)``), document fingerprint = ``h = FP_SEED;
    h = h*FP_BASE + th`` over token hashes.  HUGEINT (int128) holds the
    intermediate products (< 2**104); the final value wraps to signed
    int64 exactly like ``uint64.view(int64)``.
    """
    m = "18446744073709551616::HUGEINT"  # 2**64
    return f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS ts FROM documents
),
th AS (
    SELECT doc_id,
        list_transform(ts, t ->
            list_reduce(
                list_concat(
                    [CAST({int(TOK_SEED)} AS HUGEINT)],
                    list_transform(
                        string_split(t, ''),
                        ch -> CAST(unicode(ch) AS HUGEINT)
                    )
                ),
                (a, b) -> (a * {int(TOK_BASE)} + b) % {m}
            )
        ) AS hs
    FROM toks
),
fp AS (
    SELECT doc_id,
        list_reduce(
            list_concat([CAST({int(FP_SEED)} AS HUGEINT)], hs),
            (a, b) -> (a * {int(FP_BASE)} + b) % {m}
        ) AS v
    FROM th
)
SELECT doc_id,
    CAST(CASE WHEN v >= 9223372036854775808::HUGEINT
              THEN v - {m} ELSE v END AS BIGINT) AS fingerprint
FROM fp
"""


# ------------------------------------------------- grouped top-k
_LANG_TOPK = 5


def _lang_topk_combine(batch: pa.Table, k: int = _LANG_TOPK) -> pa.Table:
    """Map-side combiner: per-batch top-k docs per language (longest by
    n_tokens, ties by doc_id ascending).  Only k rows per language per
    BLOCK reach the shuffle — the grouped-top-k analog of a
    pre-aggregation, so the final groupby moves k x langs x blocks
    rows, never the corpus."""
    langs = batch["lang"].to_numpy(zero_copy_only=False)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    words = pc.split_pattern(batch["text"], " ")
    n_tok = pc.list_value_length(words).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    # sort by (lang, -n_tokens, doc_id); first k rows of each lang run
    # (langs encoded to int codes — lexsort on an object key is slow)
    _, codes = np.unique(langs, return_inverse=True)
    order = np.lexsort((ids, -n_tok, codes))
    langs, ids, n_tok = langs[order], ids[order], n_tok[order]
    codes = codes[order]
    starts = np.flatnonzero(
        np.r_[True, codes[1:] != codes[:-1]]
    ) if len(langs) else np.empty(0, dtype=np.int64)
    within = np.arange(len(langs)) - np.repeat(
        starts, np.diff(np.r_[starts, len(langs)])
    ) if len(langs) else np.empty(0, dtype=np.int64)
    keep = within < k
    return pa.table(
        {
            "lang": pa.array(langs[keep], pa.string()),
            "doc_id": pa.array(ids[keep], pa.int64()),
            "n_tokens": pa.array(n_tok[keep], pa.int64()),
        }
    )


def _lang_topk_final(k: int = _LANG_TOPK):
    # Arrow-native final merge (no pandas bounce)
    def final(g: pa.Table) -> pa.Table:
        nt = g["n_tokens"].to_numpy(zero_copy_only=False)
        did = g["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, -nt))[:k]
        t = g.take(pa.array(order, pa.int64()))
        return pa.table({
            "lang": t["lang"],
            "doc_id": t["doc_id"],
            "n_tokens": t["n_tokens"],
            "rank": pa.array(
                np.arange(1, order.size + 1, dtype=np.int64), pa.int64()
            ),
        })

    return final


def lang_topk(sf_dir: str, k: int = _LANG_TOPK) -> ray.data.Dataset:
    """(lang, doc_id, n_tokens, rank): the k longest documents per
    language — the grouped-top-k operator (a per-language sample
    inspection pass).  Map-side combiner + tiny final groupby.  Groups
    by the ``lang`` label: the synthetic fixture's text is not
    language-separable (one shared vocabulary), so pred_lang would
    collapse to a single group and exercise nothing."""
    return (
        read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
        .map_batches(
            _lang_topk_combine, fn_kwargs={"k": k},
            batch_format="pyarrow",
        )
        .groupby("lang")
        .map_groups(_lang_topk_final(k), batch_format="pyarrow")
    )


def lang_topk_oracle_sql(k: int = _LANG_TOPK) -> str:
    return f"""
SELECT lang, doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(row_number() OVER (
         PARTITION BY lang
         ORDER BY len(string_split(text, ' ')) DESC, doc_id ASC
       ) AS BIGINT) AS rank
FROM documents
QUALIFY rank <= {k}
"""


# ------------------------------------------------- exact quantiles
_QUANTILE_PCTS = (50, 90, 99)


def token_quantiles(sf_dir: str) -> ray.data.Dataset:
    """(pct, value): EXACT token-count percentiles over the corpus via
    distributed histogram combine — each block emits (value, count)
    partials over the bounded integer domain, a small groupby sums
    them, and the driver reads back only the distinct-value histogram
    (never the corpus).  value = the ceil(pct/100 * n)-th smallest —
    the explicit discrete-quantile definition the oracle mirrors."""
    from ray.data.aggregate import Sum

    from .common import collect_small

    def hist(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        n_tok = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        v, c = np.unique(n_tok, return_counts=True)
        return pa.table(
            {"v": pa.array(v, pa.int64()),
             "c": pa.array(c, pa.int64())}
        )

    partials = (
        read(sf_dir, "documents", columns=["text"])
        .map_batches(hist, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("c", alias_name="c"))
    )
    t = collect_small(
        partials, pa.schema([("v", pa.int64()), ("c", pa.int64())])
    ).sort_by("v")
    vals = t["v"].to_numpy(zero_copy_only=False)
    cum = np.cumsum(t["c"].to_numpy(zero_copy_only=False))
    n = int(cum[-1]) if len(cum) else 0
    out_p, out_v = [], []
    for pct in _QUANTILE_PCTS:
        if n == 0:
            continue
        target = -(-pct * n // 100)  # ceil(pct*n/100)
        out_p.append(pct)
        out_v.append(int(vals[np.searchsorted(cum, target)]))
    return ray.data.from_arrow(pa.table(
        {"pct": pa.array(out_p, pa.int64()),
         "value": pa.array(out_v, pa.int64())}
    ))


ORACLE_TOKEN_QUANTILES = f"""
WITH t AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS v
  FROM documents
),
ord AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM t),
n AS (SELECT count(*) AS c FROM t),
p(pct) AS (VALUES (50), (90), (99))
SELECT CAST(p.pct AS BIGINT) AS pct, o.v AS value
FROM p CROSS JOIN n
JOIN ord o ON o.rn = CAST(ceil(p.pct * n.c / 100.0) AS BIGINT)
"""


def lang_token_quantiles(sf_dir: str) -> ray.data.Dataset:
    """(lang, pct, value): per-language EXACT token-count percentiles —
    the grouped form of :func:`token_quantiles`, same distributed
    histogram combine: blocks emit (lang, value, count) partials over
    the bounded integer domain, a small groupby sums them, and the
    driver folds only the per-language distinct-value histograms
    (langs × values rows, never the corpus)."""
    from ray.data.aggregate import Sum

    from .common import collect_small

    def hist(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        n_tok = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        t = pa.TableGroupBy(
            pa.table({"lang": b["lang"],
                      "v": pa.array(n_tok, pa.int64())}),
            ["lang", "v"],
        ).aggregate([([], "count_all")])
        return pa.table({"lang": t["lang"], "v": t["v"],
                         "c": t["count_all"]})

    partials = (
        read(sf_dir, "documents", columns=["text", "lang"])
        .map_batches(hist, batch_format="pyarrow")
        .groupby(["lang", "v"])
        .aggregate(Sum("c", alias_name="c"))
    )
    t = collect_small(
        partials,
        pa.schema([("lang", pa.string()), ("v", pa.int64()),
                   ("c", pa.int64())]),
    )
    langs = t["lang"].to_numpy(zero_copy_only=False)
    vs = t["v"].to_numpy(zero_copy_only=False)
    cs = t["c"].to_numpy(zero_copy_only=False)
    order = np.lexsort((vs, langs))
    langs, vs, cs = langs[order], vs[order], cs[order]
    out_l, out_p, out_v = [], [], []
    starts = np.flatnonzero(np.r_[True, langs[1:] != langs[:-1]]) \
        if len(langs) else np.empty(0, dtype=np.int64)
    for i, s in enumerate(starts):
        e = starts[i + 1] if i + 1 < len(starts) else len(langs)
        cum = np.cumsum(cs[s:e])
        n = int(cum[-1])
        for pct in _QUANTILE_PCTS:
            target = -(-pct * n // 100)
            out_l.append(langs[s])
            out_p.append(pct)
            out_v.append(int(vs[s:e][np.searchsorted(cum, target)]))
    return ray.data.from_arrow(pa.table(
        {"lang": pa.array(out_l, pa.string()),
         "pct": pa.array(out_p, pa.int64()),
         "value": pa.array(out_v, pa.int64())}
    ))


ORACLE_LANG_TOKEN_QUANTILES = f"""
WITH t AS (
  SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS v
  FROM documents
),
ord AS (SELECT lang, v,
               row_number() OVER (PARTITION BY lang ORDER BY v) AS rn
        FROM t),
n AS (SELECT lang, count(*) AS c FROM t GROUP BY lang),
p(pct) AS (VALUES (50), (90), (99))
SELECT o.lang, CAST(p.pct AS BIGINT) AS pct, o.v AS value
FROM p CROSS JOIN n
JOIN ord o ON o.lang = n.lang
          AND o.rn = CAST(ceil(p.pct * n.c / 100.0) AS BIGINT)
"""


# ----------------------------------------- frequent n-grams (df top-k)
_NGRAM_TOPK = 20


def _doc_grams_str(b: pa.Table) -> tuple[pa.Array, np.ndarray]:
    """Per-doc DISTINCT word-3-gram strings for a whole batch, zero row
    loops: grams are built by element-wise joining three shifted slices
    of the flat token array (positions whose window stays inside one
    doc), docs with <3 tokens contribute their whole-token join —
    exactly the oracle's ``grams`` CTE (dedup.JACCARD_CTES).  Returns
    (flat gram strings, row index of each gram's doc).
    """
    words = pc.split_pattern(b["text"], " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = pc.list_flatten(words)
    offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offs)
    n = len(flat)
    doc_of = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
    if n >= 3:
        g3 = pc.binary_join_element_wise(
            flat.slice(0, n - 2), flat.slice(1, n - 2),
            flat.slice(2, n - 2), "\x1f",
        )
        in_doc = doc_of[:-2] == doc_of[2:]
        g3 = g3.filter(pa.array(in_doc))
        g3_doc = doc_of[:-2][in_doc]
    else:
        g3 = pa.array([], pa.string())
        g3_doc = np.empty(0, dtype=np.int64)
    short = lens < 3
    if short.any():
        gs = pc.binary_join(words.filter(pa.array(short)), "\x1f")
        gs_doc = np.flatnonzero(short).astype(np.int64)
    else:
        gs = pa.array([], pa.string())
        gs_doc = np.empty(0, dtype=np.int64)
    grams = pa.concat_arrays([
        g3.combine_chunks() if isinstance(g3, pa.ChunkedArray) else g3,
        gs.combine_chunks() if isinstance(gs, pa.ChunkedArray) else gs,
    ])
    gdoc = np.concatenate([g3_doc, gs_doc])
    # per-doc distinct (docs never span batches, so block-local dedup
    # is globally exact): group on (doc row, gram) with no aggregates
    t = pa.TableGroupBy(
        pa.table({"d": pa.array(gdoc), "gram": grams}), ["d", "gram"]
    ).aggregate([])
    return t["gram"].combine_chunks(), t["d"].to_numpy(
        zero_copy_only=False
    )


def ngram_df_topk(sf_dir: str, k: int = _NGRAM_TOPK) -> ray.data.Dataset:
    """(gram, df): the k most document-frequent word-3-grams — the
    boilerplate-detection operator (frequent-ngram mining).  Map-side
    partial counts collapse each block to its distinct grams before
    the shuffle; a groupby sums partials; a per-block top-k combiner +
    single tiny merge sort picks the winners (ties by gram ascending),
    so the final sort never sees more than k × blocks rows."""
    # gram cardinality is corpus-sized: per-block partial counts, one
    # shuffle keyed by a coarse hash of the gram STRING, and one
    # vectorized numpy merge per partition (the string-key analog of
    # common.hash_keyed_agg — Ray's per-key aggregate pays a Python
    # frame per distinct gram)
    parts = 64

    def partial(b: pa.Table) -> pa.Table:
        grams, _ = _doc_grams_str(b)
        g = pa.TableGroupBy(
            pa.table({"gram": grams}), ["gram"]
        ).aggregate([([], "count_all")])
        h = token_hashes(
            g["gram"].to_numpy(zero_copy_only=False)
        )
        return pa.table({
            "gram": g["gram"], "df_p": g["count_all"],
            "part": pa.array(
                (h % np.uint64(parts)).astype(np.int64)
            ),
        })

    def reduce_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"gram": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        gr = g["gram"].to_numpy(zero_copy_only=False)
        d = g["df_p"].to_numpy(zero_copy_only=False)
        ug, inv = np.unique(gr, return_inverse=True)
        s = np.zeros(ug.size, dtype=np.int64)
        np.add.at(s, inv, d)
        return pa.table({"gram": pa.array(ug, pa.string()),
                         "df": pa.array(s, pa.int64())})

    agg = (
        read(sf_dir, "documents", columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(reduce_part, batch_format="pyarrow")
    )

    def local_top(b: pa.Table) -> pa.Table:
        if b.num_rows <= k:
            return b
        df = b["df"].to_numpy(zero_copy_only=False)
        gr = b["gram"].to_numpy(zero_copy_only=False)
        order = np.lexsort((gr, -df))[:k]
        return b.take(pa.array(np.sort(order), pa.int64()))

    return (
        agg.map_batches(local_top, batch_format="pyarrow")
        .repartition(1)
        .sort(["df", "gram"], descending=[True, False])
        .limit(k)
        .select_columns(["gram", "df"])
    )


def ngram_df_topk_oracle_sql(k: int = _NGRAM_TOPK) -> str:
    from .dedup import JACCARD_CTES

    return f"""
WITH {JACCARD_CTES}
SELECT g AS gram, count(*) AS df
FROM (SELECT doc_id, unnest(gs) AS g FROM grams)
GROUP BY g
ORDER BY df DESC, gram ASC
LIMIT {k}
"""


# ------------------------------------- vocabulary size (exact + HLL)
def vocab_size(sf_dir: str) -> ray.data.Dataset:
    """One row (vocab): exact distinct-token count.  Blocks collapse to
    their distinct tokens map-side, one shuffle dedups globally (the
    groupby moves distinct-per-block tokens, never corpus positions).
    The exact companion (and driver oracle anchor) for
    :func:`hll_vocab`."""

    parts = 64

    def distinct_tokens(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        toks = pc.unique(pc.list_flatten(words))
        h = token_hashes(toks.to_numpy(zero_copy_only=False))
        return pa.table({
            "token": toks,
            "part": pa.array((h % np.uint64(parts)).astype(np.int64)),
        })

    def count_part(g: pa.Table) -> pa.Table:
        # token cardinality is vocabulary-sized at corpus scale: one
        # vectorized distinct-count per hash partition, not Ray's
        # per-key aggregate
        n = np.unique(
            g["token"].to_numpy(zero_copy_only=False)
        ).size if g.num_rows else 0
        return pa.table({"n": pa.array([n], pa.int64())})

    partials = (
        read(sf_dir, "documents", columns=["text"])
        .map_batches(distinct_tokens, batch_format="pyarrow")
        .groupby("part")
        .map_groups(count_part, batch_format="pyarrow")
    )
    n = sum(r["n"] for r in partials.take_all())
    return ray.data.from_arrow(
        pa.table({"vocab": pa.array([n], pa.int64())})
    )


ORACLE_VOCAB_SIZE = """
SELECT CAST(count(DISTINCT t) AS BIGINT) AS vocab
FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
"""


def lang_vocab(sf_dir: str) -> ray.data.Dataset:
    """(lang, vocab): exact distinct-token count PER LANGUAGE — the
    groupwise count-distinct shape (``approx_count_distinct`` per key,
    done exactly).  Blocks collapse to their distinct (lang, token)
    pairs map-side; pairs hash-partition on the composite key so each
    pair lands in exactly one partition, every partition emits tiny
    (lang, n) partials, and one low-cardinality sum merges them — the
    shuffle moves distinct-per-block pairs, never corpus positions.
    """
    parts = 64
    sep = "\x1f"  # never appears in the space-tokenized vocabulary

    def distinct_pairs(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        parent = pc.list_parent_indices(words)
        toks = pc.list_flatten(words)
        langs = b["lang"].take(parent)
        joined = pc.binary_join_element_wise(langs, toks, sep)
        jnp = joined.to_numpy(zero_copy_only=False)
        _, idx = np.unique(jnp, return_index=True)
        take = pa.array(idx, pa.int64())
        h = token_hashes(jnp[idx])
        return pa.table({
            "lang": langs.take(take),
            "token": toks.take(take),
            "part": pa.array((h % np.uint64(parts)).astype(np.int64)),
        })

    def count_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        lang = g["lang"].to_numpy(zero_copy_only=False)
        tok = g["token"].to_numpy(zero_copy_only=False)
        pair = np.char.add(np.char.add(lang.astype(str), sep),
                           tok.astype(str))
        _, idx = np.unique(pair, return_index=True)
        ulang, counts = np.unique(lang[idx], return_counts=True)
        return pa.table({
            "lang": pa.array(ulang, pa.string()),
            "n": pa.array(counts, pa.int64()),
        })

    partials = (
        read(sf_dir, "documents", columns=["lang", "text"])
        .map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(count_part, batch_format="pyarrow")
    )
    return two_phase_agg(partials, ["lang"], sums={"n": "vocab"})


ORACLE_LANG_VOCAB = """
SELECT lang, CAST(count(DISTINCT t) AS BIGINT) AS vocab
FROM (
  SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents
)
GROUP BY lang
"""

# ------------------------------------------- denylist redaction
# The text-REWRITE operator (PII-scrub shape): replace denylisted
# terms, count the hits.  Both sides are RE2 — pyarrow.compute's
# replace_substring_regex and DuckDB's regexp_replace share the
# engine, so the oracle is semantics-exact, same contract as
# bpe_token_count's pre-tokenizer.
_REDACT_PATTERN = r"\b(customer|order)\b"
_REDACT_TOKEN = "<REDACTED>"


def redact_terms(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, clean_text, n_redactions): denylist scrub over the
    corpus — the PII-redaction pipeline shape (the fixture corpus has
    no emails/numbers, so the denylist is term-based; the machinery —
    compiled-RE2 global rewrite + match count, fully vectorized, no
    per-row Python — is the real surface)."""

    def scrub(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "clean_text": pc.replace_substring_regex(
                    b["text"], pattern=_REDACT_PATTERN,
                    replacement=_REDACT_TOKEN,
                ),
                "n_redactions": pc.cast(
                    pc.count_substring_regex(
                        b["text"], pattern=_REDACT_PATTERN
                    ),
                    pa.int64(),
                ),
            }
        )

    return read(sf_dir, "documents", columns=["doc_id", "text"]
                ).map_batches(scrub, batch_format="pyarrow")


ORACLE_REDACT_TERMS = f"""
SELECT doc_id,
       regexp_replace(text, '{_REDACT_PATTERN}', '{_REDACT_TOKEN}', 'g')
         AS clean_text,
       CAST(len(regexp_extract_all(text, '{_REDACT_PATTERN}'))
            AS BIGINT) AS n_redactions
FROM documents
"""

_HLL_P = 12  # 4096 registers; standard error 1.04/sqrt(4096) ~ 1.6%


def _clz64(v: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros on uint64 (exact — no float
    round-trip, whose mantissa rounding can carry into the exponent)."""
    lz = np.zeros(v.shape, dtype=np.int64)
    x = v.copy()
    for s in (32, 16, 8, 4, 2, 1):
        hi = x >> np.uint64(64 - s)
        zero = hi == np.uint64(0)
        lz += np.where(zero, s, 0)
        x = np.where(zero, x << np.uint64(s), x)
    return np.where(v == np.uint64(0), 64, lz)


def _hll_registers(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """Sparse (register, max-rho) rows of one HLL update over hashes
    ``h`` — THE register extraction both the global and the grouped
    sketch must share so their estimators stay bit-identical."""
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rho = np.minimum(_clz64(h << np.uint64(p)) + 1, 64 - p + 1)
    regs = np.zeros(m, dtype=np.int64)
    np.maximum.at(regs, idx, rho)
    nz = np.flatnonzero(regs)
    return nz, regs[nz]


def _hll_estimate(regs: np.ndarray, m: int) -> int:
    """Flajolet bias-corrected estimate + small-range linear counting
    over a dense register vector (shared by hll_vocab and
    lang_hll_vocab — one estimator, never two drifting copies)."""
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return int(round(est))


def hll_vocab(sf_dir: str, p: int = _HLL_P) -> ray.data.Dataset:
    """One row (vocab_estimate): HyperLogLog distinct-token estimate
    (Flajolet et al. 2007, with the small-range linear-counting
    correction).  The sketch shape for 100 TB: each block reduces to at
    most 2**p (register, max-rho) rows, registers merge by MAX in one
    tiny groupby, and the driver folds 2**p rows — corpus tokens never
    shuffle at all (vs :func:`vocab_size`'s distinct-token exchange).
    Deterministic (SipHash token hashes), but not SQL-expressible —
    its hard check is the exact :func:`vocab_size` row plus the
    relative-error pytest bound."""
    from ray.data.aggregate import Max

    from .common import collect_small

    m = 1 << p

    def registers(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        h = token_hashes(
            pc.list_flatten(words).to_numpy(zero_copy_only=False)
        )
        if h.size == 0:
            return pa.table({"reg": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        nz, rho_nz = _hll_registers(h, p)
        return pa.table({"reg": pa.array(nz, pa.int64()),
                         "rho": pa.array(rho_nz, pa.int64())})

    merged = collect_small(
        read(sf_dir, "documents", columns=["text"])
        .map_batches(registers, batch_format="pyarrow")
        .groupby("reg")
        .aggregate(Max("rho", alias_name="rho")),
        pa.schema([("reg", pa.int64()), ("rho", pa.int64())]),
    )
    regs = np.zeros(m, dtype=np.int64)
    regs[merged["reg"].to_numpy(zero_copy_only=False)] = (
        merged["rho"].to_numpy(zero_copy_only=False)
    )
    return ray.data.from_arrow(pa.table(
        {"vocab_estimate": pa.array([_hll_estimate(regs, m)],
                                    pa.int64())}
    ))


def lang_hll_vocab(sf_dir: str, p: int = _HLL_P) -> ray.data.Dataset:
    """(lang, vocab_estimate): the GROUPED HyperLogLog — one distinct-
    token sketch per language, merged in a single (lang, register)
    groupby.  The per-group form of :func:`hll_vocab`: each block
    reduces to at most langs x 2**p register rows map-side, registers
    merge by MAX, and the driver folds langs x 2**p rows — corpus
    tokens never shuffle (vs :func:`lang_vocab`'s distinct-token
    exchange), which is the sketch's point at 100 TB where the exact
    per-language vocabulary no longer fits an exchange comfortably.
    Approximate by design (same estimator + linear-counting correction
    as hll_vocab): no SQL oracle; its hard checks are the exact
    :func:`lang_vocab` companion rows and the relative-error pytest
    bound (tests/test_text_ops.py).
    """
    from ray.data.aggregate import Max

    from .common import collect_small

    m = 1 << p

    def registers(b: pa.Table) -> pa.Table:
        out_l, out_r, out_h = [], [], []
        langs = b["lang"].to_numpy(zero_copy_only=False)
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(words).to_numpy(
            zero_copy_only=False)
        h = token_hashes(flat)
        tok_lang = langs[parent] if h.size else langs[:0]
        for lg in np.unique(tok_lang):
            nz, rho_nz = _hll_registers(h[tok_lang == lg], p)
            out_l.append(np.full(nz.size, lg, dtype=object))
            out_r.append(nz)
            out_h.append(rho_nz)
        if not out_l:
            return pa.table({"lang": pa.array([], pa.string()),
                             "reg": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        return pa.table({
            "lang": pa.array(np.concatenate(out_l).tolist(), pa.string()),
            "reg": pa.array(np.concatenate(out_r), pa.int64()),
            "rho": pa.array(np.concatenate(out_h), pa.int64()),
        })

    merged = collect_small(
        read(sf_dir, "documents", columns=["lang", "text"])
        .map_batches(registers, batch_format="pyarrow")
        .groupby(["lang", "reg"])
        .aggregate(Max("rho", alias_name="rho")),
        pa.schema([("lang", pa.string()), ("reg", pa.int64()),
                   ("rho", pa.int64())]),
    )
    langs = merged["lang"].to_numpy(zero_copy_only=False)
    reg = merged["reg"].to_numpy(zero_copy_only=False)
    rho = merged["rho"].to_numpy(zero_copy_only=False)
    out_lang, out_est = [], []
    for lg in np.unique(langs):
        sel = langs == lg
        regs = np.zeros(m, dtype=np.int64)
        regs[reg[sel]] = rho[sel]
        out_lang.append(lg)
        out_est.append(_hll_estimate(regs, m))
    return ray.data.from_arrow(pa.table({
        "lang": pa.array(out_lang, pa.string()),
        "vocab_estimate": pa.array(out_est, pa.int64()),
    }))


# --------------------------------------------- token co-occurrence
def cooccurrence_topk(sf_dir: str, window: int = 2, topn: int = 30,
                      parts: int = 64) -> ray.data.Dataset:
    """(w1, w2, n_pairs): the ``topn`` most frequent unordered token
    pairs within a ``window``-token forward window — the co-occurrence
    table a PMI / embedding-training pipeline builds over the corpus.

    Scale shape: window pairs materialize and pre-combine MAP-SIDE
    (``np.unique`` per batch over a joined pair key — the heavy
    n_tokens × window stream never leaves the task), ONE shuffle of
    pair partials keyed by ``hash(pair) % parts``, a vectorized
    per-partition merge (each pair's total lands in exactly one
    partition), then the limit pushdown: per-block local top-n →
    single tiny merge block (top_customers pattern) — no global sort
    of the pair table.  Total order (n_pairs DESC, w1, w2) makes the
    cut deterministic.  Raise ``parts`` with vocabulary size.
    """
    import pandas as pd

    docs = read(sf_dir, "documents", columns=["doc_id", "text"])
    # Pair identity travels as TWO independent 64-bit token-hash mixes
    # (an effectively-128-bit key): int sorting/grouping on the hot
    # n_tokens × window stream instead of building and sorting
    # concatenated strings, with collision probability P²/2¹²⁸ — safe
    # at any corpus scale.  The token STRINGS ride only for the
    # lexicographic (w1, w2) output order and the final result.
    _SEED2 = np.uint64(0xC2B2AE3D27D4EB4F)
    _PAIR_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd mult

    _EMPTY_PART = pa.table({
        "k1": pa.array([], pa.int64()),
        "k2": pa.array([], pa.int64()),
        "w1": pa.array([], pa.string()),
        "w2": pa.array([], pa.string()),
        "n_p": pa.array([], pa.int64()),
        "part": pa.array([], pa.int64()),
    })

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        toks = pc.list_flatten(words).to_numpy(zero_copy_only=False)
        doc_of = pc.list_parent_indices(words).to_numpy(
            zero_copy_only=False
        )
        if toks.size == 0:
            return _EMPTY_PART
        th = pd.util.hash_array(
            np.asarray(toks, dtype=object)
        ).astype(np.uint64)
        th2 = mix64(th ^ _SEED2)
        w1s, w2s, k1s, k2s = [], [], [], []
        with np.errstate(over="ignore"):
            for d in range(1, window + 1):
                if toks.size <= d:
                    break
                same = doc_of[:-d] == doc_of[d:]
                a, c = toks[:-d][same], toks[d:][same]
                ha, hc = th[:-d][same], th[d:][same]
                ha2, hc2 = th2[:-d][same], th2[d:][same]
                le = a <= c
                w1s.append(np.where(le, a, c))
                w2s.append(np.where(le, c, a))
                lo1 = np.where(le, ha, hc)
                hi1 = np.where(le, hc, ha)
                lo2 = np.where(le, ha2, hc2)
                hi2 = np.where(le, hc2, ha2)
                k1s.append(mix64(lo1 * _PAIR_MIX + hi1))
                k2s.append(mix64(lo2 * _PAIR_MIX + hi2))
        if not k1s:
            return _EMPTY_PART
        k1 = np.concatenate(k1s)
        k2 = np.concatenate(k2s)
        kk = np.stack([k1.view(np.int64), k2.view(np.int64)], axis=1)
        uk, first, cnt = np.unique(
            kk, axis=0, return_index=True, return_counts=True
        )
        w1 = np.concatenate(w1s)[first]
        w2 = np.concatenate(w2s)[first]
        return pa.table({
            "k1": pa.array(uk[:, 0], pa.int64()),
            "k2": pa.array(uk[:, 1], pa.int64()),
            "w1": pa.array(w1.astype(str), pa.string()),
            "w2": pa.array(w2.astype(str), pa.string()),
            "n_p": pa.array(cnt.astype(np.int64), pa.int64()),
            "part": pa.array(
                (np.ascontiguousarray(uk[:, 0]).view(np.uint64)
                 % np.uint64(parts)).astype(np.int64)
            ),
        })

    def reduce_part(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "w1": pa.array([], pa.string()),
            "w2": pa.array([], pa.string()),
            "n_pairs": pa.array([], pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        kk = np.stack([
            g["k1"].to_numpy(zero_copy_only=False),
            g["k2"].to_numpy(zero_copy_only=False),
        ], axis=1)
        n_p = g["n_p"].to_numpy(zero_copy_only=False)
        uk, first, inv = np.unique(
            kk, axis=0, return_index=True, return_inverse=True
        )
        n = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(n, inv, n_p)
        take = pa.array(first.astype(np.int64), pa.int64())
        return pa.table({
            "w1": g["w1"].take(take),
            "w2": g["w2"].take(take),
            "n_pairs": pa.array(n, pa.int64()),
        })

    def local_top(b: pa.Table) -> pa.Table:
        if b.num_rows <= topn:
            return b
        n = b["n_pairs"].to_numpy(zero_copy_only=False)
        w1 = b["w1"].to_numpy(zero_copy_only=False).astype(str)
        w2 = b["w2"].to_numpy(zero_copy_only=False).astype(str)
        order = np.lexsort((w2, w1, -n))[:topn]
        return b.take(pa.array(np.sort(order), pa.int64()))

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(reduce_part, batch_format="pyarrow")
        .map_batches(local_top, batch_format="pyarrow")
        .repartition(1)
        .sort(["n_pairs", "w1", "w2"], descending=[True, False, False])
        .limit(topn)
    )


def cooccurrence_topk_oracle_sql(window: int = 2, topn: int = 30) -> str:
    return f"""
WITH w AS (
  SELECT string_split(text, ' ') AS ws FROM documents
),
pos AS (
  SELECT ws, unnest(range(0, len(ws))) AS i FROM w
),
sh AS (
  SELECT ws, i, unnest(range(1, {window + 1})) AS d FROM pos
),
p AS (
  SELECT least(ws[i + 1], ws[i + d + 1]) AS w1,
         greatest(ws[i + 1], ws[i + d + 1]) AS w2
  FROM sh WHERE i + d < len(ws)
)
SELECT w1, w2, count(*) AS n_pairs
FROM p GROUP BY 1, 2
ORDER BY n_pairs DESC, w1, w2
LIMIT {topn}
"""


# --------------------------------------------- distinctive terms (tf/df)
def distinctive_terms(sf_dir: str, k: int = 3,
                      parts: int = 64) -> ray.data.Dataset:
    """(doc_id, term, tf, df, rank): each document's ``k`` most
    DISTINCTIVE terms — highest in-doc frequency, rarest in the corpus
    on ties — the keyword-extraction stage of a corpus pipeline,
    formulated in exact integers (tf DESC, df ASC, term ASC) so the
    DuckDB oracle compares bit-for-bit (a float tf·idf could not).

    Scale shape — NO broadcast anywhere (the vocabulary at corpus
    scale outgrows any driver): per-batch Arrow group-by collapses to
    (doc, term, tf) rows (stopwords dropped map-side), shuffle 1 keys
    by ``hash(term)`` so each partition holds ALL rows of its terms
    and computes df in place, shuffle 2 re-keys by ``hash(doc)`` and
    ranks per doc with one vectorized lexsort per partition.  Both
    shuffles move the (doc, term, tf) table — the minimal exchanges
    this computation admits without a broadcast side.
    """
    import pandas as pd

    docs = read(sf_dir, "documents", columns=["doc_id", "text"])
    stop = pa.array(STOPWORDS, pa.string())

    def tf_partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = pc.list_flatten(words)
        parent = pc.list_parent_indices(words)
        t = pa.table({
            "doc_id": b["doc_id"].take(parent),
            "term": flat,
        }).filter(pc.invert(pc.is_in(flat, value_set=stop)))
        g = pa.TableGroupBy(t, ["doc_id", "term"]).aggregate(
            [([], "count_all")]
        )
        h = pd.util.hash_array(np.asarray(
            g["term"].to_numpy(zero_copy_only=False), dtype=object
        )).astype(np.uint64)
        return pa.table({
            "doc_id": g["doc_id"],
            "term": g["term"],
            "tf": g["count_all"],
            "part": pa.array((h % np.uint64(parts)).astype(np.int64)),
        })

    def attach_df(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
                "part2": pa.array([], pa.int64()),
            })
        term = g["term"].to_numpy(zero_copy_only=False).astype(str)
        ut, inv = np.unique(term, return_inverse=True)
        df = np.bincount(inv, minlength=ut.size).astype(np.int64)[inv]
        did = g["doc_id"].to_numpy(zero_copy_only=False)
        part2 = (mix64(np.ascontiguousarray(did).view(np.uint64))
                 % np.uint64(parts)).astype(np.int64)
        return pa.table({
            "doc_id": g["doc_id"],
            "term": g["term"],
            "tf": pc.cast(g["tf"], pa.int64()),
            "df": pa.array(df, pa.int64()),
            "part2": pa.array(part2, pa.int64()),
        })

    def rank_per_doc(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "df": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        did = g["doc_id"].to_numpy(zero_copy_only=False)
        term = g["term"].to_numpy(zero_copy_only=False).astype(str)
        tf = g["tf"].to_numpy(zero_copy_only=False)
        df = g["df"].to_numpy(zero_copy_only=False)
        order = np.lexsort((term, df, -tf, did))
        d_s = did[order]
        newd = np.concatenate(([True], d_s[1:] != d_s[:-1]))
        starts = np.flatnonzero(newd)
        cnts = np.diff(np.concatenate((starts, [d_s.size])))
        rank = (np.arange(d_s.size, dtype=np.int64)
                - np.repeat(starts, cnts)) + 1
        keep = rank <= k
        t = g.take(pa.array(order[keep], pa.int64()))
        return pa.table({
            "doc_id": t["doc_id"],
            "term": t["term"],
            "tf": t["tf"],
            "df": t["df"],
            "rank": pa.array(rank[keep], pa.int64()),
        })

    return (
        docs.map_batches(tf_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(attach_df, batch_format="pyarrow")
        .groupby("part2")
        .map_groups(rank_per_doc, batch_format="pyarrow")
    )


def distinctive_terms_oracle_sql(k: int = 3) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE NOT list_contains({list(STOPWORDS)}, term)
  GROUP BY 1, 2
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
SELECT doc_id, term, tf, df, rank FROM (
  SELECT t.doc_id, t.term, t.tf, d.df,
         CAST(row_number() OVER (
           PARTITION BY t.doc_id
           ORDER BY t.tf DESC, d.df ASC, t.term ASC
         ) AS BIGINT) AS rank
  FROM tf t JOIN df d USING (term)
) WHERE rank <= {k}
"""


# --------------------------- heavy hitters (exact + Misra-Gries sketch)
_HH_K = 30


def term_counts_topk(sf_dir: str, k: int = _HH_K,
                     parts: int = 64) -> ray.data.Dataset:
    """(term, n): the k most frequent non-stopword tokens by TOTAL
    occurrence count — the exact companion to ``heavy_hitters`` (same
    pairing discipline as vocab_size / hll_vocab).

    Same scale shape as ngram_df_topk: per-block Arrow group-by
    partials (blocks collapse to their distinct terms before any
    exchange), ONE shuffle keyed by a coarse hash of the term string,
    vectorized numpy merge per partition, then per-block top-k + one
    tiny final sort (never more than k x blocks rows).
    """
    stop = pa.array(STOPWORDS, pa.string())

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = pc.list_flatten(words)
        flat = flat.filter(pc.invert(pc.is_in(flat, value_set=stop)))
        g = pa.TableGroupBy(
            pa.table({"term": flat}), ["term"]
        ).aggregate([([], "count_all")])
        h = token_hashes(g["term"].to_numpy(zero_copy_only=False))
        return pa.table({
            "term": g["term"], "n_p": g["count_all"],
            "part": pa.array((h % np.uint64(parts)).astype(np.int64)),
        })

    def reduce_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        t = g["term"].to_numpy(zero_copy_only=False)
        c = g["n_p"].to_numpy(zero_copy_only=False)
        ut, inv = np.unique(t, return_inverse=True)
        s = np.zeros(ut.size, dtype=np.int64)
        np.add.at(s, inv, c)
        return pa.table({"term": pa.array(ut, pa.string()),
                         "n": pa.array(s, pa.int64())})

    def local_top(b: pa.Table) -> pa.Table:
        if b.num_rows <= k:
            return b
        n = b["n"].to_numpy(zero_copy_only=False)
        t = b["term"].to_numpy(zero_copy_only=False)
        order = np.lexsort((t, -n))[:k]
        return b.take(pa.array(np.sort(order), pa.int64()))

    return (
        read(sf_dir, "documents", columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(reduce_part, batch_format="pyarrow")
        .map_batches(local_top, batch_format="pyarrow")
        .repartition(1)
        .sort(["n", "term"], descending=[True, False])
        .limit(k)
        .select_columns(["term", "n"])
    )


def term_counts_topk_oracle_sql(k: int = _HH_K) -> str:
    return f"""
SELECT term, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
WHERE NOT list_contains({list(STOPWORDS)}, term)
GROUP BY term
ORDER BY n DESC, term ASC
LIMIT {k}
"""


def _mg_compress(terms: np.ndarray, counts: np.ndarray,
                 capacity: int) -> tuple[np.ndarray, np.ndarray]:
    """Misra-Gries summary compression: keep the ``capacity`` largest
    counters, decrement the survivors by the (capacity+1)-th count (the
    evicted mass bound).  Preserves the MG guarantee under merging:
    est(t) <= true(t) <= est(t) + sum-of-decrements."""
    if terms.size <= capacity:
        return terms, counts
    order = np.lexsort((terms, -counts))
    cut = counts[order[capacity]]
    keep = order[:capacity]
    dec = np.maximum(counts[keep] - cut, 0)
    nz = dec > 0
    return terms[keep][nz], dec[nz]


def heavy_hitters(sf_dir: str, k: int = _HH_K,
                  capacity: int = 4096) -> ray.data.Dataset:
    """(term, est_count): approximate top-k tokens via a distributed
    MISRA-GRIES sketch — the bounded-state streaming path for the
    frequency question ``term_counts_topk`` answers exactly.

    Why it exists at 100 TB: the exact path shuffles one row per
    distinct (partition, term); a web-scale vocabulary makes that
    exchange corpus-sized.  The sketch never ships more than
    ``capacity`` counters per block: each block's exact local counts
    compress to an MG summary map-side, one tiny gather sums the
    summaries, and one final compression bounds the driver state.
    Guarantee (classic MG merge bound): any term with true count
    > N / (capacity + 1) survives, and
    est <= true <= est + N / (capacity + 1).  Approximate BY DESIGN
    (like hll_vocab) — no SQL oracle; the bit-exact companion is
    ``term_counts_topk`` and the bound is property-tested.
    """
    stop = pa.array(STOPWORDS, pa.string())

    def block_summary(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = pc.list_flatten(words)
        flat = flat.filter(pc.invert(pc.is_in(flat, value_set=stop)))
        t = flat.to_numpy(zero_copy_only=False)
        ut, cnt = np.unique(t, return_counts=True)
        ut, cnt = _mg_compress(ut, cnt.astype(np.int64), capacity)
        return pa.table({"term": pa.array(ut, pa.string()),
                         "est_p": pa.array(cnt, pa.int64())})

    def merge_final(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "est_count": pa.array([], pa.int64())})
        t = g["term"].to_numpy(zero_copy_only=False)
        c = g["est_p"].to_numpy(zero_copy_only=False)
        ut, inv = np.unique(t, return_inverse=True)
        s = np.zeros(ut.size, dtype=np.int64)
        np.add.at(s, inv, c)
        ut, s = _mg_compress(ut, s, capacity)
        order = np.lexsort((ut, -s))[:k]
        return pa.table({"term": pa.array(ut[order], pa.string()),
                         "est_count": pa.array(s[order], pa.int64())})

    # summaries are <= capacity rows per block: the repartition(1)
    # gather moves sketch state, never corpus rows
    return (
        read(sf_dir, "documents", columns=["text"])
        .map_batches(block_summary, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge_final, batch_format="pyarrow")
    )


_CMS_SEEDS = np.array([0x243F6A8885A308D3, 0x13198A2E03707344,
                       0xA4093822299F31D0, 0x082EFA98EC4E6C89],
                      dtype=np.uint64)  # pi digits; one per CMS row


def cms_term_counts(sf_dir: str, width: int = 1 << 14,
                    k: int = _HH_K) -> ray.data.Dataset:
    """(term, est_count): approximate top-k tokens via a COUNT-MIN
    sketch (Cormode & Muthukrishnan 2005) — the mergeable
    fixed-memory counting path, completing the sketch family next to
    Misra-Gries (:func:`heavy_hitters`), HLL, KLL and Bloom.

    Where MG keeps a bounded set of candidate counters (estimates are
    UNDER-estimates), CMS keeps a depth x width counter matrix indexed
    by per-row hashes (estimates are OVER-estimates: est = min over
    rows >= true, with excess ≤ 2N/width in expectation per row).  The
    matrix is a pure commutative monoid, so per-block sparse partials
    merge in ONE (row, idx) groupby whose volume is ≤ depth·width per
    block regardless of corpus size — tokens never shuffle.
    Candidates to query come from the same bounded MG compression the
    heavy_hitters path uses (a CMS cannot enumerate its keys).
    Approximate BY DESIGN — no SQL oracle; the bit-exact companion is
    ``term_counts_topk`` and the one-sided overestimate guarantee plus
    the error bound are property-tested (tests/test_text_ops.py).
    """
    from .common import collect_small

    stop = pa.array(STOPWORDS, pa.string())
    depth = _CMS_SEEDS.size

    def _idx(h: np.ndarray, d: int) -> np.ndarray:
        return (mix64(h ^ _CMS_SEEDS[d]) % np.uint64(width)).astype(
            np.int64)

    def block_partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = pc.list_flatten(words)
        flat = flat.filter(pc.invert(pc.is_in(flat, value_set=stop)))
        t = flat.to_numpy(zero_copy_only=False)
        ut, cnt = np.unique(t, return_counts=True)
        h = token_hashes(ut)
        rows, idxs, ns = [], [], []
        for d in range(depth):
            counters = np.zeros(width, dtype=np.int64)
            np.add.at(counters, _idx(h, d), cnt)
            nz = np.flatnonzero(counters)
            rows.append(np.full(nz.size, d, np.int64))
            idxs.append(nz)
            ns.append(counters[nz])
        # MG candidate summary rides along (row = -1 marker) so ONE
        # pass produces both the sketch and a bounded candidate set.
        ct, cc = _mg_compress(ut, cnt.astype(np.int64), 4096)
        ch = token_hashes(ct).view(np.int64)
        rows.append(np.full(ct.size, -1, np.int64))
        idxs.append(ch)
        ns.append(cc)
        terms = np.concatenate([
            np.full(sum(a.size for a in rows[:-1]), "", dtype=object),
            ct.astype(object)])
        return pa.table({
            "row": pa.array(np.concatenate(rows), pa.int64()),
            "idx": pa.array(np.concatenate(idxs), pa.int64()),
            "n_p": pa.array(np.concatenate(ns), pa.int64()),
            "term": pa.array(terms.tolist(), pa.string()),
        })

    merged = collect_small(
        two_phase_agg(
            read(sf_dir, "documents", columns=["text"])
            .map_batches(block_partial, batch_format="pyarrow"),
            keys=["row", "idx", "term"], sums={"n_p": "n"},
        ),
        pa.schema([("row", pa.int64()), ("idx", pa.int64()),
                   ("term", pa.string()), ("n", pa.int64())]),
    )
    rows = merged["row"].to_numpy(zero_copy_only=False)
    idx = merged["idx"].to_numpy(zero_copy_only=False)
    n = merged["n"].to_numpy(zero_copy_only=False)
    sketch = np.zeros((depth, width), dtype=np.int64)
    sk = rows >= 0
    sketch[rows[sk], idx[sk]] = n[sk]
    cand_t, cand_c = _mg_compress(
        merged["term"].to_numpy(zero_copy_only=False)[~sk],
        n[~sk], 4096)
    del cand_c  # MG counts only bound the candidate set; CMS estimates
    ch = token_hashes(cand_t)
    est = np.full(cand_t.size, np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        est = np.minimum(est, sketch[d, _idx(ch, d)])
    order = np.lexsort((cand_t, -est))[:k]
    return ray.data.from_arrow(pa.table({
        "term": pa.array(cand_t[order], pa.string()),
        "est_count": pa.array(est[order], pa.int64()),
    }))


def source_overlap(sf_dir: str) -> ray.data.Dataset:
    """(source_a, source_b, shared_grams): the cross-source
    contamination matrix — for every pair of sources, how many DISTINCT
    word-3-grams appear in both (same gram vocabulary as the Jaccard
    oracle: per-doc distinct, short docs contribute their whole-token
    join).  The audit that tells you two "independent" providers
    scraped the same underlying pages.

    Scale shape: blocks collapse to distinct (source, gram) pairs
    map-side; the GRAM hash partitions, so all sources holding a gram
    co-locate; each partition builds one per-gram source BITMASK
    (``bitwise_or.at``) and counts each source pair with one vectorized
    AND — grams never pair-expand, and the shuffle moves
    distinct-per-block pairs only.  Source cardinality must fit the
    64-bit mask per partition (asserted); beyond 64 sources, widen to a
    (grams x sources/64) mask matrix.
    """
    parts = 64
    sep = "\x1f"

    def pairs(b: pa.Table) -> pa.Table:
        grams, doc_idx = _doc_grams_str(b)
        src = b["source"].take(pa.array(doc_idx, pa.int64()))
        joined = pc.binary_join_element_wise(src, grams, sep)
        _, idx = np.unique(
            joined.to_numpy(zero_copy_only=False), return_index=True)
        take = pa.array(idx, pa.int64())
        g_u = grams.take(take)
        h = token_hashes(g_u.to_numpy(zero_copy_only=False))
        return pa.table({
            "source": src.take(take),
            "gram": g_u,
            "part": pa.array((h % np.uint64(parts)).astype(np.int64)),
        })

    def count_part(g: pa.Table) -> pa.Table:
        empty = pa.table({"source_a": pa.array([], pa.string()),
                          "source_b": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        joined = pc.binary_join_element_wise(g["source"], g["gram"], sep)
        _, idx = np.unique(
            joined.to_numpy(zero_copy_only=False), return_index=True)
        src = g["source"].to_numpy(zero_copy_only=False)[idx]
        gr = g["gram"].to_numpy(zero_copy_only=False)[idx]
        usrc, sbit = np.unique(src, return_inverse=True)
        assert usrc.size <= 64, "widen the source mask beyond 64 bits"
        ug, ginv = np.unique(gr, return_inverse=True)
        mask = np.zeros(ug.size, dtype=np.uint64)
        np.bitwise_or.at(
            mask, ginv, np.uint64(1) << sbit.astype(np.uint64))
        rows_a, rows_b, rows_n = [], [], []
        for i in range(usrc.size):
            bi = (mask >> np.uint64(i)) & np.uint64(1)
            for j in range(i + 1, usrc.size):
                n = int(np.count_nonzero(
                    bi & (mask >> np.uint64(j))))
                if n:
                    rows_a.append(usrc[i])
                    rows_b.append(usrc[j])
                    rows_n.append(n)
        if not rows_n:
            return empty
        return pa.table({
            "source_a": pa.array(rows_a, pa.string()),
            "source_b": pa.array(rows_b, pa.string()),
            "n": pa.array(rows_n, pa.int64()),
        })

    partials = (
        read(sf_dir, "documents", columns=["source", "text"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(count_part, batch_format="pyarrow")
    )
    return two_phase_agg(partials, ["source_a", "source_b"],
                         sums={"n": "shared_grams"})


def source_overlap_oracle_sql() -> str:
    from .dedup import JACCARD_CTES

    return f"""
WITH {JACCARD_CTES},
srcg AS (
  SELECT DISTINCT d.source, gg.g AS gram
  FROM (SELECT doc_id, unnest(gs) AS g FROM grams) gg
  JOIN documents d ON gg.doc_id = d.doc_id
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS shared_grams
FROM srcg a JOIN srcg b ON a.gram = b.gram AND a.source < b.source
GROUP BY 1, 2
"""


# --------------------------------- duplicated-n-gram coverage per doc
def duplicate_ngram_coverage(sf_dir: str,
                             parts: int = 64) -> ray.data.Dataset:
    """Per-document duplicated-3-gram coverage: the fraction of a doc's
    DISTINCT word-3-grams that occur in at least one OTHER document —
    the per-doc "how boilerplate is this" metric behind
    substring-dedup policies (cf. dedup training-data literature: docs
    whose n-grams are mostly corpus-duplicated are pruned first).

    Two exchanges, both shrinking: (1) per-doc distinct (doc, gram)
    rows hash-partition by GRAM, so a gram's full posting list is
    partition-local — document frequency and each row's dup flag are
    computed there with one ``np.unique`` (no join); the partition
    then collapses to per-doc PARTIAL counts before (2) a doc-keyed
    ``hash_keyed_agg`` sums the partials.  No stage ever holds more
    than (distinct grams in one hash partition); the gram strings ride
    the first shuffle once (the exact-df requirement — a fingerprinted
    variant halves the shuffle width at 100 TB at the cost of hash-
    collision df error).
    """
    from .common import hash_keyed_agg

    def partial(b: pa.Table) -> pa.Table:
        grams, drow = _doc_grams_str(b)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)[drow]
        h = token_hashes(grams.to_numpy(zero_copy_only=False))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "gram": grams,
            "part": pa.array((h % np.uint64(parts)).astype(np.int64)),
        })

    def flag_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "n_grams_x": pa.array([], pa.int64()),
                "n_dup_x": pa.array([], pa.int64()),
            })
        gr = g["gram"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        # rows are per-doc distinct by construction, so the posting
        # list length IS the document frequency of the gram
        _, ginv, df = np.unique(gr, return_inverse=True,
                                return_counts=True)
        dup = (df[ginv] >= 2).astype(np.int64)
        uid, dinv = np.unique(ids, return_inverse=True)
        n = np.zeros(uid.size, dtype=np.int64)
        np.add.at(n, dinv, 1)
        d = np.zeros(uid.size, dtype=np.int64)
        np.add.at(d, dinv, dup)
        return pa.table({
            "doc_id": pa.array(uid, pa.int64()),
            "n_grams_x": pa.array(n, pa.int64()),
            "n_dup_x": pa.array(d, pa.int64()),
        })

    agg = hash_keyed_agg(
        read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(flag_part, batch_format="pyarrow"),
        "doc_id",
        sums={"n_grams_x": "n_grams", "n_dup_x": "n_dup"},
        parts=parts,
    )

    def finalize(b: pa.Table) -> pa.Table:
        n = b["n_grams"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        d = b["n_dup"].to_numpy(zero_copy_only=False).astype(np.float64)
        # single IEEE division of exact integers — bit-reproducible in
        # SQL as the same integer-to-double division
        return pa.table({
            "doc_id": b["doc_id"],
            "n_grams": b["n_grams"],
            "n_dup": b["n_dup"],
            "dup_frac": pa.array(d / n, pa.float64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def duplicate_ngram_coverage_oracle_sql() -> str:
    from .dedup import JACCARD_CTES

    return f"""
WITH {JACCARD_CTES},
dg AS (SELECT doc_id, unnest(gs) AS g FROM grams),
df AS (SELECT g, count(*) AS df FROM dg GROUP BY g)
SELECT dg.doc_id,
       count(*) AS n_grams,
       CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup,
       CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS dup_frac
FROM dg JOIN df USING (g)
GROUP BY dg.doc_id
"""


# ----------------------------------------------- keyword search (top-k)
_KWS_TERMS = ("data", "model", "system", "search", "query")
_KWS_K = 20
_KWS_SCALE = 1_000_000


def keyword_search(sf_dir: str, terms: tuple[str, ...] = _KWS_TERMS,
                   k: int = _KWS_K) -> ray.data.Dataset:
    """Integer-exact keyword retrieval: top-k documents for a bag of
    query terms, scored tf x rarity (the BM25 shape with the floats
    replaced by exact integers so the oracle compares bit-for-bit).

    score(doc) = sum over query terms t of
                 tf(t, doc) * (SCALE // (df(t) + 1))

    Pass 1 streams once over the corpus computing df for the QUERY
    TERMS ONLY (a |terms|-row aggregate — no vocabulary shuffle).
    Pass 2 broadcasts the |terms| weights, scores every doc with one
    vectorized is_in + np.add.at per block, keeps a per-block top-k,
    and merges k x blocks rows.  At 100 TB both passes stream; the
    only materialized state is the |terms|-row weight table.
    """
    qterms = np.asarray(sorted(set(terms)), dtype=object)

    def df_partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.values.to_numpy(zero_copy_only=False)
        offs = words.offsets.to_numpy(zero_copy_only=False).astype(
            np.int64)
        doc_of = np.repeat(np.arange(offs.size - 1, dtype=np.int64),
                           np.diff(offs))
        # docs-containing-term: dedup (doc, term-index) hits
        ti = np.searchsorted(qterms, flat)
        ti[ti == qterms.size] = 0
        hit = qterms[ti] == flat
        cells = np.unique(doc_of[hit] * qterms.size
                          + ti[hit].astype(np.int64))
        tidx, cnt = np.unique(cells % qterms.size, return_counts=True)
        d = np.zeros(qterms.size, dtype=np.int64)
        d[tidx] = cnt
        return pa.table({
            "ti": pa.array(np.arange(qterms.size), pa.int64()),
            "df_p": pa.array(d, pa.int64()),
        })

    docs = read(sf_dir, "documents", columns=["doc_id", "text"])
    dfs = two_phase_agg(
        docs.map_batches(df_partial, batch_format="pyarrow"),
        ["ti"], sums={"df_p": "df"},
    )
    from .common import collect_small

    dft = collect_small(dfs, pa.schema([("ti", pa.int64()),
                                        ("df", pa.int64())]))
    w = np.zeros(qterms.size, dtype=np.int64)
    w[dft["ti"].to_numpy(zero_copy_only=False)] = (
        _KWS_SCALE // (dft["df"].to_numpy(zero_copy_only=False) + 1)
    )

    def score_topk(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.values.to_numpy(zero_copy_only=False)
        offs = words.offsets.to_numpy(zero_copy_only=False).astype(
            np.int64)
        doc_of = np.repeat(np.arange(offs.size - 1, dtype=np.int64),
                           np.diff(offs))
        ti = np.searchsorted(qterms, flat)
        ti[ti == qterms.size] = 0
        hit = qterms[ti] == flat
        s = np.zeros(offs.size - 1, dtype=np.int64)
        np.add.at(s, doc_of[hit], w[ti[hit]])
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        m = s > 0
        ids, s = ids[m], s[m]
        if ids.size > k:
            top = np.lexsort((ids, -s))[:k]
            ids, s = ids[top], s[top]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "score": pa.array(s, pa.int64()),
        })

    return (
        docs.map_batches(score_topk, batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
    )


def keyword_search_oracle_sql(terms: tuple[str, ...] = _KWS_TERMS,
                              k: int = _KWS_K) -> str:
    tl = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return f"""
WITH q AS (SELECT unnest([{tl}]) AS term),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN (SELECT term FROM q) GROUP BY 1, 2
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
sc AS (
  SELECT tf.doc_id,
         sum(tf.tf * ({_KWS_SCALE} // (df.df + 1))) AS score
  FROM tf JOIN df USING (term) GROUP BY 1
)
SELECT doc_id, CAST(score AS BIGINT) AS score FROM sc
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


# ------------------------------------------- fixed-window chunk dedup
_CHUNK_W = 64


def chunk_dedup_ratio(sf_dir: str, width: int = _CHUNK_W,
                      parts: int = 64) -> ray.data.Dataset:
    """(source, n_chunks, n_distinct, dup_per_million): per-source
    duplicated-content mass under FIXED-WIDTH chunking — the CAS /
    chunk-store dedup estimator (how much of each source's bytes a
    content-addressed store would collapse).  Complements
    duplicate_ngram_coverage: windows instead of shingles, so the
    metric matches what a block-level deduplicating store would see.

    Scale shape (the lang_vocab layout): total chunk counts are pure
    map-side partials (ceil(len/width) per doc — no strings move for
    the denominator); distinct counting collapses each block to its
    distinct (source, chunk) pairs FIRST, hash-partitions on the
    composite key so each pair lands in exactly one partition, and
    emits tiny (source, n) partials.  Chunk slicing is one
    ``utf8_slice_codeunits`` per window index over the whole column —
    ≤ max_len/width vectorized passes, no row loop.  Exactness:
    distinctness is decided on the chunk STRING inside its partition
    (hashes only route), so there is no collision risk.
    """
    sep = "\x1f"  # control char, absent from the corpus text

    def total_chunks(b: pa.Table) -> pa.Table:
        n = pc.utf8_length(b["text"])
        return pa.table({
            "source": b["source"],
            "n_c": pc.cast(
                pc.divide(pc.add(n, width - 1), width), pa.int64()),
        })

    totals = two_phase_agg(
        read(sf_dir, "documents", columns=["source", "text"])
        .map_batches(total_chunks, batch_format="pyarrow"),
        ["source"], sums={"n_c": "n_chunks"},
    )

    def distinct_pairs(b: pa.Table) -> pa.Table:
        text = b["text"].combine_chunks() if isinstance(
            b["text"], pa.ChunkedArray) else b["text"]
        src = b["source"].combine_chunks() if isinstance(
            b["source"], pa.ChunkedArray) else b["source"]
        lens = pc.utf8_length(text).to_numpy(zero_copy_only=False)
        max_len = int(lens.max()) if lens.size else 0
        chunk_parts, src_parts = [], []
        for start in range(0, max_len, width):
            sel = lens > start
            if not sel.any():
                break
            mask = pa.array(sel)
            piece = pc.utf8_slice_codeunits(
                text.filter(mask), start, start + width)
            chunk_parts.append(piece)
            src_parts.append(src.filter(mask))
        if not chunk_parts:
            return pa.table({
                "source": pa.array([], pa.string()),
                "chunk": pa.array([], pa.string()),
                "part": pa.array([], pa.int64()),
            })
        chunks = pa.concat_arrays(
            [c.cast(pa.string()) for c in chunk_parts])
        srcs = pa.concat_arrays([s.cast(pa.string()) for s in src_parts])
        joined = pc.binary_join_element_wise(srcs, chunks, sep)
        jnp = joined.to_numpy(zero_copy_only=False)
        _, idx = np.unique(jnp, return_index=True)
        take = pa.array(idx, pa.int64())
        h = token_hashes(jnp[idx])
        return pa.table({
            "source": srcs.take(take),
            "chunk": chunks.take(take),
            "part": pa.array((h % np.uint64(parts)).astype(np.int64)),
        })

    def count_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        src = g["source"].to_numpy(zero_copy_only=False)
        ch = g["chunk"].to_numpy(zero_copy_only=False)
        pair = np.char.add(np.char.add(src.astype(str), sep),
                           ch.astype(str))
        _, idx = np.unique(pair, return_index=True)
        usrc, counts = np.unique(src[idx], return_counts=True)
        return pa.table({
            "source": pa.array(usrc, pa.string()),
            "n": pa.array(counts, pa.int64()),
        })

    distinct = two_phase_agg(
        read(sf_dir, "documents", columns=["source", "text"])
        .map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(count_part, batch_format="pyarrow"),
        ["source"], sums={"n": "n_distinct"},
    )

    from .common import copartition_join

    joined = copartition_join(
        totals, distinct, on="source", parts=2,
        left_schema=pa.schema([("source", pa.string()),
                               ("n_chunks", pa.int64())]),
        right_schema=pa.schema([("source", pa.string()),
                                ("n_distinct", pa.int64())]),
    )

    def finish(b: pa.Table) -> pa.Table:
        nc = b["n_chunks"].to_numpy(zero_copy_only=False)
        nd = b["n_distinct"].to_numpy(zero_copy_only=False)
        return pa.table({
            "source": b["source"],
            "n_chunks": b["n_chunks"],
            "n_distinct": b["n_distinct"],
            "dup_per_million": pa.array(
                (nc - nd) * 1_000_000 // nc, pa.int64()),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def chunk_dedup_ratio_oracle_sql(width: int = _CHUNK_W) -> str:
    return f"""
WITH c AS (
  SELECT source, substr(text, s, {width}) AS chunk
  FROM documents, unnest(generate_series(1, len(text), {width})) AS t(s)
)
SELECT source,
       count(*) AS n_chunks,
       count(DISTINCT chunk) AS n_distinct,
       (count(*) - count(DISTINCT chunk)) * 1000000 // count(*)
         AS dup_per_million
FROM c GROUP BY source
"""


# ------------------------------------------- bigram association (PMI)
_BIGRAM_K = 30
_BIGRAM_MIN = 3


def bigram_assoc(sf_dir: str, k: int = _BIGRAM_K,
                 min_count: int = _BIGRAM_MIN,
                 parts: int = 64,
                 join_partitions: int = 8,
                 vocab_broadcast_budget: int = 5_000_000
                 ) -> ray.data.Dataset:
    """(w1, w2, n_xy, score): the k adjacent-token bigrams most
    associated beyond chance — collocation mining, the PMI family.
    ``score = (n_xy·10⁶ // n_x) · 10⁶ // n_y`` is a monotone integer
    transform of n_xy/(n_x·n_y) (the corpus-constant factors of PMI
    drop out of the ranking), so both engines rank and emit identical
    integers — no float log in sight.  n_xy ≤ min(n_x, n_y) bounds the
    first quotient by 10⁶ and the score by 10¹²: int64-safe.

    Scale shape: bigram and unigram counts each ride the exact
    heavy-hitter layout (per-block Arrow group-by partials, ONE
    hash-partitioned exchange, vectorized merge); the ``min_count``
    support filter runs BEFORE the count-attach steps, so only
    surviving bigrams move.  Count attach is budget-gated: a unigram
    table under ``vocab_broadcast_budget`` distinct terms broadcasts
    once (``ray.put`` + per-block ``searchsorted``, zero extra
    exchanges); a web-scale vocabulary switches to two co-partitioned
    hash joins instead.  Oracle-identical both sides of the gate (the
    sf0.001 oracle suite pins the join path with budget 0).
    """
    def bigram_partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        parent = pc.list_parent_indices(words)
        flat = pc.list_flatten(words)
        pnp = parent.to_numpy(zero_copy_only=False)
        n = len(flat)
        if n < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n_p": pa.array([], pa.int64()),
                             "part": pa.array([], pa.int64())})
        # adjacent within the same document only
        left_sel = np.flatnonzero(pnp[1:] == pnp[:-1])
        w1 = flat.take(pa.array(left_sel, pa.int64()))
        w2 = flat.take(pa.array(left_sel + 1, pa.int64()))
        g = pa.TableGroupBy(
            pa.table({"w1": w1, "w2": w2}), ["w1", "w2"]
        ).aggregate([([], "count_all")])
        h = token_hashes(
            pc.binary_join_element_wise(
                g["w1"], g["w2"], " ").to_numpy(zero_copy_only=False))
        return pa.table({
            "w1": g["w1"], "w2": g["w2"], "n_p": g["count_all"],
            "part": pa.array((h % np.uint64(parts)).astype(np.int64)),
        })

    def bigram_reduce(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n_xy": pa.array([], pa.int64())})
        t = pa.TableGroupBy(g.select(["w1", "w2", "n_p"]),
                            ["w1", "w2"]).aggregate([("n_p", "sum")])
        t = t.filter(pc.greater_equal(t["n_p_sum"], min_count))
        return pa.table({"w1": t["w1"], "w2": t["w2"],
                         "n_xy": t["n_p_sum"]})

    bigrams = (
        read(sf_dir, "documents", columns=["text"])
        .map_batches(bigram_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(bigram_reduce, batch_format="pyarrow")
    )

    def unigram_partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = pc.list_flatten(words)
        g = pa.TableGroupBy(pa.table({"term": flat}),
                            ["term"]).aggregate([([], "count_all")])
        h = token_hashes(g["term"].to_numpy(zero_copy_only=False))
        return pa.table({
            "term": g["term"], "n_p": g["count_all"],
            "part": pa.array((h % np.uint64(parts)).astype(np.int64)),
        })

    def unigram_reduce(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "n_t": pa.array([], pa.int64())})
        t = pa.TableGroupBy(g.select(["term", "n_p"]),
                            ["term"]).aggregate([("n_p", "sum")])
        return pa.table({"term": t["term"], "n_t": t["n_p_sum"]})

    unigrams = (
        read(sf_dir, "documents", columns=["text"])
        .map_batches(unigram_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(unigram_reduce, batch_format="pyarrow")
    )

    from .common import collect_small, copartition_join

    bg_schema = pa.schema([("w1", pa.string()), ("w2", pa.string()),
                           ("n_xy", pa.int64())])
    uni_schema = pa.schema([("term", pa.string()), ("n_t", pa.int64())])
    unigrams = unigrams.materialize()      # consumed twice either way

    if unigrams.count() <= vocab_broadcast_budget:
        import ray as _ray

        from .common import deref

        ut = collect_small(unigrams, uni_schema)
        terms = ut["term"].to_numpy(zero_copy_only=False)
        cnts = ut["n_t"].to_numpy(zero_copy_only=False)
        order = np.argsort(terms)
        ref = _ray.put((terms[order], cnts[order].astype(np.int64)))

        def attach(b: pa.Table, lut=None) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "n_xy": pa.array([], pa.int64()),
                    "n_x": pa.array([], pa.int64()),
                    "n_y": pa.array([], pa.int64())})
            t, c = deref(lut)
            w1 = b["w1"].to_numpy(zero_copy_only=False)
            w2 = b["w2"].to_numpy(zero_copy_only=False)
            # every surviving bigram term IS in the unigram vocabulary
            i1 = np.searchsorted(t, w1)
            i2 = np.searchsorted(t, w2)
            return pa.table({
                "w1": b["w1"], "w2": b["w2"], "n_xy": b["n_xy"],
                "n_x": pa.array(c[i1], pa.int64()),
                "n_y": pa.array(c[i2], pa.int64()),
            })

        j2 = bigrams.map_batches(attach, batch_format="pyarrow",
                                 fn_kwargs={"lut": ref})
    else:
        j1 = copartition_join(
            bigrams, unigrams, on="w1", right_on="term",
            parts=join_partitions, left_schema=bg_schema,
            right_schema=uni_schema,
        ).rename_columns({"n_t": "n_x"})
        j1_schema = pa.schema([
            ("w1", pa.string()), ("w2", pa.string()),
            ("n_xy", pa.int64()), ("n_x", pa.int64())])
        j2 = copartition_join(
            j1, unigrams, on="w2", right_on="term",
            parts=join_partitions, left_schema=j1_schema,
            right_schema=uni_schema,
        ).rename_columns({"n_t": "n_y"})

    def score_topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n_xy": pa.array([], pa.int64()),
                             "score": pa.array([], pa.int64())})
        nxy = b["n_xy"].to_numpy(zero_copy_only=False)
        nx = b["n_x"].to_numpy(zero_copy_only=False)
        ny = b["n_y"].to_numpy(zero_copy_only=False)
        score = (nxy * 1_000_000 // nx) * 1_000_000 // ny
        t = pa.table({"w1": b["w1"], "w2": b["w2"],
                      "n_xy": pa.array(nxy, pa.int64()),
                      "score": pa.array(score, pa.int64())})
        if t.num_rows <= k:
            return t
        w1 = t["w1"].to_numpy(zero_copy_only=False)
        w2 = t["w2"].to_numpy(zero_copy_only=False)
        idx = np.lexsort((w2, w1, -score))[:k]
        return t.take(pa.array(np.sort(idx), pa.int64()))

    return (
        j2.map_batches(score_topk, batch_format="pyarrow")
        .sort(["score", "w1", "w2"], descending=[True, False, False])
        .limit(k)
    )


def bigram_assoc_oracle_sql(k: int = _BIGRAM_K,
                            min_count: int = _BIGRAM_MIN) -> str:
    return f"""
WITH toks AS (SELECT string_split(text, ' ') AS l FROM documents),
bg AS (
  SELECT unnest(list_transform(generate_series(1, len(l) - 1),
                i -> [l[i], l[i + 1]])) AS p
  FROM toks WHERE len(l) >= 2
),
bc AS (
  SELECT p[1] AS w1, p[2] AS w2, count(*) AS n_xy
  FROM bg GROUP BY 1, 2 HAVING count(*) >= {min_count}
),
uc AS (
  SELECT t AS term, count(*) AS n_t
  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
  GROUP BY t
)
SELECT w1, w2, n_xy,
       (n_xy * 1000000 // x.n_t) * 1000000 // y.n_t AS score
FROM bc JOIN uc x ON bc.w1 = x.term JOIN uc y ON bc.w2 = y.term
ORDER BY score DESC, w1, w2 LIMIT {k}
"""


# ------------------------------------------- KLL-style quantile sketch
_KLL_CAP = 192          # per-level compactor capacity


def _kll_build(vals: np.ndarray, cap: int = _KLL_CAP
               ) -> list[np.ndarray]:
    """Build a deterministic KLL-style sketch of int64 values.

    Levels hold sorted arrays; level L's items each stand for 2^L
    inputs.  A level over capacity SORTS and keeps alternate elements
    (offset alternates by compaction parity — the deterministic stand-
    in for KLL's coin flip, chosen so repeated runs and resumes agree
    bit for bit), promoting the survivors one level up.  State is
    O(cap · log(n/cap)) regardless of input size.
    """
    levels: list[np.ndarray] = [np.sort(vals.astype(np.int64))]
    parity = 0
    lv = 0
    while lv < len(levels):
        if levels[lv].size > cap:
            arr = np.sort(levels[lv])
            keep = arr[parity::2]
            parity ^= 1
            levels[lv] = np.empty(0, np.int64)
            if lv + 1 == len(levels):
                levels.append(np.empty(0, np.int64))
            levels[lv + 1] = np.sort(
                np.concatenate([levels[lv + 1], keep]))
        lv += 1
    return levels


def _kll_merge(a: list[np.ndarray], b: list[np.ndarray],
               cap: int = _KLL_CAP) -> list[np.ndarray]:
    """Merge two sketches level-wise, then re-compact (mergeable —
    the property that makes the sketch distributable)."""
    out: list[np.ndarray] = []
    for lv in range(max(len(a), len(b))):
        xs = a[lv] if lv < len(a) else np.empty(0, np.int64)
        ys = b[lv] if lv < len(b) else np.empty(0, np.int64)
        out.append(np.sort(np.concatenate([xs, ys])))
    parity = 0
    lv = 0
    while lv < len(out):
        if out[lv].size > cap:
            arr = out[lv]
            keep = arr[parity::2]
            parity ^= 1
            out[lv] = np.empty(0, np.int64)
            if lv + 1 == len(out):
                out.append(np.empty(0, np.int64))
            out[lv + 1] = np.sort(np.concatenate([out[lv + 1], keep]))
        lv += 1
    return out


def _kll_quantile(levels: list[np.ndarray], pct: int) -> int:
    """ceil(pct/100 · N)-th smallest, estimated from weighted items."""
    vals = np.concatenate([l for l in levels if l.size]
                          ) if any(l.size for l in levels) else (
        np.empty(0, np.int64))
    if vals.size == 0:
        return 0
    wts = np.concatenate([
        np.full(l.size, 1 << lv, np.int64)
        for lv, l in enumerate(levels) if l.size
    ])
    order = np.argsort(vals, kind="stable")
    vals, wts = vals[order], wts[order]
    cum = np.cumsum(wts)
    n = int(cum[-1])
    target = -(-pct * n // 100)
    return int(vals[np.searchsorted(cum, target)])


def _kll_to_table(levels: list[np.ndarray]) -> pa.Table:
    lv = np.concatenate([
        np.full(l.size, i, np.int64) for i, l in enumerate(levels)
    ]) if levels else np.empty(0, np.int64)
    v = (np.concatenate([l for l in levels])
         if levels else np.empty(0, np.int64))
    return pa.table({"lv": pa.array(lv, pa.int64()),
                     "v": pa.array(v, pa.int64())})


def _kll_from_table(t: pa.Table) -> list[np.ndarray]:
    lv = t["lv"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    if lv.size == 0:
        return [np.empty(0, np.int64)]
    out = []
    for i in range(int(lv.max()) + 1):
        out.append(np.sort(v[lv == i]).astype(np.int64))
    return out


def kll_token_quantiles(sf_dir: str,
                        cap: int = _KLL_CAP) -> ray.data.Dataset:
    """(pct, value): token-count percentiles from a BOUNDED-STATE
    mergeable quantile sketch — the streaming path for the question
    ``token_quantiles`` answers exactly.

    Why it exists at 100 TB: the exact path's state is the distinct-
    value histogram — bounded for token counts but corpus-sized for a
    continuous domain; the sketch never holds more than
    O(cap·log(n/cap)) items per block no matter the domain.  Each
    block builds a sketch map-side, sketches gather (they are tiny —
    the repartition moves sketch state, never corpus rows) and merge
    level-wise.  Approximate BY DESIGN, so no SQL oracle: the exact
    companion is ``token_quantiles`` and the KLL rank-error bound is
    property-tested (tests/test_new_ops_edge_cases.py).
    """
    def block_sketch(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        n_tok = pc.list_value_length(words).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return _kll_to_table(_kll_build(n_tok, cap))

    def merge_final(g: pa.Table) -> pa.Table:
        levels = _kll_from_table(g)
        # re-compaction inside merge keeps the invariant; the single
        # gathered table is itself a valid (possibly over-capacity)
        # sketch, so one more build pass normalizes it
        levels = _kll_merge(levels, [np.empty(0, np.int64)], cap)
        out_p, out_v = [], []
        for pct in _QUANTILE_PCTS:
            out_p.append(pct)
            out_v.append(_kll_quantile(levels, pct))
        return pa.table({"pct": pa.array(out_p, pa.int64()),
                         "value": pa.array(out_v, pa.int64())})

    return (
        read(sf_dir, "documents", columns=["text"])
        .map_batches(block_sketch, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge_final, batch_format="pyarrow")
    )


def lang_kll_quantiles(sf_dir: str,
                       cap: int = _KLL_CAP) -> ray.data.Dataset:
    """(lang, pct, value): per-language token-count percentiles from
    one BOUNDED-STATE KLL sketch per language — the grouped form of
    :func:`kll_token_quantiles`, paired with the exact
    :func:`lang_token_quantiles` the same way the grouped HLL pairs
    with lang_vocab.

    Scale shape: each block builds one sketch per language it sees
    (rows are (lang, level, value) — O(langs · cap·log) per block, a
    constant w.r.t. corpus size), sketches co-locate in ONE lang-keyed
    groupby, and each group's merge is a single re-compaction.  The
    exchange moves sketch state only; with per-language sketches a hot
    language compacts harder, it never grows state.  Approximate BY
    DESIGN — no SQL oracle; hard checks are the exact companion plus
    the per-language rank-error pytest."""
    def block_sketch(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        n_tok = pc.list_value_length(words).to_numpy(
            zero_copy_only=False).astype(np.int64)
        langs = b["lang"].to_numpy(zero_copy_only=False)
        parts = []
        for lg in np.unique(langs):
            t = _kll_to_table(_kll_build(n_tok[langs == lg], cap))
            parts.append(t.append_column(
                "lang", pa.array([lg] * t.num_rows, pa.string())))
        if not parts:
            return pa.table({"lv": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "lang": pa.array([], pa.string())})
        return pa.concat_tables(parts)

    out_schema = pa.schema([("lang", pa.string()), ("pct", pa.int64()),
                            ("value", pa.int64())])

    def merge_lang(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        levels = _kll_from_table(g.select(["lv", "v"]))
        levels = _kll_merge(levels, [np.empty(0, np.int64)], cap)
        lg = g["lang"][0].as_py()
        out_p = list(_QUANTILE_PCTS)
        return pa.table({
            "lang": pa.array([lg] * len(out_p), pa.string()),
            "pct": pa.array(out_p, pa.int64()),
            "value": pa.array(
                [_kll_quantile(levels, p) for p in out_p], pa.int64()),
        })

    return (
        read(sf_dir, "documents", columns=["lang", "text"])
        .map_batches(block_sketch, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(merge_lang, batch_format="pyarrow")
    )


# ------------------------------------------- grouped heavy hitters
_LANG_TERM_K = 5


def lang_term_topk(sf_dir: str, k: int = _LANG_TERM_K,
                   parts: int = 64) -> ray.data.Dataset:
    """(lang, term, n, rank): each language's k most frequent
    non-stopword tokens — GROUPED heavy hitters, the per-stratum
    variant of ``term_counts_topk`` (vocabulary reports per language /
    domain / source are the training-mix debugging staple).

    Scale shape: per-block Arrow group-by partials on the composite
    (lang, term) key, ONE exchange routed by the composite hash (both
    columns hash, so one language's vocabulary spreads over many
    partitions — a hot language cannot pin a worker), vectorized
    per-partition merge, per-partition per-lang top-k survivors, and a
    final per-lang merge over ≤ k·parts rows.  Ranks are assigned at
    the final merge (count DESC, term ASC — deterministic both sides).
    """
    stop = pa.array(STOPWORDS, pa.string())
    sep = "\x1f"

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        parent = pc.list_parent_indices(words)
        flat = pc.list_flatten(words)
        keep = pc.invert(pc.is_in(flat, value_set=stop))
        flat = flat.filter(keep)
        langs = b["lang"].take(parent).filter(keep)
        g = pa.TableGroupBy(
            pa.table({"lang": langs, "term": flat}), ["lang", "term"]
        ).aggregate([([], "count_all")])
        h = token_hashes(
            pc.binary_join_element_wise(
                g["lang"], g["term"], sep
            ).to_numpy(zero_copy_only=False))
        return pa.table({
            "lang": g["lang"], "term": g["term"],
            "n_p": g["count_all"],
            "part": pa.array((h % np.uint64(parts)).astype(np.int64)),
        })

    def reduce_part(g: pa.Table) -> pa.Table:
        empty = pa.table({"lang": pa.array([], pa.string()),
                          "term": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        t = pa.TableGroupBy(g.select(["lang", "term", "n_p"]),
                            ["lang", "term"]).aggregate([("n_p", "sum")])
        lang = t["lang"].to_numpy(zero_copy_only=False)
        term = t["term"].to_numpy(zero_copy_only=False)
        n = t["n_p_sum"].to_numpy(zero_copy_only=False)
        # per-lang top-k survivors: sort (lang, -n, term), keep rank<k
        order = np.lexsort((term, -n, lang))
        lang, term, n = lang[order], term[order], n[order]
        first = np.ones(lang.size, dtype=bool)
        first[1:] = lang[1:] != lang[:-1]
        gid = np.cumsum(first) - 1
        starts = np.flatnonzero(first)
        rank = np.arange(lang.size) - starts[gid]
        keep = rank < k
        return pa.table({
            "lang": pa.array(lang[keep], pa.string()),
            "term": pa.array(term[keep], pa.string()),
            "n": pa.array(n[keep], pa.int64()),
        })

    def final_merge(b: pa.Table) -> pa.Table:
        empty = pa.table({"lang": pa.array([], pa.string()),
                          "term": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "rank": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        lang = b["lang"].to_numpy(zero_copy_only=False)
        term = b["term"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((term, -n, lang))
        lang, term, n = lang[order], term[order], n[order]
        first = np.ones(lang.size, dtype=bool)
        first[1:] = lang[1:] != lang[:-1]
        gid = np.cumsum(first) - 1
        starts = np.flatnonzero(first)
        rank = np.arange(lang.size) - starts[gid]
        keep = rank < k
        return pa.table({
            "lang": pa.array(lang[keep], pa.string()),
            "term": pa.array(term[keep], pa.string()),
            "n": pa.array(n[keep], pa.int64()),
            "rank": pa.array(rank[keep] + 1, pa.int64()),
        })

    return (
        read(sf_dir, "documents", columns=["lang", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(reduce_part, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final_merge, batch_format="pyarrow")
    )


def lang_term_topk_oracle_sql(k: int = _LANG_TERM_K) -> str:
    return f"""
WITH t AS (
  SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
),
c AS (
  SELECT lang, term, count(*) AS n FROM t
  WHERE NOT list_contains({list(STOPWORDS)}, term)
  GROUP BY lang, term
),
r AS (
  SELECT lang, term, n,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n DESC, term ASC) AS rank
  FROM c
)
SELECT lang, term, n, rank FROM r WHERE rank <= {k}
"""


# ----------------------------------------------- context chunking
def doc_chunks(sf_dir: str, chunk_tokens: int = 128,
               stride: int = 96) -> ray.data.Dataset:
    """(doc_id, chunk_idx, start_tok, n_chunk_toks): overlapping
    fixed-size token windows per document — the context-chunking stage
    an embedding / retrieval pipeline runs before encoding (chunk of
    ``chunk_tokens``, advancing ``stride``, so consecutive chunks
    overlap by ``chunk_tokens - stride``).  Chunk starts cover every
    token: starts at 0, stride, 2·stride, … while start < n_tokens.

    Scale shape: a pure single-pass flat map — no shuffle, no state;
    the expansion factor is ~n_tokens/stride and each output row is
    4 ints, so block sizes stay bounded regardless of document length.
    """
    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    def chunks(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        n = pc.list_value_length(words).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_chunks = (n - 1) // stride + 1
        total = int(n_chunks.sum())
        doc = np.repeat(
            b["doc_id"].to_numpy(zero_copy_only=False), n_chunks)
        ends = np.cumsum(n_chunks)
        idx = np.arange(total, dtype=np.int64) - np.repeat(
            ends - n_chunks, n_chunks)
        start = idx * stride
        n_rep = np.repeat(n, n_chunks)
        return pa.table({
            "doc_id": pa.array(doc, pa.int64()),
            "chunk_idx": pa.array(idx, pa.int64()),
            "start_tok": pa.array(start, pa.int64()),
            "n_chunk_toks": pa.array(
                np.minimum(chunk_tokens, n_rep - start), pa.int64()),
        })

    return docs.map_batches(chunks, batch_format="pyarrow")


def doc_chunks_oracle_sql(chunk_tokens: int = 128,
                          stride: int = 96) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM documents
)
, gs AS (
  SELECT doc_id, n,
         unnest(generate_series(0, CAST((n - 1) // {stride} AS BIGINT)))
           AS gs
  FROM tok
)
SELECT doc_id, CAST(gs AS BIGINT) AS chunk_idx,
       CAST(gs * {stride} AS BIGINT) AS start_tok,
       CAST(least({chunk_tokens}, n - gs * {stride}) AS BIGINT)
         AS n_chunk_toks
FROM gs
"""


# ----------------------------------------------- inverted index build
_INV_K = 8  # postings cap: first k doc ids per term


def inverted_index(sf_dir: str, k: int = _INV_K,
                   parts: int = 64) -> ray.data.Dataset:
    """(term, df, postings): the IR / retrieval index build — for every
    non-stopword term, its document frequency and the first ``k``
    postings (smallest doc_ids, comma-joined).  The capped-prefix
    postings column is the bounded-row-width contract a 100 TB index
    shard needs: a term's full posting list is unbounded (every doc
    contains "data"), its first-k prefix is k integers.

    Scale shape: each batch collapses to DISTINCT (term, doc) pairs
    before any exchange (the map-side combiner of every index
    builder), ONE term-hash shuffle, then a per-partition lexsort +
    segmented prefix selection; the postings strings are built with
    Arrow ``binary_join`` on a list array — no Python loop over terms.
    """
    stop = pa.array(STOPWORDS, pa.string())

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        parent = pc.list_parent_indices(words)
        flat = pc.list_flatten(words)
        doc = b["doc_id"].take(parent).to_numpy(zero_copy_only=False)
        keep = pc.invert(
            pc.is_in(flat, value_set=stop)
        ).to_numpy(zero_copy_only=False)
        t = flat.to_numpy(zero_copy_only=False)[keep]
        d = doc[keep].astype(np.int64)
        order = np.lexsort((d, t))
        t, d = t[order], d[order]
        first = np.ones(t.size, dtype=bool)
        first[1:] = (t[1:] != t[:-1]) | (d[1:] != d[:-1])
        t, d = t[first], d[first]
        h = token_hashes(t)
        return pa.table({
            "term": pa.array(t, pa.string()),
            "doc_id": pa.array(d, pa.int64()),
            "part": pa.array((h % np.uint64(parts)).astype(np.int64)),
        })

    out_schema = pa.schema([
        ("term", pa.string()), ("df", pa.int64()),
        ("postings", pa.string()),
    ])

    def build(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        t = g["term"].to_numpy(zero_copy_only=False)
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, t))
        t, d = t[order], d[order]
        # cross-batch pair dedup (a pair arrives once per source batch)
        first = np.ones(t.size, dtype=bool)
        first[1:] = (t[1:] != t[:-1]) | (d[1:] != d[:-1])
        t, d = t[first], d[first]
        newt = np.ones(t.size, dtype=bool)
        newt[1:] = t[1:] != t[:-1]
        starts = np.flatnonzero(newt)
        seg = np.cumsum(newt) - 1
        df = np.diff(np.append(starts, t.size))
        rank = np.arange(t.size) - starts[seg]
        keep = rank < k
        lens = np.minimum(df, k)
        offsets = pa.array(
            np.concatenate(([0], np.cumsum(lens))).astype(np.int32))
        vals = pc.cast(pa.array(d[keep], pa.int64()), pa.string())
        postings = pc.binary_join(
            pa.ListArray.from_arrays(offsets, vals), ",")
        return pa.table({
            "term": pa.array(t[starts], pa.string()),
            "df": pa.array(df.astype(np.int64), pa.int64()),
            "postings": postings,
        })

    return (
        read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(build, batch_format="pyarrow")
    )


def inverted_index_oracle_sql(k: int = _INV_K) -> str:
    return f"""
SELECT term, count(DISTINCT doc_id) AS df,
       array_to_string(
         list_sort(list(DISTINCT doc_id))[1:{k}], ',') AS postings
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents)
WHERE NOT list_contains({list(STOPWORDS)}, term)
GROUP BY term
"""


# ------------------------------------------------- vocabulary encode
def vocab_encode(sf_dir: str, vocab_top: int = 256,
                 max_tokens: int = 32) -> ray.data.Dataset:
    """(doc_id, n_tokens, ids): the tokenizer-pipeline encode step —
    build a frequency-ranked vocabulary (ids 1..vocab_top by count
    DESC, term ASC; 0 = OOV) and encode each document's first
    ``max_tokens`` tokens as a space-joined id string, order-preserving.

    Scale shape: vocabulary construction rides the exact term-count
    machinery (per-block Arrow partials, ONE coarse term-hash
    exchange), the top-V cut is driver-side on the merged counts
    (bounded by vocab_top), and the encode pass is a zero-shuffle
    broadcast map: the vocab ships once via ``ray.put`` and each batch
    encodes with pure Arrow kernels (list_slice → index_in →
    fill_null → cast → binary_join) — no per-row Python, no join.
    The id string keeps the output row width bounded and
    hash-comparable against the string_agg oracle.
    """
    from .common import collect_small, deref, two_phase_agg

    # ---- pass 1: exact counts, top-V driver cut (bounded result)
    def term_partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = pc.list_flatten(words)
        g = pa.TableGroupBy(pa.table({"term": flat}), ["term"]).aggregate(
            [([], "count_all")])
        return pa.table({"term": g["term"], "n_p": g["count_all"]})

    counts = collect_small(
        two_phase_agg(
            read(sf_dir, "documents", columns=["text"])
            .map_batches(term_partial, batch_format="pyarrow"),
            keys=["term"], sums={"n_p": "n"},
        ),
        pa.schema([("term", pa.string()), ("n", pa.int64())]),
    )
    t = counts["term"].to_numpy(zero_copy_only=False)
    n = counts["n"].to_numpy(zero_copy_only=False)
    order = np.lexsort((t, -n))[:vocab_top]
    vocab = pa.array(t[order], pa.string())  # position = id - 1
    vocab_ref = ray.put(vocab)

    # ---- pass 2: broadcast encode, zero shuffles
    def encode(b: pa.Table, _v=vocab_ref) -> pa.Table:
        v = deref(_v)
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        head = pc.list_slice(words, 0, max_tokens)
        flat = pc.list_flatten(head)
        ids = pc.add(
            pc.fill_null(pc.index_in(flat, value_set=v), -1),
            1)
        id_str = pc.cast(ids, pa.string())
        # rebuild the per-doc list with the head's own offsets
        lens = pc.list_value_length(head).to_numpy(
            zero_copy_only=False).astype(np.int64)
        offsets = np.zeros(lens.size + 1, dtype=np.int32)
        np.cumsum(lens, out=offsets[1:])
        relist = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            id_str.combine_chunks() if isinstance(
                id_str, pa.ChunkedArray) else id_str)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_tokens": pa.array(lens, pa.int64()),
            "ids": pc.binary_join(relist, " "),
        })

    return (
        read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(encode, batch_format="pyarrow")
    )


def vocab_encode_oracle_sql(vocab_top: int = 256,
                            max_tokens: int = 32) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS ord
  FROM documents
), vocab AS (
  SELECT term, id FROM (
    SELECT term,
           row_number() OVER (ORDER BY count(*) DESC, term) AS id
    FROM tok GROUP BY term
  ) WHERE id <= {vocab_top}
)
SELECT tok.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       string_agg(CAST(COALESCE(v.id, 0) AS VARCHAR), ' '
                  ORDER BY tok.ord) AS ids
FROM tok LEFT JOIN vocab v ON tok.term = v.term
WHERE tok.ord <= {max_tokens}
GROUP BY tok.doc_id
"""
