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

from .common import read

# Fixed analysis vocabulary (mirrors classic stopword-ratio quality
# heuristics; the list is part of the operator contract and appears
# verbatim in the oracle SQL).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def _token_stats_batch(batch: pa.Table) -> pa.Table:
    words = pc.split_pattern(batch["text"], " ")
    n_tokens = pc.cast(pc.list_value_length(words), pa.int64())
    n_chars = pc.cast(pc.utf8_length(batch["text"]), pa.int64())
    wlists = words.to_pylist()
    uniq = pa.array([len(set(ws)) for ws in wlists], pa.int64())
    stop_set = set(STOPWORDS)
    n_stop = pa.array(
        [sum(1 for w in ws if w in stop_set) for ws in wlists], pa.int64()
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "n_unique_tokens": uniq,
            "n_stopwords": n_stop,
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
    import pandas as pd

    words = pc.split_pattern(batch["text"], " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = pc.list_flatten(words)
    parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    n_tokens = pc.list_value_length(words).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    n_chars = pc.utf8_length(batch["text"]).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)

    toks = pd.Series(flat.to_pylist(), dtype=object)
    codes, _ = pd.factorize(toks)
    df = pd.DataFrame({"p": parent, "t": codes})
    per_tok = df.groupby(["p", "t"], sort=False).size()
    by_doc = per_tok.groupby(level=0)
    n_rows = batch.num_rows
    n_unique = np.zeros(n_rows, dtype=np.int64)
    max_rep = np.zeros(n_rows, dtype=np.int64)
    sizes = by_doc.size()
    n_unique[sizes.index.to_numpy()] = sizes.to_numpy()
    mx = by_doc.max()
    max_rep[mx.index.to_numpy()] = mx.to_numpy()

    is_stop = toks.isin(STOPWORDS).to_numpy()
    n_stop = np.zeros(n_rows, dtype=np.int64)
    np.add.at(n_stop, parent[is_stop], 1)

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
        self.profiles = []
        for lang in self.langs:
            grams: set[str] = set()
            for w in self.SEEDS[lang].split():
                padded = f" {w} "
                grams.update(
                    padded[i:i + 3] for i in range(len(padded) - 2)
                )
            self.profiles.append(grams)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        preds = []
        for t in texts:
            padded = f" {t} ".replace(" ", "  ")
            grams = {padded[i:i + 3] for i in range(len(padded) - 2)}
            scores = [len(grams & p) for p in self.profiles]
            preds.append(self.langs[int(np.argmax(scores))])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pa.array(preds, pa.string()),
                "lang": batch["lang"],
            }
        )


def langid(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, pred_lang, lang) — n-gram language ID, actor pool."""
    return read(sf_dir, "documents", columns=["doc_id", "text", "lang"]
                ).map_batches(LangIdModel, concurrency=(1, 4),
                              batch_format="pyarrow")


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


def _fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Rolling polynomial hash over token hashes (Karp–Rabin style).

    h = SEED·Bⁿ + Σ th[i]·B^(n-1-i) (mod 2⁶⁴) — evaluated for the whole
    batch with one power table + one ``np.add.reduceat``, no row loop.
    """
    th, starts, lens = _split_flat(batch)
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
