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


def _token_hash(tok: str) -> int:
    """FNV-1a 64-bit over utf-8 bytes — deterministic across processes."""
    h = 14695981039346656037
    for b in tok.encode("utf-8"):
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


def token_hashes(ws: list[str]) -> np.ndarray:
    return np.array([_token_hash(w) for w in ws], dtype=np.uint64)


def _fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Rolling polynomial hash over token hashes (Karp–Rabin style)."""
    words = pc.split_pattern(batch["text"], " ").to_pylist()
    fps = np.empty(len(words), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, ws in enumerate(words):
            h = FP_SEED
            for th in token_hashes(ws):
                h = (h * FP_BASE + th) & _MASK
            fps[i] = h
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
