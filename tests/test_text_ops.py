"""Value-level tests for the text-analysis operators.

Covers the two ops the round-1 audit flagged as untested (langid,
fingerprints) plus the shared vectorized token profile.  The batch
implementations are checked against independent scalar Python
references computed row-by-row — same contract, different code path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from whakoom_webscrapper_ray.pipelines.text import (
    FP_BASE,
    FP_SEED,
    LangIdModel,
    _fingerprint_batch,
    _token_stats_batch,
    token_hashes,
)

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "el rapido zorro marron salta sobre el perro perezoso por la tabla",
    "le renard brun rapide saute par dessus le chien avec des données",
    "der schnelle braune fuchs springt über den faulen hund und daten",
    "x",
    "",
    "the the the the the",
    "datos tabla fila clave valor consulta para el usuario con su fila",
]


def _batch(texts: list[str]) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(texts))]),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["??"] * len(texts)),
        }
    )


def _scalar_langid(model: LangIdModel, text: str) -> str:
    """Reference implementation: per-doc char-trigram set intersection."""
    padded = f" {text} ".replace(" ", "  ")
    grams = {padded[i:i + 3] for i in range(len(padded) - 2)}
    scores = [len(grams & p) for p in model.profiles]
    return model.langs[int(np.argmax(scores))]


def test_langid_batch_equals_scalar_reference():
    model = LangIdModel()
    out = model(_batch(DOCS))
    preds = out.column("pred_lang").to_pylist()
    expected = [_scalar_langid(model, t) for t in DOCS]
    assert preds == expected


def test_langid_detects_seeded_languages():
    model = LangIdModel()
    out = model(
        _batch(
            [
                "the fast table is in the data and it is for the query",
                "el valor de la consulta para los datos en la tabla",
                "les données pour faire tout ce que je mettre avec plus",
                "die daten werden nicht mit dem als auch aus der im zu",
            ]
        )
    )
    assert out.column("pred_lang").to_pylist() == ["en", "es", "fr", "de"]


def test_langid_sliced_batch():
    """Arrow buffer-offset handling: a zero-copy slice must score the
    same rows as the full batch."""
    model = LangIdModel()
    full = _batch(DOCS)
    sliced = model(full.slice(2, 4))
    again = model(full).slice(2, 4)
    assert sliced.column("pred_lang").to_pylist() == \
        again.column("pred_lang").to_pylist()


def _scalar_fingerprint(tokens: list[str]) -> int:
    """Reference Karp–Rabin: h = SEED·Bⁿ + Σ th[i]·B^(n-1-i)  (mod 2⁶⁴)."""
    mask = (1 << 64) - 1
    th = token_hashes(np.asarray(tokens, dtype=object))
    h = int(FP_SEED)
    for t in th:
        h = (h * int(FP_BASE) + int(t)) & mask
    return h


def test_fingerprint_matches_scalar_recurrence():
    texts = DOCS[:4] + ["x", "", "a b a b a b"]
    out = _fingerprint_batch(_batch(texts))
    got = [fp & ((1 << 64) - 1)
           for fp in np.asarray(out.column("fingerprint")).astype(np.uint64)]
    expected = [_scalar_fingerprint(t.split(" ")) for t in texts]
    assert got == expected


def test_fingerprint_order_sensitive():
    a = _fingerprint_batch(_batch(["alpha beta gamma"]))
    b = _fingerprint_batch(_batch(["gamma beta alpha"]))
    assert a.column("fingerprint")[0].as_py() != \
        b.column("fingerprint")[0].as_py()


def test_fingerprint_deterministic_across_calls():
    t = _batch(DOCS)
    assert _fingerprint_batch(t).equals(_fingerprint_batch(t))


def test_token_stats_scalar_reference():
    out = _token_stats_batch(_batch(DOCS))
    for i, text in enumerate(DOCS):
        ws = text.split(" ")
        assert out.column("n_tokens")[i].as_py() == len(ws)
        assert out.column("n_chars")[i].as_py() == len(text)
        assert out.column("n_unique_tokens")[i].as_py() == len(set(ws))
        stop = {"the", "a", "of", "and", "to", "in", "is", "it"}
        assert out.column("n_stopwords")[i].as_py() == \
            sum(1 for w in ws if w in stop)


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))
