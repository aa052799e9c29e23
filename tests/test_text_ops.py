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


def _scalar_token_hash(tok: str) -> int:
    """Reference char-poly token hash: Horner over bytes mod 2⁶⁴."""
    from whakoom_webscrapper_ray.pipelines.text import TOK_BASE, TOK_SEED

    mask = (1 << 64) - 1
    h = int(TOK_SEED)
    for ch in tok.encode():
        h = (h * int(TOK_BASE) + ch) & mask
    return h


def _scalar_fingerprint(tokens: list[str]) -> int:
    """Reference Karp–Rabin: h = SEED·Bⁿ + Σ th[i]·B^(n-1-i)  (mod 2⁶⁴)."""
    mask = (1 << 64) - 1
    h = int(FP_SEED)
    for t in tokens:
        h = (h * int(FP_BASE) + _scalar_token_hash(t)) & mask
    return h


def test_fingerprint_matches_scalar_recurrence():
    texts = DOCS[:4] + ["x", "", "a b a b a b"]
    out = _fingerprint_batch(_batch(texts))
    got = [fp & ((1 << 64) - 1)
           for fp in np.asarray(out.column("fingerprint")).astype(np.uint64)]
    expected = [_scalar_fingerprint(t.split(" ")) for t in texts]
    assert got == expected


def test_char_poly_hashes_large_string_offsets():
    """Regression: large_string flats carry int64 offsets; reading them
    as int32 silently misparses (>2 GiB flat token buffers at scale)."""
    import pyarrow as pa

    from whakoom_webscrapper_ray.pipelines.text import char_poly_hashes

    toks = ["alpha", "b", "", "gamma delta", "zz"]
    small = pa.array(toks, pa.string())
    large = pa.array(toks, pa.large_string())
    assert np.array_equal(char_poly_hashes(small),
                          char_poly_hashes(large))
    # sliced view exercises the offset/base arithmetic on both widths
    assert np.array_equal(char_poly_hashes(small.slice(1, 3)),
                          char_poly_hashes(large.slice(1, 3)))


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


def test_simhash_scalar_reference():
    """simhash_batch vs a row-at-a-time scalar reimplementation:
    fmix64(char-poly token hash) bit votes, majority per bit."""
    from whakoom_webscrapper_ray.pipelines.dedup import simhash_batch

    def fmix64(h: int) -> int:
        mask = (1 << 64) - 1
        h ^= h >> 33
        h = (h * 0xFF51AFD7ED558CCD) & mask
        h ^= h >> 33
        h = (h * 0xC4CEB9FE1A85EC53) & mask
        h ^= h >> 33
        return h

    texts = DOCS[:4] + ["x", "", "a b a b a b", "same same same"]
    out = simhash_batch(_batch(texts))
    got = [v & ((1 << 64) - 1)
           for v in np.asarray(out.column("simhash")).astype(np.uint64)]
    for text, g in zip(texts, got):
        toks = text.split(" ")
        hs = [fmix64(_scalar_token_hash(t)) for t in toks]
        want = 0
        for b in range(64):
            ones = sum((h >> b) & 1 for h in hs)
            if 2 * ones > len(hs):
                want |= 1 << b
        assert g == want, text


def test_simhash_near_dup_property():
    """One-token edits move few bits; unrelated docs differ widely."""
    from whakoom_webscrapper_ray.pipelines.dedup import simhash_batch

    a = "the quick brown fox jumps over the lazy dog again and again"
    b = a.replace("lazy", "sleepy")
    c = "completely different words about database query planning here"
    out = simhash_batch(_batch([a, b, c]))
    v = [x & ((1 << 64) - 1)
         for x in np.asarray(out.column("simhash")).astype(np.uint64)]
    d_ab = bin(v[0] ^ v[1]).count("1")
    d_ac = bin(v[0] ^ v[2]).count("1")
    assert d_ab < d_ac
    assert d_ab <= 16


def test_clz64_exact():
    from whakoom_webscrapper_ray.pipelines.text import _clz64

    vals = np.array(
        [0, 1, 2, 3, (1 << 63), (1 << 63) - 1, (1 << 60) - 1,
         (1 << 52) + 1, 0xFFFFFFFFFFFFFFFF],
        dtype=np.uint64,
    )
    got = _clz64(vals)
    want = [64 if v == 0 else 64 - int(v).bit_length()
            for v in vals.tolist()]
    assert got.tolist() == want


def test_hll_vocab_error_bound(ray_session):
    """HLL estimate within 5% of the exact distinct-token count
    (4096 registers → ~1.6% standard error)."""
    from whakoom_webscrapper_ray.pipelines.text import hll_vocab, vocab_size

    sf = "/root/testdata/sf0.001"
    exact = vocab_size(sf).take_all()[0]["vocab"]
    est = hll_vocab(sf).take_all()[0]["vocab_estimate"]
    assert exact > 0
    assert abs(est - exact) / exact < 0.05


def test_lang_hll_vocab_error_bound(ray_session):
    """Per-language HLL estimates within 5% of the exact per-language
    distinct-token counts (lang_vocab), for every language present."""
    from whakoom_webscrapper_ray.pipelines.text import (
        lang_hll_vocab, lang_vocab)

    sf = "/root/testdata/sf0.001"
    exact = {r["lang"]: r["vocab"] for r in lang_vocab(sf).take_all()}
    est = {r["lang"]: r["vocab_estimate"]
           for r in lang_hll_vocab(sf).take_all()}
    assert set(est) == set(exact)
    for lg, ex in exact.items():
        assert ex > 0
        assert abs(est[lg] - ex) / ex < 0.05, (lg, est[lg], ex)


def test_cms_term_counts_overestimate_and_bound(ray_session):
    """Count-Min guarantees on the fixture: every estimate is >= the
    true count (one-sided), and the excess stays within the classic
    2N/width expectation with 4x slack (depth-4 min)."""
    from whakoom_webscrapper_ray.pipelines.text import cms_term_counts

    sf = "/root/testdata/sf0.001"
    exact = _exact_term_counts(sf)
    n_total = sum(exact.values())
    width = 1 << 14
    est = {r["term"]: r["est_count"]
           for r in cms_term_counts(sf, width=width).take_all()}
    assert est, "sketch returned no candidates"
    for t, e in est.items():
        assert t in exact
        assert e >= exact[t], (t, e, exact[t])
        assert e - exact[t] <= max(1, 8 * n_total // width), \
            (t, e, exact[t], n_total)


def test_lang_kll_quantiles_rank_error(ray_session):
    """Per-language KLL percentiles: every reported value's TRUE rank
    within its language is within 5% of the requested percentile (the
    KLL epsilon at the default capacity, with slack)."""
    import pyarrow.parquet as pq

    from whakoom_webscrapper_ray.pipelines.text import lang_kll_quantiles

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["lang", "text"])
    import numpy as np
    toks = {}
    for lg, tx in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
        toks.setdefault(lg, []).append(len(tx.split(" ")))
    got = lang_kll_quantiles(sf).take_all()
    assert {r["lang"] for r in got} == set(toks)
    for r in got:
        vals = np.sort(np.array(toks[r["lang"]], dtype=np.int64))
        rank = np.searchsorted(vals, r["value"], side="right")
        assert abs(rank / vals.size - r["pct"] / 100) <= 0.05 + 1 / vals.size, r


def _exact_term_counts(sf: str) -> dict[str, int]:
    import pyarrow.parquet as pq

    from whakoom_webscrapper_ray.pipelines.text import STOPWORDS

    texts = pq.read_table(
        f"{sf}/documents.parquet", columns=["text"]
    )["text"].to_pylist()
    counts: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            if w not in STOPWORDS:
                counts[w] = counts.get(w, 0) + 1
    return counts


def test_heavy_hitters_exact_at_large_capacity(ray_session):
    """With capacity >= vocabulary the MG sketch degenerates to the
    exact answer — identical terms AND counts as term_counts_topk."""
    from whakoom_webscrapper_ray.pipelines.text import (
        heavy_hitters,
        term_counts_topk,
    )

    sf = "/root/testdata/sf0.001"
    exact = {(r["term"], r["n"])
             for r in term_counts_topk(sf).take_all()}
    est = {(r["term"], r["est_count"])
           for r in heavy_hitters(sf, capacity=1_000_000).take_all()}
    assert exact == est


def test_heavy_hitters_mg_guarantee(ray_session):
    """Classic mergeable-MG bound at a deliberately tiny capacity:
    every term with true count > N/(cap+1) survives, and
    est <= true <= est + N/(cap+1) for every reported term."""
    from whakoom_webscrapper_ray.pipelines.text import heavy_hitters

    sf = "/root/testdata/sf0.001"
    cap = 4
    counts = _exact_term_counts(sf)
    n_total = sum(counts.values())
    bound = n_total / (cap + 1)
    est = {r["term"]: r["est_count"]
           for r in heavy_hitters(sf, k=10_000, capacity=cap).take_all()}
    for term, c in counts.items():
        if c > bound:
            assert term in est, (term, c, bound)
    for term, e in est.items():
        true = counts[term]
        assert e <= true <= e + bound, (term, e, true, bound)


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))
