"""Semantic fetch retries (SURVEY.md §2.8 X2: 3 attempts, then the row
is emitted with status=failed — never silently dropped,
reference pipelines.py:88-122)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_fetch_semantic_retries(small_web):
    from whakoom_webscrapper_ray.stages.fetch import SyntheticWebFetcher

    pages = small_web["pages"]
    urls = pages.column("doc_id").slice(0, 4).combine_chunks()
    batch = pa.table(
        {
            "canon_url": urls,
            "seq": pa.array(np.arange(4), pa.int64()),
        }
    )
    transient = urls[0].as_py()   # fails twice, succeeds on attempt 3
    permanent = urls[1].as_py()   # always fails → status=failed

    def fail_fn(u: str, attempt: int) -> bool:
        if u == transient:
            return attempt < 2
        return u == permanent

    f = SyntheticWebFetcher(pages, max_attempts=3, fail_fn=fail_fn)
    out = f(batch)
    status = dict(
        zip(urls.to_pylist(), out.column("fetch_status").to_pylist())
    )
    assert status[transient] == "fetched"
    assert status[permanent] == "failed"
    assert status[urls[2].as_py()] == "fetched"
    assert f.attempt_log[transient] == 2
    assert f.attempt_log[permanent] == 3
    # failed rows carry empty spans, not nulls — no silent drops
    spans = out.column("spans").to_pylist()
    assert spans[1] == []
    assert len(spans[0]) > 0
