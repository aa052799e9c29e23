"""Extension surface (SURVEY.md §2.8 X6): extractors + middlewares.

User callables must live in an importable module (Ray workers import
them by reference) — here the library's built-in examples stand in for
user code.
"""

from __future__ import annotations

import glob
import os

import pyarrow.compute as pc
import pyarrow.parquet as pq


def test_extractor_and_middleware(ray_session, small_web, tmp_path):
    from whakoom_webscrapper_ray.extensions import (
        ColumnStampMiddleware,
        Extractor,
        image_census,
    )
    from whakoom_webscrapper_ray.pipelines.crawl import CrawlEngine

    eng = CrawlEngine(
        small_web["pages"], small_web["seeds"], small_web["robots"],
        checkpoint_dir=str(tmp_path), num_shards=3,
        extractors=[Extractor("image_census", image_census)],
        fetch_middlewares=[ColumnStampMiddleware("mw_tag", "v1")],
    )
    eng.run()
    tables = eng.finalize_tables()

    # extractor output is a first-class finalized table
    census = tables["image_census"]
    n_docs = eng.docs_dataset().count()
    assert census.num_rows == n_docs
    assert int(pc.sum(census["n_images"]).as_py()) > 0

    # middleware column landed in the checkpointed docs partitions
    f = sorted(
        glob.glob(os.path.join(str(tmp_path), "docs", "*", "*.parquet"))
    )[0]
    assert "mw_tag" in pq.read_schema(f).names
    eng.shutdown()
