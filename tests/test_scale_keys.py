"""Scale-keyed defaults (round-4 verdict #6): the 100-TB flags derive
from input size instead of being sf0.1-tuned constants, so the same
code path is optimal at both scales."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from deepie_ray.tuning import (
    SIZE_KEYED_BLOCK_CUTOFF,
    override_blocks_for,
    read_blocks,
)


def test_override_blocks_scale_keyed(tmp_path):
    small = tmp_path / "small.parquet"
    pq.write_table(pa.table({"x": [1, 2, 3]}), str(small))
    assert override_blocks_for(str(small)) == read_blocks()

    # synthetic large input: sparse file at the cutoff (no real 1 GiB
    # written to disk)
    big = tmp_path / "big.parquet"
    with open(big, "wb") as f:
        f.truncate(SIZE_KEYED_BLOCK_CUTOFF)
    assert override_blocks_for(str(big)) is None

    # missing path: fall back to the benchmark-scale count
    assert override_blocks_for(str(tmp_path / "nope.parquet")) == read_blocks()

    # directory of parts: sizes sum
    d = tmp_path / "parts"
    d.mkdir()
    with open(d / "part-0", "wb") as f:
        f.truncate(SIZE_KEYED_BLOCK_CUTOFF // 2)
    with open(d / "part-1", "wb") as f:
        f.truncate(SIZE_KEYED_BLOCK_CUTOFF // 2)
    assert override_blocks_for(str(d)) is None


def test_q5_bloom_selection_scale_keyed(sf_dir, monkeypatch):
    from deepie_ray import queries as Q

    # small bench input -> OFF by size
    monkeypatch.delenv("DEEPIE_Q5_BLOOM", raising=False)
    assert Q._q5_bloom_enabled(sf_dir) is False
    # size threshold crossing -> ON (synthetic: drop the threshold)
    monkeypatch.setattr(Q, "Q5_BLOOM_MIN_BYTES", 1)
    assert Q._q5_bloom_enabled(sf_dir) is True
    # explicit module override wins over size
    monkeypatch.setattr(Q, "Q5_BLOOM_PUSHDOWN", False)
    assert Q._q5_bloom_enabled(sf_dir) is False
    # env override wins over everything
    monkeypatch.setenv("DEEPIE_Q5_BLOOM", "1")
    assert Q._q5_bloom_enabled(sf_dir) is True
    monkeypatch.setenv("DEEPIE_Q5_BLOOM", "0")
    monkeypatch.setattr(Q, "Q5_BLOOM_PUSHDOWN", True)
    assert Q._q5_bloom_enabled(sf_dir) is False


def test_q5_bloom_on_equals_off(ray_session, sf_dir, monkeypatch):
    """The scale path (Bloom semi-join pushdown forced ON) returns the
    same q5 result as the bench path — false positives are dropped by
    the join, so the Bloom only prunes."""
    from deepie_ray import queries as Q

    monkeypatch.delenv("DEEPIE_Q5_BLOOM", raising=False)
    off = Q.q5_region_revenue(sf_dir).to_pandas().reset_index(drop=True)
    monkeypatch.setenv("DEEPIE_Q5_BLOOM", "1")
    on = Q.q5_region_revenue(sf_dir).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(off, on)


def test_remote_uri_takes_the_scale_path(monkeypatch):
    """A non-stat-able remote URI is the at-scale deployment: block
    override defers to Ray's size-based splitting, and q5's Bloom
    pushdown is ON (round-5 review findings)."""
    from deepie_ray import queries as Q

    assert override_blocks_for("s3://bucket/sf100tb/lineitem.parquet") is None
    monkeypatch.delenv("DEEPIE_Q5_BLOOM", raising=False)
    assert Q._q5_bloom_enabled("s3://bucket/sf100tb") is True
