"""Arrow IPC shard sink/source: lossless round trip, byte-deterministic
shards, partitioning invariance (sources/ipc.py)."""

import hashlib
import os
import shutil

import pytest

import ray.data as rd

from deepie_ray.sources import ipc


@pytest.fixture()
def tmp_out(tmp_path):
    d = str(tmp_path / "ipc")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _docs(sf_dir):
    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )


def test_ipc_roundtrip_lossless(sf_dir, tmp_out):
    before = (
        _docs(sf_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    manifest = ipc.write_ipc_shards(
        _docs(sf_dir), tmp_out, key_col="doc_id", n_shards=8
    ).to_pandas()
    assert manifest["n_rows"].sum() == len(before)
    assert (manifest["n_bytes"] > 0).all()
    after = (
        ipc.read_ipc_shards(tmp_out)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(after.columns) == list(before.columns)
    for c in before.columns:
        assert (before[c] == after[c]).all()


def test_ipc_shards_byte_deterministic_and_partition_invariant(
    sf_dir, tmp_out
):
    out_a, out_b = tmp_out + "_a", tmp_out + "_b"
    # different input partitioning must produce byte-identical shards
    ma = ipc.write_ipc_shards(
        _docs(sf_dir).repartition(3), out_a, key_col="doc_id", n_shards=8
    ).to_pandas()
    mb = ipc.write_ipc_shards(
        _docs(sf_dir).repartition(11), out_b, key_col="doc_id", n_shards=8
    ).to_pandas()
    a = ma.sort_values("shard").reset_index(drop=True)
    b = mb.sort_values("shard").reset_index(drop=True)
    assert (a["sha256"] == b["sha256"]).all()
    for _, row in a.iterrows():
        data = open(row["path"], "rb").read()
        assert hashlib.sha256(data).hexdigest() == row["sha256"]
    shutil.rmtree(out_a, ignore_errors=True)
    shutil.rmtree(out_b, ignore_errors=True)


def test_ipc_write_is_atomic_no_tmp_left(sf_dir, tmp_out):
    ipc.write_ipc_shards(
        _docs(sf_dir), tmp_out, key_col="doc_id", n_shards=4
    ).materialize()
    names = os.listdir(tmp_out)
    assert names and all(n.endswith(".arrows") for n in names)


# ----------------------------------------------------------------- ORC


def test_orc_shards_roundtrip_and_determinism(tmp_path):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from deepie_ray.sources import orc

    t = pa.table(
        {
            "doc_id": pa.array([5, 1, 9, 3, 7], pa.int64()),
            "text": pa.array(["e", "a", "i", "c", "g"], pa.string()),
        }
    )
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = orc.write_orc_shards(rd.from_arrow(t), d1, "doc_id").to_pandas()
    # different partitioning -> same shard contents (content-addressed)
    m2 = (
        orc.write_orc_shards(rd.from_arrow(t).repartition(3), d2, "doc_id")
        .to_pandas()
    )
    a = m1.sort_values("shard").reset_index(drop=True)
    b = m2.sort_values("shard").reset_index(drop=True)
    assert (a["n_rows"] == b["n_rows"]).all()
    assert (a["sha256"] == b["sha256"]).all()
    back = (
        orc.read_orc_shards(d1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, want)
