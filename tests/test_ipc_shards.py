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
