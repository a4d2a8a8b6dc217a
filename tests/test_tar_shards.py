"""WebDataset-style tar-shard sink/source: span-sequence round trip,
byte-deterministic shards, partitioning invariance, corruption
detection."""

import hashlib
import os
import shutil

import pytest

from deepie_ray import pipeline
from deepie_ray.sources import tar_shards


@pytest.fixture()
def tmp_out(tmp_path):
    d = str(tmp_path / "shards")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _fps(ds):
    df = tar_shards.shards_fingerprint(ds).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def test_tar_roundtrip_preserves_span_sequences(sf_dir, tmp_out):
    docs = pipeline.read_documents(sf_dir)
    before = _fps(docs)
    manifest = tar_shards.write_tar_shards(docs, tmp_out, n_shards=8).to_pandas()
    assert manifest["n_docs"].sum() == len(before)
    back = tar_shards.read_tar_shards(tmp_out)
    after = _fps(back)
    # the north-star per-row invariant: (kind, text, media_ref, order)
    # for every doc, unchanged through the shard format
    assert (before["doc_id"] == after["doc_id"]).all()
    assert (before["n_spans"] == after["n_spans"]).all()
    assert (before["span_fp"] == after["span_fp"]).all()


def test_tar_shards_byte_deterministic_across_partitionings(sf_dir, tmp_path):
    docs = pipeline.read_documents(sf_dir)
    shas = []
    for i, parts in enumerate((2, 7)):
        d = str(tmp_path / f"run{i}")
        m = (
            tar_shards.write_tar_shards(
                docs.repartition(parts), d, n_shards=4
            )
            .to_pandas()
            .sort_values("shard")
        )
        # manifest sha matches the actual file bytes
        for _, row in m.iterrows():
            with open(row["path"], "rb") as f:
                assert hashlib.sha256(f.read()).hexdigest() == row["sha256"]
        shas.append(list(m["sha256"]))
    assert shas[0] == shas[1]


def test_tar_read_detects_truncated_member(sf_dir, tmp_out):
    docs = pipeline.read_documents(sf_dir)
    tar_shards.write_tar_shards(docs, tmp_out, n_shards=2).to_pandas()
    # truncate one shard: drop the last 512-byte tar block of content
    victim = sorted(
        os.path.join(tmp_out, f)
        for f in os.listdir(tmp_out)
        if f.endswith(".tar")
    )[0]
    data = open(victim, "rb").read()
    # rewrite a media member's payload shorter: simplest corruption that
    # keeps the tar parseable is rebuilding with one payload truncated —
    # emulate by chopping trailing blocks until tarfile still opens but
    # a member is short.  Cheap deterministic variant: flip a size check
    # by deleting the tail member entirely.
    import tarfile as tf
    import io

    src = tf.open(fileobj=io.BytesIO(data), mode="r")
    members = src.getmembers()
    media = [m for m in members if not m.name.endswith(".json")]
    if not media:
        pytest.skip("shard drew no media spans")
    drop = media[-1].name
    buf = io.BytesIO()
    with tf.open(fileobj=buf, mode="w") as out:
        for m in members:
            payload = src.extractfile(m).read()
            if m.name == drop:
                m.size = len(payload) - 1
                payload = payload[:-1]
            out.addfile(m, io.BytesIO(payload))
    open(victim, "wb").write(buf.getvalue())
    with pytest.raises(Exception):
        tar_shards.read_tar_shards(tmp_out).materialize()
