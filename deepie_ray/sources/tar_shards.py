"""WebDataset-style tar-shard sink/source for the interleaved corpus.

Multimodal training corpora ship as directories of tar shards whose
members group per-sample files by key (the WebDataset convention:
``{key}.json``, ``{key}.0003.image``, ...).  This module writes the
engine's interleaved DOCUMENTS table (schema.py: doc_id +
spans<struct<kind,text,media_ref,offset>>) to such shards and reads
them back, preserving the per-row span-sequence invariant (kind, text,
media_ref, order) end to end.

Determinism contract (what makes shards resumable AND verifiable):

* shard assignment is content-addressed (``stable_u32(doc_id) %
  n_shards``) — independent of input partitioning and arrival order;
* members are emitted in sorted (doc_id, member-name) order with
  zeroed tar metadata (mtime=0, uid/gid=0) — the SAME corpus always
  produces byte-identical shard files, so a sha256 manifest detects
  partial/corrupt shards and a re-run can skip finished ones;
* writes are atomic (tmp file + rename), the resumable-output pattern
  shared with ``checkpoint.py``.

Media spans carry refs, not bytes, in this environment (SURVEY §7.6.4
media stubs); each media span still gets a real tar member whose
payload is the deterministic pseudo-byte expansion of its ref — the
plumbing (member naming, ordering, size accounting, round-trip) is
real, the codec bytes are the documented stand-in.

Scale shape: one groupby(shard) shuffle; each shard task streams its
docs into one tar (bounded by docs_per_shard, not corpus size); the
manifest is n_shards rows — driver-sized.  Reading is embarrassingly
parallel over shard files.
"""

from __future__ import annotations

import io
import json
import os
import tarfile

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..hashing import md5_hex, stable_u32
from ..schema import DOCUMENTS


def _payload(ref: str, kind: str) -> bytes:
    """Deterministic pseudo-bytes for a media ref (documented stand-in
    for the real object fetch; length varies by kind so size accounting
    is exercised)."""
    n = 64 + stable_u32(ref, "paylen:") % (256 if kind == "image" else 128)
    rng = np.random.default_rng(stable_u32(ref, "payload:"))
    return rng.integers(0, 256, n, dtype=np.uint8).tobytes()


def _doc_members(doc_id: str, spans: list[dict]) -> list[tuple[str, bytes]]:
    """Per-doc tar members, WebDataset-style: ``{key}.json`` holds the
    ordered span sequence; each media span adds ``{key}.{i:04d}.{kind}``."""
    meta = json.dumps(
        {"doc_id": doc_id, "spans": spans},
        ensure_ascii=False,
        sort_keys=True,
        separators=(",", ":"),
    ).encode("utf-8")
    members = [(f"{doc_id}.json", meta)]
    for i, s in enumerate(spans):
        if s["kind"] != "text":
            members.append(
                (
                    f"{doc_id}.{i:04d}.{s['kind']}",
                    _payload(s["media_ref"], s["kind"]),
                )
            )
    return members


def write_tar_shards(
    docs: rd.Dataset, out_dir: str, n_shards: int = 16
) -> rd.Dataset:
    """Interleaved DOCUMENTS dataset -> ``{out_dir}/shard-NNNNN.tar``
    (+ atomic rename); returns the manifest dataset (shard, path,
    n_docs, n_members, n_bytes, sha256)."""
    import hashlib

    os.makedirs(out_dir, exist_ok=True)

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        sh = pa.array(
            [stable_u32(d, "tar:") % n_shards for d in ids], pa.int64()
        )
        return t.append_column("shard", sh)

    def write_shard(t: pa.Table) -> pa.Table:
        shard = int(t["shard"][0].as_py())
        rows = sorted(
            zip(t["doc_id"].to_pylist(), t["spans"].to_pylist()),
            key=lambda r: r[0],
        )
        buf = io.BytesIO()
        n_members = 0
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for doc_id, spans in rows:
                for name, payload in _doc_members(doc_id, spans):
                    info = tarfile.TarInfo(name=name)
                    info.size = len(payload)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tf.addfile(info, io.BytesIO(payload))
                    n_members += 1
        data = buf.getvalue()
        path = os.path.join(out_dir, f"shard-{shard:05d}.tar")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pa.table(
            {
                "shard": pa.array([shard], pa.int64()),
                "path": pa.array([path], pa.string()),
                "n_docs": pa.array([len(rows)], pa.int64()),
                "n_members": pa.array([n_members], pa.int64()),
                "n_bytes": pa.array([len(data)], pa.int64()),
                "sha256": pa.array(
                    [hashlib.sha256(data).hexdigest()], pa.string()
                ),
            }
        )

    return (
        docs.map_batches(assign, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(write_shard, batch_format="pyarrow")
    )


def read_tar_shards(out_dir: str) -> rd.Dataset:
    """``{out_dir}/shard-*.tar`` -> interleaved DOCUMENTS dataset.
    Span order comes from the ``{key}.json`` member; media members are
    length-verified against their span's expected payload (a truncated
    shard fails loudly rather than yielding silently damaged docs)."""
    paths = sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith(".tar")
    )

    def parse(batch: dict) -> pa.Table:
        ids, all_spans = [], []
        for path in batch["path"]:
            with tarfile.open(path, mode="r") as tf:
                sizes = {}
                metas = []
                for m in tf.getmembers():
                    if m.name.endswith(".json"):
                        metas.append(
                            json.loads(tf.extractfile(m).read().decode())
                        )
                    else:
                        sizes[m.name] = m.size
                for meta in metas:
                    doc_id, spans = meta["doc_id"], meta["spans"]
                    for i, s in enumerate(spans):
                        if s["kind"] != "text":
                            name = f"{doc_id}.{i:04d}.{s['kind']}"
                            want = len(_payload(s["media_ref"], s["kind"]))
                            if sizes.get(name) != want:
                                raise IOError(
                                    f"tar shard {path}: member {name} "
                                    f"size {sizes.get(name)} != {want}"
                                )
                    ids.append(doc_id)
                    all_spans.append(
                        [
                            (s["kind"], s["text"], s["media_ref"], s["offset"])
                            for s in spans
                        ]
                    )
        from ..synth import spans_to_arrow

        return pa.Table.from_arrays(
            [pa.array(ids, pa.string()), spans_to_arrow(all_spans)],
            schema=DOCUMENTS,
        )

    return rd.from_items([{"path": p} for p in paths]).map_batches(
        parse, batch_format="numpy"
    )


def shards_fingerprint(docs: rd.Dataset) -> rd.Dataset:
    """(doc_id, n_spans, span_fp): an order-sensitive md5 over each
    doc's (kind, text, media_ref, offset) sequence — equal fingerprints
    before write and after read prove the span-sequence invariant
    survived the shard round trip."""

    def fp(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        spans = t["spans"].to_pylist()
        fps, ns = [], []
        for ss in spans:
            canon = "\x1e".join(
                f"{s['kind']}\x1f{s['text']}\x1f{s['media_ref']}\x1f{s['offset']}"
                for s in ss
            )
            fps.append(md5_hex(canon))
            ns.append(len(ss))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.string()),
                "n_spans": pa.array(ns, pa.int64()),
                "span_fp": pa.array(fps, pa.string()),
            }
        )

    return docs.map_batches(fp, batch_format="pyarrow")
