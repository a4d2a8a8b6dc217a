"""Multimodal span processing (image/audio/table spans).

The interleaved documents carry media as opaque references
(``media_ref``) with typed metadata; real payloads would be ``binary``
columns.  No image/audio codecs exist in this container, so the decode
kernels are STUBBED (deterministic fake features, clearly marked) —
the Ray-side plumbing is real and tested: schema, actor-pool stage
shape, per-kind batch routing, small-batch sizing for wide rows.

A real deployment replaces ``_fake_decode`` with e.g. PIL/ffmpeg calls
in ``__init__``-loaded codecs; nothing else changes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import stable_u32

MEDIA_FEATURE_DIM = 32


def explode_media_spans(batch: pa.Table) -> pa.Table:
    """documents -> one row per media span (doc_id, span_idx, kind,
    media_ref).  Text spans are not emitted — they go down the NLP
    branch; the split is the pipeline's modality router."""
    doc_ids = batch["doc_id"].to_pylist()
    spans_col = batch["spans"].to_pylist()
    d, i, k, r = [], [], [], []
    for did, spans in zip(doc_ids, spans_col):
        for idx, s in enumerate(spans or []):
            if s["kind"] != "text":
                d.append(did)
                i.append(idx)
                k.append(s["kind"])
                r.append(s["media_ref"])
    return pa.table(
        {
            "doc_id": pa.array(d, pa.string()),
            "span_idx": pa.array(i, pa.int32()),
            "kind": pa.array(k, pa.string()),
            "media_ref": pa.array(r, pa.string()),
        }
    )


class MediaFeatureExtractor:
    """Actor-pool stage: media row -> fixed-dim feature vector.

    STUB: features are a seeded function of the media_ref (no codecs in
    this environment).  The actor interface (codec "loaded" once in
    ``__init__``, small batch_size for wide binary rows, one output row
    per input row) is the real contract.
    """

    def __init__(self, strict: bool = False):
        self.strict = strict  # strict=True: behave like a missing codec

    def _fake_decode(self, kind: str, ref: str) -> np.ndarray:
        if self.strict:
            raise NotImplementedError(
                "media decode requires image/audio codecs not present in "
                "this environment; deterministic fake features used in "
                "non-strict mode"
            )
        rng = np.random.default_rng(stable_u32(kind + ":" + ref, "media:"))
        return rng.standard_normal(MEDIA_FEATURE_DIM).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        refs = batch["media_ref"].to_pylist()
        feats = np.stack(
            [self._fake_decode(k, r) for k, r in zip(kinds, refs)]
        ) if len(kinds) else np.zeros((0, MEDIA_FEATURE_DIM), np.float32)
        n = len(kinds)
        offsets = np.arange(0, (n + 1) * MEDIA_FEATURE_DIM, MEDIA_FEATURE_DIM)
        feat_col = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(feats.ravel(), pa.float32())
        )
        return batch.append_column("features", feat_col)


def media_stats(batch: pa.Table) -> pa.Table:
    """Per-batch partial media counts by kind (combiner for the
    modality histogram)."""
    g = batch.group_by("kind").aggregate([([], "count_all")])
    return pa.table({"kind": g["kind"], "n": g["count_all"]})
