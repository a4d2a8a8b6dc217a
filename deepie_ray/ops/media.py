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


class ImageResize:
    """Image decode + resize stage (actor pool).

    STUB decode (no codecs in this container): the "decoded image" is a
    seeded uint8 array whose shape derives from the media_ref; the
    resize itself is REAL (numpy nearest-neighbor sampling) and the
    output contract is what production code keeps: fixed (H, W)
    flattened uint8 + original dims.  Wide binary rows -> use small
    ``batch_size`` (and a larger ``DataContext.target_max_block_size``)
    so a batch x concurrency fits worker heaps.
    """

    def __init__(self, out_h: int = 16, out_w: int = 16, strict: bool = False):
        self.out_h, self.out_w = out_h, out_w
        self.strict = strict

    def _fake_decode(self, ref: str) -> np.ndarray:
        if self.strict:
            raise NotImplementedError("image codecs not available in this env")
        rng = np.random.default_rng(stable_u32(ref, "img:"))
        h = 32 + int(rng.integers(0, 64))
        w = 32 + int(rng.integers(0, 64))
        return rng.integers(0, 256, (h, w), dtype=np.uint8)

    @staticmethod
    def resize_nn(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
        """Real nearest-neighbor resize (index sampling)."""
        h, w = img.shape
        ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
        xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
        return img[np.ix_(ys, xs)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        pixels, hs, ws = [], [], []
        for r in refs:
            img = self._fake_decode(r)
            hs.append(img.shape[0])
            ws.append(img.shape[1])
            pixels.append(self.resize_nn(img, self.out_h, self.out_w).ravel())
        n = len(refs)
        flat = (
            np.concatenate(pixels)
            if pixels
            else np.zeros(0, np.uint8)
        )
        offs = np.arange(0, (n + 1) * self.out_h * self.out_w, self.out_h * self.out_w)
        col = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(flat, pa.uint8())
        )
        return (
            batch.append_column("pixels", col)
            .append_column("src_h", pa.array(hs, pa.int32()))
            .append_column("src_w", pa.array(ws, pa.int32()))
        )


class AudioFrameSample:
    """Audio decode + frame sampling stage (actor pool).

    STUB decode -> seeded waveform; REAL frame sampling: every
    ``hop``-th window of ``frame`` samples, energy per frame.  Output:
    fixed ``n_frames`` float32 energies per row.
    """

    def __init__(self, n_frames: int = 8, frame: int = 256, strict: bool = False):
        self.n_frames, self.frame = n_frames, frame
        self.strict = strict

    def _fake_decode(self, ref: str) -> np.ndarray:
        if self.strict:
            raise NotImplementedError("audio codecs not available in this env")
        rng = np.random.default_rng(stable_u32(ref, "aud:"))
        n = 2048 + int(rng.integers(0, 6144))
        return rng.standard_normal(n).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        out = np.zeros((len(refs), self.n_frames), dtype=np.float32)
        for i, r in enumerate(refs):
            wav = self._fake_decode(r)
            hop = max(1, (len(wav) - self.frame) // max(1, self.n_frames - 1))
            for j in range(self.n_frames):
                s = min(j * hop, max(0, len(wav) - self.frame))
                seg = wav[s : s + self.frame]
                out[i, j] = float(np.sqrt((seg**2).mean()))
        n = len(refs)
        offs = np.arange(0, (n + 1) * self.n_frames, self.n_frames)
        col = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(out.ravel(), pa.float32())
        )
        return batch.append_column("frame_energy", col)


def route_media(spans_ds, kind: str):
    """Modality router: media-span rows of one kind (the per-kind
    stages above consume the routed stream with kind-appropriate
    batch sizes)."""
    import pyarrow.compute as pc

    return spans_ds.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], kind)), batch_format="pyarrow"
    )


def media_stats(batch: pa.Table) -> pa.Table:
    """Per-batch partial media counts by kind (combiner for the
    modality histogram)."""
    g = batch.group_by("kind").aggregate([([], "count_all")])
    return pa.table({"kind": g["kind"], "n": g["count_all"]})
