"""Perceptual media fingerprints + header-only metadata sniffing.

Pins: (a) sniff_media_meta == real decoder dims on every codec,
(b) pHash/audio-fp planted-family detection matches a brute-force
Hamming oracle, (c) partitioning invariance of the distributed pair
join, (d) pHash invariance across lossless re-encoding containers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from deepie_ray.hashing import stable_u32
from deepie_ray.ops import dedup, media


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


# ------------------------------------------------- header sniffing


def test_sniff_matches_decode_all_image_codecs():
    rng = np.random.default_rng(7)
    for trial in range(12):
        h = 5 + int(rng.integers(0, 40))
        w = 5 + int(rng.integers(0, 40))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for enc, fmt in (
            (media.encode_png, "png"),
            (media.encode_bmp, "bmp"),
            (media.encode_ppm, "ppm"),
            (lambda x: media.encode_gif(x & 0xC0), "gif"),
            (lambda x: media.encode_jpeg(x, 90), "jpeg"),
        ):
            data = enc(img)
            sfmt, sh, sw = media.sniff_media_meta(data)
            assert (sfmt, sh, sw) == (fmt, h, w)
            dec = media.decode_image(data)
            assert dec.shape[:2] == (sh, sw)


def test_sniff_matches_decode_wav():
    rng = np.random.default_rng(11)
    for n, rate in ((1600, 16000), (4801, 8000), (320, 44100)):
        data = media.encode_wav(
            rng.standard_normal(n).astype(np.float32) * 0.1, rate=rate
        )
        fmt, n_samples, srate = media.sniff_media_meta(data)
        assert fmt == "wav"
        pcm, drate = media.decode_wav(data)
        assert (n_samples, srate) == (len(pcm), drate)


def test_sniff_rejects_unknown_container():
    import pytest

    with pytest.raises(ValueError):
        media.sniff_media_meta(b"\x00\x01\x02 not a container")


# ------------------------------------------------- pHash properties


def _gray32(img: np.ndarray) -> np.ndarray:
    gray = img.mean(axis=2)
    ys = (np.arange(32) * gray.shape[0] // 32).clip(0, gray.shape[0] - 1)
    xs = (np.arange(32) * gray.shape[1] // 32).clip(0, gray.shape[1] - 1)
    return gray[np.ix_(ys, xs)]


def test_phash_invariant_across_lossless_containers():
    """The same pixels re-encoded PNG/BMP/PPM hash identically."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (20, 28, 3), dtype=np.uint8)
    hashes = set()
    for enc in (media.encode_png, media.encode_bmp, media.encode_ppm):
        dec = media.decode_image(enc(img))
        hashes.add(int(media.phash64(_gray32(dec)[None])[0]))
    assert len(hashes) == 1


def test_phash_noise_robust_structure_sensitive():
    rng = np.random.default_rng(5)
    coarse = rng.integers(30, 226, (8, 8, 3))
    ys = (np.arange(30) * 8 // 30).clip(0, 7)
    xs = (np.arange(30) * 8 // 30).clip(0, 7)
    base = coarse[np.ix_(ys, xs)]
    h_base = int(media.phash64(_gray32(base.astype(np.uint8))[None])[0])
    noisy = np.clip(base + rng.integers(-1, 2, base.shape), 0, 255).astype(
        np.uint8
    )
    assert _ham(h_base, int(media.phash64(_gray32(noisy)[None])[0])) <= 3
    other = rng.integers(30, 226, (8, 8, 3))
    other_img = other[np.ix_(ys, xs)].astype(np.uint8)
    assert _ham(h_base, int(media.phash64(_gray32(other_img)[None])[0])) > 10


def test_phash_survives_lossy_jpeg_reencode():
    """A JPEG re-encode perturbs pixels but the perceptual hash stays
    within near-dup Hamming distance of the lossless original —
    exactly the cross-container dup case pHash exists for."""
    rng = np.random.default_rng(9)
    coarse = rng.integers(20, 236, (6, 6, 3))
    ys = (np.arange(48) * 6 // 48).clip(0, 5)
    xs = (np.arange(48) * 6 // 48).clip(0, 5)
    img = coarse[np.ix_(ys, xs)].astype(np.uint8)
    h_png = int(media.phash64(_gray32(media.decode_image(media.encode_png(img)))[None])[0])
    h_jpg = int(media.phash64(_gray32(media.decode_image(media.encode_jpeg(img, 85)))[None])[0])
    assert _ham(h_png, h_jpg) <= 6


def test_audio_fp_gain_invariant_noise_robust():
    rng = np.random.default_rng(9)
    base = rng.standard_normal(6400)
    fp = media.audio_fp64(0.4 * base)
    assert media.audio_fp64(0.1 * base) == fp  # gain invariance
    noisy = 0.4 * base + 0.01 * rng.standard_normal(6400)
    assert _ham(fp, media.audio_fp64(noisy)) <= 3
    other = rng.standard_normal(6400)
    assert _ham(fp, media.audio_fp64(0.4 * other)) > 8


# --------------------------------------- distributed near-dup parity


def _brute_pairs(sigs: dict[str, int], max_hamming: int) -> set[tuple]:
    refs = sorted(sigs)
    out = set()
    for i in range(len(refs)):
        for j in range(i + 1, len(refs)):
            a, b = refs[i], refs[j]
            if _ham(sigs[a], sigs[b]) <= max_hamming:
                out.add((min(a, b), max(a, b)))
    return out


def _planted_sigs(kind: str, n: int) -> dict[str, int]:
    hasher = media.PerceptualHasher()
    refs = [f"{kind}://t/{i}" for i in range(n)]
    batch = pa.table(
        {
            "kind": pa.array([kind] * n),
            "media_ref": pa.array(refs),
            "payload": pa.array(
                [media.synth_neardup_payload(kind, r) for r in refs],
                pa.binary(),
            ),
        }
    )
    out = hasher(batch)
    return dict(zip(out["media_ref"].to_pylist(), out["sig"].to_pylist()))


def _run_distributed(kind: str, sigs: dict[str, int], parallelism: int):
    tbl = pa.table(
        {
            "media_ref": pa.array(sorted(sigs)),
            "sig": pa.array([sigs[r] for r in sorted(sigs)], pa.int64()),
        }
    )
    ds = rd.from_arrow(tbl).repartition(parallelism)
    pairs = dedup.hamming64_neardup_pairs(
        ds, max_hamming=3, id_col="media_ref", sig_col="sig", n_blocks=4
    ).to_pandas()
    return {
        (min(a, b), max(a, b)) for a, b in zip(pairs["id_a"], pairs["id_b"])
    }


def test_image_phash_neardup_matches_bruteforce():
    sigs = _planted_sigs("image", 120)
    want = _brute_pairs(sigs, 3)
    assert want, "planted families must produce at least one pair"
    got = _run_distributed("image", sigs, 3)
    assert got == want
    # family structure: every planted same-family pair is found
    fam = {
        r: (stable_u32(r, "dupfam:") % 100) % 4
        for r in sigs
        if stable_u32(r, "dupfam:") % 100 < 20
    }
    for a in fam:
        for b in fam:
            if a < b and fam[a] == fam[b]:
                assert (a, b) in got


def test_audio_fp_neardup_matches_bruteforce_partition_invariant():
    sigs = _planted_sigs("audio", 100)
    want = _brute_pairs(sigs, 3)
    assert want
    assert _run_distributed("audio", sigs, 2) == want
    assert _run_distributed("audio", sigs, 7) == want


# ---------------------------------------------------- query smoke


def test_media_queries_end_to_end(sf_dir):
    from deepie_ray import queries as Q

    meta = Q.media_meta_scan(sf_dir).to_pandas()
    assert set(meta.columns) == {"kind", "fmt", "n", "sum_h", "sum_w"}
    assert (meta["n"] > 0).all()
    # image rows split across the four codecs; audio rows are all wav
    assert set(meta.loc[meta["kind"] == "audio", "fmt"]) == {"wav"}
    assert set(meta.loc[meta["kind"] == "image", "fmt"]) <= {
        "png",
        "bmp",
        "gif",
        "ppm",
    }

    img_pairs = Q.image_phash_neardup(sf_dir).to_pandas()
    assert set(img_pairs.columns) == {"id_a", "id_b", "hamming"}
    assert (img_pairs["hamming"] <= 3).all()

    aud_pairs = Q.audio_fp_neardup(sf_dir).to_pandas()
    assert (aud_pairs["hamming"] <= 3).all()


def test_audio_fp_short_pcm_no_crash():
    """Band-edge construction must stay in-bounds at ANY length
    (collapsed geomspace once raised IndexError in reduceat)."""
    rng = np.random.default_rng(31)
    for n in (0, 1, 5, 17, 30, 150, 179, 200, 500):
        sig = media.audio_fp64(rng.standard_normal(n) if n else np.zeros(0))
        assert isinstance(sig, int)
    assert media.audio_fp64(np.zeros(0)) == 0


def test_sniff_batch_truncated_header_fallback():
    """A WAV whose data chunk sits past the 256-byte window must fall
    back to the full payload for that row (never a silent 0)."""
    data = media.encode_wav(np.zeros(400, np.float32))
    # splice a large junk chunk between fmt and data
    junk = b"JUNK" + (300).to_bytes(4, "little") + b"\x00" * 300
    fmt_end = 12 + 8 + 16  # RIFF hdr + fmt chunk (PCM)
    padded = data[:fmt_end] + junk + data[fmt_end:]
    padded = (
        padded[:4]
        + (len(padded) - 8).to_bytes(4, "little")
        + padded[8:]
    )
    batch = pa.table(
        {"payload": pa.array([padded, media.encode_ppm(
            np.zeros((3, 4, 3), np.uint8))], pa.binary())}
    )
    out = media.sniff_meta_batch(batch)
    assert out["fmt"].to_pylist() == ["wav", "ppm"]
    assert out["dim0"].to_pylist()[0] == 400


# ------------------------------------------------- video (animated GIF)


def test_gif_anim_round_trip_and_single_frame_compat():
    rng = np.random.default_rng(41)
    frames = (rng.integers(0, 4, (5, 13, 17, 3)) * 0x40).astype(np.uint8)
    data = media.encode_gif_anim(frames)
    dec = media.decode_gif_frames(data)
    assert dec.shape == frames.shape and (dec == frames).all()
    # single-frame decoder keeps working on animated payloads (frame 0)
    assert (media.decode_gif(data) == frames[0]).all()
    # single-frame GIFs decode to a 1-frame stack
    one = media.encode_gif(frames[0])
    assert (media.decode_gif_frames(one)[0] == frames[0]).all()
    # header sniff sees the logical screen without decode
    assert media.sniff_media_meta(data) == ("gif", 13, 17)


def test_sample_frames_even_spacing():
    frames = np.arange(10)[:, None]
    got, idx = media.sample_frames(frames, 4)
    assert idx.tolist() == [0, 3, 6, 9]
    assert (got.ravel() == [0, 3, 6, 9]).all()
    got, idx = media.sample_frames(frames, 20)  # fewer frames than k
    assert idx.tolist() == list(range(10))
    got, idx = media.sample_frames(frames[:1], 8)
    assert idx.tolist() == [0]


def test_video_family_separation_and_query(sf_dir):
    # planted families: every same-family video pair matches on >= 3
    # frames; unrelated videos match on none
    refs = [f"vid://t/{i}" for i in range(60)]
    hasher = media.VideoFrameHasher()
    batch = pa.table(
        {
            "media_ref": pa.array(refs),
            "payload": pa.array(
                [media.synth_neardup_payload("video", r) for r in refs],
                pa.binary(),
            ),
        }
    )
    rows = hasher(batch)
    sigs: dict[str, list[int]] = {}
    for r, s in zip(rows["media_ref"].to_pylist(), rows["sig"].to_pylist()):
        sigs.setdefault(r, []).append(s)
    fam = {
        r: (stable_u32(r, "dupfam:") % 100) % 4
        for r in refs
        if stable_u32(r, "dupfam:") % 100 < 20
    }
    uniq = [r for r in refs if r not in fam]
    for a in fam:
        for b in fam:
            if a < b and fam[a] == fam[b]:
                matched = sum(
                    1
                    for x in sigs[a]
                    for y in sigs[b]
                    if _ham(x, y) <= 3
                )
                assert matched >= 3, (a, b, matched)
    for a in uniq[:10]:
        for b in uniq[10:20]:
            assert all(
                _ham(x, y) > 3 for x in sigs[a] for y in sigs[b]
            ), (a, b)

    out = __import__("deepie_ray.queries", fromlist=["queries"]).video_phash_neardup(
        sf_dir
    ).to_pandas()
    assert set(out.columns) == {"id_a", "id_b", "n_matched"}
    assert (out["n_matched"] >= 3).all()
    # detected pairs are exactly the same-family span-ref pairs
    from deepie_ray import pipeline
    from deepie_ray.ops.media import explode_media_spans

    spans = (
        pipeline.read_documents(sf_dir)
        .map_batches(explode_media_spans, batch_format="pyarrow")
        .to_pandas()
    )
    vrefs = spans.loc[spans["kind"] == "video", "media_ref"].tolist()
    vfam = {
        r: (stable_u32(r, "dupfam:") % 100) % 4
        for r in vrefs
        if stable_u32(r, "dupfam:") % 100 < 20
    }
    want = {
        (min(a, b), max(a, b))
        for a in vfam
        for b in vfam
        if a < b and vfam[a] == vfam[b]
    }
    got = {(a, b) for a, b in zip(out["id_a"], out["id_b"])}
    assert got == want


# ------------------------------------------------------------ spectrogram


def test_spectrogram_matches_naive_stft():
    from deepie_ray.ops import media

    rng = np.random.default_rng(3)
    x = rng.normal(size=1000)
    P = media.spectrogram(x, n_fft=256, hop=128)
    win = np.hanning(256)
    naive = np.array(
        [
            np.abs(np.fft.rfft(x[i * 128 : i * 128 + 256] * win)) ** 2
            for i in range(1 + (1000 - 256) // 128)
        ]
    )
    assert P.shape == naive.shape
    assert np.allclose(P, naive)


def test_spectral_stats_pure_tone_and_noise():
    from deepie_ray.ops import media

    rate = 16000
    t = np.arange(rate) / rate
    tone = media.audio_spectral_stats(np.sin(2 * np.pi * 1000 * t), rate)
    # a pure 1 kHz tone: centroid at the tone, narrow bandwidth,
    # (near-)zero flux frame to frame
    assert abs(tone["centroid_hz"] - 1000) < 40
    assert tone["bandwidth_hz"] < 60
    assert tone["flux"] < 1e-6
    noise = media.audio_spectral_stats(
        np.random.default_rng(0).normal(size=rate), rate
    )
    assert noise["bandwidth_hz"] > 1000  # broadband
    assert noise["flux"] > 1.0
    silent = media.audio_spectral_stats(np.zeros(500), rate)
    assert silent["centroid_hz"] == 0.0 and silent["flux"] == 0.0
    # shorter than one frame: zero-pads to exactly one frame
    assert media.spectrogram(np.ones(10), n_fft=64, hop=32).shape[0] == 1
