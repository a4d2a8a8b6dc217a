"""J3/T6 kernel-score expert (round-4 verdict #5): the optional
``exp(kernelScore)`` factor of the reference hybrid model
(rnnReModels.py:1144-1146), fed by the field-13 re-key
(rnn_process_onlyExtra.py:267-275 — commented out in the reference,
live here)."""

import numpy as np
import pyarrow as pa

from deepie_ray import model as M
from deepie_ray import synth
from deepie_ray.ops import parse
from deepie_ray.ops.score import (
    HybridKernelScorer,
    HybridScorer,
    MODELS,
    NEEDS_TOKENS,
    attach_kernel_scores,
)
from deepie_ray.sources.ace import kernel_score_vector


def _pairs_batch(n_docs=60):
    docs = synth.generate_documents(n_docs, seed=3)
    return parse.extract_pairs_fn(docs, with_tokens=True)


def _with_kernel(batch, vec):
    n = len(batch)
    off = np.arange(0, (n + 1) * M.N_LABELS, M.N_LABELS, dtype=np.int32)
    vals = np.tile(np.asarray(vec, np.float32), n)
    col = pa.ListArray.from_arrays(
        pa.array(off, pa.int32()), pa.array(vals, pa.float32())
    )
    return batch.append_column("kernel_scores", col)


def test_constant_kernel_matches_plain_hybrid():
    """The reference zeroes kernelScore to a constant [-1.0]*nc vector;
    a constant log-bias cancels in the stabilized softmax, so hybrid
    with the zeroed kernel == hybrid without the column: every
    non-prob column bitwise, probabilities to float rounding (the
    add-then-subtract shift rounds each float once)."""
    batch = _pairs_batch()
    plain = HybridScorer()(batch)
    zeroed = HybridScorer()(_with_kernel(batch, [-1.0] * M.N_LABELS))
    assert plain.drop_columns(["prob"]).equals(zeroed.drop_columns(["prob"]))
    pp = np.array(plain["prob"].to_pylist())
    zp = np.array(zeroed["prob"].to_pylist())
    assert np.allclose(pp, zp, atol=1e-6)


def test_kernel_bias_steers_predictions():
    """A strong kernel score on one label dominates the product —
    every pair flips to that label."""
    batch = _pairs_batch(20)
    target = 2  # an arbitrary non-NONE label id
    vec = [-1.0] * M.N_LABELS
    vec[target] = 25.0
    out = HybridScorer()(_with_kernel(batch, vec))
    labels = set(out["pred_label"].to_pylist())
    assert labels == {M.LABELS[target]}


def test_kernel_rekey_matches_reference_semantics():
    """'label:score ...' -> fixed-order vector over model.LABELS with
    -1.0 defaults; unknown labels raise (the reference exits)."""
    s = f"{M.LABELS[1]}:0.5 {M.LABELS[3]}:-0.25"
    v = kernel_score_vector(s)
    assert len(v) == M.N_LABELS
    assert v[1] == 0.5 and v[3] == -0.25
    assert all(x == -1.0 for i, x in enumerate(v) if i not in (1, 3))
    assert kernel_score_vector("") == [-1.0] * M.N_LABELS
    import pytest

    with pytest.raises(ValueError, match="cannot find label"):
        kernel_score_vector("NOT_A_LABEL:1.0")


def test_rekey_roundtrips_synth_field13():
    """synth's with_kernel ACE lines carry field 13 in label:score
    form over LABELS — the re-key recovers every score at the label's
    fixed index."""
    from deepie_ray.sources.ace import parse_ace_line

    lines = synth.synth_ace_lines(10, seed=5, layout14=True, with_kernel=True)
    checked = 0
    for line in lines:
        row = parse_ace_line(line)
        if row.get("error"):
            continue
        v = kernel_score_vector(row["kernel_scores"])
        for entry in row["kernel_scores"].split():
            k = entry[: entry.rfind(":")]
            sc = float(entry[entry.rfind(":") + 1 :])
            assert v[M.LABEL_TO_ID[k]] == sc
            checked += 1
    assert checked > 10


def test_hybrid_kernel_registry_and_determinism():
    assert "hybrid_kernel" in MODELS and "hybrid_kernel" in NEEDS_TOKENS
    batch = _pairs_batch(30)
    a = HybridKernelScorer()(batch)
    b = HybridKernelScorer()(batch)
    assert a.equals(b)
    # the synthetic kernel genuinely moves SOME predictions vs plain
    plain = HybridScorer()(batch)
    assert a["pred_label"].to_pylist() != plain["pred_label"].to_pylist()
    # and attach is content-addressed: same scores under any row order
    perm = np.random.default_rng(0).permutation(len(batch))
    k1 = attach_kernel_scores(batch)["kernel_scores"].to_pylist()
    k2 = attach_kernel_scores(batch.take(pa.array(perm)))["kernel_scores"].to_pylist()
    assert [k1[i] for i in perm] == k2


def test_hybrid_kernel_query_entry(ray_session, sf_dir):
    import __ray_entry__ as e

    out = e.queries()["kg_triples_hybrid_kernel"](sf_dir)
    t = out.to_pandas()
    assert len(t) > 0
    assert "pred_label" in t.columns and "NONE" not in set(t["pred_label"])
