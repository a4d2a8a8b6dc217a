"""Reference-shaped ACE workflow: distributed == single-threaded oracle
(the composition test for S1 + A5 + M12 + T3 + A6)."""

import pyarrow as pa

from deepie_ray import ace_pipeline, synth
from deepie_ray.oracle.kg import micro_prf


def test_ace_corpus_scoring_matches_oracle(tmp_path):
    lines = synth.synth_ace_lines(120, seed=3)
    # mix in the 12-field fold layout to exercise both parsers
    lines += synth.synth_ace_lines(30, seed=4, layout14=False, id_offset=1000)
    p = tmp_path / "corpus.full.txt"
    p.write_text("\n".join(lines) + "\n")

    scored, prf, fdict = ace_pipeline.score_ace_corpus(str(p), cutoff=2)
    gold = ace_pipeline.oracle_score_ace(lines, cutoff=2)

    got = {
        r["pair_id"]: r["pred_label"]
        for r in scored.select_columns(["pair_id", "pred_label"]).take_all()
    }
    want = {
        r["pair_id"]: r["pred_label"] for r in gold.to_pylist()
    }
    assert got == want  # exact prediction parity

    # feature dict: deterministic sorted ids with cutoff applied
    assert all(v >= 1 for v in fdict.values())
    assert list(fdict.values()) == sorted(fdict.values())

    # distributed PRF == oracle PRF (A6 semantics)
    o = micro_prf(
        gold.rename_columns(["pair_id", "gold_label", "pred_label"]).select(
            ["pair_id", "pred_label"]
        ),
        gold.select(["pair_id", "gold_label"]).rename_columns(
            ["pair_id", "pred_label"]
        ),
    )
    assert abs(prf["precision"] - o["precision"]) < 1e-9
    assert abs(prf["recall"] - o["recall"]) < 1e-9
    assert prf["num_key"] > 0


def test_ace_kernel_expert_matches_oracle(tmp_path):
    """Kernel-score expert (J3/T6): parsed field-13 scores re-keyed
    through the label dict multiply into the hybrid as exp(kernelScore);
    distributed == oracle, and the expert actually changes predictions
    somewhere in the corpus."""
    lines = synth.synth_ace_lines(100, seed=5, with_kernel=True)
    p = tmp_path / "kernel.full.txt"
    p.write_text("\n".join(lines) + "\n")

    scored, prf, _ = ace_pipeline.score_ace_corpus(str(p), cutoff=2, use_kernel=True)
    gold = ace_pipeline.oracle_score_ace(lines, cutoff=2, use_kernel=True)
    got = {
        r["pair_id"]: r["pred_label"]
        for r in scored.select_columns(["pair_id", "pred_label"]).take_all()
    }
    want = {r["pair_id"]: r["pred_label"] for r in gold.to_pylist()}
    assert got == want

    # the kernel expert is not a no-op: predictions differ vs no-kernel
    base = ace_pipeline.oracle_score_ace(lines, cutoff=2, use_kernel=False)
    b = [r["pred_label"] for r in base.to_pylist()]
    k = [r["pred_label"] for r in gold.to_pylist()]
    assert b != k


def test_ace_dual_channel_uses_real_dep_path():
    """The -dep channel consumes the PARSED dep path (M6 gather at
    dep_idxs), not the span fallback: on synth lines the dep path is
    the 2-node head pair, which differs from the [pos1,pos2] span when
    the mentions are non-adjacent — so the two dep views must produce
    different distributions, and batch padding must not matter."""
    import numpy as np

    from deepie_ray import model as M
    from deepie_ray.sources.ace import parse_ace_line

    lines = synth.synth_ace_lines(30, seed=7)
    rows = [parse_ace_line(l, strict=True) for l in lines]
    batch = pa.Table.from_pylist(rows)
    token_ids, lengths, pos1, pos2, dep_view = ace_pipeline.ace_dep_view(batch)
    # dep view holds each row's real path (2 nodes on synth lines)
    assert (dep_view[1] == 2).all()
    w = M.init_dual_weights()
    _, p_real = M.dual_channel_forward(
        w, token_ids, pos1, pos2, lengths, dep_view=dep_view
    )
    _, p_span = M.dual_channel_forward(w, token_ids, pos1, pos2, lengths)
    wide = pos2 - pos1 > 1  # rows where path != span
    assert wide.any()
    assert not np.allclose(p_real[wide], p_span[wide])
    # adjacent mentions: path == span == 2 tokens -> identical output
    adj = pos2 - pos1 == 1
    if adj.any():
        assert np.allclose(p_real[adj], p_span[adj], atol=1e-6)

    scored = ace_pipeline.AceDualChannelScorer()(batch)
    assert "pred_label" in scored.column_names
    assert len(scored) == len(batch)


def test_ace_full_channel_scorer(tmp_path):
    """Full M13 channel set: word + POS/chunk/constit one-hot + grammar
    multi-hot through the CNN; channels genuinely contribute (altering
    the grammar channel changes some prediction), and the scorer runs
    distributed over the parsed corpus."""
    import numpy as np
    import ray.data as rd

    from deepie_ray.sources.ace import parse_ace_line

    lines = synth.synth_ace_lines(60, seed=11)
    rows = [parse_ace_line(l, strict=True) for l in lines]
    batch = pa.Table.from_pylist(rows)
    ds = rd.from_arrow(batch)
    dicts = ace_pipeline.build_ace_channel_dicts(ds)
    assert all(len(d) >= 1 for d in dicts.values())
    # ids deterministic sorted
    for d in dicts.values():
        assert list(d.values()) == sorted(d.values())

    scorer = ace_pipeline.AceFullChannelScorer(dicts)
    out = scorer(batch)
    assert len(out) == len(batch)

    # distributed run matches the single-process call
    dist = ds.map_batches(
        lambda t: ace_pipeline.AceFullChannelScorer(dicts)(t),
        batch_format="pyarrow",
    ).to_pandas().sort_values("rel_id")
    local = out.to_pandas().sort_values("rel_id")
    assert dist["pred_label"].tolist() == local["pred_label"].tolist()

    # grammar channel is consumed: zeroing it shifts predictions somewhere
    batch2 = batch.set_column(
        batch.schema.get_field_index("dep_rel_sets"),
        "dep_rel_sets",
        pa.array(
            [[[] for _ in row] for row in batch["dep_rel_sets"].to_pylist()],
            pa.list_(pa.list_(pa.string())),
        ),
    )
    out2 = scorer(batch2).to_pandas()
    assert out2["pred_label"].tolist() != local["pred_label"].tolist()


def test_ace_onehot_cnn_scorer_runs():
    from deepie_ray.sources.ace import parse_ace_line

    lines = synth.synth_ace_lines(20, seed=8)
    rows = [parse_ace_line(l, strict=True) for l in lines]
    batch = pa.Table.from_pylist(rows)
    pos_tags = sorted({p for r in rows for p in r["pos_seq"]})
    pos_dict = {p: i for i, p in enumerate(pos_tags, 1)}
    scored = ace_pipeline.AceOneHotCNNScorer(pos_dict)(batch)
    assert len(scored) == len(batch)
    assert "pred_label" in scored.column_names


def test_kernel_score_matrix_parses_and_rekeys():
    from deepie_ray import model as M

    rows = ["PHYS:1.5 NONE:-0.25 BOGUS:9.9", "", "PER-SOC:0.75"]
    K = ace_pipeline.kernel_score_matrix(rows)
    assert K.shape == (3, M.N_LABELS)
    assert K[0, M.LABEL_TO_ID["PHYS"]] == 1.5
    assert K[0, M.LABEL_TO_ID["NONE"]] == -0.25
    assert K[0].sum() == 1.25  # unknown labels dropped (zero-fill)
    assert (K[1] == 0).all()
    assert K[2, M.LABEL_TO_ID["PER-SOC"]] == 0.75


def test_ace_synth_lines_parse_clean():
    from deepie_ray.sources.ace import parse_ace_line

    for layout14 in (True, False):
        for l in synth.synth_ace_lines(40, seed=9, layout14=layout14):
            row = parse_ace_line(l, strict=True)
            assert row["error"] == ""
            assert row["pos1"] < row["pos2"]
