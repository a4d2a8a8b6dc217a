"""Dictionary-building aggregations (A1/A2/A4/A5), distributed P/R/F1
(A6), model-variant scorers, and checkpoint resume."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from deepie_ray.ops import dicts, metrics


def test_build_dict_deterministic_sorted_ids():
    t = pa.table({"label": ["PHYS", "NONE", "ART", "PHYS", "ORG-AFF"]})
    d = dicts.build_dict(rd.from_arrow(t), "label", seed={"NONE": 0})
    assert d["NONE"] == 0
    assert d == {"NONE": 0, "ART": 1, "ORG-AFF": 2, "PHYS": 3}
    # order-independent: shuffled input -> same dict
    t2 = pa.table({"label": ["ORG-AFF", "PHYS", "NONE", "ART"]})
    assert dicts.build_dict(rd.from_arrow(t2), "label", seed={"NONE": 0}) == d


def test_build_dict_list_column():
    t = pa.table({"feats": [["b", "a"], ["c"], []]})
    d = dicts.build_dict(rd.from_arrow(t), "feats", seed={"Other": 1})
    assert d == {"Other": 1, "a": 2, "b": 3, "c": 4}


def test_column_max():
    t = pa.table({"tokens": [["a", "b"], ["c", "d", "e"]], "dist": [3, 9]})
    m = dicts.column_max(
        rd.from_arrow(t), {"max_len": "tokens", "max_dist": "dist"}
    )
    assert m == {"max_len": 3, "max_dist": 9}


def test_vocab_counts_sentence_set_semantics():
    # "a" twice in one sentence counts ONCE (O4), but across rows sums
    t = pa.table({"tokens": [["a", "a", "b"], ["a", "c"]]})
    out = dicts.vocab_counts(rd.from_arrow(t)).to_pandas()
    got = dict(zip(out["word"], out["n"]))
    assert got == {"a": 2, "b": 1, "c": 1}


def test_binary_feature_cutoff():
    t = pa.table(
        {"binary_features": [["f1", "f2"], ["f1", "f3"], ["f1", "f2"]]}
    )
    d = dicts.binary_feature_dict(rd.from_arrow(t), cutoff=2)
    assert set(d) == {"f1", "f2"}
    assert d["f1"] == 1 and d["f2"] == 2


def test_encode_column():
    t = pa.table({"label": ["x", "y", "zz"]})
    out = dicts.encode_column(
        rd.from_arrow(t), "label", {"x": 5, "y": 6}, "label_id", default=1
    ).to_pandas()
    assert out["label_id"].tolist() == [5, 6, 1]


def test_micro_prf_distributed_matches_hand_count():
    t = pa.table(
        {
            "pred_label": ["PHYS", "NONE", "ART", "PHYS", "NONE"],
            "gold_label": ["PHYS", "PHYS", "NONE", "ART", "NONE"],
        }
    )
    m = metrics.micro_prf_distributed(rd.from_arrow(t))
    # predicted non-NONE: 3 (PHYS, ART, PHYS); gold non-NONE: 3; correct: 1
    assert m["num_pred"] == 3 and m["num_key"] == 3 and m["correct"] == 1
    assert m["precision"] == pytest.approx(1 / 3)
    assert m["f1"] == pytest.approx(1 / 3)


# ------------------------------------------------------- model variants


def test_model_variants_run_and_match_oracle_math():
    from deepie_ray import model as M
    from deepie_ray import pipeline, synth
    from deepie_ray.ops.parse import extract_pairs_fn

    docs_t = synth.generate_documents(40, seed=9)
    docs = rd.from_arrow(docs_t)
    for name in (
        "gru_head", "gru_head_fwd", "cnn", "hybrid", "gru_max", "gru_sum",
        "gru_sum_dep", "gru_att",
        "gru_att_head", "conv_sum", "dual_dep", "ensemble_gru_cnn",
        "stacked_head", "stacked_max", "poe3",
    ):
        out = pipeline.extract_triples_model(
            docs, name, parse_concurrency=1, score_concurrency=1
        ).to_pandas()
        assert len(out) > 0, name
        assert set(out["pred_label"]) <= set(M.LABELS)
        probs = np.array(out["prob"].tolist())
        assert np.allclose(probs.sum(axis=1), 1.0, atol=1e-4), name

    # with_prob=False skips the prob column at the source (no build+drop)
    noprob = pipeline.extract_triples_model(
        docs, "gru_head", parse_concurrency=1, score_concurrency=1, with_prob=False
    ).to_pandas()
    assert "prob" not in noprob.columns
    assert len(noprob) > 0

    # counter= wires CountingStage through BOTH pools (run_kg's model
    # branch must not silently drop lineage, review r3)
    import ray

    counter = metrics.CounterActor.remote()
    counted = pipeline.extract_triples_model(
        docs, "gru_head", parse_concurrency=1, score_concurrency=1,
        with_prob=False, counter=counter,
    ).to_pandas()
    counts = metrics.read_counters(counter)
    assert counts["score"]["rows_out"] == len(counted)
    assert counts["parse"]["rows_in"] == 40  # one per document
    assert counts["parse"]["rows_out"] == counts["score"]["rows_in"]

    # variant parity: distributed == single-process forward on same pairs
    from deepie_ray.ops.parse import extract_pairs_tokens_fn
    from deepie_ray.ops.score import CNNScorer, DualChannelScorer

    pairs = extract_pairs_tokens_fn(docs_t)
    for name, cls in (("cnn", CNNScorer), ("dual_dep", DualChannelScorer)):
        local = cls()(pairs).to_pandas().sort_values("pair_id")
        dist = (
            pipeline.extract_triples_model(
                docs, name, parse_concurrency=1, score_concurrency=1
            )
            .to_pandas()
            .sort_values("pair_id")
        )
        assert local["pred_label"].tolist() == dist["pred_label"].tolist(), name


# ---------------------------------------------------------- checkpoint


def test_checkpoint_resume_skips_recompute(tmp_path):
    from deepie_ray import checkpoint

    import os
    import uuid

    marker_dir = str(tmp_path / "markers")
    os.makedirs(marker_dir)

    def make_ds():
        def bump(t: pa.Table) -> pa.Table:
            # cross-process side effect: recompute leaves a marker file
            with open(os.path.join(marker_dir, uuid.uuid4().hex), "w"):
                pass
            return t

        return rd.range(100).map_batches(bump, batch_format="pyarrow")

    root = str(tmp_path / "ckpt")
    out1 = checkpoint.checkpoint_dataset(make_ds(), root, "stage1")
    assert out1.count() == 100
    assert checkpoint.stage_complete(root, "stage1")
    n_after_first = len(os.listdir(marker_dir))
    assert n_after_first > 0

    # resume: the upstream fn must NOT run again
    out2 = checkpoint.checkpoint_dataset(make_ds(), root, "stage1")
    assert out2.count() == 100
    assert len(os.listdir(marker_dir)) == n_after_first

    lin = checkpoint.read_lineage(root).to_pandas()
    assert (lin["stage"] == "stage1").all()
    assert lin["rows_out"].sum() == 100


def test_checkpoint_partial_write_is_ignored(tmp_path):
    """A killed run leaves data.tmp and no manifest -> stage recomputes."""
    import os

    from deepie_ray import checkpoint

    root = str(tmp_path / "ckpt")
    tmp_dir = os.path.join(root, "stageX", "data.tmp")
    os.makedirs(tmp_dir)
    with open(os.path.join(tmp_dir, "garbage.parquet"), "w") as f:
        f.write("partial")
    assert not checkpoint.stage_complete(root, "stageX")
    out = checkpoint.checkpoint_dataset(
        rd.range(10), root, "stageX"
    )
    assert out.count() == 10
    assert checkpoint.stage_complete(root, "stageX")
