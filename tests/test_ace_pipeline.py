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


def test_ace_synth_lines_parse_clean():
    from deepie_ray.sources.ace import parse_ace_line

    for layout14 in (True, False):
        for l in synth.synth_ace_lines(40, seed=9, layout14=layout14):
            row = parse_ace_line(l, strict=True)
            assert row["error"] == ""
            assert row["pos1"] < row["pos2"]
