"""BPE training parity with a hand-traced reference and encode
round-trip invariants."""

import pandas as pd
import pyarrow as pa

from deepie_ray.ops import bpe


def test_learn_merges_hand_traced():
    # vocab: 'aaab' x3, 'aab' x2  -> pair counts:
    # (a,a): 3*2 + 2*1 = 8, (a,b): 3+2 = 5 -> first merge ('a','a')
    # then seqs: [aa,a,b]x3, [aa,b]x2 -> (aa,a):3, (a,b):3, (aa,b):2
    #   tie 3/3 -> lexicographic: ('a','b') wins
    vocab = pd.DataFrame({"w": ["aaab", "aab"], "n": [3, 2]})
    merges = bpe.learn_merges(vocab, n_merges=2)
    assert merges == [("a", "a"), ("a", "b")]


def test_train_bpe_distributed_matches_local_reference():
    import ray.data as rd

    texts = ["low lower lowest", "new newer newest", "low low new"]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    ds = rd.from_arrow(t).repartition(3)
    got = bpe.train_bpe(ds, n_merges=10)
    # local reference: explicit word counts, same induction
    from collections import Counter

    wc = Counter(w for s in texts for w in s.split())
    vocab = pd.DataFrame(
        {"w": list(wc.keys()), "n": list(wc.values())}
    ).sort_values("w").reset_index(drop=True)
    want = bpe.learn_merges(vocab, n_merges=10)
    assert got == want


def test_bpe_token_counts_apply():
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["aaab aab", "zz"]),
        }
    )
    ds = rd.from_arrow(t)
    # merges: (a,a) then (a,b): 'aaab' -> [aa, ab] = 2 symbols,
    # 'aab' -> [aa, b]? apply greedy by rank: 'aab' = a,a,b ->
    # rank0 (a,a): [aa, b]; no (aa,b) merge -> 2. 'zz' unmerged -> 2.
    out = (
        bpe.bpe_token_counts(ds, [("a", "a"), ("a", "b")])
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "n_bpe_tokens"] == 4  # 2 + 2
    assert out.loc[2, "n_bpe_tokens"] == 2  # no applicable merges


def test_learn_merges_empty_and_singlechar():
    vocab = pd.DataFrame({"w": ["a", "b"], "n": [5, 3]})
    assert bpe.learn_merges(vocab, n_merges=5) == []  # no pairs exist
