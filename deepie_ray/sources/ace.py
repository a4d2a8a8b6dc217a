"""ACE-style relation-mention TSV source (reference S1 + M1-M6).

Reads the reference's corpus file format (spec:
``rnnRE/data/readMe.md:17-41``; parser semantics:
``rnn_process_onlyExtra.py:283-463``): one TAB-separated line per
relation mention, two layout variants —

* 14-field ("test" layout): field 2 = constituent-tree string,
  field 4 = binary features; sentence/POS/chunk/dep fields at 5-12,
  optional kernel output at 13.
* 12-field ("fold" layout): no tree string; the binary features sit in
  field 2 and fields 5-12 shift down to 4-11 (``data/readMe.md:41``).

Per-line semantics reproduced:

* label normalization (M2): ``PHYS*`` -> ``PHYS``, ``PER-SOC*`` ->
  ``PER-SOC`` (direction collapse for the symmetric relations,
  ``rnn_process_onlyExtra.py:312-313``).
* BIO mention extraction (M3): tokens are ``word/BIO.menType#k``; the
  clean word is everything before the LAST ``/``; mention k's position
  is its LAST token (``data/readMe.md:31``); entity types cross-checked
  against field 3 ``type1@type2``.
* constituent-pair split (M4): per-token ``A--B`` -> two sequences,
  ``__NULL__`` -> ``Other``.
* dep-path normalization (M5): ``word-idx rel word-idx ...`` parsed to
  (words, rels, 0-based idxs); path reversed when indices descend so
  ``dep_idx[0] == pos1``; ``__NULL__`` -> 2-token fallback path.
* underscore normalization (M11): ``_`` -> `` `` in tokens before any
  vocab use.
* alignment validation (the reference's ~15 ``exit()`` checks,
  ``:323-329,352-461``): here violations become rows in an ``errors``
  side-channel column instead of process death (SURVEY §4 stragglers
  row) — set ``strict=True`` to raise.

The output is row-per-mention Arrow with list columns — the engine's
columnar equivalent of the reference's record dict (SURVEY §1.1b).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

ACE_SCHEMA = pa.schema(
    [
        ("rel_id", pa.string()),
        ("gold_label", pa.string()),
        ("type1", pa.string()),
        ("type2", pa.string()),
        ("subtype1", pa.string()),
        ("subtype2", pa.string()),
        ("tokens", pa.list_(pa.string())),
        ("pos1", pa.int32()),          # head = LAST token of mention 1
        ("pos2", pa.int32()),
        ("mention1_idxs", pa.list_(pa.int32())),
        ("mention2_idxs", pa.list_(pa.int32())),
        ("binary_features", pa.list_(pa.string())),
        ("constit1", pa.list_(pa.string())),
        ("constit2", pa.list_(pa.string())),
        ("pos_seq", pa.list_(pa.string())),
        ("chunk_seq", pa.list_(pa.string())),
        ("dep_words", pa.list_(pa.string())),
        ("dep_rels", pa.list_(pa.string())),
        ("dep_idxs", pa.list_(pa.int32())),
        ("dep_rel_sets", pa.list_(pa.list_(pa.string()))),
        ("governors", pa.list_(pa.string())),
        ("kernel_pred", pa.string()),
        ("kernel_scores", pa.string()),
        ("error", pa.string()),        # "" = clean row
    ]
)


def normalize_label(label: str) -> str:
    """M2: collapse direction of the symmetric relations."""
    if label.startswith("PHYS"):
        return "PHYS"
    if label.startswith("PER-SOC"):
        return "PER-SOC"
    return label


def _norm_token(w: str) -> str:
    """M11: underscore -> space."""
    return w.replace("_", " ")


def parse_annotated_sentence(field: str):
    """M3: ``word/BIO.menType#k`` tokens -> (clean_tokens, m1_idxs,
    m2_idxs, mtype1, mtype2).  Marker format: the BIO part may carry
    ``.NAM``/``.NOM``/``.PRO`` and ``#1``/``#2`` suffixes."""
    tokens, m1, m2 = [], [], []
    mtype = {1: "", 2: ""}
    for i, raw in enumerate(field.split()):
        cut = raw.rfind("/")
        if cut <= 0:
            raise ValueError(f"token {i} missing /BIO annotation: {raw!r}")
        word, tag = raw[:cut], raw[cut + 1 :]
        which = 0
        if tag.endswith("#1"):
            which, tag = 1, tag[:-2]
        elif tag.endswith("#2"):
            which, tag = 2, tag[:-2]
        if which:
            dot = tag.rfind(".")
            if dot >= 0:
                mtype[which] = tag[dot + 1 :]
                tag = tag[:dot]
            (m1 if which == 1 else m2).append(i)
        tokens.append(_norm_token(word))
    if not m1 or not m2:
        raise ValueError("sentence lacks #1/#2 mention markers")
    return tokens, m1, m2, mtype[1], mtype[2]


def parse_constit_pairs(field: str):
    """M4: per-token ``A--B`` -> two aligned sequences."""
    c1, c2 = [], []
    for tok in field.split():
        if tok == "__NULL__":
            c1.append("Other")
            c2.append("Other")
            continue
        cut = tok.find("--")
        if cut < 0:
            raise ValueError(f"constit pair missing '--': {tok!r}")
        c1.append(tok[:cut] or "Other")
        c2.append(tok[cut + 2 :] or "Other")
    return c1, c2


def parse_dep_path(field: str, pos1: int, pos2: int):
    """M5: ``word-idx rel word-idx ...`` -> (words, rels, idxs);
    reversed if idxs descend (order normalization: dep_idxs[0] must be
    pos1); ``__NULL__`` -> fallback 2-token path."""
    if field == "__NULL__" or not field.strip():
        return ["", ""], ["__fallback__"], [pos1, pos2]
    parts = field.split()
    words, idxs, rels = [], [], []
    for j, p in enumerate(parts):
        if j % 2 == 0:
            cut = p.rfind("-")
            if cut <= 0:
                raise ValueError(f"dep-path node missing -idx: {p!r}")
            words.append(_norm_token(p[:cut]))
            idxs.append(int(p[cut + 1 :]) - 1)  # 1-based -> 0-based
        else:
            rels.append(p)
    if len(words) != len(rels) + 1:
        raise ValueError("dep path arity mismatch")
    if len(idxs) >= 2 and idxs[0] > idxs[-1]:
        words.reverse()
        idxs.reverse()
        rels.reverse()
    return words, rels, idxs


def parse_kernel(field: str):
    """Optional field 13: ``PRED  label:score ...``."""
    parts = field.split()
    if not parts:
        return "", ""
    return parts[0], " ".join(parts[1:])


def kernel_score_vector(score_str: str) -> list[float]:
    """J3 re-key (``rnn_process_onlyExtra.py:267-275`` — commented out
    in the reference, live here): ``label:score ...`` -> fixed-order
    float vector over ``model.LABELS``; absent labels keep the
    reference default -1.0; an unknown label raises (the reference
    exits with 'cannot find label in dict').  The empty string (no
    field 13) yields the all--1.0 vector — the reference's zeroed
    input, which the hybrid softmax cancels exactly."""
    from ..model import LABEL_TO_ID, N_LABELS

    kers = [-1.0] * N_LABELS
    for e in score_str.split():
        cut = e.rfind(":")
        if cut < 0:
            raise ValueError(f"bad kernel score entry: {e!r}")
        k = e[:cut]
        if k not in LABEL_TO_ID:
            raise ValueError(f"cannot find label in dict: {k}")
        kers[LABEL_TO_ID[k]] = float(e[cut + 1 :])
    return kers


def parse_ace_line(line: str, strict: bool = False) -> dict:
    """One TSV line -> one ACE_SCHEMA row dict.  Layout auto-detected
    by field count (14/13 = test layout, 12 = fold layout)."""
    empty = {f.name: ([] if pa.types.is_list(f.type) else "") for f in ACE_SCHEMA}
    empty["pos1"] = empty["pos2"] = -1
    row = dict(empty)
    fields = line.rstrip("\n").split("\t")
    try:
        if len(fields) >= 13:
            (rel_id, label, _tree, typepair, binfeat, sent, constit,
             posseq, chunkseq, deppath, deprels, govs, _deptriples) = fields[:13]
            kernel = fields[13] if len(fields) > 13 else ""
        elif len(fields) == 12:
            (rel_id, label, binfeat, typepair, sent, constit,
             posseq, chunkseq, deppath, deprels, govs, _deptriples) = fields
            kernel = ""
        else:
            raise ValueError(f"expected 12 or 13/14 fields, got {len(fields)}")

        row["rel_id"] = rel_id
        row["gold_label"] = normalize_label(label)

        t1t2 = typepair.split("@")
        if len(t1t2) != 2:
            raise ValueError(f"bad type pair: {typepair!r}")

        def split_type(t):
            cut = t.find(":")
            return (t, "") if cut < 0 else (t[:cut], t[cut + 1 :])

        row["type1"], row["subtype1"] = split_type(t1t2[0])
        row["type2"], row["subtype2"] = split_type(t1t2[1])

        tokens, m1, m2, _, _ = parse_annotated_sentence(sent)
        row["tokens"] = tokens
        row["mention1_idxs"], row["mention2_idxs"] = m1, m2
        row["pos1"], row["pos2"] = m1[-1], m2[-1]  # head = last token

        c1, c2 = parse_constit_pairs(constit)
        row["constit1"], row["constit2"] = c1, c2
        row["pos_seq"] = posseq.split()
        row["chunk_seq"] = chunkseq.split()
        row["dep_rel_sets"] = [s.split("@") for s in deprels.split()]
        row["governors"] = [_norm_token(g) for g in govs.split()]

        dw, dr, di = parse_dep_path(deppath, row["pos1"], row["pos2"])
        row["dep_words"], row["dep_rels"], row["dep_idxs"] = dw, dr, di

        # binary features: drop the leading qid:* field (data/readMe.md)
        bf = binfeat.split()
        row["binary_features"] = [f for f in bf if not f.startswith("qid:")]

        row["kernel_pred"], row["kernel_scores"] = parse_kernel(kernel)

        # alignment validation (the reference's hard exits)
        n = len(tokens)
        for name in ("constit1", "pos_seq", "chunk_seq", "dep_rel_sets", "governors"):
            if len(row[name]) != n:
                raise ValueError(f"{name} length {len(row[name])} != {n} tokens")
        if di and (di[0] != row["pos1"] or di[-1] != row["pos2"]):
            if dr != ["__fallback__"]:
                raise ValueError("dep path endpoints != mention heads")
    except (ValueError, IndexError) as e:
        if strict:
            raise
        row = dict(empty)
        row["rel_id"] = fields[0] if fields else ""
        row["error"] = str(e)
    return row


def parse_ace_batch(batch: pa.Table, strict: bool = False) -> pa.Table:
    """map_batches stage over read_text lines."""
    rows = [parse_ace_line(l, strict) for l in batch["text"].to_pylist() if l.strip()]
    if not rows:
        return ACE_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=ACE_SCHEMA)


def read_ace(paths, strict: bool = False) -> rd.Dataset:
    """S1: stream ACE TSV file(s) -> row-per-mention Dataset."""
    lines = rd.read_text(paths)
    return lines.map_batches(
        lambda t: parse_ace_batch(t, strict), batch_format="pyarrow"
    )
