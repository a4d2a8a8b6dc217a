"""Arrow schemas for every stage-boundary table (SURVEY.md §1.4).

Authoritative input shape is BASELINE.json ``input_hint``:
``doc_id:string, spans:array<struct<kind,text,media_ref,offset:int32>>``.

Lance is not installed in this environment (SURVEY.md §7.6.4); the
storage layer is Parquet with identical schemas.  ``write_table`` /
``read_table`` below isolate the format choice so a Lance backend can
slot in without touching pipeline code.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),       # "text" | "image" | "audio" | "table"
        ("text", pa.string()),       # non-empty iff kind == "text"
        ("media_ref", pa.string()),  # non-empty iff kind != "text"
        ("offset", pa.int32()),      # monotonically increasing within a doc
    ]
)

DOCUMENTS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# one row per candidate mention pair (reference: one TSV line, SURVEY §1.1a)
PAIRS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("pair_id", pa.string()),
        ("sent_id", pa.int32()),
        ("subj", pa.string()),
        ("subj_type", pa.string()),
        ("obj", pa.string()),
        ("obj_type", pa.string()),
        ("pos1", pa.int32()),
        ("pos2", pa.int32()),
        ("n_tokens", pa.int32()),
        ("feat_ids", pa.list_(pa.int32())),  # hashed sparse binary features (M16 layout -> Arrow list)
        ("head1_id", pa.int32()),            # hashed head-word ids (J1 lookup, hashing trick)
        ("head2_id", pa.int32()),
    ]
)

# reference emitted-triple sink (.best.txt + .prob, SURVEY §1.1f) as a table.
# ``prob`` (the .prob sink, S7) is OPTIONAL on the emitted path: only the
# probability-sink consumer needs it, and dropping it from the extraction
# output cuts ~1/3 of the bytes every triple pushes through the object
# store (the measured scaling bottleneck on a shared single-node plasma).
TRIPLES = pa.schema(
    [
        ("doc_id", pa.string()),
        ("pair_id", pa.string()),
        ("subj", pa.string()),
        ("subj_type", pa.string()),
        ("pred_label", pa.string()),
        ("obj", pa.string()),
        ("obj_type", pa.string()),
        ("prob", pa.list_(pa.float32())),    # per-class probabilities, order = model.LABELS
    ]
)

TRIPLES_NOPROB = pa.schema([f for f in TRIPLES if f.name != "prob"])

LINKED_TRIPLES = pa.schema(
    [
        ("doc_id", pa.string()),
        ("pair_id", pa.string()),
        ("subj", pa.string()),
        ("subj_type", pa.string()),
        ("subj_entity", pa.string()),
        ("pred_label", pa.string()),
        ("obj", pa.string()),
        ("obj_type", pa.string()),
        ("obj_entity", pa.string()),
        ("link_score", pa.float32()),
    ]
)

NODES = pa.schema(
    [
        ("entity_id", pa.string()),     # canonical id after connected components
        ("surface", pa.string()),       # representative surface form (lexicographic min)
        ("entity_type", pa.string()),
        ("n_mentions", pa.int64()),
    ]
)

EDGES = pa.schema(
    [
        ("subj_entity", pa.string()),
        ("pred_label", pa.string()),
        ("obj_entity", pa.string()),
        ("weight", pa.int64()),         # deduped multiplicity
    ]
)

LINEAGE = pa.schema(
    [
        ("run_id", pa.string()),
        ("stage", pa.string()),
        ("part_id", pa.int32()),
        ("rows_in", pa.int64()),
        ("rows_out", pa.int64()),
        ("counters", pa.string()),      # JSON
        ("wall_ms", pa.int64()),
    ]
)

ALIASES = pa.schema(
    [
        ("alias", pa.string()),
        ("entity_id", pa.string()),
        ("entity_type", pa.string()),
        ("prior", pa.float32()),
    ]
)


def write_table(table: pa.Table, path: str) -> None:
    """Format shim: Lance when available, else Parquet (same schema)."""
    try:
        import lance  # noqa: F401

        lance.write_dataset(table, path, mode="overwrite")
    except ImportError:
        import pyarrow.parquet as pq

        pq.write_table(table, path if path.endswith(".parquet") else path + ".parquet")


def read_table(path: str) -> pa.Table:
    try:
        import lance

        return lance.dataset(path).to_table()
    except ImportError:
        import pyarrow.parquet as pq

        return pq.read_table(path if path.endswith(".parquet") else path + ".parquet")
