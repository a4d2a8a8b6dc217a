"""Recommended DataContext settings + block-count policy.

Measured on this Ray build (2.49, single node, 32 cpus, sf0.1):

* Shuffle cost is driven by BLOCK COUNT, not strategy: a 147k-group
  aggregate over 64 input blocks took 31s; the same data in 16-32
  blocks takes 7-8s (sort shuffle).  HASH_SHUFFLE matches that (8s)
  but spawns persistent aggregator actors per shuffle — across a
  30-query session workers accumulated into the hundreds and the whole
  suite slowed down >3x, so we stay on the default sort shuffle and
  size blocks instead.
* ``Dataset.join`` cost follows the same rule: 600k x 150k join = 0.8s
  with 8-block inputs / num_partitions=8, but 105s with 64-block
  inputs / num_partitions=32.  Keep join partitions ~= a few per node,
  not per core.
* ``Dataset.join`` spawns HashShuffleAggregator actors per join that
  linger for the session; join-heavy pipelines run back-to-back get
  measurably slower per run (observed: identical near-dedup runs 17.6s
  then 26.0s).  Minimize join count per pipeline (hoist loop-invariant
  streams, size-gate component steps) rather than re-tuning partitions.
* Ray joins CANNOT finalize zero-row partitions (ArrowInvalid "no
  match for key field") and shuffle operators emit ZERO-COLUMN blocks
  for empty partitions which propagate through map stages; every join
  input needs a repartition and every possibly-empty side needs a
  count-guard (see ops/dedup.py, ops/joins.py).

Policy: reads of *small-to-medium* tables override to
``read_blocks()`` blocks (enough for task parallelism, few enough for
cheap shuffles).  At real 100TB scale, leave Ray's size-based default
(128 MiB target blocks) and keep shuffle partitions at a few per NODE.
"""

from __future__ import annotations


# Actor pools whose constructors hold object-store refs (broadcast
# weights/queries/filters) cannot be restarted in place -- Ray's
# core_worker logs an E-level warning per pool when max_restarts > 0
# (ray-project/ray#53727).  Failure recovery for map stages is the
# streaming executor's task retry on a fresh actor, so pin restarts off.
POOL_REMOTE_ARGS = {"max_restarts": 0}


def read_blocks(lo: int = 8, hi: int = 32) -> int:
    """Block count for benchmark-scale reads: ~1 per cpu, in [lo, hi]."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(lo, min(hi, cpus))


# Above this input size Ray's own 128 MiB-target size-based splitting
# already yields >= 8 blocks, so the small-scale override would only
# FIGHT the size-based default (fewer, oversized blocks).  Scale-keyed
# (round-4 verdict #6): below -> read_blocks(); above -> None (leave
# Ray's default — the 100-TB path), same code path at both scales.
SIZE_KEYED_BLOCK_CUTOFF = 1 << 30  # 1 GiB


def override_blocks_for(path) -> int | None:
    """``override_num_blocks`` value for reading ``path``: the
    benchmark-scale block count for small inputs, ``None`` (Ray's
    size-based default) once the input is large enough to split
    itself.  ``path`` may be a file or a directory of parts.  A
    remote URI (``s3://...`` — not stat-able locally) is assumed
    LARGE: forcing <=32 oversized blocks on object storage is exactly
    the failure the size key exists to avoid, so defer to Ray."""
    import os

    if "://" in str(path):
        return None
    try:
        if os.path.isdir(path):
            size = sum(
                e.stat().st_size for e in os.scandir(path) if e.is_file()
            )
        else:
            size = os.path.getsize(path)
    except OSError:
        return read_blocks()
    return None if size >= SIZE_KEYED_BLOCK_CUTOFF else read_blocks()


def apply_recommended_context() -> None:
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
