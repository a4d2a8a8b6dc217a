"""deepie_ray — a Ray-Data-native knowledge-graph construction engine.

Brand-new implementation (NOT a port) with the query / data-processing
capabilities of the reference RE system (anoperson/DeepIE ``rnnRE``):
triple extraction -> entity linking -> canonicalization -> graph
materialization, expressed as ``ray.data.Dataset`` pipelines over
zero-copy Arrow batches, with stateful stages as actor pools.

Never calls ``ray.init`` / ``ray.shutdown`` — session ownership belongs
to the caller (driver harness, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
