"""gru4rec_tpu — a TPU-native session-based recommendation framework.

A from-scratch JAX/XLA/Pallas re-design with the full capability surface of
the reference GRU4Rec implementation (Hidasi et al., ICLR 2016 + CIKM 2018
top-k gains), built TPU-first:

* the session-parallel mini-batch scheme (reference: gru4rec.py:587-651) is
  precomputed host-side into dense fixed-shape step arrays and executed as a
  ``lax.scan`` over step chunks on device — no per-step host round trips,
  no retracing, masked lanes instead of physical batch shrinkage;
* negative sampling (pop^alpha, reference: gru4rec.py:542-566) runs in-graph
  (uniforms + searchsorted) once per chunk — the device-resident sample
  store becomes scan-carried data;
* row-sparse optimizer updates are deterministic (sort + segment-sum dedup)
  instead of the reference's nondeterministic atomics;
* scaling is native ``jax.sharding``/``shard_map`` over a (data, model)
  mesh: lanes are data-parallel, item tables (Wy/By/E) row-sharded.
"""

__version__ = "0.1.0"

from gru4rec_tpu.config import GRU4RecConfig
from gru4rec_tpu.models.gru4rec import GRU4Rec

__all__ = ["GRU4Rec", "GRU4RecConfig", "__version__"]
