"""Weak-scaling benchmark over the device mesh (SURVEY.md §7 step 6).

For each data-parallel width d (1..n_devices), trains the flagship shape
with a proportionally larger global batch (fixed per-device batch) and
reports events/s. On a single-chip environment this prints one row; on a
pod slice it exposes the DP scaling curve (ICI psum of dense grads +
shard-local sparse updates; see parallel/dist_step.py).

Run with JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
to exercise the mechanism (not the performance) on a virtual mesh.

Prints one JSON line per mesh width:
  {"devices": d, "batch": B, "value": events_per_s, "unit": "events/s"}
"""

import json
import sys
import time

import numpy as np
import pandas as pd

N_ITEMS = 36_968
PER_DEVICE_BATCH = 80


def synth_data(n_events, seed=0):
    rng = np.random.RandomState(seed)
    n_sessions = int(n_events / 5.5)
    lens = 2 + rng.geometric(1.0 / 3.5, size=n_sessions)
    total = int(lens.sum())
    ranks = np.arange(1, N_ITEMS + 1, dtype=np.float64)
    p = 1.0 / ranks**0.8
    p /= p.sum()
    items = rng.choice(N_ITEMS, size=total, p=p).astype(np.int64)
    sess = np.repeat(np.arange(n_sessions, dtype=np.int64), lens)
    return pd.DataFrame(
        {"SessionId": sess, "ItemId": items, "Time": np.arange(total, dtype=np.int64)}
    )


def _apply_platform_env():
    # A site-installed accelerator plugin registers itself before this
    # process reads its environment, after which the JAX_PLATFORMS env var
    # alone is silently ignored; apply it explicitly (same as cli/run.py)
    # so the documented virtual-mesh invocation actually runs on CPU.
    import os

    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    _apply_platform_env()
    import contextlib
    import io

    import jax

    from gru4rec_tpu import GRU4Rec, GRU4RecConfig
    from gru4rec_tpu.parallel.mesh import make_mesh

    n_dev = len(jax.devices())
    data = synth_data(400_000)
    widths = [d for d in (1, 2, 4, 8, 16) if d <= n_dev]
    for d in widths:
        B = PER_DEVICE_BATCH * d
        cfg = GRU4RecConfig(
            loss="bpr-max", final_act="elu-0.5", layers=[224], batch_size=B,
            n_sample=2048, sample_alpha=0.4, bpreg=1.95, learning_rate=0.05,
            momentum=0.4, constrained_embedding=True, n_epochs=3, chunk_size=256,
        )
        model = GRU4Rec(cfg)
        mesh = make_mesh(d, 1) if d > 1 else None
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            model.fit(data, n_epochs=3, mesh=mesh)
        print(buf.getvalue(), file=sys.stderr)
        warm = model.epoch_stats[1:]
        eps = sum(e["events"] for e in warm) / sum(e["seconds"] for e in warm)
        print(json.dumps({
            "devices": d, "batch": B, "value": round(eps, 1), "unit": "events/s",
        }))


if __name__ == "__main__":
    main()
