"""Headline benchmark: training throughput on the RetailRocket best-config.

The reference's flagship number (BASELINE.md): GRU-224, batch 80, bpr-max,
2048 extra negatives, constrained embedding — ~81,400 events/s (~6.8 s/epoch,
~1,026 mb/s) on an NVIDIA A30 (reference README.md:153-163).

RetailRocket itself cannot be downloaded in this environment (zero egress),
so the benchmark trains on a synthetic dataset matched to its published
shape: ~37k items, ~750k training events, zipf-ish popularity, short
sessions. Throughput is compute-bound on the model/batch/negative-sample
shape, not on item-ID content, so events/s is comparable.

Prints exactly one JSON line:
  {"metric": "...", "value": N, "unit": "events/s", "vs_baseline": N/81400,
   "baseline_hw": "NVIDIA A30 (...)", "bench_hw": "<this device kind>"}
(the *_hw fields make the cross-hardware nature of the ratio explicit in
the machine-readable record, not just the README prose).
"""

import json
import sys
import time

import numpy as np
import pandas as pd

BASELINE_EVENTS_PER_S = 81_400.0  # reference README.md:153-163 (NVIDIA A30)

# RetailRocket-shaped synthetic data (README.md:349-356 row: retailrocket)
N_ITEMS = 36_968
N_EVENTS_TARGET = 750_000
MEAN_SESSION_LEN = 5.5


def synth_data(seed=0):
    rng = np.random.RandomState(seed)
    n_sessions = int(N_EVENTS_TARGET / MEAN_SESSION_LEN)
    lens = 2 + rng.geometric(1.0 / (MEAN_SESSION_LEN - 2.0), size=n_sessions)
    total = int(lens.sum())
    # zipf-ish popularity over items
    ranks = np.arange(1, N_ITEMS + 1, dtype=np.float64)
    p = 1.0 / ranks**0.8
    p /= p.sum()
    items = rng.choice(N_ITEMS, size=total, p=p).astype(np.int64)
    sess = np.repeat(np.arange(n_sessions, dtype=np.int64), lens)
    return pd.DataFrame(
        {"SessionId": sess, "ItemId": items, "Time": np.arange(total, dtype=np.int64)}
    )


def _flagship_cfg():
    from gru4rec_tpu import GRU4RecConfig

    return GRU4RecConfig(
        loss="bpr-max", final_act="elu-0.5", hidden_act="tanh", layers=[224],
        batch_size=80, n_sample=2048, sample_alpha=0.4, bpreg=1.95,
        learning_rate=0.05, momentum=0.4, dropout_p_embed=0.0,
        dropout_p_hidden=0.0, constrained_embedding=True,
        n_epochs=1, chunk_size=512,
    )


def epoch1_child():
    """Child mode (--epoch1): one fresh process runs epoch 1 and reports its
    wall time. The parent invokes this twice — once inheriting the populated
    persistent compile cache (warm) and once pointed at an empty cache dir
    (cold) — so both startup stories are measured every round rather than
    silently drifting when a dispatch default flips the program hash
    (round-4 lesson: BENCH_r04 epoch 1 jumped 5 s -> 86 s unannounced)."""
    import contextlib
    import io

    from gru4rec_tpu import GRU4Rec
    from gru4rec_tpu.utils.cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    model = GRU4Rec(_flagship_cfg())
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        model.fit(synth_data(), n_epochs=1)
    print(buf.getvalue(), file=sys.stderr)
    print(json.dumps({"epoch1_s": round(model.epoch_stats[0]["seconds"], 2)}))


def measure_epoch1(extra_env):
    """Run `bench.py --epoch1` in a subprocess; returns epoch-1 seconds or
    None on failure (the headline metric must never die on this)."""
    import os
    import subprocess

    env = dict(os.environ)
    env.update(extra_env)
    try:
        out = subprocess.run(
            [sys.executable, __file__, "--epoch1"], env=env,
            capture_output=True, text=True, timeout=1800, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])["epoch1_s"]
    except Exception as exc:  # noqa: BLE001 — report, don't fail the bench
        print(f"epoch1 subprocess failed: {exc}", file=sys.stderr)
        return None


def main():
    import os
    import tempfile

    from gru4rec_tpu import GRU4Rec
    from gru4rec_tpu.utils.cache import enable_persistent_compilation_cache

    cache_dir = enable_persistent_compilation_cache()
    print(f"persistent compile cache: {cache_dir}", file=sys.stderr)

    data = synth_data()
    model = GRU4Rec(_flagship_cfg())

    # epoch 1 = compile + warmup; epochs 2-4 are the measurement
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        model.fit(data, n_epochs=4)
    print(buf.getvalue(), file=sys.stderr)

    warm = model.epoch_stats[1:]
    eps = sum(e["events"] for e in warm) / sum(e["seconds"] for e in warm)

    # Cold/warm epoch-1 split in fresh subprocesses. Warm inherits the
    # persistent cache (populated by the fit above even if a default flip
    # just invalidated it); cold points at an empty cache dir and pays the
    # full remote compile. Skippable for quick runs.
    epoch1_warm = epoch1_cold = None
    epoch1_warm_runs = []
    if not os.environ.get("GRU4REC_TPU_BENCH_SKIP_COLD"):
        # Two warm attempts, min reported: the tunneled backend exhibits
        # sporadic multi-minute per-RPC server stalls (round-5 measurement:
        # identical runs spanned 4.6-479 s; compiles and transfers are
        # sub-second when not stalled), so a single draw can be pure
        # infrastructure noise. The raw draws ship alongside the min.
        epoch1_warm_runs = [r for r in (measure_epoch1({}),
                                        measure_epoch1({})) if r is not None]
        epoch1_warm = min(epoch1_warm_runs, default=None)
        with tempfile.TemporaryDirectory(prefix="g4r_coldcache_") as td:
            epoch1_cold = measure_epoch1({"JAX_COMPILATION_CACHE_DIR": td})

    print(json.dumps({
        "metric": "train_events_per_s_retailrocket_shape",
        "value": round(eps, 1),
        "unit": "events/s",
        "vs_baseline": round(eps / BASELINE_EVENTS_PER_S, 3),
        # the ratio compares across hardware generations AND vendors — the
        # denominator is the reference's published A30 number, the numerator
        # runs on whatever single accelerator this host exposes (TPU v5e
        # here). Shape-matched synthetic data, parity batch/config.
        "baseline_hw": "NVIDIA A30 (reference README.md:153-163)",
        "bench_hw": __import__("jax").devices()[0].device_kind,
        "epoch1_warm_s": epoch1_warm,
        "epoch1_warm_runs_s": epoch1_warm_runs,
        "epoch1_cold_s": epoch1_cold,
    }))


if __name__ == "__main__":
    if "--epoch1" in sys.argv[1:]:
        epoch1_child()
    else:
        main()
