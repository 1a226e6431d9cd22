"""Profile one training-step shape on the TPU and print device-time by op.

Methodology (memory/PERF_NOTES): jax.profiler.trace around a few chained
chunk dispatches, then parse plugins/profile/*/...trace.json.gz and sum
device_duration_ps by op name/source.
"""

import glob
import gzip
import json
import sys
from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import gru4rec_tpu.train.optimizers as optmod
from gru4rec_tpu.config import GRU4RecConfig
from gru4rec_tpu.models import gru
from gru4rec_tpu.ops.sampling import build_alias_table
from gru4rec_tpu.train.step import init_train_state, make_chunk_fn

CHUNK = 256


def main(shape, adapt, force, trace_dir):
    shapes = {
        "diginetica": dict(n_items=43_000, layers=[512], batch_size=128,
                           loss="bpr-max", final_act="elu-1", momentum=0.15,
                           sample_alpha=0.3, bpreg=0.9, logq=0.0),
        "yoochoose": dict(n_items=37_000, layers=[480], batch_size=48,
                          loss="cross-entropy", final_act="softmax",
                          momentum=0.0, sample_alpha=0.2, logq=1.0),
        "rees46": dict(n_items=200_000, layers=[512], batch_size=240,
                       loss="cross-entropy", final_act="softmax", momentum=0.0,
                       sample_alpha=0.5, logq=1.0),
        "rsc15": dict(n_items=37_000, layers=[100], batch_size=32,
                      loss="cross-entropy", final_act="softmax", momentum=0.2,
                      sample_alpha=0.5, logq=1.0),
        "retailrocket": dict(n_items=36_968, layers=[224], batch_size=80,
                             loss="bpr-max", final_act="elu-0.5", momentum=0.4,
                             sample_alpha=0.4, bpreg=1.95, logq=0.0),
    }
    sh = dict(shapes[shape])
    n_items = sh.pop("n_items")
    cfg = GRU4RecConfig(n_sample=2048, learning_rate=0.05, adapt=adapt,
                        constrained_embedding=True, chunk_size=CHUNK, **sh)
    optmod._FORCE_PALLAS = {"on": True, "off": False, "auto": None}[force]
    rng = np.random.RandomState(0)
    B = cfg.batch_size
    ranks = np.arange(1, n_items + 1, dtype=np.float64)
    p = 1.0 / ranks ** 0.8
    pop = np.maximum((p / p.sum() * 5_000_000).astype(np.int64), 1)
    in_c = jnp.asarray(rng.randint(0, n_items, (CHUNK, B)).astype(np.int32))
    out_c = jnp.asarray(rng.randint(0, n_items, (CHUNK, B)).astype(np.int32))
    valid = jnp.ones((CHUNK, B), bool)
    reset = jnp.asarray(rng.rand(CHUNK, B) < 0.18)
    n_pad = gru.pad_items(n_items, cfg.item_pad_multiple)
    logp0 = np.zeros(n_pad, np.float32)
    logp0[:n_items] = np.log(pop.astype(np.float64))
    samp1 = build_alias_table(pop, cfg.sample_alpha).packed
    logp0 = jnp.asarray(logp0)

    state = init_train_state(cfg, n_items, jax.random.PRNGKey(0))
    fn = make_chunk_fn(cfg, n_items)
    state, ls, _ = fn(state, in_c, out_c, valid, reset, samp1, logp0)
    float(ls)
    with jax.profiler.trace(trace_dir):
        for _ in range(2):
            state, ls, _ = fn(state, in_c, out_c, valid, reset, samp1, logp0)
        float(ls)

    files = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    by_op = defaultdict(float)
    total = 0.0
    for f in files:
        with gzip.open(f, "rt") as fh:
            tr = json.load(fh)
        for ev in tr.get("traceEvents", []):
            args = ev.get("args") or {}
            dur = args.get("device_duration_ps")
            if dur is None:
                continue
            name = ev.get("name", "?")
            key = name.split(".")[0].split("(")[0]
            by_op[key] += float(dur) / 1e6  # ps -> us
            total += float(dur) / 1e6
    n_steps = 2 * CHUNK
    rows = sorted(by_op.items(), key=lambda kv: -kv[1])[:25]
    print(json.dumps({"shape": shape, "adapt": adapt, "force": force,
                      "device_us_per_step": round(total / n_steps, 1)}))
    for name, us in rows:
        print(f"{us / n_steps:9.1f} us/step  {name}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4])
