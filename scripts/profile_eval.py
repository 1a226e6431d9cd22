"""Profile one full-catalog eval-chunk shape on the TPU, device time by op.

Same trace-parse methodology as profile_shape.py, pointed at the compiled
evaluator (make_eval_chunk_fn). Params are allocated as device zeros via
the decoy-shape trick (scripts/measure_hbm_budget.py): eval cost does not
depend on weight values, and this host's throttled memory (~0.1 GiB/s)
makes a real 200k x 640 init minutes.

Usage: python scripts/profile_eval.py [shape] [batch] [trace_dir]
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

from gru4rec_tpu.utils.cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from gru4rec_tpu.config import GRU4RecConfig
from gru4rec_tpu.eval.evaluation import make_eval_chunk_fn
from gru4rec_tpu.models import gru
from gru4rec_tpu.train.step import init_train_state

CHUNK = 64
CUTOFFS = (1, 5, 10, 20)

SHAPES = {
    "rees46": dict(n_items=200_000, layers=[512], loss="cross-entropy",
                   final_act="softmax"),
    "retailrocket": dict(n_items=36_968, layers=[224], loss="bpr-max",
                         final_act="elu-0.5"),
}


def device_zero_params(cfg, n_items):
    decoy = 3307
    small = jax.eval_shape(
        lambda k: init_train_state(cfg, decoy, k), jax.random.PRNGKey(0))
    decoy_pad = gru.pad_items(decoy, cfg.item_pad_multiple)
    n_pad = gru.pad_items(n_items, cfg.item_pad_multiple)

    def rescale(s):
        if s.shape and s.shape[0] == decoy_pad:
            return jax.ShapeDtypeStruct((n_pad,) + s.shape[1:], s.dtype)
        return s

    shapes = jax.tree_util.tree_map(rescale, small)

    def alloc(s):
        if jax.dtypes.issubdtype(s.dtype, jax.dtypes.prng_key):
            return jax.random.PRNGKey(0)
        return jnp.zeros(s.shape, s.dtype)

    st = jax.jit(lambda: jax.tree_util.tree_map(alloc, shapes))()
    return st.params


def main(shape="rees46", batch=512, trace_dir="/tmp/g4r_eval_trace"):
    sh = SHAPES[shape]
    n_items = sh["n_items"]
    cfg = GRU4RecConfig(
        loss=sh["loss"], final_act=sh["final_act"], layers=sh["layers"],
        batch_size=80, n_sample=2048, constrained_embedding=True,
        chunk_size=CHUNK,
    )
    params = device_zero_params(cfg, n_items)
    rng = np.random.RandomState(0)
    in_c = jnp.asarray(rng.randint(0, n_items, (CHUNK, batch)).astype(np.int32))
    out_c = jnp.asarray(rng.randint(0, n_items, (CHUNK, batch)).astype(np.int32))
    valid = jnp.ones((CHUNK, batch), bool)
    reset = jnp.asarray(rng.rand(CHUNK, batch) < 0.18)
    fn = make_eval_chunk_fn(cfg, n_items, CUTOFFS, "standard", batch)

    def fresh():
        H = tuple(jnp.zeros((batch, w), jnp.float32) for w in cfg.layers)
        # rec and mrr must be DISTINCT buffers: both are donated
        # (donate_argnums 6 and 7), and donating one buffer twice is an
        # InvalidArgument on the TPU backend (measured, this round).
        rec = jnp.zeros((len(CUTOFFS),), jnp.float32)
        mrr = jnp.zeros((len(CUTOFFS),), jnp.float32)
        return H, rec, mrr, jnp.zeros((), jnp.float32)

    H, rec, mrr, n = fresh()
    H, rec, mrr, n, step = fn(params, H, in_c, out_c, valid, reset, rec, mrr,
                              n, jax.random.PRNGKey(1), jnp.zeros((), jnp.int32))
    float(n)  # warm
    reps = 2
    with jax.profiler.trace(trace_dir):
        for _ in range(reps):
            H2, rec2, mrr2, n2 = fresh()
            H2, rec2, mrr2, n2, st2 = fn(params, H2, in_c, out_c, valid,
                                         reset, rec2, mrr2, n2,
                                         jax.random.PRNGKey(1),
                                         jnp.zeros((), jnp.int32))
        float(n2)

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
            key = ev.get("name", "?").split(".")[0].split("(")[0]
            by_op[key] += float(dur) / 1e6
            total += float(dur) / 1e6
    n_steps = reps * CHUNK
    print(json.dumps({"shape": shape, "batch": batch,
                      "device_us_per_step": round(total / n_steps, 1)}))
    for name, us in sorted(by_op.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{us / n_steps:9.1f} us/step  {name}")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "rees46", int(a[1]) if len(a) > 1 else 512,
         a[2] if len(a) > 2 else "/tmp/g4r_eval_trace")
