"""Steady-state per-step timing of published dataset shapes on the real TPU.

Methodology (PERF_NOTES.md / memory): dispatch N chained chunk calls, sync
once via float(loss); per-step time = wall / (N * chunk). Epoch-1 compile is
excluded by a warmup chunk. Emits one JSON line per run to stdout.

Usage: python scripts/measure_shapes.py [tag ...]
Tags select shape/optimizer/kernel combos; default runs everything.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from gru4rec_tpu.utils.cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import gru4rec_tpu.train.optimizers as optmod
from gru4rec_tpu.config import GRU4RecConfig
from gru4rec_tpu.models import gru
from gru4rec_tpu.ops.sampling import build_alias_table
from gru4rec_tpu.train.step import init_train_state, make_chunk_fn

CHUNK = 256
N_CHUNKS = 8

SHAPES = {
    "retailrocket": dict(n_items=36_968, layers=[224], batch_size=80,
                         loss="bpr-max", final_act="elu-0.5", momentum=0.4,
                         sample_alpha=0.4, bpreg=1.95, logq=0.0),
    "rees46": dict(n_items=200_000, layers=[512], batch_size=240,
                   loss="cross-entropy", final_act="softmax", momentum=0.0,
                   sample_alpha=0.5, logq=1.0),
    "diginetica": dict(n_items=43_000, layers=[512], batch_size=128,
                       loss="bpr-max", final_act="elu-1", momentum=0.15,
                       sample_alpha=0.3, bpreg=0.9, logq=0.0),
    "yoochoose": dict(n_items=37_000, layers=[480], batch_size=48,
                      loss="cross-entropy", final_act="softmax", momentum=0.0,
                      sample_alpha=0.2, logq=1.0),
    "coveo": dict(n_items=10_000, layers=[512], batch_size=144,
                  loss="bpr-max", final_act="elu-1", momentum=0.4,
                  sample_alpha=0.2, bpreg=1.85, logq=0.0),
    "rsc15": dict(n_items=37_000, layers=[100], batch_size=32,
                  loss="cross-entropy", final_act="softmax", momentum=0.2,
                  sample_alpha=0.5, logq=1.0),
}

# Stacked-GRU variants: the reference's headline charts are layer-count
# scaling (reference README.md:281-282, img/training_time_*_layers.png;
# `layers=200/200` style configs). Each extra layer adds a dense
# (h x 3h + h x 2h + h x h) matmul chain inside the scan plus its dense
# optimizer traffic — this sweep pins whether the scan/kernel architecture
# holds its single-layer multiples there.
for _base, _nl in [("retailrocket", 2), ("retailrocket", 3),
                   ("rees46", 2), ("rees46", 3),
                   ("yoochoose", 2)]:
    _sh = dict(SHAPES[_base])
    _sh["layers"] = _sh["layers"] * _nl
    SHAPES[f"{_base}_{_nl}l"] = _sh


def run(shape_name, adapt="adagrad", force_pallas=None,
        opt_state_dtype="bfloat16", force_version=None, dedup_impl="sort"):
    sh = dict(SHAPES[shape_name])
    n_items = sh.pop("n_items")
    cfg = GRU4RecConfig(
        n_sample=2048, learning_rate=0.05, adapt=adapt,
        constrained_embedding=True, chunk_size=CHUNK,
        opt_state_dtype=opt_state_dtype, dedup_impl=dedup_impl,
        dropout_p_embed=0.0, dropout_p_hidden=0.0, **sh,
    )
    optmod._FORCE_PALLAS = force_pallas
    optmod._FORCE_PALLAS_VERSION = force_version
    rng = np.random.RandomState(0)
    B = cfg.batch_size
    ranks = np.arange(1, n_items + 1, dtype=np.float64)
    p = (1.0 / ranks ** 0.8)
    pop = np.maximum((p / p.sum() * 5_000_000).astype(np.int64), 1)
    in_c = rng.randint(0, n_items, (CHUNK, B)).astype(np.int32)
    out_c = rng.randint(0, n_items, (CHUNK, B)).astype(np.int32)
    valid = np.ones((CHUNK, B), bool)
    reset = rng.rand(CHUNK, B) < 0.18
    n_pad = gru.pad_items(n_items, cfg.item_pad_multiple)
    logp0 = np.zeros(n_pad, np.float32)
    logp0[:n_items] = np.log(pop.astype(np.float64))
    samp1 = build_alias_table(pop, cfg.sample_alpha).packed
    logp0_j = jnp.asarray(logp0)
    args = tuple(jnp.asarray(a) for a in (in_c, out_c, valid, reset))

    state = init_train_state(cfg, n_items, jax.random.PRNGKey(0))
    fn = make_chunk_fn(cfg, n_items)
    state, ls, ec = fn(state, *args, samp1, logp0_j)  # compile+warm
    float(ls)
    t0 = time.time()
    for _ in range(N_CHUNKS):
        state, ls, ec = fn(state, *args, samp1, logp0_j)
    float(ls)
    dt = time.time() - t0
    us_per_step = dt / (N_CHUNKS * CHUNK) * 1e6
    ev_per_s = B * (N_CHUNKS * CHUNK) / dt
    print(json.dumps({
        "shape": shape_name, "adapt": adapt,
        "kernel": ("auto" if force_pallas is None else
                   ("on" if force_pallas else "off")),
        "opt_state_dtype": opt_state_dtype,
        "version": force_version or "auto",
        "dedup_impl": dedup_impl,
        "us_per_step": round(us_per_step, 1),
        "events_per_s": round(ev_per_s, 0),
    }), flush=True)


RUNS = [
    ("rees46", "adagrad", None),
    ("rees46", "rmsprop", True),
    ("rees46", "rmsprop", False),
    ("rees46", "adam", True),
    ("rees46", "adam", False),
    ("diginetica", "adagrad", True),
    ("diginetica", "adagrad", False),
    ("yoochoose", "adagrad", True),
    ("yoochoose", "adagrad", False),
    ("retailrocket", "adagrad", None),
]

# v3-vs-v4 A/B at the shapes where the fused kernel runs (or could):
# full real chunk step, same staging path the production dispatcher uses
RUNS_V4 = [
    ("rees46", "rmsprop", True, "v3"),
    ("rees46", "rmsprop", True, "v4"),
    ("rees46", "adam", True, "v3"),
    ("rees46", "adam", True, "v4"),
    ("rees46", "adagrad", True, "v3"),
    ("rees46", "adagrad", True, "v4"),
    ("yoochoose", "adagrad", True, "v3"),
    ("yoochoose", "adagrad", True, "v4"),
    ("yoochoose", "adagrad", False, None),
    ("rsc15", "adagrad", True, "v4"),
    ("rsc15", "adagrad", False, None),
    ("diginetica", "adagrad", True, "v3"),
    ("diginetica", "adagrad", True, "v4"),
    # sub-64MB regime: XLA wins vs v3 (fast-memory promotion), but v4 drops
    # the gpad staging + one DMA issue/group — re-contest the dispatch line
    ("retailrocket", "adagrad", True, "v4"),
    ("retailrocket", "adagrad", False, None),
    ("coveo", "adagrad", True, "v4"),
    ("coveo", "adagrad", False, None),
]

# stochastic-rounding bf16 state (opt_state_dtype="bfloat16_sr") A/B at the
# kernel shapes: halves adam's dominant state-DMA bytes (merged buffer bf16,
# limb-packed counts) and adagrad's acc bytes. Pair each with its f32-state
# twin from the same session for the delta.
RUNS_SR = [
    ("rees46", "adam", True, "v3", "bfloat16_sr"),
    ("rees46", "adam", True, "v4", "bfloat16_sr"),
    ("rees46", "adagrad", True, "v3", "bfloat16_sr"),
    ("rees46", "adagrad", True, "v4", "bfloat16_sr"),
    ("rees46", "adam", True, "v3", "bfloat16"),      # f32-state control
    ("rees46", "adagrad", True, "v3", "bfloat16"),   # f32-state control
    ("diginetica", "adagrad", True, "v3", "bfloat16_sr"),
    ("yoochoose", "adagrad", True, "v3", "bfloat16_sr"),
    # sub-64MB regime: SR halves state DMAs on top of v4's staging cut —
    # re-contest the dispatch line where XLA's promoted scatters win today
    ("retailrocket", "adagrad", True, "v4", "bfloat16_sr"),
    ("rsc15", "adagrad", True, "v4", "bfloat16_sr"),
    ("coveo", "adagrad", True, "v4", "bfloat16_sr"),
]

# Whole-fit-path dedup A/B: the XLA-scatter shapes (sub-64MB tables),
# kernel auto (=off there), sort chain vs gated equality matmul
RUNS_DEDUP = [
    ("retailrocket", "adagrad", None, None, None, "sort"),
    ("retailrocket", "adagrad", None, None, None, "matmul"),
    ("rsc15", "adagrad", None, None, None, "sort"),
    ("rsc15", "adagrad", None, None, None, "matmul"),
    ("coveo", "adagrad", None, None, None, "sort"),
    ("coveo", "adagrad", None, None, None, "matmul"),
    ("retailrocket", "adam", None, None, None, "sort"),
    ("retailrocket", "adam", None, None, None, "matmul"),
]

# Layer-count scaling sweep: each 2l/3l row paired with its same-session 1l
# twin so the vs-single-layer ratio is measured, not spliced across sessions.
RUNS_LAYERS = [
    ("retailrocket", "adagrad", None),
    ("retailrocket_2l", "adagrad", None),
    ("retailrocket_3l", "adagrad", None),
    ("rees46", "adagrad", None),
    ("rees46_2l", "adagrad", None),
    ("rees46_3l", "adagrad", None),
    ("rees46", "adam", True),
    ("rees46_2l", "adam", True),
    ("yoochoose", "adagrad", None),
    ("yoochoose_2l", "adagrad", None),
    # kernel-regime A/B at the stacked shapes: does the dispatch default
    # (byte-budget driven, layer-blind) still pick the winner?
    ("rees46_2l", "adagrad", True),
    ("rees46_2l", "adagrad", False),
    ("retailrocket_2l", "adagrad", True),
    ("retailrocket_2l", "adagrad", False),
]

if __name__ == "__main__":
    tags = sys.argv[1:]
    runs = [r + (None, None, "sort") for r in RUNS]
    if tags and tags[0] == "v4ab":
        runs, tags = [r + (None, "sort") for r in RUNS_V4], tags[1:]
    elif tags and tags[0] == "sr":
        runs, tags = [r + ("sort",) for r in RUNS_SR], tags[1:]
    elif tags and tags[0] == "dedup":
        runs, tags = RUNS_DEDUP, tags[1:]
    elif tags and tags[0] == "layers":
        # production dedup default (size-gated matmul), unlike the historical
        # sweeps above which pre-date the round-4 default flip
        runs, tags = [r + (None, None, "matmul") for r in RUNS_LAYERS], tags[1:]
    for shape, adapt, force, ver, osd, dd in runs:
        if tags and shape not in tags:
            continue
        try:
            run(shape, adapt, force, force_version=ver,
                opt_state_dtype=osd or "bfloat16", dedup_impl=dd)
        except Exception as e:
            print(json.dumps({"shape": shape, "adapt": adapt, "version": ver,
                              "opt_state_dtype": osd, "error": str(e)[:300]}),
                  flush=True)
