"""HBM budget table + OOM-boundary probe for the opt_state_dtype claim.

After round 4 refuted SR-for-speed (adam −22%), `bfloat16_sr`'s entire
value proposition is MEMORY: narrowing the freeze-prone state slots
(adagrad's accumulator, adam's 0.999-EMA second moment) from f32 to bf16
halves their HBM bytes and should raise the largest catalog that trains on
one 16 GB chip (README "opt-in lever"; config.py opt_state_dtype). This
script pins that claim with numbers:

  table    — per-shape byte budget of params + optimizer state (+ fixed
             per-run buffers) for f32 / bfloat16 / bfloat16_sr at GRU-512,
             adagrad and adam. Derived from the REAL initialized pytree at
             two small catalogs (per-item bytes = exact slope; the layout
             is linear in n_items by construction) — not hand-computed.
  try N A D — probe mode (subprocess): init a train state for n_items=N,
             adapt=A, opt_state_dtype=D at GRU-512 and run one real chunk;
             prints ok/oom. Run on the TPU.
  boundary — driver: walks a multiplicative ladder of n_items per
             (adapt, opt_state_dtype) combo, spawning `try` subprocesses
             (isolated: an OOM'd process can leave the client wedged), and
             reports the largest passing / smallest failing catalog.

Usage:
  python scripts/measure_hbm_budget.py table
  python scripts/measure_hbm_budget.py boundary [adagrad|adam ...]
  python scripts/measure_hbm_budget.py try 2000000 adam bfloat16_sr
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

if len(sys.argv) > 1 and sys.argv[1] in ("table", "boundary"):
    # these modes only inspect host pytrees / drive subprocesses — never
    # allocate the multi-GB states on the accelerator (or pay the tunnel).
    # The axon plugin is force-registered by sitecustomize BEFORE this line,
    # so the env var alone is ignored — pin the platform via jax.config.
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

HIDDEN = 512
BATCH = 240          # the rees46 published batch
N_SAMPLE = 2048
CHUNK = 64


def make_cfg(n_items, adapt, osd):
    from gru4rec_tpu.config import GRU4RecConfig

    return GRU4RecConfig(
        loss="cross-entropy", final_act="softmax", layers=[HIDDEN],
        batch_size=BATCH, n_sample=N_SAMPLE, sample_alpha=0.5, logq=1.0,
        learning_rate=0.05, adapt=adapt, constrained_embedding=True,
        chunk_size=CHUNK, opt_state_dtype=osd,
        dropout_p_embed=0.0, dropout_p_hidden=0.0,
    )


def state_bytes(n_items, adapt, osd):
    """Exact bytes of params + optimizer state at this catalog size, from a
    really-initialized pytree (host-side; no device involved)."""
    import jax

    from gru4rec_tpu.train.step import init_train_state

    st = init_train_state(make_cfg(n_items, adapt, osd), n_items,
                         jax.random.PRNGKey(0))
    p = sum(np.asarray(l).nbytes for l in jax.tree_util.tree_leaves(st.params))
    o = sum(np.asarray(l).nbytes
            for l in jax.tree_util.tree_leaves(st.opt_state))
    return p, o


def table():
    """Per-item slopes measured between two real catalogs, then projected.
    Fixed-cost buffers (alias table 16 B/item, logp0 4 B/item, activations,
    schedule stacks <=1 GB by budget) are listed separately."""
    A, B = 128_000, 256_000
    rows = []
    for adapt in ("adagrad", "adam"):
        for osd in ("float32", "bfloat16", "bfloat16_sr"):
            pA, oA = state_bytes(A, adapt, osd)
            pB, oB = state_bytes(B, adapt, osd)
            p_slope = (pB - pA) / (B - A)     # bytes/item: params
            o_slope = (oB - oA) / (B - A)     # bytes/item: optimizer state
            p_fixed = pA - p_slope * A
            o_fixed = oA - o_slope * A
            # +20 B/item: alias table (16) + logp0 (4); model/opt dominate
            per_item = p_slope + o_slope + 20.0
            fixed = p_fixed + o_fixed
            rows.append({
                "adapt": adapt, "opt_state_dtype": osd,
                "param_bytes_per_item": round(p_slope, 1),
                "opt_bytes_per_item": round(o_slope, 1),
                "total_bytes_per_item": round(per_item, 1),
                "fixed_mb": round(fixed / 2**20, 1),
                "rees46_200k_gb": round((per_item * 200_000 + fixed) / 2**30, 3),
                # naive ceiling at 16 GB minus ~1.5 GB for activations,
                # samples, schedule, and allocator slack — the `boundary`
                # probe measures the real one
                "predicted_max_items_16gb": int(
                    (14.5 * 2**30 - fixed) / per_item),
            })
            print(json.dumps(rows[-1]), flush=True)
    return rows


def try_one(n_items, adapt, osd):
    """Probe: init + one real chunk on the device. Exit 0 prints ok/oom.

    The train state is allocated ON DEVICE with the exact production
    shapes/dtypes (``jax.eval_shape`` of the real ``init_train_state``, then
    device ``zeros`` per leaf) rather than materialized host-side: only the
    FOOTPRINT decides the OOM boundary, and shipping 5-15 GB of
    host-initialized weights through the tunnel made each probe
    transfer-bound (the first 2.4M-item probe blew a 1200 s timeout on
    what is a sub-minute device question)."""
    from gru4rec_tpu.utils.cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    import jax
    import jax.numpy as jnp

    from gru4rec_tpu.models import gru
    from gru4rec_tpu.ops.sampling import build_alias_table
    from gru4rec_tpu.train.step import init_train_state, make_chunk_fn

    cfg = make_cfg(n_items, adapt, osd)
    rng = np.random.RandomState(0)
    # Uniform popularity: footprint-identical to pop^alpha (the alias table
    # is (n, 2) int32 either way) but Vose's pairing loop degenerates to a
    # no-op — at 2-4M items the real loop is minutes of host Python that
    # tell us nothing about HBM.
    pop = np.ones(n_items, np.int64)
    n_pad = gru.pad_items(n_items, cfg.item_pad_multiple)
    logp0 = np.zeros(n_pad, np.float32)
    try:
        samp1 = build_alias_table(pop, cfg.sample_alpha).packed
        logp0_j = jnp.asarray(logp0)
        args = tuple(jnp.asarray(a) for a in (
            rng.randint(0, n_items, (CHUNK, BATCH)).astype(np.int32),
            rng.randint(0, n_items, (CHUNK, BATCH)).astype(np.int32),
            np.ones((CHUNK, BATCH), bool),
            rng.rand(CHUNK, BATCH) < 0.18,
        ))
        # Shapes come from the REAL init at a tiny decoy catalog, then every
        # item-dimensioned leading dim is rescaled to the probe's padded
        # size. eval_shape cannot be used at the probe size itself: it
        # executes init_train_state's host-side numpy init eagerly, and this
        # host's memory is throttled to ~0.1 GiB/s (measured) — one
        # 2.4M x 641 f64 Glorot draw costs minutes. The decoy (3307 ->
        # pad 3328 rows) is a size no other leaf dimension can collide with.
        decoy = 3307
        decoy_pad = gru.pad_items(decoy, cfg.item_pad_multiple)
        assert decoy_pad not in (
            BATCH, CHUNK, HIDDEN, N_SAMPLE), "decoy collides with a real dim"
        small = jax.eval_shape(
            lambda k: init_train_state(make_cfg(decoy, adapt, osd), decoy, k),
            jax.random.PRNGKey(0))

        def rescale(s):
            if s.shape and s.shape[0] == decoy_pad:
                return jax.ShapeDtypeStruct((n_pad,) + s.shape[1:], s.dtype)
            return s

        shapes = jax.tree_util.tree_map(rescale, small)

        def alloc(s):
            if jax.dtypes.issubdtype(s.dtype, jax.dtypes.prng_key):
                return jax.random.PRNGKey(0)
            return jnp.zeros(s.shape, s.dtype)

        # ONE jitted program allocates the whole pytree: through the tunnel
        # every call is an RPC that can stall for minutes (PERF_NOTES round-5
        # cold-start), so per-leaf allocs multiply the worst case.
        t0 = time.time()
        state = jax.jit(lambda: jax.tree_util.tree_map(alloc, shapes))()
        jax.block_until_ready(state)
        print(f"# alloc {time.time() - t0:.1f}s", file=sys.stderr, flush=True)
        t0 = time.time()
        fn = make_chunk_fn(cfg, n_items)
        state, ls, ec = fn(state, *args, samp1, logp0_j)
        print(f"# chunk {time.time() - t0:.1f}s", file=sys.stderr, flush=True)
        ok = bool(np.isfinite(float(ls)))
        print(json.dumps({"result": "ok" if ok else "nonfinite",
                          "n_items": n_items, "adapt": adapt,
                          "opt_state_dtype": osd}), flush=True)
    except Exception as e:
        msg = str(e)
        oom = "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg.lower() \
            or "out of memory" in msg
        print(json.dumps({"result": "oom" if oom else "error",
                          "n_items": n_items, "adapt": adapt,
                          "opt_state_dtype": osd,
                          "detail": msg[:200]}), flush=True)


def probe(n_items, adapt, osd, attempts=3):
    """Run one `try` subprocess; returns "ok" / "oom" / "indeterminate".

    The tunneled backend exhibits sporadic multi-minute per-RPC stalls
    (PERF_NOTES round-5 cold-start), so a timeout or crash is
    INFRASTRUCTURE noise, not a memory verdict — retry, and never let it
    masquerade as the OOM boundary."""
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    for attempt in range(attempts):
        try:
            out = subprocess.run(
                [sys.executable, __file__, "try", str(n_items), adapt, osd],
                capture_output=True, text=True, timeout=900, env=env,
            ).stdout.strip().splitlines()
        except subprocess.TimeoutExpired:
            print(json.dumps({"result": "timeout", "n_items": n_items,
                              "attempt": attempt}), flush=True)
            continue
        res = json.loads(out[-1]) if out else {"result": "crash"}
        print(json.dumps(res), flush=True)
        if res.get("result") in ("ok", "oom"):
            return res["result"]
    return "indeterminate"


def boundary(adapts):
    """Walk n_items up a x1.25 ladder from 80% of the analytic prediction
    until the probe OOMs; report the measured bracket per combo."""
    for adapt in adapts:
        for osd in ("bfloat16", "bfloat16_sr"):
            # small anchors: the layout is linear in n_items, and this
            # host's throttled memory makes 100k+-item real inits minutes
            pA, oA = state_bytes(16_000, adapt, osd)
            pB, oB = state_bytes(48_000, adapt, osd)
            per_item = (pB - pA + oB - oA) / 32_000 + 20.0
            n = int((14.5 * 2**30) / per_item * 0.8)
            n -= n % 128
            last_ok, first_bad, verdict = None, None, None
            while first_bad is None:
                verdict = probe(n, adapt, osd)
                if verdict == "ok":
                    last_ok = n
                    n = int(n * 1.25)
                    n -= n % 128
                else:
                    first_bad = n  # "oom" = boundary; "indeterminate" noted
            print(json.dumps({
                "metric": "oom_boundary", "adapt": adapt,
                "opt_state_dtype": osd, "hidden": HIDDEN, "batch": BATCH,
                "largest_ok_n_items": last_ok,
                "smallest_oom_n_items": first_bad,
                "boundary_verdict": verdict,
            }), flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "table"
    if mode == "table":
        table()
    elif mode == "try":
        try_one(int(sys.argv[2]), sys.argv[3], sys.argv[4])
    elif mode == "boundary":
        adapts = sys.argv[2:] or ["adagrad", "adam"]
        boundary(adapts)
    else:
        raise SystemExit(f"unknown mode {mode!r}")
