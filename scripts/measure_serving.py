"""Serving-path measurement: stateful predict_topk latency and throughput.

The reference has no serving benchmark (its only serving API materializes
the full items x events score frame host-side, gru4rec.py:665-728); this
framework's `predict_topk` runs scoring + top-k on device and returns only
(batch, k) ids/scores. This protocol reports, at the flagship
RetailRocket-shaped model (36,968-item catalog, GRU-224, constrained
embedding):

  * warm per-call latency (ms) at batch 1 / 32 / 256 with k=20 — the
    interactive serving number (includes the host->device input upload,
    the device step, and the (batch, k) fetch);
  * sustained events/s at batch 256 over repeated calls — the bulk
    inference number.

predict_next_batch (full-catalog DataFrame protocol, reference parity) is
measured once at batch 512 for comparison with the reference's
evaluate_sessions_batch-style serving.

Timing: each call ends with a host fetch of the ids (np.asarray inside
predict_topk), which forces a device sync — wall time is valid. First call
per batch size pays compile; warm repeats are reported.

Usage: python scripts/measure_serving.py [reps]
"""

import json
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from gru4rec_tpu.utils.cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from gru4rec_tpu import GRU4Rec, GRU4RecConfig

N_ITEMS = 36_968
K = 20


def build_model(seed=7):
    """One fitted flagship-shaped model (1 tiny epoch: weights don't matter
    for speed, the fitted state wires itemidmap/params/n_items)."""
    rng = np.random.RandomState(seed)
    n_sessions = 3_000
    lens = rng.randint(3, 9, n_sessions)
    total = int(lens.sum())
    items = rng.randint(0, N_ITEMS, total)
    df = pd.DataFrame({
        "SessionId": np.repeat(np.arange(n_sessions), lens),
        "ItemId": items, "Time": np.arange(total),
    })
    # every item must appear so the itemidmap covers the catalog
    pad = pd.DataFrame({
        "SessionId": np.repeat(np.arange(n_sessions, n_sessions + N_ITEMS // 2),
                               2),
        "ItemId": np.arange(N_ITEMS).repeat(1)[:2 * (N_ITEMS // 2)],
        "Time": np.arange(total, total + 2 * (N_ITEMS // 2)),
    })
    df = pd.concat([df, pad], ignore_index=True)
    m = GRU4Rec(GRU4RecConfig(
        loss="bpr-max", final_act="elu-0.5", layers=[224], batch_size=80,
        n_sample=256, constrained_embedding=True, n_epochs=1, chunk_size=128,
    ))
    m.fit(df)
    return m


def measure_topk(m, batch, reps):
    rng = np.random.RandomState(0)
    vocab = m.itemidmap.index.values
    sess = np.arange(batch)
    # warm (compile) with a first call
    m.predict_topk(sess, vocab[rng.randint(0, N_ITEMS, batch)], k=K,
                   batch=batch)
    t0 = time.time()
    for r in range(reps):
        # same session ids: the stateful hidden carry path (no resets)
        m.predict_topk(sess, vocab[rng.randint(0, N_ITEMS, batch)], k=K,
                       batch=batch)
    dt = time.time() - t0
    ms = dt / reps * 1e3
    print(json.dumps({
        "metric": "predict_topk", "batch": batch, "k": K,
        "ms_per_call": round(ms, 3),
        "events_per_s": round(batch * reps / dt, 1),
    }))


def measure_topk_device(m, batch, reps):
    """Device-compute latency: one jitted lax.scan chains ``reps`` topk
    steps entirely on device (hidden-state carry, ids/scores stacked),
    syncing once. Through the remote-execution tunnel every individual
    predict_topk call pays a host round trip (~50 ms measured), so the
    per-call wall numbers above are TUNNEL-bound; this is the number a
    co-located server (or a batch scorer) would see per step."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    sess = np.arange(batch)
    vocab = m.itemidmap.index.values
    m.predict_topk(sess, vocab[rng.randint(0, N_ITEMS, batch)], k=K,
                   batch=batch)  # compile + wire lane state
    topk_fn = m._topk_fn
    in_seq = jnp.asarray(rng.randint(0, N_ITEMS, (reps, batch)), jnp.int32)

    @jax.jit
    def scan_topk(params, H, in_seq):
        def body(Hc, x):
            Hc2, idx, sc = topk_fn(params, Hc, x)
            return Hc2, (idx, sc)
        return jax.lax.scan(body, H, in_seq)

    H, (ids, _) = scan_topk(m.params, m.H, in_seq)  # compile + warm
    np.asarray(ids[-1])
    t0 = time.time()
    H, (ids, _) = scan_topk(m.params, m.H, in_seq)
    np.asarray(ids[-1])
    dt = time.time() - t0
    print(json.dumps({
        "metric": "predict_topk_device", "batch": batch, "k": K,
        "ms_per_call": round(dt / reps * 1e3, 3),
        "events_per_s": round(batch * reps / dt, 1),
    }))


def measure_next_batch(m, batch, reps):
    rng = np.random.RandomState(0)
    vocab = m.itemidmap.index.values
    sess = np.arange(batch)
    m.predict_next_batch(sess, vocab[rng.randint(0, N_ITEMS, batch)],
                         batch=batch)
    t0 = time.time()
    for r in range(reps):
        m.predict_next_batch(sess, vocab[rng.randint(0, N_ITEMS, batch)],
                             batch=batch)
    dt = time.time() - t0
    print(json.dumps({
        "metric": "predict_next_batch_full_frame", "batch": batch,
        "ms_per_call": round(dt / reps * 1e3, 3),
        "events_per_s": round(batch * reps / dt, 1),
    }))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    m = build_model()
    for batch in (1, 32, 256):
        measure_topk(m, batch, reps)
    for batch in (1, 64, 256):
        measure_topk_device(m, batch, reps)
    measure_next_batch(m, 512, max(5, reps // 10))


if __name__ == "__main__":
    main()
