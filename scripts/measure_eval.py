"""Evaluation-throughput measurement at the reference's published protocol.

The reference reports "Evaluation took 4.34s" for RetailRocket at batch 512,
cutoffs [1, 5, 10, 20], standard tie mode, on an NVIDIA A30
(/root/reference/README.md:166-173). The real test set cannot be downloaded
here (zero egress), so this measures the same protocol on a synthetic test
set matched to the published catalog shapes.

Shape tags (catalog size x hidden width — the two axes that set eval cost;
full-catalog scoring is an (events x h) @ (h x n_items) matmul + rank
reduction):

  retailrocket  36,968 items, GRU-224 (the reference's published timing row)
  rees46        200,000 items, GRU-512 (SURVEY §7 "full-catalog scoring
                memory" hard part: the biggest published catalog)

Timing methodology (PERF_NOTES.md / memory): evaluate() ends with host
reductions of the accumulated sums, which forces a real device sync — wall
time around the call is valid. First call pays compile; report the warm
repeats. Emits one JSON line per run.

Usage: python scripts/measure_eval.py [tag ...] [n_test_events]
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
from gru4rec_tpu.eval import evaluate

N_TEST_EVENTS = 60_000  # reference test split is one day (~tens of k events)
MEAN_SESSION_LEN = 5.5
CUTOFFS = [1, 5, 10, 20]
BATCH = 512

SHAPES = {
    "retailrocket": dict(n_items=36_968, layers=[224], loss="bpr-max",
                         final_act="elu-0.5"),
    "rees46": dict(n_items=200_000, layers=[512], loss="cross-entropy",
                   final_act="softmax"),
}


def synth_sessions(n_events, n_items, seed):
    rng = np.random.RandomState(seed)
    n_sessions = int(n_events / MEAN_SESSION_LEN)
    lens = 2 + rng.geometric(1.0 / (MEAN_SESSION_LEN - 2.0), size=n_sessions)
    total = int(lens.sum())
    ranks = np.arange(1, n_items + 1, dtype=np.float64)
    p = 1.0 / ranks ** 0.8
    p /= p.sum()
    items = rng.choice(n_items, size=total, p=p).astype(np.int64)
    sess = np.repeat(np.arange(n_sessions, dtype=np.int64), lens)
    return pd.DataFrame({"SessionId": sess, "ItemId": items,
                         "Time": np.arange(total, dtype=np.int64)})


def run(tag, n_test):
    sh = SHAPES[tag]
    n_items = sh["n_items"]
    cfg = GRU4RecConfig(
        loss=sh["loss"], final_act=sh["final_act"], layers=sh["layers"],
        batch_size=80, n_sample=2048, sample_alpha=0.4,
        learning_rate=0.05, dropout_p_embed=0.0, dropout_p_hidden=0.0,
        constrained_embedding=True, n_epochs=1, chunk_size=64,
    )
    model = GRU4Rec(cfg)
    # tiny fit: builds itemidmap/params over the full catalog (eval cost does
    # not depend on training quality)
    train = synth_sessions(120_000, n_items, seed=0)
    # make sure every item appears at least once so the catalog is full-size
    extra = pd.DataFrame({
        "SessionId": np.arange(n_items) // 4 + train["SessionId"].max() + 1,
        "ItemId": np.arange(n_items),
        "Time": np.arange(n_items) + len(train),
    })
    model.fit(pd.concat([train, extra], ignore_index=True))

    test = synth_sessions(n_test, n_items, seed=1)
    n_events_effective = len(test) - test["SessionId"].nunique()

    evaluate(model, test, cut_off=CUTOFFS, batch_size=BATCH)  # compile
    times = []
    for _ in range(3):
        t0 = time.time()
        evaluate(model, test, cut_off=CUTOFFS, batch_size=BATCH)
        times.append(time.time() - t0)
    best = min(times)
    print(json.dumps({
        "metric": f"eval_seconds_{tag}_shape",
        "n_items": n_items, "hidden": sh["layers"][0],
        "n_test_events": int(len(test)),
        "scored_events": int(n_events_effective),
        "batch_size": BATCH, "cutoffs": CUTOFFS,
        "warm_seconds": round(best, 3),
        "events_per_s": round(n_events_effective / best, 0),
        "all_runs_s": [round(t, 3) for t in times],
    }), flush=True)


def main():
    args = sys.argv[1:]
    n_test = N_TEST_EVENTS
    tags = []
    for a in args:
        if a.isdigit():
            n_test = int(a)
        else:
            tags.append(a)
    for tag in tags or ["retailrocket"]:
        run(tag, n_test)


if __name__ == "__main__":
    main()
