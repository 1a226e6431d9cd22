"""Self-contained quickstart: train, evaluate, save, reload and serve a
GRU4Rec model on synthetic session data — no dataset download needed.

Usage: python examples/quickstart_synthetic.py
"""

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from gru4rec_tpu import GRU4Rec
from gru4rec_tpu.eval import evaluate


def synthetic_sessions(n_sessions, n_items=500, seed=0):
    """Sessions following a noisy first-order transition structure."""
    rng = np.random.RandomState(seed)
    rows, t = [], 0
    for s in range(n_sessions):
        i = rng.randint(n_items)
        for _ in range(rng.randint(3, 10)):
            rows.append((s, f"item_{i}", t))
            t += 1
            i = (7 * i + 3) % n_items if rng.rand() < 0.8 else rng.randint(n_items)
    return pd.DataFrame(rows, columns=["SessionId", "ItemId", "Time"])


def main():
    train = synthetic_sessions(4000)
    test = synthetic_sessions(400, seed=7)

    gru = GRU4Rec(
        loss="bpr-max", final_act="elu-0.5", layers=[96], batch_size=64,
        n_sample=256, sample_alpha=0.5, constrained_embedding=True, n_epochs=5,
    )
    gru.fit(train)

    recall, mrr = evaluate(gru, test, cut_off=[1, 5, 20], batch_size=64)
    for c, r, m in zip([1, 5, 20], recall, mrr):
        print(f"Recall@{c}: {r:.4f}   MRR@{c}: {m:.4f}")

    gru.savemodel("/tmp/quickstart_model.npz")
    reloaded = GRU4Rec.loadmodel("/tmp/quickstart_model.npz")
    preds = reloaded.predict_next_batch(
        np.array([0, 1]), np.array(["item_3", "item_10"]), batch=2
    )
    print("top-3 next items for two live sessions:")
    print(preds.apply(lambda col: col.nlargest(3).index.tolist(), axis=0))


if __name__ == "__main__":
    main()
