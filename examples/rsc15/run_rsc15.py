"""Scripted reproduction of the published RSC15 results.

Trains the three CIKM'18-era GRU-100 configs and evaluates Recall@20/MRR@20.
Expected numbers (reference: examples/rsc15/run_rsc15.py:24-38, tolerance "up
to a few percent", README.md:359):

* BPR-max, no embedding:          R@20 = 0.7197, MRR@20 = 0.3157
* BPR-max, constrained embedding: R@20 = 0.7261, MRR@20 = 0.3124
* Cross-entropy:                  R@20 = 0.7180, MRR@20 = 0.3087

Usage: python run_rsc15.py <rsc15_train_full.txt> <rsc15_test.txt>
"""

import os
import sys

import pandas as pd

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)
from gru4rec_tpu import GRU4Rec
from gru4rec_tpu.eval import evaluate

CONFIGS = [
    ("BPR-max, no embedding (expect R@20~0.7197 M@20~0.3157)", dict(
        loss="bpr-max", final_act="elu-0.5", hidden_act="tanh", layers=[100],
        adapt="adagrad", n_epochs=10, batch_size=32, dropout_p_embed=0.0,
        dropout_p_hidden=0.0, learning_rate=0.2, momentum=0.3, n_sample=2048,
        sample_alpha=0.0, bpreg=1.0, constrained_embedding=False)),
    ("BPR-max, constrained embedding (expect R@20~0.7261 M@20~0.3124)", dict(
        loss="bpr-max", final_act="elu-0.5", hidden_act="tanh", layers=[100],
        adapt="adagrad", n_epochs=10, batch_size=32, dropout_p_embed=0.0,
        dropout_p_hidden=0.0, learning_rate=0.2, momentum=0.1, n_sample=2048,
        sample_alpha=0.0, bpreg=0.5, constrained_embedding=True)),
    ("Cross-entropy (expect R@20~0.7180 M@20~0.3087)", dict(
        loss="cross-entropy", final_act="softmax", hidden_act="tanh", layers=[100],
        adapt="adagrad", n_epochs=10, batch_size=32, dropout_p_embed=0.0,
        dropout_p_hidden=0.3, learning_rate=0.1, momentum=0.7, n_sample=2048,
        sample_alpha=0.0, bpreg=0.0, constrained_embedding=False)),
]


def main(train_path, test_path):
    data = pd.read_csv(train_path, sep="\t", dtype={"ItemId": str})
    valid = pd.read_csv(test_path, sep="\t", dtype={"ItemId": str})
    for name, params in CONFIGS:
        print("=" * 70)
        print(name)
        gru = GRU4Rec(**params)
        gru.fit(data)
        rec, mrr = evaluate(gru, valid, batch_size=512, cut_off=[20])
        print(f"Recall@20: {rec[0]:.4f}")
        print(f"MRR@20: {mrr[0]:.4f}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
