"""Asserting reproduction harness for the published RSC15 results.

Trains the three CIKM'18-era GRU-100 configs (reference:
examples/rsc15/run_rsc15.py:24-38) and ASSERTS Recall@20/MRR@20 against the
published numbers within a tolerance, emitting a machine-readable
``PARITY_RSC15.json`` next to the working directory. The reference's own
acceptance bar is "some slight variation (even up to a few percent) in the
metrics is expected and acceptable" (reference README.md:359) — the default
relative tolerance is 5%; tighten or relax with ``--tol``.

Published expectations ("Recurrent Neural Networks with Top-k Gains for
Session-based Recommendations", arXiv:1706.03847):

* BPR-max, no embedding:          R@20 = 0.7197, MRR@20 = 0.3157
* BPR-max, constrained embedding: R@20 = 0.7261, MRR@20 = 0.3124
* Cross-entropy:                  R@20 = 0.7180, MRR@20 = 0.3087

One-command invocation (after ``preprocess.py`` produced the official
splits from yoochoose-clicks.dat):

    python examples/rsc15/run_rsc15.py rsc15_train_full.txt rsc15_test.txt

Exit status is 0 only if every config lands inside tolerance, so the run
doubles as a CI gate on real data. Use ``--configs 0 2`` to run a subset,
``--out`` to redirect the JSON report.
"""

import argparse
import json
import os
import sys
import time

import pandas as pd

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)
from gru4rec_tpu import GRU4Rec
from gru4rec_tpu.eval import evaluate

CONFIGS = [
    ("bpr-max", dict(
        loss="bpr-max", final_act="elu-0.5", hidden_act="tanh", layers=[100],
        adapt="adagrad", n_epochs=10, batch_size=32, dropout_p_embed=0.0,
        dropout_p_hidden=0.0, learning_rate=0.2, momentum=0.3, n_sample=2048,
        sample_alpha=0.0, bpreg=1.0, constrained_embedding=False),
     {"recall@20": 0.7197, "mrr@20": 0.3157}),
    ("bpr-max-constrained", dict(
        loss="bpr-max", final_act="elu-0.5", hidden_act="tanh", layers=[100],
        adapt="adagrad", n_epochs=10, batch_size=32, dropout_p_embed=0.0,
        dropout_p_hidden=0.0, learning_rate=0.2, momentum=0.1, n_sample=2048,
        sample_alpha=0.0, bpreg=0.5, constrained_embedding=True),
     {"recall@20": 0.7261, "mrr@20": 0.3124}),
    ("cross-entropy", dict(
        loss="cross-entropy", final_act="softmax", hidden_act="tanh",
        layers=[100], adapt="adagrad", n_epochs=10, batch_size=32,
        dropout_p_embed=0.0, dropout_p_hidden=0.3, learning_rate=0.1,
        momentum=0.7, n_sample=2048, sample_alpha=0.0, bpreg=0.0,
        constrained_embedding=False),
     {"recall@20": 0.7180, "mrr@20": 0.3087}),
]


def run(train_path, test_path, tol, config_ids, out_path):
    data = pd.read_csv(train_path, sep="\t", dtype={"ItemId": str})
    valid = pd.read_csv(test_path, sep="\t", dtype={"ItemId": str})
    report = {
        "train": os.path.abspath(train_path),
        "test": os.path.abspath(test_path),
        "tolerance_rel": tol,
        "results": [],
    }
    ok = True
    for i in config_ids:
        name, params, expected = CONFIGS[i]
        print("=" * 70)
        print(f"[{i}] {name}  expect {expected}")
        t0 = time.time()
        gru = GRU4Rec(**params)
        gru.fit(data)
        t_fit = time.time() - t0
        rec, mrr = evaluate(gru, valid, batch_size=512, cut_off=[20])
        measured = {"recall@20": rec[0], "mrr@20": mrr[0]}
        entry = {"config": name, "params": params, "expected": expected,
                 "measured": measured, "fit_seconds": round(t_fit, 1)}
        entry["rel_err"] = {
            k: abs(measured[k] - expected[k]) / expected[k] for k in expected
        }
        entry["pass"] = all(v <= tol for v in entry["rel_err"].values())
        ok = ok and entry["pass"]
        report["results"].append(entry)
        for k in expected:
            print(f"{k}: {measured[k]:.4f} (expected {expected[k]:.4f}, "
                  f"rel err {entry['rel_err'][k]*100:.2f}%, "
                  f"{'PASS' if entry['rel_err'][k] <= tol else 'FAIL'})")
    report["pass"] = ok
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print("=" * 70)
    print(f"report written to {out_path}")
    print("PARITY " + ("PASS" if ok else "FAIL"))
    return 0 if ok else 1


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("train", help="rsc15_train_full.txt (see preprocess.py)")
    ap.add_argument("test", help="rsc15_test.txt")
    ap.add_argument("--tol", type=float, default=0.05,
                    help="relative tolerance per metric (default 0.05 — the "
                         "reference accepts 'up to a few percent')")
    ap.add_argument("--configs", type=int, nargs="+",
                    default=list(range(len(CONFIGS))),
                    help="subset of config indices to run (default: all)")
    ap.add_argument("--out", default="PARITY_RSC15.json",
                    help="path of the machine-readable report")
    args = ap.parse_args(argv)
    # fail fast, not after hours of training — and never let an empty
    # selection turn this asserting gate into a vacuous PASS
    bad = [i for i in args.configs if not 0 <= i < len(CONFIGS)]
    if bad:
        ap.error(f"--configs indices {bad} out of range 0..{len(CONFIGS)-1}")
    return run(args.train, args.test, args.tol, args.configs, args.out)


if __name__ == "__main__":
    sys.exit(main())
