"""Real-device paropt sweep: the reference's primary workflow, in anger.

The reference's published best-params all came from paropt runs
(/root/reference/paropt.py:40-57). This drives our port of that workflow —
`python -m gru4rec_tpu.cli.paropt` — against the REAL accelerator with N
subprocess trials over a shape-stable space (learning_rate / momentum /
bpreg at a fixed GRU-224 / batch-80 / 2048-negative shape), then verifies
the cross-trial compile-cache contract:

  * trial 1 pays the cold compile of the sweep's (new) shape;
  * trials 2+ must start WARM — their epoch-1 wall time is the proof that
    the persistent XLA cache exported to every child (cli/paropt.py
    trial_env) actually works across processes on this backend.

Emits one JSON line per trial {trial, epoch1_s, metric, wall_s} plus a
summary line. Data is synthetic (zero egress), 20k items so the program
shapes differ from bench.py's cache entries — trial 1 is genuinely cold.

Usage: python scripts/run_paropt_sweep.py [n_trials] [workdir]
"""

import json
import os
import re
import subprocess
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

N_ITEMS = 20_000
TRAIN_EVENTS = 400_000
TEST_EVENTS = 40_000
MEAN_SESSION_LEN = 5.5

SPACE = [
    {"name": "learning_rate", "dtype": "float", "values": [0.02, 0.2],
     "log": True},
    {"name": "momentum", "dtype": "float", "values": [0.0, 0.5], "step": 0.1},
    {"name": "bpreg", "dtype": "float", "values": [0.5, 2.0], "step": 0.25},
]

FIXED = ("loss=bpr-max,final_act=elu-0.5,layers=224,batch_size=80,"
         "n_sample=2048,sample_alpha=0.4,constrained_embedding=True,"
         "n_epochs=3,chunk_size=512,dropout_p_hidden=0.0,dropout_p_embed=0.0")


def synth(n_events, seed):
    rng = np.random.RandomState(seed)
    n_sessions = int(n_events / MEAN_SESSION_LEN)
    lens = 2 + rng.geometric(1.0 / (MEAN_SESSION_LEN - 2.0), size=n_sessions)
    total = int(lens.sum())
    ranks = np.arange(1, N_ITEMS + 1, dtype=np.float64)
    p = 1.0 / ranks ** 0.8
    p /= p.sum()
    items = rng.choice(N_ITEMS, size=total, p=p).astype(np.int64)
    sess = np.repeat(np.arange(n_sessions, dtype=np.int64), lens)
    return pd.DataFrame({"SessionId": sess, "ItemId": items,
                         "Time": np.arange(total, dtype=np.int64)})


def main():
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/g4r_paropt_sweep"
    os.makedirs(workdir, exist_ok=True)
    train_p = os.path.join(workdir, "train.tsv")
    test_p = os.path.join(workdir, "test.tsv")
    space_p = os.path.join(workdir, "space.jsonl")
    if not os.path.exists(train_p):
        # every item must appear in train so test inner-join keeps most events
        tr = synth(TRAIN_EVENTS, seed=0)
        pad = pd.DataFrame({
            "SessionId": np.arange(N_ITEMS) // 4 + tr["SessionId"].max() + 1,
            "ItemId": np.arange(N_ITEMS),
            "Time": np.arange(N_ITEMS) + len(tr)})
        pd.concat([tr, pad], ignore_index=True).to_csv(
            train_p, sep="\t", index=False)
        synth(TEST_EVENTS, seed=1).to_csv(test_p, sep="\t", index=False)
    with open(space_p, "w") as f:
        for p in SPACE:
            f.write(json.dumps(p) + "\n")

    # -u: unbuffered child stdout — piped prints otherwise arrive in block
    # flushes and the per-trial wall timing would be bogus
    cmd = [sys.executable, "-u", "-m", "gru4rec_tpu.cli.paropt", train_p, test_p,
           "-opf", space_p, "-fp", FIXED, "-nt", str(n_trials), "-m", "20",
           "-pm", "recall"]
    t0 = time.time()
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True,
                            cwd="/root/repo")
    log_path = os.path.join(workdir, "sweep.log")
    trial_rows, cur = [], None
    with open(log_path, "w") as logf:
        for line in proc.stdout:
            logf.write(line)
            line = line.rstrip()
            m = re.match(r"--- trial (\d+)/(\d+): (.*)", line)
            if m:
                if cur:
                    trial_rows.append(cur)
                cur = {"trial": int(m.group(1)), "params": m.group(3),
                       "t_start": time.time()}
                continue
            m = re.match(r"Epoch(\d+) --> .*\(([\d.]+)s\)", line)
            if m and cur is not None:
                cur[f"epoch{m.group(1)}_s"] = float(m.group(2))
                continue
            m = re.match(r"PRIMARY METRIC:\s*([-\d.eE+]+)", line)
            if m and cur is not None:
                cur["metric"] = float(m.group(1))
                cur["wall_s"] = round(time.time() - cur.pop("t_start"), 1)
    if cur:
        trial_rows.append(cur)
    rc = proc.wait()
    for row in trial_rows:
        row.pop("t_start", None)
        print(json.dumps(row), flush=True)
    warm = [r["epoch1_s"] for r in trial_rows[1:] if "epoch1_s" in r]
    t1e1 = trial_rows[0].get("epoch1_s") if trial_rows else None
    print(json.dumps({
        "metric": "paropt_sweep", "n_trials": len(trial_rows), "rc": rc,
        "total_wall_s": round(time.time() - t0, 1),
        "trial1_epoch1_s": t1e1,
        "warm_epoch1_s_median": round(float(np.median(warm)), 2) if warm else None,
        "cache_shared": bool(warm and t1e1 is not None
                             and t1e1 > 3 * float(np.median(warm))),
        "log": log_path,
    }), flush=True)


if __name__ == "__main__":
    main()
