"""Summarize the TPU-return checklist logs into decision-ready tables.

Parses the JSON lines emitted into /tmp/tpuq/*.log by
scripts/tpu_return_checklist.sh (measure_shapes v4ab/sr, the dedup A/B,
eval + serving protocols, bench) and prints, per decision procedure in
PERF_NOTES.md:

  * v4-vs-v3 delta per (shape, adapt) and v4-vs-XLA on the sub-64MB shapes
    (flip V4 default / introduce V4_MIN_TABLE_BYTES?);
  * SR-vs-control deltas (recommend bfloat16_sr in paramfile comments?);
  * dedup chain-vs-mm_pal per shape (flip dedup_impl default + K_MAX?);
  * the eval/serving/bench headline numbers.

Usage: python scripts/summarize_tpuq.py [/tmp/tpuq]
"""

import glob
import json
import os
import sys
from collections import defaultdict


def load_jsonl(path):
    rows = []
    if not os.path.exists(path):
        return rows
    for line in open(path):
        line = line.strip()
        if line.startswith("{"):
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return rows


def fmt_eps(v):
    return f"{v/1000:.0f}k" if v else "?"


def main(out_dir):
    # --- v4 A/B -----------------------------------------------------------
    rows = load_jsonl(os.path.join(out_dir, "02_v4ab.log"))
    if rows:
        print("== v4 vs v3 vs XLA (events/s) ==")
        by = defaultdict(dict)
        for r in rows:
            if "error" in r:
                print(f"  ERROR {r['shape']}/{r['adapt']}: {r['error']}")
                continue
            tag = r["version"] if r["kernel"] == "on" else "xla"
            by[(r["shape"], r["adapt"])][tag] = r["events_per_s"]
        for (shape, adapt), d in sorted(by.items()):
            v3, v4, xla = d.get("v3"), d.get("v4"), d.get("xla")
            verdict = ""
            if v3 and v4:
                verdict += f" v4/v3={v4/v3:.2f}x"
            if v4 and xla:
                verdict += f" v4/xla={v4/xla:.2f}x" + (
                    "  <-- sub-64MB WIN, set V4_MIN_TABLE_BYTES"
                    if v4 > xla else "")
            print(f"  {shape:13s} {adapt:8s} "
                  f"v3={fmt_eps(v3)} v4={fmt_eps(v4)} xla={fmt_eps(xla)}"
                  f"{verdict}")

    # --- SR A/B -----------------------------------------------------------
    rows = load_jsonl(os.path.join(out_dir, "03_sr.log"))
    if rows:
        print("== bfloat16_sr vs control (events/s) ==")
        by = defaultdict(dict)
        for r in rows:
            if "error" in r:
                print(f"  ERROR {r['shape']}/{r['adapt']}: {r['error']}")
                continue
            by[(r["shape"], r["adapt"], r["version"])][
                r["opt_state_dtype"]] = r["events_per_s"]
        for (shape, adapt, ver), d in sorted(by.items()):
            sr, ctl = d.get("bfloat16_sr"), d.get("bfloat16")
            note = ""
            if sr and ctl:
                note = f" sr/ctl={sr/ctl:.2f}x" + (
                    "  <-- recommend in paramfiles" if sr >= 1.2 * ctl
                    else "")
            print(f"  {shape:13s} {adapt:8s} {ver or 'auto':4s} "
                  f"sr={fmt_eps(sr)} ctl={fmt_eps(ctl)}{note}")

    # --- dedup A/B --------------------------------------------------------
    rows = load_jsonl(os.path.join(out_dir, "05_dedup_mm.log"))
    if rows:
        print("== dedup chain vs equality-matmul (us/step of dedup+scatter) ==")
        by = defaultdict(dict)
        for r in rows:
            by[r["shape"]][r["variant"]] = r["us_per_step"]
        for shape, d in sorted(by.items()):
            ch, mm = d.get("chain"), d.get("mm_pal")
            note = ""
            if ch and mm:
                note = f" mm/chain={mm/ch:.2f}" + (
                    "  <-- WIN: flip dedup_impl default (with K_MAX gate)"
                    if mm < ch else "  (chain keeps default)")
            print(f"  {shape:13s} chain={ch} mm_pal={mm} "
                  f"mm_xla={d.get('mm_xla')}{note}")

    # --- eval / serving / bench ------------------------------------------
    for stage, title in (("04_eval", "eval protocol"),
                         ("06_serving", "serving protocol"),
                         ("07_bench", "bench")):
        rows = load_jsonl(os.path.join(out_dir, f"{stage}.log"))
        if rows:
            print(f"== {title} ==")
            for r in rows:
                print("  " + json.dumps(r))

    summary = os.path.join(out_dir, "SUMMARY")
    if os.path.exists(summary):
        print("== stage summary ==")
        print(open(summary).read())


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpuq")
