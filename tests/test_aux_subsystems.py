"""Aux-subsystem smoke tests: JSONL structured logging and the
jax.profiler trace hook (SURVEY.md §5 rows)."""

import json
import os

import numpy as np
import pandas as pd

from gru4rec_tpu import GRU4Rec, GRU4RecConfig
from gru4rec_tpu.utils.logging import EventLogger


def tiny_data(n_sessions=40, n_items=12, seed=0):
    rng = np.random.RandomState(seed)
    rows, t = [], 0
    for s in range(n_sessions):
        i = rng.randint(n_items)
        for _ in range(rng.randint(3, 6)):
            rows.append((s, f"it{i}", t))
            t += 1
            i = (5 * i + 1) % n_items
    return pd.DataFrame(rows, columns=["SessionId", "ItemId", "Time"])


def test_event_logger_jsonl(tmp_path):
    path = str(tmp_path / "events.jsonl")
    lg = EventLogger(path)
    lg.log("epoch", epoch=1, loss=0.5)
    lg.log("done", ok=True)
    lg.close()
    lines = [json.loads(l) for l in open(path)]
    assert [l["event"] for l in lines] == ["epoch", "done"]
    assert lines[0]["loss"] == 0.5 and "ts" in lines[0]


def test_fit_emits_jsonl_epoch_events(tmp_path, monkeypatch):
    import gru4rec_tpu.utils.logging as logmod

    path = str(tmp_path / "train.jsonl")
    monkeypatch.setattr(logmod, "_default", EventLogger(path))
    m = GRU4Rec(GRU4RecConfig(loss="bpr-max", final_act="elu-1", layers=[8],
                              batch_size=4, n_sample=8, n_epochs=2,
                              chunk_size=16, item_pad_multiple=8))
    m.fit(tiny_data())
    events = [json.loads(l) for l in open(path)]
    epochs = [e for e in events if e["event"] == "epoch"]
    assert len(epochs) == 2
    assert {"epoch", "loss", "seconds", "events"} <= set(epochs[0])


def test_fit_profile_dir_writes_trace(tmp_path):
    prof = str(tmp_path / "prof")
    m = GRU4Rec(GRU4RecConfig(loss="bpr-max", final_act="elu-1", layers=[8],
                              batch_size=4, n_sample=8, n_epochs=2,
                              chunk_size=16, item_pad_multiple=8))
    m.fit(tiny_data(), profile_dir=prof)
    found = []
    for root, _, files in os.walk(prof):
        found.extend(files)
    assert found, "profiler hook produced no trace files"


def test_top1_divergence_warning(capsys):
    # loss=top1 is a deliberate parity break (ops/losses.py fixes the
    # reference's M-times regularizer broadcast, gru4rec.py:242-244); the
    # config layer must warn at selection time, not just in a code comment
    GRU4RecConfig(loss="top1", final_act="tanh", layers=[8], batch_size=32)
    out = capsys.readouterr().out
    assert "loss=top1" in out and "regulariz" in out and "32" in out

    capsys.readouterr()
    GRU4RecConfig(loss="top1-max", final_act="elu-1", layers=[8])
    assert "loss=top1" not in capsys.readouterr().out
