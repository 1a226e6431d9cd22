"""Execute the RSC15 asserting-parity harness end-to-end on synthetic data.

The real dataset cannot ship with the repo, but the harness logic — config
loop, metric assertion against expectations, relative-tolerance math, JSON
report schema, exit status — must be proven executable before the first
user with the official files relies on it (reference protocol:
examples/rsc15/run_rsc15.py:24-38 of the upstream repo)."""

import importlib.util
import json
import os
import sys

import numpy as np
import pandas as pd
import pytest

_PATH = os.path.join(os.path.dirname(__file__), "..", "examples", "rsc15",
                     "run_rsc15.py")


@pytest.fixture(scope="module")
def harness():
    spec = importlib.util.spec_from_file_location("run_rsc15", _PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def tsvs(tmp_path_factory):
    d = tmp_path_factory.mktemp("rsc15")
    rng = np.random.RandomState(0)

    def sessions(n, seed):
        r = np.random.RandomState(seed)
        rows, t = [], 0
        for s in range(n):
            i = r.randint(50)
            for _ in range(r.randint(3, 8)):
                rows.append((s, f"i{i}", t))
                t += 1
                i = (7 * i + 3) % 50
        return pd.DataFrame(rows, columns=["SessionId", "ItemId", "Time"])

    train, test = d / "train.txt", d / "test.txt"
    sessions(300, 1).to_csv(train, sep="\t", index=False)
    sessions(50, 9).to_csv(test, sep="\t", index=False)
    return str(train), str(test)


def _tiny_configs(expected):
    return [("tiny", dict(
        loss="bpr-max", final_act="elu-1", hidden_act="tanh", layers=[24],
        adapt="adagrad", n_epochs=2, batch_size=16, n_sample=32,
        learning_rate=0.1, constrained_embedding=True), expected)]


def test_harness_pass_and_report(harness, tsvs, tmp_path, monkeypatch):
    train, test = tsvs
    # the markov chain is deterministic: recall@20 hits ~1.0. Expect that.
    monkeypatch.setattr(harness, "CONFIGS",
                        _tiny_configs({"recall@20": 1.0, "mrr@20": 1.0}))
    out = str(tmp_path / "report.json")
    rc = harness.main([train, test, "--tol", "0.2", "--out", out])
    assert rc == 0
    rep = json.load(open(out))
    assert rep["pass"] is True
    (entry,) = rep["results"]
    assert entry["pass"] is True
    assert set(entry["expected"]) == {"recall@20", "mrr@20"}
    assert set(entry["rel_err"]) == {"recall@20", "mrr@20"}
    assert 0 <= entry["measured"]["recall@20"] <= 1
    assert entry["fit_seconds"] > 0


def test_harness_fails_out_of_tolerance(harness, tsvs, tmp_path, monkeypatch):
    train, test = tsvs
    # expectations no model can hit at tol=1%: must FAIL with rc=1
    monkeypatch.setattr(harness, "CONFIGS",
                        _tiny_configs({"recall@20": 0.123, "mrr@20": 0.9}))
    out = str(tmp_path / "report.json")
    rc = harness.main([train, test, "--tol", "0.01", "--out", out])
    assert rc == 1
    rep = json.load(open(out))
    assert rep["pass"] is False
    assert rep["results"][0]["pass"] is False


def test_harness_config_subset(harness, tsvs, tmp_path, monkeypatch):
    train, test = tsvs
    cfgs = _tiny_configs({"recall@20": 1.0, "mrr@20": 1.0})
    cfgs.append(("never-run", {"invalid": True}, {}))  # would crash if run
    monkeypatch.setattr(harness, "CONFIGS", cfgs)
    out = str(tmp_path / "report.json")
    rc = harness.main([train, test, "--tol", "0.2", "--configs", "0",
                       "--out", out])
    assert rc == 0
    rep = json.load(open(out))
    assert [e["config"] for e in rep["results"]] == ["tiny"]


def test_published_configs_match_reference_protocol(harness):
    """The three shipped configs must stay pinned to the reference's
    hyperparameters and published numbers (upstream run_rsc15.py:24-38)."""
    names = [c[0] for c in harness.CONFIGS]
    assert names == ["bpr-max", "bpr-max-constrained", "cross-entropy"]
    exp = {c[0]: c[2] for c in harness.CONFIGS}
    assert exp["bpr-max"] == {"recall@20": 0.7197, "mrr@20": 0.3157}
    assert exp["bpr-max-constrained"] == {"recall@20": 0.7261,
                                          "mrr@20": 0.3124}
    assert exp["cross-entropy"] == {"recall@20": 0.7180, "mrr@20": 0.3087}
    for _, params, _ in harness.CONFIGS:
        assert params["layers"] == [100]
        assert params["n_epochs"] == 10
        assert params["batch_size"] == 32
        assert params["n_sample"] == 2048
