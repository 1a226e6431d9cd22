"""Execute the all-datasets published-results harness on synthetic data.

Mirrors tests/test_rsc15_harness.py for examples/reproduce_published.py:
the logic (paramfile loading, metric table assertion, JSON report, exit
status, mesh routing) must be proven executable before a dataset holder
relies on it. Published table provenance: reference README.md:349-368."""

import importlib.util
import json
import os

import numpy as np
import pandas as pd
import pytest

_PATH = os.path.join(os.path.dirname(__file__), "..", "examples",
                     "reproduce_published.py")


@pytest.fixture(scope="module")
def harness():
    spec = importlib.util.spec_from_file_location("reproduce_published", _PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def tsvs(tmp_path_factory):
    d = tmp_path_factory.mktemp("published")

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


@pytest.fixture
def tiny_dataset(harness, monkeypatch, tmp_path):
    """Patch in a 'tiny' dataset entry backed by a real (tiny) paramfile."""
    pf = tmp_path / "tiny_best.py"
    pf.write_text(
        "from collections import OrderedDict\n"
        "gru4rec_params = OrderedDict([('loss', 'bpr-max'),"
        "('constrained_embedding', True), ('layers', [24]),"
        "('n_epochs', 2), ('batch_size', 16), ('n_sample', 32),"
        "('learning_rate', 0.1)])\n")
    orig = harness.load_config

    def load(paramfile):
        if paramfile == "tiny_best":
            from gru4rec_tpu import GRU4RecConfig

            return GRU4RecConfig.from_parameter_file(str(pf))
        return orig(paramfile)

    monkeypatch.setattr(harness, "load_config", load)
    monkeypatch.setitem(harness.EXPECTED, "tiny", {
        "paramfile": "tiny_best",
        # deterministic markov chain: ~1.0 at every cutoff
        "recall": {1: 1.0, 5: 1.0, 10: 1.0, 20: 1.0},
        "mrr": {1: 1.0, 5: 1.0, 10: 1.0, 20: 1.0},
    })
    return harness


def test_pass_and_report_schema(tiny_dataset, tsvs, tmp_path):
    train, test = tsvs
    out = str(tmp_path / "rep.json")
    rc = tiny_dataset.main(["tiny", train, test, "--tol", "0.2",
                            "--out", out])
    assert rc == 0
    rep = json.load(open(out))
    assert rep["pass"] is True and rep["dataset"] == "tiny"
    assert len(rep["metrics"]) == 8  # 4 cutoffs x recall+mrr
    for m in rep["metrics"]:
        assert m["pass"] is True and m["rel_err"] <= 0.2


def test_fail_exit_status(tiny_dataset, tsvs, tmp_path, monkeypatch):
    train, test = tsvs
    monkeypatch.setitem(
        tiny_dataset.EXPECTED["tiny"], "mrr",
        {1: 0.01, 5: 0.01, 10: 0.01, 20: 0.01})
    out = str(tmp_path / "rep.json")
    rc = tiny_dataset.main(["tiny", train, test, "--tol", "0.05",
                            "--out", out])
    assert rc == 1
    rep = json.load(open(out))
    assert rep["pass"] is False
    assert any(not m["pass"] for m in rep["metrics"])


def test_cutoff_subset_and_mesh(tiny_dataset, tsvs, tmp_path):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    train, test = tsvs
    out = str(tmp_path / "rep.json")
    rc = tiny_dataset.main(["tiny", train, test, "--tol", "0.2", "--out",
                            out, "--cutoffs", "1", "20", "--mesh", "2x4"])
    assert rc == 0
    rep = json.load(open(out))
    assert [m["metric"] for m in rep["metrics"]] == [
        "recall@1", "recall@20", "mrr@1", "mrr@20"]


def test_published_table_pinned(harness):
    """Every dataset maps to a shipped paramfile and the exact published
    metric table (reference README.md:361-368)."""
    assert set(harness.EXPECTED) == {"rsc15", "yoochoose", "rees46", "coveo",
                                     "retailrocket", "diginetica"}
    for name, exp in harness.EXPECTED.items():
        path = os.path.join(os.path.dirname(_PATH), "..", "paramfiles",
                            exp["paramfile"] + ".py")
        assert os.path.exists(path), (name, path)
        cfg = harness.load_config(exp["paramfile"])
        assert cfg.n_sample == 2048
        assert set(exp["recall"]) == set(exp["mrr"]) == {1, 5, 10, 20}
    # spot-pin two rows verbatim
    assert harness.EXPECTED["rees46"]["recall"][20] == 0.5293
    assert harness.EXPECTED["diginetica"]["mrr"][20] == 0.1542
