"""Protocol test for examples/rsc15/preprocess.py on synthetic clicks.

Pins the reference preprocessing invariants (upstream
examples/rsc15/preprocess.py): iterated length/support filters, last-day
session splits applied twice (full->test, train->valid), test/valid vocab
restricted to their train side, and the exact output file contract."""

import datetime as dt
import importlib.util
import os

import numpy as np
import pandas as pd
import pytest

_PATH = os.path.join(os.path.dirname(__file__), "..", "examples", "rsc15",
                     "preprocess.py")


@pytest.fixture(scope="module")
def outputs(tmp_path_factory):
    spec = importlib.util.spec_from_file_location("rsc15_preprocess", _PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    d = tmp_path_factory.mktemp("rsc15_raw")
    rng = np.random.RandomState(4)
    base = dt.datetime(2014, 4, 1)
    rows = []
    for s in range(400):
        # sessions spread over 10 days; a burst on the last day
        day = rng.randint(10) if rng.rand() > 0.2 else 9
        t0 = base + dt.timedelta(days=int(day),
                                 seconds=int(rng.randint(80000)))
        for e in range(rng.randint(1, 7)):  # includes length-1 sessions
            ts = t0 + dt.timedelta(seconds=e)
            rows.append((s, ts.strftime("%Y-%m-%dT%H:%M:%S.%fZ")[:23] + "Z",
                         int(rng.zipf(1.4) % 60)))
    raw = d / "yoochoose-clicks.dat"
    pd.DataFrame(rows).to_csv(raw, header=False, index=False)
    out = tmp_path_factory.mktemp("rsc15_out")
    mod.main(str(raw), str(out))
    names = ["rsc15_train_full.txt", "rsc15_test.txt", "rsc15_train_tr.txt",
             "rsc15_train_valid.txt"]
    return {n: pd.read_csv(out / n, sep="\t") for n in names}


def test_output_contract(outputs):
    for name, df in outputs.items():
        assert list(df.columns) == ["SessionId", "ItemId", "Time"], name
        assert len(df) > 0, name


def test_filters(outputs):
    # post-filter invariants hold on the concatenated full data
    full = pd.concat([outputs["rsc15_train_full.txt"],
                      outputs["rsc15_test.txt"]])
    assert (full.groupby("SessionId").size() >= 2).all()
    # item support >= 5 was enforced BEFORE the final session re-filter and
    # the train/test split, so it can dip afterwards — but never to dust
    assert full.ItemId.value_counts().median() >= 2


def test_last_day_splits(outputs):
    train_full = outputs["rsc15_train_full.txt"]
    test = outputs["rsc15_test.txt"]
    # every test session's last event falls within one day of the corpus max
    tmax = pd.concat([train_full, test]).Time.max()
    assert (test.groupby("SessionId").Time.max() >= tmax - 86400).all()
    assert (train_full.groupby("SessionId").Time.max() < tmax - 86400).all()
    # vocab restriction + min-length refilter
    assert set(test.ItemId) <= set(train_full.ItemId)
    assert (test.groupby("SessionId").size() >= 2).all()


def test_second_split_partitions_train_full(outputs):
    train_full = outputs["rsc15_train_full.txt"]
    tr = outputs["rsc15_train_tr.txt"]
    valid = outputs["rsc15_train_valid.txt"]
    # tr/valid sessions partition train_full's (valid loses only sessions
    # dropped by the vocab+length refilter)
    assert set(tr.SessionId).isdisjoint(set(valid.SessionId))
    assert set(tr.SessionId) | set(valid.SessionId) <= set(train_full.SessionId)
    assert set(valid.ItemId) <= set(tr.ItemId)
    assert (valid.groupby("SessionId").size() >= 2).all()
    tmax = train_full.Time.max()
    assert (valid.groupby("SessionId").Time.max() >= tmax - 86400).all()
