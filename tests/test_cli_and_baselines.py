"""CLI end-to-end (train -> save -> eval -> PRIMARY METRIC; load-model path)
and baseline predictors through the per-event evaluator."""

import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from gru4rec_tpu.baselines import BPR, ItemKNN, Pop, RandomPred, SessionPop
from gru4rec_tpu.eval import evaluate_sessions


def markov_df(n_sessions, n_items=20, seed=0):
    rng = np.random.RandomState(seed)
    rows, t = [], 0
    for s in range(n_sessions):
        i = rng.randint(n_items)
        for _ in range(rng.randint(2, 7)):
            rows.append((s, f"it{i}", t))
            t += 1
            i = (3 * i + 1) % n_items
    return pd.DataFrame(rows, columns=["SessionId", "ItemId", "Time"])


@pytest.fixture(scope="module")
def tsv_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    train, test = markov_df(120), markov_df(30, seed=9)
    train_p, test_p = str(d / "train.tsv"), str(d / "test.tsv")
    train.to_csv(train_p, sep="\t", index=False)
    test.to_csv(test_p, sep="\t", index=False)
    return train_p, test_p, str(d / "model.npz")


def run_cli(args):
    return subprocess.run(
        [sys.executable, "-m", "gru4rec_tpu.cli.run", *args],
        capture_output=True, text=True, timeout=560,
        env={
            **__import__("os").environ,
            "GRU4REC_TPU_TEST_PLATFORM": "cpu",
            # honored explicitly by cli/run.py; without it the children would
            # silently train through the TPU tunnel (~2 min of remote compiles
            # per subprocess)
            "JAX_PLATFORMS": "cpu",
        },
    )


def test_cli_train_eval_save(tsv_files):
    train_p, test_p, model_p = tsv_files
    res = run_cli([
        train_p,
        "-ps", "loss=cross-entropy,final_act=softmax,layers=24,batch_size=8,"
               "n_sample=16,n_epochs=2,chunk_size=64,item_pad_multiple=32,"
               "learning_rate=0.15",
        "-t", test_p, "-m", "1", "5", "-pm", "recall", "-lpm",
        "-s", model_p, "-d", "cpu",
    ])
    assert res.returncode == 0, res.stdout + res.stderr
    assert "Recall@1:" in res.stdout and "Recall@5:" in res.stdout
    pm_lines = [l for l in res.stdout.splitlines() if l.startswith("PRIMARY METRIC:")]
    assert len(pm_lines) == 1
    assert 0.0 <= float(pm_lines[0].split(":")[1]) <= 1.0


def test_cli_load_model(tsv_files):
    train_p, test_p, model_p = tsv_files
    res = run_cli([model_p, "-l", "-t", test_p, "-m", "5", "-pm", "mrr", "-lpm",
                   "-d", "cpu"])
    assert res.returncode == 0, res.stdout + res.stderr
    assert "PRIMARY METRIC:" in res.stdout


def test_cli_mesh_flag(tsv_files):
    """--mesh NDxNM trains AND evaluates through the distributed paths (8
    virtual CPU devices; metrics must match the single-device run of the
    same seed/config)."""
    import os
    import subprocess

    train_p, test_p, _ = tsv_files
    ps = ("loss=cross-entropy,final_act=softmax,layers=24,batch_size=8,"
          "n_sample=16,n_epochs=2,chunk_size=64,item_pad_multiple=32,"
          "learning_rate=0.15,compute_dtype=float32")
    env = {
        **os.environ, "GRU4REC_TPU_TEST_PLATFORM": "cpu",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
    }

    def run(extra):
        return subprocess.run(
            [sys.executable, "-m", "gru4rec_tpu.cli.run", train_p, "-ps", ps,
             "-t", test_p, "-m", "4", "-pm", "recall", "-lpm", "-d", "cpu",
             *extra],
            capture_output=True, text=True, timeout=560, env=env)

    res_m = run(["--mesh", "2x4"])
    assert res_m.returncode == 0, res_m.stdout + res_m.stderr
    assert "Device mesh: 2 data x 4 model" in res_m.stdout
    res_s = run([])
    assert res_s.returncode == 0, res_s.stdout + res_s.stderr

    def pm(res):
        return float([l for l in res.stdout.splitlines()
                      if l.startswith("PRIMARY METRIC:")][0].split(":")[1])

    assert abs(pm(res_m) - pm(res_s)) < 1e-6, (pm(res_m), pm(res_s))


def test_load_data_accepts_joblib_pickles(tmp_path):
    """The reference dumps datasets with joblib (run.py:48); its archives are
    not plain pickles, and a user's existing .pickle files must still load."""
    import joblib

    from gru4rec_tpu.data.loader import load_data

    df = markov_df(10)
    p = str(tmp_path / "train.pickle")
    joblib.dump(df, p)
    loaded = load_data(p)
    pd.testing.assert_frame_equal(loaded, df)
    # plain pandas pickles keep working
    p2 = str(tmp_path / "train2.pickle")
    df.to_pickle(p2)
    pd.testing.assert_frame_equal(load_data(p2), df)


def test_evaluate_sessions_unknown_target_raises():
    """A test item absent from the training vocabulary must raise (like the
    reference's KeyError, evaluation.py:294) instead of silently scoring the
    wrong column."""
    train = markov_df(50)
    pr = Pop()
    pr.fit(train)
    test = markov_df(10, seed=3)
    test.loc[test.index[1], "ItemId"] = "unseen-item"
    with pytest.raises(KeyError):
        evaluate_sessions(pr, test, train, cut_off=5)


def test_cli_requires_exactly_one_mode(tsv_files):
    train_p, test_p, _ = tsv_files
    res = run_cli([train_p])
    assert res.returncode == 1
    assert "Exactly one" in res.stdout


def test_pop_baseline():
    train = markov_df(100)
    test = markov_df(20, seed=3)
    pop = Pop(item_key="ItemId")
    pop.fit(train)
    r, m = evaluate_sessions(pop, test, train, cut_off=5)
    assert 0 <= m <= r <= 1

    p = pop.predict_next(0, "it0", train.ItemId.unique())
    top_item = train.groupby("ItemId").size().idxmax()
    assert p.idxmax() == top_item


def test_session_pop_prefers_repeated_items():
    train = markov_df(50)
    sp = SessionPop()
    sp.fit(train)
    items = train.ItemId.unique()
    sp.predict_next(1, "it5", items)
    sp.predict_next(1, "it5", items)
    p = sp.predict_next(1, "it5", items)
    assert p.idxmax() == "it5"  # seen 3x in this session


def test_itemknn_finds_markov_successor():
    train = markov_df(200)
    knn = ItemKNN(n_sims=10)
    knn.fit(train)
    # successor of it2 is it7 ((3*2+1) % 20); they co-occur in most sessions
    sims = knn.sims["it2"]
    assert "it7" in sims.index[:5]
    r, m = evaluate_sessions(knn, markov_df(20, seed=4), train, cut_off=5)
    assert r > 0.5  # deterministic chain: knn should do well


def test_itemknn_matches_reference_loop_semantics():
    """The vectorized co-occurrence must equal the reference's event-pair count
    (baselines.py:261-276), including duplicate occurrences within a session."""
    train = pd.DataFrame({
        "SessionId": [0, 0, 0, 1, 1, 2, 2, 2],
        "ItemId": ["a", "b", "a", "a", "b", "b", "c", "b"],
        "Time": range(8),
    })
    knn = ItemKNN(n_sims=10, lmbd=0.0, alpha=0.5)
    knn.fit(train)
    # co(a,b): session0 supp(a)=2*supp(b)=1 ->2; session1 1*1 ->1; total 3
    # norm = sqrt(supp_a)*sqrt(supp_b) = sqrt(3)*sqrt(4)
    np.testing.assert_allclose(knn.sims["a"]["b"], 3 / (np.sqrt(3) * np.sqrt(4)))
    # co(b,c): session2 supp(b)=2, supp(c)=1 -> 2
    np.testing.assert_allclose(knn.sims["c"]["b"], 2 / (np.sqrt(1) * np.sqrt(4)))


class _HideSessionAPI:
    """Expose only predict_next, forcing evaluate_sessions' per-event fallback."""

    def __init__(self, inner):
        self._inner = inner

    def predict_next(self, *a):
        return self._inner.predict_next(*a)


def test_evaluate_sessions_vectorized_matches_per_event():
    """The session-vectorized evaluator path must reproduce the per-event
    fallback exactly for every baseline (same scores, same dither stream:
    rand(E-1, n) consumes the generator identically to E-1 rand(n) calls)."""
    train = markov_df(120)
    test = markov_df(25, seed=8)
    makers = {
        "pop": lambda: Pop(item_key="ItemId"),
        "spop": lambda: SessionPop(item_key="ItemId"),
        "knn": lambda: ItemKNN(n_sims=10),
        "bpr": lambda: BPR(n_factors=8, n_iterations=2, learning_rate=0.05),
        "rand": lambda: RandomPred(),
    }
    for name, mk in makers.items():
        a, b = mk(), mk()
        a.fit(train)
        b.fit(train)
        r1, m1 = evaluate_sessions(a, test, train, cut_off=5,
                                   rng=np.random.RandomState(7))
        r2, m2 = evaluate_sessions(_HideSessionAPI(b), test, train, cut_off=5,
                                   rng=np.random.RandomState(7))
        np.testing.assert_allclose([r1, m1], [r2, m2], atol=1e-12, err_msg=name)


def test_evaluate_sessions_items_subset_paths_agree():
    """Item-subset mode: the vectorized path scores items + out-of-list
    targets as extra columns; ranks must match the fallback's per-event
    [target]+items scoring (BPR: continuous scores, no ties to flip)."""
    train = markov_df(120)
    test = markov_df(25, seed=8)
    items = train.ItemId.unique()[:7]
    a = BPR(n_factors=8, n_iterations=2, learning_rate=0.05)
    b = BPR(n_factors=8, n_iterations=2, learning_rate=0.05)
    a.fit(train)
    b.fit(train)
    r1, m1 = evaluate_sessions(a, test, train, items=items, cut_off=5,
                               rng=np.random.RandomState(7))
    r2, m2 = evaluate_sessions(_HideSessionAPI(b), test, train, items=items,
                               cut_off=5, rng=np.random.RandomState(7))
    np.testing.assert_allclose([r1, m1], [r2, m2], atol=1e-9)


def test_itemknn_long_sessions_memory_bounded():
    """Long sessions must not blow up the similarity build: the sparse Gram
    matrix is linear in distinct co-occurring pairs, while a session-level
    self-join would materialize sum(len^2) ~ 4.3M pair rows here."""
    rng = np.random.RandomState(0)
    rows, t = [], 0
    for s in range(30):
        for _ in range(380):
            rows.append((s, f"it{rng.randint(60)}", t))
            t += 1
    train = pd.DataFrame(rows, columns=["SessionId", "ItemId", "Time"])
    knn = ItemKNN(n_sims=10)
    knn.fit(train)
    assert len(knn.sims) == train.ItemId.nunique()


def test_bpr_baseline_learns():
    train = markov_df(150)
    bpr = BPR(n_factors=16, n_iterations=3, learning_rate=0.05)
    bpr.fit(train)
    rnd = RandomPred()
    r_bpr, _ = evaluate_sessions(bpr, markov_df(20, seed=6), train, cut_off=10)
    r_rnd, _ = evaluate_sessions(rnd, markov_df(20, seed=6), train, cut_off=10)
    assert r_bpr > r_rnd


def test_bpr_batched_mode_learns():
    """batch_size>1 trades the reference's per-event SGD for vectorized
    mini-batches (usable at RSC15 scale); it must still learn."""
    train = markov_df(150)
    bpr = BPR(n_factors=16, n_iterations=6, learning_rate=0.05, batch_size=64)
    bpr.fit(train)
    rnd = RandomPred()
    r_bpr, _ = evaluate_sessions(bpr, markov_df(20, seed=6), train, cut_off=10)
    r_rnd, _ = evaluate_sessions(rnd, markov_df(20, seed=6), train, cut_off=10)
    assert r_bpr > r_rnd


def test_cli_param_file(tsv_files, tmp_path):
    """-pf loads an OrderedDict param-file module (reference run.py:88-95)."""
    train_p, test_p, _ = tsv_files
    pf = tmp_path / "tiny_best.py"
    pf.write_text(
        "from collections import OrderedDict\n"
        "gru4rec_params = OrderedDict([\n"
        "    ('loss', 'bpr-max'), ('final_act', 'elu-1'), ('layers', [16]),\n"
        "    ('batch_size', 8), ('n_sample', 16), ('n_epochs', 2),\n"
        "    ('chunk_size', 64), ('item_pad_multiple', 32),\n"
        "    ('learning_rate', 0.1), ('momentum', 0.1),\n"
        "])\n"
    )
    res = run_cli([train_p, "-pf", str(pf), "-t", test_p, "-m", "5", "-d", "cpu"])
    assert res.returncode == 0, res.stdout + res.stderr
    assert "Recall@5:" in res.stdout


def test_shipped_paramfiles_parse():
    """Every shipped best-config / sample-config file must load into a valid
    GRU4RecConfig (these are what users will pass to -pf)."""
    import glob
    import os

    from gru4rec_tpu.config import GRU4RecConfig

    root = os.path.join(os.path.dirname(__file__), "..")
    files = sorted(
        glob.glob(os.path.join(root, "paramfiles", "*.py"))
        + glob.glob(os.path.join(root, "param_samples", "*.py"))
    )
    assert len(files) >= 11
    for f in files:
        cfg = GRU4RecConfig.from_parameter_file(f)
        assert cfg.loss in ("cross-entropy", "bpr-max"), f
        assert cfg.n_sample == 2048, f


def test_paropt_random_search_end_to_end(tsv_files, tmp_path):
    """paropt without optuna: random-search fallback over a JSONL space,
    process-isolated trials, -tf env passthrough, final re-eval."""
    import json
    import subprocess
    import sys

    train_p, test_p, _ = tsv_files
    space = tmp_path / "space.json"
    space.write_text(
        '{"name": "learning_rate", "dtype": "float", "values": [0.05, 0.2], "log": true}\n'
        '{"name": "layers", "dtype": "categorical", "values": [16]}\n'
    )
    trial_log = tmp_path / "trials.jsonl"
    res = subprocess.run(
        [sys.executable, "-m", "gru4rec_tpu.cli.paropt", train_p, test_p,
         "-fp", "loss=bpr-max,final_act=elu-1,batch_size=8,n_sample=16,"
                "n_epochs=1,chunk_size=64,item_pad_multiple=32",
         "-opf", str(space), "-nt", "2", "-m", "5", "-fm", "5",
         # the passthrough must reach the children: the JSONL sink is only
         # ever read from the environment, so epoch events in trial_log
         # prove -tf took effect
         "-tf", f"GRU4REC_TPU_LOG_JSONL={trial_log}"],
        capture_output=True, text=True, timeout=560,
        env={**__import__("os").environ, "GRU4REC_TPU_TEST_PLATFORM": "cpu",
             "JAX_PLATFORMS": "cpu"},
        cwd=__import__("os").path.join(__import__("os").path.dirname(__file__), ".."),
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert res.stdout.count("PRIMARY METRIC:") == 2
    assert "Best parameters:" in res.stdout
    events = [json.loads(l) for l in open(trial_log)]
    # 2 trials + final re-eval, 1 epoch each, via -tf env passthrough
    assert sum(e["event"] == "epoch" for e in events) == 3
