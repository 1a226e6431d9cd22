"""Drive the Optuna (TPE) branch of cli/paropt.py with a fake optuna module.

This environment has no optuna, so the subprocess e2e test
(test_cli_and_baselines.py) only exercises the random-search fallback. These
tests monkeypatch a minimal fake ``optuna`` into sys.modules to execute the
real TPE-branch logic — ``suggest_optuna`` per dtype, study creation, the
derived-study-name/resume path (COMPLETE-count subtraction), RuntimeError
``catch`` behavior, best-params selection, and the final re-eval command —
matching the reference's optuna usage (paropt.py:109-121). ``run_once`` and
``subprocess.run`` are stubbed so no child processes are spawned (the
subprocess contract already has its own e2e test)."""

import sys
import types

import numpy as np
import pytest

from gru4rec_tpu.cli import paropt


def make_fake_optuna():
    mod = types.ModuleType("optuna")
    trial_mod = types.ModuleType("optuna.trial")

    class TrialState:
        COMPLETE = "COMPLETE"
        FAIL = "FAIL"

    trial_mod.TrialState = TrialState
    mod.trial = trial_mod

    class FakeTrial:
        def __init__(self, rng):
            self.rng = rng
            self.params = {}

        def suggest_int(self, name, low, high, step=1, log=False):
            n = (high - low) // (step or 1)
            v = int(low + self.rng.randint(n + 1) * (step or 1))
            self.params[name] = v
            return v

        def suggest_float(self, name, low, high, step=None, log=False):
            if log:
                v = float(np.exp(self.rng.uniform(np.log(low), np.log(high))))
            else:
                v = float(self.rng.uniform(low, high))
            if step:
                v = min(low + round((v - low) / step) * step, high)
            self.params[name] = v
            return v

        def suggest_categorical(self, name, choices):
            v = choices[self.rng.randint(len(choices))]
            self.params[name] = v
            return v

    class FrozenTrial:
        def __init__(self, state, value, params):
            self.state, self.value, self.params = state, value, params

    class Study:
        def __init__(self):
            self.rng = np.random.RandomState(7)
            self.trials = []

        def optimize(self, objective, n_trials, catch=()):
            for _ in range(n_trials):
                t = FakeTrial(self.rng)
                try:
                    v = objective(t)
                    self.trials.append(
                        FrozenTrial(TrialState.COMPLETE, v, dict(t.params)))
                except catch:
                    self.trials.append(
                        FrozenTrial(TrialState.FAIL, None, dict(t.params)))

        @property
        def best_params(self):
            done = [t for t in self.trials if t.state == TrialState.COMPLETE]
            if not done:
                raise ValueError("no completed trials")
            return max(done, key=lambda t: t.value).params

    registry = {}

    def create_study(direction, storage=None, study_name=None,
                     load_if_exists=False):
        assert direction == "maximize"
        key = (storage, study_name)
        if storage is not None and load_if_exists and key in registry:
            return registry[key]
        s = Study()
        if storage is not None:
            registry[key] = s
        return s

    mod.create_study = create_study
    mod._registry = registry
    return mod


SPACE = (
    '{"name": "learning_rate", "dtype": "float", "values": [0.01, 0.5], "log": true}\n'
    '{"name": "layers", "dtype": "int", "values": [32, 96], "step": 32}\n'
    '{"name": "loss", "dtype": "categorical", "values": ["bpr-max", "cross-entropy"]}\n'
)


@pytest.fixture
def harness(monkeypatch, tmp_path):
    fake = make_fake_optuna()
    monkeypatch.setitem(sys.modules, "optuna", fake)
    trial_calls, final_cmds = [], []

    def fake_run_once(args, pstr):
        trial_calls.append(pstr)
        params = dict(kv.split("=", 1) for kv in pstr.split(","))
        assert int(params["layers"]) in (32, 64, 96)
        assert params["loss"] in ("bpr-max", "cross-entropy")
        lr = float(params["learning_rate"])
        assert 0.01 <= lr <= 0.5
        if lr > 0.3:  # a "diverged" trial: run.py exits with no metric line
            raise RuntimeError("trial produced no PRIMARY METRIC line")
        return lr  # identity objective: best trial == highest surviving lr

    monkeypatch.setattr(paropt, "run_once", fake_run_once)
    monkeypatch.setattr(
        paropt.subprocess, "run",
        lambda cmd, env=None: final_cmds.append((cmd, env)))
    space = tmp_path / "space.jsonl"
    space.write_text(SPACE)
    return types.SimpleNamespace(fake=fake, trial_calls=trial_calls,
                                 final_cmds=final_cmds, space=str(space))


def test_tpe_branch_catch_best_and_final_eval(harness, capsys):
    paropt.main(["train.tsv", "test.tsv", "-opf", harness.space, "-nt", "8",
                 "-fm", "1", "20"])
    out = capsys.readouterr().out
    assert len(harness.trial_calls) == 8
    # failed trials were caught and recorded, not fatal
    study = [s for s in [harness.fake._registry.get((None, None))] if s]
    # best = the max surviving lr among the objective returns
    survived = [float(dict(kv.split("=", 1) for kv in c.split(","))
                      ["learning_rate"]) for c in harness.trial_calls]
    survived = [v for v in survived if v <= 0.3]
    assert survived, "fixture seed produced no surviving trial"
    assert f"{max(survived)}" in out.split("Best parameters:")[1]
    # final re-eval: one subprocess, multi-cutoff -m, no -lpm
    assert len(harness.final_cmds) == 1
    cmd, env = harness.final_cmds[0]
    assert "-lpm" not in cmd
    i = cmd.index("-m", cmd.index("gru4rec_tpu.cli.run"))
    assert cmd[i + 1:i + 3] == ["1", "20"]
    # trial children share the persistent compile cache by default
    assert env.get("JAX_COMPILATION_CACHE_DIR")


def test_tpe_storage_resume_skips_completed_trials(harness, capsys):
    argv = ["train.tsv", "test.tsv", "-opf", harness.space, "-nt", "5",
            "--storage", "sqlite:///study.db"]
    paropt.main(argv)
    out1 = capsys.readouterr().out
    assert "Using derived study name: gru4rec_paropt_" in out1
    n_first = len(harness.trial_calls)
    assert n_first == 5
    n_failed = sum(1 for s in harness.fake._registry.values()
                   for t in s.trials if t.state == "FAIL")

    # same storage + derived name -> resume; only the FAILED deficit reruns
    paropt.main(argv)
    assert len(harness.trial_calls) == n_first + n_failed
    # and a best-params final eval still ran both times
    assert len(harness.final_cmds) == 2


def test_trial_env_exports_cache_dir_and_tf_overrides(monkeypatch):
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    monkeypatch.delenv("GRU4REC_TPU_CACHE_DIR", raising=False)
    args = types.SimpleNamespace(flags="")
    env = paropt.trial_env(args)
    assert env["JAX_COMPILATION_CACHE_DIR"].endswith("gru4rec_tpu/xla")
    # -tf wins over the default export
    args = types.SimpleNamespace(flags="JAX_COMPILATION_CACHE_DIR=/tmp/x; FOO=1")
    env = paropt.trial_env(args)
    assert env["JAX_COMPILATION_CACHE_DIR"] == "/tmp/x"
    assert env["FOO"] == "1"
    # empty GRU4REC_TPU_CACHE_DIR disables the export entirely
    monkeypatch.setenv("GRU4REC_TPU_CACHE_DIR", "")
    args = types.SimpleNamespace(flags="")
    assert "JAX_COMPILATION_CACHE_DIR" not in paropt.trial_env(args)


def test_derived_study_name_encodes_the_objective(harness, capsys):
    """Two sweeps sharing storage must only merge when they optimize the
    SAME objective: the derived name must change with the validation set,
    primary metric, cutoff, or tie mode (else a later sweep silently
    resumes the old study and skips its own trials)."""
    def name_for(argv):
        paropt.main(argv + ["--storage", "sqlite:///s.db", "-nt", "1"])
        out = capsys.readouterr().out
        return out.split("Using derived study name: ")[1].split()[0]

    base = ["train.tsv", "test.tsv", "-opf", harness.space]
    n0 = name_for(base)
    assert name_for(base) == n0  # deterministic
    assert name_for(["train.tsv", "OTHER.tsv", "-opf", harness.space]) != n0
    assert name_for(base + ["-pm", "mrr"]) != n0
    assert name_for(base + ["-m", "5"]) != n0
    assert name_for(base + ["-e", "median"]) != n0
