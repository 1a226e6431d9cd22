"""Multi-device tests on the virtual 8-CPU mesh: the distributed training
chunk (DP lanes x model-sharded tables) must produce the same parameters and
loss as the single-device chunk, bit-for-bit up to float reassociation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gru4rec_tpu.config import GRU4RecConfig
from gru4rec_tpu.parallel.dist_step import make_dist_chunk_fn, shard_train_state
from gru4rec_tpu.parallel.mesh import factor_mesh, make_mesh
from gru4rec_tpu.train.step import init_train_state, make_chunk_fn

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _mk_inputs(cfg, n_items, seed=0):
    rng = np.random.RandomState(seed)
    C, B = cfg.chunk_size, cfg.batch_size
    in_c = rng.randint(0, n_items, (C, B)).astype(np.int32)
    out_c = rng.randint(0, n_items, (C, B)).astype(np.int32)
    valid_c = np.ones((C, B), bool)
    valid_c[-1, B // 2:] = False  # exercise dead lanes
    reset_c = np.zeros((C, B), bool)
    reset_c[0] = True
    reset_c[2, :2] = True
    n_pad = ((n_items + cfg.item_pad_multiple - 1) // cfg.item_pad_multiple) * cfg.item_pad_multiple
    cdf = np.linspace(0.01, 1.0, n_items, dtype=np.float32)
    logp0 = np.abs(rng.randn(n_pad)).astype(np.float32) + 0.1
    return in_c, out_c, valid_c, reset_c, cdf, logp0


def _run_dist_vs_single(mode_kwargs, loss, adapt="adagrad", **extra_cfg):
    from gru4rec_tpu.parallel.dist_step import _strip_scratch

    n_items = 90
    cfg = GRU4RecConfig(
        loss=loss, final_act="softmax" if loss == "cross-entropy" else "elu-1",
        layers=[16], batch_size=8, n_sample=12, chunk_size=5,
        item_pad_multiple=32, learning_rate=0.1, momentum=0.2, logq=1.0,
        adapt=adapt,
        dropout_p_hidden=0.0, dropout_p_embed=0.0, sampler="searchsorted",
        # bf16 matmuls round differently under sharded vs single-device
        # operand blocking, and stochastically-rounded narrow optimizer state
        # draws different bits per shard packing; parity needs bit-stable f32
        compute_dtype="float32", opt_state_dtype="float32",
        **mode_kwargs, **extra_cfg,
    )
    inputs = _mk_inputs(cfg, n_items)
    args = tuple(jnp.asarray(a) for a in inputs)

    # single device (the key buffer is donated by the chunk call: use a fresh
    # PRNGKey per state)
    s1 = init_train_state(cfg, n_items, jax.random.PRNGKey(3))
    f1 = make_chunk_fn(cfg, n_items)
    s1, loss1, ev1 = f1(s1, *args)

    # 2 data x 4 model mesh
    nm = 4
    mesh = make_mesh(2, nm)
    s2 = init_train_state(cfg, n_items, jax.random.PRNGKey(3))
    s2 = shard_train_state(s2, cfg, mesh)
    f2 = make_dist_chunk_fn(cfg, n_items, mesh)
    out = f2(s2.params, s2.opt_state, s2.H, s2.key, s2.step, *args)
    params2, _, H2, _, _, loss2, ev2 = out
    strip = lambda a: np.asarray(_strip_scratch(a, nm))

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
    assert float(ev1) == float(ev2)
    np.testing.assert_allclose(
        np.asarray(s1.params["Wy"]), strip(params2["Wy"]), rtol=2e-4, atol=1e-6,
        err_msg="Wy",
    )
    for i in range(len(cfg.layers)):
        np.testing.assert_allclose(
            np.asarray(s1.params["Wh"][i]), np.asarray(params2["Wh"][i]),
            rtol=2e-4, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(s1.H[i]), np.asarray(H2[i]), rtol=2e-4, atol=1e-6
        )
    if "E" in s1.params:
        np.testing.assert_allclose(
            np.asarray(s1.params["E"]), strip(params2["E"]), rtol=2e-4, atol=1e-6
        )
    if not mode_kwargs:  # one-hot: Wx0 is a sharded table
        np.testing.assert_allclose(
            np.asarray(s1.params["Wx"][0]), strip(params2["Wx"][0]),
            rtol=2e-4, atol=1e-6,
        )


@pytest.mark.parametrize("mode_kwargs", [
    {"constrained_embedding": True},
    {"embedding": 16},
    {},
])
@pytest.mark.parametrize("loss", ["bpr-max", "cross-entropy"])
def test_dist_matches_single_device(mode_kwargs, loss):
    _run_dist_vs_single(mode_kwargs, loss)


def test_dist_with_matmul_dedup_matches_single_device():
    """dedup_impl='matmul' on the distributed XLA path: the shard-local
    index vectors carry SENTINEL for every non-owned row, so the equality
    matmul's fused sentinel handling must reproduce the sort chain's
    update under sharding (single-device side runs the same impl)."""
    _run_dist_vs_single({"constrained_embedding": True}, "bpr-max",
                        dedup_impl="matmul")


@pytest.mark.parametrize("version", [None, "v4"])
@pytest.mark.parametrize("adapt", ["adagrad", "rmsprop", "adadelta", "adam"])
def test_dist_with_forced_kernel_matches_single_device(adapt, version,
                                                       monkeypatch):
    """The fused sparse-update kernel on SHARDED tables (per-shard scratch
    rows provide the dummy group) must reproduce the single-device XLA-path
    parameters — both the default v3 pipeline and the compact-gradient v4
    (whose VMEM-resident gcomp is built per shard)."""
    import gru4rec_tpu.train.optimizers as optmod

    monkeypatch.setattr(optmod, "_FORCE_PALLAS", True)
    monkeypatch.setattr(optmod, "_FORCE_PALLAS_VERSION", version)
    # single-device side also runs the (interpret-mode) kernel; parity with
    # the XLA path is covered by test_pallas_kernels
    _run_dist_vs_single({"constrained_embedding": True}, "bpr-max", adapt=adapt)


def test_factor_mesh():
    assert factor_mesh(8) == (2, 4)
    # both axes stay exercised whenever the device count allows: a 1 x N
    # mesh would have zero lane parallelism
    assert factor_mesh(4) == (2, 2)
    assert factor_mesh(2) == (2, 1)
    assert factor_mesh(1) == (1, 1)
    assert factor_mesh(6) == (3, 2)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_fit_with_mesh_end_to_end():
    """User-facing fit(mesh=...) must train and evaluate like single-device."""
    import pandas as pd

    from gru4rec_tpu import GRU4Rec, GRU4RecConfig
    from gru4rec_tpu.eval import evaluate

    rng = np.random.RandomState(0)
    rows, t = [], 0
    for s in range(150):
        i = rng.randint(24)
        for _ in range(rng.randint(3, 7)):
            rows.append((s, f"it{i}", t)); t += 1; i = (7 * i + 3) % 24
    data = pd.DataFrame(rows, columns=["SessionId", "ItemId", "Time"])

    def cfg():
        return GRU4RecConfig(loss="cross-entropy", final_act="softmax",
                             layers=[16], batch_size=8, n_sample=8, n_epochs=3,
                             chunk_size=32, item_pad_multiple=32,
                             learning_rate=0.1)

    mesh = make_mesh(2, 4)
    m_dist = GRU4Rec(cfg())
    m_dist.fit(data, mesh=mesh)
    m_single = GRU4Rec(cfg())
    m_single.fit(data)

    # identical RNG for negatives + no dropout => identical loss trajectories
    l_d = [e["loss"] for e in m_dist.epoch_stats]
    l_s = [e["loss"] for e in m_single.epoch_stats]
    np.testing.assert_allclose(l_d, l_s, rtol=1e-3)

    rec_d, _ = evaluate(m_dist, data, cut_off=[1], batch_size=8)
    rec_s, _ = evaluate(m_single, data, cut_off=[1], batch_size=8)
    np.testing.assert_allclose(rec_d, rec_s, atol=0.02)
    assert rec_d[0] > 0.8


def test_infit_validation_under_mesh_matches_single_chip():
    """fit(mesh=..., eval_data=...) must validate through the DISTRIBUTED
    evaluator on the live sharded train state (scratch-row layout) — never
    gathering the full item table to one chip — and report the same metrics
    as the single-device fit."""
    import pandas as pd

    from gru4rec_tpu import GRU4Rec, GRU4RecConfig

    rng = np.random.RandomState(7)
    rows, t = [], 0
    for s in range(150):
        i = rng.randint(24)
        for _ in range(rng.randint(3, 7)):
            rows.append((s, f"it{i}", t)); t += 1; i = (7 * i + 3) % 24
    data = pd.DataFrame(rows, columns=["SessionId", "ItemId", "Time"])
    valid = data[data.SessionId >= 120].copy()
    train = data[data.SessionId < 120]

    def cfg():
        return GRU4RecConfig(loss="cross-entropy", final_act="softmax",
                             layers=[16], batch_size=8, n_sample=8, n_epochs=3,
                             chunk_size=32, item_pad_multiple=32,
                             learning_rate=0.1, compute_dtype="float32",
                             opt_state_dtype="float32")

    mesh = make_mesh(2, 4)
    kw = dict(eval_data=valid, eval_every=1, eval_cutoff=5, eval_batch_size=8)
    m_dist = GRU4Rec(cfg())
    m_dist.fit(train, mesh=mesh, **kw)
    m_single = GRU4Rec(cfg())
    m_single.fit(train, **kw)

    assert len(m_dist.valid_stats) == len(m_single.valid_stats) == 3
    for vd, vs in zip(m_dist.valid_stats, m_single.valid_stats):
        np.testing.assert_allclose(vd["recall"], vs["recall"], atol=1e-6)
        np.testing.assert_allclose(vd["mrr"], vs["mrr"], atol=1e-6)
    # keep-best restored canonical-layout params at the end
    from gru4rec_tpu.models import gru as grumod

    n_pad = grumod.pad_items(m_dist.n_items, m_dist.config.item_pad_multiple)
    assert np.asarray(m_dist.params["Wy"]).shape[0] == n_pad
    np.testing.assert_allclose(
        np.asarray(m_dist.params["Wy"]), np.asarray(m_single.params["Wy"]),
        rtol=2e-4, atol=1e-6,
    )
    # ... and as HOST numpy: the keep-best snapshot must never device_put
    # the full canonical tables onto one chip (they may only fit sharded)
    for leaf in jax.tree_util.tree_leaves(dict(m_dist.params)):
        assert isinstance(leaf, np.ndarray), type(leaf)


def test_retrain_extends_vocab_under_mesh():
    """fit(retrain=True, mesh=...): vocabulary extension must re-shard the
    grown canonical tables and keep training/evaluating multi-chip."""
    import pandas as pd

    from gru4rec_tpu import GRU4Rec, GRU4RecConfig
    from gru4rec_tpu.eval import evaluate

    def mk(n_sessions, n_items, seed=0):
        rng = np.random.RandomState(seed)
        rows, t = [], 0
        for s in range(n_sessions):
            i = rng.randint(n_items)
            for _ in range(rng.randint(3, 7)):
                rows.append((s, f"it{i}", t)); t += 1; i = (7 * i + 3) % n_items
        return pd.DataFrame(rows, columns=["SessionId", "ItemId", "Time"])

    mesh = make_mesh(2, 4)
    m = GRU4Rec(GRU4RecConfig(
        loss="cross-entropy", final_act="softmax", layers=[16], batch_size=8,
        n_sample=8, n_epochs=2, chunk_size=32, item_pad_multiple=32))
    m.fit(mk(100, 20), mesh=mesh)
    n0 = m.n_items
    m.fit(mk(100, 30, seed=2), retrain=True, n_epochs=1, mesh=mesh)
    assert m.n_items > n0
    rec, _ = evaluate(m, mk(20, 30, seed=5), cut_off=[5], batch_size=8,
                      mesh=mesh)
    assert rec[0] > 0.5  # the chain is learnable; grown vocab must score


def test_mesh_checkpoint_resume_roundtrip(tmp_path):
    """Checkpoints taken during mesh training store the canonical layout
    (per-shard kernel scratch rows stripped) and resume exactly — both on a
    mesh and on a single device."""
    import pandas as pd

    from gru4rec_tpu import GRU4Rec, GRU4RecConfig
    from gru4rec_tpu.models import gru

    rng = np.random.RandomState(1)
    rows, t = [], 0
    for s in range(120):
        i = rng.randint(24)
        for _ in range(rng.randint(3, 7)):
            rows.append((s, f"it{i}", t)); t += 1; i = (7 * i + 3) % 24
    data = pd.DataFrame(rows, columns=["SessionId", "ItemId", "Time"])

    def cfg():
        return GRU4RecConfig(loss="cross-entropy", final_act="softmax",
                             layers=[16], batch_size=8, n_sample=8, n_epochs=3,
                             chunk_size=32, item_pad_multiple=32,
                             learning_rate=0.1, compute_dtype="float32",
                             opt_state_dtype="float32")

    mesh = make_mesh(2, 4)
    ckpt = str(tmp_path / "mesh_ck.npz")

    m_full = GRU4Rec(cfg())
    m_full.fit(data, mesh=mesh)

    m_a = GRU4Rec(cfg())
    m_a.fit(data, mesh=mesh, n_epochs=2, checkpoint_every=2, checkpoint_path=ckpt)
    n_pad = gru.pad_items(m_a.n_items, m_a.config.item_pad_multiple)
    assert np.asarray(m_a.params["Wy"]).shape[0] == n_pad  # canonical, no scratch

    # resume the third epoch on the mesh: must equal the uninterrupted run
    m_b = GRU4Rec(cfg())
    m_b.fit(data, resume=ckpt, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(m_full.params["Wy"]), np.asarray(m_b.params["Wy"]),
        rtol=1e-5, atol=1e-7,
    )
    # and resuming WITHOUT a mesh also works from the same file (canonical
    # layout) and stays numerically together
    m_c = GRU4Rec(cfg())
    m_c.fit(data, resume=ckpt)
    np.testing.assert_allclose(
        np.asarray(m_full.params["Wy"]), np.asarray(m_c.params["Wy"]),
        rtol=1e-3, atol=1e-5,
    )


@pytest.fixture(scope="module")
def eval_model():
    """A small trained model + held-out test set shared by the eval tests."""
    import pandas as pd

    from gru4rec_tpu import GRU4Rec, GRU4RecConfig

    rng = np.random.RandomState(3)
    rows, t = [], 0
    for s in range(200):
        i = rng.randint(40)
        for _ in range(rng.randint(3, 7)):
            rows.append((s, f"it{i}", t)); t += 1; i = (11 * i + 5) % 40
    data = pd.DataFrame(rows, columns=["SessionId", "ItemId", "Time"])
    test = data[data.SessionId >= 160].copy()
    train = data[data.SessionId < 160]

    m = GRU4Rec(GRU4RecConfig(
        loss="bpr-max", final_act="elu-1", layers=[16], batch_size=8,
        n_sample=16, n_epochs=3, chunk_size=32, item_pad_multiple=32,
        compute_dtype="float32",  # shard-blocked bf16 matmuls round differently
    ))
    m.fit(train)
    return m, test


def test_distributed_evaluation_matches_single_chip(eval_model):
    """evaluate(mesh=...) — lanes over data, catalog rows over model — must
    reproduce single-chip metrics (rank-based eval distributes as psums of
    per-shard greater-than counts; no top-k needed)."""
    from gru4rec_tpu.eval import evaluate

    m, test = eval_model
    mesh = make_mesh(2, 4)
    for tie_mode in ("standard", "conservative", "median"):
        rec_s, mrr_s = evaluate(m, test, cut_off=[1, 5], batch_size=8,
                                mode=tie_mode)
        rec_d, mrr_d = evaluate(m, test, cut_off=[1, 5], batch_size=8,
                                mode=tie_mode, mesh=mesh)
        np.testing.assert_allclose(rec_d, rec_s, atol=1e-6, err_msg=tie_mode)
        np.testing.assert_allclose(mrr_d, mrr_s, atol=1e-6, err_msg=tie_mode)


def test_distributed_item_subset_evaluation(eval_model):
    """Item-subset eval under a mesh (subset columns row-sharded over `model`)
    must match the single-chip subset evaluator exactly in the deterministic
    tie modes — including the self-comparison adjustment when the target is
    outside the subset."""
    from gru4rec_tpu.eval import evaluate

    m, test = eval_model
    mesh = make_mesh(2, 4)
    subsets = (
        [f"it{i}" for i in range(40)],   # whole vocabulary
        [f"it{i}" for i in range(13)],   # strict subset: self_adj path hit
    )
    for items in subsets:
        for tie_mode in ("standard", "conservative", "median"):
            rec_s, mrr_s = evaluate(m, test, items=items, cut_off=[1, 5],
                                    batch_size=8, mode=tie_mode)
            rec_d, mrr_d = evaluate(m, test, items=items, cut_off=[1, 5],
                                    batch_size=8, mode=tie_mode, mesh=mesh)
            np.testing.assert_allclose(rec_d, rec_s, atol=1e-6,
                                       err_msg=f"{tie_mode}/{len(items)}")
            np.testing.assert_allclose(mrr_d, mrr_s, atol=1e-6,
                                       err_msg=f"{tie_mode}/{len(items)}")


def test_distributed_subset_eval_ignores_poisoned_scratch_rows(eval_model):
    """In-fit validation evaluates the LIVE training-layout state, whose
    per-shard kernel scratch rows hold whatever the fused kernel last wrote.
    Every gather in the distributed evaluator must sentinel PAST the scratch
    rows (regression: the subset path's non-owned target sentinel used to
    address the first scratch row, silently reading kernel leftovers)."""
    from gru4rec_tpu.eval import evaluate
    from gru4rec_tpu.parallel.dist_step import SCRATCH_ROWS, _expand_scratch

    m, test = eval_model
    mesh = make_mesh(2, 4)
    nm = mesh.shape["model"]
    items = [f"it{i}" for i in range(13)]  # strict subset: self_adj path
    rec_ref, mrr_ref = evaluate(m, test, items=items, cut_off=[1, 5],
                                batch_size=8, mode="standard")

    def poison(arr):
        arr = np.asarray(_expand_scratch(np.asarray(arr), nm))
        Lp = arr.shape[0] // nm
        blocks = arr.reshape((nm, Lp) + arr.shape[1:]).copy()
        blocks[:, Lp - SCRATCH_ROWS:] = 1e6  # garbage a gather can't miss
        return blocks.reshape(arr.shape)

    prev = m.params
    poisoned = dict(prev)
    poisoned["Wy"] = poison(prev["Wy"])
    poisoned["Wx"] = [poison(prev["Wx"][0])] + list(prev["Wx"][1:])
    m.params = poisoned
    try:
        rec_d, mrr_d = evaluate(m, test, items=items, cut_off=[1, 5],
                                batch_size=8, mode="standard", mesh=mesh)
    finally:
        m.params = prev
    np.testing.assert_allclose(rec_d, rec_ref, atol=1e-6)
    np.testing.assert_allclose(mrr_d, mrr_ref, atol=1e-6)


def _reset_predict_state(m):
    m.H = None
    m._predict_fn = None
    m._predict_batch = None
    m._topk_fn = None
    m._current_session = None


def test_distributed_predict_topk_matches_single_chip(eval_model):
    """predict_topk(mesh=...) — per-shard top-k over owned catalog rows,
    candidates merged by one all_gather — must reproduce the single-chip ids
    and scores, including hidden-state carry-over and session resets across
    calls (elementwise final activation: applied post-merge)."""
    m, _ = eval_model
    mesh = make_mesh(2, 4)
    sess1 = np.array([1, 1, 2, 2, 3, 3, 4, 4])
    sess2 = np.array([1, 1, 9, 2, 3, 3, 4, 8])  # two lanes switch sessions
    in1 = np.array([f"it{i}" for i in [3, 7, 1, 0, 11, 5, 2, 9]], object)
    in2 = np.array([f"it{i}" for i in [4, 8, 2, 1, 12, 6, 3, 10]], object)

    _reset_predict_state(m)
    ids_a1, sc_a1 = m.predict_topk(sess1, in1, k=7, batch=8)
    ids_a2, sc_a2 = m.predict_topk(sess2, in2, k=7, batch=8)
    _reset_predict_state(m)
    ids_b1, sc_b1 = m.predict_topk(sess1, in1, k=7, batch=8, mesh=mesh)
    ids_b2, sc_b2 = m.predict_topk(sess2, in2, k=7, batch=8, mesh=mesh)
    _reset_predict_state(m)

    assert (ids_b1 == ids_a1).all() and (ids_b2 == ids_a2).all()
    np.testing.assert_allclose(sc_b1, sc_a1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(sc_b2, sc_a2, rtol=1e-5, atol=1e-6)


def test_distributed_predict_topk_softmax_and_scratch_layout(eval_model):
    """Softmax head: the dist path rebuilds the exact full-catalog normalizer
    from pmax/psum collectives. Also: serving straight from a training-layout
    state (poisoned per-shard scratch rows) must match the canonical one."""
    import dataclasses

    import pandas as pd

    from gru4rec_tpu import GRU4Rec, GRU4RecConfig
    from gru4rec_tpu.parallel.dist_step import SCRATCH_ROWS, _expand_scratch

    rng = np.random.RandomState(11)
    rows, t = [], 0
    for s in range(120):
        i = rng.randint(40)
        for _ in range(rng.randint(3, 7)):
            rows.append((s, f"it{i}", t)); t += 1; i = (11 * i + 5) % 40
    data = pd.DataFrame(rows, columns=["SessionId", "ItemId", "Time"])
    m = GRU4Rec(GRU4RecConfig(
        loss="cross-entropy", final_act="softmax", layers=[16], batch_size=8,
        n_sample=16, n_epochs=2, chunk_size=32, item_pad_multiple=32,
        compute_dtype="float32",
    ))
    m.fit(data)

    mesh = make_mesh(2, 4)
    nm = mesh.shape["model"]
    sess = np.arange(8)
    inp = np.array([f"it{i}" for i in range(8)], object)
    ids_s, sc_s = m.predict_topk(sess, inp, k=5, batch=8)
    assert np.all(sc_s <= 1.0) and np.all(sc_s > 0)  # softmax probabilities

    _reset_predict_state(m)
    ids_d, sc_d = m.predict_topk(sess, inp, k=5, batch=8, mesh=mesh)
    assert (ids_d == ids_s).all()
    np.testing.assert_allclose(sc_d, sc_s, rtol=1e-5, atol=1e-7)

    # training shard layout: expand + poison scratch rows, serve from it
    def poison(arr):
        arr = np.asarray(_expand_scratch(np.asarray(arr), nm))
        Lp = arr.shape[0] // nm
        blocks = arr.reshape((nm, Lp) + arr.shape[1:]).copy()
        blocks[:, Lp - SCRATCH_ROWS:] = 1e6
        return blocks.reshape(arr.shape)

    prev = m.params
    poisoned = dict(prev)
    poisoned["Wy"] = poison(prev["Wy"])
    poisoned["Wx"] = [poison(prev["Wx"][0])] + list(prev["Wx"][1:])
    m.params = poisoned
    _reset_predict_state(m)
    m._dist_topk = None
    try:
        ids_p, sc_p = m.predict_topk(sess, inp, k=5, batch=8, mesh=mesh)
    finally:
        m.params = prev
        m._dist_topk = None
        _reset_predict_state(m)
    assert (ids_p == ids_s).all()
    np.testing.assert_allclose(sc_p, sc_s, rtol=1e-5, atol=1e-7)


def test_distributed_tiebreaking_statistically_matches(eval_model):
    """'tiebreaking' draws different random dithers on the two paths (see
    evaluate() docstring: absolute post-activation vs relative pre-activation)
    so results agree in distribution, not event-for-event: both must sit
    between the strict bounds and near 'standard' for a near-tie-free model."""
    from gru4rec_tpu.eval import evaluate

    m, test = eval_model
    mesh = make_mesh(2, 4)
    rec_std, _ = evaluate(m, test, cut_off=[5], batch_size=8, mode="standard")
    rec_s, _ = evaluate(m, test, cut_off=[5], batch_size=8, mode="tiebreaking")
    rec_d, _ = evaluate(m, test, cut_off=[5], batch_size=8, mode="tiebreaking",
                        mesh=mesh)
    # ranks under random tie-breaking are bounded by standard (best case) and
    # conservative (worst case)
    rec_con, _ = evaluate(m, test, cut_off=[5], batch_size=8,
                          mode="conservative")
    for r in (rec_s[0], rec_d[0]):
        assert rec_con[0] - 1e-6 <= r <= rec_std[0] + 1e-6
    assert abs(rec_d[0] - rec_s[0]) < 0.03


def test_tiebreaking_agreement_bound_on_fully_tied_scores(eval_model):
    """Quantified mesh-vs-single 'tiebreaking' agreement on a maximally
    tie-heavy model (every real item's score identical). The two paths use
    different dithers by necessity (see evaluate() docstring) so only the
    DISTRIBUTION is shared; zeroed Wy makes every score exactly 0.0, where
    both dithers survive f32 rounding and the target's rank is uniform on
    1..n_items. That gives an analytically derived expectation
    E[Recall@c] = c/n with binomial noise, so both paths and their mutual
    gap get absolute statistical bounds — and the observed level doubles as
    a regression check that PADDED catalog columns stay out of the tie pool
    (they would shift the level to c/n_pad)."""
    from gru4rec_tpu.eval import evaluate

    m, test = eval_model
    mesh = make_mesh(2, 4)
    n = m.n_items
    # enough evaluable events for tight bounds: repeat the held-out sessions
    # with fresh session ids (ranks are iid per event under full ties)
    reps = []
    for r in range(10):
        t = test.copy()
        t["SessionId"] = t["SessionId"] + 10_000 * (r + 1)
        reps.append(t)
    big = __import__("pandas").concat(reps, ignore_index=True)
    n_events = sum(big.groupby("SessionId").size() - 1)
    assert n_events >= 1000

    prev = m.params
    tied = dict(prev)
    tied["Wy"] = jnp.zeros_like(prev["Wy"])  # scores == 0.0 for every item
    m.params = tied
    try:
        rec_s, mrr_s = evaluate(m, big, cut_off=[5], batch_size=8,
                                mode="tiebreaking")
        rec_d, mrr_d = evaluate(m, big, cut_off=[5], batch_size=8,
                                mode="tiebreaking", mesh=mesh)
    finally:
        m.params = prev

    p = 5.0 / n  # uniform rank: P(rank <= 5)
    sd = float(np.sqrt(p * (1 - p) / n_events))
    for name, r in (("single", rec_s[0]), ("mesh", rec_d[0])):
        assert abs(r - p) <= 4.5 * sd, (name, r, p, sd, n_events)
    # the two paths draw independent dithers: their gap is bounded by the
    # two-sample binomial deviation
    assert abs(rec_d[0] - rec_s[0]) <= 4.5 * np.sqrt(2.0) * sd, (
        rec_s[0], rec_d[0], sd)
    # MRR under uniform ranks: E = (1/n) * sum_{r<=5} 1/r
    mrr_p = sum(1.0 / r for r in range(1, 6)) / n
    mrr_sd = float(np.sqrt(mrr_p / n_events))  # crude upper bound on var
    for name, v in (("single", mrr_s[0]), ("mesh", mrr_d[0])):
        assert abs(v - mrr_p) <= 4.5 * mrr_sd, (name, v, mrr_p)


def test_tiebreaking_subset_mesh_agreement_bound(eval_model):
    """items-subset + 'tiebreaking' + mesh in one evaluation (the last
    untested mode combination): on fully-tied zero scores the two paths'
    gap must stay inside the two-sample binomial bound around the pooled
    observed rate (the subset self-column adjustment makes the exact
    closed form fiddly; the mutual bound needs only iid-uniform ranks,
    which full ties guarantee on both paths)."""
    from gru4rec_tpu.eval import evaluate

    m, test = eval_model
    mesh = make_mesh(2, 4)
    reps = []
    for r in range(10):
        t = test.copy()
        t["SessionId"] = t["SessionId"] + 10_000 * (r + 1)
        reps.append(t)
    big = __import__("pandas").concat(reps, ignore_index=True)
    n_events = sum(big.groupby("SessionId").size() - 1)
    items = [f"it{i}" for i in range(13)]  # strict subset: self-adj path

    prev = m.params
    tied = dict(prev)
    tied["Wy"] = jnp.zeros_like(prev["Wy"])
    m.params = tied
    try:
        rec_s, _ = evaluate(m, big, items=items, cut_off=[5], batch_size=8,
                            mode="tiebreaking")
        rec_d, _ = evaluate(m, big, items=items, cut_off=[5], batch_size=8,
                            mode="tiebreaking", mesh=mesh)
    finally:
        m.params = prev
    p_hat = 0.5 * (rec_s[0] + rec_d[0])
    assert 0.0 < p_hat < 1.0, (rec_s, rec_d)
    sd = float(np.sqrt(max(p_hat * (1 - p_hat), 1e-6) / n_events))
    assert abs(rec_d[0] - rec_s[0]) <= 4.5 * np.sqrt(2.0) * sd, (
        rec_s[0], rec_d[0], sd, n_events)
