"""Optimizer tests: dense paths vs NumPy oracles of the reference update rules
(gru4rec.py:300-432), and row-sparse paths vs their dense equivalents
(duplicate indices summed once — the deterministic dedup semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gru4rec_tpu.config import GRU4RecConfig
from gru4rec_tpu.train.optimizers import EPSILON, dedup_rows, make_optimizer


def test_dedup_rows_sums_duplicates():
    idx = jnp.asarray(np.array([3, 1, 3, 7, 1, 2**31 - 1], dtype=np.int32))
    g = jnp.asarray(np.arange(12, dtype=np.float32).reshape(6, 2))
    uidx, gs = dedup_rows(idx, g)
    out = {}
    for i, u in enumerate(np.asarray(uidx)):
        if u != 2**31 - 1:
            out[int(u)] = np.asarray(gs)[i]
    np.testing.assert_allclose(out[3], [0 + 4, 1 + 5])
    np.testing.assert_allclose(out[1], [2 + 8, 3 + 9])
    np.testing.assert_allclose(out[7], [6, 7])
    assert set(out) == {1, 3, 7}


@pytest.mark.parametrize("adapt", [None, "adagrad", "rmsprop", "adadelta", "adam"])
@pytest.mark.parametrize("momentum", [0.0, 0.5])
def test_sparse_matches_dense(adapt, momentum):
    """Applying a row-sparse update must equal the dense update restricted to
    touched rows (with duplicate-index gradients summed)."""
    cfg = GRU4RecConfig(adapt=adapt, momentum=momentum, learning_rate=0.1, lmbd=0.01)
    opt = make_optimizer(cfg)
    rng = np.random.RandomState(0)
    table = rng.randn(10, 4).astype(np.float32)
    idx = np.array([2, 5, 2, 7], dtype=np.int32)
    g = rng.randn(4, 4).astype(np.float32)

    # dense-equivalent: scatter-summed full gradient
    g_dense = np.zeros_like(table)
    for i, r in zip(idx, g):
        g_dense[i] += r

    st_s = opt.init_state(jnp.asarray(table))
    st_d = opt.init_state(jnp.asarray(table))
    tbl_s = jnp.asarray(table)
    tbl_d = jnp.asarray(table)
    for _ in range(3):  # several steps to exercise state evolution
        tbl_s, st_s = opt.apply_sparse(tbl_s, jnp.asarray(idx), jnp.asarray(g), st_s)
        new_d, st_d_new = opt.apply_dense(tbl_d, jnp.asarray(g_dense), st_d)
        # dense path also updates untouched rows (zero grad still decays state);
        # compare touched rows only
        touched = np.unique(idx)
        np.testing.assert_allclose(
            np.asarray(tbl_s)[touched], np.asarray(new_d)[touched], rtol=2e-4, atol=1e-6
        )
        # untouched rows must be bit-identical to the original in sparse path
        untouched = np.setdiff1d(np.arange(10), touched)
        np.testing.assert_array_equal(np.asarray(tbl_s)[untouched], table[untouched])
        tbl_d = new_d
        st_d = st_d_new


def test_adagrad_dense_oracle():
    cfg = GRU4RecConfig(adapt="adagrad", learning_rate=0.2, momentum=0.0, lmbd=0.0)
    opt = make_optimizer(cfg)
    p = np.array([[1.0, 2.0]], np.float32)
    g = np.array([[0.5, -1.0]], np.float32)
    st = opt.init_state(jnp.asarray(p))
    p1, st = opt.apply_dense(jnp.asarray(p), jnp.asarray(g), st)
    want = p - 0.2 * g / np.sqrt(g**2 + EPSILON)
    np.testing.assert_allclose(np.asarray(p1), want, rtol=1e-6)


def test_momentum_dense_oracle():
    """Nesterov-style momentum of the reference (gru4rec.py:400-404)."""
    cfg = GRU4RecConfig(adapt=None, learning_rate=0.1, momentum=0.9, lmbd=0.0)
    opt = make_optimizer(cfg)
    p = np.array([1.0], np.float32)
    g = np.array([1.0], np.float32)
    st = opt.init_state(jnp.asarray(p))
    p1, st = opt.apply_dense(jnp.asarray(p), jnp.asarray(g), st)
    v1 = -0.1 * 1.0
    np.testing.assert_allclose(np.asarray(p1), p + v1, rtol=1e-6)
    p2, st = opt.apply_dense(p1, jnp.asarray(g), st)
    v2 = 0.9 * v1 - 0.1
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1) + v2, rtol=1e-6)


def test_sparse_state_dtype_gated_on_decay():
    """EMA state slower than bf16's rounding threshold must stay float32:
    adam's default v2=0.999 second moment changes ~1e-3 relative per step,
    below the bf16 half-ULP (~3.9e-3), so narrow storage would freeze it."""
    cfg = GRU4RecConfig(adapt="adam", momentum=0.5, opt_state_dtype="bfloat16")
    opt = make_optimizer(cfg)
    st = opt.init_state(jnp.zeros((8, 4), jnp.float32), sparse=True)
    # adam's sparse state is the merged (n, 2d + 128) [acc | meang | count]
    # buffer; the shared dtype is gated on the SLOWEST decay (v2 = 0.999)
    assert st["acc2"].dtype == jnp.float32
    assert st["acc2"].shape == (8, 2 * 4 + 128)
    assert st["velocity"].dtype == jnp.bfloat16

    # adam's merged buffer stays f32 even with fast decays: its count
    # column stores integers, and bf16 freezes any count at 256 (see
    # test_adam_count_survives_256_steps) — the decay gate applies only to
    # pure-EMA buffers (adadelta's merged [acc|upd] may narrow)
    cfg = GRU4RecConfig(adapt="adam", adapt_params=[0.9, 0.95])
    st = make_optimizer(cfg).init_state(jnp.zeros((8, 4), jnp.float32), sparse=True)
    assert st["acc2"].dtype == jnp.float32
    cfg = GRU4RecConfig(adapt="adadelta", adapt_params=[0.9],
                        opt_state_dtype="bfloat16")
    st = make_optimizer(cfg).init_state(jnp.zeros((8, 4), jnp.float32), sparse=True)
    assert st["acc2"].dtype == jnp.bfloat16

    # dense state keeps the split layout and always stays in the param dtype
    st = make_optimizer(GRU4RecConfig(adapt="adam")).init_state(
        jnp.zeros((8, 4), jnp.float32), sparse=False)
    assert st["acc"].dtype == jnp.float32
    assert st["meang"].dtype == jnp.float32

    # rmsprop/adadelta at a user-set slow decay also stay wide
    cfg = GRU4RecConfig(adapt="rmsprop", adapt_params=[0.999])
    st = make_optimizer(cfg).init_state(jnp.zeros((8, 4), jnp.float32), sparse=True)
    assert st["acc"].dtype == jnp.float32


def test_adam_second_moment_does_not_freeze():
    """Regression for the bf16-freeze bug: with constant unit gradient the
    second moment must approach 1 - v2^T, not stall at the bf16 rounding
    floor (~0.13 for v2=0.999)."""
    cfg = GRU4RecConfig(adapt="adam", learning_rate=0.01)
    opt = make_optimizer(cfg)
    table = jnp.zeros((8, 4), jnp.float32)
    st = opt.init_state(table, sparse=True)
    idx = jnp.asarray(np.array([1, 3], np.int32))
    g = jnp.ones((2, 4), jnp.float32)
    for _ in range(500):
        table, st = opt.apply_sparse(table, idx, g, st)
    want = 1.0 - cfg.adapt_params[1] ** 500  # ~0.3936
    got = np.asarray(st["acc2"], np.float32)[1, 0]  # acc = first d columns
    np.testing.assert_allclose(got, want, rtol=0.02)


def test_adam_count_survives_256_steps():
    """Regression: with fast betas ([0.9, 0.95]) the merged buffer used to
    inherit bf16 from the decay gate, freezing the per-row step count at 256
    (257 rounds back to 256 under ties-to-even) and sticking the bias
    corrections at 1 - v^256 forever."""
    cfg = GRU4RecConfig(adapt="adam", adapt_params=[0.9, 0.95],
                        learning_rate=0.01, opt_state_dtype="bfloat16")
    opt = make_optimizer(cfg)
    table = jnp.zeros((8, 4), jnp.float32)
    st = opt.init_state(table, sparse=True)
    idx = jnp.asarray(np.array([2], np.int32))
    g = jnp.ones((1, 4), jnp.float32)
    for _ in range(300):
        table, st = opt.apply_sparse(table, idx, g, st)
    count = np.asarray(st["acc2"], np.float32)[2, 2 * 4]
    assert count == 300.0, count


def test_adam_zero_beta_is_finite():
    """v1 = 0 (no first-moment smoothing) must behave like the XLA oracle:
    correction 1 - 0^t = 1, never a 0-divide."""
    cfg = GRU4RecConfig(adapt="adam", adapt_params=[0.0, 0.999],
                        learning_rate=0.01)
    opt = make_optimizer(cfg)
    table = jnp.zeros((8, 4), jnp.float32)
    st = opt.init_state(table, sparse=True)
    idx = jnp.asarray(np.array([1], np.int32))
    g = jnp.ones((1, 4), jnp.float32)
    for _ in range(3):
        table, st = opt.apply_sparse(table, idx, g, st)
    assert np.isfinite(np.asarray(table)).all()
    assert abs(np.asarray(table)[1, 0]) > 1e-4  # actually moved


def test_grad_cap():
    cfg = GRU4RecConfig(grad_cap=1.0)
    opt = make_optimizer(cfg)
    dense = {"a": jnp.asarray(np.array([3.0, 4.0], np.float32))}  # norm 5
    sparse = {}
    d2, _ = opt.clip_by_global_norm(dense, sparse)
    np.testing.assert_allclose(np.asarray(d2["a"]), [0.6, 0.8], rtol=1e-6)
    cfg2 = GRU4RecConfig(grad_cap=10.0)
    d3, _ = make_optimizer(cfg2).clip_by_global_norm(dense, sparse)
    np.testing.assert_allclose(np.asarray(d3["a"]), [3.0, 4.0])


# --------------------------------------------------------------------------- #
def test_dedup_matmul_matches_sort_chain():
    """dedup_rows_matmul (MXU equality-matmul, ops/kernels/dedup_matmul.py)
    must reproduce dedup_rows exactly on indices (bit) and sums (up to f32
    reassociation) across duplicate patterns, sentinel-masked lanes, and
    non-tile-aligned K/d."""
    from gru4rec_tpu.ops.kernels.dedup_matmul import (SENTINEL,
                                                      dedup_rows_matmul)

    rng = np.random.RandomState(5)
    for K, d, hi in ((40, 17, 8), (256, 128, 9999), (333, 101, 50),
                     (2208, 225, 30_000)):
        idx = rng.randint(0, hi, K).astype(np.int32)
        idx[-3:] = int(SENTINEL)  # masked lanes
        g = rng.randn(K, d).astype(np.float32)
        u0, s0 = dedup_rows(jnp.asarray(idx), jnp.asarray(g))
        u1, s1 = dedup_rows_matmul(jnp.asarray(idx), jnp.asarray(g))
        np.testing.assert_array_equal(np.asarray(u0), np.asarray(u1),
                                      err_msg=f"K={K}")
        real = np.asarray(u0) != int(SENTINEL)
        np.testing.assert_allclose(np.asarray(s0)[real],
                                   np.asarray(s1)[real],
                                   rtol=2e-5, atol=2e-5, err_msg=f"K={K}")
    # degenerate: every index identical -> one row carries the full sum
    idx = np.full(64, 3, np.int32)
    g = rng.randn(64, 33).astype(np.float32)
    u1, s1 = dedup_rows_matmul(jnp.asarray(idx), jnp.asarray(g))
    assert int(np.asarray(u1)[0]) == 3
    np.testing.assert_allclose(np.asarray(s1)[0], g.sum(0), rtol=1e-5,
                               atol=1e-5)
    # the matmul itself stays exact at K past the dispatch gate (the gate
    # is a PERF crossover, not a correctness cliff)
    K = 6016
    idx = rng.randint(0, 9000, K).astype(np.int32)
    g = rng.randn(K, 129).astype(np.float32)
    u0, s0 = dedup_rows(jnp.asarray(idx), jnp.asarray(g))
    u1, s1 = dedup_rows_matmul(jnp.asarray(idx), jnp.asarray(g))
    np.testing.assert_array_equal(np.asarray(u0), np.asarray(u1))
    real = np.asarray(u0) != int(SENTINEL)
    np.testing.assert_allclose(np.asarray(s0)[real], np.asarray(s1)[real],
                               rtol=2e-5, atol=2e-5)


def test_dedup_matmul_dispatch_k_gate(monkeypatch):
    """apply_sparse with dedup_impl='matmul' must take the sort chain past
    the MATMUL_MAX_K2D crossover (K^2*d) and the matmul at or below it."""
    import gru4rec_tpu.ops.kernels.dedup_matmul as dm

    calls = []
    real_mm = dm.dedup_rows_matmul
    monkeypatch.setattr(dm, "dedup_rows_matmul",
                        lambda i, g: calls.append(int(i.shape[0]))
                        or real_mm(i, g))
    cfg = GRU4RecConfig(adapt="adagrad", learning_rate=0.1,
                        dedup_impl="matmul")
    opt = make_optimizer(cfg)
    rng = np.random.RandomState(0)
    d = 16
    table = jnp.asarray(rng.randn(64, d).astype(np.float32))
    st = opt.init_state(table, sparse=True)
    small = jnp.asarray(rng.randint(0, 56, 24).astype(np.int32))
    g_small = jnp.asarray(rng.randn(24, d).astype(np.float32))
    opt.apply_sparse(table, small, g_small, st)
    assert calls == [24]
    big_k = int((dm.MATMUL_MAX_K2D / d) ** 0.5) + 8
    big = jnp.asarray(rng.randint(0, 56, big_k).astype(np.int32))
    g_big = jnp.asarray(rng.randn(big_k, d).astype(np.float32))
    opt.apply_sparse(table, big, g_big, st)
    assert calls == [24]  # chain took the big-K call


@pytest.mark.parametrize("adapt,momentum", [("adagrad", 0.3), ("adam", 0.0)])
def test_dedup_impl_matmul_full_chunk_parity(adapt, momentum):
    """A whole training chunk under dedup_impl='matmul' (the default since
    the round-4 hardware A/B) must track the 'sort' path (same training
    dynamics, reassociation-only noise)."""
    from gru4rec_tpu.train.step import init_train_state, make_chunk_fn

    import jax

    n_items = 70
    def cfg(impl):
        return GRU4RecConfig(
            loss="bpr-max", final_act="elu-1", layers=[16], batch_size=8,
            n_sample=12, chunk_size=6, item_pad_multiple=32,
            learning_rate=0.1, momentum=momentum, adapt=adapt,
            dropout_p_hidden=0.0, dropout_p_embed=0.0,
            sampler="searchsorted", compute_dtype="float32",
            opt_state_dtype="float32", constrained_embedding=True,
            dedup_impl=impl,
        )
    rng = np.random.RandomState(1)
    C, B = 6, 8
    in_c = jnp.asarray(rng.randint(0, n_items, (C, B)).astype(np.int32))
    out_c = jnp.asarray(rng.randint(0, n_items, (C, B)).astype(np.int32))
    valid_c = jnp.asarray(np.ones((C, B), bool))
    reset_c = jnp.asarray(np.zeros((C, B), bool))
    cdf = jnp.asarray(np.linspace(0.01, 1.0, n_items, dtype=np.float32))
    n_pad = 96
    logp0 = jnp.asarray(np.zeros(n_pad, np.float32))

    outs = {}
    for impl in ("sort", "matmul"):
        c = cfg(impl)
        s = init_train_state(c, n_items, jax.random.PRNGKey(2))
        f = make_chunk_fn(c, n_items)
        s, loss, ev = f(s, in_c, out_c, valid_c, reset_c, cdf, logp0)
        outs[impl] = (float(loss), np.asarray(s.params["Wy"]),
                      np.asarray(s.params["Wh"][0]))
    np.testing.assert_allclose(outs["sort"][0], outs["matmul"][0], rtol=1e-5)
    np.testing.assert_allclose(outs["sort"][1], outs["matmul"][1],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(outs["sort"][2], outs["matmul"][2],
                               rtol=1e-4, atol=1e-6)


def test_dedup_impl_validation():
    with pytest.raises(NotImplementedError):
        GRU4RecConfig(dedup_impl="bogus")


def test_dedup_impl_default_is_matmul():
    """Pin the round-4 measured decision: the XLA-path dedup defaults to
    the size-gated MXU equality-matmul (PERF_NOTES 'matmul dedup —
    default flipped')."""
    assert GRU4RecConfig().dedup_impl == "matmul"
