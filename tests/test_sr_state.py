"""Stochastic-rounding bf16 optimizer state (opt_state_dtype="bfloat16_sr").

Covers ops/sr.py and the SR layouts in train/optimizers.py +
ops/kernels/sparse_update.py:

* the rounding core is EXACTLY unbiased (exhaustive dither enumeration) and
  EXACT on bf16-representable inputs (so untouched rows never move);
* base-256 limb-packed adam counts encode/decode exactly through carries;
* the freeze bug SR exists to fix: a slow EMA / monotone accumulator fed
  sub-ULP increments keeps moving under SR where round-to-nearest sticks;
* kernel-vs-XLA parity under SR: the stateless (seed, row, col) mixer makes
  the stored state BIT-IDENTICAL across paths (tables match to f32
  round-off, the same contract as the non-SR differential tests);
* determinism: same inputs + same keys -> bit-identical results;
* end-to-end: a model trained with bfloat16_sr learns, and checkpoints
  round-trip the bf16 state exactly.
"""

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
import pandas as pd
import pytest

import gru4rec_tpu.train.optimizers as optmod
from gru4rec_tpu.config import GRU4RecConfig
from gru4rec_tpu.ops.sr import (limbs_decode, limbs_encode, mix32,
                                seed_from_key, sr_bits16, sr_round_bf16)
from gru4rec_tpu.train.optimizers import make_optimizer
from hwtol import assert_state_equal, assert_tables_close


# --------------------------------------------------------------------- #
# rounding core
def test_sr_round_exactly_unbiased():
    """Enumerating all 2^16 dither values: the mean of the rounded results
    equals the f32 input exactly (the (u + r) & ~0xFFFF trick is exact SR),
    for positive, negative, small and subnormal-adjacent magnitudes."""
    rs = jnp.arange(65536, dtype=jnp.int32)
    for xv in (1.0 + 2**-12, -1.0 - 2**-12, 3.7e-5, -0.124567, 123456.789):
        x = jnp.float32(xv)
        vals = jax.vmap(lambda r: sr_round_bf16(x, r).astype(jnp.float64))(rs)
        assert float(vals.mean()) == float(x), xv


def test_sr_round_exact_on_representable():
    """bf16-representable values round to themselves for EVERY dither —
    this is what keeps non-member lanes / untouched rows bit-stable."""
    for xv in (0.0, 1.0, -2.5, 0.00390625):
        x = jnp.asarray(xv, jnp.bfloat16).astype(jnp.float32)
        for r in (0, 1, 32767, 65535):
            assert float(sr_round_bf16(x, jnp.int32(r)).astype(jnp.float32)) \
                == float(x), (xv, r)


def test_sr_bits_range_and_spread():
    b = np.asarray(sr_bits16(jnp.int32(1234), jnp.arange(256), 128))
    assert b.min() >= 0 and b.max() < 65536
    # murmur avalanche: mean near 32767.5, no stuck lanes/rows
    assert abs(b.mean() - 32767.5) < 500
    assert len(np.unique(b)) > 0.3 * b.size
    # different seeds decorrelate
    b2 = np.asarray(sr_bits16(jnp.int32(1235), jnp.arange(256), 128))
    assert (b == b2).mean() < 0.01


def test_limbs_roundtrip_with_carries():
    for c in (0, 1, 255, 256, 257, 65535, 65536, 1_000_000, 16_777_215):
        lo, mid, hi = limbs_encode(jnp.float32(c))
        assert float(limbs_decode(lo, mid, hi)) == c
        for limb in (lo, mid, hi):
            v = float(limb)
            assert 0 <= v <= 255
            # each limb is exact in bf16
            assert float(jnp.asarray(v, jnp.bfloat16).astype(jnp.float32)) == v


# --------------------------------------------------------------------- #
# the freeze this exists to fix
def test_sr_ema_does_not_freeze():
    """v2=0.999-style EMA with increments below the bf16 half-ULP: RN-bf16
    sticks at its starting value; SR-bf16 tracks the f32 trajectory in
    expectation."""
    v2 = 0.999
    target = 1.0  # g^2 = 1 steady state; start at a value bf16 can hold
    acc_rn = jnp.asarray(0.5, jnp.bfloat16)
    acc_sr = jnp.asarray(0.5, jnp.bfloat16)
    acc_f32 = jnp.float32(0.5)
    seed = jnp.int32(99)
    for s in range(2000):
        acc_f32 = v2 * acc_f32 + (1 - v2) * target
        new_rn = v2 * acc_rn.astype(jnp.float32) + (1 - v2) * target
        acc_rn = new_rn.astype(jnp.bfloat16)  # round-to-nearest
        new_sr = v2 * acc_sr.astype(jnp.float32) + (1 - v2) * target
        bits = sr_bits16(seed + s, jnp.zeros((1,), jnp.int32), 1)
        acc_sr = sr_round_bf16(new_sr[None, None], bits)[0, 0]
    # RN freezes near where its per-step delta drops under half-ULP;
    # far from the f32 value
    assert abs(float(acc_rn.astype(jnp.float32)) - float(acc_f32)) > 0.05
    # SR tracks within a few bf16 ULPs
    assert abs(float(acc_sr.astype(jnp.float32)) - float(acc_f32)) < 0.02


# --------------------------------------------------------------------- #
# optimizer integration
def _run_steps(adapt, force, *, momentum=0.0, lmbd=0.0, n_steps=6, seed=7,
               version="v3", adapt_params=None):
    cfg = GRU4RecConfig(adapt=adapt, learning_rate=0.05, momentum=momentum,
                        lmbd=lmbd, opt_state_dtype="bfloat16_sr",
                        adapt_params=list(adapt_params or []),
                        loss="cross-entropy")
    opt = make_optimizer(cfg)
    rng = np.random.RandomState(0)
    n, d = 64, 128
    table = jnp.asarray(rng.randn(n, d).astype(np.float32))
    st = opt.init_state(table, sparse=True)
    key = jax.random.PRNGKey(seed)
    optmod._FORCE_PALLAS = force
    optmod._FORCE_PALLAS_VERSION = version if force else None
    try:
        for s in range(n_steps):
            idx = jnp.asarray(rng.randint(0, n - 8, (24,)).astype(np.int32))
            g = jnp.asarray(rng.randn(24, d).astype(np.float32) * 0.1)
            table, st = opt.apply_sparse(table, idx, g, st,
                                         key=jax.random.fold_in(key, s))
    finally:
        optmod._FORCE_PALLAS = None
        optmod._FORCE_PALLAS_VERSION = None
    return np.asarray(table), {k: np.asarray(v) for k, v in st.items()}


@pytest.mark.parametrize("version", ["v3", "v4"])
@pytest.mark.parametrize("adapt", ["adagrad", "adam"])
@pytest.mark.parametrize("momentum,lmbd", [(0.0, 0.0), (0.5, 1e-4)])
def test_sr_kernel_matches_xla(adapt, momentum, lmbd, version):
    """The stateless dither makes kernel and XLA SR state BIT-IDENTICAL on
    a shared compiler (CPU); on real TPU hardware Mosaic-vs-XLA fma/
    transcendental ULP noise flips rare rounding decisions, so the contract
    is hwtol's tiered one (measured r4: 4/8192 table cells at 2.4e-4)."""
    t_x, st_x = _run_steps(adapt, False, momentum=momentum, lmbd=lmbd)
    t_k, st_k = _run_steps(adapt, True, momentum=momentum, lmbd=lmbd,
                           version=version)
    assert_tables_close(t_x, t_k, err_msg=f"table {adapt}-{version}")
    for k in st_x:
        assert_state_equal(st_x[k], st_k[k], err_msg=k)


@pytest.mark.parametrize("version", ["v3", "v4"])
def test_sr_slow_v1_kernel_matches_xla(version):
    """adapt_params v1 > 0.99 flips the first moment to SR storage (decay
    gate) — both paths must apply the same rule with the same
    column-offset dither, or bit parity breaks exactly here."""
    t_x, st_x = _run_steps("adam", False, adapt_params=[0.995, 0.999])
    t_k, st_k = _run_steps("adam", True, version=version,
                           adapt_params=[0.995, 0.999])
    # slow decays feed every element through pow-based bias corrections, so
    # on hardware the Mosaic-vs-XLA transcendental shift is pervasive
    # (measured r4: 10.6% of elements past 2e-6, all below 9.1e-6)
    assert_tables_close(t_x, t_k, err_msg=f"table slow-v1 {version}")
    for k in st_x:
        assert_state_equal(st_x[k], st_k[k], err_msg=k)


def test_sr_slow_v1_meang_does_not_freeze():
    """Regression for the decay-gate bypass: with v1=0.995 under
    bfloat16_sr, a plain RN-bf16 first moment freezes ~20% below its f32
    steady state (per-step change (1-v1)|g-m| drops under the bf16
    half-ULP); the gated SR storage must keep tracking."""
    cfg = GRU4RecConfig(adapt="adam", adapt_params=[0.995, 0.999],
                        learning_rate=0.05, opt_state_dtype="bfloat16_sr",
                        loss="cross-entropy")
    opt = make_optimizer(cfg)
    n, d, g0 = 8, 128, 0.01
    table = jnp.zeros((n, d), jnp.float32)
    st = opt.init_state(table, sparse=True)
    idx = jnp.arange(n, dtype=jnp.int32)
    g = jnp.full((n, d), g0, jnp.float32)
    key = jax.random.PRNGKey(3)
    steps = 800
    step = jax.jit(lambda t, s, k: opt.apply_sparse(t, idx, g, s, key=k))
    for s in range(steps):
        table, st = step(table, st, jax.random.fold_in(key, s))
    v1 = 0.995
    m_f32 = g0 * (1.0 - v1**steps)
    m_sr = np.asarray(st["acc2"][:, d:2 * d], np.float32)
    # the RN twin (what the ungated code stored)
    m_rn = np.float32(0.0)
    for _ in range(steps):
        m_rn = np.asarray(v1 * np.float32(m_rn) + (1 - v1) * g0,
                          np.float32).astype(ml_dtypes.bfloat16)
    rn_err = abs(float(np.float32(m_rn)) - m_f32) / g0
    sr_err = np.max(np.abs(m_sr - m_f32)) / g0
    assert rn_err > 0.15, rn_err  # RN really does freeze at this decay
    assert sr_err < 0.05, sr_err


@pytest.mark.parametrize("force", [False, True])
def test_sr_is_deterministic(force):
    t1, st1 = _run_steps("adam", force)
    t2, st2 = _run_steps("adam", force)
    assert np.array_equal(t1, t2)
    for k in st1:
        assert np.array_equal(st1[k].view(np.uint8), st2[k].view(np.uint8))
    # a different key gives different rounding
    t3, st3 = _run_steps("adam", force, seed=8)
    assert not np.array_equal(st1["acc2"].view(np.uint8),
                              st3["acc2"].view(np.uint8))


def test_sr_adam_counts_track_steps():
    """Limb-packed counts equal the number of times each row was touched."""
    cfg = GRU4RecConfig(adapt="adam", learning_rate=0.05,
                        opt_state_dtype="bfloat16_sr", loss="cross-entropy")
    opt = make_optimizer(cfg)
    n, d = 32, 128
    table = jnp.zeros((n, d), jnp.float32)
    st = opt.init_state(table, sparse=True)
    assert st["acc2"].dtype == jnp.bfloat16
    key = jax.random.PRNGKey(0)
    touched = np.zeros(n)
    rng = np.random.RandomState(3)
    for s in range(300):  # row 0 rides every step -> carries past lo=255
        idx_np = np.concatenate([[0], rng.randint(0, n - 8, (3,))])
        touched[np.unique(idx_np)] += 1
        g = jnp.asarray(rng.randn(4, d).astype(np.float32) * 0.01)
        table, st = opt.apply_sparse(table, jnp.asarray(idx_np, jnp.int32), g,
                                     st, key=jax.random.fold_in(key, s))
    cb = np.asarray(st["acc2"]).astype(np.float32)[:, 2 * d:]
    cnt = (cb[:, 2] * 256 + cb[:, 1]) * 256 + cb[:, 0]
    assert touched.max() > 256, "test must exercise a limb carry"
    np.testing.assert_array_equal(cnt, touched)


def test_sr_xla_vs_f32_oracle_statistical():
    """Many-step SR trajectory stays close to the f32 trajectory (no bias
    accumulation): train the same sequence under float32 and bfloat16_sr
    and compare final accumulators in relative terms."""
    def run(dtype):
        cfg = GRU4RecConfig(adapt="adagrad", learning_rate=0.05,
                            opt_state_dtype=dtype, loss="cross-entropy")
        opt = make_optimizer(cfg)
        rng = np.random.RandomState(1)
        n, d = 32, 64
        table = jnp.zeros((n, d), jnp.float32)
        st = opt.init_state(table, sparse=True)
        key = jax.random.PRNGKey(5)
        for s in range(400):
            idx = jnp.asarray(rng.randint(0, n, (8,)).astype(np.int32))
            g = jnp.asarray(rng.randn(8, d).astype(np.float32) * 0.05)
            table, st = opt.apply_sparse(table, idx, g, st,
                                         key=jax.random.fold_in(key, s),
                                         allow_kernel=False)
        return np.asarray(st["acc"]).astype(np.float32)

    acc_f32 = run("float32")
    acc_sr = run("bfloat16_sr")
    denom = np.maximum(acc_f32, 1e-6)
    rel = np.abs(acc_sr - acc_f32) / denom
    # bf16 grid is ~0.4%; random-walk accumulation over 400 steps stays
    # well within a percent on average
    assert np.median(rel[acc_f32 > 1e-4]) < 0.01


# --------------------------------------------------------------------- #
# distributed
@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs 8 (virtual) devices")
def test_sr_dist_matches_single_device():
    """Row-sharded SR uses the SAME rounding decisions as single-chip: the
    dither hashes GLOBAL (row, col) cells via the shard row offset, and the
    dist step hands apply_sparse the REPLICATED base key. The f32 update
    values themselves differ by psum-reassociation noise (~1e-8 relative),
    which can push a cell across a rounding boundary — so the contract is
    bitwise equality on all but a rare handful of cells, every exception
    exactly one bf16 ULP, and adam counts (exact integers) equal exactly."""
    from gru4rec_tpu.parallel.dist_step import (_strip_scratch,
                                                make_dist_chunk_fn,
                                                shard_train_state)
    from gru4rec_tpu.parallel.mesh import make_mesh
    from gru4rec_tpu.train.step import init_train_state, make_chunk_fn

    n_items = 90
    cfg = GRU4RecConfig(
        loss="cross-entropy", final_act="softmax", layers=[16], batch_size=8,
        n_sample=12, chunk_size=5, item_pad_multiple=32, learning_rate=0.1,
        adapt="adam", dropout_p_hidden=0.0, dropout_p_embed=0.0,
        sampler="searchsorted", compute_dtype="float32",
        opt_state_dtype="bfloat16_sr", constrained_embedding=True)
    rng = np.random.RandomState(0)
    C, B = cfg.chunk_size, cfg.batch_size
    in_c = rng.randint(0, n_items, (C, B)).astype(np.int32)
    out_c = rng.randint(0, n_items, (C, B)).astype(np.int32)
    valid_c = np.ones((C, B), bool)
    reset_c = rng.rand(C, B) < 0.2
    n_pad = ((n_items + cfg.item_pad_multiple - 1)
             // cfg.item_pad_multiple) * cfg.item_pad_multiple
    cdf = np.linspace(0.01, 1.0, n_items, dtype=np.float32)
    logp0 = np.abs(rng.randn(n_pad)).astype(np.float32) + 0.1
    args = tuple(jnp.asarray(a) for a in
                 (in_c, out_c, valid_c, reset_c, cdf, logp0))

    s1 = init_train_state(cfg, n_items, jax.random.PRNGKey(3))
    f1 = make_chunk_fn(cfg, n_items)
    s1, loss1, _ = f1(s1, *args)

    nm = 4
    mesh = make_mesh(2, nm)
    s2 = init_train_state(cfg, n_items, jax.random.PRNGKey(3))
    s2 = shard_train_state(s2, cfg, mesh)
    f2 = make_dist_chunk_fn(cfg, n_items, mesh)
    out = f2(s2.params, s2.opt_state, s2.H, s2.key, s2.step, *args)
    params2, opt2, _, _, _, loss2, _ = out

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
    acc1 = np.asarray(s1.opt_state["sparse"]["Wy"]["acc2"])
    acc2 = np.asarray(_strip_scratch(opt2["sparse"]["Wy"]["acc2"], nm))
    assert acc1.dtype == acc2.dtype == jnp.bfloat16
    d = np.asarray(s1.params["Wy"]).shape[1]
    # counts (exact integers) must agree exactly
    c1 = acc1[:, 2 * d:2 * d + 3].astype(np.float32)
    c2 = acc2[:, 2 * d:2 * d + 3].astype(np.float32)
    np.testing.assert_array_equal(c1, c2)
    # EMA halves: bitwise-equal except rare psum-reassociation boundary
    # flips, each exactly one bf16 ULP (uint16 bit patterns of same-sign
    # bf16 neighbors differ by 1)
    b1 = acc1.view(np.uint16).astype(np.int32)
    b2 = acc2.view(np.uint16).astype(np.int32)
    neq = b1 != b2
    assert neq.mean() < 1e-3, neq.mean()
    assert np.abs(b1 - b2)[neq].max(initial=0) <= 1


# --------------------------------------------------------------------- #
# end-to-end
def _markov_frame(n_sessions=120, n_items=40, seed=0):
    rng = np.random.RandomState(seed)
    rows, t = [], 0
    for s in range(n_sessions):
        i = rng.randint(n_items)
        for _ in range(rng.randint(3, 8)):
            rows.append((s, f"it{i}", t))
            t += 1
            i = (7 * i + 3) % n_items
    return pd.DataFrame(rows, columns=["SessionId", "ItemId", "Time"])


def test_sr_accuracy_matches_f32_run():
    """Training quality under SR state: same config trained with float32 vs
    bfloat16_sr state lands within a point of Recall/MRR on the noisy-Markov
    task — the SR noise is unbiased dither on the adaptive learning rate,
    not an accuracy regression."""
    from gru4rec_tpu import GRU4Rec
    from gru4rec_tpu.eval import evaluate

    def train_eval(dtype):
        rng_frame = _markov_frame(n_sessions=250, seed=1)
        cfg = GRU4RecConfig(
            loss="cross-entropy", final_act="softmax", layers=[24],
            batch_size=12, n_sample=24, sample_alpha=0.5, learning_rate=0.08,
            adapt="adam", embedding=16, n_epochs=3, chunk_size=32,
            item_pad_multiple=16, opt_state_dtype=dtype,
            dropout_p_hidden=0.0, dropout_p_embed=0.0, seed=42)
        m = GRU4Rec(cfg)
        m.fit(rng_frame)
        rec, mrr = evaluate(m, _markov_frame(n_sessions=60, seed=9),
                            cut_off=[1, 10], batch_size=12)
        return rec, mrr

    rec_f, mrr_f = train_eval("float32")
    rec_s, mrr_s = train_eval("bfloat16_sr")
    np.testing.assert_allclose(rec_s, rec_f, atol=0.02)
    np.testing.assert_allclose(mrr_s, mrr_f, atol=0.02)


def test_sr_end_to_end_learns_and_checkpoints(tmp_path):
    from gru4rec_tpu import GRU4Rec
    from gru4rec_tpu.eval import evaluate
    from gru4rec_tpu.io.checkpoint import load_train_checkpoint

    cfg = GRU4RecConfig(
        loss="cross-entropy", final_act="softmax", layers=[16], batch_size=8,
        n_sample=16, sample_alpha=0.5, learning_rate=0.08, adapt="adam",
        embedding=12, n_epochs=4, chunk_size=32, item_pad_multiple=16,
        opt_state_dtype="bfloat16_sr", dropout_p_hidden=0.0,
        dropout_p_embed=0.0, seed=11)
    ckpt = str(tmp_path / "ck.npz")
    m = GRU4Rec(cfg)
    m.fit(_markov_frame(), checkpoint_every=4, checkpoint_path=ckpt)
    rec, _ = evaluate(m, _markov_frame(n_sessions=30, seed=5), cut_off=[5],
                      batch_size=8)
    assert rec[0] > 0.5, rec
    losses = [e["loss"] for e in m.epoch_stats]
    assert losses[-1] < losses[0]

    # checkpoint round-trips the bf16 SR state (dtype tags) bit-exactly
    m2 = GRU4Rec(GRU4RecConfig(**{**cfg.__dict__}))
    state, _epoch = load_train_checkpoint(ckpt, m2)
    for a, b in zip(jax.tree_util.tree_leaves(m._train_state.opt_state),
                    jax.tree_util.tree_leaves(state.opt_state)):
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == b.dtype
        assert np.array_equal(a.view(np.uint8), b.view(np.uint8))
