"""Cross-platform TPU (Mosaic) lowering checks — no TPU hardware needed.

``jax.export(..., platforms=["tpu"])`` runs the full StableHLO lowering
including Pallas-to-Mosaic kernel generation, which is exactly where
"interpret mode cannot prove it" failures live (unsupported ops, 1-D
iota, bad broadcasts, unlowerable dynamic slices). The final
Mosaic-to-machine-code compile still needs the device, but every
lowering-class regression is caught here in CI.

Covers the full kernel matrix: v2/v3/v4 update kernels, stochastic-
rounding state variants (int32 mixer, bitcast_convert_type, limb
arithmetic), and the equality-matmul dedup kernel, each inside the real
jitted training chunk (so the lowering sees the kernels exactly as
dispatched, not a synthetic harness)."""

import jax
import jax.numpy as jnp
import pytest
from jax import export

import gru4rec_tpu.train.optimizers as optmod
from gru4rec_tpu.config import GRU4RecConfig
from gru4rec_tpu.train.step import init_train_state, make_chunk_fn


def _export_chunk_for_tpu(monkeypatch, version, opt_state_dtype, adapt,
                          dedup_impl="sort", force_pallas=True):
    monkeypatch.setattr(optmod, "_FORCE_PALLAS", force_pallas)
    monkeypatch.setattr(optmod, "_FORCE_PALLAS_VERSION", version)
    # apply_sparse picks interpret-mode kernels when the backend is not
    # TPU; the export must lower the REAL Mosaic kernels
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    n_items = 200
    cfg = GRU4RecConfig(
        loss="bpr-max", final_act="elu-1", layers=[32], batch_size=8,
        n_sample=16, chunk_size=2, item_pad_multiple=128,
        learning_rate=0.1, momentum=0.2, adapt=adapt,
        opt_state_dtype=opt_state_dtype, constrained_embedding=True,
        sampler="alias", dedup_impl=dedup_impl,
    )
    state = init_train_state(cfg, n_items, jax.random.PRNGKey(0))
    fn = make_chunk_fn(cfg, n_items)
    C, B = cfg.chunk_size, cfg.batch_size
    arg_shapes = [jax.ShapeDtypeStruct((C, B), jnp.int32),
                  jax.ShapeDtypeStruct((C, B), jnp.int32),
                  jax.ShapeDtypeStruct((C, B), jnp.bool_),
                  jax.ShapeDtypeStruct((C, B), jnp.bool_),
                  jax.ShapeDtypeStruct((n_items, 2), jnp.int32),
                  jax.ShapeDtypeStruct((256,), jnp.float32)]
    state_shapes = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), state)
    exp = export.export(fn, platforms=["tpu"])(state_shapes, *arg_shapes)
    assert len(exp.mlir_module()) > 1000
    return exp


@pytest.mark.parametrize("version,opt_state_dtype,adapt", [
    ("v3", "bfloat16", "adagrad"),
    ("v3", "bfloat16_sr", "adam"),      # SR: mixer + bitcast + count limbs
    ("v4", "bfloat16_sr", "adagrad"),   # compact VMEM grads + SR
    ("v4", "bfloat16", "rmsprop"),
    ("v2", "bfloat16", "adadelta"),
])
def test_update_kernels_lower_for_tpu(monkeypatch, version,
                                      opt_state_dtype, adapt):
    _export_chunk_for_tpu(monkeypatch, version, opt_state_dtype, adapt)


def test_dedup_matmul_kernel_lowers_for_tpu(monkeypatch):
    from gru4rec_tpu.ops.kernels.dedup_matmul import dedup_rows_matmul

    K, d = 2208, 225
    fn = jax.jit(dedup_rows_matmul)
    exp = export.export(fn, platforms=["tpu"])(
        jax.ShapeDtypeStruct((K,), jnp.int32),
        jax.ShapeDtypeStruct((K, d), jnp.float32))
    assert len(exp.mlir_module()) > 1000


def test_matmul_dedup_inside_chunk_lowers_for_tpu(monkeypatch):
    """The XLA sparse-update path with dedup_impl='matmul' (kernel OFF —
    the regime the knob targets) must lower for TPU as a whole chunk."""
    _export_chunk_for_tpu(monkeypatch, None, "bfloat16", "adagrad",
                          dedup_impl="matmul", force_pallas=False)


def test_dist_chunk_with_sr_kernel_lowers_for_tpu(monkeypatch):
    """The full DISTRIBUTED training chunk — 2x4 shard_map, all_gather /
    psum collectives, per-shard v3 kernel with stochastic-rounding state —
    lowers for an 8-device TPU target from a CPU host (the multichip
    program the driver dry-runs, proven at the Mosaic-lowering level)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from gru4rec_tpu.parallel.dist_step import (make_dist_chunk_fn,
                                                shard_train_state)
    from gru4rec_tpu.parallel.mesh import make_mesh

    monkeypatch.setattr(optmod, "_FORCE_PALLAS", True)
    monkeypatch.setattr(optmod, "_FORCE_PALLAS_VERSION", "v3")
    mesh = make_mesh(2, 4)
    n_items = 200
    cfg = GRU4RecConfig(
        loss="bpr-max", final_act="elu-1", layers=[32], batch_size=8,
        n_sample=16, chunk_size=2, item_pad_multiple=128,
        learning_rate=0.1, adapt="adagrad", opt_state_dtype="bfloat16_sr",
        constrained_embedding=True, sampler="alias",
    )
    s = init_train_state(cfg, n_items, jax.random.PRNGKey(0))
    s = shard_train_state(s, cfg, mesh)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    fn = make_dist_chunk_fn(cfg, n_items, mesh)
    sh = lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
    C, B = cfg.chunk_size, cfg.batch_size
    args = [jax.ShapeDtypeStruct((C, B), jnp.int32),
            jax.ShapeDtypeStruct((C, B), jnp.int32),
            jax.ShapeDtypeStruct((C, B), jnp.bool_),
            jax.ShapeDtypeStruct((C, B), jnp.bool_),
            jax.ShapeDtypeStruct((n_items, 2), jnp.int32),
            jax.ShapeDtypeStruct((256,), jnp.float32)]
    tree = jax.tree_util.tree_map(
        sh, (s.params, s.opt_state, s.H, s.key, s.step))
    exp = export.export(fn, platforms=["tpu"])(*tree, *args)
    assert exp.nr_devices == 8
    assert len(exp.mlir_module()) > 1000
