"""Stochastic rounding to bfloat16 with a stateless counter-based PRNG.

Why this exists: EMA/accumulator optimizer state stored in bfloat16 with
round-to-nearest silently FREEZES once per-step increments drop below the
bf16 half-ULP (~3.9e-3 relative) — adam's v2=0.999 second moment and
adagrad's late-training g^2 increments both do (see
train/optimizers.py::Optimizer._ema_dtype and the round-1 freeze bug).
Stochastic rounding makes the stored value an unbiased estimator of the
f32 value (round up with probability proportional to the truncated
fraction), so increments accumulate in expectation and the state keeps
moving. This enables `opt_state_dtype="bfloat16_sr"`: bf16 storage for the
state slots the decay gate otherwise forces to f32 — on the fused-kernel
path that halves adam's dominant state-DMA bytes (PERF_NOTES.md round-3
"adam gap": the 830 vs 576 us adam/adadelta delta is state bytes).

The dither bits come from a murmur3-style finalizer over
``(seed, table_row, column)`` in pure int32 ops (wrapping multiply, xor,
logical shifts emulated with masks). Deliberately NOT ``pltpu.prng_*``:
the stateless mixer runs unchanged inside Pallas kernels (Mosaic lowers
int32 mul/xor/shift), in Pallas interpret mode on CPU (pltpu.prng_seed has
no CPU lowering), and on the XLA path — so the fused kernel and the XLA
fallback produce BIT-IDENTICAL stochastically-rounded state and the
kernel-vs-XLA differential-test contract survives SR.

Rounding core: for f32 ``x`` viewed as int32 bits ``u``, ``(u + r) &
0xFFFF0000`` with ``r`` uniform on [0, 2^16) is exactly unbiased SR to the
nearest-below/above bf16 values (two's-complement wraparound makes the
same expression correct for negative ``x``); values already representable
in bf16 (low 16 bits zero) are returned EXACTLY for every ``r`` — so
untouched rows written back through the SR path stay bit-identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# murmur3 finalizer multipliers and golden-ratio row/col strides, as int32
# two's-complement values (wrapping semantics == uint32). numpy SCALARS,
# not jnp arrays: Pallas kernels cannot close over traced array constants,
# while numpy scalars fold to MLIR literals.
_M1 = np.int32(-2048144789)   # 0x85EBCA6B
_M2 = np.int32(-1028477387)   # 0xC2B2AE35
_P_ROW = np.int32(-1640531527)  # 0x9E3779B9
_P_COL = np.int32(668265263)    # 0x27D4EB2F


def _lsr(h, k: int):
    """Logical (zero-fill) right shift on int32: arithmetic shift + mask."""
    return (h >> k) & np.int32((1 << (32 - k)) - 1)


def mix32(h):
    """murmur3 finalizer: bijective avalanche mixer on int32."""
    h = h ^ _lsr(h, 16)
    h = h * _M1
    h = h ^ _lsr(h, 13)
    h = h * _M2
    h = h ^ _lsr(h, 16)
    return h


def sr_bits16(seed, row_ids, n_cols: int, col_offset: int = 0):
    """(m, n_cols) int32 dither bits in [0, 2^16) for (row, col) cells.

    ``seed`` is an int32 scalar (per training step), ``row_ids`` absolute
    table row indices of any shape reshaped to (m, 1). The same (seed, row,
    col) triple yields the same bits on every path and backend.
    ``col_offset`` shifts the column ids — slots that live past column 0 of
    a merged state buffer (e.g. adam's first moment at columns d..2d-1)
    must hash their BUFFER columns so their dither is independent of the
    first slot's.
    """
    rows = row_ids.astype(jnp.int32).reshape(-1, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, n_cols), 1)
    if col_offset:
        cols = cols + np.int32(col_offset)
    h = mix32(seed + rows * _P_ROW + cols * _P_COL)
    return h & np.int32(0xFFFF)


def sr_round_bf16(x, bits16):
    """Stochastically round f32 ``x`` to bf16 using 16-bit dither values."""
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    u = (u + bits16) & np.int32(-65536)  # 0xFFFF0000
    return jax.lax.bitcast_convert_type(u, jnp.float32).astype(jnp.bfloat16)


# --------------------------------------------------------------------- #
# base-256 limb-packed step counts (adam's per-row count in a bf16 buffer)
#
# bf16 integers are exact only to 256 (8 mantissa bits; 256 + 1 rounds back
# to 256 under ties-to-even), so a per-row step count cannot live in one
# bf16 lane. Three base-256 limbs (each 0..255, exact in bf16) extend the
# exact range to 2^24 — the SAME bound a single f32 count has (f32
# increments stop at 16,777,216), so nothing is lost vs the f32 layout.

def limbs_encode(cnt):
    """f32 count (..., 1) -> (lo, mid, hi) base-256 limbs, each (..., 1)."""
    hi = jnp.floor(cnt / 65536.0)
    rem = cnt - hi * 65536.0
    mid = jnp.floor(rem / 256.0)
    lo = rem - mid * 256.0
    return lo, mid, hi


def limbs_decode(lo, mid, hi):
    """(lo, mid, hi) limbs -> exact f32 count."""
    return (hi * 256.0 + mid) * 256.0 + lo


def seed_from_key(key):
    """Fold a JAX PRNG key into one int32 SR seed (per-step, resume-exact)."""
    return jax.lax.bitcast_convert_type(
        jax.random.bits(key, (), jnp.uint32), jnp.int32)
