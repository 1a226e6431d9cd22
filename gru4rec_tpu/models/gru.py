"""GRU stack: parameter initialization and the single-step forward pass.

Re-designed from the reference's graph builder (gru4rec.py:267-294 init,
gru4rec.py:433-506 model) for XLA:

* the three input modes — one-hot (the input row-gather *is* the input
  matmul), separate embedding, and constrained (output table reused as input
  embedding) — are selected statically at trace time;
* gathered rows enter the differentiated function as explicit inputs so that
  gradients w.r.t. item tables stay row-sparse (the reference achieves the
  same by differentiating w.r.t. the gathered subtensors, gru4rec.py:384);
* hidden-state reset is applied *before* the step from the schedule's reset
  mask (equivalent to the reference's post-step ``switch(R, 0, h)`` at
  gru4rec.py:466,479 — see data/scheduler.py).

Parameter layout matches the reference for checkpoint compatibility thinking:
``Wx[i]`` is (in, 3h) with column blocks [h | r | z] (gru4rec.py:281-284),
``Wrz[i]`` is (h, 2h) with blocks [r | z] (gru4rec.py:286-289), ``Bh[i]`` is
(3h,).

One deliberate layout change: the output bias ``By`` (reference: (n_items, 1),
gru4rec.py:293) is stored as COLUMN ``h`` of ``Wy`` — params['Wy'] is
(n_items, pad_cols(h+1)) with scoring ``y @ Wy[:, :h].T + Wy[:, h]``. Wy and
By always share gather/scatter index sets in the sampled-softmax path, so
folding them halves the number of per-step sparse-update passes with
per-element-identical optimizer math (the only divergence: in constrained
mode the bias column of rows touched *only as inputs* sees momentum/L2 state
updates with zero gradient). The width is rounded up to the 128-lane tile
multiple: the physical T(8,128) layout pads it anyway, so the zero columns
are free — while a non-multiple LOGICAL width (e.g. 513 for GRU-512) hits a
measurably slower unaligned scatter/gather path (~25-30% on big-table row
updates; PERF_NOTES.md) and blocks manually-DMA'd kernels, whose slices must
be tile-aligned. Checkpoints still store Wy and By separately, unpadded
(io/checkpoint.py).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from gru4rec_tpu.config import GRU4RecConfig
from gru4rec_tpu.ops.activations import get_activation


def input_mode(cfg: GRU4RecConfig) -> str:
    if cfg.constrained_embedding:
        return "constrained"
    if cfg.embedding:
        return "embedding"
    return "onehot"


def pad_items(n_items: int, multiple: int) -> int:
    """Smallest multiple of ``multiple`` at least 8 rows greater than
    n_items: the spare rows give the sparse-update kernels a write-through
    target for sentinel (dropped) indices — the group-blocked Pallas kernel
    parks its padded grid steps on the last 8-row group, which must therefore
    contain no real item row (ops/kernels/sparse_update.py)."""
    return ((n_items + 7 + multiple) // multiple) * multiple


def pad_cols(width: int) -> int:
    """Round a table width up to the 128-lane tile multiple (see the module
    docstring: physically free, removes the unaligned scatter/gather
    penalty, and a precondition for tile-aligned kernel DMAs)."""
    return ((width + 127) // 128) * 128


def init_params(cfg: GRU4RecConfig, n_items: int) -> Dict:
    """Initialize all weights with the reference's scheme and RNG call order
    (gru4rec.py:252-294): Glorot-width uniform/normal draws from a seeded
    NumPy RNG; E (if any), then per layer Wx (3 blocks), Wh, Wrz (2 blocks),
    then Wy. Bh/By start at zero.

    Item-dimensioned tables are padded to ``cfg.item_pad_multiple`` rows for
    MXU tiling; padded rows are zero and masked out everywhere downstream.
    """
    rng = np.random.RandomState(cfg.seed)
    dtype = np.dtype(cfg.param_dtype)
    mode = input_mode(cfg)
    layers = list(cfg.layers)
    n_pad = pad_items(n_items, cfg.item_pad_multiple)

    def init_matrix(shape, pad_rows=0):
        if cfg.sigma != 0:
            sigma = cfg.sigma
        else:
            sigma = np.sqrt(6.0 / (shape[0] + shape[1]))
        if cfg.init_as_normal:
            m = (rng.randn(*shape) * sigma).astype(dtype)
        else:
            m = (rng.rand(*shape) * sigma * 2 - sigma).astype(dtype)
        if pad_rows:
            m = np.concatenate([m, np.zeros((pad_rows, shape[1]), dtype=dtype)], axis=0)
        return m

    params: Dict = {"Wx": [], "Wh": [], "Wrz": [], "Bh": []}
    if mode == "constrained":
        n_features = layers[-1]
    elif mode == "embedding":
        params["E"] = init_matrix((n_items, cfg.embedding), pad_rows=n_pad - n_items)
        n_features = cfg.embedding
    else:
        n_features = n_items

    for i in range(len(layers)):
        in_dim = layers[i - 1] if i > 0 else n_features
        pad = (n_pad - n_items) if (i == 0 and mode == "onehot") else 0
        blocks = [init_matrix((in_dim, layers[i]), pad_rows=pad) for _ in range(3)]
        params["Wx"].append(np.hstack(blocks))
        params["Wh"].append(init_matrix((layers[i], layers[i])))
        m2 = [init_matrix((layers[i], layers[i])) for _ in range(2)]
        params["Wrz"].append(np.hstack(m2))
        params["Bh"].append(np.zeros((layers[i] * 3,), dtype=dtype))
    wy = init_matrix((n_items, layers[-1]), pad_rows=n_pad - n_items)
    # output bias folded in at column h (zero-initialized, like the
    # reference's By, gru4rec.py:293); width tile-padded — see module docstring
    wcols = pad_cols(layers[-1] + 1)
    params["Wy"] = np.concatenate(
        [wy, np.zeros((n_pad, wcols - layers[-1]), dtype=dtype)], axis=1
    )
    return jax.tree_util.tree_map(jnp.asarray, params)


def init_hidden(cfg: GRU4RecConfig, batch_size: int) -> List[jnp.ndarray]:
    return [
        jnp.zeros((batch_size, h), dtype=jnp.dtype(cfg.param_dtype)) for h in cfg.layers
    ]


def _dropout(x, p, key):
    if p <= 0.0:
        return x
    keep = 1.0 - p
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def _make_mm(cfg: GRU4RecConfig):
    """Matmul in ``compute_dtype`` with float32 accumulation (MXU mixed
    precision): operands are cast to the compute dtype per use — parameters
    and activations stay float32 everywhere else.

    When the user asks for float32 compute, request HIGHEST precision:
    XLA:TPU's DEFAULT precision runs f32 matmuls as single-pass bf16
    products (~5e-4 error), which would make ``compute_dtype="float32"``
    silently not mean float32 on the hardware it is meant for."""
    cdt = jnp.dtype(cfg.compute_dtype)
    precision = jax.lax.Precision.HIGHEST if cdt == jnp.float32 else None

    def mm(a, b):
        return jnp.dot(
            a.astype(cdt), b.astype(cdt), preferred_element_type=jnp.float32,
            precision=precision,
        )

    return mm


def gru_cell(vec, H, Wrz, Wh, hidden_act, hdim, mm=None):
    """One GRU cell given the precomputed input projection ``vec = x·Wx + Bh``
    (B, 3h) with column blocks [h | r | z] (reference: gru4rec.py:471-479)."""
    if mm is None:
        mm = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    rz = jax.nn.sigmoid(vec[:, hdim:] + mm(H, Wrz))
    r = rz[:, :hdim]
    z = rz[:, hdim:]
    hbar = hidden_act(mm(H * r, Wh) + vec[:, :hdim])
    return (1.0 - z) * H + z * hbar


def forward(
    params: Dict,
    srows: Dict,
    H: List,
    cfg: GRU4RecConfig,
    *,
    M=None,
    training: bool,
    key=None,
    col_valid=None,
    logq_correction=None,
    full_catalog: bool = False,
    item_valid=None,
):
    """Single-step forward.

    ``srows`` carries the gathered rows (differentiation targets); Wy rows
    include the folded bias column at index h plus tile padding (see module
    docstring; w = pad_cols(h+1)):
      one-hot:      {'Wx0': (B, 3h), 'Wy': (N, w)}
      embedding:    {'E': (B, d_e), 'Wy': (N, w)}
      constrained:  {'WyS': (B+N, w)}  — single concat gather
    For ``full_catalog`` scoring (predict/eval), the full (padded) Wy table
    is used instead of gathered rows.

    Returns (H_new list, yhat (B, N) or (B, n_items_pad)).
    """
    mode = input_mode(cfg)
    hidden_act = get_activation(cfg.hidden_act)
    final_act_name = cfg.final_act
    layers = cfg.layers
    mm = _make_mm(cfg)
    keys = (
        jax.random.split(key, len(layers) + 1)
        if (training and key is not None)
        else [None] * (len(layers) + 1)
    )

    h_last = layers[-1]
    H_new = []
    if mode == "constrained":
        S = srows["WyS"]
        # keep the matrix part only (bias at column h_last, then tile padding)
        Sx = (S[:M] if not full_catalog else S)[:, :h_last]
        y = _dropout(Sx, cfg.dropout_p_embed, keys[0]) if training else Sx
        start = 0
    elif mode == "embedding":
        Sx = srows["E"]
        y = _dropout(Sx, cfg.dropout_p_embed, keys[0]) if training else Sx
        start = 0
    else:
        Sx = srows["Wx0"]
        vec = Sx + params["Bh"][0]
        h = gru_cell(vec, H[0], params["Wrz"][0], params["Wh"][0], hidden_act, layers[0], mm)
        h = _dropout(h, cfg.dropout_p_hidden, keys[1]) if training else h
        y = h
        H_new.append(h)
        start = 1

    for i in range(start, len(layers)):
        vec = mm(y, params["Wx"][i]) + params["Bh"][i]
        h = gru_cell(vec, H[i], params["Wrz"][i], params["Wh"][i], hidden_act, layers[i], mm)
        h = _dropout(h, cfg.dropout_p_hidden, keys[i + 1]) if training else h
        y = h
        H_new.append(h)

    # --- scoring ---
    if full_catalog:
        Syb = params["Wy"]
    else:
        # At predict time the constrained mode re-gathers Wy[Y] explicitly
        # (reference: gru4rec.py:481-485); during training it reuses the
        # concatenated gather's tail.
        Syb = srows["Wy"] if "Wy" in srows else srows["WyS"][M:]
    scores = mm(y, Syb[:, :h_last].T) + Syb[:, h_last]

    fact = get_activation(final_act_name)
    if not training and final_act_name == "softmax_logit":
        # predict path swaps softmax_logit for softmax (gru4rec.py:490-491,499-500)
        fact = get_activation("softmax")
    if training and logq_correction is not None:
        scores = scores - logq_correction  # pre-activation (gru4rec.py:494-495)
    cv = item_valid if full_catalog else col_valid
    if final_act_name in ("softmax", "softmax_logit"):
        yhat = fact(scores, cv)
    else:
        yhat = fact(scores)
        if full_catalog and item_valid is not None:
            yhat = jnp.where(item_valid, yhat, -jnp.inf)
    return H_new, yhat
