"""Structured, pickle-free model checkpoints.

The reference pickles the entire Python object (gru4rec.py:742-781) — a
security and portability hazard SURVEY.md §5 flags for replacement. Here a
checkpoint is a single ``.npz`` archive holding every parameter array, the
item-ID map, the persistent hidden state, and the JSON-encoded config —
portable across hosts and accelerator types. Optimizer state and epoch
counters can be included for exact mid-training resume (which the reference
cannot do at all).
"""

from __future__ import annotations

import json

import jax
import ml_dtypes
import numpy as np

_BF16 = np.dtype(ml_dtypes.bfloat16)

from gru4rec_tpu.config import GRU4RecConfig


def _squeeze3(a):
    a = np.asarray(a)
    return a[:, 0, :] if a.ndim == 3 else a


def _to_savable(a):
    """npz cannot round-trip bfloat16 (numpy reloads it as void); store the
    raw bits as uint16. The saved dtype name travels alongside (see
    ``opt_dtype/<i>`` entries) so the loader decodes from what was actually
    written — NOT from the rebuilt template, whose storage dtypes can change
    across versions (e.g. the decay-gated ``_ema_dtype`` change moved adam's
    slow-EMA slots bf16→f32; decoding by template would have re-interpreted
    uint16 bf16 bits as raw integers)."""
    a = np.asarray(a)
    if a.dtype == _BF16:
        return a.view(np.uint16)
    return a


def _from_saved(a, like_dtype, saved_dtype=None):
    """Decode an optimizer leaf: restore the dtype it was SAVED with, then
    cast to the template slot's dtype. ``saved_dtype=None`` means a
    pre-dtype-tagging archive: a uint16 entry is only acceptable there when
    the template slot itself is bf16 (anything else is ambiguous and
    hard-errors rather than corrupt a resumed run)."""
    if saved_dtype is not None:
        a = a.view(_BF16) if saved_dtype == "bfloat16" else a
        return a.astype(like_dtype) if a.dtype != np.dtype(like_dtype) else a
    if a.dtype == np.uint16:
        if np.dtype(like_dtype) == _BF16:
            return a.view(_BF16)
        raise ValueError(
            "checkpoint holds a bf16-encoded (uint16) optimizer slot but the "
            "current optimizer layout expects "
            f"{np.dtype(like_dtype).name} there; this archive predates dtype "
            "tagging and cannot be decoded safely — re-save it with the "
            "version that wrote it"
        )
    return a


def _decode_opt_leaves(archive, tmpl_leaves, what: str):
    """Decode every ``opt/<i>`` archive entry against the rebuilt template:
    count check, saved-dtype decode (:func:`_from_saved`), per-leaf shape
    validation. One implementation serves both train checkpoints and
    ``savemodel(include_optimizer=True)`` archives so a state-layout
    migration cannot make them diverge in what they accept."""
    import jax.numpy as jnp

    n_saved = len([k for k in archive.files if k.startswith("opt/")])
    if n_saved != len(tmpl_leaves):
        raise ValueError(
            f"{what} stores {n_saved} optimizer-state arrays but the "
            f"current optimizer layout has {len(tmpl_leaves)} — the "
            "archive was written by a version with a different state "
            "layout and cannot be restored safely"
        )
    opt_leaves = []
    for i, tmpl in enumerate(tmpl_leaves):
        saved = _from_saved(
            archive[f"opt/{i}"], tmpl.dtype,
            saved_dtype=(str(archive[f"opt_dtype/{i}"])
                         if f"opt_dtype/{i}" in archive.files else None),
        )
        if tuple(saved.shape) != tuple(tmpl.shape):
            raise ValueError(
                f"optimizer-state array opt/{i} has shape {saved.shape} "
                f"but the current layout expects {tmpl.shape} — the "
                "archive was written by an incompatible version"
            )
        opt_leaves.append(jnp.asarray(saved))
    return opt_leaves


def _encode_payload(payload: dict) -> dict:
    """Final encoding pass before ``np.savez``: any remaining bfloat16 array
    (``param_dtype="bfloat16"`` parameters / hidden state) is stored as its
    uint16 bits plus a ``dtype/<key>`` tag — npz cannot round-trip bf16 (it
    reloads as void). Optimizer leaves arrive already encoded by
    :func:`_to_savable` (uint16 + ``opt_dtype/<i>`` tags) and pass through
    unchanged."""
    out = {}
    for k, v in payload.items():
        a = np.asarray(v)
        if a.dtype == _BF16:
            out[k] = a.view(np.uint16)
            out[f"dtype/{k}"] = np.array("bfloat16")
        else:
            out[k] = v
    return out


def _decode_entry(archive, key):
    """Read an archive entry, restoring bf16 from a ``dtype/<key>`` tag."""
    a = archive[key]
    if f"dtype/{key}" in archive.files and \
            str(archive[f"dtype/{key}"]) == "bfloat16":
        a = a.view(_BF16)
    return a


def _flatten_params(params) -> dict:
    flat = {}
    for group in ("Wx", "Wh", "Wrz", "Bh"):
        for i, arr in enumerate(params[group]):
            flat[f"param/{group}{i}"] = _squeeze3(arr)
    # bias folded at column h, then tile padding (models/gru.py) — checkpoints
    # store the reference layout: Wy matrix and By vector, no padding columns
    wyb = _squeeze3(params["Wy"])
    h = _squeeze3(params["Wh"][-1]).shape[-1]
    flat["param/Wy"] = wyb[:, :h]
    flat["param/By"] = wyb[:, h]
    if "E" in params:
        flat["param/E"] = _squeeze3(params["E"])
    return flat


def _unflatten_params(archive) -> dict:
    from gru4rec_tpu.models.gru import pad_cols

    params = {"Wx": [], "Wh": [], "Wrz": [], "Bh": []}
    n_layers = len([k for k in archive.files if k.startswith("param/Wh")])
    for i in range(n_layers):
        for group in ("Wx", "Wh", "Wrz", "Bh"):
            params[group].append(_decode_entry(archive, f"param/{group}{i}"))
    wy = _decode_entry(archive, "param/Wy")
    h = wy.shape[1]
    wyb = np.zeros((wy.shape[0], pad_cols(h + 1)), dtype=wy.dtype)
    wyb[:, :h] = wy
    wyb[:, h] = _decode_entry(archive, "param/By")
    params["Wy"] = wyb
    if "param/E" in archive.files:
        params["E"] = _decode_entry(archive, "param/E")
    return params


def _is_primary_process() -> bool:
    """Checkpoint files are written by process 0 only (the jax.distributed
    convention, same as orbax): on a shared filesystem every process would
    otherwise race-write the same path; on per-host disks the other hosts'
    copies would be redundant. Loading still happens on every process
    (each host must see the file — shared FS or a pre-copy).
    Single-process runs are always primary."""
    try:
        import jax

        return jax.process_index() == 0
    except Exception:  # pragma: no cover - uninitialized backends
        return True


def _write_barrier(name: str) -> None:
    """Collective barrier after a primary-only write: without it, on a
    shared filesystem a non-primary process can reach loadmodel() before
    process 0 finished writing (orbax pairs its primary-only writes with
    sync_global_devices the same way). Every process must call this —
    including the ones that skipped the write. No-op single-process."""
    try:
        import jax

        if jax.process_count() <= 1:
            return
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
    except Exception:  # pragma: no cover - uninitialized backends
        pass


def save_model(model, fname: str, include_optimizer: bool = False) -> None:
    """Serialize a trained GRU4Rec model (and optionally its optimizer state).

    In a multi-host run only process 0 writes (see _is_primary_process);
    every process leaves through the same write barrier."""
    if not _is_primary_process():
        _write_barrier("gru4rec_save_model")
        return
    payload = _flatten_params(model.params)
    keys = np.asarray(model.itemidmap.index.values)
    if keys.dtype.kind not in "iufb":
        # string item IDs: store as fixed-width unicode, not pickled objects
        # (pandas>=3 returns Arrow-backed string arrays here)
        keys = np.asarray(keys, dtype=str)
    payload["itemidmap/keys"] = keys
    payload["itemidmap/values"] = model.itemidmap.values
    payload["meta/config"] = np.array(json.dumps(model.config.to_dict()))
    payload["meta/n_items"] = np.array(model.n_items)
    if model.H is not None:
        for i, h in enumerate(model.H):
            payload[f"state/H{i}"] = np.asarray(h)
    if include_optimizer and model._train_state is not None:
        flat, _ = jax.tree_util.tree_flatten(model._train_state.opt_state)
        for i, arr in enumerate(flat):
            payload[f"opt/{i}"] = _to_savable(arr)
            payload[f"opt_dtype/{i}"] = np.array(str(np.asarray(arr).dtype))
        payload["meta/opt_step"] = np.asarray(model._train_state.step)
    np.savez(fname, **_encode_payload(payload))
    _write_barrier("gru4rec_save_model")


def save_train_checkpoint(model, state, epoch: int, fname: str) -> None:
    """Full training checkpoint: params + optimizer state + hidden state +
    RNG key + step counter + epoch — everything needed for exact resume.
    The reference cannot resume mid-training at all (SURVEY.md §5).

    In a multi-host run only process 0 writes (see _is_primary_process);
    every process leaves through the same write barrier."""
    if not _is_primary_process():
        _write_barrier("gru4rec_save_ckpt")
        return
    payload = _flatten_params(state.params)
    opt_leaves = jax.tree_util.tree_leaves(state.opt_state)
    for i, leaf in enumerate(opt_leaves):
        sq = _squeeze3(leaf)
        payload[f"opt/{i}"] = _to_savable(sq)
        payload[f"opt_dtype/{i}"] = np.array(str(sq.dtype))
    for i, h in enumerate(state.H):
        payload[f"state/H{i}"] = np.asarray(h)
    key = state.key
    payload["state/key_typed"] = np.array(
        int(jax.dtypes.issubdtype(key.dtype, jax.dtypes.prng_key))
    )
    payload["state/key"] = np.asarray(jax.random.key_data(key))
    payload["state/step"] = np.asarray(state.step)
    payload["meta/epoch"] = np.array(epoch)
    payload["meta/config"] = np.array(json.dumps(model.config.to_dict()))
    payload["meta/n_items"] = np.array(model.n_items)
    keys = np.asarray(model.itemidmap.index.values)
    if keys.dtype.kind not in "iufb":
        keys = np.asarray(keys, dtype=str)
    payload["itemidmap/keys"] = keys
    payload["itemidmap/values"] = model.itemidmap.values
    np.savez(fname, **_encode_payload(payload))
    _write_barrier("gru4rec_save_ckpt")


def load_train_checkpoint(fname: str, model):
    """Restore a training checkpoint into `model`; returns (state, epoch)."""
    import jax.numpy as jnp
    import pandas as pd

    from gru4rec_tpu.train.step import init_train_state

    with np.load(fname, allow_pickle=False) as archive:
        cfg = GRU4RecConfig.from_dict(json.loads(str(archive["meta/config"])))
        model.config = cfg
        model.n_items = int(archive["meta/n_items"])
        model.itemidmap = pd.Series(
            data=archive["itemidmap/values"], index=archive["itemidmap/keys"],
            name="ItemIdx",
        )
        params = jax.tree_util.tree_map(jnp.asarray, _unflatten_params(archive))
        # rebuild the optimizer-state structure, then fill with saved leaves
        template = init_train_state(cfg, model.n_items, jax.random.PRNGKey(0))
        tmpl_leaves, treedef = jax.tree_util.tree_flatten(template.opt_state)
        opt_leaves = _decode_opt_leaves(archive, tmpl_leaves, "checkpoint")
        opt_state = jax.tree_util.tree_unflatten(treedef, opt_leaves)
        H = tuple(
            jnp.asarray(_decode_entry(archive, f"state/H{i}"))
            for i in range(len(cfg.layers))
        )
        key = jnp.asarray(archive["state/key"])
        if int(archive["state/key_typed"]):
            key = jax.random.wrap_key_data(key)
        step = jnp.asarray(archive["state/step"])
        epoch = int(archive["meta/epoch"])
        state = template._replace(params=params, opt_state=opt_state, H=H,
                                  key=key, step=step)
        model.params = params
        model._train_state = state
        model.error_during_train = False
    return state, epoch


def load_model(fname: str, cls):
    """Reconstruct a GRU4Rec model from a checkpoint archive."""
    import pandas as pd

    with np.load(fname, allow_pickle=False) as archive:
        cfg = GRU4RecConfig.from_dict(json.loads(str(archive["meta/config"])))
        model = cls(cfg)
        model.params = jax.tree_util.tree_map(
            __import__("jax.numpy", fromlist=["asarray"]).asarray,
            _unflatten_params(archive),
        )
        model.n_items = int(archive["meta/n_items"])
        model.itemidmap = pd.Series(
            data=archive["itemidmap/values"], index=archive["itemidmap/keys"],
            name="ItemIdx",
        )
        # numeric layer order: sorted() would put 'state/H10' before
        # 'state/H2' for >=10-layer stacks
        n_layers = len(cfg.layers)
        if all(f"state/H{i}" in archive.files for i in range(n_layers)):
            model.H = tuple(_decode_entry(archive, f"state/H{i}")
                            for i in range(n_layers))
        if any(k.startswith("opt/") for k in archive.files):
            # savemodel(include_optimizer=True) archive: rebuild the train
            # state so fit(retrain=True) continues with the REAL
            # accumulators across the save/load boundary
            from gru4rec_tpu.train.step import init_train_state

            template = init_train_state(model.config, model.n_items,
                                        jax.random.PRNGKey(cfg.seed))
            tmpl_leaves, treedef = jax.tree_util.tree_flatten(
                template.opt_state)
            import jax.numpy as jnp

            opt_leaves = _decode_opt_leaves(archive, tmpl_leaves,
                                            "model archive")
            step = (jnp.asarray(archive["meta/opt_step"])
                    if "meta/opt_step" in archive.files else template.step)
            model._train_state = template._replace(
                params=model.params,
                opt_state=jax.tree_util.tree_unflatten(treedef, opt_leaves),
                step=step,
            )
        model.error_during_train = False
    return model
