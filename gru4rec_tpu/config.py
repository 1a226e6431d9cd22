"""Model/training configuration with the reference's full hyperparameter surface.

Mirrors the 25-parameter constructor of the reference (gru4rec.py:97-135) and
its CLI param-string coercion grammar (gru4rec.py:162-187):
``/``-separated lists, ``True/False/1/0`` booleans, and the
``embedding='layersize'`` alias (resolved to ``layers[0]``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Optional

VALID_LOSSES = ("cross-entropy", "xe_logit", "bpr", "bpr-max", "top1", "top1-max")
VALID_ADAPT = (None, "adagrad", "rmsprop", "adam", "adadelta")

# Default adapt_params per optimizer when the user leaves them empty.  The
# reference indexes adapt_params[0]/adapt_params[1] directly and would crash on
# an empty list for rmsprop/adadelta/adam; we supply the conventional decays.
_DEFAULT_ADAPT_PARAMS = {
    "rmsprop": [0.9],
    "adadelta": [0.9],
    "adam": [0.9, 0.999],
}


@dataclass
class GRU4RecConfig:
    """All hyperparameters of a GRU4Rec model (reference: gru4rec.py:97-135)."""

    loss: str = "bpr-max"
    final_act: str = "elu-1"
    hidden_act: str = "tanh"
    layers: List[int] = field(default_factory=lambda: [100])
    n_epochs: int = 10
    batch_size: int = 32
    dropout_p_hidden: float = 0.0
    dropout_p_embed: float = 0.0
    learning_rate: float = 0.05
    momentum: float = 0.0
    lmbd: float = 0.0
    embedding: int = 0                      # 0 = no separate embedding
    n_sample: int = 2048
    sample_alpha: float = 0.75
    smoothing: float = 0.0
    constrained_embedding: bool = False
    adapt: Optional[str] = "adagrad"
    adapt_params: List[float] = field(default_factory=list)
    grad_cap: float = 0.0
    bpreg: float = 1.0
    logq: float = 0.0
    sigma: float = 0.0
    init_as_normal: bool = False
    train_random_order: bool = False
    time_sort: bool = True
    session_key: str = "SessionId"
    item_key: str = "ItemId"
    time_key: str = "Time"

    # --- TPU-native extensions (not in the reference) ---
    seed: int = 42                # explicit PRNG seed (replaces np.random.seed(42), gru4rec.py:270)
    chunk_size: int = 512         # steps fused into one device call via lax.scan
    param_dtype: str = "float32"  # parameter dtype
    # Matmul operand dtype (MXU mixed precision): operands are cast per use,
    # accumulation and everything else stays float32. bfloat16 is the natural
    # MXU operand width; set "float32" for bit-exact reference-style matmuls
    # (the numeric-parity tests do).
    compute_dtype: str = "bfloat16"
    # Storage dtype of the row-sparse optimizer state of the big item
    # tables. The update math always runs in float32; only the persisted
    # rows are rounded. bfloat16 halves the per-step HBM bytes of the
    # dominant scatter/gather ops (~10% step time on v5e) at ~0.4% relative
    # rounding noise on state that only modulates the adaptive learning
    # rate — far below minibatch noise. Narrow storage is applied per state
    # slot only where it is safe: monotone accumulators (adagrad) and slow
    # EMAs (decay > 0.99, e.g. adam's default v2=0.999 second moment) stay
    # in the parameter dtype because their per-step relative change is
    # below bfloat16's rounding threshold and they would silently freeze
    # (train/optimizers.py::Optimizer._ema_dtype). Set to "float32" to
    # disable narrow storage entirely, or to "bfloat16_sr" to narrow EVEN
    # the freeze-prone slots (adagrad's accumulator, adam's second moment)
    # with STOCHASTIC ROUNDING keeping them unbiased (ops/sr.py) — halves
    # the fused kernel's dominant state-DMA bytes on large catalogs; state
    # gains ~0.4%-scale rounding noise (opt-in; recommended with
    # adapt=adam/adagrad at >=64MB tables, see PERF_NOTES.md).
    opt_state_dtype: str = "bfloat16"
    item_pad_multiple: int = 128  # pad item tables to a multiple of this many rows (MXU tiling)
    sampler: str = "alias"        # negative sampler: "alias" (O(1)/sample) or "searchsorted" (reference scheme)
    # Duplicate-row gradient reduction on the XLA sparse-update path:
    # "matmul" (default) = MXU equality-matmul (ops/kernels/dedup_matmul.py)
    # — the duplicate sum becomes one exact bf16-split matmul, measured
    # 7-10% faster per step than the sort chain at the sub-64MB shapes
    # (flagship/rsc15/coveo microbench, PERF_NOTES.md "matmul dedup"),
    # auto-falling back to "sort" past the O(K^2 d) crossover
    # (MATMUL_MAX_K2D); "sort" = two-output sort + segment_sum
    # (dedup_rows). Numerically identical up to f32 summation order. The
    # fused-kernel (>=64MB) path is unaffected either way.
    dedup_impl: str = "matmul"

    def __post_init__(self) -> None:
        self.validate()

    # ------------------------------------------------------------------ #
    def validate(self) -> None:
        if self.loss not in VALID_LOSSES:
            raise NotImplementedError(f"Unknown loss: {self.loss!r}")
        if self.adapt not in VALID_ADAPT:
            raise NotImplementedError(f"Unknown adapt: {self.adapt!r}")
        if self.embedding == "layersize":
            self.embedding = self.layers[0]   # alias (reference: gru4rec.py:185-187)
        if not self.adapt_params and self.adapt in _DEFAULT_ADAPT_PARAMS:
            self.adapt_params = list(_DEFAULT_ADAPT_PARAMS[self.adapt])
        if self.adapt == "adadelta" and self.learning_rate != 1.0:
            # reference: gru4rec.py:363-365 forces lr to 1.0 under adadelta
            print("Warn: learning_rate is not 1.0 while using adadelta. Setting learning_rate to 1.0")
            self.learning_rate = 1.0
        if self.param_dtype != "float32":
            # master weights must stay f32: row updates land in the params
            # with round-to-nearest, and bf16 masters freeze once per-step
            # deltas drop under the bf16 half-ULP (the same failure mode
            # _ema_dtype gates optimizer state against). Memory savings come
            # from compute_dtype=bfloat16 (default) + opt_state_dtype; a
            # trained model can still be cast to bf16 for serving
            # (GRU4Rec.cast_for_serving) and the checkpoint layer
            # round-trips bf16 arrays (io/checkpoint.py).
            raise NotImplementedError(
                f"param_dtype={self.param_dtype!r}: training requires "
                "float32 master weights (bf16 masters silently freeze under "
                "round-to-nearest updates). Use compute_dtype='bfloat16' "
                "for bf16 math and opt_state_dtype for narrow state."
            )
        if self.opt_state_dtype not in ("float32", "bfloat16", "bfloat16_sr"):
            raise NotImplementedError(
                f"Unknown opt_state_dtype: {self.opt_state_dtype!r} "
                "(float32 | bfloat16 | bfloat16_sr)")
        if self.dedup_impl not in ("sort", "matmul"):
            raise NotImplementedError(
                f"Unknown dedup_impl: {self.dedup_impl!r} (sort | matmul)")
        if (self.loss == "cross-entropy"
                and self.final_act not in ("softmax", "softmax_logit")):
            # the reference accepts this silently and NaNs on log(score<=0)
            # mid-epoch (gru4rec.py:97 defaults final_act='linear'); keep the
            # accepting behavior for parity but say why training will abort
            print(
                f"Warn: loss=cross-entropy takes log of the scores, but "
                f"final_act={self.final_act!r} can emit scores <= 0 — "
                "training will likely NaN-abort. Use final_act=softmax "
                "(what every published cross-entropy config uses)."
            )
        if self.loss == "top1":
            # deliberate parity break (ops/losses.py): the reference's top1
            # accidentally broadcasts the regularizer M times before the
            # batch mean (gru4rec.py:242-244), inflating its gradient by
            # ~batch_size; we compute the paper's formula. A reference-tuned
            # top1 config therefore sees weaker regularization here.
            print(
                "Warn: loss=top1 uses the TOP1 paper's formula; the "
                "reference implementation scales the regularizer by "
                f"~batch_size (={self.batch_size}) due to a broadcasting "
                "accident. Reference-tuned top1 configs may need a larger "
                "learning_rate or batch_size-scaled regularization to match "
                "(top1-max is unaffected)."
            )

    # ------------------------------------------------------------------ #
    def set_params(self, **kwargs) -> "GRU4RecConfig":
        """Typed coercion of string parameter values (reference: gru4rec.py:162-187).

        Accepts strings from CLI param-strings and coerces them to the field's
        type: '/'-separated lists, 'True'/'False'/'1'/'0' booleans, and the
        'layersize' embedding alias. Mutates and returns self.
        """
        names = {f.name for f in dataclasses.fields(self)}
        for k, v in kwargs.items():
            if k not in names:
                print(f"Unkown attribute: {k}")
                raise NotImplementedError(f"Unknown parameter: {k}")
            cur = getattr(self, k)
            if isinstance(v, str):
                if k == "adapt_params":
                    v = [float(x) for x in v.split("/")] if v else []
                elif isinstance(cur, list):
                    v = [int(x) for x in v.split("/")]
                elif isinstance(cur, bool):
                    if v in ("True", "1"):
                        v = True
                    elif v in ("False", "0"):
                        v = False
                    else:
                        raise NotImplementedError(f"Invalid value for boolean parameter: {v}")
                elif k == "embedding" and v == "layersize":
                    pass  # resolved in validate()
                elif k == "adapt" and v in ("None", "none", ""):
                    v = None
                elif cur is None:
                    pass  # keep string (e.g. adapt set from None default)
                else:
                    v = type(cur)(v)
            setattr(self, k, v)
            print(f"SET   {k}   TO   {v}   (type: {type(v)})")
        self.validate()
        return self

    # ------------------------------------------------------------------ #
    @classmethod
    def from_parameter_string(cls, s: str) -> "GRU4RecConfig":
        """Parse ``name1=value1,name2=value2`` strings (reference: run.py:97)."""
        cfg = cls()
        pairs = dict(x.split("=", 1) for x in s.split(",") if x)
        return cfg.set_params(**pairs)

    @classmethod
    def from_parameter_file(cls, path: str) -> "GRU4RecConfig":
        """Load a param-file module exposing ``gru4rec_params`` (reference: run.py:88-95)."""
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            os.path.splitext(os.path.basename(path))[0], os.path.abspath(path)
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        cfg = cls()
        return cfg.set_params(**dict(mod.gru4rec_params))

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "GRU4RecConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})
