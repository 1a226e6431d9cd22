"""Differential oracle: the reference's ENTIRE compiled training step,
transcribed to torch float64.

The reference compiles model -> loss/B -> grads -> optimizer -> H update into
one Theano function (/root/reference/gru4rec.py:572-584). The repo's unit
oracles cover forward, losses, and optimizers separately; THIS module is the
composition oracle: one host-side step that reproduces the reference's math
end-to-end, with autodiff supplied by torch instead of Theano (gradients of a
faithfully transcribed forward are the reference's gradients).

Faithfulness notes (what is reference-exact and what encodes the repo's
documented divergences):

* Forward (all 3 input modes, multi-layer GRU, scoring, logq placement
  pre-final-act) transcribes gru4rec.py:433-506 exactly. Hidden reset is
  applied PRE-step from the schedule's reset mask — equivalent to the
  reference's post-step ``switch(R, 0, h)`` (proven separately by
  tests/test_scheduler.py's loop transcription).
* Losses transcribe gru4rec.py:225-248 exactly (diag trick, smoothing over
  M + n_sample outputs, bpreg, top1's mean over M + n_sample columns) —
  with ONE deliberate divergence shared with the repo: the reference's top1
  subtracts a broadcastable (M,1) self-penalty from the (M,) row means,
  which Theano broadcasts to (M,M) before T.sum, multiplying the whole
  top1 cost and its gradients by M (a broadcasting accident, see
  ops/losses.py). The oracle and the repo both use the intended 1-D form;
  tests/test_losses.py::test_top1_reference_broadcast_relationship pins
  the exact xM relationship to the reference's expression.
* Dead lanes: the reference physically shrinks the batch; the oracle computes
  on the compacted valid-lane matrix (true reference semantics) while the
  framework masks static lanes — the loss is still divided by the STATIC
  batch size (gru4rec.py:577), replicated here.
* Optimizers transcribe gru4rec.py:300-432 with the repo's TWO documented
  divergences (train/optimizers.py module docstring):
  - duplicate row indices are deduped by SUMMING occurrence gradients before
    one dense-equivalent row update (the reference's per-occurrence
    inc_subtensor path coincides with this exactly when indices are unique);
  - ``adam_variant='textbook'`` implements correct Adam. The reference's
    adam (``adam_variant='reference'``) updates the sparse first moment with
    the SQUARED gradient (gru4rec.py:325) and bias-corrects the second
    moment with the first moment's decay (gru4rec.py:329, dense AND sparse)
    — kept so tests can assert the divergence is real.
* The output bias is folded as Wy's last column like the repo
  (models/gru.py): identical to the reference's separate By wherever By's
  index set equals Wy's (one-hot/embedding modes always; constrained mode
  except for rows touched only as inputs under momentum/lmbd/adam — the
  repo's documented fold divergence, which this oracle then shares).
"""

from __future__ import annotations

import numpy as np
import torch

EPSILON = 1e-6
# No torch.set_default_dtype here: that would mutate process-global torch
# state as an import side effect for every other test module. All inputs
# are float64 numpy arrays (torch.tensor infers f64 from them); the one
# default-dtype-dependent constructor (eye, below) is explicit.


# --------------------------------------------------------------------------- #
# activations (reference: gru4rec.py:188-223)
def get_act(name):
    if name == "linear":
        return lambda x: x
    if name == "tanh":
        return torch.tanh
    if name == "relu":
        return lambda x: torch.clamp(x, min=0)
    if name == "sigmoid":
        return torch.sigmoid
    if name == "softmax":
        def softmax(x):
            e = torch.exp(x - x.max(dim=1, keepdim=True).values)
            return e / e.sum(dim=1, keepdim=True)
        return softmax
    if name == "softmax_logit":
        def softmax_logit(x):
            x = x - x.max(dim=1, keepdim=True).values
            return torch.log(torch.exp(x).sum(dim=1, keepdim=True)) - x
        return softmax_logit
    if name.startswith("leaky-"):
        leak = float(name.split("-")[1])
        return lambda x: torch.where(x >= 0, x, leak * x)
    if name.startswith("elu-"):
        alpha = float(name.split("-")[1])
        return lambda x: torch.where(x >= 0, x, alpha * (torch.exp(x) - 1.0))
    if name.startswith("selu-"):
        l, a = (float(v) for v in name.split("-")[1:])
        return lambda x: l * torch.where(x >= 0, x, a * (torch.exp(x) - 1.0))
    raise ValueError(name)


def softmax_neg(x):
    """Softmax over each row's negatives (reference: gru4rec.py:199-203)."""
    m, n = x.shape
    hm = 1.0 - torch.eye(m, n, dtype=torch.float64)
    x = x * hm
    e = torch.exp(x - x.max(dim=1, keepdim=True).values) * hm
    return e / e.sum(dim=1, keepdim=True)


# --------------------------------------------------------------------------- #
# losses (reference: gru4rec.py:225-248); yhat is (M, M + n_sample), the
# diagonal holds each row's positive
def loss_fn(name, yhat, M, n_sample, smoothing, bpreg):
    diag = torch.diagonal(yhat)
    if name == "cross-entropy":
        core = -torch.log(diag + 1e-24)
        if smoothing:
            n_out = M + n_sample
            colsum = torch.sum(-torch.log(yhat + 1e-24), dim=1)
            return torch.sum(
                (1.0 - (n_out / (n_out - 1)) * smoothing) * core
                + (smoothing / (n_out - 1)) * colsum
            )
        return torch.sum(core)
    if name == "xe_logit":
        if smoothing:
            n_out = M + n_sample
            return torch.sum(
                (1.0 - (n_out / (n_out - 1)) * smoothing) * diag
                + (smoothing / (n_out - 1)) * torch.sum(yhat, dim=1)
            )
        return torch.sum(diag)
    d = diag[:, None]
    if name == "bpr":
        return torch.sum(-torch.log(torch.sigmoid(d - yhat)))
    if name == "bpr-max":
        ss = softmax_neg(yhat)
        return torch.sum(
            -torch.log(torch.sum(torch.sigmoid(d - yhat) * ss, dim=1) + 1e-24)
            + bpreg * torch.sum((yhat ** 2) * ss, dim=1)
        )
    if name == "top1":
        return torch.sum(
            torch.mean(torch.sigmoid(-d + yhat) + torch.sigmoid(yhat ** 2), dim=1)
            - torch.sigmoid(d[:, 0] ** 2) / (M + n_sample)
        )
    if name == "top1-max":
        ss = softmax_neg(yhat)
        return torch.sum(
            torch.sum(ss * (torch.sigmoid(-d + yhat) + torch.sigmoid(yhat ** 2)),
                      dim=1)
        )
    raise ValueError(name)


# --------------------------------------------------------------------------- #
def gru_layer(vec, H, Wrz, Wh, hidden_act, h):
    """Reference cell (gru4rec.py:471-479): vec = x·Wx + Bh, blocks [h|r|z]."""
    rz = torch.sigmoid(vec[:, h:] + H @ Wrz)
    r, z = rz[:, :h], rz[:, h:]
    hbar = hidden_act((H * r) @ Wh + vec[:, :h])
    return (1.0 - z) * H + z * hbar


class ReferenceStepOracle:
    """Stateful transcription of the reference's compiled train step.

    ``params`` are float64 numpy copies of the framework's initial tables
    (Wy carries the folded bias column). ``step(in_idx, out_idx, valid,
    reset, neg)`` advances one step and returns the scalar cost
    (loss / static_batch_size) exactly as the compiled function does.
    """

    def __init__(self, params, cfg, n_items, logp0=None,
                 adam_variant="textbook"):
        if cfg.dropout_p_hidden or cfg.dropout_p_embed:
            # the reference applies dropout inside the compiled step
            # (gru4rec.py:443,451,464,477); this oracle does not model the
            # masks, so nonzero dropout would fail parity with an opaque
            # numeric mismatch — fail loudly at the source instead
            raise ValueError(
                "ReferenceStepOracle does not model dropout; build the "
                "oracle with dropout_p_hidden=dropout_p_embed=0"
            )
        as64 = lambda a: np.array(a, dtype=np.float64)
        self.mode = ("constrained" if cfg.constrained_embedding
                     else "embedding" if cfg.embedding else "onehot")
        self.layers = list(cfg.layers)
        self.n_items = n_items
        # strip the framework's MXU padding rows: the oracle works unpadded
        self.Wy = as64(params["Wy"])[:n_items]
        self.Wx = [as64(w) for w in params["Wx"]]
        if self.mode == "onehot":
            self.Wx[0] = self.Wx[0][:n_items]
        self.Wh = [as64(w) for w in params["Wh"]]
        self.Wrz = [as64(w) for w in params["Wrz"]]
        self.Bh = [as64(b) for b in params["Bh"]]
        self.E = as64(params["E"])[:n_items] if "E" in params else None
        self.H = [np.zeros((cfg.batch_size, h)) for h in self.layers]

        self.loss = cfg.loss
        self.final_act = get_act(cfg.final_act)
        self.hidden_act = get_act(cfg.hidden_act)
        self.B = cfg.batch_size
        self.n_sample = cfg.n_sample
        self.smoothing = cfg.smoothing
        self.bpreg = cfg.bpreg
        self.logq = cfg.logq
        self.sample_alpha = cfg.sample_alpha
        self.logp0 = None if logp0 is None else as64(logp0)[:n_items]

        self.adapt = cfg.adapt
        self.lr = cfg.learning_rate
        self.momentum = cfg.momentum
        self.lmbd = cfg.lmbd
        self.grad_cap = cfg.grad_cap
        ap = cfg.adapt_params
        self.v1 = ap[0] if ap else 0.9
        self.v2 = ap[1] if len(ap) > 1 else 0.999
        self.adam_variant = adam_variant

        self.state = {}  # per-table optimizer slots, lazily allocated

    # ------------------------------------------------------------------ #
    def _slots(self, key, shape):
        st = self.state.get(key)
        if st is None:
            st = {}
            if self.adapt in ("adagrad", "rmsprop", "adadelta", "adam"):
                st["acc"] = np.zeros(shape)
            if self.adapt == "adadelta":
                st["upd"] = np.zeros(shape)
            if self.adapt == "adam":
                st["meang"] = np.zeros(shape)
                st["count"] = np.zeros(shape[0] if len(shape) > 1 else shape)
            if self.momentum > 0:
                st["velocity"] = np.zeros(shape)
            self.state[key] = st
        return st

    def _adapt(self, g, st, rows=None, is_sparse_grad_sq=False):
        """Adaptive scaling (reference gru4rec.py:300-381). ``rows`` selects
        the touched state rows (dense when None)."""
        ix = slice(None) if rows is None else rows
        a = self.adapt
        if a == "adagrad":
            acc = st["acc"][ix] + g ** 2
            st["acc"][ix] = acc
            return g / np.sqrt(acc + EPSILON)
        if a == "rmsprop":
            acc = self.v1 * st["acc"][ix] + (1.0 - self.v1) * g ** 2
            st["acc"][ix] = acc
            return g / np.sqrt(acc + EPSILON)
        if a == "adadelta":
            acc = self.v1 * st["acc"][ix] + (1.0 - self.v1) * g ** 2
            st["acc"][ix] = acc
            scaling = (st["upd"][ix] + EPSILON) / (acc + EPSILON)
            st["upd"][ix] = self.v1 * st["upd"][ix] + (1.0 - self.v1) * scaling * g ** 2
            return g * np.sqrt(scaling)
        if a == "adam":
            acc = self.v2 * st["acc"][ix] + (1.0 - self.v2) * g ** 2
            if self.adam_variant == "reference" and is_sparse_grad_sq:
                # gru4rec.py:325 — sparse first moment fed the SQUARED grad
                meang = self.v1 * st["meang"][ix] + (1.0 - self.v1) * g ** 2
            else:
                meang = self.v1 * st["meang"][ix] + (1.0 - self.v1) * g
            cnt = st["count"][ix] + 1.0
            st["acc"][ix], st["meang"][ix], st["count"][ix] = acc, meang, cnt
            c = cnt if g.ndim == 1 else np.asarray(cnt)[:, None]
            if self.adam_variant == "reference":
                # gru4rec.py:329 — second moment bias-corrected with v1
                return (meang / (1 - self.v1 ** c)) / (
                    np.sqrt(acc / (1 - self.v1 ** c)) + EPSILON)
            return (meang / (1 - self.v1 ** c)) / (
                np.sqrt(acc / (1 - self.v2 ** c)) + EPSILON)
        return g

    def _apply_dense(self, name, table, g):
        st = self._slots(name, table.shape)
        g = self._adapt(g, st)
        if self.momentum > 0:
            vel = self.momentum * st["velocity"] - self.lr * (g + self.lmbd * table)
            st["velocity"] = vel
            return table + vel
        return table * (1.0 - self.lr * self.lmbd) - self.lr * g

    def _apply_sparse(self, name, table, idx, g):
        """Row update with occurrence-summed (deduped) gradients — equal to
        the reference's inc_subtensor path for unique indices."""
        st = self._slots(name, table.shape)
        uidx, inv = np.unique(idx, return_inverse=True)
        gsum = np.zeros((len(uidx), g.shape[1]))
        np.add.at(gsum, inv, g)
        gs = self._adapt(gsum, st, rows=uidx, is_sparse_grad_sq=True)
        if self.lmbd > 0:
            delta = self.lr * (gs + self.lmbd * table[uidx])
        else:
            delta = self.lr * gs
        if self.momentum > 0:
            vel = self.momentum * st["velocity"][uidx] - delta
            st["velocity"][uidx] = vel
            table[uidx] += vel
        else:
            table[uidx] -= delta
        return table

    # ------------------------------------------------------------------ #
    def step(self, in_idx, out_idx, valid, reset, neg):
        """One composed train step. Returns cost = loss / static_batch_size."""
        B, n_sample = self.B, self.n_sample
        valid = np.asarray(valid, bool)
        # pre-step reset (equivalent to the reference's post-step switch)
        for i in range(len(self.H)):
            self.H[i][np.asarray(reset, bool)] = 0.0
        lanes = np.nonzero(valid)[0]  # the reference's physically-shrunk batch
        M = len(lanes)
        X = np.asarray(in_idx)[lanes]
        Yp = np.asarray(out_idx)[lanes]
        Y = np.concatenate([Yp, np.asarray(neg, np.int64)]) if n_sample else Yp

        t = lambda a: torch.tensor(a)
        leaf = lambda a: torch.tensor(a, requires_grad=True)
        H_in = [t(h[lanes]) for h in self.H]
        Wh = [leaf(w) for w in self.Wh]
        Wrz = [leaf(w) for w in self.Wrz]
        Bh = [leaf(b) for b in self.Bh]
        dense_Wx_start = 1 if self.mode == "onehot" else 0
        Wx = [None] * dense_Wx_start + [leaf(w) for w in self.Wx[dense_Wx_start:]]

        # --- forward (gru4rec.py:433-506) ---
        H_new = []
        h = self.layers[-1]  # bias at column h, tile padding beyond
        if self.mode == "constrained":
            XY = np.concatenate([X, Y])
            S = leaf(self.Wy[XY])           # one concat gather, bias folded
            y = S[:M, :h]
            Sy, SBy = S[M:, :h], S[M:, h]
            start = 0
        elif self.mode == "embedding":
            S = leaf(self.E[X])
            SyB = leaf(self.Wy[Y])
            y, Sy, SBy = S, SyB[:, :h], SyB[:, h]
            start = 0
        else:
            S = leaf(self.Wx[0][X])
            SyB = leaf(self.Wy[Y])
            Sy, SBy = SyB[:, :h], SyB[:, h]
            vec = S + Bh[0]
            h = gru_layer(vec, H_in[0], Wrz[0], Wh[0], self.hidden_act,
                          self.layers[0])
            y = h
            H_new.append(h)
            start = 1
        for i in range(start, len(self.layers)):
            vec = y @ Wx[i] + Bh[i]
            h = gru_layer(vec, H_in[i], Wrz[i], Wh[i], self.hidden_act,
                          self.layers[i])
            y = h
            H_new.append(h)

        scores = y @ Sy.T + SBy
        if self.logq:
            lp = np.concatenate([
                self.logp0[Yp],
                self.sample_alpha * self.logp0[np.asarray(neg, np.int64)],
            ]) if n_sample else self.logp0[Yp]
            scores = scores - self.logq * t(lp)
        yhat = self.final_act(scores)
        cost = loss_fn(self.loss, yhat, M, n_sample, self.smoothing,
                       self.bpreg) / B
        cost.backward()

        # --- global-norm clipping over per-occurrence grads (gru4rec.py:386-389)
        dense_leaves = Wh + Wrz + Bh + Wx[dense_Wx_start:]
        if self.mode == "constrained":
            sparse_leaves = [S]
        else:
            sparse_leaves = [S, SyB]
        scale = 1.0
        if self.grad_cap > 0:
            sq = sum(float((p.grad ** 2).sum()) for p in dense_leaves + sparse_leaves)
            norm = np.sqrt(sq)
            if norm >= self.grad_cap:
                scale = self.grad_cap / norm

        g = lambda p: p.grad.numpy() * scale

        # --- dense updates ---
        for i in range(dense_Wx_start, len(self.layers)):
            self.Wx[i] = self._apply_dense(f"Wx{i}", self.Wx[i], g(Wx[i]))
        for i in range(len(self.layers)):
            self.Wh[i] = self._apply_dense(f"Wh{i}", self.Wh[i], g(Wh[i]))
            self.Wrz[i] = self._apply_dense(f"Wrz{i}", self.Wrz[i], g(Wrz[i]))
            self.Bh[i] = self._apply_dense(f"Bh{i}", self.Bh[i], g(Bh[i]))

        # --- sparse (row) updates ---
        if self.mode == "constrained":
            self.Wy = self._apply_sparse("Wy", self.Wy, XY, g(S))
        elif self.mode == "embedding":
            self.E = self._apply_sparse("E", self.E, X, g(S))
            self.Wy = self._apply_sparse("Wy", self.Wy, Y, g(SyB))
        else:
            self.Wx[0] = self._apply_sparse("Wx0", self.Wx[0], X, g(S))
            self.Wy = self._apply_sparse("Wy", self.Wy, Y, g(SyB))

        for i in range(len(self.H)):
            self.H[i][lanes] = H_new[i].detach().numpy()
        return float(cost.detach())
