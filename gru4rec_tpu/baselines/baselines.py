"""Non-neural baseline recommenders with the reference's predict protocol.

Reference: baselines.py (RandomPred :11-50, Pop :52-118, SessionPop :120-197,
ItemKNN :199-301, BPR :303-419). All expose ``fit(data)`` and
``predict_next(session_id, input_item_id, predict_for_item_ids) -> pd.Series``
and are evaluated with ``eval.evaluation.evaluate_sessions``.

ItemKNN's similarity build is vectorized (a self-join + group count instead
of the reference's O(n_items x events) Python loop) but computes the same
quantity: co(i,j) = sum over sessions of supp_s(i)*supp_s(j), normalized by
(supp_i + lambda)^alpha * (supp_j + lambda)^(1-alpha).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class RandomPred:
    """Uniform random scores (reference: baselines.py:11-50)."""

    def __init__(self, rng=None):
        self.rng = rng or np.random.RandomState(0)

    def fit(self, data):
        pass

    def predict_next(self, session_id, input_item_id, predict_for_item_ids):
        return pd.Series(
            data=self.rng.rand(len(predict_for_item_ids)), index=predict_for_item_ids
        )


class Pop:
    """Global popularity ``supp/(1+supp)``, top-n truncated (baselines.py:52-118)."""

    def __init__(self, top_n=100, item_key="ItemId", support_by_key=None):
        self.top_n = top_n
        self.item_key = item_key
        self.support_by_key = support_by_key

    def fit(self, data):
        grp = data.groupby(self.item_key)
        pop = grp.size() if self.support_by_key is None else grp[self.support_by_key].nunique()
        pop = pop / (pop + 1)
        self.pop_list = pop.sort_values(ascending=False).head(self.top_n)

    def predict_next(self, session_id, input_item_id, predict_for_item_ids):
        preds = np.zeros(len(predict_for_item_ids))
        mask = np.isin(predict_for_item_ids, self.pop_list.index)
        preds[mask] = self.pop_list[predict_for_item_ids[mask]]
        return pd.Series(data=preds, index=predict_for_item_ids)


class SessionPop:
    """In-session counts + popularity tie-break (baselines.py:120-197)."""

    def __init__(self, top_n=100, item_key="ItemId", support_by_key=None):
        self.top_n = top_n
        self.item_key = item_key
        self.support_by_key = support_by_key

    def fit(self, data):
        grp = data.groupby(self.item_key)
        pop = grp.size() if self.support_by_key is None else grp[self.support_by_key].nunique()
        pop = pop / (pop + 1)
        self.pop_list = pop.sort_values(ascending=False).head(self.top_n)
        self.prev_session_id = -1

    def predict_next(self, session_id, input_item_id, predict_for_item_ids):
        if self.prev_session_id != session_id:
            self.prev_session_id = session_id
            self.pers = {}
        self.pers[input_item_id] = self.pers.get(input_item_id, 0) + 1
        preds = np.zeros(len(predict_for_item_ids))
        mask = np.isin(predict_for_item_ids, self.pop_list.index)
        preds[mask] = self.pop_list[predict_for_item_ids[mask]]
        ser = pd.Series(self.pers)
        mask = np.isin(predict_for_item_ids, ser.index)
        preds[mask] += ser[predict_for_item_ids[mask]]
        return pd.Series(data=preds, index=predict_for_item_ids)


class ItemKNN:
    """Item co-occurrence similarity, top n_sims per item (baselines.py:199-301)."""

    def __init__(self, n_sims=100, lmbd=20, alpha=0.5, session_key="SessionId",
                 item_key="ItemId", time_key="Time"):
        self.n_sims = n_sims
        self.lmbd = lmbd
        self.alpha = alpha
        self.session_key = session_key
        self.item_key = item_key
        self.time_key = time_key

    def fit(self, data):
        itemids = data[self.item_key].unique()
        n_items = len(itemids)
        idmap = pd.Series(np.arange(n_items), index=itemids)
        df = pd.DataFrame({
            "s": data[self.session_key].values,
            "i": idmap[data[self.item_key].values].values,
        })
        supp = np.zeros(n_items, dtype=np.int64)
        cnt = df.groupby("i").size()
        supp[cnt.index.values] = cnt.values
        # co(i,j) = sum_s supp_s(i) * supp_s(j): session-level self-join
        pairs = df.merge(df, on="s")
        co = pairs.groupby(["i_x", "i_y"]).size().reset_index(name="c")
        co = co[co.i_x != co.i_y]
        norm_i = (supp + self.lmbd) ** self.alpha
        norm_j = (supp + self.lmbd) ** (1.0 - self.alpha)
        sims = {}
        for i, grp in co.groupby("i_x"):
            j = grp.i_y.values
            val = grp.c.values / (norm_i[i] * norm_j[j])
            top = np.argsort(val)[::-1][: self.n_sims]
            sims[itemids[i]] = pd.Series(data=val[top], index=itemids[j[top]])
        empty = pd.Series(dtype=np.float64)
        self.sims = {iid: sims.get(iid, empty) for iid in itemids}

    def predict_next(self, session_id, input_item_id, predict_for_item_ids):
        preds = np.zeros(len(predict_for_item_ids))
        sim_list = self.sims[input_item_id]
        mask = np.isin(predict_for_item_ids, sim_list.index)
        preds[mask] = sim_list[predict_for_item_ids[mask]]
        return pd.Series(data=preds, index=predict_for_item_ids)


class BPR:
    """BPR-MF with session-as-user; prediction uses the mean of the session's
    item factors as the session vector (baselines.py:303-419)."""

    def __init__(self, n_factors=100, n_iterations=10, learning_rate=0.01,
                 lambda_session=0.0, lambda_item=0.0, sigma=0.05, init_normal=False,
                 session_key="SessionId", item_key="ItemId", seed=42):
        self.n_factors = n_factors
        self.n_iterations = n_iterations
        self.learning_rate = learning_rate
        self.lambda_session = lambda_session
        self.lambda_item = lambda_item
        self.sigma = sigma
        self.init_normal = init_normal
        self.session_key = session_key
        self.item_key = item_key
        self.current_session = None
        self.rng = np.random.RandomState(seed)

    def _init(self):
        r = self.rng
        if self.init_normal:
            self.U = r.randn(self.n_sessions, self.n_factors) * self.sigma
            self.I = r.randn(self.n_items, self.n_factors) * self.sigma
        else:
            self.U = r.rand(self.n_sessions, self.n_factors) * 2 * self.sigma - self.sigma
            self.I = r.rand(self.n_items, self.n_factors) * 2 * self.sigma - self.sigma
        self.bU = np.zeros(self.n_sessions)
        self.bI = np.zeros(self.n_items)

    def fit(self, data):
        itemids = data[self.item_key].unique()
        self.n_items = len(itemids)
        self.itemidmap = pd.Series(np.arange(self.n_items), index=itemids)
        sessionids = data[self.session_key].unique()
        self.n_sessions = len(sessionids)
        smap = pd.Series(np.arange(self.n_sessions), index=sessionids)
        uidx = smap[data[self.session_key].values].values
        iidx = self.itemidmap[data[self.item_key].values].values
        self._init()
        lr, ls, li = self.learning_rate, self.lambda_session, self.lambda_item
        for it in range(self.n_iterations):
            costs = []
            for e in self.rng.permutation(len(data)):
                u, p = uidx[e], iidx[e]
                n = iidx[self.rng.randint(self.n_items)]
                uF, iF1, iF2 = self.U[u].copy(), self.I[p].copy(), self.I[n].copy()
                sigm = 1.0 / (1.0 + np.exp(-(iF1 @ uF - iF2 @ uF + self.bI[p] - self.bI[n])))
                c = 1.0 - sigm
                self.U[u] += lr * (c * (iF1 - iF2) - ls * uF)
                self.I[p] += lr * (c * uF - li * iF1)
                self.I[n] += lr * (-c * uF - li * iF2)
                # the reference never updates bI (baselines.py:349-358); kept for parity
                costs.append(np.log(max(sigm, 1e-12)))
            print(it, float(np.mean(costs)))

    def predict_next(self, session_id, input_item_id, predict_for_item_ids):
        iidx = self.itemidmap[input_item_id]
        if self.current_session is None or self.current_session != session_id:
            self.current_session = session_id
            self.session = [iidx]
        else:
            self.session.append(iidx)
        uF = self.I[self.session].mean(axis=0)
        iIdxs = self.itemidmap[predict_for_item_ids]
        return pd.Series(data=self.I[iIdxs].dot(uF) + self.bI[iIdxs],
                         index=predict_for_item_ids)
