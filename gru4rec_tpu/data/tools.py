"""Host-side data tooling: sortedness check and session offset index.

Re-designed equivalents of the reference's datatools.py:12-39 — an O(n)
already-sorted check before paying for a sort, and the CSR-style session
boundary index (``offset[i]..offset[i+1]`` rows belong to session i).
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd


def is_sorted(data: pd.DataFrame, columns, any_order_first_dim: bool = False) -> bool:
    """O(n) check whether `data` is lexicographically sorted by `columns`.

    With ``any_order_first_dim``, the first column only needs to be *grouped*
    (each value contiguous), not ascending (reference: datatools.py:19-21).
    """
    neq_prev = None
    for i, col in enumerate(columns):
        vals = data[col].values
        neq = vals[1:] != vals[:-1]
        if i == 0:
            if any_order_first_dim:
                if data[col].nunique() != int(neq.sum()) + 1:
                    return False
            else:
                if not np.all(vals[1:] >= vals[:-1]):
                    return False
        else:
            if not np.all(neq_prev | (vals[1:] >= vals[:-1])):
                return False
        neq_prev = neq if neq_prev is None else (neq_prev | neq)
    return True


def sort_if_needed(data: pd.DataFrame, columns, any_order_first_dim: bool = False) -> pd.DataFrame:
    """Sort `data` by `columns` in place unless it is already sorted."""
    if is_sorted(data, columns, any_order_first_dim):
        print("The dataframe is already sorted by {}".format(", ".join(columns)))
    else:
        print("The dataframe is not sorted by {}, sorting now".format(columns[-1]))
        t0 = time.time()
        data.sort_values(columns, inplace=True)
        print("Data is sorted in {:.2f}".format(time.time() - t0))
    return data


def compute_offset(data: pd.DataFrame, column: str) -> np.ndarray:
    """Session boundary index over a (session-grouped) frame (reference: datatools.py:36-39)."""
    offset = np.zeros(data[column].nunique() + 1, dtype=np.int64)
    offset[1:] = data.groupby(column, sort=False).size().cumsum().values
    return offset
