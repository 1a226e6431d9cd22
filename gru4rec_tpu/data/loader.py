"""Dataset loading and item-ID mapping.

Equivalent surface of the reference's run.py:45-78 (TSV / pickled DataFrame
with column validation; item IDs read as strings) and gru4rec.py:534-537
(dense item-index mapping in first-appearance order).
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd


def load_data(fname: str, session_key: str = "SessionId", item_key: str = "ItemId",
              time_key: str = "Time") -> pd.DataFrame:
    """Load a TSV (.tsv/.txt) or pickled pandas.DataFrame (.pickle) dataset."""
    if fname.endswith(".pickle"):
        print(f"Loading data from pickle file: {fname}")
        data = pd.read_pickle(fname)
        for key, what, default in (
            (session_key, "session IDs", "SessionId"),
            (item_key, "item IDs", "ItemId"),
            (time_key, "time", "Time"),
        ):
            if key not in data.columns:
                print(f'ERROR. The column specified for {what} "{key}" is not in the data file ({fname})')
                print(f'The default column name is "{default}", but you can specify otherwise by setting the appropriate key parameter.')
                sys.exit(1)
    else:
        with open(fname, "rt") as f:
            header = f.readline().strip().split("\t")
        for key, what, default in (
            (session_key, "session IDs", "SessionId"),
            (item_key, "item IDs", "ItemId"),
            (time_key, "time", "Time"),
        ):
            if key not in header:
                print(f'ERROR. The column specified for {what} "{key}" is not in the data file ({fname})')
                print(f'The default column name is "{default}", but you can specify otherwise by setting the appropriate key parameter.')
                sys.exit(1)
        print(f"Loading data from TAB separated file: {fname}")
        data = pd.read_csv(
            fname,
            sep="\t",
            usecols=[session_key, item_key, time_key],
            dtype={session_key: "int32", item_key: "str"},
        )
    return data


def build_itemidmap(data: pd.DataFrame, item_key: str) -> pd.Series:
    """Map raw item IDs to dense indices [0, n_items) in first-appearance order
    (reference: gru4rec.py:534-537)."""
    itemids = data[item_key].unique()
    return pd.Series(data=np.arange(len(itemids), dtype=np.int64), index=itemids, name="ItemIdx")


def apply_itemidmap(data: pd.DataFrame, itemidmap: pd.Series, item_key: str) -> pd.DataFrame:
    """Attach a dense ``ItemIdx`` column; raises KeyError on unseen items."""
    data = data.copy()
    data["ItemIdx"] = itemidmap[data[item_key].values].values
    return data
