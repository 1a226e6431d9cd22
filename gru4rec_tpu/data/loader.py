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
    def check_columns(available, source):
        for key, role, default in (
            (session_key, "session", "SessionId"),
            (item_key, "item", "ItemId"),
            (time_key, "timestamp", "Time"),
        ):
            if key not in available:
                print(f"ERROR. {fname} has no {role}-ID column named {key!r} "
                      f"(columns found in the {source}: {sorted(available)}).")
                print(f"Pass the actual column name via the corresponding "
                      f"*_key option, or rename it to the default {default!r}.")
                sys.exit(1)

    if fname.endswith(".pickle"):
        print(f"Loading data from pickle file: {fname}")
        try:
            data = pd.read_pickle(fname)
        except OSError:
            # missing/unreadable file: not a format problem — don't hide the
            # real error behind a joblib-fallback ValueError
            raise
        except Exception as pickle_exc:
            # the reference dumps datasets with joblib (run.py:48), whose
            # archive format plain pickle cannot read — accept those too so
            # a user's existing .pickle files keep working
            try:
                import joblib
            except ImportError as exc:  # pragma: no cover
                raise ValueError(
                    f"{fname} is not a pandas pickle and joblib is not "
                    "installed to try its format"
                ) from exc
            try:
                data = joblib.load(fname)
            except Exception as exc:
                # surface the ORIGINAL pandas failure too — a truncated or
                # corrupt pandas pickle would otherwise hide behind a
                # confusing joblib-format error
                raise ValueError(
                    f"could not load {fname} as a pandas pickle "
                    f"({pickle_exc!r}) nor as a joblib archive ({exc!r})"
                ) from pickle_exc
        check_columns(list(data.columns), "frame")
    else:
        with open(fname, "rt") as f:
            header = f.readline().strip().split("\t")
        check_columns(header, "header")
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
