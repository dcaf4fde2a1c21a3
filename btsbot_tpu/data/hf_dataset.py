"""HuggingFace ``datasets`` export of a training split.

Equivalent of the reference's ``convert_to_hf`` (utils.py:114-146): bundle a
split's triplets + candidate table into a ``datasets.Dataset`` with an
Array3D(63,63,3) triplet feature and per-column dtype mapping, saved to disk.
"""

from __future__ import annotations

import numpy as np


def dataset_from_arrays(triplets: np.ndarray, cand):
    """Build the datasets.Dataset (columns from cand + 'triplet')."""
    import pandas.api.types as ptypes
    from datasets import Array3D, Dataset, Features, Value

    features = {"triplet": Array3D(dtype="float32", shape=(63, 63, 3))}
    for col in cand.columns:
        dtype = cand[col]
        if col == "candid" or ptypes.is_string_dtype(dtype) \
                or ptypes.is_object_dtype(dtype):
            features[col] = Value("string")
        elif ptypes.is_bool_dtype(dtype):
            features[col] = Value("bool")
        elif ptypes.is_integer_dtype(dtype):
            features[col] = Value("int32")
        elif ptypes.is_float_dtype(dtype):
            features[col] = Value("float32")
        else:
            raise ValueError(
                f"Unknown dtype for column {col}: {cand[col].dtype}")

    data = cand.to_dict(orient="list")
    if "candid" in data:
        data["candid"] = [str(x) for x in data["candid"]]
    data["triplet"] = [np.asarray(t, dtype=np.float32) for t in triplets]
    return Dataset.from_dict(data, features=Features(features))


def convert_to_hf(split: str, version: str, data_dir: str = "data",
                  n_max: int = 100, out_dir: str | None = None):
    """File-based wrapper with the reference's naming (utils.py:115-146)."""
    import os

    import pandas as pd

    triplets = np.load(os.path.join(
        data_dir, f"{split}_triplets_{version}_N{n_max}.npy"))
    cand = pd.read_csv(os.path.join(
        data_dir, f"{split}_cand_{version}_N{n_max}.csv"))
    ds = dataset_from_arrays(triplets, cand)
    ds.save_to_disk(out_dir or os.path.join(
        data_dir, f"{split}_{version}_N{n_max}"))
    return ds
