"""Dataset construction: cuts, per-object splits, merges, subsets.

Covers the reference's split/subset engine
(`/root/reference/btsbot/query_data/train_val_test_split.py`) with the same
file conventions and the same seeded randomness semantics, but operating on
in-memory (triplets, cand) pairs with explicit paths instead of hardcoded
``../data`` (reference wart, SURVEY.md §7) — thin file-based wrappers keep
the original entry points.

Semantics preserved (file:line refs into the reference):

* band/quality cuts ``only_pd_gr`` / ``only_pd_gr_ps`` (:6-30);
* per-OBJECT random 81/9/10 train/val/test assignment (:116-121,140);
* per-object random alert ordinals N (seeded, :133-137);
* rise-phase labeling jd ≤ jd_peak (:126-130);
* is_SN / near_threshold (18.4 < peak < 18.6) flags (:111-114,143-156);
* dims label-noise cut: drop peakmag ≤ 18.5 from the dims set (:158-161);
* subset capping by source_set (trues ≤ N_max_p train-only; dims/rejects ≤
  N_max_n; vars/junk = latest N_max_n by jd) and the cuts-string naming
  ``_N100/_Np../_sne/_nnt/_rt`` (:33-50,188-257);
* object-level percentage subsampling (:260-274).
"""

from __future__ import annotations

import os

import numpy as np

NON_SN_TYPES = [
    "AGN", "AGN?", "bogus", "bogus?", "duplicate", "nova", "rock", "star",
    "varstar", "QSO", "CV", "CV?", "CLAGN", "Blazar",
]


def _as_bool_isdiffpos(cand):
    import pandas as pd

    if not pd.api.types.is_bool_dtype(cand["isdiffpos"]):
        cand = cand.copy()
        cand["isdiffpos"] = cand["isdiffpos"].isin(["t", "T", "1", True, 1])
    return cand


def only_pd_gr(trips, cand):
    """Positive differences in g or r band (reference :6-12)."""
    cand = _as_bool_isdiffpos(cand)
    keep = cand["isdiffpos"] & cand["fid"].isin([1, 2])
    return trips[keep.to_numpy()], cand[keep]


def only_pd_gr_ps(trips, cand):
    """only_pd_gr + a valid PanSTARRS crossmatch (reference :15-30)."""
    cand = _as_bool_isdiffpos(cand)
    keep = (cand["isdiffpos"] & cand["fid"].isin([1, 2])
            & ((cand["sgscore1"] >= 0) | (cand["sgscore2"] >= 0)))
    return trips[keep.to_numpy()], cand[keep]


def create_cuts_str(N_max_p: int, N_max_n: int, sne_only: bool,
                    keep_near_threshold: bool, rise_only: bool) -> str:
    cuts = ""
    if N_max_p:
        if N_max_p == N_max_n:
            cuts += f"_N{N_max_p}"
        else:
            cuts += f"_Np{N_max_p}"
            if N_max_n:
                cuts += f"n{N_max_n}"
    if sne_only:
        cuts += "_sne"
    if not keep_near_threshold:
        cuts += "_nnt"
    if rise_only:
        cuts += "_rt"
    return cuts


def assign_splits(
    trips: np.ndarray,
    cand,
    set_name: str,
    cuts=None,
    seed: int = 2,
    dims_types=None,
):
    """Apply cuts, assign per-object splits/N ordinals/flags.  Returns
    (trips, cand) with columns source_set/N/split/is_SN/near_threshold/
    is_rise added (reference :86-161)."""
    import pandas as pd

    if cuts is not None:
        trips, cand = cuts(trips, cand)
    cand = cand.reset_index(drop=True)
    cand["source_set"] = set_name
    cand["N"] = 0
    cand["split"] = ""
    cand["is_SN"] = set_name in ("trues", "extIas")
    cand["near_threshold"] = (cand["peakmag"] > 18.4) & (cand["peakmag"] < 18.6)
    cand["is_rise"] = False

    objs = pd.unique(cand["objectId"])
    np.random.seed(seed)
    splits = np.random.choice(["train", "val", "test"], size=len(objs),
                              p=[0.81, 0.09, 0.10])

    for i, objid in enumerate(objs):
        sel = cand["objectId"] == objid
        obj = cand[sel]

        # rise alerts: everything at or before the global peak (min magpsf)
        jd_peak = obj["jd"].iloc[int(np.argmin(obj["magpsf"].to_numpy()))]
        cand.loc[sel & (cand["jd"] <= jd_peak), "is_rise"] = True

        # seeded per-object random alert ordinals 1..N_tot
        np.random.seed(seed)
        cand.loc[sel, "N"] = np.random.choice(
            np.arange(1, len(obj) + 1), size=len(obj), replace=False)
        cand.loc[sel, "split"] = splits[i]

    if set_name == "dims":
        if dims_types is not None:
            sn_ids = dims_types.loc[
                ~dims_types["type"].isin(NON_SN_TYPES), "ZTFID"].to_numpy()
            cand.loc[cand["objectId"].isin(sn_ids), "is_SN"] = True
        # label-noise cut: keep only genuinely dim sources (reference :158-161)
        keep = (cand["peakmag"] > 18.5).to_numpy()
        trips = trips[keep]
        cand = cand[keep].reset_index(drop=True)

    return trips, cand


def split_apart(trips, cand):
    """{'train'|'val'|'test': (trips, cand)} by the split column."""
    out = {}
    for split in ("train", "val", "test"):
        idx = cand.index[cand["split"] == split].to_numpy()
        out[split] = (trips[idx], cand.loc[idx].reset_index(drop=True))
    return out


def merge_sets(parts, seed: int = 2):
    """Concatenate (trips, cand) pairs and shuffle rows together
    (reference :53-83)."""
    import pandas as pd

    trips = np.concatenate([t for t, _ in parts], axis=0)
    cand = pd.concat([c for _, c in parts]).reset_index(drop=True)
    np.random.seed(seed)
    order = np.random.choice(np.arange(len(cand)), size=len(cand),
                             replace=False)
    return trips[order], cand.loc[order].reset_index(drop=True)


def create_subset(
    trips: np.ndarray,
    cand,
    split_name: str,
    N_max_p: int,
    N_max_n: int = 0,
    sne_only: bool = False,
    keep_near_threshold: bool = True,
    rise_only: bool = False,
):
    """Cap alerts per object by source_set and apply flag cuts
    (reference :188-257).  Returns (trips, cand, cuts_str)."""
    import pandas as pd

    if N_max_p and not N_max_n:
        N_max_n = N_max_p
    cuts_str = create_cuts_str(N_max_p, N_max_n, sne_only,
                               keep_near_threshold, rise_only)

    if N_max_p:
        mask = np.zeros(len(cand), dtype=bool)
        for objid in pd.unique(cand["objectId"]):
            obj = cand.loc[cand["objectId"] == objid]
            source_set = obj["source_set"].iloc[0]
            if split_name == "train":
                if source_set == "trues":
                    mask[obj.index] = obj["N"] <= N_max_p
                elif source_set in ("dims", "rejects"):
                    mask[obj.index] = obj["N"] <= N_max_n
            elif source_set in ("trues", "dims", "rejects"):
                mask[obj.index] = True
            if source_set in ("vars", "junk"):
                latest = obj.sort_values(by="jd").iloc[-N_max_n:]
                mask[latest.index] = True
        trips = trips[mask]
        cand = cand[mask].reset_index(drop=True)

    selections = []
    if sne_only:
        selections.append(lambda c: c["is_SN"].to_numpy())
    if not keep_near_threshold:
        selections.append(lambda c: ~c["near_threshold"].to_numpy())
    if rise_only:
        selections.append(lambda c: c["is_rise"].to_numpy())
    for select in selections:
        sel = select(cand)
        trips = trips[sel]
        cand = cand[sel].reset_index(drop=True)

    return trips, cand, cuts_str


def subsample_objects(trips, cand, perc_to_keep: float = 10,
                      seed: int = 2):
    """Random object-level subsample (reference :260-274)."""
    import pandas as pd

    np.random.seed(seed)
    objs = pd.unique(cand["objectId"])
    keep_objs = np.random.choice(
        objs, size=int(len(objs) * perc_to_keep / 100), replace=False)
    sel = cand["objectId"].isin(keep_objs).to_numpy()
    return trips[sel], cand[sel].reset_index(drop=True)


# ------------------------- file-based wrappers ----------------------------

def build_dataset_files(
    base_dir: str,
    out_dir: str,
    set_names,
    version_name: str,
    cuts=only_pd_gr_ps,
    seed: int = 2,
    N_max_p: int = 100,
    N_max_n: int = 100,
):
    """End-to-end file pipeline: per-set split assignment → per-split merge →
    N-capped subsets, using the reference's file naming
    (``{split}_{cand,triplets}_{version}{cuts}.{csv,npy}``)."""
    import pandas as pd

    per_split: dict[str, list] = {"train": [], "val": [], "test": []}
    for set_name in set_names:
        trips = np.load(os.path.join(base_dir, f"{set_name}_triplets.npy"))
        cand = pd.read_csv(
            os.path.join(base_dir, f"{set_name}_candidates.csv"),
            index_col=False)
        dims_types = None
        dims_csv = os.path.join(base_dir, "dims.csv")
        if set_name == "dims" and os.path.exists(dims_csv):
            dims_types = pd.read_csv(dims_csv)
        trips, cand = assign_splits(trips, cand, set_name, cuts=cuts,
                                    seed=seed, dims_types=dims_types)
        for split, pair in split_apart(trips, cand).items():
            per_split[split].append(pair)

    os.makedirs(out_dir, exist_ok=True)
    for split, parts in per_split.items():
        trips, cand = merge_sets(parts, seed=seed)
        np.save(os.path.join(out_dir, f"{split}_triplets_{version_name}.npy"),
                trips)
        cand.to_csv(os.path.join(out_dir, f"{split}_cand_{version_name}.csv"),
                    index=False)
        s_trips, s_cand, cuts_str = create_subset(
            trips, cand, split, N_max_p=N_max_p, N_max_n=N_max_n)
        np.save(os.path.join(
            out_dir, f"{split}_triplets_{version_name}{cuts_str}.npy"),
            s_trips)
        s_cand.to_csv(os.path.join(
            out_dir, f"{split}_cand_{version_name}{cuts_str}.csv"),
            index=False)
