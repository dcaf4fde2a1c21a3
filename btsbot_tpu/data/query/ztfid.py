"""Training-set source-list compilation (ZTFIDs).

Covers `/root/reference/btsbot/query_data/compile_ZTFIDs.py`: BTS Sample
Explorer queries for trues/vars/dims, Fritz API pagination for rejects,
BTS save-time queries, the external-Ia list, cross-set dedup, and the
hand-curated exclusion list.  HTTP transport is injectable (any
requests-compatible session) so the logic is testable offline; credentials
come from the same env vars as the reference (FRITZ_API_KEY,
BTSSE_USER/BTSSE_PASS — compile_ZTFIDs.py:45-54).
"""

from __future__ import annotations

import os
import time

import numpy as np

FRITZ_HOST = "https://fritz.science"
BTSSE_EXPLORER = "http://sites.astro.caltech.edu/ztf/rcf/explorer.php"

# Predefined BTS Sample Explorer queries (compile_ZTFIDs.py:9-43): saved
# sources before 2025-01-01; trues = transients peaking ≤ 18.5 mag,
# vars = variables, dims = everything peaking > 18.5.
_COMMON = {
    "f": "s", "coverage": "any", "samprcf": "y", "sampdeep": "y",
    "refok": "y", "ztflink": "fritz", "endsavedate": "2025-01-01",
    "sort": "peakmag", "format": "csv",
}
BTSSE_QUERY_PARAMS = {
    "trues": {**_COMMON, "subsample": "trans", "purity": "y",
              "endpeakmag": "18.5"},
    "vars": {**_COMMON, "subsample": "var"},
    "dims": {**_COMMON, "subsample": "all", "purity": "y", "covok": "y",
             "startpeakmag": "18.5"},
}

# Hand-curated exclusions: mixed labels or transient-in-reference
# (compile_ZTFIDs.py:338-342).
OBJS_TO_REMOVE = [
    "ZTF18abdiasx", "ZTF21abyazip", "ZTF18aaadqua", "ZTF18aarrwmi",
    "ZTF18aazijke", "ZTF18abncsdn", "ZTF18aaslhxt", "ZTF18aamigmk",
    "ZTF18abdpvnd", "ZTF18aaqffyp",
]

RCF_GROUP_ID = "41"
RCF_JUNK_GROUP_ID = "255"


def _session(session=None):
    if session is not None:
        return session
    import requests
    return requests


def iso_to_jd(iso: str) -> float:
    """ISO-8601 UTC timestamp → Julian Date (astropy-free)."""
    from datetime import datetime, timezone

    dt = datetime.fromisoformat(iso.replace("Z", "+00:00"))
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.timestamp() / 86400.0 + 2440587.5


def fritz_headers():
    key = os.environ.get("FRITZ_API_KEY")
    return {"Authorization": f"token {key}"} if key else None


def query_btsse(query_name: str, out_path: str, session=None,
                auth=None) -> None:
    """Fetch one explorer CSV (compile_ZTFIDs.py:178-203)."""
    auth = auth or (os.environ.get("BTSSE_USER"),
                    os.environ.get("BTSSE_PASS"))
    r = _session(session).get(BTSSE_EXPLORER,
                              params=BTSSE_QUERY_PARAMS[query_name],
                              auth=auth)
    with open(out_path, "w") as f:
        f.write(r.text)


def query_rejects(session=None, headers=None,
                  start_date: str = "2021-01-01",
                  end_date: str = "2023-01-01",
                  sleep: float = 2.0) -> list[str]:
    """Paginated Fritz candidates query for BTS candidates never saved to
    RCF/RCFJunk, with the reference's page-size-halving retry on
    out-of-range responses (compile_ZTFIDs.py:60-131)."""
    session = _session(session)
    headers = headers or fritz_headers()
    endpoint = FRITZ_HOST + "/api/candidates"

    objids: list[str] = []
    page_num = 1
    num_per_page = 250
    while True:
        r = session.get(endpoint, headers=headers, params={
            "savedStatus": "notSavedToAnySelected",
            "startDate": start_date,
            "endDate": end_date,
            "groupIDs": f"{RCF_GROUP_ID},{RCF_JUNK_GROUP_ID}",
            "numPerPage": num_per_page,
            "pageNumber": page_num,
        })
        if "out of range" in r.text:
            if num_per_page == 1:
                break
            num_per_page //= 2
            continue
        candidates = r.json()["data"]["candidates"]
        new = [c["id"] for c in candidates if c["id"] not in objids]
        if not new:
            break
        objids += new
        page_num += 1
        if sleep:
            time.sleep(sleep)
    return objids


def query_bts_save_times(trues, session=None, headers=None,
                         sleep: float = 0.2):
    """Fill the RCF_save_time column (JD of save to the RCF group) for each
    true (compile_ZTFIDs.py:134-171).  Modifies and returns the frame."""
    session = _session(session)
    headers = headers or fritz_headers()
    if "RCF_save_time" not in trues.columns:
        trues["RCF_save_time"] = -1.0

    for i in trues.index:
        if trues.loc[i, "RCF_save_time"] > 0:
            continue
        objid = trues.loc[i, "ZTFID"]
        r = session.get(f"{FRITZ_HOST}/api/sources/{objid}", headers=headers,
                        params={})
        if not r.ok:
            continue
        for group in r.json()["data"]["groups"]:
            if group["name"] == "Redshift Completeness Factor":
                trues.loc[i, "RCF_save_time"] = iso_to_jd(group["saved_at"])
        if sleep:
            time.sleep(sleep)
    return trues


def load_external_ias(path: str, all_ztfids: np.ndarray):
    """External Type-Ia list, deduped (compile_ZTFIDs.py:242-272)."""
    import pandas as pd

    ext = pd.read_csv(path).rename(columns={"ztfname": "ZTFID"})
    ext = ext[ext["ZTFID"].astype(str).str.contains("ZTF")]
    ext = ext[~ext["ZTFID"].isin(all_ztfids)]
    return ext, np.concatenate([all_ztfids, ext["ZTFID"].to_numpy()])


def compile_ztfids(base_dir: str = "data/base_data",
                   overwrite: bool = False, session=None) -> None:
    """Build the full training-set object lists (compile_ZTFIDs.py:311-351):
    trues/vars/dims from BTSSE, rejects from Fritz, dedup across sets,
    apply the exclusion list, write ``{name}.csv`` files."""
    import pandas as pd

    os.makedirs(base_dir, exist_ok=True)
    all_ztfids = np.array((), dtype=object)
    frames = {}

    for name in ("trues", "vars", "dims"):
        path = os.path.join(base_dir, f"{name}.csv")
        if overwrite or not os.path.exists(path):
            query_btsse(name, path, session=session)
        df = pd.read_csv(path, index_col=None)
        df = df[~df["type"].isin(["duplicate", "duplicate?"])]
        df = df[~df["ZTFID"].isin(all_ztfids)]
        all_ztfids = np.concatenate([all_ztfids, df["ZTFID"].to_numpy()])
        frames[name] = df

    rej_path = os.path.join(base_dir, "rejects.csv")
    if overwrite or not os.path.exists(rej_path):
        pd.DataFrame(query_rejects(session=session),
                     columns=["ZTFID"]).to_csv(rej_path, index=None)
    rejects = pd.read_csv(rej_path, index_col=None)
    rejects = rejects[~rejects["ZTFID"].isin(all_ztfids)]
    all_ztfids = np.concatenate([all_ztfids, rejects["ZTFID"].to_numpy()])
    frames["rejects"] = rejects

    for name in list(frames):
        # keep the filtered frame — trues.csv is rewritten below from
        # frames["trues"], which must not resurrect the excluded objects
        frames[name] = frames[name][
            ~frames[name]["ZTFID"].isin(OBJS_TO_REMOVE)]
        frames[name].to_csv(os.path.join(base_dir, f"{name}.csv"),
                            index=None)

    if "RCF_save_time" not in frames["trues"].columns or overwrite:
        trues = query_bts_save_times(frames["trues"], session=session)
        trues.to_csv(os.path.join(base_dir, "trues.csv"), index=None)
