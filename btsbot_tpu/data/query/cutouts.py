"""Archival color-image acquisition (PanSTARRS / Legacy Survey).

Covers `/root/reference/btsbot/query_data/query_color_cutouts.py`: the
alternative image modality where each object's ZTF triplet is replaced by an
archival color cutout — Legacy Survey 63px jpeg cutouts, or PanSTARRS 252px
jpegs 4×4-binned to 63px and max-normalized.  Download fan-out uses a
process pool; HTTP transport is injectable for offline tests.

File outputs keep the reference naming:
``{split}_{cand,triplets}_{version}{PS63|LS63}[nd]_N100.{csv,npy}``
(the "nd" variant drops objects with missing/empty archival images).
"""

from __future__ import annotations

import io
import os
from functools import partial
from multiprocessing import Pool, cpu_count

import numpy as np

PS_FILENAME_SERVICE = "https://ps1images.stsci.edu/cgi-bin/ps1filenames.py"
PS_CUTOUT_SERVICE = "https://ps1images.stsci.edu/cgi-bin/fitscut.cgi"
LS_CUTOUT_SERVICE = "https://www.legacysurvey.org/viewer/jpeg-cutout"


def _requests():
    import requests
    return requests


def _parse_ascii_table(text: str):
    """Whitespace-delimited ASCII table (header line + rows) → dict of
    column → list.  Covers the ps1filenames.py response format without an
    astropy dependency."""
    lines = [ln for ln in text.strip().splitlines() if ln.strip()]
    cols = lines[0].split()
    rows = [ln.split() for ln in lines[1:]]
    return {c: [r[i] for r in rows] for i, c in enumerate(cols)}


def get_ps_image_table(ra: float, dec: float, filters: str = "grizy",
                       session=None) -> dict:
    """PS1 stack images covering a position, as {column: list}
    (reference :20-36)."""
    session = session or _requests()
    r = session.get(PS_FILENAME_SERVICE,
                    params={"ra": ra, "dec": dec, "filters": filters})
    return _parse_ascii_table(r.text)


def get_ps_url(ra: float, dec: float, size: int = 252,
               im_format: str = "jpeg", output_size: int | None = None,
               session=None) -> str | None:
    """PS1 color-cutout URL with i/r/g mapped to red/green/blue
    (reference :39-71); None when a band is missing."""
    table = get_ps_image_table(ra, dec, session=session)
    filt = np.asarray(table["filter"])
    if not all(f in filt for f in ("g", "r", "i")):
        return None
    files = np.asarray(table["filename"])
    order = np.argsort(["irgzy".find(x) for x in filt])
    filt, files = filt[order], files[order]
    keep = np.isin(filt, ["g", "r", "i"])
    files = files[keep]
    url = (f"{PS_CUTOUT_SERVICE}?ra={ra}&dec={dec}&size={size}"
           f"&format={im_format}&output_size={output_size or size}")
    for i, param in enumerate(("red", "green", "blue")):
        url += f"&{param}={files[i]}"
    return url


def fetch_ls_image(ra: float, dec: float, session=None):
    """(63,63,3) Legacy Survey jpeg cutout + empty flag (reference :80-90,
    where an all-32 image means no coverage)."""
    from PIL import Image

    session = session or _requests()
    r = session.get(LS_CUTOUT_SERVICE, params={
        "ra": ra, "dec": dec, "size": 63, "layer": "ls-dr10",
        "pixscale": 1, "bands": "griy"})
    arr = np.array(Image.open(io.BytesIO(r.content)), dtype=np.float16)
    empty = bool(np.all(arr.flatten() == 32))
    return arr, empty


def fetch_ps_image(ra: float, dec: float, session=None):
    """(63,63,3) PanSTARRS color image: 252px jpeg → 4×4 mean-binned to
    63px → /max normalized (reference :92-107)."""
    from PIL import Image

    session = session or _requests()
    url = get_ps_url(ra, dec, size=252, im_format="jpeg", session=session)
    if url is None:
        return None, True
    r = session.get(url)
    arr = np.array(Image.open(io.BytesIO(r.content)).convert("RGB"))
    arr = arr.reshape(63, 4, 63, 4, 3).mean(axis=(1, 3)).astype(np.float32)
    arr = arr / arr.max()
    return arr, False


def download_image_batch(batch: list[dict], survey: str):
    """(objectId, image|None, missing) per source (reference :74-117)."""
    results = []
    for source in batch:
        try:
            if survey == "LS":
                img, empty = fetch_ls_image(source["ra"], source["dec"])
            elif survey == "PS":
                img, empty = fetch_ps_image(source["ra"], source["dec"])
            else:
                raise ValueError(f"Unknown survey: {survey}")
            results.append((source["objectId"], img, empty))
        except Exception as e:  # noqa: BLE001 — per-source robustness
            print(f"Error downloading image for {source['objectId']}: {e}")
            results.append((source["objectId"], None, True))
    return results


def query_images(cand, survey: str, max_workers: int | None = None):
    """Parallel per-object downloads; returns (cand with missing_{SURVEY}
    column, {objectId: image}) (reference :119-159)."""
    missing_col = f"missing_{survey.upper()}"
    cand = cand.copy()
    cand[missing_col] = False

    objs = cand[["objectId", "ra", "dec"]].drop_duplicates("objectId")
    max_workers = max_workers or min(cpu_count(), max(1, len(objs)))
    batch_size = max(1, len(objs) // (3 * max_workers))
    batches = [objs.iloc[i:i + batch_size].to_dict("records")
               for i in range(0, len(objs), batch_size)]

    img_cache: dict[str, np.ndarray] = {}
    with Pool(processes=max_workers) as pool:
        for result in pool.imap(partial(download_image_batch, survey=survey),
                                batches):
            for object_id, image, missing in result:
                if image is not None:
                    img_cache[object_id] = image
                # a failed/absent download returns (id, None, True) — it
                # must still be flagged, or the 'nd' variant silently keeps
                # the all-zero placeholder image for that object
                if missing:
                    cand.loc[cand["objectId"] == object_id,
                             missing_col] = True
    return cand, img_cache


def process_dataset(survey: str, split_to_process: str, version: str,
                    workers: int, data_dir: str = "data") -> None:
    """Per-split pipeline writing PS63/LS63 [nd] dataset variants
    (reference :162-199)."""
    import pandas as pd

    splits = (["train", "val", "test"] if split_to_process == "all"
              else [split_to_process])
    for split in splits:
        cand = pd.read_csv(
            os.path.join(data_dir, f"{split}_cand_{version}_N100.csv"),
            index_col=None)
        cand, img_cache = query_images(cand, survey, max_workers=workers)
        missing_col = f"missing_{survey.upper()}"
        suffix = f"{survey.upper()}63"

        imgs = np.zeros((len(cand), 63, 63, 3), dtype=np.float16)
        for idx in cand.index:
            oid = cand.loc[idx, "objectId"]
            if oid in img_cache:
                imgs[idx] = img_cache[oid]

        cand.to_csv(os.path.join(
            data_dir, f"{split}_cand_{version}{suffix}_N100.csv"), index=False)
        np.save(os.path.join(
            data_dir, f"{split}_triplets_{version}{suffix}_N100.npy"), imgs)

        keep = ~cand[missing_col].to_numpy()
        cand[keep].to_csv(os.path.join(
            data_dir, f"{split}_cand_{version}{suffix}nd_N100.csv"),
            index=False)
        np.save(os.path.join(
            data_dir, f"{split}_triplets_{version}{suffix}nd_N100.npy"),
            imgs[keep])
