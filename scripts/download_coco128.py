"""Download and restructure the COCO128 smoke-test dataset.

Reference analogue: scripts/download_coco128.py. Produces:
    <out>/images/train/*.jpg
    <out>/labels/train/*.txt
"""

from __future__ import annotations

import argparse
import shutil
import urllib.request
import zipfile
from pathlib import Path

URL = "https://github.com/ultralytics/assets/releases/download/v0.0.0/coco128.zip"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/coco128")
    ap.add_argument("--url", default=URL)
    args = ap.parse_args()

    out = Path(args.out)
    if (out / "images" / "train").exists():
        print(f"{out} already exists")
        return
    out.parent.mkdir(parents=True, exist_ok=True)

    zip_path = out.parent / "coco128.zip"
    if not zip_path.exists():
        print(f"downloading {args.url} ...")
        urllib.request.urlretrieve(args.url, zip_path)

    with zipfile.ZipFile(zip_path) as zf:
        for m in zf.namelist():  # refuse path-traversal members
            target = (out.parent / m).resolve()
            if not str(target).startswith(str(out.parent.resolve())):
                raise ValueError(f"unsafe zip member: {m}")
        zf.extractall(out.parent)

    src = out.parent / "coco128"
    # restructure train2017 -> train
    for kind in ("images", "labels"):
        t2017 = src / kind / "train2017"
        if t2017.exists():
            target = out / kind / "train"
            target.parent.mkdir(parents=True, exist_ok=True)
            if src != out:
                shutil.move(str(t2017), str(target))
            else:
                t2017.rename(target)
    if src != out and src.exists():
        shutil.rmtree(src, ignore_errors=True)
    print(f"done -> {out}")


if __name__ == "__main__":
    main()
