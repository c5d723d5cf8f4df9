"""Download full COCO 2017 (images + YOLO-format labels) for training.

Reference analogue: scripts/train_modal.py:72-131 (`download_coco`). Images
come from images.cocodataset.org; YOLO-format labels from the ultralytics
coco2017labels bundle. Produces:

    <out>/images/train2017/*.jpg   <out>/labels/train2017/*.txt
    <out>/images/val2017/*.jpg     <out>/labels/val2017/*.txt

Then:
    python scripts/train.py --data <out>/images/train2017 \\
        --val <out>/images/val2017 --num-classes 80
"""

from __future__ import annotations

import argparse
import shutil
import urllib.request
import zipfile
from pathlib import Path

IMAGES_URL = "https://images.cocodataset.org/zips/{split}.zip"
LABELS_URL = ("https://github.com/ultralytics/yolov5/releases/download/"
              "v1.0/coco2017labels.zip")


def fetch_zip(url: str, dest_zip: Path, extract_to: Path) -> None:
    if not dest_zip.exists():
        print(f"downloading {url}")
        urllib.request.urlretrieve(url, dest_zip)
    print(f"extracting {dest_zip.name}")
    with zipfile.ZipFile(dest_zip) as zf:
        root = extract_to.resolve()
        for m in zf.namelist():  # refuse path-traversal members
            target = (extract_to / m).resolve()
            if root != target and root not in target.parents:
                raise ValueError(f"unsafe zip member: {m}")
        zf.extractall(extract_to)
    dest_zip.unlink()


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="data/coco")
    ap.add_argument("--splits", nargs="+", default=["train2017", "val2017"])
    args = ap.parse_args()

    out = Path(args.out)
    (out / "images").mkdir(parents=True, exist_ok=True)

    for split in args.splits:
        dest = out / "images" / split
        if dest.exists() and any(dest.glob("*.jpg")):
            print(f"{split} images already present")
            continue
        fetch_zip(IMAGES_URL.format(split=split), out / f"{split}.zip",
                  out / "images")

    if not (out / "labels").exists():
        fetch_zip(LABELS_URL, out / "coco2017labels.zip", out)
        nested = out / "coco" / "labels"
        if nested.exists():  # the bundle wraps everything in coco/
            shutil.move(str(nested), str(out / "labels"))
            shutil.rmtree(out / "coco", ignore_errors=True)

    for split in args.splits:
        n = len(list((out / "images" / split).glob("*.jpg")))
        print(f"{split}: {n} images")


if __name__ == "__main__":
    main()
