"""Download Pascal VOC 2007+2012 and convert to the YOLO layout.

Reference analogue: scripts/train_modal.py:185-283 (`download_voc`). The
conversion itself lives in yolo_re_tpu/data/voc.py so it works offline on an
already-extracted VOCdevkit (--devkit).

Example:
    python scripts/prepare_voc.py --out data/voc              # download+convert
    python scripts/prepare_voc.py --devkit /x/VOCdevkit --out data/voc
Then:
    python scripts/train.py --data data/voc/images/train \\
        --val data/voc/images/val --num-classes 20
"""

from __future__ import annotations

import argparse
import os
import sys
import tarfile
import urllib.request
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolo_re_tpu.data.voc import convert_voc_devkit  # noqa: E402

VOC_URLS = [
    "http://host.robots.ox.ac.uk/pascal/VOC/voc2012/VOCtrainval_11-May-2012.tar",
    "http://host.robots.ox.ac.uk/pascal/VOC/voc2007/VOCtrainval_06-Nov-2007.tar",
    "http://host.robots.ox.ac.uk/pascal/VOC/voc2007/VOCtest_06-Nov-2007.tar",
]


def download_and_extract(out: Path) -> Path:
    out.mkdir(parents=True, exist_ok=True)
    for url in VOC_URLS:
        name = url.rsplit("/", 1)[-1]
        marker = out / f".{name}.done"
        if marker.exists():
            continue
        tar_path = out / name
        if not tar_path.exists():
            print(f"downloading {url}")
            urllib.request.urlretrieve(url, tar_path)
        print(f"extracting {name}")
        with tarfile.open(tar_path) as tf:
            # The mirrors serve plain http; refuse path-traversal members.
            tf.extractall(out, filter="data")
        tar_path.unlink()
        marker.touch()
    return out / "VOCdevkit"


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="data/voc",
                    help="output dataset root (images/ + labels/)")
    ap.add_argument("--devkit", default=None,
                    help="existing extracted VOCdevkit dir (skips download)")
    ap.add_argument("--symlink", action="store_true",
                    help="symlink images instead of copying")
    args = ap.parse_args()

    out = Path(args.out)
    devkit = Path(args.devkit) if args.devkit else download_and_extract(out)
    if not devkit.exists():
        raise SystemExit(f"VOCdevkit not found at {devkit}")
    train_dir, val_dir = convert_voc_devkit(devkit, out,
                                            copy_images=not args.symlink)
    print(f"train: {train_dir}\nval:   {val_dir}")


if __name__ == "__main__":
    main()
