"""Pack an image folder into a training zip (reference dataset_tool.py).

Input: a directory tree (or zip) of png/jpg images, optionally with a
``dataset.json`` labels manifest.  Output: a flat zip of PNGs named
``imgNNNNNNNN.png`` plus ``dataset.json`` — the format
``sherf_tpu.data.image_folder.ImageFolderDataset`` (and the reference's
training/dataset.py) consumes.

Transforms mirror the reference CLI: --resolution WxH with
--transform {copy,center-crop,center-crop-wide}.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import zipfile


def transform_image(img, transform: str, width: int, height: int):
    import numpy as np

    try:
        import cv2
        resize = lambda a, wh: cv2.resize(a, wh, interpolation=cv2.INTER_AREA)
    except ImportError:
        def resize(a, wh):
            ys = np.linspace(0, a.shape[0] - 1, wh[1]).astype(int)
            xs = np.linspace(0, a.shape[1] - 1, wh[0]).astype(int)
            return a[ys][:, xs]

    if transform == "copy":
        return img
    h, w = img.shape[:2]
    if transform == "center-crop":
        s = min(h, w)
        y0, x0 = (h - s) // 2, (w - s) // 2
        img = img[y0:y0 + s, x0:x0 + s]
        return resize(img, (width, height))
    if transform == "center-crop-wide":
        # crop to the target aspect ratio, then resize (dataset_tool.py
        # make_transform wide branch)
        target_ar = width / height
        ar = w / h
        if ar > target_ar:
            nw = int(round(h * target_ar))
            x0 = (w - nw) // 2
            img = img[:, x0:x0 + nw]
        else:
            nh = int(round(w / target_ar))
            y0 = (h - nh) // 2
            img = img[y0:y0 + nh]
        return resize(img, (width, height))
    raise ValueError(f"unknown transform {transform!r}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", required=True, help="input dir or zip")
    p.add_argument("--dest", required=True, help="output .zip")
    p.add_argument("--resolution", default=None,
                   help="WxH, e.g. 512x512 (default: keep)")
    p.add_argument("--transform", default="center-crop",
                   choices=["copy", "center-crop", "center-crop-wide"])
    p.add_argument("--max_images", type=int, default=None)
    a = p.parse_args(argv)

    import imageio.v2 as imageio
    import numpy as np

    from sherf_tpu.data.image_folder import ImageFolderDataset

    src = ImageFolderDataset(a.source, use_labels=True)
    width = height = None
    if a.resolution:
        width, height = (int(x) for x in a.resolution.lower().split("x"))

    n = len(src) if a.max_images is None else min(len(src), a.max_images)
    labels = []
    os.makedirs(os.path.dirname(os.path.abspath(a.dest)), exist_ok=True)
    with zipfile.ZipFile(a.dest, "w", zipfile.ZIP_STORED) as zf:
        for i in range(n):
            img, label = src[i]
            if width is not None:
                img = transform_image(img, a.transform, width, height)
            name = f"img{i:08d}.png"
            buf = io.BytesIO()
            imageio.imwrite(buf, np.asarray(img), format="png")
            zf.writestr(name, buf.getvalue())
            if label.size:
                labels.append([name, label.tolist()])
        zf.writestr("dataset.json",
                    json.dumps({"labels": labels or None}))
    print(f"wrote {n} images -> {a.dest}")


if __name__ == "__main__":
    main()
