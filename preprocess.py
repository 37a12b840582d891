"""Preprocessing CLI: background removal -> recentered square RGBA + mask.

``python preprocess.py --indir=raw_images --outdir=my_examples``

Reference parity (preprocess.py:21-88): segment the salient object, crop a
1.2x square around it, resize to 224, write ``images/`` + ``masks/``.
Segmentation backend: rembg when installed; otherwise a cv2 GrabCut
fallback seeded from the image border (rembg is an optional dependency with
network-downloaded weights, so the fallback keeps the CLI usable offline).
"""

import argparse
import os

import numpy as np
import PIL.Image

from zeroshape_tpu.data import common


def segment_rembg(img: "PIL.Image.Image"):
    from rembg import remove

    out = remove(img)
    return np.asarray(out)[..., 3]


def segment_grabcut(img: "PIL.Image.Image", iters=5):
    import cv2

    arr = np.asarray(img.convert("RGB"))[:, :, ::-1].copy()
    mask = np.zeros(arr.shape[:2], np.uint8)
    h, w = mask.shape
    rect = (int(w * 0.05), int(h * 0.05), int(w * 0.9), int(h * 0.9))
    bgd, fgd = np.zeros((1, 65), np.float64), np.zeros((1, 65), np.float64)
    cv2.grabCut(arr, mask, rect, bgd, fgd, iters, cv2.GC_INIT_WITH_RECT)
    fg = np.where((mask == cv2.GC_FGD) | (mask == cv2.GC_PR_FGD), 255, 0)
    return fg.astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--indir", required=True)
    ap.add_argument("--outdir", default="my_examples")
    ap.add_argument("--size", type=int, default=224)
    args = ap.parse_args()

    os.makedirs(os.path.join(args.outdir, "images"), exist_ok=True)
    os.makedirs(os.path.join(args.outdir, "masks"), exist_ok=True)

    try:
        import rembg  # noqa: F401

        segment = segment_rembg
        print("using rembg for background removal")
    except ImportError:
        segment = segment_grabcut
        print("rembg not installed; using cv2 GrabCut fallback")

    names = [n for n in sorted(os.listdir(args.indir)) if n.lower().endswith((".png", ".jpg", ".jpeg"))]
    for name in names:
        img = PIL.Image.open(os.path.join(args.indir, name)).convert("RGB")
        alpha = segment(img)
        mask = (alpha > 127).astype(np.float32)
        bbox = common.get_bbox_from_mask(mask, 0.5)
        if bbox is None:
            print(f"skipping {name}: empty mask")
            continue
        rgba = PIL.Image.merge(
            "RGBA", (*img.split(), PIL.Image.fromarray((mask * 255).astype(np.uint8)))
        )
        crop = common.square_crop(rgba, bbox)
        crop = crop.resize((args.size, args.size))
        out = np.asarray(crop)
        stem = os.path.splitext(name)[0]
        PIL.Image.fromarray(out[..., :3]).save(
            os.path.join(args.outdir, "images", stem + ".png")
        )
        PIL.Image.fromarray(out[..., 3]).save(
            os.path.join(args.outdir, "masks", stem + ".png")
        )
        print(f"processed {name}")
    print(f"wrote {args.outdir}/images and {args.outdir}/masks")


if __name__ == "__main__":
    main()
