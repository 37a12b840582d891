"""Pix3D evaluation set (9 categories, JSON metadata, fixed intrinsics).

Mirrors reference ``data/pix3d.py``: images/masks under ``*_processed``,
pose = R composed with t=(0, 0, 1.78), intrinsics f=1.3875, GT point clouds
under ``pointclouds/``.
"""

from __future__ import annotations

import json
import os
import warnings

import numpy as np
import PIL.Image

from zeroshape_tpu.data import base, common

CAT_ID_ALL = dict(
    bed="bed", bookcase="bookcase", chair="chair", desk="desk", misc="misc",
    sofa="sofa", table="table", tool="tool", wardrobe="wardrobe",
)


class Pix3DDataset(base.Dataset):
    """``load_3D`` is a deliberate superset of the reference (whose Pix3D
    loads the GT point cloud unconditionally): passing ``load_3D=False``
    skips the ``dpc`` key for depth-only workflows, so any caller that will
    evaluate Chamfer must construct the dataset with ``load_3D=True`` (the
    default, and what the engines do)."""

    def __init__(self, opt, split="test", load_3D=True):
        super().__init__(opt, split)
        self.path = os.path.join(opt.data.get("root", "data"), "Pix3D")
        self.load_3D = load_3D
        self.max_imgs = (
            opt.data.get("max_img_cat") if opt.data.get("max_img_cat") is not None else np.inf
        )
        cat_sel = opt.data.pix3d.get("cat")
        self.cat_id = (
            list(CAT_ID_ALL.values())
            if cat_sel is None
            else [v for k, v in CAT_ID_ALL.items() if k in cat_sel.split(",")]
        )
        self.cat2label = {c: i for i, c in enumerate(self.cat_id)}
        self.label2cat = [
            next(k for k, v in CAT_ID_ALL.items() if v == c) for c in self.cat_id
        ]
        self.list = self.get_list(opt, split)

    def get_list(self, opt, split):
        cads = []
        for c in self.cat_id:
            list_fname = os.path.join(self.path, "lists", f"{c}_{split}.txt")
            for i, m in enumerate(open(list_fname).read().splitlines()):
                if i >= self.max_imgs:
                    break
                cads.append((c, m))
        return cads

    def id_filename_mapping(self, opt, outpath):
        with open(outpath, "w") as outfile:
            for i in range(len(self.list)):
                meta = self.get_metadata(opt, i)
                image_fname = f"{self.path}/{meta['img_path']}"
                mask_fname = f"{self.path}/{meta['mask_path']}"
                pc_fname = f"{self.path}/pointclouds/" + meta["cad_path"][6:]
                pc_fname = pc_fname.replace(".obj", ".npy")
                outfile.write(f"{i} {image_fname} {mask_fname} {pc_fname}\n")

    def get_metadata(self, opt, idx):
        c, name = self.list[idx]
        meta = json.load(
            open(os.path.join(self.path, "annotation", c, name + ".json"), encoding="utf-8")
        )
        return {
            "img_path": meta["img"].replace("img", "img_processed"),
            "mask_path": meta["mask"].replace("mask", "mask_processed"),
            "cad_path": meta["model"],
            "R": np.asarray(meta["rot_mat"], np.float32),
        }

    def __getitem__(self, idx):
        opt = self.opt
        c, _ = self.list[idx]
        meta = self.get_metadata(opt, idx)
        sample = {"idx": np.int64(idx), "category_label": np.int64(self.cat2label[c])}

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            image = PIL.Image.open(os.path.join(self.path, meta["img_path"])).convert("RGB")
        mask = PIL.Image.open(os.path.join(self.path, meta["mask_path"])).convert("L")
        image = image.resize((opt.W, opt.H))
        mask = mask.resize((opt.W, opt.H))
        rgb = common.to_float_chw_free(image)
        m = (common.to_float_chw_free(mask) > 0.5).astype(np.float32)
        if opt.data.get("bgcolor") is not None:
            rgb = rgb * m + opt.data.bgcolor * (1 - m)
        sample["rgb_input_map"] = rgb
        sample["mask_input_map"] = m

        # pose = compose(R, t=(0,0,1.78)); fixed intrinsics (pix3d.py:140-148)
        pose = np.concatenate(
            [meta["R"], np.array([[0.0], [0.0], [1.78]], np.float32)], axis=1
        )
        sample["pose_gt"] = pose.astype(np.float32)
        sample["intr"] = common.fixed_intrinsics(opt.H, opt.W)

        if self.load_3D:
            pc_fname = os.path.join(
                self.path, "pointclouds", meta["cad_path"][6:]
            ).replace(".obj", ".npy")
            pc = np.load(pc_fname).astype(np.float32)
            sample["dpc"] = {"points": pc}
        return sample

    def __len__(self):
        return len(self.list)


Dataset = Pix3DDataset
