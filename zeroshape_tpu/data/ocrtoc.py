"""OCRTOC evaluation set (every-5th-image subsample, eroded depth masks).

Mirrors reference ``data/ocrtoc.py``.
"""

from __future__ import annotations

import os

import numpy as np

from zeroshape_tpu.data import base, common


class OcrtocDataset(base.Dataset):
    dataset_dir = "Ocrtoc"
    subsample_every = 5
    has_erode = True
    depth_dirname = "depth_np"

    def __init__(self, opt, split="test", load_3D=True):
        super().__init__(opt, split)
        self.path = os.path.join(opt.data.get("root", "data"), self.dataset_dir)
        self.load_3D = load_3D
        self.cat_names = [
            name[:-10]
            for name in sorted(os.listdir(os.path.join(self.path, "lists")))
            if name.endswith("_test.list")
        ]
        self.cat2label = {c: i for i, c in enumerate(self.cat_names)}
        self.label2cat = self.cat_names
        # evaluation-only set: the reference ships no train/val lists
        assert split == "test", f"{type(self).__name__} only has a test split, got {split!r}"
        self.list = self.get_list(opt, split)

    def get_list(self, opt, split):
        cads = []
        for c in self.cat_names:
            list_fname = os.path.join(self.path, "lists", f"{c}_{split}.list")
            for i, image_name in enumerate(open(list_fname).read().splitlines()):
                if i % self.subsample_every == 0:
                    cads.append((c, image_name.split(".")[0]))
        return cads

    def id_filename_mapping(self, opt, outpath):
        with open(outpath, "w") as outfile:
            for i, (category, name) in enumerate(self.list):
                image_fname = f"{self.path}/images_processed/{category}/{name}.png"
                mask_fname = f"{self.path}/masks_processed/{category}/{name}.png"
                # NOTE: the per-view name, though pointclouds are stored
                # per-object (get_pointcloud strips the view suffix) — kept
                # verbatim for data_list.txt format parity with the
                # reference, which writes the same path (data/ocrtoc.py:51)
                pc_fname = f"{self.path}/pointclouds/{category}/{name}.npy"
                outfile.write(f"{i} {image_fname} {mask_fname} {pc_fname}\n")

    def get_camera(self, idx):
        category, name = self.list[idx]
        Rt = np.load(
            os.path.join(self.path, "camera_data", "extr", category, name + ".npy")
        ).astype(np.float32)
        K = common.fixed_intrinsics(self.opt.H, self.opt.W)
        return K, Rt

    def get_depth(self, idx):
        category, name = self.list[idx]
        depth = common.load_npy_f32(
            os.path.join(self.path, self.depth_dirname, category, name + ".npy")
        ).astype(np.float32)[..., None]
        assert depth.shape[0] == self.opt.H
        mask = (depth != 0).astype(np.float32)
        return depth, mask

    def get_pointcloud(self, idx):
        category, name = self.list[idx]
        pc_name = "_".join(name.split("_")[:-1])
        pc = np.load(
            os.path.join(self.path, "pointclouds", category, pc_name + ".npy")
        ).astype(np.float32)
        return {"points": pc}

    def __getitem__(self, idx):
        opt = self.opt
        category, _ = self.list[idx]
        sample = {"idx": np.int64(idx), "category_label": np.int64(self.cat2label[category])}

        K, Rt = self.get_camera(idx)
        sample["pose_gt"] = common.pose_from_Rt(Rt)
        sample["intr"] = K

        category, name = self.list[idx]
        rgb = common.load_rgb(
            os.path.join(self.path, "images_processed", category, name + ".png"),
            out_hw=(opt.H, opt.W),
        )
        depth, mask = self.get_depth(idx)
        if opt.data.get("bgcolor") is not None:
            rgb = rgb * mask + opt.data.bgcolor * (1 - mask)
        sample["rgb_input_map"] = rgb
        sample["mask_input_map"] = mask
        sample["depth_input_map"] = depth

        erode = self.has_erode and opt.data.get("ocrtoc", {}).get("erode_mask")
        if erode:
            sample["mask_eroded"] = common.erode_mask_np(mask[..., 0], erode)[..., None]

        if self.load_3D:
            sample["dpc"] = self.get_pointcloud(idx)
        return sample

    def __len__(self):
        return len(self.list)


Dataset = OcrtocDataset
