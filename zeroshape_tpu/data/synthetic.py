"""Synthetic training set (Objaverse-LVIS + ShapeNet55 renders).

Mirrors the reference ``data/synthetic.py`` file layout exactly — per-subset
``lists/{cat}_{split}.list``, ``images_processed/``, ``masks/``, ``depth/``,
``camera_data/{intr,extr}/``, ``pointclouds/``, ``gt_sdf/`` — producing NHWC
numpy samples. The GT SDF offset of -0.003 (synthetic.py:123) and the
10-image-per-category validation cap (synthetic.py:29-31) are preserved.
"""

from __future__ import annotations

import os

import numpy as np

from zeroshape_tpu.data import base, common


class SyntheticDataset(base.Dataset):
    def __init__(self, opt, split="train", load_3D=True):
        if split == "test":
            split = "val"
        super().__init__(opt, split)
        self.path = os.path.join(opt.data.get("root", "data"), "train_data")
        self.load_3D = load_3D
        self.subsets = opt.data.synthetic.subset.split(",")
        self.category_dict = {}
        self.category_list = []
        for subset in self.subsets:
            lists_dir = os.path.join(self.path, subset, "lists")
            categories = [
                name[:-11]
                for name in sorted(os.listdir(lists_dir))
                if name.endswith("_train.list")
            ]
            self.category_dict[subset] = categories
            self.category_list += categories

        if split == "val":
            self.max_imgs = 10
            self.data_percentage = 1
        else:
            self.max_imgs = np.inf
            self.data_percentage = opt.data.synthetic.get("percentage", 1)

        self.cat2label = {cat: i for i, cat in enumerate(self.category_list)}
        self.label2cat = list(self.category_list)
        self.list = self.get_list(opt, split)
        self.seed = opt.get("seed", 0) or 0

    def get_list(self, opt, split):
        """Enumerate (subset, category, object, sample) sample keys.

        The on-disk layout is fixed by the reference's released data
        (data/synthetic.py:50-77): ``{subset}/lists/{cat}_{split}.list``
        holds one ``{cat}_{object}_{sample}.png`` name per line; the
        ``data.synthetic.percentage`` prefix and the per-category val cap
        (``max_imgs``) are applied in that order.
        """
        entries = []
        for subset in self.subsets:
            lists_dir = os.path.join(self.path, subset, "lists")
            for cat in self.category_dict[subset]:
                list_fname = os.path.join(lists_dir, f"{cat}_{split}.list")
                if not os.path.isfile(list_fname):
                    continue
                with open(list_fname) as fh:
                    stems = [ln.rsplit(".", 1)[0] for ln in fh.read().splitlines() if ln]
                stems = stems[: round(self.data_percentage * len(stems))]
                if len(stems) > self.max_imgs:
                    stems = stems[: int(self.max_imgs)]
                for stem in stems:
                    # "{cat}_{object}_{sample}": the category prefix is
                    # known, so strip it exactly; the object name itself may
                    # contain underscores (e.g. analytic "box_sphere4",
                    # objaverse asset ids), so only the final "_{sample}"
                    # splits off the right
                    assert stem.startswith(cat + "_"), (stem, cat)
                    object_name, sample_id = stem[len(cat) + 1:].rsplit("_", 1)
                    entries.append((subset, cat, object_name, sample_id))
        return entries

    def id_filename_mapping(self, opt, outpath):
        """Write the ``data_list.txt`` index -> file paths mapping that
        evaluate.py emits (reference evaluate.py:16-17)."""
        with open(outpath, "w") as outfile:
            for i, (subset, category, object_name, sample_id) in enumerate(self.list):
                stem = f"{category}/{category}_{object_name}_{sample_id}"
                image = os.path.join(self.path, subset, "images_processed", stem + ".png")
                mask = os.path.join(self.path, subset, "masks", stem + ".png")
                pc = os.path.join(
                    self.path, subset, "pointclouds",
                    f"{category}/{category}_{object_name}.npy",
                )
                outfile.write(f"{i} {image} {mask} {pc}\n")

    def _fname(self, subset, category, object_name, sample_id):
        return f"{category}/{category}_{object_name}_{sample_id}"

    def get_image(self, subset, category, object_name, sample_id):
        fname = self._fname(subset, category, object_name, sample_id)
        return common.load_rgb(
            os.path.join(self.path, subset, "images_processed", fname + ".png"),
            out_hw=(self.opt.H, self.opt.W),
        )

    def get_depth(self, subset, category, object_name, sample_id):
        fname = self._fname(subset, category, object_name, sample_id)
        depth = common.load_npy_f32(
            os.path.join(self.path, subset, "depth", fname + ".npy")
        )
        depth = depth.astype(np.float32)[..., None]  # [H, W, 1]
        assert depth.shape[0] == self.opt.H
        mask = (depth != 0).astype(np.float32)
        return depth, mask

    def get_camera(self, subset, category, object_name, sample_id):
        fname = self._fname(subset, category, object_name, sample_id)
        K = np.load(
            os.path.join(self.path, subset, "camera_data", "intr", fname + ".npy")
        ).astype(np.float32)
        Rt = np.load(
            os.path.join(self.path, subset, "camera_data", "extr", fname + ".npy")
        ).astype(np.float32)
        return K, Rt

    def get_pointcloud(self, subset, category, object_name):
        pc = np.load(
            os.path.join(
                self.path, subset, "pointclouds", f"{category}/{category}_{object_name}.npy"
            )
        ).astype(np.float32)
        return {"points": pc}

    def get_gt_sdf(self, subset, category, object_name):
        gt = np.load(
            os.path.join(
                self.path, subset, "gt_sdf", f"{category}/{category}_{object_name}.npy"
            ),
            allow_pickle=True,
        ).item()
        pts = gt["sample_pt"].astype(np.float32)
        sdf = gt["sample_sdf"].astype(np.float32) - 0.003
        return pts, sdf

    def __getitem__(self, idx):
        opt = self.opt
        subset, category, object_name, sample_id = self.list[idx]
        sample = {"idx": np.int64(idx), "category_label": np.int64(self.cat2label[category])}

        K, Rt = self.get_camera(subset, category, object_name, sample_id)
        sample["pose_gt"] = common.pose_from_Rt(Rt)
        sample["intr"] = K

        rgb = self.get_image(subset, category, object_name, sample_id)
        depth, mask = self.get_depth(subset, category, object_name, sample_id)
        sample["rgb_input_map"] = rgb
        sample["mask_input_map"] = mask
        sample["depth_input_map"] = depth

        if not self.load_3D:
            return sample

        sample["dpc"] = self.get_pointcloud(subset, category, object_name)
        pts, sdf = self.get_gt_sdf(subset, category, object_name)
        n = opt.training.get("n_sdf_points")
        if n:
            # deterministic per-(seed, sample, epoch) generator: loader-pool
            # thread scheduling must not decide which SDF subset a sample
            # trains on (a shared rng.spawn handed out children in thread-
            # arrival order, so identical seeds trained on different points).
            # Keying on the loader's set_epoch value advances the subsample
            # each epoch — the same fresh-draw-per-epoch behavior as the
            # reference's torch sampling (data/synthetic.py:166-169) — and,
            # unlike an in-memory visit counter, a --resume'd run continues
            # the progression instead of replaying epoch-0 draws, and
            # duplicated rows in one batch draw identically.
            child = np.random.default_rng((self.seed, idx, self._epoch))
            sel = child.permutation(pts.shape[0])[:n]
            pts, sdf = pts[sel], sdf[sel]
        sample["gt_sample_points"] = pts
        sample["gt_sample_sdf"] = sdf
        return sample

    def __len__(self):
        return len(self.list)


Dataset = SyntheticDataset
