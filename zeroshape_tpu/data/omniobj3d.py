"""OmniObject3D evaluation set — same layout as OCRTOC minus subsampling,
with ``depth/`` instead of ``depth_np/`` and no mask erosion
(reference data/omniobj3d.py vs data/ocrtoc.py).
"""

from __future__ import annotations

import os

import numpy as np

from zeroshape_tpu.data.ocrtoc import OcrtocDataset


class OmniObject3DDataset(OcrtocDataset):
    dataset_dir = "OmniObject3D"
    subsample_every = 1
    has_erode = False

    def get_depth(self, idx):
        category, name = self.list[idx]
        depth = np.load(
            os.path.join(self.path, "depth", category, name + ".npy")
        ).astype(np.float32)[..., None]
        assert depth.shape[0] == self.opt.H
        mask = (depth != 0).astype(np.float32)
        return depth, mask


Dataset = OmniObject3DDataset
