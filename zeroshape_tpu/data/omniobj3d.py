"""OmniObject3D evaluation set — same layout as OCRTOC minus subsampling,
with ``depth/`` instead of ``depth_np/`` and no mask erosion
(reference data/omniobj3d.py vs data/ocrtoc.py).
"""

from __future__ import annotations

from zeroshape_tpu.data.ocrtoc import OcrtocDataset


class OmniObject3DDataset(OcrtocDataset):
    dataset_dir = "OmniObject3D"
    subsample_every = 1
    has_erode = False
    depth_dirname = "depth"


Dataset = OmniObject3DDataset
