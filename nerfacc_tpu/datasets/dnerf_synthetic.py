"""D-NeRF (dynamic blender) dataset loader.

Parity target: ``examples/datasets/dnerf_synthetic.py`` — NeRF-Synthetic
format plus a per-frame ``time`` value in [0, 1] threaded through each ray
batch as ``timestamps``.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .nerf_synthetic import SubjectLoader as _StaticLoader


def _load_renderings(root_fp: str, subject_id: str, split: str):
    import imageio.v2 as imageio

    data_dir = os.path.join(root_fp, subject_id)
    with open(os.path.join(data_dir, f"transforms_{split}.json")) as fp:
        meta = json.load(fp)
    images, camtoworlds, timestamps = [], [], []
    n = len(meta["frames"])
    for i, frame in enumerate(meta["frames"]):
        fname = os.path.join(data_dir, frame["file_path"] + ".png")
        images.append(imageio.imread(fname))
        camtoworlds.append(frame["transform_matrix"])
        timestamps.append(
            frame["time"] if "time" in frame else float(i) / (n - 1)
        )
    images = np.stack(images, axis=0)
    camtoworlds = np.stack(camtoworlds, axis=0).astype(np.float32)
    timestamps = np.asarray(timestamps, np.float32)
    h, w = images.shape[1:3]
    focal = 0.5 * w / np.tan(0.5 * float(meta["camera_angle_x"]))
    return images, camtoworlds, focal, timestamps


class SubjectLoader(_StaticLoader):
    """D-NeRF subject loader: static loader + per-frame timestamps."""

    SPLITS = ["train", "val", "trainval", "test"]

    def __init__(
        self,
        subject_id: str = "",
        root_fp: str = "",
        split: str = "train",
        timestamps: Optional[np.ndarray] = None,
        **kwargs,
    ):
        if kwargs.get("images") is None and root_fp:
            if split == "trainval":
                im_t, c_t, f, ts_t = _load_renderings(root_fp, subject_id, "train")
                im_v, c_v, _, ts_v = _load_renderings(root_fp, subject_id, "val")
                images = np.concatenate([im_t, im_v])
                camtoworlds = np.concatenate([c_t, c_v])
                timestamps = np.concatenate([ts_t, ts_v])
                focal = f
            else:
                images, camtoworlds, focal, timestamps = _load_renderings(
                    root_fp, subject_id, split
                )
            kwargs.update(images=images, camtoworlds=camtoworlds, focal=focal)
            root_fp = ""
        super().__init__(
            subject_id=subject_id, root_fp=root_fp, split=split, **kwargs
        )
        assert timestamps is not None, "timestamps required"
        self.timestamps = np.asarray(timestamps, np.float32)

    def fetch_data(self, index: int):
        batch = super().fetch_data(index)
        ts = self.timestamps[self._last_image_id][:, None]
        if not self.training:
            ts = ts.reshape(self.HEIGHT, self.WIDTH, 1)
        batch["timestamps"] = jnp.asarray(ts)
        return batch
