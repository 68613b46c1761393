"""Export torchvision VGG16 + LPIPS linear weights to an npz for
``nerfacc_tpu.utils.lpips`` (exact reference LPIPS-vgg parity,
``/root/reference/examples/train_ngp_nerf_occ.py:146-148``).

Run on any machine WITH torchvision + lpips installed (this repo's target
environment has neither, hence the offline fallback):

    python scripts/export_lpips_weights.py lpips_vgg.npz

then point ``NERFACC_LPIPS_WEIGHTS=/path/to/lpips_vgg.npz`` at it.
"""

from __future__ import annotations

import sys

import numpy as np


def main(out_path: str) -> None:
    import lpips  # type: ignore
    import torchvision  # type: ignore

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
    net = lpips.LPIPS(net="vgg")

    arrays = {}
    for i, layer in enumerate(vgg):
        if hasattr(layer, "weight"):
            arrays[f"features.{i}.weight"] = (
                layer.weight.detach().numpy().astype(np.float32)
            )
            arrays[f"features.{i}.bias"] = (
                layer.bias.detach().numpy().astype(np.float32)
            )
    for k, lin in enumerate(net.lins):
        # lpips lin layers are 1x1 convs (1, C, 1, 1); store as (C,)
        arrays[f"lin{k}"] = (
            lin.model[-1].weight.detach().numpy().reshape(-1).astype(
                np.float32
            )
        )
    np.savez(out_path, **arrays)
    print(f"wrote {out_path} with {len(arrays)} arrays")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "lpips_vgg.npz")
